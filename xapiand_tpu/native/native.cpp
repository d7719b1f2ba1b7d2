// Native runtime components for xapiand-tpu (host plane).
//
// The reference implements its whole runtime in C++ (SURVEY.md §2); here the
// TPU compute path is JAX/XLA, and C++ covers the host hot paths:
//   - LZ4 block compression (reference vendors src/lz4/ for WAL/storage/
//     replication wire; this is an independent implementation of the public
//     LZ4 block format, compressor + decompressor)
//   - fast ASCII tokenizer for the bulk-indexing pipeline (the analysis fast
//     path; non-ASCII text falls back to the Python Unicode tokenizer)
//   - FNV-1a 64 (shard routing hash, hashes.hh semantics)
//   - varint delta codec for posting lists (replication/compact transport,
//     glass pack.h analog)
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the image).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <cmath>

extern "C" {

// --------------------------------------------------------------------------
// FNV-1a 64
// --------------------------------------------------------------------------

uint64_t xt_fnv1a64(const uint8_t* data, int64_t len) {
    uint64_t h = 0xcbf29ce484222325ULL;
    for (int64_t i = 0; i < len; i++) {
        h ^= data[i];
        h *= 0x100000001b3ULL;
    }
    return h;
}

// --------------------------------------------------------------------------
// LZ4 block format
// --------------------------------------------------------------------------

static const int MINMATCH = 4;
static const int HASH_LOG = 16;

static inline uint32_t lz4_hash(uint32_t v) {
    return (v * 2654435761U) >> (32 - HASH_LOG);
}

static inline uint32_t read32(const uint8_t* p) {
    uint32_t v;
    memcpy(&v, p, 4);
    return v;
}

// Returns compressed size, or -1 if dst too small / not compressible well.
int64_t xt_lz4_compress(const uint8_t* src, int64_t src_len,
                        uint8_t* dst, int64_t dst_cap) {
    if (src_len <= 0 || src_len > (1LL << 31) - 1) return -1;
    int32_t* table = (int32_t*)calloc(1 << HASH_LOG, sizeof(int32_t));
    if (!table) return -1;
    for (int i = 0; i < (1 << HASH_LOG); i++) table[i] = -1;

    const uint8_t* ip = src;
    const uint8_t* iend = src + src_len;
    // spec: last match must end >= 12 bytes before the end of the block and
    // the last 5 bytes are always literals
    const uint8_t* mflimit = (src_len > 12) ? iend - 12 : src;
    uint8_t* op = dst;
    uint8_t* oend = dst + dst_cap;
    const uint8_t* anchor = src;

    while (ip < mflimit) {
        uint32_t h = lz4_hash(read32(ip));
        int32_t ref_idx = table[h];
        table[h] = (int32_t)(ip - src);
        if (ref_idx >= 0 && (ip - src) - ref_idx <= 65535 &&
            read32(src + ref_idx) == read32(ip)) {
            const uint8_t* ref = src + ref_idx;
            // extend match
            const uint8_t* mstart = ip;
            ip += MINMATCH;
            ref += MINMATCH;
            while (ip < iend - 5 && *ip == *ref) { ip++; ref++; }
            int64_t mlen = (ip - mstart) - MINMATCH;
            int64_t litlen = mstart - anchor;
            // emit sequence
            int64_t worst = 1 + litlen + litlen / 255 + 2 + 1 + mlen / 255 + 16;
            if (op + worst > oend) { free(table); return -1; }
            uint8_t* token = op++;
            if (litlen >= 15) {
                *token = (uint8_t)(15 << 4);
                int64_t l = litlen - 15;
                while (l >= 255) { *op++ = 255; l -= 255; }
                *op++ = (uint8_t)l;
            } else {
                *token = (uint8_t)(litlen << 4);
            }
            memcpy(op, anchor, litlen);
            op += litlen;
            uint16_t offset = (uint16_t)(mstart - (src + ref_idx));
            *op++ = (uint8_t)(offset & 0xff);
            *op++ = (uint8_t)(offset >> 8);
            if (mlen >= 15) {
                *token |= 15;
                int64_t m = mlen - 15;
                while (m >= 255) { *op++ = 255; m -= 255; }
                *op++ = (uint8_t)m;
            } else {
                *token |= (uint8_t)mlen;
            }
            anchor = ip;
        } else {
            ip++;
        }
    }
    // trailing literals
    int64_t litlen = iend - anchor;
    int64_t worst = 1 + litlen + litlen / 255 + 8;
    if (op + worst > oend) { free(table); return -1; }
    uint8_t* token = op++;
    if (litlen >= 15) {
        *token = (uint8_t)(15 << 4);
        int64_t l = litlen - 15;
        while (l >= 255) { *op++ = 255; l -= 255; }
        *op++ = (uint8_t)l;
    } else {
        *token = (uint8_t)(litlen << 4);
    }
    memcpy(op, anchor, litlen);
    op += litlen;
    free(table);
    return op - dst;
}

// Returns decompressed size, or -1 on malformed input.
int64_t xt_lz4_decompress(const uint8_t* src, int64_t src_len,
                          uint8_t* dst, int64_t dst_cap) {
    const uint8_t* ip = src;
    const uint8_t* iend = src + src_len;
    uint8_t* op = dst;
    uint8_t* oend = dst + dst_cap;

    while (ip < iend) {
        uint8_t token = *ip++;
        // literals
        int64_t litlen = token >> 4;
        if (litlen == 15) {
            uint8_t b;
            do {
                if (ip >= iend) return -1;
                b = *ip++;
                litlen += b;
            } while (b == 255);
        }
        if (ip + litlen > iend || op + litlen > oend) return -1;
        memcpy(op, ip, litlen);
        ip += litlen;
        op += litlen;
        if (ip >= iend) break;  // last sequence has no match
        // match
        if (ip + 2 > iend) return -1;
        uint16_t offset = (uint16_t)(ip[0] | (ip[1] << 8));
        ip += 2;
        if (offset == 0 || op - dst < offset) return -1;
        int64_t mlen = (token & 15) + MINMATCH;
        if ((token & 15) == 15) {
            uint8_t b;
            do {
                if (ip >= iend) return -1;
                b = *ip++;
                mlen += b;
            } while (b == 255);
        }
        if (op + mlen > oend) return -1;
        const uint8_t* match = op - offset;
        for (int64_t i = 0; i < mlen; i++) op[i] = match[i];  // overlapping ok
        op += mlen;
    }
    return op - dst;
}

// --------------------------------------------------------------------------
// ASCII tokenizer (analysis fast path)
// --------------------------------------------------------------------------
//
// Semantics mirror the Python tokenizer for ASCII input: words are maximal
// [a-z0-9]+ runs (input lowercased on the fly), internal ' and & join when
// followed by a word char, up to three trailing '+' or one '#'.
// Returns the number of tokens, or -1 if non-ASCII input was found (caller
// falls back to the Unicode path). Token k occupies
// out_text[out_offsets[2k] .. +out_offsets[2k+1]) (lowercased bytes).

int64_t xt_tokenize_ascii(const uint8_t* text, int64_t len,
                          uint8_t* out_text, int64_t out_cap,
                          int32_t* out_spans, int64_t max_tokens) {
    int64_t ntok = 0;
    int64_t w = 0;
    int64_t i = 0;
    while (i < len) {
        uint8_t c = text[i];
        if (c >= 0x80) return -1;
        uint8_t lc = (c >= 'A' && c <= 'Z') ? c + 32 : c;
        bool word = (lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9');
        if (!word) { i++; continue; }
        int64_t start_w = w;
        while (i < len) {
            c = text[i];
            if (c >= 0x80) return -1;
            lc = (c >= 'A' && c <= 'Z') ? c + 32 : c;
            bool wc = (lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9');
            if (wc) {
                if (w >= out_cap) return -1;
                out_text[w++] = lc;
                i++;
            } else if ((c == '\'' || c == '&') && w > start_w &&
                       i + 1 < len && text[i + 1] < 0x80) {
                uint8_t n = text[i + 1];
                uint8_t ln = (n >= 'A' && n <= 'Z') ? n + 32 : n;
                if ((ln >= 'a' && ln <= 'z') || (ln >= '0' && ln <= '9')) {
                    if (w >= out_cap) return -1;
                    out_text[w++] = (c == '&') ? '&' : '\'';
                    i++;
                } else break;
            } else break;
        }
        // trailing +/#
        int plus = 0;
        while (i < len && text[i] == '+' && plus < 3) {
            if (w >= out_cap) return -1;
            out_text[w++] = '+';
            i++; plus++;
        }
        if (plus == 0 && i < len && text[i] == '#') {
            if (w >= out_cap) return -1;
            out_text[w++] = '#';
            i++;
        }
        if (ntok >= max_tokens) return ntok;
        out_spans[2 * ntok] = (int32_t)start_w;
        out_spans[2 * ntok + 1] = (int32_t)(w - start_w);
        ntok++;
    }
    return ntok;
}

// --------------------------------------------------------------------------
// varint delta codec for sorted u32 posting lists (pack.h analog)
// --------------------------------------------------------------------------

int64_t xt_delta_encode(const uint32_t* vals, int64_t n,
                        uint8_t* dst, int64_t dst_cap) {
    uint8_t* op = dst;
    uint8_t* oend = dst + dst_cap;
    uint32_t prev = 0;
    for (int64_t i = 0; i < n; i++) {
        uint32_t d = vals[i] - prev;
        prev = vals[i];
        while (d >= 0x80) {
            if (op >= oend) return -1;
            *op++ = (uint8_t)(d | 0x80);
            d >>= 7;
        }
        if (op >= oend) return -1;
        *op++ = (uint8_t)d;
    }
    return op - dst;
}

int64_t xt_delta_decode(const uint8_t* src, int64_t src_len,
                        uint32_t* out, int64_t max_out) {
    const uint8_t* ip = src;
    const uint8_t* iend = src + src_len;
    uint32_t prev = 0;
    int64_t n = 0;
    while (ip < iend) {
        uint32_t d = 0;
        int shift = 0;
        while (true) {
            if (ip >= iend || shift > 28) return -1;
            uint8_t b = *ip++;
            d |= (uint32_t)(b & 0x7f) << shift;
            if (!(b & 0x80)) break;
            shift += 7;
        }
        if (n >= max_out) return -1;
        prev += d;
        out[n++] = prev;
    }
    return n;
}

}  // extern "C"

// --------------------------------------------------------------------------
// Inverter: tokenize + stem + per-doc accumulation + packed postings.
//
// Replaces the Python DocumentTerms/SegmentBuilder hot path (the reference
// runs C++ TermGenerator + the glass inverter here:
// src/xapian/queryparser/termgenerator_internal.cc, handler.h:256-361,
// src/xapian/backends/glass/glass_inverter.cc). One xt_inv_index_text call
// per text field does tokenize -> stopword check -> snowball(english) stem
// -> per-doc wdf/position accumulation for every prefix namespace; end_doc
// flushes into per-term posting vectors; export packs the flat segment
// arrays consumed by models/segment.py.
//
// The English stemmer is a literal port of the NLTK Snowball English
// stemmer's semantics (itself the standard Porter2 algorithm) so stems are
// bit-identical to the Python analysis path, which remains the oracle.
// --------------------------------------------------------------------------

#include <algorithm>
#include <charconv>
#include <string>
#include <vector>

namespace xtinv {

static const char* kVowels = "aeiouy";

static inline bool is_vowel(char c) {
    return c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' ||
           c == 'y';
}

static inline bool ends_with(const std::string& s, const char* suf,
                             size_t n) {
    return s.size() >= n && memcmp(s.data() + s.size() - n, suf, n) == 0;
}

struct SpecialWord { const char* w; const char* stem; };
static const SpecialWord kSpecial[] = {
    {"skis", "ski"}, {"skies", "sky"}, {"dying", "die"}, {"lying", "lie"},
    {"tying", "tie"}, {"idly", "idl"}, {"gently", "gentl"}, {"ugly", "ugli"},
    {"early", "earli"}, {"only", "onli"}, {"singly", "singl"}, {"sky", "sky"},
    {"news", "news"}, {"howe", "howe"}, {"atlas", "atlas"},
    {"cosmos", "cosmos"}, {"bias", "bias"}, {"andes", "andes"},
    {"inning", "inning"}, {"innings", "inning"}, {"outing", "outing"},
    {"outings", "outing"}, {"canning", "canning"}, {"cannings", "canning"},
    {"herring", "herring"}, {"herrings", "herring"}, {"earring", "earring"},
    {"earrings", "earring"}, {"proceed", "proceed"}, {"proceeds", "proceed"},
    {"proceeded", "proceed"}, {"proceeding", "proceed"},
    {"exceed", "exceed"}, {"exceeds", "exceed"}, {"exceeded", "exceed"},
    {"exceeding", "exceed"}, {"succeed", "succeed"}, {"succeeds", "succeed"},
    {"succeeded", "succeed"}, {"succeeding", "succeed"},
};

// drop `n` chars from the tail (python s[:-n], clamped like slicing)
static inline void chop(std::string& s, size_t n) {
    s.resize(s.size() > n ? s.size() - n : 0);
}

// python suffix_replace(s, old, new) when s is known to end with old
static inline void suffix_replace(std::string& s, size_t oldn,
                                  const char* repl) {
    chop(s, oldn);
    s += repl;
}

// r-region update used all over the NLTK code:
//   if len(r) >= len(suffix): r = suffix_replace(r, suffix, repl)
//   else: r = fallback
static inline void r_replace(std::string& r, size_t sufn, const char* repl,
                             const char* fallback) {
    if (r.size() >= sufn) {
        chop(r, sufn);
        r += repl;
    } else {
        r = fallback;
    }
}

// Porter2 ("english" Snowball); semantics identical to
// nltk.stem.snowball.EnglishStemmer.stem for lowercase input.
static std::string stem_english(const std::string& input) {
    std::string word = input;
    if (word.size() <= 2) return word;
    for (const auto& sp : kSpecial)
        if (word == sp.w) return sp.stem;

    if (word[0] == '\'') word.erase(0, 1);
    if (!word.empty() && word[0] == 'y') word[0] = 'Y';
    for (size_t i = 1; i < word.size(); i++)
        if (word[i] == 'y' && is_vowel(word[i - 1])) word[i] = 'Y';

    std::string r1, r2;
    bool special_prefix =
        (word.compare(0, 5, "gener") == 0 || word.compare(0, 5, "arsen") == 0);
    bool commun = (word.compare(0, 6, "commun") == 0);
    if (special_prefix || commun) {
        r1 = word.substr(special_prefix ? 5 : 6);
        for (size_t i = 1; i < r1.size(); i++) {
            if (!is_vowel(r1[i]) && is_vowel(r1[i - 1])) {
                r2 = r1.substr(i + 1);
                break;
            }
        }
    } else {
        for (size_t i = 1; i < word.size(); i++) {
            if (!is_vowel(word[i]) && is_vowel(word[i - 1])) {
                r1 = word.substr(i + 1);
                break;
            }
        }
        for (size_t i = 1; i < r1.size(); i++) {
            if (!is_vowel(r1[i]) && is_vowel(r1[i - 1])) {
                r2 = r1.substr(i + 1);
                break;
            }
        }
    }

    // STEP 0
    {
        static const char* sufs[] = {"'s'", "'s", "'"};
        for (const char* suf : sufs) {
            size_t n = strlen(suf);
            if (ends_with(word, suf, n)) {
                chop(word, n);
                chop(r1, n);
                chop(r2, n);
                break;
            }
        }
    }

    // STEP 1a
    {
        static const char* sufs[] = {"sses", "ied", "ies", "us", "ss", "s"};
        for (const char* suf : sufs) {
            size_t n = strlen(suf);
            if (!ends_with(word, suf, n)) continue;
            if (strcmp(suf, "sses") == 0) {
                chop(word, 2); chop(r1, 2); chop(r2, 2);
            } else if (strcmp(suf, "ied") == 0 || strcmp(suf, "ies") == 0) {
                if (word.size() - n > 1) {
                    chop(word, 2); chop(r1, 2); chop(r2, 2);
                } else {
                    chop(word, 1); chop(r1, 1); chop(r2, 1);
                }
            } else if (strcmp(suf, "s") == 0) {
                bool vowel_found = false;
                for (size_t i = 0; i + 2 < word.size(); i++)
                    if (is_vowel(word[i])) { vowel_found = true; break; }
                if (vowel_found) {
                    chop(word, 1); chop(r1, 1); chop(r2, 1);
                }
            }
            break;
        }
    }

    // STEP 1b
    {
        static const char* sufs[] = {"eedly", "ingly", "edly",
                                     "eed", "ing", "ed"};
        for (const char* suf : sufs) {
            size_t n = strlen(suf);
            if (!ends_with(word, suf, n)) continue;
            if (strcmp(suf, "eed") == 0 || strcmp(suf, "eedly") == 0) {
                if (ends_with(r1, suf, n)) {
                    suffix_replace(word, n, "ee");
                    r_replace(r1, n, "ee", "");
                    r_replace(r2, n, "ee", "");
                }
            } else {
                bool vowel_found = false;
                for (size_t i = 0; i + n < word.size(); i++)
                    if (is_vowel(word[i])) { vowel_found = true; break; }
                if (vowel_found) {
                    chop(word, n); chop(r1, n); chop(r2, n);
                    if (ends_with(word, "at", 2) || ends_with(word, "bl", 2)
                        || ends_with(word, "iz", 2)) {
                        word += 'e';
                        r1 += 'e';
                        if (word.size() > 5 || r1.size() >= 3) r2 += 'e';
                    } else if (ends_with(word, "bb", 2) ||
                               ends_with(word, "dd", 2) ||
                               ends_with(word, "ff", 2) ||
                               ends_with(word, "gg", 2) ||
                               ends_with(word, "mm", 2) ||
                               ends_with(word, "nn", 2) ||
                               ends_with(word, "pp", 2) ||
                               ends_with(word, "rr", 2) ||
                               ends_with(word, "tt", 2)) {
                        chop(word, 1); chop(r1, 1); chop(r2, 1);
                    } else if ((r1.empty() && word.size() >= 3 &&
                                !is_vowel(word[word.size() - 1]) &&
                                word[word.size() - 1] != 'w' &&
                                word[word.size() - 1] != 'x' &&
                                word[word.size() - 1] != 'Y' &&
                                is_vowel(word[word.size() - 2]) &&
                                !is_vowel(word[word.size() - 3])) ||
                               (r1.empty() && word.size() == 2 &&
                                is_vowel(word[0]) && !is_vowel(word[1]))) {
                        word += 'e';
                        if (!r1.empty()) r1 += 'e';
                        if (!r2.empty()) r2 += 'e';
                    }
                }
            }
            break;
        }
    }

    // STEP 1c
    if (word.size() > 2 && (word.back() == 'y' || word.back() == 'Y') &&
        !is_vowel(word[word.size() - 2])) {
        word.back() = 'i';
        if (!r1.empty()) r1.back() = 'i';
        if (!r2.empty()) r2.back() = 'i';
    }

    // STEP 2
    {
        static const char* sufs[] = {
            "ization", "ational", "fulness", "ousness", "iveness", "tional",
            "biliti", "lessli", "entli", "ation", "alism", "aliti", "ousli",
            "iviti", "fulli", "enci", "anci", "abli", "izer", "ator", "alli",
            "bli", "ogi", "li"};
        for (const char* suf : sufs) {
            size_t n = strlen(suf);
            if (!ends_with(word, suf, n)) continue;
            if (ends_with(r1, suf, n)) {
                if (strcmp(suf, "tional") == 0) {
                    chop(word, 2); chop(r1, 2); chop(r2, 2);
                } else if (strcmp(suf, "enci") == 0 ||
                           strcmp(suf, "anci") == 0 ||
                           strcmp(suf, "abli") == 0) {
                    word.back() = 'e';
                    if (!r1.empty()) r1.back() = 'e'; else r1 = "";
                    if (!r2.empty()) r2.back() = 'e'; else r2 = "";
                } else if (strcmp(suf, "entli") == 0) {
                    chop(word, 2); chop(r1, 2); chop(r2, 2);
                } else if (strcmp(suf, "izer") == 0 ||
                           strcmp(suf, "ization") == 0) {
                    suffix_replace(word, n, "ize");
                    r_replace(r1, n, "ize", "");
                    r_replace(r2, n, "ize", "");
                } else if (strcmp(suf, "ational") == 0 ||
                           strcmp(suf, "ation") == 0 ||
                           strcmp(suf, "ator") == 0) {
                    suffix_replace(word, n, "ate");
                    r_replace(r1, n, "ate", "");
                    r_replace(r2, n, "ate", "e");
                } else if (strcmp(suf, "alism") == 0 ||
                           strcmp(suf, "aliti") == 0 ||
                           strcmp(suf, "alli") == 0) {
                    suffix_replace(word, n, "al");
                    r_replace(r1, n, "al", "");
                    r_replace(r2, n, "al", "");
                } else if (strcmp(suf, "fulness") == 0) {
                    chop(word, 4); chop(r1, 4); chop(r2, 4);
                } else if (strcmp(suf, "ousli") == 0 ||
                           strcmp(suf, "ousness") == 0) {
                    suffix_replace(word, n, "ous");
                    r_replace(r1, n, "ous", "");
                    r_replace(r2, n, "ous", "");
                } else if (strcmp(suf, "iveness") == 0 ||
                           strcmp(suf, "iviti") == 0) {
                    suffix_replace(word, n, "ive");
                    r_replace(r1, n, "ive", "");
                    r_replace(r2, n, "ive", "e");
                } else if (strcmp(suf, "biliti") == 0 ||
                           strcmp(suf, "bli") == 0) {
                    suffix_replace(word, n, "ble");
                    r_replace(r1, n, "ble", "");
                    r_replace(r2, n, "ble", "");
                } else if (strcmp(suf, "ogi") == 0) {
                    if (word.size() >= 4 && word[word.size() - 4] == 'l') {
                        chop(word, 1); chop(r1, 1); chop(r2, 1);
                    }
                } else if (strcmp(suf, "fulli") == 0 ||
                           strcmp(suf, "lessli") == 0) {
                    chop(word, 2); chop(r1, 2); chop(r2, 2);
                } else if (strcmp(suf, "li") == 0) {
                    char prev = word.size() >= 3 ? word[word.size() - 3] : 0;
                    if (prev && strchr("cdeghkmnrt", prev)) {
                        chop(word, 2); chop(r1, 2); chop(r2, 2);
                    }
                }
            }
            break;
        }
    }

    // STEP 3
    {
        static const char* sufs[] = {"ational", "tional", "alize", "icate",
                                     "iciti", "ative", "ical", "ness", "ful"};
        for (const char* suf : sufs) {
            size_t n = strlen(suf);
            if (!ends_with(word, suf, n)) continue;
            if (ends_with(r1, suf, n)) {
                if (strcmp(suf, "tional") == 0) {
                    chop(word, 2); chop(r1, 2); chop(r2, 2);
                } else if (strcmp(suf, "ational") == 0) {
                    suffix_replace(word, n, "ate");
                    r_replace(r1, n, "ate", "");
                    r_replace(r2, n, "ate", "");
                } else if (strcmp(suf, "alize") == 0) {
                    chop(word, 3); chop(r1, 3); chop(r2, 3);
                } else if (strcmp(suf, "icate") == 0 ||
                           strcmp(suf, "iciti") == 0 ||
                           strcmp(suf, "ical") == 0) {
                    suffix_replace(word, n, "ic");
                    r_replace(r1, n, "ic", "");
                    r_replace(r2, n, "ic", "");
                } else if (strcmp(suf, "ful") == 0 ||
                           strcmp(suf, "ness") == 0) {
                    chop(word, n); chop(r1, n); chop(r2, n);
                } else if (strcmp(suf, "ative") == 0) {
                    if (ends_with(r2, suf, n)) {
                        chop(word, 5); chop(r1, 5); chop(r2, 5);
                    }
                }
            }
            break;
        }
    }

    // STEP 4
    {
        static const char* sufs[] = {"ement", "ance", "ence", "able", "ible",
                                     "ment", "ant", "ent", "ism", "ate",
                                     "iti", "ous", "ive", "ize", "ion", "al",
                                     "er", "ic"};
        for (const char* suf : sufs) {
            size_t n = strlen(suf);
            if (!ends_with(word, suf, n)) continue;
            if (ends_with(r2, suf, n)) {
                if (strcmp(suf, "ion") == 0) {
                    char prev = word.size() >= 4 ? word[word.size() - 4] : 0;
                    if (prev == 's' || prev == 't') {
                        chop(word, 3); chop(r1, 3); chop(r2, 3);
                    }
                } else {
                    chop(word, n); chop(r1, n); chop(r2, n);
                }
            }
            break;
        }
    }

    // STEP 5
    if (ends_with(r2, "l", 1) && word.size() >= 2 &&
        word[word.size() - 2] == 'l') {
        chop(word, 1);
    } else if (ends_with(r2, "e", 1)) {
        chop(word, 1);
    } else if (ends_with(r1, "e", 1)) {
        if (word.size() >= 4 && (is_vowel(word[word.size() - 2]) ||
                                 word[word.size() - 2] == 'w' ||
                                 word[word.size() - 2] == 'x' ||
                                 word[word.size() - 2] == 'Y' ||
                                 !is_vowel(word[word.size() - 3]) ||
                                 is_vowel(word[word.size() - 4]))) {
            chop(word, 1);
        }
    }

    for (auto& c : word)
        if (c == 'Y') c = 'y';
    return word;
}

// ---- open-addressing string hash tables -----------------------------------

struct StrTable {
    // maps interned strings -> 0-based id; strings live in `arena`
    std::vector<char> arena;
    struct Ref { uint32_t off, len; };
    std::vector<Ref> refs;
    std::vector<uint32_t> slots;  // id + 1, 0 = empty
    uint64_t mask = 0;

    StrTable() { slots.assign(1 << 16, 0); mask = (1 << 16) - 1; }

    const char* str(uint32_t id) const { return arena.data() + refs[id].off; }
    uint32_t len(uint32_t id) const { return refs[id].len; }

    void grow() {
        size_t ns = slots.size() * 2;
        std::vector<uint32_t> fresh(ns, 0);
        uint64_t nmask = ns - 1;
        for (uint32_t v : slots) {
            if (!v) continue;
            const Ref& r = refs[v - 1];
            uint64_t h = xt_fnv1a64(
                (const uint8_t*)arena.data() + r.off, r.len);
            uint64_t i = h & nmask;
            while (fresh[i]) i = (i + 1) & nmask;
            fresh[i] = v;
        }
        slots.swap(fresh);
        mask = nmask;
    }

    // returns id; `created` reports insertion
    uint32_t intern(const char* s, uint32_t n, bool* created = nullptr) {
        uint64_t h = xt_fnv1a64((const uint8_t*)s, n);
        uint64_t i = h & mask;
        while (slots[i]) {
            const Ref& r = refs[slots[i] - 1];
            if (r.len == n && memcmp(arena.data() + r.off, s, n) == 0) {
                if (created) *created = false;
                return slots[i] - 1;
            }
            i = (i + 1) & mask;
        }
        uint32_t id = (uint32_t)refs.size();
        uint32_t off = (uint32_t)arena.size();
        arena.insert(arena.end(), s, s + n);
        refs.push_back({off, n});
        slots[i] = id + 1;
        if (refs.size() * 10 > slots.size() * 7) grow();
        if (created) *created = true;
        return id;
    }

    int64_t find(const char* s, uint32_t n) const {
        uint64_t h = xt_fnv1a64((const uint8_t*)s, n);
        uint64_t i = h & mask;
        while (slots[i]) {
            const Ref& r = refs[slots[i] - 1];
            if (r.len == n && memcmp(arena.data() + r.off, s, n) == 0)
                return slots[i] - 1;
            i = (i + 1) & mask;
        }
        return -1;
    }
};

struct PostRec {
    int32_t docid;
    float wdf;
    int32_t posoff;
    int32_t poslen;
};

struct DocTerm {
    uint32_t tid;
    float wdf;
    std::vector<int32_t> pos;
};

// per-term posting list with the first posting stored INLINE: geo/date/
// numeric accuracy terms are overwhelmingly single-posting (a 20k-doc
// geo corpus creates 2.2M unique terms), and a vector-per-term cost one
// malloc per term on its first push — the dominant allocator traffic of
// geo-profile indexing. The heap vector only exists from the 2nd posting.
struct PostList {
    PostRec first;
    uint32_t n = 0;
    std::vector<PostRec> rest;
    size_t size() const { return n; }
    void push(const PostRec& pr) {
        if (n++ == 0) first = pr; else rest.push_back(pr);
    }
};

struct Inverter {
    StrTable terms;                          // global term dictionary
    std::vector<PostList> postings;          // per tid
    std::vector<double> collfreq;
    std::vector<float> maxwdf;
    std::vector<int32_t> positions;          // flat, aligned via PostRec

    StrTable stopwords;                      // membership only
    StrTable stemcache;                      // word -> stem id in stems
    std::vector<uint32_t> stem_of;           // stemcache id -> stems id
    StrTable stems;

    // per-doc state
    int32_t cur_doc = -1;
    std::vector<DocTerm> doc_terms;          // pooled; doc_used live
    size_t doc_used = 0;
    std::vector<uint32_t> doc_slots;         // local idx + 1, keyed by tid
    std::vector<uint32_t> doc_slot_epoch;
    uint32_t epoch = 0;
    uint64_t doc_mask = 0;

    // tokenizer scratch
    std::vector<uint8_t> tok_text;
    std::vector<int32_t> tok_spans;
    std::string scratch;

    // finalize cache
    std::vector<uint32_t> sorted_tids;
    bool sorted_valid = false;

    Inverter() {
        doc_slots.assign(1 << 10, 0);
        doc_slot_epoch.assign(1 << 10, 0);
        doc_mask = (1 << 10) - 1;
    }

    void grow_doc_slots() {
        size_t ns = doc_slots.size() * 2;
        std::vector<uint32_t> fresh(ns, 0);
        std::vector<uint32_t> fep(ns, 0);
        uint64_t nmask = ns - 1;
        for (size_t i = 0; i < doc_slots.size(); i++) {
            if (doc_slot_epoch[i] != epoch || !doc_slots[i]) continue;
            uint32_t v = doc_slots[i];
            uint64_t h = (uint64_t)doc_terms[v - 1].tid * 0x9e3779b97f4a7c15ULL;
            uint64_t j = h & nmask;
            while (fep[j] == epoch && fresh[j]) j = (j + 1) & nmask;
            fresh[j] = v;
            fep[j] = epoch;
        }
        doc_slots.swap(fresh);
        doc_slot_epoch.swap(fep);
        doc_mask = nmask;
    }

    DocTerm& doc_term_for(uint32_t tid) {
        uint64_t h = (uint64_t)tid * 0x9e3779b97f4a7c15ULL;
        uint64_t i = h & doc_mask;
        while (doc_slot_epoch[i] == epoch && doc_slots[i]) {
            DocTerm& dt = doc_terms[doc_slots[i] - 1];
            if (dt.tid == tid) return dt;
            i = (i + 1) & doc_mask;
        }
        if (doc_used >= doc_terms.size()) doc_terms.emplace_back();
        DocTerm& dt = doc_terms[doc_used];
        dt.tid = tid;
        dt.wdf = 0.0f;
        dt.pos.clear();
        doc_slots[i] = (uint32_t)(++doc_used);
        doc_slot_epoch[i] = epoch;
        if (doc_used * 10 > doc_slots.size() * 7) grow_doc_slots();
        return dt;
    }

    void emit(const char* term, uint32_t n, float wdf_inc, int32_t pos) {
        bool created = false;
        uint32_t tid = terms.intern(term, n, &created);
        if (created) {
            postings.emplace_back();
            collfreq.push_back(0.0);
            maxwdf.push_back(0.0f);
            sorted_valid = false;
        }
        DocTerm& dt = doc_term_for(tid);
        dt.wdf += wdf_inc;
        if (pos >= 0) dt.pos.push_back(pos);
    }

    const std::string& stem(const char* w, uint32_t n) {
        bool created = false;
        uint32_t cid = stemcache.intern(w, n, &created);
        if (created) {
            std::string s = stem_english(std::string(w, n));
            uint32_t sid = stems.intern(s.data(), (uint32_t)s.size());
            if (cid >= stem_of.size()) stem_of.resize(cid + 1);
            stem_of[cid] = sid;
        }
        scratch.assign(stems.str(stem_of[cid]), stems.len(stem_of[cid]));
        return scratch;
    }
};

}  // namespace xtinv

extern "C" {

void* xt_inv_new() { return new xtinv::Inverter(); }

void xt_inv_free(void* h) { delete (xtinv::Inverter*)h; }

void xt_inv_set_stopwords(void* h, const uint8_t* data, int64_t len) {
    auto* inv = (xtinv::Inverter*)h;
    int64_t start = 0;
    for (int64_t i = 0; i <= len; i++) {
        if (i == len || data[i] == '\n') {
            if (i > start)
                inv->stopwords.intern((const char*)data + start,
                                      (uint32_t)(i - start));
            start = i + 1;
        }
    }
}

int32_t xt_inv_begin_doc(void* h, int32_t docid) {
    auto* inv = (xtinv::Inverter*)h;
    inv->cur_doc = docid;
    inv->doc_used = 0;
    if (++inv->epoch == 0) {   // epoch wrap: hard-clear stamps
        std::fill(inv->doc_slot_epoch.begin(), inv->doc_slot_epoch.end(), 0);
        inv->epoch = 1;
    }
    return docid;
}

// stem_mode: 0=none 1=some 2=all 3=all_z; stop_mode: 0=none 1=all 2=stemmed
// returns base + last_pos + 1 (the TermGenerator position contract), or -1
// for non-ASCII input (caller falls back; no partial state was written).
int64_t xt_inv_index_text(void* h, const uint8_t* text, int64_t len,
                          const uint8_t* prefix_buf,
                          const int32_t* prefix_lens, int32_t n_prefixes,
                          int64_t pos_base, float wdf_inc,
                          int32_t with_positions, int32_t stem_mode,
                          int32_t stop_mode) {
    auto* inv = (xtinv::Inverter*)h;
    int64_t max_tokens = len / 2 + 2;
    inv->tok_text.resize(len + 8);
    inv->tok_spans.resize(2 * max_tokens);
    int64_t n = xt_tokenize_ascii(text, len, inv->tok_text.data(), len + 8,
                                  inv->tok_spans.data(), max_tokens);
    if (n < 0) return -1;

    // prefix offsets into prefix_buf
    int32_t poffs[17];
    int32_t maxplen = 0;
    if (n_prefixes > 16) n_prefixes = 16;
    poffs[0] = 0;
    for (int32_t p = 0; p < n_prefixes; p++) {
        poffs[p + 1] = poffs[p] + prefix_lens[p];
        if (prefix_lens[p] > maxplen) maxplen = prefix_lens[p];
    }

    const char* tt = (const char*)inv->tok_text.data();
    std::string& buf = inv->scratch;
    std::string term;
    int64_t last_pos = -1;
    for (int64_t k = 0; k < n; k++) {
        const char* w = tt + inv->tok_spans[2 * k];
        uint32_t wl = (uint32_t)inv->tok_spans[2 * k + 1];
        if (!wl) continue;
        int64_t tpos = k;
        if (tpos > last_pos) last_pos = tpos;
        bool is_stop = inv->stopwords.find(w, wl) >= 0;
        if (is_stop && stop_mode == 1) continue;
        bool has_digit = false;
        for (uint32_t i = 0; i < wl; i++)
            if (w[i] >= '0' && w[i] <= '9') { has_digit = true; break; }
        int32_t pos = with_positions ? (int32_t)(pos_base + tpos) : -1;
        int mode = (stem_mode == 0 || has_digit) ? 0 : stem_mode;
        if (mode == 0) {
            for (int32_t p = 0; p < n_prefixes; p++) {
                uint32_t pl = (uint32_t)prefix_lens[p];
                if (pl + wl > 245) continue;
                term.assign((const char*)prefix_buf + poffs[p], pl);
                term.append(w, wl);
                inv->emit(term.data(), (uint32_t)term.size(), wdf_inc, pos);
            }
        } else if (mode == 1) {   // STEM_SOME
            bool do_z = !(is_stop && stop_mode == 2);
            uint32_t zl = 0;
            if (do_z) {
                buf = inv->stem(w, wl);
                zl = (uint32_t)buf.size();
            }
            for (int32_t p = 0; p < n_prefixes; p++) {
                uint32_t pl = (uint32_t)prefix_lens[p];
                if (pl + wl <= 245) {
                    term.assign((const char*)prefix_buf + poffs[p], pl);
                    term.append(w, wl);
                    inv->emit(term.data(), (uint32_t)term.size(), wdf_inc,
                              pos);
                }
                if (do_z && 1 + pl + zl <= 245) {
                    term.assign(1, 'Z');
                    term.append((const char*)prefix_buf + poffs[p], pl);
                    term.append(buf);
                    inv->emit(term.data(), (uint32_t)term.size(), wdf_inc,
                              -1);
                }
            }
        } else {                  // STEM_ALL / STEM_ALL_Z
            buf = inv->stem(w, wl);
            uint32_t zl = (uint32_t)buf.size();
            bool zmark = (mode == 3);
            for (int32_t p = 0; p < n_prefixes; p++) {
                uint32_t pl = (uint32_t)prefix_lens[p];
                uint32_t total = (zmark ? 1 : 0) + pl + zl;
                if (total > 245) continue;
                term.clear();
                if (zmark) term += 'Z';
                term.append((const char*)prefix_buf + poffs[p], pl);
                term.append(buf);
                inv->emit(term.data(), (uint32_t)term.size(), wdf_inc, pos);
            }
        }
    }
    return pos_base + last_pos + 1;
}

void xt_inv_add_term(void* h, const uint8_t* term, int32_t len, float wdf,
                     const int32_t* positions, int32_t npos) {
    auto* inv = (xtinv::Inverter*)h;
    bool created = false;
    uint32_t tid = inv->terms.intern((const char*)term, (uint32_t)len,
                                     &created);
    if (created) {
        inv->postings.emplace_back();
        inv->collfreq.push_back(0.0);
        inv->maxwdf.push_back(0.0f);
        inv->sorted_valid = false;
    }
    xtinv::DocTerm& dt = inv->doc_term_for(tid);
    dt.wdf += wdf;
    for (int32_t i = 0; i < npos; i++) dt.pos.push_back(positions[i]);
}

// Bulk boolean filter terms (wdf 0, no positions): one call replaces a
// Python add_term per accuracy/keyword term — geo/date/numeric docs emit
// 100+ such terms each (schema.cc index_term boolean path; GenerateTerms
// src/multivalue/generate_terms.cc emits the per-accuracy bucket terms).
void xt_inv_add_bools(void* h, const uint8_t* buf, const int32_t* lens,
                      int32_t n) {
    auto* inv = (xtinv::Inverter*)h;
    int64_t off = 0;
    for (int32_t i = 0; i < n; i++) {
        inv->emit((const char*)buf + off, (uint32_t)lens[i], 0.0f, -1);
        off += lens[i];
    }
}

// Geo accuracy terms straight from HTM id ranges: for each configured
// level emit "<prefix>#G<level>:<ancestor tid>" per ancestor trixel
// (ancestor = id >> 2*(max_level-level); mirrors
// xapiand_tpu/geo/htm.py ancestors_of_ranges + accuracy.py geo_terms,
// ≙ GenerateTerms::geo, src/multivalue/generate_terms.cc). Dedup across
// overlapping ranges falls out of the per-doc accumulator (wdf += 0).
void xt_inv_add_geo_acc(void* h, const int64_t* starts, const int64_t* ends,
                        int32_t n_ranges, const int32_t* levels,
                        int32_t n_levels, int32_t max_level,
                        const uint8_t* prefix, int32_t plen) {
    auto* inv = (xtinv::Inverter*)h;
    std::string& term = inv->scratch;
    char digits[24];
    for (int32_t li = 0; li < n_levels; li++) {
        int32_t level = levels[li];
        int32_t lv = level < max_level ? level : max_level;
        int32_t shift = 2 * (max_level - lv);
        term.assign((const char*)prefix, (size_t)plen);
        term += "#G";
        int hn = snprintf(digits, sizeof digits, "%d:", level);
        term.append(digits, hn);
        size_t head = term.size();
        int64_t last = -1;  // consecutive ranges often share coarse
                            // ancestors — skip the duplicate emit
        for (int32_t r = 0; r < n_ranges; r++) {
            int64_t a = starts[r] >> shift, b = ends[r] >> shift;
            if (b - a > 4096) b = a + 4096;  // same safety cap as htm.py
            if (a == last) a++;
            for (int64_t tid = a; tid <= b; tid++) {
                term.resize(head);
                auto rc = std::to_chars(digits, digits + sizeof digits,
                                        (long long)tid);
                term.append(digits, rc.ptr - digits);
                inv->emit(term.data(), (uint32_t)term.size(), 0.0f, -1);
            }
            if (b >= last) last = b;
        }
    }
}

// --------------------------------------------------------------------------
// Packed single-crossing document add.
//
// One ctypes call indexes a WHOLE analysed document: text blocks
// (tokenize+stem natively), pre-formatted boolean/weighted terms, geo
// accuracy ranges, and — new here — date and numeric accuracy term
// GENERATION (truncation + formatting) that used to run in Python
// (xapiand_tpu/analysis/accuracy.py date_terms/numeric_terms +
// utils/serialise.py serialise_float_term). ≙ the reference's
// DocPreparer running schema term generation entirely in C++
// (handler.h:256-361; GenerateTerms src/multivalue/generate_terms.cc).
//
// Buffer layout (little-endian, packed by builder.py _pack_doc):
//   sections until buffer end, each starting with u8 kind:
//    1 TERM:    u16 len, bytes, f32 wdf, u16 npos, i32[npos]
//    2 BOOLS:   u16 n, n x (u16 len, bytes)
//    3 TEXT:    u8 nprefix, nprefix x (u16 len, bytes), i32 pos_start,
//               f32 wdf, u8 flags (bit0 with_pos, bits 2-3 stem mode,
//               bits 4-5 stop mode), u32 tlen, ascii bytes
//    4 GEO:     u16 nranges, nranges x (i64 a, i64 b), u8 nlevels,
//               u8[nlevels], u8 max_level, u8 nprefix, x (u16, bytes)
//    5 DATEACC: f64 ts, u8 emit_exact, u8 nunits, u8[nunits] (unit enum
//               below), u8 nprefix, x (u16, bytes)
//    6 NUMACC:  f64 value, u8 emit_exact, u8 naccs, i64[naccs],
//               u8 nprefix, x (u16, bytes)
// --------------------------------------------------------------------------

namespace xtdate {

// civil-calendar day conversions (Howard Hinnant's public-domain
// algorithms; the same math any proleptic-Gregorian implementation uses)
static inline int64_t days_from_civil(int64_t y, unsigned m, unsigned d) {
    y -= m <= 2;
    const int64_t era = (y >= 0 ? y : y - 399) / 400;
    const unsigned yoe = (unsigned)(y - era * 400);
    const unsigned doy = (153 * (m + (m > 2 ? -3 : 9)) + 2) / 5 + d - 1;
    const unsigned doe = yoe * 365 + yoe / 4 - yoe / 100 + doy;
    return era * 146097 + (int64_t)doe - 719468;
}

static inline void civil_from_days(int64_t z, int64_t* y, unsigned* m,
                                   unsigned* d) {
    z += 719468;
    const int64_t era = (z >= 0 ? z : z - 146096) / 146097;
    const unsigned doe = (unsigned)(z - era * 146097);
    const unsigned yoe = (doe - doe / 1460 + doe / 36524 - doe / 146096)
                         / 365;
    const int64_t yy = (int64_t)yoe + era * 400;
    const unsigned doy = doe - (365 * yoe + yoe / 4 - yoe / 100);
    const unsigned mp = (5 * doy + 2) / 153;
    *d = doy - (153 * mp + 2) / 5 + 1;
    *m = mp + (mp < 10 ? 3 : -9);
    *y = yy + (*m <= 2);
}

// units mirror dtutils.DATE_UNITS order
enum Unit { SECOND = 0, MINUTE, HOUR, DAY, MONTH, YEAR, DECADE, CENTURY,
            MILLENNIUM };
static const char* kUnitNames[] = {"second", "minute", "hour", "day",
                                   "month", "year", "decade", "century",
                                   "millennium"};

static inline int64_t floordiv(int64_t a, int64_t b) {
    return (a >= 0) ? a / b : -(((-a) + b - 1) / b);
}

// truncate a POSIX timestamp to a calendar boundary, matching
// dtutils.truncate_to exactly: Python's fromtimestamp rounds to the
// nearest microsecond (half-even) before truncating calendar fields, so
// operate on integer microseconds via llrint.
static double trunc_date(double ts, int unit) {
    int64_t us = (int64_t)llrint(ts * 1e6);
    switch (unit) {
        case SECOND: return (double)floordiv(us, 1000000LL);
        case MINUTE: return (double)(floordiv(us, 60000000LL) * 60);
        case HOUR:   return (double)(floordiv(us, 3600000000LL) * 3600);
        case DAY:    return (double)(floordiv(us, 86400000000LL) * 86400);
        default: break;
    }
    int64_t days = floordiv(us, 86400000000LL);
    int64_t y; unsigned m, d;
    civil_from_days(days, &y, &m, &d);
    switch (unit) {
        case MONTH:      d = 1; break;
        case YEAR:       m = 1; d = 1; break;
        case DECADE:     y -= ((y % 10) + 10) % 10; m = 1; d = 1; break;
        case CENTURY:    y -= ((y % 100) + 100) % 100; m = 1; d = 1; break;
        case MILLENNIUM: y -= ((y % 1000) + 1000) % 1000; m = 1; d = 1;
                         break;
        default: return ts;
    }
    return (double)(days_from_civil(y, m, d) * 86400LL);
}

// utils/serialise.py sortable_key_u64: order-preserving float -> u64
static inline uint64_t sortable_key(double x) {
    if (x == 0.0) x = 0.0;  // normalise -0.0
    uint64_t bits;
    memcpy(&bits, &x, 8);
    if (bits & 0x8000000000000000ULL) return ~bits;
    return bits | 0x8000000000000000ULL;
}

}  // namespace xtdate

namespace xtinv {

static inline uint16_t rd_u16(const uint8_t* p) {
    uint16_t v; memcpy(&v, p, 2); return v;
}
static inline uint32_t rd_u32(const uint8_t* p) {
    uint32_t v; memcpy(&v, p, 4); return v;
}
static inline int32_t rd_i32(const uint8_t* p) {
    int32_t v; memcpy(&v, p, 4); return v;
}
static inline int64_t rd_i64(const uint8_t* p) {
    int64_t v; memcpy(&v, p, 8); return v;
}
static inline float rd_f32(const uint8_t* p) {
    float v; memcpy(&v, p, 4); return v;
}
static inline double rd_f64(const uint8_t* p) {
    double v; memcpy(&v, p, 8); return v;
}

// 16-digit zero-padded lowercase hex (== Python format(v, "016x"))
static inline void append_hex16(std::string& term, uint64_t v) {
    static const char hd[] = "0123456789abcdef";
    char out[16];
    for (int i = 15; i >= 0; i--) { out[i] = hd[v & 15]; v >>= 4; }
    term.append(out, 16);
}

static inline void append_i64(std::string& term, long long v) {
    char d[24];
    auto rc = std::to_chars(d, d + sizeof d, v);
    term.append(d, rc.ptr - d);
}

// emit "<prefix>:<016x sortable>" exact value term + per-accuracy terms
static void emit_date_acc(Inverter* inv, double ts, int emit_exact,
                          const uint8_t* units, int nunits,
                          const uint8_t* prefix, uint32_t plen) {
    std::string& term = inv->scratch;
    if (emit_exact) {
        term.assign((const char*)prefix, plen);
        term += ':';
        append_hex16(term, xtdate::sortable_key(ts));
        inv->emit(term.data(), (uint32_t)term.size(), 0.0f, -1);
    }
    for (int u = 0; u < nunits; u++) {
        int unit = units[u];
        if (unit < 0 || unit > xtdate::MILLENNIUM) continue;
        double t = xtdate::trunc_date(ts, unit);
        term.assign((const char*)prefix, plen);
        term += "#D";
        term += xtdate::kUnitNames[unit];
        term += ':';
        append_i64(term, (long long)t);  // trunc toward zero == Python
        inv->emit(term.data(), (uint32_t)term.size(), 0.0f, -1);
    }
}

static void emit_num_acc(Inverter* inv, double value, int emit_exact,
                         const int64_t* accs, int naccs,
                         const uint8_t* prefix, uint32_t plen) {
    std::string& term = inv->scratch;
    if (emit_exact) {
        term.assign((const char*)prefix, plen);
        term += ':';
        append_hex16(term, xtdate::sortable_key(value));
        inv->emit(term.data(), (uint32_t)term.size(), 0.0f, -1);
    }
    for (int a = 0; a < naccs; a++) {
        long long bucket = (long long)std::floor(value / (double)accs[a]);
        term.assign((const char*)prefix, plen);
        term += '#';
        append_i64(term, (long long)accs[a]);
        term += ':';
        append_i64(term, bucket);
        inv->emit(term.data(), (uint32_t)term.size(), 0.0f, -1);
    }
}

}  // namespace xtinv

void xt_inv_end_doc(void* h, double* doclen_out, int32_t* uniq_out);

// returns 0 on success, -1 on malformed buffer / non-ASCII text (no
// Python fallback should ever hit this: builder.py validates first)
int32_t xt_inv_add_doc(void* h, int32_t docid, const uint8_t* buf,
                       int64_t blen, double* doclen_out,
                       int32_t* uniq_out) {
    auto* inv = (xtinv::Inverter*)h;
    xt_inv_begin_doc(h, docid);
    const uint8_t* p = buf;
    const uint8_t* end = buf + blen;
    int64_t termpos = 0;
    // local prefix scratch (16 max, same ABI cap as xt_inv_index_text)
    const uint8_t* pptr[16];
    int32_t plen_arr[16];
    while (p < end) {
        uint8_t kind = *p++;
        switch (kind) {
            case 1: {  // TERM
                if (p + 2 > end) return -1;
                uint16_t len = xtinv::rd_u16(p); p += 2;
                const uint8_t* t = p; p += len;
                if (p + 6 > end) return -1;
                float wdf = xtinv::rd_f32(p); p += 4;
                uint16_t npos = xtinv::rd_u16(p); p += 2;
                if (p + 4LL * npos > end) return -1;
                if (npos) {
                    std::vector<int32_t> pos(npos);  // unaligned-safe
                    memcpy(pos.data(), p, 4LL * npos);
                    xt_inv_add_term(h, t, len, wdf, pos.data(), npos);
                } else {
                    xt_inv_add_term(h, t, len, wdf, nullptr, 0);
                }
                p += 4LL * npos;
                break;
            }
            case 2: {  // BOOLS
                if (p + 2 > end) return -1;
                uint16_t n = xtinv::rd_u16(p); p += 2;
                for (uint16_t i = 0; i < n; i++) {
                    if (p + 2 > end) return -1;
                    uint16_t len = xtinv::rd_u16(p); p += 2;
                    if (p + len > end) return -1;
                    inv->emit((const char*)p, len, 0.0f, -1);
                    p += len;
                }
                break;
            }
            case 3: {  // TEXT
                if (p + 1 > end) return -1;
                uint8_t np = *p++;
                if (np > 16) return -1;
                // prefixes are contiguous in the buffer; index_text wants
                // one concatenated block + lens, which is exactly how
                // they're packed
                const uint8_t* pfx0 = nullptr;
                int32_t total_plen = 0;
                for (uint8_t i = 0; i < np; i++) {
                    if (p + 2 > end) return -1;
                    uint16_t pl = xtinv::rd_u16(p); p += 2;
                    if (p + pl > end) return -1;
                    pptr[i] = p;
                    plen_arr[i] = pl;
                    if (i == 0) pfx0 = p;
                    total_plen += pl;
                    p += pl;
                }
                if (p + 13 > end) return -1;
                int32_t pos_start = xtinv::rd_i32(p); p += 4;
                float wdf = xtinv::rd_f32(p); p += 4;
                uint8_t flags = *p++;
                uint32_t tlen = xtinv::rd_u32(p); p += 4;
                if (p + tlen > end) return -1;
                // prefixes packed with 2-byte length headers between them
                // are NOT contiguous; rebuild a contiguous block in
                // scratch only when more than one prefix
                int64_t base = termpos > pos_start ? termpos : pos_start;
                int64_t r;
                if (np <= 1) {
                    r = xt_inv_index_text(h, p, tlen,
                                          np ? pfx0 : (const uint8_t*)"",
                                          plen_arr, np, base, wdf,
                                          flags & 1, (flags >> 2) & 3,
                                          (flags >> 4) & 3);
                } else {
                    std::string pblock;
                    pblock.reserve(total_plen);
                    for (uint8_t i = 0; i < np; i++)
                        pblock.append((const char*)pptr[i], plen_arr[i]);
                    r = xt_inv_index_text(h, p, tlen,
                                          (const uint8_t*)pblock.data(),
                                          plen_arr, np, base, wdf,
                                          flags & 1, (flags >> 2) & 3,
                                          (flags >> 4) & 3);
                }
                if (r < 0) return -1;
                termpos = r + 100;  // ≙ tg.increase_termpos between fields
                p += tlen;
                break;
            }
            case 4: {  // GEO
                if (p + 2 > end) return -1;
                uint16_t nr = xtinv::rd_u16(p); p += 2;
                if (p + 16LL * nr > end) return -1;
                const uint8_t* ranges = p; p += 16LL * nr;
                if (p + 1 > end) return -1;
                uint8_t nl = *p++;
                if (p + nl + 1 > end) return -1;
                const uint8_t* levels = p; p += nl;
                uint8_t max_level = *p++;
                if (p + 1 > end) return -1;
                uint8_t np = *p++;
                std::vector<int64_t> starts(nr), ends(nr);
                int32_t lv32[256];
                for (uint16_t i = 0; i < nr; i++) {
                    starts[i] = xtinv::rd_i64(ranges + 16LL * i);
                    ends[i] = xtinv::rd_i64(ranges + 16LL * i + 8);
                }
                for (uint8_t i = 0; i < nl; i++) lv32[i] = levels[i];
                for (uint8_t i = 0; i < np; i++) {
                    if (p + 2 > end) return -1;
                    uint16_t pl = xtinv::rd_u16(p); p += 2;
                    if (p + pl > end) return -1;
                    xt_inv_add_geo_acc(h, starts.data(), ends.data(), nr,
                                       lv32, nl, max_level, p, pl);
                    p += pl;
                }
                break;
            }
            case 5: {  // DATEACC
                if (p + 10 > end) return -1;
                double ts = xtinv::rd_f64(p); p += 8;
                uint8_t emit_exact = *p++;
                uint8_t nu = *p++;
                if (p + nu + 1 > end) return -1;
                const uint8_t* units = p; p += nu;
                uint8_t np = *p++;
                for (uint8_t i = 0; i < np; i++) {
                    if (p + 2 > end) return -1;
                    uint16_t pl = xtinv::rd_u16(p); p += 2;
                    if (p + pl > end) return -1;
                    xtinv::emit_date_acc(inv, ts, emit_exact, units, nu,
                                         p, pl);
                    p += pl;
                }
                break;
            }
            case 6: {  // NUMACC
                if (p + 10 > end) return -1;
                double value = xtinv::rd_f64(p); p += 8;
                uint8_t emit_exact = *p++;
                uint8_t na = *p++;
                if (na > 32 || p + 8LL * na + 1 > end) return -1;
                int64_t accs[32];  // unaligned-safe copy
                for (uint8_t i = 0; i < na; i++)
                    accs[i] = xtinv::rd_i64(p + 8LL * i);
                p += 8LL * na;
                uint8_t np = *p++;
                for (uint8_t i = 0; i < np; i++) {
                    if (p + 2 > end) return -1;
                    uint16_t pl = xtinv::rd_u16(p); p += 2;
                    if (p + pl > end) return -1;
                    xtinv::emit_num_acc(inv, value, emit_exact, accs, na,
                                        p, pl);
                    p += pl;
                }
                break;
            }
            default:
                return -1;
        }
    }
    xt_inv_end_doc(h, doclen_out, uniq_out);
    return 0;
}

void xt_inv_end_doc(void* h, double* doclen_out, int32_t* uniq_out) {
    auto* inv = (xtinv::Inverter*)h;
    double doclen = 0.0;
    for (size_t i = 0; i < inv->doc_used; i++) {
        xtinv::DocTerm& dt = inv->doc_terms[i];
        int32_t posoff = 0, poslen = (int32_t)dt.pos.size();
        if (poslen) {
            // positions are appended in ascending order on the text path;
            // add_term merges may interleave - keep them sorted like the
            // Python builder (sorted(plist))
            for (size_t j = 1; j < dt.pos.size(); j++)
                if (dt.pos[j] < dt.pos[j - 1]) {
                    std::sort(dt.pos.begin(), dt.pos.end());
                    break;
                }
            posoff = (int32_t)inv->positions.size();
            inv->positions.insert(inv->positions.end(), dt.pos.begin(),
                                  dt.pos.end());
        }
        inv->postings[dt.tid].push(
            {inv->cur_doc, dt.wdf, posoff, poslen});
        inv->collfreq[dt.tid] += dt.wdf;
        if (dt.wdf > inv->maxwdf[dt.tid]) inv->maxwdf[dt.tid] = dt.wdf;
        doclen += dt.wdf;
    }
    *doclen_out = doclen;
    *uniq_out = (int32_t)inv->doc_used;
    inv->cur_doc = -1;
}

void xt_inv_counts(void* h, int64_t* n_terms, int64_t* n_postings,
                   int64_t* n_positions, int64_t* term_bytes,
                   int64_t* max_post_len) {
    auto* inv = (xtinv::Inverter*)h;
    *n_terms = (int64_t)inv->terms.refs.size();
    int64_t np = 0, mx = 0;
    for (const auto& pl : inv->postings) {
        np += (int64_t)pl.size();
        if ((int64_t)pl.size() > mx) mx = (int64_t)pl.size();
    }
    *n_postings = np;
    *n_positions = (int64_t)inv->positions.size();
    // +1 per term: export NUL-separates terms so Python can rebuild the
    // whole term list with ONE str.split instead of a per-term loop
    *term_bytes = (int64_t)(inv->terms.arena.size() + inv->terms.refs.size());
    *max_post_len = mx;
}

void xt_inv_export(void* h, uint8_t* term_buf, int32_t* term_lens,
                   int64_t* post_offsets, double* collfreq_out,
                   float* maxwdf_out, int32_t* post_docids, float* post_wdf,
                   int32_t* post_posoff, int32_t* post_poslen,
                   int32_t* positions_out) {
    auto* inv = (xtinv::Inverter*)h;
    size_t nt = inv->terms.refs.size();
    if (!inv->sorted_valid) {
        inv->sorted_tids.resize(nt);
        const xtinv::StrTable& T = inv->terms;
        // sort on a big-endian 8-byte prefix key first: most comparisons
        // resolve in one u64 compare over a contiguous 16-byte-stride
        // array instead of two random arena reads + memcmp (a 20k-doc
        // geo corpus sorts 2.2M terms here)
        struct KeyTid { uint64_t key; uint32_t tid; uint32_t pad; };
        std::vector<KeyTid> kt(nt);
        for (size_t i = 0; i < nt; i++) {
            const char* s = T.str((uint32_t)i);
            uint32_t l = T.len((uint32_t)i);
            uint64_t k = 0;
            uint32_t n = l < 8 ? l : 8;
            for (uint32_t j = 0; j < n; j++)
                k |= (uint64_t)(uint8_t)s[j] << (56 - 8 * j);
            kt[i] = {k, (uint32_t)i, 0};
        }
        std::sort(kt.begin(), kt.end(),
                  [&T](const KeyTid& x, const KeyTid& y) {
                      if (x.key != y.key) return x.key < y.key;
                      uint32_t la = T.len(x.tid), lb = T.len(y.tid);
                      if (la <= 8 || lb <= 8) return la < lb;
                      int c = memcmp(T.str(x.tid) + 8, T.str(y.tid) + 8,
                                     (la < lb ? la : lb) - 8);
                      if (c) return c < 0;
                      return la < lb;
                  });
        for (size_t i = 0; i < nt; i++) inv->sorted_tids[i] = kt[i].tid;
        inv->sorted_valid = true;
    }
    uint8_t* tb = term_buf;
    int64_t off = 0;
    for (size_t i = 0; i < nt; i++) {
        uint32_t tid = inv->sorted_tids[i];
        uint32_t l = inv->terms.len(tid);
        memcpy(tb, inv->terms.str(tid), l);
        tb += l;
        *tb++ = 0;  // separator (see xt_inv_counts term_bytes)
        term_lens[i] = (int32_t)l;
        post_offsets[i] = off;
        const auto& pl = inv->postings[tid];
        if (pl.n) {
            post_docids[off] = pl.first.docid;
            post_wdf[off] = pl.first.wdf;
            post_posoff[off] = pl.first.posoff;
            post_poslen[off] = pl.first.poslen;
            off++;
            for (const auto& pr : pl.rest) {
                post_docids[off] = pr.docid;
                post_wdf[off] = pr.wdf;
                post_posoff[off] = pr.posoff;
                post_poslen[off] = pr.poslen;
                off++;
            }
        }
        collfreq_out[i] = inv->collfreq[tid];
        maxwdf_out[i] = inv->maxwdf[tid];
    }
    post_offsets[nt] = off;
    if (!inv->positions.empty())
        memcpy(positions_out, inv->positions.data(),
               inv->positions.size() * sizeof(int32_t));
}

}  // extern "C"

// ---------------------------------------------------------------------------
// HTM cap cover: a bit-identical port of geo/htm.py Cap.classify + cover()
// (reference: src/geospatial/htm.cc getTrixels). Geo extraction dominates
// geotagged indexing time in Python; covers are pure double math, so the
// same IEEE operations in the same order reproduce the exact ranges
// (build with -ffp-contract=off so GCC does not fuse into FMAs).
// ---------------------------------------------------------------------------

namespace htmcap {

struct V3 { double x, y, z; };

static inline V3 v3(double x, double y, double z) { return V3{x, y, z}; }
static inline double dot(const V3& a, const V3& b) {
    return a.x * b.x + a.y * b.y + a.z * b.z;
}
static inline V3 cross(const V3& a, const V3& b) {
    return v3(a.y * b.z - a.z * b.y,
              a.z * b.x - a.x * b.z,
              a.x * b.y - a.y * b.x);
}
static inline V3 normalize(const V3& v) {
    double n = sqrt(v.x * v.x + v.y * v.y + v.z * v.z);
    return v3(v.x / n, v.y / n, v.z / n);
}
static inline V3 midpoint(const V3& a, const V3& b) {
    return normalize(v3(a.x + b.x, a.y + b.y, a.z + b.z));
}
static inline double clamp1(double d) {
    return d > 1.0 ? 1.0 : (d < -1.0 ? -1.0 : d);
}
static inline double angle_between(const V3& a, const V3& b) {
    return acos(clamp1(dot(a, b)));
}

// WGS84 (geo/cartesian.py toCartesian)
static V3 to_cartesian(double lat_deg, double lon_deg) {
    const double A = 6378137.0;
    const double E2 = 0.00669437999014132;
    double lat = lat_deg * (M_PI / 180.0);
    double lon = lon_deg * (M_PI / 180.0);
    double cos_lat = cos(lat), sin_lat = sin(lat);
    double n = A / sqrt(1.0 - E2 * sin_lat * sin_lat);
    double x = n * cos_lat * cos(lon);
    double y = n * cos_lat * sin(lon);
    double z = n * (1.0 - E2) * sin_lat;
    return normalize(v3(x, y, z));
}

static const double EPS = -1e-12;

static inline bool tri_contains(const V3& a, const V3& b, const V3& c,
                                const V3& p) {
    return dot(cross(a, b), p) >= EPS
        && dot(cross(b, c), p) >= EPS
        && dot(cross(c, a), p) >= EPS;
}

static double edge_min_angle(const V3& u, const V3& v, const V3& p) {
    V3 n = cross(u, v);
    double nn = sqrt(dot(n, n));
    if (nn == 0) return angle_between(u, p);
    n = v3(n.x / nn, n.y / nn, n.z / nn);
    double d = dot(n, p);
    V3 proj = normalize(v3(p.x - d * n.x, p.y - d * n.y, p.z - d * n.z));
    if (dot(cross(u, proj), n) >= 0 && dot(cross(proj, v), n) >= 0) {
        return fabs(asin(clamp1(d)));
    }
    double au = angle_between(u, p), av = angle_between(v, p);
    return au < av ? au : av;
}

struct Cap {
    V3 center;
    double radius, cos_r;
    // -1 disjoint, 0 partial, 1 inside (htm.py Cap.classify)
    int classify(const V3& a, const V3& b, const V3& c) const {
        int ins = (dot(center, a) >= cos_r) + (dot(center, b) >= cos_r)
                + (dot(center, c) >= cos_r);
        if (ins == 3) return 1;
        if (ins > 0) return 0;
        if (tri_contains(a, b, c, center)) return 0;
        if (edge_min_angle(a, b, center) <= radius) return 0;
        if (edge_min_angle(b, c, center) <= radius) return 0;
        if (edge_min_angle(c, a, center) <= radius) return 0;
        return -1;
    }
};

struct Frame { int lvl; int32_t tid; V3 a, b, c; };

}  // namespace htmcap

extern "C" int64_t xt_htm_cap_cover(double lat, double lon,
                                    double radius_rad, int32_t level,
                                    int32_t* out, int64_t max_pairs) {
    using namespace htmcap;
    const int MAX_LEVEL = 13;
    Cap cap;
    cap.center = to_cartesian(lat, lon);
    cap.radius = radius_rad;
    cap.cos_r = cos(radius_rad < M_PI ? radius_rad : M_PI);

    const V3 P0 = v3(0, 0, 1), P1 = v3(1, 0, 0), P2 = v3(0, 1, 0),
             P3 = v3(-1, 0, 0), P4 = v3(0, -1, 0), P5 = v3(0, 0, -1);
    std::vector<Frame> stack;
    stack.reserve(64);
    // canonical SDSS roots, same order as htm.py _ROOTS
    stack.push_back({0, 8, P1, P5, P2});
    stack.push_back({0, 9, P2, P5, P3});
    stack.push_back({0, 10, P3, P5, P4});
    stack.push_back({0, 11, P4, P5, P1});
    stack.push_back({0, 12, P1, P0, P4});
    stack.push_back({0, 13, P4, P0, P3});
    stack.push_back({0, 14, P3, P0, P2});
    stack.push_back({0, 15, P2, P0, P1});

    std::vector<std::pair<int32_t, int32_t>> ranges;
    while (!stack.empty()) {
        Frame f = stack.back();
        stack.pop_back();
        int cl = cap.classify(f.a, f.b, f.c);
        if (cl == -1) continue;
        if (cl == 1 || f.lvl >= level) {
            int shift = 2 * (MAX_LEVEL - f.lvl);
            ranges.push_back({(int32_t)(f.tid << shift),
                              (int32_t)((((int64_t)f.tid + 1) << shift) - 1)});
            continue;
        }
        V3 w0 = midpoint(f.b, f.c), w1 = midpoint(f.a, f.c),
           w2 = midpoint(f.a, f.b);
        stack.push_back({f.lvl + 1, (int32_t)(f.tid * 4 + 0), f.a, w2, w1});
        stack.push_back({f.lvl + 1, (int32_t)(f.tid * 4 + 1), f.b, w0, w2});
        stack.push_back({f.lvl + 1, (int32_t)(f.tid * 4 + 2), f.c, w1, w0});
        stack.push_back({f.lvl + 1, (int32_t)(f.tid * 4 + 3), w0, w1, w2});
    }
    std::sort(ranges.begin(), ranges.end());
    int64_t n = 0;
    for (auto& r : ranges) {
        if (n > 0 && r.first <= out[2 * (n - 1) + 1] + 1) {
            if (r.second > out[2 * (n - 1) + 1]) out[2 * (n - 1) + 1] = r.second;
        } else {
            if (n >= max_pairs) return -1;  // cover too fine for the buffer
            out[2 * n] = r.first;
            out[2 * n + 1] = r.second;
            n++;
        }
    }
    return n;
}

// ---------------------------------------------------------------------------
// Host latency-path scorer (serving plane).
//
// The device batch path amortizes the host<->TPU tunnel cost across wide
// query batches (bench.py: 16k QPS at 1M docs), but a LONE interactive
// query pays the full readback sync (~9ms measured through the tunnel,
// scripts/tunnel_probe.py) - an order of magnitude above the reference's
// served p50 of 15ms budget once aiohttp + planning are added. The serving
// plane therefore routes small plain-relevance queries through this native
// TAAT scorer over the same immutable flat segment arrays, and keeps the
// device for batches / heavy operators where it wins. Results are
// bit-comparable to the float64 numpy oracle (bench.py cpu_baseline):
// float64 accumulation in term order, top-k by (score desc, docid asc).
//
// ~ the reference's single-threaded matcher hot loop
// (/root/reference/src/xapian/matcher/matcher.cc:179-560) - but TAAT over
// flat postings slabs instead of a DAAT iterator tree over B-trees.
// ---------------------------------------------------------------------------

namespace xtscore {

struct TopK {
    // fixed-k min-heap ordered worst-first: worst = lower score, then
    // HIGHER docid (ties rank docid-ascending, Xapian docid_order ASC)
    int32_t k = 0, n = 0;
    double* hs;
    int32_t* hd;
    static bool worse(double sa, int32_t da, double sb, int32_t db) {
        return sa < sb || (sa == sb && da > db);
    }
    void push(double s, int32_t d) {
        if (n < k) {
            int i = n++;
            hs[i] = s; hd[i] = d;
            while (i > 0) {
                int p = (i - 1) / 2;
                if (!worse(hs[i], hd[i], hs[p], hd[p])) break;
                std::swap(hs[i], hs[p]); std::swap(hd[i], hd[p]);
                i = p;
            }
        } else if (worse(hs[0], hd[0], s, d)) {
            hs[0] = s; hd[0] = d;
            int i = 0;
            for (;;) {
                int l = 2 * i + 1, r = l + 1, m = i;
                if (l < n && worse(hs[l], hd[l], hs[m], hd[m])) m = l;
                if (r < n && worse(hs[r], hd[r], hs[m], hd[m])) m = r;
                if (m == i) break;
                std::swap(hs[i], hs[m]); std::swap(hd[i], hd[m]);
                i = m;
            }
        }
    }
};

}  // namespace xtscore

extern "C" int64_t xt_score_topk(
    const int32_t* post_docids, const float* post_wdf,
    const float* post_doclen,
    const uint8_t* deleted, int32_t has_deletes,
    const int64_t* offsets, const int64_t* lens, const double* tconst,
    int32_t n_terms,
    double k1, double b, double min_normlen, double lf,
    double* acc, uint8_t* seen, int32_t* touched,
    int32_t k, int32_t* out_docids, double* out_scores) {
    // BM25 sumpart (models/weights.py BM25.sumpart = bm25weight.cc:171):
    //   normlen = max(doclen * lf, min_normlen)
    //   w = tconst * wdf / max(k1*(normlen*b + (1-b)) + wdf, 1e-9)
    // acc/seen are caller-owned scratch sized [num_docs], zeroed on entry
    // and re-zeroed here before returning (touched-list reset).
    int64_t ntouch = 0;
    const double one_minus_b = 1.0 - b;
    for (int32_t t = 0; t < n_terms; t++) {
        const int64_t off = offsets[t], ln = lens[t];
        const double tc = tconst[t];
        for (int64_t i = off; i < off + ln; i++) {
            const int32_t d = post_docids[i];
            if (has_deletes && deleted[d]) continue;
            if (!seen[d]) { seen[d] = 1; touched[ntouch++] = d; }
            if (tc != 0.0) {
                const double wdf = (double)post_wdf[i];
                double normlen = (double)post_doclen[i] * lf;
                if (normlen < min_normlen) normlen = min_normlen;
                double denom = k1 * (normlen * b + one_minus_b) + wdf;
                if (denom < 1e-9) denom = 1e-9;
                acc[d] += tc * (wdf / denom);
            }
        }
    }
    xtscore::TopK top;
    top.k = k;
    std::vector<double> hs(k);
    std::vector<int32_t> hd(k);
    top.hs = hs.data(); top.hd = hd.data();
    for (int64_t i = 0; i < ntouch; i++) {
        const int32_t d = touched[i];
        top.push(acc[d], d);
        acc[d] = 0.0;
        seen[d] = 0;
    }
    // heap -> descending (score, docid asc) order by repeated pop-min
    for (int32_t i = top.n - 1; i >= 0; i--) {
        out_docids[i] = top.hd[0];
        out_scores[i] = top.hs[0];
        top.hs[0] = top.hs[--top.n < 1 ? 0 : top.n];
        top.hd[0] = top.hd[top.n < 1 ? 0 : top.n];
        if (top.n > 0) {   // sift down
            int j = 0;
            for (;;) {
                int l = 2 * j + 1, r = l + 1, m = j;
                if (l < top.n && xtscore::TopK::worse(top.hs[l], top.hd[l],
                                                      top.hs[m], top.hd[m]))
                    m = l;
                if (r < top.n && xtscore::TopK::worse(top.hs[r], top.hd[r],
                                                      top.hs[m], top.hd[m]))
                    m = r;
                if (m == j) break;
                std::swap(top.hs[j], top.hs[m]);
                std::swap(top.hd[j], top.hd[m]);
                j = m;
            }
        }
    }
    return ntouch;
}

extern "C" void xt_score_topk_many(
    const int32_t* post_docids, const float* post_wdf,
    const float* post_doclen,
    const uint8_t* deleted, int32_t has_deletes,
    const int64_t* offsets, const int64_t* lens, const double* tconst,
    const int32_t* q_start, const int32_t* q_nterms, int32_t n_queries,
    double k1, double b, double min_normlen, double lf,
    double* acc, uint8_t* seen, int32_t* touched,
    int32_t k, int32_t* out_docids, double* out_scores,
    int64_t* out_counts) {
    // batched variant: one ctypes crossing for a whole query list; terms
    // are flattened (query i owns offsets[q_start[i] .. +q_nterms[i]])
    for (int32_t q = 0; q < n_queries; q++) {
        out_counts[q] = xt_score_topk(
            post_docids, post_wdf, post_doclen, deleted, has_deletes,
            offsets + q_start[q], lens + q_start[q], tconst + q_start[q],
            q_nterms[q], k1, b, min_normlen, lf, acc, seen, touched,
            k, out_docids + (int64_t)q * k, out_scores + (int64_t)q * k);
    }
}

extern "C" void xt_score_topk_global(
    int32_t n_segs,
    const int64_t* seg_docids_ptrs, const int64_t* seg_wdf_ptrs,
    const int64_t* seg_doclen_ptrs, const int64_t* seg_deleted_ptrs,
    const int64_t* offsets, const int64_t* lens,   // [n_segs * n_terms]
    const double* tconst, int32_t n_terms,
    const int32_t* q_start, const int32_t* q_nterms, int32_t n_queries,
    double k1, double b, double min_normlen, double lf,
    double* acc, uint8_t* seen, int32_t* touched,  // sized max seg nd
    int32_t k,
    int32_t* out_seg, int32_t* out_docids, double* out_scores,  // [nq*k]
    int64_t* out_counts) {
    // whole-database latency path: one crossing scores a query (or a
    // small batch) across EVERY segment and returns the GLOBALLY merged
    // top-k with the engine's exact order contract: score desc, then
    // (segment, docid) asc - Database._tiebreak insertion order.
    // offsets/lens are laid out [seg][flat_term] where flat_term indexes
    // the concatenated per-query term lists (q_start/q_nterms), i.e.
    // row s holds segment s's postings slots for all queries' terms.
    const double one_minus_b = 1.0 - b;
    const int64_t total_terms = q_start[n_queries - 1] +
                                q_nterms[n_queries - 1];
    for (int32_t q = 0; q < n_queries; q++) {
        // worst-first heap over (score, seg, docid)
        std::vector<double> hs(k);
        std::vector<int64_t> hsd(k);  // (seg<<32)|docid packed, asc order
        int32_t hn = 0;
        auto hworse = [](double sa, int64_t pa, double sb, int64_t pb) {
            return sa < sb || (sa == sb && pa > pb);
        };
        auto hpush = [&](double s, int64_t p) {
            if (hn < k) {
                int i = hn++;
                hs[i] = s; hsd[i] = p;
                while (i > 0) {
                    int par = (i - 1) / 2;
                    if (!hworse(hs[i], hsd[i], hs[par], hsd[par])) break;
                    std::swap(hs[i], hs[par]); std::swap(hsd[i], hsd[par]);
                    i = par;
                }
            } else if (hworse(hs[0], hsd[0], s, p)) {
                hs[0] = s; hsd[0] = p;
                int i = 0;
                for (;;) {
                    int l = 2 * i + 1, r = l + 1, m = i;
                    if (l < hn && hworse(hs[l], hsd[l], hs[m], hsd[m])) m = l;
                    if (r < hn && hworse(hs[r], hsd[r], hs[m], hsd[m])) m = r;
                    if (m == i) break;
                    std::swap(hs[i], hs[m]); std::swap(hsd[i], hsd[m]);
                    i = m;
                }
            }
        };
        int64_t total_count = 0;
        for (int32_t s = 0; s < n_segs; s++) {
            const int32_t* docids = (const int32_t*)seg_docids_ptrs[s];
            const float* wdfv = (const float*)seg_wdf_ptrs[s];
            const float* dlv = (const float*)seg_doclen_ptrs[s];
            const uint8_t* del = (const uint8_t*)seg_deleted_ptrs[s];
            const int64_t* offs = offsets + (int64_t)s * total_terms +
                                  q_start[q];
            const int64_t* lns = lens + (int64_t)s * total_terms +
                                 q_start[q];
            const double* tcs = tconst + q_start[q];
            int64_t ntouch = 0;
            for (int32_t t = 0; t < q_nterms[q]; t++) {
                const int64_t off = offs[t], ln = lns[t];
                const double tc = tcs[t];
                for (int64_t i = off; i < off + ln; i++) {
                    const int32_t d = docids[i];
                    if (del && del[d]) continue;
                    if (!seen[d]) { seen[d] = 1; touched[ntouch++] = d; }
                    if (tc != 0.0) {
                        const double wdf = (double)wdfv[i];
                        double normlen = (double)dlv[i] * lf;
                        if (normlen < min_normlen) normlen = min_normlen;
                        double denom = k1 * (normlen * b + one_minus_b)
                                       + wdf;
                        if (denom < 1e-9) denom = 1e-9;
                        acc[d] += tc * (wdf / denom);
                    }
                }
            }
            total_count += ntouch;
            for (int64_t i = 0; i < ntouch; i++) {
                const int32_t d = touched[i];
                hpush(acc[d], ((int64_t)s << 32) | (uint32_t)d);
                acc[d] = 0.0;
                seen[d] = 0;
            }
        }
        out_counts[q] = total_count;
        int32_t* od = out_docids + (int64_t)q * k;
        int32_t* os = out_seg + (int64_t)q * k;
        double* osc = out_scores + (int64_t)q * k;
        for (int32_t i = hn - 1; i >= 0; i--) {
            od[i] = (int32_t)(hsd[0] & 0xffffffff);
            os[i] = (int32_t)(hsd[0] >> 32);
            osc[i] = hs[0];
            hn--;
            if (hn > 0) {
                hs[0] = hs[hn]; hsd[0] = hsd[hn];
                int j = 0;
                for (;;) {
                    int l = 2 * j + 1, r = l + 1, m = j;
                    if (l < hn && hworse(hs[l], hsd[l], hs[m], hsd[m]))
                        m = l;
                    if (r < hn && hworse(hs[r], hsd[r], hs[m], hsd[m]))
                        m = r;
                    if (m == j) break;
                    std::swap(hs[j], hs[m]); std::swap(hsd[j], hsd[m]);
                    j = m;
                }
            }
        }
    }
}

// ---------------------------------------------------------------------------
// Conjunctive host query executor (serving + faceted/geo latency path).
//
// AND-trees of term groups with value-range / HTM-geo predicate leaves,
// single-key value sorts and flat aggregations are GATHER-bound: the device
// pipeline pays ~30 serialized cycles per random element touched (chip
// measurements in CLAUDE.md), while candidate sets after an AND are small
// and the value columns fit in cache here. This executor walks the smallest
// conjunct's postings and verifies the rest with binary searches - the
// reference's DAAT matcher shape (xapian/matcher/matcher.cc:179-560,
// queryoptimiser AND ordering) on our flat immutable arrays. Exact same
// results as the device executor: BM25 float64 in term order, match =
// tree semantics, ties (score desc, docid asc), value-sort key identical
// ((~)hi/lo with absent-last), counts exact, agg partials in the same
// sufficient-statistic shapes.
// ---------------------------------------------------------------------------

#include <map>

static inline int64_t q_nterms_total(const int32_t* g_start,
                                     const int32_t* g_nterms,
                                     int32_t n_groups) {
    return n_groups > 0
        ? (int64_t)g_start[n_groups - 1] + g_nterms[n_groups - 1] : 0;
}

namespace xtq {

struct ValCol {
    const uint8_t* present;
    const int32_t *hi, *lo, *max_hi, *max_lo;
    const float* fval;
    const int32_t* cats;
    int32_t ncats;
    const int32_t *mv_off, *mv_len, *mv_hi, *mv_lo;
};

struct GeoCol {
    const int32_t* doc_off;
    const int32_t* doc_len;
    const int32_t *flat_start, *flat_end;
};

struct QSeg {
    const int32_t* docids;
    const float* wdf;
    const float* dl;
    const uint8_t* deleted;
    int32_t has_del;
    int32_t nd;
    const int32_t* posoff = nullptr;   // per-posting span into positions
    const int32_t* poslen = nullptr;
    const int32_t* positions = nullptr;
    // derived bigram (nextword) index: 2-term exact phrases resolve to a
    // plain docid list, no positional verification (built once from the
    // SAME position arrays the positional checker reads, so adjacency
    // semantics match by construction). Keyed by (off_a<<32)|off_b where
    // off_* are the terms' posting offsets (unique per term).
    int32_t bigram_built = 0;
    int64_t bigram_minlen = 0;         // both terms need len >= minlen
    std::vector<uint64_t> bg_keys;     // sorted unique pair keys
    std::vector<int64_t> bg_off;       // CSR, size bg_keys.size()+1
    std::vector<int32_t> bg_docids;    // sorted unique docids per pair
    std::map<int32_t, ValCol> vals;
    std::map<int32_t, GeoCol> geos;
    std::vector<double> acc;
    std::vector<uint8_t> seen;
    std::vector<int32_t> touched;
};

static inline bool lex_ge(int32_t ah, int32_t al, int32_t bh, int32_t bl) {
    return ah > bh || (ah == bh && al >= bl);
}
static inline bool lex_le(int32_t ah, int32_t al, int32_t bh, int32_t bl) {
    return ah < bh || (ah == bh && al <= bl);
}

}  // namespace xtq

extern "C" void* xt_qseg_new(const int32_t* docids, const float* wdf,
                             const float* dl, const uint8_t* deleted,
                             int32_t has_del, int32_t nd) {
    auto* s = new xtq::QSeg();
    s->docids = docids; s->wdf = wdf; s->dl = dl;
    s->deleted = deleted; s->has_del = has_del; s->nd = nd;
    s->acc.assign(nd > 0 ? nd : 1, 0.0);
    s->seen.assign(nd > 0 ? nd : 1, 0);
    s->touched.resize(nd > 0 ? nd : 1);
    return s;
}

extern "C" void xt_qseg_free(void* h) { delete (xtq::QSeg*)h; }

extern "C" void xt_qseg_add_valcol(
    void* h, int32_t slot, const uint8_t* present,
    const int32_t* hi, const int32_t* lo,
    const int32_t* max_hi, const int32_t* max_lo,
    const float* fval, const int32_t* cats, int32_t ncats,
    const int32_t* mv_off, const int32_t* mv_len,
    const int32_t* mv_hi, const int32_t* mv_lo) {
    auto* s = (xtq::QSeg*)h;
    s->vals[slot] = {present, hi, lo, max_hi, max_lo, fval, cats, ncats,
                     mv_off, mv_len, mv_hi, mv_lo};
}

extern "C" void xt_qseg_set_positions(void* h, const int32_t* posoff,
                                      const int32_t* poslen,
                                      const int32_t* positions) {
    auto* s = (xtq::QSeg*)h;
    s->posoff = posoff; s->poslen = poslen; s->positions = positions;
}

// Build the derived bigram (nextword) index from the registered position
// arrays: every adjacent pair of token occurrences (same doc, pos+1) over
// terms with posting length >= minlen becomes an entry in a sorted
// (pair_key -> unique docid list) table. ~ nextword indexes (Williams &
// Zobel); the reference has no analog - it pays positional verification
// per candidate (xapian/matcher/phrasepostlist.cc), which is the measured
// cfg2 bottleneck (31,889 true adjacency matches for one common-word
// phrase at 100k docs). Returns #pairs, -1 if positions unregistered,
// -2 if an offset exceeds 32 bits (caller disables bigrams).
extern "C" int64_t xt_qseg_build_bigrams(void* h, const int64_t* t_off,
                                         const int64_t* t_len,
                                         int64_t nterms, int64_t minlen) {
    auto* S = (xtq::QSeg*)h;
    if (!S->posoff || !S->positions) return -1;
    struct Occ { uint64_t dp; uint32_t tid; };
    std::vector<Occ> occ;
    int64_t cap = 0;
    for (int64_t t = 0; t < nterms; t++) {
        if (t_len[t] < minlen) continue;
        if ((uint64_t)t_off[t] >> 32) return -2;
        for (int64_t i = t_off[t]; i < t_off[t] + t_len[t]; i++)
            cap += S->poslen[i];
    }
    occ.reserve((size_t)cap);
    for (int64_t t = 0; t < nterms; t++) {
        if (t_len[t] < minlen) continue;
        const uint32_t tid = (uint32_t)t_off[t];
        for (int64_t i = t_off[t]; i < t_off[t] + t_len[t]; i++) {
            const uint32_t d = (uint32_t)S->docids[i];
            const int32_t po = S->posoff[i], pl = S->poslen[i];
            for (int32_t j = 0; j < pl; j++)
                occ.push_back({((uint64_t)d << 32) |
                               (uint32_t)S->positions[po + j], tid});
        }
    }
    std::sort(occ.begin(), occ.end(),
              [](const Occ& a, const Occ& b) { return a.dp < b.dp; });
    struct Pair { uint64_t key; int32_t d; };
    std::vector<Pair> pairs;
    const size_t n = occ.size();
    size_t i = 0;
    while (i < n) {
        size_t j = i;
        while (j < n && occ[j].dp == occ[i].dp) j++;
        // run [i,j) at (doc,pos); successors are the run at (doc,pos+1)
        if ((occ[i].dp & 0xffffffffu) != 0xffffffffu) {
            const uint64_t next_dp = occ[i].dp + 1;
            size_t m = j;
            while (m < n && occ[m].dp == next_dp) m++;
            if (m > j) {
                const int32_t d = (int32_t)(occ[i].dp >> 32);
                for (size_t a = i; a < j; a++)
                    for (size_t b = j; b < m; b++)
                        pairs.push_back(
                            {((uint64_t)occ[a].tid << 32) | occ[b].tid, d});
            }
        }
        i = j;
    }
    occ.clear();
    occ.shrink_to_fit();
    std::sort(pairs.begin(), pairs.end(),
              [](const Pair& a, const Pair& b) {
                  return a.key != b.key ? a.key < b.key : a.d < b.d;
              });
    S->bg_keys.clear(); S->bg_off.clear(); S->bg_docids.clear();
    for (size_t p = 0; p < pairs.size(); p++) {
        if (p && pairs[p].key == pairs[p - 1].key
              && pairs[p].d == pairs[p - 1].d) continue;
        if (S->bg_keys.empty() || S->bg_keys.back() != pairs[p].key) {
            S->bg_keys.push_back(pairs[p].key);
            S->bg_off.push_back((int64_t)S->bg_docids.size());
        }
        S->bg_docids.push_back(pairs[p].d);
    }
    S->bg_off.push_back((int64_t)S->bg_docids.size());
    S->bigram_built = 1;
    S->bigram_minlen = minlen;
    return (int64_t)S->bg_keys.size();
}

extern "C" void xt_qseg_add_geocol(void* h, int32_t slot,
                                   const int32_t* doc_off,
                                   const int32_t* doc_len,
                                   const int32_t* flat_start,
                                   const int32_t* flat_end) {
    auto* s = (xtq::QSeg*)h;
    s->geos[slot] = {doc_off, doc_len, flat_start, flat_end};
}

// agg kinds
#define XTQ_AGG_COUNT 0
#define XTQ_AGG_TERMS 1
#define XTQ_AGG_STATS 2   // emits n, s, s2, min, max

extern "C" int64_t xt_query_exec(
    void* hseg,
    const int64_t* t_off, const int64_t* t_len, const double* t_const,
    const int32_t* g_start, const int32_t* g_nterms, const uint8_t* g_neg,
    int32_t n_groups, int32_t driver_g,
    double k1, double b, double min_normlen, double lf,
    const int32_t* f_slot, const int32_t* f_keys, int32_t nf,
    const int32_t* geo_slot, const int32_t* geo_qstart,
    const int32_t* geo_qn, const int32_t* geo_ranges, int32_t ngeo,
    int32_t sort_mode, int32_t sort_slot,
    // phrases [np]: flat term indices (into t_off/t_len), window,
    // is_phrase; positional arrays must be registered
    const int32_t* ph_start, const int32_t* ph_nterms,
    const int32_t* ph_tidx, const int32_t* ph_window,
    const uint8_t* ph_exact, int32_t n_phrases,
    const int32_t* agg_kind, const int32_t* agg_slot, int32_t n_aggs,
    int32_t k, int32_t count_only,
    int32_t* out_docids, double* out_scores,
    double* agg_out, const int64_t* agg_out_off) {
    auto* S = (xtq::QSeg*)hseg;
    const double one_minus_b = 1.0 - b;

    auto sumpart = [&](int64_t i, double tc) -> double {
        const double wdf = (double)S->wdf[i];
        double normlen = (double)S->dl[i] * lf;
        if (normlen < min_normlen) normlen = min_normlen;
        double denom = k1 * (normlen * b + one_minus_b) + wdf;
        if (denom < 1e-9) denom = 1e-9;
        return tc * (wdf / denom);
    };

    // 0. bigram resolution: every consecutive term pair of an exact
    //    phrase whose terms are in the indexed domain (len >= minlen)
    //    is checked against the derived nextword table. An absent key
    //    PROVES zero matches (the whole indexed domain was enumerated
    //    at build time). Present pairs become galloping docid probes:
    //    for 2-term phrases that IS the phrase (zero positional work);
    //    for longer phrases the pairs are exact prefilters and only
    //    pair-surviving candidates pay positional verification.
    std::vector<int32_t> ph_pair_start(n_phrases > 0 ? n_phrases : 1, 0);
    std::vector<int32_t> ph_pair_n(n_phrases > 0 ? n_phrases : 1, 0);
    std::vector<uint8_t> ph_complete(n_phrases > 0 ? n_phrases : 1, 0);
    std::vector<int64_t> pair_slots;   // flat, into bg_keys/bg_off
    int64_t bg_driver_flat = -1;       // flat pair entry driving candidates
    int32_t bg_driver_ph = -1;
    bool impossible = false;
    if (S->bigram_built) {
        int64_t best_len = INT64_MAX;
        for (int32_t ph = 0; ph < n_phrases && !impossible; ph++) {
            ph_pair_start[ph] = (int32_t)pair_slots.size();
            if (!ph_exact[ph]) continue;      // NEAR: positional only
            const int32_t nt = ph_nterms[ph];
            int32_t found_pairs = 0;
            for (int32_t j = 0; j + 1 < nt; j++) {
                const int32_t ta = ph_tidx[ph_start[ph] + j];
                const int32_t tb = ph_tidx[ph_start[ph] + j + 1];
                if (t_len[ta] <= 0 || t_len[tb] <= 0) {
                    impossible = true;   // missing term: no phrase match
                    break;
                }
                if (t_len[ta] < S->bigram_minlen
                    || t_len[tb] < S->bigram_minlen) continue;
                if (((uint64_t)t_off[ta] >> 32)
                    || ((uint64_t)t_off[tb] >> 32)) continue;
                const uint64_t key = ((uint64_t)(uint32_t)t_off[ta] << 32)
                                     | (uint32_t)t_off[tb];
                auto it = std::lower_bound(S->bg_keys.begin(),
                                           S->bg_keys.end(), key);
                if (it == S->bg_keys.end() || *it != key) {
                    impossible = true;   // provably adjacency-free pair
                    break;
                }
                const int64_t s = it - S->bg_keys.begin();
                pair_slots.push_back(s);
                found_pairs++;
                const int64_t ln = S->bg_off[s + 1] - S->bg_off[s];
                if (ln < best_len) {
                    best_len = ln;
                    bg_driver_flat = (int64_t)pair_slots.size() - 1;
                    bg_driver_ph = ph;
                }
            }
            ph_pair_n[ph] = (int32_t)pair_slots.size() - ph_pair_start[ph];
            // a 2-term exact phrase with its pair present needs no
            // positional pass at all
            if (nt == 2 && found_pairs == 1) ph_complete[ph] = 1;
        }
        // drive from the smallest pair list when it beats the group
        if (bg_driver_flat >= 0 && !impossible) {
            int64_t drv_len = 0;
            for (int32_t t = g_start[driver_g];
                 t < g_start[driver_g] + g_nterms[driver_g]; t++)
                drv_len += t_len[t];
            if (best_len >= drv_len) { bg_driver_flat = -1;
                                       bg_driver_ph = -1; }
        }
    }

    // 1. walk the candidate source's postings -> candidate set only.
    //    Scores are NOT accumulated here: the verify pass below adds
    //    every scoring term's contribution in QUERY TERM ORDER, so
    //    float64 summation order (and thus exact cross-segment score
    //    ties) does not depend on which conjunct is smallest per segment
    int64_t ntouch = 0;
    if (impossible) {
        // a required phrase provably has zero matches
    } else if (bg_driver_flat >= 0) {
        const int64_t s = pair_slots[bg_driver_flat];
        const int32_t* bd = S->bg_docids.data() + S->bg_off[s];
        const int64_t bn = S->bg_off[s + 1] - S->bg_off[s];
        for (int64_t i = 0; i < bn; i++) {   // sorted unique already
            const int32_t d = bd[i];
            if (S->has_del && S->deleted[d]) continue;
            S->touched[ntouch++] = d;
        }
    } else {
    bool driver_single = g_nterms[driver_g] == 1;
    for (int32_t t = g_start[driver_g];
         t < g_start[driver_g] + g_nterms[driver_g]; t++) {
        const int64_t off = t_off[t], ln = t_len[t];
        for (int64_t i = off; i < off + ln; i++) {
            const int32_t d = S->docids[i];
            if (S->has_del && S->deleted[d]) continue;
            if (!S->seen[d]) { S->seen[d] = 1; S->touched[ntouch++] = d; }
        }
    }
    if (!driver_single)
        std::sort(S->touched.begin(), S->touched.begin() + ntouch);
    }
    // with a bigram driver no group is matched by construction
    const int32_t eff_driver = bg_driver_flat >= 0 ? -1 : driver_g;
    std::vector<int64_t> bgcur(pair_slots.empty() ? 1 : pair_slots.size(),
                               0);

    // monotone galloping cursors: candidates are processed docid-
    // ascending, so each term's postings pointer only ever advances -
    // verification of comparable-size conjuncts is a linear co-walk
    // (O(sum lens)) instead of a fresh O(log n) binary search per
    // candidate (the probe pattern behind cfg2's heavy common-word
    // phrases: 94k-candidate drivers against 90k-posting partners)
    const int64_t total_flat = q_nterms_total(g_start, g_nterms, n_groups);
    std::vector<int64_t> cur(total_flat, 0);
    auto probe = [&](int32_t t, int32_t d) -> int64_t {
        const int64_t off = t_off[t], ln = t_len[t];
        const int32_t* base = S->docids + off;
        int64_t c = cur[t];
        if (c < ln && base[c] < d) {
            int64_t step = 1;
            while (c + step < ln && base[c + step] < d) {
                c += step;
                step <<= 1;
            }
            const int64_t hi = std::min(c + step + 1, ln);
            c = std::lower_bound(base + c, base + hi, d) - base;
        }
        cur[t] = c;
        return (c < ln && base[c] == d) ? off + c : -1;
    };

    // top-k heap, worst-first; key depends on sort_mode
    struct HK { double a; int64_t bcd; int32_t d; double score; };
    std::vector<HK> heap;
    heap.reserve(k > 0 ? k : 1);
    // worse(x, y): is x worse (further from rank 0) than y?
    auto worse = [&](const HK& x, const HK& y) {
        if (x.a != y.a) return sort_mode == 0 ? x.a < y.a : x.a > y.a;
        if (x.bcd != y.bcd) return x.bcd > y.bcd;
        return x.d > y.d;
    };
    auto hpush = [&](const HK& e) {
        if ((int32_t)heap.size() < k) {
            heap.push_back(e);
            size_t i = heap.size() - 1;
            while (i > 0) {
                size_t p = (i - 1) / 2;
                if (!worse(heap[i], heap[p])) break;
                std::swap(heap[i], heap[p]);
                i = p;
            }
        } else if (k > 0 && worse(heap[0], e)) {
            heap[0] = e;
            size_t i = 0, n = heap.size();
            for (;;) {
                size_t l = 2 * i + 1, r = l + 1, m = i;
                if (l < n && worse(heap[l], heap[m])) m = l;
                if (r < n && worse(heap[r], heap[m])) m = r;
                if (m == i) break;
                std::swap(heap[i], heap[m]);
                i = m;
            }
        }
    };

    const xtq::ValCol* sort_col = nullptr;
    if (sort_mode == 1 || sort_mode == 2) {
        auto it = S->vals.find(sort_slot);
        if (it != S->vals.end()) sort_col = &it->second;
    }

    // agg accumulators (written to agg_out at the end)
    struct StatAcc { double n = 0, s = 0, s2 = 0,
                     mn = 1e300, mx = -1e300; };
    std::vector<StatAcc> stat_accs(n_aggs);
    std::vector<std::vector<double>> term_accs(n_aggs);
    for (int32_t a = 0; a < n_aggs; a++)
        if (agg_kind[a] == XTQ_AGG_TERMS) {
            auto it = S->vals.find(agg_slot[a]);
            term_accs[a].assign(
                it != S->vals.end() ? it->second.ncats : 0, 0.0);
        }

    int64_t matched = 0;
    for (int64_t ci = 0; ci < ntouch; ci++) {
        const int32_t d = S->touched[ci];
        double score = 0.0;
        bool ok = true;
        // 2. verify every group in declaration order: binary search each
        //    term's postings (ALL terms checked - every matching scoring
        //    term contributes, in query term order). The driver group is
        //    matched by construction, so only its scoring terms are
        //    probed.
        for (int32_t g = 0; g < n_groups && ok; g++) {
            const bool is_driver = g == eff_driver;
            bool hit = is_driver;
            for (int32_t t = g_start[g]; t < g_start[g] + g_nterms[g];
                 t++) {
                if (is_driver && t_const[t] == 0.0) continue;
                const int64_t slot = probe(t, d);
                if (slot >= 0) {
                    hit = true;
                    if (t_const[t] != 0.0)
                        score += sumpart(slot, t_const[t]);
                }
            }
            if (g_neg[g]) { if (hit && !is_driver) ok = false; }
            else if (!hit) ok = false;
        }
        // 2b. positional verification (phrasepostlist.cc /
        //     nearpostlist.cc semantics, EXACT - no pmax/cand caps):
        //     PHRASE: exists p0 in pos[t0] with p0+i in pos[ti] for all
        //     i; NEAR: exists p0 with, per term, some q, |q - p0| <
        //     window (the device's anchor rule)
        for (int32_t ph = 0; ph < n_phrases && ok; ph++) {
            // pair prefilters first: monotone galloping probes into the
            // pairs' sorted docid lists (mirror probe() above). For a
            // complete phrase (2-term exact, pair present) this IS the
            // phrase; longer phrases fall through to positional
            // verification only when every pair contains the doc.
            for (int32_t p = 0; p < ph_pair_n[ph] && ok; p++) {
                const int64_t flat = ph_pair_start[ph] + p;
                if (flat == bg_driver_flat) continue;  // true by sourcing
                const int64_t s = pair_slots[flat];
                const int32_t* base = S->bg_docids.data() + S->bg_off[s];
                const int64_t ln = S->bg_off[s + 1] - S->bg_off[s];
                int64_t c = bgcur[flat];
                if (c < ln && base[c] < d) {
                    int64_t step = 1;
                    while (c + step < ln && base[c + step] < d) {
                        c += step;
                        step <<= 1;
                    }
                    const int64_t hi = std::min(c + step + 1, ln);
                    c = std::lower_bound(base + c, base + hi, d) - base;
                }
                bgcur[flat] = c;
                if (!(c < ln && base[c] == d)) ok = false;
            }
            if (!ok || ph_complete[ph]) continue;
            const int32_t nt = ph_nterms[ph];
            const int32_t w = ph_window[ph];
            // locate each term's position span for doc d
            int32_t po[16], pl[16];
            bool all = nt <= 16;
            for (int32_t j = 0; all && j < nt; j++) {
                const int32_t t = ph_tidx[ph_start[ph] + j];
                const int64_t slot = probe(t, d);
                if (slot < 0) { all = false; break; }
                po[j] = S->posoff[slot];
                pl[j] = S->poslen[slot];
            }
            if (!all) { ok = false; break; }
            bool verdict = false;
            const int32_t* P0 = S->positions + po[0];
            for (int32_t a = 0; a < pl[0] && !verdict; a++) {
                const int32_t p0 = P0[a];
                bool good = true;
                for (int32_t j = 1; j < nt && good; j++) {
                    const int32_t* Pj = S->positions + po[j];
                    bool found = false;
                    if (ph_exact[ph]) {
                        const int32_t want = p0 + j;
                        const int32_t* q = std::lower_bound(
                            Pj, Pj + pl[j], want);
                        found = q != Pj + pl[j] && *q == want;
                    } else {
                        for (int32_t b2 = 0; b2 < pl[j] && !found; b2++)
                            found = (Pj[b2] > p0 ? Pj[b2] - p0
                                                 : p0 - Pj[b2]) < w;
                    }
                    good = found;
                }
                verdict = good;
            }
            if (!verdict) ok = false;
        }
        // 3. value-range filters (MultipleValueRange semantics)
        for (int32_t f = 0; f < nf && ok; f++) {
            auto it = S->vals.find(f_slot[f]);
            if (it == S->vals.end()) { ok = false; break; }
            const xtq::ValCol& c = it->second;
            const int32_t lo_h = f_keys[4 * f], lo_l = f_keys[4 * f + 1];
            const int32_t hi_h = f_keys[4 * f + 2],
                          hi_l = f_keys[4 * f + 3];
            if (!c.present[d]
                || !xtq::lex_ge(c.max_hi[d], c.max_lo[d], lo_h, lo_l)
                || !xtq::lex_le(c.hi[d], c.lo[d], hi_h, hi_l)) {
                ok = false;
                break;
            }
            if (c.mv_len && c.mv_len[d] > 0) {
                bool real = false;
                const int32_t o = c.mv_off[d], n = c.mv_len[d];
                for (int32_t v = 0; v < n && !real; v++)
                    real = xtq::lex_ge(c.mv_hi[o + v], c.mv_lo[o + v],
                                       lo_h, lo_l)
                        && xtq::lex_le(c.mv_hi[o + v], c.mv_lo[o + v],
                                       hi_h, hi_l);
                if (!real) ok = false;
            }
        }
        // 4. exact HTM geo range intersection (GeoSpatialRange analog):
        //    query ranges are sorted disjoint; a doc range [rs,re]
        //    overlaps iff the first query range with qe >= rs has
        //    qs <= re
        for (int32_t gi = 0; gi < ngeo && ok; gi++) {
            auto it = S->geos.find(geo_slot[gi]);
            if (it == S->geos.end()) { ok = false; break; }
            const xtq::GeoCol& gc = it->second;
            const int32_t* qr = geo_ranges + 2 * geo_qstart[gi];
            const int32_t nq = geo_qn[gi];
            bool any = false;
            const int32_t roff = gc.doc_off[d], rn = gc.doc_len[d];
            for (int32_t r = 0; r < rn && !any; r++) {
                const int32_t rs = gc.flat_start[roff + r];
                const int32_t re = gc.flat_end[roff + r];
                int32_t a = 0, z = nq;       // first q with q.end >= rs
                while (a < z) {
                    int32_t m = (a + z) / 2;
                    if (qr[2 * m + 1] < rs) a = m + 1; else z = m;
                }
                any = a < nq && qr[2 * a] <= re;
            }
            if (!any) ok = false;
        }
        if (!ok) continue;
        matched++;
        // 5. aggregations on the match
        for (int32_t a = 0; a < n_aggs; a++) {
            if (agg_kind[a] == XTQ_AGG_TERMS) {
                auto it = S->vals.find(agg_slot[a]);
                if (it == S->vals.end() || !it->second.cats) continue;
                const int32_t code = it->second.cats[d];
                if (code >= 0 && code < (int32_t)term_accs[a].size())
                    term_accs[a][code] += 1.0;
            } else if (agg_kind[a] == XTQ_AGG_STATS) {
                auto it = S->vals.find(agg_slot[a]);
                if (it == S->vals.end() || !it->second.present[d])
                    continue;
                const double v = (double)it->second.fval[d];
                StatAcc& sa = stat_accs[a];
                sa.n += 1; sa.s += v; sa.s2 += v * v;
                if (v < sa.mn) sa.mn = v;
                if (v > sa.mx) sa.mx = v;
            }
        }
        // 6. rank key
        if (!count_only && k > 0) {
            HK e;
            e.d = d; e.score = score;
            if (sort_mode == 0) {            // score desc, docid asc
                e.a = score; e.bcd = 0;
            } else if (sort_mode == 3) {     // unweighted: docid asc
                e.a = 0.0; e.bcd = d;
            } else {                          // single value key + docid
                int32_t hk = 2147483647, lk = 0;
                if (sort_col) {
                    hk = sort_col->hi[d];
                    lk = sort_col->lo[d];
                    if (sort_mode == 2) { hk = ~hk; lk = ~lk; }
                    if (!sort_col->present[d]) hk = 2147483647;
                }
                // ascending lexicographic on (hk, lk): pack into one
                // monotone unsigned key (sign-flip both words)
                e.a = 0.0;
                e.bcd = ((int64_t)((uint32_t)hk ^ 0x80000000u) << 32)
                        | (uint32_t)(lk ^ (int32_t)0x80000000);
            }
            hpush(e);
        }
    }

    // reset scratch
    for (int64_t i = 0; i < ntouch; i++)
        S->seen[S->touched[i]] = 0;

    // drain heap worst-first into out[n-1..0]
    if (!count_only && k > 0) {
        int32_t n = (int32_t)heap.size();
        for (int32_t i = n - 1; i >= 0; i--) {
            out_docids[i] = heap[0].d;
            out_scores[i] = heap[0].score;
            int32_t hn = (int32_t)heap.size() - 1;
            heap[0] = heap[hn];
            heap.pop_back();
            size_t j = 0;
            for (;;) {
                size_t l = 2 * j + 1, r = l + 1, m = j;
                if (l < (size_t)hn && worse(heap[l], heap[m])) m = l;
                if (r < (size_t)hn && worse(heap[r], heap[m])) m = r;
                if (m == j) break;
                std::swap(heap[j], heap[m]);
                j = m;
            }
        }
    }

    // agg outputs
    for (int32_t a = 0; a < n_aggs; a++) {
        double* o = agg_out + agg_out_off[a];
        if (agg_kind[a] == XTQ_AGG_COUNT) {
            o[0] = (double)matched;
        } else if (agg_kind[a] == XTQ_AGG_TERMS) {
            for (size_t c = 0; c < term_accs[a].size(); c++)
                o[c] = term_accs[a][c];
        } else if (agg_kind[a] == XTQ_AGG_STATS) {
            const StatAcc& sa = stat_accs[a];
            o[0] = sa.n; o[1] = sa.s; o[2] = sa.s2;
            o[3] = sa.n > 0 ? sa.mn : 1e300;
            o[4] = sa.n > 0 ? sa.mx : -1e300;
        }
    }
    return matched;
}
