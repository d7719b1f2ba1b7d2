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
#include <cstring>
#include <cstdlib>

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
