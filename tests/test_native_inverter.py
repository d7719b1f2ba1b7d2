"""Native C++ inverter parity vs the Python analysis/builder oracle.

The inverter (native.cpp xt_inv_*) replaces tokenize+stem+DocumentTerms+
SegmentBuilder packing on the hot indexing path (termgenerator_internal.cc
+ glass_inverter.cc analog). Every segment it builds must be semantically
identical to the pure-Python builder: same terms, postings, wdf, positions,
collfreq, doclen, uniqterms.
"""

import random

import pytest

from xapiand_tpu.models.builder import SegmentBuilder
from xapiand_tpu.native import lib
from xapiand_tpu.schema import Schema

pytestmark = pytest.mark.skipif(
    lib is None or not hasattr(lib._c, "xt_inv_new"),
    reason="native inverter unavailable")


def _build_pair(docs, schema_props=None):
    segs = []
    for native in (False, True):
        sch = Schema.from_dict(schema_props) if schema_props else Schema()
        b = SegmentBuilder(native=native)
        assert b.wants_deferred_text == native
        for i, d in enumerate(docs):
            b.add(sch.index(dict(d), str(i),
                            defer_text=b.wants_deferred_text))
        segs.append(b.finalize())
    return segs


def _assert_segments_equal(s_py, s_nat):
    assert set(s_py.terms) == set(s_nat.terms), \
        set(s_py.terms) ^ set(s_nat.terms)
    for t, ti in s_py.terms.items():
        tn = s_nat.terms[t]
        sl_p = slice(ti.offset, ti.offset + ti.length)
        sl_n = slice(tn.offset, tn.offset + tn.length)
        assert s_py.post_docids[sl_p].tolist() == \
            s_nat.post_docids[sl_n].tolist(), t
        assert s_py.post_wdf[sl_p].tolist() == \
            s_nat.post_wdf[sl_n].tolist(), t
        assert ti.collfreq == tn.collfreq, t
        assert abs(ti.max_wdf - tn.max_wdf) < 1e-6, t
        for k in range(ti.length):
            pp = s_py.positions[
                s_py.post_posoff[ti.offset + k]:
                s_py.post_posoff[ti.offset + k] +
                s_py.post_poslen[ti.offset + k]]
            pn = s_nat.positions[
                s_nat.post_posoff[tn.offset + k]:
                s_nat.post_posoff[tn.offset + k] +
                s_nat.post_poslen[tn.offset + k]]
            assert pp.tolist() == pn.tolist(), (t, k)
    assert s_py.doclen.tolist() == s_nat.doclen.tolist()
    assert s_py.uniqterms.tolist() == s_nat.uniqterms.tolist()
    assert s_py.doc_keys == s_nat.doc_keys


def test_builder_parity_mixed_docs():
    docs = [
        {"body": "The quick brown foxes were running quickly", "price": 5,
         "cat": "a"},
        {"body": "generously communicated arsenals; dying early only",
         "price": 9, "cat": "b"},
        {"body": "don't it's he's 'quoted' c++ c# x86 42abc", "tag": "kw"},
        {"body": "the the the and running running", "price": 1},
        {"body": "singly engineered preconditions, skis lying atlas news"},
        {"title": "on positions", "body": "alpha beta gamma alpha"},
    ]
    s_py, s_nat = _build_pair(docs)
    _assert_segments_equal(s_py, s_nat)


def test_builder_parity_random_corpus():
    rng = random.Random(11)
    vocab = ["running", "jumped", "flies", "studies", "happily", "nation",
             "rationalization", "the", "a", "of", "dogs", "cat's", "99",
             "x2go", "zebra", "quickly", "generously", "abc"]
    docs = [{"body": " ".join(rng.choices(vocab, k=rng.randint(1, 30)))}
            for _ in range(60)]
    s_py, s_nat = _build_pair(docs)
    _assert_segments_equal(s_py, s_nat)


def test_builder_parity_non_ascii_fallback():
    """Non-ASCII text ops fall back to the Python TermGenerator inside the
    native builder; results still match the oracle exactly."""
    docs = [
        {"body": "café au lait naïve résumé"},
        {"body": "plain ascii words here"},
        {"body": "mixed ascii and café"},
    ]
    s_py, s_nat = _build_pair(docs)
    _assert_segments_equal(s_py, s_nat)


def test_builder_parity_stem_strategies():
    for strategy in ("none", "some", "all", "all_z"):
        for stop in ("none", "all", "stemmed"):
            props = {"schema": {"body": {"_type": "text",
                                         "_stem_strategy": strategy,
                                         "_stop_strategy": stop}}}
            docs = [{"body": "the running dogs were only too happy"},
                    {"body": "a generously dying communication"}]
            s_py, s_nat = _build_pair(docs, props)
            _assert_segments_equal(s_py, s_nat)


def test_builder_parity_no_language():
    props = {"schema": {"body": {"_type": "text", "_language": "none"}}}
    docs = [{"body": "the running dogs were only too happy"}]
    s_py, s_nat = _build_pair(docs, props)
    _assert_segments_equal(s_py, s_nat)


def test_builder_parity_long_words():
    pfx_doc = {"body": "w" * 250 + " normal " + "x" * 244}
    s_py, s_nat = _build_pair([pfx_doc])
    _assert_segments_equal(s_py, s_nat)


def test_stemmer_matches_nltk():
    from nltk.stem.snowball import SnowballStemmer

    ns = SnowballStemmer("english")
    inv = lib.make_inverter()
    rng = random.Random(5)
    # pure-alpha words: tokenization is then the identity, so index_text
    # with STEM_ALL emits exactly the nltk stem of each word
    words = ["dying", "skis", "news", "generously", "communication",
             "rationalization", "happily", "agreed", "fled", "hopping",
             "early", "only", "ugly", "gently", "singly", "conspicuously"]
    words += ["".join(rng.choices("abcdefghijklmnopqrstuvwxyz",
                                  k=rng.randint(1, 12))) for _ in range(500)]
    for w in words:
        inv.begin_doc(0)
        r = inv.index_text(w, [""], 0, 1.0, False, "all", "none")
        assert r is not None
        inv.end_doc()
    ex = inv.export()
    got = set()
    b = 0
    for tl in ex["term_lens"][: ex["n_terms"]].tolist():
        got.add(ex["term_buf"][b: b + tl].decode())
        b += tl + 1  # exported terms are NUL-separated
    expect = {ns.stem(w) for w in words}
    assert got == expect


def test_search_results_identical_native_vs_python(tmp_path):
    """End-to-end: databases built by the two paths rank identically."""
    from xapiand_tpu.database import Database

    rng = random.Random(3)
    vocab = ("search engines ranking quality tests running quickly the "
             "of and dogs cats flies studies").split()
    docs = [{"body": " ".join(rng.choices(vocab, k=12)),
             "price": rng.randint(1, 50)} for _ in range(120)]

    db_nat = Database()
    assert db_nat._builder.wants_deferred_text
    db_py = Database()
    db_py._builder = SegmentBuilder(native=False)
    for i, d in enumerate(docs):
        db_nat.index_document(dict(d), doc_id=str(i))
        db_py.index_document(dict(d), doc_id=str(i))
    db_nat.commit()
    db_py.commit()
    for q in ({"body": "running dogs"}, {"body": {"_phrase": "search engines"}},
              {"_and": [{"body": "quality"}, {"price": {"_from": 10}}]}):
        r_n = db_nat.search(q, k=10)
        r_p = db_py.search(q, k=10)
        assert r_n.total == r_p.total, q
        assert [(h.id, round(h.score, 5)) for h in r_n.hits] == \
            [(h.id, round(h.score, 5)) for h in r_p.hits], q


def test_builder_parity_geo_date_numeric_bulk():
    """Bulk boolean path (xt_inv_add_bools) + native geo accuracy terms
    (xt_inv_add_geo_acc): geo/date/numeric docs emit 100+ boolean accuracy
    terms each; the one-call native path must be bit-identical to the
    per-term Python oracle (schema.cc boolean index_term + GenerateTerms
    generate_terms.cc semantics)."""
    rng = random.Random(23)
    docs = []
    for i in range(40):
        docs.append({
            "loc": {"_point": {"_latitude": rng.uniform(-80, 80),
                               "_longitude": rng.uniform(-180, 180)}},
            "ts": f"20{rng.randint(10, 25)}-{rng.randint(1, 12):02d}-"
                  f"{rng.randint(1, 28):02d}T{rng.randint(0, 23):02d}:30:00",
            "price": rng.choice([rng.randint(-5, 5), rng.randint(0, 10**7)]),
            "flag": rng.random() < 0.5,
            "body": " ".join(rng.choices(["alpha", "beta", "gamma"],
                                         k=rng.randint(1, 6))),
        })
    # duplicate values in one doc (array field) exercise native dedup
    docs.append({"price": [100, 100, 250],
                 "loc": [{"_point": {"_latitude": 1.0, "_longitude": 2.0}},
                         {"_point": {"_latitude": 1.0, "_longitude": 2.0}}]})
    s_py, s_nat = _build_pair(docs)
    assert any("#G" in t for t in s_nat.terms), "geo acc terms missing"
    assert any("#Dday" in t for t in s_nat.terms), "date acc terms missing"
    _assert_segments_equal(s_py, s_nat)
