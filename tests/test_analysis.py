"""Analysis chain tests (tokeniser, stemmer, term generator, accuracy terms)."""

from xapiand_tpu.analysis import accuracy, termgen
from xapiand_tpu.analysis.stem import Stem, resolve_language
from xapiand_tpu.analysis.stopwords import get_stopwords
from xapiand_tpu.analysis.unicode_tok import tokenize, tokenize_simple
from xapiand_tpu.utils import dtutils


def test_tokenize_basic():
    toks = list(tokenize("Hello, World! foo-bar"))
    assert [(t.text, t.position) for t in toks] == [
        ("hello", 0), ("world", 1), ("foo", 2), ("bar", 3)]


def test_tokenize_apostrophe_and_symbols():
    assert tokenize_simple("don't stop") == ["don't", "stop"]
    assert tokenize_simple("C++ and C# code") == ["c++", "and", "c#", "code"]
    assert tokenize_simple("AT&T") == ["at&t"]


def test_tokenize_unicode():
    assert tokenize_simple("Café MÜNCHEN") == ["café", "münchen"]


def test_tokenize_cjk_ngrams():
    toks = tokenize_simple("日本語")
    assert "日" in toks and "日本" in toks and "本語" in toks and "語" in toks


def test_stemmer():
    s = Stem("en")
    assert s("running") == "run"
    assert s("connection") == "connect"
    assert Stem("none")("running") == "running"
    assert resolve_language("fr") == "french"
    assert resolve_language("klingon") is None


def test_stopwords():
    sw = get_stopwords("english")
    assert "the" in sw and "quantum" not in sw


def test_termgen_stem_some():
    tg = termgen.TermGenerator("en")
    doc = termgen.DocumentTerms()
    tg.index_text(doc, "The running dogs run")
    # unstemmed terms present with positions
    assert doc.terms["running"].positions == [1]
    assert doc.terms["dogs"].positions == [2]
    # stemmed Z-terms present without positions; 'run' appears twice stemmed
    assert doc.terms["Zrun"].wdf == 2
    assert doc.terms["Zrun"].positions == []
    # stopword 'the' indexed unstemmed, but no Zthe (STOP_STEMMED)
    assert "the" in doc.terms and "Zthe" not in doc.terms


def test_termgen_prefix_and_positions_advance():
    tg = termgen.TermGenerator("en")
    doc = termgen.DocumentTerms()
    tg.index_text(doc, "alpha beta", prefix="S")
    tg.increase_termpos()
    tg.index_text(doc, "gamma", prefix="S")
    assert doc.terms["Salpha"].positions == [0]
    assert doc.terms["Sgamma"].positions[0] > doc.terms["Sbeta"].positions[0] + 50
    assert "ZSalpha" in doc.terms


def test_termgen_stem_all():
    tg = termgen.TermGenerator("en", stem_strategy=termgen.STEM_ALL)
    doc = termgen.DocumentTerms()
    tg.index_text(doc, "connections")
    assert "connect" in doc.terms and "connections" not in doc.terms


def test_termgen_no_digit_stemming():
    tg = termgen.TermGenerator("en")
    doc = termgen.DocumentTerms()
    tg.index_text(doc, "abc123s")
    assert "abc123s" in doc.terms
    assert not any(t.startswith("Z") for t in doc.terms)


def test_query_text_terms():
    tg = termgen.TermGenerator("en")
    assert tg.index_query_text("running dogs") == ["Zrun", "Zdog"]


def test_numeric_accuracy_terms():
    terms = accuracy.numeric_terms(1234.0, [100, 1000], prefix="N")
    assert terms == ["N#100:12", "N#1000:1"]
    # negative values floor toward -inf
    assert accuracy.numeric_terms(-5, [100]) == ["#100:-1"]


def test_numeric_range_cover():
    terms = accuracy.numeric_range_terms(150, 450, [100, 1000], prefix="N")
    assert terms == ["N#100:1", "N#100:2", "N#100:3", "N#100:4"]
    # too-wide range escalates to coarser level
    terms = accuracy.numeric_range_terms(0, 99999, [100, 100000],
                                         max_terms=10)
    assert terms == ["#100000:0"]
    # no level fits -> empty cover (caller scans the value column)
    assert accuracy.numeric_range_terms(0, 99999, [100], max_terms=10) == []


def test_date_accuracy_terms():
    ts = dtutils.parse_datetime("2015-03-14T09:26:53")
    terms = accuracy.date_terms(ts, ["day", "year"], prefix="D")
    day = int(dtutils.parse_datetime("2015-03-14"))
    year = int(dtutils.parse_datetime("2015-01-01"))
    assert terms == [f"D#Dday:{day}", f"D#Dyear:{year}"]


def test_date_range_cover():
    lo = dtutils.parse_datetime("2015-03-14")
    hi = dtutils.parse_datetime("2015-03-16T12:00:00")
    terms = accuracy.date_range_terms(lo, hi, ["day", "month"])
    assert len(terms) == 3
    assert all(t.startswith("#Dday:") for t in terms)


def test_term_length_limit_includes_prefix():
    """The 245-byte key limit applies to the FULL emitted term - prefix +
    word, and the Z marker on stemmed forms (schema.cc index_term)."""
    from xapiand_tpu.analysis.termgen import (
        MAX_TERM_LENGTH, DocumentTerms, TermGenerator)

    pfx = "XLONGFIELD"
    word = "a" * (MAX_TERM_LENGTH - len(pfx) + 1)  # fits bare, not prefixed
    tg = TermGenerator(language=None)
    doc = DocumentTerms()
    tg.index_text(doc, word + " short", prefix=pfx, prefixes=(pfx, ""))
    terms = set(doc.terms)
    assert pfx + "short" in terms and "short" in terms
    assert word in terms            # unprefixed form still fits
    assert pfx + word not in terms  # prefixed form exceeds 245 bytes

    # stemmed Z-form boundary: 1 + len(pfx) + len(stem) must also fit
    tg2 = TermGenerator(language="english")
    doc2 = DocumentTerms()
    w2 = "b" * (MAX_TERM_LENGTH - len(pfx))  # prefixed fits, Z-form doesn't
    tg2.index_text(doc2, w2, prefix=pfx, prefixes=(pfx,))
    assert pfx + w2 in doc2.terms
    assert not any(t.startswith("Z" + pfx) for t in doc2.terms)
