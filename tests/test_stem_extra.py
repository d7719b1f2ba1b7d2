"""Extra Snowball stemmers (indonesian/irish/nepali/earlyenglish) + CJK
dictionary word segmentation (_cjk_words)."""

from xapiand_tpu.analysis.stem import Stem, resolve_language


def test_resolve_new_languages():
    assert resolve_language("id") == "indonesian"
    assert resolve_language("ga") == "irish"
    assert resolve_language("ne") == "nepali"
    assert resolve_language("earlyenglish") == "earlyenglish"


def test_indonesian_paper_examples():
    """Cases from the published algorithm (incl. its documented
    deviations: peledakan->ledak, perbaikan->baik)."""
    st = Stem("indonesian")
    for word, expect in [
        ("kebijaksanaan", "bijaksana"), ("memberikan", "beri"),
        ("pembelian", "beli"), ("berlari", "lari"), ("menyapu", "sapu"),
        ("peledakan", "ledak"), ("perbaikan", "baik"),
        ("bukunya", "buku"), ("makanlah", "makan"),
        ("bekerja", "kerja"), ("pelajaran", "ajar"),
        ("buku", "buku"),                  # measure <= 2: unchanged
        ("televisi", "televisi"),          # foreign -si protected
    ]:
        assert st(word) == expect, word


def test_irish_spec_examples():
    st = Stem("irish")
    for word, expect in [
        ("siopadóireacht", "siopadóir"),   # from the spec's comments
        ("monarcacht", "monarc"),
        ("bhfeidhm", "feidhm"),            # eclipsis bhf -> f
        ("n-athair", "athair"),
        ("grafaíochta", "graf"),
    ]:
        assert st(word) == expect, word


def test_earlyenglish_eth_est():
    st = Stem("earlyenglish")
    assert st("giveth") == "give"
    assert st("maketh") == "make"
    assert st("loveth") == "love"
    # plain porter behaviour retained
    assert st("running") == "run"
    assert st("walked") == "walk"


def test_nepali_suffixes():
    st = Stem("nepali")
    assert st("रामले") == "राम"       # ergative marker
    assert st("भन्छन्") == "भन्"       # verb inflection
    assert st("गरेका") == "गर"


def test_cjk_word_segmentation():
    """_cjk_words: true produces dictionary word terms, not bigrams
    (round-1 silently fell back to bigrams)."""
    from xapiand_tpu.analysis.unicode_tok import tokenize

    words = [t.text for t in tokenize("我来到北京清华大学", cjk_words=True)]
    assert "清华大学" in words and "北京" in words
    assert "我来" not in words          # no bigrams in words mode
    grams = [t.text for t in tokenize("我来到北京", cjk_words=False)]
    assert "我来" in grams              # ngram mode unchanged
    # hangul runs stay whole words
    ko = [t.text for t in tokenize("한국어 단어", cjk_words=True)]
    assert ko == ["한국어", "단어"]


def test_cjk_words_end_to_end():
    from xapiand_tpu.database import Database
    from xapiand_tpu.schema import Schema

    db = Database(schema=Schema.from_dict(
        {"schema": {"body": {"_type": "text", "_cjk_words": True,
                             "_language": "none"}}}))
    db.index_document({"body": "我来到北京清华大学"}, doc_id="1", commit=True)
    db.index_document({"body": "大学生活很精彩"}, doc_id="2", commit=True)
    assert db.search({"body": "清华大学"}, k=5).total == 1
    assert db.search({"body": "北京"}, k=5).total == 1
    assert "清华大学" in db._searchers[0].segment.terms


def test_extra_language_end_to_end():
    from xapiand_tpu.database import Database
    from xapiand_tpu.schema import Schema

    db = Database(schema=Schema.from_dict(
        {"schema": {"body": {"_type": "text", "_language": "indonesian"}}}))
    db.index_document({"body": "mereka memberikan buku"}, doc_id="1",
                      commit=True)
    # query stems through the same stemmer: diberi -> beri matches the
    # indexed memberikan -> beri
    assert db.search({"body": "diberi"}, k=5).total == 1
