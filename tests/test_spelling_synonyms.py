"""Stored spelling + synonym tables (VERDICT r3 missing #4).

≙ glass_spelling.cc / glass_synonym.cc per-shard tables, WAL op types
ADD_SPELLING/REMOVE_SPELLING (wal.h:114-122) + the new synonym ops, the
Database::add_spelling/add_synonym API family, and QueryParser
FLAG_AUTO_SYNONYMS-style expansion at query time.
"""

import os

import pytest

from xapiand_tpu.database import Database


def test_stored_spelling_suggest_and_rank():
    db = Database()
    db.index_document({"body": "colour theory"}, doc_id="1")
    db.commit()
    # index has "colour"; store a competing correct word with high freq
    db.add_spelling("color", 100)
    sugg = db.suggest_spelling("colr")
    assert "color" in sugg and "colour" in sugg
    # frequency wins within the same edit distance class
    assert sugg.index("color") < sugg.index("colour")
    db.remove_spelling("color", 100)
    assert "color" not in db.suggest_spelling("colr")


def test_spelling_wal_replay(tmp_path):
    path = str(tmp_path / "idx")
    db = Database(path=path)
    db.index_document({"body": "hello"}, doc_id="1")
    db.commit()
    db.add_spelling("receive", 5)
    db.add_spelling("recieve", 1)
    db.remove_spelling("recieve", 1)
    db.close()
    db2 = Database(path=path)
    assert db2._spellings == {"receive": 5}
    assert "receive" in db2.suggest_spelling("recieve")
    db2.close()


def test_spelling_survives_checkpoint(tmp_path):
    path = str(tmp_path / "idx")
    db = Database(path=path)
    db.index_document({"body": "hello"}, doc_id="1")
    db.commit()
    db.add_spelling("xylophone", 3)
    db.add_synonym("fast", "quick")
    db.checkpoint()   # snapshot + WAL pruned below it
    db.close()
    db2 = Database(path=path)
    assert db2._spellings.get("xylophone") == 3
    assert db2.synonyms_of("fast") == ["quick"]
    db2.close()


def test_stored_synonym_expansion():
    db = Database()
    db.index_document({"body": "a quick fox"}, doc_id="q")
    db.index_document({"body": "a fast car"}, doc_id="f")
    db.index_document({"body": "slow snail"}, doc_id="s")
    db.commit()
    db.add_synonym("fast", "quick")
    plain = db.search({"body": "fast"}, k=10)
    assert {h.id for h in plain.hits} == {"f"}
    ir = db.expand_stored_synonyms(
        __import__("xapiand_tpu.query.dsl", fromlist=["QueryDSL"])
        .QueryDSL(db.schema).parse({"body": "fast"}))
    expanded = db.search(ir, k=10)
    assert {h.id for h in expanded.hits} == {"f", "q"}
    db.remove_synonym("fast", "quick")
    assert db.synonyms_of("fast") == []


def test_synonym_wal_replay(tmp_path):
    path = str(tmp_path / "idx")
    db = Database(path=path)
    db.index_document({"body": "x"}, doc_id="1")
    db.commit()
    db.add_synonym("fast", "quick")
    db.add_synonym("fast", "speedy")
    db.add_synonym("big", "large")
    db.remove_synonym("big")          # clear whole entry
    db.close()
    db2 = Database(path=path)
    assert db2.synonyms_of("fast") == ["quick", "speedy"]
    assert db2.synonyms_of("big") == []
    db2.close()


def test_rest_spelling_synonym_endpoints():
    from test_rest import ServerThread

    s = ServerThread()
    try:
        s.req("PUT", "/sp/1", {"body": "a fast car"})
        s.req("PUT", "/sp/2", {"body": "a quick fox"})
        s.req("POST", "/sp/:commit")
        st, out, _ = s.req("POST", "/sp/:spelling",
                           {"word": "Receive", "freq": 7})
        assert st == 200 and out["freq"] == 7
        st, out, _ = s.req("GET", "/sp/:spelling")
        assert out["spellings"] == {"receive": 7}
        st, out, _ = s.req("GET", "/sp/:suggest?q=recieve")
        assert "receive" in out["suggestions"]
        st, out, _ = s.req("POST", "/sp/:spelling",
                           {"word": "receive", "freq": 7, "remove": True})
        assert out["freq"] == 0

        st, out, _ = s.req("POST", "/sp/:synonym",
                           {"term": "fast", "synonym": "quick"})
        assert st == 200 and out["synonyms"] == ["quick"]
        st, out, _ = s.req("GET", "/sp/:synonym?term=fast")
        assert out["synonyms"] == ["quick"]
        # search without expansion: only the literal term
        st, out, _ = s.req("POST", "/sp/:search",
                           {"_query": {"body": "fast"}})
        assert out["total"] == 1
        # ?synonyms expands through the stored table
        st, out, _ = s.req("POST", "/sp/:search?synonyms",
                           {"_query": {"body": "fast"}})
        assert out["total"] == 2
        # body flag form
        st, out, _ = s.req("POST", "/sp/:search",
                           {"_query": {"body": "fast"}, "_synonyms": True})
        assert out["total"] == 2
        st, out, _ = s.req("POST", "/sp/:synonym",
                           {"term": "fast", "remove": True})
        assert out["synonyms"] == []
        st, out, _ = s.req("POST", "/sp/:search?synonyms",
                           {"_query": {"body": "fast"}})
        assert out["total"] == 1
    finally:
        s.stop()
