"""Query-string parser tests (mirrors oldtests/test_boolparser.cc +
test_fieldparser.cc coverage intent)."""

import pytest

from xapiand_tpu.database import Database
from xapiand_tpu.query.boolparser import BoolParserError
from xapiand_tpu.query.dsl import QueryDSL


@pytest.fixture(scope="module")
def db():
    db = Database()
    docs = [
        {"title": "white whale", "body": "the white whale waits", "price": 10},
        {"title": "whale songs", "body": "songs of the deep whale", "price": 25},
        {"title": "desert planet", "body": "sand and spice", "price": 40},
        {"title": "white sand", "body": "beaches of white sand", "price": 15},
    ]
    for i, d in enumerate(docs):
        db.index_document(d, doc_id=str(i))
    db.commit()
    return db


def q(db, text, k=10):
    dsl = QueryDSL(db.schema, term_expander=db.expand_prefix)
    ir = dsl.parse_string(text)
    return sorted(int(h.id) for h in db.search(ir, k=k).hits)


def test_field_term(db):
    assert q(db, "title:whale") == [0, 1]
    assert q(db, "body:sand") == [2, 3]


def test_and_or_not(db):
    assert q(db, "title:white AND title:whale") == [0]
    assert q(db, "title:whale OR title:planet") == [0, 1, 2]
    assert q(db, "title:white AND NOT title:whale") == [3]
    assert q(db, "NOT title:whale") == [2, 3]


def test_adjacency_is_and(db):
    assert q(db, "title:white title:whale") == [0]


def test_parens(db):
    assert q(db, "(title:whale OR title:sand) AND price:10..20") == [0, 3]


def test_range_syntax(db):
    assert q(db, "price:10..25") == [0, 1, 3]
    assert q(db, "price:26..100") == [2]


def test_phrase_quoted(db):
    assert q(db, 'body:"white whale"') == [0]


def test_wildcard(db):
    assert q(db, "title:wha*") == [0, 1]


def test_free_text_global(db):
    # unprefixed terms search the global namespace
    assert q(db, "whale") == [0, 1]
    assert q(db, "whale sand") == []  # AND semantics across atoms
    assert q(db, "whale OR sand") == [0, 1, 2, 3]


def test_xor_maybe(db):
    assert q(db, "title:white XOR title:whale") == [1, 3]
    # MAYBE keeps the left match-set
    assert q(db, "title:whale MAYBE title:white") == [0, 1]


def test_errors(db):
    dsl = QueryDSL(db.schema)
    with pytest.raises(BoolParserError):
        dsl.parse_string("(unclosed")
    with pytest.raises(BoolParserError):
        dsl.parse_string("a )")
