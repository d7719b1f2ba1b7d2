"""Posting-aligned value channels (ExecConfig.carry) parity.

The carried path (value sort keys / agg fields riding the docid sort as
payload, models/segment.py ensure_postval + ops/executor.py) must be
bit-identical to the clamped-gather path on every consumer it covers:
value/dist/strmetric sorts, stats-family and terms aggregations, docs
with the field absent, and multi-segment databases where a later segment
never saw the slot.
"""

import numpy as np
import pytest

import xapiand_tpu.query.plan as planmod
from xapiand_tpu.database import Database


@pytest.fixture()
def facet_db():
    db = Database()
    rng = np.random.RandomState(7)
    for i in range(400):
        doc = {"body": f"w{rng.randint(0, 12)} common text",
               "cat": f"c{rng.randint(0, 5)}"}
        if i % 7 != 3:            # some docs have no price at all
            doc["price"] = float(rng.randint(0, 90))
        db.index_document(doc, doc_id=f"d{i}")
    db.commit()
    for i in range(400, 520):     # second segment WITHOUT price or cat
        db.index_document({"body": f"w{rng.randint(0, 12)} extra"},
                          doc_id=f"d{i}")
    db.commit()
    return db


def _run(db, monkeypatch, enabled, **kw):
    monkeypatch.setattr(planmod, "_carry_enabled", lambda: enabled)
    # fresh searchers: pv uploads must not leak between variants
    from xapiand_tpu.search import SegmentSearcher

    for i, s in enumerate(db._searchers):
        db._searchers[i] = SegmentSearcher(s.segment, db.scheme)
    res = db.search({"body": "w3"}, k=15, **kw)
    return ([(h.id, round(h.score, 6)) for h in res.hits],
            res.total, res.aggregations)


@pytest.mark.parametrize("kw", [
    {"sort": [{"price": {"_order": "desc"}}]},
    {"sort": [{"price": {"_order": "asc"}}]},
    {"sort": [{"price": {"_order": "asc", "_value": 40}}]},
    {"sort": [{"cat": {"_order": "asc", "_value": "c2",
                       "_metric": "levenshtein"}}]},
    {"aggs": {"st": {"_stats": {"_field": "price"}},
              "cats": {"_terms": {"_field": "cat"}},
              "med": {"_median": {"_field": "price"}},
              "hist": {"_histogram": {"_field": "price",
                                      "_interval": 10}}}},
    {"sort": [{"price": {"_order": "desc"}}],
     "aggs": {"st": {"_extended_stats": {"_field": "price"}}}},
    {"collapse": "cat"},
    {"collapse": "cat", "sort": [{"price": {"_order": "desc"}}]},
])
def test_carry_matches_gather(facet_db, monkeypatch, kw):
    import xapiand_tpu.query.dsl as dsl

    kw = dict(kw)
    if "sort" in kw:
        kw["sort"] = dsl.parse_sort(facet_db.schema, kw["sort"])
    if "collapse" in kw:
        kw["collapse_slot"] = \
            facet_db.schema.get_field(kw.pop("collapse")).slot
    off = _run(facet_db, monkeypatch, False, **kw)
    on = _run(facet_db, monkeypatch, True, **kw)
    assert off == on


def test_carry_cfg_and_upload(facet_db, monkeypatch):
    """carry is set for supported kinds, pv arrays upload once, and the
    executor filters to channels that exist."""
    from xapiand_tpu.query.dsl import parse_sort
    from xapiand_tpu.search import SegmentSearcher

    monkeypatch.setattr(planmod, "_carry_enabled", lambda: True)
    sort = parse_sort(facet_db.schema, [{"price": {"_order": "desc"}}])
    carry = planmod.carry_channels(
        [("value", facet_db.schema.get_field("price").slot, True)], (),
        None)
    assert carry and carry[0][1] == ("fval", "hi", "lo")
    s1 = SegmentSearcher(facet_db._searchers[0].segment, facet_db.scheme)
    slot = facet_db.schema.get_field("price").slot
    assert s1.device_segment.ensure_postval(slot, ("fval", "hi", "lo"))
    assert f"pv.{slot}.hi" in s1.device_segment.arrays_pytree()
    # segment 2 never saw the slot: nothing uploads, fallback applies
    s2 = SegmentSearcher(facet_db._searchers[1].segment, facet_db.scheme)
    assert not s2.device_segment.ensure_postval(slot, ("fval", "hi", "lo"))
    assert not s2.device_segment.postvals
    # collapse keys carry too (permuted along with the rows)
    cc = planmod.carry_channels([("value", slot, True)], (),
                                collapse_slot=3)
    assert (3, ("fval", "hi", "lo")) in cc
