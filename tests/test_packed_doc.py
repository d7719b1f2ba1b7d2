"""Packed single-crossing doc-add (xt_inv_add_doc) parity.

The packed path moves date/numeric accuracy term GENERATION into C++
(truncation + bucket + sortable-key formatting; ≙ the reference's
GenerateTerms running inside DocPreparer, src/multivalue/generate_terms.cc
+ handler.h:256-361). Every segment built through it must be bit-identical
to the pure-Python oracle AND to the per-call native path.
"""

import random

import pytest

from xapiand_tpu.models.builder import SegmentBuilder
from xapiand_tpu.native import lib
from xapiand_tpu.schema import Schema

from tests.test_native_inverter import _assert_segments_equal

pytestmark = pytest.mark.skipif(
    lib is None or not hasattr(lib._c, "xt_inv_add_doc"),
    reason="packed doc-add unavailable")


def _build_three(docs, schema_props=None):
    """(pure-python, per-call native, packed native) segments."""
    segs = []
    for mode in ("py", "calls", "packed"):
        sch = Schema.from_dict(schema_props) if schema_props else Schema()
        b = SegmentBuilder(native=(mode != "py"))
        if mode == "calls":
            b._pack_doc = lambda idoc: None  # force the per-call path
        for i, d in enumerate(docs):
            b.add(sch.index(dict(d), str(i),
                            defer_text=b.wants_deferred_text))
        segs.append(b.finalize())
    return segs


def test_packed_path_is_taken():
    b = SegmentBuilder(native=True)
    taken = []
    orig = SegmentBuilder._pack_doc
    b._pack_doc = lambda idoc: taken.append(1) or orig(b, idoc)
    sch = Schema()
    b.add(sch.index({"body": "hello world", "n": 3,
                     "ts": "2024-01-02T03:04:05"}, "0",
                    defer_text=b.wants_deferred_text))
    assert taken


def test_three_way_parity_mixed():
    docs = [
        {"body": "the quick brown fox", "price": 42,
         "ts": "2024-03-05T10:30:00", "cat": "a",
         "loc": {"_point": {"_longitude": -100.25, "_latitude": 40.5}}},
        {"body": "negative and float values", "price": -7.5,
         "ts": "1969-07-20T20:17:40"},          # pre-epoch
        {"price": 0, "ts": "1999-12-31T23:59:59.5"},   # fractional second
        {"price": 2**53, "ts": "1000-01-01T00:00:00"},  # packable edge
        {"price": 2**53 + 1},                    # falls back per-op
        {"price": 1e308},                        # falls back per-op
        {"ts": "0999-12-31T23:59:59"},           # falls back per-op
        {"body": "text only no values at all"},
        {"loc": {"_circle": {"_longitude": 10.0, "_latitude": -45.0,
                             "_radius": 250000}}},
    ]
    s_py, s_calls, s_packed = _build_three(docs)
    _assert_segments_equal(s_py, s_packed)
    _assert_segments_equal(s_calls, s_packed)


def test_fuzz_date_numeric_parity():
    rng = random.Random(1234)
    docs = []
    for _ in range(120):
        d = {}
        # random timestamp across 1601..9000, sometimes with microseconds
        y = rng.randint(1601, 9000)
        mo, dy = rng.randint(1, 12), rng.randint(1, 28)
        h, mi, s = rng.randint(0, 23), rng.randint(0, 59), rng.randint(0, 59)
        frac = rng.choice(["", ".25", ".999999", ".5"])
        d["ts"] = f"{y:04d}-{mo:02d}-{dy:02d}T{h:02d}:{mi:02d}:{s:02d}{frac}"
        kind = rng.random()
        if kind < 0.4:
            d["price"] = rng.randint(-10**12, 10**12)
        elif kind < 0.8:
            d["price"] = rng.uniform(-1e9, 1e9)
        else:
            d["price"] = rng.choice([0, -0.0, 0.5, -0.5, 1e-300, 99.999])
        if rng.random() < 0.3:
            d["body"] = " ".join(rng.choices(
                ["alpha", "beta", "gamma", "running", "foxes"], k=6))
        docs.append(d)
    s_py, _s_calls, s_packed = _build_three(docs)
    _assert_segments_equal(s_py, s_packed)


def test_custom_accuracy_parity():
    props = {
        "price": {"_type": "integer", "_accuracy": [10, 500, 7]},
        "ts": {"_type": "datetime",
               "_accuracy": ["minute", "day", "decade", "millennium",
                             "second"]},
    }
    docs = [{"price": 12345, "ts": "2024-06-15T12:34:56"},
            {"price": -6, "ts": "1905-02-28T01:02:03"}]
    s_py, s_calls, s_packed = _build_three(docs, props)
    _assert_segments_equal(s_py, s_packed)
    _assert_segments_equal(s_calls, s_packed)
