"""Sortable key / serialisation tests (mirrors oldtests/test_serialise.cc
coverage intent: ordering and round-trip of every encodable type)."""

import math
import random

import pytest

from xapiand_tpu.utils import serialise as S


KEY_VALUES = [
    -math.inf, -1e300, -123456.789, -2.0, -1.5, -1.0, -1e-300, -0.0,
    0.0, 1e-300, 0.5, 1.0, 1.5, 2.0, 3.14159, 1e5, 123456.789, 1e300, math.inf,
]


def test_sortable_key_order():
    keys = [S.sortable_key_u64(v) for v in KEY_VALUES]
    assert keys == sorted(keys)
    # strictly increasing except -0.0/0.0 which must collide
    for a, b, ka, kb in zip(KEY_VALUES, KEY_VALUES[1:], keys, keys[1:]):
        if a == b:
            assert ka == kb
        else:
            assert ka < kb


def test_sortable_key_roundtrip():
    for v in KEY_VALUES:
        assert S.sortable_key_to_float(S.sortable_key_u64(v)) == v or (
            v == -0.0 and S.sortable_key_to_float(S.sortable_key_u64(v)) == 0.0
        )


def test_sortable_serialise_bytes_order():
    rng = random.Random(7)
    vals = sorted(rng.uniform(-1e9, 1e9) for _ in range(500))
    enc = [S.sortable_serialise(v) for v in vals]
    assert enc == sorted(enc)
    for v, e in zip(vals, enc):
        assert S.sortable_unserialise(e) == v


def test_split_join_key_order():
    rng = random.Random(3)
    vals = sorted(rng.uniform(-1e12, 1e12) for _ in range(200))
    pairs = [S.split_key(S.sortable_key_u64(v)) for v in vals]
    assert pairs == sorted(pairs)  # lexicographic signed tuple order
    for v, (hi, lo) in zip(vals, pairs):
        assert S.sortable_key_to_float(S.join_key(hi, lo)) == pytest.approx(v)
        assert -(1 << 31) <= hi < (1 << 31)
        assert -(1 << 31) <= lo < (1 << 31)


def test_int_term_roundtrip_order():
    vals = [-(10**15), -65536, -2, -1, 0, 1, 2, 42, 65535, 10**15]
    terms = [S.serialise_int_term(v) for v in vals]
    assert terms == sorted(terms)
    assert [S.unserialise_int_term(t) for t in terms] == vals


def test_float_term_roundtrip():
    for v in (-1.5, 0.0, 2.25, 1e10):
        assert S.unserialise_float_term(S.serialise_float_term(v)) == v


def test_string_key_prefix_order():
    words = sorted(["", "a", "aa", "ab", "apple", "banana", "zebra"])
    keys = [S.serialise_string_key(w) for w in words]
    assert keys == sorted(keys)


def test_datetime_map_form_full():
    """Full reference map form (datetime.cc process_date_datetime):
    _hour/_minute/_second/_fsec components and a nested _date map."""
    from xapiand_tpu.utils import dtutils

    full = dtutils.parse_datetime("2015-03-14T09:26:53.123")
    assert dtutils.parse_datetime({
        "_year": 2015, "_month": 3, "_day": 14,
        "_hour": 9, "_minute": 26, "_second": 53,
        "_fsec": 0.123}) == full
    assert dtutils.parse_datetime({
        "_date": {"_year": 2015, "_month": 3, "_day": 14},
        "_time": "09:26:53.123"}) == full
