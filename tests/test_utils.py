"""Datetime / UUID / hashing / codec tests (mirrors oldtests/test_uuid.cc,
test_hash.cc, test_compressor.cc, test_msgpack.cc coverage intent)."""

import pytest

from xapiand_tpu.utils import codecs, dtutils, hashing, uuid64


# --- datetime ---------------------------------------------------------------

def test_parse_date_only():
    assert dtutils.parse_datetime("1970-01-01") == 0.0
    assert dtutils.parse_datetime("1970-01-02") == 86400.0
    assert dtutils.parse_datetime("2001/01/01") == 978307200.0


def test_parse_datetime_full():
    ts = dtutils.parse_datetime("2015-03-14T09:26:53")
    assert dtutils.timestamp_to_iso(ts) == "2015-03-14T09:26:53"
    # timezone handling
    a = dtutils.parse_datetime("2015-03-14T09:26:53Z")
    b = dtutils.parse_datetime("2015-03-14T10:26:53+01:00")
    assert a == b == ts
    c = dtutils.parse_datetime("2015-03-14T04:26:53-05:00")
    assert c == ts


def test_parse_datetime_fractional_and_numeric():
    ts = dtutils.parse_datetime("2015-03-14T09:26:53.123")
    assert ts == pytest.approx(dtutils.parse_datetime("2015-03-14T09:26:53") + 0.123)
    assert dtutils.parse_datetime(12345.5) == 12345.5


def test_parse_datetime_dict_form():
    ts = dtutils.parse_datetime({"_year": 2015, "_month": 3, "_day": 14,
                                 "_time": "09:26:53"})
    assert ts == dtutils.parse_datetime("2015-03-14T09:26:53")


def test_invalid_dates():
    for bad in ("2015-13-01", "2015-02-30", "nope", True):
        with pytest.raises(dtutils.DatetimeError):
            dtutils.parse_datetime(bad)


def test_time_and_timedelta():
    assert dtutils.parse_time("09:26:53") == 9 * 3600 + 26 * 60 + 53
    assert dtutils.parse_timedelta("-01:30") == -5400
    assert dtutils.parse_timedelta("00:00:01.5") == 1.5


def test_truncate_units():
    ts = dtutils.parse_datetime("2015-03-14T09:26:53")
    assert dtutils.truncate_to(ts, "hour") == dtutils.parse_datetime("2015-03-14T09:00:00")
    assert dtutils.truncate_to(ts, "day") == dtutils.parse_datetime("2015-03-14")
    assert dtutils.truncate_to(ts, "month") == dtutils.parse_datetime("2015-03-01")
    assert dtutils.truncate_to(ts, "year") == dtutils.parse_datetime("2015-01-01")
    assert dtutils.truncate_to(ts, "decade") == dtutils.parse_datetime("2010-01-01")
    assert dtutils.truncate_to(ts, "century") == dtutils.parse_datetime("2000-01-01")


# --- uuid -------------------------------------------------------------------

def test_uuid_generate_and_detect():
    u = uuid64.generate_uuid()
    assert uuid64.is_uuid(u)
    assert uuid64.normalise_uuid(u.upper()) == u
    assert uuid64.is_uuid("not-a-uuid") is False
    assert uuid64.is_uuid("{" + u + "}")
    assert uuid64.is_uuid("urn:uuid:" + u)


def test_uuid_serialise_roundtrip():
    u = uuid64.generate_uuid()
    b = uuid64.serialise_uuid(u)
    assert len(b) == 16
    assert uuid64.unserialise_uuid(b) == u


def test_uuid_compact_roundtrip():
    u = uuid64.generate_uuid()
    c = uuid64.encode_compact(u)
    assert c.startswith("~")
    assert uuid64.is_uuid(c)
    assert uuid64.normalise_uuid(c) == u


def test_b59_roundtrip():
    for data in (b"\x00" * 16, b"\x00\x01" + b"\xff" * 14, bytes(range(16))):
        assert uuid64.b59_decode(uuid64.b59_encode(data)) == data


# --- hashing ----------------------------------------------------------------

def test_fnv1ah64_vectors():
    # Standard FNV-1a 64 vectors
    assert hashing.fnv1ah64(b"") == 0xCBF29CE484222325
    assert hashing.fnv1ah64(b"a") == 0xAF63DC4C8601EC8C
    assert hashing.fnv1ah64("foobar") == 0x85944171F73967E8


def test_xxh64_known():
    # xxh64("") seed 0
    assert hashing.xxh64(b"") == 0xEF46DB3751D8E999


# --- codecs -----------------------------------------------------------------

DOC = {"name": "Crystal", "age": 29, "tags": ["a", "b"], "nested": {"x": 1.5}}


def test_msgpack_roundtrip():
    assert codecs.unpack_msgpack(codecs.pack_msgpack(DOC)) == DOC


def test_json_ndjson_yaml_roundtrip():
    assert codecs.loads_json(codecs.dumps_json(DOC)) == DOC
    docs = [DOC, {"i": 0}]
    assert codecs.loads_ndjson(codecs.dumps_ndjson(docs)) == docs
    assert codecs.loads_yaml(codecs.dumps_yaml(DOC)) == DOC


def test_compression_roundtrip():
    data = b"hello world " * 1000
    for comp, dec in ((codecs.deflate_compress, codecs.deflate_decompress),
                      (codecs.gzip_compress, codecs.gzip_decompress),
                      (codecs.block_compress, codecs.block_decompress)):
        out = comp(data)
        assert len(out) < len(data)
        assert dec(out) == data


def test_checksum():
    assert codecs.checksum(b"abc") == hashing.xxh64(b"abc")
