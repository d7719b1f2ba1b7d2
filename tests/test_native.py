"""Native library tests: LZ4 codec, ASCII tokenizer, fnv1a, delta codec."""

import random

import pytest

from xapiand_tpu.native import lib
from xapiand_tpu.utils.hashing import fnv1ah64

pytestmark = pytest.mark.skipif(lib is None, reason="native lib unavailable")


def test_lz4_roundtrip():
    rng = random.Random(1)
    cases = [
        b"",
        b"a",
        b"hello world " * 500,
        bytes(rng.randrange(256) for _ in range(10000)),  # incompressible
        b"abcabcabcabc" * 1000,
        bytes(range(256)) * 64,
    ]
    for data in cases:
        if not data:
            continue
        comp = lib.lz4_compress(data)
        if comp is None:
            continue  # incompressible within cap; fallback codec handles it
        assert lib.lz4_decompress(comp) == data


def test_lz4_compresses_repetitive():
    data = b"the quick brown fox " * 1000
    comp = lib.lz4_compress(data)
    assert comp is not None and len(comp) < len(data) // 5


def test_lz4_through_block_codec():
    from xapiand_tpu.utils import codecs

    data = b"repetitive payload " * 1000
    out = codecs.block_compress(data)
    assert out[0:1] == b"L"  # native LZ4 selected
    assert codecs.block_decompress(out) == data


def test_fnv1a_matches_python():
    for s in (b"", b"a", b"foobar", b"Q12345", bytes(range(100))):
        assert lib.fnv1a64(s) == fnv1ah64(s)


def test_tokenizer_matches_python():
    from xapiand_tpu.analysis.unicode_tok import tokenize

    cases = [
        "Hello, World! foo-bar",
        "don't stop AT&T C++ and C# code",
        "  multiple   spaces\tand\nnewlines ",
        "trailing+++ plus#### signs",
        "123 abc123s 42.5",
    ]
    for text in cases:
        native = lib.tokenize_ascii(text)
        expect = [(t.text, t.position) for t in tokenize(text)]
        assert native == expect, text


def test_tokenizer_rejects_non_ascii():
    assert lib.tokenize_ascii("café") is None


def test_delta_codec():
    vals = sorted(random.Random(2).sample(range(10**6), 5000))
    enc = lib.delta_encode(vals)
    assert len(enc) < 4 * len(vals)  # beats raw u32
    dec = lib.delta_decode(enc, len(vals) + 10)
    assert list(dec) == vals


def test_tokenizer_no_token_cap():
    """ASCII docs beyond the old 65,536-token cap keep all their terms."""
    text = " ".join(f"w{i}" for i in range(70000))
    toks = lib.tokenize_ascii(text)
    assert toks is not None
    assert len(toks) == 70000
    assert toks[-1][0] == "w69999" and toks[-1][1] == 69999


def test_htm_cap_cover_bit_identical(monkeypatch):
    """Native cap cover must be bit-identical to the Python cover (same
    IEEE double ops in the same order; geo ranks/buckets depend on it)."""
    import random

    from xapiand_tpu import native
    from xapiand_tpu.geo import htm

    if native.lib is None:
        import pytest

        pytest.skip("native lib unavailable")
    rng = random.Random(17)
    for _ in range(60):
        lat = rng.uniform(-89.9, 89.9)
        lon = rng.uniform(-180, 180)
        radius = 10 ** rng.uniform(-7, -2.2)
        nat = htm.cover(htm.Cap(lat, lon, radius))
        with monkeypatch.context() as m:
            m.setattr(native, "lib", None)
            py = htm.cover(htm.Cap(lat, lon, radius))
        assert nat == py, (lat, lon, radius)
