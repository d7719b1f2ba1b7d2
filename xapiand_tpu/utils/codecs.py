"""Serialisation + compression codecs for wire and storage.

Reference parity targets: MsgPack as the universal document type
(src/msgpack.h), LZ4/deflate streaming compressors
(src/compressor_lz4.*, src/compressor_deflate.*), content negotiation
JSON/MsgPack/NDJSON/YAML (src/server/http_client.cc:1000-1005).

Compression: the environment has zlib + zstandard; LZ4 block compression is
provided by the native C++ extension when built (xapiand_tpu/native), with
zlib as the fallback. Checksums use xxh64 as in the reference's
client_compressor.h.
"""

from __future__ import annotations

import json
import zlib
from typing import Any, Iterable

import msgpack

try:
    import zstandard as _zstd
except ImportError:  # pragma: no cover
    _zstd = None

try:
    import yaml as _yaml
except ImportError:  # pragma: no cover
    _yaml = None

from xapiand_tpu.utils.hashing import xxh64


# --- document codecs -------------------------------------------------------

def pack_msgpack(obj: Any) -> bytes:
    return msgpack.packb(obj, use_bin_type=True, datetime=False, default=str)


def unpack_msgpack(data: bytes) -> Any:
    return msgpack.unpackb(data, raw=False, strict_map_key=False)


def dumps_json(obj: Any, indent: int | None = None) -> bytes:
    return json.dumps(obj, indent=indent, ensure_ascii=False,
                      default=str).encode("utf-8")


def loads_json(data: bytes | str) -> Any:
    try:
        return json.loads(data)
    except json.JSONDecodeError:
        if isinstance(data, bytes):
            data = data.decode("utf-8")
        return json.loads(_relaxed_json(data))


def _relaxed_json(text: str) -> str:
    """Strip the reference's JSON deviations (api.md 'Deviations from
    JSON'): C-style /* */ and // comments anywhere, trailing commas.
    String-aware single pass."""
    out = []
    i, n = 0, len(text)
    pending_comma = False

    def flush():
        nonlocal pending_comma
        if pending_comma:
            out.append(",")
            pending_comma = False

    while i < n:
        c = text[i]
        if c == '"':
            flush()
            out.append(c)
            i += 1
            while i < n:
                ch = text[i]
                out.append(ch)
                if ch == "\\" and i + 1 < n:
                    out.append(text[i + 1])
                    i += 2
                    continue
                i += 1
                if ch == '"':
                    break
            continue
        if c == "/" and text[i + 1: i + 2] == "/":
            j = text.find("\n", i)
            i = n if j < 0 else j
            continue
        if c == "/" and text[i + 1: i + 2] == "*":
            j = text.find("*/", i + 2)
            i = n if j < 0 else j + 2
            continue
        if c == ",":
            flush()
            pending_comma = True
            i += 1
            continue
        if c in "}]":
            pending_comma = False   # trailing comma dropped
            out.append(c)
            i += 1
            continue
        if c in " \t\r\n":
            out.append(c)
            i += 1
            continue
        flush()
        out.append(c)
        i += 1
    return "".join(out)


def dumps_ndjson(objs: Iterable[Any]) -> bytes:
    return b"\n".join(dumps_json(o) for o in objs) + b"\n"


def loads_ndjson(data: bytes | str) -> list[Any]:
    if isinstance(data, bytes):
        data = data.decode("utf-8")
    return [json.loads(line) for line in data.splitlines() if line.strip()]


def dumps_yaml(obj: Any) -> bytes:
    if _yaml is None:  # pragma: no cover
        raise RuntimeError("yaml unavailable")
    return _yaml.safe_dump(obj, allow_unicode=True).encode("utf-8")


def loads_yaml(data: bytes | str) -> Any:
    if _yaml is None:  # pragma: no cover
        raise RuntimeError("yaml unavailable")
    return _yaml.safe_load(data)


# --- compression -----------------------------------------------------------

def deflate_compress(data: bytes, level: int = 6) -> bytes:
    return zlib.compress(data, level)


def deflate_decompress(data: bytes) -> bytes:
    return zlib.decompress(data)


def gzip_compress(data: bytes, level: int = 6) -> bytes:
    co = zlib.compressobj(level, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    return co.compress(data) + co.flush()


def gzip_decompress(data: bytes) -> bytes:
    return zlib.decompress(data, 16 + zlib.MAX_WBITS)


def _native_lz4():
    try:
        from xapiand_tpu.native import lib as _native
        return _native
    except Exception:
        return None


def block_compress(data: bytes) -> bytes:
    """Storage/WAL block compression: native LZ4 when available, else zstd,
    else zlib. Output is self-describing: 1-byte codec tag + payload."""
    native = _native_lz4()
    if native is not None:
        out = native.lz4_compress(data)
        if out is not None:
            return b"L" + out
    if _zstd is not None:
        return b"Z" + _zstd.ZstdCompressor(level=3).compress(data)
    return b"D" + zlib.compress(data, 6)


def block_decompress(data: bytes) -> bytes:
    tag, payload = data[:1], data[1:]
    if tag == b"L":
        native = _native_lz4()
        if native is None:
            raise RuntimeError("LZ4 native codec unavailable")
        return native.lz4_decompress(payload)
    if tag == b"Z":
        if _zstd is None:
            raise RuntimeError("zstd unavailable")
        return _zstd.ZstdDecompressor().decompress(payload)
    if tag == b"D":
        return zlib.decompress(payload)
    raise ValueError(f"unknown compression tag {tag!r}")


def checksum(data: bytes) -> int:
    """xxh64 checksum as used on the replication wire (client_compressor.h)."""
    return xxh64(data)
