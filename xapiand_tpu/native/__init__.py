"""ctypes bindings for the native runtime library, with lazy build.

``lib`` is None when the shared object is missing and cannot be built;
every caller has a pure-Python fallback (utils.codecs, analysis.unicode_tok,
utils.hashing), so the engine degrades gracefully rather than failing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libxapiand_native.so")
_SRC = os.path.join(_HERE, "native.cpp")
_lock = threading.Lock()


class NativeLib:
    def __init__(self, cdll):
        self._c = cdll
        c = cdll
        c.xt_fnv1a64.restype = ctypes.c_uint64
        c.xt_fnv1a64.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        c.xt_lz4_compress.restype = ctypes.c_int64
        c.xt_lz4_compress.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                      ctypes.c_char_p, ctypes.c_int64]
        c.xt_lz4_decompress.restype = ctypes.c_int64
        c.xt_lz4_decompress.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                        ctypes.c_char_p, ctypes.c_int64]
        c.xt_tokenize_ascii.restype = ctypes.c_int64
        c.xt_tokenize_ascii.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
        c.xt_delta_encode.restype = ctypes.c_int64
        c.xt_delta_encode.argtypes = [ctypes.POINTER(ctypes.c_uint32),
                                      ctypes.c_int64, ctypes.c_char_p,
                                      ctypes.c_int64]
        c.xt_delta_decode.restype = ctypes.c_int64
        c.xt_delta_decode.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                      ctypes.POINTER(ctypes.c_uint32),
                                      ctypes.c_int64]

    def fnv1a64(self, data: bytes) -> int:
        return self._c.xt_fnv1a64(data, len(data))

    def lz4_compress(self, data: bytes) -> bytes | None:
        cap = len(data) + len(data) // 128 + 64
        out = ctypes.create_string_buffer(cap)
        n = self._c.xt_lz4_compress(data, len(data), out, cap)
        if n < 0:
            return None
        # prefix the raw size (block format does not self-describe it)
        return len(data).to_bytes(4, "little") + out.raw[:n]

    def lz4_decompress(self, data: bytes) -> bytes:
        raw_size = int.from_bytes(data[:4], "little")
        out = ctypes.create_string_buffer(max(raw_size, 1))
        n = self._c.xt_lz4_decompress(data[4:], len(data) - 4, out, raw_size)
        if n != raw_size:
            raise ValueError("LZ4 decompression failed")
        return out.raw[:raw_size]

    def tokenize_ascii(self, text: str):
        """-> list[(token, position)] or None for non-ASCII input."""
        raw = text.encode("ascii", errors="strict") if text.isascii() else None
        if raw is None:
            return None
        cap = len(raw) + 8
        buf = ctypes.create_string_buffer(cap)
        # a token needs >=1 char + a separator, so len//2+2 is a strict
        # upper bound on the token count: no document can overflow it (the
        # old fixed 65536 cap silently dropped terms past ~128KB of ASCII)
        max_tokens = len(raw) // 2 + 2
        spans = (ctypes.c_int32 * (2 * max_tokens))()
        n = self._c.xt_tokenize_ascii(raw, len(raw), buf, cap, spans,
                                      max_tokens)
        if n < 0:
            return None
        out = []
        text_out = buf.raw
        for k in range(n):
            s, ln = spans[2 * k], spans[2 * k + 1]
            out.append((text_out[s:s + ln].decode("ascii"), k))
        return out

    def delta_encode(self, vals) -> bytes:
        import numpy as np

        arr = np.ascontiguousarray(vals, dtype=np.uint32)
        cap = 5 * len(arr) + 16
        out = ctypes.create_string_buffer(cap)
        ptr = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
        n = self._c.xt_delta_encode(ptr, len(arr), out, cap)
        if n < 0:
            raise ValueError("delta encode overflow")
        return out.raw[:n]

    def delta_decode(self, data: bytes, max_out: int):
        import numpy as np

        arr = np.zeros(max_out, dtype=np.uint32)
        ptr = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
        n = self._c.xt_delta_decode(data, len(data), ptr, max_out)
        if n < 0:
            raise ValueError("delta decode failed")
        return arr[:n]


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    with _lock:
        if not os.path.exists(_SO) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            return NativeLib(ctypes.CDLL(_SO))
        except OSError:
            return None


lib = _load()
