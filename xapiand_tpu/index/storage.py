"""Append-only storage volumes.

Reference parity target: src/storage.h (generic volume file: magic header,
length-prefixed bins with checksum footers, storage.h:53-68). Layout here:

  file header : MAGIC(8) | version u32 | reserved u32
  record      : length u32 | flags u8 | payload | xxh64 u64

flags bit0 = compressed (block codec from utils.codecs). Offsets returned by
``write`` address the record start and are stable forever (append-only).
"""

from __future__ import annotations

import os
import struct
from typing import Iterator, Optional

from xapiand_tpu.utils.codecs import block_compress, block_decompress
from xapiand_tpu.utils.hashing import xxh64

MAGIC = b"XPTPUv01"
HEADER_SIZE = 16
_REC_HDR = struct.Struct("<IB")
_SUM = struct.Struct("<Q")

FLAG_COMPRESSED = 0x01


class FaultInjector:
    """Chaos-testing knobs (≙ --random-errors-io/db/net, opts.h:105-107;
    errno injection in every io:: wrapper, io.cc:56-215; net faults drop
    discovery/replication messages).

    Rates come from env vars XAPIAND_RANDOM_ERRORS_IO / _DB / _NET
    (probability in [0,1]) or set_rates(); the RNG is seeded for
    reproducible chaos runs. IO faults carry a random errno like the
    reference's io:: wrappers (EIO/ENOSPC/EBADF/EINTR...).
    """

    _ERRNOS = (5, 28, 9, 4, 13, 24)   # EIO ENOSPC EBADF EINTR EACCES EMFILE

    def __init__(self):
        import random

        self.io_rate = float(os.environ.get("XAPIAND_RANDOM_ERRORS_IO", 0))
        self.db_rate = float(os.environ.get("XAPIAND_RANDOM_ERRORS_DB", 0))
        self.net_rate = float(os.environ.get("XAPIAND_RANDOM_ERRORS_NET",
                                             0))
        self.net_every = 0
        self._net_count = 0
        self._rng = random.Random(
            int(os.environ.get("XAPIAND_RANDOM_ERRORS_SEED", 42)))

    def set_rates(self, io: float = 0.0, db: float = 0.0,
                  net: float = 0.0, seed: int = 42, net_every: int = 0):
        import random

        self.io_rate, self.db_rate, self.net_rate = io, db, net
        # net_every=N drops exactly every Nth send: same loss RATE as
        # net=1/N but with a bounded gap between delivered messages, so
        # chaos tests can assert convergence within a fixed deadline
        # (a random stream can legally drop 20 heartbeats in a row)
        self.net_every = int(net_every)
        self._net_count = 0
        self._rng = random.Random(seed)

    def maybe_io(self, what: str):
        if self.io_rate and self._rng.random() < self.io_rate:
            import errno as _errno
            import os as _os

            code = self._rng.choice(self._ERRNOS)
            err = StorageError(
                f"injected IO error in {what} "
                f"[{_errno.errorcode.get(code, code)}] (RANDOM_ERRORS_IO)")
            err.errno = code
            err.strerror = _os.strerror(code)
            raise err

    def maybe_db(self, what: str):
        if self.db_rate and self._rng.random() < self.db_rate:
            raise StorageError(f"injected DB error in {what} "
                               "(RANDOM_ERRORS_DB)")

    def drop_net(self, what: str = "send") -> bool:
        """True = drop this network message (packet-loss chaos)."""
        if self.net_every:
            self._net_count += 1
            return self._net_count % self.net_every == 0
        return bool(self.net_rate and self._rng.random() < self.net_rate)


class StorageError(IOError):
    pass


class StorageCorruptVolume(StorageError):
    pass


faults = FaultInjector()   # process-wide chaos knobs


class Storage:
    """One append-only volume file."""

    def __init__(self, path: str, writable: bool = True,
                 compress_threshold: int = 128):
        self.path = path
        self.writable = writable
        self.compress_threshold = compress_threshold
        exists = os.path.exists(path)
        mode = ("r+b" if exists else "w+b") if writable else "rb"
        if not exists and not writable:
            raise StorageError(f"volume not found: {path}")
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._fh = open(path, mode)
        if exists and os.path.getsize(path) >= HEADER_SIZE:
            self._fh.seek(0)
            head = self._fh.read(HEADER_SIZE)
            if head[:8] != MAGIC:
                raise StorageCorruptVolume(f"bad magic in {path}")
        else:
            self._fh.write(MAGIC + struct.pack("<II", 1, 0))
            self._fh.flush()
        self._fh.seek(0, os.SEEK_END)
        self._end = self._fh.tell()
        self._at_end = True

    @property
    def size(self) -> int:
        return self._end

    def write(self, payload: bytes, compress: Optional[bool] = None) -> int:
        if not self.writable:
            raise StorageError("volume is read-only")
        faults.maybe_io("storage.write")
        if compress is None:
            compress = len(payload) >= self.compress_threshold
        flags = 0
        body = payload
        if compress:
            c = block_compress(payload)
            if len(c) < len(payload):
                body, flags = c, FLAG_COMPRESSED
        offset = self._end
        rec = _REC_HDR.pack(len(body), flags) + body + _SUM.pack(xxh64(body))
        if not self._at_end:            # a read() moved the position
            self._fh.seek(self._end)
            self._at_end = True
        self._fh.write(rec)
        self._end += len(rec)
        return offset

    def read(self, offset: int) -> bytes:
        faults.maybe_io("storage.read")
        self._at_end = False
        self._fh.seek(offset)
        hdr = self._fh.read(_REC_HDR.size)
        if len(hdr) < _REC_HDR.size:
            raise StorageCorruptVolume(f"truncated record at {offset}")
        length, flags = _REC_HDR.unpack(hdr)
        body = self._fh.read(length)
        tail = self._fh.read(_SUM.size)
        if len(body) < length or len(tail) < _SUM.size:
            raise StorageCorruptVolume(f"truncated record at {offset}")
        (checksum,) = _SUM.unpack(tail)
        if xxh64(body) != checksum:
            raise StorageCorruptVolume(f"checksum mismatch at {offset}")
        if flags & FLAG_COMPRESSED:
            body = block_decompress(body)
        return body

    def scan(self) -> Iterator[tuple[int, bytes]]:
        """Yield (offset, payload) for every record; stop cleanly at a
        truncated tail (crash recovery semantics: last partial write is
        discarded, like WAL replay in the reference wal.cc:251). After the
        scan, ``scan_end`` holds the end offset of the last VALID record -
        recovery must truncate to it before appending, or post-recovery
        records would land after the garbage and be unreachable."""
        offset = HEADER_SIZE
        self.scan_end = offset
        while offset < self._end:
            try:
                payload = self.read(offset)
            except StorageCorruptVolume:
                return
            yield offset, payload
            self._at_end = False
            self._fh.seek(offset)
            length, _ = _REC_HDR.unpack(self._fh.read(_REC_HDR.size))
            offset += _REC_HDR.size + length + _SUM.size
            self.scan_end = offset

    def truncate(self, offset: int):
        """Drop everything past ``offset`` (crash-recovery tail cleanup,
        ≙ reference wal.cc:251 truncate-on-bad-record)."""
        if not self.writable:
            raise StorageError("volume is read-only")
        offset = max(offset, HEADER_SIZE)
        self._fh.truncate(offset)
        self._end = offset
        self._at_end = False

    def fsync(self):
        self._fh.flush()
        os.fsync(self._fh.fileno())

    def close(self):
        try:
            self._fh.flush()
        finally:
            self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
