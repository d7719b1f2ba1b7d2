"""Write-ahead log: every write op logged pre-commit, replayed on open.

Reference parity target: src/database/wal.{h,cc} - volume files named
``wal.<revision>`` whose header carries the shard UUID + base revision
(wal.h:56-77); op types (wal.h:114-122): COMMIT, REPLACE_DOCUMENT,
DELETE_DOCUMENT, SET_METADATA (+ spelling ops reserved). Lines are
msgpack'd tuples written through the checksummed Storage record format;
replay executes lines in order (wal.cc:506 execute_line) and also serves
replication changesets and the ``GET /idx/:wal`` view.
"""

from __future__ import annotations

import enum
import os
import re
from typing import Callable, Iterator, Optional

from xapiand_tpu.index.storage import Storage
from xapiand_tpu.utils.codecs import pack_msgpack, unpack_msgpack
from xapiand_tpu.utils.uuid64 import generate_uuid

MAX_LINES_PER_VOLUME = 4096
_WAL_RE = re.compile(r"^wal\.(\d+)$")


class WalOp(enum.IntEnum):
    COMMIT = 0
    REPLACE_DOCUMENT = 1
    DELETE_DOCUMENT = 2
    SET_METADATA = 3
    ADD_SPELLING = 4
    REMOVE_SPELLING = 5
    SET_SCHEMA = 6
    STORE_BLOB = 7   # (doc_id, content_type, locator) - bytes live in docdata
    ADD_SYNONYM = 8      # (term, synonym)      ≙ Database::add_synonym
    REMOVE_SYNONYM = 9   # (term, synonym|None) None clears the whole entry


class DatabaseWAL:
    """Per-shard WAL over numbered volumes.

    Revision semantics follow the reference: the revision increments on
    COMMIT; a volume is named after the first revision it contains; replay
    starts from the requested revision's volume.
    """

    def __init__(self, dirname: str, uuid: Optional[str] = None):
        self.dir = dirname
        os.makedirs(dirname, exist_ok=True)
        meta_path = os.path.join(dirname, "meta")
        if os.path.exists(meta_path):
            with open(meta_path, "rb") as fh:
                meta = unpack_msgpack(fh.read())
            self.uuid = meta["uuid"]
        else:
            self.uuid = uuid or generate_uuid()
            with open(meta_path, "wb") as fh:
                fh.write(pack_msgpack({"uuid": self.uuid}))
        self.revision = 0
        self._volume: Optional[Storage] = None
        self._volume_rev = 0
        self._lines_in_volume = 0
        self._recover()

    # -- internals -------------------------------------------------------------

    def _volumes(self) -> list[tuple[int, str]]:
        out = []
        for name in os.listdir(self.dir):
            m = _WAL_RE.match(name)
            if m:
                out.append((int(m.group(1)), os.path.join(self.dir, name)))
        return sorted(out)

    def _recover(self):
        vols = self._volumes()
        if not vols:
            self._open_volume(0)
            return
        rev = vols[-1][0]
        count = 0
        ro = Storage(vols[-1][1], writable=False)
        for _, line in ro.scan():
            op, *_rest = unpack_msgpack(line)
            count += 1
            if op == WalOp.COMMIT:
                rev += 1
        valid_end = ro.scan_end
        ro.close()
        self.revision = rev
        self._volume_rev = vols[-1][0]
        self._volume = Storage(vols[-1][1], writable=True)
        # a crash can leave a partial/corrupt tail record; scan() stops at
        # it but the writable volume would otherwise append AFTER the
        # garbage, silently losing every post-recovery write on next open
        # (reference wal.cc:251 truncates at the bad record)
        if self._volume.size > valid_end:
            self._volume.truncate(valid_end)
            # ≙ xapiand_wal_errors (metrics.h:49): corrupt tails are the
            # observable signal a WAL went bad
            from xapiand_tpu.utils import metrics as _metrics

            _metrics.inc("xapiand_wal_errors")
        self._lines_in_volume = count

    def _open_volume(self, rev: int):
        if self._volume is not None:
            self._volume.close()
        self._volume_rev = rev
        self._volume = Storage(os.path.join(self.dir, f"wal.{rev}"))
        self._lines_in_volume = 0

    # -- writing -----------------------------------------------------------------

    def append(self, op: WalOp, *args, fsync: bool = False) -> None:
        line = pack_msgpack([int(op)] + list(args))
        self._volume.write(line)
        self._lines_in_volume += 1
        if fsync:
            self._volume.fsync()
        if op == WalOp.COMMIT:
            self.revision += 1
            if self._lines_in_volume >= MAX_LINES_PER_VOLUME:
                self._open_volume(self.revision)

    def write_replace_document(self, doc_id: str, obj: dict, **kw):
        self.append(WalOp.REPLACE_DOCUMENT, doc_id, obj, **kw)

    def write_delete_document(self, doc_id: str, **kw):
        self.append(WalOp.DELETE_DOCUMENT, doc_id, **kw)

    def write_set_metadata(self, key: str, value, **kw):
        self.append(WalOp.SET_METADATA, key, value, **kw)

    def write_set_schema(self, schema_props: dict, **kw):
        self.append(WalOp.SET_SCHEMA, schema_props, **kw)

    def write_add_spelling(self, word: str, freqinc: int = 1, **kw):
        self.append(WalOp.ADD_SPELLING, word, int(freqinc), **kw)

    def write_remove_spelling(self, word: str, freqdec: int = 1, **kw):
        self.append(WalOp.REMOVE_SPELLING, word, int(freqdec), **kw)

    def write_add_synonym(self, term: str, synonym: str, **kw):
        self.append(WalOp.ADD_SYNONYM, term, synonym, **kw)

    def write_remove_synonym(self, term: str, synonym=None, **kw):
        self.append(WalOp.REMOVE_SYNONYM, term, synonym, **kw)

    def write_commit(self, fsync: bool = True):
        self.append(WalOp.COMMIT, fsync=fsync)

    # -- reading -----------------------------------------------------------------

    def lines(self, from_revision: int = 0) -> Iterator[tuple[int, list]]:
        """Yield (revision_at_line, [op, *args]) from from_revision on -
        feeds both open-time replay and replication changesets
        (replication_protocol MSG_GET_CHANGESETS analog)."""
        rev = None
        for vol_rev, path in self._volumes():
            if rev is None:
                rev = vol_rev
            for _, line in Storage(path, writable=False).scan():
                entry = unpack_msgpack(line)
                if rev >= from_revision:
                    yield rev, entry
                if entry[0] == WalOp.COMMIT:
                    rev += 1

    def replay(self, apply: Callable[[list], None],
               from_revision: int = 0) -> int:
        """Apply every line from from_revision; returns final revision."""
        count = 0
        for _rev, entry in self.lines(from_revision):
            apply(entry)
            count += 1
        return count

    def repr_wal(self, from_revision: int = 0, limit: int = 1000) -> list:
        """Human-readable WAL dump (GET /idx/:wal view,
        http_client.cc:2300-2330)."""
        out = []
        for rev, entry in self.lines(from_revision):
            op = WalOp(entry[0])
            out.append({"revision": rev, "op": op.name.lower(),
                        "args": entry[1:]})
            if len(out) >= limit:
                break
        return out

    # -- checkpoint integration ---------------------------------------------

    def prune(self, before_revision: int) -> int:
        """Delete volumes wholly below ``before_revision`` (their lines are
        captured by a durable snapshot; restart replays only the tail).
        The open volume is never deleted. Returns volumes removed."""
        vols = self._volumes()
        removed = 0
        for i in range(len(vols) - 1):
            if vols[i + 1][0] <= before_revision:
                os.remove(vols[i][1])
                removed += 1
        return removed

    def reset(self, revision: int) -> None:
        """Drop ALL volumes and restart the log at ``revision`` - the
        replica's full-copy swap: its history is replaced wholesale by the
        primary's snapshot, so local WAL lines before it are meaningless
        (≙ the temp-database swap in replication_protocol_client.cc:547)."""
        if self._volume is not None:
            self._volume.close()
            self._volume = None
        for _rev, path in self._volumes():
            os.remove(path)
        self.revision = revision
        self._open_volume(revision)

    def close(self):
        if self._volume is not None:
            self._volume.close()
            self._volume = None
