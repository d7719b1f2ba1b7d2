"""Replica synchronisation: WAL-changeset pull with full-copy fallback.

Reference parity target: src/server/replication_protocol*.{h,cc} - a
replica sends MSG_GET_CHANGESETS with its UUID+revision; the primary
streams WAL changesets (REPLY_CHANGESET) or, when those aren't available,
a full database copy (REPLY_DB_*), and the replica applies and swaps
(replication_protocol_client.cc:175-583). Here the channel is HTTP between
nodes (DCN between TPU-VM hosts, SURVEY §5.8): changesets ride the
``GET /idx/:wal?from=<rev>`` view and full copies ride ``:dump``.

Apply-side uses the same WAL-line semantics as local replay, so a replica
converges to the primary byte-for-byte at the document level.
"""

from __future__ import annotations

import asyncio
from typing import Optional

from xapiand_tpu.database import Database
from xapiand_tpu.index.wal import WalOp
from xapiand_tpu.utils import metrics as _metrics
from xapiand_tpu.schema import Schema


class ReplicationError(RuntimeError):
    pass


def apply_changeset(db: Database, lines: list[dict]) -> int:
    """Apply WAL lines (as served by the :wal view) to a local replica.

    Returns the number of applied lines. Lines below the replica's current
    revision are skipped (idempotent catch-up)."""
    applied = 0
    for line in lines:
        rev = line["revision"]
        if rev < db.revision:
            continue
        op = WalOp[line["op"].upper()]
        args = line["args"]
        if op == WalOp.REPLACE_DOCUMENT:
            db.index_document(args[1], doc_id=args[0])
        elif op == WalOp.DELETE_DOCUMENT:
            db.delete_document(args[0], missing_ok=True)
        elif op == WalOp.SET_METADATA:
            db.set_metadata(args[0], args[1])
        elif op == WalOp.SET_SCHEMA:
            db.schema = Schema.from_dict(args[0])
        elif op == WalOp.STORE_BLOB:
            # blob bytes are fetched separately; locator-only here
            # (a null locator is the _data:null erase)
            locs = db._blobs.setdefault(args[0], [])
            locs[:] = [l for l in locs
                       if l.get("_content_type") != args[1]] + \
                ([args[2]] if args[2] else [])
        elif op == WalOp.COMMIT:
            db.commit()
        applied += 1
    return applied


async def pull_once(db: Database, primary_url: str, index: str,
                    session=None) -> int:
    """One catch-up round against the primary; returns lines applied.

    ≙ one MSG_GET_CHANGESETS round trip."""
    import aiohttp

    own = session is None
    if own:
        session = aiohttp.ClientSession()
    try:
        url = f"{primary_url}/{index}/:wal"
        total = 0
        while True:
            async with session.get(url,
                                   params={"from": str(db.revision)}) as r:
                if r.status == 404:
                    raise ReplicationError(f"primary has no index {index!r}")
                if r.status != 200:
                    raise ReplicationError(f"wal fetch failed: {r.status}")
                payload = await r.json()
            lines = payload.get("wal", [])
            if lines and lines[0]["revision"] > db.revision:
                # WAL horizon is ahead of us: full copy (REPLY_DB_* path)
                return await full_copy(db, primary_url, index,
                                       session=session)
            before = db.revision
            applied = apply_changeset(db, lines)
            total += applied
            if applied:
                _metrics.inc("xapiand_replication_lines_applied", applied)
            if applied == 0 or db.revision == before:
                _metrics.inc("xapiand_replication_pulls")
                return total
    finally:
        if own:
            await session.close()


async def full_copy(db: Database, primary_url: str, index: str,
                    session=None) -> int:
    """Replica bootstrap. Preferred path: the primary's ``:snapshot``
    stream - committed segments as checksummed LZ4 records, deserialised
    directly into flat arrays with NO re-analysis, then the local WAL is
    reset to the primary's revision and a durable checkpoint written (the
    temp-apply + swap of replication_protocol_client.cc:547-583, O(bytes)
    instead of O(re-tokenize)). Falls back to ``:dump`` + re-index for
    primaries without the endpoint."""
    import aiohttp

    own = session is None
    if own:
        session = aiohttp.ClientSession()
    try:
        async with session.get(f"{primary_url}/{index}/:snapshot") as r:
            if r.status == 200 and r.content_type == \
                    "application/octet-stream":
                data = await r.read()
                n = _apply_snapshot(db, data)
                _metrics.inc("xapiand_replication_full_copies")
                return n
        async with session.get(f"{primary_url}/{index}/:dump") as r:
            if r.status != 200:
                raise ReplicationError(f"dump fetch failed: {r.status}")
            payload = await r.json()
        docs = payload.get("#dump", [])
        async with session.get(f"{primary_url}/{index}/:info") as r:
            info = await r.json() if r.status == 200 else {}
        # apply into a fresh generation then swap (temp-shard swap analog)
        db.merge_segments()  # compact out old state
        for key in list(db._locate):
            db.delete_document(key, missing_ok=True)
        n = db.restore_documents(docs)
        # adopt the primary's revision so subsequent changeset pulls align
        if "revision" in info:
            db.revision = int(info["revision"])
        _metrics.inc("xapiand_replication_full_copies")
        return n
    finally:
        if own:
            await session.close()


def _apply_snapshot(db: Database, data: bytes) -> int:
    from xapiand_tpu.models.snapshot import (load_snapshot_bytes,
                                             write_checkpoint)

    db._replaying = True   # state swap, not writes: nothing hits the WAL
    try:
        n = load_snapshot_bytes(db, data)
    finally:
        db._replaying = False
    if db.wal is not None:
        # local history is superseded wholesale; restart must load the
        # checkpoint + empty tail, never replay pre-bootstrap lines
        db.wal.reset(db.revision)
    write_checkpoint(db)
    return n


class Replicator:
    """Background puller for the indexes this node replicates.

    Trigger semantics follow the reference: a DB_UPDATED broadcast arms a
    short randomised debounce (discovery.cc:1141-1159 trigger_replication),
    and a slow periodic sweep catches anything missed."""

    def __init__(self, get_db, cluster, interval: float = 5.0):
        self.get_db = get_db           # (index) -> Database (local replica)
        self.cluster = cluster         # ClusterNode
        self.interval = interval
        self._dirty: set[str] = set()
        self._task: Optional[asyncio.Task] = None
        self._wake = asyncio.Event()

    def trigger(self, index: str):
        self._dirty.add(index)
        self._wake.set()

    async def start(self):
        self._task = asyncio.create_task(self._run())

    async def stop(self):
        if self._task:
            self._task.cancel()
            try:
                await self._task
            except asyncio.CancelledError:
                pass

    def _primary_url(self, index: str) -> Optional[str]:
        name = self.cluster.primary_of(index)
        if name is None or name == self.cluster.me.name:
            return None
        node = self.cluster.nodes.get(name)
        if node is None:
            return None
        return f"http://{node.host}:{node.http_port}"

    async def _run(self):
        import random as _random

        while True:
            try:
                await asyncio.wait_for(self._wake.wait(),
                                       timeout=self.interval)
            except asyncio.TimeoutError:
                # periodic sweep over every index the cluster knows about
                for n in self.cluster.nodes.values():
                    self._dirty.update(n.revisions.keys())
            self._wake.clear()
            await asyncio.sleep(_random.uniform(0.05, 0.3))  # debounce
            dirty, self._dirty = self._dirty, set()
            for index in dirty:
                url = self._primary_url(index)
                if url is None:
                    # primary unknown yet (assignment still propagating):
                    # keep the trigger armed for the next round
                    if self.cluster.primary_of(index) != self.cluster.me.name:
                        self._dirty.add(index)
                    continue
                try:
                    db = self.get_db(index)
                    applied = await pull_once(db, url, index)
                    if applied:
                        self.cluster.me.revisions[index] = db.revision
                except Exception:
                    _metrics.inc("xapiand_replication_errors")
                    self._dirty.add(index)  # retry next round
