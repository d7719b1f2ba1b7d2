"""Parallel bulk-indexing pipeline.

Reference parity target: DocPreparer/DocIndexer (src/database/handler.h:
256-361): parse+analysis runs as parallel tasks on a prepare pool whose
results feed the (single-writer) segment builder in submission order, with
prepared/processed/indexed/total counters surfaced to the RESTORE response
(http_client.cc:2261-2285).

TPU-era shape: analysis (tokenise/stem/term-gen, Schema.index) is the
CPU-bound stage and runs on a thread pool - the native ASCII tokenizer
(xapiand_tpu/native) releases the GIL during calls, so threads overlap;
the builder append is cheap and stays on the caller thread, preserving
per-shard ordering exactly like the reference's per-shard ready_queues.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field


@dataclass
class BulkCounters:
    prepared: int = 0
    processed: int = 0
    indexed: int = 0
    total: int = 0
    items: list = field(default_factory=list)

    def as_dict(self) -> dict:
        return {"#prepared": self.prepared, "#processed": self.processed,
                "#indexed": self.indexed, "#total": self.total,
                "#items": self.items}


class BulkIndexer:
    """Feed documents with prepare(); wait() drains and applies in order."""

    def __init__(self, db, n_workers: int | None = None,
                 commit: bool = True):
        self.db = db
        self.commit = commit
        self.counters = BulkCounters()
        workers = n_workers or min(8, (os.cpu_count() or 2))
        # single-core hosts: a thread pool only adds scheduling overhead
        # (analysis is mostly GIL-bound there); prepare lazily at wait()
        self._pool = ThreadPoolExecutor(
            max_workers=workers, thread_name_prefix="doc_preparer") \
            if workers > 1 else None
        self._futures: list = []

    def prepare(self, obj: dict, doc_id=None) -> None:
        """≙ DocIndexer::prepare: schedule analysis of one document."""
        self.counters.total += 1
        if doc_id is None and isinstance(obj, dict):
            doc_id = obj.get("_id")
        if isinstance(obj, dict):
            obj = {k: v for k, v in obj.items() if k != "_id"}
        fut = self._pool.submit(self._prepare_one, obj, doc_id) \
            if self._pool is not None else None
        self._futures.append((doc_id, obj, fut))

    def _prepare_one(self, obj, doc_id):
        idoc = self.db.schema.index(
            obj, doc_id,
            defer_text=getattr(self.db._builder, "wants_deferred_text",
                               False))
        self.counters.prepared += 1
        return idoc

    def wait(self) -> BulkCounters:
        """Drain: apply prepared docs to the builder in submission order
        (single writer; per-shard ordering of the reference ready_queues),
        then optionally commit one new segment generation."""
        try:
            for doc_id, obj, fut in self._futures:
                self.counters.processed += 1
                try:
                    idoc = fut.result() if fut is not None \
                        else self._prepare_one(obj, doc_id)
                    did = idoc.doc_id
                    if self.db.wal is not None and not self.db._replaying:
                        self.db.wal.write_replace_document(did, obj)
                    self.db.delete_document(did, missing_ok=True, _log=False,
                                            _keep_version=True)
                    self.db._builder.add(idoc)
                    self.db._pending_docs[did] = idoc.data
                    self.db._versions[did] = \
                        self.db._versions.get(did, 0) + 1
                    self.counters.indexed += 1
                except Exception as exc:   # per-doc failure -> item error
                    self.counters.items.append(
                        {"_id": doc_id, "#error": str(exc)})
        finally:
            if self._pool is not None:
                self._pool.shutdown(wait=False)
            self._futures = []
        if self.commit:
            self.db.commit()
        return self.counters
