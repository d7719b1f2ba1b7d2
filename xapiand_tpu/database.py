"""Database: the operations façade over schema + segments + searchers.

Reference parity target: DatabaseHandler (src/database/handler.h:68-183) and
Shard (src/database/shard.{h,cc}) for a single local shard: prepare/index/
delete/replace, commit (generation swap), get_mset-style search, document
access. Incremental updates land in a host-side pending builder; ``commit``
freezes it into a new immutable device segment (delta-segment model replacing
glass's copy-on-write B-trees); deletes are bitmap updates on existing
segments. Multi-shard routing and the mesh plane live in
xapiand_tpu.parallel.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np

from xapiand_tpu.models.builder import SegmentBuilder
from xapiand_tpu.models.weights import CollectionStats, get_scheme
from xapiand_tpu.query.dsl import QueryDSL
from xapiand_tpu.query.ir import Q
from xapiand_tpu.query.plan import bind, compile_ir, resolve_special
from xapiand_tpu.schema import Schema
from xapiand_tpu.search import SegmentSearcher


@dataclass
class Hit:
    id: str
    score: float
    rank: int
    data: dict


@dataclass
class SearchResult:
    total: int
    hits: list = field(default_factory=list)
    aggregations: Optional[dict] = None


class DocumentNotFound(KeyError):
    pass


class VersionConflict(ValueError):
    """Optimistic-concurrency failure (≙ reference 409 Conflict,
    docs/_docs/reference-guide/documents/versioning.md; DB_SLOT_VERSION
    check in handler.cc prepare)."""

    def __init__(self, doc_id, expected, current):
        super().__init__(
            f"version conflict on {doc_id!r}: expected {expected}, "
            f"current {current}")
        self.doc_id = doc_id
        self.expected = expected
        self.current = current


class Database:
    # impact-prefix pruning cap for the batched plain path (search_many /
    # the REST micro-batcher): 0 = off; set from the index settings.
    # Certified-exact top-k with counts as lower bounds (the reference's
    # estimated counts under maxweight pruning, matcher.cc:415).
    prefix_cap = 0

    def __init__(self, path: Optional[str] = None, scheme: str = "bm25",
                 schema: Optional[Schema] = None, device=None,
                 **scheme_params):
        import os

        from xapiand_tpu.index.datastore import DataStore
        from xapiand_tpu.index.wal import DatabaseWAL

        self.schema = schema or Schema()
        self.scheme = get_scheme(scheme, **scheme_params)
        self.device = device
        self.path = path
        self._builder = self._new_builder()
        self._pending_docs: dict[str, dict] = {}      # doc_id -> data
        self._docs_store: dict[str, dict] = {}
        self._searchers: list[SegmentSearcher] = []
        self._locate: dict[str, tuple[int, int]] = {}  # doc_id -> (seg, docid)
        self._pending_deletes: set[str] = set()
        self._metadata: dict[str, object] = {}
        self._blobs: dict[str, list] = {}             # doc_id -> locators
        # stored spelling/synonym tables (≙ glass_spelling.cc /
        # glass_synonym.cc per-shard tables; WAL ops wal.h:114-122)
        self._spellings: dict[str, int] = {}          # word -> freq
        self._synonyms: dict[str, list[str]] = {}     # term -> synonyms
        self._spell_epoch = 0
        # spelling/synonym mutations must make the NEXT commit a real
        # revision bump, or a checkpoint taken after them would both
        # snapshot their effect and replay their WAL tail (double-apply)
        self._aux_dirty = False
        self._versions: dict[str, int] = {}           # doc_id -> _version
        self.revision = 0
        self.auto_merge_segments = 16   # tiered compaction trigger
        self._replaying = False
        self.on_commit = None   # hook: (revision) -> None (cluster broadcast)
        # foreign shared schema (foreign-schemas.md): (endpoint, writeback)
        # set by IndexManager when the schema lives in another index
        self._foreign_schema = None
        if path is not None:
            os.makedirs(path, exist_ok=True)
            self.wal = DatabaseWAL(os.path.join(path, "wal"))
            self.datastore = DataStore(os.path.join(path, "docdata"))
            self._replay_wal()
        else:
            self.wal = None
            self.datastore = DataStore(None)

    # -- WAL replay (crash/restart recovery, ≙ wal.cc:251/506) ---------------

    def _replay_wal(self):
        from xapiand_tpu.index.wal import WalOp
        from xapiand_tpu.models.snapshot import load_checkpoint

        self._replaying = True
        try:
            # O(bytes) restart: load the durable snapshot if one exists and
            # replay only the WAL tail past its revision (the reference
            # opens committed glass tables directly and never re-analyzes;
            # snapshot.py is the flat-array equivalent). Corrupt/missing
            # snapshot -> full replay.
            base_rev = load_checkpoint(self)
            def apply(entry):
                op = entry[0]
                if op == WalOp.REPLACE_DOCUMENT:
                    self.index_document(entry[2], doc_id=entry[1])
                elif op == WalOp.DELETE_DOCUMENT:
                    self.delete_document(entry[1], missing_ok=True)
                elif op == WalOp.SET_METADATA:
                    self._metadata[entry[1]] = entry[2]
                elif op == WalOp.ADD_SPELLING:
                    self.add_spelling(entry[1], entry[2])
                elif op == WalOp.REMOVE_SPELLING:
                    self.remove_spelling(entry[1], entry[2])
                elif op == WalOp.ADD_SYNONYM:
                    self.add_synonym(entry[1], entry[2])
                elif op == WalOp.REMOVE_SYNONYM:
                    self.remove_synonym(entry[1], entry[2])
                elif op == WalOp.SET_SCHEMA:
                    self.schema = Schema.from_dict(entry[1])
                elif op == WalOp.STORE_BLOB:
                    locs = self._blobs.setdefault(entry[1], [])
                    locs[:] = [l for l in locs if l.get("_content_type")
                               != entry[2]] + \
                        ([entry[3]] if entry[3] else [])
                elif op == WalOp.COMMIT:
                    self.commit()

            self.wal.replay(apply, from_revision=base_rev or 0)
            if len(self._builder) or self._pending_deletes:
                self.commit()  # uncommitted tail after crash
        finally:
            self._replaying = False

    def checkpoint(self) -> Optional[str]:
        """Persist committed state as a binary snapshot and prune the WAL
        below it (POST /idx/:snapshot; ≙ the reference's compacted-revision
        durability: restart opens tables, it does not re-index)."""
        from xapiand_tpu.models.snapshot import write_checkpoint

        self.commit()
        return write_checkpoint(self)

    @property
    def uuid(self) -> Optional[str]:
        return self.wal.uuid if self.wal is not None else None

    def _new_builder(self):
        """Pending-write accumulator factory (ShardedDatabase overrides
        with a shard-routing façade)."""
        return SegmentBuilder()

    def _finalize_pending(self) -> list:
        """Freeze the pending builder into new immutable segment(s); one
        per shard on the sharded subclass."""
        return [self._builder.finalize()]

    def _segments_committed(self, seg_indices: list) -> None:
        """Post-commit hook: the sharded subclass records the new segment
        generation and stacks it over the mesh."""

    def _defer_text(self) -> bool:
        return getattr(self._builder, "wants_deferred_text", False)

    # -- write path ----------------------------------------------------------

    def index_document(self, obj: dict, doc_id: Optional[str] = None,
                       commit: bool = False,
                       version: Optional[int] = None) -> str:
        """Index (upsert) one document; ≙ DatabaseHandler::index
        (handler.h:113). version enables optimistic concurrency: the write
        only succeeds if the doc's current _version matches (versioning.md;
        raises VersionConflict otherwise)."""
        if isinstance(obj, dict) and "_script" in obj:
            obj = self._run_script(dict(obj), doc_id)
        idoc = self.schema.index(obj, doc_id,
                                 defer_text=self._defer_text())
        did = idoc.doc_id
        cur = self._versions.get(did, 0)
        if version is not None and int(version) != cur:
            raise VersionConflict(did, int(version), cur)
        if self.wal is not None and not self._replaying:
            # the post-script object is logged so replay is deterministic
            self.wal.write_replace_document(did, obj)
        self.delete_document(did, missing_ok=True, _log=False,
                             _keep_version=True)
        self._builder.add(idoc)
        self._pending_docs[did] = idoc.data
        # re-adding supersedes any pending delete of this id (the internal
        # replace-delete above, or an explicit delete earlier in the same
        # batch) - commit's last-occurrence rule handles replaced rows;
        # leaving the key in _pending_deletes killed the FINAL version too
        # (doc lost after >=2 uncommitted replacements of a pending doc)
        self._pending_deletes.discard(did)
        self._versions[did] = cur + 1
        if commit:
            self.commit()
        return did

    def version_of(self, doc_id: str) -> int:
        return self._versions.get(str(doc_id), 0)

    def set_schema_props(self, fields: dict):
        """Replace the index schema from an explicit definition
        (``PUT /idx/ {"_schema": {...}}``, explicit-types.md). `fields` is
        the root schema node: field specs + root reserved keys. Persisted
        immediately (SET_SCHEMA WAL record) so schema-only updates survive
        restart without a data commit."""
        import copy as _copy

        self.schema = Schema.from_dict(
            {"_version": Schema.VERSION, "schema": _copy.deepcopy(fields)})
        if self.wal is not None and not self._replaying:
            self.wal.write_set_schema(self.schema.to_dict())
        self.schema.mutated = False

    def bind_foreign_schema(self, endpoint: str, fields: dict, writeback):
        """Attach a shared schema stored in another index
        (foreign-schemas.md): adopt its props, remember the pointer in the
        root node (so reopen re-resolves), write mutations back at
        commit."""
        self.set_schema_props({"_foreign": endpoint,
                               **{k: v for k, v in fields.items()
                                  if k != "_foreign"}})
        self._foreign_schema = (endpoint, writeback)

    def _run_script(self, obj: dict, doc_id) -> dict:
        """Execute a `_script` on write with the old + new doc
        (≙ DatabaseHandler::call_script, handler.h:80-85)."""
        from xapiand_tpu.utils.scripting import compile_script

        spec = obj.pop("_script")
        src = spec if isinstance(spec, str) else \
            (spec or {}).get("_body", "")
        old = {}
        if doc_id is not None:
            try:
                old = self.get_document(str(doc_id))
            except DocumentNotFound:
                old = {}
        return compile_script(src).run(obj, old)

    def delete_document(self, doc_id: str, commit: bool = False,
                        missing_ok: bool = False, _log: bool = True,
                        version: Optional[int] = None,
                        _keep_version: bool = False) -> bool:
        doc_id = str(doc_id)
        if version is not None and \
                int(version) != self._versions.get(doc_id, 0):
            raise VersionConflict(doc_id, int(version),
                                  self._versions.get(doc_id, 0))
        if _log and self.wal is not None and not self._replaying:
            self.wal.write_delete_document(doc_id)
        if not _keep_version:
            self._versions.pop(doc_id, None)
        found = False
        if doc_id in self._pending_docs:
            # mark pending version dead: rebuild without it is costly; mark
            # via deferred delete applied at commit time
            self._pending_deletes.add(doc_id)
            found = True
        loc = self._locate.get(doc_id)
        if loc is not None:
            seg_idx, docid = loc
            searcher = self._searchers[seg_idx]
            if not searcher.segment.deleted[docid]:
                searcher.segment.deleted[docid] = True
                searcher.refresh_deleted()
                # host latency path caches delete-bitmap pointers
                self._host_epoch = getattr(self, "_host_epoch", 0) + 1
                found = True
            del self._locate[doc_id]
        if not found and not missing_ok:
            raise DocumentNotFound(doc_id)
        if commit:
            self.commit()
        return found

    def commit(self) -> int:
        """Freeze pending docs into a new immutable segment generation;
        ≙ Shard::commit (shard.cc:706): WAL COMMIT line + revision bump."""
        from xapiand_tpu.index.storage import faults

        faults.maybe_db("commit")   # chaos hook (RANDOM_ERRORS_DB_THROW,
        # shard.cc:51-59 commit/open sites)
        if len(self._builder) == 0 and not self._pending_deletes \
                and not self._aux_dirty:
            return self.revision
        if self.schema.mutated and self._foreign_schema is not None:
            # shared schema: propagate the mutation to the owning index's
            # schema document (foreign-schemas.md write-back)
            endpoint, writeback = self._foreign_schema
            writeback(dict(self.schema.props.get("schema", {})))
        if self.wal is not None and not self._replaying:
            if self.schema.mutated:
                self.wal.write_set_schema(self.schema.to_dict())
                self.schema.mutated = False
            self.wal.write_commit(fsync=True)
        if len(self._builder):
            new_indices = []
            for seg in self._finalize_pending():
                # apply deletes that targeted pending docs (replaced
                # in-batch): keep only the LAST occurrence of each doc key
                last = {}
                for docid, key in enumerate(seg.doc_keys):
                    last[key] = docid
                for docid, key in enumerate(seg.doc_keys):
                    if last[key] != docid or key in self._pending_deletes:
                        seg.deleted[docid] = True
                searcher = SegmentSearcher(seg, self.scheme,
                                           device=self.device)
                seg_idx = len(self._searchers)
                self._searchers.append(searcher)
                new_indices.append(seg_idx)
                for key, docid in last.items():
                    if not seg.deleted[docid]:
                        self._locate[key] = (seg_idx, docid)
            self._builder = self._new_builder()
            self._docs_store.update(self._pending_docs)
            self._pending_docs = {}
            self._segments_committed(new_indices)
        self._pending_deletes.clear()
        self._aux_dirty = False
        self.revision += 1
        if not self._replaying and \
                len(self._searchers) > self.auto_merge_segments:
            self._compact_tier()
        if self.on_commit is not None and not self._replaying:
            # ≙ db_updater debounce -> UDP DB_UPDATED (shard.cc:778)
            self.on_commit(self.revision)
        return self.revision

    def _compact_tier(self):
        """Tiered background compaction (≙ glass_compact / the honey
        read-optimised rebuild): merge the smallest segments down to half
        the trigger count. Large segments are left alone, so steady-state
        write amplification stays logarithmic like an LSM. The merge is a
        pure data merge (models/merge.py) - posting spans and value/geo
        columns are concatenated with docids rebased, NO re-tokenization
        (the reference's compact streams tables, glass_compact.cc; it
        never re-analyzes documents)."""
        from xapiand_tpu.models.merge import merge_segments_data

        order = sorted(range(len(self._searchers)),
                       key=lambda i: self._searchers[i].segment.doc_count)
        n_keep_small = self.auto_merge_segments // 2
        victims = set(order[: len(order) - n_keep_small])
        if len(victims) < 2:
            return
        vlist = sorted(victims)
        segs = [self._searchers[i].segment for i in vlist]
        alive = []
        for i, seg in zip(vlist, segs):
            al = (~seg.deleted[: seg.num_docs]).copy()
            keys = seg.doc_keys
            for docid in np.nonzero(al)[0]:
                # replaced rows are delete-flagged at replace time, so this
                # locate check is belt-and-braces against drift
                if self._locate.get(keys[docid]) != (i, int(docid)):
                    al[docid] = False
            alive.append(al)
        merged_seg, _remaps = merge_segments_data(segs, alive)
        merged = merged_seg if merged_seg.num_docs else None
        new_searchers, remap = [], {}
        for i, s in enumerate(self._searchers):
            if i in victims:
                continue
            remap[i] = len(new_searchers)
            new_searchers.append(s)
        mi = None
        if merged is not None:
            mi = len(new_searchers)
            new_searchers.append(SegmentSearcher(merged, self.scheme,
                                                 device=self.device))
        new_locate = {}
        for key, (si, docid) in self._locate.items():
            if si in remap:
                new_locate[key] = (remap[si], docid)
        if merged is not None:
            for docid, key in enumerate(merged.doc_keys):
                new_locate[key] = (mi, docid)
        self._searchers = new_searchers
        self._locate = new_locate

    # -- stats ----------------------------------------------------------------

    @property
    def doc_count(self) -> int:
        return sum(s.segment.doc_count for s in self._searchers)

    @property
    def total_doclen(self) -> float:
        # approximation: includes deleted docs until merge (documented
        # deviation from glass, which maintains exact stats on delete)
        return sum(s.segment.total_doclen for s in self._searchers)

    def stats(self) -> CollectionStats:
        # cached per mutation state: doc_count sums a delete-bitmap
        # reduction per segment, doclen_upper a max - O(docs) numpy work
        # that was ~19% of served-request CPU when recomputed per query.
        # revision covers commits (incl. compaction), _host_epoch covers
        # uncommitted deletes, len covers any segment-list change.
        key = (self.revision, getattr(self, "_host_epoch", 0),
               len(self._searchers))
        cached = getattr(self, "_stats_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        n = self.doc_count
        total = self.total_doclen
        avg = (total / n) if n else 0.0
        upper = 1.0
        for s in self._searchers:
            seg = s.segment
            if seg.num_docs:
                upper = max(upper, float(seg.doclen[:seg.num_docs].max()))
        st = CollectionStats(doc_count=n, avg_doclen=avg, doclen_lower=1.0,
                             doclen_upper=upper, total_len=total)
        self._stats_cache = (key, st)
        return st

    def global_termfreq(self, term: str) -> int:
        tf = 0
        for s in self._searchers:
            ti = s.segment.get_term(term)
            if ti:
                tf += ti.length
        return tf

    def global_collfreq(self, term: str) -> int:
        cf = 0
        for s in self._searchers:
            ti = s.segment.get_term(term)
            if ti:
                cf += ti.collfreq
        return cf

    # -- read path -------------------------------------------------------------

    def get_document(self, doc_id: str) -> dict:
        doc_id = str(doc_id)
        if doc_id in self._pending_docs:
            return self._pending_docs[doc_id]
        if doc_id in self._locate:
            return self._docs_store[doc_id]
        raise DocumentNotFound(doc_id)

    # -- metadata (≙ handler.h:149-153 get/set_metadata) -----------------------

    def set_metadata(self, key: str, value) -> None:
        if value is None:   # deletion (Xapian set_metadata("") semantics)
            self._metadata.pop(str(key), None)
        else:
            self._metadata[str(key)] = value
        if self.wal is not None and not self._replaying:
            self.wal.write_set_metadata(str(key), value, fsync=True)

    def get_metadata(self, key: str, default=None):
        return self._metadata.get(str(key), default)

    def metadata_keys(self) -> list:
        return sorted(self._metadata)

    # -- typed blob storage (STORE verb, ≙ data.h Locators) ---------------------

    def store_blob(self, doc_id: str, content_type: str, raw: bytes) -> None:
        doc_id = str(doc_id)
        if doc_id not in self._pending_docs and doc_id not in self._locate:
            raise DocumentNotFound(doc_id)
        loc = self.datastore.put_blob(content_type, raw)
        self.datastore.fsync()
        locs = self._blobs.setdefault(doc_id, [])
        locs[:] = [l for l in locs
                   if l.get("_content_type") != content_type] + [loc]
        if self.wal is not None and not self._replaying:
            from xapiand_tpu.index.wal import WalOp

            self.wal.append(WalOp.STORE_BLOB, doc_id, content_type, loc,
                            fsync=True)

    def delete_blob(self, doc_id: str, content_type: str) -> None:
        """Detach a blob (``_data: null`` erase, handler.cc:167-170).
        WAL'd as STORE_BLOB with a null locator."""
        doc_id = str(doc_id)
        locs = self._blobs.get(doc_id, [])
        locs[:] = [l for l in locs
                   if l.get("_content_type") != content_type]
        if self.wal is not None and not self._replaying:
            from xapiand_tpu.index.wal import WalOp

            self.wal.append(WalOp.STORE_BLOB, doc_id, content_type, None,
                            fsync=True)

    def get_blob(self, doc_id: str, content_type: str) -> bytes:
        locs = self._blobs.get(str(doc_id), [])
        out = self.datastore.get_by_type(locs, content_type)
        if out is None:
            raise DocumentNotFound(f"{doc_id}:{content_type}")
        return out

    def blob_content_types(self, doc_id: str) -> list:
        return self.datastore.content_types(self._blobs.get(str(doc_id), []))

    # -- dump / restore (≙ handler.h:139-143, the portable backup path) ---------

    def dump_documents(self):
        """Iterate all live documents as objects with _id (DUMP verb)."""
        for seg_idx, s in enumerate(self._searchers):
            seg = s.segment
            for docid, key in enumerate(seg.doc_keys):
                if not seg.deleted[docid] and \
                        self._locate.get(key) == (seg_idx, docid):
                    doc = dict(self._docs_store.get(key, {}))
                    doc["_id"] = key
                    yield doc
        for key, data in self._pending_docs.items():
            if key not in self._pending_deletes:
                doc = dict(data)
                doc["_id"] = key
                yield doc

    def restore_documents(self, docs, commit: bool = True) -> int:
        n = 0
        for doc in docs:
            doc = dict(doc)
            did = doc.pop("_id", None)
            self.index_document(doc, doc_id=did)
            n += 1
        if commit:
            self.commit()
        return n

    # -- info / maintenance ------------------------------------------------------

    def info(self) -> dict:
        """≙ :info view (retrieve_database_view): doccount, revision, ..."""
        return {
            "uuid": self.uuid,
            "revision": self.revision,
            "doc_count": self.doc_count,
            "segments": len(self._searchers),
            "pending": len(self._builder),
            "avg_doclen": self.stats().avg_doclen,
            "index_bytes": sum(s.segment.nbytes() for s in self._searchers),
        }

    def check(self) -> dict:
        """≙ :check view / glass_dbcheck: structural invariants."""
        errors = []
        for i, s in enumerate(self._searchers):
            seg = s.segment
            for term, ti in seg.terms.items():
                if ti.offset + ti.length > len(seg.post_docids):
                    errors.append(f"segment {i}: span overflow for {term!r}")
                    continue
                ids = seg.post_docids[ti.offset: ti.offset + ti.length]
                if len(ids) > 1 and not (ids[1:] > ids[:-1]).all():
                    errors.append(f"segment {i}: unsorted postings {term!r}")
        return {"ok": not errors, "errors": errors}

    def merge_segments(self) -> int:
        """Compact all segments into one (≙ glass compaction): rebuilds from
        live documents, dropping deletes."""
        docs = list(self.dump_documents())
        self._searchers = []
        self._locate = {}
        self._builder = self._new_builder()
        self._pending_docs = {}
        self._pending_deletes = set()
        for doc in docs:
            did = doc.pop("_id")
            idoc = self.schema.index(doc, did,
                                     defer_text=self._defer_text())
            self._builder.add(idoc)
            self._pending_docs[did] = idoc.data
        self.commit()
        return len(docs)

    def close(self):
        if self.wal is not None:
            self.wal.close()
        self.datastore.close()

    def _search_with_cutoff(self, percent_cutoff: float,
                            weight_cutoff: float, query, k: int,
                            offset: int, **kw) -> SearchResult:
        """Enquire::set_cutoff analog (≙ handler.cc:1264,1443 — the
        reference threads percent/weight thresholds into every shard
        matcher and the mset merger; its REST plane hard-codes both to 0,
        so exposing them is a strict superset). Engine-agnostic: scores
        are final when a SearchResult is assembled, so a post-filter on
        the ranked hits is exactly equivalent to the in-matcher filter
        for relevance-ordered results. percent_cutoff is relative to the
        top attained score (Xapian scales vs max attained weight in the
        mset); totals stay exact pre-cutoff counts (documented superset:
        the reference degrades them to estimates under cutoff)."""
        res = self.search(query, k=k + offset, offset=0, **kw)
        thr = float(weight_cutoff)
        if percent_cutoff and res.hits:
            top = max(h.score for h in res.hits)
            thr = max(thr, top * float(percent_cutoff) / 100.0)
        kept = [h for h in res.hits if h.score >= thr]
        res.hits = [Hit(id=h.id, score=h.score, rank=offset + i,
                        data=h.data)
                    for i, h in enumerate(kept[offset:])]
        return res

    def search(self, query: Any, k: int = 10, offset: int = 0,
               sort: tuple = (), collapse_slot: Optional[int] = None,
               aggs: Optional[dict] = None,
               count_only: bool = False,
               scheme: Optional[Any] = None,
               collapse_max: int = 1,
               percent_cutoff: float = 0.0,
               weight_cutoff: float = 0.0) -> SearchResult:
        """query: a Q IR node, or a JSON query-DSL dict/string.

        ≙ DatabaseHandler::get_mset (handler.cc:1067,1415): global stats are
        computed across all segments first (two-phase stat merge), then each
        segment executes with those stats and partial top-ks merge by score.
        scheme overrides the database's default weight scheme per query
        (Enquire::set_weighting_scheme); a string names a registered scheme.
        """
        if percent_cutoff or weight_cutoff:
            return self._search_with_cutoff(
                percent_cutoff, weight_cutoff, query, k, offset,
                sort=sort, collapse_slot=collapse_slot, aggs=aggs,
                count_only=count_only, scheme=scheme,
                collapse_max=collapse_max)
        from xapiand_tpu import aggregations as aggs_mod

        if scheme is None:
            scheme = self.scheme
        elif isinstance(scheme, str):
            scheme = get_scheme(scheme)

        # search-plan cache (serving pool path): everything derived only
        # from (ir, scheme, sort/aggs/collapse shape, index state) -
        # resolve+compile, slot ranges, per-segment agg compilations and
        # the native executor's marshalled arrays - is reused across
        # requests. Keyed on IR object identity (the server's parsed-IR
        # cache keeps hot IRs alive) + the same mutation-state tuple as
        # the host scorers. Measured: a served facet query at 100k docs
        # spent ~6ms/request rebuilding these (slot_ranges_of ~1.3ms +
        # ~0.8ms marshalling x segments).
        ir0 = query if isinstance(query, Q) else \
            QueryDSL(self.schema, term_expander=self.expand_prefix).parse(query)
        stats = self.stats()
        state = (self.revision, getattr(self, "_host_epoch", 0),
                 len(self._searchers))
        skey = (state, scheme.key(), repr(sort), repr(aggs),
                collapse_slot, collapse_max)
        pcache = getattr(self, "_search_plan_cache", None)
        if pcache is None:
            pcache = self._search_plan_cache = {}
        pent = pcache.get(id(ir0))
        plan = pent[2] if (pent is not None and pent[0] is ir0
                           and pent[1] == skey) else None
        if plan is not None:
            slot_ranges = plan["slot_ranges"]
            scripted = plan["scripted"]
            aggs = plan["aggs"]
            ir = plan["rir"]
            cq = plan["cq"]
        else:
            slot_ranges = None
            if aggs:
                slot_ranges = aggs_mod.slot_ranges_of(
                    [sr.segment for sr in self._searchers])
            scripted = None
            if aggs and any(isinstance(b, dict) and "_scripted_metric" in b
                            for b in aggs.values()):
                scripted = {n: b for n, b in aggs.items()
                            if isinstance(b, dict)
                            and "_scripted_metric" in b}
                aggs = {n: b for n, b in aggs.items()
                        if n not in scripted} or None
            ir = resolve_special(ir0, scheme, stats, self.global_termfreq,
                                 self.global_collfreq)
            cq = compile_ir(ir, cost_fn=self.global_termfreq)
        # serving latency path: a lone plain-relevance query executes
        # host-native (ops/host_scorer.py) - one tunnel readback costs
        # ~9ms (tunnel_probe.py), more than the whole reference request;
        # the device keeps batches and every heavier operator
        from xapiand_tpu.ops.host_scorer import \
            host_path_enabled as host_path_enabled_fn

        if self._use_host_path(cq, scheme, sort, aggs or scripted,
                               collapse_slot):
            return self._search_host([cq], k=k, offset=offset,
                                     stats=stats, scheme=scheme,
                                     count_only=count_only)[0]
        stats_d = {"N": float(stats.doc_count),
                   "avg_doclen": float(stats.avg_doclen),
                   "doclen_lower": float(stats.doclen_lower),
                   "doclen_upper": float(stats.doclen_upper),
                   "total_len": float(stats.total_len)}
        want = k + offset
        # conjunctive host route (ops/host_query.py): AND trees with
        # predicate leaves + flat aggs/value sort are gather-bound on the
        # device; the native executor walks the smallest conjunct and
        # verifies by binary search. Decided per segment (falls back when
        # a column is missing or the driver conjunct is too big).
        conj_parts = conj_tc = None
        if plan is not None:
            conj_parts, conj_tc = plan["conj_parts"], plan["conj_tc"]
        elif host_path_enabled_fn():
            from xapiand_tpu.ops.host_query import conj_eligible

            first_specs = ()
            if aggs and self._searchers:
                from xapiand_tpu import aggregations as aggs_mod2

                try:
                    _, first_specs, _, _ = aggs_mod2.compile_for_segment(
                        self.schema, self._searchers[0].segment, aggs,
                        slot_ranges=slot_ranges)
                except Exception:
                    first_specs = None
            if first_specs is not None:
                conj_parts = conj_eligible(cq, scheme, sort, first_specs,
                                           collapse_slot)
            if conj_parts is not None:
                from xapiand_tpu.ops.host_scorer import term_constants

                conj_tc = term_constants(cq, scheme, stats,
                                         self.global_termfreq,
                                         self.global_collfreq)
        total = 0
        merged: list[tuple[float, int, int]] = []  # (-score, seg, docid)
        agg_parts, agg_cats, agg_names, agg_meta = [], [], None, None
        seg_plans = plan["segs"] if plan is not None else None
        built_segs: list = []
        for seg_idx, searcher in enumerate(self._searchers):
            sp = seg_plans[seg_idx] if seg_plans is not None else None
            specs, arrays = (), None
            if sp is not None:
                specs, arrays = sp["specs"], sp["arrays"]
                if aggs:
                    agg_names, agg_meta = plan["agg_names"], sp["agg_meta"]
                    agg_cats.append(sp["cats_j"])
            elif aggs:
                (agg_names, specs, arrays,
                 agg_meta) = aggs_mod.compile_for_segment(
                    self.schema, searcher.segment, aggs,
                    slot_ranges=slot_ranges)
                cats_j: dict = {}
                for j, spec in enumerate(specs):
                    vals = searcher.segment.values
                    if spec[0] == "terms" and spec[1] in vals:
                        cats_j[j] = vals[spec[1]].cat_names or []
                    elif spec[0] == "geo_trixels":
                        # per-compile trixel table -> HTM names live in this
                        # segment's meta (codes are segment-local, like cats)
                        cats_j[j] = agg_meta[j]["cat_names"]
                    elif spec[0] == "nested":
                        for lvl, d in enumerate(spec[1]):
                            if d[0] == "terms" and d[1] in vals:
                                cats_j[(j, lvl)] = \
                                    vals[d[1]].cat_names or []
                agg_cats.append(cats_j)
            out = None
            prep = sp["prep"] if sp is not None else None
            hq = None
            if prep is None and sp is None and conj_parts is not None:
                hq = searcher.host_query()
                if hq is not None and hq.driver_work(cq, conj_parts) \
                        <= self.HOST_MAX_WORK:
                    prep = hq.prepare(cq, conj_parts, conj_tc,
                                      sort=sort, aggs=specs)
            if prep is not None:
                if hq is None:
                    hq = searcher.host_query()
                out = hq.exec_prepared(prep, scheme, stats, want,
                                       count_only=count_only)
            if sp is None:
                built_segs.append({
                    "specs": specs, "arrays": arrays,
                    "cats_j": agg_cats[-1] if aggs else None,
                    "agg_meta": agg_meta, "prep": prep})
            if out is None:
                bound = bind(cq, searcher.segment, scheme, stats,
                             global_tf=self.global_termfreq, k=want,
                             sort=sort, collapse_slot=collapse_slot,
                             aggs=specs, agg_arrays=arrays,
                             count_only=count_only,
                             global_cf=self.global_collfreq,
                             collapse_max=collapse_max)
                out = searcher.execute(bound, stats_d, scheme=scheme)
            total += int(out["count"])
            if aggs:
                agg_parts.append(out["aggs"])
            if not count_only:
                for sc, did in zip(out["scores"], out["docids"]):
                    if sc == float("-inf"):
                        continue
                    if did >= searcher.segment.num_docs:
                        continue
                    if searcher.segment.deleted[did]:
                        continue
                    merged.append((-float(sc),
                                   self._tiebreak(seg_idx, int(did)),
                                   seg_idx, int(did)))
        if plan is None and isinstance(query, Q):
            # cache only identity-stable IRs (the server's parsed-IR
            # cache); dict/string queries parse fresh objects per call
            if len(pcache) >= 2048:
                for old in list(pcache)[:1024]:
                    pcache.pop(old, None)
            pcache[id(ir0)] = (ir0, skey, {
                "slot_ranges": slot_ranges, "scripted": scripted,
                "aggs": aggs, "rir": ir, "cq": cq,
                "conj_parts": conj_parts, "conj_tc": conj_tc,
                "agg_names": agg_names, "segs": built_segs})
        result = SearchResult(total=total)
        if aggs and agg_parts:
            result.aggregations = aggs_mod.merge_and_shape(
                agg_names, agg_meta, agg_parts, agg_cats)
        if scripted:
            shaped = self._scripted_metrics(ir, scripted, stats)
            result.aggregations = {**(result.aggregations or {}), **shaped}
        if count_only:
            return result
        if sort:
            # value-ordered: per-segment lists are already in key order;
            # merge by re-binding keys host-side (scores are not the key)
            merged = self._merge_sorted(merged, sort)
        else:
            merged.sort()
        if collapse_slot is not None and len(self._searchers) > 1:
            # two-level collapse (≙ collapser.cc across shards): each
            # segment collapsed locally during execution; the merged run
            # re-collapses so at most collapse_max survive per key globally
            merged = self._recollapse(merged, collapse_slot, collapse_max)
        docs_store = getattr(self, "_docs_store", {})
        for rank, (negscore, _tb, seg_idx, did) in enumerate(
                merged[offset:offset + k]):
            seg = self._searchers[seg_idx].segment
            key = seg.doc_keys[did]
            result.hits.append(Hit(id=key, score=-negscore,
                                   rank=offset + rank,
                                   data=docs_store.get(key, {})))
        return result

    # host-path routing: total postings per call below which the native
    # TAAT scorer beats the device batch (device fixed cost ~12ms/launch
    # through the tunnel; native walks ~1e9 postings/s on this host)
    HOST_MAX_WORK = int(__import__("os").environ.get(
        "XT_HOST_MAX_WORK", "8000000"))

    def _use_host_path(self, cqs, scheme, sort=(), aggs=None,
                       collapse_slot=None) -> bool:
        """True when every query in the call is host-eligible and the
        summed postings work is below the device-crossover threshold."""
        from xapiand_tpu.ops.host_scorer import (host_eligible,
                                                 host_path_enabled)

        if not host_path_enabled() or not self._searchers:
            return False
        # the native global top-k hard-codes the plain (seg, docid)
        # insertion-order tiebreak; subclasses with their own rank order
        # (ShardedDatabase's global sequence) keep their own paths
        if type(self)._tiebreak is not Database._tiebreak:
            return False
        if not isinstance(cqs, list):
            cqs = [cqs]
        if not all(host_eligible(cq, scheme, sort, aggs, collapse_slot)
                   for cq in cqs):
            return False
        work = sum(self.global_termfreq(pt.term)
                   for cq in cqs for pt in cq.terms)
        return work * max(len(self._searchers), 1) <= self.HOST_MAX_WORK

    def try_search_host(self, query, k: int = 10, offset: int = 0,
                        scheme=None):
        """Serving fast path: run the query on the native host scorer if
        it is host-eligible, else return None (caller takes the full
        search() route). One resolve+compile, no device contact.

        Host-plan cache: resolve_special + compile_ir + term_constants +
        the per-segment (offset, length) matrix all derive only from
        (ir, scheme, index state), and a hot served query walks them with
        ~150 TermTable lookups per request (measured ~0.4ms of the 1.2ms
        request CPU). Cached per IR object identity - the server's
        parsed-IR cache keeps hot IR objects alive - keyed on the same
        (revision, host_epoch, segments) state as the global scorer."""
        if scheme is None:
            scheme = self.scheme
        elif isinstance(scheme, str):
            scheme = get_scheme(scheme)
        ir = query if isinstance(query, Q) else \
            QueryDSL(self.schema, term_expander=self.expand_prefix).parse(query)
        stats = self.stats()
        state = (self.revision, getattr(self, "_host_epoch", 0),
                 len(self._searchers), scheme.key())
        cache = getattr(self, "_host_plan_cache", None)
        if cache is None:
            cache = self._host_plan_cache = {}
        ent = cache.get(id(ir))
        if ent is not None and ent[0] is ir and ent[1] == state:
            plan = ent[2]
            if plan is None:      # remembered ineligible
                return None
            cq, tc, offs, lens = plan
            g = self._host_global_scorer()
            out = g.search_planned(cq, tc, offs, lens, scheme, stats,
                                   k + offset)
            return self._host_hits(g, out, k, offset)
        rir = resolve_special(ir, scheme, stats, self.global_termfreq,
                              self.global_collfreq)
        cq = compile_ir(rir, cost_fn=self.global_termfreq)
        if len(cache) >= 2048:
            for old in list(cache)[:1024]:
                cache.pop(old, None)
        if not self._use_host_path(cq, scheme):
            cache[id(ir)] = (ir, state, None)
            return None
        from xapiand_tpu.ops.host_scorer import term_constants
        tc = term_constants(cq, scheme, stats, self.global_termfreq,
                            self.global_collfreq)
        g = self._host_global_scorer()
        offs, lens = g.plan_terms(cq)
        cache[id(ir)] = (ir, state, (cq, tc, offs, lens))
        out = g.search_planned(cq, tc, offs, lens, scheme, stats,
                               k + offset)
        return self._host_hits(g, out, k, offset)

    def _host_hits(self, g, out, k: int, offset: int):
        """Assemble a SearchResult from one global-scorer output row."""
        docs_store = getattr(self, "_docs_store", {})
        result = SearchResult(total=int(out["count"]))
        scores, segs_a, dids = out["scores"], out["seg"], out["docids"]
        for rank in range(offset, k + offset):
            if rank >= len(scores) or scores[rank] == float("-inf"):
                break
            seg = g.segs[int(segs_a[rank])]
            key = seg.doc_keys[int(dids[rank])]
            result.hits.append(Hit(id=key, score=float(scores[rank]),
                                   rank=rank,
                                   data=docs_store.get(key, {})))
        return result

    def _host_global_scorer(self):
        """Cached whole-database native scorer; invalidated on commit
        (revision) and on deletes (_host_epoch)."""
        from xapiand_tpu.ops.host_scorer import GlobalHostScorer

        key = (self.revision, getattr(self, "_host_epoch", 0),
               len(self._searchers))
        g = getattr(self, "_host_global", None)
        if g is None or g._key != key:
            g = GlobalHostScorer(self._searchers)
            g._key = key
            self._host_global = g
        return g

    def _search_host(self, cqs: list, k: int, offset: int, stats, scheme,
                     count_only: bool = False) -> list:
        """Native latency path: one xt_score_topk_global crossing for the
        whole call, already globally merged (score desc, (seg, docid) asc
        = the device path's merge contract)."""
        from xapiand_tpu.ops.host_scorer import term_constants

        want = k + offset
        tcs = [term_constants(cq, scheme, stats, self.global_termfreq,
                              self.global_collfreq) for cq in cqs]
        g = self._host_global_scorer()
        outs = g.search_many(cqs, tcs, scheme, stats,
                             1 if count_only else want)
        docs_store = getattr(self, "_docs_store", {})
        results = []
        for qi, out in enumerate(outs):
            result = SearchResult(total=int(out["count"]))
            if not count_only:
                scores, segs_a, dids = \
                    out["scores"], out["seg"], out["docids"]
                for rank in range(offset, want):
                    if rank >= len(scores) or scores[rank] == float("-inf"):
                        break
                    seg = g.segs[int(segs_a[rank])]
                    key = seg.doc_keys[int(dids[rank])]
                    result.hits.append(Hit(id=key, score=float(scores[rank]),
                                           rank=rank,
                                           data=docs_store.get(key, {})))
            results.append(result)
        return results

    def _collapse_key(self, seg, slot: int, did: int):
        """Cross-segment-comparable collapse key for a doc, or None when
        the doc has no value in the slot (uncollapsed, Xapian semantics)."""
        col = seg.values.get(slot)
        if col is None or not col.present[did]:
            return None
        if col.cats is not None and getattr(col, "cat_names", None) \
                and col.cats[did] >= 0:
            # category codes are segment-local; compare by name
            return ("cat", col.cat_names[int(col.cats[did])])
        return ("v", int(col.hi[did]), int(col.lo[did]))

    def _recollapse(self, merged, slot: int, cmax: int):
        seen: dict = {}
        out = []
        for item in merged:
            seg_idx, did = item[2], item[3]
            key = self._collapse_key(self._searchers[seg_idx].segment,
                                     slot, did)
            if key is None:
                out.append(item)
                continue
            c = seen.get(key, 0)
            if c < cmax:
                seen[key] = c + 1
                out.append(item)
        return out

    def _merge_sorted(self, merged, sort):
        import math as _math

        def sort_key(item):
            _, tiebreak, seg_idx, did = item
            seg = self._searchers[seg_idx].segment
            keys = []
            for spec in sort:
                kind, slot, desc = spec[0], spec[1], spec[2]
                col = seg.values.get(slot) if kind != "score" else None
                present = col is not None and bool(col.present[did])
                if kind == "value":
                    if not present:
                        keys.append((1, 0, 0))
                    else:
                        h, l = int(col.hi[did]), int(col.lo[did])
                        if desc:
                            h, l = ~h, ~l
                        keys.append((0, h, l))
                elif kind == "dist":
                    kf = abs(float(col.fval[did]) - spec[3]) if present \
                        else _math.inf
                    keys.append((0, -kf if desc else kf, 0))
                elif kind == "geodist":
                    if present:
                        from xapiand_tpu.geo.cartesian import \
                            haversine_meters
                        lon = float(col.fval2[did]) \
                            if col.fval2 is not None else 0.0
                        kf = haversine_meters(float(col.fval[did]), lon,
                                              spec[3][0], spec[3][1])
                    else:
                        kf = _math.inf
                    keys.append((0, -kf if desc else kf, 0))
                elif kind == "strmetric":
                    from xapiand_tpu.utils import strmetrics
                    metric, target = spec[3]
                    if present and col.cats is not None \
                            and col.cats[did] >= 0:
                        nm = col.cat_names[int(col.cats[did])]
                        kf = 1.0 - strmetrics.similarity(str(nm), target,
                                                         metric)
                    else:
                        kf = _math.inf
                    keys.append((0, -kf if desc else kf, 0))
                else:
                    keys.append((0, item[0], 0))
            keys.append(tiebreak)
            return tuple(keys)

        return sorted(merged, key=sort_key)

    def _tiebreak(self, seg_idx: int, did: int):
        """Equal-score (or equal-sort-key) rank order: segment order then
        docid = insertion order on a single node. ShardedDatabase overrides
        with the global insertion sequence so sharded and unsharded indexes
        rank ties identically (stricter than the reference, where tie order
        follows the docid striping and so changes with num_shards)."""
        return (seg_idx, did)

    def count(self, query: Any) -> int:
        return self.search(query, count_only=True).total

    def search_many(self, queries: list, k: int = 10, offset: int = 0,
                    scheme: Optional[Any] = None) -> list:
        """Batched plain relevance search: many queries, few device
        launches. Each segment runs the whole list through BatchSearcher
        (shape-bucketed vmapped execution); per-query results then merge
        across segments exactly like search(). This is the engine under
        the REST server's request micro-batcher - concurrent clients
        become device batch width instead of serialized launches (the
        TPU answer to the reference's http-client thread pool,
        manager.h:155-163). Plain top-k only: queries needing sort/aggs/
        collapse/count_only take search().
        """
        from xapiand_tpu.search import BatchSearcher

        if scheme is None:
            scheme = self.scheme
        elif isinstance(scheme, str):
            scheme = get_scheme(scheme)
        stats = self.stats()
        irs = []
        for q in queries:
            irs.append(q if isinstance(q, Q) else
                       QueryDSL(self.schema,
                                term_expander=self.expand_prefix).parse(q))
        # host latency path for small plain batches (see search()): the
        # native TAAT scorer beats the tunnel below HOST_MAX_WORK postings
        cqs = [compile_ir(resolve_special(ir, scheme, stats,
                                          self.global_termfreq,
                                          self.global_collfreq),
                          cost_fn=self.global_termfreq) for ir in irs]
        if self._use_host_path(cqs, scheme):
            return self._search_host(cqs, k=k, offset=offset, stats=stats,
                                     scheme=scheme)
        want = k + offset
        per_seg = []
        for searcher in self._searchers:
            bs = BatchSearcher(searcher, k=want, min_batch=4,
                               scheme=scheme,
                               prefix_cap=self.prefix_cap,
                               global_tf=self.global_termfreq,
                               global_cf=self.global_collfreq)
            per_seg.append(bs.run(irs, stats=stats))
        results = []
        docs_store = getattr(self, "_docs_store", {})
        for qi in range(len(irs)):
            total = 0
            merged: list = []
            for seg_idx, outs in enumerate(per_seg):
                out = outs[qi]
                total += int(out["count"])
                seg = self._searchers[seg_idx].segment
                for sc, did in zip(out["scores"], out["docids"]):
                    if sc == float("-inf"):
                        continue
                    did = int(did)
                    if did >= seg.num_docs or seg.deleted[did]:
                        continue
                    merged.append((-float(sc),
                                   self._tiebreak(seg_idx, did),
                                   seg_idx, did))
            merged.sort()
            result = SearchResult(total=total)
            for rank, (negscore, _tb, seg_idx, did) in enumerate(
                    merged[offset:offset + k]):
                key = self._searchers[seg_idx].segment.doc_keys[did]
                result.hits.append(Hit(id=key, score=-negscore,
                                       rank=offset + rank,
                                       data=docs_store.get(key, {})))
            results.append(result)
        return results

    SCRIPTED_METRIC_CAP = 4096

    def _scripted_metrics(self, ir, specs: dict, stats) -> dict:
        """_scripted_metric (declared-but-disabled in the reference,
        aggregations.cc:118-207): run a sandboxed script per matched
        document on the coordinator, folding into `state`.

        Shape: {"_scripted_metric": {"_init": <literal>, "_map": "src",
        "_reduce": "src"?}}; _map sees `state` and `doc`, _reduce sees
        `state`. Bounded to SCRIPTED_METRIC_CAP matched docs."""
        import copy as _copy

        from xapiand_tpu.aggregations import AggError
        from xapiand_tpu.utils.scripting import compile_script

        matched = self.search(ir, k=self.SCRIPTED_METRIC_CAP,
                              scheme="bool")
        if matched.total > self.SCRIPTED_METRIC_CAP:
            raise AggError(
                f"_scripted_metric is bounded to "
                f"{self.SCRIPTED_METRIC_CAP} matched documents "
                f"(query matches {matched.total})")
        docs = [self.get_document(h.id) for h in matched.hits]
        out = {}
        for name, body in specs.items():
            args = body["_scripted_metric"]
            map_src = args.get("_map")
            if not map_src:
                raise AggError(f"_scripted_metric {name!r} needs _map")
            mapper = compile_script(str(map_src))
            reducer = compile_script(str(args["_reduce"])) \
                if args.get("_reduce") else None
            state = _copy.deepcopy(args.get("_init", {}))
            for doc in docs:
                env = mapper.run_env({"state": state, "doc": dict(doc)})
                state = env.get("state", state)
            if reducer is not None:
                env = reducer.run_env({"state": state})
                state = env.get("result", env.get("state", state))
            out[name] = {"_value": state}
        return out

    # -- similar-document search (≙ xapian/expand ESet + OP_ELITE_SET requery,
    #    handler.cc:1273-1278 get_eset -> requery) ---------------------------

    def expand_terms(self, doc_ids, n_terms: int = 20,
                     scheme: str = "bo1",
                     expand_k: float = 1.0) -> list[str]:
        """Relevance-feedback term expansion from an RSet of documents.

        scheme="bo1": Bose-Einstein DFR weighting
        (xapian/expand/bo1eweight.cc). scheme="trad": TradEWeight — the
        Robertson/Sparck-Jones probabilistic scheme with a per-document
        wdf/doclen saturation multiplier (xapian/expand/tradeweight.cc:32-42
        get_weight; expandweight.h:79-99 ExpandStats::accumulate, whose
        multiplier term is (k+1)·wdf / (k·doclen/avlen + wdf); Xapian's
        default expansion scheme, expandweight.h:209-214). expand_k is
        TradE's k parameter (Enquire::set_expansion_scheme)."""
        import math

        from xapiand_tpu.analysis import termgen as tg_mod

        scheme = str(scheme).lower()
        if scheme not in ("bo1", "trad"):
            raise ValueError(f"unknown expansion scheme {scheme!r}")
        N = max(self.doc_count, 1)
        st = self.stats()
        avlen = max(float(st.avg_doclen), 1e-9)
        R = len(doc_ids)
        rtf: dict[str, int] = {}          # Bo1: rset collection freq
        rtermfreq: dict[str, int] = {}    # TradE: rset doc freq (r)
        multiplier: dict[str, float] = {}  # TradE: saturation sum
        schema_obj = Schema.from_dict(self.schema.to_dict())
        for did in doc_ids:
            doc = self.get_document(str(did))
            idoc = schema_obj.index(doc, doc_id=str(did))
            doc_terms = {t: e.wdf for t, e in idoc.terms.items()
                         if e.wdf > 0 and not t.startswith("Q")
                         and ":" not in t and "#" not in t}
            doclen = max(sum(doc_terms.values()), 1)
            for term, wdf in doc_terms.items():
                rtf[term] = rtf.get(term, 0) + wdf
                rtermfreq[term] = rtermfreq.get(term, 0) + 1
                multiplier[term] = multiplier.get(term, 0.0) + (
                    (expand_k + 1) * wdf
                    / (expand_k * doclen / avlen + wdf))
        scored = []
        for term, tf in rtf.items():
            if scheme == "trad":
                r = rtermfreq[term]
                termfreq = max(self.global_termfreq(term), r)
                reldocs_without = R - r
                num = (r + 0.5) * (N - termfreq - reldocs_without + 0.5)
                denom = (termfreq - r + 0.5) * (reldocs_without + 0.5)
                if num <= 0 or denom <= 0:
                    continue
                w = multiplier[term] * math.log(num / denom)
            else:
                cf = 0
                for s in self._searchers:
                    ti = s.segment.get_term(term)
                    if ti:
                        cf += ti.collfreq
                lam = max(cf, 1) / N
                w = tf * math.log2((1 + lam) / lam) + math.log2(1 + lam)
            scored.append((w, term))
        scored.sort(reverse=True)
        return [t for _, t in scored[:n_terms]]

    def find_similar(self, doc_id: str, k: int = 10,
                     n_terms: int = 20, scheme: str = "bo1",
                     expand_k: float = 1.0) -> SearchResult:
        """Documents similar to doc_id (the reference's nearest/fuzzy
        search: ESet feedback -> elite-set requery)."""
        terms = self.expand_terms([doc_id], n_terms=n_terms,
                                  scheme=scheme, expand_k=expand_k)
        if not terms:
            return SearchResult(total=0)
        res = self.search(Q.or_terms(terms), k=k + 1)
        res.hits = [h for h in res.hits if h.id != str(doc_id)][:k]
        res.total = max(res.total - 1, 0)
        return res

    # -- MSet clustering / diversification (≙ xapian/cluster, /diversify) -------

    def _doc_vectors(self, doc_ids: list, max_vocab: int = 2048):
        from xapiand_tpu.ops.cluster import tfidf_vectors

        schema = Schema.from_dict(self.schema.to_dict())
        term_lists = []
        df: dict[str, int] = {}
        for did in doc_ids:
            idoc = schema.index(self.get_document(str(did)), doc_id=str(did))
            terms = {t: e.wdf for t, e in idoc.terms.items()
                     if e.wdf > 0 and not t.startswith("Q")
                     and ":" not in t and "#" not in t}
            term_lists.append(terms)
            for t in terms:
                if t not in df:
                    df[t] = self.global_termfreq(t)
        return tfidf_vectors(term_lists, self.doc_count, df,
                             max_vocab=max_vocab)

    def cluster_hits(self, doc_ids: list, k: int = 3,
                     iters: int = 20) -> list[int]:
        """K-means cluster labels for a result set (Xapian::LCDClusterer /
        KMeans analog, on-device spherical k-means)."""
        from xapiand_tpu.ops.cluster import kmeans_cosine

        if not doc_ids:
            return []
        X, _ = self._doc_vectors(doc_ids)
        labels, _ = kmeans_cosine(X, k, iters=iters)
        return [int(l) for l in labels]

    def diversify(self, result: "SearchResult", k: Optional[int] = None,
                  lam: float = 0.5) -> "SearchResult":
        """Reorder hits for diversity (MMR; ≙ xapian/diversify)."""
        from xapiand_tpu.ops.cluster import diversify_mmr

        if not result.hits:
            return result
        ids = [h.id for h in result.hits]
        X, _ = self._doc_vectors(ids)
        scores = [h.score for h in result.hits]
        order = diversify_mmr(np.asarray(scores), X,
                              k or len(result.hits), lam=lam)
        result.hits = [result.hits[i] for i in order]
        for rank, h in enumerate(result.hits):
            h.rank = rank
        return result

    # -- stored spelling / synonym tables --------------------------------------

    def add_spelling(self, word: str, freqinc: int = 1) -> None:
        """≙ Database::add_spelling -> glass_spelling.cc add_word; WAL op
        ADD_SPELLING (wal.h:114-122). Stored words join the trigram
        suggestion index with their frequency as rank tiebreak."""
        word = str(word).lower()
        if self.wal is not None and not self._replaying:
            self.wal.write_add_spelling(word, freqinc)
        self._aux_dirty = True
        self._spellings[word] = self._spellings.get(word, 0) + int(freqinc)
        self._spell_epoch += 1

    def remove_spelling(self, word: str, freqdec: int = 1) -> None:
        """≙ Database::remove_spelling (glass_spelling.cc remove_word)."""
        word = str(word).lower()
        if self.wal is not None and not self._replaying:
            self.wal.write_remove_spelling(word, freqdec)
        self._aux_dirty = True
        f = self._spellings.get(word, 0) - int(freqdec)
        if f > 0:
            self._spellings[word] = f
        else:
            self._spellings.pop(word, None)
        self._spell_epoch += 1

    def add_synonym(self, term: str, synonym: str) -> None:
        """≙ Database::add_synonym (glass_synonym.cc); stored per term,
        expanded at query time when the search asks for it."""
        t, s = str(term).lower(), str(synonym).lower()
        if self.wal is not None and not self._replaying:
            self.wal.write_add_synonym(t, s)
        self._aux_dirty = True
        lst = self._synonyms.setdefault(t, [])
        if s not in lst:
            lst.append(s)

    def remove_synonym(self, term: str, synonym=None) -> None:
        """≙ Database::remove_synonym / clear_synonyms (synonym=None)."""
        t = str(term).lower()
        if self.wal is not None and not self._replaying:
            self.wal.write_remove_synonym(t, synonym)
        self._aux_dirty = True
        if synonym is None:
            self._synonyms.pop(t, None)
            return
        lst = self._synonyms.get(t)
        if lst and str(synonym).lower() in lst:
            lst.remove(str(synonym).lower())
            if not lst:
                self._synonyms.pop(t, None)

    def synonyms_of(self, term: str) -> list:
        return list(self._synonyms.get(str(term).lower(), ()))

    def expand_stored_synonyms(self, ir):
        """IR -> IR: each scoring term leaf whose word (or full term) has
        stored synonyms becomes an OP_SYNONYM group of the original term
        plus its synonyms carried under the same field prefix
        (QueryParser FLAG_AUTO_SYNONYMS, queryparser_internal.cc)."""
        if not self._synonyms:
            return ir

        def prefix_of(term: str) -> tuple[str, str]:
            # "Zpfx.word" / "pfx.word" / "word" -> (leading prefix, word)
            core = term[1:] if term.startswith("Z") else term
            if "." in core:
                p, w = core.rsplit(".", 1)
                return p + ".", w
            return "", core

        def expand_term(t: str, wqf, factor):
            syns = self._synonyms.get(t)
            pfx, w = prefix_of(t)
            if syns is None:
                syns = self._synonyms.get(w)
            if not syns:
                return None
            return Q.synonym([t] + [pfx + s for s in syns],
                             wqf=wqf, factor=factor)

        def walk(n):
            if n.op == "term":
                e = expand_term(n.terms[0], n.wqf, n.factor)
                return e if e is not None else n
            if n.op == "or_terms":
                if not any(self._synonyms.get(t) is not None
                           or self._synonyms.get(prefix_of(t)[1])
                           is not None for t in n.terms):
                    return n
                return Q.or_(*[walk(Q.term(t, wqf=n.wqf, factor=n.factor))
                               for t in n.terms])
            if n.children:
                return replace(n, children=tuple(walk(c)
                                                 for c in n.children))
            return n

        from dataclasses import replace
        return walk(ir)

    # -- spelling suggestions (≙ glass_spelling.* trigram tables) --------------

    def _spelling_index(self) -> dict:
        cache = getattr(self, "_spell_cache", None)
        if cache is not None and cache[0] == (self.revision,
                                              self._spell_epoch):
            return cache[1]
        tri: dict[str, set] = {}
        nosp = tuple(self.schema.no_spelling_prefixes())
        # prefer field-prefixed terms: the unprefixed global namespace
        # mirrors every field's words, so filtering _spelling: false fields
        # is only possible on the prefixed forms (process_spelling)
        words: set[str] = set()
        fallback: set[str] = set()
        for s in self._searchers:
            for term in s.segment.terms:
                if term.startswith(("Q", "Z")) or ":" in term or "#" in term:
                    continue
                if "." in term:
                    if nosp and term.startswith(nosp):
                        continue
                    words.add(term.split(".")[-1])
                else:
                    fallback.add(term)
        for word in (words or fallback) | set(self._spellings):
            w = f"${word}$"
            for i in range(len(w) - 2):
                tri.setdefault(w[i:i + 3], set()).add(word)
        self._spell_cache = ((self.revision, self._spell_epoch), tri)
        return tri

    def suggest_spelling(self, word: str, max_edit_distance: int = 2,
                         limit: int = 5) -> list[str]:
        """≙ Database::get_spelling_suggestion (trigram candidates ranked
        by edit distance)."""
        from xapiand_tpu.utils.strmetrics import levenshtein

        word = word.lower()
        tri = self._spelling_index()
        w = f"${word}$"
        cands: dict[str, int] = {}
        for i in range(len(w) - 2):
            for c in tri.get(w[i:i + 3], ()):
                cands[c] = cands.get(c, 0) + 1
        scored = []
        for cand, shared in cands.items():
            if cand == word:
                continue
            if abs(len(cand) - len(word)) > max_edit_distance:
                continue
            dist = levenshtein(cand, word)
            if dist <= max_edit_distance:
                # stored spellings rank by frequency within a distance
                # class (get_spelling_suggestion picks the most frequent)
                scored.append((dist, -self._spellings.get(cand, 0),
                               -shared, cand))
        scored.sort()
        return [c for _, _, _, c in scored[:limit]]

    def expand_prefix(self, prefix: str, limit: int = 256) -> list[str]:
        """All index terms starting with prefix (wildcard expansion,
        ≙ glass spelling/allterms cursor scans)."""
        out: set[str] = set()
        for s in self._searchers:
            seg = s.segment
            cache = getattr(seg, "_sorted_terms", None)
            if cache is None:
                cache = sorted(seg.terms.keys())
                seg._sorted_terms = cache
            import bisect

            i = bisect.bisect_left(cache, prefix)
            while i < len(cache) and cache[i].startswith(prefix):
                out.add(cache[i])
                if len(out) >= limit:
                    break
                i += 1
        return sorted(out)
