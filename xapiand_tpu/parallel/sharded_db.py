"""ShardedDatabase: the full Database surface over mesh-sharded segments.

This is the REST-on-mesh backend (VERDICT round-1 gap #1): the reference
resolves every request through IndexSettings{num_shards,...} to concrete
shard endpoints (src/index_resolver_lru.h:41-66) and routes document CRUD
by ``fnv1ah64(id_term) % n_shards`` (src/database/handler.cc:1963-2005).
Here the same index semantics are kept - per-shard WAL-backed routing,
docid striping, two-phase global-stats match - but shards are device-mesh
segments and the scatter-gather runs as one shard_map program (psum stats
merge, all_gather top-k merge) via MeshExecutor.

Design: a generation = one commit's per-shard segments, uniform-padded and
stacked over the mesh ('shard' axis). Commits stay incremental (the delta-
segment model of Database); searches run the SPMD step once per generation
and merge host-side exactly like Database merges its segments (generation
consolidation folds commits back to ONE, so steady-state is one launch
per query). Collapse runs two-level on the mesh (per-shard collapse in
the step + host re-collapse); scripted metrics fold host-side with their
match phase on the mesh. The few agg kinds outside MESH_AGG_KINDS
transparently fall back to the inherited per-segment path, so the
sharded index serves the complete API surface either way. With fewer devices than shards (e.g. one real
chip) the mesh is skipped entirely and only the inherited path runs -
routing and shard layout stay identical, so indexes move between
single-chip and mesh deployments without rebuilds.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from xapiand_tpu.database import Database, SearchResult
from xapiand_tpu.models.builder import SegmentBuilder
from xapiand_tpu.query.dsl import QueryDSL
from xapiand_tpu.query.ir import Q
from xapiand_tpu.search import SegmentSearcher
from xapiand_tpu.utils.hashing import fnv1ah64


def try_make_mesh(n_shards: int):
    """A ('dp','shard') mesh with the shard axis = n_shards, or None when
    the process has too few devices (single-chip deployments: routing and
    layout are kept, execution falls back to per-segment searchers)."""
    import jax

    from xapiand_tpu.parallel.mesh import make_mesh

    devs = jax.devices()
    if len(devs) < n_shards:
        return None
    n_dp = len(devs) // n_shards
    return make_mesh(n_shards=n_shards, n_dp=n_dp,
                     devices=devs[: n_dp * n_shards])


class _ShardRoutedBuilder:
    """Pending-write accumulator that routes each prepared document to its
    shard's builder (fnv1ah64 of the ID term, handler.cc:2004). Tracks each
    doc's global insertion sequence so equal-score ranks match the
    unsharded index exactly (Database._tiebreak contract)."""

    def __init__(self, n_shards: int, seq0: int = 0):
        self.n_shards = n_shards
        self.seq0 = seq0
        self.builders = [SegmentBuilder() for _ in range(n_shards)]
        self.order: list[list[int]] = [[] for _ in range(n_shards)]
        self._n = 0

    @property
    def wants_deferred_text(self) -> bool:
        return self.builders[0].wants_deferred_text

    def route(self, doc_id: str) -> int:
        return fnv1ah64("Q" + str(doc_id)) % self.n_shards

    def add(self, idoc):
        shard = self.route(idoc.doc_id)
        self.builders[shard].add(idoc)
        self.order[shard].append(self.seq0 + self._n)
        self._n += 1

    def __len__(self):
        return self._n


class ShardedDatabase(Database):
    def __init__(self, path: Optional[str] = None, scheme: str = "bm25",
                 schema=None, device=None, n_shards: int = 2,
                 mesh=None, **scheme_params):
        self.n_shards = int(n_shards)
        self.mesh = mesh if mesh is not None else try_make_mesh(self.n_shards)
        self._generations: list[dict] = []
        self._seg_to_gen: dict[int, tuple[int, int]] = {}
        self._mesh_step_cache: dict = {}
        self._insert_seq = 0
        self._last_orderkeys = None
        super().__init__(path=path, scheme=scheme, schema=schema,
                         device=device, **scheme_params)

    # -- routing + pending-write plumbing -------------------------------------

    def route(self, doc_id: str) -> int:
        return self._builder.route(doc_id)

    def _new_builder(self):
        return _ShardRoutedBuilder(self.n_shards, seq0=self._insert_seq)

    def _tiebreak(self, seg_idx: int, did: int):
        gs = self._seg_to_gen.get(seg_idx)
        if gs is None:
            return (seg_idx, did)
        gen = self._generations[gs[0]]
        return int(gen["orderkey"][gs[1]][did])

    def _finalize_pending(self) -> list:
        from xapiand_tpu.parallel.sharded import pad_uniform

        segs = [b.finalize() for b in self._builder.builders]
        self._insert_seq = self._builder.seq0 + len(self._builder)
        # SPMD needs uniform shapes across the generation's shards; padding
        # rows are flagged deleted so they can never match (sharded.py)
        if self.mesh is not None:
            segs = pad_uniform(segs)
        nd = max(s.num_docs for s in segs)
        okeys = np.full((self.n_shards, nd + 1), 2**31 - 1, np.int32)
        for si, order in enumerate(self._builder.order):
            okeys[si, : len(order)] = order
        self._last_orderkeys = okeys
        return segs

    def _segments_committed(self, seg_indices: list) -> None:
        segs = [self._searchers[i].segment for i in seg_indices]
        gi = len(self._generations)
        self._generations.append(
            {"searcher_idx": list(seg_indices), "segments": segs,
             "orderkey": self._last_orderkeys, "stacked": None})
        for si, idx in enumerate(seg_indices):
            self._seg_to_gen[idx] = (gi, si)

    def _ensure_stacked(self, gen: dict):
        if gen["stacked"] is None:
            import jax
            import jax.numpy as jnp
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            from xapiand_tpu.parallel.sharded import stack_segments

            stacked = stack_segments(gen["segments"], self.mesh)
            stacked["orderkey"] = jax.device_put(
                jnp.asarray(gen["orderkey"]),
                NamedSharding(self.mesh, P("shard", None)))
            gen["stacked"] = stacked
        return gen["stacked"]

    def delete_document(self, doc_id: str, **kw) -> bool:
        loc = self._locate.get(str(doc_id))
        found = super().delete_document(doc_id, **kw)
        if loc is not None and self.mesh is not None:
            gs = self._seg_to_gen.get(loc[0])
            if gs is not None:
                gen = self._generations[gs[0]]
                if gen["stacked"] is not None:
                    # refresh only the delete bitmaps on device
                    import jax
                    import jax.numpy as jnp
                    from jax.sharding import NamedSharding
                    from jax.sharding import PartitionSpec as P

                    gen["stacked"]["deleted"] = jax.device_put(
                        jnp.asarray(np.stack([s.deleted
                                              for s in gen["segments"]])),
                        NamedSharding(self.mesh, P("shard", None)))
        return found

    # -- maintenance -----------------------------------------------------------

    def merge_segments(self) -> int:
        self._generations = []
        self._seg_to_gen = {}
        self._mesh_step_cache.clear()
        return super().merge_segments()

    def _compact_tier(self):
        """Generation consolidation: fold every per-commit generation into
        ONE via a per-shard data merge (models/merge.py - postings and
        value/geo columns concatenated with docids rebased, no re-analysis),
        so ``_search_mesh`` launches the SPMD step once per query no matter
        how many commits the index has seen (the reference's per-shard
        search cost never grows with commit count, shard.cc). Insertion-
        order tiebreak arrays are carried through the docid remaps, so
        equal-score ranks stay identical to the unsharded oracle."""
        from xapiand_tpu.models.merge import merge_segments_data
        from xapiand_tpu.parallel.sharded import pad_uniform

        if len(self._generations) < 2:
            return
        per_shard: list[list] = [[] for _ in range(self.n_shards)]
        for gen in self._generations:
            for shard, seg_idx in enumerate(gen["searcher_idx"]):
                per_shard[shard].append(
                    (seg_idx, self._searchers[seg_idx].segment,
                     gen["orderkey"][shard]))
        new_segs, new_okeys = [], []
        for shard in range(self.n_shards):
            segs = [t[1] for t in per_shard[shard]]
            alive = []
            for seg_idx, seg, _ok in per_shard[shard]:
                al = (~seg.deleted[: seg.num_docs]).copy()
                keys = seg.doc_keys
                for docid in np.nonzero(al)[0]:
                    if docid >= len(keys) or \
                            self._locate.get(keys[docid]) != (seg_idx,
                                                              int(docid)):
                        al[docid] = False
                alive.append(al)
            merged, remaps = merge_segments_data(segs, alive)
            ok = np.full(merged.num_docs + 1, 2**31 - 1, np.int32)
            for (_si, _seg, okrow), rm in zip(per_shard[shard], remaps):
                kept = np.nonzero(rm >= 0)[0]
                ok[rm[kept]] = okrow[kept]
            new_segs.append(merged)
            new_okeys.append(ok)
        if self.mesh is not None:
            new_segs = pad_uniform(new_segs)
        nd = max(s.num_docs for s in new_segs)
        okeys = np.full((self.n_shards, nd + 1), 2**31 - 1, np.int32)
        for si, ok in enumerate(new_okeys):
            okeys[si, : ok.shape[0] - 1] = ok[:-1]
        self._last_orderkeys = okeys
        self._searchers = []
        self._locate = {}
        self._generations = []
        self._seg_to_gen = {}
        self._mesh_step_cache.clear()
        new_indices = []
        for seg in new_segs:
            searcher = SegmentSearcher(seg, self.scheme, device=self.device)
            idx = len(self._searchers)
            self._searchers.append(searcher)
            new_indices.append(idx)
            for docid, key in enumerate(seg.doc_keys):
                if not seg.deleted[docid]:
                    self._locate[key] = (idx, docid)
        self._segments_committed(new_indices)

    def info(self) -> dict:
        out = super().info()
        out["num_shards"] = self.n_shards
        out["mesh"] = None if self.mesh is None else \
            dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
        return out

    # -- search: SPMD fast path with transparent fallback ----------------------

    def search(self, query, k: int = 10, offset: int = 0, sort: tuple = (),
               collapse_slot: Optional[int] = None,
               aggs: Optional[dict] = None, count_only: bool = False,
               scheme=None, collapse_max: int = 1,
               percent_cutoff: float = 0.0,
               weight_cutoff: float = 0.0) -> SearchResult:
        if percent_cutoff or weight_cutoff:
            # set_cutoff analog on the mesh path (handler.cc:1443 — the
            # reference's MSet merger carries the same thresholds); the
            # inherited post-filter recurses through THIS method so the
            # match phase still rides shard_map
            return self._search_with_cutoff(
                percent_cutoff, weight_cutoff, query, k, offset,
                sort=sort, collapse_slot=collapse_slot, aggs=aggs,
                count_only=count_only, scheme=scheme,
                collapse_max=collapse_max)
        # _scripted_metric folds a sandboxed script per matched doc on the
        # coordinator (aggregations.cc:118-207 analog); its candidate
        # gathering recurses through THIS method, so the match phase still
        # rides the mesh - only the fold is host-side
        scripted = None
        if aggs and any(isinstance(b, dict) and "_scripted_metric" in b
                        for b in aggs.values()):
            scripted = {n: b for n, b in aggs.items()
                        if isinstance(b, dict) and "_scripted_metric" in b}
            aggs = {n: b for n, b in aggs.items()
                    if n not in scripted} or None
        mesh_ok = self.mesh is not None and self._generations
        if not mesh_ok:
            result = super().search(query, k=k, offset=offset, sort=sort,
                                    collapse_slot=collapse_slot, aggs=aggs,
                                    count_only=count_only, scheme=scheme,
                                    collapse_max=collapse_max)
        else:
            try:
                result = self._search_mesh(query, k, offset, sort, aggs,
                                           count_only, scheme,
                                           collapse_slot, collapse_max)
            except ValueError:
                # mesh-incompatible feature (agg kind outside
                # MESH_AGG_KINDS): the inherited per-segment path serves
                # it instead - same results, coordinator execution
                result = super().search(query, k=k, offset=offset,
                                        sort=sort,
                                        collapse_slot=collapse_slot,
                                        aggs=aggs, count_only=count_only,
                                        scheme=scheme,
                                        collapse_max=collapse_max)
        if scripted:
            ir = query if isinstance(query, Q) else \
                QueryDSL(self.schema,
                         term_expander=self.expand_prefix).parse(query)
            shaped = self._scripted_metrics(ir, scripted, self.stats())
            result.aggregations = {**(result.aggregations or {}), **shaped}
        return result

    def search_many(self, queries: list, k: int = 10, offset: int = 0,
                    scheme=None) -> list:
        """Batched plain search on the mesh: queries group by plan
        signature and each group runs as ONE SPMD launch per generation
        (MeshExecutor.run takes the whole list), so the REST micro-batcher
        coalesces concurrent sharded traffic the same way it does
        unsharded. Falls back to the inherited per-segment path when no
        mesh is reachable."""
        from xapiand_tpu.models.weights import get_scheme
        from xapiand_tpu.parallel.sharded import MeshExecutor
        from xapiand_tpu.query.plan import resolve_special

        if self.mesh is None or not self._generations:
            return super().search_many(queries, k=k, offset=offset,
                                       scheme=scheme)
        if scheme is None:
            scheme = self.scheme
        elif isinstance(scheme, str):
            scheme = get_scheme(scheme)
        stats = self.stats()
        irs = []
        for q in queries:
            ir = q if isinstance(q, Q) else \
                QueryDSL(self.schema,
                         term_expander=self.expand_prefix).parse(q)
            irs.append(resolve_special(ir, scheme, stats,
                                       self.global_termfreq,
                                       self.global_collfreq))
        groups: dict = {}
        for qi, ir in enumerate(irs):
            groups.setdefault(ir.signature(), []).append(qi)
        want = max(k + offset, 1)
        ex = MeshExecutor(self.mesh, self.n_shards, self.scheme,
                          self._mesh_step_cache)
        from xapiand_tpu.database import Hit

        results: list = [None] * len(irs)
        for idxs in groups.values():
            sub = [irs[qi] for qi in idxs]
            merged = [[] for _ in idxs]
            totals = [0] * len(idxs)
            for gen in self._generations:
                stacked = self._ensure_stacked(gen)
                raw = ex.run(gen["segments"], stacked, self.schema, stats,
                             self.global_termfreq, self.global_collfreq,
                             sub, want, scheme=scheme)
                for li in range(len(idxs)):
                    totals[li] += int(raw["counts"][li])
                    for gd, sc in zip(raw["docids"][li],
                                      raw["scores"][li]):
                        if not np.isfinite(sc) and sc < 0:
                            continue
                        if gd == 2**31 - 1:
                            continue
                        shard = int(gd) % self.n_shards
                        local = int(gd) // self.n_shards
                        seg_idx = gen["searcher_idx"][shard]
                        seg = self._searchers[seg_idx].segment
                        if local >= len(seg.doc_keys) or \
                                seg.deleted[local]:
                            continue
                        merged[li].append(
                            (-float(sc),
                             int(gen["orderkey"][shard][local]),
                             seg_idx, int(local)))
            for li, qi in enumerate(idxs):
                merged[li].sort()
                result = SearchResult(total=totals[li])
                for rank, (negscore, _tb, seg_idx, did) in enumerate(
                        merged[li][offset:offset + k]):
                    key = self._searchers[seg_idx].segment.doc_keys[did]
                    result.hits.append(Hit(
                        id=key, score=-negscore, rank=offset + rank,
                        data=self._docs_store.get(key, {})))
                results[qi] = result
        return results

    def _search_mesh(self, query, k, offset, sort, aggs, count_only,
                     scheme, collapse_slot=None,
                     collapse_max=1) -> SearchResult:
        from xapiand_tpu import aggregations as aggs_mod
        from xapiand_tpu.models.weights import get_scheme
        from xapiand_tpu.parallel.sharded import MeshExecutor

        if scheme is None:
            scheme = self.scheme
        elif isinstance(scheme, str):
            scheme = get_scheme(scheme)
        ir = query if isinstance(query, Q) else \
            QueryDSL(self.schema,
                     term_expander=self.expand_prefix).parse(query)
        stats = self.stats()
        want = k + offset
        # collapse rides the mesh as two-level collapse (collapser.cc +
        # handler.cc:1543-1549): each shard collapses locally inside the
        # SPMD step; the host re-collapses the merged union. The device
        # merge must return the FULL S*want union (not just top-want) so
        # the host pass sees every per-shard survivor - per-shard depth
        # `want` is sufficient for exactness, the widening is only so the
        # union slice drops nothing.
        run_k = want * self.n_shards if collapse_slot is not None \
            else max(want, 1)
        ex = MeshExecutor(self.mesh, self.n_shards, self.scheme,
                          self._mesh_step_cache)
        slot_ranges = None
        if aggs:
            # one bin grid across ALL generations so per-generation
            # order-stat histograms merge exactly
            slot_ranges = aggs_mod.slot_ranges_of(
                [s.segment for s in self._searchers])
        merged: list[tuple[float, int, int]] = []   # (-score, seg_idx, did)
        total = 0
        agg_parts, agg_cats, agg_names, agg_metas = [], [], None, None
        for gen in self._generations:
            stacked = self._ensure_stacked(gen)
            raw = ex.run(gen["segments"], stacked, self.schema, stats,
                         self.global_termfreq, self.global_collfreq,
                         [ir], run_k, aggs=aggs,
                         sort=tuple(sort) if sort else None, scheme=scheme,
                         slot_ranges=slot_ranges,
                         collapse_slot=collapse_slot,
                         collapse_max=collapse_max)
            total += int(raw["counts"][0])
            if aggs and raw["agg_parts"] is not None:
                agg_parts.append(raw["agg_parts"](0))
                agg_cats.append(raw["mesh_cats"])
                agg_names, agg_metas = raw["agg_names"], raw["agg_metas"]
            if count_only:
                continue
            for gd, sc in zip(raw["docids"][0], raw["scores"][0]):
                if not np.isfinite(sc) and sc < 0:
                    continue
                if gd == 2**31 - 1:
                    continue
                shard, local = int(gd) % self.n_shards, \
                    int(gd) // self.n_shards
                seg_idx = gen["searcher_idx"][shard]
                seg = self._searchers[seg_idx].segment
                if local >= len(seg.doc_keys) or seg.deleted[local]:
                    continue
                merged.append((-float(sc),
                               int(gen["orderkey"][shard][local]),
                               seg_idx, int(local)))
        result = SearchResult(total=total)
        if aggs and agg_parts:
            result.aggregations = aggs_mod.merge_and_shape(
                agg_names, agg_metas, agg_parts, agg_cats)
        if count_only:
            return result
        if sort:
            merged = self._merge_sorted(merged, sort)
        else:
            merged.sort()
        if collapse_slot is not None:
            # second collapse level across shards + generations
            merged = self._recollapse(merged, collapse_slot, collapse_max)
        from xapiand_tpu.database import Hit

        for rank, (negscore, _tb, seg_idx, did) in enumerate(
                merged[offset:offset + k]):
            seg = self._searchers[seg_idx].segment
            key = seg.doc_keys[did]
            result.hits.append(Hit(id=key, score=-negscore,
                                   rank=offset + rank,
                                   data=self._docs_store.get(key, {})))
        return result
