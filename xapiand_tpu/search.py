"""SegmentSearcher: jit-compiled query execution over one DeviceSegment.

Holds the per-(ExecConfig, segment) compilation cache - the TPU-era
equivalent of the reference's DatabasePool of ready readers (pool.h:151):
reopening a reader becomes a jit-cache hit.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from xapiand_tpu.models.segment import DeviceSegment, Segment
from xapiand_tpu.models.weights import WeightScheme, get_scheme
from xapiand_tpu.ops.executor import ExecConfig, execute
from xapiand_tpu.query.plan import BoundPlan, fullwidth_ok


class SegmentSearcher:
    def __init__(self, seg: Segment, scheme: Optional[WeightScheme] = None,
                 device=None):
        self.segment = seg
        self._device = device
        self._device_segment: Optional[DeviceSegment] = None
        self.scheme = scheme or get_scheme("bm25")
        self._cache: dict = {}

    @property
    def device_segment(self) -> DeviceSegment:
        """Device mirror, built LAZILY on the first device-routed query.

        Indexing/commit never pays the HBM upload (9.1ms+ tunnel
        device_put per array; the dominant cost of geo-profile commits),
        and pure host-path serving (host_scorer/host_query) never
        uploads at all — mirroring the reference, whose glass commit is
        disk-only (glass_inverter.cc flush) with no device involved."""
        ds = self._device_segment
        if ds is None:
            ds = self._device_segment = DeviceSegment(
                self.segment, device=self._device)
        return ds

    def host_scorer(self):
        """Lazy native latency-path scorer over this segment's flat
        arrays (ops/host_scorer.py; serving-plane single-query path)."""
        hs = getattr(self, "_host_scorer", None)
        if hs is None:
            from xapiand_tpu.ops.host_scorer import HostScorer

            hs = self._host_scorer = HostScorer(self.segment)
        return hs

    def host_query(self):
        """Lazy native conjunctive executor (ops/host_query.py); None when
        the native lib is unavailable."""
        hq = getattr(self, "_host_query", None)
        if hq is None:
            from xapiand_tpu.native import lib

            if lib is None:
                return None
            from xapiand_tpu.ops.host_query import HostQueryExecutor

            hq = self._host_query = HostQueryExecutor(self.segment)
        return hq

    def refresh_deleted(self):
        """Re-upload the delete bitmap after host-side deletes (delta
        deletes on immutable segments, SURVEY.md §7 hard-parts)."""
        if self._device_segment is not None:
            self._device_segment.deleted = jax.device_put(
                jnp.asarray(self.segment.deleted, jnp.bool_))
        # native executors registered a has-deletes flag at build time
        self.__dict__.pop("_host_query", None)

    def _compiled(self, cfg: ExecConfig, scheme: WeightScheme):
        key = (cfg, scheme.key())
        fn = self._cache.get(key)
        if fn is None:
            def run(seg_arrays, plan_arrays, stats):
                return execute(seg_arrays, plan_arrays, cfg, stats, scheme)

            fn = jax.jit(run)
            self._cache[key] = fn
        return fn

    def batched(self, cfg: ExecConfig, scheme: Optional[WeightScheme] = None):
        """jit(vmap(execute)) over a leading query axis - the single-chip
        throughput path (one compiled program serves every query of this
        shape class)."""
        scheme = scheme or self.scheme
        key = ("batched", cfg, scheme.key())
        fn = self._cache.get(key)
        if fn is None:
            def run(seg_arrays, plan_batch, stats):
                return jax.vmap(
                    lambda p: execute(seg_arrays, p, cfg, stats, scheme)
                )(plan_batch)

            fn = jax.jit(run)
            self._cache[key] = fn
        return fn

    def execute(self, bound: BoundPlan, stats: dict,
                scheme: Optional[WeightScheme] = None) -> dict:
        """stats: {"N": float, "avg_doclen": float, "doclen_lower": float,
        "doclen_upper": float, "total_len": float}."""
        for slot, chs in bound.cfg.carry:
            self.device_segment.ensure_postval(slot, chs)
        fn = self._compiled(bound.cfg, scheme or self.scheme)
        plan_arrays = jax.tree.map(jnp.asarray, bound.arrays)
        stats_arrays = {k: jnp.float32(v) for k, v in stats.items()}
        out = fn(self.device_segment.arrays_pytree(), plan_arrays,
                 stats_arrays)
        return jax.tree.map(np.asarray, out)


class BatchSearcher:
    """Shape-bucketed batch execution over one segment - the library home
    of the query-shape grouping the round-1 benchmark hand-rolled.

    Mixed traffic is bucketed three ways before launch:
      1. plan signature (compilation shape: operator tree, filters, sort),
      2. size-class terciles within a signature, so a rare huge-df query
         doesn't inflate every query's sort width (SURVEY §7 bucketed
         compilation; the reference's per-query iterators are naturally
         sized so it never faces this),
      3. equal-work batch widths: a group whose unified sort width is W
         times the smallest group's gets a batch width ~W times narrower,
         so every launch does similar work and tail latency stays within
         a small factor of the median (round-1 BENCH p99/p50 was 4.7x
         because the widest group's launches dominated).

    Launches are enqueued asynchronously (TPU executes them in order), so
    consecutive batches double-buffer across the host tunnel naturally;
    results are only synced when the caller consumes them.
    """

    def __init__(self, searcher: SegmentSearcher, k: int = 10,
                 max_batch: int = 256, min_batch: int = 64,
                 class_groups: int = 3, work_ratio: float = 2.0,
                 scheme: Optional[WeightScheme] = None,
                 sort=None, aggs=None, chunk_rows: int = 0,
                 prefix_cap: int = 0, global_tf=None, global_cf=None):
        self.searcher = searcher
        self.k = k
        # cross-segment term statistics (Database.search_many): per-term
        # constants must use GLOBAL termfreqs or scores diverge between
        # segments of one database (handler.cc two-phase stat merge)
        self.global_tf = global_tf
        self.global_cf = global_cf
        # impact-prefix pruning (matcher.cc:415 maxweight analog): terms
        # whose size class exceeds this cap read only the top-`cap`
        # impact-ordered postings; a per-query device certificate proves
        # the top-k exact, and uncertified queries re-run the exact path
        # (run()). Counts on certified prefix queries are lower bounds
        # (the reference reports estimates under pruning too). 0 = off.
        self.prefix_cap = prefix_cap
        # sort-free faceted path (ExecConfig.fullwidth): skip eligible-row
        # compaction when every sort/agg consumer reads carried channels;
        # a single value sort key becomes a windowed top_k with an
        # exactness certificate (uncertified -> exact re-run below).
        # XT_FULLWIDTH=0 restores the compaction path for A/B.
        import os

        self._fullwidth = os.environ.get("XT_FULLWIDTH", "1") != "0"
        # min rows per docid-range chunk (see _chunkify); <=0 disables.
        # Default OFF: measured 8% slower end-to-end at 1M docs on v5e
        # (10,374 vs 11,312 QPS) - the isolated sort win doesn't survive
        # the extra launches + finalist resort. Kept for corpora with
        # clustered postings where tight chunk widths pay off.
        self.chunk_rows = chunk_rows
        # optional shared sort keys / aggregations bound into EVERY query
        # of the batch (one compilation shape; faceted-serving pattern).
        # aggs = (specs, arrays) from aggregations.compile_for_segment.
        self.sort = sort
        self.aggs_specs, self.agg_arrays = aggs if aggs else ((), None)
        self.max_batch = max_batch
        self.min_batch = min_batch
        self.class_groups = class_groups
        # per-launch work may exceed the lightest group's by this factor
        # before the batch width narrows: 1.0 = strictly equal work (flat
        # latency, more dispatch overhead), higher trades tail for QPS
        self.work_ratio = work_ratio
        self.scheme = scheme or searcher.scheme

    def plan(self, irs: list, stats=None) -> list:
        """Bind + bucket + pad a mixed list of Q IRs.

        -> list of (cfg, fn, batch_arrays, chunk_query_idxs); feed each to
        fn(seg_arrays, batch, stats_d) in order. Exposed separately so
        benchmarks can drive the enqueue loop themselves."""
        from xapiand_tpu.models.weights import CollectionStats
        from xapiand_tpu.query.plan import (bind, compile_ir,
                                            resolve_special, unify_cfgs)

        seg = self.searcher.segment
        if stats is None:
            stats = CollectionStats(
                doc_count=seg.doc_count, avg_doclen=seg.avg_doclen,
                doclen_lower=1.0)

        def gtf(t):
            ti = seg.get_term(t)
            return ti.length if ti else 0

        def gcf(t):
            ti = seg.get_term(t)
            return ti.collfreq if ti else 0

        if self.global_tf is not None:
            gtf = self.global_tf
        if self.global_cf is not None:
            gcf = self.global_cf

        irs = [resolve_special(ir, self.scheme, stats, gtf, gcf)
               for ir in irs]
        bounds = [bind(compile_ir(ir, cost_fn=gtf), seg, self.scheme, stats,
                       k=self.k,
                       global_tf=gtf, global_cf=gcf, sort=self.sort,
                       aggs=self.aggs_specs, agg_arrays=self.agg_arrays,
                       keep_carry=self._fullwidth)
                  for ir in irs]

        # signature buckets, then size-class tercile sub-groups
        sig_buckets: dict = {}
        for qi, ir in enumerate(irs):
            sig_buckets.setdefault(ir.signature(), []).append(qi)
        groups: list[list[int]] = []
        for idxs in sig_buckets.values():
            if len(idxs) <= 1 or self.class_groups <= 1:
                groups.append(idxs)
                continue
            # frequency-weighted quantile cuts over per-query max class, so
            # each group holds a similar share of the traffic; a group
            # smaller than half a launch merges upward (wraparound padding
            # would otherwise waste most of its rows)
            cmaxes = sorted(max(bounds[i].cfg.term_classes())
                            for i in idxs)
            n = len(cmaxes)
            cuts = sorted({cmaxes[(j * n) // self.class_groups - 1]
                           for j in range(1, self.class_groups)}
                          | {cmaxes[-1]})
            sub: dict = {c: [] for c in cuts}
            for i in idxs:
                cm = max(bounds[i].cfg.term_classes())
                sub[next(c for c in cuts if cm <= c)].append(i)
            pending: list[int] = []
            for c in sorted(sub):
                cur = pending + sub[c]
                pending = []
                if not cur:
                    continue
                if c != max(sub) and len(cur) < self.min_batch // 2:
                    pending = cur
                    continue
                groups.append(cur)
            if pending:
                groups.append(pending)

        # unify within each group; equal-work batch widths across groups
        unified = [(unify_cfgs([bounds[i].cfg for i in idxs], k=self.k),
                    idxs) for idxs in groups]
        if self.prefix_cap > 0 and self.k <= 64:
            unified = [(self._prefixify(cfg_u, stats), idxs)
                       for cfg_u, idxs in unified]
        import os
        if os.environ.get("XT_PHRASE_CARRY", "0") == "1":
            # A/B gate: positional channels ride the main docid sort,
            # replacing phrase_leaves' per-term (L+C)-wide sort-joins
            unified = [(replace(c, phrase_carry=True) if c.phrases else c,
                        i) for c, i in unified]
        # upload posting-aligned value channels BEFORE any arrays_pytree()
        # call so every fn of this searcher compiles against one stable
        # pytree (cfg.carry; executor falls back per missing channel)
        for cfg_u, _ in unified:
            for slot, chs in cfg_u.carry:
                self.searcher.device_segment.ensure_postval(slot, chs)
        works = []
        for cfg, _ in unified:
            w = max(sum(p or c for p, c in
                        zip(cfg.prefix or (0,) * cfg.T, cfg.classes)), 1) \
                if cfg.classes else 1
            for _slot, _QR, RMAX in cfg.geo_specs:
                # the exact HTM test sort-joins C*RMAX flattened doc
                # ranges per query through a 4-channel sort + scan:
                # weigh geo groups accordingly or wide geo batches OOM
                # the TPU compiler
                w *= 4 * (1 + RMAX)
            works.append(w)
        wmin = min(works)
        out = []
        for (cfg_g, idxs), work in zip(unified, works):
            cfg_g = self._chunkify(cfg_g, bounds, idxs)
            if cfg_g.compact_cap and cfg_g.req_groups:
                # tighten the compaction cap from the ACTUAL conjunct
                # lens of the group's queries (classes are pow2-quantized
                # group maxima - 5x looser than the data): eligible_q <=
                # min over required conjuncts of its summed len, so the
                # group max of that is a sound static cap. Each query's
                # OWN req_groups positions are used - conjunct positions
                # differ across members when or_terms sizes vary.
                m = 0
                for i in idxs:
                    lq = np.asarray(bounds[i].arrays["lens"])
                    rgs = bounds[i].cfg.req_groups or cfg_g.req_groups
                    mi = min(sum(int(lq[p]) if p < len(lq) else 0
                                 for p in g)
                             for g in rgs)
                    m = max(m, mi)
                from xapiand_tpu.models.segment import size_class
                cap = size_class(max(m, 128))   # pow2: odd sort/slice
                # widths hit slow XLA paths at 1M scale
                if cap < cfg_g.compact_cap:
                    cfg_g = replace(cfg_g, compact_cap=cap)
            if self._fullwidth and fullwidth_ok(cfg_g):
                cfg_g = replace(cfg_g, fullwidth=True)
            elif cfg_g.carry:
                # ADVICE r3: never let carried channels ride into the
                # compaction layout (incl. the uncertified exact re-run,
                # which runs with _fullwidth temporarily off)
                cfg_g = replace(cfg_g, carry=())
            width = self.max_batch
            while width > self.min_batch and \
                    width * work > self.work_ratio * self.max_batch * wmin:
                width //= 2
            # absolute per-launch budget (rows x channel-weight): the
            # relative rule is scale-invariant, so an all-heavy plan
            # (e.g. every group geo) would otherwise keep full width
            while width > 1 and width * work > 100_000_000:
                width //= 2
            T = cfg_g.T
            fn = self.searcher.batched(cfg_g, self.scheme)
            s = 0
            while s < len(idxs):
                chunk = list(idxs[s: s + width])
                s += width
                bs = width if len(idxs) > width else _pow2_cover(
                    len(chunk), self.min_batch)
                while len(chunk) < bs:      # wraparound pad: same work/row
                    chunk.append(chunk[0])
                keys = [k for k in ("offsets", "lens", "tconst", "scoring",
                                    "group_bits", "fparams", "syn_tconst")
                        if k in bounds[chunk[0]].arrays]
                batch = {
                    key: jnp.asarray(np.stack([
                        np.pad(bounds[i].arrays[key],
                               _pad_spec(bounds[i].arrays[key],
                                         T if key not in
                                         ("fparams", "syn_tconst")
                                         else bounds[i].arrays[key].shape[0]))
                        for i in chunk]))
                    for key in keys
                }
                b0 = bounds[chunk[0]].arrays
                if "geo_queries" in b0:
                    # list of per-leaf [QR, 2] range arrays: pad each
                    # query's ranges to the unified QR with INVALID rows
                    # (start > end), then stack on the batch axis
                    gqs = []
                    for gi, (_slot, QR, _rm) in enumerate(cfg_g.geo_specs):
                        rows = []
                        for i in chunk:
                            q = bounds[i].arrays["geo_queries"][gi]
                            if q.shape[0] < QR:
                                padq = np.full((QR, 2), 2**31 - 1,
                                               np.int32)
                                padq[: q.shape[0]] = q
                                q = padq
                            rows.append(q)
                        gqs.append(jnp.asarray(np.stack(rows)))
                    batch["geo_queries"] = gqs
                if "sort_targets" in b0:
                    batch["sort_targets"] = [
                        jnp.asarray(np.stack(
                            [np.asarray(bounds[i].arrays["sort_targets"][si])
                             for i in chunk]))
                        for si in range(len(b0["sort_targets"]))]
                if "sort_strtabs" in b0:
                    batch["sort_strtabs"] = {
                        si: jnp.asarray(np.stack(
                            [bounds[i].arrays["sort_strtabs"][si]
                             for i in chunk]))
                        for si in b0["sort_strtabs"]}
                if cfg_g.n_chunks > 1:
                    batch["c_offsets"] = jnp.asarray(np.stack(
                        [bounds[i].arrays["c_offsets"] for i in chunk]))
                    batch["c_lens"] = jnp.asarray(np.stack(
                        [bounds[i].arrays["c_lens"] for i in chunk]))
                out.append((cfg_g, fn, batch, chunk))
        return out

    HOST_CONJ_MAX_WORK = 8_000_000

    def _route_host(self, irs: list, stats=None):
        """-> ({qi: out}, [remaining qi]): conjunctive queries served by
        the native executor, the rest left for the device batch."""
        import os

        from xapiand_tpu.models.weights import CollectionStats

        results: dict = {}
        rem = list(range(len(irs)))
        if os.environ.get("XT_HOST_PATH", "1") == "0":
            return results, rem
        hq = self.searcher.host_query()
        if hq is None:
            return results, rem
        from xapiand_tpu.ops.host_query import conj_eligible
        from xapiand_tpu.ops.host_scorer import host_eligible, term_constants
        from xapiand_tpu.query.plan import compile_ir, resolve_special

        seg = self.searcher.segment
        st = stats or CollectionStats(
            doc_count=seg.doc_count, avg_doclen=seg.avg_doclen,
            doclen_lower=1.0, total_len=float(seg.total_doclen))

        def gtf(t):
            ti = seg.get_term(t)
            return ti.length if ti else 0

        def gcf(t):
            ti = seg.get_term(t)
            return ti.collfreq if ti else 0

        if self.global_tf is not None:
            gtf = self.global_tf
        if self.global_cf is not None:
            gcf = self.global_cf
        rem = []
        or_cands: list = []   # (qi, cq) pure-OR queries, host-eligible
        for qi, ir in enumerate(irs):
            cq = compile_ir(resolve_special(ir, self.scheme, st, gtf, gcf),
                            cost_fn=gtf)
            parts = conj_eligible(cq, self.scheme, self.sort or (),
                                  self.aggs_specs, None)
            out = None
            if parts is not None and \
                    hq.driver_work(cq, parts) <= self.HOST_CONJ_MAX_WORK:
                tc = term_constants(cq, self.scheme, st, gtf, gcf)
                out = hq.run(cq, parts, self.scheme, st, tc, self.k,
                             sort=self.sort or (), aggs=self.aggs_specs)
            if out is None:
                if host_eligible(cq, self.scheme, self.sort or (),
                                 self.aggs_specs, None):
                    or_cands.append((qi, cq))
                else:
                    rem.append(qi)
            else:
                results[qi] = out
        if or_cands:
            # batch economics: a device batch pays fixed launch+readback
            # overhead (~10-30ms over the tunnel) regardless of size; the
            # native TAAT scorer pays ~1-2ns/posting. Serve the WHOLE
            # pure-OR residue from ONE host crossing when its total
            # posting work is small (small/medium batches: cfg2 booleans,
            # mixed serving traffic); past the budget the device batch
            # amortizes better (the 1M-doc headline workload) and ALL of
            # it stays on device. Exactness either way: HostScorer
            # reproduces the engine's (score desc, docid asc) contract
            # in float64 (ops/host_scorer.py, parity-tested).
            budget = int(os.environ.get("XT_HOST_OR_BUDGET", "4000000"))
            total_work = sum(gtf(pt.term) for _qi, cq in or_cands
                             for pt in cq.terms)
            if total_work <= budget:
                hs = self.searcher.host_scorer()
                plans = []
                for _qi, cq in or_cands:
                    offs, lens = hs.offsets_lens(cq)
                    plans.append((offs, lens,
                                  term_constants(cq, self.scheme, st,
                                                 gtf, gcf)))
                outs = hs.search_many(plans, self.scheme, st, self.k)
                for (qi, _cq), out in zip(or_cands, outs):
                    results[qi] = out
            else:
                rem.extend(qi for qi, _cq in or_cands)
                rem.sort()
        return results, rem

    def _prefixify(self, cfg_g, stats):
        """Impact-prefix pruning for the pure relevance OR-of-terms shape:
        terms wider than prefix_cap read only their top-impact prefix
        (ops/executor.py prefix mode). Eligibility mirrors _chunkify -
        any predicate/sort/agg machinery needs the full row set."""
        if (cfg_g.tree != ("G", 0) or cfg_g.n_filters or cfg_g.geo_specs
                or cfg_g.phrases or cfg_g.sort
                or cfg_g.collapse_slot is not None or cfg_g.with_aggs
                or cfg_g.count_only or cfg_g.dense or cfg_g.join
                or cfg_g.unweighted or cfg_g.syn_groups or cfg_g.max_specs
                or cfg_g.emit_sort_keys or cfg_g.n_chunks > 1):
            return cfg_g
        if getattr(self.scheme, "needs_uniqterms", False):
            return cfg_g
        cap = self.prefix_cap
        prefix = tuple(cap if c > cap else 0
                       for c in cfg_g.term_classes())
        if not any(prefix):
            return cfg_g
        if not self.searcher.device_segment.ensure_impact(
                self.scheme, stats):
            return cfg_g   # scheme not impact-separable
        return replace(cfg_g, prefix=prefix,
                       verify_k=max(32, 2 * self.k))

    def _chunkify(self, cfg_g, bounds, idxs):
        """Docid-range chunking for wide single-group term trees (the
        dominant OR-of-terms serving shape): partition docid space into
        n_chunks ranges and sort each range independently at a tight
        host-computed width (np.searchsorted per term on the docid grid).
        lax.sort cost grows super-linearly with width (measured ~1.3x at
        150k rows -> 8x19k on v5e) and the tight widths also remove most
        of the pow2 size-class padding. Skew guard: skip when the chunked
        padded total exceeds the unchunked one (clustered postings)."""
        if (cfg_g.tree != ("G", 0) or cfg_g.n_filters or cfg_g.geo_specs
                or cfg_g.phrases or cfg_g.sort
                or cfg_g.collapse_slot is not None or cfg_g.with_aggs
                or cfg_g.count_only or cfg_g.dense or cfg_g.join
                or cfg_g.unweighted or cfg_g.syn_groups or cfg_g.max_specs
                or cfg_g.emit_sort_keys or cfg_g.prefix):
            return cfg_g
        if self.chunk_rows <= 0:
            return cfg_g
        R = sum(cfg_g.term_classes())
        # target >=chunk_rows rows per chunk (lax.sort width sweet spot
        # ~12-20k on v5e)
        nc = 1
        while nc < 16 and R // (nc * 2) >= self.chunk_rows:
            nc *= 2
        if nc <= 1:
            return cfg_g
        seg = self.searcher.segment
        nd = max(seg.doc_count, 1)
        bpoints = (np.arange(1, nc, dtype=np.int64) * nd) // nc
        T = cfg_g.T
        maxlens = np.zeros(T, np.int64)
        for i in idxs:
            arr = bounds[i].arrays
            offs = np.asarray(arr["offsets"])
            lens = np.asarray(arr["lens"])
            c_off = np.zeros((T, nc), np.int32)
            c_len = np.zeros((T, nc), np.int32)
            for t in range(offs.shape[0]):
                off, ln = int(offs[t]), int(lens[t])
                cuts = np.searchsorted(
                    seg.post_docids[off: off + ln], bpoints)
                edges = np.concatenate([[0], cuts, [ln]])
                c_off[t] = off + edges[:-1]
                c_len[t] = np.diff(edges)
            arr["c_offsets"] = c_off
            arr["c_lens"] = c_len
            maxlens = np.maximum(maxlens, c_len.max(axis=1))
        # tight per-term chunk widths on the 128-lane grid; one compile
        # per (group, widths) - reused across runs via the jit cache
        chunk_classes = tuple(
            int(-(-int(m) // 128) * 128) if m > 0 else 0 for m in maxlens)
        if not any(chunk_classes):
            return cfg_g
        if nc * sum(chunk_classes) > 1.3 * R:
            return cfg_g
        return replace(cfg_g, n_chunks=nc, chunk_classes=chunk_classes)

    def run(self, irs: list, stats=None) -> list[dict]:
        """Execute a mixed batch; returns per-query dicts in input order:
        {"docids": np[k], "scores": np[k], "count": int}. Conjunctive
        queries (AND trees + predicate leaves + flat aggs/value sort)
        route to the native host executor first - they are gather-bound
        on the device (ops/host_query.py); everything else is enqueued
        to the device before any readback (double-buffered over the
        tunnel)."""
        host_results, rem_idx = self._route_host(irs, stats)
        if not rem_idx:
            return [host_results[qi] for qi in range(len(irs))]
        if len(rem_idx) < len(irs):
            sub = self.run([irs[qi] for qi in rem_idx], stats=stats)
            for j, qi in enumerate(rem_idx):
                host_results[qi] = sub[j]
            return [host_results[qi] for qi in range(len(irs))]
        planned = self.plan(irs, stats=stats)
        seg_arrays = self.searcher.device_segment.arrays_pytree()
        from xapiand_tpu.models.weights import CollectionStats

        seg = self.searcher.segment
        st = stats or CollectionStats(doc_count=seg.doc_count,
                                      avg_doclen=seg.avg_doclen,
                                      doclen_lower=1.0,
                                      total_len=float(seg.total_doclen))
        # the FULL stat set: LM smoothing needs total_len, DFR schemes
        # doclen_upper - dropping them silently zeroes those scores
        stats_d = {"N": jnp.float32(st.doc_count),
                   "avg_doclen": jnp.float32(st.avg_doclen),
                   "doclen_lower": jnp.float32(st.doclen_lower),
                   "doclen_upper": jnp.float32(st.doclen_upper),
                   "total_len": jnp.float32(st.total_len)}
        pend = [(fn(seg_arrays, batch, stats_d), chunk)
                for _cfg, fn, batch, chunk in planned]
        results: list = [None] * len(irs)
        uncertified: list = []
        for out, chunk in pend:
            docids = np.asarray(out["docids"])
            scores = np.asarray(out["scores"])
            counts = np.asarray(out["count"])
            cert = np.asarray(out["certified"]) \
                if "certified" in out else None
            aggs = out.get("aggs")
            if aggs is not None:
                import jax

                aggs = jax.tree_util.tree_map(np.asarray, aggs)
            for row, qi in enumerate(chunk):
                if results[qi] is None:
                    if cert is not None and not bool(cert[row]):
                        results[qi] = False   # placeholder: exact re-run
                        uncertified.append(qi)
                        continue
                    results[qi] = {"docids": docids[row],
                                   "scores": scores[row],
                                   "count": int(counts[row])}
                    if aggs is not None:
                        import jax

                        results[qi]["aggs"] = jax.tree_util.tree_map(
                            lambda a: a[row], aggs)
        if uncertified:
            # the certificate failed (tight score gaps vs the unread-tail
            # bound, or a value-key tie plateau crossing the fullwidth
            # top_k window): re-run those queries through the exact path
            save, save_fw = self.prefix_cap, self._fullwidth
            self.prefix_cap, self._fullwidth = 0, False
            try:
                redo = self.run([irs[qi] for qi in uncertified],
                                stats=stats)
            finally:
                self.prefix_cap, self._fullwidth = save, save_fw
            for qi, res in zip(uncertified, redo):
                results[qi] = res
        return results


def _pow2_cover(n: int, lo: int) -> int:
    w = lo
    while w < n:
        w *= 2
    return w


def _pad_spec(arr, t):
    spec = [(0, t - arr.shape[0])]
    spec.extend((0, 0) for _ in range(arr.ndim - 1))
    return spec
