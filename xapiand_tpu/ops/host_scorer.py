"""Host latency-path scorer: native TAAT top-k over flat segment arrays.

The serving plane's answer to the device tunnel's readback floor: a LONE
plain-relevance query pays ~9ms of host<->TPU sync (scripts/tunnel_probe.py)
before any compute, while the reference serves p50 15ms end-to-end from a
single CPU core. Small plain BM25 queries therefore execute host-side in
native code (native.cpp xt_score_topk: float64 TAAT accumulation + heap
top-k), exactly matching the float64 numpy oracle (bench.py cpu_baseline)
and hence the device path's rank contract (score desc, docid asc ties).
Batches and heavy operators (filters, geo, phrases, sorts, aggs) keep the
device path, where width amortizes the tunnel and the MXU/VPU win.

~ the reference's matcher hot loop
(/root/reference/src/xapian/matcher/matcher.cc:179-560), re-architected
TAAT-over-flat-slabs instead of a DAAT iterator tree; the split itself
(latency path on host, throughput path on accelerator) has no reference
analog - it is the TPU-native serving design.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

from xapiand_tpu.models.weights import BM25

_i32p = ctypes.POINTER(ctypes.c_int32)
_i64p = ctypes.POINTER(ctypes.c_int64)
_f32p = ctypes.POINTER(ctypes.c_float)
_f64p = ctypes.POINTER(ctypes.c_double)
_u8p = ctypes.POINTER(ctypes.c_uint8)
_NULL_U8 = ctypes.cast(None, _u8p)


def host_path_enabled() -> bool:
    return os.environ.get("XT_HOST_PATH", "1") != "0"


def host_eligible(cq, scheme, sort=(), aggs=None, collapse_slot=None) -> bool:
    """True when the compiled query is a plain term-union that the native
    scorer serves exactly: no predicate/positional machinery, no
    sort/agg/collapse consumers, BM25 (the serving default) with k2=0
    (no sumextra term)."""
    return (not sort and not aggs and collapse_slot is None
            and type(scheme) is BM25 and scheme.k2 == 0
            and _pure_or(cq.tree)
            and not cq.filters and not cq.geo and not cq.phrases
            and not cq.synonyms and not cq.max_specs and not cq.dense
            and len(cq.terms) > 0
            and any(pt.scoring for pt in cq.terms))


def _pure_or(tree) -> bool:
    """A tree whose matches are exactly the union of all term postings:
    a single group leaf, or an OR of group leaves (the query-DSL compiles
    {"_or": [...]} to one group per child)."""
    if tree[0] == "G":
        return True
    return tree[0] == "OR" and all(
        isinstance(c, tuple) and c[0] == "G" for c in tree[1:])


def term_constants(cq, scheme, stats, gtf, gcf) -> np.ndarray:
    """Float64 per-term constants - global stats, shared by every
    segment of the database (two-phase stat merge, handler.cc:1532)."""
    T = len(cq.terms)
    tc = np.zeros(T, np.float64)
    for i, pt in enumerate(cq.terms):
        if not pt.scoring:
            continue
        tf = gtf(pt.term)
        if tf > 0:
            tc[i] = scheme.term_constant(stats, tf, pt.wqf, pt.factor,
                                         collfreq=gcf(pt.term))
    return tc


class HostScorer:
    """One per SegmentSearcher; owns the scratch accumulators and the
    pre-resolved ctypes pointers into the segment's posting arrays."""

    def __init__(self, segment):
        import threading

        # scratch accumulators are shared per scorer and the native call
        # releases the GIL: concurrent pool readers must serialize
        self._lock = threading.Lock()
        self.seg = segment
        self._docids = np.ascontiguousarray(segment.post_docids, np.int32)
        self._wdf = np.ascontiguousarray(segment.post_wdf, np.float32)
        self._doclen = np.ascontiguousarray(segment.post_doclen, np.float32)
        nd = max(int(segment.num_docs), 1)
        self._acc = np.zeros(nd, np.float64)
        self._seen = np.zeros(nd, np.uint8)
        self._touched = np.zeros(nd, np.int32)
        self._p_docids = self._docids.ctypes.data_as(_i32p)
        self._p_wdf = self._wdf.ctypes.data_as(_f32p)
        self._p_doclen = self._doclen.ctypes.data_as(_f32p)
        self._p_acc = self._acc.ctypes.data_as(_f64p)
        self._p_seen = self._seen.ctypes.data_as(_u8p)
        self._p_touched = self._touched.ctypes.data_as(_i32p)
        self._deleted_u8: Optional[np.ndarray] = None

    def offsets_lens(self, cq):
        """This segment's (offsets, lens) for the query's terms."""
        T = len(cq.terms)
        offs = np.zeros(T, np.int64)
        lens = np.zeros(T, np.int64)
        get = self.seg.get_term
        for i, pt in enumerate(cq.terms):
            ti = get(pt.term)
            if ti is not None:
                offs[i], lens[i] = ti.offset, ti.length
        return offs, lens

    def _deleted(self):
        """uint8 view of the delete bitmap (zero-copy when bool-typed;
        delete_document flips entries on the immutable segment)."""
        d = self.seg.deleted
        if not d[: self.seg.num_docs].any():
            return None, 0
        if d.dtype == np.bool_ and d.flags["C_CONTIGUOUS"]:
            return d.view(np.uint8), 1
        self._deleted_u8 = np.ascontiguousarray(d, np.uint8)
        return self._deleted_u8, 1

    @staticmethod
    def _params(scheme, stats):
        avg = float(stats.avg_doclen)
        lf = 0.0
        if avg > 0 and not (scheme.k2 == 0
                            and (scheme.b == 0 or scheme.k1 == 0)):
            lf = 1.0 / max(avg, 1e-9)
        return scheme.k1, scheme.b, scheme.min_normlen, lf

    def search_many(self, plans, scheme, stats, k: int) -> list[dict]:
        """plans: list of (offsets, lens, tconst) per query (offsets/lens
        from offsets_lens(), tconst from term_constants()).
        -> per-query {"docids": i32[k], "scores": f64[k], "count": int}
        with -inf score padding, same shape contract as the device out."""
        from xapiand_tpu.native import lib

        nq = len(plans)
        k = max(int(k), 1)
        out_d = np.empty((nq, k), np.int32)
        out_s = np.empty((nq, k), np.float64)
        counts = np.empty(nq, np.int64)
        k1, b, mn, lf = self._params(scheme, stats)
        deleted, has_del = self._deleted()
        if lib is not None and nq == 1:
            with self._lock:
                offs, lens, tcs = plans[0]
                counts[0] = lib._c.xt_score_topk(
                    self._p_docids, self._p_wdf, self._p_doclen,
                    deleted.ctypes.data_as(_u8p) if has_del else _NULL_U8,
                    has_del,
                    offs.ctypes.data_as(_i64p), lens.ctypes.data_as(_i64p),
                    tcs.ctypes.data_as(_f64p), len(offs),
                    k1, b, mn, lf,
                    self._p_acc, self._p_seen, self._p_touched,
                    k, out_d.ctypes.data_as(_i32p),
                    out_s.ctypes.data_as(_f64p))
        elif lib is not None:
            flat_off = np.concatenate([p[0] for p in plans])
            flat_len = np.concatenate([p[1] for p in plans])
            flat_tc = np.concatenate([p[2] for p in plans])
            q_start = np.zeros(nq, np.int32)
            q_nterms = np.zeros(nq, np.int32)
            s = 0
            for i, p in enumerate(plans):
                q_start[i], q_nterms[i] = s, len(p[0])
                s += len(p[0])
            with self._lock:
                lib._c.xt_score_topk_many(
                    self._p_docids, self._p_wdf, self._p_doclen,
                    deleted.ctypes.data_as(_u8p) if has_del else _NULL_U8,
                    has_del,
                    flat_off.ctypes.data_as(_i64p),
                    flat_len.ctypes.data_as(_i64p),
                    flat_tc.ctypes.data_as(_f64p),
                    q_start.ctypes.data_as(_i32p),
                    q_nterms.ctypes.data_as(_i32p),
                    nq, k1, b, mn, lf,
                    self._p_acc, self._p_seen, self._p_touched,
                    k, out_d.ctypes.data_as(_i32p),
                    out_s.ctypes.data_as(_f64p),
                    counts.ctypes.data_as(_i64p))
        else:   # pure-numpy fallback (no toolchain): bincount TAAT
            nd = max(int(self.seg.num_docs), 1)
            for qi, (offs, lens, tcs) in enumerate(plans):
                scores = np.zeros(nd, np.float64)
                seen = np.zeros(nd, bool)
                for off, ln, tc in zip(offs, lens, tcs):
                    if ln <= 0:
                        continue
                    ids = self._docids[off: off + ln]
                    if has_del:
                        live = deleted[ids] == 0
                        ids = ids[live]
                    else:
                        live = slice(None)
                    seen[ids] = True
                    if tc != 0.0:
                        wdf = self._wdf[off: off + ln][live].astype(
                            np.float64)
                        normlen = np.maximum(
                            self._doclen[off: off + ln][live].astype(
                                np.float64) * lf, mn)
                        w = tc * (wdf / np.maximum(
                            k1 * (normlen * b + (1.0 - b)) + wdf, 1e-9))
                        scores += np.bincount(ids, weights=w, minlength=nd)
                cand = np.flatnonzero(seen)
                counts[qi] = len(cand)
                order = np.lexsort((cand, -scores[cand]))[:k]
                out_d[qi, : len(order)] = cand[order]
                out_s[qi, : len(order)] = scores[cand][order]
        results = []
        for qi in range(nq):
            n = min(int(counts[qi]), k)
            s = out_s[qi]
            s[n:] = -np.inf
            results.append({"docids": out_d[qi], "scores": s,
                            "count": int(counts[qi])})
        return results

    def search(self, plan, scheme, stats, k: int) -> dict:
        return self.search_many([plan], scheme, stats, k)[0]


class GlobalHostScorer:
    """Whole-database latency path: ONE native crossing scores a query
    (or small batch) across every segment and returns the globally merged
    top-k with the engine's exact order contract (score desc, then
    (segment, docid) insertion order - Database._tiebreak). Removes the
    per-segment python/ctypes overhead that dominates multi-segment
    single-query latency."""

    def __init__(self, searchers):
        import threading

        # shared scratch + GIL-free native call: serialize (see HostScorer)
        self._lock = threading.Lock()
        self.searchers = list(searchers)
        self.segs = [s.segment for s in self.searchers]
        self._per = [s.host_scorer() for s in self.searchers]
        S = len(self._per)
        self._docids_ptrs = np.array(
            [hs._docids.ctypes.data for hs in self._per], np.int64)
        self._wdf_ptrs = np.array(
            [hs._wdf.ctypes.data for hs in self._per], np.int64)
        self._doclen_ptrs = np.array(
            [hs._doclen.ctypes.data for hs in self._per], np.int64)
        # deleted pointers resolved at build time; Database invalidates
        # this scorer on every delete (see delete_document)
        self._del_keep = []
        dptr = np.zeros(S, np.int64)
        for i, hs in enumerate(self._per):
            darr, has = hs._deleted()
            if has:
                self._del_keep.append(darr)
                dptr[i] = darr.ctypes.data
        self._deleted_ptrs = dptr
        nd = max(max((int(s.num_docs) for s in self.segs), default=1), 1)
        self._acc = np.zeros(nd, np.float64)
        self._seen = np.zeros(nd, np.uint8)
        self._touched = np.zeros(nd, np.int32)

    def plan_terms(self, cq):
        """Per-segment (offsets, lens) matrices [S, T] for this query's
        terms - the cacheable half of a search_many call (the term
        dictionary lookups; everything else is per-call scratch)."""
        S = len(self.segs)
        T = len(cq.terms)
        offs = np.zeros((S, T), np.int64)
        lens = np.zeros((S, T), np.int64)
        for col, pt in enumerate(cq.terms):
            for si, seg in enumerate(self.segs):
                ti = seg.get_term(pt.term)
                if ti is not None:
                    offs[si, col] = ti.offset
                    lens[si, col] = ti.length
        return offs, lens

    def search_planned(self, cq, tc, offs, lens, scheme, stats,
                       k: int) -> dict:
        """Single-query hot path over a cached plan (plan_terms + term
        constants): ONE native crossing, zero term-dictionary work."""
        from xapiand_tpu.native import lib

        S = len(self.segs)
        if lib is None or S == 0:
            return self._fallback([cq], [tc], scheme, stats, k)[0]
        k = max(int(k), 1)
        T = offs.shape[1]
        q_start = np.zeros(1, np.int32)
        q_nterms = np.full(1, T, np.int32)
        out_seg = np.empty((1, k), np.int32)
        out_d = np.empty((1, k), np.int32)
        out_s = np.empty((1, k), np.float64)
        counts = np.empty(1, np.int64)
        k1, b, mn, lf = HostScorer._params(scheme, stats)
        with self._lock:
            lib._c.xt_score_topk_global(
            S,
            self._docids_ptrs.ctypes.data_as(_i64p),
            self._wdf_ptrs.ctypes.data_as(_i64p),
            self._doclen_ptrs.ctypes.data_as(_i64p),
            self._deleted_ptrs.ctypes.data_as(_i64p),
            offs.ctypes.data_as(_i64p), lens.ctypes.data_as(_i64p),
            tc.ctypes.data_as(_f64p), T,
            q_start.ctypes.data_as(_i32p), q_nterms.ctypes.data_as(_i32p),
            1, k1, b, mn, lf,
            self._acc.ctypes.data_as(_f64p),
            self._seen.ctypes.data_as(_u8p),
            self._touched.ctypes.data_as(_i32p),
            k, out_seg.ctypes.data_as(_i32p), out_d.ctypes.data_as(_i32p),
            out_s.ctypes.data_as(_f64p),
            counts.ctypes.data_as(_i64p))
        n = min(int(counts[0]), k)
        s = out_s[0]
        s[n:] = -np.inf
        return {"seg": out_seg[0], "docids": out_d[0], "scores": s,
                "count": int(counts[0])}

    def search_many(self, cqs, tconsts, scheme, stats, k: int) -> list[dict]:
        """-> per-query {"seg": i32[k], "docids": i32[k], "scores": f64[k],
        "count": int}; rows beyond the match count carry -inf scores."""
        from xapiand_tpu.native import lib

        S = len(self.segs)
        nq = len(cqs)
        k = max(int(k), 1)
        if lib is None or S == 0:
            return self._fallback(cqs, tconsts, scheme, stats, k)
        total_terms = sum(len(cq.terms) for cq in cqs)
        offs = np.zeros((S, total_terms), np.int64)
        lens = np.zeros((S, total_terms), np.int64)
        q_start = np.zeros(nq, np.int32)
        q_nterms = np.zeros(nq, np.int32)
        col = 0
        for qi, cq in enumerate(cqs):
            q_start[qi], q_nterms[qi] = col, len(cq.terms)
            for pt in cq.terms:
                for si, seg in enumerate(self.segs):
                    ti = seg.get_term(pt.term)
                    if ti is not None:
                        offs[si, col] = ti.offset
                        lens[si, col] = ti.length
                col += 1
        tc_flat = np.concatenate(tconsts) if nq > 1 else tconsts[0]
        tc_flat = np.ascontiguousarray(tc_flat, np.float64)
        out_seg = np.empty((nq, k), np.int32)
        out_d = np.empty((nq, k), np.int32)
        out_s = np.empty((nq, k), np.float64)
        counts = np.empty(nq, np.int64)
        k1, b, mn, lf = HostScorer._params(scheme, stats)
        with self._lock:
            lib._c.xt_score_topk_global(
            S,
            self._docids_ptrs.ctypes.data_as(_i64p),
            self._wdf_ptrs.ctypes.data_as(_i64p),
            self._doclen_ptrs.ctypes.data_as(_i64p),
            self._deleted_ptrs.ctypes.data_as(_i64p),
            offs.ctypes.data_as(_i64p), lens.ctypes.data_as(_i64p),
            tc_flat.ctypes.data_as(_f64p), total_terms,
            q_start.ctypes.data_as(_i32p), q_nterms.ctypes.data_as(_i32p),
            nq, k1, b, mn, lf,
            self._acc.ctypes.data_as(_f64p),
            self._seen.ctypes.data_as(_u8p),
            self._touched.ctypes.data_as(_i32p),
            k, out_seg.ctypes.data_as(_i32p), out_d.ctypes.data_as(_i32p),
            out_s.ctypes.data_as(_f64p),
            counts.ctypes.data_as(_i64p))
        results = []
        for qi in range(nq):
            n = min(int(counts[qi]), k)
            s = out_s[qi]
            s[n:] = -np.inf
            results.append({"seg": out_seg[qi], "docids": out_d[qi],
                            "scores": s, "count": int(counts[qi])})
        return results

    def _fallback(self, cqs, tconsts, scheme, stats, k: int) -> list[dict]:
        """Per-segment numpy scorers + python merge (no native lib)."""
        per_seg = []
        for hs in self._per:
            plans = [hs.offsets_lens(cq) + (tconsts[qi],)
                     for qi, cq in enumerate(cqs)]
            per_seg.append(hs.search_many(plans, scheme, stats, k))
        results = []
        for qi in range(len(cqs)):
            merged = []
            total = 0
            for si, outs in enumerate(per_seg):
                out = outs[qi]
                total += out["count"]
                for sc, did in zip(out["scores"], out["docids"]):
                    if sc != -np.inf:
                        merged.append((-float(sc), si, int(did)))
            merged.sort()
            merged = merged[:k]
            out_seg = np.full(k, -1, np.int32)
            out_d = np.zeros(k, np.int32)
            out_s = np.full(k, -np.inf, np.float64)
            for i, (negs, si, did) in enumerate(merged):
                out_seg[i], out_d[i], out_s[i] = si, did, -negs
            results.append({"seg": out_seg, "docids": out_d,
                            "scores": out_s, "count": total})
        return results
