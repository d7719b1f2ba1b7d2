"""The match executor: candidate generation, merge, predicate, rank, top-k.

Replaces the reference's matcher hot loop (src/xapian/matcher/matcher.cc:
482-536 - postlist tree next()/get_weight()/ProtoMSet heap) with a fully
vectorised pipeline (see package docstring). Exactness guarantees:

- candidate set = union of all gathered posting spans, so every potentially
  matching doc is enumerated (no pruning approximations);
- per-doc score = sum of weight-scheme sumparts of its matching scoring
  terms (OP_AND/OR/AND_MAYBE semantics fall out of the predicate masking);
- ties broken by ascending docid (candidates are docid-sorted and lax.top_k
  prefers earlier indices on equal scores), matching the reference's
  docid-order ASCENDING default (src/database/handler.cc:1168).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import lax

SENTINEL = jnp.int32(2**31 - 1)


# --------------------------------------------------------------------------
# static plan configuration (jit cache key)
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class ExecConfig:
    T: int                       # padded number of terms
    L: int                       # posting-gather size class
    k: int                       # top-k
    tree: tuple                  # boolean tree over leaves (hashable nest)
    n_filters: int = 0
    filter_slots: tuple = ()     # slot per filter leaf
    geo_specs: tuple = ()        # (slot, QR, RMAX) per geo leaf
    sort: tuple = ()             # ((kind, slot, desc), ...); () = relevance
    collapse_slot: Optional[int] = None
    count_only: bool = False
    phrases: tuple = ()          # (term_idx_tuple, window, is_phrase) per phrase group
    pmax: int = 128              # positions gathered per (term, doc)
    cand_cap: int = 4096         # phrase-verified candidate cap
    with_aggs: tuple = ()        # static agg spec (see ops/aggs.py)
    dense: bool = False          # dense all-docs path (match_all root)


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

def _lex_ge(ah, al, bh, bl):
    """(ah,al) >= (bh,bl) lexicographic on signed int32 pairs."""
    return (ah > bh) | ((ah == bh) & (al >= bl))


def _lex_le(ah, al, bh, bl):
    return (ah < bh) | ((ah == bh) & (al <= bl))


def _segmented(vals, bits, head):
    """Segmented (sum, or) over runs delimited by head=True."""

    def comb(a, b):
        (va, ba, ha), (vb, bb, hb) = a, b
        v = vb + jnp.where(hb, 0.0, va)
        o = bb | jnp.where(hb, 0, ba)
        return v, o, ha | hb

    return lax.associative_scan(comb, (vals, bits, head))


def _eval_tree(tree, leaf_fns):
    """Compile the static boolean tree to a vectorised predicate.

    Node forms: ('G', i) term group leaf; ('F', i) value-filter leaf;
    ('GEO', i) geo leaf; ('ALL',); ('NONE',); ('AND', ...); ('OR', ...);
    ('AND_NOT', a, b); ('AND_MAYBE', a, b); ('XOR', a, b); ('FILTER', a, b).
    Mirrors the reference postlist operators (multiandpostlist.h etc.).
    """
    op = tree[0]
    if op in ("G", "F", "GEO", "PH"):
        return leaf_fns[op](tree[1])
    if op == "ALL":
        return leaf_fns["ALL"]()
    if op == "NONE":
        return jnp.zeros_like(leaf_fns["ALL"]())
    subs = [partial(_eval_tree, t, leaf_fns) for t in tree[1:]]
    if op == "AND" or op == "FILTER":
        out = subs[0]()
        for s in subs[1:]:
            out = out & s()
        return out
    if op == "OR":
        out = subs[0]()
        for s in subs[1:]:
            out = out | s()
        return out
    if op == "AND_NOT":
        return subs[0]() & ~subs[1]()
    if op == "AND_MAYBE":
        return subs[0]()
    if op == "XOR":
        return subs[0]() ^ subs[1]()
    raise ValueError(f"unknown tree op {op!r}")


def _gather_filter_leaves(seg, cfg: ExecConfig, fparams, docids):
    """Per-candidate value range filter results, one bool array per leaf.

    Range semantics on (possibly multi-value) slots: doc matches if its
    [min,max] key interval overlaps the query interval - exact for
    single-value slots (src/multivalue/range.h MultipleValueRange)."""
    outs = []
    for i in range(cfg.n_filters):
        slot = cfg.filter_slots[i]
        col = seg["values"][slot]
        d = jnp.minimum(docids, col["hi"].shape[0] - 1)
        vmin_h, vmin_l = col["hi"][d], col["lo"][d]
        vmax_h, vmax_l = col["max_hi"][d], col["max_lo"][d]
        present = col["present"][d]
        lo_h, lo_l, hi_h, hi_l = (fparams[i, 0], fparams[i, 1],
                                  fparams[i, 2], fparams[i, 3])
        ok = (present
              & _lex_ge(vmax_h, vmax_l, lo_h, lo_l)
              & _lex_le(vmin_h, vmin_l, hi_h, hi_l))
        outs.append(ok)
    return outs


def _gather_geo_leaves(seg, cfg: ExecConfig, geo_queries, docids):
    """Exact HTM range-intersection per candidate (GeoSpatialRange analog).

    Each doc's level-13 ranges (up to RMAX) are tested against the query's
    QR ranges with a broadcast overlap compare."""
    outs = []
    for gi, (slot, QR, RMAX) in enumerate(cfg.geo_specs):
        g = seg["geo"][slot]
        d = jnp.minimum(docids, g["doc_off"].shape[0] - 1)
        off = g["doc_off"][d]          # [C]
        cnt = g["doc_len"][d]          # [C]
        ridx = off[:, None] + jnp.arange(RMAX)[None, :]          # [C, RMAX]
        ridx = jnp.minimum(ridx, g["flat_start"].shape[0] - 1)
        rs = g["flat_start"][ridx]
        re = g["flat_end"][ridx]
        rvalid = jnp.arange(RMAX)[None, :] < cnt[:, None]
        q = geo_queries[gi]            # [QR, 2]
        qs, qe = q[:, 0], q[:, 1]
        qvalid = qs <= qe
        # [C, RMAX, QR]
        ov = ((rs[:, :, None] <= qe[None, None, :])
              & (re[:, :, None] >= qs[None, None, :])
              & rvalid[:, :, None] & qvalid[None, None, :])
        outs.append(ov.any(axis=(1, 2)))
    return outs


def _rank_and_topk(cfg: ExecConfig, seg, docids, scores, eligible):
    """Final ordering: relevance top-k or multi-key value sort.

    eligible: bool per candidate row (tail & match & not sentinel)."""
    if cfg.collapse_slot is not None:
        docids, scores, eligible = _collapse(cfg, seg, docids, scores, eligible)
    if not cfg.sort:
        masked = jnp.where(eligible, scores, -jnp.inf)
        top_scores, idx = lax.top_k(masked, cfg.k)
        return docids[idx], top_scores, idx
    # multi-key sort: build key arrays; ineligible rows sink to the end
    keys = []
    for kind, slot, desc in cfg.sort:
        if kind == "value":
            col = seg["values"][slot]
            d = jnp.minimum(docids, col["hi"].shape[0] - 1)
            h, l = col["hi"][d], col["lo"][d]
            if desc:
                h, l = ~h, ~l
            # missing values sort last (reference keymaker semantics)
            h = jnp.where(col["present"][d], h, jnp.int32(2**31 - 1))
            keys.extend([jnp.where(eligible, h, jnp.int32(2**31 - 1)),
                         jnp.where(eligible, l, jnp.int32(2**31 - 1))])
        elif kind == "score":
            sk = -scores if desc else scores
            keys.append(jnp.where(eligible, sk, jnp.inf))
    keys.append(jnp.where(eligible, docids, SENTINEL))  # final tiebreak
    order = lax.sort(tuple(keys) + (docids, scores),
                     num_keys=len(keys))
    out_d = order[-2][: cfg.k]
    out_s = order[-1][: cfg.k]
    # positions of the winners are unknown after sort; re-derive eligibility
    # by marking sunk rows with sentinel docid
    return out_d, out_s, None


def _collapse(cfg: ExecConfig, seg, docids, scores, eligible):
    """Keep only the best-scoring doc per collapse key
    (src/xapian/matcher/collapser.cc semantics, one level)."""
    col = seg["values"][cfg.collapse_slot]
    d = jnp.minimum(docids, col["hi"].shape[0] - 1)
    kh, kl = col["hi"][d], col["lo"][d]
    present = col["present"][d]
    # docs with no collapse key are never collapsed (reference behaviour:
    # collapser.cc treats empty keys as always-kept)
    grouped = present & eligible
    solo = ~grouped  # each of these is its own group
    gflag = solo.astype(jnp.int32)
    uniq = jnp.where(grouped, kl, docids)
    order = lax.sort(
        (gflag, jnp.where(grouped, kh, 0), uniq, -scores, docids, scores,
         eligible.astype(jnp.int32)),
        num_keys=4)
    ogf, okh, oku, _, od, osc, oel = order
    head = jnp.concatenate([
        jnp.ones((1,), bool),
        (ogf[1:] != ogf[:-1]) | (okh[1:] != okh[:-1]) | (oku[1:] != oku[:-1])])
    keep = head | (ogf > 0)
    return od, osc, (oel > 0) & keep


# --------------------------------------------------------------------------
# the executor
# --------------------------------------------------------------------------

def execute(seg: dict, plan: dict, cfg: ExecConfig, stats: dict,
            scheme) -> dict:
    """One query against one segment. All shapes static given cfg.

    seg: DeviceSegment.arrays_pytree()
    plan: {offsets i32[T], lens i32[T], tconst f32[T], scoring f32[T],
           group_bits i32[T], fparams i32[F,4], geo_queries [..],
           extra per phrase}
    stats: {N f32, avg_doclen f32, doclen_lower f32}
    Returns {docids i32[k], scores f32[k], count i32, ...}.
    """
    from xapiand_tpu.models.weights import CollectionStats

    cstats = CollectionStats(
        doc_count=stats["N"], avg_doclen=stats["avg_doclen"],
        doclen_lower=stats["doclen_lower"])

    if cfg.dense:
        return _execute_dense(seg, plan, cfg, cstats, scheme)

    T, L = cfg.T, cfg.L
    offsets, lens = plan["offsets"], plan["lens"]
    nd1 = seg["doclen"].shape[0]          # num_docs + 1 (dump row)

    def gather_term(off):
        ids = lax.dynamic_slice(seg["post_docids"], (off,), (L,))
        wdf = lax.dynamic_slice(seg["post_wdf"], (off,), (L,))
        return ids, wdf

    ids, wdf = jax.vmap(gather_term)(offsets)               # [T, L]
    valid = jnp.arange(L)[None, :] < lens[:, None]
    ids_c = jnp.minimum(ids, nd1 - 1)
    valid &= ~seg["deleted"][ids_c]
    doclen = seg["doclen"][ids_c]

    w = scheme.sumpart(wdf, doclen, plan["tconst"][:, None], cstats)
    w = jnp.where(valid, w * plan["scoring"][:, None], 0.0)
    bits = jnp.where(valid, plan["group_bits"][:, None], 0)
    ids_flat = jnp.where(valid, ids, SENTINEL).ravel()
    slots = (offsets[:, None] + jnp.arange(L)[None, :]).ravel()  # posting slot

    d, wv, bv, sl = lax.sort(
        (ids_flat, w.ravel(), bits.ravel(), slots), num_keys=1)

    head = jnp.concatenate([jnp.ones((1,), bool), d[1:] != d[:-1]])
    sums, orbits, _ = _segmented(wv, bv, head)
    tail = jnp.concatenate([d[1:] != d[:-1], jnp.ones((1,), bool)])

    d_cand = jnp.minimum(d, nd1 - 1)
    leaf_fns = {
        "G": lambda g: (orbits & (1 << g)) != 0,
        "ALL": lambda: jnp.ones_like(d, dtype=bool),
    }
    fres = _gather_filter_leaves(seg, cfg, plan.get("fparams"), d_cand) \
        if cfg.n_filters else []
    leaf_fns["F"] = lambda i: fres[i]
    gres = _gather_geo_leaves(seg, cfg, plan.get("geo_queries"), d_cand) \
        if cfg.geo_specs else []
    leaf_fns["GEO"] = lambda i: gres[i]

    if cfg.phrases:
        from xapiand_tpu.ops.phrase import phrase_leaves

        pres = phrase_leaves(seg, plan, cfg, d, tail, orbits)
        leaf_fns["PH"] = lambda i: pres[i]

    match = _eval_tree(cfg.tree, leaf_fns)

    eligible = tail & match & (d != SENTINEL)
    count = jnp.sum(eligible.astype(jnp.int32))
    out = {"count": count}
    if cfg.with_aggs:
        from xapiand_tpu.ops.aggs import compute_aggs

        out["aggs"] = compute_aggs(seg, cfg.with_aggs, d_cand, eligible,
                                   sums, plan)
    if not cfg.count_only:
        docids, scores, _ = _rank_and_topk(cfg, seg, d, sums, eligible)
        out["docids"] = docids
        out["scores"] = scores
    return out


def _execute_dense(seg, plan, cfg: ExecConfig, cstats, scheme):
    """Dense path for match-all roots (pure value/geo filters or sorts):
    operate on all docid rows, no posting gathers/sort needed."""
    nd1 = seg["doclen"].shape[0]
    d = jnp.arange(nd1, dtype=jnp.int32)
    live = (~seg["deleted"]) & (d < nd1 - 1)

    leaf_fns = {
        "G": lambda g: jnp.zeros_like(live),  # no term leaves on dense path
        "ALL": lambda: live,
    }
    fres = _gather_filter_leaves(seg, cfg, plan.get("fparams"), d) \
        if cfg.n_filters else []
    leaf_fns["F"] = lambda i: fres[i]
    gres = _gather_geo_leaves(seg, cfg, plan.get("geo_queries"), d) \
        if cfg.geo_specs else []
    leaf_fns["GEO"] = lambda i: gres[i]

    match = _eval_tree(cfg.tree, leaf_fns) & live
    scores = jnp.zeros_like(seg["doclen"])
    count = jnp.sum(match.astype(jnp.int32))
    out = {"count": count}
    if cfg.with_aggs:
        from xapiand_tpu.ops.aggs import compute_aggs

        out["aggs"] = compute_aggs(seg, cfg.with_aggs, d, match, scores, plan)
    if not cfg.count_only:
        docids, sc, _ = _rank_and_topk(cfg, seg, d, scores, match)
        out["docids"] = docids
        out["scores"] = sc
    return out
