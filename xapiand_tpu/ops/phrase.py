"""Positional verification: PHRASE / NEAR leaves.

Reference parity target: src/xapian/matcher/phrasepostlist.cc,
exactphrasepostlist.cc, nearpostlist.cc. Instead of iterator-driven position
list merging, candidate docs (rows carrying all phrase terms) are compacted
to a static cap and their padded position windows are verified with
broadcast compares:

  PHRASE: exists p0 in pos[t0] with p0+i in pos[ti] for all i (exact phrase).
  NEAR:   exists p0 in pos[t0] with, for all i, some q_i in pos[ti],
          |q_i - p0| < window (anchor-based; matches the reference for the
          default window = #terms, slightly over-accepts for wider windows).

Caps (documented deviations, tightened by raising the constants):
  - cfg.cand_cap candidate docs verified per query (docid-ascending);
  - cfg.pmax positions considered per (term, doc).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from xapiand_tpu.ops.executor import SENTINEL, lower_bound_sorted


def phrase_leaves(seg, plan, cfg, ids_all, first, bits, pcarry=None):
    """Row-wise verified bool array per phrase spec.

    ids_all: [R] row docids (SENTINEL for padding); first: first-occurrence
    row flag; bits: per-row term-group bitmask; pcarry (cfg.phrase_carry):
    {term_idx: (posoff+1, poslen)} row-aligned channels OR-merged through
    the main docid sort - the per-term sort-joins below are then skipped
    entirely (their only job was recovering each candidate's position
    block)."""
    C = cfg.cand_cap
    classes = cfg.term_classes()
    outs = []
    for (term_idxs, group_idxs, window, is_phrase) in cfg.phrases:
        allbits = 0
        for g in group_idxs:
            allbits |= (1 << g)
        cand_ok = first & ((bits & allbits) == allbits)
        # compact matching docids to the front (ascending docid), carrying
        # each candidate's source ROW so verdicts scatter straight back
        rsrc = jnp.arange(ids_all.shape[0], dtype=jnp.int32)
        chans = (jnp.where(cand_ok, ids_all, SENTINEL), rsrc)
        if pcarry is not None:
            for t in term_idxs:
                chans = chans + pcarry[t]
        packed = lax.sort(chans, num_keys=1)
        cand_d, cand_src = packed[0][:C], packed[1][:C]
        cand_valid = cand_d != SENTINEL

        pos_lists = []
        pos_valids = []
        for ti, t in enumerate(term_idxs):
            if pcarry is not None:
                poff = packed[2 + 2 * ti][:C] - 1
                found = (poff >= 0) & cand_valid
                poff = jnp.maximum(poff, 0)
                plen = jnp.minimum(packed[3 + 2 * ti][:C], cfg.pmax)
            else:
                Lt = classes[t]
                off = plan["offsets"][t]
                ln = plan["lens"][t]
                ids_t = lax.dynamic_slice(seg["post_docids"], (off,), (Lt,))
                ids_t = jnp.where(jnp.arange(Lt) < ln, ids_t, SENTINEL)
                # cand_d is ascending (it comes out of a sort): sort-join
                # lower bound instead of serialized binary-search gathers
                j = lower_bound_sorted(ids_t, cand_d)
                jc = jnp.minimum(j, Lt - 1)
                found = (ids_t[jc] == cand_d) & cand_valid
                slot = off + jc
                poff = seg["post_posoff"][slot]
                plen = jnp.minimum(seg["post_poslen"][slot], cfg.pmax)

            # one flat gather instead of C dynamic_slices: vmapped
            # dynamic_slice serializes per slice on TPU (measured 11x
            # slower than a single gather at C=4096, PMAX=16)
            gidx = poff[:, None] + jnp.arange(cfg.pmax, dtype=poff.dtype)
            pos = seg["positions"][gidx]                   # [C, PMAX]
            pvalid = (jnp.arange(cfg.pmax)[None, :] < plen[:, None]) \
                & found[:, None]
            pos_lists.append(pos)
            pos_valids.append(pvalid)

        p0, v0 = pos_lists[0], pos_valids[0]
        if is_phrase:
            surv = v0
            for i in range(1, len(term_idxs)):
                pi, vi = pos_lists[i], pos_valids[i]
                hit = ((p0[:, :, None] + i) == pi[:, None, :]) \
                    & vi[:, None, :]
                surv = surv & hit.any(axis=2)
            verdict = surv.any(axis=1)
        else:
            ok_all = v0
            for i in range(1, len(term_idxs)):
                pi, vi = pos_lists[i], pos_valids[i]
                near = (jnp.abs(pi[:, None, :] - p0[:, :, None]) < window) \
                    & vi[:, None, :]
                ok_all = ok_all & near.any(axis=2)
            verdict = ok_all.any(axis=1)

        # verdicts are only consumed at first-occurrence rows (executor:
        # eligible = first & match), which is exactly where candidates
        # came from - scatter them back by source row instead of joining
        # against all R rows (the join's (C+R)-wide sorts were the single
        # most expensive stage of the whole phrase batch)
        row_ok = jnp.zeros(ids_all.shape[0], bool).at[
            jnp.where(cand_valid, cand_src, ids_all.shape[0])
        ].set(verdict & cand_valid, mode="drop")
        outs.append(row_ok)
    return outs
