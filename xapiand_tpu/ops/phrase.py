"""Positional verification: PHRASE / NEAR leaves.

Reference parity target: src/xapian/matcher/phrasepostlist.cc,
exactphrasepostlist.cc, nearpostlist.cc. Instead of iterator-driven position
list merging, candidates (docs carrying all phrase terms) are compacted to a
static cap and their padded position windows are verified with broadcast
compares:

  PHRASE: exists p0 in pos[t0] with p0+i in pos[ti] for all i (exact phrase).
  NEAR:   exists p0 in pos[t0] with, for all i, some q_i in pos[ti],
          |q_i - p0| < window (window default = #terms, reference semantics
          approximated: the reference requires all positions within a span
          of `window`; this anchor-based check matches it for the default
          window and over-accepts slightly for wider windows).

Caps (documented deviations, tightened by raising the constants):
  - cfg.cand_cap candidate docs verified per query (docid-ascending);
  - cfg.pmax positions considered per (term, doc).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from xapiand_tpu.ops.executor import SENTINEL


def phrase_leaves(seg, plan, cfg, d, tail, orbits):
    """Row-wise verified bool array per phrase spec.

    d: sorted candidate docids per row; tail: end-of-run flag; orbits: OR of
    group bits per row (valid at tails)."""
    C = cfg.cand_cap
    L = cfg.L
    outs = []
    for (term_idxs, group_idxs, window, is_phrase) in cfg.phrases:
        allbits = 0
        for g in group_idxs:
            allbits |= (1 << g)
        has_all = (orbits & allbits) == allbits
        cand_ok = tail & has_all & (d != SENTINEL)
        # compact matching docids to the front (ascending docid)
        sort_d = jnp.where(cand_ok, d, SENTINEL)
        cand_d = lax.sort(sort_d)[:C]                      # [C]
        cand_valid = cand_d != SENTINEL

        pos_lists = []
        pos_valids = []
        for t in term_idxs:
            off = plan["offsets"][t]
            ln = plan["lens"][t]
            ids_t = lax.dynamic_slice(seg["post_docids"], (off,), (L,))
            # postings are docid-sorted within the span; pad rows hold the
            # dump docid which is > any real docid only if num_docs == pad...
            # make pads +inf for the search:
            ids_search = jnp.where(jnp.arange(L) < ln, ids_t, SENTINEL)
            j = jnp.searchsorted(ids_search, cand_d)       # [C]
            j = jnp.minimum(j, L - 1)
            found = (ids_search[j] == cand_d) & cand_valid
            slot = off + j
            poff = seg["post_posoff"][slot]
            plen = jnp.minimum(seg["post_poslen"][slot], cfg.pmax)

            def gather_pos(o):
                return lax.dynamic_slice(seg["positions"], (o,), (cfg.pmax,))

            pos = jax.vmap(gather_pos)(poff)               # [C, PMAX]
            pvalid = (jnp.arange(cfg.pmax)[None, :] < plen[:, None]) \
                & found[:, None]
            pos_lists.append(pos)
            pos_valids.append(pvalid)

        p0, v0 = pos_lists[0], pos_valids[0]
        if is_phrase:
            surv = v0
            for i in range(1, len(term_idxs)):
                pi, vi = pos_lists[i], pos_valids[i]
                # p0 + i present in pos_i ?
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

        # map verdict back to rows: binary search each row's docid in cand_d
        ridx = jnp.searchsorted(cand_d, d)
        ridx = jnp.minimum(ridx, C - 1)
        row_ok = (cand_d[ridx] == d) & verdict[ridx]
        outs.append(row_ok)
    return outs
