"""Single-chip HBM capacity ceiling for the segment layout (VERDICT r4 #5).

Answers: how many docs of the headline corpus profile fit resident on one
TPU chip, what does each array family cost per doc, and how much scratch
does the standard batched query program add on top?  The 10M-doc / 8-chip
config-5 design (BASELINE.json) divides by this ceiling.

Method
- bytes/doc is STATIC: DeviceSegment uploads fixed-dtype arrays
  (models/segment.py:386) whose shapes follow from corpus statistics; we
  build real segments at several sizes with the bench generator
  (utils/synth.py, same Zipf profile as bench.py) and sum leaf nbytes.
- scratch is measured from the compiled program: jit(...).lower(...)
  .compile().memory_analysis() for the standard 3-term OR batch at the
  bench's launch width (argument/output/temp sizes in bytes).
- an actual upload at the largest size cross-checks the math against
  device memory_stats() when the backend exposes them.

Usage:
    python scripts/capacity_probe.py [--docs 1000000,2000000,4000000]
        [--batch 64] [--upload] [--cpu]

Reference scale anchor: the reference scales past one box by glass
multi-backend striping (xapian/backends/multi/); our per-chip ceiling is
the analogous shard-size bound over the ICI mesh (parallel/sharded_db.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def leaf_bytes(tree) -> int:
    import jax
    return sum(a.size * a.dtype.itemsize
               for a in jax.tree_util.tree_leaves(tree))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", default="250000,1000000,2000000")
    ap.add_argument("--vocab", type=int, default=5_000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--upload", action="store_true",
                    help="device_put the largest segment and read "
                         "memory_stats (slow over the tunnel)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from xapiand_tpu.models.weights import CollectionStats, get_scheme
    from xapiand_tpu.query.ir import Q
    from xapiand_tpu.search import BatchSearcher, SegmentSearcher
    from xapiand_tpu.utils.synth import build_synthetic_segment, sample_queries

    dev = jax.devices()[0]
    hbm_limit = None
    try:
        stats = dev.memory_stats()
        hbm_limit = int(stats.get("bytes_limit", 0)) or None
    except Exception:
        pass

    rows = []
    seg = searcher = None
    for nd in [int(x) for x in args.docs.split(",")]:
        t0 = time.time()
        seg = build_synthetic_segment(nd, args.vocab, seed=7)
        searcher = SegmentSearcher(seg, get_scheme("bm25"))
        # host-side mirror of exactly what DeviceSegment would upload:
        # enumerate the same arrays with the same dtypes, NO device_put
        P = len(seg.post_docids)
        base = {
            "postings (docids+wdf+doclen, 12B/posting)": P * 12,
            "positions index (posoff+poslen)": len(seg.post_posoff) * 4
            + len(seg.post_poslen) * 4,
            "positions payload": len(seg.positions) * 4,
            "per-doc (doclen+uniqterms+deleted, 9B/doc)":
                len(seg.doclen) * 4 + len(seg.doclen) * 4
                + len(seg.deleted) * 1,
        }
        # impact mirror doubles the posting core (prefix-pruning mode)
        impact = P * 12
        total = sum(base.values())
        rows.append({
            "docs": nd, "postings": P,
            "resident_bytes": total,
            "bytes_per_doc": round(total / nd, 1),
            "with_impact_mirror": total + impact,
            "bytes_per_doc_impact": round((total + impact) / nd, 1),
            "build_s": round(time.time() - t0, 1),
            "families": base,
        })
        print(json.dumps(rows[-1]), flush=True)

    # compiled-program scratch at the bench's standard shape (last size)
    queries = sample_queries(seg, args.batch, 3, seed=11)
    irs = [Q.or_terms(sorted(q, key=lambda t: -seg.terms[t].length))
           for q in queries]
    bs = BatchSearcher(searcher, k=10, max_batch=args.batch,
                       prefix_cap=int(os.environ.get("XT_PREFIX_CAP",
                                                     "8192")))
    st = CollectionStats(doc_count=seg.doc_count,
                         avg_doclen=seg.avg_doclen, doclen_lower=1.0)
    planned = bs.plan(irs, stats=st)
    stats_d = {"N": jnp.float32(st.doc_count),
               "avg_doclen": jnp.float32(st.avg_doclen),
               "doclen_lower": jnp.float32(1.0)}
    seg_tree = searcher.device_segment.arrays_pytree()
    scratch = []
    for cfg_g, fn, batch, _chunk in planned:
        lowered = fn.lower(seg_tree, batch, stats_d)
        comp = lowered.compile()
        try:
            ma = comp.memory_analysis()
            scratch.append({
                "width": int(batch["offsets"].shape[0]),
                "temp_bytes": int(ma.temp_size_in_bytes),
                "output_bytes": int(ma.output_size_in_bytes),
                "argument_bytes": int(ma.argument_size_in_bytes),
            })
        except Exception as e:  # backend without memory_analysis
            scratch.append({"width": int(batch["offsets"].shape[0]),
                            "error": str(e)})
        print(json.dumps(scratch[-1]), flush=True)

    out = {"metric": "hbm_capacity", "hbm_bytes_limit": hbm_limit,
           "rows": rows, "scratch": scratch}
    if hbm_limit:
        bpd = rows[-1]["bytes_per_doc_impact"]
        tmp = max((s.get("temp_bytes", 0) for s in scratch), default=0)
        out["max_resident_docs_16g"] = int((hbm_limit - tmp) // bpd)
    if args.upload:
        jax.block_until_ready(seg_tree["post_docids"])
        try:
            ms = dev.memory_stats()
            out["device_bytes_in_use_after_upload"] = int(
                ms.get("bytes_in_use", 0))
        except Exception:
            pass
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
