"""Break down single-query serving latency (VERDICT r3 weak #2).

The served product measured 1.16 QPS (p50 810ms) vs the reference's 488
QPS while the bench harness does 16k QPS. This script isolates where a
warm single `db.search` spends its time in-process on the real chip:
DSL parse, stats+resolve+compile_ir, per-segment bind, device launch
(enqueue), blocking readback, host merge.

Usage:
    python scripts/profile_serving.py [--docs 50000] [--segments 8]
        [--queries 64] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=50_000)
    ap.add_argument("--vocab", type=int, default=20_000)
    ap.add_argument("--segments", type=int, default=8)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--warm", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))

    import numpy as np

    from xapiand_tpu.database import Database
    from xapiand_tpu.utils.synth import build_synthetic_segment, sample_queries

    seg = build_synthetic_segment(args.docs, args.vocab, seed=7)
    queries = sample_queries(seg, args.warm, 3, seed=11)
    docs_tokens = [[] for _ in range(seg.num_docs)]
    for term, ti in seg.terms.items():
        ids = seg.post_docids[ti.offset: ti.offset + ti.length]
        wdf = seg.post_wdf[ti.offset: ti.offset + ti.length]
        for d, w in zip(ids, wdf):
            docs_tokens[int(d)].extend([term] * int(w))

    db = Database()
    t0 = time.time()
    per_seg = max(args.docs // max(args.segments, 1), 1)
    for i, toks in enumerate(docs_tokens):
        db.index_document({"body": " ".join(toks)}, doc_id=str(i))
        if (i + 1) % per_seg == 0:
            db.commit()
    db.commit()
    print(f"[prof] indexed {args.docs} docs in {time.time()-t0:.1f}s, "
          f"{len(db._searchers)} segments", file=sys.stderr)

    bodies = [{"_or": [{"body": t} for t in q]} for q in queries]

    t0 = time.time()
    for b in bodies:
        db.search(b, k=10)
    print(f"[prof] warm {len(bodies)} queries in {time.time()-t0:.1f}s",
          file=sys.stderr)

    # -- instrumented single-query loop --------------------------------------
    from xapiand_tpu.models.weights import get_scheme
    from xapiand_tpu.query.dsl import QueryDSL
    from xapiand_tpu.query.plan import bind, compile_ir, resolve_special
    import jax
    import jax.numpy as jnp

    scheme = db.scheme
    T = {"parse": 0.0, "plan": 0.0, "bind": 0.0, "launch": 0.0,
         "readback": 0.0, "merge": 0.0, "full": 0.0}
    n = 0
    lat = []
    for b in bodies[: args.queries]:
        tq = time.time()
        t = time.time()
        ir = QueryDSL(db.schema, term_expander=db.expand_prefix).parse(b)
        T["parse"] += time.time() - t

        t = time.time()
        stats = db.stats()
        ir2 = resolve_special(ir, scheme, stats, db.global_termfreq,
                              db.global_collfreq)
        cq = compile_ir(ir2, cost_fn=db.global_termfreq)
        stats_d = {"N": float(stats.doc_count),
                   "avg_doclen": float(stats.avg_doclen),
                   "doclen_lower": float(stats.doclen_lower),
                   "doclen_upper": float(stats.doclen_upper),
                   "total_len": float(stats.total_len)}
        T["plan"] += time.time() - t

        outs = []
        for searcher in db._searchers:
            t = time.time()
            bound = bind(cq, searcher.segment, scheme, stats,
                         global_tf=db.global_termfreq, k=10,
                         global_cf=db.global_collfreq)
            T["bind"] += time.time() - t
            t = time.time()
            fn = searcher._compiled(bound.cfg, scheme)
            plan_arrays = jax.tree.map(jnp.asarray, bound.arrays)
            stats_arrays = {k: jnp.float32(v) for k, v in stats_d.items()}
            out = fn(searcher.device_segment.arrays_pytree(), plan_arrays,
                     stats_arrays)
            T["launch"] += time.time() - t
            outs.append((searcher, out))
        t = time.time()
        outs = [(s, jax.tree.map(np.asarray, o)) for s, o in outs]
        T["readback"] += time.time() - t

        t = time.time()
        merged = []
        total = 0
        for seg_idx, (searcher, out) in enumerate(outs):
            total += int(out["count"])
            for sc, did in zip(out["scores"], out["docids"]):
                if sc == float("-inf") or did >= searcher.segment.num_docs:
                    continue
                merged.append((-float(sc), seg_idx, int(did)))
        merged.sort()
        T["merge"] += time.time() - t
        dt = time.time() - tq
        T["full"] += dt
        lat.append(dt * 1000)
        n += 1

    lat.sort()
    print(f"[prof] instrumented loop: {n} queries, "
          f"{len(db._searchers)} segments", file=sys.stderr)
    for kname, v in T.items():
        print(f"  {kname:9s} {v/n*1000:8.2f} ms/query", file=sys.stderr)
    print(f"  p50 {lat[n//2]:.1f}ms  p99 {lat[min(int(n*.99), n-1)]:.1f}ms",
          file=sys.stderr)

    # plain db.search end-to-end (the exact served path)
    t0 = time.time()
    for b in bodies[: args.queries]:
        db.search(b, k=10)
    dt = time.time() - t0
    print(f"[prof] db.search e2e: {dt/args.queries*1000:.2f} ms/query "
          f"({args.queries/dt:.1f} qps)", file=sys.stderr)

    # search_many at widths 1 and 8 (the batcher path)
    for w in (1, 8):
        batch = [bodies[i % len(bodies)] for i in range(w)]
        db.search_many(batch, k=10)   # warm this width
        t0 = time.time()
        reps = max(args.queries // w, 4)
        for r in range(reps):
            db.search_many([bodies[(r * w + j) % len(bodies)]
                            for j in range(w)], k=10)
        dt = time.time() - t0
        print(f"[prof] search_many w={w}: {dt/reps*1000:.2f} ms/call "
              f"({reps*w/dt:.1f} qps)", file=sys.stderr)


if __name__ == "__main__":
    main()
