"""Geo+time (config 4) breakdown experiment on the real chip.

Variants isolate where the 250k geo+time QPS goes: the full AND(circle,
ts-range) query, circle-only, ts-only, count-only, and a sweep of the
compaction cap. Parity vs the brute-force oracle is config_bench's job;
this script times only (same _timed_qps loop).

Usage: python scripts/exp_geo.py [--docs 250000] [--variants all]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from config_bench import _timed_qps, build_corpus4, queries4  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=250_000)
    ap.add_argument("--variants", default="full,geo,ts,count")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    jax.block_until_ready(jnp.sort(jnp.arange(1024)[::-1]))
    print(f"[probe] tiny jit sort: {time.time() - t0:.1f}s", file=sys.stderr)

    from xapiand_tpu.database import Database
    from xapiand_tpu.query.dsl import QueryDSL
    from xapiand_tpu.search import BatchSearcher, SegmentSearcher

    print(f"[build] {args.docs} geotagged docs...", file=sys.stderr)
    docs = build_corpus4(args.docs)
    queries = queries4()
    db = Database()
    t0 = time.time()
    for i, d in enumerate(docs):
        db.index_document(dict(d), doc_id=str(i))
    db.commit()
    print(f"[build] indexed in {time.time() - t0:.0f}s", file=sys.stderr)
    seg = db._searchers[0].segment
    dsl = QueryDSL(db.schema)

    def ir_set(kind):
        out = []
        for q in queries:
            geo_q, ts_q = q["_and"]
            if kind == "geo":
                out.append(dsl.parse(geo_q))
            elif kind == "ts":
                out.append(dsl.parse(ts_q))
            else:
                out.append(dsl.parse(q))
        return out

    searcher = SegmentSearcher(seg, db.scheme)
    for name in args.variants.split(","):
        name = name.strip()
        kind = {"geo": "geo", "ts": "ts"}.get(name, "full")
        irs = ir_set(kind)
        if name == "count":
            from xapiand_tpu.query.plan import bind, compile_ir
            # count-only via cfg flag: emulate by k=1? keep simple: time
            # the same shape with k=1 (top-k cost is not the suspect)
            bs = BatchSearcher(searcher, k=1, min_batch=32)
        else:
            bs = BatchSearcher(searcher, k=10, min_batch=32)
        t0 = time.time()
        qps = _timed_qps(bs, searcher, irs, seg)
        print(f"{name:8s} {qps:8.1f} qps   (incl. warm {time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
