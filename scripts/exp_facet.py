"""Faceted (config 3) breakdown experiment on the real chip.

Builds the 1M-doc faceted corpus ONCE, then times variants of the same
query batch to locate the remaining cost after eligible-row compaction:

  full        sort + aggs (the BASELINE.md config-3 row)
  count       no sort, no aggs (pure filter+score+topk path)
  sort-only   value sort, no aggs
  aggs-only   aggs, no sort

Usage: python scripts/exp_facet.py [--docs 1000000] [--variants all]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from config_bench import CFG3_AGGS, CFG3_SORT, build_corpus3, queries3  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--variants",
                    default="full,full-nocarry,count,sort,sort-nocarry,"
                            "aggs,aggs-nocarry")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
    import jax
    import jax.numpy as jnp
    import numpy as np

    # sick-tunnel probe: a tiny jit sort must return in seconds
    t0 = time.time()
    jax.block_until_ready(jnp.sort(jnp.arange(1024)[::-1]))
    print(f"[probe] tiny jit sort: {time.time() - t0:.1f}s", file=sys.stderr)

    from xapiand_tpu import aggregations as aggs_mod
    from xapiand_tpu.database import Database
    from xapiand_tpu.query.dsl import QueryDSL, parse_sort
    from xapiand_tpu.search import BatchSearcher, SegmentSearcher
    from config_bench import _timed_qps

    print(f"[build] {args.docs} docs...", file=sys.stderr)
    docs = build_corpus3(args.docs)
    queries = queries3()
    db = Database()
    t0 = time.time()
    for i, d in enumerate(docs):
        db.index_document(dict(d), doc_id=str(i))
    db.commit()
    print(f"[build] indexed in {time.time() - t0:.0f}s", file=sys.stderr)
    seg = db._searchers[0].segment
    dsl = QueryDSL(db.schema)
    irs = [dsl.parse(q) for q in queries]
    sort = parse_sort(db.schema, CFG3_SORT)
    names, specs, arrays, metas = aggs_mod.compile_for_segment(
        db.schema, seg, CFG3_AGGS)
    searcher = SegmentSearcher(seg, db.scheme)

    variants = {
        "full": dict(sort=sort, aggs=(specs, arrays)),
        "full-nocarry": dict(sort=sort, aggs=(specs, arrays), carry="0"),
        "count": dict(sort=None, aggs=None),
        "sort": dict(sort=sort, aggs=None),
        "sort-nocarry": dict(sort=sort, aggs=None, carry="0"),
        "aggs": dict(sort=None, aggs=(specs, arrays)),
        "aggs-nocarry": dict(sort=None, aggs=(specs, arrays), carry="0"),
    }
    for name in args.variants.split(","):
        kw = dict(variants[name.strip()])
        os.environ["XT_CARRY"] = kw.pop("carry", "1")
        bs = BatchSearcher(searcher, k=10, min_batch=64, work_ratio=2.0,
                           **kw)
        qps = _timed_qps(bs, searcher, irs, seg)
        print(f"{name:14s} {qps:8.1f} qps", flush=True)


if __name__ == "__main__":
    main()
