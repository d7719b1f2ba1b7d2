"""Phrase-path breakdown on the real chip (config-2 shapes).

Separates the config-2 QPS into: boolean-only traffic, phrase-only
traffic, phrase traffic with positional verification stubbed out (=
sort+boolean base cost of the same shapes), and phrase traffic with
smaller pmax / cand_cap (gather-volume scaling). Pinpoints which stage
to attack - verdicts go to CLAUDE.md / PARITY.md.

Usage: python scripts/exp_phrase.py [--docs 100000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time  # noqa: F401

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from config_bench import (_enable_compile_cache, _timed_qps,  # noqa: E402
                          build_corpus2, queries2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    args = ap.parse_args()
    _enable_compile_cache()
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

    import jax.numpy as jnp

    import xapiand_tpu.ops.executor as executor_mod
    import xapiand_tpu.ops.phrase as phrase_mod
    from xapiand_tpu.database import Database
    from xapiand_tpu.query.dsl import QueryDSL
    from xapiand_tpu.search import BatchSearcher, SegmentSearcher

    docs = build_corpus2(args.docs)
    phrases, booleans = queries2(docs)
    db = Database()
    for i, d in enumerate(docs):
        db.index_document({"body": d}, doc_id=str(i))
    db.commit()
    seg = db._searchers[0].segment
    dsl = QueryDSL(db.schema)
    from config_bench import dsl_for
    ph_irs = [dsl.parse({"body": {"_phrase": f"{a} {b}"}})
              for a, b in phrases]
    bo_irs = [dsl.parse(dsl_for(kind, terms)) for kind, terms in booleans]
    searcher = SegmentSearcher(seg, db.scheme)

    def timed(irs, label):
        bs = BatchSearcher(searcher, k=10)
        qps = _timed_qps(bs, searcher, irs, seg)
        print(f"{label:18s} {qps:8.1f} qps", flush=True)
        return qps

    timed(ph_irs + bo_irs, "full")
    timed(bo_irs, "booleans-only")
    timed(ph_irs, "phrases-only")

    # positional carry A/B: channels through the main sort vs sort-joins
    os.environ["XT_PHRASE_CARRY"] = "1"
    try:
        sc = SegmentSearcher(seg, db.scheme)
        bs = BatchSearcher(sc, k=10)
        qps = _timed_qps(bs, sc, ph_irs, seg)
        print(f"{'phrases-carry':18s} {qps:8.1f} qps", flush=True)
        bs = BatchSearcher(sc, k=10)
        qps = _timed_qps(bs, sc, ph_irs + bo_irs, seg)
        print(f"{'full-carry':18s} {qps:8.1f} qps", flush=True)
    finally:
        os.environ["XT_PHRASE_CARRY"] = "0"

    # stub the positional stage: same compiled shapes minus verification
    real_leaves = phrase_mod.phrase_leaves

    def stub_leaves(seg_a, plan, cfg, ids_all, first, bits, pcarry=None):
        return [jnp.ones(ids_all.shape[0], bool) for _ in cfg.phrases]

    phrase_mod.phrase_leaves = stub_leaves   # executor imports it lazily
    _ = executor_mod
    try:
        s2 = SegmentSearcher(seg, db.scheme)   # fresh jit cache
        bs = BatchSearcher(s2, k=10)
        qps = _timed_qps(bs, s2, ph_irs, seg)
        print(f"{'phrases-stubbed':18s} {qps:8.1f} qps", flush=True)
    finally:
        phrase_mod.phrase_leaves = real_leaves

    # gather-volume scaling: force smaller pmax / cand_cap via plan hooks
    from dataclasses import replace as dc_replace

    for pmax in (4, 16):
        s3 = SegmentSearcher(seg, db.scheme)
        bs = BatchSearcher(s3, k=10)
        orig_plan = bs.plan

        def capped_plan(irs, stats=None, _orig=orig_plan, _pmax=pmax):
            out = _orig(irs, stats=stats)
            fixed = []
            for cfg, _fn, batch, chunk in out:
                cfg2 = dc_replace(cfg, pmax=min(cfg.pmax, _pmax),
                                  cand_cap=min(cfg.cand_cap, 1024))
                fixed.append((cfg2, s3.batched(cfg2, bs.scheme), batch,
                              chunk))
            return fixed

        bs.plan = capped_plan
        qps = _timed_qps(bs, s3, ph_irs, seg)
        print(f"phrases pmax={pmax:<3d} cap=1024 {qps:8.1f} qps "
              f"(UNSOUND caps - timing probe only)", flush=True)


if __name__ == "__main__":
    main()
