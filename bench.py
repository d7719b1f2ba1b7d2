"""Benchmark: BM25 top-10 QPS on a 1M-doc synthetic corpus, single chip.

BASELINE.md primary metric: "QPS/chip at BM25 recall@10 parity on 1M docs".
The reference publishes no numbers (docs/_docs/benchmarks.md is empty), so
``vs_baseline`` is measured against a single-core vectorised numpy CPU
scorer over the identical corpus + queries (stand-in for the CPU reference
run until a pinned Xapian build is benchmarked; see BASELINE.md methodology).
Rank parity between device and baseline is asserted on a sample before
timing - speed without recall parity doesn't count.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMALL = os.environ.get("BENCH_SMALL") == "1"
N_DOCS = 50_000 if SMALL else 1_000_000
VOCAB = 20_000 if SMALL else 200_000
N_QUERIES = 512 if SMALL else 1024
BATCH = 256   # wide batches amortize per-launch dispatch (~2ms tunneled)
TERMS_PER_QUERY = 3
K = 10
K1, B, MIN_NORMLEN = 1.0, 0.5, 0.5


def cpu_baseline(seg, query_terms, k=K):
    """Single-core vectorised numpy BM25 top-k (dense accumulator)."""
    nd = seg.num_docs
    doclen = seg.doclen[:nd].astype(np.float64)
    avg = seg.total_doclen / nd
    lf = 1.0 / avg
    results = []
    for terms in query_terms:
        scores = np.zeros(nd, dtype=np.float64)
        for t in terms:
            ti = seg.terms.get(t)
            if ti is None or ti.length == 0:
                continue
            ids = seg.post_docids[ti.offset: ti.offset + ti.length]
            wdf = seg.post_wdf[ti.offset: ti.offset + ti.length].astype(np.float64)
            n = ti.length
            tw = (nd - n + 0.5) / (n + 0.5)
            if tw < 2.0:
                tw = tw * 0.5 + 1.0
            tw = np.log(tw) * 2.0 * (K1 + 1.0) / 2.0  # k3 factor with wqf=1 -> 1
            normlen = np.maximum(doclen[ids] * lf, MIN_NORMLEN)
            w = tw * (wdf / (K1 * (normlen * B + (1 - B)) + wdf))
            np.add.at(scores, ids, w)
        # top-k with exact tie-break: score desc, docid asc (Xapian
        # docid_order ASCENDING) - argpartition alone drops ties arbitrarily
        cand = np.argpartition(-scores, min(4 * k, nd - 1))[: 4 * k]
        order = np.lexsort((cand, -scores[cand]))
        top = cand[order][:k]
        results.append([(int(d), float(scores[d])) for d in top
                        if scores[d] > 0.0])
    return results


def log(msg):
    import time as _t
    print(f"[bench {_t.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def _probe_device_or_fallback():
    """The axon-tunneled chip can be unreachable (known hazard: a sick
    tunnel hangs the first device op indefinitely). Probe it from a
    SUBPROCESS with a timeout; on failure re-exec onto CPU so the bench
    still produces its JSON artifact (platform is recorded in detail)."""
    import subprocess

    if os.environ.get("JAX_PLATFORMS") == "cpu" or \
            os.environ.get("BENCH_NO_PROBE") == "1" or \
            not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "jax.block_until_ready(jnp.sort(jnp.arange(256)[::-1]));"
             "print('ok')"],
            capture_output=True, timeout=240, check=False)
        ok = r.returncode == 0 and b"ok" in r.stdout
    except subprocess.TimeoutExpired:
        ok = False
    if ok:
        return
    log("DEVICE PROBE FAILED - falling back to CPU so the bench artifact "
        "still lands (tunnel down)")
    env = dict(os.environ, JAX_PLATFORMS="cpu", BENCH_NO_PROBE="1")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def main():
    _probe_device_or_fallback()
    import jax
    import jax.numpy as jnp

    # persistent XLA compile cache: the three group shapes take minutes to
    # compile at the 1M scale; cached executables make reruns start hot
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from xapiand_tpu.models.weights import CollectionStats, get_scheme
    from xapiand_tpu.query.ir import Q
    from xapiand_tpu.query.plan import bind, compile_ir
    from xapiand_tpu.search import SegmentSearcher
    from xapiand_tpu.utils.synth import build_synthetic_segment, sample_queries

    t0 = time.time()
    seg = build_synthetic_segment(N_DOCS, VOCAB, seed=7)
    queries = sample_queries(seg, N_QUERIES, TERMS_PER_QUERY, seed=11)
    build_s = time.time() - t0
    log(f"corpus built in {build_s:.1f}s")

    scheme = get_scheme("bm25")
    stats = CollectionStats(doc_count=seg.doc_count,
                            avg_doclen=seg.avg_doclen, doclen_lower=1.0)
    stats_d = {"N": jnp.float32(stats.doc_count),
               "avg_doclen": jnp.float32(stats.avg_doclen),
               "doclen_lower": jnp.float32(1.0)}

    searcher = SegmentSearcher(seg, scheme)
    seg_arrays = searcher.device_segment.arrays_pytree()
    log("segment uploaded")

    # terms sorted by df desc so per-position size classes align across
    # queries; the library's BatchSearcher owns the shape bucketing
    # (signature -> size-class terciles -> equal-work batch widths), so the
    # benchmark now drives the same code path real mixed traffic uses
    queries = [sorted(q, key=lambda t: -seg.terms[t].length)
               for q in queries]
    from xapiand_tpu.search import BatchSearcher

    # default ON at 8192: chip A/B (2026-08-18, /tmp/chipq) measured
    # cap=8192 -> 16,532 QPS (66.8x ref) with 34/1024 certificate
    # re-runs; cap=16384 -> 13,726 (17/1024); cap=0 -> 11,247.
    PREFIX_CAP = int(os.environ.get("XT_PREFIX_CAP", "8192"))
    bsearch = BatchSearcher(
        searcher, k=K, max_batch=BATCH,
        chunk_rows=int(os.environ.get("BENCH_CHUNK_ROWS", "0")),
        prefix_cap=PREFIX_CAP)
    irs = [Q.or_terms(q) for q in queries]
    planned = bsearch.plan(irs, stats=stats)
    if PREFIX_CAP:
        seg_arrays = searcher.device_segment.arrays_pytree()  # + imp.*
    batches = [(cfg_g, fn, batch, chunk)
               for cfg_g, fn, batch, chunk in planned]
    group_shapes = {}
    for cfg_g, _fn, batch, chunk in batches:
        key = str(max(cfg_g.classes))
        info = group_shapes.setdefault(
            key, {"classes": list(cfg_g.classes), "width": 0, "n": 0})
        info["width"] = max(info["width"], int(batch["offsets"].shape[0]))
        info["n"] += len(set(chunk))
    log("binding done; groups=" + str(group_shapes))

    # warmup / compile every distinct (classes, batch-width) shape
    t0 = time.time()
    warmed = set()
    out0 = None
    for cfg_g, fn, batch, chunk in batches:
        skey = (cfg_g.classes, batch["offsets"].shape[0])
        if skey not in warmed:
            warmed.add(skey)
            o = fn(seg_arrays, batch, stats_d)
            jax.block_until_ready(o)
            if out0 is None:
                out0, chunk0 = o, chunk
    log(f"compile+warmup ({len(warmed)} shapes) {time.time()-t0:.1f}s")

    # recall parity vs the CPU baseline on a sample (BASELINE.md gate)
    if PREFIX_CAP:
        # prefix mode: merge certified rows with exact re-runs of the
        # uncertified ones, gate parity on the MERGED results, and time
        # the full pipeline (prefix launches + fallback launches) so the
        # reported QPS is end-to-end honest
        merged: dict = {}
        uncert: list = []
        for cfg_g, fn, batch, chunk in batches:
            o = fn(seg_arrays, batch, stats_d)
            dv, sv = np.asarray(o["docids"]), np.asarray(o["scores"])
            cv = np.asarray(o["certified"]) if "certified" in o \
                else np.ones(len(chunk), bool)
            for row, qi in enumerate(chunk):
                if qi in merged:
                    continue
                merged[qi] = (dv[row], sv[row]) if cv[row] else None
                if not cv[row]:
                    uncert.append(qi)
        extra = []
        if uncert:
            fb = BatchSearcher(searcher, k=K, max_batch=BATCH)
            extra = fb.plan([irs[qi] for qi in uncert], stats=stats)
            for cfg_g, fn, batch, chunk in extra:
                o = fn(seg_arrays, batch, stats_d)
                dv, sv = np.asarray(o["docids"]), np.asarray(o["scores"])
                for row, li in enumerate(chunk):
                    qi = uncert[li]
                    if merged[qi] is None:
                        merged[qi] = (dv[row], sv[row])
        log(f"prefix cap {PREFIX_CAP}: {len(uncert)}/{len(queries)} "
            f"uncertified -> exact re-run ({len(extra)} extra launches)")
        sample_qis = list(range(8)) + uncert[:4]
        base = cpu_baseline(seg, [queries[i] for i in sample_qis])
        log("cpu baseline sample done")
        for si, qi in enumerate(sample_qis):
            expect = [d for d, _ in base[si]]
            dv, sv = merged[qi]
            got = [int(d) for d, s in zip(dv, sv)
                   if np.isfinite(s)][: len(expect)]
            if got != expect:
                print(json.dumps({"metric": "RECALL_PARITY_FAILURE",
                                  "query": int(qi), "got": got[:10],
                                  "expect": expect[:10]}), file=sys.stderr)
                raise SystemExit(1)
        batches = batches + extra
    else:
        sample = min(8, len(chunk0))
        base = cpu_baseline(seg, [queries[i] for i in chunk0[:sample]])
        log("cpu baseline sample done")
        dev_docs = np.asarray(out0["docids"])[:sample]
        dev_scores = np.asarray(out0["scores"])[:sample]
        for qi in range(sample):
            expect = [d for d, _ in base[qi]]
            got = [int(d) for d, s in zip(dev_docs[qi], dev_scores[qi])
                   if np.isfinite(s)][: len(expect)]
            if got != expect:
                print(json.dumps({"metric": "RECALL_PARITY_FAILURE",
                                  "query": qi, "got": got[:10],
                                  "expect": expect[:10]}), file=sys.stderr)
                raise SystemExit(1)

    # timed runs. TPU executes enqueued programs in order, so enqueueing
    # every batch and reading back only the LAST result is a sound fence
    # for the whole run: the final value cannot exist until all prior
    # launches finished. A per-batch readback would instead measure the
    # tunnel round-trip (~30ms on the axon-tunneled chip), not the engine.
    reps = max(3, -(-48 // len(batches)))   # >=48 launches amortize dispatch
    t0 = time.time()
    o = None
    for _ in range(reps):
        for _cfg, fn, b, _chunk in batches:
            o = fn(seg_arrays, b, stats_d)
    float(np.asarray(o["scores"])[0, 0])   # one honest end-of-run fence
    dt = (time.time() - t0) / reps
    qps = len(queries) / dt

    # per-batch round-trip latencies (include host<->device transfer):
    # p50/p99 of a single batch submitted and synced in isolation
    lats = []
    for _cfa, fn, ba, _ in batches[: min(len(batches), 12)]:
        t0 = time.time()
        float(np.asarray(fn(seg_arrays, ba, stats_d)["scores"])[0, 0])
        lats.append((time.time() - t0) * 1000)
    lats.sort()
    lat_ms = lats[len(lats) // 2]
    lat_p99 = lats[min(len(lats) - 1, int(len(lats) * 0.99))]

    # CPU single-core baseline QPS on a subset
    n_cpu = min(8, len(queries))
    t0 = time.time()
    cpu_baseline(seg, queries[:n_cpu])
    cpu_qps = n_cpu / (time.time() - t0)

    # vs_baseline compares against the MEASURED from-source reference on
    # this same corpus/queries (BASELINE_MEASURED.json; built + driven by
    # scripts/ref_baseline.py). Falls back to the numpy scorer when no
    # measured row exists for this corpus size.
    REF_QPS = {50_000: 657.1, 1_000_000: 247.52}
    ref = REF_QPS.get(N_DOCS)

    print(json.dumps({
        "metric": f"bm25_top{K}_qps_{N_DOCS // 1000}k_docs",
        "value": round(qps, 2),
        "unit": "qps/chip",
        "vs_baseline": round(qps / ref, 2) if ref else
        round(qps / cpu_qps, 2),
        "detail": {
            "p50_batch_ms": round(dt / len(batches) * 1000, 2),
            "batch_roundtrip_p50_ms": round(lat_ms, 2),
            "batch_roundtrip_p99_ms": round(lat_p99, 2),
            "cpu_numpy_1core_qps": round(cpu_qps, 2),
            "n_docs": N_DOCS, "n_queries": len(queries),
            "terms_per_query": TERMS_PER_QUERY,
            "groups": group_shapes,
            "corpus_build_s": round(build_s, 1),
            "platform": jax.devices()[0].platform,
            "baseline_kind": ("measured from-source xapiand reference, "
                              "same corpus/queries (BASELINE_MEASURED."
                              "json)" if ref else
                              "numpy-1core-dense-bm25"),
        },
    }))


if __name__ == "__main__":
    main()
