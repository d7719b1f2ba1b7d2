"""Real-text benchmark row (BASELINE.json config 1 analog).

MS MARCO cannot be fetched in this environment (zero egress), so the
real-text corpus is harvested from English documentation prose installed
in the image (~18MB of .rst/.md/.txt under site-packages): natural
language with realistic Zipf posting-length distributions - exactly the
property the synthetic corpus lacks and the size-class design is
sensitive to. The harvest is deterministic (sorted file walk + seeded
shuffle), so reference and rebuild always see the identical corpus.

Runs BOTH engines on the same 10k passages + 256 term queries:
  - the from-source reference binary over REST (indexing docs/s +
    sequential search QPS), reusing ref_baseline.py's driver flow;
  - this engine: REST NDJSON indexing docs/s + batched on-device BM25
    top-10 QPS with rank parity asserted against an independent numpy
    scorer before timing.

Usage:
    python scripts/realtext_bench.py [--binary /tmp/xbuild/bin/xapiand]
        [--passages 10000] [--queries 256] [--skip-reference]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DOC_ROOTS = ("/opt/venv/lib/python3.12/site-packages",
              "/usr/local/lib/python3.12")
_WORD = re.compile(r"[a-z][a-z0-9']*")


def harvest_passages(n_passages: int, words_per_passage: int = 60,
                     seed: int = 7) -> list[str]:
    """Deterministic real-English passages from installed documentation."""
    files = []
    for root in _DOC_ROOTS:
        for dirpath, dirnames, names in os.walk(root):
            dirnames.sort()
            for nm in sorted(names):
                if nm.endswith((".rst", ".md", ".txt")) and \
                        "LICENSE" not in nm.upper() and \
                        "COPYING" not in nm.upper():
                    files.append(os.path.join(dirpath, nm))
    rng = random.Random(seed)
    rng.shuffle(files)
    words: list[str] = []
    budget = n_passages * words_per_passage + 10_000
    for path in files:
        try:
            with open(path, errors="ignore") as fh:
                text = fh.read()
        except OSError:
            continue
        # prose lines only: drop code blocks / tables / directives
        for line in text.splitlines():
            ls = line.strip()
            if not ls or ls.startswith((">>>", "..", "|", "+", "#", "=",
                                        "-", "*", ":")):
                continue
            words.extend(_WORD.findall(ls.lower()))
        if len(words) >= budget:
            break
    if len(words) < n_passages * 10:
        raise SystemExit("not enough harvested text")
    passages = []
    step = max(len(words) // n_passages, 10)
    wpp = min(words_per_passage, step)
    for i in range(n_passages):
        start = i * step
        passages.append(" ".join(words[start: start + wpp]))
    return passages


def sample_term_queries(seg, n_queries: int, seed: int = 11):
    """2-3 term queries from mid-frequency vocabulary (the MS MARCO-style
    term-query workload); terms drawn from the segment's own dictionary."""
    rng = random.Random(seed)
    n = seg.doc_count
    vocab = [t for t, ti in seg.terms.items()
             if not t.startswith(("Q", "Z")) and ":" not in t
             and "#" not in t and "." not in t
             and n // 500 <= ti.length <= n // 5]
    vocab.sort()
    queries = []
    for _ in range(n_queries):
        k = rng.choice((2, 3, 3))
        queries.append(rng.sample(vocab, k))
    return queries


def cpu_bm25_topk(seg, query_terms, k=10, k1=1.0, b=0.5, minnorm=0.5):
    import numpy as np

    nd = seg.num_docs
    doclen = seg.doclen[:nd].astype(np.float64)
    avg = seg.total_doclen / nd
    results = []
    for terms in query_terms:
        scores = np.zeros(nd, dtype=np.float64)
        for t in terms:
            ti = seg.terms.get(t)
            if ti is None or ti.length == 0:
                continue
            ids = seg.post_docids[ti.offset: ti.offset + ti.length]
            wdf = seg.post_wdf[ti.offset: ti.offset + ti.length] \
                .astype(np.float64)
            tw = (nd - ti.length + 0.5) / (ti.length + 0.5)
            if tw < 2.0:
                tw = tw * 0.5 + 1.0
            tw = np.log(tw) * (k1 + 1.0)
            normlen = np.maximum(doclen[ids] / avg, minnorm)
            np.add.at(scores, ids,
                      tw * (wdf / (k1 * (normlen * b + (1 - b)) + wdf)))
        cand = np.argpartition(-scores, min(4 * k, nd - 1))[: 4 * k]
        order = sorted(cand, key=lambda d: (-scores[d], d))
        results.append([(int(d), float(scores[d])) for d in order[:k]
                        if scores[d] > 0])
    return results


def run_ours(passages, n_queries):
    import threading
    import urllib.request

    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

    from xapiand_tpu.database import Database
    from xapiand_tpu.models.weights import CollectionStats, get_scheme
    from xapiand_tpu.query.ir import Q
    from xapiand_tpu.search import BatchSearcher, SegmentSearcher

    # REST NDJSON indexing throughput
    import asyncio

    from aiohttp import web

    from xapiand_tpu.server.app import IndexManager, create_app

    started = threading.Event()
    holder = {}

    def serve():
        async def start():
            app = create_app(manager=IndexManager(None))
            runner = web.AppRunner(app)
            await runner.setup()
            site = web.TCPSite(runner, "127.0.0.1", 0)
            await site.start()
            holder["port"] = runner.addresses[0][1]
            holder["runner"] = runner
            started.set()

        loop = asyncio.new_event_loop()
        asyncio.set_event_loop(loop)
        loop.run_until_complete(start())
        holder["loop"] = loop
        loop.run_forever()

    threading.Thread(target=serve, daemon=True).start()
    started.wait(60)
    lines = [json.dumps({"_id": str(i), "body": p})
             for i, p in enumerate(passages)]
    t0 = time.time()
    B = 2000
    for s in range(0, len(lines), B):
        body = "\n".join(lines[s: s + B]).encode()
        r = urllib.request.Request(
            f"http://127.0.0.1:{holder['port']}/marco/:restore", data=body,
            method="POST", headers={"Content-Type": "application/x-ndjson"})
        with urllib.request.urlopen(r, timeout=600) as resp:
            json.loads(resp.read())
    index_s = time.time() - t0

    # on-device batched QPS with rank-parity gate
    db = Database()
    for i, p in enumerate(passages):
        db.index_document({"body": p}, doc_id=str(i))
    db.commit()
    seg = db._searchers[0].segment
    queries = sample_term_queries(seg, n_queries)
    searcher = SegmentSearcher(seg, get_scheme("bm25"))
    bs = BatchSearcher(searcher, k=10)
    irs = [Q.or_terms(sorted(q, key=lambda t: -seg.terms[t].length))
           for q in queries]
    res = bs.run(irs)   # warm + compile
    import numpy as np

    base = cpu_bm25_topk(seg, queries[:8])
    for qi in range(8):
        expect = [d for d, _ in base[qi]]
        got = [int(d) for d, s in zip(res[qi]["docids"], res[qi]["scores"])
               if np.isfinite(s)][: len(expect)]
        assert got == expect, ("RANK PARITY FAILURE", qi, got, expect)

    planned = bs.plan(irs)
    seg_arrays = searcher.device_segment.arrays_pytree()
    stats = CollectionStats(doc_count=seg.doc_count,
                            avg_doclen=seg.avg_doclen, doclen_lower=1.0)
    import jax.numpy as jnp

    stats_d = {"N": jnp.float32(stats.doc_count),
               "avg_doclen": jnp.float32(stats.avg_doclen),
               "doclen_lower": jnp.float32(1.0)}
    # warm the EXACT (fn, stats-pytree) pairs the timed loop uses:
    # bs.run() above compiled against its own 5-key stats dict, a
    # DIFFERENT pytree structure — without this pass the timed loop
    # re-traces every shape group (the round-5 294-QPS phantom
    # regression: bench harness bug, not an engine change)
    import jax
    for _cfg, fn, batch, _chunk in planned:
        jax.block_until_ready(fn(seg_arrays, batch, stats_d))
    reps = max(3, -(-48 // len(planned)))
    t0 = time.time()
    o = None
    for _ in range(reps):
        for _cfg, fn, batch, _chunk in planned:
            o = fn(seg_arrays, batch, stats_d)
    float(np.asarray(o["scores"])[0, 0])
    qps = len(queries) * reps / (time.time() - t0)
    return {"index_docs_s": len(passages) / index_s, "qps": qps,
            "queries": queries}


def run_reference(binary, passages, queries, port=18899):
    import shutil
    import subprocess
    import tempfile

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ref_baseline import req, wait_http

    data_dir = tempfile.mkdtemp(prefix="xapiand-marco-")
    cmd = [binary, "-D", data_dir, "--port", str(port),
           "--http-servers", "1", "--http-clients", "2",
           "--uid", "root", "--gid", "root", "--solo"]
    proc = subprocess.Popen(cmd, stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    try:
        if not wait_http(port):
            raise SystemExit("reference server did not come up")
        t0 = time.time()
        chunk = []
        for i, p in enumerate(passages):
            chunk.append(json.dumps({"_id": str(i), "body": p}))
            if len(chunk) == 2000:
                req(port, "POST", "/marco/:restore",
                    ("\n".join(chunk) + "\n").encode(),
                    ct="application/x-ndjson")
                chunk = []
        if chunk:
            req(port, "POST", "/marco/:restore",
                ("\n".join(chunk) + "\n").encode(),
                ct="application/x-ndjson")
        req(port, "POST", "/marco/:commit")
        index_s = time.time() - t0
        for q in queries[:8]:
            req(port, "POST", "/marco/:search",
                {"_query": {"_or": [{"body": t} for t in q]}, "_limit": 10})
        lats = []
        t0 = time.time()
        for q in queries:
            tq = time.time()
            req(port, "POST", "/marco/:search",
                {"_query": {"_or": [{"body": t} for t in q]}, "_limit": 10})
            lats.append((time.time() - tq) * 1000)
        dt = time.time() - t0
        lats.sort()
        return {"index_docs_s": len(passages) / index_s,
                "qps": len(queries) / dt,
                "p50_ms": lats[len(lats) // 2],
                "p99_ms": lats[int(len(lats) * 0.99)]}
    finally:
        proc.terminate()
        try:
            proc.wait(10)
        except subprocess.TimeoutExpired:
            proc.kill()
        shutil.rmtree(data_dir, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--binary", default="/tmp/xbuild/bin/xapiand")
    ap.add_argument("--passages", type=int, default=10_000)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--skip-reference", action="store_true")
    args = ap.parse_args()

    print(f"[realtext] harvesting {args.passages} passages...",
          file=sys.stderr)
    passages = harvest_passages(args.passages)
    print(f"[realtext] corpus: {sum(len(p) for p in passages)/1e6:.1f} MB",
          file=sys.stderr)

    ours = run_ours(passages, args.queries)
    print(f"[realtext] ours: {ours['index_docs_s']:.0f} docs/s, "
          f"{ours['qps']:.0f} qps", file=sys.stderr)

    ref = None
    if not args.skip_reference and os.path.exists(args.binary):
        ref = run_reference(args.binary, passages, ours["queries"])
        print(f"[realtext] reference: {ref['index_docs_s']:.0f} docs/s, "
              f"{ref['qps']:.0f} qps", file=sys.stderr)

    out = {
        "metric": f"realtext_bm25_top10_{args.passages // 1000}k_passages",
        "value": round(ours["qps"], 2),
        "unit": "qps/chip",
        "vs_baseline": round(ours["qps"] / ref["qps"], 2) if ref else None,
        "detail": {
            "ours_index_docs_s": round(ours["index_docs_s"], 1),
            "reference": {k: round(v, 2) for k, v in ref.items()}
            if ref else "skipped",
            "passages": args.passages,
            "corpus": "installed documentation prose (MS MARCO stand-in; "
                      "zero-egress environment)",
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
