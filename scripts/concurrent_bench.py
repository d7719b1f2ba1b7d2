"""Concurrent-client REST QPS: N parallel clients against a live server.

Measures the serving plane (VERDICT r2 weak #3 / next #4: the reference
runs N http servers + a client thread pool, manager.cc:832+,
opts.num_http_clients; ours runs device execution in a worker pool
behind per-index RW locks, server/app.py). Same synthetic corpus +
3-term OR BM25 queries as bench.py / ref_baseline.py.

Usage:
    python scripts/concurrent_bench.py --target ours [--cpu]
    python scripts/concurrent_bench.py --target ref \
        --binary /tmp/xbuild/bin/xapiand

Prints ONE JSON line per clients-count with aggregate QPS + p50/p99.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def wait_http(port, timeout=300):
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            with urllib.request.urlopen(f"http://127.0.0.1:{port}/",
                                        timeout=2) as r:
                if r.status == 200:
                    return True
        except Exception:
            time.sleep(0.5)
    return False


def req(port, method, path, body=None, timeout=600,
        ct="application/json"):
    data = body if isinstance(body, (bytes, type(None))) else \
        json.dumps(body).encode()
    r = urllib.request.Request(f"http://127.0.0.1:{port}{path}", data=data,
                               method=method,
                               headers={"Content-Type": ct} if data else {})
    with urllib.request.urlopen(r, timeout=timeout) as resp:
        return resp.status, json.loads(resp.read() or b"{}")


def corpus_and_queries(n_docs, vocab, n_queries):
    from xapiand_tpu.utils.synth import (build_synthetic_segment,
                                         sample_queries)
    seg = build_synthetic_segment(n_docs, vocab, seed=7)
    queries = sample_queries(seg, n_queries, 3, seed=11)
    docs_tokens = [[] for _ in range(seg.num_docs)]
    for term, ti in seg.terms.items():
        ids = seg.post_docids[ti.offset: ti.offset + ti.length]
        wdf = seg.post_wdf[ti.offset: ti.offset + ti.length]
        for d, w in zip(ids, wdf):
            docs_tokens[int(d)].extend([term] * int(w))
    return docs_tokens, queries


def load_corpus(port, docs_tokens):
    chunk = []
    for i, toks in enumerate(docs_tokens):
        chunk.append(json.dumps({"_id": str(i), "body": " ".join(toks)}))
        if len(chunk) == 2000:
            req(port, "POST", "/bench/:restore",
                ("\n".join(chunk) + "\n").encode(),
                ct="application/x-ndjson")
            chunk = []
    if chunk:
        req(port, "POST", "/bench/:restore",
            ("\n".join(chunk) + "\n").encode(),
            ct="application/x-ndjson")
    req(port, "POST", "/bench/:commit")


def drive(port, queries, n_clients, seconds):
    """n_clients threads loop over the query list round-robin for
    `seconds`; returns (aggregate_qps, p50_ms, p99_ms, n_done)."""
    bodies = [json.dumps({"_query": {"_or": [{"body": t} for t in q]},
                          "_limit": 10}).encode() for q in queries]
    stop = time.time() + seconds
    lats_all, counts = [[] for _ in range(n_clients)], [0] * n_clients

    def worker(ci):
        url = f"http://127.0.0.1:{port}/bench/:search"
        i = ci  # stagger starting offsets so clients hit different shapes
        while time.time() < stop:
            body = bodies[i % len(bodies)]
            i += n_clients
            tq = time.time()
            r = urllib.request.Request(
                url, data=body, method="POST",
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(r, timeout=600) as resp:
                resp.read()
            lats_all[ci].append((time.time() - tq) * 1000)
            counts[ci] += 1

    t0 = time.time()
    ths = [threading.Thread(target=worker, args=(ci,))
           for ci in range(n_clients)]
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    dt = time.time() - t0
    lats = sorted(x for ls in lats_all for x in ls)
    n = sum(counts)
    return (n / dt, lats[len(lats) // 2] if lats else 0.0,
            lats[min(int(len(lats) * 0.99), len(lats) - 1)] if lats else 0.0,
            n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", choices=["ours", "ref"], default="ours")
    ap.add_argument("--binary", default="/tmp/xbuild/bin/xapiand")
    ap.add_argument("--docs", type=int, default=50_000)
    ap.add_argument("--vocab", type=int, default=20_000)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--clients", default="1,8")
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--port", type=int, default=18885)
    ap.add_argument("--cpu", action="store_true",
                    help="force JAX onto CPU (smoke test, ours only)")
    args = ap.parse_args()

    docs_tokens, queries = corpus_and_queries(args.docs, args.vocab,
                                              args.queries)
    data_dir = tempfile.mkdtemp(prefix="xt-conc-")
    if args.target == "ours":
        env = dict(os.environ, AIOHTTP_NO_EXTENSIONS="1")
        env.setdefault("JAX_COMPILATION_CACHE_DIR",
                       os.path.join(os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))), ".jax_cache"))
        if args.cpu:
            env["JAX_PLATFORMS"] = "cpu"
            env.pop("PALLAS_AXON_POOL_IPS", None)
        cmd = [sys.executable, "-m", "xapiand_tpu.server",
               "--port", str(args.port), "--data-dir", data_dir,
               "--bind", "127.0.0.1"]
    else:
        env = dict(os.environ)
        cmd = [args.binary, "-D", data_dir, "--port", str(args.port),
               "--http-servers", "1", "--http-clients", "8",
               "--uid", "root", "--gid", "root", "--solo"]
    print("[conc] starting:", " ".join(cmd), file=sys.stderr)
    proc = subprocess.Popen(cmd, env=env, stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    try:
        if not wait_http(args.port):
            raise SystemExit("server did not come up")
        t0 = time.time()
        load_corpus(args.port, docs_tokens)
        print(f"[conc] indexed {args.docs} in {time.time()-t0:.1f}s",
              file=sys.stderr)
        # warm every query shape once (ours: compiles each shape class)
        for q in queries:
            req(args.port, "POST", "/bench/:search",
                {"_query": {"_or": [{"body": t} for t in q]}, "_limit": 10})
        print("[conc] warm done", file=sys.stderr)
        for nc in [int(c) for c in args.clients.split(",")]:
            qps, p50, p99, n = drive(args.port, queries, nc, args.seconds)
            print(json.dumps({
                "metric": f"{args.target}_rest_qps_{nc}clients_"
                          f"{args.docs // 1000}k",
                "value": round(qps, 2), "unit": "qps",
                "detail": {"p50_ms": round(p50, 2), "p99_ms": round(p99, 2),
                           "requests": n, "seconds": args.seconds}}),
                flush=True)
    finally:
        proc.terminate()
        try:
            proc.wait(10)
        except subprocess.TimeoutExpired:
            proc.kill()
        shutil.rmtree(data_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
