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


def mixed_corpus_queries(n_docs, n_queries, seed=7):
    """Heavy-mix serving row (VERDICT r4 #2): cfg2/cfg3-shaped traffic -
    1/3 exact phrases, 1/3 faceted AND + value sort + aggs, 1/3 plain OR
    relevance - over a corpus with positional text + a category + a
    numeric value field. Returns (ndjson_lines, request_bodies)."""
    import random
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(3000)]
    weights = [1.0 / (i + 1) ** 1.07 for i in range(3000)]
    cats = [f"cat{i}" for i in range(40)]
    cat_w = [1.0 / (i + 1) ** 0.8 for i in range(40)]
    lines, bodies_txt = [], []
    for i in range(n_docs):
        body = " ".join(rng.choices(words, weights=weights, k=12))
        bodies_txt.append(body)
        lines.append(json.dumps({
            "_id": str(i), "body": body,
            "cat": rng.choices(cats, weights=cat_w)[0],
            "price": round(rng.uniform(1.0, 1000.0), 2)}))
    aggs = {"cats": {"_terms": {"_field": "cat", "_size": 10}},
            "price_stats": {"_stats": {"_field": "price"}}}
    sort = [{"price": {"_order": "desc"}}]
    reqs = []
    for qi in range(n_queries):
        kind = qi % 3
        if kind == 0:     # exact phrase
            toks = bodies_txt[rng.randrange(n_docs)].split()
            j = rng.randrange(len(toks) - 1)
            reqs.append({"_query": {"body": {"_phrase":
                                             f"{toks[j]} {toks[j+1]}"}},
                         "_limit": 10})
        elif kind == 1:   # faceted AND + sort + aggs
            reqs.append({"_query": {"_and": [
                            {"cat": f"cat{rng.randint(0, 19)}"},
                            {"body": f"w{rng.randint(0, 200)}"}]},
                         "_sort": sort, "_aggs": aggs, "_limit": 10})
        else:             # plain 3-term OR
            terms = [f"w{rng.randint(0, 500)}" for _ in range(3)]
            reqs.append({"_query": {"_or": [{"body": t} for t in terms]},
                         "_limit": 10})
    return lines, [json.dumps(b).encode() for b in reqs]


def load_lines(port, lines):
    B = 2000
    for s in range(0, len(lines), B):
        req(port, "POST", "/bench/:restore",
            ("\n".join(lines[s: s + B]) + "\n").encode(),
            ct="application/x-ndjson")
    req(port, "POST", "/bench/:commit")


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


def drive(port, queries, n_clients, seconds, bodies=None):
    """n_clients threads loop over the query list round-robin for
    `seconds`; returns (aggregate_qps, p50_ms, p99_ms, n_done).

    Keep-alive: each client holds ONE persistent HTTP/1.1 connection
    (http.client), reconnecting only if the server drops it - the same
    protocol real clients speak, and it keeps the harness's own CPU out
    of the measurement (urllib opened a fresh TCP connection per request,
    which capped the measurable QPS on this 1-core host). Both engines
    are driven identically."""
    import http.client
    if bodies is None:
        bodies = [json.dumps({"_query": {"_or": [{"body": t} for t in q]},
                              "_limit": 10}).encode() for q in queries]
    stop = time.time() + seconds
    lats_all, counts = [[] for _ in range(n_clients)], [0] * n_clients

    def worker(ci):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        hdrs = {"Content-Type": "application/json"}
        i = ci  # stagger starting offsets so clients hit different shapes
        while time.time() < stop:
            body = bodies[i % len(bodies)]
            i += n_clients
            tq = time.time()
            try:
                conn.request("POST", "/bench/:search", body, hdrs)
                resp = conn.getresponse()
                resp.read()
            except (http.client.HTTPException, OSError):
                conn.close()   # server closed the connection: reconnect
                conn.request("POST", "/bench/:search", body, hdrs)
                resp = conn.getresponse()
                resp.read()
            lats_all[ci].append((time.time() - tq) * 1000)
            counts[ci] += 1
        conn.close()

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
    ap.add_argument("--mix", action="store_true",
                    help="heavy query mix: phrases + facets/aggs + ORs")
    args = ap.parse_args()

    if args.mix:
        lines, bodies = mixed_corpus_queries(args.docs, args.queries)
    else:
        docs_tokens, queries = corpus_and_queries(args.docs, args.vocab,
                                                  args.queries)
        bodies = None
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
        if os.environ.get("XT_HTTP_CLIENTS"):
            cmd += ["--num-http-clients", os.environ["XT_HTTP_CLIENTS"]]
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
        if args.mix:
            load_lines(args.port, lines)
        else:
            load_corpus(args.port, docs_tokens)
        print(f"[conc] indexed {args.docs} in {time.time()-t0:.1f}s",
              file=sys.stderr)
        # warm every query shape once (ours: compiles each shape class)
        if args.mix:
            for b in bodies:
                req(args.port, "POST", "/bench/:search", b)
        else:
            for q in queries:
                req(args.port, "POST", "/bench/:search",
                    {"_query": {"_or": [{"body": t} for t in q]},
                     "_limit": 10})
        print("[conc] warm done", file=sys.stderr)
        for nc in [int(c) for c in args.clients.split(",")]:
            qps, p50, p99, n = drive(args.port,
                                     queries if not args.mix else [],
                                     nc, args.seconds, bodies=bodies)
            print(json.dumps({
                "metric": f"{args.target}_rest"
                          f"{'_mix' if args.mix else ''}_qps_{nc}clients_"
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
