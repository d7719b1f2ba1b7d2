"""Measure the actual reference (Kronuz/Xapiand, built from the mounted
snapshot) on the same synthetic corpus + queries as bench.py.

Usage:
    python scripts/ref_baseline.py --binary /tmp/xbuild/bin/xapiand \
        [--docs 50000] [--vocab 20000] [--queries 256] [--pin-core 0]

The binary is built OUTSIDE this repo (e.g. /tmp/xbuild) from
/root/reference; this script only drives it over REST:
  1. start xapiand on a scratch data dir (single HTTP server thread,
     optionally pinned to one core for the "single-core" comparison row)
  2. bulk-index the corpus via RESTORE (ndjson)
  3. run 3-term OR BM25 top-10 SEARCH requests sequentially, report QPS

Prints one JSON line compatible with BASELINE.md's comparison-row format.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def wait_http(port, timeout=60):
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--binary", default="/tmp/xbuild/bin/xapiand")
    ap.add_argument("--docs", type=int, default=50_000)
    ap.add_argument("--vocab", type=int, default=20_000)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--port", type=int, default=18880)
    ap.add_argument("--pin-core", type=int, default=None)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from xapiand_tpu.utils.synth import (build_synthetic_segment,
                                         sample_queries)

    seg = build_synthetic_segment(args.docs, args.vocab, seed=7)
    queries = sample_queries(seg, args.queries, 3, seed=11)

    # reconstruct doc token streams from the segment's postings
    print("[ref] reconstructing corpus text...", file=sys.stderr)
    docs_tokens: list[list[str]] = [[] for _ in range(seg.num_docs)]
    for term, ti in seg.terms.items():
        ids = seg.post_docids[ti.offset: ti.offset + ti.length]
        wdf = seg.post_wdf[ti.offset: ti.offset + ti.length]
        for d, w in zip(ids, wdf):
            docs_tokens[int(d)].extend([term] * int(w))

    data_dir = tempfile.mkdtemp(prefix="xapiand-ref-")
    cmd = [args.binary, "-D", data_dir,
           "--port", str(args.port),
           "--http-servers", "1",
           "--http-clients", "2",
           "--uid", "root", "--gid", "root",
           "--solo"]
    if args.pin_core is not None and shutil.which("taskset"):
        cmd = ["taskset", "-c", str(args.pin_core)] + cmd
    print("[ref] starting:", " ".join(cmd), file=sys.stderr)
    proc = subprocess.Popen(cmd, stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    try:
        if not wait_http(args.port):
            raise SystemExit("reference server did not come up")

        t0 = time.time()
        chunk = []
        n = 0
        for i, toks in enumerate(docs_tokens):
            chunk.append(json.dumps({"_id": str(i), "body": " ".join(toks)}))
            if len(chunk) == 2000:
                req(args.port, "POST", "/bench/:restore",
                    ("\n".join(chunk) + "\n").encode(),
                    ct="application/x-ndjson")
                n += len(chunk)
                chunk = []
                print(f"[ref] indexed {n}", file=sys.stderr)
        if chunk:
            req(args.port, "POST", "/bench/:restore",
                ("\n".join(chunk) + "\n").encode(),
                ct="application/x-ndjson")
        req(args.port, "POST", "/bench/:commit")
        index_s = time.time() - t0
        print(f"[ref] indexing done in {index_s:.1f}s", file=sys.stderr)

        # warm
        for q in queries[:8]:
            req(args.port, "POST", "/bench/:search",
                {"_query": {"_or": [{"body": t} for t in q]},
                 "_limit": 10})
        # timed sequential run
        lats = []
        t0 = time.time()
        for q in queries:
            tq = time.time()
            req(args.port, "POST", "/bench/:search",
                {"_query": {"_or": [{"body": t} for t in q]},
                 "_limit": 10})
            lats.append((time.time() - tq) * 1000)
        dt = time.time() - t0
        lats.sort()
        print(json.dumps({
            "metric": f"REFERENCE_bm25_top10_qps_{args.docs // 1000}k_docs",
            "value": round(len(queries) / dt, 2),
            "unit": "qps (xapiand reference, 1 http server"
                    + (", pinned 1 core" if args.pin_core is not None
                       else "") + ")",
            "detail": {"p50_ms": round(lats[len(lats) // 2], 2),
                       "p99_ms": round(lats[int(len(lats) * 0.99)], 2),
                       "index_s": round(index_s, 1),
                       "docs": args.docs, "queries": len(queries)},
        }))
    finally:
        proc.terminate()
        try:
            proc.wait(10)
        except subprocess.TimeoutExpired:
            proc.kill()
        if not args.keep:
            shutil.rmtree(data_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
