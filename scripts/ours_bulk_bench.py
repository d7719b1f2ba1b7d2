"""Our-side REST NDJSON bulk-indexing throughput (the BASELINE.md
"bulk index" row; counterpart of scripts/ref_baseline.py's RESTORE leg).

Measures POST /bench/:restore with application/x-ndjson batches against a
live in-process server, on the SAME synthetic Zipf corpus ref_baseline.py
uses, with WAL on (data dir) or off (--no-wal).

≙ reference bulk path: restore_database_view STREAM_NDJSON
(src/server/http_client.cc) -> DocIndexer pipeline (handler.h:256-361).
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import random
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def zipf_corpus(n_docs: int, vocab: int, seed: int = 7):
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    weights = [1.0 / (i + 1) for i in range(vocab)]
    return [" ".join(rng.choices(words, weights=weights, k=16))
            for _ in range(n_docs)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=50_000)
    ap.add_argument("--vocab", type=int, default=20_000)
    ap.add_argument("--batch", type=int, default=2000)
    ap.add_argument("--no-wal", action="store_true")
    args = ap.parse_args()

    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

    # xapiand_tpu.server sets AIOHTTP_NO_EXTENSIONS before aiohttp loads
    # (pure-python parser accepts the custom verbs: COMMIT/DUMP/...)
    from xapiand_tpu.server.app import IndexManager, create_app
    from aiohttp import web

    data_dir = None if args.no_wal else tempfile.mkdtemp(prefix="xt-bulk-")
    started = threading.Event()
    holder = {}

    def serve():
        async def start():
            app = create_app(manager=IndexManager(data_dir))
            runner = web.AppRunner(app)
            await runner.setup()
            site = web.TCPSite(runner, "127.0.0.1", 0)
            await site.start()
            holder["port"] = runner.addresses[0][1]
            started.set()

        loop = asyncio.new_event_loop()
        asyncio.set_event_loop(loop)
        loop.run_until_complete(start())
        loop.run_forever()

    threading.Thread(target=serve, daemon=True).start()
    assert started.wait(60)

    print(f"[bulk] building {args.docs} docs...", file=sys.stderr)
    lines = [json.dumps({"_id": str(i), "body": b})
             for i, b in enumerate(zipf_corpus(args.docs, args.vocab))]
    port = holder["port"]
    t0 = time.time()
    for s in range(0, len(lines), args.batch):
        body = "\n".join(lines[s: s + args.batch]).encode()
        r = urllib.request.Request(
            f"http://127.0.0.1:{port}/bench/:restore", data=body,
            method="POST", headers={"Content-Type": "application/x-ndjson"})
        with urllib.request.urlopen(r, timeout=600) as resp:
            json.loads(resp.read())
    r = urllib.request.Request(f"http://127.0.0.1:{port}/bench/:commit",
                               method="POST")
    with urllib.request.urlopen(r, timeout=600):
        pass
    dt = time.time() - t0
    print(json.dumps({
        "metric": "bulk_index_rest_ndjson_docs_s",
        "value": round(args.docs / dt, 1),
        "unit": "docs/s",
        "detail": {"wal": not args.no_wal, "docs": args.docs,
                   "batch": args.batch}}))


if __name__ == "__main__":
    main()
