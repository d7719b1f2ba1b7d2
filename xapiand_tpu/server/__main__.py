"""CLI entry point: ``python -m xapiand_tpu.server``.

Reference parity target: src/main.cc / src/opts.cc (TCLAP flags) - the
operationally relevant subset via argparse.
"""

from __future__ import annotations

import argparse
import logging
import os


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="xapiand-tpu",
        description="TPU-native distributed search & storage engine")
    p.add_argument("--bind", default="0.0.0.0", help="listen address")
    p.add_argument("--port", type=int, default=8880,
                   help="HTTP port (reference default 8880)")
    p.add_argument("--data-dir", default="./data",
                   help="index data directory (WAL + volumes)")
    p.add_argument("--scheme", default="bm25",
                   help="default weighting scheme")
    p.add_argument("--autocommit", type=float, default=1.0,
                   help="autocommit debounce seconds; 0 disables "
                        "(≙ committer_debounce_timeout, opts.h:111)")
    p.add_argument("--num-shards", type=int, default=1,
                   help="default shards per new index (≙ opts.h:85 "
                        "num_shards; >1 backs indexes with the device mesh)")
    p.add_argument("--name", default=None,
                   help="node name (cluster mode; default: hostname)")
    p.add_argument("--discovery-port", type=int, default=None,
                   help="UDP discovery port (enables cluster mode; "
                        "reference default 58880)")
    p.add_argument("--peers", default="",
                   help="comma-separated host:port bootstrap peers")
    p.add_argument("--random-errors-io", type=float, default=0.0,
                   help="inject IO faults with this probability "
                        "(≙ opts.h:105, io.cc errno injection)")
    p.add_argument("--random-errors-db", type=float, default=0.0,
                   help="inject DB faults (open/commit) with this "
                        "probability (≙ opts.h:106)")
    p.add_argument("--random-errors-net", type=float, default=0.0,
                   help="drop cluster messages with this probability "
                        "(≙ opts.h:107)")
    p.add_argument("--verbosity", "-v", action="count", default=0)
    # response-shaping defaults (≙ opts.h:40-47)
    p.add_argument("--cluster-name", default="xapiand-tpu",
                   help="cluster name reported by GET / (≙ opts.h:49)")
    p.add_argument("--pretty", action="store_true",
                   help="pretty-print responses by default (≙ opts.h:40)")
    p.add_argument("--no-comments", action="store_true",
                   help="strip #-prefixed comment fields from responses "
                        "(≙ opts.h:46)")
    p.add_argument("--echo", action="store_true",
                   help="document-write responses echo the stored body "
                        "(≙ opts.h:41)")
    p.add_argument("--human", action="store_true",
                   help="humanize #took durations (≙ opts.h:44)")
    p.add_argument("--admin-commands", action="store_true",
                   help="enable FLUSH and QUIT verbs "
                        "(≙ opts.h admin_commands, http_client.cc:1169)")
    # pool/tuning (≙ opts.h:63-86)
    p.add_argument("--database-pool-size", type=int, default=10,
                   help="LRU cap of open databases (≙ opts.h:77)")
    p.add_argument("--num-doc-preparers", type=int, default=None,
                   help="bulk prepare pool width (≙ opts.h:71; "
                        "default: min(8, cpus))")
    p.add_argument("--num-http-clients", type=int, default=None,
                   help="request worker pool width: device execution and "
                        "bulk indexing run here, off the event loop "
                        "(\u2259 opts.h:67 num_http_clients; default "
                        "max(2, min(8, cpus)) - unlike the reference's "
                        "GIL-free C++ threads, extra Python workers on "
                        "few cores only add contention: measured mix "
                        "@8 clients on 1 core: pool 8 -> 378 qps p99 "
                        "130ms, pool 2 -> 502 qps p99 37ms)")
    p.add_argument("--num-replicas", type=int, default=0,
                   help="default replicas per new index (≙ opts.h:86)")
    p.add_argument("--search-batch-window", type=float, default=2.0,
                   help="milliseconds concurrent plain searches wait to "
                        "coalesce into one device batch "
                        "(SearchBatcher/search_many; 0 disables)")
    p.add_argument("--autocommit-max-force", type=float, default=3.0,
                   help="autocommit force-flush ceiling seconds "
                        "(≙ committer_debounce_max_force_timeout, "
                        "opts.h:114)")
    # process management (≙ opts.h:57-58)
    p.add_argument("--pidfile", default=None, help="write PID here")
    p.add_argument("--logfile", default=None, help="log to this file")
    # offline dump/restore (≙ opts.h:92-93 dump/restore_documents; runs
    # without a server, like `xapiand --dump-documents`)
    p.add_argument("--database", default=None,
                   help="index name for --dump-documents/"
                        "--restore-documents")
    p.add_argument("--dump-documents", default=None, metavar="FILE",
                   help="dump --database as NDJSON to FILE and exit")
    p.add_argument("--restore-documents", default=None, metavar="FILE",
                   help="restore NDJSON from FILE into --database and exit")
    args = p.parse_args(argv)

    handlers = None
    if args.logfile:
        handlers = [logging.FileHandler(args.logfile)]
    logging.basicConfig(
        level=logging.DEBUG if args.verbosity else logging.INFO,
        format="%(asctime)s %(levelname).1s %(name)s: %(message)s",
        handlers=handlers)
    if args.pidfile:

        with open(args.pidfile, "w") as fh:
            fh.write(str(os.getpid()))

    if args.dump_documents or args.restore_documents:
        return _offline_dump_restore(args)

    from aiohttp import web

    from xapiand_tpu.server.app import IndexManager, create_app

    if args.random_errors_io or args.random_errors_db or \
            args.random_errors_net:
        from xapiand_tpu.index.storage import faults

        faults.set_rates(io=args.random_errors_io,
                         db=args.random_errors_db,
                         net=args.random_errors_net)

    cluster_config = None
    if args.discovery_port is not None:
        import socket

        peers = []
        for item in args.peers.split(","):
            item = item.strip()
            if item:
                host, _, port = item.rpartition(":")
                peers.append((host or "127.0.0.1", int(port)))
        cluster_config = {
            "name": args.name or socket.gethostname(),
            "host": args.bind if args.bind != "0.0.0.0" else "127.0.0.1",
            "port": args.discovery_port,
            "http_port": args.port,
            "peers": peers,
        }

    app = create_app(manager=IndexManager(
        args.data_dir, scheme=args.scheme,
        default_num_shards=args.num_shards,
        autocommit_s=args.autocommit,
        autocommit_force_s=args.autocommit_max_force,
        pool_size=args.database_pool_size,
        num_doc_preparers=args.num_doc_preparers,
        default_num_replicas=args.num_replicas),
        cluster_config=cluster_config,
        server_opts={"pretty": args.pretty,
                     "comments": not args.no_comments,
                     "echo": args.echo, "human": args.human,
                     "num_http_clients": args.num_http_clients
                     if args.num_http_clients is not None
                     else max(2, min(8, os.cpu_count() or 2)),
                     "cluster_name": args.cluster_name,
                     "search_batch_window": args.search_batch_window / 1000.0,
                     "admin_commands": args.admin_commands})

    def _graceful_quit():
        # SIGTERM-to-self: web.run_app's signal handler shuts the runner
        # down gracefully (≙ XapiandManager::try_shutdown, main.cc)
        import signal

        os.kill(os.getpid(), signal.SIGTERM)

    app["server"].on_quit = _graceful_quit
    # access_log only at -vv: per-request log formatting costs real host
    # CPU at serving rates (the reference logs at verbose levels too)
    web.run_app(app, host=args.bind, port=args.port,
                access_log=None if args.verbosity < 2 else
                __import__("logging").getLogger("aiohttp.access"))


def _offline_dump_restore(args) -> int:
    """`--database idx --dump-documents f` / `--restore-documents f`:
    run the dump/restore directly against the on-disk index, no server
    (≙ main.cc dump/restore modes via opts.h:92-93)."""
    import json
    import sys

    if not args.database:
        print("--database is required with --dump-documents/"
              "--restore-documents", file=sys.stderr)
        return 2
    from xapiand_tpu.database import Database

    path = os.path.join(args.data_dir, args.database)
    db = Database(path=path, scheme=args.scheme)
    if args.dump_documents:
        out = sys.stdout if args.dump_documents == "-" \
            else open(args.dump_documents, "w")
        n = 0
        for doc in db.dump_documents():
            out.write(json.dumps(doc, ensure_ascii=False) + "\n")
            n += 1
        if out is not sys.stdout:
            out.close()
        print(f"dumped {n} documents from {args.database!r}",
              file=sys.stderr)
    else:
        src = sys.stdin if args.restore_documents == "-" \
            else open(args.restore_documents)
        n = 0
        for line in src:
            line = line.strip()
            if line:
                obj = json.loads(line)
                db.index_document(obj, doc_id=obj.get('_id'))
                n += 1
        if src is not sys.stdin:
            src.close()
        db.commit()
        print(f"restored {n} documents into {args.database!r}",
              file=sys.stderr)
    db.close()
    return 0


if __name__ == "__main__":
    main()
