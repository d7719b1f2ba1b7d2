"""CLI entry point: ``python -m xapiand_tpu.server``.

Reference parity target: src/main.cc / src/opts.cc (TCLAP flags) - the
operationally relevant subset via argparse.
"""

from __future__ import annotations

import argparse
import logging


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
    args = p.parse_args(argv)

    logging.basicConfig(
        level=logging.DEBUG if args.verbosity else logging.INFO,
        format="%(asctime)s %(levelname).1s %(name)s: %(message)s")

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
        autocommit_s=args.autocommit),
        cluster_config=cluster_config)
    web.run_app(app, host=args.bind, port=args.port)


if __name__ == "__main__":
    main()
