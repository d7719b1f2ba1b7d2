"""Server-level option flags: response shaping (pretty/echo/comments/
human), database pool LRU, offline dump/restore CLI
(reference opts.h:40-93 subset)."""

import asyncio
import json
import os
import threading

import pytest
import urllib.request

from xapiand_tpu.server.app import IndexManager, create_app


class OptServer:
    def __init__(self, server_opts=None, manager=None):
        self.server_opts = server_opts
        self.manager = manager or IndexManager(None)
        self.port = None
        self._started = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        assert self._started.wait(30)

    def _run(self):
        from aiohttp import web

        async def start():
            app = create_app(manager=self.manager,
                             server_opts=self.server_opts)
            runner = web.AppRunner(app)
            await runner.setup()
            site = web.TCPSite(runner, "127.0.0.1", 0)
            await site.start()
            self.port = runner.addresses[0][1]
            self._runner = runner
            self._started.set()

        self._loop = asyncio.new_event_loop()
        asyncio.set_event_loop(self._loop)
        self._loop.run_until_complete(start())
        self._loop.run_forever()

    def req(self, method, path, body=None):
        url = f"http://127.0.0.1:{self.port}{path}"
        data = json.dumps(body).encode() if body is not None else None
        r = urllib.request.Request(url, data=data, method=method)
        with urllib.request.urlopen(r) as resp:
            return resp.status, resp.read()

    def stop(self):
        self._loop.call_soon_threadsafe(self._loop.stop)


def test_response_shaping_flags():
    srv = OptServer(server_opts={"pretty": True, "comments": False,
                                 "echo": True, "human": True,
                                 "cluster_name": "testcluster"})
    try:
        st, raw = srv.req("GET", "/")
        obj = json.loads(raw)
        assert obj["cluster_name"] == "testcluster"
        assert b"\n" in raw                      # pretty by default
        st, raw = srv.req("PUT", "/idx/1?commit", {"a": "hello"})
        obj = json.loads(raw)
        assert obj["_id"] == "1"
        assert obj["a"] == "hello"               # --echo
        assert "#took" not in obj                # --no-comments
        assert "#commit" not in obj
    finally:
        srv.stop()


def test_human_took_format():
    srv = OptServer(server_opts={"human": True})
    try:
        st, raw = srv.req("GET", "/")
        obj = json.loads(raw)
        assert isinstance(obj["#took"], str) and obj["#took"].endswith("ms")
    finally:
        srv.stop()


def test_database_pool_lru_eviction(tmp_path):
    man = IndexManager(str(tmp_path), pool_size=2, autocommit_s=0)
    for i in range(4):
        db = man.get(f"idx{i}", create=True)
        db.index_document({"v": i}, doc_id="d")
        db.commit()
    open_dbs = [n for n, d in man.indexes.items() if d is not None]
    assert len(open_dbs) == 2                    # LRU caps OPEN databases
    # evicted names stay discoverable (lazily None), not 404
    assert len(man.indexes) == 4
    # evicted index reopens from disk with its data intact
    db0 = man.get("idx0")
    assert db0.get_document("d")["v"] == 0
    assert len([d for d in man.indexes.values() if d is not None]) == 2


def test_offline_dump_restore_cli(tmp_path):
    from xapiand_tpu.server.__main__ import main

    src = tmp_path / "in.ndjson"
    src.write_text('{"_id": "1", "a": "x"}\n{"_id": "2", "a": "y"}\n')
    data = str(tmp_path / "data")
    rc = main(["--data-dir", data, "--database", "idx",
               "--restore-documents", str(src)])
    assert rc == 0
    out = tmp_path / "out.ndjson"
    rc = main(["--data-dir", data, "--database", "idx",
               "--dump-documents", str(out)])
    assert rc == 0
    docs = [json.loads(line) for line in out.read_text().splitlines()]
    assert {d["_id"] for d in docs} == {"1", "2"}
