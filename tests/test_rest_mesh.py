"""REST-on-mesh: the served product over mesh-sharded indexes.

Every index in this server defaults to num_shards=4 (ShardedDatabase on
the 8-virtual-device CPU mesh), and the SAME assertions as tests/test_rest.py
must pass - the reference resolves every request through IndexSettings
(src/index_resolver_lru.h:41-66) and a user should not be able to tell a
sharded index from a single-shard one except by :settings/:info.
"""

import pytest

from test_rest import ServerThread

import test_rest as tr


@pytest.fixture(scope="module")
def srv(tmp_path_factory):
    import asyncio
    import threading

    from aiohttp import web

    from xapiand_tpu.server.app import IndexManager, create_app

    class MeshServerThread(ServerThread):
        def _run(self):
            async def start():
                app = create_app(manager=IndexManager(
                    self.data_dir, default_num_shards=4))
                runner = web.AppRunner(app)
                await runner.setup()
                site = web.TCPSite(runner, "127.0.0.1", self.http_port)
                await site.start()
                self.port = runner.addresses[0][1]
                self._runner = runner
                self._started.set()

            self._loop = asyncio.new_event_loop()
            asyncio.set_event_loop(self._loop)
            self._loop.run_until_complete(start())
            self._loop.run_forever()

    s = MeshServerThread.__new__(MeshServerThread)
    s.data_dir = str(tmp_path_factory.mktemp("rest-mesh-data"))
    s.http_port = 0
    s.cluster_config = None
    s.port = None
    s._loop = None
    s._started = threading.Event()
    s._thread = threading.Thread(target=s._run, daemon=True)
    s._thread.start()
    assert s._started.wait(30)
    yield s
    s.stop()


# the canonical REST conformance assertions, re-run over the mesh backend
test_document_crud = tr.test_document_crud
test_search_and_count = tr.test_search_and_count
test_aggregations_via_rest = tr.test_aggregations_via_rest
test_patch_and_update = tr.test_patch_and_update
test_store_blob_roundtrip = tr.test_store_blob_roundtrip
test_metadata_info_check_wal = tr.test_metadata_info_check_wal
test_dump_restore_roundtrip = tr.test_dump_restore_roundtrip
test_versioning_optimistic_concurrency = \
    tr.test_versioning_optimistic_concurrency
test_bulk_restore_pipeline = tr.test_bulk_restore_pipeline


def test_settings_view_and_sharded_backend(srv):
    """:settings selects + reports the mesh backend (index_resolver_lru
    analog); :info reports the shard layout."""
    status, out, _ = srv.req("GET", "/books/:settings")
    assert status == 200 and out["num_shards"] == 4
    srv.req("PUT", "/books/9", {"title": "sharded"})
    status, out, _ = srv.req("GET", "/books/:info")
    assert out["num_shards"] == 4
    assert out["mesh"] == {"dp": 2, "shard": 4}

    # explicit settings on a fresh index override the default
    status, out, _ = srv.req("PUT", "/solo/:settings", {"num_shards": 1})
    assert status == 200 and out["num_shards"] == 1
    srv.req("PUT", "/solo/1", {"a": 1})
    status, out, _ = srv.req("GET", "/solo/:info")
    assert "num_shards" not in out  # plain Database backend

    # resharding a non-empty index is rejected (reference: settings are
    # fixed at creation; dump+restore to reshard)
    status, out, _ = srv.req("PUT", "/books/:settings", {"num_shards": 8})
    assert status == 400


def test_search_through_shard_map(srv):
    """The served search actually runs the SPMD step (not the fallback)."""
    for i in range(12):
        srv.req("PUT", f"/meshq/{i}",
                {"body": f"term{i % 3} common words", "price": i})
    srv.req("POST", "/meshq/:commit")
    status, out, _ = srv.req("POST", "/meshq/:search",
                             {"_query": {"body": "term1"}})
    assert status == 200 and out["total"] == 4
    man = None
    # reach into the server thread's app to assert the mesh path compiled
    srv_obj = getattr(srv, "_runner", None)
    if srv_obj is not None:
        man = srv_obj.app["manager"]
    if man is not None:
        db = man.get("meshq")
        assert db.n_shards == 4
        assert db._mesh_step_cache, "search did not use the shard_map step"


def test_sharded_index_persists_across_restart(tmp_path):
    from xapiand_tpu.server.app import IndexManager

    d = str(tmp_path / "data")
    man = IndexManager(d)
    man.set_settings("idx", {"num_shards": 4})
    db = man.get("idx", create=True)
    for i in range(8):
        db.index_document({"body": f"doc {i % 2}"}, doc_id=str(i))
    db.commit()
    man.close()

    man2 = IndexManager(d)
    db2 = man2.get("idx")
    assert db2.n_shards == 4
    assert db2.doc_count == 8
    assert db2.search({"body": "1"}, k=10).total == 4
    man2.close()
