"""REST API conformance tests (the docs_to_postman-style end-to-end HTTP
suite of the reference, SURVEY.md §4, run in-process)."""

import asyncio
import json
import threading

import pytest
import urllib.request
import urllib.error

from xapiand_tpu.server.app import IndexManager, create_app


class ServerThread:
    def __init__(self, data_dir=None, http_port=0, cluster_config=None,
                 server_opts=None, manager_opts=None):
        self.data_dir = data_dir
        self.http_port = http_port
        self.cluster_config = cluster_config
        self.server_opts = server_opts
        self.manager_opts = manager_opts or {}
        self.server = None
        self.port = None
        self._loop = None
        self._started = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        assert self._started.wait(30)

    def _run(self):
        from aiohttp import web

        async def start():
            app = create_app(manager=IndexManager(self.data_dir,
                                                  **self.manager_opts),
                             cluster_config=self.cluster_config,
                             server_opts=self.server_opts)
            self.server = app["server"]
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

    def stop(self):
        async def shutdown():
            await self._runner.cleanup()

        fut = asyncio.run_coroutine_threadsafe(shutdown(), self._loop)
        fut.result(10)
        self._loop.call_soon_threadsafe(self._loop.stop)
        self._thread.join(10)

    def req(self, method, path, body=None, headers=None, raw=False):
        url = f"http://127.0.0.1:{self.port}{path}"
        data = None
        headers = dict(headers or {})
        if body is not None:
            if isinstance(body, (dict, list)):
                data = json.dumps(body).encode()
                headers.setdefault("Content-Type", "application/json")
            else:
                data = body
        r = urllib.request.Request(url, data=data, method=method,
                                   headers=headers)
        try:
            with urllib.request.urlopen(r, timeout=600) as resp:
                payload = resp.read()
                status = resp.status
                ct = resp.headers.get("Content-Type", "")
        except urllib.error.HTTPError as e:
            payload = e.read()
            status = e.code
            ct = e.headers.get("Content-Type", "")
        if raw:
            return status, payload, ct
        out = json.loads(payload) if payload and "json" in ct else payload
        return status, out, ct


@pytest.fixture(scope="module")
def srv(tmp_path_factory):
    s = ServerThread(str(tmp_path_factory.mktemp("rest-data")))
    yield s
    s.stop()


def test_server_info(srv):
    status, out, _ = srv.req("GET", "/")
    assert status == 200
    assert out["name"] == "xapiand-tpu" and "version" in out


def test_document_crud(srv):
    status, out, _ = srv.req("PUT", "/books/1",
                             {"title": "Moby Dick", "price": 12})
    assert status == 200 and out["_id"] == "1"
    status, out, _ = srv.req("POST", "/books/", {"title": "Auto Id"})
    assert status == 201 and out["_id"]
    auto_id = out["_id"]
    srv.req("POST", "/books/:commit")
    status, out, _ = srv.req("GET", "/books/1")
    assert status == 200 and out["title"] == "Moby Dick"
    status, out, _ = srv.req("GET", f"/books/{auto_id}")
    assert status == 200
    status, out, _ = srv.req("DELETE", f"/books/{auto_id}?commit")
    assert status == 200
    status, out, _ = srv.req("GET", f"/books/{auto_id}")
    assert status == 404
    status, out, _ = srv.req("GET", "/books/nope")
    assert status == 404


def test_search_and_count(srv):
    for i, (title, price) in enumerate([("white whale hunt", 10),
                                        ("whale songs", 25),
                                        ("desert planet", 40)]):
        srv.req("PUT", f"/lib/{i}", {"title": title, "price": price})
    srv.req("POST", "/lib/:commit")
    status, out, _ = srv.req("POST", "/lib/:search",
                             {"_query": {"title": "whale"}})
    assert status == 200
    assert out["total"] == 2
    assert all("_score" in h and "_id" in h for h in out["hits"])
    # query-string search
    status, out, _ = srv.req("GET", "/lib/:search?q=title:whale")
    assert status == 200 and out["total"] == 2
    # range + sort
    status, out, _ = srv.req("POST", "/lib/:search", {
        "_query": {"price": {"_from": 20}},
        "_sort": [{"price": {"_order": "desc"}}]})
    assert [h["_id"] for h in out["hits"]] == ["2", "1"]
    # count
    status, out, _ = srv.req("POST", "/lib/:count",
                             {"_query": {"title": "whale"}})
    assert out["count"] == 2
    # custom verb
    status, out, _ = srv.req("SEARCH", "/lib/",
                             {"_query": {"title": "whale"}})
    assert status == 200 and out["total"] == 2


def test_aggregations_via_rest(srv):
    for i in range(6):
        srv.req("PUT", f"/shop/{i}",
                {"price": 10 * (i + 1), "cat": ["a", "b", "c"][i % 3]})
    srv.req("POST", "/shop/:commit")
    status, out, _ = srv.req("POST", "/shop/:search", {
        "_query": {"_match_all": {}}, "_limit": 0,
        "_aggs": {"avg_price": {"_avg": {"_field": "price"}},
                  "cats": {"_terms": {"_field": "cat"}}}})
    assert status == 200
    assert out["aggregations"]["avg_price"]["_avg"] == 35.0
    cats = {b["_key"]: b["_doc_count"]
            for b in out["aggregations"]["cats"]}
    assert cats == {"a": 2, "b": 2, "c": 2}


def test_patch_and_update(srv):
    srv.req("PUT", "/p/1", {"a": {"b": 1}, "tags": ["x"]})
    status, out, _ = srv.req("PATCH", "/p/1", [
        {"op": "replace", "path": "/a/b", "value": 9},
        {"op": "add", "path": "/tags/-", "value": "y"}])
    assert status == 200
    _, doc, _ = srv.req("GET", "/p/1")
    assert doc["a"]["b"] == 9 and doc["tags"] == ["x", "y"]
    status, out, _ = srv.req("UPDATE", "/p/1", {"a": {"c": 2}})
    assert status == 200
    _, doc, _ = srv.req("GET", "/p/1")
    assert doc["a"] == {"b": 9, "c": 2}


def test_store_blob_roundtrip(srv):
    srv.req("PUT", "/m/1", {"name": "img"})
    payload = b"\x89PNGfakebytes" * 100
    status, out, _ = srv.req("STORE", "/m/1", payload,
                             headers={"Content-Type": "image/png"})
    assert status == 200 and out["#stored"] == "image/png"


def test_metadata_info_check_wal(srv):
    srv.req("PUT", "/meta-idx/1", {"x": 1}, headers={})
    srv.req("POST", "/meta-idx/:commit")
    status, out, _ = srv.req("PUT", "/meta-idx/:metadata",
                             {"owner": "tests", "n": 3})
    assert status == 200
    status, out, _ = srv.req("GET", "/meta-idx/:metadata")
    assert out["owner"] == "tests" and out["n"] == 3
    status, out, _ = srv.req("GET", "/meta-idx/:info")
    assert out["doc_count"] == 1 and out["revision"] >= 1
    status, out, _ = srv.req("GET", "/meta-idx/:check")
    assert out["ok"] is True
    status, out, _ = srv.req("GET", "/meta-idx/:wal")
    ops = [l["op"] for l in out["wal"]]
    assert "replace_document" in ops and "commit" in ops


def test_dump_restore_roundtrip(srv):
    for i in range(5):
        srv.req("PUT", f"/src-idx/{i}", {"n": i})
    srv.req("POST", "/src-idx/:commit")
    status, out, _ = srv.req("GET", "/src-idx/:dump")
    docs = out["#dump"]
    assert len(docs) == 5
    status, out, _ = srv.req("POST", "/dst-idx/:restore", docs)
    assert out["#restored"] == 5
    status, out, _ = srv.req("GET", "/dst-idx/:info")
    assert out["doc_count"] == 5


def test_msgpack_negotiation(srv):
    import msgpack

    body = msgpack.packb({"title": "binary doc"})
    status, out, ct = srv.req(
        "PUT", "/neg/1", body,
        headers={"Content-Type": "application/x-msgpack",
                 "Accept": "application/x-msgpack"}, raw=True)
    assert status == 200 and "msgpack" in ct
    assert msgpack.unpackb(out)["_id"] == "1"
    # yaml out
    status, out, ct = srv.req("GET", "/neg/1",
                              headers={"Accept": "application/yaml"},
                              raw=True)
    assert status == 200 and "yaml" in ct
    import yaml

    assert yaml.safe_load(out)["title"] == "binary doc"


def test_metrics_endpoint(srv):
    status, out, ct = srv.req("GET", "/:metrics", raw=True)
    assert status == 200
    assert b"xapiand_operations" in out


def test_error_shapes(srv):
    status, out, _ = srv.req("GET", "/no-such-index/:info")
    assert status == 404 and "#message" in out["#error"]
    status, out, _ = srv.req("PUT", "/bad%20name%21/1", {"a": 1})
    assert status == 400
    status, out, _ = srv.req("POST", "/lib/:search", {"_query": {"_bogus": 1}})
    assert status == 400


def test_index_delete(srv):
    srv.req("PUT", "/tmp-idx/1", {"a": 1})
    status, out, _ = srv.req("DELETE", "/tmp-idx/")
    assert status == 200
    status, out, _ = srv.req("GET", "/tmp-idx/:info")
    assert status == 404


def test_weight_scheme_selection(srv):
    for i, t in enumerate(["alpha beta gamma", "beta beta delta",
                           "gamma delta epsilon"]):
        srv.req("PUT", f"/wsel/{i}", {"text": t})
    srv.req("POST", "/wsel/:commit")
    scores = {}
    for scheme in ("bm25", "tfidf", "pl2", "lm",
                   {"_scheme": "bm25", "k1": 1.2, "b": 0.75}):
        status, out, _ = srv.req("POST", "/wsel/:search", {
            "_query": {"text": "beta"}, "_weight": scheme})
        assert status == 200 and out["total"] == 2, (scheme, out)
        key = scheme if isinstance(scheme, str) else "bm25-tuned"
        scores[key] = {h["_id"]: h["_score"] for h in out["hits"]}
    # different schemes produce different absolute scores
    assert scores["bm25"] != scores["tfidf"]
    # doc 1 has beta twice: must rank first under every scheme
    for key, sc in scores.items():
        assert max(sc, key=sc.get) == "1", (key, sc)
    # bad scheme name is a clean 400
    status, out, _ = srv.req("POST", "/wsel/:search", {
        "_query": {"text": "beta"}, "_weight": "nope"})
    assert status == 400


def test_versioning_optimistic_concurrency(srv):
    # ≙ docs/_docs/reference-guide/documents/versioning.md
    status, out, _ = srv.req("PUT", "/vc/1", {"title": "first"})
    assert out["_version"] == 1
    status, out, _ = srv.req("GET", "/vc/1")
    assert out["_version"] == 1
    # matching version succeeds and bumps
    status, out, _ = srv.req("PUT", "/vc/1?version=1", {"title": "second"})
    assert status == 200 and out["_version"] == 2
    # stale version -> 409 Conflict
    status, out, _ = srv.req("PUT", "/vc/1?version=1", {"title": "third"})
    assert status == 409
    # _version in the body works too
    status, out, _ = srv.req("PUT", "/vc/1", {"title": "third",
                                              "_version": 2})
    assert status == 200 and out["_version"] == 3
    # delete with stale version -> 409; with current -> ok
    status, out, _ = srv.req("DELETE", "/vc/1?version=1")
    assert status == 409
    status, out, _ = srv.req("DELETE", "/vc/1?version=3")
    assert status == 200
    # recreate starts fresh at 1
    status, out, _ = srv.req("PUT", "/vc/1", {"title": "reborn"})
    assert out["_version"] == 1


def test_bulk_restore_pipeline(srv):
    # list form with counters (≙ RESTORE response http_client.cc:2261-2285)
    docs = [{"_id": str(i), "val": i, "body": f"doc number {i}"}
            for i in range(40)]
    status, out, _ = srv.req("POST", "/bulk/:restore", docs)
    assert status == 200
    assert out["#prepared"] == 40 and out["#indexed"] == 40
    assert out["#total"] == 40 and out["#items"] == []
    status, out, _ = srv.req("POST", "/bulk/:search",
                             {"_query": {"body": "number"}})
    assert out["total"] == 40
    # ndjson streaming form
    nd = "\n".join('{"_id": "n%d", "body": "stream doc"}' % i
                   for i in range(10)).encode()
    status, out, _ = srv.req("POST", "/bulk2/:restore", nd,
                             headers={"Content-Type":
                                      "application/x-ndjson"})
    assert status == 200 and out["#indexed"] == 10, out
    status, out, _ = srv.req("POST", "/bulk2/:count",
                             {"_query": {"body": "stream"}})
    assert out["count"] == 10


def test_selectors(srv):
    srv.req("PUT", "/sel/1", {"name": "ada", "contact": {
        "email": "ada@x.com", "phone": "123", "city": "london"},
        "balance": 10})
    srv.req("POST", "/sel/:commit")
    # field selector
    status, out, _ = srv.req("POST", "/sel/:search", {
        "_query": "*", "_selector": "{name,balance}"})
    h = out["hits"][0]
    assert h["name"] == "ada" and h["balance"] == 10
    assert "contact" not in h
    # drill selector
    status, out, _ = srv.req("POST", "/sel/:search", {
        "_query": "*", "_selector": "contact.email"})
    assert out["hits"][0]["_selected"] == "ada@x.com"
    # mixed
    status, out, _ = srv.req("POST", "/sel/:search", {
        "_query": "*", "_selector": "contact.{email,phone}"})
    h = out["hits"][0]
    assert h["email"] == "ada@x.com" and h["phone"] == "123"
    assert "city" not in h
    # GET with ?selector=
    status, out, _ = srv.req("GET", "/sel/1?selector=contact.city")
    assert out["_selected"] == "london"


def test_collapse_max_and_check_at_least(srv):
    for i, (grp, sc) in enumerate([("a", "x x x x"), ("a", "x x x"),
                                   ("a", "x x"), ("b", "x")]):
        srv.req("PUT", f"/cm/{i}", {"g": grp, "body": sc})
    srv.req("POST", "/cm/:commit")
    # default collapse: 1 per group
    status, out, _ = srv.req("POST", "/cm/:search", {
        "_query": {"body": "x"}, "_collapse": {"_field": "g"},
        "_check_at_least": 1000})
    assert status == 200
    ids = [h["_id"] for h in out["hits"]]
    assert len(ids) == 2
    # _max 2: two best docs of group a + one of b
    status, out, _ = srv.req("POST", "/cm/:search", {
        "_query": {"body": "x"}, "_collapse": {"_field": "g", "_max": 2}})
    ids = [h["_id"] for h in out["hits"]]
    assert len(ids) == 3 and "3" in ids


def test_multi_index_search(srv):
    srv.req("PUT", "/mi1/1", {"body": "shared needle alpha"})
    srv.req("POST", "/mi1/:commit")
    srv.req("PUT", "/mi2/2", {"body": "shared needle needle beta"})
    srv.req("POST", "/mi2/:commit")
    status, out, _ = srv.req("POST", "/mi1,mi2/:search",
                             {"_query": {"body": "needle"}})
    assert status == 200 and out["total"] == 2
    assert {h["_index"] for h in out["hits"]} == {"mi1", "mi2"}
    # doc with needle twice ranks first
    assert out["hits"][0]["_id"] == "2"
    status, out, _ = srv.req("POST", "/mi1,mi2/:search", {
        "_query": {"body": "needle"},
        "_aggs": {"n": {"_count": {}}}})
    assert status == 400


def test_blob_retrieval_by_accept(srv):
    srv.req("PUT", "/bl/1", {"name": "photo"})
    payload = b"\x89PNG-not-really" * 50
    srv.req("STORE", "/bl/1", payload,
            headers={"Content-Type": "image/png"})
    # Accept matching the stored type streams the blob
    status, out, ct = srv.req("GET", "/bl/1",
                              headers={"Accept": "image/png"}, raw=True)
    assert status == 200 and ct.startswith("image/png")
    assert out == payload
    # default Accept returns the JSON document
    status, out, _ = srv.req("GET", "/bl/1")
    assert out["name"] == "photo"


def test_document_info(srv):
    srv.req("PUT", "/di/1", {"title": "quick brown fox", "price": 42})
    srv.req("POST", "/di/:commit")
    status, out, _ = srv.req("GET", "/di/1/:info")
    assert status == 200
    assert out["_id"] == "1" and out["_version"] == 1
    words = [t for t in out["terms"] if t.endswith("quick")]
    assert words, out["terms"]
    assert any(v == 42 for v in out["values"].values())
    # index info still works
    status, out, _ = srv.req("GET", "/di/:info")
    assert out["doc_count"] == 1


def test_autocommit_debouncer(tmp_path):
    """Writes without ?commit become searchable after the committer
    debounce fires (≙ reference committer, handler.h:398-401)."""
    import time as _time

    from xapiand_tpu.server.app import IndexManager

    class AutoServer(ServerThread):
        def _run(self):
            from aiohttp import web

            async def start():
                from xapiand_tpu.server.app import create_app

                app = create_app(manager=IndexManager(
                    self.data_dir, autocommit_s=0.2,
                    autocommit_force_s=0.6))
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

    s = AutoServer.__new__(AutoServer)
    s.data_dir = str(tmp_path / "auto")
    s.http_port = 0
    s.cluster_config = None
    s.port = None
    s._loop = None
    s._started = threading.Event()
    s._thread = threading.Thread(target=s._run, daemon=True)
    s._thread.start()
    assert s._started.wait(30)
    try:
        s.req("PUT", "/auto/1", {"body": "lazy commit"})   # no ?commit
        deadline = _time.time() + 10
        total = 0
        while _time.time() < deadline:
            _st, out, _ = s.req("POST", "/auto/:search",
                                {"_query": {"body": "lazy"}})
            total = out.get("total", 0)
            if total:
                break
            _time.sleep(0.1)
        assert total == 1, "autocommit never fired"
        # the commit was real: revision advanced, WAL has a commit line
        _st, info, _ = s.req("GET", "/auto/:info")
        assert info["revision"] >= 1
    finally:
        s.stop()


def test_explicit_and_foreign_schema(srv):
    """PUT /idx/ with _schema: explicit field types; a foreign/object
    schema is stored as a document in another index and shared between
    indexes (explicit-types.md + foreign-schemas.md)."""
    # explicit inline schema
    status, out, _ = srv.req("PUT", "/headlines/", {
        "_schema": {
            "_type": "foreign/object",
            "_foreign": ".schemas/319b4e5e-41af-4906-b3cd-cce91502dda3",
            "title": {"_type": "text"},
            "kind": {"_type": "keyword"},
        }})
    assert status in (200, 201), out
    # the shared schema document exists in .schemas
    status, doc, _ = srv.req(
        "GET", "/.schemas/319b4e5e-41af-4906-b3cd-cce91502dda3")
    assert status == 200
    assert doc["_schema_props"]["title"]["_type"] == "text"
    # the index uses the schema: keyword stays one term, text stems
    srv.req("PUT", "/headlines/1?commit",
            {"title": "running shoes", "kind": "Sports News"})
    status, out, _ = srv.req("POST", "/headlines/:search",
                             {"_query": {"title": "running"}})
    assert out["count"] == 1
    status, out, _ = srv.req("POST", "/headlines/:search",
                             {"_query": {"kind": "Sports News"}})
    assert out["count"] == 1

    # a second index sharing the same foreign schema adopts it
    status, out, _ = srv.req("PUT", "/banners/", {
        "_schema": {
            "_type": "foreign/object",
            "_foreign": ".schemas/319b4e5e-41af-4906-b3cd-cce91502dda3",
        }})
    assert status in (200, 201), out
    status, sch, _ = srv.req("GET", "/banners/:schema")
    assert sch["schema"]["title"]["_type"] == "text", sch

    # plain explicit (non-foreign) schema
    status, out, _ = srv.req("PUT", "/plainidx/", {
        "_schema": {"price": {"_type": "integer"}}})
    assert status in (200, 201)
    srv.req("PUT", "/plainidx/1?commit", {"price": 7})
    status, out, _ = srv.req("POST", "/plainidx/:search",
                             {"_query": {"price": {"_from": 5, "_to": 9}}})
    assert out["count"] == 1


def test_api_conventions(srv):
    """api.md conventions: relaxed JSON (comments + trailing commas),
    X-HTTP-Method-Override on POST, dotted field expansion."""
    body = b"""{
      // single-line comment
      "contact.address.country.name": "Italy", /* block comment */
      "tag": "conv",
    }"""
    status, out, _ = srv.req("PUT", "/conv/1?commit", body,
                             headers={"Content-Type": "application/json"})
    assert status == 200, out
    # dotted key expanded == nested object form
    status, out, _ = srv.req("POST", "/conv/:search", {
        "_query": {"contact": {"address": {"country": {"name": "Italy"}}}}})
    assert out["count"] == 1
    status, out, _ = srv.req("POST", "/conv/:search", {
        "_query": {"contact.address.country.name": "Italy"}})
    assert out["count"] == 1
    # method override: POST masquerading as SEARCH
    status, out, _ = srv.req("POST", "/conv/", {"_query": {"tag": "conv"}},
                             headers={"X-HTTP-Method-Override": "SEARCH"})
    assert status == 200 and out["count"] == 1, out
    # override on non-POST errors
    status, out, _ = srv.req("GET", "/conv/",
                             headers={"X-HTTP-Method-Override": "DELETE"})
    assert status == 400


def test_python_client(srv):
    """The bundled Python client (xapiand_tpu.client.Xapiand, the
    contrib/python/xapiand-py analog) drives the whole surface."""
    from xapiand_tpu.client import ConflictError, NotFoundError, Xapiand

    c = Xapiand(f"127.0.0.1:{srv.port}")
    assert c.ping()
    assert c.info()["name"] == "xapiand-tpu"

    out = c.documents.index("pycli", {"body": "hello client", "n": 1},
                            id="1", commit=True)
    assert out["_id"] == "1" and out["_version"] == 1
    assert c.exists("pycli", "1") and not c.exists("pycli", "nope")
    doc = c.get("pycli", "1")
    assert doc["n"] == 1
    # versioned write conflict
    with pytest.raises(ConflictError):
        c.documents.index("pycli", {"n": 2}, id="1", commit=True,
                          version=99)
    c.documents.patch("pycli", "1",
                      [{"op": "incr", "path": "/n", "value": 4}],
                      commit=True)
    assert c.get("pycli", "1")["n"] == 5
    c.documents.update("pycli", "1", {"extra": "x"}, commit=True)
    assert c.get("pycli", "1")["extra"] == "x"
    # native UPSERT verb: creates when absent, merges when present
    out = c.documents.upsert("pycli", "9", {"n": 9}, commit=True)
    assert out["_version"] == 1
    out = c.documents.upsert("pycli", "9", {"m": 1}, commit=True)
    assert out["_version"] == 2
    assert c.get("pycli", "9", volatile=True)["n"] == 9

    r = c.search("pycli", {"_query": {"body": "hello"}}, volatile=True)
    assert r["count"] == 1
    assert c.count("pycli", {"_query": {"_match_all": {}}})["count"] == 2
    c.documents.delete("pycli", "9", commit=True)
    # durable checkpoint via the client (POST :snapshot)
    snap = c.indices.snapshot("pycli")
    assert "#snapshot" in snap

    # bulk restore + settings/schema views
    c.indices.restore("pycli2",
                      [{"_id": str(i), "body": f"doc w{i % 5}"}
                       for i in range(50)])
    assert c.count("pycli2", {"_query": {"_match_all": {}}})["count"] == 50
    assert "schema" in c.indices.get_schema("pycli2")
    c.documents.delete("pycli", "1", commit=True)
    with pytest.raises(NotFoundError):
        c.get("pycli", "1")


def test_update_strict_vs_upsert(srv):
    # UPDATE merges into an EXISTING doc only (handler.cc:554-585
    # update(create=false)): 404 when absent
    status, out, _ = srv.req("UPDATE", "/ups/missing", {"a": 1})
    assert status == 404
    # UPSERT creates when absent (http_client.cc:1601-1607 create=true)
    status, out, _ = srv.req("UPSERT", "/ups/1", {"a": {"b": 1}, "n": 1})
    assert status == 200 and out["_version"] == 1
    # ... and merges (recursively, MsgPack::update semantics) when present
    status, out, _ = srv.req("UPSERT", "/ups/1", {"a": {"c": 2}})
    assert status == 200 and out["_version"] == 2
    _, doc, _ = srv.req("GET", "/ups/1")
    assert doc["a"] == {"b": 1, "c": 2} and doc["n"] == 1
    # the :upsert command path is the method-override spelling
    status, _, _ = srv.req("POST", "/ups/2/:upsert", {"x": 1})
    assert status == 200
    status, _, _ = srv.req("POST", "/ups/3/:update", {"x": 1})
    assert status == 404


def test_options_allow_header(srv):
    # capability discovery (http_client.cc:296 Allow header)
    import urllib.request
    for path in ("/", "/someindex/"):
        r = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}{path}", method="OPTIONS")
        with urllib.request.urlopen(r, timeout=60) as resp:
            assert resp.status == 200
            allow = resp.headers.get("Allow", "")
        for verb in ("GET", "SEARCH", "UPSERT", "COMMIT", "RESTORE"):
            assert verb in allow, (path, allow)


def test_admin_commands_gated(srv):
    # FLUSH and QUIT are refused without --admin-commands
    # (opts.admin_commands, http_client.cc:1169/1193)
    status, out, _ = srv.req("FLUSH", "/")
    assert status == 405
    status, out, _ = srv.req("QUIT", "/")
    assert status == 405


def test_admin_flush_and_quit(tmp_path):
    s = ServerThread(str(tmp_path / "admin"),
                     server_opts={"admin_commands": True})
    try:
        s.req("PUT", "/adm/1", {"body": "hello flush"}, )
        status, out, _ = s.req("FLUSH", "/")
        assert status == 200 and out["#databases_flushed"] >= 1
        # flushed index reopens lazily with its data intact
        status, doc, _ = s.req("GET", "/adm/1")
        assert status == 200 and doc["body"] == "hello flush"
        # QUIT only applies to the bare path
        status, _, _ = s.req("QUIT", "/adm/")
        assert status == 405
        fired = []
        s.server.on_quit = lambda: fired.append(True)
        status, out, _ = s.req("QUIT", "/")
        assert status == 200 and out["#quit"] is True
        import time as _t
        deadline = _t.time() + 5
        while not fired and _t.time() < deadline:
            _t.sleep(0.05)
        assert fired   # the shutdown hook fired after the response
    finally:
        s.stop()


def test_restore_op_type_lines(srv):
    """RESTORE lines may carry _op_type: index (default) / update / merge /
    patch (handler.cc:1005-1060 prepare_documents op dispatch)."""
    patch_line = json.dumps({"_id": "2", "_op_type": "patch", "_patch": [
        {"op": "incr", "path": "/a", "value": 10}]})
    nd = "\n".join([
        '{"_id": "1", "a": 1, "tag": "x"}',
        '{"_id": "2", "a": 2, "tag": "y"}',
        '{"_id": "1", "_op_type": "update", "b": 5}',
        '{"_id": "3", "_op_type": "index", "a": 3}',
        patch_line,
    ]) + "\n"
    status, out, _ = srv.req(
        "POST", "/opty/:restore", nd.encode(),
        headers={"Content-Type": "application/x-ndjson"})
    assert status == 200, out
    assert out["#restored"] == 5
    srv.req("POST", "/opty/:commit")
    _, d1, _ = srv.req("GET", "/opty/1")
    assert d1["a"] == 1 and d1["b"] == 5 and d1["tag"] == "x"
    _, d2, _ = srv.req("GET", "/opty/2")
    assert d2["a"] == 12
    _, d3, _ = srv.req("GET", "/opty/3")
    assert d3["a"] == 3
    # unknown op rejected
    status, out, _ = srv.req(
        "POST", "/opty/:restore", b'{"_id": "9", "_op_type": "zap"}\n',
        headers={"Content-Type": "application/x-ndjson"})
    assert status == 400


def test_inline_data_blobs(srv):
    """Writes may carry _data to attach blobs inline (handler.cc:153
    inject_data): string -> octet-stream, object(s) with _blob +
    _content_type, null -> erase."""
    status, out, _ = srv.req("PUT", "/blobs/1?commit", {
        "name": "pic",
        "_data": [{"_blob": "png-bytes-here", "_content_type": "image/png"},
                  {"_blob": "plain", "_content_type": "text/plain"}]})
    assert status == 200, out
    status, raw, ct = srv.req("GET", "/blobs/1", raw=True,
                              headers={"Accept": "image/png"})
    assert status == 200 and raw == b"png-bytes-here" and "png" in ct
    # string form -> application/octet-stream
    srv.req("UPDATE", "/blobs/1?commit", {"_data": "rawdata"})
    status, raw, _ = srv.req("GET", "/blobs/1", raw=True,
                             headers={"Accept": "application/octet-stream"})
    assert status == 200 and raw == b"rawdata"
    # the document body itself is untouched by _data
    _, doc, _ = srv.req("GET", "/blobs/1")
    assert doc["name"] == "pic" and "_data" not in doc
    # null erases the octet-stream blob
    srv.req("UPDATE", "/blobs/1?commit", {"_data": None})
    status, _, _ = srv.req("GET", "/blobs/1", raw=True,
                           headers={"Accept": "application/octet-stream"})
    assert status == 404 or status == 200  # erased -> JSON doc fallback
    # malformed object rejected
    status, out, _ = srv.req("PUT", "/blobs/2", {
        "x": 1, "_data": {"_blob": "b"}})
    assert status == 400


def test_per_request_response_shaping(srv):
    """?human / ?echo / ?comments per-request overrides
    (http_client.cc:2739-2781)."""
    srv.req("PUT", "/shape/1?commit", {"v": 1})
    # ?human: #took rendered as a string with units
    _, out, _ = srv.req("GET", "/shape/1?human")
    assert isinstance(out["#took"], str) and out["#took"].endswith("ms")
    # ?comments=false strips # fields
    _, out, _ = srv.req("GET", "/shape/1?comments=false")
    assert not any(k.startswith("#") for k in out)
    # ?echo: write response carries the stored body
    _, out, _ = srv.req("PUT", "/shape/2?commit&echo", {"name": "zz"})
    assert out.get("name") == "zz"
    # ?pretty=false overrides a hypothetical server-level pretty
    status, raw, _ = srv.req("GET", "/shape/1?pretty", raw=True)
    assert b"\n" in raw
    status, raw, _ = srv.req("GET", "/shape/1?pretty=false", raw=True)
    assert b"\n  " not in raw
