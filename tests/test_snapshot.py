"""Binary snapshot / durable checkpoint / O(bytes) replica bootstrap.

Covers the reference's replication full-copy path (raw file stream +
temp-swap, src/server/replication_protocol_client.h:68-80, .cc:547-583)
and its restart-from-committed-tables durability (glass tables are opened,
never re-analysed): models/snapshot.py serialises committed flat-array
state, Database.checkpoint() persists it + prunes the WAL below it, and
replication.full_copy prefers a ``GET :snapshot`` byte stream over
``:dump`` + re-index.
"""

import asyncio
import os

import pytest

from test_rest import ServerThread
from xapiand_tpu.database import Database
from xapiand_tpu.models.snapshot import (SNAPSHOT_FILE, checkpoint_path,
                                         load_snapshot_bytes, snapshot_bytes,
                                         write_checkpoint)


def _fill(db, n=30):
    for i in range(n):
        db.index_document(
            {"title": f"hello world {i}", "body": f"text number {i}",
             "price": i % 7, "tag": f"t{i % 3}"}, doc_id=f"d{i}")
    db.commit()


def _no_reanalysis(monkeypatch):
    """Any tokenization during the patched scope is a hard failure."""
    from xapiand_tpu.schema import Schema

    def boom(self, *a, **kw):
        raise AssertionError("schema.index called: snapshot path re-analysed")

    monkeypatch.setattr(Schema, "index", boom)


def test_checkpoint_restart_roundtrip(tmp_path):
    path = str(tmp_path / "db")
    db = Database(path=path)
    _fill(db)
    db.delete_document("d3", commit=True)
    db.set_metadata("owner", "snapshot-tests")
    db.store_blob("d1", "image/png", b"\x89PNG fake bytes")
    ckpt = db.checkpoint()
    assert ckpt == checkpoint_path(path) and os.path.exists(ckpt)
    r1 = db.search({"title": "hello"}, k=8)
    rev = db.revision
    db.close()

    db2 = Database(path=path)
    assert db2.revision == rev
    assert db2.doc_count == 29
    assert db2.get_metadata("owner") == "snapshot-tests"
    assert db2.get_blob("d1", "image/png") == b"\x89PNG fake bytes"
    assert db2.version_of("d5") == 1
    r2 = db2.search({"title": "hello"}, k=8)
    assert [(h.id, pytest.approx(h.score)) for h in r1.hits] == \
        [(h.id, h.score) for h in r2.hits]
    # post-checkpoint tail still replays on the next open
    db2.index_document({"title": "hello late arrival"}, doc_id="late",
                       commit=True)
    db2.close()
    db3 = Database(path=path)
    assert db3.search({"title": "late"}, k=5).total == 1
    assert db3.doc_count == 30
    db3.close()


def test_checkpoint_reopen_skips_reanalysis(tmp_path, monkeypatch):
    path = str(tmp_path / "db")
    db = Database(path=path)
    _fill(db)
    db.checkpoint()
    total = db.search({"title": "hello"}, k=5).total
    db.close()

    _no_reanalysis(monkeypatch)
    db2 = Database(path=path)   # open = load bytes + empty tail: no analysis
    assert db2.search({"title": "hello"}, k=5).total == total
    db2.close()


def test_corrupt_checkpoint_falls_back_to_wal(tmp_path):
    path = str(tmp_path / "db")
    db = Database(path=path)
    _fill(db, n=10)
    db.checkpoint()
    db.close()

    ckpt = checkpoint_path(path)
    data = bytearray(open(ckpt, "rb").read())
    data[len(data) // 2] ^= 0xFF   # flip a payload byte: checksum mismatch
    with open(ckpt, "wb") as fh:
        fh.write(data)

    db2 = Database(path=path)   # full WAL replay, from a clean slate
    assert db2.doc_count == 10
    assert db2.search({"title": "hello"}, k=5).total == 10
    db2.close()


def test_checkpoint_prunes_wal_volumes(tmp_path, monkeypatch):
    import xapiand_tpu.index.wal as walmod

    monkeypatch.setattr(walmod, "MAX_LINES_PER_VOLUME", 4)
    path = str(tmp_path / "db")
    db = Database(path=path)
    for i in range(12):   # commit per doc: forces volume rotation
        db.index_document({"title": f"hello {i}"}, doc_id=f"d{i}",
                          commit=True)
    wal_dir = os.path.join(path, "wal")
    before = [f for f in os.listdir(wal_dir) if f.startswith("wal.")]
    assert len(before) > 2
    db.checkpoint()
    after = [f for f in os.listdir(wal_dir) if f.startswith("wal.")]
    assert len(after) < len(before)
    db.close()

    db2 = Database(path=path)   # restart = snapshot + surviving tail only
    assert db2.doc_count == 12
    db2.index_document({"title": "post prune"}, doc_id="pp", commit=True)
    db2.close()
    db3 = Database(path=path)
    assert db3.doc_count == 13
    db3.close()


def test_checkpoint_reopen_does_not_regrow_datastore(tmp_path):
    path = str(tmp_path / "db")
    db = Database(path=path)
    _fill(db, n=5)
    db.store_blob("d1", "application/pdf", b"%PDF" + b"x" * 5000)
    db.checkpoint()
    db.close()
    blobfile = os.path.join(path, "docdata")
    size1 = os.path.getsize(blobfile)
    for _ in range(3):   # locator reuse: reopen must not re-append bytes
        db = Database(path=path)
        assert db.get_blob("d1", "application/pdf")[:4] == b"%PDF"
        db.close()
    assert os.path.getsize(blobfile) == size1


def test_snapshot_bytes_bootstrap_without_reanalysis(tmp_path, monkeypatch):
    primary = Database(path=str(tmp_path / "p"))
    _fill(primary)
    primary.store_blob("d2", "text/csv", b"a,b\n1,2\n")
    data = snapshot_bytes(primary)
    r1 = primary.search({"body": "text"}, k=10)
    primary.close()

    _no_reanalysis(monkeypatch)
    replica = Database(path=str(tmp_path / "r"))
    replica._replaying = True
    n = load_snapshot_bytes(replica, data)
    replica._replaying = False
    replica.wal.reset(replica.revision)
    write_checkpoint(replica)
    assert n == 30
    r2 = replica.search({"body": "text"}, k=10)
    assert [(h.id, pytest.approx(h.score)) for h in r1.hits] == \
        [(h.id, h.score) for h in r2.hits]
    assert replica.get_blob("d2", "text/csv") == b"a,b\n1,2\n"
    replica.close()
    # the bootstrapped replica restarts from its own checkpoint
    replica2 = Database(path=str(tmp_path / "r"))
    assert replica2.doc_count == 30
    replica2.close()


def test_sharded_snapshot_bootstrap(tmp_path, monkeypatch):
    from xapiand_tpu.parallel.sharded_db import ShardedDatabase

    primary = ShardedDatabase(path=str(tmp_path / "p"), n_shards=4)
    for i in range(60):
        primary.index_document({"title": f"hello world {i}", "price": i % 7},
                               doc_id=f"d{i}")
    primary.commit()
    for i in range(60, 90):
        primary.index_document({"title": f"more text {i}"}, doc_id=f"d{i}")
    primary.commit()
    primary.delete_document("d5", commit=True)
    r1 = primary.search({"title": "hello"}, k=10)
    data = snapshot_bytes(primary)
    primary.close()

    _no_reanalysis(monkeypatch)
    rep = ShardedDatabase(path=str(tmp_path / "r"), n_shards=4)
    rep._replaying = True
    assert load_snapshot_bytes(rep, data) == 89
    rep._replaying = False
    rep.wal.reset(rep.revision)
    write_checkpoint(rep)
    r2 = rep.search({"title": "hello"}, k=10)
    assert [(h.id, pytest.approx(h.score)) for h in r1.hits] == \
        [(h.id, h.score) for h in r2.hits]
    rep.close()
    rep2 = ShardedDatabase(path=str(tmp_path / "r"), n_shards=4)
    assert len(rep2._generations) == 2   # generation plane survives restart
    assert rep2.search({"title": "hello"}, k=10).hits[0].id == r1.hits[0].id
    rep2.close()


@pytest.fixture()
def srv(tmp_path):
    s = ServerThread(str(tmp_path / "server"))
    yield s
    s.stop()


def test_rest_snapshot_endpoints(srv, tmp_path):
    for i in range(15):
        srv.req("PUT", f"/snapidx/d{i}", {"title": f"hello world {i}"})
    status, out, _ = srv.req("POST", "/snapidx/:snapshot")
    assert status == 200 and out["revision"] >= 1
    assert os.path.exists(out["#snapshot"])

    status, raw, ct = srv.req("GET", "/snapidx/:snapshot", raw=True)
    assert status == 200 and ct.startswith("application/octet-stream")
    assert raw[:8] == b"XPSNAP01"

    local = Database()
    local._replaying = True
    assert load_snapshot_bytes(local, raw) == 15
    local._replaying = False
    status, rest_out, _ = srv.req(
        "SEARCH", "/snapidx/", {"_query": {"title": "hello"}, "_limit": 5})
    ids = [h["_id"] for h in rest_out["hits"]]
    assert [h.id for h in local.search({"title": "hello"}, k=5).hits] == ids


def test_full_copy_prefers_snapshot_stream(srv, tmp_path, monkeypatch):
    from xapiand_tpu.parallel.replication import full_copy

    for i in range(25):
        srv.req("PUT", f"/repidx/d{i}",
                {"title": f"hello world {i}", "price": i % 5})
    srv.req("POST", "/repidx/:commit")
    status, info, _ = srv.req("GET", "/repidx/:info")
    assert status == 200

    _no_reanalysis(monkeypatch)   # bootstrap must be pure deserialisation
    replica = Database(path=str(tmp_path / "replica"))
    n = asyncio.run(full_copy(
        replica, f"http://127.0.0.1:{srv.port}", "repidx"))
    assert n == 25
    assert replica.revision == info["revision"]   # changeset pulls align
    assert os.path.exists(checkpoint_path(replica.path))
    status, rest_out, _ = srv.req(
        "SEARCH", "/repidx/", {"_query": {"title": "hello"}, "_limit": 8})
    assert [h.id for h in replica.search({"title": "hello"}, k=8).hits] == \
        [h["_id"] for h in rest_out["hits"]]
    replica.close()


def test_snapshot_file_excluded_from_wal_listing(tmp_path):
    # the checkpoint lives next to the wal dir, not inside it
    path = str(tmp_path / "db")
    db = Database(path=path)
    _fill(db, n=3)
    db.checkpoint()
    assert SNAPSHOT_FILE in os.listdir(path)
    assert SNAPSHOT_FILE not in os.listdir(os.path.join(path, "wal"))
    db.close()
