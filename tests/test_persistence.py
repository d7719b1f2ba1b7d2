"""Storage volume / WAL / database persistence / patcher tests (mirrors
oldtests/test_storage.cc, test_wal.cc, test_patcher.cc coverage intent)."""

import os

import pytest

from xapiand_tpu.database import Database, DocumentNotFound
from xapiand_tpu.index.storage import Storage, StorageCorruptVolume
from xapiand_tpu.index.wal import DatabaseWAL, WalOp
from xapiand_tpu.utils.patcher import PatchError, apply_patch


def test_storage_roundtrip(tmp_path):
    path = str(tmp_path / "vol.0")
    with Storage(path) as st:
        o1 = st.write(b"hello")
        o2 = st.write(b"x" * 10000)  # compressed
        assert st.read(o1) == b"hello"
        assert st.read(o2) == b"x" * 10000
    with Storage(path, writable=False) as st:
        assert [p for _, p in st.scan()] == [b"hello", b"x" * 10000]


def test_storage_detects_corruption(tmp_path):
    path = str(tmp_path / "vol.0")
    with Storage(path) as st:
        off = st.write(b"payload-payload-payload")
    with open(path, "r+b") as fh:
        fh.seek(off + 7)
        fh.write(b"\xff")
    with Storage(path, writable=False) as st:
        with pytest.raises(StorageCorruptVolume):
            st.read(off)
        assert list(st.scan()) == []  # scan stops cleanly


def test_storage_truncated_tail(tmp_path):
    path = str(tmp_path / "vol.0")
    with Storage(path) as st:
        st.write(b"first")
        st.write(b"second")
    size = os.path.getsize(path)
    with open(path, "r+b") as fh:
        fh.truncate(size - 3)
    with Storage(path, writable=False) as st:
        assert [p for _, p in st.scan()] == [b"first"]


def test_wal_append_replay(tmp_path):
    wal = DatabaseWAL(str(tmp_path / "wal"))
    wal.write_replace_document("1", {"a": 1})
    wal.write_replace_document("2", {"a": 2})
    wal.write_commit()
    wal.write_delete_document("1")
    wal.write_commit()
    assert wal.revision == 2
    lines = [e for _, e in wal.lines()]
    assert [l[0] for l in lines] == [WalOp.REPLACE_DOCUMENT,
                                     WalOp.REPLACE_DOCUMENT, WalOp.COMMIT,
                                     WalOp.DELETE_DOCUMENT, WalOp.COMMIT]
    # changesets from revision 1 only include the delete
    tail = [e for rev, e in wal.lines(from_revision=1)]
    assert [l[0] for l in tail] == [WalOp.DELETE_DOCUMENT, WalOp.COMMIT]
    wal.close()
    # reopen resumes the revision counter
    wal2 = DatabaseWAL(str(tmp_path / "wal"))
    assert wal2.revision == 2
    assert wal2.uuid == wal.uuid
    wal2.close()


def test_database_persistence_roundtrip(tmp_path):
    path = str(tmp_path / "db")
    db = Database(path=path)
    db.index_document({"body": "persistent search engine", "n": 7},
                      doc_id="a")
    db.index_document({"body": "volatile memory"}, doc_id="b")
    db.commit()
    db.delete_document("b", commit=True)
    db.set_metadata("owner", "tests")
    rev = db.revision
    db.close()

    db2 = Database(path=path)
    assert db2.revision == rev
    assert db2.doc_count == 1
    assert db2.get_metadata("owner") == "tests"
    res = db2.search({"body": "persistent"}, k=5)
    assert [h.id for h in res.hits] == ["a"]
    assert res.hits[0].data["n"] == 7
    with pytest.raises(DocumentNotFound):
        db2.get_document("b")
    db2.close()


def test_database_crash_recovery_uncommitted_tail(tmp_path):
    path = str(tmp_path / "db")
    db = Database(path=path)
    db.index_document({"body": "committed"}, doc_id="a", commit=True)
    db.index_document({"body": "tail zebra"}, doc_id="b")  # no commit
    db.close()  # crash before commit: WAL line exists

    db2 = Database(path=path)
    # the uncommitted tail is recovered from the WAL
    assert db2.search({"body": "zebra"}, k=5).total == 1
    db2.close()


def test_wal_recovery_truncates_corrupt_tail(tmp_path):
    """Writes committed AFTER a crash-recovery must survive the next open:
    recovery has to truncate the corrupt tail record before appending
    (reference wal.cc:251), else post-recovery records land after garbage
    that every later scan() stops at."""
    path = str(tmp_path / "db")
    db = Database(path=path)
    db.index_document({"body": "committed"}, doc_id="a", commit=True)
    db.close()

    # simulate a crash mid-append: garbage partial record at the WAL tail
    wal_dir = os.path.join(path, "wal")
    vols = [f for f in os.listdir(wal_dir) if f.startswith("wal.")]
    with open(os.path.join(wal_dir, sorted(vols)[-1]), "ab") as fh:
        fh.write(b"\xde\xad\xbe\xef\x00\x01")

    db2 = Database(path=path)
    db2.index_document({"body": "after recovery"}, doc_id="b", commit=True)
    db2.close()

    db3 = Database(path=path)
    assert db3.search({"body": "recovery"}, k=5).total == 1
    assert db3.get_document("b") is not None
    db3.close()


def test_database_dump_restore(tmp_path):
    db = Database()
    for i in range(10):
        db.index_document({"v": i, "body": f"doc number {i}"}, doc_id=str(i))
    db.commit()
    db.delete_document("3", commit=True)
    dump = list(db.dump_documents())
    assert len(dump) == 9
    db2 = Database()
    assert db2.restore_documents(dump) == 9
    assert db2.doc_count == 9
    assert db2.search({"body": "number"}, k=20).total == 9


def test_database_info_check_merge(tmp_path):
    db = Database(path=str(tmp_path / "db"))
    for i in range(20):
        db.index_document({"v": i}, doc_id=str(i), commit=(i % 7 == 0))
    db.commit()
    info = db.info()
    assert info["doc_count"] == 20 and info["segments"] >= 2
    assert db.check()["ok"]
    db.delete_document("5", commit=True)
    n = db.merge_segments()
    assert n == 19
    assert db.info()["segments"] == 1
    assert db.doc_count == 19
    db.close()


def test_blob_store(tmp_path):
    db = Database(path=str(tmp_path / "db"))
    db.index_document({"name": "pic"}, doc_id="p1", commit=True)
    db.store_blob("p1", "image/png", b"\x89PNG fake bytes" * 1000)
    assert db.get_blob("p1", "image/png").startswith(b"\x89PNG")
    assert "image/png" in db.blob_content_types("p1")
    with pytest.raises(DocumentNotFound):
        db.get_blob("p1", "image/jpeg")
    db.close()


# --- patcher -----------------------------------------------------------------

def test_patch_ops():
    doc = {"a": {"b": 1}, "arr": [1, 2, 3]}
    out = apply_patch(doc, [
        {"op": "add", "path": "/c", "value": True},
        {"op": "replace", "path": "/a/b", "value": 9},
        {"op": "add", "path": "/arr/1", "value": 99},
        {"op": "remove", "path": "/arr/0"},
        {"op": "move", "from": "/c", "path": "/moved"},
        {"op": "copy", "from": "/a", "path": "/a2"},
        {"op": "test", "path": "/a/b", "value": 9},
        {"op": "incr", "path": "/a/b", "value": 5},
        {"op": "decr", "path": "/a2/b", "value": 1},
    ])
    assert out == {"a": {"b": 14}, "arr": [99, 2, 3], "moved": True,
                   "a2": {"b": 8}}
    assert doc["a"]["b"] == 1  # original untouched


def test_patch_errors():
    with pytest.raises(PatchError):
        apply_patch({}, [{"op": "remove", "path": "/nope"}])
    with pytest.raises(PatchError):
        apply_patch({"x": 1}, [{"op": "test", "path": "/x", "value": 2}])
    with pytest.raises(PatchError):
        apply_patch({"x": "s"}, [{"op": "incr", "path": "/x"}])
    with pytest.raises(PatchError):
        apply_patch({"x": 9}, [{"op": "incr", "path": "/x", "value": 5,
                                "limit": 10}])


def test_fault_injection_and_recovery(tmp_path):
    """Chaos parity (--random-errors-io/db, opts.h:105-107): injected
    failures surface as errors; a restart after failures replays the WAL
    to a consistent state."""
    from xapiand_tpu.database import Database
    from xapiand_tpu.index.storage import StorageError, faults

    path = str(tmp_path / "chaos")
    db = Database(path=path)
    db.index_document({"n": 1}, doc_id="a", commit=True)

    faults.set_rates(io=1.0, seed=7)
    try:
        import pytest as _p
        with _p.raises(StorageError):
            db.index_document({"n": 2}, doc_id="b", commit=True)
    finally:
        faults.set_rates()          # off
    db.close()

    db2 = Database(path=path)       # WAL replay after the failure
    assert db2.get_document("a") == {"n": 1}
    assert db2.search({"n": 1}).total == 1
    db2.close()

    # db-level injection hits commit
    db3 = Database(path=str(tmp_path / "chaos2"))
    faults.set_rates(db=1.0)
    try:
        import pytest as _p
        with _p.raises(StorageError):
            db3.index_document({"n": 3}, doc_id="c", commit=True)
    finally:
        faults.set_rates()


def test_tiered_auto_compaction():
    """Segment count stays bounded under many small commits (≙ glass
    compaction keeping read fan-in low); results stay correct."""
    from xapiand_tpu.database import Database

    db = Database()
    db.auto_merge_segments = 6
    for i in range(20):
        db.index_document({"body": f"doc word{i} shared"}, doc_id=f"d{i}",
                          commit=True)
    assert len(db._searchers) <= 6 + 1
    assert db.doc_count == 20
    r = db.search({"body": "shared"}, k=25)
    assert r.total == 20
    r = db.search({"body": "word7"})
    assert r.total == 1 and r.hits[0].id == "d7"
    # deletes survive compaction
    db.delete_document("d7", commit=True)
    assert db.search({"body": "word7"}).total == 0
    assert db.doc_count == 19


def test_blob_erase_survives_restart(tmp_path):
    """STORE_BLOB with a null locator (the _data:null erase) must replay
    from the WAL: after restart the blob stays detached."""
    from xapiand_tpu.database import Database

    p = str(tmp_path / "bx")
    db = Database(path=p)
    db.index_document({"a": 1}, doc_id="1", commit=True)
    db.store_blob("1", "text/plain", b"hello")
    assert db.get_blob("1", "text/plain") == b"hello"
    db.delete_blob("1", "text/plain")
    db.close()

    db2 = Database(path=p)
    import pytest as _pytest
    with _pytest.raises(Exception):
        db2.get_blob("1", "text/plain")
    assert db2.get_document("1") == {"a": 1}
    db2.close()
