"""Enquire::set_cutoff analog + _check_at_least contract.

Reference anchors: handler.cc:1264 (enquire.set_cutoff(percent_threshold,
weight_threshold) per shard matcher), handler.cc:1443 (mset merger carries
the same thresholds), handler.cc:1113-1120 (_check_at_least parse: "must
be a unsigned int"). The reference's REST plane hard-codes both cutoff
thresholds to 0 (handler.cc:1165-1166), so exposing _cutoff /
_cutoff_weight is a strict superset of its surface; semantics follow the
Xapian contract (drop hits below percent-of-top or an absolute weight).
"""
import pytest

from xapiand_tpu.database import Database


def _mkdb(**kw):
    db = Database(path=None, **kw)
    docs = [
        ("d0", "apple apple apple apple banana"),
        ("d1", "apple apple apple cherry"),
        ("d2", "apple apple date"),
        ("d3", "apple elderberry"),
        ("d4", "fig grape"),
    ]
    for did, body in docs:
        db.index_document({"_id": did, "body": body})
    db.commit()
    return db


def _scores(db, query, **kw):
    res = db.search({"body": query}, **kw)
    return res, [h.score for h in res.hits]


def test_weight_cutoff_drops_low_hits():
    db = _mkdb()
    base, scores = _scores(db, "apple")
    assert len(base.hits) == 4
    thr = (scores[1] + scores[2]) / 2.0  # keep the top 2 only
    res, kept = _scores(db, "apple", weight_cutoff=thr)
    assert kept == scores[:2]
    assert [h.rank for h in res.hits] == [0, 1]
    # totals stay exact pre-cutoff counts (documented superset: the
    # reference degrades matches_estimated to estimates under cutoff)
    assert res.total == base.total == 4


def test_percent_cutoff_relative_to_top():
    db = _mkdb()
    base, scores = _scores(db, "apple")
    # pick a percent strictly between hit 2 and hit 1 relative scores
    pct = (scores[2] / scores[0]) * 100 + 1e-6
    assert pct < (scores[1] / scores[0]) * 100
    res, kept = _scores(db, "apple", percent_cutoff=pct)
    assert kept == scores[:2]
    # percent 0 = no filter
    res, kept = _scores(db, "apple", percent_cutoff=0)
    assert kept == scores


def test_cutoff_with_offset_renumbers_ranks():
    db = _mkdb()
    _, scores = _scores(db, "apple")
    thr = (scores[2] + scores[3]) / 2.0  # keep top 3
    res = db.search({"body": "apple"}, k=2, offset=1, weight_cutoff=thr)
    assert [h.score for h in res.hits] == scores[1:3]
    assert [h.rank for h in res.hits] == [1, 2]


def test_cutoff_on_device_path():
    # force past the host scorer: aggs ride the device/mesh executor
    # (device scores are float32; threshold from the same engine's run)
    db = _mkdb()
    base = db.search({"body": "apple"}, aggs={"n": {"_count": {}}})
    scores = [h.score for h in base.hits]
    thr = (scores[0] + scores[1]) / 2.0
    res = db.search({"body": "apple"}, weight_cutoff=thr,
                    aggs={"n": {"_count": {}}})
    assert [h.id for h in res.hits] == [base.hits[0].id]
    assert res.aggregations is not None


def test_cutoff_sharded_parity():
    from xapiand_tpu.parallel.sharded_db import ShardedDatabase

    flat = _mkdb()
    sh = ShardedDatabase(path=None, n_shards=2)
    for did, body in [("d0", "apple apple apple apple banana"),
                      ("d1", "apple apple apple cherry"),
                      ("d2", "apple apple date"),
                      ("d3", "apple elderberry"),
                      ("d4", "fig grape")]:
        sh.index_document({"_id": did, "body": body})
    sh.commit()
    _, scores = _scores(flat, "apple")
    thr = (scores[1] + scores[2]) / 2.0
    a = flat.search({"body": "apple"}, weight_cutoff=thr)
    b = sh.search({"body": "apple"}, weight_cutoff=thr)
    assert [h.id for h in a.hits] == [h.id for h in b.hits]
    assert [pytest.approx(h.score) for h in a.hits] == \
        [h.score for h in b.hits]


def test_rest_cutoff_bypasses_inline_path(tmp_path):
    # regression: the zero-hop inline serving path (app.py _inline_search)
    # must not skip cutoff/check_at_least handling for plain term queries
    from tests.test_rest import ServerThread

    s = ServerThread(str(tmp_path))
    try:
        s.req("PUT", "/ct/1?commit", {"body": "hello hello world"})
        s.req("PUT", "/ct/2?commit", {"body": "hello there"})
        status, out, _ = s.req("POST", "/ct/:search", {
            "_query": {"body": "hello"}, "_cutoff_weight": 1e9})
        assert status == 200 and out["count"] == 0 and out["total"] == 2
        status, out, _ = s.req("POST", "/ct/:search", {
            "_query": {"body": "hello"}, "_cutoff": 99})
        assert status == 200 and out["count"] == 1
        assert out["hits"][0]["_id"] == "1"
        status, out, _ = s.req("POST", "/ct/:search", {
            "_query": {"body": "hello"}, "_cutoff": 200})
        assert status == 400
        status, out, _ = s.req("POST", "/ct/:search", {
            "_query": {"body": "hello"}, "_check_at_least": "lots"})
        assert status == 400
    finally:
        s.stop()


def test_metrics_subsystem_counters(tmp_path):
    """metrics.h:47-105 parity: WAL/replication/raft counters + server
    gauges appear at /:metrics (VERDICT r4 weak #7)."""
    from xapiand_tpu.utils import metrics as M
    from tests.test_rest import ServerThread

    M.reset()  # counters are process-global; earlier tests may have bumped them
    M.inc("xapiand_wal_errors")
    M.inc("xapiand_replication_lines_applied", 7)
    M.set_gauge("xapiand_raft_term", 3)
    s = ServerThread(str(tmp_path))
    try:
        status, raw, _ct = s.req("GET", "/:metrics", raw=True)
        assert status == 200
        text = raw if isinstance(raw, str) else raw.decode()
        assert "xapiand_wal_errors 1" in text
        assert "xapiand_replication_lines_applied 7" in text
        assert "xapiand_raft_term 3" in text
        assert "xapiand_http_clients_pool_size" in text
        assert "xapiand_uptime" in text
        assert "# TYPE xapiand_wal_errors counter" in text
    finally:
        s.stop()
        M.reset()


def test_wal_truncation_bumps_error_counter(tmp_path):
    from xapiand_tpu.index.wal import DatabaseWAL, WalOp
    from xapiand_tpu.utils import metrics as M

    M.reset()
    w = DatabaseWAL(str(tmp_path / "w"))
    w.write_replace_document("1", {"a": 1})
    w.write_commit()
    w.close()
    # corrupt the tail: garbage bytes after the last valid record
    import glob as g
    vol = sorted(g.glob(str(tmp_path / "w" / "wal.*")))[-1]
    with open(vol, "ab") as f:
        f.write(b"\xde\xad\xbe\xef-partial-record")
    before = M.get("xapiand_wal_errors")
    w2 = DatabaseWAL(str(tmp_path / "w"))
    assert M.get("xapiand_wal_errors") == before + 1
    # and the WAL still appends + replays cleanly after truncation
    w2.write_replace_document("2", {"b": 2})
    w2.write_commit()
    seen = []
    w2.replay(lambda entry: seen.append(entry[0]))
    assert WalOp.REPLACE_DOCUMENT in [WalOp(x) for x in seen]
    w2.close()
