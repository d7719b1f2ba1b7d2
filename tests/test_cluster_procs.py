"""Two REAL server processes on localhost: discovery handshake, leader
election, primary writes replicating to the replica, raft-log settings
propagation, and failover on primary kill.

Round-1 gap: cluster/replication were only ever tested in-process; the
reference's replication is a hardened wire protocol
(replication_protocol_client.cc:175-583). This spawns two actual
``python -m xapiand_tpu.server`` processes (UDP discovery + HTTP
replication) and proves the full loop across process boundaries.
"""

import json
import os
import signal
import socket
import subprocess
import sys
import tempfile
import time
import urllib.error
import urllib.request

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _req(port, method, path, body=None):
    url = f"http://127.0.0.1:{port}{path}"
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        url, data=data, method=method,
        headers={"Content-Type": "application/json"} if data else {})
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read() or b"{}")
    except urllib.error.HTTPError as e:
        try:
            return e.code, json.loads(e.read() or b"{}")
        except ValueError:
            return e.code, {}


def _wait(fn, timeout=60, every=0.5, what="condition"):
    t0 = time.time()
    last = None
    while time.time() - t0 < timeout:
        try:
            out = fn()
            if out:
                return out
            last = out
        except Exception as e:   # server still starting / transient
            last = e
        time.sleep(every)
    raise AssertionError(f"timed out waiting for {what}: last={last!r}")


class Cluster2:
    def __init__(self, tmp):
        self.http = [_free_port(), _free_port()]
        self.disc = [_free_port(), _free_port()]
        self.procs = []
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = _ROOT + os.pathsep + env.get("PYTHONPATH", "")
        for i in range(2):
            peers = ",".join(f"127.0.0.1:{self.disc[j]}"
                             for j in range(2) if j != i)
            self.procs.append(subprocess.Popen(
                [sys.executable, "-m", "xapiand_tpu.server",
                 "--bind", "127.0.0.1", "--port", str(self.http[i]),
                 "--data-dir", os.path.join(tmp, f"node{i}"),
                 "--name", f"node{i}",
                 "--discovery-port", str(self.disc[i]),
                 "--peers", peers],
                env=env, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL))

    def kill(self, i, sig=signal.SIGKILL):
        self.procs[i].send_signal(sig)
        self.procs[i].wait(15)

    def stop(self):
        for p in self.procs:
            if p.poll() is None:
                p.terminate()
        for p in self.procs:
            try:
                p.wait(15)
            except subprocess.TimeoutExpired:
                p.kill()


@pytest.fixture(scope="module")
def cluster():
    tmp = tempfile.mkdtemp(prefix="xt-cluster2-")
    c = Cluster2(tmp)
    try:
        for port in c.http:
            _wait(lambda p=port: _req(p, "GET", "/")[0] == 200,
                  timeout=120, what=f"server on {port}")
        yield c
    finally:
        c.stop()


def test_discovery_and_single_leader(cluster):
    def both_joined():
        infos = [_req(p, "GET", "/:nodes")[1] for p in cluster.http]
        alive = [sum(1 for n in i["nodes"].values()
                     if n["state"] == "alive") for i in infos]
        leaders = {i.get("leader") for i in infos}
        roles = [i.get("role") for i in infos]
        return (all(a >= 2 for a in alive) and len(leaders) == 1
                and None not in leaders and roles.count("leader") == 1
                and infos)

    infos = _wait(both_joined, timeout=60, what="handshake + election")
    assert infos[0]["leader"] == infos[1]["leader"]


def test_write_on_primary_replicates(cluster):
    a, b = cluster.http
    status, out = _req(a, "PUT", "/repl/1?commit",
                       {"body": "replicate me", "n": 1})
    assert status == 200 and out["_id"] == "1"

    def replica_has_doc():
        status, doc = _req(b, "GET", "/repl/1")
        return status == 200 and doc.get("n") == 1

    _wait(replica_has_doc, timeout=60, what="replica catch-up")
    # replicated SEARCH serves from the replica's own local segments
    status, res = _req(b, "POST", "/repl/:search",
                       {"_query": {"body": "replicate"}})
    assert status == 200 and res["total"] == 1


def test_settings_propagate_via_raft_log(cluster):
    a, b = cluster.http
    status, out = _req(a, "PUT", "/cfg/:settings", {"num_shards": 2})
    assert status == 200 and out["num_shards"] == 2

    def other_node_applied():
        _s, got = _req(b, "GET", "/cfg/:settings")
        return got.get("num_shards") == 2

    _wait(other_node_applied, timeout=30,
          what="raft-log settings commit on follower")


def test_failover_on_primary_kill(cluster):
    a, b = cluster.http
    # make node A the primary of 'repl' (it took the first write)
    _, info = _req(a, "GET", "/:nodes")
    cluster.kill(0)

    def b_leads_and_owns():
        _s, i = _req(b, "GET", "/:nodes")
        return i.get("role") == "leader" and \
            i.get("primaries", {}).get("repl") == i["name"]

    _wait(b_leads_and_owns, timeout=60, what="failover election")
    # the survivor accepts writes for the failed-over index (no redirect)
    status, out = _req(b, "PUT", "/repl/2?commit", {"body": "after", "n": 2})
    assert status == 200
    status, doc = _req(b, "GET", "/repl/2")
    assert status == 200 and doc.get("n") == 2
    # pre-failover data survived on the replica-turned-primary
    status, doc = _req(b, "GET", "/repl/1")
    assert status == 200 and doc.get("n") == 1
