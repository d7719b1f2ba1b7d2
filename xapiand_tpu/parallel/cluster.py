"""Cluster control plane: node registry, UDP discovery, leader election.

Reference parity target: src/node.{h,cc} (Node registry with activation
state + touch timestamps), src/server/discovery.{h,cc} (UDP multicast
CLUSTER_HELLO/WAVE/ENTER/BYE handshake, RAFT_* election messages,
DB_UPDATED cache-invalidation broadcasts, discovery.h:65-85) and the
manager state machine (manager.h:90-98).

Transport: asyncio UDP. Production uses multicast (the reference's
239.192.168.1:58880); tests and single-host clusters use an explicit
unicast peer list - the protocol is identical either way.

The election is Raft-shaped (terms, randomised election timeouts, majority
votes, leader heartbeats; discovery.cc:540,1509,1794) and is used for what
the reference uses it for: choosing the cluster leader that arbitrates
index-primary assignment. Cluster-wide configuration changes (index
settings) replicate through a Raft command log: followers forward commands
to the leader (≙ RAFT_ADD_COMMAND, discovery.h:65-85), the leader appends
and ships entries on its heartbeats (≙ RAFT_APPEND_ENTRIES), commits on
majority ack, and every node applies committed commands in log order via
``on_command``. Index DATA replication rides the WAL-changeset channel
(parallel/replication.py), like the reference's replication protocol.
"""

from __future__ import annotations

import asyncio
import os
import random
import time
from dataclasses import dataclass, field
from enum import Enum
from xapiand_tpu.utils import metrics as _metrics
from typing import Callable, Optional

from xapiand_tpu.utils.codecs import pack_msgpack, unpack_msgpack

HEARTBEAT_S = 0.4
ELECTION_MIN_S = 1.2
ELECTION_MAX_S = 2.4
NODE_LIFESPAN_S = 3.0


class NodeState(str, Enum):
    ALIVE = "alive"
    DEAD = "dead"


class Role(str, Enum):
    FOLLOWER = "follower"
    CANDIDATE = "candidate"
    LEADER = "leader"


@dataclass
class Node:
    name: str
    host: str
    port: int                      # discovery UDP port
    http_port: int
    state: NodeState = NodeState.ALIVE
    touched: float = field(default_factory=time.monotonic)
    revisions: dict = field(default_factory=dict)   # index -> revision

    @property
    def addr(self):
        return (self.host, self.port)

    def touch(self):
        self.touched = time.monotonic()
        self.state = NodeState.ALIVE


class ClusterNode:
    """One node's view of the cluster + its Raft-lite participant."""

    def __init__(self, name: str, host: str, port: int, http_port: int,
                 peers: Optional[list[tuple[str, int]]] = None,
                 on_db_updated: Optional[Callable] = None,
                 on_leader_change: Optional[Callable] = None,
                 state_dir: Optional[str] = None):
        self.me = Node(name, host, port, http_port)
        self.nodes: dict[str, Node] = {name: self.me}
        self.peers = list(peers or [])      # bootstrap addresses
        self.on_db_updated = on_db_updated
        self.on_leader_change = on_leader_change
        # raft state (discovery.h:112-117)
        self.term = 0
        self.voted_for: Optional[str] = None
        self.role = Role.FOLLOWER
        self.leader: Optional[str] = None
        self._votes: set[str] = set()
        self._last_heartbeat = time.monotonic()
        self._transport = None
        self._tasks: list = []
        self.index_primaries: dict[str, str] = {}   # index -> node name
        # raft replicated log (RAFT_ADD_COMMAND / RAFT_APPEND_ENTRIES)
        self.log: list[dict] = []          # {"term": t, "cmd": {...}}
        self.commit_index = 0              # committed entry count
        self._applied = 0                  # applied entry count
        self._match: dict[str, int] = {}   # leader: follower acked lengths
        self.on_command: Optional[Callable[[dict], None]] = None
        # durable raft state: term/votedFor/log survive restarts so a
        # restarted node can never double-vote in the same term (the
        # reference persists cluster state in the .xapiand metadata index,
        # schemas_lru.cc:289; raft requires currentTerm/votedFor/log[] be
        # stable storage before answering RPCs)
        self._state_path = os.path.join(state_dir, "raft_state") \
            if state_dir else None
        self._load_state()

    # -- durable raft state (term/votedFor/log; raft §5.2 stable storage) ----

    def _load_state(self):
        if self._state_path is None or not os.path.exists(self._state_path):
            return
        try:
            with open(self._state_path, "rb") as fh:
                st = unpack_msgpack(fh.read())
            self.term = int(st.get("term", 0))
            self.voted_for = st.get("voted_for")
            self.log = list(st.get("log", []))
            self.commit_index = min(int(st.get("commit_index", 0)),
                                    len(self.log))
        except Exception:   # corrupt state: start fresh (term 0 is safe
            pass            # only because peers' vote replies re-teach it)

    def _persist(self):
        """fsync term/votedFor/log BEFORE any RPC that promises them
        (vote grants, election starts, log appends) - tmp+rename so a
        crash mid-write keeps the previous state."""
        if self._state_path is None:
            return
        tmp = self._state_path + ".tmp"
        try:
            with open(tmp, "wb") as fh:
                fh.write(pack_msgpack({
                    "term": self.term, "voted_for": self.voted_for,
                    "log": self.log, "commit_index": self.commit_index}))
                fh.flush()
                os.fsync(fh.fileno())
            os.replace(tmp, self._state_path)
        except OSError:
            pass

    # -- lifecycle ---------------------------------------------------------------

    async def start(self):
        loop = asyncio.get_running_loop()
        self._transport, _ = await loop.create_datagram_endpoint(
            lambda: _Proto(self), local_addr=(self.me.host, self.me.port))
        self._send_all({"op": "hello", **self._me_dict()})
        # re-apply restored committed commands now that on_command is wired
        self._apply_committed()
        self._tasks = [
            asyncio.create_task(self._ticker()),
        ]

    async def stop(self):
        self._send_all({"op": "bye", "name": self.me.name})
        for t in self._tasks:
            t.cancel()
        for t in self._tasks:
            try:
                await t
            except asyncio.CancelledError:
                pass
        if self._transport:
            self._transport.close()

    def _me_dict(self):
        return {"name": self.me.name, "host": self.me.host,
                "port": self.me.port, "http_port": self.me.http_port,
                "revisions": self.me.revisions,
                "primaries": self.index_primaries
                if self.role == Role.LEADER else {}}

    # -- wire --------------------------------------------------------------------

    def _send(self, addr, msg: dict):
        from xapiand_tpu.index.storage import faults

        if faults.drop_net("udp"):   # chaos: simulated packet loss
            return
        if self._transport is not None:
            self._transport.sendto(pack_msgpack(msg), addr)

    def _send_all(self, msg: dict):
        seen = set()
        for addr in self.peers:
            if addr != self.me.addr and addr not in seen:
                self._send(addr, msg)
                seen.add(addr)
        for n in self.nodes.values():
            if n.name != self.me.name and n.addr not in seen:
                self._send(n.addr, msg)
                seen.add(n.addr)

    def _handle(self, data: bytes, addr):
        try:
            msg = unpack_msgpack(data)
        except Exception:
            return
        op = msg.get("op")
        if op == "hello":
            node = self._register(msg)
            # WAVE back so the newcomer learns the cluster (discovery.cc WAVE)
            self._send(node.addr, {
                "op": "wave", **self._me_dict(),
                "known": [{"name": n.name, "host": n.host, "port": n.port,
                           "http_port": n.http_port}
                          for n in self.nodes.values()],
                "term": self.term, "leader": self.leader})
        elif op == "wave":
            self._register(msg)
            for n in msg.get("known", []):
                if n["name"] not in self.nodes:
                    self.nodes[n["name"]] = Node(
                        n["name"], n["host"], n["port"], n["http_port"])
            if msg.get("leader") and msg.get("term", 0) >= self.term:
                if msg["term"] > self.term:
                    self.term = msg["term"]
                    self._persist()
                self._set_leader(msg["leader"])
        elif op == "bye":
            n = self.nodes.get(msg.get("name"))
            if n:
                n.state = NodeState.DEAD
            if msg.get("name") == self.leader:
                self.leader = None
        elif op == "heartbeat":
            self._on_heartbeat(msg)
        elif op == "append_ack":
            self._on_append_ack(msg)
        elif op == "add_command":
            # follower-forwarded command (RAFT_ADD_COMMAND)
            if self.role == Role.LEADER:
                self.add_command(msg["cmd"])
        elif op == "request_vote":
            self._on_request_vote(msg, addr)
        elif op == "vote":
            self._on_vote(msg)
        elif op == "db_updated":
            n = self.nodes.get(msg.get("name"))
            if n:
                n.touch()
                n.revisions[msg["index"]] = msg["revision"]
            if self.on_db_updated is not None:
                self.on_db_updated(msg["index"], msg["revision"],
                                   msg.get("name"))

    def _register(self, msg) -> Node:
        name = msg["name"]
        node = self.nodes.get(name)
        if node is None:
            node = Node(name, msg["host"], msg["port"], msg["http_port"])
            self.nodes[name] = node
        node.touch()
        node.revisions.update(msg.get("revisions", {}))
        return node

    # -- raft-lite ------------------------------------------------------------------

    def _on_heartbeat(self, msg):
        term = msg.get("term", 0)
        if term >= self.term:
            dirty = term > self.term
            self.term = term
            self.role = Role.FOLLOWER
            self._last_heartbeat = time.monotonic()
            self._set_leader(msg["name"])
            node = self._register(msg)
            prim = msg.get("primaries") or {}
            if prim:
                self.index_primaries.update(prim)
            # append entries (RAFT_APPEND_ENTRIES): reconcile the log tail
            if "log_start" in msg:
                start = msg["log_start"]
                entries = msg.get("entries", [])
                if start <= len(self.log):
                    for i, e in enumerate(entries):
                        pos = start + i
                        if pos < len(self.log):
                            if self.log[pos]["term"] != e["term"]:
                                del self.log[pos:]   # conflict: truncate
                                self.log.append(e)
                                dirty = True
                        else:
                            self.log.append(e)
                            dirty = True
                commit = min(msg.get("commit", 0), len(self.log))
                dirty = dirty or commit != self.commit_index
                self.commit_index = commit
                if dirty:   # durable before the ack promises the entries
                    self._persist()
                self._apply_committed()
                self._send(node.addr, {"op": "append_ack",
                                       "name": self.me.name,
                                       "term": self.term,
                                       "match": len(self.log)})

    def _on_request_vote(self, msg, addr):
        term = msg.get("term", 0)
        dirty = False
        if term > self.term:
            self.term = term
            self.voted_for = None
            self.role = Role.FOLLOWER
            dirty = True
        grant = term >= self.term and self.voted_for in (None, msg["name"])
        if grant:
            self.voted_for = msg["name"]
            self._last_heartbeat = time.monotonic()
            dirty = True
        if dirty:   # the vote must be on stable storage before the reply
            self._persist()
        self._send(addr, {"op": "vote", "name": self.me.name,
                          "term": self.term, "granted": bool(grant)})

    def _on_vote(self, msg):
        if self.role != Role.CANDIDATE or msg.get("term", 0) != self.term:
            return
        if msg.get("granted"):
            self._votes.add(msg["name"])
            if len(self._votes) > (len(self._alive()) // 2):
                self.role = Role.LEADER
                self._set_leader(self.me.name)
                self._assign_primaries()
                self._broadcast_heartbeat()

    def _set_leader(self, name):
        changed = self.leader != name
        self.leader = name
        # cluster observability gauges (metrics.h:61-105 analog)
        _metrics.set_gauge("xapiand_raft_term", self.term)
        _metrics.set_gauge("xapiand_raft_is_leader",
                           1.0 if name == self.me.name else 0.0)
        _metrics.set_gauge("xapiand_cluster_nodes_alive",
                           len(self._alive()))
        if changed and self.on_leader_change is not None:
            self.on_leader_change(name)

    def _alive(self) -> list[Node]:
        now = time.monotonic()
        out = []
        for n in self.nodes.values():
            if n.name == self.me.name:
                out.append(n)
            elif n.state == NodeState.ALIVE and \
                    now - n.touched < NODE_LIFESPAN_S:
                out.append(n)
        return out

    def _assign_primaries(self):
        """Leader picks the most up-to-date alive holder per index
        (≙ ELECT_PRIMARY voting on max revision, discovery.cc:1283-1351)."""
        alive = {n.name: n for n in self._alive()}
        indexes = set()
        for n in self.nodes.values():
            indexes.update(n.revisions)
        for idx in indexes:
            cur = self.index_primaries.get(idx)
            if cur in alive and idx in alive[cur].revisions:
                continue
            best = None
            for n in alive.values():
                rev = n.revisions.get(idx)
                if rev is None:
                    continue
                if best is None or rev > best[0] or \
                        (rev == best[0] and n.name < best[1]):
                    best = (rev, n.name)
            if best is not None:
                self.index_primaries[idx] = best[1]

    async def _ticker(self):
        timeout = random.uniform(ELECTION_MIN_S, ELECTION_MAX_S)
        while True:
            await asyncio.sleep(HEARTBEAT_S / 2)
            now = time.monotonic()
            if self.role == Role.LEADER:
                self._assign_primaries()
                self._broadcast_heartbeat()
                continue
            if now - self._last_heartbeat > timeout:
                self._start_election()
                timeout = random.uniform(ELECTION_MIN_S, ELECTION_MAX_S)

    def _broadcast_heartbeat(self):
        # per-follower tailored append_entries ride the heartbeat: each
        # node gets the log tail past what it has acked (commands are rare
        # and small - index settings - so resending a tail is cheap)
        base = {"op": "heartbeat", "term": self.term, **self._me_dict(),
                "commit": self.commit_index}
        seen = {self.me.addr}
        targets = []
        for n in self.nodes.values():
            if n.addr not in seen:
                targets.append((n.name, n.addr))
                seen.add(n.addr)
        for addr in self.peers:
            if addr not in seen:
                targets.append((None, addr))
                seen.add(addr)
        for name, addr in targets:
            start = min(self._match.get(name, 0), len(self.log)) \
                if name else 0
            self._send(addr, {**base, "log_start": start,
                              "entries": self.log[start: start + 64]})

    # -- raft log (RAFT_ADD_COMMAND / APPEND_ENTRIES, discovery.h:65-85) ----

    def add_command(self, cmd: dict) -> bool:
        """Replicate a cluster-wide command through the log. On the
        leader: append + ship on the next heartbeat; on a follower:
        forward to the leader. Returns False when no leader is known."""
        if self.role == Role.LEADER:
            self.log.append({"term": self.term, "cmd": cmd})
            if len(self._alive()) == 1:
                self.commit_index = len(self.log)
                self._persist()
                self._apply_committed()
            else:
                self._persist()
                self._broadcast_heartbeat()
            return True
        if self.leader and self.leader in self.nodes:
            self._send(self.nodes[self.leader].addr,
                       {"op": "add_command", "name": self.me.name,
                        "cmd": cmd})
            return True
        return False

    def _on_append_ack(self, msg):
        if self.role != Role.LEADER:
            return
        self._match[msg["name"]] = int(msg.get("match", 0))
        # majority commit: own log + follower acks (entries of current term)
        lens = sorted([len(self.log)] + list(self._match.values()),
                      reverse=True)
        majority = lens[len(self._alive()) // 2] \
            if len(lens) > len(self._alive()) // 2 else 0
        if majority > self.commit_index and majority <= len(self.log) and \
                self.log[majority - 1]["term"] == self.term:
            self.commit_index = majority
            self._persist()
            self._apply_committed()

    def _apply_committed(self):
        while self._applied < self.commit_index:
            entry = self.log[self._applied]
            self._applied += 1
            _metrics.inc("xapiand_raft_commands_applied")
            if self.on_command is not None:
                try:
                    self.on_command(entry["cmd"])
                except Exception:   # applying must never kill the ticker
                    pass

    def _start_election(self):
        _metrics.inc("xapiand_raft_elections")
        self.term += 1
        self.role = Role.CANDIDATE
        self.voted_for = self.me.name
        self._persist()   # own candidacy vote hits stable storage first
        self._votes = {self.me.name}
        self._last_heartbeat = time.monotonic()
        if len(self._alive()) == 1:
            self.role = Role.LEADER
            self._set_leader(self.me.name)
            self._assign_primaries()
            return
        self._send_all({"op": "request_vote", "name": self.me.name,
                        "term": self.term})

    # -- app hooks ---------------------------------------------------------------------

    def db_updated(self, index: str, revision: int):
        """Broadcast after a local commit (≙ Shard::commit -> db_updater
        debounce -> UDP DB_UPDATED, shard.cc:778)."""
        self.me.revisions[index] = revision
        self._send_all({"op": "db_updated", "name": self.me.name,
                        "index": index, "revision": revision})

    def primary_of(self, index: str) -> Optional[str]:
        return self.index_primaries.get(index)

    def cluster_info(self) -> dict:
        return {
            "name": self.me.name,
            "role": self.role.value,
            "term": self.term,
            "leader": self.leader,
            "nodes": {n.name: {"host": n.host, "http_port": n.http_port,
                               "state": n.state.value,
                               "revisions": n.revisions}
                      for n in self.nodes.values()},
            "primaries": dict(self.index_primaries),
        }


class _Proto(asyncio.DatagramProtocol):
    def __init__(self, owner: ClusterNode):
        self.owner = owner

    def datagram_received(self, data, addr):
        self.owner._handle(data, addr)
