"""Process-wide operational counters/gauges for GET /:metrics.

≙ reference src/metrics.h:33-105 — beyond per-operation summaries the
reference exports WAL error counters and per-protocol (http / remote /
replication) client-pool gauges plus cluster state, so an operator can
see a replica falling behind or a WAL going bad from /:metrics alone.

Subsystems (WAL, replication puller, raft cluster) bump these plain
numbers without importing any prometheus machinery; the HTTP plane
serialises a snapshot in Prometheus exposition format alongside the
prometheus_client registry output (server/app.py:_metrics).
"""

from __future__ import annotations

import threading

_lock = threading.Lock()
_values: dict[str, float] = {}

# exposition metadata: name -> (type, help); anything not listed is
# exported as an untyped gauge
_META = {
    "xapiand_wal_errors": (
        "counter", "WAL corruption events (truncated tails, bad replays)"),
    "xapiand_replication_pulls": (
        "counter", "replication changeset pulls completed"),
    "xapiand_replication_lines_applied": (
        "counter", "WAL lines applied from a primary"),
    "xapiand_replication_full_copies": (
        "counter", "full snapshot bootstraps completed"),
    "xapiand_replication_errors": (
        "counter", "replication pull/apply failures"),
    "xapiand_raft_elections": (
        "counter", "raft elections started by this node"),
    "xapiand_raft_term": ("gauge", "current raft term"),
    "xapiand_raft_is_leader": ("gauge", "1 if this node is the leader"),
    "xapiand_cluster_nodes_alive": ("gauge", "alive nodes in the registry"),
    "xapiand_raft_commands_applied": (
        "counter", "replicated command-log entries applied"),
}


def inc(name: str, v: float = 1.0) -> None:
    with _lock:
        _values[name] = _values.get(name, 0.0) + v


def set_gauge(name: str, v: float) -> None:
    with _lock:
        _values[name] = float(v)


def get(name: str) -> float:
    with _lock:
        return _values.get(name, 0.0)


def snapshot() -> dict[str, float]:
    with _lock:
        return dict(_values)


def reset() -> None:  # tests
    with _lock:
        _values.clear()


def exposition(extra: dict[str, float] | None = None) -> str:
    """Prometheus text format for the snapshot (+ caller-supplied
    point-in-time gauges, e.g. pool sizes only the server knows)."""
    vals = snapshot()
    if extra:
        vals.update(extra)
    out = []
    for name in sorted(vals):
        typ, hlp = _META.get(name, ("gauge", name))
        out.append(f"# HELP {name} {hlp}")
        out.append(f"# TYPE {name} {typ}")
        v = vals[name]
        out.append(f"{name} {int(v) if float(v).is_integer() else v}")
    return "\n".join(out) + ("\n" if out else "")
