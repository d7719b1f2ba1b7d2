"""Python client for the xapiand-tpu REST server.

The reference ships an elasticsearch-py-style client
(contrib/python/xapiand-py: ``Xapiand`` with ``.documents`` and
``.indices`` sub-clients, contrib/python/xapiand-py/xapiand/client/
documents.py + indices.py). This is a fresh stdlib implementation of the
same surface against this server's REST API:

    from xapiand_tpu.client import Xapiand
    c = Xapiand("localhost:8880")
    c.documents.index("twitter", {"user": "k"}, id="1", commit=True)
    c.indices.search("twitter", {"_query": {"user": "k"}})

No third-party dependencies; JSON wire (msgpack/NDJSON handled as raw
bodies where the endpoint needs them).
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request
from typing import Any, Iterable, Optional


class TransportError(Exception):
    def __init__(self, status: int, info: Any = None):
        super().__init__(status, info)
        self.status = status
        self.info = info


class NotFoundError(TransportError):
    pass


class ConflictError(TransportError):
    pass


def _raise_for(status: int, payload: Any):
    if status == 404:
        raise NotFoundError(status, payload)
    if status == 409:
        raise ConflictError(status, payload)
    raise TransportError(status, payload)


class Transport:
    """One-host HTTP transport (the reference pools hosts; a list of
    hosts round-robins here on connection errors)."""

    def __init__(self, hosts, timeout: float = 60.0):
        if isinstance(hosts, str):
            hosts = [hosts]
        self.hosts = []
        for h in hosts or ["localhost:8880"]:
            if "://" not in h:
                h = "http://" + h
            self.hosts.append(h.rstrip("/"))
        self.timeout = timeout
        self._i = 0

    def perform(self, method: str, path: str, body: Any = None,
                params: Optional[dict] = None,
                content_type: str = "application/json",
                accept: Optional[str] = None):
        if params:
            q = urllib.parse.urlencode(
                {k: ("" if v is True else v) for k, v in params.items()
                 if v is not None})
            # bare flags like ?commit render without '='
            q = "&".join(p[:-1] if p.endswith("=") else p
                         for p in q.split("&") if p)
            path = f"{path}?{q}" if q else path
        data = None
        if body is not None:
            data = body if isinstance(body, (bytes, bytearray)) \
                else json.dumps(body).encode("utf-8")
        headers = {"Content-Type": content_type}
        if accept:
            headers["Accept"] = accept
        last_err = None
        for _ in range(len(self.hosts)):
            host = self.hosts[self._i % len(self.hosts)]
            req = urllib.request.Request(host + path, data=data,
                                         method=method, headers=headers)
            try:
                with urllib.request.urlopen(req,
                                            timeout=self.timeout) as resp:
                    raw = resp.read()
                    ct = resp.headers.get("Content-Type", "")
                    out = json.loads(raw) if raw and "json" in ct else raw
                    return resp.status, out
            except urllib.error.HTTPError as e:
                raw = e.read()
                ct = e.headers.get("Content-Type", "")
                out = json.loads(raw) if raw and "json" in ct else raw
                _raise_for(e.code, out)
            except urllib.error.URLError as e:
                last_err = e
                self._i += 1   # try the next host
        raise TransportError(0, f"no hosts reachable: {last_err}")


def _esc(seg: str) -> str:
    return urllib.parse.quote(str(seg), safe="")


class DocumentsClient:
    """≙ contrib/python/xapiand-py client/documents.py surface."""

    def __init__(self, transport: Transport):
        self._t = transport

    def index(self, index, body, id=None, commit=False, version=None,
              content_type="application/json"):
        params = {"commit": commit or None, "version": version}
        if id is None:
            _, out = self._t.perform("POST", f"/{_esc(index)}/", body,
                                     params, content_type)
        else:
            _, out = self._t.perform("PUT", f"/{_esc(index)}/{_esc(id)}",
                                     body, params, content_type)
        return out

    def update(self, index, id, body=None, commit=False, version=None):
        _, out = self._t.perform(
            "UPDATE", f"/{_esc(index)}/{_esc(id)}", body,
            {"commit": commit or None, "version": version})
        return out

    def upsert(self, index, id, body=None, commit=False, version=None):
        """Native UPSERT verb: UPDATE that creates when absent, one
        round trip (≙ http_client.cc:141-155 verb table)."""
        _, out = self._t.perform(
            "UPSERT", f"/{_esc(index)}/{_esc(id)}", body,
            {"commit": commit or None, "version": version})
        return out

    def patch(self, index, id, body=None, commit=False):
        _, out = self._t.perform("PATCH", f"/{_esc(index)}/{_esc(id)}",
                                 body, {"commit": commit or None})
        return out

    def exists(self, index, id) -> bool:
        try:
            self._t.perform("HEAD", f"/{_esc(index)}/{_esc(id)}")
            return True
        except NotFoundError:
            return False

    def get(self, index, id, selector=None, volatile=False):
        _, out = self._t.perform("GET", f"/{_esc(index)}/{_esc(id)}",
                                 params={"selector": selector,
                                         "volatile": volatile or None})
        return out

    def delete(self, index, id, commit=False):
        _, out = self._t.perform("DELETE", f"/{_esc(index)}/{_esc(id)}",
                                 params={"commit": commit or None})
        return out

    def info(self, index, id=None):
        path = f"/{_esc(index)}/{_esc(id)}/:info" if id is not None \
            else f"/{_esc(index)}/:info"
        _, out = self._t.perform("GET", path)
        return out


class IndicesClient:
    """≙ contrib/python/xapiand-py client/indices.py surface."""

    def __init__(self, transport: Transport):
        self._t = transport

    def ping(self) -> bool:
        try:
            self._t.perform("GET", "/")
            return True
        except Exception:
            return False

    def create(self, index, body=None):
        _, out = self._t.perform("PUT", f"/{_esc(index)}/", body or {})
        return out

    def commit(self, index):
        _, out = self._t.perform("COMMIT", f"/{_esc(index)}/")
        return out

    def open(self, index):
        _, out = self._t.perform("OPEN", f"/{_esc(index)}/")
        return out

    def close(self, index):
        _, out = self._t.perform("CLOSE", f"/{_esc(index)}/")
        return out

    def delete(self, index):
        _, out = self._t.perform("DELETE", f"/{_esc(index)}/")
        return out

    def get_settings(self, index):
        _, out = self._t.perform("GET", f"/{_esc(index)}/:settings")
        return out

    def put_settings(self, index, body):
        _, out = self._t.perform("PUT", f"/{_esc(index)}/:settings", body)
        return out

    def get_schema(self, index):
        _, out = self._t.perform("GET", f"/{_esc(index)}/:schema")
        return out

    def count(self, index, body=None, q=None, volatile=False):
        _, out = self._t.perform("POST", f"/{_esc(index)}/:count",
                                 body, params={"q": q,
                                               "volatile": volatile or None})
        return out

    def search(self, index, body=None, q=None, limit=None, offset=None,
               sort=None, selector=None, volatile=False):
        params = {"q": q, "limit": limit, "offset": offset,
                  "sort": sort, "selector": selector,
                  "volatile": volatile or None}
        _, out = self._t.perform("POST", f"/{_esc(index)}/:search",
                                 body, params)
        return out

    def snapshot(self, index):
        """Durable binary checkpoint + WAL prune (POST :snapshot)."""
        _, out = self._t.perform("POST", f"/{_esc(index)}/:snapshot")
        return out

    def flush(self):
        """Admin FLUSH / (requires --admin-commands on the server)."""
        _, out = self._t.perform("FLUSH", "/")
        return out

    def restore(self, index, docs: Iterable[dict], batch: int = 2000,
                commit_at_end: bool = True):
        """Bulk-load documents via NDJSON :restore (streaming_restore
        analog; indices.py:147). `docs` is any iterable of dicts; a
        `_id` key routes the document id."""
        total = {"#restored": 0}
        chunk: list[str] = []

        def flush():
            if not chunk:
                return
            body = ("\n".join(chunk) + "\n").encode("utf-8")
            _, out = self._t.perform(
                "POST", f"/{_esc(index)}/:restore", body,
                content_type="application/x-ndjson")
            total["#restored"] += out.get("#restored", 0) \
                if isinstance(out, dict) else 0
            chunk.clear()

        for d in docs:
            chunk.append(json.dumps(d))
            if len(chunk) >= batch:
                flush()
        flush()
        if commit_at_end:
            self.commit(index)
        return total

    def dump(self, index):
        _, out = self._t.perform("DUMP", f"/{_esc(index)}/")
        return out


class Xapiand:
    """Top-level client: `.documents` + `.indices` sub-clients plus the
    most-used verbs re-exported at the root (xapiand-py __init__.py)."""

    def __init__(self, hosts=None, timeout: float = 60.0):
        self.transport = Transport(hosts, timeout=timeout)
        self.documents = DocumentsClient(self.transport)
        self.indices = IndicesClient(self.transport)

    # root-level conveniences (the reference exposes these too)
    def ping(self) -> bool:
        return self.indices.ping()

    def info(self):
        _, out = self.transport.perform("GET", "/")
        return out

    def index(self, index, body, id=None, **kw):
        return self.documents.index(index, body, id=id, **kw)

    def get(self, index, id, **kw):
        return self.documents.get(index, id, **kw)

    def exists(self, index, id) -> bool:
        return self.documents.exists(index, id)

    def delete(self, index, id, **kw):
        return self.documents.delete(index, id, **kw)

    def search(self, index, body=None, **kw):
        return self.indices.search(index, body, **kw)

    def count(self, index, body=None, **kw):
        return self.indices.count(index, body, **kw)

    def upsert(self, index, id, body=None, **kw):
        return self.documents.upsert(index, id, body, **kw)

    def flush(self):
        return self.indices.flush()

    def __repr__(self):
        return f"<Xapiand({self.transport.hosts})>"
