#!/usr/bin/env python
"""HTTP conformance replay: docs/EXAMPLES.md against a live server.

The reference's de-facto end-to-end suite converts every request/response
example in its docs into a replayable collection
(/root/reference/docs_to_postman.py + newman); this is that harness for
xapiand-tpu. Each `### METHOD /path` block in docs/EXAMPLES.md is replayed
in order and the response is checked for status + recursive-subset match
against the expected body ("..." matches anything; #took/uuid ignored).

Usage:
  python scripts/conformance.py                 # spawns a scratch server
  python scripts/conformance.py --url http://host:8880   # existing server
  python scripts/conformance.py --spec docs/EXAMPLES.md -v
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time
import urllib.error
import urllib.request

_HEAD = re.compile(r"^### (GET|PUT|POST|PATCH|DELETE|HEAD|UPDATE|UPSERT|"
                   r"MERGE|STORE|SEARCH|COUNT|INFO|COMMIT|DUMP|RESTORE|"
                   r"CHECK|FLUSH|QUIT|OPEN|CLOSE) (\S+)(?:\s*\((.*)\))?\s*$")
_EXPECT = re.compile(r"^expect (\d{3})\s*:?\s*$")
_VOLATILE = {"#took", "uuid"}


def parse_spec(path: str) -> list[dict]:
    """-> [{method, path, note, body, content_type, status, expected}]"""
    out: list[dict] = []
    cur: dict | None = None
    fence: list[str] | None = None
    fence_kind = None
    with open(path) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if fence is not None:
                if line.startswith("```"):
                    text = "\n".join(fence)
                    if cur is not None:
                        if cur.get("status") is None:
                            cur["body_text"] = text
                            cur["body_raw"] = fence_kind == "raw"
                        else:
                            cur["expected"] = json.loads(text)
                    fence = None
                else:
                    fence.append(line)
                continue
            m = _HEAD.match(line)
            if m:
                if cur is not None:
                    out.append(cur)
                note = m.group(3) or ""
                cur = {"method": m.group(1), "path": m.group(2),
                       "note": note, "body_text": None, "body_raw": False,
                       "status": None, "expected": None}
                ctm = re.search(r"Content-Type:\s*(\S+)", note)
                cur["content_type"] = ctm.group(1) if ctm else None
                continue
            m = _EXPECT.match(line)
            if m and cur is not None:
                cur["status"] = int(m.group(1))
                continue
            if line.startswith("```") and cur is not None:
                fence = []
                fence_kind = line[3:].strip() or "json"
    if cur is not None:
        out.append(cur)
    return [c for c in out if c["status"] is not None]


def subset_match(expected, actual, path="$") -> str | None:
    """None if actual covers expected; else a mismatch description."""
    if expected == "...":
        return None
    if isinstance(expected, dict):
        if not isinstance(actual, dict):
            return f"{path}: expected object, got {type(actual).__name__}"
        for k, v in expected.items():
            if k in _VOLATILE:
                continue
            if k not in actual:
                return f"{path}.{k}: missing"
            err = subset_match(v, actual[k], f"{path}.{k}")
            if err:
                return err
        return None
    if isinstance(expected, list):
        if not isinstance(actual, list):
            return f"{path}: expected array, got {type(actual).__name__}"
        if len(actual) < len(expected):
            return (f"{path}: expected >= {len(expected)} items, "
                    f"got {len(actual)}")
        for i, v in enumerate(expected):
            err = subset_match(v, actual[i], f"{path}[{i}]")
            if err:
                return err
        return None
    if isinstance(expected, float) or isinstance(actual, float):
        try:
            if abs(float(expected) - float(actual)) <= 1e-6 * max(
                    1.0, abs(float(expected))):
                return None
        except (TypeError, ValueError):
            pass
        return f"{path}: expected {expected!r}, got {actual!r}"
    if expected != actual:
        return f"{path}: expected {expected!r}, got {actual!r}"
    return None


def replay(base_url: str, cases: list[dict], verbose: bool = False) -> int:
    failures = 0
    for c in cases:
        url = base_url + c["path"]
        data = None
        headers = {}
        if c["body_text"] is not None:
            if c["body_raw"]:
                data = c["body_text"].encode()
            else:
                data = json.dumps(json.loads(c["body_text"])).encode()
                headers["Content-Type"] = "application/json"
        if c["content_type"]:
            headers["Content-Type"] = c["content_type"]
        req = urllib.request.Request(url, data=data, method=c["method"],
                                     headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=600) as resp:
                status, payload = resp.status, resp.read()
                ct = resp.headers.get("Content-Type", "")
        except urllib.error.HTTPError as e:
            status, payload = e.code, e.read()
            ct = e.headers.get("Content-Type", "")
        label = f"{c['method']} {c['path']}" + \
            (f" ({c['note']})" if c["note"] else "")
        err = None
        if status != c["status"]:
            err = f"status {status} != {c['status']} body={payload[:200]!r}"
        elif c["expected"] is not None:
            try:
                actual = json.loads(payload) if "json" in ct else None
            except ValueError:
                actual = None
            if actual is None:
                err = f"non-JSON response ({ct})"
            else:
                err = subset_match(c["expected"], actual)
        if err:
            failures += 1
            print(f"FAIL {label}\n     {err}")
        elif verbose:
            print(f"ok   {label}")
    total = len(cases)
    print(f"{total - failures}/{total} examples passed")
    return failures


def spawn_server(port: int):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"   # fast startup; search shapes are tiny
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    data_dir = tempfile.mkdtemp(prefix="xt-conformance-")
    proc = subprocess.Popen(
        [sys.executable, "-m", "xapiand_tpu.server", "--port", str(port),
         "--data-dir", data_dir, "--bind", "127.0.0.1"],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    url = f"http://127.0.0.1:{port}"
    for _ in range(120):
        try:
            urllib.request.urlopen(url + "/", timeout=5)
            return proc, url
        except OSError:
            if proc.poll() is not None:
                raise RuntimeError("server exited during startup")
            time.sleep(0.5)
    proc.kill()
    raise RuntimeError("server did not come up")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default=None,
                    help="replay against an existing server")
    ap.add_argument("--spec", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "EXAMPLES.md"))
    ap.add_argument("--port", type=int, default=18880)
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args(argv)

    cases = parse_spec(args.spec)
    if not cases:
        print("no examples parsed", file=sys.stderr)
        return 2
    proc = None
    url = args.url
    if url is None:
        proc, url = spawn_server(args.port)
    try:
        failures = replay(url.rstrip("/"), cases, verbose=args.verbose)
    finally:
        if proc is not None:
            proc.terminate()
            proc.wait(10)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
