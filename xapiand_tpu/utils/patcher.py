"""RFC-6902 JSON Patch + incr/decr extensions.

Reference parity target: src/msgpack_patcher.{h,cc} (ops add/remove/replace/
move/copy/test + the Xapiand extensions incr/decr, msgpack_patcher.cc:37-98).
Powers the PATCH HTTP verb.
"""

from __future__ import annotations

import copy
from typing import Any


class PatchError(ValueError):
    pass


def _split_pointer(path: str) -> list[str]:
    if path == "":
        return []
    if not path.startswith("/"):
        raise PatchError(f"invalid JSON pointer {path!r}")
    return [p.replace("~1", "/").replace("~0", "~") for p in
            path[1:].split("/")]


def _walk(doc, tokens, create=False):
    """Return (parent, last_token) for the pointer."""
    if not tokens:
        raise PatchError("cannot operate on the document root")
    cur = doc
    for tok in tokens[:-1]:
        if isinstance(cur, list):
            cur = cur[_index(tok, cur, insert=False)]
        elif isinstance(cur, dict):
            if tok not in cur:
                if create:
                    cur[tok] = {}
                else:
                    raise PatchError(f"path not found: {tok!r}")
            cur = cur[tok]
        else:
            raise PatchError(f"cannot traverse {type(cur).__name__}")
    return cur, tokens[-1]


def _index(tok: str, arr: list, insert: bool) -> int:
    if tok == "-":
        return len(arr)
    try:
        i = int(tok)
    except ValueError:
        raise PatchError(f"invalid array index {tok!r}") from None
    limit = len(arr) + (1 if insert else 0)
    if not (0 <= i < limit):
        raise PatchError(f"array index out of range: {tok}")
    return i


def _get(doc, path):
    tokens = _split_pointer(path)
    if not tokens:
        return doc
    parent, last = _walk(doc, tokens)
    if isinstance(parent, list):
        return parent[_index(last, parent, insert=False)]
    if isinstance(parent, dict):
        if last not in parent:
            raise PatchError(f"path not found: {path!r}")
        return parent[last]
    raise PatchError(f"cannot index {type(parent).__name__}")


def _add(doc, path, value):
    parent, last = _walk(doc, _split_pointer(path), create=True)
    if isinstance(parent, list):
        parent.insert(_index(last, parent, insert=True), value)
    elif isinstance(parent, dict):
        parent[last] = value
    else:
        raise PatchError(f"cannot add into {type(parent).__name__}")


def _remove(doc, path):
    parent, last = _walk(doc, _split_pointer(path))
    if isinstance(parent, list):
        parent.pop(_index(last, parent, insert=False))
    elif isinstance(parent, dict):
        if last not in parent:
            raise PatchError(f"path not found: {path!r}")
        del parent[last]
    else:
        raise PatchError(f"cannot remove from {type(parent).__name__}")


def apply_patch(doc: Any, patch: list[dict]) -> Any:
    """Apply a JSON-patch list to (a deep copy of) doc and return it."""
    doc = copy.deepcopy(doc)
    if not isinstance(patch, list):
        raise PatchError("patch must be a list of operations")
    for op_obj in patch:
        if not isinstance(op_obj, dict) or "op" not in op_obj:
            raise PatchError(f"invalid patch operation: {op_obj!r}")
        op = op_obj["op"]
        path = op_obj.get("path")
        if path is None:
            raise PatchError(f"missing path in {op_obj!r}")
        if op == "add":
            _add(doc, path, op_obj.get("value"))
        elif op == "remove":
            _remove(doc, path)
        elif op == "replace":
            _remove(doc, path)
            _add(doc, path, op_obj.get("value"))
        elif op == "move":
            frm = op_obj.get("from")
            if frm is None:
                raise PatchError("move needs 'from'")
            val = _get(doc, frm)
            _remove(doc, frm)
            _add(doc, path, val)
        elif op == "copy":
            frm = op_obj.get("from")
            if frm is None:
                raise PatchError("copy needs 'from'")
            _add(doc, path, copy.deepcopy(_get(doc, frm)))
        elif op == "test":
            if _get(doc, path) != op_obj.get("value"):
                raise PatchError(f"test failed at {path!r}")
        elif op in ("incr", "decr"):
            cur = _get(doc, path)
            if not isinstance(cur, (int, float)) or isinstance(cur, bool):
                raise PatchError(f"{op} target is not a number")
            delta = op_obj.get("value", 1)
            new = cur + delta if op == "incr" else cur - delta
            limit = op_obj.get("limit")
            if limit is not None:
                if (op == "incr" and new > limit) or \
                        (op == "decr" and new < limit):
                    raise PatchError(f"{op} exceeds limit at {path!r}")
            _remove(doc, path)
            _add(doc, path, new)
        else:
            raise PatchError(f"unknown patch op {op!r}")
    return doc
