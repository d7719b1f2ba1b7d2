"""Field / drill selectors for responses.

Reference parity target: MsgPack::select() drill selectors
(src/msgpack.h select machinery; url_parser.h:68-102 slc offsets; usage
docs/_docs/exploration.md "Selectors"):

  "{field1,field2}"          field selector: keep only those fields
  "a.b.c"                    drill selector: bring the innermost to the top
  "contact.{email,phone}"    mixed

Drilling through arrays maps over their items (a list of objects drilled
by "email" yields the list of emails).
"""

from __future__ import annotations


class SelectorError(ValueError):
    pass


def _split_top(s: str, sep: str) -> list[str]:
    """Split on `sep` outside braces."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth < 0:
                raise SelectorError(f"unbalanced braces in selector {s!r}")
        if ch == sep and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if depth != 0:
        raise SelectorError(f"unbalanced braces in selector {s!r}")
    out.append("".join(cur))
    return out


def apply_selector(obj, sel: str):
    """Apply a selector string to a document object."""
    sel = (sel or "").strip()
    if not sel:
        return obj
    parts = _split_top(sel, ".")
    cur = obj
    for i, p in enumerate(parts):
        p = p.strip()
        if p.startswith("{") and p.endswith("}"):
            rest = ".".join(parts[i + 1:])
            out = {}
            for sub in _split_top(p[1:-1], ","):
                sub = sub.strip()
                if not sub:
                    continue
                full = sub + (("." + rest) if rest else "")
                try:
                    out[sub] = apply_selector(cur, full)
                except KeyError:
                    pass
            return out
        if isinstance(cur, list):
            rest = ".".join(parts[i:])
            return [apply_selector(item, rest) for item in cur
                    if isinstance(item, (dict, list))]
        if isinstance(cur, dict):
            if p not in cur:
                raise KeyError(p)
            cur = cur[p]
        else:
            raise KeyError(p)
    return cur
