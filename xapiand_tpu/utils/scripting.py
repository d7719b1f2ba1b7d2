"""Sandboxed update scripts (the `_script` field).

Reference parity target: src/script.{h,cc} + src/chaipp/ (ChaiScript user
scripts compiled + LRU-cached, run on writes with the old and new document,
handler.h:80-85 call_script; docs documents/scripting.md). Instead of
embedding a C++ script language, scripts are a strict Python-expression
subset interpreted over a whitelisted AST - no imports, no attribute
dunders, no calls outside the builtin whitelist, bounded step count.

Script environment:
  doc  - the new document (mutable dict)
  old  - the previous version ({} on first index)
  plus whitelisted builtins (len, min, max, sum, abs, round, int, float,
  str, bool, list, dict, sorted, enumerate, range, zip).
"""

from __future__ import annotations

import ast
from functools import lru_cache

MAX_STEPS = 100_000

_ALLOWED_BUILTINS = {
    "len": len, "min": min, "max": max, "sum": sum, "abs": abs,
    "round": round, "int": int, "float": float, "str": str, "bool": bool,
    "list": list, "dict": dict, "set": set, "tuple": tuple,
    "sorted": sorted, "enumerate": enumerate, "range": range, "zip": zip,
}

_ALLOWED_METHODS = {
    "get", "keys", "values", "items", "append", "extend", "pop", "update",
    "setdefault", "remove", "insert", "sort", "reverse", "split", "join",
    "lower", "upper", "strip", "startswith", "endswith", "replace", "count",
    "index", "copy",
}

_ALLOWED_NODES = (
    ast.Module, ast.Expr, ast.Assign, ast.AugAssign, ast.If, ast.For,
    ast.While, ast.Break, ast.Continue, ast.Pass, ast.Delete,
    ast.BoolOp, ast.BinOp, ast.UnaryOp, ast.Compare, ast.Call,
    ast.IfExp, ast.Dict, ast.List, ast.Tuple, ast.Set, ast.Subscript,
    ast.Slice, ast.Name, ast.Load, ast.Store, ast.Del, ast.Constant,
    ast.Attribute, ast.keyword, ast.comprehension, ast.ListComp,
    ast.DictComp, ast.SetComp, ast.GeneratorExp,
    ast.And, ast.Or, ast.Not, ast.USub, ast.UAdd,
    ast.Add, ast.Sub, ast.Mult, ast.Div, ast.FloorDiv, ast.Mod, ast.Pow,
    ast.Eq, ast.NotEq, ast.Lt, ast.LtE, ast.Gt, ast.GtE, ast.In, ast.NotIn,
    ast.Is, ast.IsNot, ast.JoinedStr, ast.FormattedValue,
)


class ScriptError(ValueError):
    pass


class ScriptTimeout(ScriptError):
    pass


# a single * or ** executes entirely in C, so the settrace step budget
# never ticks: '[0]*10**9' could OOM the server within one "step". Guard
# the operand sizes instead (the usual AST-sandbox mitigation).
_MAX_SEQ = 1_000_000    # elements/chars producible by one sequence repeat
_MAX_BITS = 1_000_000   # bits producible by one int mul/pow


def _guard_mul(a, b):
    for x, y in ((a, b), (b, a)):
        if isinstance(x, (str, bytes, list, tuple)) and isinstance(y, int):
            if y > 0 and y * max(len(x), 1) > _MAX_SEQ:
                raise ScriptTimeout("sequence repeat exceeds size budget")
    if isinstance(a, int) and isinstance(b, int):
        if a.bit_length() + b.bit_length() > _MAX_BITS:
            raise ScriptTimeout("integer multiply exceeds size budget")
    return a * b


def _guard_pow(a, b):
    if isinstance(a, int) and isinstance(b, int) and b > 0:
        if b * max(a.bit_length(), 1) > _MAX_BITS:
            raise ScriptTimeout("integer power exceeds size budget")
    return a ** b


class _GuardOps(ast.NodeTransformer):
    """Rewrite `a * b` / `a ** b` (and the augmented forms) into calls to
    the size-checked guards. Runs AFTER _validate, so the injected
    double-underscore names cannot be spelled by user code."""

    def visit_BinOp(self, node):
        self.generic_visit(node)
        fname = ("__xt_mul" if isinstance(node.op, ast.Mult) else
                 "__xt_pow" if isinstance(node.op, ast.Pow) else None)
        if fname is None:
            return node
        return ast.copy_location(
            ast.Call(func=ast.Name(id=fname, ctx=ast.Load()),
                     args=[node.left, node.right], keywords=[]), node)

    def visit_AugAssign(self, node):
        self.generic_visit(node)
        if not isinstance(node.op, (ast.Mult, ast.Pow)):
            return node
        load_target = ast.copy_location(
            ast.Name(node.target.id, ast.Load()), node.target) \
            if isinstance(node.target, ast.Name) else \
            ast.copy_location(ast.Subscript(
                node.target.value, node.target.slice, ast.Load()),
                node.target)
        call = ast.copy_location(ast.Call(
            func=ast.Name(
                id="__xt_mul" if isinstance(node.op, ast.Mult)
                else "__xt_pow", ctx=ast.Load()),
            args=[load_target, node.value], keywords=[]), node)
        return ast.copy_location(
            ast.Assign(targets=[node.target], value=call), node)


def _validate(tree: ast.AST):
    for node in ast.walk(tree):
        if not isinstance(node, _ALLOWED_NODES):
            raise ScriptError(
                f"script uses forbidden construct {type(node).__name__}")
        if isinstance(node, ast.Attribute):
            if node.attr.startswith("_"):
                raise ScriptError(f"forbidden attribute {node.attr!r}")
            if not isinstance(node.ctx, ast.Load):
                raise ScriptError("attribute assignment not allowed")
            if node.attr not in _ALLOWED_METHODS:
                raise ScriptError(f"method {node.attr!r} not allowed")
        if isinstance(node, ast.Name) and node.id.startswith("__"):
            raise ScriptError(f"forbidden name {node.id!r}")


@lru_cache(maxsize=100)  # ≙ opts.scripts_cache_size (default 100)
def compile_script(source: str) -> "Script":
    return Script(source)


class Script:
    def __init__(self, source: str):
        self.source = source
        try:
            self.tree = ast.parse(source, mode="exec")
        except SyntaxError as e:
            raise ScriptError(f"script syntax error: {e}") from None
        _validate(self.tree)
        self.tree = ast.fix_missing_locations(_GuardOps().visit(self.tree))
        self.code = compile(self.tree, "<script>", "exec")

    def run(self, doc: dict, old: dict | None = None) -> dict:
        self.run_env({"doc": doc, "old": dict(old or {})})
        return doc

    def run_env(self, variables: dict) -> dict:
        """Execute with the given variables in scope; returns the final
        environment (used by _script writes and _scripted_metric aggs)."""
        steps = [0]

        def tick(frame=None, event=None, arg=None):
            steps[0] += 1
            if steps[0] > MAX_STEPS:
                raise ScriptTimeout("script exceeded step budget")
            return tick

        env = {"__builtins__": {}, **_ALLOWED_BUILTINS, **variables,
               "__xt_mul": _guard_mul, "__xt_pow": _guard_pow}
        import sys

        old_trace = sys.gettrace()
        sys.settrace(tick)
        try:
            exec(self.code, env)  # noqa: S102 - AST-whitelisted subset
        except ScriptTimeout:
            raise
        except Exception as e:
            raise ScriptError(f"script failed: {e}") from None
        finally:
            sys.settrace(old_trace)
        return env
