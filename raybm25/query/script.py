"""``script_score`` scripts: a safe painless-subset expression
compiler (the OpenSearch ``script_score`` query's ``script.source``).

Supported grammar — the part scoring scripts actually use:

- ``_score`` — the inner query's BM25 score,
- ``doc['field'].value`` / ``doc["field"].value`` — a stored numeric
  doc-value,
- float/int literals, ``+ - * /``, unary minus, parentheses,
- ``Math.log`` / ``Math.sqrt`` / ``Math.abs`` / ``Math.max`` /
  ``Math.min`` / ``Math.pow`` (and the bare lowercase names).

Compilation whitelists AST node types (no names other than the
rewritten variables, no attributes, no subscripts, no calls outside
the table above), so a request body can never reach Python eval
semantics — anything outside the subset raises ``ValueError`` loudly.
Evaluation is vectorized: every variable is a float64 numpy array over
the whole candidate set, so the script costs one numpy expression per
query, not one interpreter trip per doc.
"""

from __future__ import annotations

import ast
import re
from dataclasses import dataclass, field

import numpy as np

_DOC_VALUE_RE = re.compile(r"doc\[\s*(['\"])([A-Za-z0-9_.]+)\1\s*\]\.value")

_FUNCS = {
    "log": np.log,
    "sqrt": np.sqrt,
    "abs": np.abs,
    "max": np.maximum,
    "min": np.minimum,
    "pow": np.power,
}

_ALLOWED_NODES = (
    ast.Expression,
    ast.BinOp,
    ast.Add,
    ast.Sub,
    ast.Mult,
    ast.Div,
    ast.UnaryOp,
    ast.USub,
    ast.UAdd,
    ast.Constant,
    ast.Name,
    ast.Call,
    ast.Load,
)


@dataclass
class CompiledScript:
    """A validated scoring expression; ``fields`` lists the doc-value
    columns the script reads (gathered once per query by the caller)."""

    source: str
    fields: list[str]
    _code: object = field(repr=False, default=None)

    def __call__(self, score: np.ndarray, values: dict[str, np.ndarray]) -> np.ndarray:
        env = {"__score": np.asarray(score, dtype=np.float64)}
        for f in self.fields:
            env[_var(f)] = np.asarray(values[f], dtype=np.float64)
        out = eval(self._code, {"__builtins__": {}, **_FUNCS}, env)  # noqa: S307
        return np.broadcast_to(
            np.asarray(out, dtype=np.float64), env["__score"].shape
        ).copy()


def _var(fname: str) -> str:
    return "__dv_" + fname.replace(".", "__")


_PARAMS_RE = re.compile(r"params\.([A-Za-z_][A-Za-z0-9_]*)")

_CTX_RE = re.compile(r"ctx\._source\.([A-Za-z_][A-Za-z0-9_.]*)")
_ASSIGN_RE = re.compile(
    r"^ctx\._source\.([A-Za-z_][A-Za-z0-9_.]*)\s*=\s*(.+)$", re.DOTALL
)


def compile_update_script(source: str) -> list[tuple[str, CompiledScript]]:
    """``_update_by_query`` scripts: `;`-separated assignments
    ``ctx._source.<field> = <expr>`` where the expression reads other
    ``ctx._source.*`` values plus the arithmetic/Math subset — each
    expression compiles through the same whitelisted gate as
    script_score (ctx reads rewrite to doc['f'].value).  Returns
    [(target_field, compiled_expr), ...] in statement order."""
    if not isinstance(source, str) or not source.strip():
        raise ValueError("script.source must be a non-empty string")
    out = []
    for stmt in source.split(";"):
        stmt = stmt.strip()
        if not stmt:
            continue
        m = _ASSIGN_RE.match(stmt)
        if not m:
            raise ValueError(
                f"update script statements must be "
                f"'ctx._source.<field> = <expr>': {stmt!r}"
            )
        tgt, expr = m.group(1), m.group(2)
        expr = _CTX_RE.sub(lambda mm: f"doc['{mm.group(1)}'].value", expr)
        out.append((tgt, compile_script(expr)))
    if not out:
        raise ValueError("update script has no assignments")
    return out

_BUCKET_EXTRA_NODES = (
    ast.Compare,
    ast.Gt,
    ast.GtE,
    ast.Lt,
    ast.LtE,
    ast.Eq,
    ast.NotEq,
    ast.BoolOp,
    ast.And,
    ast.Or,
    ast.Mod,
)


@dataclass
class CompiledBucketScript:
    """A validated ``bucket_script`` / ``bucket_selector`` expression:
    variables are the ``buckets_path`` map's keys, spelled
    ``params.<name>`` in painless.  Evaluation is vectorized — each
    variable is a float64 array across the parent's whole bucket list,
    so one numpy expression covers every bucket."""

    source: str
    params: list[str]
    _code: object = field(repr=False, default=None)

    def __call__(self, values: dict[str, np.ndarray]) -> np.ndarray:
        env = {
            "__p_" + p: np.asarray(values[p], dtype=np.float64)
            for p in self.params
        }
        funcs = {**_FUNCS, "logical_and": np.logical_and, "logical_or": np.logical_or}
        out = eval(self._code, {"__builtins__": {}, **funcs}, env)  # noqa: S307
        n = len(next(iter(env.values()))) if env else 1
        return np.broadcast_to(np.asarray(out), (n,)).copy()


class _BoolOpToUfunc(ast.NodeTransformer):
    """``a && b`` must stay vectorized — Python's ``and`` would demand
    a scalar truth value — so BoolOps compile to logical_and/or calls."""

    def visit_BoolOp(self, node: ast.BoolOp) -> ast.AST:
        self.generic_visit(node)
        fname = "logical_and" if isinstance(node.op, ast.And) else "logical_or"
        cur = node.values[0]
        for nxt in node.values[1:]:
            cur = ast.Call(
                func=ast.Name(id=fname, ctx=ast.Load()), args=[cur, nxt], keywords=[]
            )
        return cur


def compile_bucket_script(source: str) -> CompiledBucketScript:
    """Parse + whitelist-validate a pipeline-agg script.  Same AST
    whitelist as ``compile_script`` plus comparisons / ``&&`` / ``||``
    (``bucket_selector`` returns booleans); variables must be
    ``params.*`` references."""
    if not isinstance(source, str) or not source.strip():
        raise ValueError("script.source must be a non-empty string")
    params: list[str] = []

    def _sub(m: re.Match) -> str:
        p = m.group(1)
        if p.startswith("_"):
            raise ValueError(f"invalid param name {p!r} in {source!r}")
        if p not in params:
            params.append(p)
        return "__p_" + p

    rewritten = _PARAMS_RE.sub(_sub, source)
    rewritten = rewritten.replace("&&", " and ").replace("||", " or ")
    rewritten = re.sub(r"\bMath\.([A-Za-z]+)", r"\1", rewritten)
    try:
        tree = ast.parse(rewritten, mode="eval")
    except SyntaxError as e:
        raise ValueError(f"unsupported script syntax: {source!r}") from e
    allowed = _ALLOWED_NODES + _BUCKET_EXTRA_NODES
    names = {"__p_" + p for p in params}
    for node in ast.walk(tree):
        if not isinstance(node, allowed):
            raise ValueError(
                f"unsupported script construct {type(node).__name__} in {source!r}"
            )
        if isinstance(node, ast.Call):
            if (
                not isinstance(node.func, ast.Name)
                or node.func.id not in _FUNCS
                or node.keywords
            ):
                raise ValueError(f"unsupported script function in {source!r}")
        elif isinstance(node, ast.Name) and node.id not in names and node.id not in _FUNCS:
            raise ValueError(f"unknown script variable {node.id!r} in {source!r}")
    tree = ast.fix_missing_locations(_BoolOpToUfunc().visit(tree))
    code = compile(tree, "<bucket_script>", "eval")
    return CompiledBucketScript(source=source, params=params, _code=code)


def compile_script(source: str) -> CompiledScript:
    """Parse + whitelist-validate a ``script.source`` string."""
    if not isinstance(source, str) or not source.strip():
        raise ValueError("script.source must be a non-empty string")
    fields: list[str] = []

    def _sub(m: re.Match) -> str:
        f = m.group(2)
        if f not in fields:
            fields.append(f)
        return _var(f)

    rewritten = _DOC_VALUE_RE.sub(_sub, source).replace("_score", "__score")
    # painless spells functions Math.log(...) — map to the bare name
    rewritten = re.sub(r"\bMath\.([A-Za-z]+)", r"\1", rewritten)
    try:
        tree = ast.parse(rewritten, mode="eval")
    except SyntaxError as e:
        raise ValueError(f"unsupported script syntax: {source!r}") from e
    names = {_var(f) for f in fields} | {"__score"}
    for node in ast.walk(tree):
        if not isinstance(node, _ALLOWED_NODES):
            raise ValueError(
                f"unsupported script construct {type(node).__name__} in {source!r}"
            )
        if isinstance(node, ast.Call):
            if (
                not isinstance(node.func, ast.Name)
                or node.func.id not in _FUNCS
                or node.keywords
            ):
                raise ValueError(f"unsupported script function in {source!r}")
        elif isinstance(node, ast.Name) and node.id not in names and node.id not in _FUNCS:
            raise ValueError(f"unknown script variable {node.id!r} in {source!r}")
    code = compile(tree, "<script_score>", "eval")
    return CompiledScript(source=source, fields=fields, _code=code)
