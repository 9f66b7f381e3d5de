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
