"""Lucene ``query_string`` syntax for the search DSL.

Reference behavior: the OpenSearch ``query_string`` query — the classic
Lucene QueryParser surface users of the reference loader reach through
``GET /index/_search?q=...`` once documents are loaded (the loader
itself never parses queries; this is index-side capability, like BM25).
Supported syntax:

- fielded clauses ``field:value`` (text fields score BM25, keyword
  fields match as constant-score ``term`` queries)
- ``AND`` / ``OR`` / ``NOT`` (also ``&&`` / ``||`` / ``!``) with sane
  recursive-descent precedence NOT > AND > OR
- ``+must`` / ``-must_not`` clause prefixes
- grouping parens, with group boosts ``(a b)^2``
- quoted phrases ``"a b"`` (BM25 phrase scoring, positions required)
- per-term boosts ``term^2``
- wildcards ``te?t*``, fuzzy ``term~1`` (constant-score rewrite: 1.0)
- ranges ``field:[10 TO 20]`` / ``{10 TO 20}`` (``*`` = open end) and
  one-sided ``field:>=10`` comparisons (constant-score 1.0)
- ``_exists_:field``

Documented deviations from classic Lucene:
- precedence is strict NOT > AND > OR (the classic parser's flat
  heuristics are ambiguous; OpenSearch's own docs call them
  "not intuitive"); parenthesize to be explicit.
- unsupported syntax raises ``ValueError`` instead of being silently
  dropped.

Scoring is Lucene BooleanQuery sum-of-matching-clause scores. Clause
scores are added LEFT TO RIGHT in written order, so float association
is pinned and a SQL oracle can mirror the engine bit-exactly.
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np

from .engine import IndexReader

_TOKEN = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<lp>\()
  | (?P<rp>\))
  | (?P<boost>\^\d+(?:\.\d+)?)
  | (?P<range>(?:[A-Za-z0-9_.]+:)?[\[\{][^\]\}]*[\]\}])
  | (?P<phrase>(?:[A-Za-z0-9_.]+:)?"[^"]*")
  | (?P<op>AND\b|OR\b|NOT\b|&&|\|\|)
  | (?P<plus>\+)
  | (?P<minus>-)
  | (?P<bang>!)
  | (?P<term>[^\s()^"]+)
""",
    re.X,
)

_FIELD = re.compile(r"^([A-Za-z0-9_.]+):(.*)$", re.S)
_FUZZY = re.compile(r"^(.+?)~(\d*)$")
_CMP = re.compile(r"^(>=|<=|>|<)(.+)$", re.S)

_CLAUSE_START = ("lp", "range", "phrase", "term", "plus", "minus", "bang")


def _lex(q: str) -> list[tuple[str, str]]:
    toks: list[tuple[str, str]] = []
    pos = 0
    while pos < len(q):
        m = _TOKEN.match(q, pos)
        if m is None:
            raise ValueError(f"query_string: cannot lex at {q[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind != "ws":
            toks.append((kind, m.group()))
    return toks


def _num(s: str) -> float | int:
    s = s.strip()
    try:
        return int(s)
    except ValueError:
        return float(s)


def _parse_leaf(tokkind: str, text: str) -> tuple:
    """One leaf token -> ('leaf', kind, field, payload)."""
    field = None
    if tokkind in ("term", "range", "phrase"):
        m = _FIELD.match(text)
        if m and m.group(2):
            field, text = m.group(1), m.group(2)
    if tokkind == "phrase":
        body = text[1:-1]
        if not body.strip():
            raise ValueError("query_string: empty phrase")
        return ("leaf", "phrase", field, body)
    if tokkind == "range" or (text and text[0] in "[{"):
        if field is None:
            raise ValueError("query_string: range needs a field prefix")
        inner = text[1:-1]
        parts = re.split(r"\s+TO\s+", inner, flags=re.I)
        if len(parts) != 2:
            raise ValueError(f"query_string: bad range {text!r}")
        lo, hi = (p.strip() for p in parts)
        bounds: dict[str, Any] = {}
        if lo != "*":
            bounds["gte" if text[0] == "[" else "gt"] = _num(lo)
        if hi != "*":
            bounds["lte" if text[-1] == "]" else "lt"] = _num(hi)
        return ("leaf", "range", field, bounds)
    if field == "_exists_":
        return ("leaf", "exists", None, text)
    m = _CMP.match(text)
    if m:
        if field is None:
            raise ValueError("query_string: comparison needs a field prefix")
        op = {">": "gt", ">=": "gte", "<": "lt", "<=": "lte"}[m.group(1)]
        return ("leaf", "range", field, {op: _num(m.group(2))})
    m = _FUZZY.match(text)
    if m and m.group(2) != "" or (m and text.endswith("~")):
        edits = int(m.group(2)) if m.group(2) else 2  # bare ~ = AUTO-ish
        return ("leaf", "fuzzy", field, (m.group(1), edits))
    if "*" in text or "?" in text:
        return ("leaf", "wildcard", field, text)
    return ("leaf", "match", field, text)


class _Parser:
    def __init__(self, toks: list[tuple[str, str]], default_op: str):
        self.toks = toks
        self.i = 0
        self.default_occur = "must" if default_op == "and" else "should"

    def _peek(self) -> str | None:
        return self.toks[self.i][0] if self.i < len(self.toks) else None

    def _peek_text(self) -> str:
        return self.toks[self.i][1] if self.i < len(self.toks) else ""

    def _next(self) -> tuple[str, str]:
        if self.i >= len(self.toks):
            raise ValueError("query_string: unexpected end of input")
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse(self) -> tuple:
        node = self.or_expr()
        if self.i != len(self.toks):
            raise ValueError(
                f"query_string: trailing input at {self._peek_text()!r}"
            )
        return node

    def _operands(self, sub, op_text: str, occur: str) -> tuple:
        items = [sub()]
        found = False
        while self._peek() == "op" and self._peek_text() == op_text:
            self._next()
            found = True
            items.append(sub())
        if not found:
            return items[0]
        clauses: list[tuple[str, tuple]] = []
        for it in items:
            if isinstance(it, list):  # clause list from seq_expr
                if len(it) == 1:
                    c_occur, node = it[0]
                    clauses.append(
                        (c_occur if c_occur == "must_not" else occur, node)
                    )
                else:
                    clauses.append((occur, ("group", it)))
            else:
                clauses.append((occur, it))
        return ("group", clauses)

    def or_expr(self) -> tuple:
        node = self._operands(self.and_expr, "OR", "should")
        return self._unwrap(node)

    def and_expr(self) -> tuple:
        node = self._operands(self.seq_expr, "AND", "must")
        return node

    def _unwrap(self, node):
        """A single-clause positive seq needs no group wrapper."""
        if isinstance(node, list):
            if len(node) == 1 and node[0][0] != "must_not":
                return node[0][1]
            return ("group", node)
        return node

    def seq_expr(self) -> list[tuple[str, tuple]]:
        """Adjacent clauses combined with the default operator;
        explicit +/-/NOT prefixes override the occur."""
        clauses: list[tuple[str, tuple]] = []
        while True:
            kind = self._peek()
            if kind == "op" and self._peek_text() == "NOT":
                self._next()
                clauses.append(("must_not", self.primary()))
                continue
            if kind in ("plus", "minus", "bang"):
                self._next()
                occur = "must" if kind == "plus" else "must_not"
                clauses.append((occur, self.primary()))
                continue
            if kind in ("lp", "range", "phrase", "term"):
                clauses.append((self.default_occur, self.primary()))
                continue
            break
        if not clauses:
            raise ValueError(
                f"query_string: expected a clause at {self._peek_text()!r}"
            )
        return clauses

    def primary(self) -> tuple:
        kind, text = self._next()
        if kind == "lp":
            node = self.or_expr()
            if self._peek() != "rp":
                raise ValueError("query_string: unbalanced parens")
            self._next()
        elif kind in ("range", "phrase", "term"):
            node = _parse_leaf(kind, text)
        else:
            raise ValueError(f"query_string: unexpected token {text!r}")
        if self._peek() == "boost":
            _, btext = self._next()
            node = ("boost", float(btext[1:]), node)
        return node


def parse_query_string(q: str, default_operator: str = "or") -> tuple:
    node = _Parser(_lex(q), str(default_operator).lower()).parse()
    if isinstance(node, list):  # bare adjacency at top level
        if len(node) == 1 and node[0][0] != "must_not":
            return node[0][1]
        return ("group", node)
    return node


# --------------------------------------------------------------- evaluation
# Every node evaluates to (ids, scores): REAL doc ids sorted ascending
# (uint64) and their aligned float64 scores. Boolean combines are
# sorted-array set algebra (intersect/union/setdiff) and score
# accumulation is one searchsorted gather per clause — no per-doc
# Python. Per-doc additions still happen in WRITTEN clause order, so
# float association is identical to summing clause-by-clause.
_EMPTY = (np.empty(0, np.uint64), np.empty(0, np.float64))


def _ids_only(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(ids, dtype=np.uint64)
    return ids, np.ones(ids.size, dtype=np.float64)


def _from_hits(hits: list[tuple[int, float]]) -> tuple[np.ndarray, np.ndarray]:
    if not hits:
        return _EMPTY
    ids = np.array([d for d, _ in hits], dtype=np.uint64)
    sc = np.array([s for _, s in hits], dtype=np.float64)
    order = np.argsort(ids, kind="stable")
    return ids[order], sc[order]


def _eval_leaf(
    r: IndexReader, kind: str, field: str | None, payload, default_field: str | None
) -> tuple[np.ndarray, np.ndarray]:
    if field is None:
        field = default_field
    text_cols = list(r.manifest.get("text_cols") or [r.primary_field])
    f = None if field in (None, r.primary_field) else field
    if kind == "match":
        if field is not None and field not in text_cols:
            # keyword field: constant-score term query
            return _ids_only(r.term_docs(field, str(payload)))
        terms = r.field_terms(str(payload), f)
        if len(terms) != 1:
            # a token that analyzes to several terms (e.g. "a.b"):
            # the engine's own multi-term combine
            return _from_hits(r.search_pruned(str(payload), r.n_docs, field=f))
        postings = r.load_postings(terms)
        p = postings.get(terms[0])
        if p is None:
            return _EMPTY
        contrib = r.idf(p.df) * r._norm_cached(p, r.field_avgdl(f))
        real = r._map_ordinals(p.doc_ids)
        order = np.argsort(real, kind="stable")
        return real[order].astype(np.uint64), contrib[order].astype(np.float64)
    if kind == "phrase":
        if field is not None and field not in text_cols:
            raise ValueError(f"query_string: phrase needs a text field, got {field!r}")
        return _from_hits(r.search_phrase(str(payload), r.n_docs, field=f))
    if kind in ("wildcard", "fuzzy"):
        if field is not None and field not in text_cols:
            raise ValueError(
                f"query_string: {kind} runs on the term dictionary of a "
                f"text field, got {field!r}"
            )
        if kind == "wildcard":
            return _ids_only(r.wildcard_docs(str(payload), f))
        text, edits = payload
        return _ids_only(r.fuzzy_docs(str(text), max_edits=int(edits), field=f))
    if kind == "range":
        return _ids_only(r.range_docs(field, **payload))
    if kind == "exists":
        return _ids_only(r.exists_docs(str(payload)))
    raise ValueError(f"query_string: unknown leaf kind {kind!r}")


def _eval(
    r: IndexReader, node: tuple, default_field: str | None
) -> tuple[np.ndarray, np.ndarray]:
    tag = node[0]
    if tag == "leaf":
        return _eval_leaf(r, node[1], node[2], node[3], default_field)
    if tag == "boost":
        ids, sc = _eval(r, node[2], default_field)
        return ids, sc * node[1]
    if tag == "group":
        evaled = [
            (occur, _eval(r, child, default_field)) for occur, child in node[1]
        ]
        musts = [ids for occur, (ids, _) in evaled if occur == "must"]
        shoulds = [ids for occur, (ids, _) in evaled if occur == "should"]
        nots = [ids for occur, (ids, _) in evaled if occur == "must_not"]
        if musts:
            docs = musts[0]
            for ids in musts[1:]:
                docs = np.intersect1d(docs, ids, assume_unique=True)
        elif shoulds:
            docs = shoulds[0]
            for ids in shoulds[1:]:
                docs = np.union1d(docs, ids)
        else:
            raise ValueError(
                "query_string: a group needs at least one positive clause"
            )
        for ids in nots:
            docs = np.setdiff1d(docs, ids, assume_unique=True)
        scores = np.zeros(docs.size, dtype=np.float64)
        if docs.size:
            for occur, (ids, sc) in evaled:
                if occur == "must_not" or ids.size == 0:
                    continue
                pos = np.minimum(
                    np.searchsorted(ids, docs), ids.size - 1
                )
                m = ids[pos] == docs
                scores[m] += sc[pos[m]]
        return docs, scores
    raise ValueError(f"query_string: unknown node {tag!r}")


def query_string_hits(
    r: IndexReader, spec: dict, k: int
) -> list[tuple[int, float]]:
    """Scored hits for a ``query_string`` spec: parse, evaluate, rank by
    (score desc, doc_id asc).

    Scale note: each leaf is one engine primitive (a decoded posting
    list with its cached BM25 tf-norms, or a doc-value /
    term-dictionary set); combines are vectorized sorted-array algebra,
    never per-doc Python. A 100-TB serving deployment runs this inside
    the BatchSearcher actor pool exactly like every other DSL kind — no
    driver-side data."""
    node = parse_query_string(
        str(spec["query"]), str(spec.get("default_operator", "or"))
    )
    ids, scores = _eval(r, node, spec.get("default_field"))
    idx = np.lexsort((ids, -scores))[:k]
    return [(int(ids[i]), float(scores[i])) for i in idx]


def query_string_docs(r: IndexReader, spec: dict) -> np.ndarray:
    """Unscored doc-id set (sorted uint64) for filter / agg contexts."""
    node = parse_query_string(
        str(spec["query"]), str(spec.get("default_operator", "or"))
    )
    ids, _ = _eval(r, node, spec.get("default_field"))
    return ids
