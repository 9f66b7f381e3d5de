"""Percolator: reverse search — match incoming documents against a
set of STORED queries (the OpenSearch ``percolate`` query /
``.percolator`` field type; the alerting / saved-search primitive).

Forward search broadcasts a query against an indexed corpus; a
percolator broadcasts the QUERY SET against a document stream.  At
100 TB the query set is the small side (thousands of alerts, KBs):
it is parsed once into flat numpy term tables, shipped to every
worker via ``ray.put``, and each batch of documents is matched with
set algebra — one tokenize pass, one sorted join of the batch's
distinct (doc, term) pairs against the query-term table, then
per-(doc, query) match-count verification.  No per-doc Python loop,
no shuffle; the matched (doc, query) pairs stream out.

Supported stored-query subset (parsed by :func:`_parse_query`):

- ``{"match": {field: text}}`` — OR semantics (any analyzed term),
  ``{"match": {field: {"query": text, "operator": "and"}}}`` — ALL
  terms required
- ``{"term": {keyword_field: value}}`` — exact keyword equality
- ``{"bool": {"must": [...], "must_not": [...], "filter": [...]}}``
  over the above (must_not excludes on ANY inner match; filter is
  must without scoring — identical here since percolation is boolean)

Anything else raises ``ValueError`` at registration time (loud, not
silently wrong).  Scoring is intentionally boolean — OpenSearch
percolation relevance is rarely used and its semantics are
query-dependent; matches are returned in (doc, query_id) order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..analysis import arrow_tokenize, tokenize
from ..util import auto_concurrency


def _parse_query(qid: int, body: dict, out: dict) -> None:
    """Flatten one stored query into the accumulator tables."""
    if len(body) != 1:
        raise ValueError(f"query {qid}: exactly one top-level clause")
    kind, spec = next(iter(body.items()))
    if kind == "bool":
        for mkind in ("must", "filter"):
            for clause in spec.get(mkind, []):
                _parse_leaf(qid, clause, out, negate=False)
        for clause in spec.get("must_not", []):
            _parse_leaf(qid, clause, out, negate=True)
        if not (spec.get("must") or spec.get("filter")):
            raise ValueError(
                f"query {qid}: bool needs at least one must/filter clause"
            )
    else:
        _parse_leaf(qid, body, out, negate=False)


def _parse_leaf(qid: int, body: dict, out: dict, negate: bool) -> None:
    if len(body) != 1:
        raise ValueError(f"query {qid}: clause must have one key")
    kind, spec = next(iter(body.items()))
    if kind == "match":
        field, q = next(iter(spec.items()))
        if isinstance(q, dict):
            text = str(q.get("query", ""))
            conj = str(q.get("operator", "or")) == "and"
        else:
            text, conj = str(q), False
        terms = sorted(set(tokenize(text)))
        if not terms:
            raise ValueError(f"query {qid}: match text analyzes to nothing")
        if negate:
            # NOT(or-match) excludes on any term; NOT(and-match) would
            # need per-doc full-count logic — restrict to OR (loud)
            if conj:
                raise ValueError(
                    f"query {qid}: must_not match supports OR operator only"
                )
            out["neg_terms"] += [(t, qid) for t in terms]
        elif conj:
            out["and_terms"] += [(t, qid) for t in terms]
            out["and_need"][qid] = out["and_need"].get(qid, 0) + len(terms)
        else:
            out["or_terms"] += [(t, qid) for t in terms]
            out["or_groups"][qid] = out["or_groups"].get(qid, 0) + 1
    elif kind == "term":
        field, v = next(iter(spec.items()))
        if isinstance(v, dict):
            v = v.get("value")
        (out["neg_kw"] if negate else out["kw"]).append(
            (str(field), str(v), qid)
        )
    else:
        raise ValueError(f"query {qid}: unsupported clause {kind!r}")


class PercolateIndex:
    """Parsed, numpy-resident form of the stored query set.

    Built once on the driver from ``{query_id: body}`` and broadcast;
    ``match_batch`` runs on workers.  Requirement tables are sized by
    ``max(query_id) + 1`` (8 bytes/slot × 3) — keep ids dense; an
    alerting system's query registry naturally is.
    """

    def __init__(self, queries: dict[int, dict]):
        acc = {
            "or_terms": [], "and_terms": [], "neg_terms": [],
            "kw": [], "neg_kw": [],
            "and_need": {}, "or_groups": {},
        }
        self.query_ids = np.array(sorted(queries), dtype=np.int64)
        for qid in sorted(queries):
            _parse_query(int(qid), queries[qid], acc)
        for qid, n in acc["or_groups"].items():
            if n > 1:
                # the flat or-table can't distinguish WHICH clause a
                # term hit came from; require AND clauses instead
                raise ValueError(
                    f"query {qid}: at most one OR match clause per "
                    "query (use operator:'and' clauses to compose)"
                )
        n_q = int(self.query_ids.max()) + 1 if len(queries) else 0

        def _term_table(pairs):
            if not pairs:
                return (np.empty(0, dtype=object), np.empty(0, np.int64))
            pairs = sorted(pairs)
            return (
                np.array([t for t, _ in pairs], dtype=object),
                np.array([q for _, q in pairs], dtype=np.int64),
            )

        self.or_t, self.or_q = _term_table(acc["or_terms"])
        self.and_t, self.and_q = _term_table(acc["and_terms"])
        self.neg_t, self.neg_q = _term_table(acc["neg_terms"])
        self.kw = acc["kw"]
        self.neg_kw = acc["neg_kw"]
        # per-query requirements
        self.and_need = np.zeros(n_q, dtype=np.int64)
        for q, n in acc["and_need"].items():
            self.and_need[q] = n
        # queries whose positive side includes an OR group must match
        # at least one term of EACH group; with one group per clause
        # and clauses rare, track group count
        self.or_need = np.zeros(n_q, dtype=np.int64)
        for q, n in acc["or_groups"].items():
            self.or_need[q] = n
        self.kw_need = np.zeros(n_q, dtype=np.int64)
        for _f, _v, q in self.kw:
            self.kw_need[q] += 1
        self.n_q = n_q

    # ---------------------------------------------------------- match
    def _join(self, terms_sorted, doc_of, table_t, table_q):
        """(doc, query) pairs where a doc term appears in the table.
        ``terms_sorted``/``doc_of``: the batch's distinct (term, doc)
        pairs sorted by term; returns per-pair arrays."""
        if table_t.size == 0 or terms_sorted.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        lo = np.searchsorted(terms_sorted, table_t, side="left")
        hi = np.searchsorted(terms_sorted, table_t, side="right")
        counts = hi - lo
        if counts.sum() == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        qrep = np.repeat(table_q, counts)
        idx = np.concatenate(
            [np.arange(a, b) for a, b in zip(lo, hi) if b > a]
        )
        return doc_of[idx], qrep

    def match_batch(self, batch: pa.Table, text_col: str = "text"
                    ) -> tuple[np.ndarray, np.ndarray]:
        """Row positions and query ids of every (doc, query) match."""
        n_rows = batch.num_rows
        tid, terms, doc_pos, _dl = arrow_tokenize(batch.column(text_col))
        # distinct (doc, term) pairs, then re-sort by TERM STRING so
        # query-term lookups are one searchsorted each
        if tid.size:
            o = np.lexsort((tid, doc_pos))
            ds_, ts_ = doc_pos[o], tid[o]
            first = np.ones(ds_.size, dtype=bool)
            first[1:] = (ds_[1:] != ds_[:-1]) | (ts_[1:] != ts_[:-1])
            d_doc, d_tid = ds_[first], ts_[first]
            tstr = terms[d_tid]
            o2 = np.argsort(tstr, kind="stable")
            tstr, d_doc = tstr[o2], d_doc[o2]
        else:
            tstr = np.empty(0, dtype=object)
            d_doc = np.empty(0, np.int64)

        key = lambda d, q: d * np.int64(self.n_q or 1) + q  # noqa: E731

        # positive term evidence: count distinct matched terms per
        # (doc, query) for AND queries; any hit satisfies an OR group
        and_d, and_q = self._join(tstr, d_doc, self.and_t, self.and_q)
        or_d, or_q = self._join(tstr, d_doc, self.or_t, self.or_q)
        neg_d, neg_q = self._join(tstr, d_doc, self.neg_t, self.neg_q)

        # keyword clauses: column equality per query
        kw_d, kw_q = [], []
        for f, v, q in self.kw:
            col = batch.column(f).to_numpy(zero_copy_only=False)
            rows = np.flatnonzero(col.astype(str) == v)
            kw_d.append(rows)
            kw_q.append(np.full(rows.size, q, dtype=np.int64))
        for f, v, q in self.neg_kw:
            col = batch.column(f).to_numpy(zero_copy_only=False)
            rows = np.flatnonzero(col.astype(str) == v)
            neg_d = np.concatenate([neg_d, rows])
            neg_q = np.concatenate([neg_q, np.full(rows.size, q, np.int64)])
        if kw_d:
            kw_d = np.concatenate(kw_d)
            kw_q = np.concatenate(kw_q)
        else:
            kw_d = np.empty(0, np.int64)
            kw_q = np.empty(0, np.int64)

        # aggregate per (doc, query) — all vectorized: distinct
        # matched-term counts for AND, any-hit for OR, equality counts
        # for keyword clauses, then one boolean verdict per candidate
        if self.n_q == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        k_and, c_and = (
            np.unique(key(and_d, and_q), return_counts=True)
            if and_d.size
            else (np.empty(0, np.int64), np.empty(0, np.int64))
        )
        k_kw, c_kw = (
            np.unique(key(kw_d, kw_q), return_counts=True)
            if kw_d.size
            else (np.empty(0, np.int64), np.empty(0, np.int64))
        )
        k_or = (
            np.unique(key(or_d, or_q)) if or_d.size
            else np.empty(0, np.int64)
        )
        k_neg = (
            np.unique(key(neg_d, neg_q)) if neg_d.size
            else np.empty(0, np.int64)
        )
        cand = np.union1d(np.union1d(k_and, k_kw), k_or)
        if cand.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)

        def _lookup(keys, counts, want):
            out = np.zeros(want.size, dtype=np.int64)
            if keys.size:
                pos = np.minimum(
                    np.searchsorted(keys, want), keys.size - 1
                )
                found = keys[pos] == want
                out[found] = counts[pos[found]]
            return out

        nq = np.int64(self.n_q)
        d = cand // nq
        q = (cand % nq).astype(np.int64)
        ca = _lookup(k_and, c_and, cand)
        ck = _lookup(k_kw, c_kw, cand)
        co = _lookup(k_or, np.ones(k_or.size, np.int64), cand)
        neg = np.isin(cand, k_neg, assume_unique=True)
        need_a = self.and_need[q]
        need_o = self.or_need[q]
        need_k = self.kw_need[q]
        ok = (
            ~neg
            & (ca >= need_a)
            & ((need_o == 0) | (co > 0))
            & (ck >= need_k)
            & ((need_a + need_o + need_k) > 0)
        )
        return d[ok].astype(np.int64), q[ok]


class PercolateStage:
    """``map_batches`` stage: emit one row per (document, stored
    query) match — ``(id_col value, query_id)``.

    ``index`` may be a ``ray.ObjectRef`` of a :class:`PercolateIndex`
    (broadcast once, resolved per actor) or the index itself.
    """

    def __init__(self, index, id_col: str = "doc_id",
                 text_col: str = "text"):
        import ray

        if isinstance(index, ray.ObjectRef):
            index = ray.get(index)
        self.index = index
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows, qids = self.index.match_batch(batch, self.text_col)
        ids = batch.column(self.id_col).take(pa.array(rows))
        return pa.table(
            {
                self.id_col: ids,
                "query_id": pa.array(qids, pa.int64()),
            }
        )


def percolate(ds, queries: dict[int, dict], id_col: str = "doc_id",
              text_col: str = "text", concurrency=None):
    """Match a document Dataset against stored queries; returns the
    streaming (id, query_id) match pairs."""
    import ray

    ref = ray.put(PercolateIndex(queries))
    return ds.map_batches(
        PercolateStage,
        fn_constructor_kwargs={
            "index": ref, "id_col": id_col, "text_col": text_col
        },
        batch_format="pyarrow",
        # (1, N) autoscaling pool: a fixed pool sized to the session's
        # whole CPU count deadlocks small sessions (see decontam.py)
        concurrency=(
            (1, concurrency) if isinstance(concurrency, int)
            else concurrency if concurrency is not None
            else auto_concurrency()
        ),
    )
