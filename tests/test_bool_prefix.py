"""match_bool_prefix / multi_match bool_prefix against brute force.

Reference behavior: OpenSearch's search-as-you-type query family —
``match_bool_prefix`` builds a bool should of term clauses plus a
trailing prefix clause; ``multi_match type: bool_prefix`` applies it
per field and sums the field scores
(/root/reference/opensearch_loader/loader.py:239-275 configures the
sayt mappings that exist to serve these queries)."""

import math
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from raybm25 import BM25_B, BM25_K1
from raybm25.index.build import build_index
from raybm25.query.dsl import run_query
from raybm25.query.engine import IndexReader

TOK = re.compile(r"[a-z0-9]+")

DOCS = [
    "merge sort quick sort merge",
    "merge sorted lists fast",
    "sorrow has no merge",
    "partition partial sorting station",
    "unrelated words only here",
    "merge merge merge nothing else",
    "sort of a sordid tale",
]
TITLES = [
    "sorting guide",
    "merge manual",
    "misc",
    "partitions",
    "nothing",
    "merges",
    "sor",
]


@pytest.fixture(scope="module")
def rdr(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("boolprefix")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(DOCS))),
                "text": DOCS,
                "title": TITLES,
            }
        ),
        str(tmp / "d.parquet"),
    )
    idx = str(tmp / "idx")
    build_index(
        str(tmp / "d.parquet"),
        idx,
        key_col="doc_id",
        id_col="doc_id",
        ts_col=None,
        text_cols=("text", "title"),
        num_buckets=2,
    )
    return IndexReader(idx)


def _toks(s):
    return TOK.findall(s.lower())


def _brute_field(query, col_docs):
    """Brute-force match_bool_prefix over one field's doc texts:
    {doc: score}."""
    qtoks = _toks(query)
    head, prefix = qtoks[:-1], qtoks[-1]
    n = len(col_docs)
    dls = [len(_toks(d)) for d in col_docs]
    avgdl = sum(dls) / n
    scores: dict[int, float] = {}
    for t, qtf in Counter(head).items():
        df = sum(t in _toks(d) for d in col_docs)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for i, d in enumerate(col_docs):
            tf = _toks(d).count(t)
            if tf:
                norm = tf / (tf + BM25_K1 * (1 - BM25_B + BM25_B * dls[i] / avgdl))
                scores[i] = scores.get(i, 0.0) + qtf * idf * norm
    for i, d in enumerate(col_docs):
        if any(t.startswith(prefix) for t in _toks(d)):
            scores[i] = scores.get(i, 0.0) + 1.0
    return scores


def _rank(scores, k):
    return sorted(scores.items(), key=lambda t: (-t[1], t[0]))[:k]


def test_match_bool_prefix_matches_brute_force(rdr):
    hits = rdr.match_bool_prefix("merge sor", k=10)
    exp = _rank(_brute_field("merge sor", DOCS), 10)
    assert [d for d, _ in hits] == [d for d, _ in exp]
    for (_, s), (_, e) in zip(hits, exp):
        assert s == pytest.approx(e, rel=1e-12)


def test_single_token_is_pure_prefix_clause(rdr):
    # one token -> constant-score prefix query; all scores exactly 1.0
    hits = rdr.match_bool_prefix("sor", k=10)
    exp = sorted(i for i, d in enumerate(DOCS) if any(t.startswith("sor") for t in _toks(d)))
    assert [d for d, _ in hits] == exp
    assert all(s == 1.0 for _, s in hits)


def test_prefix_expansion_includes_exact_term(rdr):
    # "sort" is both a complete term and a prefix of "sorted"/"sorting"
    hits = dict(rdr.match_bool_prefix("merge sort", k=10))
    exp = _brute_field("merge sort", DOCS)
    assert set(hits) == set(exp)


def test_absent_head_terms_still_prefix_match(rdr):
    hits = rdr.match_bool_prefix("zzznothere sor", k=10)
    exp = sorted(i for i, d in enumerate(DOCS) if any(t.startswith("sor") for t in _toks(d)))
    assert [d for d, _ in hits] == exp


def test_no_match_returns_empty(rdr):
    assert rdr.match_bool_prefix("zzz qqq", k=5) == []
    assert rdr.match_bool_prefix("", k=5) == []


def test_multi_field_bool_prefix_sums_fields(rdr):
    hits = rdr.search_bool_prefix_multi("merge sor", ["text", "title"], k=10)
    a = _brute_field("merge sor", DOCS)
    b = _brute_field("merge sor", TITLES)
    comb = {d: a.get(d, 0.0) + b.get(d, 0.0) for d in set(a) | set(b)}
    exp = _rank(comb, 10)
    assert [d for d, _ in hits] == [d for d, _ in exp]
    for (_, s), (_, e) in zip(hits, exp):
        assert s == pytest.approx(e, rel=1e-12)


def test_dsl_match_bool_prefix(rdr):
    resp = run_query(
        rdr,
        {"size": 5, "query": {"match_bool_prefix": {"text": {"query": "merge sor"}}}},
    )
    exp = _rank(_brute_field("merge sor", DOCS), 5)
    assert [h["_id"] for h in resp["hits"]["hits"]] == [d for d, _ in exp]


def test_dsl_multi_match_bool_prefix(rdr):
    resp = run_query(
        rdr,
        {
            "size": 5,
            "query": {
                "multi_match": {
                    "query": "merge sor",
                    "fields": ["text", "title"],
                    "type": "bool_prefix",
                }
            },
        },
    )
    a = _brute_field("merge sor", DOCS)
    b = _brute_field("merge sor", TITLES)
    comb = {d: a.get(d, 0.0) + b.get(d, 0.0) for d in set(a) | set(b)}
    assert [h["_id"] for h in resp["hits"]["hits"]] == [d for d, _ in _rank(comb, 5)]


def test_filter_context_unscored_set(rdr):
    resp = run_query(
        rdr,
        {
            "size": 10,
            "query": {
                "bool": {
                    "must": [{"match": {"text": {"query": "merge"}}}],
                    "filter": [
                        {"match_bool_prefix": {"text": {"query": "sor"}}}
                    ],
                }
            },
        },
    )
    got = sorted(h["_id"] for h in resp["hits"]["hits"])
    exp = sorted(
        i
        for i, d in enumerate(DOCS)
        if "merge" in _toks(d) and any(t.startswith("sor") for t in _toks(d))
    )
    assert got == exp


def test_secondary_field_query(rdr):
    hits = rdr.match_bool_prefix("merge sor", k=10, field="title")
    exp = _rank(_brute_field("merge sor", TITLES), 10)
    assert [d for d, _ in hits] == [d for d, _ in exp]
    for (_, s), (_, e) in zip(hits, exp):
        assert s == pytest.approx(e, rel=1e-12)
