"""Percolator: vectorized reverse-search matches vs a brute-force
per-doc evaluator, plus parse-time rejection of unsupported shapes."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from raybm25.analysis import tokenize
from raybm25.query.percolate import PercolateIndex, PercolateStage, percolate

DOCS = [
    "merge join stream fast",
    "merge sort slow path",
    "join stream window",
    "merge merge stream",
    "sort only here window",
    "stream stream fast",
    "nothing relevant",
]
LANGS = ["en", "en", "de", "en", "fr", "de", "en"]

QUERIES = {
    0: {"match": {"text": "merge join"}},                      # OR
    1: {"match": {"text": {"query": "merge join", "operator": "and"}}},
    2: {"term": {"lang": "en"}},
    3: {"bool": {"must": [{"match": {"text": "stream"}}],
                 "must_not": [{"match": {"text": "sort"}}]}},
    4: {"bool": {"must": [{"match": {"text": {"query": "merge stream",
                                              "operator": "and"}}}],
                 "filter": [{"term": {"lang": "en"}}]}},
    5: {"bool": {"must": [{"match": {"text": "window"}}],
                 "must_not": [{"term": {"lang": "fr"}}]}},
}


def _brute(doc_text, lang, body):
    toks = set(tokenize(doc_text))

    def leaf(clause, ):
        kind, spec = next(iter(clause.items()))
        if kind == "match":
            _f, q = next(iter(spec.items()))
            if isinstance(q, dict):
                terms = set(tokenize(q["query"]))
                if q.get("operator") == "and":
                    return terms <= toks
                return bool(terms & toks)
            return bool(set(tokenize(q)) & toks)
        if kind == "term":
            f, v = next(iter(spec.items()))
            return {"lang": lang}[f] == v
        raise AssertionError(kind)

    kind, spec = next(iter(body.items()))
    if kind != "bool":
        return leaf(body)
    must = spec.get("must", []) + spec.get("filter", [])
    if not all(leaf(c) for c in must):
        return False
    return not any(leaf(c) for c in spec.get("must_not", []))


def _batch():
    return pa.table(
        {"doc_id": list(range(len(DOCS))), "text": DOCS, "lang": LANGS}
    )


def test_matches_equal_brute_force():
    idx = PercolateIndex(QUERIES)
    d, q = idx.match_batch(_batch())
    got = set(zip(d.tolist(), q.tolist()))
    want = {
        (i, qid)
        for i, (t, l) in enumerate(zip(DOCS, LANGS))
        for qid, body in QUERIES.items()
        if _brute(t, l, body)
    }
    assert got == want
    assert want  # non-degenerate


@settings(max_examples=40, deadline=None)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["merge", "join", "stream", "sort", "window"]),
            min_size=0, max_size=6,
        ).map(" ".join),
        min_size=1, max_size=6,
    )
)
def test_fuzz_matches_equal_brute_force(texts):
    langs = ["en" if i % 2 == 0 else "de" for i in range(len(texts))]
    batch = pa.table(
        {"doc_id": list(range(len(texts))), "text": texts, "lang": langs}
    )
    idx = PercolateIndex(QUERIES)
    d, q = idx.match_batch(batch)
    got = set(zip(d.tolist(), q.tolist()))
    want = {
        (i, qid)
        for i, (t, l) in enumerate(zip(texts, langs))
        for qid, body in QUERIES.items()
        if _brute(t, l, body)
    }
    assert got == want


def test_parse_rejections():
    with pytest.raises(ValueError):
        PercolateIndex({0: {"wildcard": {"text": "x*"}}})
    with pytest.raises(ValueError):
        PercolateIndex({0: {"bool": {"must_not": [{"match": {"text": "x"}}]}}})
    with pytest.raises(ValueError):
        PercolateIndex({0: {"match": {"text": "!!!"}}})
    with pytest.raises(ValueError):
        # two OR clauses under one bool — ambiguous in the flat table
        PercolateIndex(
            {0: {"bool": {"must": [{"match": {"text": "a b"}},
                                   {"match": {"text": "c d"}}]}}}
        )
    with pytest.raises(ValueError):
        # must_not with operator=and unsupported (documented)
        PercolateIndex(
            {0: {"bool": {"must": [{"match": {"text": "a"}}],
                          "must_not": [{"match": {"text": {
                              "query": "b c", "operator": "and"}}}]}}}
        )


def test_streaming_percolate(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_batch())
    out = percolate(ds, QUERIES, concurrency=1).to_pandas()
    got = set(zip(out["doc_id"], out["query_id"]))
    want = {
        (i, qid)
        for i, (t, l) in enumerate(zip(DOCS, LANGS))
        for qid, body in QUERIES.items()
        if _brute(t, l, body)
    }
    assert got == want


def test_empty_batch_and_no_queries():
    idx = PercolateIndex(QUERIES)
    d, q = idx.match_batch(pa.table({"doc_id": pa.array([], pa.int64()),
                                     "text": pa.array([], pa.string()),
                                     "lang": pa.array([], pa.string())}))
    assert d.size == 0 and q.size == 0
    empty = PercolateIndex({})
    d2, q2 = empty.match_batch(_batch())
    assert d2.size == 0
