"""multi_match best_fields (dis_max) scoring: engine semantics and the
DSL adapter path. Reference behavior: OpenSearch's default multi_match
type, which the reference's multi-field mappings
(/root/reference/opensearch_loader/loader.py:239-275) exist to serve."""

import numpy as np
import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.query.dsl import run_query
from raybm25.query.engine import IndexReader

DOCS = [
    (0, "merge join fast stream", "fast merge"),
    (1, "merge sort slow", "slow sort title"),
    (2, "join stream window", "window join"),
    (3, "sort only tokens here", "merge"),
    (4, "merge merge stream", "stream stream stream"),
    (5, "window stream join merge", "join"),
]


@pytest.fixture(scope="module")
def rdr(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dismax")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": [i for i, _, _ in DOCS],
                "text": [t for _, t, _ in DOCS],
                "title": [s for _, _, s in DOCS],
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
        keyword_cols=(),
        stored_cols=["text", "title"],
        num_buckets=2,
    )
    return IndexReader(idx)


def _per_field_scores(rdr, query, field):
    return dict(rdr.search(query, k=len(DOCS), field=None if field == "text" else field))


def test_dismax_matches_hand_combine(rdr):
    """score = best field + tie_breaker * (sum of the others), built by
    hand from the engine's own per-field searches."""
    q = "merge stream"
    tb = 0.3
    s_text = _per_field_scores(rdr, q, "text")
    s_title = _per_field_scores(rdr, q, "title")
    expect = {}
    for d in set(s_text) | set(s_title):
        a, b = s_text.get(d, 0.0), s_title.get(d, 0.0)
        expect[d] = max(a, b) + tb * ((a + b) - max(a, b))
    hits = rdr.search_dismax(q, ["text", "title"], tie_breaker=tb, k=len(DOCS))
    assert dict(hits) == pytest.approx(expect, rel=1e-12)
    # ranked by score desc, doc_id asc
    scores = [s for _, s in hits]
    assert scores == sorted(scores, reverse=True)


def test_dismax_single_field_equals_search(rdr):
    """Over one field, dis_max degenerates to plain BM25 regardless of
    tie_breaker."""
    base = rdr.search("merge stream", k=6)
    got = rdr.search_dismax("merge stream", ["text"], tie_breaker=0.7, k=6)
    assert got == base


def test_dismax_tiebreaker_one_equals_most_fields(rdr):
    """tie_breaker=1.0 makes best_fields score == most_fields score
    (max + 1.0*(total-max) = total) for every doc."""
    dm = dict(rdr.search_dismax("merge stream", ["text", "title"], tie_breaker=1.0, k=6))
    mf = dict(rdr.search_multi("merge stream", ["text", "title"], k=6))
    assert set(dm) == set(mf)
    for d in dm:
        assert dm[d] == pytest.approx(mf[d], rel=1e-12)


def test_dismax_missing_terms(rdr):
    assert rdr.search_dismax("zzz qqq", ["text", "title"], k=5) == []


def test_dsl_multi_match_best_fields(rdr):
    resp = run_query(
        rdr,
        {
            "query": {
                "multi_match": {
                    "query": "merge stream",
                    "fields": ["text", "title"],
                    "tie_breaker": 0.3,
                }
            },
            "size": 6,
        },
    )
    hits = [(h["_id"], h["_score"]) for h in resp["hits"]["hits"]]
    assert hits == rdr.search_dismax("merge stream", ["text", "title"], tie_breaker=0.3, k=6)


def test_dsl_multi_match_most_fields(rdr):
    resp = run_query(
        rdr,
        {
            "query": {
                "multi_match": {
                    "query": "merge stream",
                    "fields": ["text", "title"],
                    "type": "most_fields",
                }
            },
            "size": 6,
        },
    )
    hits = [(h["_id"], h["_score"]) for h in resp["hits"]["hits"]]
    assert hits == rdr.search_multi("merge stream", ["text", "title"], k=6)


def test_dsl_multi_match_bad_type(rdr):
    # "phrase"/"phrase_prefix"/"bool_prefix" are supported now;
    # cross_fields (term-centric blending) remains out of width — loud
    with pytest.raises(ValueError, match="multi_match type"):
        run_query(
            rdr,
            {
                "query": {
                    "multi_match": {
                        "query": "merge",
                        "fields": ["text"],
                        "type": "cross_fields",
                    }
                }
            },
        )


def test_dsl_match_boost_scales_scores(rdr):
    base = rdr.search("merge stream", k=6)
    resp = run_query(
        rdr,
        {"query": {"match": {"text": {"query": "merge stream", "boost": 2.5}}}, "size": 6},
    )
    hits = [(h["_id"], h["_score"]) for h in resp["hits"]["hits"]]
    assert [d for d, _ in hits] == [d for d, _ in base]
    for (_, s), (_, b) in zip(hits, base):
        assert s == pytest.approx(2.5 * b, rel=1e-12)


def test_dsl_boost_in_bool_rejected(rdr):
    """bool clauses share one BM25 pass, so per-clause boost inside bool
    is rejected loudly rather than silently dropped."""
    with pytest.raises(ValueError, match="boost inside bool"):
        run_query(
            rdr,
            {
                "query": {
                    "bool": {
                        "should": [
                            {"match": {"text": {"query": "merge", "boost": 3.0}}},
                            {"match": {"text": "stream"}},
                        ]
                    }
                },
                "size": 6,
            },
        )


def test_dsl_dis_max_generic_compound(rdr):
    """Explicit dis_max over arbitrary scoring clauses equals a hand
    combine of the sub-clause scores (max + tie_breaker * rest)."""
    tb = 0.3
    resp = run_query(
        rdr,
        {
            "size": 6,
            "query": {
                "dis_max": {
                    "tie_breaker": tb,
                    "queries": [
                        {"match": {"text": "merge stream"}},
                        {"match": {"title": {"query": "join stream", "boost": 2.0}}},
                    ],
                }
            },
        },
    )
    a = dict(rdr.search_pruned("merge stream", k=len(DOCS)))
    b = {
        d: 2.0 * s
        for d, s in rdr.search_pruned("join stream", k=len(DOCS), field="title")
    }
    want = {}
    for d in set(a) | set(b):
        ss = [s for s in (a.get(d), b.get(d)) if s is not None]
        want[d] = max(ss) + tb * (sum(ss) - max(ss))
    got = {h["_id"]: h["_score"] for h in resp["hits"]["hits"]}
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], rel=1e-9)
    scores = [h["_score"] for h in resp["hits"]["hits"]]
    assert scores == sorted(scores, reverse=True)


def test_dsl_boosting_demotes_negative_matches(rdr):
    """boosting: positive scores kept, docs matching the negative
    clause scaled by negative_boost (demoted, not excluded)."""
    nb = 0.25
    resp = run_query(
        rdr,
        {
            "size": 6,
            "query": {
                "boosting": {
                    "positive": {"match": {"text": "merge stream"}},
                    "negative": {"match": {"text": "sort"}},
                    "negative_boost": nb,
                }
            },
        },
    )
    pos = dict(rdr.search_pruned("merge stream", k=len(DOCS)))
    neg = {1, 3}  # docs whose text contains "sort"
    got = {h["_id"]: h["_score"] for h in resp["hits"]["hits"]}
    assert set(got) == set(pos)
    for d, s in pos.items():
        want = s * nb if d in neg else s
        assert got[d] == pytest.approx(want, rel=1e-9)
    # the demoted doc actually moved down past an undemoted one
    assert 1 in pos and got[1] < pos[1]


def test_simple_query_string_multifield(rdr):
    """Multi-field simple_query_string = most_fields sum over bare
    terms; phrases / and-mode across fields raise."""
    resp = run_query(
        rdr,
        {"size": 10, "query": {"simple_query_string": {
            "query": "merge stream", "fields": ["text", "title"]}}},
    )
    got = {h["_id"]: h["_score"] for h in resp["hits"]["hits"]}
    want = dict(rdr.search_multi("merge stream", ["text", "title"], k=len(DOCS)))
    assert got == want and got
    with pytest.raises(ValueError):
        run_query(rdr, {"query": {"simple_query_string": {
            "query": "merge stream", "fields": ["text", "title"],
            "default_operator": "and"}}})
    with pytest.raises(ValueError):
        run_query(rdr, {"query": {"simple_query_string": {
            "query": '"merge stream"', "fields": ["text", "title"]}}})
