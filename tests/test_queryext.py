"""wrapper / pinned / terms_set / span_or queries and the multi_terms
aggregation, checked against brute force over a small fixed corpus."""

import base64
import json

import numpy as np
import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.query.dsl import _match_docs, run_query
from raybm25.query.engine import IndexReader

DOCS = [
    (0, "quick brown fox", "en", "web"),
    (1, "merge sort beats quick sort", "en", "web"),
    (2, "merge join and hash join", "en", "book"),
    (3, "the lazy dog sleeps", "de", "web"),
    (4, "quick merge join sort", "de", "book"),
    (5, "nothing relevant here", "en", "web"),
    (6, "merge merge merge", "en", "book"),
]


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("qext")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": [d for d, _, _, _ in DOCS],
                "text": [t for _, t, _, _ in DOCS],
                "lang": [la for _, _, la, _ in DOCS],
                "source": [s for _, _, _, s in DOCS],
            }
        ),
        str(tmp / "d.parquet"),
    )
    out = str(tmp / "idx")
    build_index(
        str(tmp / "d.parquet"),
        out,
        key_col="doc_id",
        id_col="doc_id",
        ts_col=None,
        text_cols=("text",),
        keyword_cols=("lang", "source"),
        stored_cols=["text", "lang", "source"],
        num_buckets=2,
        positions=True,
    )
    return out


def _b64(q):
    return base64.b64encode(json.dumps(q).encode()).decode()


def test_wrapper_matches_inner(idx):
    inner = {"match": {"text": {"query": "merge join"}}}
    a = run_query(idx, {"query": inner, "size": 10})["hits"]["hits"]
    b = run_query(
        idx, {"query": {"wrapper": {"query": _b64(inner)}}, "size": 10}
    )["hits"]["hits"]
    assert [(h["_id"], h["_score"]) for h in a] == [
        (h["_id"], h["_score"]) for h in b
    ]
    assert len(a) > 0


def test_wrapper_rejects_garbage(idx):
    with pytest.raises(ValueError, match="base64 JSON"):
        run_query(idx, {"query": {"wrapper": {"query": "!!!"}}, "size": 1})


def test_pinned_order_and_dedup(idx):
    organic = {"match": {"text": {"query": "merge"}}}
    org = [h["_id"] for h in run_query(idx, {"query": organic, "size": 10})["hits"]["hits"]]
    # pin one organic hit and one non-matching doc; a nonexistent id is dropped
    body = {
        "query": {"pinned": {"ids": [3, org[0], 999999], "organic": organic}},
        "size": 10,
    }
    hits = run_query(idx, body)["hits"]["hits"]
    got = [h["_id"] for h in hits]
    assert got[:2] == [3, org[0]]
    assert got[2:] == [d for d in org if d != org[0]]
    # pinned scores strictly decreasing and far above BM25
    assert hits[0]["_score"] > hits[1]["_score"] > 1e30 > hits[2]["_score"]
    assert 999999 not in got


def test_terms_set_thresholds(idx):
    r = IndexReader(idx)
    spec = lambda **kw: {"text": {"terms": ["merge", "join", "sort"], **kw}}
    brute = {
        d: len({"merge", "join", "sort"} & set(t.split()))
        for d, t, _, _ in DOCS
    }
    for m in (1, 2, 3):
        ids = _match_docs(r, "terms_set", spec(minimum_should_match=m))
        assert sorted(ids.tolist()) == sorted(
            d for d, c in brute.items() if c >= m
        ), m
    # script threshold: num_terms - 1 == 2
    ids = _match_docs(
        r,
        "terms_set",
        spec(minimum_should_match_script={"source": "params.num_terms - 1"}),
    )
    assert sorted(ids.tolist()) == sorted(d for d, c in brute.items() if c >= 2)
    # default = all terms
    ids = _match_docs(r, "terms_set", spec())
    assert sorted(ids.tolist()) == sorted(d for d, c in brute.items() if c >= 3)
    # threshold above the term count matches nothing
    assert _match_docs(r, "terms_set", spec(minimum_should_match=4)).size == 0


def test_terms_set_scored_like_bool_should(idx):
    body = {
        "query": {
            "terms_set": {
                "text": {"terms": ["merge", "join"], "minimum_should_match": 1}
            }
        },
        "size": 10,
    }
    a = run_query(idx, body)["hits"]["hits"]
    b = run_query(
        idx,
        {
            "query": {
                "bool": {
                    "should": [
                        {"match": {"text": {"query": "merge"}}},
                        {"match": {"text": {"query": "join"}}},
                    ],
                    "minimum_should_match": 1,
                }
            },
            "size": 10,
        },
    )["hits"]["hits"]
    assert [(h["_id"], h["_score"]) for h in a] == [
        (h["_id"], h["_score"]) for h in b
    ]


def test_span_or_union(idx):
    r = IndexReader(idx)
    ids = _match_docs(
        r,
        "span_or",
        {
            "clauses": [
                {"span_term": {"text": "lazy"}},
                {
                    "span_near": {
                        "clauses": [
                            {"span_term": {"text": "merge"}},
                            {"span_term": {"text": "sort"}},
                        ],
                        "slop": 0,
                        "in_order": True,
                    }
                },
            ]
        },
    )
    # doc 3 has 'lazy'; docs 1 ("merge sort") has the adjacent pair;
    # doc 4 has "merge join sort" (not adjacent)
    assert sorted(ids.tolist()) == [1, 3]


def test_multi_terms_vs_brute(idx):
    resp = run_query(
        idx,
        {
            "query": {"match": {"text": {"query": "merge join"}}},
            "size": 0,
            "aggs": {
                "ls": {
                    "multi_terms": {
                        "terms": [{"field": "lang"}, {"field": "source"}],
                        "size": 10,
                    }
                }
            },
        },
    )
    match = [d for d, t, _, _ in DOCS if {"merge", "join"} & set(t.split())]
    from collections import Counter

    want = Counter(
        (la, s) for d, _, la, s in DOCS if d in match
    )
    got = {
        tuple(b["key"]): b["doc_count"]
        for b in resp["aggregations"]["ls"]["buckets"]
    }
    assert got == dict(want)
    # ordering: count desc then key asc
    counts = [b["doc_count"] for b in resp["aggregations"]["ls"]["buckets"]]
    assert counts == sorted(counts, reverse=True)


def test_hybrid_rrf_fuses_rankings(idx):
    q1 = {"match": {"text": {"query": "merge"}}}
    q2 = {"match": {"text": {"query": "quick"}}}
    h1 = run_query(idx, {"query": q1, "size": 100})["hits"]["hits"]
    h2 = run_query(idx, {"query": q2, "size": 100})["hits"]["hits"]
    fused = {}
    for hits in (h1, h2):
        for rank, h in enumerate(hits, 1):
            fused[h["_id"]] = fused.get(h["_id"], 0.0) + 1.0 / (60 + rank)
    want = sorted(fused.items(), key=lambda t: (-t[1], t[0]))[:5]
    got = run_query(
        idx,
        {
            "query": {
                "hybrid": {
                    "queries": [q1, q2],
                    "rank_constant": 60,
                    "window_size": 100,
                }
            },
            "size": 5,
        },
    )["hits"]["hits"]
    assert [(h["_id"], h["_score"]) for h in got] == want
    # a doc matching both sub-queries outranks equal-rank single hits
    both = {h["_id"] for h in h1} & {h["_id"] for h in h2}
    if both:
        assert got[0]["_id"] in both


def test_hybrid_minmax_normalization(idx):
    """Score-based fusion: min-max within each sub-window, weighted
    arithmetic mean across sub-queries (absent = 0)."""
    q1 = {"match": {"text": {"query": "merge"}}}
    q2 = {"match": {"text": {"query": "quick"}}}
    h1 = run_query(idx, {"query": q1, "size": 100})["hits"]["hits"]
    h2 = run_query(idx, {"query": q2, "size": 100})["hits"]["hits"]
    w = [0.25, 0.75]
    fused = {}
    for hits, wi in zip((h1, h2), w):
        scores = [h["_score"] for h in hits]
        lo, hi = min(scores), max(scores)
        for h in hits:
            n = 1.0 if hi == lo else (h["_score"] - lo) / (hi - lo)
            fused[h["_id"]] = fused.get(h["_id"], 0.0) + wi * n
    want = sorted(
        ((d, s / 1.0) for d, s in fused.items()), key=lambda t: (-t[1], t[0])
    )[:5]
    got = run_query(
        idx,
        {
            "query": {
                "hybrid": {
                    "queries": [q1, q2],
                    "normalization": "min_max",
                    "weights": w,
                    "window_size": 100,
                }
            },
            "size": 5,
        },
    )["hits"]["hits"]
    assert [(h["_id"], h["_score"]) for h in got] == want
    # each sub-query's own top hit carries normalized score 1.0, so a
    # lexical-only weighting returns exactly the lexical ranking head
    only1 = run_query(
        idx,
        {
            "query": {
                "hybrid": {
                    "queries": [q1, q2],
                    "normalization": "min_max",
                    "weights": [1.0, 0.0],
                    "window_size": 100,
                }
            },
            "size": 1,
        },
    )["hits"]["hits"]
    assert only1[0]["_id"] == h1[0]["_id"]
    assert only1[0]["_score"] == 1.0
    with pytest.raises(ValueError, match="weights"):
        run_query(
            idx,
            {"query": {"hybrid": {"queries": [q1, q2],
                                  "normalization": "min_max",
                                  "weights": [1.0]}}},
        )


def test_multi_terms_needs_two_fields(idx):
    r = IndexReader(idx)
    with pytest.raises(ValueError, match="two term sources"):
        r.facet_multi_terms("merge", ["lang"], size=5)


def test_keyword_subfield_alias(idx):
    from raybm25.query.engine import IndexReader

    r = IndexReader(idx)
    base = r.term_docs("lang", "en")
    alias = r.term_docs("lang.keyword", "en")
    assert np.array_equal(base, alias)
    a2 = run_query(
        idx,
        {
            "query": {"match": {"text": {"query": "merge"}}},
            "size": 0,
            "aggs": {"l": {"terms": {"field": "lang.keyword", "size": 10}}},
        },
    )["aggregations"]["l"]["buckets"]
    b2 = run_query(
        idx,
        {
            "query": {"match": {"text": {"query": "merge"}}},
            "size": 0,
            "aggs": {"l": {"terms": {"field": "lang", "size": 10}}},
        },
    )["aggregations"]["l"]["buckets"]
    assert a2 == b2


def test_cli_dsl_subcommand(idx, tmp_path, capsys):
    import json

    from raybm25.__main__ import main as cli_main

    body = {
        "query": {"match": {"text": {"query": "merge"}}},
        "size": 3,
    }
    p = tmp_path / "body.json"
    p.write_text(json.dumps(body))
    assert cli_main(["dsl", "--index", idx, "--body", str(p)]) == 0
    out = json.loads(capsys.readouterr().out)
    direct = run_query(idx, body)["hits"]["hits"]
    assert [h["_id"] for h in out["hits"]["hits"]] == [h["_id"] for h in direct]
