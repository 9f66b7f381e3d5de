"""function_score (field_value_factor), percentiles agg, regexp query,
match operator=and / minimum_should_match via the DSL, and the term
suggester — each against brute force computed in-test."""

import re

import numpy as np
import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.query.dsl import run_query
from raybm25.query.engine import IndexReader

TOK = re.compile(r"[a-z0-9]+")

DOCS = [
    "merge sort is a stable sort",
    "quick sort beats merge sort on cache",
    "hash join and merge join",
    "sort networks sort fast",
    "streams merge windows",
    "unrelated filler words here",
    "merge merge merge",
    "short one",
]
NCHARS = [len(d) for d in DOCS]


@pytest.fixture(scope="module")
def rdr(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fscore")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(DOCS))),
                "text": DOCS,
                "n_chars": NCHARS,
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
        stored_cols=["text", "n_chars"],
        num_buckets=2,
    )
    return IndexReader(idx)


def test_function_score_multiply_log1p(rdr):
    base = dict(rdr.search("merge sort", k=100))
    got = rdr.search_function_score(
        "merge sort", "n_chars", factor=0.1, modifier="log1p", k=100
    )
    assert set(d for d, _ in got) == set(base)
    for d, s in got:
        want = base[d] * np.log(1.0 + 0.1 * NCHARS[d])
        assert s == pytest.approx(want, abs=1e-12)
    scores = [s for _, s in got]
    assert scores == sorted(scores, reverse=True)


def test_function_score_sum_and_none(rdr):
    base = dict(rdr.search("merge", k=100))
    got = dict(
        rdr.search_function_score(
            "merge", "n_chars", factor=2.0, modifier="none", boost_mode="sum", k=100
        )
    )
    for d, s in got.items():
        assert s == pytest.approx(base[d] + 2.0 * NCHARS[d], abs=1e-12)


def test_function_score_reranks(rdr):
    # with a linear length factor the ranking follows bm25*n_chars,
    # which differs from plain-BM25 order on this corpus
    base = dict(rdr.search("merge", k=100))
    boosted = rdr.search_function_score(
        "merge", "n_chars", factor=1.0, modifier="none", k=100
    )
    want = sorted(base, key=lambda d: (-(base[d] * NCHARS[d]), d))
    assert [d for d, _ in boosted] == want
    plain_order = sorted(base, key=lambda d: (-base[d], d))
    assert want != plain_order


def test_function_score_dsl(rdr):
    resp = run_query(
        rdr,
        {
            "query": {
                "function_score": {
                    "query": {"match": {"text": "merge sort"}},
                    "field_value_factor": {
                        "field": "n_chars",
                        "factor": 0.1,
                        "modifier": "log1p",
                    },
                }
            },
            "size": 5,
        },
    )
    native = rdr.search_function_score(
        "merge sort", "n_chars", factor=0.1, modifier="log1p", k=5
    )
    assert [(h["_id"], h["_score"]) for h in resp["hits"]["hits"]] == [
        (int(d), s) for d, s in native
    ]


def test_percentiles_agg_matches_numpy(rdr):
    got = rdr.percentiles_agg("merge", "n_chars", (5, 50, 95))
    match = [i for i, d in enumerate(DOCS) if "merge" in TOK.findall(d.lower())]
    vals = np.array([NCHARS[i] for i in match], dtype=np.float64)
    for p, v in got.items():
        assert v == pytest.approx(np.percentile(vals, p), abs=1e-12)


def test_percentiles_agg_empty(rdr):
    got = rdr.percentiles_agg("zzzmissing", "n_chars", (50,))
    assert got == {50.0: None}


def test_percentiles_dsl(rdr):
    resp = run_query(
        rdr,
        {
            "query": {"match": {"text": "merge"}},
            "aggs": {
                "len_pcts": {
                    "percentiles": {"field": "n_chars", "percents": [50]}
                }
            },
        },
    )
    native = rdr.percentiles_agg("merge", "n_chars", (50,))
    assert resp["aggregations"]["len_pcts"]["values"]["50.0"] == native[50.0]


def test_regexp_docs_brute(rdr):
    pat = re.compile(r"s[a-z]*t")
    want = sorted(
        i
        for i, d in enumerate(DOCS)
        if any(pat.fullmatch(t) for t in TOK.findall(d.lower()))
    )
    assert rdr.regexp_docs("s[a-z]*t").tolist() == want
    # DSL route
    resp = run_query(
        rdr, {"query": {"regexp": {"text": {"value": "s[a-z]*t"}}}, "size": 100}
    )
    assert [h["_id"] for h in resp["hits"]["hits"]] == want


def test_regexp_no_match(rdr):
    assert rdr.regexp_docs("zz+").size == 0


def test_match_operator_and_dsl(rdr):
    resp = run_query(
        rdr,
        {
            "query": {
                "match": {"text": {"query": "merge sort", "operator": "and"}}
            },
            "size": 100,
        },
    )
    got = [h["_id"] for h in resp["hits"]["hits"]]
    want = {
        i
        for i, d in enumerate(DOCS)
        if {"merge", "sort"} <= set(TOK.findall(d.lower()))
    }
    assert set(got) == want
    # scores equal the bool-must evaluator's
    native = rdr.search_bool(must="merge sort", k=100)
    assert [(h["_id"], h["_score"]) for h in resp["hits"]["hits"]] == [
        (int(d), s) for d, s in native
    ]


def test_match_msm_dsl(rdr):
    resp = run_query(
        rdr,
        {
            "query": {
                "match": {
                    "text": {"query": "merge sort join", "minimum_should_match": 2}
                }
            },
            "size": 100,
        },
    )
    got = {h["_id"] for h in resp["hits"]["hits"]}
    want = {
        i
        for i, d in enumerate(DOCS)
        if len({"merge", "sort", "join"} & set(TOK.findall(d.lower()))) >= 2
    }
    assert got == want


def test_suggest_ranked_by_df(rdr):
    out = rdr.suggest_terms("sort", size=5, max_edits=1, prefix_length=0)
    assert out[0]["text"] == "sort"
    opts = out[0]["options"]
    # brute force: vocab terms at distance <=1, ranked by df desc
    vocab = {}
    for i, d in enumerate(DOCS):
        for t in set(TOK.findall(d.lower())):
            vocab[t] = vocab.get(t, 0) + 1

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i] + [0] * len(b)
            for j, cb in enumerate(b, 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            prev = cur
        return prev[-1]

    want = sorted(
        ((t, f) for t, f in vocab.items() if t != "sort" and lev(t, "sort") <= 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[:5]
    assert [(o["text"], o["freq"]) for o in opts] == want


def test_suggest_dsl_and_exclusion(rdr):
    resp = run_query(
        rdr,
        {
            "suggest": {
                "fix": {
                    "text": "mergge",
                    "term": {"field": "text", "max_edits": 1},
                }
            }
        },
    )
    opts = resp["suggest"]["fix"][0]["options"]
    assert opts and opts[0]["text"] == "merge"
    assert all(o["text"] != "mergge" for o in opts)
