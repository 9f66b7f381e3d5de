"""Extended-stats / rare_terms / missing aggs and pipeline
aggregations (cumulative_sum, derivative, bucket_sort, max_bucket
family) against brute force computed in-test. Reference behavior:
OpenSearch pipeline aggregations + aggs.{extended_stats,rare_terms,
missing}."""

import math
import re

import numpy as np
import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.query.dsl import run_query
from raybm25.query.engine import IndexReader

TOK = re.compile(r"[a-z0-9]+")

# (text, lang, size or None)
DOCS = [
    ("alpha beta", "en", 10),
    ("beta gamma", "de", 250),
    ("alpha gamma delta", "en", 250),
    ("delta only", "fr", 400),
    ("alpha alpha", "en", 999),
    ("nothing here", "de", None),
    ("alpha omega", "pt", 77),
]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pipeaggs")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(DOCS))),
                "text": [t for t, _, _ in DOCS],
                "lang": [l for _, l, _ in DOCS],
                "size": pa.array(
                    [s for _, _, s in DOCS], type=pa.float64()
                ),
            }
        ),
        str(tmp / "d.parquet"),
    )
    idx = str(tmp / "idx")
    build_index(
        str(tmp / "d.parquet"), idx, key_col="doc_id", id_col="doc_id",
        ts_col=None, keyword_cols=("lang",),
        stored_cols=["text", "lang", "size"], num_buckets=2,
    )
    return idx, IndexReader(idx)


def _match(query):
    terms = set(TOK.findall(query.lower()))
    return [i for i, (t, _, _) in enumerate(DOCS)
            if set(TOK.findall(t.lower())) & terms]


def test_extended_stats(built):
    _, rdr = built
    st = rdr.extended_stats_agg("alpha gamma", "size")
    vals = np.array(
        [DOCS[i][2] for i in _match("alpha gamma")], dtype=np.float64
    )
    assert st["count"] == vals.size
    assert st["sum_of_squares"] == pytest.approx(float((vals * vals).sum()))
    want_var = float((vals * vals).sum()) / vals.size - vals.mean() ** 2
    assert st["variance"] == pytest.approx(want_var)
    assert st["std_deviation"] == pytest.approx(math.sqrt(want_var))


def test_rare_terms(built):
    _, rdr = built
    # 'alpha' matches en x3, pt x1 -> rare at max_doc_count=1: pt only
    assert rdr.rare_terms_agg("alpha", "lang", max_doc_count=1) == [("pt", 1)]
    # max_doc_count=3 admits en too, count-asc then key-asc
    assert rdr.rare_terms_agg("alpha", "lang", max_doc_count=3) == [
        ("pt", 1), ("en", 3),
    ]


def test_missing_agg(built):
    _, rdr = built
    # 'nothing here' has a null size and matches 'nothing'
    assert rdr.missing_agg("nothing", "size") == 1
    assert rdr.missing_agg("alpha", "size") == 0


def test_missing_agg_dsl(built):
    idx, _ = built
    resp = run_query(idx, {
        "query": {"match": {"text": {"query": "nothing gamma"}}},
        "size": 0,
        "aggs": {"m": {"missing": {"field": "size"}}},
    })
    assert resp["aggregations"]["m"] == {"doc_count": 1}


def test_parent_pipeline_cumsum_derivative(built):
    idx, _ = built
    resp = run_query(idx, {
        "query": {"match": {"text": {"query": "alpha beta gamma delta"}}},
        "size": 0,
        "aggs": {"h": {
            "histogram": {"field": "size", "interval": 100},
            "aggs": {
                "cum": {"cumulative_sum": {"buckets_path": "_count"}},
                "d": {"derivative": {"buckets_path": "_count"}},
            },
        }},
    })
    buckets = resp["aggregations"]["h"]["buckets"]
    counts = [b["doc_count"] for b in buckets]
    cums = [b["cum"]["value"] for b in buckets]
    assert cums == [float(c) for c in np.cumsum(counts)]
    assert "d" not in buckets[0]
    assert [b["d"]["value"] for b in buckets[1:]] == [
        float(b - a) for a, b in zip(counts, counts[1:])
    ]


def test_bucket_sort_and_siblings(built):
    idx, _ = built
    resp = run_query(idx, {
        "query": {"match": {"text": {"query": "alpha beta gamma delta"}}},
        "size": 0,
        "aggs": {
            "h": {
                "histogram": {"field": "size", "interval": 100},
                "aggs": {"top": {"bucket_sort": {
                    "sort": [{"_count": {"order": "desc"}}], "size": 2,
                }}},
            },
            "mx": {"max_bucket": {"buckets_path": "h>_count"}},
            "avg": {"avg_bucket": {"buckets_path": "h>_count"}},
            "tot": {"sum_bucket": {"buckets_path": "h>_count"}},
        },
    })
    aggs = resp["aggregations"]
    # matched sizes: 10, 250, 250, 400, 999, 77 -> buckets
    # 0:[10,77] 200:[250,250] 400:[400] 900:[999]
    top = [(b["key"], b["doc_count"]) for b in aggs["h"]["buckets"]]
    assert top == [(0.0, 2), (200.0, 2)]  # stable: key-asc among ties
    # siblings reduce over the FULL histogram (declared before the sort
    # trimmed it? no - siblings run after, over the trimmed parent):
    assert aggs["mx"]["value"] == 2.0 and set(aggs["mx"]["keys"]) == {
        "0.0", "200.0",
    }
    assert aggs["tot"]["value"] == 4.0
    assert aggs["avg"]["value"] == 2.0


def test_unknown_pipeline_raises(built):
    idx, _ = built
    with pytest.raises(ValueError, match="unsupported parent pipeline"):
        run_query(idx, {
            "query": {"match": {"text": {"query": "alpha"}}},
            "size": 0,
            "aggs": {"h": {
                "histogram": {"field": "size", "interval": 100},
                "aggs": {"bad": {"moving_avg": {"buckets_path": "_count"}}},
            }},
        })


def test_global_agg(built):
    idx, rdr = built
    resp = run_query(idx, {
        "query": {"match": {"text": {"query": "nothing"}}},
        "size": 0,
        "aggs": {"all": {"global": {}, "aggs": {
            "st": {"stats": {"field": "size"}}}}},
    })
    g = resp["aggregations"]["all"]
    # the global bucket covers every live doc, not the 1-doc match set
    assert g["doc_count"] == len(DOCS)
    assert g["st"]["count"] == len(DOCS)
