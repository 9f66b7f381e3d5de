"""adjacency_matrix and date_range aggregations vs brute force.
Reference behavior: OpenSearch aggs.adjacency_matrix / aggs.date_range."""

import numpy as np
import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.query.dsl import run_query
from raybm25.query.engine import IndexReader

DOCS = [
    # (text, lang, size, ts_ms)
    ("alpha beta", "en", 100, 1000),
    ("alpha gamma", "en", 500, 2000),
    ("alpha delta", "de", 100, 3000),
    ("beta gamma", "de", 500, 4000),
    ("alpha alpha", "fr", 250, 5000),
]


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("adjdr")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(DOCS))),
                "text": [d[0] for d in DOCS],
                "lang": [d[1] for d in DOCS],
                "size": [d[2] for d in DOCS],
                "ts": pa.array(
                    [d[3] * 1000 for d in DOCS], type=pa.timestamp("us")
                ),
            }
        ),
        str(tmp / "d.parquet"),
    )
    out = str(tmp / "idx")
    build_index(str(tmp / "d.parquet"), out, key_col="doc_id",
                id_col="doc_id", ts_col=None, keyword_cols=("lang",),
                stored_cols=["text", "lang", "size", "ts"], num_buckets=2)
    return out


def test_adjacency_matrix(idx):
    resp = run_query(idx, {
        "query": {"match": {"text": {"query": "alpha"}}},
        "size": 0,
        "aggs": {"adj": {"adjacency_matrix": {"filters": {
            "en": {"term": {"lang": "en"}},
            "small": {"range": {"size": {"lt": 300}}},
            "never": {"term": {"lang": "zz"}},
        }}}},
    })
    got = {b["key"]: b["doc_count"]
           for b in resp["aggregations"]["adj"]["buckets"]}
    # alpha docs: 0,1,2,4; en among them: 0,1; small(<300): 0,2,4
    assert got == {"en": 2, "small": 3, "en&small": 1}
    # zero-count filters and pairs are omitted
    assert "never" not in got and "en&never" not in got


def test_date_range(idx):
    resp = run_query(idx, {
        "query": {"match": {"text": {"query": "alpha beta gamma delta"}}},
        "size": 0,
        "aggs": {"w": {"date_range": {"field": "ts", "ranges": [
            {"to": 3000},
            {"from": 3000, "to": 4500},
            {"from": 4500},
        ]}}},
    })
    rows = [(b["from"], b["to"], b["doc_count"])
            for b in resp["aggregations"]["w"]["buckets"]]
    # all 5 docs match; ts ms: 1000,2000,3000,4000,5000
    assert rows == [(None, 3000, 2), (3000, 4500, 2), (4500, None, 1)]


def test_date_range_engine_open_bounds(idx):
    r = IndexReader(idx)
    rows = r.facet_date_ranges("alpha", "ts", [(None, None)])
    assert rows == [(None, None, 4)]  # every alpha doc
