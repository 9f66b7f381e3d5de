"""rank_feature (saturation / log / sigmoid) and distance_feature
against brute force over a stored numeric doc-value."""

import math

import numpy as np
import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.query.dsl import run_query
from raybm25.query.engine import IndexReader

VALS = [10, 250, 180, 1000, 40, 310, 250]


@pytest.fixture(scope="module")
def rdr(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("featq")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(VALS))),
                "text": [f"doc {i}" for i in range(len(VALS))],
                "weight": VALS,
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
        stored_cols=["text", "weight"],
        num_buckets=2,
    )
    return IndexReader(idx)


def _rank(scores, k=10):
    return sorted(scores, key=lambda t: (-t[1], t[0]))[:k]


def test_saturation(rdr):
    hits = rdr.rank_feature("weight", pivot=100.0, k=10)
    exp = _rank([(i, v / (v + 100.0)) for i, v in enumerate(VALS)])
    assert hits == [(d, pytest.approx(s)) for d, s in exp]


def test_log_and_sigmoid(rdr):
    hits = rdr.rank_feature("weight", function="log", scaling_factor=2.0, k=10)
    exp = _rank([(i, math.log(2.0 + v)) for i, v in enumerate(VALS)])
    assert [d for d, _ in hits] == [d for d, _ in exp]
    hits = rdr.rank_feature(
        "weight", function="sigmoid", pivot=100.0, exponent=0.6, k=10
    )
    exp = _rank(
        [(i, v**0.6 / (v**0.6 + 100.0**0.6)) for i, v in enumerate(VALS)]
    )
    assert [d for d, _ in hits] == [d for d, _ in exp]


def test_saturation_requires_pivot(rdr):
    with pytest.raises(ValueError, match="pivot"):
        rdr.rank_feature("weight")


def test_distance_feature(rdr):
    hits = rdr.distance_feature("weight", origin=250.0, pivot=50.0, k=10)
    exp = _rank([(i, 50.0 / (50.0 + abs(v - 250.0))) for i, v in enumerate(VALS)])
    assert hits == [(d, pytest.approx(s)) for d, s in exp]
    # both docs at the origin score exactly 1.0, tie broken doc_id asc
    assert hits[0] == (1, 1.0) and hits[1] == (6, 1.0)


def test_dsl_bodies(rdr):
    resp = run_query(
        rdr,
        {
            "size": 3,
            "query": {
                "rank_feature": {
                    "field": "weight",
                    "saturation": {"pivot": 100.0},
                    "boost": 2.0,
                }
            },
        },
    )
    exp = _rank([(i, 2.0 * (v / (v + 100.0))) for i, v in enumerate(VALS)], 3)
    assert [(h["_id"], h["_score"]) for h in resp["hits"]["hits"]] == [
        (d, pytest.approx(s)) for d, s in exp
    ]
    resp = run_query(
        rdr,
        {
            "size": 3,
            "query": {
                "distance_feature": {"field": "weight", "origin": 0.0, "pivot": 10.0}
            },
        },
    )
    exp = _rank([(i, 10.0 / (10.0 + v)) for i, v in enumerate(VALS)], 3)
    assert [h["_id"] for h in resp["hits"]["hits"]] == [d for d, _ in exp]


def test_in_dis_max_composition(rdr):
    # feature queries compose through the generic dis_max evaluator
    resp = run_query(
        rdr,
        {
            "size": 7,
            "query": {
                "dis_max": {
                    "queries": [
                        {"rank_feature": {"field": "weight", "saturation": {"pivot": 100.0}}},
                        {"distance_feature": {"field": "weight", "origin": 250.0, "pivot": 50.0}},
                    ]
                }
            },
        },
    )
    comb = [
        (i, max(v / (v + 100.0), 50.0 / (50.0 + abs(v - 250.0))))
        for i, v in enumerate(VALS)
    ]
    assert [h["_id"] for h in resp["hits"]["hits"]] == [d for d, _ in _rank(comb, 7)]
