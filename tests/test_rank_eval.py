"""``_rank_eval`` endpoint: every metric checked against hand-computed
values over a corpus where the BM25 ranking is known."""

import math

import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.query.dsl import run_query
from raybm25.query.engine import IndexReader
from raybm25.query.rankeval import run_rank_eval

DOCS = [
    (0, "merge join fast", "en"),
    (1, "merge sort slow", "de"),
    (2, "join stream window", "en"),
    (3, "sort only tokens", "fr"),
    (4, "merge merge stream", "en"),
    (5, "window stream join merge", "de"),
]


@pytest.fixture(scope="module")
def rdr(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("rankeval")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": [i for i, _, _ in DOCS],
                "text": [t for _, t, _ in DOCS],
                "lang": [l for _, _, l in DOCS],
            }
        ),
        str(tmp / "d.parquet"),
    )
    idx = str(tmp / "idx")
    build_index(str(tmp / "d.parquet"), idx, key_col="doc_id",
                id_col="doc_id", ts_col=None, keyword_cols=("lang",),
                stored_cols=["text", "lang"], num_buckets=2)
    return IndexReader(idx)


def _ranked_ids(rdr, query, k):
    resp = run_query(rdr, {"query": {"match": {"text": query}}, "size": k})
    return [h["_id"] for h in resp["hits"]["hits"]]


def _body(metric, ratings, query="merge", rid="q1"):
    return {
        "requests": [
            {
                "id": rid,
                "request": {"query": {"match": {"text": query}}},
                "ratings": [
                    {"_id": d, "rating": r} for d, r in ratings.items()
                ],
            }
        ],
        "metric": metric,
    }


def test_precision_counts_unlabeled_as_irrelevant(rdr):
    ids = _ranked_ids(rdr, "merge", 4)
    ratings = {ids[0]: 2, ids[2]: 0}  # ids[1], ids[3] unlabeled
    out = run_rank_eval(
        rdr, _body({"precision": {"k": 4, "relevant_rating_threshold": 1}},
                   ratings)
    )
    # 1 relevant of 4 considered (unlabeled irrelevant)
    assert out["metric_score"] == 1 / 4
    det = out["details"]["q1"]
    assert [u["_id"] for u in det["unrated_docs"]] == [ids[1], ids[3]]
    assert det["metric_details"]["precision"]["docs_retrieved"] == 4


def test_precision_ignore_unlabeled(rdr):
    ids = _ranked_ids(rdr, "merge", 4)
    ratings = {ids[0]: 2, ids[2]: 0}
    out = run_rank_eval(
        rdr,
        _body({"precision": {"k": 4, "ignore_unlabeled": True}}, ratings),
    )
    assert out["metric_score"] == 1 / 2  # 1 relevant of 2 labeled


def test_recall(rdr):
    ids = _ranked_ids(rdr, "merge", 2)
    # three relevant docs in the ratings, one inside the top 2
    ratings = {ids[0]: 1, 3: 2, 2: 1, ids[1]: 0}
    out = run_rank_eval(rdr, _body({"recall": {"k": 2}}, ratings))
    assert out["metric_score"] == 1 / 3


def test_mrr(rdr):
    ids = _ranked_ids(rdr, "merge", 4)
    ratings = {ids[2]: 3}  # first relevant at rank 3
    out = run_rank_eval(
        rdr, _body({"mean_reciprocal_rank": {"k": 4}}, ratings)
    )
    assert out["metric_score"] == 1 / 3
    assert (
        out["details"]["q1"]["metric_details"]["mean_reciprocal_rank"][
            "first_relevant"
        ]
        == 3
    )


def test_mrr_no_relevant_is_zero(rdr):
    out = run_rank_eval(
        rdr, _body({"mean_reciprocal_rank": {"k": 4}}, {})
    )
    assert out["metric_score"] == 0.0


def test_dcg_and_ndcg(rdr):
    ids = _ranked_ids(rdr, "merge", 4)
    ratings = {ids[0]: 1, ids[1]: 3, ids[3]: 2}
    out = run_rank_eval(rdr, _body({"dcg": {"k": 4}}, ratings))
    expect = (
        (2**1 - 1) / math.log2(2)
        + (2**3 - 1) / math.log2(3)
        + (2**2 - 1) / math.log2(5)
    )
    assert out["metric_score"] == pytest.approx(expect, abs=0)
    # normalized: ideal ordering is 3,2,1 at ranks 1..3
    out_n = run_rank_eval(
        rdr, _body({"dcg": {"k": 4, "normalize": True}}, ratings)
    )
    ideal = (
        (2**3 - 1) / math.log2(2)
        + (2**2 - 1) / math.log2(3)
        + (2**1 - 1) / math.log2(4)
    )
    assert out_n["metric_score"] == pytest.approx(expect / ideal, abs=0)


def test_err_cascade(rdr):
    ids = _ranked_ids(rdr, "merge", 3)
    ratings = {ids[0]: 1, ids[1]: 2}
    out = run_rank_eval(
        rdr,
        _body(
            {"expected_reciprocal_rank": {"maximum_relevance": 2, "k": 3}},
            ratings,
        ),
    )
    r1 = (2**1 - 1) / 2**2
    r2 = (2**2 - 1) / 2**2
    expect = r1 / 1 + (1 - r1) * r2 / 2  # third hit unrated -> R=0
    assert out["metric_score"] == pytest.approx(expect, abs=0)


def test_mean_over_requests(rdr):
    ids_m = _ranked_ids(rdr, "merge", 2)
    ids_s = _ranked_ids(rdr, "stream", 2)
    body = {
        "requests": [
            {
                "id": "a",
                "request": {"query": {"match": {"text": "merge"}}},
                "ratings": [{"_id": ids_m[0], "rating": 1}],
            },
            {
                "id": "b",
                "request": {"query": {"match": {"text": "stream"}}},
                "ratings": [{"_id": ids_s[1], "rating": 1}],
            },
        ],
        "metric": {"precision": {"k": 2}},
    }
    out = run_rank_eval(rdr, body)
    assert out["details"]["a"]["metric_score"] == 1 / 2
    assert out["details"]["b"]["metric_score"] == 1 / 2
    assert out["metric_score"] == 1 / 2
    assert out["failures"] == {}


def test_bool_request_body_supported(rdr):
    """Requests are full DSL bodies — a bool query works unchanged."""
    body = {
        "requests": [
            {
                "id": "q",
                "request": {
                    "query": {
                        "bool": {
                            "must": [{"match": {"text": "merge"}}],
                            "filter": [{"term": {"lang": "en"}}],
                        }
                    }
                },
                "ratings": [{"_id": 0, "rating": 1}, {"_id": 4, "rating": 1}],
            }
        ],
        "metric": {"recall": {"k": 5}},
    }
    out = run_rank_eval(rdr, body)
    assert out["metric_score"] == 1.0


def test_rejects_bad_bodies(rdr):
    with pytest.raises(ValueError):
        run_rank_eval(rdr, {"requests": [], "metric": {"precision": {}}})
    with pytest.raises(ValueError):
        run_rank_eval(
            rdr,
            {"requests": [{"id": "x", "request": {}, "ratings": []}],
             "metric": {"nope": {}}},
        )
    with pytest.raises(ValueError):
        run_rank_eval(
            rdr,
            {"requests": [{"id": "x", "request": {}, "ratings": []}],
             "metric": {"precision": {"k": 0}}},
        )
