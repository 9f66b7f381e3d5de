"""Scroll (stateless continuation) over the DSL: page-concatenation
equals one big top-k, fast-path (search_after) and offset-path bodies,
exhaustion behavior, and token validation."""

import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.query.dsl import run_query, run_scroll
from raybm25.query.engine import IndexReader

DOCS = [f"common word{i % 7} filler{i % 3} text row {i}" for i in range(60)]


@pytest.fixture(scope="module")
def rdr(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("scroll")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(DOCS))),
                "text": DOCS,
                "lang": ["en" if i % 2 else "de" for i in range(len(DOCS))],
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
        keyword_cols=("lang",),
        num_buckets=2,
    )
    return IndexReader(idx)


def _drain(rdr, body):
    pages = []
    resp = run_scroll(rdr, body=body)
    while resp["hits"]["hits"]:
        pages.append([(h["_id"], h["_score"]) for h in resp["hits"]["hits"]])
        resp = run_scroll(rdr, scroll_id=resp["_scroll_id"])
    return pages


def test_match_fast_path_concat_equals_topk(rdr):
    body = {"query": {"match": {"text": {"query": "common word1"}}}, "size": 7}
    pages = _drain(rdr, body)
    flat = [p for page in pages for p in page]
    exp = run_query(rdr, {"query": body["query"], "size": len(DOCS)})
    exp_hits = [(h["_id"], h["_score"]) for h in exp["hits"]["hits"]]
    assert flat == exp_hits
    assert all(len(p) == 7 for p in pages[:-1])  # full pages until the tail


def test_offset_path_bool_body(rdr):
    body = {
        "query": {
            "bool": {
                "must": [{"match": {"text": {"query": "common"}}}],
                "filter": [{"term": {"lang": "en"}}],
            }
        },
        "size": 5,
    }
    pages = _drain(rdr, body)
    flat = [p for page in pages for p in page]
    exp = run_query(rdr, {**body, "size": len(DOCS)})
    assert flat == [(h["_id"], h["_score"]) for h in exp["hits"]["hits"]]


def test_exhausted_scroll_stays_empty(rdr):
    body = {"query": {"match": {"text": {"query": "common"}}}, "size": 50}
    resp = run_scroll(rdr, body=body)
    resp2 = run_scroll(rdr, scroll_id=resp["_scroll_id"])
    # 60 docs match "common": second page is the 10-row tail
    assert len(resp2["hits"]["hits"]) == 10
    resp3 = run_scroll(rdr, scroll_id=resp2["_scroll_id"])
    assert resp3["hits"]["hits"] == []
    resp4 = run_scroll(rdr, scroll_id=resp3["_scroll_id"])
    assert resp4["hits"]["hits"] == []


def test_requires_exactly_one_of_body_scroll_id(rdr):
    with pytest.raises(ValueError):
        run_scroll(rdr)
    with pytest.raises(ValueError):
        run_scroll(rdr, body={"query": {"match_all": {}}}, scroll_id="x")


def test_fast_path_not_used_for_optioned_match(rdr):
    # operator=and routes through run_query's bool evaluator; scroll
    # must fall back to offset continuation and still be correct
    body = {
        "query": {"match": {"text": {"query": "common word1", "operator": "and"}}},
        "size": 4,
    }
    pages = _drain(rdr, body)
    flat = [p for page in pages for p in page]
    exp = run_query(rdr, {**body, "size": len(DOCS)})
    assert flat == [(h["_id"], h["_score"]) for h in exp["hits"]["hits"]]
