"""Phrase + completion suggesters and _msearch, checked against brute
force. Reference behavior: OpenSearch suggest.phrase /
suggest.completion and the _msearch endpoint."""

import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.query.dsl import run_msearch, run_query
from raybm25.query.engine import IndexReader

DOCS = [
    "merge sort is stable",          # merge sort
    "merge sort beats bubble sort",  # merge sort
    "marge sort is a name",          # marge sort
    "merge soup recipes",            # merge soup
    "sort of fine",
    "merge first then sort",
]


@pytest.fixture(scope="module")
def rdr(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sugg")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"doc_id": list(range(len(DOCS))), "text": DOCS}),
        str(tmp / "d.parquet"),
    )
    idx = str(tmp / "idx")
    build_index(str(tmp / "d.parquet"), idx, key_col="doc_id",
                id_col="doc_id", ts_col=None, num_buckets=2, positions=True)
    return idx, IndexReader(idx)


def test_completion_ranked_by_df(rdr):
    _, r = rdr
    got = r.suggest_completion("s", size=10)
    # s-terms: sort (docs 0,1,2,4,5), stable (0), soup (3)
    assert got == [
        {"text": "sort", "freq": 5},
        {"text": "soup", "freq": 1},
        {"text": "stable", "freq": 1},
    ]


def test_completion_size_and_empty(rdr):
    _, r = rdr
    assert len(r.suggest_completion("s", size=1)) == 1
    assert r.suggest_completion("zzz") == []


def test_phrase_suggester_multi_candidate(rdr):
    _, r = rdr
    # 'mirge sort': mirge -> {merge, marge} (1 edit each); phrases
    # ranked by adjacent df:
    # merge sort (docs 0,1) > marge sort (doc 2)
    got = r.suggest_phrase("mirge sort", size=5, max_edits=1)
    assert got[0] == {"text": "merge sort", "freq": 2}
    assert {"text": "marge sort", "freq": 1} in got
    # the uncorrected input itself is excluded even if frequent
    got2 = r.suggest_phrase("merge sort", size=5, max_edits=1)
    assert all(o["text"] != "merge sort" for o in got2)


def test_phrase_suggester_zero_freq_dropped(rdr):
    _, r = rdr
    # 'soup sort' never occurs adjacently -> not offered
    got = r.suggest_phrase("soup sorz", size=5, max_edits=1)
    assert all(o["freq"] > 0 for o in got)


def test_suggest_dsl_route(rdr):
    idx, _ = rdr
    resp = run_query(idx, {
        "query": {"match_all": {}},
        "size": 0,
        "suggest": {
            "fix": {"text": "mergi sort", "phrase": {"size": 2}},
            "auto": {"prefix": "s", "completion": {"size": 2}},
        },
    })
    assert resp["suggest"]["fix"][0]["text"] == "merge sort"
    assert resp["suggest"]["auto"][0]["text"] == "sort"


def test_msearch_order_and_errors(rdr):
    idx, r = rdr
    out = run_msearch(idx, [
        {"query": {"match": {"text": "merge"}}, "size": 3},
        {"query": {"bogus_kind": {"text": "x"}}},
        {"query": {"match_phrase": {"text": "merge sort"}}, "size": 10},
    ])
    rs = out["responses"]
    assert len(rs) == 3
    assert [h["_id"] for h in rs[0]["hits"]["hits"]] == [
        d for d, _ in r.search("merge", k=3)
    ]
    assert rs[1]["status"] == 400 and "bogus_kind" in rs[1]["error"]["reason"]
    assert {h["_id"] for h in rs[2]["hits"]["hits"]} == {0, 1}
