"""_termvectors, field statistics, and _mget against brute force.
Reference behavior: OpenSearch GET _termvectors / _mget."""

import re
from collections import Counter

import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.query.dsl import run_mget, run_termvectors
from raybm25.query.engine import IndexReader

TOK = re.compile(r"[a-z0-9]+")

DOCS = [
    "alpha beta alpha",
    "beta gamma",
    "alpha gamma delta gamma",
]


@pytest.fixture(scope="module")
def rdr(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tv")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"doc_id": [10, 20, 30], "text": DOCS,
                  "lang": ["en", "de", "fr"]}),
        str(tmp / "d.parquet"),
    )
    idx = str(tmp / "idx")
    build_index(str(tmp / "d.parquet"), idx, key_col="doc_id",
                id_col="doc_id", ts_col=None, keyword_cols=("lang",),
                stored_cols=["text", "lang"], num_buckets=2)
    return IndexReader(idx)


def test_termvectors_tf_positions(rdr):
    tv = rdr.termvectors(10, term_statistics=True)
    terms = tv["term_vectors"]["text"]["terms"]
    assert terms["alpha"]["term_freq"] == 2
    assert [t["position"] for t in terms["alpha"]["tokens"]] == [0, 2]
    assert terms["beta"]["tokens"] == [{"position": 1}]
    # df over the 3-doc corpus
    assert terms["alpha"]["doc_freq"] == 2 and terms["alpha"]["ttf"] == 3
    assert terms["beta"]["doc_freq"] == 2 and terms["beta"]["ttf"] == 2


def test_termvectors_missing_doc(rdr):
    assert rdr.termvectors(999) == {"_id": 999, "found": False}


def test_field_statistics(rdr):
    st = rdr.field_statistics()
    toks = [TOK.findall(t.lower()) for t in DOCS]
    want_sdf = sum(len(set(t)) for t in toks)
    want_ttf = sum(len(t) for t in toks)
    assert st == {
        "sum_doc_freq": want_sdf, "doc_count": 3, "sum_ttf": want_ttf,
    }
    fs = rdr.termvectors(20)["term_vectors"]["text"]["field_statistics"]
    assert fs == st


def test_mget_order_and_missing(rdr):
    out = run_mget(rdr, {"ids": [30, 999, 10]})
    docs = out["docs"]
    assert [d["_id"] for d in docs] == [30, 999, 10]
    assert [d["found"] for d in docs] == [True, False, True]
    assert docs[0]["_source"]["lang"] == "fr"
    assert docs[2]["_source"]["text"] == DOCS[0]


def test_run_termvectors_flags(rdr):
    tv = run_termvectors(rdr, 20, {"positions": False,
                                   "field_statistics": False})
    terms = tv["term_vectors"]["text"]["terms"]
    assert "tokens" not in terms["beta"] and "doc_freq" not in terms["beta"]
    assert "field_statistics" not in tv["term_vectors"]["text"]


def test_msearch_per_body_index_routing(rdr, tmp_path_factory, ray_session):
    """msearch bodies can route to their own index via the header-form
    'index' key; unrouted bodies use the default index."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raybm25.index.build import build_index
    from raybm25.query.dsl import run_msearch

    tmp = tmp_path_factory.mktemp("msroute")
    pq.write_table(
        pa.table({"doc_id": [100], "text": ["zulu only here"]}),
        str(tmp / "o.parquet"),
    )
    other = str(tmp / "oidx")
    build_index(str(tmp / "o.parquet"), other, key_col="doc_id",
                id_col="doc_id", ts_col=None, text_cols=("text",),
                num_buckets=2)
    out = run_msearch(
        rdr,
        [
            {"size": 5, "query": {"match": {"text": "zulu"}}},
            {"index": other, "size": 5,
             "query": {"match": {"text": "zulu"}}},
            {"index": str(tmp / "missing"), "size": 1,
             "query": {"match_all": {}}},
        ],
    )["responses"]
    assert out[0]["hits"]["hits"] == []          # default index: no zulu
    assert [h["_id"] for h in out[1]["hits"]["hits"]] == [100]
    assert out[2]["status"] == 400               # bad route isolated
