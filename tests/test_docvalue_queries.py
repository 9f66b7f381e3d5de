"""Doc-value query family (range / terms / exists / ids /
constant_score) and their DSL + bool-filter integration. Reference
analog: OpenSearch's BKD-backed range/terms/exists/ids queries over
the mappings the loader creates (loader.py:239-312)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raybm25.index.build import build_index
from raybm25.query.dsl import run_query
from raybm25.query.engine import IndexReader

DOCS = [
    # (doc_id, text, lang, n_bytes) — lang None on one row for exists
    (0, "merge join fast", "en", 100),
    (1, "merge sort slow", "de", 250),
    (2, "join stream window", "en", 300),
    (3, "sort only tokens", None, 120),
    (4, "merge merge stream", "fr", 400),
    (5, "window stream join merge", "de", 50),
    (6, "unrelated words entirely", "en", 275),
]


@pytest.fixture(scope="module")
def rdr(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("docvalue")
    pq.write_table(
        pa.table(
            {
                "doc_id": [d[0] for d in DOCS],
                "text": [d[1] for d in DOCS],
                "lang": pa.array([d[2] for d in DOCS], type=pa.string()),
                "n_bytes": [d[3] for d in DOCS],
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
        stored_cols=["text", "lang", "n_bytes"],
        num_buckets=3,
    )
    return IndexReader(idx)


def _brute_range(gte=None, gt=None, lte=None, lt=None):
    out = []
    for d, _, _, v in DOCS:
        if gte is not None and not v >= gte:
            continue
        if gt is not None and not v > gt:
            continue
        if lte is not None and not v <= lte:
            continue
        if lt is not None and not v < lt:
            continue
        out.append(d)
    return sorted(out)


@pytest.mark.parametrize(
    "bounds",
    [
        {"gte": 100, "lt": 300},
        {"gt": 100, "lte": 300},
        {"gte": 250},
        {"lt": 120},
        {"gte": 100, "gt": 120, "lte": 400, "lt": 400},
        {"gte": 1000},
    ],
)
def test_range_docs_vs_brute(rdr, bounds):
    got = rdr.range_docs("n_bytes", **bounds).tolist()
    assert got == _brute_range(**bounds)


def test_range_docs_no_bounds_raises(rdr):
    with pytest.raises(ValueError, match="at least one"):
        rdr.range_docs("n_bytes")


def test_terms_docs_union(rdr):
    got = rdr.terms_docs("lang", ["de", "fr", "zz"]).tolist()
    want = sorted(d for d, _, l, _ in DOCS if l in ("de", "fr"))
    assert got == want
    # equals the union of single-term lookups
    a = set(rdr.term_docs("lang", "de").tolist())
    b = set(rdr.term_docs("lang", "fr").tolist())
    assert set(got) == a | b
    assert rdr.terms_docs("lang", ["zz"]).tolist() == []


def test_exists_docs_nulls(rdr):
    got = rdr.exists_docs("lang").tolist()
    assert got == sorted(d for d, _, l, _ in DOCS if l is not None)


def test_ids_docs_membership(rdr):
    assert rdr.ids_docs([5, 1, 999, 3]).tolist() == [1, 3, 5]
    assert rdr.ids_docs([]).tolist() == []


def test_dsl_range_terms_exists_ids(rdr):
    body = {"query": {"range": {"n_bytes": {"gte": 100, "lt": 300}}}, "size": 10}
    ids = [h["_id"] for h in run_query(rdr, body)["hits"]["hits"]]
    assert ids == _brute_range(gte=100, lt=300)

    body = {"query": {"terms": {"lang": ["de", "fr"]}}, "size": 10}
    ids = [h["_id"] for h in run_query(rdr, body)["hits"]["hits"]]
    assert ids == rdr.terms_docs("lang", ["de", "fr"]).tolist()

    body = {"query": {"exists": {"field": "lang"}}, "size": 10}
    ids = [h["_id"] for h in run_query(rdr, body)["hits"]["hits"]]
    assert ids == rdr.exists_docs("lang").tolist()

    body = {"query": {"ids": {"values": [2, 4, 77]}}, "size": 10}
    ids = [h["_id"] for h in run_query(rdr, body)["hits"]["hits"]]
    assert ids == [2, 4]


def test_dsl_constant_score(rdr):
    body = {
        "query": {
            "constant_score": {
                "filter": {"terms": {"lang": ["de"]}},
                "boost": 1.7,
            }
        },
        "size": 10,
    }
    hits = run_query(rdr, body)["hits"]["hits"]
    assert [h["_id"] for h in hits] == rdr.terms_docs("lang", ["de"]).tolist()
    assert all(h["_score"] == 1.7 for h in hits)


def test_bool_range_filter_vs_brute(rdr):
    """bool must+filter(range): scored hits == the unfiltered bool hits
    restricted to the range's doc set."""
    base = dict(rdr.search_bool(must="merge", should="join stream", k=10))
    keep = set(_brute_range(gte=100, lt=300))
    want = sorted(
        ((d, s) for d, s in base.items() if d in keep),
        key=lambda x: (-x[1], x[0]),
    )
    body = {
        "query": {
            "bool": {
                "must": [{"match": {"text": "merge"}}],
                "should": [{"match": {"text": "join stream"}}],
                "filter": [{"range": {"n_bytes": {"gte": 100, "lt": 300}}}],
            }
        },
        "size": 10,
    }
    got = [(h["_id"], h["_score"]) for h in run_query(rdr, body)["hits"]["hits"]]
    assert got == want


def test_bool_multiple_filters_anded(rdr):
    """Two filter clauses (term + range) restrict conjunctively; a
    second filter must not be silently dropped."""
    body = {
        "query": {
            "bool": {
                "must": [{"match": {"text": "merge"}}],
                "filter": [
                    {"term": {"lang": "de"}},
                    {"range": {"n_bytes": {"gte": 100}}},
                ],
            }
        },
        "size": 10,
    }
    got = [h["_id"] for h in run_query(rdr, body)["hits"]["hits"]]
    base = dict(rdr.search_bool(must="merge", k=10))
    keep = {d for d, _, l, v in DOCS if l == "de" and v >= 100}
    assert set(got) == set(base) & keep
    assert 1 in got and 5 not in got  # doc 5 is de but n_bytes=50


def test_bool_filter_empty_set(rdr):
    body = {
        "query": {
            "bool": {
                "must": [{"match": {"text": "merge"}}],
                "filter": [{"range": {"n_bytes": {"gte": 10_000}}}],
            }
        }
    }
    assert run_query(rdr, body)["hits"]["hits"] == []


def test_scan_layout_tombstones_excluded(ray_session, tmp_path):
    """After delete on the scan layout (tombstones, docstore bytes do
    not move) the doc-value scans must not resurrect dead docs."""
    from raybm25.fixtures import make_pages
    from raybm25.index.build_scan import build_index_scan
    from raybm25.loader.delete import delete_docs

    pages = make_pages(n_rows=120, seed=11)
    src = str(tmp_path / "p.parquet")
    pq.write_table(pages, src)
    idx = str(tmp_path / "idx")
    build_index_scan(src, idx, key_col="url", ts_col="warc_ts",
                     extract_html=True, key_buckets=4)
    r = IndexReader(idx)
    all_ids = r.exists_docs("doc_id")
    assert all_ids.size == r.n_docs
    victims = all_ids[:7].tolist()
    res = delete_docs(idx, victims)
    assert res["deleted"] == 7
    r2 = IndexReader(idx)
    live = r2.exists_docs("doc_id")
    assert live.size == r2.n_docs == all_ids.size - 7
    assert not set(victims) & set(live.tolist())
    assert r2.ids_docs(victims).tolist() == []
