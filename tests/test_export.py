"""Export-matching (reindex/scroll) + update-by-query, incl. resume
semantics and scan-layout tombstone handling."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raybm25.index.build import build_index
from raybm25.index.build_scan import build_index_scan
from raybm25.loader.delete import delete_by_query
from raybm25.loader.export import export_matching, update_by_query
from raybm25.query.engine import IndexReader

DOCS = [
    (0, "merge join fast", "en"),
    (1, "merge sort slow", "de"),
    (2, "join stream window", "en"),
    (3, "sort only tokens", "fr"),
    (4, "merge merge stream", "en"),
    (5, "window stream join", "de"),
]


@pytest.fixture()
def hash_idx(ray_session, tmp_path):
    src = str(tmp_path / "d.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": [i for i, _, _ in DOCS],
                "text": [t for _, t, _ in DOCS],
                "lang": [l for _, _, l in DOCS],
            }
        ),
        src,
    )
    idx = str(tmp_path / "idx")
    build_index(src, idx, key_col="doc_id", id_col="doc_id", ts_col=None,
                keyword_cols=("lang",), num_buckets=3)
    return idx, tmp_path


def test_export_matching_subset(hash_idx):
    idx, tmp = hash_idx
    out = str(tmp / "exp")
    res = export_matching(idx, out, "merge", columns=["doc_id", "lang"])
    want = sorted(i for i, t, _ in DOCS if "merge" in t)
    assert res["exported"] == len(want)
    t = pq.read_table(out)
    assert sorted(t.column("doc_id").to_pylist()) == want
    assert t.column_names == ["doc_id", "lang"]


def test_export_full_and_resume(hash_idx):
    idx, tmp = hash_idx
    out = str(tmp / "exp")
    res = export_matching(idx, out)
    assert res["exported"] == len(DOCS)
    # resume: re-run skips finished partitions, counts stay right
    res2 = export_matching(idx, out)
    assert res2["exported"] == len(DOCS)
    assert pq.read_table(out).num_rows == len(DOCS)


def test_export_no_match(hash_idx):
    idx, tmp = hash_idx
    out = str(tmp / "exp")
    assert export_matching(idx, out, "absentterm") == {
        "exported": 0, "partitions": 0
    }


def test_export_scan_skips_tombstones(ray_session, tmp_path):
    from raybm25.fixtures import make_pages

    src = str(tmp_path / "p.parquet")
    pq.write_table(make_pages(n_rows=150, seed=9), src)
    idx = str(tmp_path / "idx")
    build_index_scan(src, idx, key_col="url", ts_col="warc_ts",
                     extract_html=True, key_buckets=4)
    r = IndexReader(idx)
    term = r.term_dictionary().to_pylist()[10]
    victims = {d for d, _ in r.search(term, k=10_000)}
    assert victims
    delete_by_query(idx, term)
    out = str(tmp_path / "exp")
    res = export_matching(idx, out, columns=["doc_id"])
    got = set(
        np.asarray(pq.read_table(out).column("doc_id")).astype(np.uint64).tolist()
    )
    assert not (got & victims)
    assert res["exported"] == IndexReader(idx).n_docs


def test_update_by_query_then_search(hash_idx):
    idx, tmp = hash_idx
    res = update_by_query(idx, "merge", {"lang": "xx"}, "doc_id")
    want = {i for i, t, _ in DOCS if "merge" in t}
    assert res["updated"] == len(want)
    r = IndexReader(idx)
    # keyword postings rebuilt: lang filter now selects exactly those
    hits = r.search_bool(must="merge", filter_term=("lang", "xx"), k=10)
    assert {d for d, _ in hits} == want
    # untouched docs keep their lang
    other = r.search_bool(must="window", filter_term=("lang", "de"), k=10)
    assert {d for d, _ in other} == {5}


def test_update_by_query_script(ray_session, tmp_path):
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from raybm25.index.build import build_index
    from raybm25.loader.export import update_by_query

    pq.write_table(
        pa.table(
            {
                "doc_id": [0, 1, 2],
                "text": ["hit a", "miss b", "hit c"],
                "n": [10, 20, 30],
                "w": [1.0, 2.0, 3.0],
            }
        ),
        str(tmp_path / "d.parquet"),
    )
    idx = str(tmp_path / "sidx")
    build_index(str(tmp_path / "d.parquet"), idx, key_col="doc_id",
                id_col="doc_id", ts_col=None, text_cols=("text",),
                stored_cols=["text", "n", "w"], num_buckets=2)
    out = update_by_query(
        idx, "hit",
        script="ctx._source.n = ctx._source.n * 2; "
               "ctx._source.w = ctx._source.w / 4",
    )
    assert out["updated"] == 2
    parts = [
        pq.read_table(p, columns=["doc_id", "n", "w"])
        for p in sorted(glob.glob(f"{idx}/docs/*.parquet"))
    ]
    df = pa.concat_tables(parts).to_pandas().sort_values("doc_id")
    # integral results keep int; fractional promote to float
    assert df["n"].tolist() == [20, 20, 60]
    assert df["w"].tolist() == [0.25, 2.0, 0.75]


def test_update_script_rejects_bad_statements():
    import pytest as _pt

    from raybm25.query.script import compile_update_script

    for bad in (
        "ctx._source.a += 1",
        "n = 1",
        "ctx._source.a = __import__('os')",
        "",
        "delete ctx._source.a",
    ):
        with _pt.raises(ValueError):
            compile_update_script(bad)
    steps = compile_update_script(
        "ctx._source.a = ctx._source.b + 1; ctx._source.c = 2"
    )
    assert [t for t, _ in steps] == ["a", "c"]
    assert steps[0][1].fields == ["b"]
