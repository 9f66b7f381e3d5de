import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from raybm25.fixtures import make_pages, make_queries
from raybm25.hashing import hash64
from raybm25.index.build import build_index
from raybm25.oracle import OracleIndex
from raybm25.query.engine import IndexReader


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("idx")
    pages_path = str(root / "pages.parquet")
    pages = make_pages(n_rows=600, seed=42)
    pq.write_table(pages, pages_path)
    index_dir = str(root / "index")
    metrics = build_index(
        pages_path,
        index_dir,
        key_col="url",
        ts_col="warc_ts",
        extract_html=True,
        keyword_cols=("lang",),
        num_buckets=8,
        range_buckets=2,  # force multiple doc ranges (salting path)
        batch_size=128,
    )
    # oracle built from the *expected* deduped corpus
    df = pages.to_pandas().sort_values(["url", "warc_ts", "text"], kind="mergesort")
    df = df.drop_duplicates("url", keep="last")
    df["doc_id"] = hash64(df["url"].to_numpy(dtype=object))
    docs = dict(zip(df["doc_id"].tolist(), df["text"].tolist()))
    return index_dir, metrics, docs, df


def test_build_metrics_and_dedup(built):
    index_dir, metrics, docs, df = built
    assert metrics["n_docs"] == len(docs)
    reader = IndexReader(index_dir)
    assert reader.n_docs == len(docs)
    oracle = OracleIndex(docs)
    assert reader.avgdl == pytest.approx(oracle.avgdl, abs=1e-12)


def test_docstore_contents_match_dedup(built):
    index_dir, _, docs, df = built
    reader = IndexReader(index_dir)
    got = reader.get_docs(np.array(list(docs.keys()), dtype=np.uint64)).to_pandas()
    assert len(got) == len(docs)
    merged = got.merge(df[["doc_id", "text"]], on="doc_id", suffixes=("_idx", "_src"))
    assert (merged["text_idx"] == merged["text_src"]).all()


def test_bm25_rank_identical_vs_oracle(built):
    index_dir, _, docs, _ = built
    reader = IndexReader(index_dir)
    oracle = OracleIndex(docs)
    checked = 0
    for q in make_queries():
        expected = oracle.search(q["query_text"], q["k"])
        got = reader.search(q["query_text"], q["k"])
        assert [d for d, _ in got] == [d for d, _ in expected], q
        for (_, s1), (_, s2) in zip(got, expected):
            assert s1 == pytest.approx(s2, abs=1e-9)
        checked += 1
    assert checked == len(make_queries())


def test_pruned_identical_to_exact(built):
    index_dir, _, docs, _ = built
    reader = IndexReader(index_dir)
    for q in make_queries():
        exact = reader.search(q["query_text"], q["k"])
        pruned = reader.search_pruned(q["query_text"], q["k"])
        assert pruned == exact, q


def test_keyword_field_terms(built):
    index_dir, _, docs, df = built
    reader = IndexReader(index_dir)
    ids = reader.term_docs("lang", "en")
    expected = set(df.loc[df["lang"] == "en", "doc_id"].tolist())
    assert set(ids.tolist()) == expected


def test_resume_skips_completed_phases(built):
    index_dir, _, docs, _ = built
    # same input, no overwrite -> both phases skipped, same corpus stats
    pages_path = os.path.join(os.path.dirname(index_dir), "pages.parquet")
    m2 = build_index(
        pages_path,
        index_dir,
        key_col="url",
        ts_col="warc_ts",
        extract_html=True,
        keyword_cols=("lang",),
        num_buckets=8,
        range_buckets=2,
    )
    assert m2["build_phase"] == "skipped (checkpoint)"
    assert m2["n_docs"] == len(docs)


def test_resume_after_lost_postings_rebuilds_identically(built, tmp_path):
    import shutil

    index_dir, _, docs, _ = built
    pages_path = os.path.join(os.path.dirname(index_dir), "pages.parquet")
    clone = str(tmp_path / "clone")
    shutil.copytree(index_dir, clone)
    # simulate a failed postings phase: wipe postings + its manifest entry
    shutil.rmtree(os.path.join(clone, "postings"))
    import json

    with open(os.path.join(clone, "manifest.json")) as f:
        man = json.load(f)
    del man["phases"]["postings"]
    with open(os.path.join(clone, "manifest.json"), "w") as f:
        json.dump(man, f)
    m = build_index(
        pages_path,
        clone,
        key_col="url",
        ts_col="warc_ts",
        extract_html=True,
        keyword_cols=("lang",),
        num_buckets=8,
        range_buckets=2,
    )
    assert m["docs_phase"] == "skipped (checkpoint)"  # docstore kept
    assert "build_phase" not in m  # postings rebuilt from docstore
    r1, r2 = IndexReader(index_dir), IndexReader(clone)
    for q in make_queries():
        assert r1.search(q["query_text"], q["k"]) == r2.search(q["query_text"], q["k"])
