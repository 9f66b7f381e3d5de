"""resize_index (the _split / _shrink analog): search invariance
across re-bucketing, layout checks, error paths."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from raybm25.fixtures import make_pages
from raybm25.index.build import build_index
from raybm25.loader.resize import resize_index
from raybm25.query.engine import IndexReader


@pytest.fixture(scope="module")
def src_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("resize")
    pages_path = str(root / "pages.parquet")
    pq.write_table(make_pages(n_rows=500, seed=7), pages_path)
    idx = str(root / "idx")
    build_index(
        pages_path,
        idx,
        key_col="url",
        ts_col="warc_ts",
        extract_html=True,
        keyword_cols=("lang",),
        num_buckets=8,
        postings_shards=16,
    )
    return idx


def _bucket_count(idx: str) -> int:
    return len(glob.glob(os.path.join(idx, "docs", "bucket=*.parquet")))


def _top(reader: IndexReader, q: str, k: int = 10):
    return reader.search_pruned(q, k)


@pytest.mark.parametrize("dest_buckets", [12, 3])
def test_resize_preserves_search(src_index, tmp_path_factory, dest_buckets):
    """Split (8->12) and shrink (8->3): identical corpus stats and
    bit-identical BM25 rankings; only the physical bucket count moves."""
    dest = str(tmp_path_factory.mktemp("dst") / f"idx{dest_buckets}")
    metrics = resize_index(src_index, dest, dest_buckets)
    assert metrics["src_num_buckets"] == 8
    assert metrics["dest_num_buckets"] == dest_buckets
    assert _bucket_count(dest) == dest_buckets

    a, b = IndexReader(src_index), IndexReader(dest)
    assert b.n_docs == a.n_docs
    assert b.avgdl == pytest.approx(a.avgdl, abs=0.0)  # bit-identical
    for q in ("tosa", "lumpex kenzin", "borzinlum haxsasa dumilum", "zzz-no-such-term"):
        assert _top(b, q) == _top(a, q)


def test_resize_preserves_keyword_filter(src_index, tmp_path_factory):
    dest = str(tmp_path_factory.mktemp("dstkw") / "idx")
    resize_index(src_index, dest, 5, postings_shards=4)
    a, b = IndexReader(src_index), IndexReader(dest)
    assert b.search_filtered("lumpex kenzin", "lang", "en", 15) == (
        a.search_filtered("lumpex kenzin", "lang", "en", 15)
    )


def test_resize_error_paths(src_index, tmp_path):
    with pytest.raises(FileNotFoundError):
        resize_index(str(tmp_path / "nope"), str(tmp_path / "out"), 4)
    with pytest.raises(ValueError):
        resize_index(src_index, str(tmp_path / "out2"), 0)


def test_reindex_subset_stats(src_index, tmp_path_factory):
    """reindex with a query: destination holds exactly the matching
    docs, ids unchanged, BM25 stats subset-local (n_docs shrinks)."""
    from raybm25.loader.resize import reindex

    a = IndexReader(src_index)
    match_ids = {d for d, _ in a.search("kenzin", k=a.n_docs)}
    assert 0 < len(match_ids) < a.n_docs

    dest = str(tmp_path_factory.mktemp("ri") / "idx")
    m = reindex(src_index, dest, "kenzin", num_buckets=4)
    assert m["exported"] == len(match_ids)
    b = IndexReader(dest)
    assert b.n_docs == len(match_ids)
    assert b.avgdl != a.avgdl  # subset-local statistics
    hits = b.search_pruned("kenzin tosa", 10)
    assert hits and all(d in match_ids for d, _ in hits)
    # subset idf: same candidate docs, different scores than the source
    assert hits != a.search_pruned("kenzin tosa", 10)


def test_reindex_full_copy_matches_resize(src_index, tmp_path_factory):
    from raybm25.loader.resize import reindex

    dest = str(tmp_path_factory.mktemp("rifull") / "idx")
    m = reindex(src_index, dest, None, num_buckets=6)
    a, b = IndexReader(src_index), IndexReader(dest)
    assert m["exported"] == a.n_docs
    assert b.n_docs == a.n_docs and b.avgdl == a.avgdl
    assert b.search_pruned("kenzin tosa", 10) == a.search_pruned("kenzin tosa", 10)


def test_reindex_stale_export_cleared(src_index, tmp_path):
    """The export dir's sidecar guard: a leftover export from a
    DIFFERENT query must not leak its docs into a new reindex."""
    from raybm25.loader.resize import reindex

    dest = str(tmp_path / "idx")
    m1 = reindex(src_index, dest, "kenzin")
    # same dest (=> same export dir), different query: without the
    # guard, export_matching would skip the existing part files and
    # rebuild from the 'kenzin' docs
    m2 = reindex(src_index, dest, "tosa", overwrite=True)
    a = IndexReader(src_index)
    tosa_ids = {d for d, _ in a.search("tosa", k=a.n_docs)}
    assert m2["exported"] == len(tosa_ids) != m1["exported"]
    assert IndexReader(dest).n_docs == len(tosa_ids)
    # rerunning the SAME query resumes (sidecar matches, export kept)
    m3 = reindex(src_index, dest, "tosa", overwrite=True)
    assert m3["exported"] == m2["exported"]


def test_reindex_no_match_raises(src_index, tmp_path):
    from raybm25.loader.resize import reindex

    with pytest.raises(ValueError, match="matches no documents"):
        reindex(src_index, str(tmp_path / "out"), "zzz-no-such-term")


def test_resize_cli(src_index, tmp_path, capsys):
    """CLI subcommands: resize JSON metrics, reindex via --query."""
    import json

    from raybm25.__main__ import main as cli_main

    dest = str(tmp_path / "cli_rs")
    rc = cli_main(["resize", "--index", src_index, "--dest", dest,
                   "--buckets", "4"])
    assert rc == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["dest_num_buckets"] == 4
    assert IndexReader(dest).n_docs == IndexReader(src_index).n_docs

    dest2 = str(tmp_path / "cli_ri")
    rc = cli_main(["resize", "--index", src_index, "--dest", dest2,
                   "--query", "kenzin"])
    assert rc == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["exported"] == IndexReader(dest2).n_docs > 0

    with pytest.raises(SystemExit, match="requires --buckets"):
        cli_main(["resize", "--index", src_index,
                  "--dest", str(tmp_path / "x")])


def test_resize_rejects_scan_layout(ray_session, tmp_path):
    from raybm25.index.build_scan import build_index_scan

    pages_path = str(tmp_path / "p.parquet")
    pq.write_table(make_pages(n_rows=120, seed=3), pages_path)
    idx = str(tmp_path / "scanidx")
    build_index_scan(
        pages_path, idx, key_col="url", ts_col="warc_ts", extract_html=True
    )
    with pytest.raises(ValueError, match="hash layout"):
        resize_index(idx, str(tmp_path / "out"), 4)
