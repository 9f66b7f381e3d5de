"""Scan-layout build (text never shuffles) must be result-identical to
the hash-bucket build: same dedup winners, same BM25 top-k (ids AND
scores), same doc-store lookups — with duplicate urls spread across
input files (cross-file dedup goes through the keys-only dead-list)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from raybm25.fixtures import make_pages, make_queries
from raybm25.hashing import hash64
from raybm25.index.build import build_index
from raybm25.index.build_scan import build_index_scan
from raybm25.query.engine import IndexReader


@pytest.fixture(scope="module")
def both_layouts(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("scan")
    pages = make_pages(n_rows=700, seed=42)
    # split into 5 files: the shuffled fixture puts url-duplicates in
    # different files, exercising the cross-file dead-list path
    files = []
    n = pages.num_rows
    for i in range(5):
        part = pages.slice(i * n // 5, (i + 1) * n // 5 - i * n // 5)
        p = str(root / f"pages-{i:02d}.parquet")
        pq.write_table(part, p)
        files.append(p)

    hash_dir = str(root / "hash_idx")
    build_index(
        files, hash_dir, key_col="url", ts_col="warc_ts", extract_html=True,
        keyword_cols=("lang",), sayt_cols=("text",), num_buckets=8, range_buckets=2,
    )
    scan_dir = str(root / "scan_idx")
    m = build_index_scan(
        files, scan_dir, key_col="url", ts_col="warc_ts", extract_html=True,
        keyword_cols=("lang",), sayt_cols=("text",), postings_shards=64,
        range_parts=2, key_buckets=8,
    )
    return hash_dir, scan_dir, pages, m


def test_same_corpus_stats(both_layouts):
    hash_dir, scan_dir, pages, m = both_layouts
    r1, r2 = IndexReader(hash_dir), IndexReader(scan_dir)
    assert r1.n_docs == r2.n_docs
    assert r1.avgdl == r2.avgdl
    assert m["n_dead"] > 0  # the fixture really has cross-file dups


def test_search_identical_across_layouts(both_layouts):
    hash_dir, scan_dir, _, _ = both_layouts
    r1, r2 = IndexReader(hash_dir), IndexReader(scan_dir)
    for q in make_queries():
        a = r1.search(q["query_text"], q["k"])
        b = r2.search(q["query_text"], q["k"])
        assert a == b, q
        assert r2.search_pruned(q["query_text"], q["k"]) == b


def test_keyword_and_docstore_across_layouts(both_layouts):
    hash_dir, scan_dir, pages, _ = both_layouts
    r1, r2 = IndexReader(hash_dir), IndexReader(scan_dir)
    assert set(r1.term_docs("lang", "en").tolist()) == set(
        r2.term_docs("lang", "en").tolist()
    )
    some = hash64(np.array(pages["url"].to_pylist()[:20], dtype=object))
    d1 = r1.get_docs(some).to_pandas().sort_values("url").reset_index(drop=True)
    d2 = r2.get_docs(some).to_pandas().sort_values("url").reset_index(drop=True)
    assert (d1["url"] == d2["url"]).all()
    assert (d1["text"] == d2["text"]).all()


def test_search_filtered_equals_postfilter(both_layouts):
    """Filtered BM25 (keyword-term filter intersected before scoring)
    must equal unfiltered search post-filtered to the keyword's doc
    set — on both layouts."""
    hash_dir, scan_dir, _, _ = both_layouts
    for d in (hash_dir, scan_dir):
        r = IndexReader(d)
        allowed = set(r.term_docs("lang", "en").tolist())
        assert allowed  # fixture really has lang=en docs
        for q in ("merge", "merge join"):
            want = [(d_, s) for d_, s in r.search(q, r.n_docs) if d_ in allowed][:5]
            got = r.search_filtered(q, "lang", "en", k=5)
            assert got == want, (d, q)
        assert r.search_filtered("merge", "lang", "nosuchlang", k=5) == []
        assert r.search_filtered("zzzabsent", "lang", "en", k=5) == []


def test_search_filtered_wand_identical(both_layouts):
    """The block-max WAND variant of search_filtered (theta seeded from
    filter-passing docs only) must be result-identical to the exact
    intersect-then-score path, for broad and narrow filters."""
    hash_dir, scan_dir, _, _ = both_layouts
    for d in (hash_dir, scan_dir):
        r = IndexReader(d)
        for lang in ("en", "de", "nosuchlang"):
            for q in ("merge", "merge join", "merge join filter", "zzzabsent"):
                exact = r.search_filtered(q, "lang", lang, k=5, pruned=False)
                wand = r.search_filtered(q, "lang", lang, k=5, pruned=True)
                auto = r.search_filtered(q, "lang", lang, k=5)
                assert wand == exact, (d, lang, q)
                assert auto == exact, (d, lang, q)


def test_sayt_identical_across_layouts(both_layouts):
    """VERDICT r2 #4: sayt expansion now runs in the scan tokenize
    stage — prefix and shingle lookups must match the hash layout."""
    hash_dir, scan_dir, _, _ = both_layouts
    r1, r2 = IndexReader(hash_dir), IndexReader(scan_dir)
    hits = 0
    for term in ("#th", "#the", "#merg", "#qui", "#a"):
        a = set(r1.term_docs("text", term).tolist())
        assert a == set(r2.term_docs("text", term).tolist()), term
        hits += len(a)
    assert hits > 0  # the probe prefixes actually match something


def test_scan_per_file_resume(ray_session, tmp_path):
    """Interrupted scan build: completed partitions are skipped on the
    rerun (per-input-file checkpoints), and the result is identical."""
    import os
    import time

    import pyarrow.parquet as pq2

    pages = make_pages(n_rows=400, seed=5)
    files = []
    for i in range(4):
        p = str(tmp_path / f"f{i}.parquet")
        pq2.write_table(pages.slice(i * 100, 100), p)
        files.append(p)
    idx = str(tmp_path / "idx")
    build_index_scan(files, idx, key_col="url", ts_col="warc_ts", extract_html=True,
                     postings_shards=16, range_parts=2, key_buckets=4)
    r1 = [IndexReader(idx).search(q["query_text"], q["k"]) for q in make_queries()]
    # note partition mtimes; simulate a crash that lost parts 2,3
    kept = [os.path.getmtime(os.path.join(idx, "docs", f"part=0000{i}.parquet")) for i in (0, 1)]
    for i in (2, 3):
        os.remove(os.path.join(idx, "docs", f"part=0000{i}.parquet"))
    time.sleep(0.05)
    build_index_scan(files, idx, key_col="url", ts_col="warc_ts", extract_html=True,
                     postings_shards=16, range_parts=2, key_buckets=4)
    # untouched partitions were NOT rewritten (checkpoint skip)
    for i, old in zip((0, 1), kept):
        assert os.path.getmtime(os.path.join(idx, "docs", f"part=0000{i}.parquet")) == old
    r2 = [IndexReader(idx).search(q["query_text"], q["k"]) for q in make_queries()]
    assert r1 == r2


def test_incremental_append_new_files(ray_session, tmp_path):
    """Incremental ingest: re-running build_index_scan with the input
    list EXTENDED by new files builds only the new partitions (existing
    ones checkpoint-skip; their keys are recovered without reading
    text), cross-file dedup spans old+new, and the result equals a
    from-scratch build over the full list."""
    import os

    import pyarrow.parquet as pq2

    pages = make_pages(n_rows=500, seed=9)
    files = []
    for i in range(5):
        p = str(tmp_path / f"f{i}.parquet")
        pq2.write_table(pages.slice(i * 100, 100), p)
        files.append(p)

    kw = dict(key_col="url", ts_col="warc_ts", extract_html=True,
              postings_shards=16, range_parts=2, key_buckets=4)
    inc = str(tmp_path / "inc")
    build_index_scan(files[:3], inc, **kw)
    old_mtimes = [
        os.path.getmtime(os.path.join(inc, "docs", f"part=0000{i}.parquet"))
        for i in range(3)
    ]
    m = build_index_scan(files, inc, **kw)  # append f3, f4
    assert m["n_docs"] == IndexReader(inc).n_docs
    for i, old in enumerate(old_mtimes):  # old partitions untouched
        assert os.path.getmtime(os.path.join(inc, "docs", f"part=0000{i}.parquet")) == old

    full = str(tmp_path / "full")
    build_index_scan(files, full, **kw)
    ri, rf = IndexReader(inc), IndexReader(full)
    assert (ri.n_docs, ri.avgdl) == (rf.n_docs, rf.avgdl)
    for q in make_queries():
        assert ri.search(q["query_text"], q["k"]) == rf.search(q["query_text"], q["k"])


def test_scan_layout_updates(ray_session, tmp_path):
    """J2 updates on a scan-layout index: key-index join resolves
    ordinals, shallow merge + NULL-preserve, missing counted, postings
    rebuilt so new text is searchable."""
    import pyarrow as pa
    import pyarrow.parquet as pq2

    from raybm25.hashing import hash64
    from raybm25.loader.update import apply_updates

    files = []
    for i in range(3):
        tbl = pa.table(
            {
                "url": [f"u{i}_{j}" for j in range(20)],
                "text": [f"alpha beta item{i}x{j}" for j in range(20)],
                "lang": ["en"] * 20,
            }
        )
        p = str(tmp_path / f"f{i}.parquet")
        pq2.write_table(tbl, p)
        files.append(p)
    idx = str(tmp_path / "idx")
    build_index_scan(files, idx, key_col="url", ts_col=None, keyword_cols=("lang",),
                     postings_shards=8, range_parts=1, key_buckets=4)
    updates = pa.table(
        {
            "url": ["u1_3", "u2_7", "u1_3", "ghost"],
            "lang": ["fr", None, "it", "xx"],
            "text": [None, "gamma delta", None, None],
        }
    )
    res = apply_updates(idx, updates, "url")
    assert res["missing"] == 1
    assert res["updated"] == 2  # u1_3 (last wins) + u2_7
    r = IndexReader(idx)
    a, b = hash64(np.array(["u1_3", "u2_7"], dtype=object))
    got = r.get_docs(np.array([a, b], dtype=np.uint64)).to_pandas().set_index("url")
    assert got.loc["u1_3", "lang"] == "it"
    assert got.loc["u1_3", "text"] == "alpha beta item1x3"  # NULL preserves
    assert got.loc["u2_7", "text"] == "gamma delta"
    assert got.loc["u2_7", "lang"] == "en"  # untouched preserved
    hits = {int(d) for d, _ in r.search("gamma", 10)}
    assert int(b) in hits  # postings rebuilt
    assert not any(int(d) == int(b) for d, _ in r.search("item2x7", 10))


def test_hot_term_salted_across_doc_ranges(ray_session, tmp_path):
    """Skew handling (north rule "salted repartitioning of hot terms"):
    a term present in EVERY document must be split into multiple
    doc-range segments — bounded per-group merge work — and still serve
    exact results after segment concatenation."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data  # noqa: F401

    from raybm25.index.build import POSTINGS_SUBDIR
    from raybm25.index.build_scan import build_index_scan
    from raybm25.query.engine import IndexReader

    src = tmp_path / "pages"
    src.mkdir()
    n_files = 8
    for f in range(n_files):
        rows = range(f * 25, f * 25 + 25)
        pq.write_table(
            pa.table(
                {
                    "url": [f"u{i}" for i in rows],
                    "text": [f"hotterm filler{i}" for i in rows],
                }
            ),
            str(src / f"p{f}.parquet"),
        )
    idx = tmp_path / "idx"
    # range_parts=2 -> one doc-range per 2 input files -> 4 segments
    build_index_scan(
        str(src), str(idx), key_col="url", ts_col=None, text_cols=("text",),
        postings_shards=8, range_parts=2,
    )
    import pyarrow.dataset as pads

    rows = (
        pads.dataset(str(idx / POSTINGS_SUBDIR))
        .to_table(filter=pads.field("term") == "hotterm", columns=["term", "range", "df"])
    )
    ranges = sorted(set(rows.column("range").to_pylist()))
    assert len(ranges) == 4, ranges        # split into 4 doc-range segments
    assert int(np.sum(rows.column("df").to_numpy())) == 200  # all docs covered
    r = IndexReader(str(idx))
    hits = r.search_pruned("hotterm filler37", 5, field="text")
    assert len(hits) == 5 and len(r.search("hotterm", 300)) == 200


def test_scan_build_full_skip_checkpoint(ray_session, tmp_path):
    """A second build over unchanged inputs is a no-op (full-skip
    checkpoint); touching one input file triggers a real rebuild."""
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from raybm25.index.build import POSTINGS_SUBDIR
    from raybm25.index.build_scan import build_index_scan

    src = tmp_path / "pages"
    src.mkdir()
    for f in range(2):
        pq.write_table(
            pa.table(
                {
                    "url": [f"u{f}_{i}" for i in range(10)],
                    "text": [f"alpha f{f} doc{i}" for i in range(10)],
                }
            ),
            str(src / f"p{f}.parquet"),
        )
    idx = str(tmp_path / "idx")
    m1 = build_index_scan(src.as_posix(), idx, key_col="url", ts_col=None, text_cols=("text",))
    shard_dir = os.path.join(idx, POSTINGS_SUBDIR)
    mtimes = {f: os.stat(os.path.join(shard_dir, f)).st_mtime_ns for f in os.listdir(shard_dir)}

    m2 = build_index_scan(src.as_posix(), idx, key_col="url", ts_col=None, text_cols=("text",))
    assert m2["build_phase"] == "skipped (checkpoint)"
    assert m2["n_docs"] == m1["n_docs"] == 20
    after = {f: os.stat(os.path.join(shard_dir, f)).st_mtime_ns for f in os.listdir(shard_dir)}
    assert after == mtimes  # nothing rewritten

    _time.sleep(0.01)
    pq.write_table(
        pa.table({"url": ["u0_0"], "text": ["changed content zz"]}),
        str(src / "p0.parquet"),
    )
    m3 = build_index_scan(src.as_posix(), idx, key_col="url", ts_col=None, text_cols=("text",))
    assert "build_phase" not in m3  # real rebuild
    assert m3["n_docs"] == 11  # p0 now has 1 row


def test_partials_checkpoint_resume(ray_session, tmp_path):
    """checkpoint_partials=True: the postings phase resumes from
    per-partition partials — a crash after tokenize does not re-pay it,
    and the result is identical to a non-checkpointed build."""
    import os

    import pyarrow.parquet as pq2

    from raybm25.index.build_scan import PARTIALS_SUBDIR, rebuild_postings_scan

    pages = make_pages(n_rows=400, seed=11)
    files = []
    for i in range(4):
        p = str(tmp_path / f"f{i}.parquet")
        pq2.write_table(pages.slice(i * 100, 100), p)
        files.append(p)
    kw = dict(key_col="url", ts_col="warc_ts", extract_html=True,
              postings_shards=16, range_parts=2, key_buckets=4)

    ck = str(tmp_path / "ck")
    build_index_scan(files, ck, checkpoint_partials=True, **kw)
    pdir = os.path.join(ck, PARTIALS_SUBDIR)
    pfiles = sorted(f for f in os.listdir(pdir) if f.endswith(".parquet"))
    assert len(pfiles) == 4
    mtimes = [os.path.getmtime(os.path.join(pdir, f)) for f in pfiles]

    # simulate a crash AFTER tokenize: postings lost, partials intact
    import shutil
    shutil.rmtree(os.path.join(ck, "postings"))
    rebuild_postings_scan(ck)
    # partials were REUSED, not rewritten
    assert [os.path.getmtime(os.path.join(pdir, f)) for f in pfiles] == mtimes

    plain = str(tmp_path / "plain")
    build_index_scan(files, plain, **kw)
    r1, r2 = IndexReader(ck), IndexReader(plain)
    assert (r1.n_docs, r1.avgdl) == (r2.n_docs, r2.avgdl)
    for q in make_queries():
        assert r1.search(q["query_text"], q["k"]) == r2.search(q["query_text"], q["k"])

    # stale checkpoint: touch a docstore partition -> that partition's
    # partials rebuild, others stay
    part0 = os.path.join(ck, "docs", "part=00000.parquet")
    os.utime(part0, None)
    rebuild_postings_scan(ck)
    newm = [os.path.getmtime(os.path.join(pdir, f)) for f in pfiles]
    assert newm[0] != mtimes[0] and newm[1:] == mtimes[1:]
    for q in make_queries():
        assert r1.search(q["query_text"], q["k"]) == IndexReader(ck).search(
            q["query_text"], q["k"]
        )
