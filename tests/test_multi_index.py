"""Multi-index scatter-gather search (run_query_multi) vs brute force:
per-index BM25 stats, global merge by (score desc, doc_id asc)."""

import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.query.dsl import run_query, run_query_multi

DOCS_A = [(0, "merge sort fast"), (2, "merge only"), (4, "nothing here")]
DOCS_B = [(1, "merge merge merge"), (3, "sort and merge"), (5, "unrelated")]


@pytest.fixture(scope="module")
def dirs(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("multiidx")
    import pyarrow.parquet as pq

    out = []
    for name, docs in (("a", DOCS_A), ("b", DOCS_B)):
        pq.write_table(
            pa.table(
                {"doc_id": [i for i, _ in docs], "text": [t for _, t in docs]}
            ),
            str(tmp / f"{name}.parquet"),
        )
        idx = str(tmp / f"idx_{name}")
        build_index(str(tmp / f"{name}.parquet"), idx, key_col="doc_id",
                    id_col="doc_id", ts_col=None, num_buckets=2)
        out.append(idx)
    return out


def test_merge_equals_per_index_union(dirs):
    body = {"query": {"match": {"text": {"query": "merge"}}}, "size": 10}
    resp = run_query_multi(dirs, body)
    per_index = []
    for d in dirs:
        per_index.extend(
            (h["_id"], h["_score"]) for h in run_query(d, body)["hits"]["hits"]
        )
    exp = sorted(per_index, key=lambda t: (-t[1], t[0]))[:10]
    assert [(h["_id"], h["_score"]) for h in resp["hits"]["hits"]] == exp
    # hits carry their index name
    names = {h["_id"]: h["_index"] for h in resp["hits"]["hits"]}
    assert names[0] == "idx_a" and names[1] == "idx_b"


def test_per_index_stats_differ(dirs):
    # the same doc text scores differently per index (own n/avgdl/df):
    # doc 1 ("merge merge merge") ranks first overall — highest tf and
    # index b's own stats
    resp = run_query_multi(
        dirs, {"query": {"match": {"text": {"query": "merge"}}}, "size": 1}
    )
    assert resp["hits"]["hits"][0]["_id"] == 1


def test_size_cut_is_global(dirs):
    resp = run_query_multi(
        dirs, {"query": {"match": {"text": {"query": "merge"}}}, "size": 2}
    )
    assert len(resp["hits"]["hits"]) == 2


def test_total_sums_across_indices(dirs):
    # 4 docs match 'merge' (2 per index); a size-2 page still reports
    # the cross-index total, not the page length
    resp = run_query_multi(
        dirs,
        {
            "query": {"match": {"text": {"query": "merge"}}},
            "size": 2,
            "track_total_hits": True,
        },
    )
    assert resp["hits"]["total"] == {"value": 4, "relation": "eq"}
    assert len(resp["hits"]["hits"]) == 2


def test_source_carried_through_merge(dirs):
    resp = run_query_multi(
        dirs,
        {
            "query": {"match": {"text": {"query": "merge"}}},
            "size": 3,
            "_source": ["text"],
        },
    )
    for h in resp["hits"]["hits"]:
        assert "text" in h["_source"]
    by_id = {h["_id"]: h["_source"]["text"] for h in resp["hits"]["hits"]}
    assert by_id[1] == "merge merge merge"


def test_indices_boost_reorders_merge(dirs):
    from raybm25.query.dsl import run_query_multi

    a, b = dirs
    body = {"query": {"match": {"text": {"query": "merge"}}}, "size": 10}
    plain = run_query_multi([a, b], body)["hits"]["hits"]
    import os as _os

    bname = _os.path.basename(_os.path.normpath(b))
    boosted = run_query_multi(
        [a, b], {**body, "indices_boost": [{bname: 100.0}]}
    )["hits"]["hits"]
    # every hit from the boosted index now outranks the other index
    first_other = next(
        (i for i, h in enumerate(boosted) if h["_index"] != bname),
        len(boosted),
    )
    assert all(h["_index"] == bname for h in boosted[:first_other])
    assert {h["_id"] for h in boosted} == {h["_id"] for h in plain}
    for h in boosted:
        if h["_index"] == bname:
            assert h["_score"] > 1.0  # scaled by 100



def test_dfs_equals_unsplit_index(dirs, tmp_path_factory, ray_session):
    """dfs_query_then_fetch: the split corpus scores bit-identically
    to one index holding all six docs (global n/avgdl/df)."""
    import pyarrow.parquet as pq

    from raybm25.query.engine import IndexReader, search_dfs

    tmp = tmp_path_factory.mktemp("dfsfull")
    docs = sorted(DOCS_A + DOCS_B)
    pq.write_table(
        pa.table({"doc_id": [i for i, _ in docs], "text": [t for _, t in docs]}),
        str(tmp / "all.parquet"),
    )
    full = str(tmp / "idx_all")
    build_index(str(tmp / "all.parquet"), full, key_col="doc_id",
                id_col="doc_id", ts_col=None, num_buckets=2)
    for q in ("merge", "merge sort", "sort unrelated", "absentterm"):
        assert search_dfs(dirs, q, k=10) == IndexReader(full).search(q, k=10)


def test_dfs_differs_from_per_index_stats(dirs):
    """The default per-index merge and the dfs merge disagree on
    scores for a skewed split (that is the point of dfs)."""
    from raybm25.query.dsl import run_query_multi_dfs

    body = {"query": {"match": {"text": {"query": "merge"}}}, "size": 10}
    dfs_hits = [
        (h["_id"], h["_score"])
        for h in run_query_multi_dfs(dirs, body)["hits"]["hits"]
    ]
    plain_hits = [
        (h["_id"], h["_score"])
        for h in run_query_multi(dirs, body)["hits"]["hits"]
    ]
    assert {i for i, _ in dfs_hits} == {i for i, _ in plain_hits}
    assert dfs_hits != plain_hits  # scores (and order) shift under dfs


def test_dfs_index_attribution_and_errors(dirs):
    from raybm25.query.dsl import run_query_multi_dfs

    body = {"query": {"match": {"text": {"query": "merge"}}}, "size": 10}
    resp = run_query_multi_dfs(dirs, body)
    import os

    names = {os.path.basename(d) for d in dirs}
    a_ids = {i for i, _ in DOCS_A}
    for h in resp["hits"]["hits"]:
        assert h["_index"] in names
        expect = "idx_a" if h["_id"] in a_ids else "idx_b"
        assert h["_index"] == expect
    with pytest.raises(ValueError, match="match"):
        run_query_multi_dfs(dirs, {"query": {"term": {"text": "merge"}}})
    with pytest.raises(ValueError, match="match"):
        run_query_multi_dfs(dirs, {"size": 5})  # missing query


def test_dfs_total_is_match_count(dirs):
    from raybm25.query.dsl import run_query_multi_dfs

    resp = run_query_multi_dfs(
        dirs, {"query": {"match": {"text": {"query": "merge"}}}, "size": 2}
    )
    assert len(resp["hits"]["hits"]) == 2
    # 4 of the 6 fixture docs contain 'merge'
    assert resp["hits"]["total"]["value"] == 4


def test_dfs_multifield_uses_named_field(ray_session, tmp_path_factory):
    """The match field must be wired through to per-field postings and
    stats, not silently fall back to the primary field."""
    import pyarrow.parquet as pq

    from raybm25.query.dsl import run_query_multi_dfs
    from raybm25.query.engine import IndexReader, search_dfs

    tmp = tmp_path_factory.mktemp("dfsmf")
    rows = [
        (0, "apple banana", "cherry plum"),
        (1, "cherry cherry", "apple apple apple"),
        (2, "plum plum", "apple orange"),
        (3, "apple plum", "orange orange"),
    ]
    dirs2, full = [], None
    for name, sel in (("x", (0, 1)), ("y", (2, 3)), ("all", (0, 1, 2, 3))):
        sub = [rows[i] for i in sel]
        p = str(tmp / f"{name}.parquet")
        pq.write_table(
            pa.table({"doc_id": [r[0] for r in sub],
                      "text": [r[1] for r in sub],
                      "title": [r[2] for r in sub]}),
            p,
        )
        idx = str(tmp / f"idx_{name}")
        build_index(p, idx, key_col="doc_id", id_col="doc_id", ts_col=None,
                    text_cols=("text", "title"), num_buckets=2)
        if name == "all":
            full = idx
        else:
            dirs2.append(idx)
    # title-field search differs from text-field search AND matches the
    # unsplit index's title-field ranking bit-for-bit
    want = IndexReader(full).search("apple", k=10, field="title")
    got = search_dfs(dirs2, "apple", k=10, field="title")
    assert got == want
    assert got != search_dfs(dirs2, "apple", k=10)
    resp = run_query_multi_dfs(
        dirs2,
        {"query": {"match": {"title": {"query": "apple"}}}, "size": 10},
    )
    assert [(h["_id"], h["_score"]) for h in resp["hits"]["hits"]] == want


def test_ignore_unavailable(dirs):
    """ignore_unavailable=true skips missing indices in the
    scatter-gather; without it the error propagates."""
    import pytest as _pt

    from raybm25.query.dsl import run_query_multi

    a, b = dirs[0], dirs[1]
    dirs = [a, a + "_does_not_exist", b]
    with _pt.raises(FileNotFoundError):
        run_query_multi(dirs, {"size": 5, "query": {"match_all": {}}})
    ok = run_query_multi(
        dirs,
        {"size": 50, "query": {"match_all": {}}, "ignore_unavailable": True},
    )
    want = run_query_multi(
        [a, b], {"size": 50, "query": {"match_all": {}}}
    )
    assert (
        sorted((h["_index"], h["_id"]) for h in ok["hits"]["hits"])
        == sorted((h["_index"], h["_id"]) for h in want["hits"]["hits"])
    )
