"""Delete-by-id / delete-by-query on both layouts. The load-bearing
invariant: after delete + rebuild, every search is result-identical
(ids AND score bits) to a fresh build over the surviving corpus —
i.e. deletes fully leave the corpus statistics (n_docs, avgdl, df)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raybm25.index.build import build_index
from raybm25.index.build_scan import build_index_scan
from raybm25.loader.delete import delete_by_query, delete_docs
from raybm25.query.engine import IndexReader

DOCS = [
    (0, "merge join fast"),
    (1, "merge sort slow"),
    (2, "join stream window"),
    (3, "sort only tokens"),
    (4, "merge merge stream"),
    (5, "window stream join"),
    (6, "unrelated words here"),
    (7, "sort merge join"),
]
QUERIES = ["merge", "join stream", "sort merge", "window"]


def _write(tmp, rows, name="d.parquet"):
    p = str(tmp / name)
    pq.write_table(
        pa.table(
            {"doc_id": [i for i, _ in rows], "text": [t for _, t in rows]}
        ),
        p,
    )
    return p


def _build_hash(src, idx):
    build_index(src, idx, key_col="doc_id", id_col="doc_id", ts_col=None,
                num_buckets=3)
    return IndexReader(idx)


def test_delete_docs_hash_equals_fresh_build(ray_session, tmp_path):
    idx = str(tmp_path / "idx")
    r = _build_hash(_write(tmp_path, DOCS), idx)
    assert r.n_docs == len(DOCS)
    gone = [1, 4, 6]
    res = delete_docs(idx, gone)
    assert res == {"deleted": 3, "missing": 0}

    fresh_idx = str(tmp_path / "fresh")
    survivors = [d for d in DOCS if d[0] not in set(gone)]
    rf = _build_hash(_write(tmp_path, survivors, "f.parquet"), fresh_idx)

    r2 = IndexReader(idx)
    assert r2.n_docs == rf.n_docs == len(survivors)
    assert r2.avgdl == rf.avgdl
    for q in QUERIES:
        assert r2.search(q, k=10) == rf.search(q, k=10), q


def test_delete_docs_missing_counted(ray_session, tmp_path):
    idx = str(tmp_path / "idx")
    _build_hash(_write(tmp_path, DOCS), idx)
    res = delete_docs(idx, [3, 999, 1000])
    assert res == {"deleted": 1, "missing": 2}
    assert IndexReader(idx).n_docs == len(DOCS) - 1


def test_delete_by_query_hash(ray_session, tmp_path):
    idx = str(tmp_path / "idx")
    r = _build_hash(_write(tmp_path, DOCS), idx)
    n_sort = len({d for d, _ in r.search("sort", k=100)})
    res = delete_by_query(idx, "sort")
    assert res["deleted"] == n_sort == 3
    r2 = IndexReader(idx)
    assert r2.search("sort", k=10) == []
    survivors = [d for d in DOCS if "sort" not in d[1]]
    rf = _build_hash(
        _write(tmp_path, survivors, "f.parquet"), str(tmp_path / "fresh")
    )
    for q in QUERIES:
        assert r2.search(q, k=10) == rf.search(q, k=10), q


@pytest.fixture()
def scan_pair(ray_session, tmp_path):
    from raybm25.fixtures import make_pages

    pages = make_pages(n_rows=200, seed=5)
    src = str(tmp_path / "p.parquet")
    pq.write_table(pages, src)
    idx = str(tmp_path / "idx")
    build_index_scan(src, idx, key_col="url", ts_col="warc_ts",
                     extract_html=True, key_buckets=4)
    return src, idx, tmp_path


def test_delete_by_query_scan_tombstones(scan_pair):
    src, idx, tmp_path = scan_pair
    r = IndexReader(idx)
    # pick a real mid-frequency term from the dictionary
    d = r.term_dictionary()
    import pyarrow.parquet as _pq

    term = None
    for t in d.to_pylist():
        n = len(r.search(t, k=10_000))
        if 3 <= n <= 30:
            term = t
            break
    assert term is not None
    victims = {doc for doc, _ in r.search(term, k=10_000)}
    n0 = r.n_docs
    res = delete_by_query(idx, term)
    assert res["deleted"] == len(victims)
    r2 = IndexReader(idx)
    assert r2.search(term, k=10) == []
    assert r2.n_docs == n0 - len(victims)
    # tombstones: docstore bytes did not move (dead list carries them)
    from raybm25.index.build_scan import DEAD_SUBDIR

    assert os.path.isdir(os.path.join(idx, DEAD_SUBDIR))
    # surviving searches return no deleted doc and consistent stats
    for t in d.to_pylist()[:20]:
        assert not ({doc for doc, _ in r2.search(t, k=100)} & victims)


def test_delete_docs_scan_by_id(scan_pair):
    src, idx, tmp_path = scan_pair
    r = IndexReader(idx)
    # grab two live doc ids via a dictionary term's postings
    some = r.search(r.term_dictionary().to_pylist()[5], k=2)
    ids = [d for d, _ in some]
    assert ids
    n0 = r.n_docs
    res = delete_docs(idx, ids + [123456789])
    assert res["deleted"] == len(ids)
    assert res["missing"] == 1
    r2 = IndexReader(idx)
    assert r2.n_docs == n0 - len(ids)


def test_delete_touch_only_with_checkpoints(ray_session, tmp_path):
    """With partials checkpoints on, deleting docs from ONE bucket must
    re-tokenize only that bucket (checkpoint mtimes elsewhere stable)."""
    idx = str(tmp_path / "idx")
    build_index(_write(tmp_path, DOCS), idx, key_col="doc_id", id_col="doc_id",
                ts_col=None, num_buckets=3, checkpoint_partials=True)
    from raybm25.index.build import HASH_PARTIALS_SUBDIR

    pdir = os.path.join(idx, HASH_PARTIALS_SUBDIR)
    before = {f: os.path.getmtime(os.path.join(pdir, f))
              for f in os.listdir(pdir) if f.endswith(".parquet")}
    # doc 3 lives in bucket 3 % 3 = 0
    delete_docs(idx, [3])
    after = {f: os.path.getmtime(os.path.join(pdir, f))
             for f in os.listdir(pdir) if f.endswith(".parquet")}
    changed = {f for f in before if before[f] != after.get(f, -1)}
    assert len(changed) == 1, changed
    r = IndexReader(idx)
    assert 3 not in {d for d, _ in r.search("sort", k=10)}


def test_scan_tombstone_mget_visibility(scan_pair):
    """_mget / get_docs must not return tombstoned docs BEFORE a
    force_merge: the keyidx is only rewritten at merge time, so the
    dead lists gate point lookups (OpenSearch returns found: false
    immediately after a delete)."""
    import numpy as np

    from raybm25.query.dsl import run_mget

    src, idx, tmp_path = scan_pair
    r = IndexReader(idx)
    hits: list[int] = []
    for t in r.term_dictionary().to_pylist():
        hits = [d for d, _ in r.search(t, k=4)]
        if len(hits) >= 2:
            break
    assert len(hits) >= 2
    victim, survivor = hits[0], hits[1]
    delete_docs(idx, [victim])
    r2 = IndexReader(idx)
    resp = run_mget(r2, {"ids": [int(victim), int(survivor)]})
    assert resp["docs"][0]["found"] is False
    assert resp["docs"][1]["found"] is True
    got = r2.get_docs(np.array([victim, survivor], dtype=np.uint64))
    assert got.column("doc_id").to_pylist() == [survivor]


def test_delete_by_query_dsl_body(ray_session, tmp_path):
    """delete_by_query accepts a full DSL body: bool(match AND term)
    deletes exactly the filter-context set."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raybm25.index.build import build_index
    from raybm25.loader.delete import delete_by_query
    from raybm25.query.dsl import run_query

    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(10)),
                "text": [
                    ("alpha beta" if i % 2 else "gamma") for i in range(10)
                ],
                "lang": ["en" if i < 5 else "fr" for i in range(10)],
            }
        ),
        str(tmp_path / "d.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(str(tmp_path / "d.parquet"), idx, key_col="doc_id",
                id_col="doc_id", ts_col=None, text_cols=("text",),
                keyword_cols=("lang",), num_buckets=2)
    res = delete_by_query(
        idx,
        {"query": {"bool": {"must": [{"match": {"text": "alpha"}}],
                            "filter": [{"term": {"lang": "en"}}]}}},
    )
    # alpha docs: odd ids; en: ids < 5 -> {1, 3}
    assert res["deleted"] == 2
    left = run_query(idx, {"size": 100, "query": {"match_all": {}}})
    ids = sorted(int(h["_id"]) for h in left["hits"]["hits"])
    assert ids == [0, 2, 4, 5, 6, 7, 8, 9]
