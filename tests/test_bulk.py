"""_bulk endpoint adapter: index (replace), create, update (partial
merge, document_missing benign), delete (not_found), falsy-id skip,
one postings rebuild per batch — the reference's entire write path
(opensearch_client.py bulk_upsert/bulk_update) as one endpoint."""

import numpy as np
import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.loader.bulk import run_bulk
from raybm25.query.engine import IndexReader


def _fresh_index(tmp_path, name="idx"):
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": ["alpha beta", "beta gamma", "delta epsilon"],
                "lang": ["en", "de", "en"],
            }
        ),
        str(tmp_path / "d.parquet"),
    )
    idx = str(tmp_path / name)
    build_index(
        str(tmp_path / "d.parquet"),
        idx,
        key_col="doc_id",
        id_col="doc_id",
        ts_col=None,
        keyword_cols=("lang",),
        stored_cols=["text", "lang"],
        num_buckets=2,
    )
    return idx


def test_bulk_mixed_batch(ray_session, tmp_path):
    idx = _fresh_index(tmp_path)
    res = run_bulk(
        idx,
        [
            {"index": {"_id": 4}}, {"text": "zeta eta", "lang": "fr"},      # create
            {"index": {"_id": 1}}, {"text": "alpha prime", "lang": "en"},   # replace
            {"update": {"_id": 2}}, {"doc": {"lang": "fr"}},                # merge
            {"delete": {"_id": 3}},                                         # delete
            {"update": {"_id": 99}}, {"doc": {"lang": "xx"}},               # missing
        ],
    )
    assert res["created"] == 1 and res["deleted"] == 1
    by_op = [next(iter(it.items())) for it in res["items"]]
    assert by_op[0] == ("index", {"_id": 4, "result": "created", "status": 201})
    assert by_op[1] == ("index", {"_id": 1, "result": "updated", "status": 200})
    assert by_op[2] == ("update", {"_id": 2, "result": "updated", "status": 200})
    assert by_op[3] == ("delete", {"_id": 3, "result": "deleted", "status": 200})
    assert by_op[4][1]["result"] == "document_missing"
    # document_missing is a documented-benign no-op (the reference
    # counts it as a skip, not a failure): errors stays False
    assert res["errors"] is False

    r = IndexReader(idx)

    def has(term, d):
        return d in [i for i, _ in r.search(term, k=10)]

    # replace removed the old tokens for doc 1
    assert not has("beta", 1)
    assert has("prime", 1)
    # partial update merged lang, kept text
    assert 2 in np.asarray(r.term_docs("lang", "fr")).tolist()
    assert has("gamma", 2)
    # deleted doc gone from postings; new doc searchable
    assert not has("delta", 3)
    assert has("zeta", 4)
    assert r.n_docs == 3  # 3 - 1 deleted + 1 created


def test_bulk_create_conflict_and_not_found(ray_session, tmp_path):
    idx = _fresh_index(tmp_path)
    res = run_bulk(
        idx,
        [
            {"create": {"_id": 1}}, {"text": "nope"},
            {"delete": {"_id": 42}},
        ],
    )
    ops = [next(iter(it.items())) for it in res["items"]]
    assert ops[0][1]["status"] == 409 and ops[0][1]["result"] == "version_conflict"
    assert ops[1][1] == {"_id": 42, "result": "not_found", "status": 404}
    # version_conflict is a genuine failure (flips errors); the 404
    # delete not_found alone would not
    assert res["errors"] is True
    # conflict left the original doc untouched
    assert 1 in [d for d, _ in IndexReader(idx).search("alpha", k=10)]


def test_bulk_falsy_id_skipped(ray_session, tmp_path):
    idx = _fresh_index(tmp_path)
    res = run_bulk(idx, [{"index": {"_id": None}}, {"text": "ghost"}])
    assert res["skipped"] == 1
    assert IndexReader(idx).n_docs == 3


def test_bulk_duplicate_id_rejected(ray_session, tmp_path):
    idx = _fresh_index(tmp_path)
    with pytest.raises(ValueError, match="more than once"):
        run_bulk(
            idx,
            [
                {"index": {"_id": 5}}, {"text": "a"},
                {"delete": {"_id": 5}},
            ],
        )


def test_bulk_matches_sequential_ops(ray_session, tmp_path):
    """The grouped batch equals the same operations applied one at a
    time through the native APIs (bit-identical search results)."""
    from raybm25.loader.delete import delete_docs
    from raybm25.loader.update import apply_updates, merge_document

    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    a = _fresh_index(tmp_path / "a")
    b = _fresh_index(tmp_path / "b")

    run_bulk(
        a,
        [
            {"index": {"_id": 7}}, {"text": "new seven", "lang": "en"},
            {"update": {"_id": 2}}, {"doc": {"text": "beta updated"}},
            {"delete": {"_id": 3}},
        ],
    )
    merge_document(b, 7, {"text": "new seven", "lang": "en"})
    apply_updates(
        b,
        pa.table({"doc_id": [2], "text": ["beta updated"]}),
        "doc_id",
    )
    delete_docs(b, [3])

    ra, rb = IndexReader(a), IndexReader(b)
    assert ra.n_docs == rb.n_docs
    for q in ("beta", "seven", "updated", "alpha"):
        assert ra.search(q, k=10) == rb.search(q, k=10)
