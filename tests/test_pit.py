"""Point-in-time search contexts (loader/pit.py): hardlink-snapshot
isolation against later updates, DSL integration, close semantics."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raybm25.loader.pit import close_pit, open_pit, pit_reader
from raybm25.loader.update import apply_updates
from raybm25.query.dsl import run_query
from raybm25.query.engine import IndexReader


@pytest.fixture()
def small_index(ray_session, tmp_path):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "text": [
                "merge join plan",
                "merge sort",
                "hash join",
                "table scan",
                "merge merge merge",
                "filter pushdown",
            ],
        }
    )
    src = str(tmp_path / "d.parquet")
    pq.write_table(tbl, src)
    from raybm25.index.build import build_index

    idx = str(tmp_path / "idx")
    build_index(
        src, idx, key_col="doc_id", id_col="doc_id", ts_col=None,
        num_buckets=2, postings_shards=4,
    )
    return idx


def test_pit_isolation_against_update(small_index):
    before = IndexReader(small_index).search("merge", k=10)
    pit = open_pit(small_index, keep_alive="1m")
    # clobber the strongest merge doc AFTER the PIT opened
    apply_updates(
        small_index,
        pa.table({"doc_id": pa.array([4], pa.int64()), "text": ["nothing here"]}),
        id_field="doc_id",
    )
    live = IndexReader(small_index).search("merge", k=10)
    assert 4 not in {d for d, _ in live}
    # the PIT still serves the pre-update state, scores identical
    assert pit_reader(pit["pit_id"]).search("merge", k=10) == before
    # DSL face: body carries the pit id, index argument is ignored
    resp = run_query(
        None,
        {
            "pit": {"id": pit["pit_id"]},
            "query": {"match": {"text": {"query": "merge"}}},
            "size": 10,
        },
    )
    assert [(h["_id"], h["_score"]) for h in resp["hits"]["hits"]] == before


def test_pit_close_and_double_close(small_index):
    pit = open_pit(small_index)
    assert pit_reader(pit["pit_id"]).n_docs == 6
    out = close_pit(pit["pit_id"])
    assert out["pits_deleted"][0]["successful"]
    with pytest.raises(KeyError):
        pit_reader(pit["pit_id"])
    with pytest.raises(KeyError):
        close_pit(pit["pit_id"])


def test_pit_ids_are_sequential_and_isolated(small_index):
    p1 = open_pit(small_index)
    apply_updates(
        small_index,
        pa.table({"doc_id": pa.array([0], pa.int64()), "text": ["changed one"]}),
        id_field="doc_id",
    )
    p2 = open_pit(small_index)
    assert p1["pit_id"] != p2["pit_id"]
    r1, r2 = pit_reader(p1["pit_id"]), pit_reader(p2["pit_id"])
    assert 0 in {d for d, _ in r1.search("plan", k=10)}
    assert 0 not in {d for d, _ in r2.search("plan", k=10)}
    assert 0 in {d for d, _ in r2.search("changed", k=10)}
    # pits live OUTSIDE the index dir: a later snapshot of the index
    # must not recurse into them
    assert not any(
        e.startswith("_pit") or e.endswith(".pits") for e in os.listdir(small_index)
    )


def test_sliced_scroll_disjoint_complete(small_index):
    """Slices partition the match set; per-slice order preserves the
    global score ranking; overflow hits carry across pages."""
    from raybm25.query.dsl import run_scroll

    r = IndexReader(small_index)
    full = r.search("merge join scan filter", k=100)
    seen = {}
    for sid in range(2):
        resp = run_scroll(
            r,
            body={
                "query": {"match": {"text": {"query": "merge join scan filter"}}},
                "size": 2,
                "slice": {"id": sid, "max": 2},
            },
        )
        ranks = []
        while resp["hits"]["hits"]:
            for h in resp["hits"]["hits"]:
                assert h["_id"] % 2 == sid
                assert h["_id"] not in seen
                seen[h["_id"]] = h["_score"]
                ranks.append(h["_id"])
            resp = run_scroll(r, scroll_id=resp["_scroll_id"])
        # within a slice, hits arrive in global rank order
        global_order = [d for d, _ in full if d % 2 == sid]
        assert ranks == global_order
    assert seen == dict(full)


def test_sliced_scroll_rejects_bad_slice(small_index):
    from raybm25.query.dsl import run_scroll

    with pytest.raises(ValueError):
        run_scroll(
            small_index,
            body={"query": {"match": {"text": "merge"}},
                  "slice": {"id": 3, "max": 2}},
        )
