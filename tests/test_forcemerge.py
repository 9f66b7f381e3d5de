"""force_merge (scan-layout tombstone compaction, the _forcemerge
analog): search invariance, keyidx remap, storage reclamation."""

import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from raybm25.fixtures import make_pages
from raybm25.index.build_scan import DEAD_SUBDIR, build_index_scan
from raybm25.loader.delete import delete_docs
from raybm25.loader.forcemerge import force_merge
from raybm25.query.engine import IndexReader


@pytest.fixture()
def merged_idx(ray_session, tmp_path):
    """Scan index with both kinds of tombstones: build-time dedup
    losers (make_pages plants dup urls) and post-build deletes."""
    pages = make_pages(n_rows=300, seed=9)
    src = str(tmp_path / "p.parquet")
    pq.write_table(pages, src)
    idx = str(tmp_path / "idx")
    build_index_scan(
        src, idx, key_col="url", ts_col="warc_ts", extract_html=True, key_buckets=4
    )
    r = IndexReader(idx)
    # delete a handful of live docs by id (pick a term with >= 3 hits)
    victims: list[int] = []
    for t in r.term_dictionary().to_pylist():
        hits = [d for d, _ in r.search(t, k=8)]
        if len(hits) >= 3:
            victims = hits[:4]
            break
    assert victims
    res = delete_docs(idx, victims)
    assert res["deleted"] == len(victims)
    return idx, victims


def _dead_rows(idx: str) -> int:
    dead_dir = os.path.join(idx, DEAD_SUBDIR)
    total = 0
    if os.path.isdir(dead_dir):
        for fn in os.listdir(dead_dir):
            if fn.endswith(".json"):
                with open(os.path.join(dead_dir, fn)) as f:
                    total += len(json.load(f))
    return total


def _docstore_rows(idx: str) -> int:
    docs_dir = os.path.join(idx, "docs")
    return sum(
        pq.read_metadata(os.path.join(docs_dir, f)).num_rows
        for f in os.listdir(docs_dir)
        if f.endswith(".parquet")
    )


def test_force_merge_reclaims_and_preserves_search(merged_idx):
    idx, victims = merged_idx
    r0 = IndexReader(idx)
    n0 = r0.n_docs
    avgdl0 = r0.avgdl
    terms = r0.term_dictionary().to_pylist()[:40]
    before = {t: r0.search(t, k=1000) for t in terms}
    tombstones = _dead_rows(idx)
    # single-file builds dedup in-file (losers never reach the dead
    # lists), so tombstones here are exactly the post-build deletes
    assert tombstones >= len(victims)
    rows_before = _docstore_rows(idx)

    stats = force_merge(idx)
    assert stats["merged_partitions"] >= 1
    assert stats["reclaimed_rows"] == tombstones
    assert stats["dropped_keyidx_entries"] == len(victims)

    # tombstones physically gone: docstore shrank by exactly the dead
    # rows and every dead-list sidecar was consumed
    assert _docstore_rows(idx) == rows_before - tombstones
    assert _dead_rows(idx) == 0

    # search results (ids AND scores) and corpus stats are invariant
    r1 = IndexReader(idx)
    assert r1.n_docs == n0
    assert r1.avgdl == pytest.approx(avgdl0, abs=1e-12)
    assert _docstore_rows(idx) == n0
    for t in terms:
        assert r1.search(t, k=1000) == before[t], t


def test_force_merge_keyidx_lookup_after_remap(merged_idx):
    idx, victims = merged_idx
    r0 = IndexReader(idx)
    # a surviving doc fetched through the keyidx (two-hop scan lookup)
    live = [d for d, _ in r0.search(r0.term_dictionary().to_pylist()[10], k=3)]
    assert live
    force_merge(idx)
    r1 = IndexReader(idx)
    got = r1.get_docs(np.array(live, dtype=np.uint64))
    assert set(got.column("doc_id").to_pylist()) == set(live)
    # deleted docs are gone from the keyidx: point lookups miss
    gone = r1.get_docs(np.array(victims, dtype=np.uint64))
    assert gone.num_rows == 0


def test_force_merge_idempotent_and_hash_noop(merged_idx, tmp_path):
    idx, _ = merged_idx
    force_merge(idx)
    again = force_merge(idx)
    assert again == {
        "merged_partitions": 0,
        "reclaimed_rows": 0,
        "dropped_keyidx_entries": 0,
    }
    # hash layout: compacts on delete, force_merge is a documented no-op
    from raybm25.index.build import build_index

    import pyarrow as pa

    hsrc = str(tmp_path / "h.parquet")
    pq.write_table(
        pa.table({"doc_id": [1, 2], "text": ["alpha beta", "gamma"]}), hsrc
    )
    hidx = str(tmp_path / "hidx")
    build_index(hsrc, hidx, key_col="doc_id", id_col="doc_id", ts_col=None,
                num_buckets=2)
    assert force_merge(hidx)["merged_partitions"] == 0


def test_force_merge_reclaims_cross_file_dedup_losers(ray_session, tmp_path):
    """Cross-file duplicate urls become build-time dead-list losers
    (in-file dups dedup during stage 1, cross-file ones via stage 2/3);
    force_merge physically reclaims them and the LWW winner's text
    survives."""
    import pyarrow as pa

    t1 = pa.table(
        {
            "url": ["u/a", "u/b", "u/c"],
            "warc_ts": [1, 1, 1],
            "text": ["old alpha words", "beta words", "gamma words"],
        }
    )
    t2 = pa.table(
        {
            "url": ["u/a", "u/d"],
            "warc_ts": [2, 1],  # u/a re-crawled later: this one wins
            "text": ["new alpha words", "delta words"],
        }
    )
    pq.write_table(t1, str(tmp_path / "f1.parquet"))
    pq.write_table(t2, str(tmp_path / "f2.parquet"))
    idx = str(tmp_path / "idx")
    build_index_scan(
        [str(tmp_path / "f1.parquet"), str(tmp_path / "f2.parquet")],
        idx,
        key_col="url",
        ts_col="warc_ts",
        key_buckets=2,
    )
    r0 = IndexReader(idx)
    assert r0.n_docs == 4
    assert _dead_rows(idx) == 1  # the superseded u/a row
    rows_before = _docstore_rows(idx)
    assert rows_before == 5

    stats = force_merge(idx)
    assert stats["reclaimed_rows"] == 1
    assert stats["dropped_keyidx_entries"] == 0  # loser never had one

    r1 = IndexReader(idx)
    assert r1.n_docs == 4 and _docstore_rows(idx) == 4
    # the WINNING (ts=2) text is the one still indexed
    assert len(r1.search("new", k=10)) == 1
    assert r1.search("old", k=10) == []


def test_updates_through_remapped_keyidx(ray_session, tmp_path):
    """apply_updates joins via the keyidx; after force_merge the
    remapped ordinals must still resolve the right docstore rows."""
    import pyarrow as pa

    from raybm25.loader.update import apply_updates

    t = pa.table(
        {
            "url": [f"u{i}" for i in range(8)],
            "warc_ts": [1] * 8,
            "text": [f"doc {i} alpha words here" for i in range(8)],
        }
    )
    pq.write_table(t, str(tmp_path / "f.parquet"))
    idx = str(tmp_path / "idx")
    build_index_scan(str(tmp_path / "f.parquet"), idx, key_col="url",
                     ts_col="warc_ts", key_buckets=2)
    from raybm25.hashing import hash64

    r0 = IndexReader(idx)
    keep = int(hash64(np.array(["u3"], dtype=object))[0])
    victims = [d for d, _ in r0.search("doc", k=100) if d != keep][:2]
    assert len(victims) == 2
    delete_docs(idx, victims)
    force_merge(idx)

    res = apply_updates(
        idx, pa.table({"url": ["u3"], "text": ["doc 3 REWRITTEN omega"]}), "url"
    )
    assert res["updated"] == 1 and res["missing"] == 0
    r1 = IndexReader(idx)
    assert len(r1.search("omega", k=10)) == 1
    assert len(r1.search("rewritten", k=10)) == 1


def test_forcemerge_cli(ray_session, tmp_path, capsys):
    """CLI subcommand: build scan -> delete -> forcemerge JSON stats."""
    import pyarrow as pa

    from raybm25.__main__ import main as cli_main

    src = tmp_path / "p.parquet"
    pq.write_table(
        pa.table(
            {
                "url": [f"u{i}" for i in range(12)],
                "warc_ts": [1] * 12,
                "text": [
                    f"doc {i} spamword here" if i < 3 else f"doc {i} clean text"
                    for i in range(12)
                ],
            }
        ),
        str(src),
    )
    idx = str(tmp_path / "idx")
    build_index_scan(str(src), idx, key_col="url", ts_col="warc_ts",
                     key_buckets=2)
    from raybm25.loader.delete import delete_by_query

    assert delete_by_query(idx, "spamword")["deleted"] == 3
    rc = cli_main(["forcemerge", "--index", idx])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["reclaimed_rows"] == 3
    assert out["dropped_keyidx_entries"] == 3
    r = IndexReader(idx)
    assert r.n_docs == 9
    assert r.search("spamword", k=10) == []


def test_force_merge_empty_partition(ray_session, tmp_path):
    """A partition whose every row is tombstoned compacts to an empty
    (schema-preserving) file; the rebuild and searches stay correct."""
    import pyarrow as pa

    from raybm25.loader.delete import delete_by_query

    pq.write_table(
        pa.table({"url": [f"a{i}" for i in range(6)], "warc_ts": [1] * 6,
                  "text": [f"keep alpha {i}" for i in range(6)]}),
        str(tmp_path / "f1.parquet"),
    )
    pq.write_table(
        pa.table({"url": [f"b{i}" for i in range(4)], "warc_ts": [1] * 4,
                  "text": [f"zap beta {i}" for i in range(4)]}),
        str(tmp_path / "f2.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index_scan(
        [str(tmp_path / "f1.parquet"), str(tmp_path / "f2.parquet")],
        idx, key_col="url", ts_col="warc_ts", key_buckets=2,
    )
    delete_by_query(idx, "zap")
    stats = force_merge(idx)
    assert stats["reclaimed_rows"] == 4
    assert stats["dropped_keyidx_entries"] == 4
    assert _docstore_rows(idx) == 6
    r = IndexReader(idx)
    assert r.n_docs == 6
    assert r.search("zap", k=10) == []
    assert len(r.search("keep", k=10)) == 6
