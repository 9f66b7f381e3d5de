"""Snapshot / restore: point-in-time isolation, hardlink-incremental
repository, refusal paths and the CLI subcommand."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raybm25.index.build import build_index
from raybm25.loader.snapshot import (
    create_snapshot,
    delete_snapshot,
    list_snapshots,
    restore_snapshot,
)
from raybm25.loader.update import apply_updates
from raybm25.query.engine import IndexReader


def _build(tmp_path, n=8):
    src = tmp_path / "d.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(n)),
                "text": [f"doc number {i} merge" for i in range(n)],
                "lang": ["en"] * n,
            }
        ),
        str(src),
    )
    idx = str(tmp_path / "idx")
    build_index(str(src), idx, key_col="doc_id", id_col="doc_id",
                ts_col=None, keyword_cols=("lang",),
                stored_cols=["text", "lang"], num_buckets=2)
    return idx


def test_snapshot_restore_identical_search(ray_session, tmp_path):
    idx = _build(tmp_path)
    repo = str(tmp_path / "repo")
    meta = create_snapshot(idx, repo, "s1")
    assert meta["state"] == "SUCCESS" and meta["n_files"] > 0
    dest = str(tmp_path / "restored")
    restore_snapshot(repo, "s1", dest)
    a = IndexReader(idx).search("merge", k=10)
    b = IndexReader(dest).search("merge", k=10)
    assert a == b


def test_point_in_time_isolation(ray_session, tmp_path):
    """Mutating the live index after the snapshot must not leak into a
    restore — the OpenSearch snapshot contract."""
    idx = _build(tmp_path)
    repo = str(tmp_path / "repo")
    create_snapshot(idx, repo, "before")
    before = IndexReader(idx).search("merge", k=10)
    upd = tmp_path / "u.parquet"
    pq.write_table(
        pa.table({"doc_id": [0], "text": ["rewritten entirely zzz"]}),
        str(upd),
    )
    apply_updates(idx, str(upd), id_field="doc_id")
    after = IndexReader(idx).search("zzz", k=10)
    assert after  # live index sees the update
    dest = str(tmp_path / "restored")
    restore_snapshot(repo, "before", dest)
    r = IndexReader(dest)
    assert r.search("zzz", k=10) == []
    assert r.search("merge", k=10) == before


def test_incremental_hardlinks(ray_session, tmp_path):
    """Unchanged files are hardlinked, not copied: same inode in repo
    and index; a second snapshot links again (incremental)."""
    idx = _build(tmp_path)
    repo = str(tmp_path / "repo")
    create_snapshot(idx, repo, "s1")
    create_snapshot(idx, repo, "s2")
    probe = None
    for base, _d, files in os.walk(os.path.join(idx, "postings")):
        for f in files:
            probe = os.path.join(base, f)
            break
    assert probe
    rel = os.path.relpath(probe, idx)
    i0 = os.stat(probe).st_ino
    assert os.stat(os.path.join(repo, "s1", "files", rel)).st_ino == i0
    assert os.stat(os.path.join(repo, "s2", "files", rel)).st_ino == i0


def test_list_delete_and_refusals(ray_session, tmp_path):
    idx = _build(tmp_path)
    repo = str(tmp_path / "repo")
    create_snapshot(idx, repo, "a")
    with pytest.raises(ValueError):
        create_snapshot(idx, repo, "a")  # duplicate name
    with pytest.raises(ValueError):
        create_snapshot(str(tmp_path / "nothere"), repo, "b")  # no manifest
    names = [s["name"] for s in list_snapshots(repo)]
    assert names == ["a"]
    dest = str(tmp_path / "restored")
    restore_snapshot(repo, "a", dest)
    with pytest.raises(ValueError):
        restore_snapshot(repo, "a", dest)  # non-empty destination
    with pytest.raises(ValueError):
        restore_snapshot(repo, "zz", str(tmp_path / "x"))
    delete_snapshot(repo, "a")
    assert list_snapshots(repo) == []
    with pytest.raises(ValueError):
        delete_snapshot(repo, "a")


def test_snapshot_cli(ray_session, tmp_path, capsys):
    from raybm25.__main__ import main as cli_main

    idx = _build(tmp_path)
    repo = str(tmp_path / "repo")
    assert cli_main(["snapshot", "create", "--repo", repo, "--name", "s",
                     "--index", idx]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["state"] == "SUCCESS" and "files" not in out
    assert cli_main(["snapshot", "list", "--repo", repo]) == 0
    assert json.loads(capsys.readouterr().out.strip())[0]["name"] == "s"
    dest = str(tmp_path / "restored")
    assert cli_main(["snapshot", "restore", "--repo", repo, "--name", "s",
                     "--index", dest]) == 0
    capsys.readouterr()
    assert IndexReader(dest).search("merge", k=3)
