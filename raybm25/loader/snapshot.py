"""Snapshot / restore: point-in-time copies of a built index (the
OpenSearch ``_snapshot`` repository API analog — the reference's
indexes live in a cluster that is snapshotted this way; here the
index IS a directory of immutable files, which makes snapshots
almost free).

Why this is cheap at 100 TB: every data file under an index dir is
written once via atomic rename and never modified in place (builds,
updates, force-merge all write NEW files and flip the manifest — see
index/manifest.py).  A snapshot is therefore:

- a hardlink of every committed file into the repository (O(metadata),
  no data copied on the same filesystem; falls back to copy across
  filesystems), plus
- the manifest.json captured at that instant (the point-in-time —
  exactly the visibility barrier readers already use).

Because filenames are content-addressed-per-build and files are
immutable, RE-snapshotting an updated index relinks unchanged files:
incremental snapshots by construction, the same property OpenSearch
repositories implement with segment files.  On object storage the
same design maps to manifest-copy + immutable object references.

Repository layout::

    repo/
      <name>/snapshot.json       {name, source, files, total_bytes}
      <name>/files/...           mirrored index tree

Restore refuses a non-empty destination (loud, not silently merged).
"""

from __future__ import annotations

import json
import os
import shutil

from ..index.manifest import MANIFEST_NAME, load_manifest

SNAP_META = "snapshot.json"


def _link_or_copy(src: str, dst: str) -> None:
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)


def _walk_files(root: str) -> list[str]:
    out = []
    for base, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".tmp"):
                continue
            out.append(os.path.relpath(os.path.join(base, f), root))
    return sorted(out)


def create_snapshot(index_dir: str, repo_dir: str, name: str) -> dict:
    """Hardlink-copy the index's committed state into ``repo_dir`` as
    snapshot ``name``.  Returns the snapshot metadata."""
    if load_manifest(index_dir) is None:
        raise ValueError(f"{index_dir!r} has no committed manifest")
    snap_dir = os.path.join(repo_dir, name)
    if os.path.exists(snap_dir):
        raise ValueError(f"snapshot {name!r} already exists")
    # stage under a temp name, then atomic-rename the whole snapshot
    # (single-writer assumption, same as the build's own commits)
    tmp_dir = snap_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    rels = _walk_files(index_dir)
    total = 0
    for rel in rels:
        src = os.path.join(index_dir, rel)
        _link_or_copy(src, os.path.join(tmp_dir, "files", rel))
        total += os.path.getsize(src)
    meta = {
        "name": name,
        "source": os.path.abspath(index_dir),
        "state": "SUCCESS",
        "n_files": len(rels),
        "total_bytes": total,
        "files": rels,
    }
    with open(os.path.join(tmp_dir, SNAP_META), "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    os.makedirs(repo_dir, exist_ok=True)
    os.replace(tmp_dir, snap_dir)
    return meta


def list_snapshots(repo_dir: str) -> list[dict]:
    out = []
    if not os.path.isdir(repo_dir):
        return out
    for name in sorted(os.listdir(repo_dir)):
        p = os.path.join(repo_dir, name, SNAP_META)
        if os.path.exists(p):
            with open(p) as f:
                m = json.load(f)
            out.append(
                {k: m[k] for k in ("name", "state", "n_files", "total_bytes")}
            )
    return out


def restore_snapshot(repo_dir: str, name: str, dest_dir: str) -> dict:
    """Materialize snapshot ``name`` at ``dest_dir`` (hardlinks where
    possible).  The destination must not already contain an index."""
    snap_dir = os.path.join(repo_dir, name)
    meta_path = os.path.join(snap_dir, SNAP_META)
    if not os.path.exists(meta_path):
        raise ValueError(f"no snapshot {name!r} in {repo_dir!r}")
    if os.path.isdir(dest_dir) and os.listdir(dest_dir):
        raise ValueError(f"restore destination {dest_dir!r} is not empty")
    with open(meta_path) as f:
        meta = json.load(f)
    for rel in meta["files"]:
        _link_or_copy(
            os.path.join(snap_dir, "files", rel),
            os.path.join(dest_dir, rel),
        )
    if load_manifest(dest_dir) is None:
        raise RuntimeError("restored index has no manifest — repo corrupt?")
    return meta


def delete_snapshot(repo_dir: str, name: str) -> None:
    snap_dir = os.path.join(repo_dir, name)
    if not os.path.exists(os.path.join(snap_dir, SNAP_META)):
        raise ValueError(f"no snapshot {name!r} in {repo_dir!r}")
    shutil.rmtree(snap_dir)


__all__ = [
    "create_snapshot",
    "restore_snapshot",
    "list_snapshots",
    "delete_snapshot",
    "MANIFEST_NAME",
]
