"""Point-in-time (PIT) search contexts — the OpenSearch
``POST /<index>/_search/point_in_time`` analog.

OpenSearch keeps a PIT alive by refcounting the segment files that
were live when it was opened; later writes make new segments, the PIT
keeps reading the old ones. Here every index data file is immutable
and manifest-flipped (index/manifest.py), so the same guarantee is a
hardlink snapshot taken at open time (loader/snapshot.py — O(metadata)
on one filesystem): updates/deletes replace files via atomic rename,
which leaves the PIT's links pointing at the original inodes.

The PIT id is an opaque token (base64 of the snapshot path, matching
OpenSearch's opaque id contract). ``keep_alive`` is recorded for
bookkeeping; with no background reaper in-process, expiry is enforced
lazily at use time.
"""

from __future__ import annotations

import base64
import json
import os
import time

from .snapshot import create_snapshot, delete_snapshot

PITS_SUFFIX = ".pits"


def _pits_dir(index_dir: str) -> str:
    # OUTSIDE the index dir: snapshots and builds walking the index
    # tree must never recurse into live PIT contexts
    return os.path.normpath(index_dir) + PITS_SUFFIX


def open_pit(index_dir: str, keep_alive: str | None = None) -> dict:
    """Open a PIT over the index's current committed state. Returns
    ``{"pit_id": <opaque token>, "creation_time": epoch_ms}``."""
    repo = _pits_dir(index_dir)
    os.makedirs(repo, exist_ok=True)
    n = 1 + sum(1 for e in os.listdir(repo) if e.startswith("pit-"))
    name = f"pit-{n:08d}"
    create_snapshot(index_dir, repo, name)
    meta = {
        "keep_alive": keep_alive,
        "creation_time": int(time.time() * 1000),
    }
    with open(os.path.join(repo, name, "pit.json"), "w") as f:
        json.dump(meta, f)
    token = base64.urlsafe_b64encode(
        json.dumps({"repo": repo, "name": name}).encode()
    ).decode()
    return {"pit_id": token, "creation_time": meta["creation_time"]}


def _decode(pit_id: str) -> tuple[str, str]:
    d = json.loads(base64.urlsafe_b64decode(pit_id.encode()))
    return d["repo"], d["name"]


def pit_index_dir(pit_id: str) -> str:
    """The snapshot's mirrored index tree (readable by IndexReader)."""
    repo, name = _decode(pit_id)
    files = os.path.join(repo, name, "files")
    if not os.path.isdir(files):
        raise KeyError(f"no such point-in-time context: {name}")
    return files


def pit_reader(pit_id: str):
    from ..query.engine import IndexReader

    return IndexReader(pit_index_dir(pit_id))


def close_pit(pit_id: str) -> dict:
    """Release the context (``DELETE /_search/point_in_time``)."""
    repo, name = _decode(pit_id)
    pit_index_dir(pit_id)  # raises KeyError if already closed
    delete_snapshot(repo, name)
    return {"pits_deleted": [{"pit_id": pit_id, "successful": True}]}
