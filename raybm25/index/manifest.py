"""Index manifest: atomic visibility commits + per-partition lineage.

Plays the role of OpenSearch's ``refresh`` barrier (SURVEY.md §2 S12 /
B10, citing opensearch_client.py:126-133): readers only see state the
manifest has committed. Commits are atomic ``os.replace`` of a JSON
file; each phase records per-partition lineage (rows, bytes, input
fingerprint) so a rerun can skip completed work (north rule:
"resumable from checkpoint with per-partition lineage + metrics").
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any

MANIFEST_NAME = "manifest.json"


@dataclass
class Manifest:
    index_dir: str
    data: dict[str, Any] = field(default_factory=dict)

    @property
    def path(self) -> str:
        return os.path.join(self.index_dir, MANIFEST_NAME)

    def commit(self) -> None:
        """Atomic visibility barrier: temp write + rename."""
        os.makedirs(self.index_dir, exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.data, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)

    def phase(self, name: str) -> dict[str, Any]:
        return self.data.setdefault("phases", {}).setdefault(name, {})

    def phase_committed(self, name: str, fingerprint: Any = None) -> bool:
        ph = self.data.get("phases", {}).get(name, {})
        if not ph.get("committed"):
            return False
        if fingerprint is not None and ph.get("input_fingerprint") != fingerprint:
            return False
        return True


def load_manifest(index_dir: str) -> Manifest | None:
    path = os.path.join(index_dir, MANIFEST_NAME)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return Manifest(index_dir, json.load(f))


def atomic_write_parquet(
    table, dest_path: str, row_group_size: int | None = None, stats_cols: list[str] | None = None
) -> None:
    """Write a parquet file atomically (tmp + rename) — deterministic
    destination filenames make Ray task retries idempotent (SURVEY.md §4
    'write idempotency'). ``row_group_size`` controls predicate-pushdown
    granularity for sorted files (postings shards use small groups so a
    term filter decodes only its row groups)."""
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(dest_path), exist_ok=True)
    tmp = dest_path + f".tmp-{os.getpid()}"
    kwargs = {}
    if row_group_size:
        kwargs["row_group_size"] = row_group_size
    if stats_cols is not None:
        # statistics on large binary columns bloat footers and slow
        # every filtered read; keep stats only on the filter keys
        kwargs["write_statistics"] = stats_cols
    pq.write_table(table, tmp, **kwargs)
    os.replace(tmp, dest_path)


def parquet_fingerprint(paths: list[str] | str) -> list[list]:
    """Cheap input lineage: (path, size, mtime_ns) per file."""
    if isinstance(paths, str):
        paths = [paths]
    out = []
    for p in sorted(paths):
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                for fn in sorted(files):
                    if fn.endswith(".parquet"):
                        fp = os.path.join(root, fn)
                        st = os.stat(fp)
                        out.append([fp, st.st_size, st.st_mtime_ns])
        else:
            st = os.stat(p)
            out.append([p, st.st_size, st.st_mtime_ns])
    return out
