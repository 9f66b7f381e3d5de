"""Force-merge (tombstone compaction) for the scan layout.

Reference analog: OpenSearch ``POST /<index>/_forcemerge`` (Lucene
segment merging — the step that physically drops deleted docs). The
scan layout deletes with TOMBSTONES (loader/delete.py: dead-list
sidecars; docstore bytes never move), which is the right write-path
trade at 100 TB — but tombstones accumulate: a corpus at 30 % deletes
pays 30 % wasted docstore bytes and skipped-row scan work forever.
``force_merge`` reclaims that space:

- **Stage A** (one task per tombstoned partition): read the partition,
  drop dead rows, re-densify the ordinal column to
  ``(pidx << ORD_SHIFT) + new_row`` (ordinals are POSITIONAL — the
  reader's ``_map_ordinals`` indexes bucket files by row), atomic
  rewrite. Partitions with no tombstones are never touched.
- **Stage B** (one task per key-index bucket): remap ``keyidx``
  entries. The remap needs ONLY each partition's sorted dead-row list
  (broadcast once via ``ray.put``): a live row's new position is
  ``row - searchsorted(dead_rows, row)``, and entries pointing AT a
  dead row (docs deleted after the index was built) are dropped.
  Shuffle volume ≈ dead-list bytes, not docstore bytes.
- Dead-list sidecars for merged partitions are removed, the manifest
  commits, and ``rebuild_postings_scan`` re-tokenizes EXACTLY the
  rewritten partitions (its partials fingerprint covers the docstore
  file + dead-list bytes), recommitting corpus stats.

Corpus stats and search results are invariant under force_merge (dead
rows were already excluded from postings and stats); what changes is
the storage/scan footprint. At 100 TB, run per-partition-range waves
(the stages are per-partition tasks; nothing global is held) rather
than one cluster-wide sweep.

The hash layout compacts eagerly on delete (loader/delete.py
``_DeleteFromBucket``), so force_merge is a documented no-op there.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..index.build import DOCS_SUBDIR, ORD_MASK, ORD_SHIFT
from ..index.manifest import atomic_write_parquet, load_manifest
from ..util import auto_concurrency


class _CompactPart:
    """Stage A actor: drop a partition's dead rows and re-densify its
    ordinal column. The dead map ({pidx: sorted dead ROW indices}) is
    fetched from the object store once per actor."""

    def __init__(self, docs_dir: str, prefix: str, dead_ref):
        import ray

        self.docs_dir = docs_dir
        self.prefix = prefix
        self.dead = ray.get(dead_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for p in batch.column("bucket").to_pylist():
            pidx = int(p)
            path = os.path.join(self.docs_dir, f"{self.prefix}={pidx:05d}.parquet")
            tbl = pq.read_table(path, use_threads=False)
            rows = (
                tbl.column("ordinal").to_numpy(zero_copy_only=False).astype(np.uint64)
                & np.uint64(ORD_MASK)
            ).astype(np.int64)
            dead = self.dead[pidx]
            pos = np.minimum(np.searchsorted(dead, rows), dead.size - 1)
            keep = dead[pos] != rows
            live = tbl.filter(pa.array(keep))
            new_ord = (np.uint64(pidx) << np.uint64(ORD_SHIFT)) + np.arange(
                live.num_rows, dtype=np.uint64
            )
            live = live.set_column(
                live.schema.get_field_index("ordinal"),
                "ordinal",
                pa.array(new_ord, pa.uint64()),
            )
            atomic_write_parquet(live, path)
            out.append(
                {
                    "bucket": pidx,
                    "live_rows": int(live.num_rows),
                    "reclaimed": int(tbl.num_rows - live.num_rows),
                }
            )
        return pa.Table.from_pylist(out)


class _RemapKeyidx:
    """Stage B actor: rewrite one keyidx bucket's ordinals against the
    broadcast dead map. Entries whose target row is dead are dropped
    (the doc was deleted); live entries shift down by the number of
    dead rows before them. doc_id sort order is position-invariant
    under both operations."""

    def __init__(self, keyidx_dir: str, dead_ref):
        import ray

        self.keyidx_dir = keyidx_dir
        self.dead = ray.get(dead_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for kb in batch.column("kb").to_pylist():
            path = os.path.join(self.keyidx_dir, f"kb={int(kb):05d}.parquet")
            tbl = pq.read_table(path, use_threads=False)
            ords = (
                tbl.column("ordinal").to_numpy(zero_copy_only=False).astype(np.uint64)
            )
            buckets = (ords >> np.uint64(ORD_SHIFT)).astype(np.int64)
            rows = (ords & np.uint64(ORD_MASK)).astype(np.int64)
            keep = np.ones(ords.size, dtype=bool)
            new_rows = rows.copy()
            touched = False
            for pidx, dead in self.dead.items():
                m = buckets == pidx
                if not m.any():
                    continue
                touched = True
                r = rows[m]
                pos = np.searchsorted(dead, r)
                is_dead = (pos < dead.size) & (dead[np.minimum(pos, dead.size - 1)] == r)
                keep[m] &= ~is_dead
                # live rows shift down by the dead rows before them
                new_rows[m] = r - pos
            dropped = int((~keep).sum())
            if touched:
                new_ord = (
                    buckets.astype(np.uint64) << np.uint64(ORD_SHIFT)
                ) + new_rows.astype(np.uint64)
                tbl = tbl.set_column(
                    tbl.schema.get_field_index("ordinal"),
                    "ordinal",
                    pa.array(new_ord, pa.uint64()),
                ).filter(pa.array(keep))
                atomic_write_parquet(tbl, path)
            out.append(
                {
                    "kb": int(kb),
                    "remapped": int(tbl.num_rows) if touched else 0,
                    "dropped": dropped,
                }
            )
        return pa.Table.from_pylist(out)


def force_merge(index_dir: str, *, rebuild: bool = True) -> dict:
    """Physically reclaim tombstoned rows of a scan-layout index.

    Returns ``{"merged_partitions", "reclaimed_rows",
    "dropped_keyidx_entries"}``. No-op (all zeros) on the hash layout
    (it compacts on delete) and when no partition has tombstones.
    ``rebuild=False`` skips the postings rebuild — the index is NOT
    searchable until ``rebuild_postings_scan`` runs (postings still
    reference pre-merge ordinals); use it only to batch several
    maintenance ops before one rebuild, exactly like
    ``delete_docs(rebuild=False)``."""
    import ray
    import ray.data

    from ..index.build_scan import DEAD_SUBDIR, KEYIDX_SUBDIR, rebuild_postings_scan

    man = load_manifest(index_dir)
    if man is None or not man.data.get("phases", {}).get("docs", {}).get("committed"):
        raise FileNotFoundError(f"no committed index at {index_dir}")
    if man.data.get("layout") != "scan":
        return {
            "merged_partitions": 0,
            "reclaimed_rows": 0,
            "dropped_keyidx_entries": 0,
        }
    prefix = man.data.get("docstore_prefix", "part")
    docs_dir = os.path.join(index_dir, DOCS_SUBDIR)
    dead_dir = os.path.join(index_dir, DEAD_SUBDIR)
    keyidx_dir = os.path.join(index_dir, KEYIDX_SUBDIR)

    dead_map: dict[int, np.ndarray] = {}
    if os.path.isdir(dead_dir):
        for fn in sorted(os.listdir(dead_dir)):
            if not fn.endswith(".json"):
                continue
            pidx = int(fn.split("=")[1].split(".")[0])
            with open(os.path.join(dead_dir, fn)) as f:
                ords = np.asarray(json.load(f), dtype=np.uint64)
            if ords.size:
                dead_map[pidx] = np.sort(
                    (ords & np.uint64(ORD_MASK)).astype(np.int64)
                )
    if not dead_map:
        return {
            "merged_partitions": 0,
            "reclaimed_rows": 0,
            "dropped_keyidx_entries": 0,
        }

    dead_ref = ray.put(dead_map)
    parts = sorted(dead_map)
    part_stats = (
        ray.data.from_items(
            [{"bucket": p} for p in parts], override_num_blocks=len(parts)
        )
        .map_batches(
            _CompactPart,
            fn_constructor_kwargs={
                "docs_dir": docs_dir,
                "prefix": prefix,
                "dead_ref": dead_ref,
            },
            batch_format="pyarrow",
            concurrency=auto_concurrency(),
        )
        .to_pandas()
    )
    kbs = sorted(
        int(fn.split("=")[1].split(".")[0])
        for fn in os.listdir(keyidx_dir)
        if fn.endswith(".parquet")
    )
    kb_stats = (
        ray.data.from_items([{"kb": b} for b in kbs], override_num_blocks=len(kbs))
        .map_batches(
            _RemapKeyidx,
            fn_constructor_kwargs={"keyidx_dir": keyidx_dir, "dead_ref": dead_ref},
            batch_format="pyarrow",
            concurrency=auto_concurrency(),
        )
        .to_pandas()
    )
    for p in parts:
        os.remove(os.path.join(dead_dir, f"part={p:05d}.json"))
    ph = man.phase("docs")
    ph["force_merges"] = ph.get("force_merges", 0) + 1
    man.commit()
    if rebuild:
        rebuild_postings_scan(index_dir)
    return {
        "merged_partitions": int(len(part_stats)),
        "reclaimed_rows": int(part_stats["reclaimed"].sum()),
        "dropped_keyidx_entries": int(kb_stats["dropped"].sum()),
    }
