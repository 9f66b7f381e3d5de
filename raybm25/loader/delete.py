"""Delete-by-id and delete-by-query index maintenance.

Reference analog: OpenSearch ``_delete_by_query`` / bulk ``delete``
actions (the loader's bulk API surface, opensearch_client.py) — here
rebuilt on the engine's two docstore layouts with their native
mechanisms:

- **hash layout**: affected bucket files are COMPACTED (matching rows
  dropped, ordinals re-densified, stats sidecar rewritten) by an
  actor-pool stage with the delete set broadcast once via ``ray.put``.
  Buckets without matches are detected from a doc_id-column-only read
  and never rewritten, so a touch-only ``rebuild_postings`` (partials
  checkpoints) re-tokenizes exactly the compacted buckets.
- **scan layout**: deletes are TOMBSTONES appended to the per-partition
  dead lists (the same mechanism the build's last-write-wins dedup
  uses, build_scan._WriteDeadList) — no docstore bytes move, ordinals
  stay stable (the keyidx keeps working), and
  ``rebuild_postings_scan``'s partials fingerprint covers the dead-list
  bytes, so only tombstoned partitions re-tokenize. This is Lucene's
  own delete model (deleted-docs bitmap + merge-time compaction).

Both paths finish with a postings rebuild that recommits corpus stats
from the per-partition sidecars, so n_docs / avgdl / BM25 idf reflect
the post-delete corpus exactly.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..index.build import (
    DOCS_STATS_SUBDIR,
    DOCS_SUBDIR,
    ORD_SHIFT,
    rebuild_postings,
)
from ..index.manifest import atomic_write_parquet, load_manifest
from ..util import auto_concurrency


class _DeleteFromBucket:
    """Actor-pool stage (hash layout): drop a broadcast doc_id set from
    docstore bucket files. The delete set is fetched from the object
    store ONCE per actor (``ray.get`` in ``__init__``), then each file
    pays a doc_id-column-only read to decide whether it must be
    rewritten at all."""

    def __init__(self, docs_dir: str, stats_dir: str, text_cols, prefix, ids_ref):
        import ray

        self.docs_dir = docs_dir
        self.stats_dir = stats_dir
        self.text_cols = tuple(text_cols)
        self.prefix = prefix
        self.ids = np.sort(np.asarray(ray.get(ids_ref), dtype=np.uint64))

    def _match(self, doc_ids: np.ndarray) -> np.ndarray:
        if self.ids.size == 0 or doc_ids.size == 0:
            return np.zeros(doc_ids.size, dtype=bool)
        pos = np.searchsorted(self.ids, doc_ids)
        pos_c = np.minimum(pos, self.ids.size - 1)
        return self.ids[pos_c] == doc_ids

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for b in batch.column("bucket").to_pylist():
            path = os.path.join(self.docs_dir, f"{self.prefix}={int(b):05d}.parquet")
            ids = (
                pq.read_table(path, columns=["doc_id"])
                .column("doc_id")
                .to_numpy(zero_copy_only=False)
                .astype(np.uint64)
            )
            hit = self._match(ids)
            n_hit = int(hit.sum())
            if n_hit == 0:
                out.append({"bucket": int(b), "deleted": 0, "rows": int(ids.size)})
                continue
            tbl = pq.read_table(path)
            kept = tbl.filter(pa.array(~hit))
            # re-densify ordinals: row position IS the ordinal low bits
            new_ord = (np.uint64(int(b)) << np.uint64(ORD_SHIFT)) | np.arange(
                kept.num_rows, dtype=np.uint64
            )
            kept = kept.set_column(
                kept.schema.get_field_index("ordinal"),
                "ordinal",
                pa.array(new_ord, pa.uint64()),
            )
            atomic_write_parquet(kept, path)
            sums = {
                col: int(
                    pc.sum(kept.column("dl" if i == 0 else f"dl_{col}")).as_py() or 0
                )
                for i, col in enumerate(self.text_cols)
            }
            stats = {
                "bucket": int(b),
                "rows": int(kept.num_rows),
                "sum_dl": sums[self.text_cols[0]],
                "sum_dl_fields": sums,
                "bytes": os.path.getsize(path),
            }
            spath = os.path.join(self.stats_dir, f"bucket={int(b):05d}.json")
            tmp = spath + f".tmp-{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(stats, f)
            os.replace(tmp, spath)
            out.append(
                {"bucket": int(b), "deleted": n_hit, "rows": int(kept.num_rows)}
            )
        return pa.Table.from_pylist(out)


class _TombstoneScanPart:
    """Actor-pool stage (scan layout): match the broadcast doc_id set
    against one docstore partition and append the matching LIVE
    ordinals to its dead-list sidecar (rows already tombstoned by the
    build's dedup don't count as deletions)."""

    def __init__(self, docs_dir: str, dead_dir: str, prefix, ids_ref):
        import ray

        self.docs_dir = docs_dir
        self.dead_dir = dead_dir
        self.prefix = prefix
        self.ids = np.sort(np.asarray(ray.get(ids_ref), dtype=np.uint64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for p in batch.column("bucket").to_pylist():
            path = os.path.join(self.docs_dir, f"{self.prefix}={int(p):05d}.parquet")
            t = pq.read_table(path, columns=["doc_id", "ordinal"])
            ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
            ords = t.column("ordinal").to_numpy(zero_copy_only=False).astype(np.uint64)
            if self.ids.size and ids.size:
                pos = np.searchsorted(self.ids, ids)
                pos_c = np.minimum(pos, self.ids.size - 1)
                hit = self.ids[pos_c] == ids
            else:
                hit = np.zeros(ids.size, dtype=bool)
            n = _append_dead(self.dead_dir, int(p), ords[hit])
            out.append({"bucket": int(p), "deleted": n, "rows": int(ids.size)})
        return pa.Table.from_pylist(out)


def _append_dead(dead_dir: str, pidx: int, ordinals: np.ndarray) -> int:
    """Merge ordinals into one partition's dead list; returns how many
    were NEWLY tombstoned."""
    if ordinals.size == 0:
        return 0
    os.makedirs(dead_dir, exist_ok=True)
    path = os.path.join(dead_dir, f"part={pidx:05d}.json")
    existing: set[int] = set()
    if os.path.exists(path):
        with open(path) as f:
            existing = set(json.load(f))
    fresh = [int(o) for o in np.unique(ordinals) if int(o) not in existing]
    if not fresh:
        return 0
    merged = sorted(existing | set(fresh))
    tmp = path + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(merged, f)
    os.replace(tmp, path)
    return len(fresh)


def _finish(man, index_dir: str, layout: str, rebuild: bool) -> None:
    if layout != "scan":
        man.data["phases"]["docs"]["input_fingerprint"] = None
    man.data["phases"]["docs"]["deletes_applied"] = (
        man.data["phases"]["docs"].get("deletes_applied", 0) + 1
    )
    man.commit()
    if rebuild:
        if layout == "scan":
            from ..index.build_scan import rebuild_postings_scan

            rebuild_postings_scan(index_dir)
        else:
            rebuild_postings(index_dir)


def delete_docs(index_dir: str, doc_ids, *, rebuild: bool = True) -> dict:
    """Delete documents by external id. Returns ``{"deleted": n,
    "missing": m}`` (missing = requested ids not present, counted like
    the update path's unknown keys)."""
    import ray
    import ray.data

    man = load_manifest(index_dir)
    if man is None or not man.data.get("phases", {}).get("docs", {}).get("committed"):
        raise FileNotFoundError(f"no committed index at {index_dir}")
    layout = man.data.get("layout", "hash")
    prefix = man.data.get("docstore_prefix", "bucket")
    text_cols = tuple(man.data.get("text_cols", ["text"]))
    docs_dir = os.path.join(index_dir, DOCS_SUBDIR)
    stats_dir = os.path.join(index_dir, DOCS_STATS_SUBDIR)

    ids = np.unique(np.asarray(list(doc_ids), dtype=np.uint64))
    buckets = sorted(
        int(fn.split("=")[1].split(".")[0])
        for fn in os.listdir(docs_dir)
        if fn.endswith(".parquet")
    )
    if ids.size == 0 or not buckets:
        return {"deleted": 0, "missing": int(ids.size)}
    ids_ref = ray.put(ids)
    ds = ray.data.from_items(
        [{"bucket": b} for b in buckets], override_num_blocks=len(buckets)
    )
    if layout == "scan":
        fn_kwargs = {
            "docs_dir": docs_dir,
            "dead_dir": os.path.join(index_dir, __import__("raybm25.index.build_scan", fromlist=["DEAD_SUBDIR"]).DEAD_SUBDIR),
            "prefix": prefix,
            "ids_ref": ids_ref,
        }
        cls = _TombstoneScanPart
    else:
        fn_kwargs = {
            "docs_dir": docs_dir,
            "stats_dir": stats_dir,
            "text_cols": text_cols,
            "prefix": prefix,
            "ids_ref": ids_ref,
        }
        cls = _DeleteFromBucket
    stats = ds.map_batches(
        cls,
        fn_constructor_kwargs=fn_kwargs,
        batch_format="pyarrow",
        concurrency=auto_concurrency(),
    ).to_pandas()
    deleted = int(stats["deleted"].sum()) if len(stats) else 0
    _finish(man, index_dir, layout, rebuild)
    return {"deleted": deleted, "missing": int(ids.size) - deleted}


def delete_by_query(
    index_dir: str, query: str | dict, field: str | None = None, *, rebuild: bool = True
) -> dict:
    """Delete every document matching a match query (OR over analyzed
    terms) — OpenSearch ``_delete_by_query`` semantics. The match set
    comes from the postings (winners only, so scan-layout tombstones
    are never double-counted); the per-partition mutation then follows
    the same layout-native flow as ``delete_docs``."""
    from ..query.engine import IndexReader

    r = IndexReader(index_dir)
    if isinstance(query, dict):
        # full DSL body ({"query": {...}} or a bare clause dict)
        from ..query.dsl import query_docset

        query = query_docset(r, query.get("query", query))
    cand = r._match_ordinals(query, field)
    if cand.size == 0:
        return {"deleted": 0, "missing": 0}
    man = load_manifest(index_dir)
    layout = man.data.get("layout", "hash")
    if layout == "scan":
        # ordinals already name (partition, row): tombstone directly,
        # one task per touched partition
        import ray
        import ray.data

        from ..index.build_scan import DEAD_SUBDIR

        dead_dir = os.path.join(index_dir, DEAD_SUBDIR)
        parts = (cand >> np.uint64(ORD_SHIFT)).astype(np.int64)
        tbl = pa.table(
            {"part": parts, "ordinal": cand.astype(np.uint64)}
        )
        ds = ray.data.from_arrow(tbl)

        def drop(g: pd.DataFrame) -> pd.DataFrame:
            p = int(g["part"].iloc[0])
            n = _append_dead(dead_dir, p, g["ordinal"].to_numpy().astype(np.uint64))
            return pd.DataFrame({"part": [p], "deleted": [n]})

        stats = ds.groupby("part").map_groups(drop, batch_format="pandas").to_pandas()
        deleted = int(stats["deleted"].sum()) if len(stats) else 0
        _finish(man, index_dir, layout, rebuild)
        return {"deleted": deleted, "missing": 0}
    ids = np.asarray(r._map_ordinals(cand), dtype=np.uint64)
    return delete_docs(index_dir, ids, rebuild=rebuild)
