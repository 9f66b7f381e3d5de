"""Matching-document export (the OpenSearch ``_reindex`` / sliced
``scroll`` idiom): stream every doc matching a query out of the index
into partitioned parquet, one output file per docstore partition.

Shape at 100 TB: the match set is computed once from the postings
(winners only), broadcast via ``ray.put``, and each docstore partition
is handled by its own task that SLICES the sorted ordinal set down to
its own ordinal range with two searchsorted probes — a task touches
only its partition's bytes plus an 8-byte/match shared array. Output
filenames are deterministic (``part=N.parquet``), so a re-run after a
failure skips finished partitions (resumable, never one giant file).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..index.build import DOCS_SUBDIR, ORD_MASK, ORD_SHIFT
from ..index.manifest import atomic_write_parquet, load_manifest
from ..util import auto_concurrency


class _ExportPart:
    """Actor-pool stage: take one docstore partition's matching rows
    (by ordinal) and write them to the export dir."""

    def __init__(self, docs_dir, out_dir, prefix, columns, ords_ref):
        import ray

        self.docs_dir = docs_dir
        self.out_dir = out_dir
        self.prefix = prefix
        self.columns = columns
        # sorted uint64 ordinals, fetched once per actor
        self.ords = np.asarray(ray.get(ords_ref), dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for b in batch.column("bucket").to_pylist():
            dest = os.path.join(self.out_dir, f"part={int(b):05d}.parquet")
            if os.path.exists(dest):  # resume: partition already done
                out.append(
                    {"bucket": int(b), "rows": pq.read_metadata(dest).num_rows,
                     "skipped": True}
                )
                continue
            lo = np.uint64(int(b)) << np.uint64(ORD_SHIFT)
            hi = lo | np.uint64(ORD_MASK)
            i = int(np.searchsorted(self.ords, lo, side="left"))
            j = int(np.searchsorted(self.ords, hi, side="right"))
            rows = (self.ords[i:j] & np.uint64(ORD_MASK)).astype(np.int64)
            if rows.size == 0:
                out.append({"bucket": int(b), "rows": 0, "skipped": False})
                continue
            path = os.path.join(
                self.docs_dir, f"{self.prefix}={int(b):05d}.parquet"
            )
            tbl = pq.read_table(path, columns=self.columns)
            atomic_write_parquet(tbl.take(rows), dest)
            out.append({"bucket": int(b), "rows": int(rows.size), "skipped": False})
        return pa.Table.from_pylist(out)


def export_matching(
    index_dir: str,
    out_dir: str,
    query: str | dict | None = None,
    field: str | None = None,
    columns: list[str] | None = None,
) -> dict:
    """Export docs matching ``query`` (OR over analyzed terms; ``None``
    = the whole live corpus) to partitioned parquet under ``out_dir``.
    Returns ``{"exported": n, "partitions": p}``."""
    import ray
    import ray.data

    from ..query.engine import IndexReader

    man = load_manifest(index_dir)
    if man is None or not man.data.get("phases", {}).get("docs", {}).get("committed"):
        raise FileNotFoundError(f"no committed index at {index_dir}")
    prefix = man.data.get("docstore_prefix", "bucket")
    docs_dir = os.path.join(index_dir, DOCS_SUBDIR)

    r = IndexReader(index_dir)
    if isinstance(query, dict):
        from ..query.dsl import query_docset

        query = query_docset(r, query.get("query", query))
    if query is None:
        # live corpus = every ordinal the postings can reach; for the
        # full-export case the per-partition row sets are dense, so ship
        # a per-bucket "all rows" marker instead of a giant array
        ords = None
    else:
        ords = r._match_ordinals(query, field)
        if ords.size == 0:
            os.makedirs(out_dir, exist_ok=True)
            return {"exported": 0, "partitions": 0}

    buckets = sorted(
        int(fn.split("=")[1].split(".")[0])
        for fn in os.listdir(docs_dir)
        if fn.endswith(".parquet")
    )
    os.makedirs(out_dir, exist_ok=True)
    if ords is None:
        # full export: per-partition straight copy minus tombstones
        from ..index.build_scan import DEAD_SUBDIR

        dead_dir = os.path.join(index_dir, DEAD_SUBDIR)

        def copy_part(batch: pa.Table) -> pa.Table:
            import json

            rows_out = []
            for b in batch.column("bucket").to_pylist():
                dest = os.path.join(out_dir, f"part={int(b):05d}.parquet")
                if os.path.exists(dest):
                    rows_out.append(
                        {"bucket": int(b),
                         "rows": pq.read_metadata(dest).num_rows,
                         "skipped": True}
                    )
                    continue
                path = os.path.join(docs_dir, f"{prefix}={int(b):05d}.parquet")
                tbl = pq.read_table(path, columns=columns)
                dpath = os.path.join(dead_dir, f"part={int(b):05d}.json")
                if os.path.exists(dpath):
                    with open(dpath) as f:
                        dead = set(json.load(f))
                    live = pq.read_table(path, columns=["ordinal"]).column(
                        "ordinal"
                    ).to_numpy(zero_copy_only=False)
                    keep = np.array([int(o) not in dead for o in live])
                    tbl = tbl.filter(pa.array(keep))
                atomic_write_parquet(tbl, dest)
                rows_out.append(
                    {"bucket": int(b), "rows": tbl.num_rows, "skipped": False}
                )
            return pa.Table.from_pylist(rows_out)

        stats = (
            ray.data.from_items(
                [{"bucket": b} for b in buckets], override_num_blocks=len(buckets)
            )
            .map_batches(copy_part, batch_format="pyarrow")
            .to_pandas()
        )
    else:
        ords_ref = ray.put(np.sort(ords.astype(np.uint64)))
        stats = (
            ray.data.from_items(
                [{"bucket": b} for b in buckets], override_num_blocks=len(buckets)
            )
            .map_batches(
                _ExportPart,
                fn_constructor_kwargs={
                    "docs_dir": docs_dir,
                    "out_dir": out_dir,
                    "prefix": prefix,
                    "columns": columns,
                    "ords_ref": ords_ref,
                },
                batch_format="pyarrow",
                concurrency=auto_concurrency(),
            )
            .to_pandas()
        )
    return {
        "exported": int(stats["rows"].sum()) if len(stats) else 0,
        "partitions": int((stats["rows"] > 0).sum()) if len(stats) else 0,
    }


def update_by_query(
    index_dir: str,
    query: str | dict,
    set_values: dict | None = None,
    id_field: str = "doc_id",
    field: str | None = None,
    script: str | None = None,
) -> dict:
    """OpenSearch ``_update_by_query``: set ``set_values`` constants
    and/or run a painless-subset ``script`` of
    ``ctx._source.<f> = <expr>`` assignments on every doc matching the
    query. The matched docs' id column is gathered from the docstore,
    an updates table is built (constants broadcast; script expressions
    evaluated vectorized over one gather per referenced column), and
    the existing co-partitioned ``apply_updates`` flow does the merge +
    postings refresh.  A script result that is integral keeps an
    integer source column integer; fractional results promote the
    column to float64."""
    import numpy as np

    from ..query.engine import IndexReader
    from .update import apply_updates

    if not set_values and not script:
        raise ValueError("update_by_query needs set_values and/or script")
    r = IndexReader(index_dir)
    if isinstance(query, dict):
        from ..query.dsl import query_docset

        query = query_docset(r, query.get("query", query))
    cand = r._match_ordinals(query, field)
    if cand.size == 0:
        return {"updated": 0, "missing": 0, "skipped_no_id": 0}
    keys = r._gather_column(cand, id_field)
    cols: dict = {id_field: pa.array(keys.tolist())}
    for k, v in (set_values or {}).items():
        cols[k] = pa.array([v] * cand.size)
    if script:
        from ..query.script import compile_update_script

        for tgt, compiled in compile_update_script(script):
            src_vals = {
                fn: r._gather_column(cand, fn).astype(np.float64)
                for fn in compiled.fields
            }
            out = compiled(np.zeros(cand.size, dtype=np.float64), src_vals)
            was_int = all(
                np.issubdtype(r._gather_column(cand, fn).dtype, np.integer)
                for fn in compiled.fields
            ) if compiled.fields else False
            if was_int and np.all(out == np.floor(out)):
                cols[tgt] = pa.array(out.astype(np.int64), pa.int64())
            else:
                cols[tgt] = pa.array(out, pa.float64())
    return apply_updates(index_dir, pa.table(cols), id_field)
