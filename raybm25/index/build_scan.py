"""Scan-layout index build: the corpus text NEVER shuffles.

The hash-bucket build (build.py) implements the reference's strict
upsert semantics with a full-corpus groupby — correct, but the text
bytes cross the exchange. At 100 TB that shuffle is the dominant cost
and, on a fixed-size cluster, the bandwidth that limits scaling. This
module builds the same index (same postings, same BM25 results, same
dedup winners) while shuffling ONLY keys:

  stage 1  one task per input file: read -> extract -> doc ids ->
           in-file dedup -> sort by doc_id -> write docs/part=N.parquet
           (ordinal = N << 40 | row) -> return KEYS (doc_id, ts,
           text_hash, ordinal)                       [no text moves]
  stage 2  keys.groupby(doc_id % KB): winner per doc_id =
           max (ts, text_hash, ordinal)  — last-write-wins with a
           deterministic content tie-break — writes the key index
           keyidx/kb=M.parquet (doc_id -> winning ordinal; powers
           point lookups + update joins) and emits LOSER ordinals
  stage 3  losers.groupby(part): dead-list sidecar per partition
  stage 4  one task per part: read docs/part + dead list, drop dead
           rows, tokenize ONCE, emit packed partial postings
  stage 5  groupby(shard): merge + encode + write shard files
           (identical to the hash-bucket path)

Shuffle volume: stages 2/3 move ~32 bytes/doc; stage 5 moves packed
postings. Resume lineage is per input file (stage 1 skips parts whose
docstore file already exists with matching fingerprint), and with
``checkpoint_partials=True`` stage 4 is ALSO per-partition resumable
(packed partials persisted under partials/ with content fingerprints)
— "resumable from per-partition checkpoints" in the north-rule sense
for both the extract and the tokenize phases.

Trade-off vs the hash layout: point lookups go through the key index
(doc_id -> ordinal -> partition) instead of hashing straight to a
bucket, and updates must join via that index. The loader builds
parquet sources on THIS layout (runner.py routes them here so spec-
driven builds never shuffle text), including sayt-enabled mappings
(the expansion is per-doc and runs inside stage 4); only inline/model
sources use the hash layout.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from .. import BM25_B, BM25_K1
from ..analysis import (
    ANALYZER_VERSION,
    TOKEN_RE,
    analyzer_version,
    arrow_tokenize,
    filter_tokens_np,
)
from ..extract import extract_column_hashed
from ..hashing import HASH_IMPL, hash64
from .build import (
    build_partials_codes,
    sayt_partials,
    DOCS_STATS_SUBDIR,
    DOCS_SUBDIR,
    ORD_SHIFT,
    POSTINGS_SUBDIR,
    _MergeShard,
    _commit_build,
    build_partials,
)
from .manifest import Manifest, atomic_write_parquet, load_manifest

KEYIDX_SUBDIR = "keyidx"
DEAD_SUBDIR = "dead"
PARTIALS_SUBDIR = "partials"


class _ScanExtractWrite:
    """Stage 1: one input file -> one docstore partition + its keys."""

    def __init__(
        self,
        docs_dir: str,
        key_col: str,
        id_col: str | None,
        ts_col: str | None,
        text_col: str,
        extract_html: bool,
        stored_cols: list[str] | None,
    ):
        self.docs_dir = docs_dir
        self.key_col = key_col
        self.id_col = id_col
        self.ts_col = ts_col
        self.text_col = text_col
        self.extract_html = extract_html
        self.stored_cols = stored_cols

    def _fingerprint(self, path: str) -> list:
        st = os.stat(path)
        return [path, st.st_size, st.st_mtime_ns]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_keys = []
        for path, pidx in zip(
            batch.column("path").to_pylist(), batch.column("pidx").to_pylist()
        ):
            dest = os.path.join(self.docs_dir, f"part={pidx:05d}.parquet")
            fp_path = dest + ".src.json"
            fp = self._fingerprint(path)
            if os.path.exists(dest) and os.path.exists(fp_path):
                with open(fp_path) as f:
                    if json.load(f) == fp:
                        # per-partition resume: partition already built
                        # from this exact input file — recover its keys
                        # from the columnar store (no text read)
                        kcols = ["doc_id", "ordinal", "texth"] + (
                            [self.ts_col] if self.ts_col else []
                        )
                        kt = pq.read_table(dest, columns=kcols, use_threads=False)
                        # pure-Arrow keys (metadata-free schema: blocks
                        # with pandas metadata are unhashable and defeat
                        # Ray's schema dedup in every reduce task)
                        out_keys.append(
                            pa.table(
                                {
                                    "doc_id": kt.column("doc_id"),
                                    "ordinal": kt.column("ordinal"),
                                    "__texth": kt.column("texth"),
                                    "ts": (
                                        kt.column(self.ts_col)
                                        if self.ts_col
                                        else pa.array(
                                            np.zeros(kt.num_rows, np.int64), pa.int64()
                                        )
                                    ),
                                }
                            )
                        )
                        continue
            cols = None  # prune at the read
            if self.stored_cols is not None:
                cols = sorted(
                    {self.key_col, *(self.stored_cols)}
                    | ({"html"} if self.extract_html else {self.text_col})
                    | ({self.ts_col} if self.ts_col else set())
                    | ({self.id_col} if self.id_col else set())
                )
            tbl = pq.read_table(path, columns=cols, use_threads=False)
            # Arrow-native throughout: no pandas round-trip, and the
            # corpus text stays BYTES end-to-end (byte-level extractor,
            # bytes-keyed siphash, binary->string cast) — allocator and
            # memory-bus churn here was the measured single-node
            # scaling limiter (VERDICT r2 #7).
            if self.extract_html:
                text_arr, th = extract_column_hashed(tbl.column("html"))
                drop = ["html"] + (
                    [self.text_col] if self.text_col in tbl.column_names else []
                )
                tbl = tbl.drop_columns(drop).append_column(self.text_col, text_arr)
            else:
                tcol = tbl.column(self.text_col)
                if tcol.null_count:
                    import pyarrow.compute as pc

                    tcol = pc.fill_null(tcol, "")
                # hash the utf-8 bytes (same siphash values as the str
                # path) — skips per-row str decode. NOT a buffer-level
                # numpy hash: that was measured 100x slower than the C
                # siphash kernel (see extract.extract_column_hashed).
                th = hash64(
                    np.array(tcol.cast(pa.binary()).to_pylist(), dtype=object)
                )
            if self.id_col is not None:
                doc_id = (
                    tbl.column(self.id_col)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.uint64)
                )
            else:
                doc_id = hash64(
                    tbl.column(self.key_col).to_numpy(zero_copy_only=False)
                )
            if self.ts_col:
                ts = tbl.column(self.ts_col).to_numpy(zero_copy_only=False)
            else:
                ts = np.zeros(len(doc_id), dtype=np.int64)
            # lexsort compares datetime64 (NaT last, numpy >= 1.18 —
            # pandas parity), numerics and object/string dtypes natively;
            # no int64 reinterpretation (an object or 4-byte ts column
            # would crash a .view, and NaT would flip to sort first)
            # stable sort by (doc_id, ts, texth); in-file dedup keeps the
            # LAST row per doc_id (last write wins locally; cross-file
            # duplicates resolve via the dead-list stages)
            order = np.lexsort((th, ts, doc_id))
            sorted_ids = doc_id[order]
            last_in_run = np.empty(len(order), dtype=bool)
            if len(order):
                last_in_run[:-1] = sorted_ids[1:] != sorted_ids[:-1]
                last_in_run[-1] = True
            kept = order[last_in_run]
            doc_id, th, ts = doc_id[kept], th[kept], ts[kept]
            ordinal = (np.uint64(pidx) << np.uint64(ORD_SHIFT)) + np.arange(
                len(kept), dtype=np.uint64
            )
            store = tbl.take(pa.array(kept))
            # replace, not duplicate, columns the source already carries
            # (e.g. an integer id column literally named "doc_id")
            clash = [c for c in ("doc_id", "texth", "ordinal") if c in store.column_names]
            if clash:
                store = store.drop_columns(clash)
            store = (
                store.append_column("doc_id", pa.array(doc_id, pa.uint64()))
                .append_column("texth", pa.array(th, pa.uint64()))
                .append_column("ordinal", pa.array(ordinal, pa.uint64()))
            )
            keys_tbl = pa.table(
                {
                    "doc_id": pa.array(doc_id, pa.uint64()),
                    "ordinal": pa.array(ordinal, pa.uint64()),
                    "__texth": pa.array(th, pa.uint64()),
                    "ts": pa.array(ts),
                }
            )
            atomic_write_parquet(store, dest)
            tmp = fp_path + f".tmp-{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(fp, f)
            os.replace(tmp, fp_path)
            out_keys.append(keys_tbl)
        return (
            pa.concat_tables(out_keys)
            if out_keys
            else pa.table(
                {
                    "doc_id": pa.array([], pa.uint64()),
                    "ordinal": pa.array([], pa.uint64()),
                    "__texth": pa.array([], pa.uint64()),
                    "ts": pa.array([], pa.int64()),
                }
            )
        )


class _ResolveWinners:
    """Stage 2: per key-bucket winner resolution + key-index write.

    Winner = max (ts, text_hash, ordinal) per doc_id — last-write-wins
    by timestamp with a deterministic content/position tie-break.
    Emits the LOSER ordinals (they become dead-list entries)."""

    def __init__(self, keyidx_dir: str, num_kb: int):
        self.__name__ = "ResolveWinners"
        self.keyidx_dir = keyidx_dir
        self.num_kb = num_kb

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        kb = int(g["__kb"].iloc[0])
        g = g.sort_values(["doc_id", "ts", "__texth", "ordinal"], kind="mergesort")
        winners = g.drop_duplicates("doc_id", keep="last")
        losers = g.loc[~g["ordinal"].isin(winners["ordinal"]), "ordinal"]
        idx = winners[["doc_id", "ordinal"]].sort_values("doc_id")
        atomic_write_parquet(
            pa.Table.from_pandas(idx, preserve_index=False),
            os.path.join(self.keyidx_dir, f"kb={kb:05d}.parquet"),
        )
        return pd.DataFrame({"dead_ordinal": losers.to_numpy().astype(np.uint64)})


class _TokenizePart:
    """Stage 4: one docstore partition -> packed partial postings
    (skipping dead rows), plus the partition stats sidecar.

    ``partials_dir`` (opt-in, ``checkpoint_partials=True`` on the
    build): each partition's packed partials are also persisted to
    ``partials/part=N.parquet`` with a content fingerprint (docstore
    file stat + dead-list bytes), and a matching checkpoint SKIPS the
    tokenize entirely — per-partition resume for the expensive phase.
    Costs one extra write+read of the packed partials; intended for
    long cluster builds where a mid-build crash would otherwise lose
    hours of tokenize work."""

    def __init__(
        self,
        docs_dir: str,
        dead_dir: str,
        stats_dir: str,
        text_cols: tuple[str, ...],
        keyword_cols: tuple[str, ...],
        range_shift: int,
        num_shards: int,
        sayt_cols: tuple[str, ...] = (),
        partials_dir: str | None = None,
        positions: bool = False,
        analyzer: dict | None = None,
    ):
        self.analyzer = analyzer
        self.docs_dir = docs_dir
        self.dead_dir = dead_dir
        self.stats_dir = stats_dir
        self.text_cols = text_cols
        self.keyword_cols = keyword_cols
        self.range_shift = range_shift
        self.num_shards = num_shards
        self.sayt_cols = sayt_cols
        self.partials_dir = partials_dir
        self.positions = positions
        self.findall = TOKEN_RE.findall

    def _fingerprint(self, pidx: int) -> list:
        import hashlib

        st = os.stat(os.path.join(self.docs_dir, f"part={pidx:05d}.parquet"))
        dead_path = os.path.join(self.dead_dir, f"part={pidx:05d}.json")
        if os.path.exists(dead_path):
            with open(dead_path, "rb") as f:
                dead_sig = hashlib.sha256(f.read()).hexdigest()
        else:
            dead_sig = ""
        # the positions flag is part of the partials' identity: toggling
        # it must invalidate checkpoints even when the docstore is intact
        return [st.st_size, st.st_mtime_ns, dead_sig, bool(self.positions)]

    def _checkpoint_load(self, pidx: int):
        """Partials parquet for this partition if its fingerprint (and
        the stats sidecar) are current, else None."""
        if self.partials_dir is None:
            return None
        dest = os.path.join(self.partials_dir, f"part={pidx:05d}.parquet")
        fp_path = dest + ".src.json"
        spath = os.path.join(self.stats_dir, f"bucket={pidx:05d}.json")
        if not (os.path.exists(dest) and os.path.exists(fp_path) and os.path.exists(spath)):
            return None
        try:
            with open(fp_path) as f:
                if json.load(f) != self._fingerprint(pidx):
                    return None
        except (OSError, json.JSONDecodeError):
            return None
        return pq.read_table(dest, use_threads=False)

    def _checkpoint_store(self, pidx: int, tbl: pa.Table) -> None:
        if self.partials_dir is None:
            return
        dest = os.path.join(self.partials_dir, f"part={pidx:05d}.parquet")
        atomic_write_parquet(tbl, dest)
        tmp = dest + f".src.json.tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(self._fingerprint(pidx), f)
        os.replace(tmp, dest + ".src.json")

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tables = []
        for pidx in batch.column("pidx").to_pylist():
            got = self._checkpoint_load(pidx)
            if got is not None:
                tables.append(got)
                continue
            path = os.path.join(self.docs_dir, f"part={pidx:05d}.parquet")
            cols = ["ordinal", *self.text_cols, *self.keyword_cols]
            tbl = pq.read_table(path, columns=cols, use_threads=False)
            dead_path = os.path.join(self.dead_dir, f"part={pidx:05d}.json")
            if os.path.exists(dead_path):
                with open(dead_path) as f:
                    dead = pa.array(np.array(json.load(f), dtype=np.uint64), pa.uint64())
                keep = pc.invert(pc.is_in(tbl.column("ordinal"), value_set=dead))
                tbl = tbl.filter(keep)
            # stay in Arrow end-to-end: no pandas round-trip, no Python
            # token strings (allocator contention under 32-way load)
            ordinals = tbl.column("ordinal").to_numpy(zero_copy_only=False).astype(np.uint64)
            part_tables = []
            sums: dict[str, int] = {}
            kw_vals = {
                c: (
                    tbl.column(c).to_pylist()
                    if c in tbl.column_names
                    else [None] * tbl.num_rows
                )
                for c in self.keyword_cols
            }
            for fi, col in enumerate(self.text_cols):
                texts = (
                    tbl.column(col)
                    if col in tbl.column_names
                    else pa.nulls(tbl.num_rows, pa.string())
                )
                tid, terms, doc_pos, dl = arrow_tokenize(texts)
                tid, terms, doc_pos, dl = filter_tokens_np(
                    tid, terms, doc_pos, dl, self.analyzer
                )
                sums[col] = int(dl.sum())
                part_tables.append(
                    build_partials_codes(
                        ordinals,
                        dl,
                        tid,
                        terms,
                        doc_pos,
                        kw_vals if fi == 0 else {},
                        self.range_shift,
                        self.num_shards,
                        term_prefix=None if fi == 0 else col,
                        positions=self.positions,
                    )
                )
                if col in self.sayt_cols:
                    # search_as_you_type expansion (SURVEY B3), the one
                    # shared vectorized implementation (build.py
                    # sayt_partials): shingle/prefix terms join the same
                    # partials shuffle; no text moves (VERDICT r2 #4).
                    part_tables.append(
                        sayt_partials(
                            col, ordinals, tid, terms, doc_pos,
                            self.range_shift, self.num_shards,
                            positions=self.positions,
                        )
                    )
            stats = {
                "bucket": int(pidx),
                "rows": int(tbl.num_rows),
                "sum_dl": sums[self.text_cols[0]],
                "sum_dl_fields": sums,
                "bytes": os.path.getsize(path),
            }
            os.makedirs(self.stats_dir, exist_ok=True)
            spath = os.path.join(self.stats_dir, f"bucket={int(pidx):05d}.json")
            tmp = spath + f".tmp-{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(stats, f)
            os.replace(tmp, spath)
            part_tbl = pa.concat_tables(part_tables)
            self._checkpoint_store(pidx, part_tbl)
            tables.append(part_tbl)
        return pa.concat_tables(tables)


class _WriteDeadList:
    """Stage 3: one dead-list sidecar per docstore partition, written by
    a groupby(part) task (VERDICT r1 #8: at 100 TB the loser set is
    dup-rate x corpus keys — it must not funnel through the driver)."""

    def __init__(self, dead_dir: str):
        self.__name__ = "WriteDeadList"
        self.dead_dir = dead_dir

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["__part"].iloc[0])
        vals = sorted(int(o) for o in g["dead_ordinal"].to_numpy().astype(np.uint64))
        path = os.path.join(self.dead_dir, f"part={part:05d}.json")
        tmp = path + f".tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(vals, f)
        os.replace(tmp, path)
        return pd.DataFrame({"part": [part], "n_dead": [len(vals)]})


def _write_dead_lists(losers_ds, dead_dir: str) -> int:
    """Distributed stage-3 driver: shuffle loser ordinals (8 bytes each)
    by their partition and write each partition's sidecar in its own
    task. Returns the total dead count (one tiny row per partition
    reaches the driver)."""
    os.makedirs(dead_dir, exist_ok=True)

    def attach_part(t: pa.Table) -> pa.Table:
        ords = t.column("dead_ordinal").to_numpy(zero_copy_only=False).astype(np.uint64)
        # metadata-free schema (pandas metadata from the upstream
        # map_groups would make reduce-side schema dedup fall back to
        # full unification per task)
        return t.replace_schema_metadata(None).append_column(
            "__part",
            pa.array((ords >> np.uint64(ORD_SHIFT)).astype(np.int32), pa.int32()),
        )

    stats = (
        losers_ds.map_batches(attach_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(_WriteDeadList(dead_dir), batch_format="pandas")
        .to_pandas()
    )
    return int(stats["n_dead"].sum()) if len(stats) else 0


def _committed_and_current(index_dir: str, paths: list[str]) -> dict | None:
    """Full-skip checkpoint: a committed scan index whose input file
    list AND per-partition source fingerprints all match the current
    inputs needs no work at all (the hash layout's input_fingerprint
    fast path, expressed with the scan layout's per-file lineage)."""
    man = load_manifest(index_dir)
    if (
        man is None
        or man.data.get("layout") != "scan"
        or not man.phase_committed("docs")
        or not man.phase_committed("postings")
        or man.data.get("input_files") != paths
        or man.data.get("phases", {}).get("docs", {}).get("updates_applied")
    ):
        return None
    docs_dir = os.path.join(index_dir, DOCS_SUBDIR)
    for i, p in enumerate(paths):
        part_path = os.path.join(docs_dir, f"part={i:05d}.parquet")
        if not os.path.exists(part_path):  # sidecar without its partition
            return None
        try:
            with open(part_path + ".src.json") as f:
                st = os.stat(p)
                if json.load(f) != [p, st.st_size, st.st_mtime_ns]:
                    return None
        except OSError:
            return None
    metrics = {
        "index_dir": index_dir,
        "layout": "scan",
        "build_phase": "skipped (checkpoint)",
    }
    metrics.update(man.data["corpus"])
    metrics["n_postings"] = man.data["phases"]["postings"]["n_postings"]
    metrics["docs_per_sec"] = float("inf")
    return metrics


def build_index_scan(
    paths: list[str] | str,
    index_dir: str,
    *,
    key_col: str = "url",
    id_col: str | None = None,
    ts_col: str | None = "warc_ts",
    text_cols: tuple[str, ...] = ("text",),
    extract_html: bool = False,
    keyword_cols: tuple[str, ...] = (),
    sayt_cols: tuple[str, ...] = (),
    stored_cols: list[str] | None = None,
    postings_shards: int = 64,
    range_parts: int = 16,
    key_buckets: int = 64,
    k1: float = BM25_K1,
    b: float = BM25_B,
    overwrite: bool = False,
    checkpoint_partials: bool = False,
    positions: bool = False,
    analyzer: dict | None = None,
) -> dict:
    """Scan-layout build over a list of parquet files (or a directory).

    One docstore partition per input file; text never shuffles. Returns
    a metrics dict. ``range_parts``: doc-range salt granularity, in
    input-file units (hot terms split into ~n_files/range_parts
    segments). ``checkpoint_partials``: also persist each partition's
    packed partials with a content fingerprint so a crash in the
    postings phase resumes without re-tokenizing finished partitions
    (opt-in: costs one extra write+read of the packed partials —
    worthwhile on long cluster builds, off for benchmarks)."""
    t0 = time.perf_counter()
    if isinstance(paths, str):
        if os.path.isdir(paths):
            root = paths
            paths = sorted(
                os.path.join(root, f) for f in os.listdir(root) if f.endswith(".parquet")
            )
        else:
            paths = [paths]
    paths = sorted(paths)
    if not paths:
        raise ValueError("no input parquet files")

    if not overwrite:
        skipped = _committed_and_current(index_dir, paths)
        if skipped is not None:
            skipped["total_secs"] = time.perf_counter() - t0
            return skipped

    if overwrite and os.path.isdir(index_dir):
        if os.path.exists(os.path.join(index_dir, "manifest.json")) or not os.listdir(index_dir):
            shutil.rmtree(index_dir)
        else:
            raise ValueError(f"refusing to overwrite non-index directory {index_dir}")

    docs_dir = os.path.join(index_dir, DOCS_SUBDIR)
    stats_dir = os.path.join(index_dir, DOCS_STATS_SUBDIR)
    postings_dir = os.path.join(index_dir, POSTINGS_SUBDIR)
    keyidx_dir = os.path.join(index_dir, KEYIDX_SUBDIR)
    dead_dir = os.path.join(index_dir, DEAD_SUBDIR)
    # docs partitions are per-input-file checkpoints: kept across runs
    # (stage 1 skips files whose fingerprint matches); derived state is
    # rebuilt every run
    for d in (stats_dir, postings_dir, keyidx_dir, dead_dir):
        if os.path.isdir(d):
            shutil.rmtree(d)
        os.makedirs(d, exist_ok=True)
    os.makedirs(docs_dir, exist_ok=True)
    partials_dir = None
    if checkpoint_partials:
        # partials checkpoints survive across runs like docs partitions
        # (fingerprints invalidate them when docstore/dead-lists change)
        partials_dir = os.path.join(index_dir, PARTIALS_SUBDIR)
        os.makedirs(partials_dir, exist_ok=True)

    rp_bits = max(0, (max(1, range_parts) - 1).bit_length())
    range_shift = ORD_SHIFT + rp_bits
    man = Manifest(
        index_dir,
        {
            "version": 2,
            "layout": "scan",
            "analyzer": analyzer_version(analyzer),
            "analyzer_spec": analyzer,
            "hash_impl": HASH_IMPL,
            "k1": k1,
            "b": b,
            "num_buckets": len(paths),  # docstore partitions
            "docstore_prefix": "part",
            "key_buckets": key_buckets,
            "num_shards": postings_shards,
            "range_shift": range_shift,
            "n_ranges": ((len(paths) - 1) >> rp_bits) + 1,
            "key_col": key_col,
            "id_is_int": id_col is not None,
            "text_cols": list(text_cols),
            "keyword_cols": list(keyword_cols),
            "sayt_cols": list(sayt_cols),
            "checkpoint_partials": bool(checkpoint_partials),
            "positions": bool(positions),
            "input_files": paths,
        },
    )

    items = [{"path": p, "pidx": i} for i, p in enumerate(paths)]
    files_ds = ray.data.from_items(items, override_num_blocks=len(items))

    # stages 1-2: partition writes + keys-only winner resolution
    keys = files_ds.map_batches(
        _ScanExtractWrite(
            docs_dir=docs_dir,
            key_col=key_col,
            id_col=id_col,
            ts_col=ts_col,
            text_col=text_cols[0],
            extract_html=extract_html,
            stored_cols=stored_cols,
        ),
        batch_format="pyarrow",
    )
    keys = keys.map_batches(
        lambda t: t.append_column(
            "__kb",
            pa.array(
                (
                    t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
                    % np.uint64(key_buckets)
                ).astype(np.int32),
                pa.int32(),
            ),
        ),
        batch_format="pyarrow",
    )
    losers = keys.groupby("__kb").map_groups(
        _ResolveWinners(keyidx_dir, key_buckets), batch_format="pandas"
    )
    n_dead = _write_dead_lists(losers, dead_dir)
    t_docs = time.perf_counter() - t0

    # stages 4-5: tokenize per part -> shard merge
    partials = files_ds.map_batches(
        _TokenizePart(
            docs_dir=docs_dir,
            dead_dir=dead_dir,
            stats_dir=stats_dir,
            text_cols=text_cols,
            keyword_cols=keyword_cols,
            range_shift=range_shift,
            num_shards=postings_shards,
            sayt_cols=sayt_cols,
            partials_dir=partials_dir,
            positions=positions,
            analyzer=analyzer,
        ),
        batch_format="pyarrow",
    )
    shard_stats = (
        partials.groupby("shard")
        .map_groups(_MergeShard(postings_dir), batch_format="pyarrow")
        .to_pandas()
    )
    _commit_build(man, stats_dir, text_cols, None, shard_stats)
    metrics = {
        "index_dir": index_dir,
        "layout": "scan",
        "n_dead": n_dead,
        "docs_secs": t_docs,
        "postings_secs": time.perf_counter() - t0 - t_docs,
        "total_secs": time.perf_counter() - t0,
    }
    metrics.update(man.data["corpus"])
    metrics["n_postings"] = man.data["phases"]["postings"]["n_postings"]
    metrics["docs_per_sec"] = metrics["n_docs"] / metrics["total_secs"]
    # persist throughput metrics next to the lineage (north rule:
    # checkpoints carry lineage AND metrics) — visible to later runs
    man.data["metrics"] = {
        k: metrics[k]
        for k in ("n_dead", "docs_secs", "postings_secs", "total_secs", "docs_per_sec")
    }
    man.commit()
    return metrics


def rebuild_postings_scan(index_dir: str) -> dict:
    """Re-derive the postings of a scan-layout index from its committed
    docstore partitions (the post-update re-index; dead-lists remain
    valid because updates neither add nor remove documents)."""
    man = load_manifest(index_dir)
    if man is None or man.data.get("layout") != "scan":
        raise FileNotFoundError(f"no scan-layout index at {index_dir}")
    docs_dir = os.path.join(index_dir, DOCS_SUBDIR)
    stats_dir = os.path.join(index_dir, DOCS_STATS_SUBDIR)
    postings_dir = os.path.join(index_dir, POSTINGS_SUBDIR)
    dead_dir = os.path.join(index_dir, DEAD_SUBDIR)
    n_parts = int(man.data["num_buckets"])
    text_cols = tuple(man.data.get("text_cols", ["text"]))
    keyword_cols = tuple(man.data.get("keyword_cols", []))
    sayt_cols = tuple(man.data.get("sayt_cols", []))
    partials_dir = None
    if man.data.get("checkpoint_partials"):
        partials_dir = os.path.join(index_dir, PARTIALS_SUBDIR)
        os.makedirs(partials_dir, exist_ok=True)

    files_ds = ray.data.from_items(
        [{"pidx": i} for i in range(n_parts)], override_num_blocks=n_parts
    )
    partials = files_ds.map_batches(
        _TokenizePart(
            docs_dir=docs_dir,
            dead_dir=dead_dir,
            stats_dir=stats_dir,
            text_cols=text_cols,
            keyword_cols=keyword_cols,
            range_shift=int(man.data["range_shift"]),
            num_shards=int(man.data["num_shards"]),
            sayt_cols=sayt_cols,
            partials_dir=partials_dir,
            positions=bool(man.data.get("positions")),
            analyzer=man.data.get("analyzer_spec"),
        ),
        batch_format="pyarrow",
    )
    if os.path.isdir(postings_dir):
        shutil.rmtree(postings_dir)
    os.makedirs(postings_dir, exist_ok=True)
    shard_stats = (
        partials.groupby("shard")
        .map_groups(_MergeShard(postings_dir), batch_format="pyarrow")
        .to_pandas()
    )
    _commit_build(man, stats_dir, text_cols, ..., shard_stats)
    return {"n_postings": man.data["phases"]["postings"]["n_postings"]}
