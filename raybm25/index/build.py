"""Ray-Data-native inverted index build.

The pipeline (SURVEY.md §3 "Target lifecycle", §7 steps 1-4):

    Phase A  read_parquet(pages) [column-pruned]
             -> map_batches(extract)            (html -> text, byte-identical)
             -> map_batches(attach doc ids)     (stable uint64 key + bucket)
             -> groupby(bucket).map_groups(dedup last-wins + tokenize dl
                + atomic per-bucket docstore write)
             -> tiny stats reduce (N, sum_dl, max_doc_id)  [manifest commit]

    Phase B  read_parquet(docs) [doc_id, dl, text]
             -> map_batches(partial postings)   (per-batch sorted term runs —
                the pre-shuffle combiner, SURVEY.md §4 'two-level aggregation')
             -> groupby(term, range).map_groups (merge + delta+varbyte encode
                + block-max metadata)
             -> write postings parquet           [manifest commit]

Scale design notes:
- ONE partitioning key family: ``doc_id`` (hash64(url) or the given id
  column). Docstore buckets = doc_id % num_buckets; the update phase
  co-partitions on the same function, so no second shuffle key exists.
- The postings shuffle key is ``(term, range)`` where
  ``range = doc_id >> range_shift`` — doc-ranges are monotone in
  doc_id, so a hot (Zipf-head) term's postings land in up to
  2^range_bits bounded-size groups that concatenate back in range
  order WITHOUT a second merge pass. This is the "salted
  repartitioning of hot terms" of the north rule, applied uniformly:
  rare terms still produce one group; hot terms split by doc range.
- Group payloads shuffled between phases are packed sorted numpy runs
  (list<uint64>/list<int32> Arrow columns), not per-posting rows, so
  shuffle volume ≈ packed data, not row overhead.
- Writes use deterministic filenames + tmp-rename (idempotent under
  Ray task retries) and each phase commits atomically to the manifest
  (the ``refresh`` visibility barrier, SURVEY.md §2 B10).

Reference parity citations: dedup last-write-wins = SURVEY.md §2 D1
(opensearch_client.py:189-226 upsert semantics); postings/BM25 layer =
SURVEY.md §2.B B1-B7.
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .. import BM25_B, BM25_K1
from ..analysis import ANALYZER_VERSION, TOKEN_RE
from ..extract import extract_batch
from ..hashing import HASH_IMPL, hash64
from .encode import encode_posting_groups
from .manifest import Manifest, atomic_write_parquet, load_manifest, parquet_fingerprint

DOCS_SUBDIR = "docs"
POSTINGS_SUBDIR = "postings"

# Postings are keyed by dense per-bucket ORDINALS, not raw doc ids:
# ordinal = (bucket << ORD_SHIFT) | row_index_in_bucket (rows sorted by
# doc_id within their bucket, so ordinals are deterministic). Dense
# ordinals keep delta+varbyte postings small (~1-2 bytes/posting) even
# when doc ids are 64-bit hashes (whose deltas would need 7 bytes), and
# the docstore bucket files double as the ordinal->doc mapping: bucket
# = ordinal >> ORD_SHIFT, row = ordinal & ORD_MASK.
ORD_SHIFT = 40
ORD_MASK = (1 << ORD_SHIFT) - 1


def _attach_ids(batch: pa.Table, key_col: str, id_col: str | None, num_buckets: int) -> pa.Table:
    """Stable doc ids + hash bucket; vectorized."""
    if id_col is not None:
        doc_id = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
    else:
        doc_id = hash64(batch.column(key_col).to_pylist())
    bucket = (doc_id % np.uint64(num_buckets)).astype(np.int32)
    cols = [c for c in ("doc_id", "__bucket") if c in batch.column_names]
    if cols:
        batch = batch.drop_columns(cols)
    batch = batch.append_column("doc_id", pa.array(doc_id, pa.uint64()))
    return batch.append_column("__bucket", pa.array(bucket, pa.int32()))


class _DedupWriteBucket:
    """Per-bucket dedup (last write wins by ts — SURVEY.md §2 D1) +
    doc-length computation + atomic docstore partition write.

    Returns a one-row lineage/stats frame per bucket; the documents
    themselves go straight to ``docs/bucket=NNNNN.parquet`` so the full
    corpus never accumulates in the object store past this stage.
    """

    def __init__(
        self,
        docs_dir: str,
        key_col: str,
        ts_col: str | None,
        text_col: str,
        stored_cols: list[str],
        check_collisions: bool,
    ):
        self.__name__ = "DedupWriteBucket"  # map_groups requires a __name__
        self.docs_dir = docs_dir
        self.key_col = key_col
        self.ts_col = ts_col
        self.text_col = text_col
        self.stored_cols = stored_cols
        self.check_collisions = check_collisions

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        bucket = int(g["__bucket"].iloc[0])
        if self.check_collisions and self.key_col in g.columns:
            if int(g.groupby("doc_id")[self.key_col].nunique().max()) > 1:
                raise ValueError(
                    f"doc_id hash collision in bucket {bucket}: two distinct "
                    f"'{self.key_col}' values share a 64-bit key"
                )
        sort_cols = ["doc_id"] + ([self.ts_col] if self.ts_col else [])
        if self.text_col in g.columns:
            sort_cols.append(self.text_col)
        g = g.sort_values(sort_cols, kind="mergesort").drop_duplicates("doc_id", keep="last")
        findall = TOKEN_RE.findall
        texts = g[self.text_col].tolist()
        dl = np.fromiter(
            (len(findall(t.lower())) if isinstance(t, str) else 0 for t in texts),
            dtype=np.int32,
            count=len(texts),
        )
        out = g[["doc_id"] + self.stored_cols].copy()
        out["dl"] = dl
        out["ordinal"] = (np.uint64(bucket) << np.uint64(ORD_SHIFT)) + np.arange(
            len(out), dtype=np.uint64
        )
        tbl = pa.Table.from_pandas(out, preserve_index=False)
        dest = os.path.join(self.docs_dir, f"bucket={bucket:05d}.parquet")
        atomic_write_parquet(tbl, dest)
        return pd.DataFrame(
            {
                "bucket": [bucket],
                "rows": [len(out)],
                "sum_dl": [int(dl.sum())],
                "max_doc_id": [int(out["doc_id"].max()) if len(out) else 0],
                "bytes": [os.path.getsize(dest)],
            }
        )


def shard_of(terms: np.ndarray, ranges: np.ndarray, num_shards: int) -> np.ndarray:
    """Postings output shard of (term, doc-range) keys.

    Shared between the build (row routing) and the reader (a query term
    maps to at most n_ranges shard FILES, so serving reads only those
    files instead of scanning every shard)."""
    h = pd.util.hash_array(np.asarray(terms, dtype=object), categorize=False)
    return (
        (h ^ (np.asarray(ranges).astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)))
        % np.uint64(num_shards)
    ).astype(np.int32)


def _pairs_to_rows(
    pair_terms: np.ndarray,
    pair_ids: np.ndarray,
    pair_tfs: np.ndarray,
    pair_dls: np.ndarray,
    range_shift: np.uint64,
    num_shards: int,
) -> pa.Table | None:
    """Pack sorted (term, doc) pairs into (term, range, shard, packed
    lists) rows. Pairs must arrive sorted by (term, doc_id)."""
    if pair_terms.size == 0:
        return None
    ranges = (pair_ids >> range_shift).astype(np.int64)
    term_chg = np.empty(pair_terms.size, dtype=bool)
    term_chg[0] = True
    term_chg[1:] = pair_terms[1:] != pair_terms[:-1]
    rng_chg = np.empty_like(term_chg)
    rng_chg[0] = True
    rng_chg[1:] = ranges[1:] != ranges[:-1]
    row_starts = np.flatnonzero(term_chg | rng_chg)
    offsets = np.append(row_starts, pair_terms.size).astype(np.int32)
    shard = shard_of(pair_terms[row_starts], ranges[row_starts], num_shards)
    return pa.table(
        {
            "term": pa.array(pair_terms[row_starts], pa.string()),
            "range": pa.array(ranges[row_starts], pa.int64()),
            "shard": pa.array(shard, pa.int32()),
            "doc_ids": pa.ListArray.from_arrays(offsets, pa.array(pair_ids, pa.uint64())),
            "tfs": pa.ListArray.from_arrays(offsets, pa.array(pair_tfs, pa.int32())),
            "dls": pa.ListArray.from_arrays(offsets, pa.array(pair_dls, pa.int32())),
        }
    )


class _PartialPostings:
    """Per-batch local postings (the combiner before the big shuffle).

    Emits one row per (term, range) per batch with doc-id-sorted packed
    arrays; rows carry a ``shard`` key — hash(term, range) — so the
    merge can run as a few big vectorized shard groups instead of one
    Python call per term (hot-term skew also spreads across shards this
    way). Tokenization is the only per-row Python; counting is
    factorize + unique (C-speed).
    """

    def __init__(
        self,
        text_col: str,
        range_shift: int,
        keyword_cols: tuple[str, ...] = (),
        num_shards: int = 64,
        key_col: str = "ordinal",
    ):
        self.text_col = text_col
        self.range_shift = np.uint64(range_shift)
        self.keyword_cols = keyword_cols
        self.num_shards = num_shards
        self.key_col = key_col
        self.findall = TOKEN_RE.findall

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column(self.key_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        dls_col = batch.column("dl").to_numpy(zero_copy_only=False).astype(np.int32)
        order = np.argsort(doc_ids, kind="stable")
        ids_sorted = doc_ids[order]
        dls_sorted = dls_col[order]
        texts = batch.column(self.text_col).to_pylist()

        findall = self.findall
        toks = [
            findall(texts[i].lower()) if isinstance(texts[i], str) else [] for i in order
        ]
        lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
        flat = np.concatenate([np.array(t, dtype=object) for t in toks]) if lens.sum() else np.empty(0, object)
        doc_pos = np.repeat(np.arange(len(toks), dtype=np.int64), lens)

        tables = []
        if flat.size:
            tid, uniq = pd.factorize(flat)
            ord2 = np.lexsort((doc_pos, tid))
            t_s, d_s = tid[ord2], doc_pos[ord2]
            chg = np.empty(t_s.size, dtype=bool)
            chg[0] = True
            chg[1:] = (t_s[1:] != t_s[:-1]) | (d_s[1:] != d_s[:-1])
            starts = np.flatnonzero(chg)
            tf = np.diff(starts, append=t_s.size).astype(np.int32)
            p_t = uniq.to_numpy(dtype=object) if hasattr(uniq, "to_numpy") else np.asarray(uniq, object)
            pair_terms = p_t[t_s[starts]]
            pair_d = d_s[starts]
            tbl = _pairs_to_rows(
                pair_terms,
                ids_sorted[pair_d],
                tf,
                dls_sorted[pair_d],
                self.range_shift,
                self.num_shards,
            )
            if tbl is not None:
                tables.append(tbl)

        # keyword fields: untokenized exact terms, tf=1, dl=1 (B2)
        for col in self.keyword_cols:
            vals = batch.column(col).to_pylist()
            kw_terms: list[str] = []
            kw_pos: list[int] = []
            for j, i in enumerate(order):
                v = vals[i]
                for kv in v if isinstance(v, list) else ([] if v is None else [v]):
                    kw_terms.append(f"{col}:{kv}")
                    kw_pos.append(j)
            if not kw_terms:
                continue
            kterms = np.array(kw_terms, dtype=object)
            kpos = np.array(kw_pos, dtype=np.int64)
            ord3 = np.lexsort((kpos, kterms))
            kt, kp = kterms[ord3], kpos[ord3]
            keep = np.empty(kt.size, dtype=bool)
            keep[0] = True
            keep[1:] = (kt[1:] != kt[:-1]) | (kp[1:] != kp[:-1])  # dedupe repeated values
            kt, kp = kt[keep], kp[keep]
            ones = np.ones(kt.size, dtype=np.int32)
            tbl = _pairs_to_rows(
                kt, ids_sorted[kp], ones, ones, self.range_shift, self.num_shards
            )
            if tbl is not None:
                tables.append(tbl)

        if not tables:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "range": pa.array([], pa.int64()),
                    "shard": pa.array([], pa.int32()),
                    "doc_ids": pa.array([], pa.list_(pa.uint64())),
                    "tfs": pa.array([], pa.list_(pa.int32())),
                    "dls": pa.array([], pa.list_(pa.int32())),
                }
            )
        return pa.concat_tables(tables)


class _MergeShard:
    """Merge + encode ALL (term, range) groups of one shard in a few
    numpy passes (see raybm25.index.encode), then write the shard file
    atomically under its deterministic name (idempotent under retries;
    the returned stats row is the lineage record)."""

    def __init__(self, k1: float, b: float, avgdl: float, postings_dir: str):
        self.__name__ = "MergeShard"
        self.k1, self.b, self.avgdl = k1, b, avgdl
        self.postings_dir = postings_dir

    def __call__(self, g: pa.Table) -> pa.Table:
        shard_id = int(g.column("shard")[0].as_py())
        tbl = self._encode(g)
        dest = os.path.join(self.postings_dir, f"shard={shard_id:05d}.parquet")
        atomic_write_parquet(tbl, dest)
        return pa.table(
            {
                "shard": pa.array([shard_id], pa.int32()),
                "n_rows": pa.array([tbl.num_rows], pa.int64()),
                "n_postings": pa.array([int(pc.sum(tbl.column("df")).as_py())], pa.int64()),
                "bytes": pa.array([os.path.getsize(dest)], pa.int64()),
            }
        )

    def _encode(self, g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        terms = g.column("term").to_numpy(zero_copy_only=False)
        ranges = g.column("range").to_numpy(zero_copy_only=False)
        # order rows by (term, range) so element gids are contiguous
        tcodes, tuniq = pd.factorize(terms)
        row_order = np.lexsort((ranges, tcodes))
        g = g.take(pa.array(row_order))
        tcodes = tcodes[row_order]
        ranges = ranges[row_order]
        row_chg = np.empty(len(tcodes), dtype=bool)
        row_chg[0] = True
        row_chg[1:] = (tcodes[1:] != tcodes[:-1]) | (ranges[1:] != ranges[:-1])
        row_gid = np.cumsum(row_chg) - 1

        ids_col = g.column("doc_ids").combine_chunks()
        row_counts = np.diff(ids_col.offsets.to_numpy())
        gid_el = np.repeat(row_gid, row_counts)
        enc = encode_posting_groups(
            gid_el,
            ids_col.values.to_numpy(zero_copy_only=False),
            g.column("tfs").combine_chunks().values.to_numpy(zero_copy_only=False),
            g.column("dls").combine_chunks().values.to_numpy(zero_copy_only=False),
            k1=self.k1,
            b=self.b,
            avgdl=self.avgdl,
        )
        grp_first_row = np.flatnonzero(row_chg)
        out_terms = terms[row_order][grp_first_row]
        out_ranges = ranges[grp_first_row]
        # deterministic, read-friendly order within the shard file
        out_order = np.lexsort((out_ranges, out_terms)).astype(np.int64)

        def pick(lst):
            return [lst[i] for i in out_order]

        return pa.table(
            {
                "term": pa.array(out_terms[out_order], pa.string()),
                "range": pa.array(out_ranges[out_order], pa.int64()),
                "df": pa.array(enc["df"][out_order], pa.int64()),
                "cf": pa.array(enc["cf"][out_order], pa.int64()),
                "doc_ids_enc": pa.array(pick(enc["doc_ids_enc"]), pa.binary()),
                "tfs_enc": pa.array(pick(enc["tfs_enc"]), pa.binary()),
                "dls_enc": pa.array(pick(enc["dls_enc"]), pa.binary()),
                "block_last_doc": enc["block_last_doc"].take(pa.array(out_order)),
                "block_max_norm": enc["block_max_norm"].take(pa.array(out_order)),
            }
        )


def _compute_range_shift(max_doc_id: int, n_docs: int, range_docs_target: int) -> int:
    """Pick the salt granularity: enough doc-ranges that a term seen in
    every doc still forms groups of ~range_docs_target postings."""
    if n_docs <= 0 or max_doc_id <= 0:
        return 63
    n_ranges = max(1, -(-n_docs // range_docs_target))
    range_bits = max(0, int(np.ceil(np.log2(n_ranges))))
    return min(63, max(0, int(max_doc_id).bit_length() - range_bits))


def build_index(
    source,
    index_dir: str,
    *,
    key_col: str = "url",
    id_col: str | None = None,
    ts_col: str | None = "warc_ts",
    text_col: str = "text",
    extract_html: bool = False,
    keyword_cols: tuple[str, ...] = (),
    stored_cols: list[str] | None = None,
    num_buckets: int = 32,
    postings_shards: int = 64,
    range_docs_target: int = 1 << 20,
    k1: float = BM25_K1,
    b: float = BM25_B,
    overwrite: bool = False,
    tokenize_concurrency: int | None = None,
    batch_size: int = 2048,
) -> dict:
    """Build (or resume) a full-text index at ``index_dir``.

    ``source`` is a parquet path/list (preferred: enables column pruning
    and fingerprint-based resume) or a ``ray.data.Dataset``.
    Returns a metrics dict (per-phase wall time, docs/s, sizes).
    """
    t0 = time.perf_counter()
    metrics: dict = {"index_dir": index_dir}
    docs_dir = os.path.join(index_dir, DOCS_SUBDIR)
    postings_dir = os.path.join(index_dir, POSTINGS_SUBDIR)

    if overwrite and os.path.isdir(index_dir):
        # only clear directories that are (or contain) one of our indexes
        if os.path.exists(os.path.join(index_dir, "manifest.json")) or not os.listdir(index_dir):
            shutil.rmtree(index_dir)
        else:
            raise ValueError(f"refusing to overwrite non-index directory {index_dir}")

    is_path = isinstance(source, (str, list))
    fingerprint = parquet_fingerprint(source) if is_path else None
    man = load_manifest(index_dir)
    if man is None:
        man = Manifest(index_dir, {})
    man.data.update(
        {
            "version": 1,
            "analyzer": ANALYZER_VERSION,
            "hash_impl": HASH_IMPL,
            "k1": k1,
            "b": b,
            "num_buckets": num_buckets,
            "key_col": key_col,
            "text_col": text_col,
            "keyword_cols": list(keyword_cols),
        }
    )

    # ---------------- Phase A: extract + dedup + docstore ----------------
    docs_fresh = False
    ta = time.perf_counter()
    if man.phase_committed("docs", fingerprint) and fingerprint is not None:
        metrics["docs_phase"] = "skipped (checkpoint)"
    else:
        docs_fresh = True
        if is_path:
            cols = {key_col, "html" if extract_html else text_col}
            if ts_col:
                cols.add(ts_col)
            if id_col:
                cols.add(id_col)
            cols.update(keyword_cols)
            if stored_cols:
                cols.update(stored_cols)
            # A small file count would otherwise read as 1-2 blocks and
            # serialize every downstream map stage; split to keep all
            # cores busy. (With thousands of input files the default
            # file-based splitting is already fine.)
            n_files = len(fingerprint)
            kwargs = {}
            if n_files < 64:
                import ray as _ray

                ncpu = int(_ray.cluster_resources().get("CPU", 8))
                kwargs["override_num_blocks"] = max(2 * ncpu, n_files)
            ds = ray.data.read_parquet(source, columns=sorted(cols), **kwargs)
        else:
            ds = source
        if extract_html:
            # drop html right away: the dedup shuffle must not carry raw bytes
            ds = ds.map_batches(extract_batch, batch_format="pyarrow", fn_kwargs={"drop_html": True})
        ds = ds.map_batches(
            _attach_ids,
            batch_format="pyarrow",
            fn_kwargs={"key_col": key_col, "id_col": id_col, "num_buckets": num_buckets},
        )
        if stored_cols is None:
            first_cols = [
                c
                for c in ds.schema().names
                if c not in ("html", "doc_id", "__bucket") and c != id_col
            ]
        else:
            first_cols = list(stored_cols)
        if os.path.isdir(docs_dir):
            shutil.rmtree(docs_dir)
        stats_ds = ds.groupby("__bucket").map_groups(
            _DedupWriteBucket(
                docs_dir=docs_dir,
                key_col=key_col,
                ts_col=ts_col,
                text_col=text_col,
                stored_cols=first_cols,
                check_collisions=id_col is None,
            ),
            batch_format="pandas",
        )
        stats = stats_ds.to_pandas()  # one row per bucket — tiny
        n_docs = int(stats["rows"].sum())
        sum_dl = int(stats["sum_dl"].sum())
        max_doc_id = int(stats["max_doc_id"].max()) if len(stats) else 0
        man.data["corpus"] = {
            "n_docs": n_docs,
            "sum_dl": sum_dl,
            "avgdl": (sum_dl / n_docs) if n_docs else 0.0,
            "max_doc_id": max_doc_id,
        }
        ph = man.phase("docs")
        ph["committed"] = True
        ph["input_fingerprint"] = fingerprint
        ph["buckets"] = {
            str(int(r.bucket)): {"rows": int(r.rows), "bytes": int(r.bytes)}
            for r in stats.itertuples()
        }
        man.commit()
    metrics["docs_secs"] = time.perf_counter() - ta
    corpus = man.data["corpus"]
    metrics.update(corpus)

    # ---------------- Phase B: postings build ----------------
    tb = time.perf_counter()
    buckets_lineage = man.data["phases"]["docs"]["buckets"]
    max_ordinal = max(
        (int(bk) << ORD_SHIFT) + info["rows"] - 1
        for bk, info in buckets_lineage.items()
        if info["rows"] > 0
    )
    man.data["corpus"]["max_ordinal"] = max_ordinal
    range_shift = _compute_range_shift(max_ordinal, corpus["n_docs"], range_docs_target)
    man.data["range_shift"] = range_shift
    man.data["num_shards"] = postings_shards
    man.data["n_ranges"] = (max_ordinal >> range_shift) + 1
    if man.phase_committed("postings") and not docs_fresh:
        metrics["postings_phase"] = "skipped (checkpoint)"
    else:
        read_cols = ["ordinal", "dl", text_col, *keyword_cols]
        docs_ds = ray.data.read_parquet(docs_dir, columns=read_cols)
        partials = docs_ds.map_batches(
            _PartialPostings(
                text_col=text_col,
                range_shift=range_shift,
                keyword_cols=keyword_cols,
                num_shards=postings_shards,
            ),
            batch_format="pyarrow",
            batch_size=batch_size,
            **({"concurrency": tokenize_concurrency} if tokenize_concurrency else {}),
        )
        if os.path.isdir(postings_dir):
            shutil.rmtree(postings_dir)
        os.makedirs(postings_dir, exist_ok=True)
        shard_stats = (
            partials.groupby("shard")
            .map_groups(_MergeShard(k1, b, corpus["avgdl"], postings_dir), batch_format="pyarrow")
            .to_pandas()  # one row per shard — tiny
        )
        ph = man.phase("postings")
        ph["committed"] = True
        ph["range_shift"] = range_shift
        ph["shards"] = {
            str(int(r.shard)): {"rows": int(r.n_rows), "bytes": int(r.bytes)}
            for r in shard_stats.itertuples()
        }
        ph["n_postings"] = int(shard_stats["n_postings"].sum()) if len(shard_stats) else 0
        man.commit()
        metrics["n_postings"] = man.data["phases"]["postings"]["n_postings"]
    metrics["postings_secs"] = time.perf_counter() - tb
    metrics["total_secs"] = time.perf_counter() - t0
    metrics["docs_per_sec"] = corpus["n_docs"] / metrics["total_secs"]
    return metrics
