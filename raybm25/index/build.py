"""Ray-Data-native inverted index build — fused single-pass pipeline.

    read_parquet(pages) [column-pruned, block-split]
      -> map_batches(extract)            html -> text, byte-identical
      -> map_batches(attach doc ids)     stable uint64 key + hash bucket
      -> groupby(bucket).map_groups(DedupTokenizeBucket)
           dedup last-write-wins | assign dense ordinals | tokenize ONCE
           | write docs/bucket=N.parquet + stats sidecar (atomic)
           | emit packed partial postings rows keyed by (term, range, shard)
      -> groupby(shard).map_groups(MergeShard)
           merge + delta+varbyte encode + block (last_doc, max_tf, min_dl)
           | write postings/shard=N.parquet (atomic)
      -> tiny lineage rows -> manifest commit (the refresh barrier)

Both shuffles run in ONE streaming plan with backpressure; the corpus
text is tokenized exactly once and never read twice. Block score
bounds are (max_tf, min_dl) per 128 postings — the BM25 bound
``idf * tf_norm(max_tf, min_dl)`` is computed at query time when
global avgdl is known, which is what lets encoding stream concurrently
with stats collection.

Scale design (SURVEY.md §4, §7):
- ONE partitioning key family: doc_id (hash64(url) or a given id
  column). Docstore bucket = doc_id % num_buckets; updates co-partition
  on the same function.
- Dense ordinals ((bucket << 40) | row) keep postings deltas at 1-2
  varbyte bytes; docstore row order IS the ordinal -> doc mapping.
- Postings shuffle key (term, range) with range = ordinal >> shift
  (= groups of buckets, known a priori): hot Zipf-head terms split
  into bounded doc-range segments that concatenate back in order with
  no second merge — the salted repartitioning of the north rule.
- Shuffled payloads are packed sorted runs (list columns), combined
  per bucket (maximal combiner) before the exchange.
- All partition writes use deterministic filenames + tmp-rename, so
  Ray task retries are idempotent; the manifest records per-partition
  lineage (rows/bytes/fingerprint) and commits atomically.

Reference parity: dedup last-write-wins = SURVEY.md §2 D1 (upsert
semantics, opensearch_client.py:189-226); analysis/postings/BM25 layer
= SURVEY.md §2.B B1-B7 (delegated-to-OpenSearch operators rebuilt from
scratch).
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .. import BM25_B, BM25_K1
from ..analysis import (
    ANALYZER_VERSION,
    TOKEN_RE,
    analyzer_version,
    arrow_tokenize,
    filter_tokens_np,
)
from ..extract import extract_batch
from ..hashing import HASH_IMPL, hash64
from .encode import encode_posting_groups
from .manifest import Manifest, atomic_write_parquet, load_manifest, parquet_fingerprint

DOCS_SUBDIR = "docs"
DOCS_STATS_SUBDIR = "docs_stats"
POSTINGS_SUBDIR = "postings"
HASH_PARTIALS_SUBDIR = "partials"

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


EMPTY_PARTIALS = pa.table(
    {
        "term": pa.array([], pa.string()),
        "range": pa.array([], pa.int64()),
        "shard": pa.array([], pa.int32()),
        "doc_ids": pa.array([], pa.list_(pa.uint64())),
        "tfs": pa.array([], pa.list_(pa.int32())),
        "dls": pa.array([], pa.list_(pa.int32())),
    }
)

# positional builds carry one extra occurrence-level list column:
# per (term, range) row, the flattened within-doc token positions —
# exactly tf values per posting, ascending within each posting
EMPTY_PARTIALS_POS = EMPTY_PARTIALS.append_column(
    "poss", pa.array([], pa.list_(pa.int32()))
)


def _empty_partials(positions: bool) -> pa.Table:
    return EMPTY_PARTIALS_POS if positions else EMPTY_PARTIALS


def _pairs_to_rows(
    pair_terms: np.ndarray,
    pair_ids: np.ndarray,
    pair_tfs: np.ndarray,
    pair_dls: np.ndarray,
    range_shift: np.uint64,
    num_shards: int,
    pair_poss: np.ndarray | None = None,
) -> pa.Table | None:
    """Pack sorted (term, doc) pairs into (term, range, shard, packed
    lists) rows. Pairs must arrive sorted by (term, ordinal).

    ``pair_poss``: flattened within-doc positions, exactly
    ``pair_tfs[i]`` values per pair ``i`` (positional builds only)."""
    if pair_terms.size == 0:
        return None
    if pair_terms.size >= (1 << 31):
        raise ValueError("batch produced >2^31 postings pairs; lower batch_size")
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
    cols = {
        "term": pa.array(pair_terms[row_starts], pa.string()),
        "range": pa.array(ranges[row_starts], pa.int64()),
        "shard": pa.array(shard, pa.int32()),
        "doc_ids": pa.ListArray.from_arrays(offsets, pa.array(pair_ids, pa.uint64())),
        "tfs": pa.ListArray.from_arrays(offsets, pa.array(pair_tfs, pa.int32())),
        "dls": pa.ListArray.from_arrays(offsets, pa.array(pair_dls, pa.int32())),
    }
    if pair_poss is not None:
        occ_cum = np.zeros(pair_terms.size + 1, dtype=np.int64)
        np.cumsum(pair_tfs, out=occ_cum[1:])
        occ_offsets = occ_cum[np.append(row_starts, pair_terms.size)].astype(np.int32)
        cols["poss"] = pa.ListArray.from_arrays(
            occ_offsets, pa.array(pair_poss, pa.int32())
        )
    return pa.table(cols)


def build_partials_codes(
    ordinals_sorted: np.ndarray,
    dls_sorted: np.ndarray,
    tid: np.ndarray,
    terms: np.ndarray,
    doc_pos: np.ndarray,
    kw_values_sorted: dict[str, list],
    range_shift: int,
    num_shards: int,
    term_prefix: str | None = None,
    positions: bool = False,
) -> pa.Table:
    """Packed partial-postings rows from dictionary-encoded tokens
    (arrow_tokenize output; docs pre-sorted by ordinal). One np.unique
    over a combined (term, doc) key does all the counting — no Python
    token objects anywhere.

    ``positions=True`` additionally records each token's within-doc
    position (0-based index in the analyzed stream, matching
    ``analysis.tokenize`` order): the (term, doc) grouping switches to
    a stable argsort over the same packed key, which keeps occurrences
    in token order so each pair's position run comes out ascending."""
    shift = np.uint64(range_shift)
    tables = []
    if tid.size:
        if term_prefix:
            terms = np.array([f"{term_prefix}:{t}" for t in terms], dtype=object)
        n_docs = ordinals_sorted.size
        key = tid * n_docs + doc_pos
        pair_poss = None
        if positions:
            # within-doc token index: doc_pos is non-decreasing (tokens
            # arrive doc by doc in stream order), so position = global
            # token index minus the doc's first token index
            n_tok = doc_pos.size
            idx = np.arange(n_tok, dtype=np.int64)
            chg = np.empty(n_tok, dtype=bool)
            chg[0] = True
            np.not_equal(doc_pos[1:], doc_pos[:-1], out=chg[1:])
            run_starts = idx[chg]
            run_lens = np.diff(np.append(run_starts, n_tok))
            pos_in_doc = idx - np.repeat(run_starts, run_lens)
            order2 = np.argsort(key, kind="stable")
            ks = key[order2]
            starts = np.empty(n_tok, dtype=bool)
            starts[0] = True
            np.not_equal(ks[1:], ks[:-1], out=starts[1:])
            start_idx = np.flatnonzero(starts)
            uk = ks[start_idx]
            tf = np.diff(np.append(start_idx, n_tok))
            pair_poss = pos_in_doc[order2].astype(np.int32)
        else:
            uk, tf = np.unique(key, return_counts=True)
        pair_tid = uk // n_docs
        pair_d = uk % n_docs
        tbl = _pairs_to_rows(
            terms[pair_tid],
            ordinals_sorted[pair_d],
            tf.astype(np.int32),
            dls_sorted[pair_d],
            shift,
            num_shards,
            pair_poss=pair_poss,
        )
        if tbl is not None:
            tables.append(tbl)
    kw_tbl = _keyword_partials(
        ordinals_sorted, kw_values_sorted, shift, num_shards, positions=positions
    )
    if kw_tbl is not None:
        tables.append(kw_tbl)
    if not tables:
        return _empty_partials(positions)
    return pa.concat_tables(tables)


def _keyword_partials(ordinals_sorted, kw_values_sorted, shift, num_shards, positions=False):
    tables = []
    for col, vals in kw_values_sorted.items():
        kw_terms: list[str] = []
        kw_pos: list[int] = []
        for j, v in enumerate(vals):
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
        # keyword terms are match-only: position 0 placeholders keep the
        # occurrence-level alignment (tf values per pair) uniform
        zeros = np.zeros(kt.size, dtype=np.int32) if positions else None
        tbl = _pairs_to_rows(
            kt, ordinals_sorted[kp], ones, ones, shift, num_shards, pair_poss=zeros
        )
        if tbl is not None:
            tables.append(tbl)
    return pa.concat_tables(tables) if tables else None


def sayt_partials(
    col: str,
    ordinals_sorted: np.ndarray,
    tid: np.ndarray,
    terms: np.ndarray,
    doc_pos: np.ndarray,
    range_shift: int,
    num_shards: int,
    max_shingle: int = 3,
    max_prefix: int = 10,
    positions: bool = False,
) -> pa.Table:
    """search_as_you_type expansion partials (SURVEY.md §2.B B3):
    per-doc DISTINCT {2,3}-gram shingles plus '#'-marked edge prefixes
    of every stream term (root tokens AND shingles), all match-only
    (tf=1, dl=1), namespaced ``col:``. One shared implementation for
    all three build paths (VERDICT r3 'Next round' #7), vectorized
    (the per-doc Python comprehension was the last Python-loop stage in
    the build): shingles factorize on token-code pairs, strings
    materialize once per UNIQUE shingle via Arrow element-wise join,
    prefixes once per unique stream term via utf8_slice (tokens are
    ASCII, so code-unit slicing == Python slicing), and per-doc dedup
    is one np.unique over packed (code, doc) keys. Term sets per doc
    are identical to analysis.sayt_expand (tested)."""
    import pyarrow.compute as pc

    n = int(ordinals_sorted.size)
    if tid.size == 0 or n == 0:
        return _empty_partials(positions)
    T = int(terms.size)
    terms_arr = pa.array(terms, pa.string())

    # --- stream terms: per-width unique strings + deduped (code, doc)
    # occurrences. Width 1 = root tokens (prefix sources only; roots
    # themselves are indexed by the caller's main partials).
    root_keys = np.unique(tid.astype(np.int64) * n + doc_pos)
    stream_strs: list[pa.Array] = [terms_arr]
    stream_occ: list[tuple[np.ndarray, np.ndarray]] = [
        (root_keys // n, root_keys % n)
    ]
    shingle_occ: list[tuple[int, np.ndarray, np.ndarray]] = []  # (width_idx, code, doc)
    codes = tid.astype(np.int64)  # shingle code at start position, current width
    valid = np.ones(tid.size, dtype=bool)
    uniq_prev = terms_arr
    for w in range(2, max_shingle + 1):
        m = tid.size - (w - 1)
        if m <= 0:
            break
        v = valid[:m] & (doc_pos[:m] == doc_pos[w - 1 :])
        idx = np.flatnonzero(v)
        if idx.size == 0:
            break
        pair = codes[idx] * T + tid[idx + w - 1].astype(np.int64)
        pcodes, puniq = pd.factorize(pair)
        left = (puniq // T).astype(np.int64)
        right = (puniq % T).astype(np.int64)
        uniq_w = pc.binary_join_element_wise(
            uniq_prev.take(pa.array(left)), terms_arr.take(pa.array(right)), " "
        )
        occ_keys = np.unique(pcodes.astype(np.int64) * n + doc_pos[idx])
        wi = len(stream_strs)
        stream_strs.append(uniq_w)
        stream_occ.append((occ_keys // n, occ_keys % n))
        shingle_occ.append((wi, occ_keys // n, occ_keys % n))
        nxt_codes = np.zeros(m, dtype=np.int64)
        nxt_codes[idx] = pcodes
        codes, valid, uniq_prev = nxt_codes, v, uniq_w
    # global stream ids: width-w code + offset
    offs = np.cumsum([0] + [len(s) for s in stream_strs])
    all_stream = pa.concat_arrays(
        [s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s for s in stream_strs]
    )
    n_stream = len(all_stream)

    # --- prefix vocabulary over unique stream strings ('#'-namespaced;
    # plen 1..min(len, max_prefix) so every term is its own prefix too)
    lens = pc.utf8_length(all_stream).to_numpy(zero_copy_only=False)
    pref_parts, owner_parts = [], []
    for p in range(1, max_prefix + 1):
        sel = np.flatnonzero(lens >= p)
        if sel.size == 0:
            break
        pref_parts.append(pc.utf8_slice_codeunits(all_stream.take(pa.array(sel)), 0, p))
        owner_parts.append(sel)
    pref_codes_raw, pref_uniq = pd.factorize(
        np.concatenate([np.asarray(s.to_pandas(), dtype=object) for s in pref_parts])
    )
    owners = np.concatenate(owner_parts)
    order = np.argsort(owners, kind="stable")
    owners_s, pcodes_s = owners[order], pref_codes_raw[order]
    counts = np.bincount(owners_s, minlength=n_stream)
    csr = np.concatenate([[0], np.cumsum(counts)])

    # --- expand deduped stream occurrences into (prefix_code, doc)
    gid_occ = np.concatenate(
        [c + offs[i] for i, (c, _) in enumerate(stream_occ)]
    )
    doc_occ = np.concatenate([d for _, d in stream_occ])
    cnt = counts[gid_occ]
    total = int(cnt.sum())
    out_doc = np.repeat(doc_occ, cnt)
    seg_start = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    flat = np.repeat(csr[gid_occ] - seg_start, cnt) + np.arange(total, dtype=np.int64)
    pref_pairs = np.unique(pcodes_s[flat] * n + out_doc)

    # --- final vocab: decorated shingles then decorated prefixes
    n_pref = len(pref_uniq)
    dec: list[np.ndarray] = []
    sh_pairs = []
    base = 0
    for wi, c, d in shingle_occ:
        s = stream_strs[wi]
        dec.append(
            np.asarray(
                pc.binary_join_element_wise(
                    pa.array(np.full(len(s), f"{col}:", dtype=object), pa.string()), s, ""
                ).to_pandas(),
                dtype=object,
            )
        )
        sh_pairs.append(((c + base) * n + d))
        base += len(s)
    dec.append(
        np.asarray(
            pc.binary_join_element_wise(
                pa.array(np.full(n_pref, f"{col}:#", dtype=object), pa.string()),
                pa.array(np.asarray(pref_uniq, dtype=object), pa.string()),
                "",
            ).to_pandas(),
            dtype=object,
        )
        if n_pref
        else np.empty(0, dtype=object)
    )
    vocab = np.concatenate(dec) if dec else np.empty(0, dtype=object)
    all_pairs = np.concatenate(
        sh_pairs + [(pref_pairs // n + base) * n + (pref_pairs % n)]
    )
    all_pairs.sort()
    pv = all_pairs // n
    pd_ = all_pairs % n
    ones = np.ones(all_pairs.size, dtype=np.int32)
    tbl = _pairs_to_rows(
        vocab[pv],
        ordinals_sorted[pd_],
        ones,
        ones,
        np.uint64(range_shift),
        num_shards,
        # sayt shingle/prefix terms are match-only; zero placeholders
        # keep the positional occurrence alignment uniform
        pair_poss=np.zeros(all_pairs.size, dtype=np.int32) if positions else None,
    )
    return tbl if tbl is not None else _empty_partials(positions)


def build_partials(
    ordinals_sorted: np.ndarray,
    dls_sorted: np.ndarray,
    toks_sorted: list[list[str]],
    kw_values_sorted: dict[str, list],
    range_shift: int,
    num_shards: int,
) -> pa.Table:
    """Packed partial-postings rows from per-doc token streams (docs
    must be pre-sorted by ordinal). Counting is factorize + boundary
    detection — no per-pair Python."""
    shift = np.uint64(range_shift)
    lens = np.fromiter((len(t) for t in toks_sorted), dtype=np.int64, count=len(toks_sorted))
    tables = []
    if int(lens.sum()):
        flat = np.concatenate([np.array(t, dtype=object) for t in toks_sorted if t])
        doc_pos = np.repeat(np.arange(len(toks_sorted), dtype=np.int64), lens)
        tid, uniq = pd.factorize(flat)
        # count (term, doc) pairs with ONE sort over a combined int key
        # (a lexsort + two fancy gathers over millions of tokens costs
        # ~3x more than np.unique on the packed key)
        n_docs = len(toks_sorted)
        key = tid.astype(np.int64) * n_docs + doc_pos
        uk, tf = np.unique(key, return_counts=True)
        pair_tid = uk // n_docs
        pair_d = uk % n_docs
        p_t = uniq.to_numpy(dtype=object) if hasattr(uniq, "to_numpy") else np.asarray(uniq, object)
        tbl = _pairs_to_rows(
            p_t[pair_tid],
            ordinals_sorted[pair_d],
            tf.astype(np.int32),
            dls_sorted[pair_d],
            shift,
            num_shards,
        )
        if tbl is not None:
            tables.append(tbl)

    # keyword fields: untokenized exact terms, tf=1, dl=1 (SURVEY B2)
    for col, vals in kw_values_sorted.items():
        kw_terms: list[str] = []
        kw_pos: list[int] = []
        for j, v in enumerate(vals):
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
        tbl = _pairs_to_rows(kt, ordinals_sorted[kp], ones, ones, shift, num_shards)
        if tbl is not None:
            tables.append(tbl)

    if not tables:
        return EMPTY_PARTIALS
    return pa.concat_tables(tables)


class _DedupTokenizeBucket:
    """One call per hash bucket: dedup (last write wins by ts —
    SURVEY.md §2 D1), assign dense ordinals, tokenize ONCE, write the
    docstore partition + a stats sidecar atomically, and return the
    bucket's packed partial postings (input to the shard merge).

    Multiple text fields are supported: the first is the default
    (unprefixed terms); others index as ``field:token`` with their own
    per-field dl / avgdl (each posting stores its field's dl)."""

    def __init__(
        self,
        docs_dir: str,
        stats_dir: str,
        key_col: str,
        ts_col: str | None,
        text_cols: tuple[str, ...],
        stored_cols: list[str],
        keyword_cols: tuple[str, ...],
        check_collisions: bool,
        range_shift: int,
        num_shards: int,
        sayt_cols: tuple[str, ...] = (),
        partials_dir: str | None = None,
        positions: bool = False,
        analyzer: dict | None = None,
    ):
        self.__name__ = "DedupTokenizeBucket"
        self.analyzer = analyzer
        self.positions = positions
        self.docs_dir = docs_dir
        self.stats_dir = stats_dir
        self.key_col = key_col
        self.ts_col = ts_col
        self.text_cols = text_cols
        self.stored_cols = stored_cols
        self.keyword_cols = keyword_cols
        self.check_collisions = check_collisions
        self.range_shift = range_shift
        self.num_shards = num_shards
        self.sayt_cols = sayt_cols
        self.partials_dir = partials_dir

    def __call__(self, g: pd.DataFrame) -> pa.Table:
        bucket = int(g["__bucket"].iloc[0])
        if self.check_collisions and self.key_col in g.columns:
            if int(g.groupby("doc_id")[self.key_col].nunique().max()) > 1:
                raise ValueError(
                    f"doc_id hash collision in bucket {bucket}: two distinct "
                    f"'{self.key_col}' values share a 64-bit key"
                )
        primary = self.text_cols[0]
        sort_cols = ["doc_id"] + ([self.ts_col] if self.ts_col else [])
        if primary in g.columns:
            sort_cols.append(primary)
        g = g.sort_values(sort_cols, kind="mergesort").drop_duplicates("doc_id", keep="last")

        ordinals = (np.uint64(bucket) << np.uint64(ORD_SHIFT)) + np.arange(
            len(g), dtype=np.uint64
        )
        out = g[["doc_id"] + self.stored_cols].copy()
        sums: dict[str, int] = {}
        partial_tables = []
        kw_vals = {
            c: (g[c].tolist() if c in g.columns else [None] * len(g))
            for c in self.keyword_cols
        }
        for fi, col in enumerate(self.text_cols):
            texts = pa.array(
                g[col].tolist() if col in g.columns else [None] * len(g), pa.string()
            )
            tid, terms, doc_pos, dl = arrow_tokenize(texts)
            tid, terms, doc_pos, dl = filter_tokens_np(
                tid, terms, doc_pos, dl, self.analyzer
            )
            out["dl" if fi == 0 else f"dl_{col}"] = dl
            sums[col] = int(dl.sum())
            partial_tables.append(
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
                partial_tables.append(
                    sayt_partials(
                        col, ordinals, tid, terms, doc_pos,
                        self.range_shift, self.num_shards,
                        positions=self.positions,
                    )
                )
        out["ordinal"] = ordinals
        tbl = pa.Table.from_pandas(out, preserve_index=False)
        dest = os.path.join(self.docs_dir, f"bucket={bucket:05d}.parquet")
        atomic_write_parquet(tbl, dest)
        stats = {
            "bucket": bucket,
            "rows": int(len(out)),
            "sum_dl": sums[primary],
            "sum_dl_fields": sums,
            "bytes": os.path.getsize(dest),
        }
        os.makedirs(self.stats_dir, exist_ok=True)
        spath = os.path.join(self.stats_dir, f"bucket={bucket:05d}.json")
        tmp = spath + f".tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(stats, f)
        os.replace(tmp, spath)
        partials = pa.concat_tables(partial_tables)
        if self.partials_dir is not None:
            _store_bucket_partials(
                self.partials_dir, self.docs_dir, bucket, partials,
                positions=self.positions,
            )
        return partials


class _PartialPostings:
    """Standalone tokenize->partials stage over an existing docstore
    (postings-only rebuilds and the update phase). Same output rows as
    the fused path."""

    def __init__(
        self,
        text_cols: tuple[str, ...] = ("text",),
        range_shift: int = ORD_SHIFT,
        keyword_cols: tuple[str, ...] = (),
        num_shards: int = 64,
        key_col: str = "ordinal",
        sayt_cols: tuple[str, ...] = (),
        positions: bool = False,
        analyzer: dict | None = None,
    ):
        self.analyzer = analyzer
        self.text_cols = text_cols
        self.range_shift = range_shift
        self.keyword_cols = keyword_cols
        self.num_shards = num_shards
        self.key_col = key_col
        self.sayt_cols = sayt_cols
        self.positions = positions
        self.findall = TOKEN_RE.findall

    def __call__(self, batch: pa.Table) -> pa.Table:
        ordinals = batch.column(self.key_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(ordinals, kind="stable")
        findall = self.findall
        tables = []
        take = pa.array(order)
        for fi, col in enumerate(self.text_cols):
            dl_name = "dl" if fi == 0 else f"dl_{col}"
            dls = batch.column(dl_name).to_numpy(zero_copy_only=False).astype(np.int32)
            texts = batch.column(col).take(take)
            tid, terms, doc_pos, dl = arrow_tokenize(texts)
            tid, terms, doc_pos, dl = filter_tokens_np(
                tid, terms, doc_pos, dl, self.analyzer
            )
            kw_vals = (
                {
                    c: (
                        batch.column(c).take(take).to_pylist()
                        if c in batch.column_names
                        else [None] * len(order)
                    )
                    for c in self.keyword_cols
                }
                if fi == 0
                else {}
            )
            tables.append(
                build_partials_codes(
                    ordinals[order],
                    dls[order],
                    tid,
                    terms,
                    doc_pos,
                    kw_vals,
                    self.range_shift,
                    self.num_shards,
                    term_prefix=None if fi == 0 else col,
                    positions=self.positions,
                )
            )
            if col in self.sayt_cols:
                tables.append(
                    sayt_partials(
                        col, ordinals[order], tid, terms, doc_pos,
                        self.range_shift, self.num_shards,
                        positions=self.positions,
                    )
                )
        return pa.concat_tables(tables)


def _bucket_fingerprint(docs_dir: str, bucket: int, positions: bool = False) -> list:
    st = os.stat(os.path.join(docs_dir, f"bucket={bucket:05d}.parquet"))
    # the positions flag is part of the partials' identity: toggling it
    # must invalidate checkpoints even when the docstore is unchanged
    return [st.st_size, st.st_mtime_ns, bool(positions)]


def _store_bucket_partials(
    partials_dir: str, docs_dir: str, bucket: int, partials: pa.Table,
    positions: bool = False,
) -> None:
    """Persist one bucket's packed partials with a fingerprint of its
    docstore file (hash-layout analog of the scan layout's
    checkpoint_partials, VERDICT r3 'Next round' #3)."""
    dest = os.path.join(partials_dir, f"bucket={bucket:05d}.parquet")
    atomic_write_parquet(partials, dest)
    tmp = dest + f".src.json.tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(_bucket_fingerprint(docs_dir, bucket, positions), f)
    os.replace(tmp, dest + ".src.json")


class _TokenizeBucketCheckpoint:
    """Per-bucket tokenize stage for checkpoint-enabled hash-layout
    rebuilds: a bucket whose partials checkpoint fingerprint still
    matches its docstore file is NOT re-tokenized — its packed partials
    load straight from the checkpoint. Buckets the update phase rewrote
    (``_ApplyUpdateBucket`` rewrites the parquet in place, changing
    size/mtime) re-tokenize and refresh their checkpoint. This is the
    touch-only post-update re-index: the reference's partial update
    reindexes only the changed documents
    (/root/reference/opensearch_loader/opensearch_client.py:293-299);
    here a 0.1% update batch re-tokenizes only the buckets it touched
    instead of the whole corpus."""

    def __init__(self, docs_dir: str, partials_dir: str, stage: _PartialPostings):
        self.docs_dir = docs_dir
        self.partials_dir = partials_dir
        self.stage = stage

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        tables = []
        for bucket in batch.column("bucket").to_pylist():
            path = os.path.join(self.docs_dir, f"bucket={bucket:05d}.parquet")
            if not os.path.exists(path):
                continue  # bucket never materialized (no docs hashed there)
            dest = os.path.join(self.partials_dir, f"bucket={bucket:05d}.parquet")
            fp_path = dest + ".src.json"
            if os.path.exists(dest) and os.path.exists(fp_path):
                try:
                    with open(fp_path) as f:
                        current = json.load(f) == _bucket_fingerprint(
                            self.docs_dir, bucket, self.stage.positions
                        )
                except (OSError, json.JSONDecodeError):
                    current = False
                if current:
                    tables.append(pq.read_table(dest, use_threads=False))
                    continue
            cols = set(pq.read_schema(path).names)
            want = ["ordinal", "dl"]
            want += [f"dl_{c}" for c in self.stage.text_cols[1:]]
            want += list(self.stage.text_cols) + list(self.stage.keyword_cols)
            tbl = pq.read_table(
                path, columns=[c for c in want if c in cols], use_threads=False
            )
            partials = self.stage(tbl)
            _store_bucket_partials(
                self.partials_dir, self.docs_dir, bucket, partials,
                positions=self.stage.positions,
            )
            tables.append(partials)
        return pa.concat_tables(tables) if tables else _empty_partials(self.stage.positions)


class _MergeShard:
    """Merge + encode ALL (term, range) groups of one shard in a few
    numpy passes (see raybm25.index.encode), then write the shard file
    atomically under its deterministic name (idempotent under retries;
    the returned stats row is the lineage record)."""

    def __init__(self, postings_dir: str):
        self.__name__ = "MergeShard"
        self.postings_dir = postings_dir

    def __call__(self, g: pa.Table) -> pa.Table:
        shard_id = int(g.column("shard")[0].as_py())
        tbl = self._encode(g)
        dest = os.path.join(self.postings_dir, f"shard={shard_id:05d}.parquet")
        # small row groups: the file is term-sorted, so a term filter
        # decodes only the row groups whose stats cover it
        atomic_write_parquet(
            tbl, dest, row_group_size=128, stats_cols=["term", "range", "df", "cf"]
        )
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
        poss_flat = None
        if "poss" in g.column_names:
            # positional build: the row-ordered flattened occurrence
            # stream lines up with the flattened element stream
            # (exactly tfs[i] positions per element i)
            poss_flat = (
                g.column("poss").combine_chunks().values.to_numpy(zero_copy_only=False)
            )
        enc = encode_posting_groups(
            gid_el,
            ids_col.values.to_numpy(zero_copy_only=False),
            g.column("tfs").combine_chunks().values.to_numpy(zero_copy_only=False),
            g.column("dls").combine_chunks().values.to_numpy(zero_copy_only=False),
            poss=poss_flat,
        )
        grp_first_row = np.flatnonzero(row_chg)
        out_terms = terms[row_order][grp_first_row]
        out_ranges = ranges[grp_first_row]
        # deterministic, read-friendly order within the shard file
        out_order = np.lexsort((out_ranges, out_terms)).astype(np.int64)

        def pick(lst):
            return [lst[i] for i in out_order]

        cols = {
            "term": pa.array(out_terms[out_order], pa.string()),
            "range": pa.array(out_ranges[out_order], pa.int64()),
            "df": pa.array(enc["df"][out_order], pa.int64()),
            "cf": pa.array(enc["cf"][out_order], pa.int64()),
            "doc_ids_enc": pa.array(pick(enc["doc_ids_enc"]), pa.binary()),
            "tfs_enc": pa.array(pick(enc["tfs_enc"]), pa.binary()),
            "dls_enc": pa.array(pick(enc["dls_enc"]), pa.binary()),
            "block_last_doc": enc["block_last_doc"].take(pa.array(out_order)),
            "block_max_tf": enc["block_max_tf"].take(pa.array(out_order)),
            "block_min_dl": enc["block_min_dl"].take(pa.array(out_order)),
        }
        if enc["poss_enc"] is not None:
            cols["poss_enc"] = pa.array(pick(enc["poss_enc"]), pa.binary())
        return pa.table(cols)


def _range_shift_for(num_buckets: int, range_buckets: int) -> int:
    """Salt granularity: one doc-range per `range_buckets` docstore
    buckets (known a priori — ordinals embed the bucket id)."""
    rb = max(1, range_buckets)
    bits = max(0, (rb - 1).bit_length())
    return ORD_SHIFT + bits


def _read_bucket_stats(stats_dir: str) -> list[dict]:
    out = []
    for fn in sorted(os.listdir(stats_dir)):
        if fn.endswith(".json"):
            with open(os.path.join(stats_dir, fn)) as f:
                out.append(json.load(f))
    return out


def build_index(
    source,
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
    num_buckets: int = 32,
    postings_shards: int = 64,
    range_buckets: int = 16,
    k1: float = BM25_K1,
    b: float = BM25_B,
    overwrite: bool = False,
    batch_size: int = 1024,
    checkpoint_partials: bool = False,
    positions: bool = False,
    ingest: list[dict] | None = None,
    analyzer: dict | None = None,
    relations: dict | None = None,
) -> dict:
    """Build (or resume) a full-text index at ``index_dir``.

    ``source`` is a parquet path/list (preferred: enables column pruning
    and fingerprint-based resume) or a ``ray.data.Dataset``. Returns a
    metrics dict (per-phase wall time, docs/s, sizes).

    ``checkpoint_partials``: persist each bucket's packed partials with
    a fingerprint of its docstore file, making post-update
    ``rebuild_postings`` touch-only — only buckets the update phase
    rewrote re-tokenize (the scan layout's checkpoint machinery applied
    to the hash layout; costs one extra write+read of packed partials).

    ``positions``: record each token's within-doc position and write a
    per-group ``poss_enc`` column (delta+varbyte, same codec family as
    doc ids), enabling arbitrary-length ``match_phrase`` at query time
    (OpenSearch ``text`` fields store positions by default —
    /root/reference/opensearch_loader/loader.py:311-312). Costs extra
    postings bytes (~1 varbyte per token occurrence); off by default.

    ``analyzer``: optional analyzer spec from
    :func:`raybm25.analysis.analyzer_spec` (stopword removal and/or an
    ``s`` / ``porter`` stemmer after the standard tokenizer). Recorded
    in the manifest; readers apply the identical chain to query text.

    ``relations``: optional join-field declaration (the OpenSearch
    ``join`` datatype analog) recorded verbatim in the manifest::

        {"join_field": "join_name",      # keyword col naming each doc's type
         "parent_field": "parent_key",   # stored col = parent doc's _id
         "children": {"line": "order"}}  # child type -> parent type

    Parent docs use their own ``doc_id`` as the join value (exactly
    OpenSearch's convention: a child's join field stores the parent
    ``_id``). Co-location follows OpenSearch's routing rule: give each
    child a ``doc_id`` congruent to its parent's ``doc_id`` modulo
    ``num_buckets`` and the hash bucketing puts every family in one
    docstore partition, so join queries never cross partitions.
    """
    t0 = time.perf_counter()
    metrics: dict = {"index_dir": index_dir}
    docs_dir = os.path.join(index_dir, DOCS_SUBDIR)
    stats_dir = os.path.join(index_dir, DOCS_STATS_SUBDIR)
    postings_dir = os.path.join(index_dir, POSTINGS_SUBDIR)

    if overwrite and os.path.isdir(index_dir):
        if os.path.exists(os.path.join(index_dir, "manifest.json")) or not os.listdir(index_dir):
            shutil.rmtree(index_dir)
        else:
            raise ValueError(f"refusing to overwrite non-index directory {index_dir}")

    is_path = isinstance(source, (str, list))
    fingerprint = parquet_fingerprint(source) if is_path else None
    man = load_manifest(index_dir)
    if man is None:
        man = Manifest(index_dir, {})
    range_shift = _range_shift_for(num_buckets, range_buckets)
    man.data.update(
        {
            "version": 2,
            "analyzer": analyzer_version(analyzer),
            "analyzer_spec": analyzer,
            "hash_impl": HASH_IMPL,
            "k1": k1,
            "b": b,
            "num_buckets": num_buckets,
            "num_shards": postings_shards,
            "range_shift": range_shift,
            "n_ranges": ((num_buckets - 1) >> (range_shift - ORD_SHIFT)) + 1,
            "key_col": key_col,
            "id_is_int": id_col is not None,
            "text_cols": list(text_cols),
            "keyword_cols": list(keyword_cols),
            "sayt_cols": list(sayt_cols),
            "checkpoint_partials": bool(checkpoint_partials),
            "positions": bool(positions),
            **({"relations": relations} if relations else {}),
        }
    )
    partials_dir = None
    if checkpoint_partials:
        partials_dir = os.path.join(index_dir, HASH_PARTIALS_SUBDIR)
        os.makedirs(partials_dir, exist_ok=True)

    docs_done = man.phase_committed("docs", fingerprint) and fingerprint is not None
    postings_done = man.phase_committed("postings") and docs_done

    if docs_done and postings_done:
        metrics["build_phase"] = "skipped (checkpoint)"
        metrics.update(man.data["corpus"])
        metrics["total_secs"] = time.perf_counter() - t0
        metrics["docs_per_sec"] = float("inf")
        return metrics

    if docs_done:
        # docstore checkpoint is valid — rebuild only the postings from
        # the stored docs (e.g. after an interrupted merge)
        man.commit()
        metrics["docs_phase"] = "skipped (checkpoint)"
        rebuild_postings(index_dir, batch_size=batch_size)
        man = load_manifest(index_dir)
        metrics.update(man.data["corpus"])
        metrics["n_postings"] = man.data["phases"]["postings"]["n_postings"]
        metrics["total_secs"] = time.perf_counter() - t0
        metrics["docs_per_sec"] = man.data["corpus"]["n_docs"] / metrics["total_secs"]
        return metrics
    else:
        if is_path:
            cols = {key_col, *(("html",) if extract_html else text_cols)}
            if extract_html:
                cols.update(c for c in text_cols if c != "text")
            if ts_col:
                cols.add(ts_col)
            if id_col:
                cols.add(id_col)
            cols.update(keyword_cols)
            if stored_cols:
                cols.update(stored_cols)
            if ingest:
                # ingest processors may read source columns the index
                # itself doesn't keep — include them in the pruned read
                for p in ingest:
                    spec = next(iter(p.values())) if isinstance(p, dict) else {}
                    if isinstance(spec, dict) and "field" in spec:
                        cols.add(str(spec["field"]))
                # a renamed/set output column is produced by the
                # pipeline itself; reading it would fail
                produced = set()
                for p in ingest:
                    spec = next(iter(p.values()))
                    kind = next(iter(p))
                    if kind == "rename":
                        produced.add(str(spec.get("target_field", "")))
                    elif kind == "set" and spec.get("override", True):
                        produced.add(str(spec.get("field", "")))
                cols -= produced
            # A small file count would otherwise read as 1-2 blocks and
            # serialize every downstream map stage; split to keep all
            # cores busy. (With thousands of input files the default
            # file-based splitting is already fine.)
            n_files = len(fingerprint)
            kwargs = {}
            if n_files < 64:
                ncpu = int(ray.cluster_resources().get("CPU", 8))
                kwargs["override_num_blocks"] = max(2 * ncpu, n_files)
            ds = ray.data.read_parquet(source, columns=sorted(cols), **kwargs)
        else:
            ds = source
        if ingest:
            # index-time ingest pipeline (the OpenSearch
            # ``?pipeline=`` analog): one vectorized kernel call per
            # processor per batch, compiled once per worker
            from ..loader.ingest import IngestStage

            ds = ds.map_batches(IngestStage(ingest), batch_format="pyarrow")
        if extract_html:
            # drop html right away: the dedup shuffle must not carry raw bytes
            ds = ds.map_batches(
                extract_batch, batch_format="pyarrow", fn_kwargs={"drop_html": True}
            )
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
        for d in (docs_dir, stats_dir):
            if os.path.isdir(d):
                shutil.rmtree(d)
        os.makedirs(docs_dir, exist_ok=True)
        partials = ds.groupby("__bucket").map_groups(
            _DedupTokenizeBucket(
                docs_dir=docs_dir,
                stats_dir=stats_dir,
                key_col=key_col,
                ts_col=ts_col,
                text_cols=text_cols,
                stored_cols=first_cols,
                keyword_cols=keyword_cols,
                check_collisions=id_col is None,
                range_shift=range_shift,
                num_shards=postings_shards,
                sayt_cols=sayt_cols,
                partials_dir=partials_dir,
                positions=positions,
                analyzer=analyzer,
            ),
            batch_format="pandas",
        )

    if os.path.isdir(postings_dir):
        shutil.rmtree(postings_dir)
    os.makedirs(postings_dir, exist_ok=True)
    shard_stats = (
        partials.groupby("shard")
        .map_groups(_MergeShard(postings_dir), batch_format="pyarrow")
        .to_pandas()  # one row per shard — tiny
    )
    _commit_build(man, stats_dir, text_cols, fingerprint, shard_stats)
    metrics.update(man.data["corpus"])
    metrics["n_postings"] = man.data["phases"]["postings"]["n_postings"]
    metrics["total_secs"] = time.perf_counter() - t0
    metrics["docs_per_sec"] = man.data["corpus"]["n_docs"] / metrics["total_secs"]
    return metrics


def _commit_build(
    man: Manifest,
    stats_dir: str,
    text_cols: tuple[str, ...],
    fingerprint,
    shard_stats: pd.DataFrame,
) -> None:
    """Atomic visibility commit of docstore + postings lineage."""
    bucket_stats = _read_bucket_stats(stats_dir)
    n_docs = sum(s["rows"] for s in bucket_stats)
    sum_dl = sum(s["sum_dl"] for s in bucket_stats)
    sum_dl_fields = {
        col: sum(s.get("sum_dl_fields", {}).get(col, 0) for s in bucket_stats)
        for col in text_cols
    }
    man.data["corpus"] = {
        "n_docs": n_docs,
        "sum_dl": sum_dl,
        # exact integer per-field sums: dfs_query_then_fetch merges
        # these across indices so global avgdl is bit-exact
        "sum_dl_fields": {c: int(v) for c, v in sum_dl_fields.items()},
        "avgdl": (sum_dl / n_docs) if n_docs else 0.0,
        "avgdl_fields": {
            c: (v / n_docs) if n_docs else 0.0 for c, v in sum_dl_fields.items()
        },
    }
    ph = man.phase("docs")
    ph["committed"] = True
    if fingerprint is not ...:
        ph["input_fingerprint"] = fingerprint
    ph["buckets"] = {
        str(s["bucket"]): {"rows": s["rows"], "bytes": s["bytes"]} for s in bucket_stats
    }
    php = man.phase("postings")
    php["committed"] = True
    php["shards"] = {
        str(int(r.shard)): {"rows": int(r.n_rows), "bytes": int(r.bytes)}
        for r in shard_stats.itertuples()
    }
    php["n_postings"] = int(shard_stats["n_postings"].sum()) if len(shard_stats) else 0
    man.commit()


def rebuild_postings(index_dir: str, batch_size: int = 1024) -> dict:
    """Re-derive the postings from the committed docstore (postings-only
    resume and the post-update re-index; SURVEY.md §2 B8 'v1: rebuild
    affected partitions'). Reads tokenizer/shuffle parameters from the
    manifest so the result is identical to a fresh build over the same
    stored docs."""
    man = load_manifest(index_dir)
    if man is None or not man.data.get("phases", {}).get("docs", {}).get("committed"):
        raise FileNotFoundError(f"no committed docstore at {index_dir}")
    text_cols = tuple(man.data.get("text_cols", ["text"]))
    keyword_cols = tuple(man.data.get("keyword_cols", []))
    sayt_cols = tuple(man.data.get("sayt_cols", []))
    postings_shards = int(man.data["num_shards"])
    range_shift = int(man.data["range_shift"])
    docs_dir = os.path.join(index_dir, DOCS_SUBDIR)
    stats_dir = os.path.join(index_dir, DOCS_STATS_SUBDIR)
    postings_dir = os.path.join(index_dir, POSTINGS_SUBDIR)

    stage = _PartialPostings(
        text_cols=text_cols,
        range_shift=range_shift,
        keyword_cols=keyword_cols,
        sayt_cols=sayt_cols,
        num_shards=postings_shards,
        positions=bool(man.data.get("positions")),
        analyzer=man.data.get("analyzer_spec"),
    )
    if man.data.get("checkpoint_partials"):
        # touch-only re-index: one task per bucket; buckets whose
        # partials checkpoint is still current skip the tokenize
        partials_dir = os.path.join(index_dir, HASH_PARTIALS_SUBDIR)
        os.makedirs(partials_dir, exist_ok=True)
        n_buckets = int(man.data["num_buckets"])
        buckets_ds = ray.data.from_items(
            [{"bucket": i} for i in range(n_buckets)], override_num_blocks=n_buckets
        )
        partials = buckets_ds.map_batches(
            _TokenizeBucketCheckpoint(docs_dir, partials_dir, stage),
            batch_format="pyarrow",
        )
    else:
        dl_cols = ["dl"] + [f"dl_{c}" for c in text_cols[1:]]
        docs_ds = ray.data.read_parquet(
            docs_dir, columns=["ordinal", *dl_cols, *text_cols, *keyword_cols]
        )
        partials = docs_ds.map_batches(
            stage,
            batch_format="pyarrow",
            batch_size=batch_size,
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
