"""BM25 query serving over a built index.

Implements the search side the reference delegates to OpenSearch
(SURVEY.md §2.B B6/B7): Okapi BM25 with Lucene's idf, k1=1.2, b=0.75,
single-shard (= global) statistics, deterministic ties (score desc,
doc_id asc).

Two paths, required to be result-identical (tested):
- :meth:`IndexReader.search` — exact term-at-a-time vectorized scoring;
- :meth:`IndexReader.search_pruned` — block-max pruned evaluation
  (WAND-style essential-list + block-max skipping over the per-128-doc
  block metadata written at build time; north rule "block-max
  pruning"). A doc can be skipped only when an upper bound on its
  total score is provably below the current top-k threshold, so the
  returned top-k (ids AND scores) is exactly the exact path's.

Postings reads are term-pruned parquet scans (predicate pushdown on the
``term`` column; the build writes postings sorted by term so row-group
stats prune). For distributed serving, :class:`BatchSearcher` is a
``map_batches`` actor-pool stage holding the reader open per actor
(stateful-stage rule, SURVEY.md §2 ST2).
"""

from __future__ import annotations

import math
import os
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads

from ..analysis import TOKEN_RE, tokenize
from ..codec import BLOCK_SIZE, varbyte_decode, delta_decode, decode_positions
from ..index.build import DOCS_SUBDIR, ORD_MASK, ORD_SHIFT, POSTINGS_SUBDIR
from ..index.manifest import load_manifest


def _strip_keyword(name: str) -> str:
    """``field.keyword`` sub-field aliasing (the OpenSearch multi-field
    idiom): keyword fields here ARE the stored column, so the
    ``.keyword`` suffix resolves to the base name."""
    return name[:-8] if isinstance(name, str) and name.endswith(".keyword") else name


def _ipv4_to_uint32(vals: np.ndarray) -> np.ndarray:
    """Vectorized dotted-quad -> uint32: three np.char.partition
    passes peel the octets for the whole array at once."""
    rest = np.char.asarray(vals)
    octets = []
    for _ in range(3):
        part = np.char.partition(rest, ".")
        octets.append(part[:, 0].astype(np.uint32))
        rest = part[:, 2]
    octets.append(rest.astype(np.uint32))
    if any(int(o.max(initial=0)) > 255 for o in octets):
        raise ValueError("ip_range field holds a non-IPv4 octet > 255")
    return (
        (octets[0] << np.uint32(24))
        | (octets[1] << np.uint32(16))
        | (octets[2] << np.uint32(8))
        | octets[3]
    )


def _uint32_to_ipv4(v: int) -> str:
    return f"{(v >> 24) & 255}.{(v >> 16) & 255}.{(v >> 8) & 255}.{v & 255}"


def _ip_range_bounds(rg: dict) -> tuple[str | None, str | None, int | None, int | None]:
    """One ip_range request entry -> (from_str, to_str, lo_int,
    hi_int); half-open [from, to). A CIDR ``mask`` expands to its
    enclosing block, with /0 yielding fully open bounds (OpenSearch
    reports them as absent)."""
    if "mask" in rg:
        base, _, plen_s = str(rg["mask"]).partition("/")
        plen = int(plen_s)
        if not 0 <= plen <= 32:
            raise ValueError(f"bad CIDR prefix length in {rg['mask']!r}")
        base_i = int(_ipv4_to_uint32(np.array([base], dtype=str))[0])
        if plen == 0:
            return None, None, None, None
        mask = ((1 << plen) - 1) << (32 - plen)
        lo = base_i & mask
        hi = lo + (1 << (32 - plen))
        return (
            _uint32_to_ipv4(lo),
            _uint32_to_ipv4(hi) if hi <= 0xFFFFFFFF else None,
            lo,
            hi if hi <= 0xFFFFFFFF else None,
        )
    fs = rg.get("from")
    ts = rg.get("to")
    lo = int(_ipv4_to_uint32(np.array([fs], dtype=str))[0]) if fs else None
    hi = int(_ipv4_to_uint32(np.array([ts], dtype=str))[0]) if ts else None
    return (fs, ts, lo, hi)


class TermPostings:
    __slots__ = (
        "doc_ids", "tfs", "dls", "block_last", "block_max_tf", "block_min_dl",
        "df", "norm", "norm_avgdl", "poss", "_pos_off",
    )

    def __init__(self, doc_ids, tfs, dls, block_last, block_max_tf, block_min_dl,
                 poss=None):
        self.doc_ids = doc_ids
        self.tfs = tfs
        self.dls = dls
        self.block_last = block_last
        self.block_max_tf = block_max_tf
        self.block_min_dl = block_min_dl
        self.df = int(doc_ids.size)
        # positional indexes only: flattened within-doc token positions,
        # tfs[i] ascending values per posting i (None otherwise)
        self.poss = poss
        self._pos_off = None
        # per-posting BM25 tf-norm is a pure function of (tf, dl, avgdl)
        # — computed once on first scoring, reused across queries (a
        # term belongs to exactly one field, so one avgdl applies)
        self.norm = None
        self.norm_avgdl = None

    def pos_offsets(self) -> np.ndarray:
        """Posting index -> offsets into the flat ``poss`` stream
        (cumsum of tfs), computed once per decoded term."""
        if self._pos_off is None:
            off = np.zeros(self.tfs.size + 1, dtype=np.int64)
            np.cumsum(self.tfs, out=off[1:])
            self._pos_off = off
        return self._pos_off


class IndexReader:
    def __init__(self, index_dir: str):
        man = load_manifest(index_dir)
        if man is None or not man.phase_committed("postings"):
            raise FileNotFoundError(f"no committed index at {index_dir}")
        self.index_dir = index_dir
        self.manifest = man.data
        corpus = man.data["corpus"]
        self.n_docs = int(corpus["n_docs"])
        self.avgdl = float(corpus["avgdl"])
        self.k1 = float(man.data["k1"])
        self.b = float(man.data["b"])
        self.num_buckets = int(man.data["num_buckets"])
        self.layout = man.data.get("layout", "hash")
        self.analyzer_spec = man.data.get("analyzer_spec")
        self.docstore_prefix = man.data.get("docstore_prefix", "bucket")
        self.key_buckets = int(man.data.get("key_buckets", 0))
        # join-field declaration (OpenSearch ``join`` datatype): see
        # index.build.build_index(relations=...)
        self.relations = man.data.get("relations") or {}
        self.num_shards = int(man.data.get("num_shards", 0))
        self.n_ranges = int(man.data.get("n_ranges", 1))
        self._postings_dir = os.path.join(index_dir, POSTINGS_SUBDIR)
        self._docs_dir = os.path.join(index_dir, DOCS_SUBDIR)
        # per-shard footer cache: (ParquetFile, per-row-group term
        # min/max). Row-group pruning runs against these in-memory
        # stats, so a term lookup touches disk only for the row groups
        # that can contain it (absent terms cost ~no I/O at all).
        self._shard_pf: dict[str, tuple] = {}
        # per-bucket ordinal->doc_id arrays (docstore row order IS the
        # mapping), loaded lazily
        self._bucket_ids: dict[int, np.ndarray] = {}
        # per-(bucket, column) docstore doc-value cache (facets etc.)
        self._bucket_cols: dict[tuple[int, str], np.ndarray] = {}
        # term dictionary cache: "" = raw all-fields array, else per field
        self._term_dicts: dict[str, pa.Array] = {}
        self._field_stats: dict[str, dict] = {}
        self._scan_memo: dict[str, np.ndarray] = {}
        # decoded-postings LRU (the reference's query-serving cache
        # analog, SURVEY.md §2 ST2): hot Zipf-head terms are re-queried
        # constantly; capped by posting count, not entry count
        self._term_cache: dict[str, TermPostings] = {}
        self._term_cache_postings = 0
        self.term_cache_max_postings = 5_000_000

    def _map_ordinals(self, ordinals: np.ndarray) -> np.ndarray:
        """Dense postings ordinals -> original doc ids via the docstore
        bucket files (bucket = ord >> ORD_SHIFT, row = ord & ORD_MASK)."""
        import pyarrow.parquet as pq

        ordinals = np.asarray(ordinals, dtype=np.uint64)
        buckets = (ordinals >> np.uint64(ORD_SHIFT)).astype(np.int64)
        rows = (ordinals & np.uint64(ORD_MASK)).astype(np.int64)
        out = np.empty(ordinals.size, dtype=np.uint64)
        for b in np.unique(buckets):
            arr = self._bucket_ids.get(int(b))
            if arr is None:
                path = os.path.join(
                    self._docs_dir, f"{self.docstore_prefix}={int(b):05d}.parquet"
                )
                arr = (
                    pq.read_table(path, columns=["doc_id"])
                    .column("doc_id")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.uint64)
                )
                self._bucket_ids[int(b)] = arr
            m = buckets == b
            out[m] = arr[rows[m]]
        return out

    def _gather_column(self, ordinals: np.ndarray, column: str) -> np.ndarray:
        """Docstore column values for a set of postings ordinals,
        grouped into one pruned read per touched bucket file (the same
        access pattern as ``_map_ordinals``; values cached per
        (bucket, column)). At cluster scale this is the doc-value read:
        each bucket file is a self-contained partition, so a facet
        over millions of candidates fans out to per-bucket tasks."""
        import pyarrow.parquet as pq

        column = _strip_keyword(column)
        ordinals = np.asarray(ordinals, dtype=np.uint64)
        buckets = (ordinals >> np.uint64(ORD_SHIFT)).astype(np.int64)
        rows = (ordinals & np.uint64(ORD_MASK)).astype(np.int64)
        out = None
        for b in np.unique(buckets):
            key = (int(b), column)
            arr = self._bucket_cols.get(key)
            if arr is None:
                path = os.path.join(
                    self._docs_dir, f"{self.docstore_prefix}={int(b):05d}.parquet"
                )
                arr = pq.read_table(path, columns=[column]).column(column).to_numpy(
                    zero_copy_only=False
                )
                self._bucket_cols[key] = arr
            if out is None:
                # numeric doc-value columns keep their native dtype
                # (aggs do vectorized math on the result); strings stay
                # object
                out = np.empty(ordinals.size, dtype=arr.dtype)
            m = buckets == b
            out[m] = arr[rows[m]]
        if out is None:
            out = np.empty(0, dtype=object)
        return out

    def _shard_paths(self, terms: list[str]) -> list[str]:
        """Shard files that can contain the given terms: at most
        n_ranges files per term (usually 1) instead of every shard."""
        import numpy as np

        from ..index.build import shard_of

        if not self.num_shards or self.n_ranges > 4096:
            import glob

            return sorted(glob.glob(os.path.join(self._postings_dir, "*.parquet")))
        shards: set[int] = set()
        t_arr = np.array(terms, dtype=object)
        for r in range(self.n_ranges):
            rng = np.full(len(terms), r, dtype=np.int64)
            shards.update(shard_of(t_arr, rng, self.num_shards).tolist())
        committed = self.manifest.get("phases", {}).get("postings", {}).get("shards")
        paths = []
        for s in sorted(shards):
            if committed is not None and str(s) not in committed:
                continue  # shard never produced (no terms hashed there)
            p = os.path.join(self._postings_dir, f"shard={s:05d}.parquet")
            if not os.path.exists(p):
                raise FileNotFoundError(
                    f"index corrupt: committed postings shard {s} missing at {p}"
                )
            paths.append(p)
        return paths

    # ------------------------------------------------------------- postings
    def _shard_entry(self, path: str) -> tuple:
        """Memoized per-shard parquet handle + row-group term statistics
        (min/max per group for term pruning) + column names."""
        entry = self._shard_pf.get(path)
        if entry is None:
            import pyarrow.parquet as pq

            pf = pq.ParquetFile(path)
            md = pf.metadata
            term_idx = pf.schema_arrow.get_field_index("term")
            mins, maxs = [], []
            for gi in range(md.num_row_groups):
                st = md.row_group(gi).column(term_idx).statistics
                mins.append(st.min if st else "")
                maxs.append(st.max if st else "\U0010ffff")
            cols = list(pf.schema_arrow.names)
            entry = self._shard_pf[path] = (pf, mins, maxs, cols)
        return entry

    def load_postings(
        self, terms: list[str], positions: bool = False
    ) -> dict[str, TermPostings]:
        """Load + decode postings for a set of terms (term-pruned scan).

        Rows for one term are segments keyed by doc-range; ranges are
        monotone in doc_id, so sorting segments by ``range`` and
        concatenating yields the globally doc_id-sorted posting list
        with no merge (the salting invariant from the build).

        ``positions=False`` (the default — every pure-BM25 / filter /
        agg path) neither reads nor decodes the ``poss_enc`` column:
        positions are the LARGEST postings payload (~one varint per
        token occurrence vs one per doc for ids/tfs), and eagerly
        dragging them through parquet decompression made every cold
        head-term load 3-5x slower once positional indexing landed.
        Phrase / span / interval paths pass ``positions=True``; a term
        cached without positions is transparently reloaded with them."""
        if not terms:
            return {}
        cached = {
            t: self._term_cache[t]
            for t in terms
            if t in self._term_cache
            and (not positions or self._term_cache[t].poss is not None)
        }
        terms = [t for t in terms if t not in cached]
        if not terms:
            return cached
        paths = self._shard_paths(terms)
        if not paths:
            return cached
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        tables = []
        for p in paths:
            pf, mins, maxs, cols = self._shard_entry(p)
            groups = [
                gi
                for gi in range(len(mins))
                if any(mins[gi] <= t <= maxs[gi] for t in terms)
            ]
            if not groups:
                continue
            want_cols = [c for c in cols if c != "poss_enc" or positions]
            t = pf.read_row_groups(groups, columns=want_cols)
            mask = pc.is_in(t.column("term"), value_set=pa.array(terms, pa.string()))
            t = t.filter(mask)
            if t.num_rows:
                tables.append(t)
        if not tables:
            return cached
        tbl = pa.concat_tables(tables).combine_chunks()
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            tbl, sort_keys=[("term", "ascending"), ("range", "ascending")]
        )
        tbl = tbl.take(idx)
        term_col = tbl.column("term").to_pylist()
        ids_enc = tbl.column("doc_ids_enc")
        tfs_enc = tbl.column("tfs_enc")
        dls_enc = tbl.column("dls_enc")
        pos_col = tbl.column("poss_enc") if "poss_enc" in tbl.column_names else None
        bl_col = tbl.column("block_last_doc")
        btf_col = tbl.column("block_max_tf")
        bdl_col = tbl.column("block_min_dl")
        out: dict[str, TermPostings] = {}
        i = 0
        n = len(term_col)
        while i < n:
            j = i
            while j < n and term_col[j] == term_col[i]:
                j += 1
            rows = range(i, j)
            ids = np.concatenate(
                [delta_decode(varbyte_decode(ids_enc[r].as_buffer())) for r in rows]
            )
            tf_rows = [varbyte_decode(tfs_enc[r].as_buffer()) for r in rows]
            tfs = np.concatenate(tf_rows)
            dls = np.concatenate([varbyte_decode(dls_enc[r].as_buffer()) for r in rows])
            poss = None
            if pos_col is not None:
                poss = np.concatenate(
                    [
                        decode_positions(pos_col[r].as_buffer(), tf_rows[ri])
                        for ri, r in enumerate(rows)
                    ]
                )
            block_last = np.concatenate(
                [np.asarray(bl_col[r].values, dtype=np.uint64) for r in rows]
            )
            bmax_tf = np.concatenate(
                [np.asarray(btf_col[r].values, dtype=np.int64) for r in rows]
            )
            bmin_dl = np.concatenate(
                [np.asarray(bdl_col[r].values, dtype=np.int64) for r in rows]
            )
            tp = TermPostings(ids, tfs, dls, block_last, bmax_tf, bmin_dl, poss)
            out[term_col[i]] = tp
            self._cache_put(term_col[i], tp)
            i = j
        out.update(cached)
        return out

    def warm_cache(
        self, queries: list[str], fields: list[str] | None = None
    ) -> dict[str, TermPostings]:
        """Decode-once warm set for a serving pool: postings (and
        precomputed BM25 tf-norms) for every term of ``queries``.
        ``ray.put`` the returned dict and hand the ref to
        :class:`BatchSearcher(warm=...)` — each actor then seeds its
        term cache from the object store zero-copy instead of
        re-decoding the same head-term posting lists per actor."""
        terms: set[str] = set()
        for q in queries:
            for f in [None, *(fields or [])]:
                terms.update(self.field_terms(q, f))
        postings = self.load_postings(sorted(terms))
        text_cols = set(self.manifest.get("text_cols") or [])
        for t, tp in postings.items():
            # precompute the tf-norm with the owning field's avgdl
            # (prefixed terms belong to secondary text fields; bare
            # terms to the primary field). Keyword-filter terms keep a
            # lazy norm — they're filters, not scored.
            fld = t.split(":", 1)[0] if ":" in t else None
            if fld is None:
                self._norm_cached(tp, self.avgdl)
            elif fld in text_cols:
                self._norm_cached(tp, self.field_avgdl(fld))
        return postings

    def seed_cache(self, warm: dict[str, TermPostings]) -> None:
        """Adopt a broadcast warm set into this reader's term cache
        (same size accounting / eviction as organically-loaded terms)."""
        for t, tp in warm.items():
            if t not in self._term_cache:
                self._cache_put(t, tp)

    def _cache_put(self, term: str, tp: TermPostings) -> None:
        limit = self.term_cache_max_postings
        if tp.df > limit:
            return
        old = self._term_cache.pop(term, None)
        if old is not None:  # positions upgrade replaces the entry
            self._term_cache_postings -= old.df
        while self._term_cache_postings + tp.df > limit and self._term_cache:
            # newest-first (MRU-style) eviction, MEASURED: true LRU
            # (touch-on-hit + evict-oldest) thrashed a cyclic query set
            # whose working set exceeds the cap — the classic
            # sequential-flooding pathology — and regressed warm p50
            # 2.1 -> 38.8 ms on the bench index; popitem keeps a stable
            # cached subset and is optimal for looping access patterns
            _, old = self._term_cache.popitem()
            self._term_cache_postings -= old.df
        self._term_cache[term] = tp
        self._term_cache_postings += tp.df

    def _norm(self, tfs: np.ndarray, dls: np.ndarray, avgdl: float | None = None) -> np.ndarray:
        # association pinned: (1-b) + (b*dl)/avgdl — see codec.tf_norm
        avgdl = self.avgdl if avgdl is None else avgdl
        tf = tfs.astype(np.float64)
        return tf / (tf + self.k1 * (1.0 - self.b + self.b * dls.astype(np.float64) / avgdl))

    @staticmethod
    def _merge_unique(parts: list[np.ndarray]) -> np.ndarray:
        """Sorted-unique union of already-sorted id arrays: stable sort
        (radix for 8-byte ints) + boundary dedup — measurably faster
        than np.unique's comparison sort on posting-list unions."""
        if len(parts) == 1:
            return parts[0]
        allv = np.sort(np.concatenate(parts), kind="stable")
        if allv.size == 0:
            return allv
        keep = np.empty(allv.size, dtype=bool)
        keep[0] = True
        np.not_equal(allv[1:], allv[:-1], out=keep[1:])
        return allv[keep]

    def _norm_cached(self, p: TermPostings, avgdl: float) -> np.ndarray:
        """Per-posting tf-norm, computed once per decoded term and
        reused across queries (bit-identical — same elementwise ops)."""
        if p.norm is None or p.norm_avgdl != avgdl:
            p.norm = self._norm(p.tfs, p.dls, avgdl)
            p.norm_avgdl = avgdl
        return p.norm

    @property
    def primary_field(self) -> str:
        return (self.manifest.get("text_cols") or ["text"])[0]

    def field_avgdl(self, field: str | None) -> float:
        """avgdl of a text field (per-field BM25 stats); the primary
        field (first in text_cols) is the default."""
        if field is None or field == self.primary_field:
            return self.avgdl
        fields = self.manifest.get("corpus", {}).get("avgdl_fields", {})
        if field not in fields:
            raise KeyError(f"unknown text field {field!r}; indexed: {sorted(fields)}")
        return float(fields[field])

    def _analyze(self, query: str) -> list[str]:
        """Query-side analyzer: the identical chain the index was
        built with (manifest ``analyzer_spec``; stopwords + stemmer
        after the standard tokenizer). Default indexes take the plain
        tokenize fast path."""
        if self.analyzer_spec is None:
            return tokenize(query)
        from ..analysis import analyze

        return analyze(query, self.analyzer_spec)

    def field_terms(self, query: str, field: str | None) -> list[str]:
        toks = self._analyze(query)
        if field is None or field == self.primary_field:
            return toks
        return [f"{field}:{t}" for t in toks]

    def idf(self, df: int) -> float:
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    # ------------------------------------------------------------- search
    def _rank(self, ordinals: np.ndarray, scores: np.ndarray, k: int):
        """Top-k by (score desc, doc_id asc). Candidates are keyed by
        ordinal; ordinal order within a bucket follows doc_id order but
        not across buckets, so ties at the k boundary are re-broken on
        the mapped doc ids before the final cut."""
        if scores.size > 4 * k > 0:
            # cheap pre-cut: keep only candidates that can make top-k
            # (score >= kth-best, ties included) before the full sort
            top = np.argpartition(-scores, k - 1)[:k]
            s_min = scores[top].min()
            keep = np.flatnonzero(scores >= s_min)
            ordinals = ordinals[keep]
            scores = scores[keep]
        order = np.lexsort((ordinals, -scores))
        if order.size > k:
            s_k = scores[order[k - 1]]
            m = int(np.searchsorted(-scores[order], -s_k, side="right"))
        else:
            m = order.size
        cand = order[:m]
        dids = self._map_ordinals(ordinals[cand])
        final = np.lexsort((dids, -scores[cand]))[:k]
        return dids[final], scores[cand][final]

    def search(self, query: str, k: int = 10, field: str | None = None) -> list[tuple[int, float]]:
        """Exact BM25 top-k (ties: score desc, doc_id asc)."""
        avgdl = self.field_avgdl(field)
        qcounts = Counter(self.field_terms(query, field))
        postings = self.load_postings(sorted(qcounts))
        return self._exact_topk(qcounts, postings, avgdl, k)

    def _synonym_group(
        self, variants: list[str], field: str | None
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
        """Union a synonym group's postings into one pseudo-term:
        (ordinals, tf_sum, dl, df_blend). Each variant is analyzed with
        the index's chain; per Lucene's SynonymQuery the pseudo-term's
        docFreq is the MAX member docFreq and per-doc tf is the SUM of
        member tfs (org.apache.lucene.search.SynonymQuery — query-time
        synonym expansion without re-indexing)."""
        terms: list[str] = []
        for v in variants:
            terms.extend(self.field_terms(str(v), field))
        present = [
            p for t, p in sorted(self.load_postings(sorted(set(terms))).items())
        ]
        if not present:
            e = np.empty(0, np.uint64)
            return e, np.empty(0, np.float64), np.empty(0, np.float64), 0
        union = self._merge_unique([p.doc_ids for p in present])
        tf = np.zeros(union.size, np.float64)
        dl = np.zeros(union.size, np.float64)
        for p in present:
            idx = np.searchsorted(union, p.doc_ids)
            tf[idx] += p.tfs
            dl[idx] = p.dls
        return union, tf, dl, max(p.df for p in present)

    def search_synonym(
        self, variants: list[str], k: int = 10, field: str | None = None
    ) -> list[tuple[int, float]]:
        """Blended top-k over a synonym group (Lucene SynonymQuery
        scoring: ``idf(max df) * tf_norm(sum tf, dl)``)."""
        union, tf, dl, df = self._synonym_group(variants, field)
        if union.size == 0:
            return []
        avgdl = self.field_avgdl(field)
        scores = self.idf(df) * self._norm(tf, dl, avgdl)
        ids, sc = self._rank(union, scores, k)
        return list(zip(ids.tolist(), sc.tolist()))

    def synonym_docs(self, variants: list[str], field: str | None = None) -> np.ndarray:
        """Filter-context synonym match: sorted doc ids where ANY
        variant's analyzed term occurs."""
        union, _, _, _ = self._synonym_group(variants, field)
        if union.size == 0:
            return np.empty(0, np.uint64)
        return np.sort(self._map_ordinals(union).astype(np.uint64))

    def _combine_rank(
        self, parts_ids: list[np.ndarray], parts_scores: list[np.ndarray], k: int
    ) -> list[tuple[int, float]]:
        """Merge-combine per-term contribution runs and rank top-k.

        Each part's postings are already doc-sorted, so a STABLE argsort
        over the concatenated runs is near-linear, replacing np.unique +
        the slow np.add.at scatter. Stability keeps equal ids in part
        (term) order, and the segmented sum below adds LEFT-TO-RIGHT
        within each group (one vectorized pass per part —
        np.add.reduceat would NOT do: its reduction order differs by
        1 ulp), so every score bit matches add.at."""
        if not parts_ids:
            return []
        uniq, scores = self._combine(parts_ids, parts_scores)
        ids, sc = self._rank(uniq, scores, k)
        return list(zip(ids.tolist(), sc.tolist()))

    @staticmethod
    def _combine(
        parts_ids: list[np.ndarray], parts_scores: list[np.ndarray]
    ) -> tuple[np.ndarray, np.ndarray]:
        """(sorted-unique ordinals, combined scores) for per-term runs —
        the merge-combine kernel shared by ranked search and cursor
        pagination."""
        if len(parts_ids) == 1:
            return parts_ids[0], parts_scores[0]
        all_ids = np.concatenate(parts_ids)
        all_scores = np.concatenate(parts_scores)
        order = np.argsort(all_ids, kind="stable")
        sa = all_ids[order]
        ss = all_scores[order]
        starts = np.empty(sa.size, dtype=bool)
        starts[0] = True
        np.not_equal(sa[1:], sa[:-1], out=starts[1:])
        start_idx = np.flatnonzero(starts)
        uniq = sa[start_idx]
        counts = np.diff(np.append(start_idx, sa.size))
        scores = ss[start_idx].copy()
        for off in range(1, int(counts.max())):
            m = counts > off
            scores[m] += ss[start_idx[m] + off]
        return uniq, scores

    def _exact_topk(
        self,
        qcounts: Counter,
        postings: dict[str, TermPostings],
        avgdl: float,
        k: int,
    ) -> list[tuple[int, float]]:
        parts_ids, parts_scores = [], []
        for term in sorted(qcounts):
            p = postings.get(term)
            if p is None:
                continue
            contrib = qcounts[term] * self.idf(p.df) * self._norm_cached(p, avgdl)
            parts_ids.append(p.doc_ids)
            parts_scores.append(contrib)
        return self._combine_rank(parts_ids, parts_scores, k)

    def search_multi(
        self, query: str, fields: list[str], k: int = 10
    ) -> list[tuple[int, float]]:
        """Multi-field BM25 top-k — OpenSearch ``multi_match`` with
        ``most_fields`` semantics, the query shape the reference's
        sayt-heavy default mappings exist to serve
        (/root/reference/opensearch_loader/loader.py:239-275): each
        field is scored as its own BM25 query (per-field avgdl and
        per-field df over that field's postings; n_docs stays
        corpus-global in idf) and a doc's score is the SUM of its
        per-field scores. Summation order: fields in the given order,
        terms sorted within each field (deterministic; mirrored by the
        SQL oracle)."""
        per_field: list[tuple[Counter, float]] = []
        want: list[str] = []
        for field in fields:
            qcounts = Counter(self.field_terms(query, field))
            per_field.append((qcounts, self.field_avgdl(field)))
            want.extend(qcounts)
        postings = self.load_postings(sorted(set(want)))
        parts_ids, parts_scores = [], []
        for qcounts, avgdl in per_field:
            for term in sorted(qcounts):
                p = postings.get(term)
                if p is None:
                    continue
                contrib = qcounts[term] * self.idf(p.df) * self._norm_cached(p, avgdl)
                parts_ids.append(p.doc_ids)
                parts_scores.append(contrib)
        return self._combine_rank(parts_ids, parts_scores, k)

    def search_combined(
        self, query: str, fields, k: int = 10
    ) -> list[tuple[int, float]]:
        """OpenSearch ``combined_fields`` — Lucene CombinedFieldQuery's
        BM25F "simple" weighted-field combination (Robertson & Zaragoza
        2009 §3.3): the listed fields are scored as ONE pseudo-field
        whose per-doc term frequency, length and average length are the
        weighted sums

            tf~(t,d)  = sum_f w_f * tf_f(t,d)
            dl~(d)    = sum_f w_f * dl_f(d)
            avgdl~    = sum_f w_f * avgdl_f

        and whose document frequency is |{d : t in ANY listed field}|.
        Per-term score = idf(df) * tf~/(tf~ + k1*((1-b) + (b*dl~)/avgdl~)),
        summed over sorted query terms (the oracle's FULL-JOIN order).

        ``fields``: a list of names (weight 1.0) or ``{name: weight}``.
        dl~ needs every field's length for every CANDIDATE doc (not just
        docs matching in that field), so lengths come from the docstore
        dl doc-values via one pruned per-bucket read, not the postings.
        """
        items = (
            list(fields.items())
            if isinstance(fields, dict)
            else [(f, 1.0) for f in fields]
        )
        qcounts = Counter(self._analyze(query))
        terms = sorted(qcounts)
        avgdlc = 0.0
        for f, w in items:
            avgdlc += w * self.field_avgdl(f)

        def _key(t: str, f: str) -> str:
            return t if f == self.primary_field else f"{f}:{t}"

        postings = self.load_postings(
            sorted({_key(t, f) for t in terms for f, _ in items})
        )
        parts_ids: list[np.ndarray] = []
        parts_scores: list[np.ndarray] = []
        for t in terms:
            present = [
                (f, w, postings[_key(t, f)])
                for f, w in items
                if _key(t, f) in postings
            ]
            if not present:
                continue
            union = self._merge_unique([p.doc_ids for _, _, p in present])
            tfw = np.zeros(union.size, np.float64)
            for _, w, p in present:
                tfw[np.searchsorted(union, p.doc_ids)] += w * p.tfs
            dlw = np.zeros(union.size, np.float64)
            for f, w in items:
                col = "dl" if f == self.primary_field else f"dl_{f}"
                dlw += w * self._gather_column(union, col).astype(np.float64)
            contrib = (
                qcounts[t] * self.idf(union.size) * self._norm(tfw, dlw, avgdlc)
            )
            parts_ids.append(union)
            parts_scores.append(contrib)
        return self._combine_rank(parts_ids, parts_scores, k)

    def search_with_stats(
        self,
        query: str,
        k: int,
        n_docs: int,
        avgdl: float,
        dfs: dict[str, int],
        field: str | None = None,
    ) -> list[tuple[int, float]]:
        """Exact BM25 top-k scored with EXTERNAL corpus statistics —
        the per-shard query phase of ``dfs_query_then_fetch``
        (:func:`search_dfs`). Identical float chain to :meth:`search`
        (sorted-term left-to-right accumulation, cached tf-norms keyed
        by the avgdl actually used), so a corpus split across indices
        scores bit-identically to the unsplit index."""
        qcounts = Counter(self.field_terms(query, field))
        postings = self.load_postings(sorted(qcounts))
        parts_ids, parts_scores = [], []
        for term in sorted(qcounts):
            p = postings.get(term)
            if p is None:
                continue
            df = int(dfs.get(term, p.df))
            idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            contrib = qcounts[term] * idf * self._norm_cached(p, avgdl)
            parts_ids.append(p.doc_ids)
            parts_scores.append(contrib)
        return self._combine_rank(parts_ids, parts_scores, k)

    def term_dfs(self, query: str, field: str | None = None) -> dict[str, int]:
        """Per-term document frequencies for a query's analyzed terms —
        the DFS (pre-query statistics) phase of dfs_query_then_fetch.
        Terms absent from this index report 0."""
        terms = sorted(set(self.field_terms(query, field)))
        postings = self.load_postings(terms)
        return {t: (postings[t].df if t in postings else 0) for t in terms}

    def search_dismax(
        self,
        query: str,
        fields: list[str],
        tie_breaker: float = 0.0,
        k: int = 10,
    ) -> list[tuple[int, float]]:
        """Multi-field BM25 top-k — OpenSearch ``multi_match`` with
        ``best_fields`` semantics (the default multi_match type, i.e. a
        ``dis_max`` over per-field match queries): each field is scored
        as its own BM25 query (per-field avgdl/df, corpus-global
        n_docs — same per-field model as ``search_multi``) and a doc's
        score is its BEST field score plus ``tie_breaker`` times the
        sum of the remaining field scores:

            score = max_f(s_f) + tie_breaker * (sum_f(s_f) - max_f(s_f))

        Float order is pinned for the SQL oracle: per-field sums add
        terms in sorted order (the ``_combine`` order), the cross-field
        max folds pairwise in the given field order (exact — max has no
        rounding), and the cross-field total adds left-to-right in
        field order."""
        per_field: list[tuple[Counter, float]] = []
        want: list[str] = []
        for field in fields:
            qcounts = Counter(self.field_terms(query, field))
            per_field.append((qcounts, self.field_avgdl(field)))
            want.extend(qcounts)
        postings = self.load_postings(sorted(set(want)))
        field_runs: list[tuple[np.ndarray, np.ndarray]] = []
        for qcounts, avgdl in per_field:
            parts_ids, parts_scores = [], []
            for term in sorted(qcounts):
                p = postings.get(term)
                if p is None:
                    continue
                contrib = qcounts[term] * self.idf(p.df) * self._norm_cached(p, avgdl)
                parts_ids.append(p.doc_ids)
                parts_scores.append(contrib)
            if parts_ids:
                field_runs.append(self._combine(parts_ids, parts_scores))
        if not field_runs:
            return []
        union = self._merge_unique([u for u, _ in field_runs])
        best = np.zeros(union.size, dtype=np.float64)
        total = np.zeros(union.size, dtype=np.float64)
        for uniq, sc in field_runs:
            aligned = np.zeros(union.size, dtype=np.float64)
            aligned[np.searchsorted(union, uniq)] = sc
            np.maximum(best, aligned, out=best)
            total += aligned
        scores = best + tie_breaker * (total - best)
        ids, sc = self._rank(union, scores, k)
        return list(zip(ids.tolist(), sc.tolist()))

    def _bool_prefix_parts(
        self, query: str, field: str | None
    ) -> tuple[list[np.ndarray], list[np.ndarray]]:
        """(parts_ids, parts_scores) for one field's match_bool_prefix:
        every analyzed token but the last as a BM25-scored term clause
        (sorted-term order), the last token as a constant-score-1.0
        prefix clause appended after them (Lucene's multi-term
        constant-score rewrite — same convention as ``wildcard`` /
        ``prefix`` here)."""
        raw = tokenize(query)
        if not raw:
            return [], []
        terms = self.field_terms(query, field)
        qcounts = Counter(terms[:-1])
        postings = self.load_postings(sorted(qcounts))
        avgdl = self.field_avgdl(field)
        parts_ids: list[np.ndarray] = []
        parts_scores: list[np.ndarray] = []
        for term in sorted(qcounts):
            p = postings.get(term)
            if p is None:
                continue
            contrib = qcounts[term] * self.idf(p.df) * self._norm_cached(p, avgdl)
            parts_ids.append(p.doc_ids)
            parts_scores.append(contrib)
        exp = self.expand_prefix(raw[-1], field)
        if field is not None and field != self.primary_field:
            exp = [f"{field}:{t}" for t in exp]
        pexp = self.load_postings(sorted(exp))
        pparts = [pexp[t].doc_ids for t in sorted(pexp)]
        if pparts:
            pords = self._merge_unique(pparts)
            parts_ids.append(pords)
            parts_scores.append(np.ones(pords.size, dtype=np.float64))
        return parts_ids, parts_scores

    def match_bool_prefix(
        self, query: str, k: int = 10, field: str | None = None
    ) -> list[tuple[int, float]]:
        """OpenSearch ``match_bool_prefix`` — the query shape behind
        search-as-you-type: the analyzed input's last token becomes a
        ``prefix`` clause (term-dictionary expansion, constant score
        1.0), every earlier token a BM25-scored ``term`` clause, all
        OR'd as a bool ``should``. The reference's sayt-heavy default
        mappings (/root/reference/opensearch_loader/loader.py:239-275)
        exist to serve exactly this query family. Summation order is
        pinned for the SQL oracle: scored terms in sorted order, the
        prefix clause's single 1.0 added last (one float add — exact
        in any association)."""
        parts_ids, parts_scores = self._bool_prefix_parts(query, field)
        return self._combine_rank(parts_ids, parts_scores, k)

    def search_bool_prefix_multi(
        self, query: str, fields: list[str], k: int = 10
    ) -> list[tuple[int, float]]:
        """Multi-field ``multi_match`` with ``type: bool_prefix``: a
        ``match_bool_prefix`` per field with the per-field score sum
        combination (OpenSearch combines bool_prefix field scores the
        most_fields way). Summation order: fields in the given order,
        each field's clauses as in ``match_bool_prefix``."""
        parts_ids: list[np.ndarray] = []
        parts_scores: list[np.ndarray] = []
        for field in fields:
            pi, ps = self._bool_prefix_parts(query, field)
            parts_ids.extend(pi)
            parts_scores.extend(ps)
        return self._combine_rank(parts_ids, parts_scores, k)

    def match_bool_prefix_docs(
        self, query: str, field: str | None = None
    ) -> np.ndarray:
        """Unscored doc-id set for ``match_bool_prefix`` (filter /
        must_not contexts): union of the head terms' postings and the
        last token's prefix expansion."""
        parts_ids, _ = self._bool_prefix_parts(query, field)
        if not parts_ids:
            return np.array([], dtype=np.uint64)
        return np.sort(
            self._map_ordinals(self._merge_unique(parts_ids)).astype(np.uint64)
        )

    def knn_vectors(self, column: str) -> tuple[np.ndarray, np.ndarray]:
        """(live ordinals, row-normalized float64 matrix) for a stored
        vector doc-value column — the OpenSearch ``knn_vector`` field
        analog (a ``list<float>`` docstore column declared via
        ``stored_cols``). Loaded once per reader and cached: one pruned
        per-bucket parquet read, rows restricted to live (untombstoned)
        docs. This in-memory matrix is the single-node brute-force
        baseline; the 100-TB path is ``extras.similarity.ivf_build`` /
        ``ivf_search`` (per-centroid parquet buckets, probed reads).

        The load is Arrow-native (list values buffer -> one reshape per
        chunk, no per-row Python objects), rows whose vector is null
        are skipped (docs indexed without the field — partial ``_bulk``
        docs, late-added mappings — are simply not knn candidates, the
        OpenSearch behavior), ragged dimensions are a hard error, and
        the total matrix is capped at ``knn_max_rows`` rows so a
        mistyped ``knn`` query against a huge index fails fast with a
        pointer to the IVF path instead of OOMing the serving actor."""
        cached = getattr(self, "_knn_cache", {}).get(column)
        if cached is not None:
            return cached
        import glob

        import pyarrow.parquet as pq

        max_rows = int(getattr(self, "knn_max_rows", 2_000_000))
        ords_parts: list[np.ndarray] = []
        mats: list[np.ndarray] = []
        dim: int | None = None
        total = 0
        for path in sorted(
            glob.glob(os.path.join(self._docs_dir, f"{self.docstore_prefix}=*.parquet"))
        ):
            b = int(os.path.basename(path).split("=")[1].split(".")[0])
            col = pq.read_table(path, columns=[column]).column(column)
            row_base = 0
            for chunk in col.chunks:
                n = len(chunk)
                if n == 0:
                    continue
                valid = np.asarray(chunk.is_valid())
                sub = chunk.drop_null() if not valid.all() else chunk
                if len(sub) == 0:
                    row_base += n
                    continue
                if pa.types.is_fixed_size_list(sub.type):
                    d = sub.type.list_size
                    lens = None
                else:
                    lens = sub.value_lengths().to_numpy(zero_copy_only=False)
                    d = int(lens[0]) if lens.size else 0
                    if lens.size and not (lens == d).all():
                        raise ValueError(
                            f"knn column {column!r} has ragged vector lengths "
                            f"(expected every row dim={d})"
                        )
                if dim is None:
                    dim = d
                elif d != dim:
                    raise ValueError(
                        f"knn column {column!r} dimension mismatch across "
                        f"partitions: {d} != {dim}"
                    )
                # flatten() honors list offsets/slices; the float values
                # then reshape without copying rows through Python
                flat = sub.flatten().to_numpy(zero_copy_only=False)
                mats.append(
                    np.ascontiguousarray(flat, dtype=np.float64).reshape(len(sub), d)
                )
                ords_parts.append(
                    (np.uint64(b) << np.uint64(ORD_SHIFT))
                    + (row_base + np.flatnonzero(valid)).astype(np.uint64)
                )
                total += len(sub)
                if total > max_rows:
                    raise ValueError(
                        f"knn column {column!r} exceeds knn_max_rows="
                        f"{max_rows} live vectors; use extras.similarity."
                        "ivf_build/ivf_search (per-centroid parquet "
                        "buckets) instead of the exact in-memory path"
                    )
                row_base += n
        if not mats:
            out = (np.empty(0, np.uint64), np.empty((0, 0), np.float64))
        else:
            ords = np.concatenate(ords_parts)
            mat = np.vstack(mats)
            live = self._all_ordinals()
            if live.size:
                pos = np.minimum(np.searchsorted(live, ords), live.size - 1)
                keep = live[pos] == ords
                ords, mat = ords[keep], mat[keep]
            else:
                ords, mat = ords[:0], mat[:0]
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            out = (ords, mat / norms[:, None])
        if not hasattr(self, "_knn_cache"):
            self._knn_cache = {}
        self._knn_cache[column] = out
        return out

    def knn_search(
        self,
        column: str,
        query_vec,
        k: int = 10,
        filter_docs: np.ndarray | None = None,
    ) -> list[tuple[int, float]]:
        """Exact k-NN by cosine similarity over a stored vector column
        (the OpenSearch ``knn`` query with the cosinesimil space;
        ``score`` IS the cosine, ties broken doc_id asc). One float64
        matvec over the cached normalized matrix; ``filter_docs`` (a
        sorted doc-id set from any filter clause) restricts candidates
        BEFORE the top-k cut — OpenSearch 2.x filtered/post-filter
        exact search semantics."""
        ords, mat = self.knn_vectors(column)
        if ords.size == 0:
            return []
        q = np.asarray(query_vec, dtype=np.float64)
        qn = np.linalg.norm(q)
        if qn == 0:
            return []
        scores = mat @ (q / qn)
        dids = self._map_ordinals(ords)
        if filter_docs is not None:
            fd = np.asarray(filter_docs, dtype=np.uint64)
            if fd.size == 0:
                # a filter clause matching zero docs means zero knn
                # candidates (OpenSearch returns empty hits, not 500)
                return []
            pos = np.searchsorted(fd, dids)
            m = (pos < fd.size) & (fd[np.minimum(pos, fd.size - 1)] == dids)
            dids, scores = dids[m], scores[m]
            if dids.size == 0:
                return []
        order = np.lexsort((dids, -scores))[:k]
        return list(zip(dids[order].tolist(), scores[order].tolist()))

    def search_filtered(
        self,
        query: str,
        filter_field: str,
        filter_value: str,
        k: int = 10,
        field: str | None = None,
        pruned: bool | None = None,
    ) -> list[tuple[int, float]]:
        """Exact BM25 top-k restricted to docs whose keyword field
        matches (the OpenSearch ``bool: {must: match, filter: term}``
        shape the reference's default mappings are built for). BM25
        stats (idf, avgdl) stay corpus-global — the filter restricts
        the candidate set, not the scoring model.

        Two result-identical paths, auto-selected by filter
        selectivity (``pruned=None``):
        - selective filter (small fp.df): intersect candidates with the
          filter first, exact-score the survivors — the filter IS the
          pruning;
        - broad filter (fp.df a large corpus fraction): block-max WAND
          over the query terms with θ seeded from filter-passing docs
          only (a θ from filtered-out docs could exceed every valid
          score and over-prune), candidates intersected with the filter
          before exact scoring."""
        fkey = f"{filter_field}:{filter_value}"
        fp = self.load_postings([fkey]).get(fkey)
        if fp is None:
            return []
        avgdl = self.field_avgdl(field)
        qcounts = Counter(self.field_terms(query, field))
        postings = self.load_postings(sorted(qcounts))
        terms = [t for t in sorted(qcounts) if t in postings]
        if not terms:
            return []
        if pruned is None:
            # WAND pays off when the filter keeps most docs AND the
            # query terms aren't all Zipf-head (same gate as
            # search_pruned); otherwise the filter intersection already
            # shrinks the work below the seeding overhead
            # measured crossovers (bench index, lang:en = 41% of corpus):
            # WAND wins on every multi-term query (48.5 -> 25 ms worst
            # case, 14.5 -> 0.5 ms best) and loses only on single
            # Zipf-head terms (19 -> 25 ms), where one dense posting
            # scan is already optimal; below a quarter-corpus filter
            # the intersection is cheaper than threshold seeding
            pruned = fp.df > 0.25 * self.n_docs and (
                len(terms) > 1
                or min(postings[t].df for t in terms) <= 0.2 * self.n_docs
            )
        if pruned:
            return self._filtered_wand(qcounts, postings, terms, fp, avgdl, k)
        parts = [postings[t].doc_ids for t in terms]
        cand = self._merge_unique(parts)
        cand = self._isect_sorted(cand, fp)
        if cand.size == 0:
            return []
        scores = self._score_subset(cand, qcounts, postings, avgdl)
        ids, sc = self._rank(cand, scores, k)
        return list(zip(ids.tolist(), sc.tolist()))

    def search_bool(
        self,
        must: str = "",
        should: str = "",
        must_not: str = "",
        filter_term: tuple[str, str] | None = None,
        minimum_should_match: int | None = None,
        k: int = 10,
        field: str | None = None,
        filter_docs: np.ndarray | None = None,
    ) -> list[tuple[int, float]]:
        """Full OpenSearch ``bool`` query: must + should + must_not +
        filter + minimum_should_match (the reference's search surface is
        OpenSearch bool queries over its default mappings,
        /root/reference/opensearch_loader/loader.py:239-312).

        Semantics (documented, SQL-oracle-checked):
        - ``must``: every distinct analyzed term is required (AND) and
          contributes BM25;
        - ``should``: optional terms contributing BM25; a doc must match
          at least ``minimum_should_match`` DISTINCT should terms
          (default 1 when there are no must terms — OpenSearch's
          default — else 0);
        - ``must_not``: docs containing ANY of these terms are excluded
          (no score contribution);
        - ``filter_term``: keyword ``(field, value)`` exact-match
          restriction, unscored;
        - ``filter_docs``: generic unscored restriction to a sorted
          uint64 doc-id set (range / terms / exists / ids filters
          resolve to one via the DSL layer);
        - score: sum of BM25 contributions over the union of must and
          should terms, added in globally sorted term order (the same
          float order as ``search`` — bit-identical to the SQL oracle).

        All set work happens in sorted-ordinal space with searchsorted
        membership tests; nothing leaves the candidate subset."""
        avgdl = self.field_avgdl(field)
        must_q = Counter(self.field_terms(must, field))
        should_q = Counter(self.field_terms(should, field))
        not_terms = sorted(set(self.field_terms(must_not, field)))
        if not must_q and not should_q:
            return []
        msm = minimum_should_match
        if msm is None:
            msm = 0 if must_q else 1
        want = sorted(set(must_q) | set(should_q) | set(not_terms))
        fkey = None
        if filter_term is not None:
            fkey = f"{filter_term[0]}:{filter_term[1]}"
            want.append(fkey)
        postings = self.load_postings(want)
        if fkey is not None and fkey not in postings:
            return []
        # candidates: AND over must terms, else union of should terms
        if must_q:
            must_terms = sorted(set(must_q))
            if any(t not in postings for t in must_terms):
                return []
            must_terms.sort(key=lambda t: postings[t].df)
            cand = postings[must_terms[0]].doc_ids
            for t in must_terms[1:]:
                cand = self._isect_sorted(cand, postings[t])
                if cand.size == 0:
                    return []
        else:
            parts = [postings[t].doc_ids for t in sorted(should_q) if t in postings]
            if not parts:
                return []
            cand = self._merge_unique(parts)
        if msm > 0 and should_q:
            n_should = np.zeros(cand.size, dtype=np.int64)
            for t in sorted(set(should_q)):
                p = postings.get(t)
                if p is None:
                    continue
                pos = np.searchsorted(p.doc_ids, cand)
                pos_c = np.minimum(pos, p.df - 1)
                n_should += p.doc_ids[pos_c] == cand
            cand = cand[n_should >= msm]
        for t in not_terms:
            p = postings.get(t)
            if p is None or cand.size == 0:
                continue
            pos = np.searchsorted(p.doc_ids, cand)
            pos_c = np.minimum(pos, p.df - 1)
            cand = cand[p.doc_ids[pos_c] != cand]
        if fkey is not None:
            cand = self._isect_sorted(cand, postings[fkey])
        if filter_docs is not None and cand.size:
            # generic unscored restriction (range / terms / exists /
            # ids filter clauses): a sorted uint64 DOC-ID set; membership
            # is tested on the mapped candidate ids (candidates live in
            # ordinal space)
            fd = np.asarray(filter_docs, dtype=np.uint64)
            if fd.size == 0:
                return []
            dids = self._map_ordinals(cand)
            pos = np.minimum(np.searchsorted(fd, dids), fd.size - 1)
            cand = cand[fd[pos] == dids]
        if cand.size == 0:
            return []
        scores = self._score_subset(cand, must_q + should_q, postings, avgdl)
        ids, sc = self._rank(cand, scores, k)
        return list(zip(ids.tolist(), sc.tolist()))

    def search_after(
        self,
        query: str,
        after: tuple[float, int],
        k: int = 10,
        field: str | None = None,
    ) -> list[tuple[int, float]]:
        """Cursor ("deep") pagination — OpenSearch ``search_after``:
        the next ``k`` hits STRICTLY after the cursor ``(score,
        doc_id)`` in (score desc, doc_id asc) order. Cursor pagination
        is O(k) per page regardless of depth (the scalable idiom; an
        offset-based page N re-ranks N·k docs), and pages are stable
        under concurrent appends because the cursor is a value, not a
        position. The cursor's score comparison is exact float
        equality — valid because cursors come from this engine's own
        (bit-deterministic) hits."""
        after_score, after_doc = float(after[0]), int(after[1])
        avgdl = self.field_avgdl(field)
        qcounts = Counter(self.field_terms(query, field))
        postings = self.load_postings(sorted(qcounts))
        parts_ids, parts_scores = [], []
        for term in sorted(qcounts):
            p = postings.get(term)
            if p is None:
                continue
            contrib = qcounts[term] * self.idf(p.df) * self._norm_cached(p, avgdl)
            parts_ids.append(p.doc_ids)
            parts_scores.append(contrib)
        if not parts_ids:
            return []
        uniq, scores = self._combine(parts_ids, parts_scores)
        keep = scores < after_score
        # score ties: survive only with a larger doc_id than the cursor
        tie = np.flatnonzero(scores == after_score)
        if tie.size:
            # compare in uint64 space: doc ids are unsigned hashes, and
            # an int64 cast would wrap ids >= 2^63 negative, silently
            # dropping tied docs (accept a signed cursor id too)
            tie_ids = np.asarray(self._map_ordinals(uniq[tie]), dtype=np.uint64)
            cur = np.int64(after_doc).astype(np.uint64) if after_doc < 0 \
                else np.uint64(after_doc)
            keep[tie[tie_ids > cur]] = True
        uniq, scores = uniq[keep], scores[keep]
        if uniq.size == 0:
            return []
        ids, sc = self._rank(uniq, scores, k)
        return list(zip(ids.tolist(), sc.tolist()))

    def facet_terms(
        self,
        query: str,
        facet_field: str,
        size: int = 10,
        field: str | None = None,
        order: str = "count",
        ascending: bool = False,
        min_doc_count: int = 1,
    ) -> list[tuple[str, int]]:
        """Terms aggregation over a match query (OpenSearch
        ``aggs: {terms: {field: ...}}``): doc counts per keyword value
        among ALL docs matching the query (match = OR over analyzed
        terms — every hit counts, not just top-k), ordered by
        (count desc, value asc), top ``size``.

        Facet values are gathered from the docstore doc-value column in
        one pruned read per touched bucket (``_gather_column``); counts
        are a single np.unique pass. At 100 TB the same shape fans out
        per bucket file; an alternative for tiny candidate fractions is
        intersecting keyword postings per value, which this engine can
        also do via ``term_docs``."""
        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return []
        vals = self._gather_column(cand, facet_field)
        uniq, counts = np.unique(vals.astype(str), return_counts=True)
        if min_doc_count > 1:
            keep = counts >= min_doc_count
            uniq, counts = uniq[keep], counts[keep]
        if order == "count":
            # ties break on key ascending in BOTH directions (the
            # OpenSearch _count tie rule)
            idx = np.lexsort((uniq, counts if ascending else -counts))
        elif order == "key":
            idx = np.argsort(uniq)
            if not ascending:
                idx = idx[::-1]
        else:
            raise ValueError(f"unsupported terms order {order!r}")
        idx = idx[:size]
        return [(str(uniq[i]), int(counts[i])) for i in idx]

    def _drop_dead_ordinals(self, ordinals: np.ndarray) -> np.ndarray:
        """Filter out ordinals tombstoned by scan-layout deletes. Dead
        sets load lazily per touched partition and cache on the reader
        (same lifetime as ``_bucket_ids`` — maintenance commits are
        followed by reopening the reader)."""
        import json

        from ..index.build_scan import DEAD_SUBDIR

        cache = getattr(self, "_dead_cache", None)
        if cache is None:
            cache = self._dead_cache = {}
        keep = np.ones(ordinals.size, dtype=bool)
        for b in np.unique(ordinals >> np.uint64(ORD_SHIFT)):
            dead = cache.get(int(b))
            if dead is None:
                dpath = os.path.join(
                    self.index_dir, DEAD_SUBDIR, f"part={int(b):05d}.json"
                )
                if os.path.exists(dpath):
                    with open(dpath) as fh:
                        dead = np.unique(np.array(json.load(fh), dtype=np.uint64))
                else:
                    dead = np.empty(0, dtype=np.uint64)
                cache[int(b)] = dead
            if dead.size == 0:
                continue
            m = (ordinals >> np.uint64(ORD_SHIFT)) == b
            o = ordinals[m]
            pos = np.minimum(np.searchsorted(dead, o), dead.size - 1)
            keep[m] &= dead[pos] != o
        return ordinals[keep]

    def _all_ordinals(self) -> np.ndarray:
        """Sorted ordinals of every live doc — the candidate set of a
        ``global`` aggregation. Row counts come from parquet METADATA
        only (no column bytes); scan-layout tombstone ordinals are
        excluded. Cached per reader."""
        import glob
        import json

        import pyarrow.parquet as pq

        from ..index.build_scan import DEAD_SUBDIR

        cached = getattr(self, "_all_ords", None)
        if cached is not None:
            return cached
        dead_dir = os.path.join(self.index_dir, DEAD_SUBDIR)
        parts = []
        for path in sorted(glob.glob(os.path.join(self._docs_dir, "*.parquet"))):
            b = int(os.path.basename(path).split("=")[1].split(".")[0])
            n = pq.read_metadata(path).num_rows
            ords = (np.uint64(b) << np.uint64(ORD_SHIFT)) | np.arange(
                n, dtype=np.uint64
            )
            dpath = os.path.join(dead_dir, f"part={b:05d}.json")
            if os.path.exists(dpath):
                with open(dpath) as fh:
                    dead = np.unique(np.array(json.load(fh), dtype=np.uint64))
                if dead.size:
                    ords = np.setdiff1d(ords, dead, assume_unique=True)
            parts.append(ords)
        out = (
            np.concatenate(parts) if parts else np.empty(0, np.uint64)
        )  # buckets ascend, rows ascend within -> already sorted
        self._all_ords = out
        return out

    def _match_ordinals(self, query: str | None, field: str | None) -> np.ndarray:
        """Sorted ordinals of ALL docs matching a match query (OR over
        analyzed terms) — the candidate set every aggregation runs
        over. ``query=None`` means every live doc (the ``global`` agg
        context); a precomputed SORTED ordinal array passes through
        unchanged — the hook that lets every aggregation run over an
        arbitrary filter-context doc set (bool / term / range / geo
        queries with aggs: dsl._aggregations derives the set once via
        ordinals_of_ids and hands it to each facet through this single
        funnel)."""
        if isinstance(query, np.ndarray):
            return query
        if query is None:
            return self._all_ordinals()
        qterms = sorted(set(self.field_terms(query, field)))
        postings = self.load_postings(qterms)
        parts = [postings[t].doc_ids for t in qterms if t in postings]
        if not parts:
            return np.array([], dtype=np.uint64)
        return self._merge_unique(parts)

    def ordinals_of_ids(self, doc_ids) -> np.ndarray:
        """Sorted live ordinals whose doc ids are in ``doc_ids`` — the
        inverse of ``_map_ordinals``. A per-reader (id-sorted ids,
        aligned ordinals) index is built lazily from the bucket doc-id
        arrays the cache already holds; after that each call is one
        searchsorted membership probe, O(|target| log n) — no
        per-request corpus pass. Used to turn a filter-context doc-id
        set into the candidate set aggregations/sorts consume."""
        target = np.asarray(doc_ids, dtype=np.uint64)
        if target.size == 0:
            return np.empty(0, np.uint64)
        idx = getattr(self, "_id_ord_index", None)
        if idx is None:
            ords = self._all_ordinals()
            if ords.size == 0:
                self._id_ord_index = idx = (
                    np.empty(0, np.uint64),
                    np.empty(0, np.uint64),
                )
            else:
                ids = self._map_ordinals(ords).astype(np.uint64)
                order = np.argsort(ids, kind="mergesort")
                self._id_ord_index = idx = (ids[order], ords[order])
        ids_sorted, ords_by_id = idx
        if ids_sorted.size == 0:
            return np.empty(0, np.uint64)
        pos = np.searchsorted(ids_sorted, target)
        pos = np.minimum(pos, ids_sorted.size - 1)
        hit = ids_sorted[pos] == target
        return np.sort(ords_by_id[pos[hit]])

    def facet_ranges(
        self,
        query: str,
        agg_field: str,
        ranges: list[tuple[float | None, float | None]],
        field: str | None = None,
    ) -> list[tuple[float | None, float | None, int]]:
        """Range aggregation (OpenSearch ``aggs.range``): doc counts
        per half-open ``[from, to)`` bucket of a numeric doc-value
        field among all docs matching the query; ``None`` bounds are
        open ends. Buckets may overlap (OpenSearch allows it) — each is
        counted independently with two vectorized comparisons."""
        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return [(lo, hi, 0) for lo, hi in ranges]
        vals = self._gather_column(cand, agg_field)
        out = []
        for lo, hi in ranges:
            m = np.ones(vals.size, dtype=bool)
            if lo is not None:
                m &= vals >= lo
            if hi is not None:
                m &= vals < hi
            out.append((lo, hi, int(np.count_nonzero(m))))
        return out

    def facet_ip_ranges(
        self,
        query: str,
        ip_field: str,
        ranges: list[dict],
        field: str | None = None,
    ) -> list[tuple[str | None, str | None, int]]:
        """ip_range aggregation (OpenSearch ``aggs.ip_range``): doc
        counts per half-open ``[from, to)`` IPv4 window of a stored
        dotted-quad string doc-value. Each range is either
        ``{"from": ..., "to": ...}`` (``None``/absent bounds open) or
        a CIDR ``{"mask": "a.b.c.d/p"}`` (the enclosing block).
        Parsing is fully vectorized: three ``np.char.partition``
        passes split all docs' octets at once, one shift-or builds the
        uint32 keys, then two comparisons per range — no per-doc
        loop. Returns (from_ip, to_ip, doc_count) in request order,
        CIDR masks expanded to their bounds."""
        cand = self._match_ordinals(query, field)
        bounds = [_ip_range_bounds(rg) for rg in ranges]
        if cand.size == 0:
            return [(fs, ts, 0) for fs, ts, _, _ in bounds]
        vals = self._gather_column(cand, ip_field).astype(str)
        ip = _ipv4_to_uint32(vals)
        out = []
        for fs, ts, lo, hi in bounds:
            m = np.ones(ip.size, dtype=bool)
            if lo is not None:
                m &= ip >= np.uint32(lo)
            if hi is not None:
                m &= ip < np.uint32(hi)
            out.append((fs, ts, int(np.count_nonzero(m))))
        return out

    def variable_width_histogram_agg(
        self,
        query: str,
        agg_field: str,
        buckets: int,
        field: str | None = None,
    ) -> list[dict]:
        """variable_width_histogram aggregation, EXACT deterministic
        variant: bottom-up agglomerative clustering of the sorted
        DISTINCT doc-values — repeatedly merge the adjacent cluster
        pair with the smallest centroid gap (ties: leftmost) until
        ``buckets`` clusters remain. OpenSearch's version is a
        streaming heuristic whose buckets depend on shard/collection
        order; this pinned variant is order-independent (same input
        set => same buckets regardless of partitioning), which is the
        property a distributed engine actually needs. Lazy-deletion
        heap over adjacent gaps: O(D log D) in distinct values.
        Returns [{"min", "key" (centroid), "max", "doc_count"}, ...]
        ascending."""
        import heapq

        if buckets < 1:
            raise ValueError("variable_width_histogram needs buckets >= 1")
        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return []
        vals = self._gather_column(cand, agg_field).astype(np.float64)
        uv, counts = np.unique(vals, return_counts=True)
        d = uv.size
        # cluster state: centroid-sum / count / min / max, linked list
        # of live neighbors; entries die on merge (lazy heap deletion)
        csum = (uv * counts).astype(np.float64)
        ccnt = counts.astype(np.int64)
        cmin = uv.copy()
        cmax = uv.copy()
        left = np.arange(d) - 1
        right = np.arange(d) + 1
        alive = np.ones(d, dtype=bool)
        ver = np.zeros(d, dtype=np.int64)

        def _gap(i: int, j: int) -> float:
            return (csum[j] / ccnt[j]) - (csum[i] / ccnt[i])

        heap = [
            (_gap(i, i + 1), i, int(ver[i]), int(ver[i + 1]))
            for i in range(d - 1)
        ]
        heapq.heapify(heap)
        live = d
        while live > buckets and heap:
            g, i, vi, vj = heapq.heappop(heap)
            j = right[i]
            if not alive[i] or j >= d or not alive[j]:
                continue
            if ver[i] != vi or ver[j] != vj:
                continue
            # merge j into i
            csum[i] += csum[j]
            ccnt[i] += ccnt[j]
            cmax[i] = cmax[j]
            alive[j] = False
            right[i] = right[j]
            if right[j] < d:
                left[right[j]] = i
            ver[i] += 1
            live -= 1
            if left[i] >= 0:
                heapq.heappush(
                    heap,
                    (_gap(left[i], i), int(left[i]), int(ver[left[i]]),
                     int(ver[i])),
                )
            if right[i] < d:
                heapq.heappush(
                    heap,
                    (_gap(i, right[i]), i, int(ver[i]), int(ver[right[i]])),
                )
        idx = np.flatnonzero(alive)
        return [
            {
                "min": float(cmin[i]),
                "key": float(csum[i] / ccnt[i]),
                "max": float(cmax[i]),
                "doc_count": int(ccnt[i]),
            }
            for i in idx
        ]

    def facet_histogram(
        self,
        query: str,
        agg_field: str,
        interval: float,
        field: str | None = None,
    ) -> list[tuple[float, int]]:
        """Histogram aggregation (OpenSearch ``aggs.histogram``): doc
        counts per fixed-width bucket ``floor(v / interval) *
        interval``, ascending, empty buckets omitted (min_doc_count=1
        semantics)."""
        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return []
        vals = self._gather_column(cand, agg_field).astype(np.float64)
        keys = np.floor(vals / interval) * interval
        uniq, counts = np.unique(keys, return_counts=True)
        return [(float(u), int(c)) for u, c in zip(uniq, counts)]

    def stats_agg(
        self, query: str, agg_field: str, field: str | None = None
    ) -> dict:
        """Stats aggregation (OpenSearch ``aggs.stats``): count / min /
        max / sum / avg of a numeric field over all matching docs.
        Integer fields sum exactly in int64; avg is sum/count in
        float64 (the documented float contract)."""
        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return {"count": 0, "min": None, "max": None, "sum": 0, "avg": None}
        vals = self._gather_column(cand, agg_field)
        total = vals.sum()
        return {
            "count": int(cand.size),
            "min": vals.min().item(),
            "max": vals.max().item(),
            "sum": total.item(),
            "avg": float(total) / cand.size,
        }

    def extended_stats_agg(
        self, query: str, agg_field: str, field: str | None = None
    ) -> dict:
        """Extended-stats aggregation (OpenSearch ``extended_stats``):
        the stats keys plus sum_of_squares, population variance and
        std_deviation (OpenSearch's documented definitions:
        ``variance = sum_sq/n - avg^2``, population flavor). All the
        moment math runs in float64 on the gathered doc-value vector —
        at cluster scale the same three moments (n, sum, sum_sq) are
        per-block partials merged by addition."""
        st = self.stats_agg(query, agg_field, field)
        if st["count"] == 0:
            return {**st, "sum_of_squares": None, "variance": None,
                    "std_deviation": None}
        cand = self._match_ordinals(query, field)
        vals = self._gather_column(cand, agg_field).astype(np.float64)
        sum_sq = float((vals * vals).sum())
        avg = float(st["avg"])
        variance = max(sum_sq / st["count"] - avg * avg, 0.0)
        return {
            **st,
            "sum_of_squares": sum_sq,
            "variance": variance,
            "std_deviation": math.sqrt(variance),
        }

    def weighted_avg_agg(
        self,
        query: str,
        value_field: str,
        weight_field: str,
        field: str | None = None,
    ) -> float | None:
        """Weighted-average aggregation (OpenSearch ``weighted_avg``):
        Σ(v·w) / Σ(w) over matching docs. Integer doc-values multiply
        and sum EXACTLY in int64 (products < 2^63, sums < 2^53 at
        contract scale), so the single final float64 division is the
        only rounding — the SQL oracle is bit-identical by
        construction (the extended_stats trick). Null values or
        weights drop the row (OpenSearch's default missing handling)."""
        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return None
        v = self._gather_column(cand, value_field)
        w = self._gather_column(cand, weight_field)
        if np.issubdtype(v.dtype, np.floating) or np.issubdtype(w.dtype, np.floating):
            keep = ~(np.isnan(v.astype(np.float64)) | np.isnan(w.astype(np.float64)))
            v, w = v[keep], w[keep]
        if v.size == 0:
            return None
        num = (v.astype(np.int64) * w.astype(np.int64)).sum() if (
            np.issubdtype(v.dtype, np.integer) and np.issubdtype(w.dtype, np.integer)
        ) else float((v.astype(np.float64) * w.astype(np.float64)).sum())
        den = w.astype(np.int64).sum() if np.issubdtype(w.dtype, np.integer) else float(
            w.astype(np.float64).sum()
        )
        if den == 0:
            return None
        return float(num) / float(den)

    def top_metrics_agg(
        self,
        query: str,
        metric_field: str,
        sort_field: str,
        descending: bool = True,
        size: int = 1,
        field: str | None = None,
    ) -> list[dict]:
        """Top-metrics aggregation (OpenSearch ``top_metrics``): the
        metric field's values of the ``size`` docs ranking first by the
        sort field among the query's matches (ties doc_id asc —
        deterministic). One gather + one lexsort cut."""
        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return []
        sv = self._gather_column(cand, sort_field).astype(np.float64)
        dids = self._map_ordinals(cand)
        order = np.lexsort((dids, -sv if descending else sv))[:size]
        mv = self._gather_column(cand[order], metric_field)
        return [
            {"sort": [sv[i].item()], "metrics": {metric_field: mv[j].item()}}
            for j, i in enumerate(order)
        ]

    def matrix_stats_agg(
        self, query: str, fields: list[str], field: str | None = None
    ) -> dict:
        """Matrix-stats aggregation (OpenSearch ``matrix_stats``) over
        numeric doc-value fields: per-field count / mean / variance /
        skewness / kurtosis plus pairwise covariance and correlation.
        Pinned formulas (documented — OpenSearch's exact higher-moment
        flavor varies by version):
          mean       = Σx / n               (Σ exact in int64 for int fields)
          variance   = (Σx² - n·mean·mean) / (n - 1)      [sample]
          covariance = (Σxy - n·meanx·meany) / (n - 1)
          correlation= cov / (sqrt(varx) · sqrt(vary))
          skewness   = (Σx³/n - 3·mean·m2 - mean³) / m2^1.5   [population m2]
          kurtosis   = (Σx⁴/n - 4·mean·(Σx³/n) + 6·mean²·(Σx²/n) - 3·mean⁴) / m2²
        Every moment sum is a per-block partial at cluster scale —
        merged by addition, no doc-level shuffle."""
        cand = self._match_ordinals(query, field)
        n = int(cand.size)
        if n < 2:
            return {"doc_count": n, "fields": {}, "covariance": {}, "correlation": {}}
        cols = {fl: self._gather_column(cand, fl) for fl in fields}
        out_fields: dict[str, dict] = {}
        moments: dict[str, tuple] = {}
        def _int_overflow(*vs) -> bool:
            # int64 moment sums are exact only while n · max|a|·max|b|
            # fits in int64; numpy wraps silently past that, so detect
            # the bound and take the exact object-int path instead
            if not all(np.issubdtype(x.dtype, np.integer) for x in vs):
                return False
            prod = 1
            for x in vs:
                m = int(np.abs(x).max()) if x.size else 0
                prod *= max(m, 1)
            return prod > (2**63 - 1) // max(n, 1)

        int_sums: dict[str, int] = {}
        for fl, v in cols.items():
            if _int_overflow(v, v):
                # exact object-int central moments: raw moment sums at
                # this magnitude cancel catastrophically in float64
                # (Σx² ≈ n·mean², 0 significant bits left), so work
                # with d_i = n·x_i − Σx (exact ints, mean-centered):
                # m2 = Σd²/n³, m3 = Σd³/n⁴, m4 = Σd⁴/n⁵
                ints = [int(x) for x in v.tolist()]
                s1 = sum(ints)
                int_sums[fl] = s1
                d = [n * x - s1 for x in ints]
                c2 = sum(e * e for e in d)
                c3 = sum(e * e * e for e in d)
                c4 = sum(e * e * e * e for e in d)
                mean = s1 / n
                var = c2 / (n * n * (n - 1))
                m2 = c2 / n**3
                skew = (c3 / n**4) / m2**1.5 if m2 > 0 else 0.0
                kurt = (c4 / n**5) / (m2 * m2) if m2 > 0 else 0.0
            else:
                s1, s2 = v.sum(), (v * v).sum()
                v3 = v.astype(np.float64)
                s3 = float((v3 * v3 * v3).sum())
                s4 = float((v3 * v3 * v3 * v3).sum())
                mean = float(s1) / n
                var = (float(s2) - n * mean * mean) / (n - 1)
                m2 = float(s2) / n - mean * mean
                skew = (
                    (s3 / n - 3.0 * mean * m2 - mean**3) / m2**1.5
                    if m2 > 0
                    else 0.0
                )
                kurt = (
                    (s4 / n - 4.0 * mean * (s3 / n)
                     + 6.0 * mean * mean * (float(s2) / n)
                     - 3.0 * mean**4) / (m2 * m2)
                    if m2 > 0
                    else 0.0
                )
            moments[fl] = (mean, var)
            out_fields[fl] = {
                "count": n,
                "mean": mean,
                "variance": var,
                "skewness": skew,
                "kurtosis": kurt,
            }
        cov: dict[str, dict[str, float]] = {fl: {} for fl in fields}
        corr: dict[str, dict[str, float]] = {fl: {} for fl in fields}
        for i, fa in enumerate(fields):
            for fb in fields[i + 1:]:
                va, vb = cols[fa], cols[fb]
                if _int_overflow(va, vb):
                    # exact: Σ(a−ā)(b−b̄) = (n·Σab − Σa·Σb) / n
                    sa = int_sums.get(fa, sum(int(x) for x in va.tolist()))
                    sb = int_sums.get(fb, sum(int(x) for x in vb.tolist()))
                    sxy = sum(
                        int(x) * int(y) for x, y in zip(va.tolist(), vb.tolist())
                    )
                    c = (n * sxy - sa * sb) / (n * (n - 1))
                else:
                    if np.issubdtype(va.dtype, np.integer) and np.issubdtype(
                        vb.dtype, np.integer
                    ):
                        sxy = (va.astype(np.int64) * vb.astype(np.int64)).sum()
                    else:
                        sxy = float(
                            (va.astype(np.float64) * vb.astype(np.float64)).sum()
                        )
                    ma, mb = moments[fa][0], moments[fb][0]
                    c = (float(sxy) - n * ma * mb) / (n - 1)
                denom = math.sqrt(moments[fa][1]) * math.sqrt(moments[fb][1])
                # a constant field has zero variance: correlation is
                # undefined — report 0.0 rather than dividing by zero
                rho = c / denom if denom > 0 else 0.0
                cov[fa][fb] = c
                cov[fb][fa] = c
                corr[fa][fb] = rho
                corr[fb][fa] = rho
        return {
            "doc_count": n,
            "fields": out_fields,
            "covariance": cov,
            "correlation": corr,
        }

    def rare_terms_agg(
        self,
        query: str,
        facet_field: str,
        max_doc_count: int = 1,
        field: str | None = None,
    ) -> list[tuple[str, int]]:
        """Rare-terms aggregation (OpenSearch ``rare_terms``): the
        long-tail complement of ``terms`` — keyword values whose doc
        count among the matching docs is <= ``max_doc_count``, ordered
        (count asc, value asc). Same one-pass np.unique shape as
        ``facet_terms``; OpenSearch approximates with a CuckooFilter at
        scale, this engine's per-bucket exact counts merge exactly."""
        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return []
        vals = self._gather_column(cand, facet_field)
        uniq, counts = np.unique(vals.astype(str), return_counts=True)
        keep = counts <= max_doc_count
        uniq, counts = uniq[keep], counts[keep]
        order = np.lexsort((uniq, counts))
        return [(str(uniq[i]), int(counts[i])) for i in order]

    def missing_agg(
        self, query: str, agg_field: str, field: str | None = None
    ) -> int:
        """Missing aggregation (OpenSearch ``missing``): how many
        matching docs lack a value for the field (null doc-value).
        Nulls surface as NaN (numeric) or None (object) from the
        docstore gather."""
        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return 0
        vals = self._gather_column(cand, agg_field)
        if vals.dtype == object:
            return int(sum(v is None for v in vals))
        if np.issubdtype(vals.dtype, np.floating):
            return int(np.isnan(vals).sum())
        return 0  # non-nullable integer storage: nothing missing

    def _runtime_values(self, ordinals: np.ndarray, compiled) -> np.ndarray:
        """Evaluate a runtime-field script (the whitelisted
        ``script.compile_script`` subset: ``doc['f'].value`` reads +
        arithmetic) over the candidate set — one gather per referenced
        doc-value column, one vectorized expression; ``_score`` inside
        a runtime script is 0 (no relevance context)."""
        values = {
            fn: self._gather_column(ordinals, fn).astype(np.float64)
            for fn in compiled.fields
        }
        return compiled(np.zeros(ordinals.size, dtype=np.float64), values)

    def search_sort_by(
        self,
        query: str,
        sort_field: str,
        k: int = 10,
        descending: bool = False,
        field: str | None = None,
        script=None,
        after: tuple | None = None,
    ) -> list[tuple[int, object]]:
        """Match query with a field ``sort`` clause instead of
        relevance (OpenSearch ``sort: [{field: asc|desc}]``): top ``k``
        matching docs by doc-value, ties broken by doc_id ascending
        (OpenSearch's implicit final tiebreak). Returns ``(doc_id,
        sort_value)``.

        ``after=(value, doc_id)`` resumes strictly after that sort key
        — field-sorted ``search_after``, THE deep-pagination idiom (a
        100-TB export pages this way, never via ``from`` offsets whose
        cost grows per page). Docs strictly past the value cut keep
        their ordinals unmapped; only the equal-value band maps ids for
        the tiebreak, so each page costs the same as the first.

        Same shape as ``_rank``: an argpartition pre-cut keeps only
        candidates that can make the top ``k`` (boundary ties
        included), so doc ids are mapped for the survivors only."""
        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return []
        if script is not None:
            # runtime field: sort key computed from source doc-values
            vals = self._runtime_values(cand, script)
        else:
            vals = self._gather_column(cand, sort_field)
        if vals.dtype == object:
            raise TypeError(
                f"sort field {sort_field!r} is not numeric; keyword sort is "
                "not supported (use facet_terms / search for keyword access)"
            )
        if after is not None:
            av, aid = after
            strictly = vals < av if descending else vals > av
            band = np.flatnonzero(vals == av)
            if band.size:
                bdids = self._map_ordinals(cand[band]).astype(np.uint64)
                band = band[bdids > np.uint64(int(aid))]
            keep = np.concatenate([np.flatnonzero(strictly), band])
            if keep.size == 0:
                return []
            cand, vals = cand[keep], vals[keep]
        key = -vals if descending else vals
        if key.size > 4 * k > 0:
            top = np.argpartition(key, k - 1)[:k]
            cut = key[top].max()
            keep = np.flatnonzero(key <= cut)
            cand, vals, key = cand[keep], vals[keep], key[keep]
        dids = self._map_ordinals(cand).astype(np.uint64)
        order = np.lexsort((dids, key))[:k]
        return [(int(dids[i]), vals[i].item()) for i in order]

    def _df_only(self, terms: list[str]) -> dict[str, int]:
        """Document frequency for a set of terms WITHOUT decoding
        postings: a term+df column read of the pruned shard row-groups
        (the same footer-stats pruning as ``load_postings``), summed
        over a term's range segments. Backs stats-only consumers
        (significant_terms' background counts) at a fraction of a full
        postings load."""
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        out: dict[str, int] = {}
        if not terms:
            return out
        for p in self._shard_paths(terms):
            pf, mins, maxs, _cols = self._shard_entry(p)
            groups = [
                gi
                for gi in range(len(mins))
                if any(mins[gi] <= t <= maxs[gi] for t in terms)
            ]
            if not groups:
                continue
            t = pf.read_row_groups(groups, columns=["term", "df"])
            mask = pc.is_in(t.column("term"), value_set=pa.array(terms, pa.string()))
            t = t.filter(mask)
            for term, df in zip(
                t.column("term").to_pylist(), t.column("df").to_pylist()
            ):
                out[term] = out.get(term, 0) + int(df)
        return out

    def significant_terms(
        self,
        query: str,
        size: int = 10,
        field: str | None = None,
        min_doc_count: int = 3,
    ) -> list[tuple[str, int, int, float]]:
        """significant_terms aggregation (JLH heuristic, OpenSearch's
        default): terms over-represented in the query's match set
        (foreground) vs the whole corpus (background). score =
        (fgPct - bgPct) * (fgPct / bgPct) for terms with fgPct > bgPct
        and at least ``min_doc_count`` foreground docs; top ``size`` by
        (score desc, term asc). Returns (term, fg_count, bg_count,
        score).

        Foreground counts come from re-tokenizing the match set's
        STORED text (one doc-value gather + one C-speed batch tokenize
        — the match set is query-sized, not corpus-sized); background
        df comes from a term+df-only pruned shard read (``_df_only``),
        so no posting list is decoded at all."""
        from ..analysis import arrow_tokenize

        cand = self._match_ordinals(query, field)
        n_fg = int(cand.size)
        if n_fg == 0:
            return []
        col = self.primary_field if field is None else field
        texts = self._gather_column(cand, col)
        return self._jlh_over_texts(texts, n_fg, size, min_doc_count, field)

    def significant_text(
        self,
        query: str,
        size: int = 10,
        sample_size: int = 200,
        field: str | None = None,
        min_doc_count: int = 3,
    ) -> list[tuple[str, int, int, float]]:
        """significant_text aggregation: the significant_terms JLH
        scoring, but the FOREGROUND is only the ``sample_size``
        best-scoring docs of the query (OpenSearch's
        sampler+significant_text idiom) — noise from low-relevance
        matches never enters the counts.  Sample text comes from one
        docstore point-read; background df from the same pruned
        (term, df)-only shard scan as significant_terms."""
        hits = self.search_pruned(query, sample_size, field=field)
        if not hits:
            return []
        ids = np.array([d for d, _ in hits], dtype=np.uint64)
        col = self.primary_field if field is None else field
        tbl = self.get_docs(ids)
        texts = tbl.column(col).to_pylist()
        return self._jlh_over_texts(texts, len(texts), size, min_doc_count, field)

    def _jlh_over_texts(
        self,
        texts,
        n_fg: int,
        size: int,
        min_doc_count: int,
        field: str | None,
    ) -> list[tuple[str, int, int, float]]:
        """Shared JLH ranking over a foreground text set: per-doc term
        presence (batch tokenize + one bincount), background df, pinned
        divide-first float chain; (score desc, term asc) top size."""
        from ..analysis import arrow_tokenize

        tid, terms, doc_pos, _ = arrow_tokenize(
            pa.array([t if t is not None else "" for t in texts], pa.string())
        )
        if tid.size == 0:
            return []
        ukeys = np.unique(tid * np.int64(n_fg) + doc_pos)
        fg_counts = np.bincount(ukeys // n_fg, minlength=len(terms))
        keep = np.flatnonzero(fg_counts >= min_doc_count)
        if keep.size == 0:
            return []
        cand_terms = [str(terms[i]) for i in keep]
        if field is not None and field != self.primary_field:
            bg_map = self._df_only(sorted(f"{field}:{t}" for t in cand_terms))
            bg = np.array(
                [bg_map.get(f"{field}:{t}", 0) for t in cand_terms], dtype=np.int64
            )
        else:
            bg_map = self._df_only(sorted(cand_terms))
            bg = np.array([bg_map.get(t, 0) for t in cand_terms], dtype=np.int64)
        fg = fg_counts[keep].astype(np.int64)
        n_bg = int(self.manifest["corpus"]["n_docs"])
        # float chain pinned to the SQL oracle: BIGINT/BIGINT division
        # is float64 in DuckDB, so divide first, THEN compare/combine
        fg_pct = fg / np.float64(n_fg)
        bg_pct = bg / np.float64(n_bg)
        with np.errstate(divide="ignore", invalid="ignore"):
            score = (fg_pct - bg_pct) * (fg_pct / bg_pct)
        ok = np.flatnonzero((fg_pct > bg_pct) & (bg > 0))
        rows = sorted(
            (
                (cand_terms[i], int(fg[i]), int(bg[i]), float(score[i]))
                for i in ok
            ),
            key=lambda r: (-r[3], r[0]),
        )
        return rows[:size]

    def facet_top_hits(
        self,
        query: str,
        group_field: str,
        per_group_k: int = 3,
        field: str | None = None,
    ) -> list[tuple[object, int, int, float]]:
        """terms aggregation with a ``top_hits`` sub-aggregation: the
        best-scoring docs per keyword bucket. One combine over the
        query's posting runs, one doc-value gather for the bucket keys,
        then a single lexsort (group asc, score desc, doc_id asc) and a
        vectorized per-group rank cut — no per-bucket re-query. Returns
        (group_value, rank_in_group, doc_id, score) sorted by (group,
        rank)."""
        avgdl = self.field_avgdl(field)
        qcounts = Counter(self.field_terms(query, field))
        postings = self.load_postings(sorted(qcounts))
        parts_ids, parts_scores = [], []
        for term in sorted(qcounts):
            p = postings.get(term)
            if p is None:
                continue
            contrib = qcounts[term] * self.idf(p.df) * self._norm_cached(p, avgdl)
            parts_ids.append(p.doc_ids)
            parts_scores.append(contrib)
        if not parts_ids:
            return []
        uniq, scores = self._combine(parts_ids, parts_scores)
        gvals = self._gather_column(uniq, group_field)
        gu, gcodes = np.unique(gvals.astype(str), return_inverse=True)
        dids = self._map_ordinals(uniq)
        order = np.lexsort((dids, -scores, gcodes))
        gc_sorted = gcodes[order]
        starts = np.flatnonzero(
            np.concatenate(([True], gc_sorted[1:] != gc_sorted[:-1]))
        )
        group_start = starts[np.searchsorted(starts, np.arange(order.size), "right") - 1]
        rank_in = np.arange(order.size) - group_start
        keep = rank_in < per_group_k
        sel = order[keep]
        return [
            (gu[gcodes[i]], int(rank_in[keep][j]) + 1, int(dids[i]), float(scores[i]))
            for j, i in enumerate(sel)
        ]

    def search_collapse(
        self,
        query: str,
        collapse_field: str,
        k: int = 10,
        field: str | None = None,
    ) -> list[tuple[int, float, object]]:
        """Field collapsing (OpenSearch ``collapse``): the hit list
        keeps only the best-scoring doc per ``collapse_field`` value,
        ranked globally by (score desc, doc_id asc). Returns
        (doc_id, score, collapse_value). Same one-pass shape as
        ``facet_top_hits`` with per_group_k=1, but ordered like a hit
        list rather than by bucket."""
        avgdl = self.field_avgdl(field)
        qcounts = Counter(self.field_terms(query, field))
        postings = self.load_postings(sorted(qcounts))
        parts_ids, parts_scores = [], []
        for term in sorted(qcounts):
            p = postings.get(term)
            if p is None:
                continue
            contrib = qcounts[term] * self.idf(p.df) * self._norm_cached(p, avgdl)
            parts_ids.append(p.doc_ids)
            parts_scores.append(contrib)
        if not parts_ids:
            return []
        uniq, scores = self._combine(parts_ids, parts_scores)
        gvals = self._gather_column(uniq, collapse_field)
        gu, gcodes = np.unique(gvals.astype(str), return_inverse=True)
        dids = self._map_ordinals(uniq)
        order = np.lexsort((dids, -scores, gcodes))
        gc_sorted = gcodes[order]
        first = np.concatenate(([True], gc_sorted[1:] != gc_sorted[:-1]))
        best = order[first]  # one winner per group
        rank = np.lexsort((dids[best], -scores[best]))[:k]
        sel = best[rank]
        return [
            (int(dids[i]), float(scores[i]), gvals[i]) for i in sel
        ]

    def explain(
        self, query: str, doc_id: int, field: str | None = None
    ) -> dict:
        """Score explanation (OpenSearch ``_explain``): the BM25
        breakdown for one (query, doc) pair — per-term idf, tf, dl and
        contribution, plus the total (identical floats to ``search``:
        contributions are added in sorted-term order)."""
        avgdl = self.field_avgdl(field)
        qcounts = Counter(self.field_terms(query, field))
        postings = self.load_postings(sorted(qcounts))
        want = np.uint64(doc_id)
        parts = []
        total = 0.0
        for term in sorted(qcounts):
            p = postings.get(term)
            if p is None:
                continue
            dids = self._map_ordinals(p.doc_ids)
            hit = np.flatnonzero(dids == want)
            if hit.size == 0:
                continue
            i = int(hit[0])
            contrib = float(
                qcounts[term]
                * self.idf(p.df)
                * self._norm_cached(p, avgdl)[i]
            )
            parts.append(
                {
                    "term": term,
                    "boost": qcounts[term],
                    "idf": self.idf(p.df),
                    "df": int(p.df),
                    "tf": int(p.tfs[i]),
                    "dl": int(p.dls[i]),
                    "avgdl": avgdl,
                    "contribution": contrib,
                }
            )
            total += contrib
        return {
            "matched": bool(parts),
            "value": total,
            "description": f"sum of BM25 contributions for {sorted(qcounts)}",
            "details": parts,
        }

    def rescore(
        self,
        query: str,
        rescore_phrase: str,
        window_size: int = 50,
        query_weight: float = 1.0,
        rescore_weight: float = 1.0,
        k: int = 10,
        field: str | None = None,
    ) -> list[tuple[int, float]]:
        """Rescore (OpenSearch ``rescore`` with a ``match_phrase``
        rescore query): re-rank the base query's top ``window_size``
        hits by ``query_weight * base + rescore_weight * phrase_score``
        (phrase_score 0 where the phrase is absent — the additive
        ``total`` score_mode default). Docs outside the window keep
        their base ranking below the window."""
        base = self.search(query, k=window_size, field=field)
        return self.rescore_hits(
            base, rescore_phrase, query_weight, rescore_weight, k, field
        )

    def rescore_hits(
        self,
        base: list[tuple[int, float]],
        rescore_phrase: str,
        query_weight: float = 1.0,
        rescore_weight: float = 1.0,
        k: int = 10,
        field: str | None = None,
    ) -> list[tuple[int, float]]:
        """Rescore an ALREADY-RANKED hit window (the generalization that
        lets any scored query — bool, dis_max — feed the same
        match_phrase re-ranking the plain-match ``rescore`` runs)."""
        if not base:
            return []
        # phrase scores via the same evaluator as search_phrase
        # (identical floats), fetched for the whole corpus once — the
        # window lookup is a dict probe
        ph = dict(self.search_phrase(rescore_phrase, k=self.n_docs, field=field))
        rescored = [
            (d, query_weight * s + rescore_weight * ph.get(int(d), 0.0))
            for d, s in base
        ]
        rescored.sort(key=lambda ds: (-ds[1], ds[0]))
        return rescored[:k]

    def facet_date_histogram(
        self,
        query: str,
        ts_field: str,
        interval_ms: int,
        field: str | None = None,
    ) -> list[tuple[int, int]]:
        """date_histogram aggregation (OpenSearch ``fixed_interval``
        flavor): doc counts per time bucket over the matching docs'
        stored timestamp doc-value. Bucket key = epoch milliseconds
        floored to the interval (OpenSearch's ``key``) — all-integer
        arithmetic, so bucketing is exactly reproducible everywhere.
        Returns (bucket_ms, doc_count) sorted by bucket."""
        if interval_ms <= 0:
            raise ValueError("interval_ms must be positive")
        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return []
        vals = self._gather_column(cand, ts_field)
        ms = vals.astype("datetime64[ms]").astype(np.int64)
        keys = (ms // interval_ms) * interval_ms
        u, c = np.unique(keys, return_counts=True)
        return list(zip(u.tolist(), c.tolist()))

    # pinned fixed-interval ladder for auto_date_histogram (ms): the
    # OpenSearch rounding ladder's fixed-interval projection (calendar
    # months/years approximated as 30 d / 365 d so the choice is pure
    # integer arithmetic, reproducible in SQL)
    AUTO_INTERVALS_MS = (
        1000, 5000, 10000, 30000,
        60000, 300000, 600000, 1800000,
        3600000, 10800000, 43200000,
        86400000, 604800000, 2592000000, 31536000000,
    )

    def facet_auto_date_histogram(
        self,
        query: str,
        ts_field: str,
        buckets: int,
        field: str | None = None,
    ) -> tuple[int, list[tuple[int, int]]]:
        """auto_date_histogram: the smallest ladder interval whose
        floored-key span fits in ``buckets`` buckets (span counted as
        floor(max/iv) - floor(min/iv) + 1 — covers empty buckets like
        OpenSearch's rounding does).  Returns (interval_ms, rows)."""
        if buckets <= 0:
            raise ValueError("buckets must be positive")
        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return (self.AUTO_INTERVALS_MS[0], [])
        ms = (
            self._gather_column(cand, ts_field)
            .astype("datetime64[ms]")
            .astype(np.int64)
        )
        lo, hi = int(ms.min()), int(ms.max())
        iv = self.AUTO_INTERVALS_MS[-1]
        for cand_iv in self.AUTO_INTERVALS_MS:
            if hi // cand_iv - lo // cand_iv + 1 <= buckets:
                iv = cand_iv
                break
        keys = (ms // iv) * iv
        u, c = np.unique(keys, return_counts=True)
        return (iv, list(zip(u.tolist(), c.tolist())))

    def facet_date_histogram_stats(
        self,
        query: str,
        ts_field: str,
        interval_ms: int,
        stat_field: str,
        field: str | None = None,
    ) -> list[tuple[int, int, object, object, object]]:
        """date_histogram with a numeric metric sub-aggregation (the
        time-series ``date_histogram`` + ``sum``/``avg`` idiom): per
        time bucket, count / min / max / sum of a stored doc-value.
        Same shape as ``facet_terms_stats`` — one gather per column,
        one stable sort on the integer bucket key, segment reduceats —
        so adding the metric costs no extra pass over the postings.
        Returns (bucket_ms, doc_count, min, max, sum) sorted by
        bucket; bucket keys identical to ``facet_date_histogram``."""
        if interval_ms <= 0:
            raise ValueError("interval_ms must be positive")
        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return []
        ms = (
            self._gather_column(cand, ts_field)
            .astype("datetime64[ms]")
            .astype(np.int64)
        )
        keys = (ms // interval_ms) * interval_ms
        svals = self._gather_column(cand, stat_field)
        if svals.dtype == object:
            raise TypeError(f"stats field {stat_field!r} is not numeric")
        order = np.argsort(keys, kind="stable")
        k = keys[order]
        v = svals[order]
        starts = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
        counts = np.diff(np.append(starts, k.size))
        sums = np.add.reduceat(v, starts)
        mins = np.minimum.reduceat(v, starts)
        maxs = np.maximum.reduceat(v, starts)
        return [
            (int(k[s]), int(n), mn.item(), mx.item(), sm.item())
            for s, n, mn, mx, sm in zip(starts, counts, mins, maxs, sums)
        ]

    def facet_date_ranges(
        self,
        query: str,
        ts_field: str,
        ranges: list[tuple[int | None, int | None]],
        field: str | None = None,
    ) -> list[tuple[int | None, int | None, int]]:
        """date_range aggregation (OpenSearch ``aggs.date_range``):
        doc counts per half-open ``[from, to)`` epoch-ms window of a
        stored timestamp doc-value, ``None`` bounds open. Same
        vectorized two-comparison shape as ``facet_ranges`` after an
        integer ms conversion."""
        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return [(lo, hi, 0) for lo, hi in ranges]
        ms = (
            self._gather_column(cand, ts_field)
            .astype("datetime64[ms]")
            .astype(np.int64)
        )
        out = []
        for lo, hi in ranges:
            m = np.ones(ms.size, dtype=bool)
            if lo is not None:
                m &= ms >= int(lo)
            if hi is not None:
                m &= ms < int(hi)
            out.append((lo, hi, int(np.count_nonzero(m))))
        return out

    def facet_composite(
        self,
        query: str,
        agg_field: str,
        size: int = 10,
        after: str | None = None,
        field: str | None = None,
    ) -> list[tuple[str, int]]:
        """Composite aggregation over one keyword source: buckets in
        KEY order (not count order) with ``after``-key cursor
        pagination — the OpenSearch idiom for exporting all buckets of
        a high-cardinality field without deep paging. Returns
        (key, doc_count) for up to ``size`` buckets with key > after."""
        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return []
        vals = self._gather_column(cand, agg_field).astype(str)
        u, c = np.unique(vals, return_counts=True)
        if after is not None:
            cut = int(np.searchsorted(u, after, side="right"))
            u, c = u[cut:], c[cut:]
        return [(str(k), int(n)) for k, n in zip(u[:size], c[:size])]

    def facet_composite_multi(
        self,
        query: str,
        sources: list[tuple[str, str, dict]],
        size: int = 10,
        after: tuple | None = None,
        field: str | None = None,
    ) -> list[tuple[tuple, int]]:
        """Composite aggregation over MULTIPLE sources — the OpenSearch
        compound-key export idiom: buckets are (source1, source2, ...)
        tuples in lexicographic key order with ``after``-tuple cursor
        pagination, so a client can stream EVERY bucket of a
        high-cardinality cross product without deep paging.

        ``sources``: ``(name, kind, spec)`` per source, kind ``terms``
        (keyword doc-value, string key) or ``histogram`` (numeric
        doc-value bucketed to ``floor(v / interval) * interval``, float
        key). One vectorized grouped count over the gathered doc-value
        columns; per-shard at scale, merged by the coordinator exactly
        like the single-source path."""
        import pandas as pd

        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return []
        cols: dict[str, np.ndarray] = {}
        for name, kind, spec in sources:
            v = self._gather_column(cand, spec["field"])
            if kind == "terms":
                cols[name] = v.astype(str)
            elif kind == "histogram":
                interval = float(spec["interval"])
                cols[name] = np.floor(v.astype(np.float64) / interval) * interval
            else:
                raise ValueError(
                    f"composite source kind {kind!r}; supported: terms, histogram"
                )
        g = pd.DataFrame(cols).groupby(list(cols), sort=True).size()
        rows = [
            ((k if isinstance(k, tuple) else (k,)), int(n))
            for k, n in g.items()
        ]
        if after is not None:
            af = tuple(after)
            rows = [rw for rw in rows if rw[0] > af]
        return rows[:size]

    # ------------------------------------------------------------- geo
    # A geo_point field `f` is stored as two float64 doc-value columns
    # `{f}_lat` / `{f}_lon` (flat Arrow columns — no struct type in the
    # docstore).  Distances are great-circle haversine on a spherical
    # earth, R = 6371000 m (the OpenSearch/Lucene constant).

    _EARTH_R_M = 6371000.0

    def _geo_columns(
        self, ordinals: np.ndarray, geo_field: str
    ) -> tuple[np.ndarray, np.ndarray]:
        lat = self._gather_column(ordinals, f"{geo_field}_lat").astype(
            np.float64
        )
        lon = self._gather_column(ordinals, f"{geo_field}_lon").astype(
            np.float64
        )
        return lat, lon

    @staticmethod
    def _haversine_m(
        lat: np.ndarray, lon: np.ndarray, olat: float, olon: float
    ) -> np.ndarray:
        """Vectorized haversine distance (meters) from one origin."""
        la1 = np.radians(lat)
        la2 = np.radians(olat)
        dla = np.radians(olat - lat)
        dlo = np.radians(olon - lon)
        h = (
            np.sin(dla / 2.0) ** 2
            + np.cos(la1) * np.cos(la2) * np.sin(dlo / 2.0) ** 2
        )
        return 2.0 * IndexReader._EARTH_R_M * np.arcsin(np.sqrt(h))

    def geo_distance_docs(
        self, geo_field: str, lat: float, lon: float, distance_m: float
    ) -> np.ndarray:
        """``geo_distance`` query: live docs within ``distance_m``
        meters of the origin — one gather per coordinate column over
        the live ordinal set, one vectorized haversine, sorted ids."""
        ords = self._all_ordinals()
        if ords.size == 0:
            return np.empty(0, np.uint64)
        la, lo = self._geo_columns(ords, geo_field)
        d = self._haversine_m(la, lo, float(lat), float(lon))
        keep = ords[d <= float(distance_m)]
        return np.sort(self._map_ordinals(keep).astype(np.uint64))

    def geo_bounding_box_docs(
        self,
        geo_field: str,
        top: float,
        left: float,
        bottom: float,
        right: float,
    ) -> np.ndarray:
        """``geo_bounding_box`` query: docs inside the [bottom, top] x
        [left, right] rectangle (inclusive, no dateline wrapping)."""
        if left > right:
            raise ValueError("dateline-crossing boxes are not supported")
        ords = self._all_ordinals()
        if ords.size == 0:
            return np.empty(0, np.uint64)
        la, lo = self._geo_columns(ords, geo_field)
        m = (la <= float(top)) & (la >= float(bottom))
        m &= (lo >= float(left)) & (lo <= float(right))
        return np.sort(self._map_ordinals(ords[m]).astype(np.uint64))

    def geo_polygon_docs(
        self, geo_field: str, points: list[tuple[float, float]]
    ) -> np.ndarray:
        """``geo_polygon`` query (the legacy OpenSearch clause): docs
        whose point is inside the closed polygon by the even-odd
        ray-crossing rule on the planar lat/lon grid — per edge
        (i, j): the point crosses iff ``(lat_i > lat) != (lat_j >
        lat)`` and ``lon < (lon_j - lon_i) * (lat - lat_i) /
        (lat_j - lat_i) + lon_i``; inside = odd crossing count.
        One vectorized pass per edge over the live ordinal set (edges
        are few, docs are many), the exact arithmetic order the SQL
        oracle mirrors term-for-term. Horizontal edges never satisfy
        the first conjunct, so their division is masked out. Planar
        semantics (no great-circle edges, no dateline wrap) — the
        documented behavior of the legacy clause for small polygons."""
        if len(points) < 3:
            raise ValueError("geo_polygon needs at least 3 points")
        ords = self._all_ordinals()
        if ords.size == 0:
            return np.empty(0, np.uint64)
        la, lo = self._geo_columns(ords, geo_field)
        plats = np.asarray([p[0] for p in points], dtype=np.float64)
        plons = np.asarray([p[1] for p in points], dtype=np.float64)
        inside = np.zeros(la.size, dtype=bool)
        n = plats.size
        j = n - 1
        for i in range(n):
            yi, xi = plats[i], plons[i]
            yj, xj = plats[j], plons[j]
            crosses = (yi > la) != (yj > la)
            denom = yj - yi
            if denom != 0.0:
                xcross = (xj - xi) * (la - yi) / denom + xi
                inside ^= crosses & (lo < xcross)
            j = i
        return np.sort(self._map_ordinals(ords[inside]).astype(np.uint64))

    def facet_geo_distance(
        self,
        query: str,
        geo_field: str,
        origin: tuple[float, float],
        ranges: list[tuple[float | None, float | None]],
        field: str | None = None,
    ) -> list[tuple[float | None, float | None, int]]:
        """``geo_distance`` aggregation: doc counts per half-open
        ``[from, to)`` meter ring around the origin, over the query's
        match set — the facet_ranges shape after one haversine pass."""
        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return [(lo, hi, 0) for lo, hi in ranges]
        la, lo_ = self._geo_columns(cand, geo_field)
        d = self._haversine_m(la, lo_, origin[0], origin[1])
        out = []
        for lo, hi in ranges:
            m = np.ones(d.size, dtype=bool)
            if lo is not None:
                m &= d >= float(lo)
            if hi is not None:
                m &= d < float(hi)
            out.append((lo, hi, int(np.count_nonzero(m))))
        return out

    def facet_geotile(
        self,
        query: str,
        geo_field: str,
        precision: int,
        size: int = 10,
        field: str | None = None,
    ) -> list[tuple[str, int]]:
        """``geotile_grid`` aggregation: doc counts per web-mercator
        map tile "z/x/y" at zoom ``precision`` — pure arithmetic
        (x = floor(2^z (lon+180)/360); y from the mercator projection
        with latitude clamped to +/-85.05112878), one vectorized pass.
        Returns (key, doc_count) sorted count desc then key asc."""
        if not 0 <= precision <= 29:
            raise ValueError("geotile precision must be in [0, 29]")
        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return []
        la, lo = self._geo_columns(cand, geo_field)
        n = np.float64(1 << precision)
        la = np.clip(la, -85.05112878, 85.05112878)
        x = np.floor(n * (lo + 180.0) / 360.0).astype(np.int64)
        x = np.clip(x, 0, (1 << precision) - 1)
        rad = np.radians(la)
        y = np.floor(
            n * (1.0 - np.log(np.tan(rad) + 1.0 / np.cos(rad)) / np.pi) / 2.0
        ).astype(np.int64)
        y = np.clip(y, 0, (1 << precision) - 1)
        tiles = x * np.int64(1 << 30) + y  # precision <= 29 => no overlap
        u, c = np.unique(tiles, return_counts=True)
        rows = [
            (f"{precision}/{int(t) >> 30}/{int(t) & ((1 << 30) - 1)}", int(k))
            for t, k in zip(u, c)
        ]
        rows.sort(key=lambda r: (-r[1], r[0]))
        return rows[: max(size, 0)]

    def facet_geohash(
        self,
        query: str,
        geo_field: str,
        precision: int,
        size: int = 10,
        field: str | None = None,
    ) -> list[tuple[str, int]]:
        """``geohash_grid`` aggregation: doc counts per geohash cell at
        ``precision`` chars — the standard base-32 geohash (lon/lat
        interval halving, bits interleaved lon-first, MSB first).
        Vectorized: both coordinates quantize in one expression
        (``floor(2^n * (coord + off) / span)`` — written in exactly
        that operation order so a SQL oracle computing the same
        expression is bit-identical), the interleave is 5*precision
        vectorized shift-and-or steps over the whole match set, and
        only the UNIQUE cell integers are rendered to strings.
        Returns (hash, doc_count) sorted count desc then key asc."""
        if not 1 <= precision <= 12:
            raise ValueError("geohash precision must be in [1, 12]")
        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return []
        la, lo = self._geo_columns(cand, geo_field)
        bits = 5 * precision
        nlon, nlat = (bits + 1) // 2, bits // 2
        lx = np.floor((1 << nlon) * (lo + 180.0) / 360.0).astype(np.int64)
        lx = np.clip(lx, 0, (1 << nlon) - 1)
        ly = np.floor((1 << nlat) * (la + 90.0) / 180.0).astype(np.int64)
        ly = np.clip(ly, 0, (1 << nlat) - 1)
        g = np.zeros(cand.size, dtype=np.int64)
        for j in range(bits):
            src, sh = (lx, nlon - 1 - j // 2) if j % 2 == 0 else (
                ly, nlat - 1 - j // 2
            )
            g |= ((src >> sh) & 1) << (bits - 1 - j)
        u, c = np.unique(g, return_counts=True)
        b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
        rows = [
            (
                "".join(
                    b32[(int(gv) >> (5 * (precision - 1 - k))) & 31]
                    for k in range(precision)
                ),
                int(n),
            )
            for gv, n in zip(u, c)
        ]
        rows.sort(key=lambda r: (-r[1], r[0]))
        return rows[: max(size, 0)]

    def facet_multi_terms(
        self,
        query: str,
        fields: list[str],
        size: int = 10,
        field: str | None = None,
    ) -> list[tuple[tuple[str, ...], int]]:
        """multi_terms aggregation: buckets keyed by the TUPLE of two+
        keyword doc-values (OpenSearch ``multi_terms``) — one gather
        per source column, one lexsort, adjacent-difference group
        starts; no per-bucket work.  Returns (key_tuple, doc_count)
        sorted count-desc then key-asc, cut to ``size``."""
        if len(fields) < 2:
            raise ValueError("multi_terms needs at least two term sources")
        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return []
        cols = [self._gather_column(cand, fl).astype(str) for fl in fields]
        order = np.lexsort(cols[::-1])  # first field = primary key
        sc = [c[order] for c in cols]
        neq = np.zeros(sc[0].size, dtype=bool)
        neq[0] = True
        for c in sc:
            neq[1:] |= c[1:] != c[:-1]
        starts = np.flatnonzero(neq)
        counts = np.diff(np.append(starts, sc[0].size))
        rows = [
            (tuple(str(c[s]) for c in sc), int(n))
            for s, n in zip(starts, counts)
        ]
        rows.sort(key=lambda t: (-t[1], t[0]))
        return rows[: max(size, 0)]

    def facet_terms_stats(
        self,
        query: str,
        group_field: str,
        stat_field: str,
        field: str | None = None,
    ) -> list[tuple[str, int, object, object, object, float]]:
        """terms aggregation with a ``stats`` sub-aggregation: per
        keyword bucket, count / min / max / sum / avg of a numeric
        doc-value over the matching docs. One gather per column, then
        vectorized per-group reductions (sorted-group segment
        reduceat) — no per-bucket re-query. Returns (key, count, min,
        max, sum, avg) sorted by key ascending."""
        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return []
        gvals = self._gather_column(cand, group_field).astype(str)
        svals = self._gather_column(cand, stat_field)
        if svals.dtype == object:
            raise TypeError(f"stats field {stat_field!r} is not numeric")
        order = np.argsort(gvals, kind="stable")
        g = gvals[order]
        v = svals[order]
        starts = np.flatnonzero(np.concatenate(([True], g[1:] != g[:-1])))
        counts = np.diff(np.append(starts, g.size))
        sums = np.add.reduceat(v, starts)
        mins = np.minimum.reduceat(v, starts)
        maxs = np.maximum.reduceat(v, starts)
        return [
            (
                str(g[s]),
                int(n),
                mn.item(),
                mx.item(),
                sm.item(),
                float(sm) / int(n),
            )
            for s, n, mn, mx, sm in zip(starts, counts, mins, maxs, sums)
        ]

    def percentiles_agg(
        self,
        query: str,
        agg_field: str,
        percents: tuple[float, ...] = (1, 5, 25, 50, 75, 95, 99),
        field: str | None = None,
    ) -> dict[float, float]:
        """Percentiles aggregation (OpenSearch ``aggs.percentiles``),
        EXACT variant with linear interpolation — the same estimator as
        SQL ``percentile_cont`` / numpy's default, so it is
        oracle-checkable (OpenSearch's t-digest is approximate; the
        match set after a query is small enough that exact is the right
        default, mirroring ``cardinality_agg``'s choice)."""
        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return {float(p): None for p in percents}
        vals = self._gather_column(cand, agg_field).astype(np.float64)
        qs = np.percentile(vals, list(percents))
        return {float(p): float(v) for p, v in zip(percents, qs)}

    def percentile_ranks_agg(
        self,
        query: str,
        agg_field: str,
        values: tuple[float, ...],
        field: str | None = None,
    ) -> dict[float, float]:
        """Percentile-ranks aggregation (OpenSearch
        ``percentile_ranks``), EXACT variant: for each probe value v,
        the percentage of matching docs whose doc-value is <= v —
        ``100 * count(val <= v) / n`` (pinned definition; OpenSearch's
        t-digest interpolates, but the exact empirical CDF is
        oracle-checkable — same choice as ``percentiles_agg``). One
        sort + one searchsorted for all probes."""
        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return {float(v): None for v in values}
        vals = np.sort(self._gather_column(cand, agg_field).astype(np.float64))
        pos = np.searchsorted(vals, np.asarray(values, np.float64), side="right")
        n = float(vals.size)
        return {float(v): 100.0 * int(p) / n for v, p in zip(values, pos)}

    def median_absolute_deviation_agg(
        self, query: str, agg_field: str, field: str | None = None
    ) -> float | None:
        """Median-absolute-deviation aggregation (OpenSearch
        ``median_absolute_deviation``), EXACT variant:
        ``median(|x - median(x)|)`` with the linear-interpolation
        median (== SQL ``median`` / ``quantile_cont(0.5)``) — same
        exact-over-approximate choice as ``percentiles_agg``
        (OpenSearch estimates both medians with t-digest)."""
        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return None
        vals = self._gather_column(cand, agg_field).astype(np.float64)
        med = float(np.median(vals))
        return float(np.median(np.abs(vals - med)))

    def boxplot_agg(
        self, query: str, agg_field: str, field: str | None = None
    ) -> dict:
        """Boxplot aggregation (OpenSearch ``boxplot``): min / q1 / q2
        / q3 / max of a numeric doc-value over the match set, with the
        same exact linear-interpolation quantiles as
        ``percentiles_agg`` (== SQL ``quantile_cont``). ``lower`` /
        ``upper`` are the Tukey whisker fences CLAMPED to the observed
        data range, per the OpenSearch response contract (the nearest
        actual values inside q1/q3 -/+ 1.5*IQR)."""
        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return {"min": None, "max": None, "q1": None, "q2": None,
                    "q3": None, "lower": None, "upper": None}
        vals = np.sort(
            self._gather_column(cand, agg_field).astype(np.float64)
        )
        q1, q2, q3 = (float(v) for v in np.percentile(vals, (25, 50, 75)))
        iqr = q3 - q1
        lo_fence, hi_fence = q1 - 1.5 * iqr, q3 + 1.5 * iqr
        inside = vals[(vals >= lo_fence) & (vals <= hi_fence)]
        return {
            "min": float(vals[0]),
            "max": float(vals[-1]),
            "q1": q1,
            "q2": q2,
            "q3": q3,
            "lower": float(inside[0]) if inside.size else None,
            "upper": float(inside[-1]) if inside.size else None,
        }

    def t_test_agg(
        self,
        query: str,
        agg_field: str,
        split_field: str,
        value_a: str,
        value_b: str,
        kind: str = "heteroscedastic",
        field: str | None = None,
    ) -> dict:
        """Two-sample t-test aggregation (OpenSearch ``t_test``) over a
        numeric doc-value, the two populations being the match-set docs
        whose keyword ``split_field`` equals ``value_a`` / ``value_b``
        (the a.filter / b.filter form). EXACT variant: returns the
        t-statistic and degrees of freedom instead of OpenSearch's
        p-value — the p-value needs the Student-t CDF (incomplete
        beta), which is approximate by construction and not
        SQL-reproducible; the statistic itself is closed-form
        (``heteroscedastic`` = Welch with Welch-Satterthwaite dof,
        ``homoscedastic`` = pooled-variance Student) and matches a SQL
        re-derivation from avg/var_samp bit-closely. Sample variance
        (ddof=1) throughout, as in Lucene's TTestAggregator."""
        if kind not in ("heteroscedastic", "homoscedastic"):
            raise ValueError(f"unsupported t_test type {kind!r}")
        cand = self._match_ordinals(query, field)
        empty = {"t": None, "dof": None, "n_a": 0, "n_b": 0}
        if cand.size == 0:
            return empty
        split = self._gather_column(cand, split_field).astype(str)
        vals = self._gather_column(cand, agg_field).astype(np.float64)
        a = vals[split == str(value_a)]
        b = vals[split == str(value_b)]
        empty["n_a"], empty["n_b"] = int(a.size), int(b.size)
        if a.size < 2 or b.size < 2:
            return empty
        na, nb = float(a.size), float(b.size)
        va = float(np.var(a, ddof=1))
        vb = float(np.var(b, ddof=1))
        diff = float(np.mean(a)) - float(np.mean(b))
        if kind == "heteroscedastic":
            sa, sb = va / na, vb / nb
            se2 = sa + sb
            if se2 == 0.0:
                return empty
            dof = se2 * se2 / (sa * sa / (na - 1.0) + sb * sb / (nb - 1.0))
        else:
            pooled = ((na - 1.0) * va + (nb - 1.0) * vb) / (na + nb - 2.0)
            se2 = pooled * (1.0 / na + 1.0 / nb)
            if se2 == 0.0:
                return empty
            dof = na + nb - 2.0
        return {
            "t": diff / math.sqrt(se2),
            "dof": float(dof),
            "n_a": int(a.size),
            "n_b": int(b.size),
        }

    def geo_bounds_agg(
        self, query: str, geo_field: str, field: str | None = None
    ) -> dict | None:
        """geo_bounds aggregation: the smallest bounding box covering
        every matching doc's geo_point — top_left = (max lat, min lon),
        bottom_right = (min lat, max lon). No dateline wrapping (same
        contract as ``geo_bounding_box_docs``)."""
        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return None
        la, lo = self._geo_columns(cand, geo_field)
        return {
            "top_left": {"lat": float(la.max()), "lon": float(lo.min())},
            "bottom_right": {"lat": float(la.min()), "lon": float(lo.max())},
        }

    def geo_centroid_agg(
        self, query: str, geo_field: str, field: str | None = None
    ) -> dict | None:
        """geo_centroid aggregation: arithmetic mean of the matching
        docs' lat/lon (OpenSearch's documented definition — a flat
        average of degrees, not a spherical centroid), plus the count.
        At cluster scale the partials are (sum_lat, sum_lon, n) merged
        by addition."""
        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return None
        la, lo = self._geo_columns(cand, geo_field)
        return {
            "location": {
                "lat": float(la.sum()) / cand.size,
                "lon": float(lo.sum()) / cand.size,
            },
            "count": int(cand.size),
        }

    def _feature_candidates(self, field: str) -> tuple[np.ndarray, np.ndarray]:
        """(ordinals, float64 values) of live docs with a non-null
        value for a numeric doc-value field — the candidate set of the
        feature queries (rank_feature / distance_feature score every
        doc carrying the field)."""
        ords = self._all_ordinals()
        if ords.size == 0:
            return ords, np.empty(0, np.float64)
        vals = self._gather_column(ords, field)
        if vals.dtype == object:
            mask = np.array([v is not None for v in vals])
            return ords[mask], vals[mask].astype(np.float64)
        vals = vals.astype(np.float64)
        mask = ~np.isnan(vals)
        return ords[mask], vals[mask]

    def rank_feature(
        self,
        field: str,
        pivot: float | None = None,
        boost: float = 1.0,
        function: str = "saturation",
        scaling_factor: float | None = None,
        exponent: float | None = None,
        k: int = 10,
    ) -> list[tuple[int, float]]:
        """OpenSearch ``rank_feature`` query over a stored numeric
        doc-value (the rank_feature field analog): score every doc
        carrying the field by
        ``saturation``  boost * v / (v + pivot)   (pivot REQUIRED —
        OpenSearch derives a default from index stats; requiring it
        keeps results deterministic and oracle-checkable),
        ``log``        boost * ln(scaling_factor + v),
        ``sigmoid``    boost * v^exp / (v^exp + pivot^exp).
        One doc-value gather + one vectorized formula; ties doc_id asc."""
        ords, vals = self._feature_candidates(field)
        if ords.size == 0:
            return []
        if function == "saturation":
            if pivot is None:
                raise ValueError("rank_feature saturation requires an explicit pivot")
            scores = boost * (vals / (vals + pivot))
        elif function == "log":
            if scaling_factor is None:
                raise ValueError("rank_feature log requires scaling_factor")
            scores = boost * np.log(scaling_factor + vals)
        elif function == "sigmoid":
            if pivot is None or exponent is None:
                raise ValueError("rank_feature sigmoid requires pivot and exponent")
            ve = vals**exponent
            scores = boost * (ve / (ve + pivot**exponent))
        else:
            raise ValueError(f"unsupported rank_feature function {function!r}")
        ids, sc = self._rank(ords, scores, k)
        return list(zip(ids.tolist(), sc.tolist()))

    def distance_feature(
        self,
        field: str,
        origin: float,
        pivot: float,
        boost: float = 1.0,
        k: int = 10,
    ) -> list[tuple[int, float]]:
        """OpenSearch ``distance_feature`` over a numeric/date
        doc-value: score = boost * pivot / (pivot + |v - origin|) —
        docs closer to ``origin`` score higher, halving at distance
        ``pivot``. Dates use epoch numbers (the stored doc-value
        representation); geo fields are out of scope (no geo data in
        the reference's domain)."""
        ords, vals = self._feature_candidates(field)
        if ords.size == 0:
            return []
        scores = boost * (pivot / (pivot + np.abs(vals - origin)))
        ids, sc = self._rank(ords, scores, k)
        return list(zip(ids.tolist(), sc.tolist()))

    def search_function_score(
        self,
        query: str,
        fs_field: str,
        factor: float = 1.0,
        modifier: str = "log1p",
        boost_mode: str = "multiply",
        k: int = 10,
        field: str | None = None,
    ) -> list[tuple[int, float]]:
        """``function_score`` with a ``field_value_factor`` function:
        final score = BM25(query) <boost_mode> modifier(factor * value)
        where ``value`` is a stored numeric doc-value of the matching
        doc. Supported modifiers: ``log1p`` (ln(1 + f*v)), ``sqrt``,
        ``none``; boost_mode ``multiply`` (OpenSearch default) or
        ``sum``. Evaluation is one combine over the query's posting
        runs, one doc-value gather for the candidates, one vectorized
        modifier — then the standard (score desc, doc_id asc) rank."""
        avgdl = self.field_avgdl(field)
        qcounts = Counter(self.field_terms(query, field))
        postings = self.load_postings(sorted(qcounts))
        parts_ids, parts_scores = [], []
        for term in sorted(qcounts):
            p = postings.get(term)
            if p is None:
                continue
            contrib = qcounts[term] * self.idf(p.df) * self._norm_cached(p, avgdl)
            parts_ids.append(p.doc_ids)
            parts_scores.append(contrib)
        if not parts_ids:
            return []
        uniq, scores = self._combine(parts_ids, parts_scores)
        vals = self._gather_column(uniq, fs_field).astype(np.float64)
        if modifier == "log1p":
            # ln(1 + f*v) computed as the literal chain (not np.log1p):
            # the SQL oracle's `ln(1 + f*v)` must see identical floats
            fv = np.log(1.0 + factor * vals)
        elif modifier == "sqrt":
            fv = np.sqrt(factor * vals)
        elif modifier == "none":
            fv = factor * vals
        else:
            raise ValueError(f"unsupported field_value_factor modifier {modifier!r}")
        if boost_mode == "multiply":
            scores = scores * fv
        elif boost_mode == "sum":
            scores = scores + fv
        else:
            raise ValueError(f"unsupported boost_mode {boost_mode!r}")
        ids, sc = self._rank(uniq, scores, k)
        return list(zip(ids.tolist(), sc.tolist()))

    def search_decay(
        self,
        query: str,
        decay_field: str,
        origin: float,
        scale: float,
        offset: float = 0.0,
        decay: float = 0.5,
        function: str = "gauss",
        boost_mode: str = "multiply",
        k: int = 10,
        field: str | None = None,
    ) -> list[tuple[int, float]]:
        """``function_score`` decay functions over a numeric doc-value
        (OpenSearch ``gauss`` / ``exp`` / ``linear``): final score =
        BM25 <boost_mode> decay(|v - origin|). Pinned to the published
        formulas with d = max(0, |v - origin| - offset):

        - gauss:  exp(d^2 * ln(decay) / scale^2)
        - exp:    exp(d * ln(decay) / scale)
        - linear: max(0, 1 - d * (1 - decay) / scale)

        One doc-value gather over the combined match set, one
        vectorized kernel — same pass shape as field_value_factor.
        exp() is not correctly rounded across libms, so oracle entries
        compare ranks, not score bytes (the function_score_nchars
        convention note)."""
        avgdl = self.field_avgdl(field)
        qcounts = Counter(self.field_terms(query, field))
        postings = self.load_postings(sorted(qcounts))
        parts_ids, parts_scores = [], []
        for term in sorted(qcounts):
            p = postings.get(term)
            if p is None:
                continue
            contrib = qcounts[term] * self.idf(p.df) * self._norm_cached(p, avgdl)
            parts_ids.append(p.doc_ids)
            parts_scores.append(contrib)
        if not parts_ids:
            return []
        if not 0.0 < decay < 1.0:
            raise ValueError("decay must be in (0, 1)")
        if scale <= 0:
            raise ValueError("scale must be positive")
        uniq, scores = self._combine(parts_ids, parts_scores)
        vals = self._gather_column(uniq, decay_field).astype(np.float64)
        d = np.maximum(0.0, np.abs(vals - origin) - offset)
        if function == "gauss":
            fv = np.exp(d * d * np.log(decay) / (scale * scale))
        elif function == "exp":
            fv = np.exp(d * np.log(decay) / scale)
        elif function == "linear":
            fv = np.maximum(0.0, 1.0 - d * (1.0 - decay) / scale)
        else:
            raise ValueError(f"unsupported decay function {function!r}")
        if boost_mode == "multiply":
            scores = scores * fv
        elif boost_mode == "sum":
            scores = scores + fv
        elif boost_mode == "replace":
            scores = fv
        else:
            raise ValueError(f"unsupported boost_mode {boost_mode!r}")
        ids, sc = self._rank(uniq, scores, k)
        return list(zip(ids.tolist(), sc.tolist()))

    def search_random_score(
        self,
        query: str,
        seed: int = 0,
        k: int = 10,
        field: str | None = None,
    ) -> list[tuple[int, float]]:
        """``function_score`` with ``random_score`` in boost_mode
        replace: a DETERMINISTIC uniform pseudo-score per (seed, doc) —
        ``(splitmix64(doc_id XOR seed) >> 11) / 2^53``, an exact float64
        in [0, 1) reproducible in SQL with the same shift-divide (the
        extras/shuffle key, so sampling and shuffling share one
        definition). OpenSearch seeds Lucene's hash the same way
        conceptually; the exact generator is pinned here so results are
        stable across versions AND partitioning. The standard
        deterministic-sample idiom: top-k by random score = a seeded
        uniform sample of the match set."""
        from ..extras.shuffle import splitmix64

        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return []
        dids = self._map_ordinals(cand).astype(np.uint64)
        u = splitmix64(dids ^ np.uint64(seed))
        scores = (u >> np.uint64(11)).astype(np.float64) / float(1 << 53)
        order = np.lexsort((dids, -scores))[:k]
        return list(zip(dids[order].tolist(), scores[order].tolist()))

    def search_script_score(
        self,
        query: str,
        source: str,
        k: int = 10,
        field: str | None = None,
    ) -> list[tuple[int, float]]:
        """``script_score`` query (painless arithmetic subset, see
        query/script.py): final score = script(_score = BM25(query),
        doc['<col>'].value = stored doc-values). The script compiles
        once per query to a whitelisted-AST numpy expression; doc
        values are gathered once for the full candidate set (same
        pruned per-bucket reads as ``search_function_score``) and the
        script evaluates vectorized — then the standard
        (score desc, doc_id asc) rank."""
        from .script import compile_script

        fn = compile_script(source)
        avgdl = self.field_avgdl(field)
        qcounts = Counter(self.field_terms(query, field))
        postings = self.load_postings(sorted(qcounts))
        parts_ids, parts_scores = [], []
        for term in sorted(qcounts):
            p = postings.get(term)
            if p is None:
                continue
            contrib = qcounts[term] * self.idf(p.df) * self._norm_cached(p, avgdl)
            parts_ids.append(p.doc_ids)
            parts_scores.append(contrib)
        if not parts_ids:
            return []
        uniq, scores = self._combine(parts_ids, parts_scores)
        vals = {
            f: self._gather_column(uniq, f).astype(np.float64) for f in fn.fields
        }
        scores = fn(scores, vals)
        ids, sc = self._rank(uniq, scores, k)
        return list(zip(ids.tolist(), sc.tolist()))

    def cardinality_agg(
        self, query: str, agg_field: str, field: str | None = None
    ) -> int:
        """Cardinality aggregation, EXACT variant: distinct doc-value
        count over matching docs (np.unique on the gathered column).
        OpenSearch's HLL-approximate flavor exists in
        ``raybm25.sketch`` for corpus-scale fields; doc-value
        cardinalities after a match are typically small enough that
        exact is the right default here."""
        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return 0
        vals = self._gather_column(cand, agg_field)
        if vals.dtype == object:
            vals = vals.astype(str)
        return int(np.unique(vals).size)

    def stats_over_ids(self, doc_ids: np.ndarray, agg_field: str) -> dict:
        """count / min / max / sum / avg of a stored numeric doc-value
        over an EXPLICIT doc-id set (the single ``filter`` agg's metric
        sub-agg shape, where the candidate set comes from arbitrary
        filter algebra rather than one match query). One
        predicate-pushdown docstore scan reading only (doc_id,
        agg_field): row-group statistics prune partitions whose id
        range misses the set; each partition is an independent task at
        cluster scale."""
        import glob as _glob

        import pyarrow.dataset as pds
        import pyarrow.parquet as _pq

        ids = np.asarray(doc_ids, dtype=np.uint64)
        if ids.size == 0:
            return {"count": 0, "min": None, "max": None, "sum": 0,
                    "avg": None}
        expr = pds.field("doc_id").isin(ids)
        parts = []
        for path in sorted(
            _glob.glob(os.path.join(self._docs_dir, "*.parquet"))
        ):
            t = pds.dataset(path).to_table(
                columns=["doc_id", agg_field], filter=expr
            )
            if t.num_rows:
                parts.append(t.column(agg_field).to_numpy(
                    zero_copy_only=False
                ))
        if not parts:
            return {"count": 0, "min": None, "max": None, "sum": 0,
                    "avg": None}
        vals = np.concatenate(parts)
        s = vals.sum()
        return {
            "count": int(vals.size),
            "min": vals.min().item(),
            "max": vals.max().item(),
            "sum": s.item(),
            "avg": float(s) / float(vals.size),
        }

    def string_stats_agg(
        self, query: str, agg_field: str, field: str | None = None
    ) -> dict:
        """String-stats aggregation (OpenSearch ``string_stats``):
        count / min_length / max_length / avg_length of a stored
        string doc-value over the match set, plus the Shannon entropy
        (bits, log2) of the CHARACTER distribution across all values —
        the OpenSearch definition. Lengths are vectorized
        (np.char.str_len); the character histogram is one utf-32
        decode of the concatenated values + np.unique — no per-doc
        loop. ``entropy`` is rounded to 10 decimals so the value is
        reproducible against a SQL oracle that accumulates the same
        histogram in a different floating-point order."""
        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return {"count": 0, "min_length": None, "max_length": None,
                    "avg_length": None, "entropy": 0.0}
        vals = self._gather_column(cand, agg_field).astype(str)
        lens = np.char.str_len(vals)
        chars = np.frombuffer(
            "".join(vals.tolist()).encode("utf-32-le"), dtype=np.uint32
        )
        if chars.size == 0:
            ent = 0.0
        else:
            _, counts = np.unique(chars, return_counts=True)
            p = counts / float(chars.size)
            ent = float(-(p * np.log2(p)).sum())
        return {
            "count": int(lens.size),
            "min_length": int(lens.min()),
            "max_length": int(lens.max()),
            "avg_length": float(lens.sum()) / float(lens.size),
            "entropy": round(ent, 10),
        }

    def scripted_metric_agg(
        self,
        query: str,
        init_script: str,
        map_script: str,
        field: str | None = None,
    ) -> float:
        """Scripted-metric aggregation (OpenSearch ``scripted_metric``),
        vectorized subset: ``init_script`` must be
        ``state.<v> = <number>`` and ``map_script`` must be
        ``state.<v> += <expr>`` where ``<expr>`` is the script_score
        expression grammar (``doc['f'].value`` arithmetic +
        Math.* — query/script.py). The combine/reduce phases are
        pinned to per-partition partial sums + a global sum: the only
        reduction whose result is invariant to how docs are
        partitioned across shards/blocks, which is the honest subset a
        distributed engine can offer (an order-dependent
        ``reduce_script`` has no deterministic distributed meaning).
        Returns ``init + sum(expr over matching docs)`` — evaluated as
        ONE numpy expression over the gathered doc-values."""
        import re as _re

        from .script import compile_script

        m_init = _re.fullmatch(
            r"\s*state\.([A-Za-z_]\w*)\s*=\s*(-?\d+(?:\.\d+)?)\s*",
            str(init_script),
        )
        if not m_init:
            raise ValueError(
                "scripted_metric init_script must be 'state.<v> = <number>'"
            )
        var, init_v = m_init.group(1), float(m_init.group(2))
        m_map = _re.fullmatch(
            r"\s*state\.([A-Za-z_]\w*)\s*\+=\s*(.+?)\s*", str(map_script)
        )
        if not m_map or m_map.group(1) != var:
            raise ValueError(
                "scripted_metric map_script must be 'state.<v> += <expr>' "
                "over the init_script's state variable"
            )
        fn = compile_script(m_map.group(2))
        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return init_v
        values = {
            fl: self._gather_column(cand, fl).astype(np.float64)
            for fl in fn.fields
        }
        out = fn(np.zeros(cand.size, dtype=np.float64), values)
        return float(init_v + out.sum())

    def facet_date_histogram_cardinality(
        self,
        query: str,
        ts_field: str,
        interval_ms: int,
        value_field: str,
        field: str | None = None,
    ) -> list[tuple[int, int, int, int]]:
        """date_histogram with an exact ``cardinality`` sub-agg and the
        ``cumulative_cardinality`` pipeline in one pass: per time
        bucket, (bucket_ms, doc_count, distinct value_field count
        within the bucket, cumulative distinct count up to and
        including the bucket). Vectorized: values factorize once
        (np.unique codes), per-bucket distincts are unique
        (bucket, code) pairs, and the cumulative curve is a bincount
        of each code's FIRST bucket + cumsum — no per-bucket set
        objects, so the cost is O(n log n) in matching docs
        regardless of bucket count."""
        if interval_ms <= 0:
            raise ValueError("interval_ms must be positive")
        cand = self._match_ordinals(query, field)
        if cand.size == 0:
            return []
        ms = (
            self._gather_column(cand, ts_field)
            .astype("datetime64[ms]")
            .astype(np.int64)
        )
        keys = (ms // interval_ms) * interval_ms
        vals = self._gather_column(cand, value_field)
        if vals.dtype == object:
            vals = vals.astype(str)
        uvals, codes = np.unique(vals, return_inverse=True)
        order = np.argsort(keys, kind="stable")
        k = keys[order]
        c = codes[order]
        starts = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
        counts = np.diff(np.append(starts, k.size))
        bucket_keys = k[starts]
        bidx = np.searchsorted(bucket_keys, k)
        pair = bidx.astype(np.int64) * np.int64(uvals.size) + c
        upair = np.unique(pair)
        card = np.bincount(
            (upair // np.int64(uvals.size)).astype(np.int64),
            minlength=bucket_keys.size,
        )
        first_b = np.full(uvals.size, bucket_keys.size, dtype=np.int64)
        np.minimum.at(first_b, c, bidx)
        cum = np.cumsum(np.bincount(first_b, minlength=bucket_keys.size + 1))[
            : bucket_keys.size
        ]
        return [
            (int(b), int(n), int(cd), int(cm))
            for b, n, cd, cm in zip(bucket_keys, counts, card, cum)
        ]

    # ------------------------------------------------- term dictionary
    def term_dictionary(self, field: str | None = None) -> pa.Array:
        """Sorted unique analyzed terms of one text field (the Lucene
        term-dictionary analog backing multi-term queries: prefix /
        wildcard / fuzzy — /root/reference's OpenSearch delegates these
        to Lucene's FST dictionary).

        Built once per reader by a term-column-only scan of the
        postings shards (columnar + dictionary-encoded — a tiny
        fraction of index bytes) and cached. The dictionary is
        vocabulary-sized, not corpus-sized (Heaps' law: ~millions of
        terms at 100 TB), so a serving actor holds it comfortably; the
        one-time build fans out per shard file on a cluster."""
        import glob

        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        want = self.primary_field if field is None else field
        cached = self._term_dicts.get(want)
        if cached is not None:
            return cached
        if self._term_dicts.get("") is None:
            parts = []
            for p in sorted(glob.glob(os.path.join(self._postings_dir, "*.parquet"))):
                parts.append(pq.read_table(p, columns=["term"]).column("term"))
            allt = pa.chunked_array(parts) if parts else pa.chunked_array(
                [pa.array([], pa.string())]
            )
            u = pc.unique(allt)
            self._term_dicts[""] = u.take(pc.array_sort_indices(u))
        d = self._term_dicts[""]
        if want == self.primary_field:
            # primary-field terms are exactly the colon-free ones
            # (keyword + secondary text fields are stored "field:term")
            out = d.filter(pc.invert(pc.match_substring(d, ":")))
        else:
            pref = f"{want}:"
            sub = d.filter(pc.starts_with(d, pattern=pref))
            out = pc.utf8_slice_codeunits(sub, start=len(pref))
        self._term_dicts[want] = out
        return out

    def expand_wildcard(self, pattern: str, field: str | None = None) -> list[str]:
        """Dictionary terms matching an OpenSearch ``wildcard`` pattern
        (``*`` = any run, ``?`` = one char; anchored both ends),
        matched with one vectorized Arrow regex pass."""
        import re as _re

        import pyarrow.compute as pc

        rx = "^" + "".join(
            ".*" if c == "*" else "." if c == "?" else _re.escape(c)
            for c in pattern.lower()
        ) + "$"
        d = self.term_dictionary(field)
        return d.filter(pc.match_substring_regex(d, rx)).to_pylist()

    def expand_prefix(self, prefix: str, field: str | None = None) -> list[str]:
        """Dictionary terms starting with ``prefix`` — a binary-search
        range on the sorted dictionary, no scan."""
        d = self.term_dictionary(field)
        # the dictionary array is sorted; bound the [prefix, prefix+1)
        # codepoint range with searchsorted over a numpy object view
        terms = np.asarray(d)
        lo = np.searchsorted(terms, prefix.lower())
        hi = np.searchsorted(terms, prefix.lower() + "\U0010ffff")
        return terms[lo:hi].tolist()

    def expand_fuzzy(
        self, term: str, max_edits: int = 1, prefix_length: int = 0,
        field: str | None = None, transpositions: bool = False,
    ) -> list[str]:
        """Dictionary terms within ``max_edits`` edits of ``term``
        (OpenSearch ``fuzzy`` query; Lucene's automaton walk).

        ``transpositions=True`` counts an adjacent-character swap as
        ONE edit (Lucene's OSA / restricted Damerau-Levenshtein — the
        OpenSearch ``fuzzy.transpositions`` flag, default true there;
        default false HERE because the pre-existing contract entries
        pin plain Levenshtein, whose DuckDB oracle is exact at every
        distance. DuckDB's ``damerau_levenshtein`` is the UNRESTRICTED
        variant, which agrees with OSA only below distance 2 — the
        ``fuzzy_osa_docs`` oracle therefore pins ``max_edits=1``).

        Vectorized: candidates are pre-cut to the |len - len(q)| <=
        max_edits band (and a shared ``prefix_length`` head, Lucene's
        knob), unpacked zero-copy from the Arrow buffers into a padded
        byte matrix, then one banded DP runs over ALL candidates at
        once — numpy ops of shape (n_cand, max_len), no per-term
        Python."""
        import pyarrow.compute as pc

        q = term.lower().encode()
        d = self.term_dictionary(field)
        lens = pc.binary_length(d)
        m = len(q)
        mask = pc.and_(
            pc.greater_equal(lens, m - max_edits),
            pc.less_equal(lens, m + max_edits),
        )
        if prefix_length > 0:
            mask = pc.and_(
                mask, pc.starts_with(d, pattern=term.lower()[:prefix_length])
            )
        cand = d.filter(mask)
        if isinstance(cand, pa.ChunkedArray):
            cand = cand.combine_chunks()
        n = len(cand)
        if n == 0:
            return []
        offs = np.frombuffer(cand.buffers()[1], dtype=np.int32)
        offs = offs[cand.offset : cand.offset + n + 1]
        data = np.frombuffer(cand.buffers()[2], dtype=np.uint8)
        clens = np.diff(offs)
        total = int(offs[-1] - offs[0])
        rows = np.repeat(np.arange(n), clens)
        cols = np.arange(total) - np.repeat(offs[:-1] - offs[0], clens)
        L = int(clens.max())
        mat = np.zeros((n, L), dtype=np.uint8)
        mat[rows, cols] = data[offs[0] : offs[-1]]
        # Levenshtein DP, all candidates at once: prev[r, j] = distance
        # between q[:i] and cand_r[:j]; with transpositions, prev2 is
        # the i-2 row and an adjacent swap closes from prev2[:, j-2]+1
        # (OSA recurrence — a transposed pair may not be edited again)
        prev = np.broadcast_to(np.arange(L + 1), (n, L + 1)).astype(np.int32)
        cur = np.empty_like(prev)
        prev2 = np.empty_like(prev) if transpositions else None
        for i in range(1, m + 1):
            cur[:, 0] = i
            np.minimum(prev[:, 1:] + 1, prev[:, :-1] + (mat != q[i - 1]), out=cur[:, 1:])
            if transpositions and i >= 2:
                # cur[:, j] <= prev2[:, j-2] + 1 where q[i-2:i] swapped
                # equals cand[j-2:j]: q[i-1]==cand[j-2] and q[i-2]==cand[j-1]
                swap = (mat[:, :-1] == q[i - 1]) & (mat[:, 1:] == q[i - 2])
                np.minimum(
                    cur[:, 2:], np.where(swap, prev2[:, :-2] + 1, np.int32(2**30)),
                    out=cur[:, 2:],
                )
            for j in range(1, L + 1):  # insertion chain: L is tiny (term len)
                np.minimum(cur[:, j], cur[:, j - 1] + 1, out=cur[:, j])
            if transpositions:
                prev2, prev, cur = prev, cur, prev2
            else:
                prev, cur = cur, prev
        dist = prev[np.arange(n), clens]
        return [cand[i].as_py() for i in np.flatnonzero(dist <= max_edits)]

    def _expanded_docs(self, terms: list[str], field: str | None) -> np.ndarray:
        """Sorted unique doc ids containing ANY of the expanded terms
        (multi-term queries rewrite to a constant-score doc set in
        OpenSearch — membership, not BM25)."""
        if field is not None and field != self.primary_field:
            terms = [f"{field}:{t}" for t in terms]
        postings = self.load_postings(sorted(terms))
        parts = [p.doc_ids for p in postings.values()]
        if not parts:
            return np.array([], dtype=np.uint64)
        return np.sort(self._map_ordinals(self._merge_unique(parts)).astype(np.uint64))

    def wildcard_docs(self, pattern: str, field: str | None = None) -> np.ndarray:
        """Doc ids matching a ``wildcard`` query (sorted unsigned)."""
        return self._expanded_docs(self.expand_wildcard(pattern, field), field)

    def fuzzy_docs(
        self, term: str, max_edits: int = 1, prefix_length: int = 0,
        field: str | None = None, transpositions: bool = False,
    ) -> np.ndarray:
        """Doc ids matching a ``fuzzy`` query (sorted unsigned)."""
        return self._expanded_docs(
            self.expand_fuzzy(term, max_edits, prefix_length, field, transpositions),
            field,
        )

    def dict_prefix_docs(self, prefix: str, field: str | None = None) -> np.ndarray:
        """Doc ids matching a ``prefix`` query via the term dictionary
        (the sayt route in ``term_docs`` answers the same question from
        edge-grams without a dictionary — both are OpenSearch idioms)."""
        return self._expanded_docs(self.expand_prefix(prefix, field), field)

    def expand_regexp(self, pattern: str, field: str | None = None) -> list[str]:
        """Dictionary terms fully matching an RE2 regular expression
        (OpenSearch ``regexp`` query: anchored both ends, Lucene
        automaton semantics). One vectorized Arrow regex pass — Arrow's
        ``match_substring_regex`` IS RE2, the same engine DuckDB's
        ``regexp_full_match`` uses, so oracle parity is by construction."""
        import pyarrow.compute as pc

        d = self.term_dictionary(field)
        rx = f"^(?:{pattern})$"
        return d.filter(pc.match_substring_regex(d, rx)).to_pylist()

    def regexp_docs(self, pattern: str, field: str | None = None) -> np.ndarray:
        """Doc ids matching a ``regexp`` query (sorted unsigned)."""
        return self._expanded_docs(self.expand_regexp(pattern, field), field)

    def suggest_terms(
        self,
        text: str,
        size: int = 3,
        max_edits: int = 2,
        prefix_length: int = 1,
        field: str | None = None,
    ) -> list[dict]:
        """Term suggester (OpenSearch ``suggest.term``, "did you mean"):
        for each analyzed input token, dictionary terms within
        ``max_edits`` Levenshtein edits ranked by document frequency
        descending (popular corrections first — Lucene's
        DirectSpellChecker default), ties broken term-ascending. The
        input token itself is excluded; ``size`` candidates per token.

        Returns ``[{"text": tok, "options": [{"text", "freq"}...]}]``.
        df comes from one pruned postings read of the candidate terms
        (footer-stats shard pruning), not a corpus scan."""
        out = []
        for tok in tokenize(text):
            cands = [
                t
                for t in self.expand_fuzzy(tok, max_edits, prefix_length, field)
                if t != tok
            ]
            if field is not None and field != self.primary_field:
                keyed = {f"{field}:{t}": t for t in cands}
            else:
                keyed = {t: t for t in cands}
            postings = self.load_postings(sorted(keyed))
            opts = sorted(
                ((keyed[k], int(p.df)) for k, p in postings.items()),
                key=lambda kv: (-kv[1], kv[0]),
            )[:size]
            out.append(
                {
                    "text": tok,
                    "options": [{"text": t, "freq": f} for t, f in opts],
                }
            )
        return out

    def suggest_completion(
        self, prefix: str, size: int = 5, field: str | None = None
    ) -> list[dict]:
        """Completion suggester (OpenSearch ``suggest.completion``):
        dictionary terms extending ``prefix``, ranked by document
        frequency desc (term asc ties), top ``size``. OpenSearch backs
        this with a dedicated FST over explicit per-doc weights; this
        engine serves the same API from the term dictionary with df as
        the weight — corpus-derived instead of author-supplied
        (documented deviation). The prefix range is a binary search on
        the sorted dictionary; df comes from one pruned postings read
        of just the candidate terms."""
        cands = self.expand_prefix(prefix, field)
        if field is not None and field != self.primary_field:
            keyed = {f"{field}:{t}": t for t in cands}
        else:
            keyed = {t: t for t in cands}
        postings = self.load_postings(sorted(keyed))
        opts = sorted(
            ((keyed[k], int(p.df)) for k, p in postings.items()),
            key=lambda kv: (-kv[1], kv[0]),
        )[:size]
        return [{"text": t, "freq": f} for t, f in opts]

    def suggest_phrase(
        self,
        text: str,
        size: int = 3,
        max_edits: int = 1,
        prefix_length: int = 1,
        max_candidates: int = 5,
        field: str | None = None,
    ) -> list[dict]:
        """Phrase suggester (OpenSearch ``suggest.phrase``): per-token
        candidates are dictionary terms within ``max_edits`` Levenshtein
        edits sharing a ``prefix_length``-char head (the token itself
        included when in-vocabulary), pruned to the ``max_candidates``
        most frequent; whole-phrase candidates are every cross-product
        combination, scored by their exact adjacent-phrase document
        frequency and ranked (freq desc, phrase asc), the uncorrected
        input excluded and zero-frequency phrases dropped. OpenSearch
        ranks with a Laplace-smoothed bigram LM over a shingle subfield;
        adjacency document frequency is this engine's deterministic
        analog (same candidate generation, simpler LM — documented
        deviation). Needs positional postings for the adjacency test.

        Returns ``[{"text": phrase, "freq": n}]``."""
        import itertools

        toks = tokenize(text)
        if not toks:
            return []
        per_tok: list[list[str]] = []
        for tok in toks:
            cands = self.expand_fuzzy(tok, max_edits, prefix_length, field)
            if field is not None and field != self.primary_field:
                keyed = {f"{field}:{t}": t for t in cands}
            else:
                keyed = {t: t for t in cands}
            postings = self.load_postings(sorted(keyed))
            ranked = sorted(
                ((keyed[k], int(p.df)) for k, p in postings.items()),
                key=lambda kv: (-kv[1], kv[0]),
            )[:max_candidates]
            per_tok.append([t for t, _ in ranked])
        scored: list[tuple[str, int]] = []
        for combo in itertools.product(*per_tok):
            if list(combo) == toks:
                continue
            phrase = " ".join(combo)
            freq = int(self.match_phrase(phrase, field).size)
            if freq > 0:
                scored.append((phrase, freq))
        scored.sort(key=lambda kv: (-kv[1], kv[0]))
        return [{"text": p, "freq": f} for p, f in scored[:size]]

    @staticmethod
    def _isect_sorted(cand: np.ndarray, fp: TermPostings) -> np.ndarray:
        """Keep candidates present in the filter's sorted posting list."""
        if cand.size == 0:
            return cand
        pos = np.searchsorted(fp.doc_ids, cand)
        pos_c = np.minimum(pos, fp.df - 1)
        return cand[fp.doc_ids[pos_c] == cand]

    def _filtered_wand(
        self,
        qcounts: Counter,
        postings: dict[str, TermPostings],
        terms: list[str],
        fp: TermPostings,
        avgdl: float,
        k: int,
    ) -> list[tuple[int, float]]:
        """Block-max WAND with a keyword filter: block bounds are sound
        for any doc subset, so the only filter-specific care is seeding
        θ exclusively from filter-passing docs."""
        bounds = {
            t: self._norm(postings[t].block_max_tf, postings[t].block_min_dl, avgdl)
            for t in terms
        }
        ub = {
            t: qcounts[t] * self.idf(postings[t].df) * float(bounds[t].max())
            for t in terms
        }
        # seed θ from the strongest term's best blocks, filter-passing
        # docs only; keep taking blocks until k survivors (or exhausted)
        seed_term = max(terms, key=lambda t: ub[t])
        p = postings[seed_term]
        if p.df <= k:
            seed_ids = self._isect_sorted(p.doc_ids, fp)
        else:
            blk = np.argsort(bounds[seed_term])[::-1]
            take: list[np.ndarray] = []
            got = 0
            for bi in blk:
                s, e = bi * BLOCK_SIZE, min((bi + 1) * BLOCK_SIZE, p.df)
                seg = self._isect_sorted(p.doc_ids[s:e], fp)
                take.append(seg)
                got += seg.size
                if got >= k:
                    break
            seed_ids = self._merge_unique(take)
        seed_scores = self._score_subset(seed_ids, qcounts, postings, avgdl)
        if seed_ids.size >= k:
            idx = np.lexsort((seed_ids, -seed_scores))[:k]
            theta = float(seed_scores[idx[-1]])
        else:
            theta = 0.0

        order = sorted(terms, key=lambda t: ub[t])
        cum = 0.0
        essential: list[str] = []
        for i, t in enumerate(order):
            if cum + ub[t] < theta:
                cum += ub[t]
            else:
                essential = order[i:]
                break
        else:
            essential = []
        if not essential:
            essential = [seed_term]

        total_ub = sum(ub.values())
        cand_parts = [seed_ids]
        for t in essential:
            p = postings[t]
            other_ub = total_ub - ub[t]
            block_bound = qcounts[t] * self.idf(p.df) * bounds[t] + other_ub
            keep_blocks = np.flatnonzero(block_bound >= theta)
            if keep_blocks.size == 0:
                continue
            segs = []
            for bi in keep_blocks:
                s, e = bi * BLOCK_SIZE, min((bi + 1) * BLOCK_SIZE, p.df)
                segs.append(p.doc_ids[s:e])
            cand_parts.append(np.concatenate(segs) if segs else np.empty(0, np.uint64))
        candidates = self._isect_sorted(self._merge_unique(cand_parts), fp)
        scores = self._score_subset(candidates, qcounts, postings, avgdl)
        ids, sc = self._rank(candidates, scores, k)
        return list(zip(ids.tolist(), sc.tolist()))

    def _score_subset(
        self,
        candidates: np.ndarray,
        qcounts: Counter,
        postings: dict[str, TermPostings],
        avgdl: float | None = None,
    ) -> np.ndarray:
        """Exact scores for a sorted candidate id array, summed in
        sorted-term order (same float addition order as `search`)."""
        scores = np.zeros(candidates.size, dtype=np.float64)
        for term in sorted(qcounts):
            p = postings.get(term)
            if p is None:
                continue
            pos = np.searchsorted(p.doc_ids, candidates)
            pos_c = np.minimum(pos, p.df - 1)
            hit = p.doc_ids[pos_c] == candidates
            contrib = qcounts[term] * self.idf(p.df) * self._norm_cached(p, avgdl)[pos_c]
            scores[hit] += contrib[hit]
        return scores

    def search_pruned(
        self, query: str, k: int = 10, field: str | None = None
    ) -> list[tuple[int, float]]:
        """Block-max pruned BM25 top-k; result-identical to `search`.

        1. Seed a threshold θ: exact-score the top-k docs of the
           highest-upper-bound term's best blocks.
        2. Essential terms: sort terms by upper bound ascending; the
           longest prefix whose UB sum < θ is non-essential — no doc
           appearing ONLY there can reach θ (WAND invariant).
        3. Block skipping: within an essential term, a block b can be
           dropped when w·idf·blockmax(b) + Σ other terms' UB < θ; a doc
           in dropped blocks of several essential terms is still safe
           because each bound subsumes the others' full UB.
        4. Exact-score surviving candidates (+ the θ seeds).
        """
        if k <= 0:  # size:0 agg-only searches reach here via the DSL
            return []
        avgdl = self.field_avgdl(field)
        qcounts = Counter(self.field_terms(query, field))
        postings = self.load_postings(sorted(qcounts))
        terms = [t for t in sorted(qcounts) if t in postings]
        if not terms:
            return []
        # adaptive gate: when EVERY query term is Zipf-head (df a large
        # fraction of the corpus), scores are densely clustered and
        # block bounds cannot skip anything — the exact TAAT kernel is
        # cheaper than seeding + candidate gathering. Results are
        # identical either way (both paths are exact).
        if min(postings[t].df for t in terms) > 0.2 * self.n_docs:
            return self._exact_topk(qcounts, postings, avgdl, k)
        # sound per-block score bound: tf_norm is increasing in tf and
        # decreasing in dl -> norm(tf,dl) <= norm(max_tf, min_dl)
        bounds = {
            t: self._norm(postings[t].block_max_tf, postings[t].block_min_dl, avgdl)
            for t in terms
        }
        ub = {
            t: qcounts[t] * self.idf(postings[t].df) * float(bounds[t].max()) for t in terms
        }
        # --- seed θ with exact scores of k docs from the strongest term
        seed_term = max(terms, key=lambda t: ub[t])
        p = postings[seed_term]
        if p.df <= k:
            seed_ids = p.doc_ids
        else:
            # docs from the k best blocks of the strongest term
            blk = np.argsort(bounds[seed_term])[::-1]
            take: list[np.ndarray] = []
            got = 0
            for bi in blk:
                s, e = bi * BLOCK_SIZE, min((bi + 1) * BLOCK_SIZE, p.df)
                take.append(p.doc_ids[s:e])
                got += e - s
                if got >= k:
                    break
            seed_ids = self._merge_unique(take)
        seed_scores = self._score_subset(seed_ids, qcounts, postings, avgdl)
        if seed_ids.size >= k:
            idx = np.lexsort((seed_ids, -seed_scores))[:k]
            theta = float(seed_scores[idx[-1]])
        else:
            theta = 0.0

        # --- essential terms
        order = sorted(terms, key=lambda t: ub[t])
        cum = 0.0
        essential: list[str] = []
        for i, t in enumerate(order):
            if cum + ub[t] < theta:
                cum += ub[t]
            else:
                essential = order[i:]
                break
        else:
            essential = []
        if not essential:
            essential = [seed_term]  # degenerate: θ==0 etc.

        total_ub = sum(ub.values())
        cand_parts = [seed_ids]
        for t in essential:
            p = postings[t]
            other_ub = total_ub - ub[t]
            block_bound = qcounts[t] * self.idf(p.df) * bounds[t] + other_ub
            keep_blocks = np.flatnonzero(block_bound >= theta)
            if keep_blocks.size == 0:
                continue
            segs = []
            for bi in keep_blocks:
                s, e = bi * BLOCK_SIZE, min((bi + 1) * BLOCK_SIZE, p.df)
                segs.append(p.doc_ids[s:e])
            cand_parts.append(np.concatenate(segs) if segs else np.empty(0, np.uint64))
        candidates = self._merge_unique(cand_parts)
        scores = self._score_subset(candidates, qcounts, postings, avgdl)
        ids, sc = self._rank(candidates, scores, k)
        return list(zip(ids.tolist(), sc.tolist()))

    # ------------------------------------------------------------- keyword/docs
    def term_docs(self, field: str, value: str) -> np.ndarray:
        """Exact-match doc ids for a keyword field term (SURVEY.md B2)."""
        field = _strip_keyword(field)
        p = self.load_postings([f"{field}:{value}"])
        key = f"{field}:{value}"
        if key not in p:
            return np.empty(0, np.uint64)
        return np.sort(self._map_ordinals(p[key].doc_ids))

    def terms_docs(self, field: str, values: list[str]) -> np.ndarray:
        """OpenSearch ``terms`` query: docs matching ANY of the keyword
        values — one postings load for the whole value list, union in
        ordinal space, ids sorted."""
        field = _strip_keyword(field)
        keys = sorted({f"{field}:{v}" for v in values})
        postings = self.load_postings(keys)
        parts = [postings[k].doc_ids for k in keys if k in postings]
        if not parts:
            return np.empty(0, np.uint64)
        return np.sort(self._map_ordinals(self._merge_unique(parts)))

    # ----------------------------------------------------- doc-value queries
    def _scan_docs(self, expr) -> np.ndarray:
        """Doc ids whose docstore row satisfies a pyarrow.dataset
        expression. One predicate-pushdown read per docstore partition:
        parquet row-group statistics prune blocks whose [min, max]
        misses the predicate (the BKD-tree analog OpenSearch uses for
        range queries), and only ``doc_id`` (+ ``ordinal`` where a
        tombstone sidecar exists) leaves storage. Scan-layout tombstones
        (delete-by-query dead lists) are excluded. Each partition is an
        independent task at cluster scale — the same per-bucket fan-out
        as ``_gather_column``."""
        import glob
        import json

        import pyarrow.parquet as pq

        from ..index.build_scan import DEAD_SUBDIR

        # serving-path memo: repeated identical filters (the common hot
        # pattern behind range/exists/ids clauses) skip the re-decode;
        # distinct filters still take the statistics-pruned cold scan.
        # Like every reader cache, invalidated by re-opening the reader
        # after index mutations.
        key = str(expr)
        memo = self._scan_memo.get(key)
        if memo is not None:
            return memo
        dead_dir = os.path.join(self.index_dir, DEAD_SUBDIR)
        parts = []
        for path in sorted(glob.glob(os.path.join(self._docs_dir, "*.parquet"))):
            b = int(os.path.basename(path).split("=")[1].split(".")[0])
            dpath = os.path.join(dead_dir, f"part={b:05d}.json")
            has_dead = os.path.exists(dpath)
            cols = ["doc_id", "ordinal"] if has_dead else ["doc_id"]
            t = pq.read_table(path, columns=cols, filters=expr)
            ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
            if has_dead and ids.size:
                with open(dpath) as fh:
                    dead = np.unique(np.array(json.load(fh), dtype=np.uint64))
                if dead.size:
                    ords = (
                        t.column("ordinal")
                        .to_numpy(zero_copy_only=False)
                        .astype(np.uint64)
                    )
                    pos = np.minimum(
                        np.searchsorted(dead, ords), dead.size - 1
                    )
                    ids = ids[dead[pos] != ords]
            if ids.size:
                parts.append(ids)
        out = (
            np.empty(0, np.uint64)
            if not parts
            else np.sort(np.concatenate(parts))
        )
        if len(self._scan_memo) >= 128:
            self._scan_memo.pop(next(iter(self._scan_memo)))
        self._scan_memo[key] = out
        return out

    def range_docs(
        self,
        field: str,
        gte=None,
        gt=None,
        lte=None,
        lt=None,
    ) -> np.ndarray:
        """OpenSearch ``range`` query over a stored doc-value column
        (numeric or lexicographic): sorted doc ids with
        ``gte <= v <= lte`` (or the strict variants). Runs as a
        statistics-pruned docstore scan (``_scan_docs``)."""
        import pyarrow.dataset as pds

        f = pds.field(field)
        expr = None
        for e, v in ((f >= gte, gte), (f > gt, gt), (f <= lte, lte), (f < lt, lt)):
            if v is None:
                continue
            expr = e if expr is None else expr & e
        if expr is None:
            raise ValueError("range_docs needs at least one of gte/gt/lte/lt")
        return self._scan_docs(expr)

    def exists_docs(self, field: str) -> np.ndarray:
        """OpenSearch ``exists`` query: docs whose stored ``field`` is
        non-null."""
        import pyarrow.dataset as pds

        return self._scan_docs(~pds.field(field).is_null())

    def ids_docs(self, values) -> np.ndarray:
        """OpenSearch ``ids`` query: the subset of the given doc ids
        present (and live) in the index, sorted."""
        import pyarrow.dataset as pds

        vals = np.asarray(list(values), dtype=np.uint64)
        return self._scan_docs(pds.field("doc_id").isin(vals))

    # ------------------------------------------------------- join fields
    # OpenSearch ``join`` datatype (has_child / has_parent / parent_id /
    # children agg): parents and children live in ONE index; each doc
    # carries a type keyword (``join_field``) and children store their
    # parent's _id (``parent_field``). Declared at build time via
    # build_index(relations=...). Families are co-located by the
    # routing convention (child doc_id ≡ parent doc_id mod num_buckets),
    # so every join below is per-partition work + a keys-only exchange
    # — no doc bodies ever move.

    def _join_rel(self, child_type: str) -> dict:
        rel = self.relations
        if not rel or str(child_type) not in rel.get("children", {}):
            raise ValueError(
                f"index declares no join relation for child type {child_type!r}"
            )
        return rel

    def join_type_docs(self, type_name: str) -> np.ndarray:
        """Docs of one join type — a keyword-postings lookup on the
        join field (no docstore scan)."""
        if not self.relations:
            raise ValueError("index declares no join relations")
        return self.term_docs(str(self.relations["join_field"]), str(type_name))

    def _scan_columns(
        self, columns: list[str], expr
    ) -> tuple[np.ndarray, list[np.ndarray]]:
        """(doc_id, value-column arrays) of docstore rows matching a
        pyarrow.dataset expression — ``_scan_docs`` with value columns
        alongside. Same statistics-pruned per-partition reads, same
        dead-list visibility; only the named columns leave storage. At
        cluster scale each bucket file is an independent task."""
        import glob
        import json

        import pyarrow.parquet as pq

        from ..index.build_scan import DEAD_SUBDIR

        dead_dir = os.path.join(self.index_dir, DEAD_SUBDIR)
        id_parts: list[np.ndarray] = []
        val_parts: list[list[np.ndarray]] = [[] for _ in columns]
        for path in sorted(glob.glob(os.path.join(self._docs_dir, "*.parquet"))):
            b = int(os.path.basename(path).split("=")[1].split(".")[0])
            dpath = os.path.join(dead_dir, f"part={b:05d}.json")
            has_dead = os.path.exists(dpath)
            cols = ["doc_id", *columns] + (["ordinal"] if has_dead else [])
            t = pq.read_table(path, columns=cols, filters=expr)
            ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
            vals = [
                t.column(c).to_numpy(zero_copy_only=False) for c in columns
            ]
            if has_dead and ids.size:
                with open(dpath) as fh:
                    dead = np.unique(np.array(json.load(fh), dtype=np.uint64))
                if dead.size:
                    ords = (
                        t.column("ordinal")
                        .to_numpy(zero_copy_only=False)
                        .astype(np.uint64)
                    )
                    pos = np.minimum(np.searchsorted(dead, ords), dead.size - 1)
                    live = dead[pos] != ords
                    ids = ids[live]
                    vals = [v[live] for v in vals]
            if ids.size:
                id_parts.append(ids)
                for vp, v in zip(val_parts, vals):
                    vp.append(v)
        if not id_parts:
            return np.empty(0, np.uint64), [
                np.empty(0, np.int64) for _ in columns
            ]
        return np.concatenate(id_parts), [np.concatenate(vp) for vp in val_parts]

    def _scan_column_pairs(self, column: str, expr) -> tuple[np.ndarray, np.ndarray]:
        """Single-column convenience over ``_scan_columns``."""
        ids, (vals,) = self._scan_columns([column], expr)
        return ids, vals

    def child_parent_counts(
        self, child_ids: np.ndarray, child_type: str
    ) -> tuple[np.ndarray, np.ndarray]:
        """Unique parent ids of the given child docs plus per-parent
        child counts (the ``has_child`` reduction). One pruned
        (doc_id, parent_field) read over the touched partitions — a
        keys-only gather (~16 B/child), then a vectorized unique."""
        import pyarrow.dataset as pds

        rel = self._join_rel(child_type)
        if child_ids.size == 0:
            return np.empty(0, np.uint64), np.empty(0, np.int64)
        ids, pk = self._scan_column_pairs(
            str(rel["parent_field"]), pds.field("doc_id").isin(child_ids)
        )
        u, c = np.unique(pk.astype(np.uint64), return_counts=True)
        return u, c

    def children_of(self, parent_ids: np.ndarray, child_type: str) -> np.ndarray:
        """Sorted child doc ids whose parent is in ``parent_ids`` (the
        ``has_parent`` / ``parent_id`` scan): a statistics-pruned
        docstore read filtered on (join type, parent-key membership).
        The membership set is parent KEYS only — the broadcast-semi-join
        pattern, never a doc-body shuffle."""
        import pyarrow.dataset as pds

        rel = self._join_rel(child_type)
        if parent_ids.size == 0:
            return np.empty(0, np.uint64)
        expr = (
            pds.field(str(rel["join_field"])) == str(child_type)
        ) & pds.field(str(rel["parent_field"])).isin(
            parent_ids.astype(np.int64)
        )
        return self._scan_docs(expr)

    def facet_children_stats(
        self, parent_group_field: str, child_value_field: str, child_type: str
    ) -> list[tuple]:
        """The ``children`` aggregation under a terms bucket: group
        PARENTS by a keyword doc-value, aggregate a numeric doc-value
        over each group's CHILDREN. Two single-column partition scans
        (parents: doc_id+group key; children: parent key+value) and a
        searchsorted key->group map — the scans fan out per bucket file
        and, with routed families, the map never leaves a partition.
        Returns rows ``(group, n_parents, n_children, min, max, sum,
        avg)`` sorted by group key."""
        import pyarrow.dataset as pds

        rel = self._join_rel(child_type)
        jf = str(rel["join_field"])
        parent_type = str(rel["children"][str(child_type)])
        pids, (pgroups,) = self._scan_columns(
            [str(parent_group_field)], pds.field(jf) == parent_type
        )
        _, (ckeys, cvals) = self._scan_columns(
            [str(rel["parent_field"]), str(child_value_field)],
            pds.field(jf) == str(child_type),
        )
        if pids.size == 0:
            return []
        order = np.argsort(pids, kind="mergesort")
        pids, pgroups = pids[order], pgroups[order]
        ck = ckeys.astype(np.uint64)
        pos = np.minimum(np.searchsorted(pids, ck), pids.size - 1)
        live = pids[pos] == ck
        cvals, pos = cvals[live], pos[live]
        cgroups = pgroups[pos]
        gkeys, pinv = np.unique(pgroups, return_inverse=True)
        n_parents = np.bincount(pinv, minlength=gkeys.size)
        rows = []
        cvals = cvals.astype(np.float64)
        for gi, g in enumerate(gkeys):
            m = cgroups == g
            n_c = int(np.count_nonzero(m))
            if n_c == 0:
                rows.append((g, int(n_parents[gi]), 0, None, None, 0.0, None))
                continue
            v = cvals[m]
            s = float(v.sum())
            rows.append(
                (
                    g,
                    int(n_parents[gi]),
                    n_c,
                    float(v.min()),
                    float(v.max()),
                    s,
                    s / n_c,
                )
            )
        return rows

    def facet_child_terms(
        self, child_group_field: str, child_type: str
    ) -> list[tuple]:
        """The ``nested`` agg + ``reverse_nested`` (and the join-field
        ``parent`` agg): bucket CHILD docs by a keyword doc-value and,
        per bucket, count both children and DISTINCT parents. One
        two-column partition scan over the child rows; the distinct
        count is a vectorized unique over (group, parent-key) pairs.
        Returns ``(group, n_children, n_parents)`` sorted by group."""
        import pyarrow.dataset as pds

        rel = self._join_rel(child_type)
        jf = str(rel["join_field"])
        _, (ckeys, cgroups) = self._scan_columns(
            [str(rel["parent_field"]), str(child_group_field)],
            pds.field(jf) == str(child_type),
        )
        if cgroups.size == 0:
            return []
        gkeys, ginv = np.unique(cgroups, return_inverse=True)
        n_children = np.bincount(ginv, minlength=gkeys.size)
        # distinct parents per group: first-seen flags on the
        # (group, parent) lexsort — full 64-bit-key safe
        ck = ckeys.astype(np.uint64)
        order = np.lexsort((ck, ginv))
        gi, cs = ginv[order], ck[order]
        first = np.empty(gi.size, dtype=bool)
        first[0] = True
        first[1:] = (gi[1:] != gi[:-1]) | (cs[1:] != cs[:-1])
        n_parents = np.bincount(gi[first], minlength=gkeys.size)
        return [
            (g, int(nc), int(np_))
            for g, nc, np_ in zip(gkeys, n_children, n_parents)
        ]

    def field_statistics(self, field: str | None = None) -> dict:
        """Lucene field statistics for ``_termvectors``:
        ``sum_doc_freq`` (Σ df over the field's terms), ``doc_count``
        and ``sum_ttf`` (Σ total term freq = total tokens). One
        columnar (term, df, cf)-only scan of the postings shards —
        vocabulary-row-sized, a tiny fraction of index bytes; salted
        hot-term rows partition docs so their dfs sum correctly.
        Cached per field; at cluster scale the scan fans out per shard
        file."""
        import glob

        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        want = self.primary_field if field is None else field
        cached = self._field_stats.get(want)
        if cached is not None:
            return cached
        sum_df = 0
        sum_ttf = 0
        for p in sorted(glob.glob(os.path.join(self._postings_dir, "*.parquet"))):
            t = pq.read_table(p, columns=["term", "df", "cf"])
            terms = t.column("term")
            if want == self.primary_field:
                mask = pc.invert(pc.match_substring(terms, ":"))
            else:
                mask = pc.starts_with(terms, pattern=f"{want}:")
            sum_df += pc.sum(t.column("df").filter(mask)).as_py() or 0
            sum_ttf += pc.sum(t.column("cf").filter(mask)).as_py() or 0
        out = {
            "sum_doc_freq": int(sum_df),
            "doc_count": int(self.n_docs),
            "sum_ttf": int(sum_ttf),
        }
        self._field_stats[want] = out
        return out

    def termvectors(
        self,
        doc_id: int,
        field: str | None = None,
        positions: bool = True,
        term_statistics: bool = False,
        field_statistics: bool = True,
    ) -> dict:
        """OpenSearch ``_termvectors``: per-term stats of one stored
        document — term_freq and token positions re-derived by
        analyzing the stored text (the reference's OpenSearch does the
        same for docs indexed without explicit vectors), df/ttf joined
        from one pruned postings read when ``term_statistics`` is
        requested."""
        col = self.primary_field if field is None else field
        tbl = self.get_docs(np.array([doc_id], dtype=np.uint64))
        if tbl.num_rows == 0:
            return {"_id": int(doc_id), "found": False}
        toks = tokenize(str(tbl.column(col)[0].as_py()))
        tf = Counter(toks)
        terms: dict[str, dict] = {}
        for t in sorted(tf):
            terms[t] = {"term_freq": int(tf[t])}
        if positions:
            for pos, t in enumerate(toks):
                terms[t].setdefault("tokens", []).append({"position": pos})
        if term_statistics:
            keyed = (
                {f"{col}:{t}": t for t in tf}
                if col != self.primary_field
                else {t: t for t in tf}
            )
            postings = self.load_postings(sorted(keyed))
            for key, p in postings.items():
                terms[keyed[key]]["doc_freq"] = int(p.df)
                terms[keyed[key]]["ttf"] = int(p.tfs.sum())
        fstats = (
            {"field_statistics": self.field_statistics(field)}
            if field_statistics
            else {}
        )
        return {
            "_id": int(doc_id),
            "found": True,
            "term_vectors": {col: {**fstats, "terms": terms}},
        }

    def phrase_docs(self, field: str, phrase: str) -> np.ndarray:
        """Exact 2-3 token phrase match on a sayt-enabled field: the
        search_as_you_type 2/3-gram shingle terms ARE adjacency facts,
        so the phrase resolves to one term lookup (no positions stored;
        longer phrases would need positional postings — out of the
        reference's capability surface)."""
        toks = tokenize(phrase)
        if not 2 <= len(toks) <= 3:
            raise ValueError("phrase_docs supports 2-3 token phrases (shingle width)")
        if field not in self.manifest.get("sayt_cols", []):
            raise ValueError(f"field {field!r} is not sayt-indexed (no shingle terms)")
        return self.term_docs(field, " ".join(toks))

    def match_phrase(
        self, phrase: str, field: str | None = None, slop: int = 0
    ) -> np.ndarray:
        """Arbitrary-length phrase match on a positional index
        (OpenSearch ``match_phrase``; ``text`` fields store
        positions by default — the reference's mappings at
        /root/reference/opensearch_loader/loader.py:311-312 rely on it).
        ``slop > 0`` accepts ordered sloppy matches
        (``_sloppy_phrase_hits``).

        Fully vectorized: candidate docs are the sorted intersection of
        the query terms' posting lists; adjacency is then verified by
        intersecting per-term ``(candidate_idx, position - i)`` key
        sets — a candidate matches iff at least one start position
        survives every term. Repeated query tokens work naturally (the
        same posting list is re-shifted per occurrence). Cost is one
        segment-gather + one sorted intersect per query term, all over
        the candidate subset only."""
        ords, _, _, _ = self._sloppy_phrase_hits(phrase, slop, field)
        if ords.size == 0:
            return np.empty(0, np.uint64)
        return np.sort(self._map_ordinals(ords))

    def _phrase_hits(self, phrase: str, field: str | None):
        """Shared phrase evaluator: returns ``(ordinals, phrase_tf,
        dls, terms)`` for docs containing the exact phrase —
        ``phrase_tf[i]`` is the number of phrase occurrences in doc
        ``ordinals[i]`` (Lucene PhraseQuery's tf), ``dls`` the doc
        lengths, ``terms`` the analyzed query terms."""
        if not self.manifest.get("positions"):
            raise ValueError(
                "index was built without positions=True; match_phrase needs "
                "positional postings (2-3 token phrases can use phrase_docs "
                "on a sayt-enabled index instead)"
            )
        terms = self.field_terms(phrase, field)
        empty = np.empty(0, np.uint64)
        none = (empty, np.empty(0, np.int64), np.empty(0, np.int64), terms)
        if not terms:
            return none
        postings = self.load_postings(sorted(set(terms)), positions=True)
        if any(t not in postings for t in terms):
            return none
        uniq = sorted(set(terms))
        cand = postings[uniq[0]].doc_ids
        for t in uniq[1:]:
            cand = np.intersect1d(cand, postings[t].doc_ids, assume_unique=True)
        if cand.size == 0:
            return none
        # dense candidate indices key the position sets (ordinals use
        # the high bucket bits, so ordinal<<21 would overflow uint64)
        M = int(max(int(postings[t].poss.max()) for t in uniq)) + 2
        keys: np.ndarray | None = None
        cand_dls = None
        for i, t in enumerate(terms):
            tp = postings[t]
            sel = np.searchsorted(tp.doc_ids, cand)
            if cand_dls is None:
                cand_dls = tp.dls[sel].astype(np.int64)
            off = tp.pos_offsets()
            sizes = tp.tfs[sel].astype(np.int64)
            starts = off[sel]
            total = int(sizes.sum())
            run_off = np.zeros(cand.size + 1, dtype=np.int64)
            np.cumsum(sizes, out=run_off[1:])
            gather = (
                np.repeat(starts - run_off[:-1], sizes)
                + np.arange(total, dtype=np.int64)
            )
            p = tp.poss[gather].astype(np.int64) - i
            d_idx = np.repeat(np.arange(cand.size, dtype=np.int64), sizes)
            valid = p >= 0
            k = d_idx[valid] * M + p[valid]  # sorted + unique by construction
            keys = k if keys is None else np.intersect1d(keys, k, assume_unique=True)
            if keys.size == 0:
                return none
        d_hit, ptf = np.unique(keys // M, return_counts=True)
        return cand[d_hit], ptf.astype(np.int64), cand_dls[d_hit], terms

    def _sloppy_phrase_hits(self, phrase: str, slop: int, field: str | None):
        """(ordinals, sloppy_tf, dls, terms) for an ORDERED sloppy
        phrase (OpenSearch ``match_phrase`` with ``slop > 0``): greedy
        chains — each occurrence of the first term advances through
        every later term's EARLIEST strictly-later occurrence in the
        same doc (the intervals_docs chain) — whose internal gap total
        is ≤ ``slop``; tf = the number of seed occurrences whose chain
        survives. Documented deviations from Lucene's
        SloppyPhraseScorer: matching is ordered-only (no
        transposition moves), and every match weighs 1 rather than
        1/(distance+1). ``slop=0`` routes to the exact evaluator."""
        if slop <= 0:
            return self._phrase_hits(phrase, field)
        if not self.manifest.get("positions"):
            raise ValueError(
                "index was built without positions=True; sloppy "
                "match_phrase needs positional postings"
            )
        terms = self.field_terms(phrase, field)
        empty = np.empty(0, np.uint64)
        none = (empty, np.empty(0, np.int64), np.empty(0, np.int64), terms)
        if not terms:
            return none
        postings = self.load_postings(sorted(set(terms)), positions=True)
        if any(t not in postings for t in terms):
            return none
        uniq = sorted(set(terms))
        cand = postings[uniq[0]].doc_ids
        for t in uniq[1:]:
            cand = np.intersect1d(cand, postings[t].doc_ids, assume_unique=True)
        if cand.size == 0:
            return none
        tp0 = postings[uniq[0]]
        cand_dls = tp0.dls[np.searchsorted(tp0.doc_ids, cand)].astype(np.int64)
        spans = self._greedy_chains(terms, postings, cand)
        if spans is None:
            return none
        start, cur, M = spans
        span_gap = (cur % M) - (start % M) - (len(terms) - 1)
        good = start[span_gap <= slop]
        if good.size == 0:
            return none
        d_idx, tf = np.unique(good // M, return_counts=True)
        return cand[d_idx], tf.astype(np.int64), cand_dls[d_idx], terms

    @staticmethod
    def _occurrence_keys(tp: TermPostings, cand: np.ndarray, M: int) -> np.ndarray:
        """Sorted ``d_idx * M + position`` keys for every occurrence of
        ``tp`` inside the candidate doc set ``cand`` (sorted ordinal
        ids; docs of ``cand`` absent from the posting contribute no
        keys). ``d_idx`` indexes INTO ``cand`` so different terms'
        keys live in one comparable space — the span-algebra kernel
        shared by span_not / span_within / span_containing."""
        docs = np.intersect1d(cand, tp.doc_ids, assume_unique=True)
        if docs.size == 0:
            return np.empty(0, np.int64)
        sel = np.searchsorted(tp.doc_ids, docs)
        off = tp.pos_offsets()
        sizes = tp.tfs[sel].astype(np.int64)
        starts = off[sel]
        total = int(sizes.sum())
        run_off = np.zeros(docs.size + 1, dtype=np.int64)
        np.cumsum(sizes, out=run_off[1:])
        gather = (
            np.repeat(starts - run_off[:-1], sizes)
            + np.arange(total, dtype=np.int64)
        )
        d_idx = np.repeat(np.searchsorted(cand, docs), sizes)
        return d_idx * M + tp.poss[gather].astype(np.int64)

    @staticmethod
    def _greedy_chains(
        terms: list[str], postings: dict, cand: np.ndarray, M: int | None = None
    ) -> tuple[np.ndarray, np.ndarray, int] | None:
        """Greedy ordered position chains over candidate docs — the
        shared kernel of ``intervals_docs`` and ``_sloppy_phrase_hits``.
        Each occurrence of ``terms[0]`` advances through every later
        term's EARLIEST strictly-later occurrence in the same doc (one
        searchsorted per term; the greedy step minimizes each chain's
        end, so downstream span-gap tests are exact). Returns
        ``(start_keys, end_keys, M)`` in ``doc_idx * M + position`` key
        space, or ``None`` if no chain survives. ``M`` may be supplied
        by a caller that needs OTHER terms' keys in the same space
        (span containment / exclusion tests)."""
        uniq = sorted(set(terms))
        if M is None:
            M = int(max(int(postings[t].poss.max()) for t in uniq)) + 2

        def keys_of(tp: TermPostings) -> np.ndarray:
            sel = np.searchsorted(tp.doc_ids, cand)
            off = tp.pos_offsets()
            sizes = tp.tfs[sel].astype(np.int64)
            starts = off[sel]
            total = int(sizes.sum())
            run_off = np.zeros(cand.size + 1, dtype=np.int64)
            np.cumsum(sizes, out=run_off[1:])
            gather = (
                np.repeat(starts - run_off[:-1], sizes)
                + np.arange(total, dtype=np.int64)
            )
            d_idx = np.repeat(np.arange(cand.size, dtype=np.int64), sizes)
            return d_idx * M + tp.poss[gather].astype(np.int64)

        cur = keys_of(postings[terms[0]])
        start = cur.copy()
        for t in terms[1:]:
            nxt = keys_of(postings[t])
            idx = np.searchsorted(nxt, cur, side="right")
            ok = idx < nxt.size
            idx = np.minimum(idx, nxt.size - 1)
            stepped = nxt[idx]
            ok &= (stepped // M) == (cur // M)
            cur, start = stepped[ok], start[ok]
            if cur.size == 0:
                return None
        return start, cur, M

    def intervals_docs(
        self,
        query: str,
        max_gaps: int = 0,
        ordered: bool = True,
        field: str | None = None,
    ) -> np.ndarray:
        """OpenSearch ``intervals`` query, ``all_of`` source: docs where
        all analyzed terms occur within a span whose internal gap total
        is at most ``max_gaps`` (``span_end - span_start - (n-1) <=
        max_gaps``); ``ordered=True`` additionally requires the terms to
        appear in query order. ``ordered=True, max_gaps=0`` degenerates
        to exact phrase.

        Fully vectorized greedy-chain evaluation: candidates are the
        AND of the terms' posting lists; term 1's occurrences seed
        ``(doc, pos)`` keys, then each subsequent term advances every
        chain to its EARLIEST strictly-later occurrence in the same doc
        (one ``searchsorted`` per term). The greedy chain minimizes the
        end position for each start, so the final span test is exact.
        ``ordered=False`` is supported for two terms (both orders,
        union); k>2 unordered would need a k-list minimal-window sweep
        and raises loudly."""
        if not self.manifest.get("positions"):
            raise ValueError(
                "index was built without positions=True; intervals needs "
                "positional postings"
            )
        terms = self.field_terms(query, field)
        if not terms:
            return np.empty(0, np.uint64)
        if not ordered:
            if len(terms) == 1:
                ordered = True
            elif len(terms) == 2:
                a = self.intervals_docs(query, max_gaps, True, field)
                rev = " ".join(reversed(query.split()))
                b = self.intervals_docs(rev, max_gaps, True, field)
                return np.union1d(a, b)
            else:
                raise ValueError(
                    "unordered intervals are supported for <= 2 terms"
                )
        postings = self.load_postings(sorted(set(terms)), positions=True)
        if any(t not in postings for t in terms):
            return np.empty(0, np.uint64)
        uniq = sorted(set(terms))
        cand = postings[uniq[0]].doc_ids
        for t in uniq[1:]:
            cand = np.intersect1d(cand, postings[t].doc_ids, assume_unique=True)
        if cand.size == 0:
            return np.empty(0, np.uint64)
        spans = self._greedy_chains(terms, postings, cand)
        if spans is None:
            return np.empty(0, np.uint64)
        start, cur, M = spans
        span_gap = (cur % M) - (start % M) - (len(terms) - 1)
        if max_gaps < 0:  # OpenSearch max_gaps=-1: unlimited
            max_gaps = np.iinfo(np.int64).max // 2
        hit = np.unique(start[span_gap <= max_gaps] // M)
        return np.sort(self._map_ordinals(cand[hit]))

    def span_first_docs(
        self, term_text: str, end: int, field: str | None = None
    ) -> np.ndarray:
        """Lucene ``span_first``: docs where the term's span ends at or
        before position ``end`` — for a single-term span that is
        first_position + 1 <= end. Positions are ascending per posting,
        so the earliest occurrence is one gather at each posting's
        offset (no per-doc scan). Returns sorted doc ids."""
        if not self.manifest.get("positions"):
            raise ValueError(
                "index was built without positions=True; span queries "
                "need positional postings"
            )
        terms = self.field_terms(term_text, field)
        if len(terms) != 1:
            raise ValueError(
                f"span_first matches a single-term span; {term_text!r} "
                f"analyzed to {len(terms)} terms"
            )
        postings = self.load_postings(terms, positions=True)
        if terms[0] not in postings:
            return np.empty(0, np.uint64)
        tp = postings[terms[0]]
        first = tp.poss[tp.pos_offsets()[:-1]]
        hit = tp.doc_ids[first + 1 <= end]
        return np.sort(self._map_ordinals(hit))

    def _span_postings(self, terms: list[str], field: str | None):
        """(postings, analyzed) for a span-algebra operator: every term
        analyzed on ``field``, positional postings loaded in one read.
        Raises if the index has no positions."""
        if not self.manifest.get("positions"):
            raise ValueError(
                "index was built without positions=True; span queries "
                "need positional postings"
            )
        analyzed: list[str] = []
        for t in terms:
            ts = self.field_terms(t, field)
            if len(ts) != 1:
                raise ValueError(
                    f"span clauses take single terms; {t!r} analyzed to "
                    f"{len(ts)} terms"
                )
            analyzed.append(ts[0])
        return self.load_postings(sorted(set(analyzed)), positions=True), analyzed

    def span_not_docs(
        self,
        include_terms: list[str],
        exclude_term: str,
        slop: int = 0,
        pre: int = 0,
        post: int = 0,
        field: str | None = None,
    ) -> np.ndarray:
        """Lucene ``span_not``: docs with an include span no occurrence
        of ``exclude_term`` overlaps, the overlap window widened by
        ``pre`` positions before the span start and ``post`` after its
        end (the ``pre``/``post``/``dist`` knobs). The include span is
        a single term (one-position span) or an ordered ``span_near``
        chain of terms with internal gap total <= ``slop`` — span
        enumeration is this engine's pinned greedy-chain semantics
        (see ``_sloppy_phrase_hits``: each start advances to every
        later term's earliest strictly-later occurrence).

        Fully vectorized: include spans and exclude occurrences are
        keyed into one ``d_idx * M + pos`` space; a span is blocked
        iff ``searchsorted`` finds an exclude key in
        ``[start - pre, end + post]`` (clamped to the span's doc) —
        no per-doc Python. Docs without the exclude term pass by
        construction (they contribute no exclude keys)."""
        postings, inc = self._span_postings(include_terms, field)
        ex_terms = self.field_terms(exclude_term, field)
        if len(ex_terms) != 1:
            raise ValueError("span_not exclude takes a single term")
        if any(t not in postings for t in inc):
            return np.empty(0, np.uint64)
        ex_post = self.load_postings(ex_terms, positions=True)
        cand = postings[inc[0]].doc_ids
        for t in inc[1:]:
            cand = np.intersect1d(cand, postings[t].doc_ids, assume_unique=True)
        if cand.size == 0:
            return np.empty(0, np.uint64)
        maxpos = max(int(postings[t].poss.max()) for t in set(inc))
        if ex_terms[0] in ex_post:
            maxpos = max(maxpos, int(ex_post[ex_terms[0]].poss.max()))
        M = maxpos + max(post, 0) + 2
        if len(inc) == 1:
            start = self._occurrence_keys(postings[inc[0]], cand, M)
            end = start
        else:
            chains = self._greedy_chains(inc, postings, cand, M)
            if chains is None:
                return np.empty(0, np.uint64)
            start, end, _ = chains
            gap = (end % M) - (start % M) - (len(inc) - 1)
            start, end = start[gap <= slop], end[gap <= slop]
        if start.size == 0:
            return np.empty(0, np.uint64)
        if ex_terms[0] in ex_post:
            ke = self._occurrence_keys(ex_post[ex_terms[0]], cand, M)
            lo = np.maximum(start - max(pre, 0), (start // M) * M)
            hi = end + max(post, 0)
            blocked = np.searchsorted(ke, lo, "left") < np.searchsorted(
                ke, hi, "right"
            )
            start = start[~blocked]
            if start.size == 0:
                return np.empty(0, np.uint64)
        hit = np.unique(start // M)
        return np.sort(self._map_ordinals(cand[hit]))

    def span_within_docs(
        self,
        little_term: str,
        big_terms: list[str],
        slop: int = 0,
        field: str | None = None,
    ) -> np.ndarray:
        """Lucene ``span_within`` / ``span_containing`` doc set: docs
        where an occurrence of ``little_term`` lies INSIDE an enclosing
        ordered ``span_near`` chain of ``big_terms`` with internal gap
        total <= ``slop`` (positions ``start <= p <= end`` inclusive).
        The two Lucene operators return different SPANS (the little vs
        the big one) but the same documents, which is what a doc-level
        filter needs — both DSL kinds route here. Enumeration is the
        pinned greedy-chain semantics; the containment test is two
        ``searchsorted`` calls over the shared key space."""
        postings, big = self._span_postings(big_terms, field)
        li_terms = self.field_terms(little_term, field)
        if len(li_terms) != 1:
            raise ValueError("span_within little takes a single term")
        li_post = self.load_postings(li_terms, positions=True)
        if any(t not in postings for t in big) or li_terms[0] not in li_post:
            return np.empty(0, np.uint64)
        lp = li_post[li_terms[0]]
        cand = postings[big[0]].doc_ids
        for t in big[1:]:
            cand = np.intersect1d(cand, postings[t].doc_ids, assume_unique=True)
        cand = np.intersect1d(cand, lp.doc_ids, assume_unique=True)
        if cand.size == 0:
            return np.empty(0, np.uint64)
        maxpos = max(int(postings[t].poss.max()) for t in set(big))
        maxpos = max(maxpos, int(lp.poss.max()))
        M = maxpos + 2
        chains = self._greedy_chains(big, postings, cand, M)
        if chains is None:
            return np.empty(0, np.uint64)
        start, end, _ = chains
        gap = (end % M) - (start % M) - (len(big) - 1)
        start, end = start[gap <= slop], end[gap <= slop]
        if start.size == 0:
            return np.empty(0, np.uint64)
        kl = self._occurrence_keys(lp, cand, M)
        contained = np.searchsorted(kl, start, "left") < np.searchsorted(
            kl, end, "right"
        )
        hit = np.unique(start[contained] // M)
        return np.sort(self._map_ordinals(cand[hit]))

    def span_near_slots_docs(
        self, slots: list[list[str]], slop: int = 0
    ) -> np.ndarray:
        """Ordered ``span_near`` where each slot is a SET of term
        alternatives — the ``span_multi`` composition (a
        prefix/wildcard/fuzzy/regexp clause inside a span chain
        rewrites to its dictionary expansion, and any expansion may
        fill that position). Lucene evaluates this as a span_or of the
        expansions; here each slot's occurrences are the MERGE of its
        alternatives' position keys, and the shared greedy chain runs
        over the merged key streams — stepping to the earliest
        strictly-later occurrence of ANY alternative still minimizes
        each chain's end, so the final gap test
        (span_end - span_start - (n_slots-1) <= slop) is exact.

        ``slots`` carry ANALYZED dictionary-form terms (field-prefixed
        for non-primary fields) — the DSL layer analyzes/expands, so a
        ``span_field_masking`` clause can mix fields in one chain.

        Candidate docs are the AND over slots of the UNION of each
        slot's posting doc lists; one positional load covers every
        term. Cost scales with the expansion's total occurrences in
        candidate docs (bounded by the span AND), never the corpus."""
        if not self.manifest.get("positions"):
            raise ValueError(
                "index was built without positions=True; span queries "
                "need positional postings"
            )
        analyzed = [sorted(set(map(str, alts))) for alts in slots]
        if any(not s for s in analyzed):
            return np.empty(0, np.uint64)
        all_terms = sorted({t for s in analyzed for t in s})
        postings = self.load_postings(all_terms, positions=True)
        cand = None
        for s in analyzed:
            parts = [postings[t].doc_ids for t in s if t in postings]
            if not parts:
                return np.empty(0, np.uint64)
            u = parts[0] if len(parts) == 1 else self._merge_unique(parts)
            cand = u if cand is None else np.intersect1d(
                cand, u, assume_unique=True
            )
            if cand.size == 0:
                return np.empty(0, np.uint64)
        M = (
            max(
                int(postings[t].poss.max())
                for s in analyzed
                for t in s
                if t in postings
            )
            + 2
        )

        def slot_keys(s: list[str]) -> np.ndarray:
            parts = [
                self._occurrence_keys(postings[t], cand, M)
                for t in s
                if t in postings
            ]
            if len(parts) == 1:
                return parts[0]
            k = np.concatenate(parts)
            k.sort(kind="mergesort")
            return k

        cur = slot_keys(analyzed[0])
        start = cur.copy()
        for s in analyzed[1:]:
            nxt = slot_keys(s)
            if nxt.size == 0 or cur.size == 0:
                return np.empty(0, np.uint64)
            idx = np.searchsorted(nxt, cur, side="right")
            ok = idx < nxt.size
            idx = np.minimum(idx, nxt.size - 1)
            stepped = nxt[idx]
            ok &= (stepped // M) == (cur // M)
            cur, start = stepped[ok], start[ok]
        if cur.size == 0:
            return np.empty(0, np.uint64)
        gap = (cur % M) - (start % M) - (len(analyzed) - 1)
        hit = np.unique(start[gap <= slop] // M)
        return np.sort(self._map_ordinals(cand[hit]))

    def match_phrase_prefix(
        self, phrase: str, field: str | None = None, max_expansions: int = 50
    ) -> np.ndarray:
        """OpenSearch ``match_phrase_prefix``: the last analyzed token
        matches as a PREFIX (expanded on the term dictionary in
        dictionary order, capped at ``max_expansions`` — Lucene's cap),
        the head tokens must precede it adjacently. Returns sorted doc
        ids.

        Single-token queries reduce to a prefix query. Multi-token
        queries evaluate like ``match_phrase`` but with the last
        position's key set being the UNION over the expansions'
        shifted positions — one vectorized pass, not one phrase query
        per expansion."""
        raw = tokenize(phrase)
        if not raw:
            return np.empty(0, np.uint64)
        exps = self.expand_prefix(raw[-1], field)[:max_expansions]
        if not exps:
            return np.empty(0, np.uint64)
        if len(raw) == 1:
            return self._expanded_docs(exps, field)
        if not self.manifest.get("positions"):
            raise ValueError(
                "index was built without positions=True; match_phrase_prefix "
                "needs positional postings"
            )
        head = self.field_terms(" ".join(raw[:-1]), field)
        if field is not None and field != self.primary_field:
            exps_t = [f"{field}:{e}" for e in exps]
        else:
            exps_t = list(exps)
        postings = self.load_postings(sorted(set(head) | set(exps_t)), positions=True)
        if any(t not in postings for t in head):
            return np.empty(0, np.uint64)
        exps_t = [t for t in exps_t if t in postings]
        if not exps_t:
            return np.empty(0, np.uint64)
        # candidates: AND over head terms, ∩ union of expansions
        cand = postings[head[0]].doc_ids
        for t in sorted(set(head[1:])):
            cand = np.intersect1d(cand, postings[t].doc_ids, assume_unique=True)
        exp_union = self._merge_unique([postings[t].doc_ids for t in exps_t])
        cand = np.intersect1d(cand, exp_union, assume_unique=True)
        if cand.size == 0:
            return np.empty(0, np.uint64)
        M = int(
            max(int(postings[t].poss.max()) for t in set(head) | set(exps_t))
        ) + 2
        keys: np.ndarray | None = None

        def shifted_keys(tp: TermPostings, i: int) -> np.ndarray:
            sel = np.searchsorted(tp.doc_ids, cand)
            in_cand = tp.doc_ids[np.minimum(sel, tp.df - 1)] == cand
            sel = sel[in_cand]
            d_pos = np.flatnonzero(in_cand)
            off = tp.pos_offsets()
            sizes = tp.tfs[sel].astype(np.int64)
            starts = off[sel]
            total = int(sizes.sum())
            run_off = np.zeros(sel.size + 1, dtype=np.int64)
            np.cumsum(sizes, out=run_off[1:])
            gather = (
                np.repeat(starts - run_off[:-1], sizes)
                + np.arange(total, dtype=np.int64)
            )
            p = tp.poss[gather].astype(np.int64) - i
            d_idx = np.repeat(d_pos, sizes)
            valid = p >= 0
            return d_idx[valid] * M + p[valid]

        for i, t in enumerate(head):
            k = shifted_keys(postings[t], i)
            keys = k if keys is None else np.intersect1d(keys, k, assume_unique=True)
            if keys.size == 0:
                return np.empty(0, np.uint64)
        last_i = len(raw) - 1
        last_union = np.unique(
            np.concatenate([shifted_keys(postings[t], last_i) for t in exps_t])
        )
        keys = np.intersect1d(keys, last_union, assume_unique=True)
        if keys.size == 0:
            return np.empty(0, np.uint64)
        d_hit = np.unique(keys // M)
        return np.sort(self._map_ordinals(cand[d_hit]))

    def highlight(
        self,
        doc_id: int,
        query: str,
        field: str | None = None,
        tags: tuple[str, str] = ("<em>", "</em>"),
    ) -> str:
        """Plain highlighter (Lucene's ``plain`` highlighter model):
        re-analyze the STORED text of one doc and wrap every token whose
        analyzed form is a query term. Per-doc work on an already-served
        hit — no positional postings required, char offsets come from
        the tokenizer's own spans, so highlights always agree with what
        scored."""
        col = self.primary_field if field is None else field
        tbl = self.get_docs(np.array([doc_id], dtype=np.uint64))
        if tbl.num_rows == 0:
            raise KeyError(f"doc {doc_id} not found")
        text = tbl.column(col)[0].as_py() or ""
        terms = set(self.field_terms(query, None))  # analyzed, unprefixed
        out: list[str] = []
        last = 0
        # IGNORECASE on the ORIGINAL text: lower() first could shift
        # offsets for locale-special codepoints
        import re as _re

        rx = _re.compile(TOKEN_RE.pattern, _re.IGNORECASE)
        for m in rx.finditer(text):
            if m.group(0).lower() in terms:
                out.append(text[last : m.start()])
                out.append(tags[0] + text[m.start() : m.end()] + tags[1])
                last = m.end()
        out.append(text[last:])
        return "".join(out)

    def search_phrase(
        self, phrase: str, k: int = 10, field: str | None = None, slop: int = 0
    ) -> list[tuple[int, float]]:
        """BM25-scored phrase top-k (Lucene PhraseQuery with
        BM25Similarity: tf = phrase occurrence count, idf = the SUM of
        the phrase terms' idfs — repeats included — dl/avgdl from the
        searched field). ``slop > 0`` scores ordered sloppy matches
        (``_sloppy_phrase_hits`` — greedy chains with gap total ≤ slop,
        each weighing 1). Ties: score desc, doc_id asc, as everywhere."""
        ords, ptf, dls, terms = self._sloppy_phrase_hits(phrase, slop, field)
        if ords.size == 0:
            return []
        postings = self.load_postings(sorted(set(terms)))
        # left-to-right accumulation in phrase order (the SQL oracle
        # adds the same way; float addition order is part of the API)
        idf_sum = 0.0
        for t in terms:
            idf_sum += self.idf(postings[t].df)
        scores = idf_sum * self._norm(ptf, dls, self.field_avgdl(field))
        ids, sc = self._rank(ords, scores, k)
        return list(zip(ids.tolist(), sc.tolist()))

    def mlt_terms(
        self,
        doc_id: int,
        max_query_terms: int = 25,
        min_term_freq: int = 1,
        min_doc_freq: int = 2,
        field: str | None = None,
    ) -> list[tuple[str, int, int]]:
        """More-like-this term selection (OpenSearch ``more_like_this``
        / Lucene MoreLikeThis): analyze the stored doc, keep terms with
        ``tf >= min_term_freq`` and corpus ``df >= min_doc_freq``, rank
        by tf·idf (ties: score desc, then term asc — deterministic) and
        take the top ``max_query_terms``. Returns ``(term, tf, df)``
        rows in selection order."""
        col = self.primary_field if field is None else field
        tbl = self.get_docs(np.array([doc_id], dtype=np.uint64))
        if tbl.num_rows == 0:
            raise KeyError(f"doc {doc_id} not found")
        toks = tokenize(tbl.column(col)[0].as_py() or "")
        tfs = Counter(toks)
        cand = sorted(t for t, n in tfs.items() if n >= min_term_freq)
        if not cand:
            return []
        postings = self.load_postings(cand)
        rows = []
        for t in cand:
            p = postings.get(t)
            if p is None or p.df < min_doc_freq:
                continue
            rows.append((float(tfs[t]) * self.idf(p.df), t, tfs[t], int(p.df)))
        rows.sort(key=lambda r: (-r[0], r[1]))
        return [(t, tf, df) for _, t, tf, df in rows[:max_query_terms]]

    def more_like_this(
        self,
        doc_id: int,
        k: int = 10,
        max_query_terms: int = 25,
        min_term_freq: int = 1,
        min_doc_freq: int = 2,
        field: str | None = None,
        include_self: bool = False,
    ) -> list[tuple[int, float]]:
        """More-like-this search: BM25 OR-query over the selected terms
        (each with query weight 1), the source doc excluded unless
        ``include_self``. Identical to ``search(" ".join(terms))`` —
        the composition is the tested invariant."""
        sel = self.mlt_terms(
            doc_id, max_query_terms, min_term_freq, min_doc_freq, field
        )
        if not sel:
            return []
        hits = self.search(
            " ".join(t for t, _, _ in sel), k=k + (0 if include_self else 1),
            field=field,
        )
        if not include_self:
            hits = [h for h in hits if h[0] != int(doc_id)][:k]
        return hits

    def get_docs(self, doc_ids: np.ndarray) -> pa.Table:
        """Doc-store lookup by id (SURVEY.md B5).

        Hash layout: ids hash straight to their bucket files. Scan
        layout: two hops — key index (doc_id -> winning ordinal), then
        the ordinal's partition file — touching only relevant files."""
        ids = np.asarray(doc_ids, dtype=np.uint64)
        if self.layout == "scan":
            from ..index.build_scan import KEYIDX_SUBDIR

            kbs = np.unique(ids % np.uint64(self.key_buckets))
            kb_paths = [
                os.path.join(self.index_dir, KEYIDX_SUBDIR, f"kb={int(b):05d}.parquet")
                for b in kbs
            ]
            kb_paths = [p for p in kb_paths if os.path.exists(p)]
            if not kb_paths:
                return pa.table({})
            idx = pads.dataset(kb_paths).to_table(filter=pads.field("doc_id").isin(ids))
            ordinals = idx.column("ordinal").to_numpy(zero_copy_only=False).astype(np.uint64)
            if ordinals.size == 0:
                return pa.table({})
            # drop tombstoned ordinals: delete visibility must not wait
            # for a force_merge (OpenSearch _mget of a deleted doc is
            # found: false immediately) — the keyidx is only rewritten
            # at merge time, so the dead lists are consulted here
            ordinals = self._drop_dead_ordinals(ordinals)
            if ordinals.size == 0:
                return pa.table({})
            parts = np.unique(ordinals >> np.uint64(ORD_SHIFT))
            paths = [
                os.path.join(self._docs_dir, f"{self.docstore_prefix}={int(p):05d}.parquet")
                for p in parts
            ]
            dset = pads.dataset([p for p in paths if os.path.exists(p)])
            return dset.to_table(filter=pads.field("ordinal").isin(ordinals))
        buckets = np.unique(ids % np.uint64(self.num_buckets))
        paths = [
            os.path.join(self._docs_dir, f"{self.docstore_prefix}={int(b):05d}.parquet")
            for b in buckets
        ]
        paths = [p for p in paths if os.path.exists(p)]
        if not paths:
            return pa.table({})
        dset = pads.dataset(paths)
        return dset.to_table(filter=pads.field("doc_id").isin(ids))


def search_dfs(
    index_dirs, query: str, k: int = 10, field: str | None = None
) -> list[tuple[int, float]]:
    """``dfs_query_then_fetch`` scatter-gather: exact BM25 top-k over a
    corpus SPLIT across indices, scored with GLOBAL statistics.

    Phase 1 (DFS): gather per-term df from every index plus global
    n_docs / sum_dl — a handful of integers per shard, the cheap
    pre-query exchange OpenSearch's dfs_query_then_fetch does. Global
    avgdl is one float division of exact integer sums, so it equals
    the unsplit index's avgdl bit-for-bit.

    Phase 2 (query): each index ranks its own top-k under the global
    stats (:meth:`IndexReader.search_with_stats`); since scoring is
    globally consistent, merging the per-index top-k by (score desc,
    doc_id asc) IS the exact global top-k. A corpus hash-split across
    N indices therefore returns bit-identical hits to the single
    index (contract entry ``dfs_multi_bm25`` pins this against the
    same SQL oracle as ``bm25_topk_single``) — the semantics a
    256-node deployment needs for stable cross-shard ranking, vs the
    default per-index-stats ``run_query_multi`` merge."""
    readers = [
        d if isinstance(d, IndexReader) else IndexReader(d) for d in index_dirs
    ]
    n_docs = sum(r.n_docs for r in readers)
    if field is None:
        sum_dl = sum(int(r.manifest["corpus"]["sum_dl"]) for r in readers)
    else:

        def _field_sum(r: IndexReader) -> int:
            corpus = r.manifest["corpus"]
            sdf = corpus.get("sum_dl_fields")
            if sdf is not None:
                return int(sdf[field])
            # pre-sum_dl_fields manifest: the stored per-field avgdl is
            # the exact integer sum / n_docs in one float64 division,
            # which round() inverts exactly at any plausible corpus size
            return round(float(corpus["avgdl_fields"][field]) * r.n_docs)

        sum_dl = sum(_field_sum(r) for r in readers)
    avgdl = (sum_dl / n_docs) if n_docs else 0.0
    dfs: dict[str, int] = {}
    for r in readers:
        for t, df in r.term_dfs(query, field).items():
            dfs[t] = dfs.get(t, 0) + int(df)
    merged: list[tuple[int, float]] = []
    for r in readers:
        merged.extend(r.search_with_stats(query, k, n_docs, avgdl, dfs, field))
    merged.sort(key=lambda h: (-h[1], h[0]))
    return merged[:k]


class BatchSearcher:
    """Actor-pool stage: score a batch of queries against one index.

    Use: ``queries_ds.map_batches(BatchSearcher, fn_constructor_kwargs=
    {"index_dir": ...}, concurrency=N, batch_format="pandas")``.
    The reader (manifest, dataset handles, OS page cache of postings)
    is opened once per actor (__init__), per-batch work is scoring.

    ``warm``: optional decode-once postings broadcast — a ``ray.put``
    ObjectRef (or plain dict) of ``{term: TermPostings}`` produced by
    :meth:`IndexReader.warm_cache`. Without it every actor in the pool
    independently re-decodes the same Zipf-head posting lists on its
    first batches (measured 2-5 s per actor on a 400k-doc index, the
    dominant cost of a 16-actor pool's first seconds); with it the
    arrays come out of the object store zero-copy, once per node.
    This is the broadcast-small-side pattern: decode on the driver,
    ``ray.put`` once, share read-only everywhere."""

    def __init__(
        self, index_dir: str, k: int = 10, pruned: bool = True, warm=None
    ):
        self.reader = IndexReader(index_dir)
        self.k = k
        self.pruned = pruned
        if warm is not None:
            import ray

            if isinstance(warm, ray.ObjectRef):
                # nested-in-kwargs refs are not auto-resolved by Ray
                warm = ray.get(warm)
            self.reader.seed_cache(warm)

    def _dispatch(self, qtext: str, k: int, kind: str, fval) -> list:
        """One typed query. ``kind`` column values: "match" (default,
        BM25 top-k, pruned), "phrase" (exact-phrase BM25), "filtered"
        (match + keyword filter from the batch's filter_field/value),
        "dsl" (query_text is a JSON OpenSearch request body — the
        whole DSL surface served from the actor pool)."""
        r = self.reader
        if kind == "phrase":
            return r.search_phrase(qtext, k)
        if kind == "filtered":
            return r.search_filtered(qtext, fval[0], fval[1], k)
        if kind == "dsl":
            import json

            from .dsl import run_query

            body = json.loads(qtext)
            body.setdefault("size", k)
            resp = run_query(r, body)
            return [
                (h["_id"], h["_score"] if h["_score"] is not None else 0.0)
                for h in resp["hits"]["hits"]
            ]
        fn = r.search_pruned if self.pruned else r.search
        return fn(qtext, k)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = {"query_id": [], "rank": [], "doc_id": [], "score": []}
        n = len(batch)
        ks = batch["k"] if "k" in batch.columns else pd.Series([self.k] * n)
        kinds = (
            batch["kind"] if "kind" in batch.columns
            else pd.Series(["match"] * n)
        )
        ffield = batch.get("filter_field", pd.Series([None] * n))
        fvalue = batch.get("filter_value", pd.Series([None] * n))
        for qid, qtext, k, kind, ff, fv in zip(
            batch["query_id"], batch["query_text"], ks, kinds, ffield, fvalue
        ):
            hits = self._dispatch(qtext, int(k), str(kind), (ff, fv))
            for rank, (doc_id, score) in enumerate(hits, start=1):
                out["query_id"].append(qid)
                out["rank"].append(rank)
                out["doc_id"].append(doc_id)
                out["score"].append(score)
        # explicit dtypes: a batch with zero hits must keep the same
        # block schema as a hitting batch (Ray warns on drift otherwise)
        return pd.DataFrame(
            {
                "query_id": pd.Series(out["query_id"], dtype=batch["query_id"].dtype),
                "rank": pd.Series(out["rank"], dtype="int64"),
                "doc_id": pd.Series(out["doc_id"], dtype="uint64"),
                "score": pd.Series(out["score"], dtype="float64"),
            }
        )


class ServingPool:
    """Long-lived BM25 serving pool: N persistent :class:`BatchSearcher`
    actors behind a round-robin dispatcher with bounded in-flight
    pipelining.

    The Dataset path (``map_batches(BatchSearcher, ...)``) is the right
    shape for BATCH scoring jobs — but it builds a fresh actor pool per
    executed dataset, and each new actor is a new worker process paying
    Python + Ray + engine import and reader open (~2-3 s) before its
    first batch.  A SERVING deployment never does that per request
    wave: actors start once, then only score.  This class is that
    steady-state regime — spin-up cost is paid (and reported) once in
    ``__init__``/:meth:`warm_up`, after which :meth:`score` measures
    pure scoring throughput.

    On a multi-node cluster pass a ``warm`` ObjectRef
    (:meth:`IndexReader.warm_cache` + ``ray.put``) so the head-term
    postings decode once per node (zero-copy object-store reads)
    instead of once per actor.
    """

    def __init__(
        self,
        index_dir: str,
        n_actors: int = 8,
        k: int = 10,
        warm=None,
        num_cpus: float = 1,
        inflight_per_actor: int = 2,
    ):
        import ray

        cls = ray.remote(num_cpus=num_cpus)(BatchSearcher)
        self._actors = [
            cls.remote(index_dir, k=k, warm=warm) for _ in range(n_actors)
        ]
        self._inflight = max(1, inflight_per_actor)
        self._rr = 0

    def warm_up(self) -> None:
        """Block until every actor has constructed (reader open, warm
        cache seeded) — separates spin-up from scoring measurements."""
        import ray

        probe = pd.DataFrame(
            {
                "query_id": [0],
                "query_text": [""],
                "kind": ["match"],
                "filter_field": [None],
                "filter_value": [None],
            }
        )
        ray.get([a.__call__.remote(probe) for a in self._actors])

    def score(self, batches) -> list:
        """Score an iterable of query DataFrames; returns the result
        frames in submission order.  Keeps ``inflight_per_actor``
        batches queued per actor (pipelining hides dispatch latency
        without unbounded queueing — backpressure at the driver)."""
        import ray

        n = len(self._actors)
        window = n * self._inflight
        futures: list = []
        results: list = []
        for batch in batches:
            if len(futures) >= window:
                # oldest future first: each actor runs its queue in
                # order, so this is both backpressure and order-safe
                results.append(ray.get(futures.pop(0)))
            futures.append(self._actors[self._rr % n].__call__.remote(batch))
            self._rr += 1
        results.extend(ray.get(futures))
        return results

    def shutdown(self) -> None:
        import ray

        for a in self._actors:
            ray.kill(a)
        self._actors = []
