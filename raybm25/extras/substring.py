"""Exact duplicated-passage detection at n-gram granularity — the
map-reduce-able variant of suffix-array substring dedup (Lee et al.
2022, "Deduplicating Training Data Makes Language Models Better": the
suffix array finds substrings >= 50 tokens repeated anywhere in the
corpus; here the same signal is computed at fixed W-token windows,
which a Dataset pipeline can do with ONE key-only shuffle instead of a
global suffix sort).

Pipeline (two streaming passes, no driver-side materialization):

1. :func:`ngram_stats` — ``map_batches`` tokenizes each doc, hashes
   every W-token window (polynomial token hash composed by a Horner
   step, both mod 2^64 — the SAME SQL-expressible construction as the
   winnowing fingerprints in :mod:`raybm25.extras.textstats`, so the
   whole pass has a bit-exact DuckDB oracle), and PRE-AGGREGATES per
   block: one row per distinct window hash per block with its
   occurrence and doc counts (docs never span blocks, so per-block doc
   counts sum exactly). The only shuffle is ``groupby(h)`` over those
   partials — ~16 bytes per distinct (block, window) pair, never the
   text.
2. :func:`dup_span_coverage` — broadcast the duplicated-hash set
   (``ray.put`` once, read per actor) and re-scan: each doc's covered
   token positions are the union of ``[i, i+W)`` over its duplicated
   windows, computed with a boundary diff-array (add 1 at ``i``, -1 at
   ``i+W``, cumsum > 0) — no per-position Python loop.
   :func:`scrub_dup_spans` drops the covered tokens, the Lee-et-al.
   removal semantics at window granularity.

At 10^12 docs the duplicated-hash set itself can outgrow a broadcast;
:class:`BloomLookup` is the documented scale path — a fixed-size bit
array with k derived probes, false positives only (a slightly
over-eager scrub, never an under-scrub). The exact sorted-array
lookup is the default and what the contract entries check.

Reference scope note: the reference (CBIIT/opensearch-loader) has no
dedup at all — this module is part of the engine-original
training-data surface mandated by the build brief.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .textstats import FP_BASE, TOKEN_RE, poly_token_hashes

DEFAULT_W = 8
_MOD_COMMENT = "all arithmetic wraps mod 2^64 (uint64), matching the SQL HUGEINT % 2^64"


def window_hashes(toks: list[str], w: int = DEFAULT_W) -> np.ndarray:
    """uint64 hash of every W-token window: Horner over the per-token
    polynomial hashes, ``h = h*B + tok_hash`` seeded with the first
    token's hash — exactly DuckDB's
    ``list_reduce(th[i:i+W-1], (a,b) -> (a*B + b) % 2^64)``."""
    if len(toks) < w:
        return np.empty(0, dtype=np.uint64)
    th = poly_token_hashes(toks)
    # B^(w-1), ..., B, 1 — wraparound mod 2^64 is intended (numpy warns
    # only for the scalar op, so compute the powers as an array cumprod)
    pows = np.cumprod(
        np.full(w, FP_BASE, dtype=np.uint64)[:-1][::-1], dtype=np.uint64
    )[::-1]
    pows = np.concatenate([pows, np.ones(1, dtype=np.uint64)])
    view = np.lib.stride_tricks.sliding_window_view(th, w)
    return (view * pows).sum(axis=1, dtype=np.uint64)


class NgramPartialStage:
    """map_batches stage: per-block partial n-gram statistics.

    Emits one row per DISTINCT window hash in the block:
    ``(h, n_total, n_docs)`` — pre-aggregation that caps the shuffle at
    the block's distinct-hash count instead of its token count."""

    def __init__(self, text_col: str = "text", w: int = DEFAULT_W):
        self.text_col = text_col
        self.w = int(w)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        findall = TOKEN_RE.findall
        per_doc: list[np.ndarray] = []
        doc_of: list[np.ndarray] = []
        for di, t in enumerate(texts):
            toks = findall(t.lower()) if isinstance(t, str) else []
            h = window_hashes(toks, self.w)
            if h.size:
                per_doc.append(h)
                doc_of.append(np.full(h.size, di, dtype=np.int64))
        if not per_doc:
            return pa.table(
                {
                    "h": pa.array([], pa.uint64()),
                    "n_total": pa.array([], pa.int64()),
                    "n_docs": pa.array([], pa.int64()),
                }
            )
        allh = np.concatenate(per_doc)
        alld = np.concatenate(doc_of)
        # occurrence counts per hash
        uh, inv, n_total = np.unique(allh, return_inverse=True, return_counts=True)
        # doc counts per hash: unique (doc, hash) pairs, then count per hash
        pair = np.unique(np.stack([alld, inv.astype(np.int64)], axis=1), axis=0)
        n_docs = np.bincount(pair[:, 1], minlength=uh.size)
        # the hash travels as its two's-complement int64: Ray's
        # sort/groupby exchange converts blocks through pandas, where
        # uint64 values above 2^63 degrade to pickled Python objects
        return pa.table(
            {
                "h": pa.array(uh.view(np.int64), pa.int64()),
                "n_total": pa.array(n_total.astype(np.int64), pa.int64()),
                "n_docs": pa.array(n_docs.astype(np.int64), pa.int64()),
            }
        )


def ngram_stats(ds, text_col: str = "text", w: int = DEFAULT_W):
    """Corpus-wide W-gram statistics: Dataset of
    ``(h: uint64, n_total, n_docs)``, one row per distinct window hash.
    One key-only shuffle (groupby over per-block partials)."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        NgramPartialStage(text_col, w), batch_format="pyarrow"
    )
    return partials.groupby("h").aggregate(
        Sum("n_total", alias_name="n_total"), Sum("n_docs", alias_name="n_docs")
    )


def dup_hashes(ds, text_col: str = "text", w: int = DEFAULT_W, min_docs: int = 2) -> np.ndarray:
    """Sorted uint64 array of window hashes appearing in >= min_docs
    distinct docs. Small relative to the corpus (it is the DUPLICATED
    tail); at 10^12-doc scale route through :class:`BloomLookup`."""
    import pyarrow.compute as pc

    stats = ngram_stats(ds, text_col, w)
    dup = stats.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("n_docs"), min_docs)).select(["h"]),
        batch_format="pyarrow",
    )
    parts = [
        b.column("h").to_numpy(zero_copy_only=False)
        for b in dup.iter_batches(batch_format="pyarrow")
    ]
    out = (
        np.concatenate(parts).astype(np.int64)
        if parts
        else np.empty(0, dtype=np.int64)
    )
    return np.sort(out.view(np.uint64))


class BloomLookup:
    """Fixed-size Bloom filter over uint64 window hashes — the
    broadcast-side representation when the duplicated set outgrows an
    exact array. k probes derived from the hash by odd-constant
    multiply + shift (no rehash of the underlying bytes needed: the
    inputs are already 64-bit uniform). False positives over-scrub
    slightly; never under-scrub."""

    def __init__(self, hashes: np.ndarray, bits_per_key: int = 12, k: int = 4):
        n_bits = max(64, int(bits_per_key) * max(1, hashes.size))
        self.n_bits = 1 << int(np.ceil(np.log2(n_bits)))
        # Fibonacci-hash addressing: take the TOP log2(n_bits) bits of
        # the 64-bit product (a fixed >>40 would cap usable addresses
        # at 2^24 and saturate any larger table)
        self.shift = np.uint64(64 - int(np.log2(self.n_bits)))
        self.k = int(k)
        self.bits = np.zeros(self.n_bits // 8, dtype=np.uint8)
        for i in range(self.k):
            idx = self._probe(hashes.astype(np.uint64), i)
            np.bitwise_or.at(self.bits, idx >> 3, np.uint8(1) << (idx & 7).astype(np.uint8))

    def _probe(self, h: np.ndarray, i: int) -> np.ndarray:
        c = np.uint64(0x9E3779B97F4A7C15 + 2 * i + 1)
        return (h * c) >> self.shift

    def contains(self, h: np.ndarray) -> np.ndarray:
        out = np.ones(h.size, dtype=bool)
        hh = h.astype(np.uint64)
        for i in range(self.k):
            idx = self._probe(hh, i)
            out &= (self.bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1 == 1
        return out


class _ExactLookup:
    def __init__(self, hashes: np.ndarray):
        self.h = np.asarray(hashes, dtype=np.uint64)

    def contains(self, h: np.ndarray) -> np.ndarray:
        if self.h.size == 0:
            return np.zeros(h.size, dtype=bool)
        pos = np.minimum(np.searchsorted(self.h, h), self.h.size - 1)
        return self.h[pos] == h


class DupSpanStage:
    """map_batches stage: per-doc duplicated-span coverage.

    ``lookup_ref`` is a ``ray.put`` handle to an :class:`_ExactLookup`
    or :class:`BloomLookup` — fetched ONCE per actor, shared zero-copy
    by every batch. Emits ``(doc_id, dl, n_covered)`` and, when
    ``scrub=True``, ``text`` with the covered spans CUT FROM THE
    ORIGINAL text (character spans of the covered tokens' runs, the
    Lee-et-al. semantics): untouched docs come back byte-identical,
    and casing/punctuation outside the cut spans survives. (One edge:
    a ``str.lower()`` that changes the string LENGTH — e.g. U+0130 —
    breaks span alignment; such docs fall back to a lowercased
    token-join of the kept tokens.)"""

    def __init__(
        self,
        lookup_ref,
        text_col: str = "text",
        w: int = DEFAULT_W,
        scrub: bool = False,
    ):
        import ray

        self.lookup = ray.get(lookup_ref)
        self.text_col = text_col
        self.w = int(w)
        self.scrub = bool(scrub)

    @staticmethod
    def _cut_spans(t: str, lowered: str, cov: np.ndarray) -> str:
        """Original text with each covered token RUN's character span
        removed (run start-char .. run end-char; separators between
        kept segments survive as-is)."""
        matches = list(TOKEN_RE.finditer(lowered))
        parts: list[str] = []
        pos = 0
        i = 0
        n = len(matches)
        while i < n:
            if cov[i]:
                j = i
                while j + 1 < n and cov[j + 1]:
                    j += 1
                parts.append(t[pos:matches[i].start()])
                pos = matches[j].end()
                i = j + 1
            else:
                i += 1
        parts.append(t[pos:])
        return "".join(parts)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        findall = TOKEN_RE.findall
        dls = np.zeros(len(texts), dtype=np.int64)
        covered = np.zeros(len(texts), dtype=np.int64)
        scrubbed: list[str] = []
        for di, t in enumerate(texts):
            if not isinstance(t, str):
                t = ""
            lowered = t.lower()
            toks = findall(lowered)
            dls[di] = len(toks)
            h = window_hashes(toks, self.w)
            member = self.lookup.contains(h) if h.size else None
            if member is None or not member.any():
                if self.scrub:
                    scrubbed.append(t)  # untouched docs stay byte-identical
                continue
            starts = np.flatnonzero(member)
            # union of [i, i+W) via a boundary diff-array
            diff = np.zeros(len(toks) + 1, dtype=np.int32)
            np.add.at(diff, starts, 1)
            np.add.at(diff, starts + self.w, -1)
            cov = np.cumsum(diff[:-1]) > 0
            covered[di] = int(cov.sum())
            if self.scrub:
                if len(lowered) == len(t):
                    scrubbed.append(self._cut_spans(t, lowered, cov))
                else:  # length-changing lower() (rare): lossy fallback
                    scrubbed.append(
                        " ".join(tok for tok, c in zip(toks, cov) if not c)
                    )
        # pass every input column through (downstream stages keep their
        # lang/meta columns); replace the text only when scrubbing.
        # Pre-existing dl / n_covered columns (e.g. a docstore export)
        # are replaced, not duplicated.
        out = batch.drop_columns(
            [c for c in ("dl", "n_covered") if c in batch.column_names]
        )
        if self.scrub:
            out = out.set_column(
                out.column_names.index(self.text_col),
                self.text_col,
                pa.array(scrubbed, pa.string()),
            )
        out = out.append_column("dl", pa.array(dls, pa.int64()))
        return out.append_column("n_covered", pa.array(covered, pa.int64()))


def _lookup_ref(ds, text_col, w, min_docs, bloom):
    import ray

    dup = dup_hashes(ds, text_col, w, min_docs)
    lk = BloomLookup(dup) if bloom else _ExactLookup(dup)
    return ray.put(lk)


def dup_span_coverage(
    ds,
    text_col: str = "text",
    w: int = DEFAULT_W,
    min_docs: int = 2,
    bloom: bool = False,
):
    """Per-doc duplicated-passage coverage: Dataset of
    ``(doc_id, dl, n_covered)``. ``n_covered`` counts token positions
    inside at least one W-window that appears in >= min_docs docs."""
    from ..util import auto_concurrency

    ref = _lookup_ref(ds, text_col, w, min_docs, bloom)
    return ds.map_batches(
        DupSpanStage,
        fn_constructor_kwargs={"lookup_ref": ref, "text_col": text_col, "w": w},
        batch_format="pyarrow",
        concurrency=auto_concurrency(),
    )


def scrub_dup_spans(
    ds,
    text_col: str = "text",
    w: int = DEFAULT_W,
    min_docs: int = 2,
    bloom: bool = False,
):
    """Remove duplicated W-window spans from every doc (the Lee et al.
    removal semantics at window granularity): Dataset with the covered
    tokens dropped from ``text_col`` plus the coverage counters."""
    from ..util import auto_concurrency

    ref = _lookup_ref(ds, text_col, w, min_docs, bloom)
    return ds.map_batches(
        DupSpanStage,
        fn_constructor_kwargs={
            "lookup_ref": ref,
            "text_col": text_col,
            "w": w,
            "scrub": True,
        },
        batch_format="pyarrow",
        concurrency=auto_concurrency(),
    )
