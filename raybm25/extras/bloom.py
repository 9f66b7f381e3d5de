"""Bloom-filter incremental dedup: admit only NEW documents against an
EXISTING corpus without re-shuffling the corpus.

The missing piece between one-shot dedup (`extras.dedup.exact_dedup`,
which co-shuffles everything) and a 100 TB pipeline that ingests a new
crawl every day: re-keying the historical corpus per run is the cost
you must not pay. A Bloom filter makes the corpus membership test a
fixed-size broadcast:

    corpus:  map_batches(BloomBuildStage)  -> one (m/8-byte) bit-array
             row per input block                       [no key shuffle]
    driver:  fold rows with bitwise OR    -> one filter, ray.put once
    new:     map_batches(BloomFilterStage) -> rows split into
             definite-new (bloom miss: EXACT, pass through immediately)
             and candidate-dup (bloom hit: dup OR false positive)
    confirm: candidates only — a keys-only scan of the corpus filtered
             to the candidate hash set (broadcast, ~16 B/candidate)
             turns "probably dup" into exact truth.

End-to-end the result is EXACT (false positives are caught by the
confirm pass; false negatives cannot happen by Bloom's one-sided
error), so the operator carries a plain SQL anti-join oracle. Traffic:
the filter (m/8 bytes, e.g. 32 MiB for ~100 M keys at 1 % FP) is
broadcast once per run; the confirm exchange is sized by the true dup
rate plus the FP rate, not the corpus.

Determinism: keys are the engine's fixed-key siphash
(``hashing.hash64`` / ``hash64b``); the k Bloom probes are derived by
the standard double-hashing scheme h1 + i*h2 (Kirsch-Mitzenmacher), so
the filter bytes — and therefore the candidate set — are run- and
partitioning-stable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..hashing import hash64, hash64b

DEFAULT_M_BITS = 1 << 23  # 1 MiB filter: ~1% FP at ~870k keys
DEFAULT_K = 7


def _probe_positions(h1: np.ndarray, h2: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing — h2 is forced odd so
    every probe sequence cycles the full (power-of-two) table."""
    h2 = h2 | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(
        np.int64
    )


def bloom_empty(m_bits: int = DEFAULT_M_BITS) -> np.ndarray:
    return np.zeros(m_bits >> 3, dtype=np.uint8)


def bloom_add(reg: np.ndarray, texts: np.ndarray, m_bits: int, k: int) -> None:
    """Fold text keys into the bit array in place, vectorized."""
    if len(texts) == 0:
        return
    pos = _probe_positions(hash64(texts), hash64b(texts), m_bits, k).ravel()
    np.bitwise_or.at(reg, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))


def bloom_maybe(reg: np.ndarray, texts: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Boolean mask: True where ALL k probe bits are set (member or
    false positive); False is a PROOF of absence."""
    if len(texts) == 0:
        return np.zeros(0, dtype=bool)
    pos = _probe_positions(hash64(texts), hash64b(texts), m_bits, k)
    bits = (reg[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)


class BloomBuildStage:
    """map_batches stage: one Bloom bit-array row per batch (list<u8>
    column ``reg``). Fold on the driver with ``bloom_merge`` — same
    shuffle-free combiner contour as the HLL sketch."""

    def __init__(self, text_col: str = "text", m_bits: int = DEFAULT_M_BITS,
                 k: int = DEFAULT_K):
        self.text_col, self.m_bits, self.k = text_col, int(m_bits), int(k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        reg = bloom_empty(self.m_bits)
        bloom_add(
            reg,
            batch.column(self.text_col).to_numpy(zero_copy_only=False),
            self.m_bits,
            self.k,
        )
        return pa.table({"reg": pa.array([reg], pa.list_(pa.uint8()))})


def bloom_merge(rows) -> np.ndarray:
    """OR-fold the per-block register rows (driver side; a few MB
    total, independent of key cardinality)."""
    out: np.ndarray | None = None
    for r in rows:
        a = np.asarray(r, dtype=np.uint8)
        out = a.copy() if out is None else np.bitwise_or(out, a)
    if out is None:
        raise ValueError("no register rows to merge")
    return out


def bloom_from_dataset(ds, text_col: str = "text",
                       m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K) -> np.ndarray:
    regs = ds.map_batches(
        BloomBuildStage(text_col, m_bits, k), batch_format="pyarrow"
    ).take_all()
    return bloom_merge(r["reg"] for r in regs)


class BloomSplitStage:
    """map_batches stage over the NEW batch: key each row and mark
    bloom hits. Emits (doc_id, texth, texth2, maybe_dup) — text bytes
    never leave the stage; the filter arrives by broadcast reference
    (``ray.put`` once), not per batch."""

    def __init__(self, reg_ref, text_col: str = "text",
                 m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K):
        import ray

        self.reg = (
            ray.get(reg_ref) if not isinstance(reg_ref, np.ndarray) else reg_ref
        )
        self.text_col, self.m_bits, self.k = text_col, int(m_bits), int(k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_numpy(zero_copy_only=False)
        maybe = bloom_maybe(self.reg, texts, self.m_bits, self.k)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "texth": pa.array(hash64(texts).view(np.int64), pa.int64()),
                "texth2": pa.array(hash64b(texts).view(np.int64), pa.int64()),
                "maybe_dup": pa.array(maybe),
            }
        )


def incremental_new_ids(
    corpus_ds,
    new_ds,
    text_col: str = "text",
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> tuple[pd.DataFrame, dict]:
    """Doc ids of NEW rows whose text does not occur in the corpus —
    EXACT, bloom-accelerated. Returns ``(ids_df, stats)`` where stats
    carries the candidate/false-positive accounting that proves the
    prune worked.

    Exactness argument: a bloom MISS proves absence (admit
    immediately); every HIT is re-checked against the corpus's true
    (texth, texth2) key pairs, read in one keys-only pass filtered to
    the candidate hash set. At 100 TB the confirm read is pruned by
    parquet statistics on texth and the candidate set is broadcast —
    dup-rate-sized, never corpus-sized."""
    import ray

    from .dedup import text_hash_keys

    reg = bloom_from_dataset(corpus_ds, text_col, m_bits, k)
    reg_ref = ray.put(reg)
    # actor-pool stage: the filter is fetched from the object store
    # ONCE per actor in __init__ (zero-copy plasma read), never
    # serialized into per-task closures
    keyed = new_ds.map_batches(
        BloomSplitStage,
        fn_constructor_kwargs={
            "reg_ref": reg_ref,
            "text_col": text_col,
            "m_bits": m_bits,
            "k": k,
        },
        batch_format="pyarrow",
        concurrency=(1, 4),
    ).to_pandas()
    definite_new = keyed.loc[~keyed["maybe_dup"]]
    cand = keyed.loc[keyed["maybe_dup"]]
    stats = {
        "n_new": int(len(keyed)),
        "n_definite_new": int(len(definite_new)),
        "n_candidates": int(len(cand)),
    }
    if len(cand):
        # broadcast the candidate hash set (dup-rate-sized); the
        # corpus-side confirm is one keys-only pass with a vectorized
        # np.isin prune on texth — no Python-per-row work on the big
        # side
        cand_h1 = np.unique(cand["texth"].to_numpy())
        cand_h = ray.put(cand_h1)

        def confirm(batch: pa.Table) -> pa.Table:
            t = text_hash_keys(batch, text_col)
            keep = np.isin(
                t.column("texth").to_numpy(), ray.get(cand_h),
                assume_unique=False,
            )
            return t.filter(pa.array(keep)).select(["texth", "texth2"])

        hit = corpus_ds.map_batches(confirm, batch_format="pyarrow").to_pandas()
        present = set(zip(hit["texth"].tolist(), hit["texth2"].tolist()))
        fp = cand[
            [
                (a, b) not in present
                for a, b in zip(cand["texth"], cand["texth2"])
            ]
        ]
        stats["n_false_positive"] = int(len(fp))
        new_ids = pd.concat([definite_new["doc_id"], fp["doc_id"]])
    else:
        stats["n_false_positive"] = 0
        new_ids = definite_new["doc_id"]
    out = new_ids.sort_values().reset_index(drop=True).to_frame("doc_id")
    return out, stats
