"""Deterministic distributed shuffle — reproducible training-data
ordering at any cluster size.

``ray.data.Dataset.random_shuffle`` gives a different permutation per
run (and per block layout), which breaks experiment reproducibility:
the same corpus + seed should yield the same training order on 1 node
or 256. The standard fix is to SORT BY A KEYED HASH of the document id
(a "hash shuffle"): the permutation is a pure function of (doc_id,
seed), so it is stable across runs, cluster sizes, block layouts and
resumes — and it is one ordinary distributed sort, the exchange Ray
Data already does well.

The key is the splitmix64 finalizer over ``doc_id XOR seed`` — chosen
(like the polynomial hashes in :mod:`raybm25.extras.textstats`)
because every step is exact integer arithmetic mod 2^64 that DuckDB
reproduces with HUGEINT ops, giving the contract entry a bit-exact SQL
oracle. The key travels as its two's-complement int64 (Ray's sort
exchange degrades uint64 > 2^63 to pickled objects).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (wraps mod 2^64)."""
    h = x.astype(np.uint64).copy()
    h ^= h >> np.uint64(30)
    h *= _C1
    h ^= h >> np.uint64(27)
    h *= _C2
    h ^= h >> np.uint64(31)
    return h


def shuffle_key(ids: np.ndarray, seed: int) -> np.ndarray:
    """int64 shuffle key for uint64 ids: splitmix64(id ^ seed), viewed
    two's-complement so it survives Ray's sort exchange. NOTE: int64
    order differs from uint64 order — both the engine and the SQL
    oracle sort the SIGNED key, so they agree; for shuffling any total
    order is equally 'random'."""
    return splitmix64(ids.astype(np.uint64) ^ np.uint64(seed)).view(np.int64)


class _KeyStage:
    def __init__(self, id_col: str, seed: int):
        self.id_col = id_col
        self.seed = int(seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        key = shuffle_key(ids.astype(np.uint64), self.seed)
        return batch.replace_schema_metadata(None).append_column(
            "_shuffle_key", pa.array(key, pa.int64())
        )


def deterministic_shuffle(ds, seed: int = 0, id_col: str = "doc_id"):
    """Return ``ds`` in the (doc_id, seed)-determined pseudo-random
    order: append the splitmix64 key, one distributed sort, key
    dropped. Same corpus + seed => same order, on any cluster."""
    out = ds.map_batches(_KeyStage(id_col, seed), batch_format="pyarrow")
    return out.sort(["_shuffle_key", id_col]).map_batches(
        lambda t: t.drop_columns(["_shuffle_key"]), batch_format="pyarrow"
    )
