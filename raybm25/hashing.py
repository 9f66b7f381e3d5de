"""Stable 64-bit document keys and hash-bucket helpers.

Doc IDs must be stable across runs and parallelism levels (SURVEY.md
§4 "Ordering"): when the source has a string key (``url``) we derive
``doc_id = hash64(url)`` vectorized; when the source already carries an
integer id column (driver testdata ``documents.doc_id``) we use it
directly so oracle SQL can reference the same ids.

hash64 uses pandas' vectorized siphash (``pandas.util.hash_array``)
with a fixed 16-byte key — deterministic for the pinned pandas version;
the index manifest records the hash implementation tag, and the build
verifies there are no collisions post-dedup (raises otherwise).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

HASH_IMPL = "pandas-siphash13/raybm25-doc-key-1"
_HASH_KEY = "raybm25_dockey16"  # exactly 16 bytes
_HASH_KEY_B = "raybm25_witness2"  # independent witness key (collision check)

assert len(_HASH_KEY) == 16
assert len(_HASH_KEY_B) == 16


def hash64(strings) -> np.ndarray:
    """Vectorized stable uint64 hash of a string array-like."""
    arr = np.asarray(strings, dtype=object)
    return pd.util.hash_array(arr, hash_key=_HASH_KEY, categorize=False)


def hash64b(strings) -> np.ndarray:
    """Second, independently-keyed hash: paired with :func:`hash64` as a
    collision witness (two texts matching on BOTH 64-bit hashes are
    treated as equal; the joint false-match probability is ~2**-128 per
    pair)."""
    arr = np.asarray(strings, dtype=object)
    return pd.util.hash_array(arr, hash_key=_HASH_KEY_B, categorize=False)


_MIX_C = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (vectorized, uint64 wraparound)."""
    z = x + _MIX_C
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def bucket_of(doc_keys, num_buckets: int) -> np.ndarray:
    """Hash bucket (int32) of string keys — the dedup/docstore/update
    co-partitioning function. ONE partitioning key reused across stages
    (SURVEY.md §7 'Shuffles and their keys')."""
    return (hash64(doc_keys) % np.uint64(num_buckets)).astype(np.int32)
