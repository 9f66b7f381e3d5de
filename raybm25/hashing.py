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

HASH_IMPL = "pandas-siphash13/raybm25-doc-key-1+texth-poly-1"
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


_TEXTH_P = np.uint64(0x100000001B3)  # FNV-ish odd multiplier
_TEXTH_LEN_MIX = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (vectorized, uint64 wraparound)."""
    z = x + _TEXTH_LEN_MIX
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hash_text_column(col) -> np.ndarray:
    """Vectorized 64-bit content hash (texth) of a string/binary Arrow
    column, computed straight off the value buffers — NO per-row Python
    objects (the ``to_pylist()`` round-trip this replaces materialized
    every text just to hash it; VERDICT r3 'Next round' #5).

    Per row: a positional polynomial over the utf-8 bytes,
    ``h = Σ (byte_i + 1) · P^i  (mod 2^64)``, finalized with splitmix64
    xor the length. str and bytes rows of the same utf-8 content hash
    identically (both hash the raw buffer bytes). Nulls hash as "".
    Implemented with one cumsum + gather per chunk — wraparound uint64
    arithmetic makes the per-row segment sums exact differences of the
    running sum."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        if col.num_chunks != 1:
            return (
                np.concatenate([hash_text_column(c) for c in col.chunks])
                if col.num_chunks
                else np.empty(0, np.uint64)
            )
        col = col.chunk(0)
    if col.null_count:
        col = pc.fill_null(col, b"" if pa.types.is_binary(col.type) else "")
    n = len(col)
    if n == 0:
        return np.empty(0, np.uint64)
    odtype = (
        np.int64
        if pa.types.is_large_binary(col.type) or pa.types.is_large_string(col.type)
        else np.int32
    )
    bufs = col.buffers()
    offsets = np.frombuffer(bufs[1], dtype=odtype, count=col.offset + n + 1)[
        col.offset :
    ].astype(np.int64)
    start, end = int(offsets[0]), int(offsets[-1])
    if bufs[2] is None or end == start:  # every row empty
        data = np.empty(0, dtype=np.uint8)
    else:
        data = np.frombuffer(bufs[2], dtype=np.uint8, count=end, offset=0)[start:end]
    lens = np.diff(offsets)
    rel = offsets[:-1] - start
    # P^pos for pos = position within the row
    maxlen = int(lens.max()) if n else 0
    powers = np.empty(max(maxlen, 1), dtype=np.uint64)
    powers[0] = 1
    if maxlen > 1:
        np.multiply.accumulate(
            np.full(maxlen - 1, _TEXTH_P, dtype=np.uint64), out=powers[1:]
        )
    pos = np.arange(data.size, dtype=np.int64) - np.repeat(rel, lens)
    contrib = (data.astype(np.uint64) + np.uint64(1)) * powers[pos]
    csum = np.zeros(data.size + 1, dtype=np.uint64)
    np.cumsum(contrib, out=csum[1:])
    h = csum[rel + lens] - csum[rel]  # wraparound subtraction == segment sum mod 2^64
    return _mix64(h ^ (lens.astype(np.uint64) * _TEXTH_LEN_MIX))


def bucket_of(doc_keys, num_buckets: int) -> np.ndarray:
    """Hash bucket (int32) of string keys — the dedup/docstore/update
    co-partitioning function. ONE partitioning key reused across stages
    (SURVEY.md §7 'Shuffles and their keys')."""
    return (hash64(doc_keys) % np.uint64(num_buckets)).astype(np.int32)
