"""Posting-list compression: delta + varbyte, with block-max metadata.

The north rule (BASELINE.json) requires "globally sorted,
delta+varbyte-compressed posting lists with block-max metadata". All
encode/decode paths are vectorized numpy (no per-value Python loops in
the hot path — the loops below are over *byte positions* (<=10
iterations), not values).

Varbyte format: LEB128-style — 7 payload bits per byte, high bit set
means "more bytes follow"; little-endian 7-bit groups. Doc IDs are
delta-encoded (first value raw, then successive differences) before
varbyte; tf and dl streams are varbyte'd raw.

Block-max metadata: postings are cut into fixed blocks of
``BLOCK_SIZE`` entries; per block we record the last doc_id (skip
pointer) and the maximum BM25 tf-normalization
``tf / (tf + k1*(1 - b + b*dl/avgdl))`` (an upper bound that, scaled
by the term's idf, bounds any score contribution from the block —
the quantity Block-Max WAND prunes on).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128

_THRESHOLDS = [np.uint64(1) << np.uint64(7 * i) for i in range(1, 10)]


def round_up_f32(true_max: np.ndarray) -> np.ndarray:
    """float64 -> float32 rounding UP, so stored block maxes stay valid
    upper bounds for pruning."""
    out = true_max.astype(np.float32)
    low = out.astype(np.float64) < true_max
    out[low] = np.nextafter(out[low], np.float32(np.inf))
    return out


def varbyte_sizes(values: np.ndarray) -> np.ndarray:
    """Encoded byte length per value (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    nbytes = np.ones(v.shape, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += (v >= t).astype(np.int64)
    return nbytes


def varbyte_encode_with_sizes(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode a uint64 array; returns (uint8 buffer, per-value byte sizes).

    The sizes array lets callers slice one big encoded buffer into
    per-group segments without re-encoding (the multi-group encoder)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    nbytes = varbyte_sizes(v)
    starts = np.zeros(v.shape, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=starts[1:])
    total = int(starts[-1] + nbytes[-1])
    out = np.zeros(total, dtype=np.uint8)
    maxlen = int(nbytes.max())
    for j in range(maxlen):
        mask = nbytes > j
        chunk = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[mask] > j + 1).astype(np.uint8) << 7
        out[starts[mask] + j] = chunk.astype(np.uint8) | cont
    return out, nbytes


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a uint64 array to varbyte. Vectorized over values."""
    out, _ = varbyte_encode_with_sizes(values)
    return out.tobytes()


def varbyte_decode(buf: bytes | memoryview) -> np.ndarray:
    """Decode varbyte bytes back to a uint64 array. Vectorized, with a
    fast path for all-single-byte runs (values < 128 — the common case
    for tf/dl streams and dense-ordinal deltas)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    if not (b & 0x80).any():
        return b.astype(np.uint64)
    is_end = (b & 0x80) == 0
    ends = np.flatnonzero(is_end)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    out = np.zeros(ends.shape, dtype=np.uint64)
    maxlen = int(lengths.max())
    payload = (b & 0x7F).astype(np.uint64)
    for j in range(maxlen):
        mask = lengths > j
        out[mask] |= payload[starts[mask] + j] << np.uint64(7 * j)
    return out


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    """First value raw, then successive diffs. Input must be ascending."""
    v = np.ascontiguousarray(sorted_vals, dtype=np.uint64)
    if v.size == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(deltas, dtype=np.uint64)


def encode_doc_ids(sorted_doc_ids: np.ndarray) -> bytes:
    return varbyte_encode(delta_encode(sorted_doc_ids))


def decode_doc_ids(buf: bytes | memoryview) -> np.ndarray:
    return delta_decode(varbyte_decode(buf))


def decode_positions(buf: bytes | memoryview, tfs: np.ndarray) -> np.ndarray:
    """Decode one group's ``poss_enc`` back to flattened within-doc
    token positions (``tfs[i]`` values per posting ``i``, ascending).

    Inverse of the positional encoding in
    :func:`raybm25.index.encode.encode_posting_groups`: positions are
    delta-encoded within each posting's run (first value raw), so the
    decode is one cumsum with a per-run base subtraction — fully
    vectorized."""
    d = varbyte_decode(buf).astype(np.int64)
    if d.size == 0:
        return d.astype(np.int32)
    tfs = np.asarray(tfs, dtype=np.int64)
    c = np.cumsum(d)
    off = np.zeros(tfs.size + 1, dtype=np.int64)
    np.cumsum(tfs, out=off[1:])
    base = np.concatenate(([0], c[off[1:-1] - 1]))
    return (c - np.repeat(base, tfs)).astype(np.int32)


def tf_norm(tfs: np.ndarray, dls: np.ndarray, k1: float, b: float, avgdl: float) -> np.ndarray:
    """BM25 term-frequency normalization (float64).

    Float association is pinned to ``(1-b) + (b*dl)/avgdl`` and
    ``tf / denom`` so the engine, the Python oracle, and the DuckDB
    oracle SQL produce bit-identical doubles (each replicates exactly
    this order of operations)."""
    tfs = tfs.astype(np.float64)
    denom = tfs + k1 * (1.0 - b + b * dls.astype(np.float64) / avgdl)
    return tfs / denom


def block_metadata(
    sorted_doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(last doc_id, max tf, min dl) per block.

    The BMW score bound for a block is ``idf * tf_norm(max_tf, min_dl)``
    — sound because tf_norm is increasing in tf and decreasing in dl —
    and is computed at query time when the global avgdl is known, so
    blocks can be encoded while corpus stats are still streaming."""
    n = sorted_doc_ids.size
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        return np.empty(0, dtype=np.uint64), e, e
    nblocks = (n + block_size - 1) // block_size
    last_doc = sorted_doc_ids[np.minimum(np.arange(1, nblocks + 1) * block_size, n) - 1].astype(
        np.uint64
    )
    idx = np.arange(0, n, block_size)
    max_tf = np.maximum.reduceat(np.asarray(tfs, dtype=np.int64), idx)
    min_dl = np.minimum.reduceat(np.asarray(dls, dtype=np.int64), idx)
    return last_doc, max_tf, min_dl
