"""Vectorized multi-group posting encoder.

A postings shard contains thousands of tiny (term, range) groups;
calling an encoder per group from ``map_groups`` pays Ray + Python
overhead per group (measured ~4ms/group — 87s for a 784-doc corpus).
Instead the merge stage receives ONE pyarrow Table per shard
(``groupby(shard).map_groups``) and this module encodes ALL groups in
a handful of numpy passes:

- one lexsort of all elements by (group, doc_id),
- one delta pass with per-group first-element fixup,
- one varbyte pass over the whole shard, sliced into per-group
  segments via the per-value byte sizes,
- block-max metadata via ``reduceat`` over globally-numbered blocks.

The only per-group Python work is slicing the encoded buffers
(memcpy-sized, no arithmetic).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codec import BLOCK_SIZE, varbyte_encode_with_sizes


def _slice_bytes(buf: np.ndarray, sizes: np.ndarray, el_starts: np.ndarray, n_el: int) -> list[bytes]:
    """Per-group byte segments of one big varbyte buffer."""
    byte_off = np.zeros(n_el + 1, dtype=np.int64)
    np.cumsum(sizes, out=byte_off[1:])
    group_lo = byte_off[el_starts]
    group_hi = np.append(byte_off[el_starts[1:]], byte_off[n_el])
    raw = buf.tobytes()
    return [raw[lo:hi] for lo, hi in zip(group_lo.tolist(), group_hi.tolist())]


def encode_posting_groups(
    gid: np.ndarray,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    *,
    block_size: int = BLOCK_SIZE,
    poss: np.ndarray | None = None,
) -> dict:
    """Encode many posting groups at once.

    Inputs are per-element arrays; ``gid`` is an int64 group label per
    element (need not be pre-sorted). Elements are sorted here by
    (gid, doc_id). Returns per-group columns plus flattened block
    metadata with offsets suitable for ``pa.ListArray.from_arrays``.

    ``poss`` (optional): flattened within-doc token positions, exactly
    ``tfs[i]`` ascending values per element ``i`` in the INPUT element
    order. When given, the result gains ``poss_enc``: per group, the
    positions of its (gid, doc_id)-sorted elements, delta-encoded
    within each element's run (first position raw) and varbyte-packed.
    """
    n = gid.size
    order = np.lexsort((doc_ids, gid))
    gid = gid[order]
    ids = doc_ids[order].astype(np.uint64)
    tf = tfs[order].astype(np.int64)
    dl = dls[order].astype(np.int64)

    el_starts = np.flatnonzero(np.diff(gid, prepend=gid[0] - 1))
    counts = np.diff(el_starts, append=n)
    n_groups = el_starts.size

    # delta encode doc ids with per-group first-element fixup
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=deltas[1:])
    deltas[el_starts] = ids[el_starts]

    ids_buf, ids_sz = varbyte_encode_with_sizes(deltas)
    tfs_buf, tfs_sz = varbyte_encode_with_sizes(tf.astype(np.uint64))
    dls_buf, dls_sz = varbyte_encode_with_sizes(dl.astype(np.uint64))

    poss_enc = None
    if poss is not None:
        # re-gather each element's position run into the sorted element
        # order (one vectorized segment gather), then delta within runs
        tfs_orig = np.asarray(tfs, dtype=np.int64)
        occ_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(tfs_orig, out=occ_off[1:])
        sizes = tfs_orig[order]
        total = int(sizes.sum())
        new_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(sizes, out=new_off[1:])
        gather = (
            np.repeat(occ_off[order] - new_off[:-1], sizes)
            + np.arange(total, dtype=np.int64)
        )
        p_sorted = np.asarray(poss, dtype=np.int64)[gather]
        p_delta = p_sorted.copy()
        p_delta[1:] -= p_sorted[:-1]
        seg_starts = new_off[:-1][sizes > 0]
        p_delta[seg_starts] = p_sorted[seg_starts]
        pos_buf, pos_sz = varbyte_encode_with_sizes(p_delta.astype(np.uint64))
        poss_enc = _slice_bytes(pos_buf, pos_sz, new_off[el_starts], total)

    # block metadata: globally numbered blocks of `block_size` per group
    pos = np.arange(n, dtype=np.int64) - np.repeat(el_starts, counts)
    nblocks = (counts + block_size - 1) // block_size
    blk_off = np.zeros(n_groups, dtype=np.int64)
    np.cumsum(nblocks[:-1], out=blk_off[1:])
    blk = pos // block_size + np.repeat(blk_off, counts)
    blk_starts = np.flatnonzero(np.diff(blk, prepend=-1))
    blk_max_tf = np.maximum.reduceat(tf, blk_starts)
    blk_min_dl = np.minimum.reduceat(dl, blk_starts)
    blk_last = ids[np.append(blk_starts[1:], n) - 1]
    blk_offsets = np.append(blk_off, int(nblocks.sum())).astype(np.int32)

    return {
        "order": order,
        "el_starts": el_starts,
        "poss_enc": poss_enc,
        "df": counts.astype(np.int64),
        "cf": np.add.reduceat(tf, el_starts).astype(np.int64),
        "doc_ids_enc": _slice_bytes(ids_buf, ids_sz, el_starts, n),
        "tfs_enc": _slice_bytes(tfs_buf, tfs_sz, el_starts, n),
        "dls_enc": _slice_bytes(dls_buf, dls_sz, el_starts, n),
        "block_last_doc": pa.ListArray.from_arrays(
            blk_offsets, pa.array(blk_last, pa.uint64())
        ),
        "block_max_tf": pa.ListArray.from_arrays(
            blk_offsets, pa.array(blk_max_tf, pa.int32())
        ),
        "block_min_dl": pa.ListArray.from_arrays(
            blk_offsets, pa.array(blk_min_dl, pa.int32())
        ),
    }
