import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from raybm25 import BM25_K1, BM25_B
from raybm25.codec import (
    BLOCK_SIZE,
    block_metadata,
    decode_doc_ids,
    delta_decode,
    delta_encode,
    encode_doc_ids,
    tf_norm,
    varbyte_decode,
    varbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert varbyte_decode(varbyte_encode(arr)).tolist() == vals


def test_varbyte_known_bytes():
    # 0 -> 0x00; 127 -> 0x7f; 128 -> 0x80 0x01 (LEB128 little-endian)
    assert varbyte_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varbyte_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varbyte_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varbyte_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"


@given(st.lists(st.integers(min_value=0, max_value=2**63), max_size=200, unique=True))
@settings(max_examples=100, deadline=None)
def test_docid_delta_roundtrip(vals):
    arr = np.sort(np.array(vals, dtype=np.uint64))
    assert decode_doc_ids(encode_doc_ids(arr)).tolist() == arr.tolist()


def test_delta_identity():
    arr = np.array([5, 6, 100, 2**40], dtype=np.uint64)
    assert delta_decode(delta_encode(arr)).tolist() == arr.tolist()


def test_block_metadata():
    n = 300
    ids = np.arange(10, 10 + n, dtype=np.uint64)
    tfs = np.ones(n, dtype=np.int64)
    tfs[200] = 50
    dls = np.full(n, 20, dtype=np.int64)
    dls[5] = 3
    last, max_tf, min_dl = block_metadata(ids, tfs, dls)
    assert last.tolist() == [10 + BLOCK_SIZE - 1, 10 + 2 * BLOCK_SIZE - 1, 10 + n - 1]
    assert max_tf.tolist() == [1, 50, 1]
    assert min_dl.tolist() == [3, 20, 20]
    # the query-time bound norm(max_tf, min_dl) dominates every member
    for blk, (mt, md) in enumerate(zip(max_tf, min_dl)):
        s, e = blk * BLOCK_SIZE, min((blk + 1) * BLOCK_SIZE, n)
        bound = tf_norm(np.array([mt]), np.array([md]), BM25_K1, BM25_B, 20.0)[0]
        member = tf_norm(tfs[s:e], dls[s:e], BM25_K1, BM25_B, 20.0)
        assert (member <= bound + 1e-15).all()


def test_multi_group_encoder_matches_single_group_path():
    """encode_posting_groups must agree with the per-group reference
    codec (delta+varbyte + block metadata) for every group."""
    import numpy as np
    from raybm25.codec import encode_doc_ids, varbyte_encode, block_metadata
    from raybm25.index.encode import encode_posting_groups

    rng = np.random.default_rng(3)
    gid, ids, tfs, dls = [], [], [], []
    for g in range(7):
        n = int(rng.integers(1, 400))
        gid += [g] * n
        ids.append(rng.choice(2**40, size=n, replace=False))
        tfs.append(rng.integers(1, 50, size=n))
        dls.append(rng.integers(1, 500, size=n))
    gid = np.array(gid, dtype=np.int64)
    ids = np.concatenate(ids).astype(np.uint64)
    tfs = np.concatenate(tfs).astype(np.int64)
    dls = np.concatenate(dls).astype(np.int64)
    enc = encode_posting_groups(gid, ids, tfs, dls)

    last = enc["block_last_doc"].to_pylist()
    bmax_tf = enc["block_max_tf"].to_pylist()
    bmin_dl = enc["block_min_dl"].to_pylist()
    for g in range(7):
        o = np.argsort(ids[gid == g])
        sids = ids[gid == g][o]
        stfs = tfs[gid == g][o]
        sdls = dls[gid == g][o]
        assert enc["doc_ids_enc"][g] == encode_doc_ids(sids)
        assert enc["tfs_enc"][g] == varbyte_encode(stfs.astype(np.uint64))
        assert enc["dls_enc"][g] == varbyte_encode(sdls.astype(np.uint64))
        bl, btf, bdl = block_metadata(sids, stfs, sdls)
        assert last[g] == bl.tolist()
        assert bmax_tf[g] == btf.tolist()
        assert bmin_dl[g] == bdl.tolist()
        assert enc["df"][g] == sids.size
        assert enc["cf"][g] == stfs.sum()
