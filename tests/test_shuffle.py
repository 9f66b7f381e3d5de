"""Deterministic distributed shuffle (extras/shuffle): splitmix64
reference values, reproducibility, permutation properties."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from raybm25.extras.shuffle import deterministic_shuffle, shuffle_key, splitmix64


def _splitmix64_scalar(x: int) -> int:
    """Scalar reference (Steele et al. constants, pure Python ints)."""
    M = (1 << 64) - 1
    h = x & M
    h ^= h >> 30
    h = (h * 0xBF58476D1CE4E5B9) & M
    h ^= h >> 27
    h = (h * 0x94D049BB133111EB) & M
    h ^= h >> 31
    return h


def test_splitmix64_matches_scalar_reference():
    xs = np.array(
        [0, 1, 42, 2**63, 2**64 - 1, 0x9E3779B97F4A7C15, 123456789],
        dtype=np.uint64,
    )
    got = splitmix64(xs)
    for x, g in zip(xs.tolist(), got.tolist()):
        assert int(g) == _splitmix64_scalar(int(x)), hex(int(x))
    # sanity: the finalizer avalanche flips about half the bits
    flips = bin(int(got[0]) ^ int(got[1])).count("1")
    assert 16 <= flips <= 48


def test_shuffle_key_deterministic_and_seed_sensitive():
    ids = np.arange(1000, dtype=np.uint64)
    a = shuffle_key(ids, 7)
    assert np.array_equal(a, shuffle_key(ids, 7))
    assert not np.array_equal(a, shuffle_key(ids, 8))
    assert len(np.unique(a)) == len(ids)  # injective on this range
    assert a.dtype == np.int64


def test_deterministic_shuffle_is_stable_permutation(ray_session):
    tbl = pa.table(
        {"doc_id": pa.array(range(200), pa.int64()),
         "text": [f"t{i}" for i in range(200)]}
    )
    out1 = deterministic_shuffle(ray.data.from_arrow(tbl), seed=3).to_pandas()
    out2 = deterministic_shuffle(
        ray.data.from_arrow(tbl).repartition(7), seed=3
    ).to_pandas()
    # permutation of the input, same order regardless of block layout
    assert sorted(out1.doc_id) == list(range(200))
    assert list(out1.doc_id) == list(out2.doc_id)
    assert list(out1.doc_id) != list(range(200))  # actually shuffled
    assert "_shuffle_key" not in out1.columns
    # rows stay aligned with their ids
    assert (out1.text == out1.doc_id.map(lambda i: f"t{i}")).all()
    out3 = deterministic_shuffle(ray.data.from_arrow(tbl), seed=4).to_pandas()
    assert list(out3.doc_id) != list(out1.doc_id)
