"""HyperLogLog sketch: accuracy, merge associativity, determinism."""

import numpy as np
import pyarrow as pa

from raybm25.extras.sketch import (
    DEFAULT_P,
    HLLBatchStage,
    approx_distinct,
    hll_add_hashed,
    hll_empty,
    hll_estimate,
    hll_merge,
)
from raybm25.hashing import hash64


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(0)
    for true_n in (100, 5_000, 200_000):
        keys = np.array([f"k{i}" for i in range(true_n)], dtype=object)
        h = hash64(keys)
        reg = hll_empty()
        hll_add_hashed(reg, h, DEFAULT_P)
        est = hll_estimate(reg)
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)
        # split-merge == single-pass (associativity of register max)
        a, b = hll_empty(), hll_empty()
        cut = true_n // 3
        hll_add_hashed(a, h[:cut], DEFAULT_P)
        hll_add_hashed(b, h[cut:], DEFAULT_P)
        assert (hll_merge(a, b) == reg).all()
        # duplicates never change the sketch
        reg2 = reg.copy()
        hll_add_hashed(reg2, h[: true_n // 2], DEFAULT_P)
        assert (reg2 == reg).all()


def test_hll_batch_stage_and_dataset(ray_session):
    import ray.data

    n, dups = 3000, 3
    tbl = pa.table({"user_id": pa.array(list(range(n)) * dups, pa.int64())})
    ds = ray.data.from_arrow(tbl).repartition(8)
    est = approx_distinct(ds, "user_id")
    assert abs(est - n) / n < 0.05
    # stage emits one fixed-size register row per batch
    out = HLLBatchStage("user_id")(tbl)
    assert out.num_rows == 1 and len(out.column("registers")[0].as_py()) == 1 << DEFAULT_P
