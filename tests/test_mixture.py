"""Domain-mixture sampling: rate semantics, determinism under
re-partitioning, validation."""

import numpy as np
import pyarrow as pa
import pytest

from raybm25.extras.mixture import mixture_sample


def _ds(n=400):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": list(range(n)),
                "source": [f"s{i % 4}" for i in range(n)],
            }
        )
    )


def test_rate_extremes_and_default(ray_session):
    out = mixture_sample(
        _ds(), {"s0": 1.0, "s1": 0.0}, default_rate=0.5
    ).to_pandas()
    by = out.groupby("source").size().to_dict()
    assert by.get("s0") == 100  # rate 1.0 keeps every doc
    assert "s1" not in by  # rate 0.0 keeps none
    # default applies to unlisted groups; hash split is ~50%
    assert 25 <= by.get("s2", 0) <= 75
    assert 25 <= by.get("s3", 0) <= 75


def test_partition_independence(ray_session):
    rates = {"s0": 0.7, "s1": 0.3, "s2": 0.9, "s3": 0.1}
    a = mixture_sample(_ds(), rates).to_pandas().sort_values("doc_id")
    b = (
        mixture_sample(_ds().repartition(7), rates)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert a["doc_id"].tolist() == b["doc_id"].tolist()


def test_quantization_matches_hash_rule(ray_session):
    from raybm25.extras.textstats import poly_token_hashes

    out = mixture_sample(_ds(), {"s0": 0.25}, default_rate=0.0).to_pandas()
    h = poly_token_hashes([str(i) for i in range(400)])
    keys = ((h * np.uint64(11400714819323198485)) >> np.uint64(32)) % np.uint64(10000)
    want = [
        i for i in range(400) if i % 4 == 0 and keys[i] < 2500
    ]
    assert sorted(out["doc_id"].tolist()) == want


def test_rate_validation(ray_session):
    with pytest.raises(ValueError, match="rate for 's0'"):
        mixture_sample(_ds(), {"s0": 1.5})
    with pytest.raises(ValueError, match="<default>"):
        mixture_sample(_ds(), {}, default_rate=-0.1)


def test_host_cap_keeps_lowest_ids(ray_session):
    import ray.data

    from raybm25.extras.mixture import host_cap, host_cap_losers

    rows = [
        {"doc_id": i, "source": f"h{i % 3}"} for i in range(12)
    ]  # 4 docs per host
    ds = ray.data.from_items(rows)
    out = host_cap(ds, cap=2).to_pandas().sort_values("doc_id")
    # survivors: the 2 lowest ids per host -> ids 0..5
    assert out["doc_id"].tolist() == [0, 1, 2, 3, 4, 5]
    losers = host_cap_losers(ds, 2).to_pandas()
    assert sorted(losers["doc_id"].tolist()) == [6, 7, 8, 9, 10, 11]


def test_host_cap_partition_independent(ray_session):
    import ray.data

    from raybm25.extras.mixture import host_cap

    rows = [{"doc_id": i, "source": f"h{i % 5}"} for i in range(40)]
    a = host_cap(ray.data.from_items(rows), cap=3).to_pandas()
    b = host_cap(
        ray.data.from_items(rows).repartition(7), cap=3
    ).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    # cap larger than any group: everything survives
    c = host_cap(ray.data.from_items(rows), cap=100).to_pandas()
    assert len(c) == 40
