"""Domain-mixture sampling for training data: per-group acceptance
rates over a content-independent id hash.

Pretraining mixes are specified as per-domain sampling rates ("keep
100% of wiki, 30% of web, 5% of logs").  Each doc's keep/drop decision
is ``hash(id) % granularity < rate * granularity`` — deterministic,
order-independent, restart-stable, and identical no matter how the
dataset is partitioned, so a resumed or re-sharded run selects the
SAME subset.  The hash is the SQL-expressible polynomial digit hash
shared with the deterministic-sample/shuffle operators
(``textstats.poly_token_hashes``), so an external system can reproduce
the selection exactly.

One stateless vectorized ``map_batches`` pass; the rate table is a
tiny dict captured in the stage closure (broadcast once per worker,
not per batch).  No shuffle: at 100 TB this is a pure streaming
filter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .textstats import poly_token_hashes

__all__ = ["mixture_sample", "host_cap", "host_cap_losers"]

_MIX = np.uint64(11400714819323198485)  # 2^64 / golden ratio, odd


def mixture_sample(
    source,
    rates: dict[str, float],
    *,
    id_col: str = "doc_id",
    group_col: str = "source",
    default_rate: float = 0.0,
    granularity: int = 10000,
    columns: list[str] | None = None,
):
    """Filter a dataset to a target domain mixture.

    ``rates`` maps group value -> keep probability in [0, 1]; groups
    absent from the map use ``default_rate``.  Rates quantize to
    ``granularity`` steps (rate 0.3051 at granularity 10000 keeps ids
    with hash%10000 < 3051).  Returns the filtered Dataset with the
    input's columns.
    """
    import ray.data

    for g, r in {**rates, "<default>": default_rate}.items():
        if not 0.0 <= float(r) <= 1.0:
            raise ValueError(f"rate for {g!r} must be in [0, 1], got {r}")
    thresholds = {
        str(g): int(round(float(r) * granularity)) for g, r in rates.items()
    }
    default_thr = int(round(float(default_rate) * granularity))
    gran = np.uint64(granularity)

    if isinstance(source, ray.data.Dataset):
        ds = source
    else:
        ds = ray.data.read_parquet(source, columns=columns)

    def _keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        # the digit hash is low-bit biased for short ids; one
        # multiplicative mix (Fibonacci constant, wrapping uint64) and
        # the HIGH 32 bits give a uniform sampling key — and both
        # steps stay expressible in HUGEINT SQL
        h = poly_token_hashes([str(i) for i in ids])
        keys = ((h * _MIX) >> np.uint64(32)) % gran
        groups = np.asarray(
            [str(v) for v in batch.column(group_col).to_pylist()]
        )
        uniq, inv = np.unique(groups, return_inverse=True)
        thr_by_uniq = np.array(
            [thresholds.get(u, default_thr) for u in uniq], dtype=np.uint64
        )
        return batch.filter(pa.array(keys < thr_by_uniq[inv]))

    return ds.map_batches(_keep, batch_format="pyarrow")


def _cap_losers_in_bucket(cap: int):
    import pandas as pd

    def _losers(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["__grp", "doc_id"], kind="mergesort")
        rank = g.groupby("__grp", sort=False).cumcount()
        return g.loc[rank >= cap, ["doc_id"]].astype({"doc_id": "int64"})

    _losers.__name__ = "host_cap_losers"
    return _losers


def host_cap_losers(ds, cap: int, group_col: str = "source",
                    id_col: str = "doc_id", num_buckets: int = 256):
    """doc_ids EXCEEDING the per-group cap (survivors = the ``cap``
    smallest ids of each group — deterministic, partition-independent).
    Keys-only shuffle: (id, group) rows bucketed by a coarse group
    hash, one vectorized rank pass per bucket — the exact_dedup
    discipline (extras/dedup.exact_dedup_losers), so at 100 TB only
    ~(8 + group bytes)/doc crosses the exchange and the per-group cap
    never needs the doc bodies."""

    from ..hashing import hash64

    def _keys(batch: pa.Table) -> pa.Table:
        grp = batch.column(group_col).cast(pa.string())
        g = grp.to_numpy(zero_copy_only=False)
        hb = (hash64(g) % np.uint64(num_buckets)).astype(np.int32)
        return pa.table(
            {
                "doc_id": batch.column(id_col).cast(pa.int64()),
                "__grp": grp,
                "__hb": pa.array(hb, pa.int32()),
            }
        )

    keys = ds.map_batches(_keys, batch_format="pyarrow")
    return keys.groupby("__hb").map_groups(
        _cap_losers_in_bucket(int(cap)), batch_format="pandas"
    )


def host_cap(ds, cap: int, group_col: str = "source", id_col: str = "doc_id"):
    """Cap a Dataset at ``cap`` docs per group (host/domain/source) —
    the crawl-pipeline step that stops one giant host from dominating
    a pretraining mix.  Survivors = the ``cap`` lowest ids per group;
    the loser set is broadcast once (``ray.put``) and the survivors
    stream out of the source unchanged (anti-join filter)."""
    import pandas as pd
    import ray

    losers = host_cap_losers(ds, cap, group_col, id_col).to_pandas()
    if "doc_id" not in losers.columns:
        losers = pd.DataFrame({"doc_id": pd.array([], dtype="int64")})
    loser_arr = np.sort(losers["doc_id"].to_numpy().astype(np.int64))
    loser_ref = ray.put(loser_arr)

    def drop(batch: pa.Table) -> pa.Table:
        dead = ray.get(loser_ref)
        ids = batch.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(~np.isin(ids, dead)))

    return ds.map_batches(drop, batch_format="pyarrow")
