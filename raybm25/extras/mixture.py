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

__all__ = ["mixture_sample"]

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
