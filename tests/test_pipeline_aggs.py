"""Pipeline-aggregation family completion: metric sub-aggs under a
date_histogram (the time-series sum/avg idiom), bucket_script /
bucket_selector (painless-subset, params.* variables), serial_diff,
moving_fn (MovingFunctions built-ins), normalize, and the sibling
stats_bucket / extended_stats_bucket / percentiles_bucket — each
checked against brute-force arithmetic over the same fixture."""

import datetime as dt

import numpy as np
import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.query.dsl import run_query
from raybm25.query.script import compile_bucket_script

DAY = 86400000

# four daily buckets of 'error' events with a numeric value column
TS = [
    dt.datetime(2024, 1, 1, 5, 0),
    dt.datetime(2024, 1, 1, 9, 0),
    dt.datetime(2024, 1, 1, 23, 59),
    dt.datetime(2024, 1, 2, 0, 0),
    dt.datetime(2024, 1, 2, 12, 30),
    dt.datetime(2024, 1, 3, 8, 0),
    dt.datetime(2024, 1, 5, 8, 0),
    dt.datetime(2024, 1, 5, 9, 0),
]
TYPES = ["error"] * 6 + ["error", "signup"]
VALS = [2.0, 4.0, 6.0, 1.0, 3.0, 10.0, 7.0, 99.0]

# per-day (key, count, sum) over the error rows
DAYS = [
    (1704067200000, 3, 12.0),
    (1704153600000, 2, 4.0),
    (1704240000000, 1, 10.0),
    (1704412800000, 1, 7.0),
]


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pipeagg")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "event_id": list(range(len(TS))),
                "event_type": TYPES,
                "ts": pa.array(TS, pa.timestamp("us")),
                "value": VALS,
            }
        ),
        str(tmp / "e.parquet"),
    )
    out = str(tmp / "idx")
    build_index(
        str(tmp / "e.parquet"),
        out,
        key_col="event_id",
        id_col="event_id",
        ts_col=None,
        text_cols=("event_type",),
        stored_cols=["event_type", "ts", "value"],
        num_buckets=2,
    )
    return out


def _daily(idx, sub_aggs):
    body = {
        "query": {"match": {"event_type": {"query": "error"}}},
        "size": 0,
        "aggs": {
            "daily": {
                "date_histogram": {"field": "ts", "fixed_interval_ms": DAY},
                "aggs": sub_aggs,
            }
        },
    }
    return run_query(idx, body)["aggregations"]["daily"]["buckets"]


def test_metric_sub_aggs_per_bucket(idx):
    buckets = _daily(
        idx,
        {
            "vsum": {"sum": {"field": "value"}},
            "vavg": {"avg": {"field": "value"}},
            "vst": {"stats": {"field": "value"}},
            "vn": {"value_count": {"field": "value"}},
        },
    )
    assert [(b["key"], b["doc_count"]) for b in buckets] == [
        (k, n) for k, n, _ in DAYS
    ]
    for b, (_, n, s) in zip(buckets, DAYS):
        assert b["vsum"]["value"] == pytest.approx(s)
        assert b["vavg"]["value"] == pytest.approx(s / n)
        assert b["vn"]["value"] == n
        assert b["vst"]["count"] == n
        assert b["vst"]["sum"] == pytest.approx(s)


def test_bucket_script_and_selector(idx):
    buckets = _daily(
        idx,
        {
            "vsum": {"sum": {"field": "value"}},
            "ratio": {
                "bucket_script": {
                    "buckets_path": {"s": "vsum", "c": "_count"},
                    "script": "params.s / params.c",
                }
            },
            "keep": {
                "bucket_selector": {
                    "buckets_path": {"c": "_count"},
                    "script": "params.c >= 2 && params.c < 10",
                }
            },
        },
    )
    # selector keeps the two buckets with count 3 and 2
    assert [b["doc_count"] for b in buckets] == [3, 2]
    assert [b["ratio"]["value"] for b in buckets] == [
        pytest.approx(4.0),
        pytest.approx(2.0),
    ]


def test_serial_diff(idx):
    buckets = _daily(
        idx, {"sd": {"serial_diff": {"buckets_path": "_count", "lag": 2}}}
    )
    counts = [b["doc_count"] for b in buckets]
    for i, b in enumerate(buckets):
        if i < 2:
            assert "sd" not in b
        else:
            assert b["sd"]["value"] == pytest.approx(counts[i] - counts[i - 2])


def test_moving_fn_window_and_shift(idx):
    buckets = _daily(
        idx,
        {
            "vsum": {"sum": {"field": "value"}},
            "mv": {
                "moving_fn": {
                    "buckets_path": "vsum",
                    "window": 2,
                    "script": "MovingFunctions.unweightedAvg(values)",
                }
            },
            "mx": {
                "moving_fn": {
                    "buckets_path": "vsum",
                    "window": 2,
                    "shift": 1,  # window includes the current bucket
                    "script": "MovingFunctions.max(values)",
                }
            },
            "sdv": {
                "moving_fn": {
                    "buckets_path": "vsum",
                    "window": 3,
                    "script": (
                        "MovingFunctions.stdDev(values, "
                        "MovingFunctions.unweightedAvg(values))"
                    ),
                }
            },
        },
    )
    sums = [s for _, _, s in DAYS]
    for i, b in enumerate(buckets):
        win = sums[max(0, i - 2):i]
        assert b["mv"]["value"] == (
            pytest.approx(sum(win) / len(win)) if win else None
        )
        win_inc = sums[max(0, i - 1):i + 1]
        assert b["mx"]["value"] == pytest.approx(max(win_inc))
        win3 = sums[max(0, i - 3):i]
        if win3:
            mu = sum(win3) / len(win3)
            want = float(np.sqrt(sum((x - mu) ** 2 for x in win3) / len(win3)))
            assert b["sdv"]["value"] == pytest.approx(want)
        else:
            assert b["sdv"]["value"] is None


def test_normalize_methods(idx):
    methods = [
        "rescale_0_1",
        "rescale_0_100",
        "percent_of_sum",
        "mean",
        "z-score",
        "softmax",
    ]
    buckets = _daily(
        idx,
        {
            f"n{i}": {"normalize": {"buckets_path": "_count", "method": m}}
            for i, m in enumerate(methods)
        },
    )
    vs = np.array([b["doc_count"] for b in buckets], dtype=np.float64)
    span = vs.max() - vs.min()
    sd = float(np.sqrt(((vs - vs.mean()) ** 2).mean()))
    want = {
        "n0": (vs - vs.min()) / span,
        "n1": (vs - vs.min()) * 100 / span,
        "n2": vs / vs.sum(),
        "n3": (vs - vs.mean()) / span,
        "n4": (vs - vs.mean()) / sd,
        "n5": np.exp(vs) / np.exp(vs).sum(),
    }
    for key, w in want.items():
        got = [b[key]["value"] for b in buckets]
        assert got == pytest.approx(list(w))


def test_sibling_stats_and_percentiles(idx):
    body = {
        "query": {"match": {"event_type": {"query": "error"}}},
        "size": 0,
        "aggs": {
            "daily": {
                "date_histogram": {"field": "ts", "fixed_interval_ms": DAY},
                "aggs": {"vsum": {"sum": {"field": "value"}}},
            },
            "st": {"stats_bucket": {"buckets_path": "daily>vsum"}},
            "xst": {
                "extended_stats_bucket": {"buckets_path": "daily>vsum"}
            },
            "pb": {
                "percentiles_bucket": {
                    "buckets_path": "daily>_count",
                    "percents": [0, 50, 100],
                }
            },
        },
    }
    aggs = run_query(idx, body)["aggregations"]
    sums = [s for _, _, s in DAYS]
    st = aggs["st"]
    assert st["count"] == len(sums)
    assert st["sum"] == pytest.approx(sum(sums))
    assert st["min"] == min(sums) and st["max"] == max(sums)
    xst = aggs["xst"]
    mu = sum(sums) / len(sums)
    var = sum(v * v for v in sums) / len(sums) - mu * mu
    assert xst["variance"] == pytest.approx(var)
    assert xst["std_deviation"] == pytest.approx(var**0.5)
    counts = sorted(n for _, n, _ in DAYS)
    pb = aggs["pb"]["values"]
    assert pb["0"] == counts[0]
    assert pb["100"] == counts[-1]
    # nearest-rank: round(0.5 * 3) = 2
    assert pb["50"] == counts[2]


@pytest.mark.parametrize(
    "src",
    [
        "__import__('os').system('true')",
        "params.c ** 2",
        "open('/etc/passwd')",
        "params.c if params.c else 0",
        "params.c; params.c",
        "[x for x in (1,)]",
        "params.__class__",
    ],
)
def test_bucket_script_rejects_unsafe(src):
    with pytest.raises(ValueError):
        compile_bucket_script(src)


def test_bucket_script_requires_mapped_params(idx):
    with pytest.raises(ValueError, match="absent from buckets_path"):
        _daily(
            idx,
            {
                "bad": {
                    "bucket_script": {
                        "buckets_path": {"c": "_count"},
                        "script": "params.c + params.missing",
                    }
                }
            },
        )
