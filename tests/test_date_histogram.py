"""date_histogram aggregation vs brute force over a stored
timestamp doc-value."""

import datetime as dt

import numpy as np
import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.query.dsl import run_query
from raybm25.query.engine import IndexReader

TS = [
    dt.datetime(2024, 1, 1, 5, 0),
    dt.datetime(2024, 1, 1, 23, 59),
    dt.datetime(2024, 1, 2, 0, 0),
    dt.datetime(2024, 1, 2, 12, 30),
    dt.datetime(2024, 1, 5, 8, 0),
    dt.datetime(2024, 1, 5, 9, 0),
]
TYPES = ["error", "error", "error", "signup", "error", "error"]
DAY = 86400000


@pytest.fixture(scope="module")
def rdr(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dh")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "event_id": list(range(len(TS))),
                "event_type": TYPES,
                "ts": pa.array(TS, pa.timestamp("us")),
            }
        ),
        str(tmp / "e.parquet"),
    )
    idx = str(tmp / "idx")
    build_index(
        str(tmp / "e.parquet"),
        idx,
        key_col="event_id",
        id_col="event_id",
        ts_col=None,
        text_cols=("event_type",),
        stored_cols=["event_type", "ts"],
        num_buckets=2,
    )
    return IndexReader(idx)


def test_date_histogram_vs_brute(rdr):
    rows = rdr.facet_date_histogram("error", "ts", DAY)
    want: dict[int, int] = {}
    for t, ty in zip(TS, TYPES):
        if ty != "error":
            continue
        ms = int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
        want[(ms // DAY) * DAY] = want.get((ms // DAY) * DAY, 0) + 1
    assert rows == sorted(want.items())
    assert sum(c for _, c in rows) == TYPES.count("error")


def test_date_histogram_hourly_and_empty(rdr):
    hourly = rdr.facet_date_histogram("error", "ts", 3600000)
    assert sum(c for _, c in hourly) == TYPES.count("error")
    assert len(hourly) >= len(rdr.facet_date_histogram("error", "ts", DAY))
    assert rdr.facet_date_histogram("nomatch", "ts", DAY) == []


def test_date_histogram_dsl(rdr):
    resp = run_query(
        rdr,
        {
            "query": {"match": {"event_type": "error"}},
            "aggs": {
                "per_day": {
                    "date_histogram": {
                        "field": "ts", "calendar_interval": "day"
                    }
                }
            },
        },
    )
    native = rdr.facet_date_histogram("error", "ts", DAY)
    assert [(b["key"], b["doc_count"]) for b in
            resp["aggregations"]["per_day"]["buckets"]] == native


def test_auto_date_histogram_ladder(rdr):
    # events span Jan 1 05:00 - Jan 5 09:00 = 9 half-day keys, 5 day
    # keys: a budget of 5 forces the day interval (12h needs 9)
    iv, rows = rdr.facet_auto_date_histogram("error", "ts", 5)
    assert iv == DAY
    assert rows == rdr.facet_date_histogram("error", "ts", DAY)
    iv_h, _ = rdr.facet_auto_date_histogram("error", "ts", 9)
    assert iv_h == DAY // 2
    # forcing fewer buckets climbs the ladder to weeks
    iv2, rows2 = rdr.facet_auto_date_histogram("error", "ts", 2)
    assert iv2 == 7 * DAY
    assert sum(c for _, c in rows2) == sum(c for _, c in rows)
    # a huge budget drops to fine intervals; bucket count respects it
    iv3, rows3 = rdr.facet_auto_date_histogram("error", "ts", 100000)
    assert iv3 < DAY and len(rows3) <= 100000
    # empty match set returns the finest interval and no buckets
    assert rdr.facet_auto_date_histogram("nomatch", "ts", 5) == (1000, [])


def test_auto_date_histogram_dsl(rdr):
    resp = run_query(
        rdr,
        {
            "query": {"match": {"event_type": "error"}},
            "size": 0,
            "aggs": {
                "auto": {"auto_date_histogram": {"field": "ts", "buckets": 3}}
            },
        },
    )
    a = resp["aggregations"]["auto"]
    iv, rows = rdr.facet_auto_date_histogram("error", "ts", 3)
    assert a["interval_ms"] == iv
    assert [(b["key"], b["doc_count"]) for b in a["buckets"]] == rows


def test_min_doc_count_zero_fills_gaps(rdr):
    resp = run_query(
        rdr,
        {
            "query": {"match": {"event_type": "error"}},
            "size": 0,
            "aggs": {
                "d": {
                    "date_histogram": {
                        "field": "ts",
                        "fixed_interval_ms": DAY,
                        "min_doc_count": 0,
                    }
                }
            },
        },
    )
    buckets = resp["aggregations"]["d"]["buckets"]
    keys = [b["key"] for b in buckets]
    # contiguous daily keys Jan 1 .. Jan 5 with Jan 3/4 empty
    assert keys == list(range(keys[0], keys[-1] + DAY, DAY))
    assert len(keys) == 5
    empty = [b for b in buckets if b["doc_count"] == 0]
    assert len(empty) == 2


def test_extended_bounds_widen(rdr):
    base = 1704067200000  # Jan 1
    resp = run_query(
        rdr,
        {
            "query": {"match": {"event_type": "error"}},
            "size": 0,
            "aggs": {
                "d": {
                    "date_histogram": {
                        "field": "ts",
                        "fixed_interval_ms": DAY,
                        "min_doc_count": 0,
                        "extended_bounds": {
                            "min": base - 2 * DAY,
                            "max": base + 6 * DAY,
                        },
                    }
                }
            },
        },
    )
    keys = [b["key"] for b in resp["aggregations"]["d"]["buckets"]]
    assert keys[0] == base - 2 * DAY and keys[-1] == base + 6 * DAY
    assert len(keys) == 9


def test_min_doc_count_threshold_drops(rdr):
    resp = run_query(
        rdr,
        {
            "query": {"match": {"event_type": "error"}},
            "size": 0,
            "aggs": {
                "d": {
                    "date_histogram": {
                        "field": "ts",
                        "fixed_interval_ms": DAY,
                        "min_doc_count": 2,
                    }
                }
            },
        },
    )
    assert all(
        b["doc_count"] >= 2 for b in resp["aggregations"]["d"]["buckets"]
    )
