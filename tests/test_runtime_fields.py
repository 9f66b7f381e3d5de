"""Runtime fields (runtime_mappings): script-computed doc values in
sorts and metric aggs, vs brute force; script-safety gates."""

import numpy as np
import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.query.dsl import run_query

N = [5, 12, 7, 30, 1, 22]


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("rtf")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(N))),
                "text": ["common doc"] * len(N),
                "a": N,
                "b": [x * 10 for x in N],
            }
        ),
        str(tmp / "d.parquet"),
    )
    out = str(tmp / "idx")
    build_index(
        str(tmp / "d.parquet"),
        out,
        key_col="doc_id",
        id_col="doc_id",
        ts_col=None,
        text_cols=("text",),
        stored_cols=["text", "a", "b"],
        num_buckets=2,
    )
    return out


RT = {
    "combo": {
        "type": "double",
        "script": {"source": "doc['b'].value - doc['a'].value * 2"},
    }
}


def test_sort_by_runtime_field(idx):
    resp = run_query(
        idx,
        {
            "query": {"match": {"text": {"query": "common"}}},
            "runtime_mappings": RT,
            "sort": [{"combo": {"order": "asc"}}],
            "size": 10,
        },
    )
    combo = [b * 10 - b * 2 for b in N]  # = 8a
    want = sorted(zip(combo, range(len(N))))
    got = [(h["sort"][0], h["_id"]) for h in resp["hits"]["hits"]]
    assert got == [(float(v), d) for v, d in want]


def test_metric_aggs_over_runtime_field(idx):
    resp = run_query(
        idx,
        {
            "query": {"match": {"text": {"query": "common"}}},
            "runtime_mappings": RT,
            "size": 0,
            "aggs": {
                "st": {"stats": {"field": "combo"}},
                "mx": {"max": {"field": "combo"}},
                "vc": {"value_count": {"field": "combo"}},
            },
        },
    )
    combo = [8 * x for x in N]
    st = resp["aggregations"]["st"]
    assert st["count"] == len(N)
    assert st["min"] == min(combo) and st["max"] == max(combo)
    assert st["sum"] == sum(combo)
    assert resp["aggregations"]["mx"]["value"] == max(combo)
    assert resp["aggregations"]["vc"]["value"] == len(N)


def test_runtime_script_safety(idx):
    for bad in (
        "__import__('os')",
        "doc['a'].value ** 2",
        "open('/etc/passwd')",
    ):
        with pytest.raises(ValueError):
            run_query(
                idx,
                {
                    "query": {"match": {"text": {"query": "common"}}},
                    "runtime_mappings": {
                        "x": {"type": "double", "script": {"source": bad}}
                    },
                    "sort": [{"x": "asc"}],
                },
            )
    with pytest.raises(ValueError, match="double/long"):
        run_query(
            idx,
            {
                "query": {"match": {"text": {"query": "common"}}},
                "runtime_mappings": {
                    "x": {"type": "keyword", "script": {"source": "1"}}
                },
                "size": 0,
            },
        )
