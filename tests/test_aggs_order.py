"""terms-agg ordering (_key / _count / sub-metric), min_doc_count,
and the sampler aggregation, vs brute force."""

import numpy as np
import pyarrow as pa
import pytest

from raybm25.query.dsl import run_query
from raybm25.index.build import build_index
from raybm25.query.engine import IndexReader

# lang -> (n docs, n_chars values); every doc matches 'word'
LANGS = {
    "aa": [10, 20, 30],          # avg 20
    "bb": [100],                 # avg 100 (below min_doc_count 2)
    "cc": [40, 40],              # avg 40
    "dd": [5, 5, 5, 5],          # avg 5
}


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("aord")
    import pyarrow.parquet as pq

    rows = []
    i = 0
    for lang, chars in LANGS.items():
        for c in chars:
            rows.append((i, f"word number {i}", lang, c))
            i += 1
    pq.write_table(
        pa.table(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "lang": [r[2] for r in rows],
                "n_chars": [r[3] for r in rows],
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
        keyword_cols=("lang",),
        stored_cols=["text", "lang", "n_chars"],
        num_buckets=2,
    )
    return out


def _terms(idx, spec, sub=None):
    body = {
        "query": {"match": {"text": {"query": "word"}}},
        "size": 0,
        "aggs": {"t": {"terms": spec, **({"aggs": sub} if sub else {})}},
    }
    return run_query(idx, body)["aggregations"]["t"]["buckets"]


def test_key_order_asc_desc(idx):
    asc = _terms(idx, {"field": "lang", "order": {"_key": "asc"}, "size": 10})
    assert [b["key"] for b in asc] == sorted(LANGS)
    desc = _terms(idx, {"field": "lang", "order": {"_key": "desc"}, "size": 10})
    assert [b["key"] for b in desc] == sorted(LANGS, reverse=True)


def test_count_order_asc(idx):
    asc = _terms(idx, {"field": "lang", "order": {"_count": "asc"}, "size": 10})
    assert [b["key"] for b in asc] == ["bb", "cc", "aa", "dd"]


def test_min_doc_count(idx):
    got = _terms(idx, {"field": "lang", "min_doc_count": 2, "size": 10})
    assert sorted(b["key"] for b in got) == ["aa", "cc", "dd"]


def test_order_by_sub_metric(idx):
    got = _terms(
        idx,
        {"field": "lang", "order": {"m": "desc"}, "size": 3},
        sub={"m": {"avg": {"field": "n_chars"}}},
    )
    # avgs: bb 100, cc 40, aa 20, dd 5 -> top 3 desc
    assert [(b["key"], b["m"]["value"]) for b in got] == [
        ("bb", 100.0),
        ("cc", 40.0),
        ("aa", 20.0),
    ]
    got = _terms(
        idx,
        {"field": "lang", "order": {"m": "asc"}, "size": 2},
        sub={"m": {"sum": {"field": "n_chars"}}},
    )
    # sums: dd 20, aa 60, cc 80, bb 100
    assert [b["key"] for b in got] == ["dd", "aa"]


def test_sampler_sub_agg(idx):
    body = {
        "query": {"match": {"text": {"query": "word"}}},
        "size": 0,
        "aggs": {
            "s": {
                "sampler": {"shard_size": 4},
                "aggs": {"l": {"terms": {"field": "lang", "size": 10}}},
            }
        },
    }
    s = run_query(idx, body)["aggregations"]["s"]
    assert s["doc_count"] == 4
    # the sample is the 4 best-scoring docs; reproduce it via search
    r = IndexReader(idx)
    top = [d for d, _ in r.search_pruned("word", 4)]
    tbl = r.get_docs(np.array(top, dtype=np.uint64))
    from collections import Counter

    want = Counter(str(v) for v in tbl.column("lang").to_pylist())
    got = {b["key"]: b["doc_count"] for b in s["l"]["buckets"]}
    assert got == dict(want)
    assert sum(got.values()) == 4


def test_filters_other_bucket(idx):
    body = {
        "query": {"match": {"text": {"query": "word"}}},
        "size": 0,
        "aggs": {
            "f": {
                "filters": {
                    "filters": {
                        "a": {"term": {"lang": "aa"}},
                        "b": {"term": {"lang": "bb"}},
                    },
                    "other_bucket": True,
                    "other_bucket_key": "rest",
                }
            }
        },
    }
    b = run_query(idx, body)["aggregations"]["f"]["buckets"]
    n = {k: len(v) for k, v in LANGS.items()}
    assert b["a"]["doc_count"] == n["aa"]
    assert b["b"]["doc_count"] == n["bb"]
    assert b["rest"]["doc_count"] == n["cc"] + n["dd"]
