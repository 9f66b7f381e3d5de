"""Differential fuzz of the aggregation DSL against DuckDB: hypothesis
draws a random match query plus a random agg spec (terms / histogram /
range / stats / single-metric / cardinality), and the engine's buckets
are checked against SQL computed over the same rows — independent of
both the engine internals and the contract's fixed oracle entries.

Aggs run over the query's candidate union (docs containing ANY query
term — the documented match-agg context), which the SQL reproduces
with a tokenized IN-list subquery using the contract's analyzer
expression."""

import math

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from raybm25.index.build import build_index
from raybm25.query.dsl import run_query
from raybm25.query.engine import IndexReader

DOCS = [
    "merge join stream fast",
    "merge sort slow path",
    "join stream window",
    "merge merge stream",
    "sort only here window",
    "merge join sort stream",
    "stream stream stream fast",
    "merge alone",
    "join merge stream extra window",
    "nothing relevant at all",
    "fast slow fast slow",
    "window merge window",
]
LANGS = ["en", "en", "de", "en", "fr", "en", "de", "en", "en", "fr", "de", "en"]
NS = [3, 7, 1, 9, 4, 6, 2, 8, 5, 0, 7, 3]
VOCAB = ["merge", "join", "stream", "sort", "fast", "slow", "window",
         "zzzmissing"]

MATCH_CTE = (
    "WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),"
    " '[a-z0-9]+')) AS term FROM fuzz),"
    " m AS (SELECT DISTINCT doc_id FROM toks WHERE term IN ({inlist})),"
    " md AS (SELECT fuzz.* FROM fuzz JOIN m USING(doc_id))"
)


@pytest.fixture(scope="module")
def env(ray_session, tmp_path_factory):
    import pyarrow.parquet as pq

    tmp = tmp_path_factory.mktemp("aggfuzz")
    df = pd.DataFrame(
        {"doc_id": range(len(DOCS)), "text": DOCS, "lang": LANGS, "n": NS}
    )
    pq.write_table(pa.Table.from_pandas(df), str(tmp / "d.parquet"))
    idx = str(tmp / "idx")
    build_index(
        str(tmp / "d.parquet"), idx, key_col="doc_id", id_col="doc_id",
        ts_col=None, text_cols=("text",), sayt_cols=(),
        keyword_cols=("lang",), stored_cols=["text", "lang", "n"],
        num_buckets=2,
    )
    con = duckdb.connect()
    con.register("fuzz", df)
    return IndexReader(idx), con


def _sql(con, query_terms, tail):
    inlist = ", ".join(f"'{t}'" for t in sorted(set(query_terms)))
    return con.execute(MATCH_CTE.format(inlist=inlist) + " " + tail).df()


def _run(rdr, query_terms, agg):
    body = {
        "size": 0,
        "query": {"match": {"text": " ".join(query_terms)}},
        "aggs": {"a": agg},
    }
    return run_query(rdr, body)["aggregations"]["a"]


terms_q = st.lists(st.sampled_from(VOCAB), min_size=1, max_size=3)


@settings(max_examples=30, deadline=None)
@given(q=terms_q)
def test_terms_agg_matches_sql(env, q):
    rdr, con = env
    got = _run(rdr, q, {"terms": {"field": "lang", "size": 10}})
    exp = _sql(
        con, q,
        "SELECT lang, count(*) AS c FROM md GROUP BY lang",
    )
    assert {b["key"]: b["doc_count"] for b in got["buckets"]} == dict(
        zip(exp["lang"], exp["c"].astype(int))
    )


@settings(max_examples=30, deadline=None)
@given(q=terms_q, interval=st.sampled_from([1, 2, 3, 5]))
def test_histogram_agg_matches_sql(env, q, interval):
    rdr, con = env
    got = _run(rdr, q, {"histogram": {"field": "n", "interval": interval}})
    exp = _sql(
        con, q,
        f"SELECT floor(n / {interval}) * {interval} AS b, count(*) AS c"
        " FROM md GROUP BY b",
    )
    assert {float(b["key"]): b["doc_count"] for b in got["buckets"]} == dict(
        zip(exp["b"].astype(float), exp["c"].astype(int))
    )


@settings(max_examples=30, deadline=None)
@given(
    q=terms_q,
    edges=st.lists(
        st.integers(min_value=0, max_value=10), min_size=2, max_size=4,
        unique=True,
    ).map(sorted),
)
def test_range_agg_matches_sql(env, q, edges):
    rdr, con = env
    ranges = [{"from": lo, "to": hi} for lo, hi in zip(edges, edges[1:])]
    ranges.append({"from": edges[-1]})  # open top
    got = _run(rdr, q, {"range": {"field": "n", "ranges": ranges}})
    for rg, bucket in zip(ranges, got["buckets"]):
        lo, hi = rg.get("from"), rg.get("to")
        conds = []
        if lo is not None:
            conds.append(f"n >= {lo}")
        if hi is not None:
            conds.append(f"n < {hi}")
        exp = _sql(
            con, q,
            "SELECT count(*) AS c FROM md WHERE " + " AND ".join(conds),
        )
        assert bucket["doc_count"] == int(exp["c"][0]), (rg, got)


@settings(max_examples=30, deadline=None)
@given(q=terms_q)
def test_stats_agg_matches_sql(env, q):
    rdr, con = env
    got = _run(rdr, q, {"stats": {"field": "n"}})
    exp = _sql(
        con, q,
        "SELECT count(*) AS c, min(n) AS mn, max(n) AS mx,"
        " CAST(sum(n) AS BIGINT) AS s FROM md",
    )
    c = int(exp["c"][0])
    assert got["count"] == c
    if c == 0:
        return
    assert got["min"] == exp["mn"][0]
    assert got["max"] == exp["mx"][0]
    assert got["sum"] == exp["s"][0]
    assert got["avg"] == pytest.approx(exp["s"][0] / c, rel=1e-12)


@settings(max_examples=30, deadline=None)
@given(q=terms_q, kind=st.sampled_from(["min", "max", "sum", "value_count", "avg"]))
def test_single_metric_matches_sql(env, q, kind):
    rdr, con = env
    got = _run(rdr, q, {kind: {"field": "n"}})["value"]
    fn = {"min": "min(n)", "max": "max(n)", "sum": "CAST(sum(n) AS BIGINT)",
          "value_count": "count(n)", "avg": "avg(n)"}[kind]
    exp = _sql(con, q, f"SELECT {fn} AS v, count(*) AS c FROM md")
    if int(exp["c"][0]) == 0:
        return  # engine's empty-set convention covered by stats test
    v = exp["v"][0]
    if kind == "avg":
        assert got == pytest.approx(float(v), rel=1e-12)
    else:
        assert got == v


@settings(max_examples=20, deadline=None)
@given(q=terms_q)
def test_cardinality_matches_sql(env, q):
    rdr, con = env
    got = _run(rdr, q, {"cardinality": {"field": "lang"}})["value"]
    exp = _sql(con, q, "SELECT count(DISTINCT lang) AS c FROM md")
    assert got == int(exp["c"][0])


@settings(max_examples=20, deadline=None)
@given(q=terms_q)
def test_extended_stats_matches_sql(env, q):
    rdr, con = env
    got = _run(rdr, q, {"extended_stats": {"field": "n"}})
    exp = _sql(
        con, q,
        "SELECT count(*) AS c, CAST(sum(n) AS BIGINT) AS s,"
        " CAST(sum(n * n) AS BIGINT) AS s2 FROM md",
    )
    c = int(exp["c"][0])
    assert got["count"] == c
    if c == 0:
        return
    s, s2 = int(exp["s"][0]), int(exp["s2"][0])
    assert got["sum_of_squares"] == s2
    var = s2 / c - (s / c) ** 2
    assert got["variance"] == pytest.approx(var, rel=1e-9, abs=1e-12)
    assert got["std_deviation"] == pytest.approx(
        math.sqrt(max(var, 0.0)), rel=1e-9, abs=1e-12
    )


@settings(max_examples=25, deadline=None)
@given(q=terms_q, interval=st.sampled_from([1, 2, 3, 5]),
       lag=st.integers(min_value=1, max_value=3),
       w=st.integers(min_value=1, max_value=4))
def test_pipeline_aggs_match_sql(env, q, interval, lag, w):
    rdr, con = env
    got = _run(rdr, q, {
        "histogram": {"field": "n", "interval": interval},
        "aggs": {
            "cum": {"cumulative_sum": {"buckets_path": "_count"}},
            "sd": {"serial_diff": {"buckets_path": "_count", "lag": lag}},
            "mv": {"moving_fn": {"buckets_path": "_count", "window": w,
                   "script": "MovingFunctions.unweightedAvg(values)"}},
            "pct": {"normalize": {"buckets_path": "_count",
                    "method": "percent_of_sum"}},
            "r2": {"bucket_script": {"buckets_path": {"c": "_count"},
                   "script": "params.c * 2"}},
        },
    })
    exp = _sql(
        con, q,
        f", b AS (SELECT floor(n / {interval}) * {interval} AS k,"
        " count(*) AS c FROM md GROUP BY k)"
        " SELECT k, c, CAST(sum(c) OVER (ORDER BY k) AS DOUBLE) AS cum,"
        f" CAST(c - lag(c, {lag}) OVER (ORDER BY k) AS DOUBLE) AS sd,"
        f" avg(c) OVER (ORDER BY k ROWS BETWEEN {w} PRECEDING"
        " AND 1 PRECEDING) AS mv,"
        " CAST(c AS DOUBLE) / sum(c) OVER () AS pct"
        " FROM b ORDER BY k",
    )
    buckets = got["buckets"]
    assert [float(b["key"]) for b in buckets] == exp["k"].astype(float).tolist()
    for i, b in enumerate(buckets):
        assert b["cum"]["value"] == pytest.approx(exp["cum"][i])
        assert b["r2"]["value"] == pytest.approx(2.0 * b["doc_count"])
        assert b["pct"]["value"] == pytest.approx(exp["pct"][i])
        if i >= lag:
            assert b["sd"]["value"] == pytest.approx(exp["sd"][i])
        else:
            assert "sd" not in b
        mv = b["mv"]["value"]
        if i == 0:
            assert mv is None and pd.isna(exp["mv"][i])
        else:
            assert mv == pytest.approx(exp["mv"][i])


@settings(max_examples=25, deadline=None)
@given(q=terms_q, key=st.sampled_from(["_key", "_count"]),
       asc=st.booleans(), mdc=st.integers(min_value=1, max_value=3),
       size=st.integers(min_value=1, max_value=5))
def test_terms_order_matches_sql(env, q, key, asc, mdc, size):
    rdr, con = env
    got = _run(rdr, q, {"terms": {
        "field": "lang", "size": size, "min_doc_count": mdc,
        "order": {key: "asc" if asc else "desc"}}})
    direction = "ASC" if asc else "DESC"
    order = (f"lang {direction}" if key == "_key"
             else f"c {direction}, lang ASC")
    exp = _sql(
        con, q,
        f"SELECT lang, count(*) AS c FROM md GROUP BY lang"
        f" HAVING count(*) >= {mdc} ORDER BY {order} LIMIT {size}",
    )
    assert [(b["key"], b["doc_count"]) for b in got["buckets"]] == list(
        zip(exp["lang"], exp["c"].astype(int))
    )


@settings(max_examples=20, deadline=None)
@given(q=terms_q)
def test_multi_terms_matches_sql(env, q):
    rdr, con = env
    got = _run(rdr, q, {"multi_terms": {
        "terms": [{"field": "lang"}, {"field": "n"}], "size": 100}})
    exp = _sql(
        con, q,
        "SELECT lang, CAST(n AS VARCHAR) AS n2, count(*) AS c FROM md"
        " GROUP BY lang, n2 ORDER BY c DESC, lang, n2",
    )
    assert [(tuple(b["key"]), b["doc_count"]) for b in got["buckets"]] == [
        ((la, n2), int(c)) for la, n2, c in
        zip(exp["lang"], exp["n2"], exp["c"])
    ]


@settings(max_examples=20, deadline=None)
@given(q=terms_q, pcts=st.lists(
    st.integers(min_value=0, max_value=100), min_size=1, max_size=4,
    unique=True).map(sorted))
def test_sibling_buckets_match_sql(env, q, pcts):
    import numpy as np

    rdr, con = env
    got = _run(rdr, q, {
        "histogram": {"field": "n", "interval": 2},
        "aggs": {},
    })
    body = {
        "size": 0,
        "query": {"match": {"text": " ".join(q)}},
        "aggs": {
            "h": {"histogram": {"field": "n", "interval": 2}},
            "st": {"stats_bucket": {"buckets_path": "h>_count"}},
            "pb": {"percentiles_bucket": {
                "buckets_path": "h>_count", "percents": pcts}},
        },
    }
    aggs = run_query(rdr, body)["aggregations"]
    counts = sorted(b["doc_count"] for b in aggs["h"]["buckets"])
    st_ = aggs["st"]
    assert st_["count"] == len(counts)
    assert st_["sum"] == float(sum(counts))
    if counts:
        for p in pcts:
            idx = int(np.floor(p / 100.0 * (len(counts) - 1) + 0.5))
            assert aggs["pb"]["values"][f"{float(p):g}"] == counts[idx]
