"""Aggregations over match queries (range / histogram / stats /
cardinality) against brute force computed in-test. Reference behavior:
OpenSearch aggs.{range,histogram,stats,cardinality}."""

import re

import numpy as np
import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.query.engine import IndexReader

TOK = re.compile(r"[a-z0-9]+")

DOCS = [
    ("alpha beta", "en", 10),
    ("beta gamma", "de", 250),
    ("alpha gamma delta", "en", 250),
    ("delta only", "fr", 400),
    ("alpha alpha", "en", 999),
    ("nothing here", "de", 50),
]


@pytest.fixture(scope="module")
def rdr(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("aggs")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(DOCS))),
                "text": [t for t, _, _ in DOCS],
                "lang": [l for _, l, _ in DOCS],
                "size": [s for _, _, s in DOCS],
            }
        ),
        str(tmp / "d.parquet"),
    )
    idx = str(tmp / "idx")
    build_index(str(tmp / "d.parquet"), idx, key_col="doc_id", id_col="doc_id",
                ts_col=None, keyword_cols=("lang",),
                stored_cols=["text", "lang", "size"], num_buckets=2)
    return IndexReader(idx)


def _match(query):
    terms = set(TOK.findall(query.lower()))
    return [i for i, (t, _, _) in enumerate(DOCS)
            if set(TOK.findall(t.lower())) & terms]


def test_facet_ranges(rdr):
    got = rdr.facet_ranges("alpha gamma", "size",
                           [(None, 100), (100, 300), (300, None), (0, 1000)])
    sizes = [DOCS[i][2] for i in _match("alpha gamma")]
    assert got == [
        (None, 100, sum(s < 100 for s in sizes)),
        (100, 300, sum(100 <= s < 300 for s in sizes)),
        (300, None, sum(s >= 300 for s in sizes)),
        (0, 1000, len(sizes)),  # overlapping bucket counts independently
    ]


def test_facet_ranges_no_match(rdr):
    assert rdr.facet_ranges("zz", "size", [(None, 100), (100, None)]) == [
        (None, 100, 0), (100, None, 0)
    ]


def test_facet_histogram(rdr):
    got = rdr.facet_histogram("alpha gamma delta", "size", 100.0)
    sizes = [DOCS[i][2] for i in _match("alpha gamma delta")]
    want = {}
    for s in sizes:
        b = float(np.floor(s / 100.0) * 100)
        want[b] = want.get(b, 0) + 1
    assert dict(got) == want
    assert [b for b, _ in got] == sorted(b for b, _ in got)
    assert rdr.facet_histogram("zz", "size", 100.0) == []


def test_stats_agg(rdr):
    s = rdr.stats_agg("beta delta", "size")
    sizes = [DOCS[i][2] for i in _match("beta delta")]
    assert s == {
        "count": len(sizes), "min": min(sizes), "max": max(sizes),
        "sum": sum(sizes), "avg": float(sum(sizes)) / len(sizes),
    }
    empty = rdr.stats_agg("zz", "size")
    assert empty == {"count": 0, "min": None, "max": None, "sum": 0, "avg": None}


def test_cardinality_agg(rdr):
    langs = {DOCS[i][1] for i in _match("alpha beta")}
    assert rdr.cardinality_agg("alpha beta", "lang") == len(langs)
    # numeric field cardinality
    sizes = {DOCS[i][2] for i in _match("alpha gamma")}
    assert rdr.cardinality_agg("alpha gamma", "size") == len(sizes)
    assert rdr.cardinality_agg("zz", "lang") == 0


def test_gather_column_preserves_numeric_dtype(rdr):
    cand = rdr._match_ordinals("alpha", None)
    vals = rdr._gather_column(cand, "size")
    assert vals.dtype == np.int64


def test_composite_pagination(rdr):
    r = rdr
    full = r.facet_composite("alpha", "lang", size=100)
    # paging through with after reproduces the full key-ordered list
    paged, after = [], None
    while True:
        page = r.facet_composite("alpha", "lang", size=1, after=after)
        if not page:
            break
        paged.extend(page)
        after = page[-1][0]
    assert paged == full
    assert [k for k, _ in full] == sorted(k for k, _ in full)


def test_composite_multi_pagination(rdr):
    """Multi-source composite: paging with the after tuple reproduces
    the full lexicographic compound-key list exactly once; bucket
    counts sum to the match count; histogram keys are floored."""
    r = rdr
    srcs = [
        ("lang", "terms", {"field": "lang"}),
        ("sz", "histogram", {"field": "size", "interval": 10}),
    ]
    full = r.facet_composite_multi("alpha", srcs, size=1000)
    assert [k for k, _ in full] == sorted(k for k, _ in full)
    assert all(float(k[1]) % 10 == 0 for k, _ in full)
    assert sum(c for _, c in full) == r._match_ordinals("alpha", None).size
    paged, after = [], None
    while True:
        page = r.facet_composite_multi("alpha", srcs, size=2, after=after)
        if not page:
            break
        paged.extend(page)
        after = page[-1][0]
    assert paged == full
    with pytest.raises(ValueError, match="terms, histogram"):
        r.facet_composite_multi("alpha", [("x", "range", {"field": "size"})])


def test_terms_stats_vs_brute(rdr):
    r = rdr
    rows = r.facet_terms_stats("alpha", "lang", "size")
    import numpy as _np

    cand = r._match_ordinals("alpha", None)
    langs = r._gather_column(cand, "lang").astype(str)
    vals = r._gather_column(cand, "size")
    for key, n, mn, mx, sm, av in rows:
        sel = vals[langs == key]
        assert n == sel.size
        assert mn == sel.min() and mx == sel.max() and sm == sel.sum()
        assert av == float(sel.sum()) / sel.size
    assert [row[0] for row in rows] == sorted(set(langs))


def test_weighted_avg_agg(rdr):
    # value = size, weight = dl (token count); docs matching "alpha"
    matched = [(i, s, len(TOK.findall(t.lower()))) for i, (t, _, s) in enumerate(DOCS)
               if "alpha" in TOK.findall(t.lower())]
    exp = sum(s * d for _, s, d in matched) / sum(d for _, _, d in matched)
    got = rdr.weighted_avg_agg("alpha", "size", "dl")
    assert got == pytest.approx(exp, rel=1e-12)
    # empty match -> None
    assert rdr.weighted_avg_agg("zzz", "size", "dl") is None


def test_top_metrics_agg(rdr):
    rows = rdr.top_metrics_agg("alpha", "size", "size", descending=True, size=2)
    sizes = sorted(
        (s for i, (t, _, s) in enumerate(DOCS) if "alpha" in TOK.findall(t.lower())),
        reverse=True,
    )
    assert [x["metrics"]["size"] for x in rows] == sizes[:2]
    assert [x["sort"][0] for x in rows] == [float(v) for v in sizes[:2]]
    # ascending, size beyond match count returns all matches
    rows = rdr.top_metrics_agg("alpha", "size", "size", descending=False, size=10)
    assert [x["metrics"]["size"] for x in rows] == sorted(sizes)


def test_top_metrics_tie_breaks_doc_id(rdr):
    # docs 1 and 2 both have size 250 and match "gamma"
    rows = rdr.top_metrics_agg("gamma", "size", "size", descending=True, size=2)
    assert [x["metrics"]["size"] for x in rows] == [250, 250]


def test_weighted_avg_dsl_body(rdr):
    from raybm25.query.dsl import run_query

    resp = run_query(
        rdr,
        {
            "size": 0,
            "query": {"match": {"text": "alpha"}},
            "aggs": {
                "w": {"weighted_avg": {"value": {"field": "size"},
                                       "weight": {"field": "dl"}}},
                "t": {"top_metrics": {"metrics": {"field": "size"},
                                      "sort": {"size": "desc"}, "size": 1}},
            },
        },
    )
    assert resp["aggregations"]["w"]["value"] == rdr.weighted_avg_agg("alpha", "size", "dl")
    assert resp["aggregations"]["t"]["top"][0]["metrics"]["size"] == 999


def test_matrix_stats_agg(rdr):
    import math

    m = rdr.matrix_stats_agg("alpha", ["size", "dl"])
    matched = [(s, len(TOK.findall(t.lower()))) for t, _, s in DOCS
               if "alpha" in TOK.findall(t.lower())]
    n = len(matched)
    xs = [s for s, _ in matched]
    ys = [d for _, d in matched]
    mx, my = sum(xs) / n, sum(ys) / n
    varx = (sum(v * v for v in xs) - n * mx * mx) / (n - 1)
    vary = (sum(v * v for v in ys) - n * my * my) / (n - 1)
    cov = (sum(a * b for a, b in zip(xs, ys)) - n * mx * my) / (n - 1)
    assert m["doc_count"] == n
    assert m["fields"]["size"]["mean"] == pytest.approx(mx)
    assert m["fields"]["size"]["variance"] == pytest.approx(varx)
    assert m["fields"]["dl"]["variance"] == pytest.approx(vary)
    assert m["covariance"]["size"]["dl"] == pytest.approx(cov)
    assert m["covariance"]["dl"]["size"] == pytest.approx(cov)
    assert m["correlation"]["size"]["dl"] == pytest.approx(
        cov / (math.sqrt(varx) * math.sqrt(vary))
    )
    # numpy cross-check for the higher moments (population defs)
    a = np.array(xs, dtype=np.float64)
    m2 = a.var()
    skew = ((a - a.mean()) ** 3).mean() / m2**1.5
    kurt = ((a - a.mean()) ** 4).mean() / m2**2
    assert m["fields"]["size"]["skewness"] == pytest.approx(skew)
    assert m["fields"]["size"]["kurtosis"] == pytest.approx(kurt)


def test_matrix_stats_tiny_match(rdr):
    # fewer than two matches: empty stats, no division by zero
    m = rdr.matrix_stats_agg("zzznope", ["size", "dl"])
    assert m == {"doc_count": 0, "fields": {}, "covariance": {}, "correlation": {}}


def test_percentile_ranks_agg(rdr):
    vals = sorted(s for t, _, s in DOCS if "alpha" in TOK.findall(t.lower()))
    pr = rdr.percentile_ranks_agg("alpha", "size", (10, 250, 5000))
    n = len(vals)
    for v in (10, 250, 5000):
        assert pr[float(v)] == pytest.approx(
            100.0 * sum(x <= v for x in vals) / n
        )
    assert pr[5000.0] == 100.0
    assert rdr.percentile_ranks_agg("zzz", "size", (1,)) == {1.0: None}


def test_matrix_stats_big_int_no_overflow(ray_session, tmp_path):
    """Integer fields above the int64 moment-sum bound take the exact
    object-int path instead of silently wrapping (numpy int64 wrap)."""
    import math

    import pyarrow.parquet as pq

    big = [4_000_000_000, 4_000_000_001, 4_000_000_005, 3_999_999_990]
    small = [1, 2, 3, 4]
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(4)),
                "text": ["alpha x"] * 4,
                "big": big,
                "small": small,
            }
        ),
        str(tmp_path / "d.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(str(tmp_path / "d.parquet"), idx, key_col="doc_id",
                id_col="doc_id", ts_col=None,
                stored_cols=["text", "big", "small"], num_buckets=1)
    m = IndexReader(idx).matrix_stats_agg("alpha", ["big", "small"])
    n = 4
    mx = sum(big) / n
    # expected values computed with exact integer arithmetic (the
    # float64 raw-moment form cancels at this magnitude):
    # var = (n·Σv² − (Σv)²) / (n·(n−1))
    varx = (n * sum(v * v for v in big) - sum(big) ** 2) / (n * (n - 1))
    my = sum(small) / n
    vary = (n * sum(v * v for v in small) - sum(small) ** 2) / (n * (n - 1))
    cov = (
        n * sum(a * b for a, b in zip(big, small)) - sum(big) * sum(small)
    ) / (n * (n - 1))
    assert m["fields"]["big"]["mean"] == pytest.approx(mx)
    assert m["fields"]["big"]["variance"] == pytest.approx(varx, rel=1e-9)
    assert m["fields"]["big"]["variance"] > 0  # wrap would go negative/garbage
    assert m["covariance"]["big"]["small"] == pytest.approx(cov, rel=1e-9)
    assert m["correlation"]["big"]["small"] == pytest.approx(
        cov / (math.sqrt(varx) * math.sqrt(vary)), rel=1e-9
    )


def test_mad_agg_vs_brute(rdr):
    sizes = np.array([DOCS[i][2] for i in _match("alpha gamma")], dtype=float)
    med = np.median(sizes)
    want = np.median(np.abs(sizes - med))
    assert rdr.median_absolute_deviation_agg("alpha gamma", "size") == pytest.approx(want)
    assert rdr.median_absolute_deviation_agg("zzz", "size") is None


def test_boxplot_agg_vs_brute(rdr):
    sizes = np.sort(np.array([DOCS[i][2] for i in _match("alpha gamma")], dtype=float))
    b = rdr.boxplot_agg("alpha gamma", "size")
    q1, q2, q3 = np.percentile(sizes, (25, 50, 75))
    assert b["min"] == sizes[0] and b["max"] == sizes[-1]
    assert b["q1"] == pytest.approx(q1)
    assert b["q2"] == pytest.approx(q2)
    assert b["q3"] == pytest.approx(q3)
    iqr = q3 - q1
    inside = sizes[(sizes >= q1 - 1.5 * iqr) & (sizes <= q3 + 1.5 * iqr)]
    assert b["lower"] == inside[0] and b["upper"] == inside[-1]
    empty = rdr.boxplot_agg("zzz", "size")
    assert empty["min"] is None and empty["q1"] is None


def test_ttest_agg_vs_brute(rdr):
    # populations: lang == en vs de among docs matching a broad query
    matched = _match("alpha beta gamma delta nothing only here")
    a = np.array([DOCS[i][2] for i in matched if DOCS[i][1] == "en"], float)
    b = np.array([DOCS[i][2] for i in matched if DOCS[i][1] == "de"], float)
    got = rdr.t_test_agg(
        "alpha beta gamma delta nothing only here", "size", "lang", "en", "de"
    )
    na, nb = a.size, b.size
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / na + vb / nb
    t = (a.mean() - b.mean()) / np.sqrt(se2)
    dof = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    assert got["n_a"] == na and got["n_b"] == nb
    assert got["t"] == pytest.approx(t)
    assert got["dof"] == pytest.approx(dof)
    # homoscedastic: pooled variance, dof = na+nb-2
    got2 = rdr.t_test_agg(
        "alpha beta gamma delta nothing only here", "size", "lang", "en", "de",
        kind="homoscedastic",
    )
    pooled = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
    t2 = (a.mean() - b.mean()) / np.sqrt(pooled * (1 / na + 1 / nb))
    assert got2["t"] == pytest.approx(t2)
    assert got2["dof"] == na + nb - 2
    # degenerate population (<2 samples) -> None statistic
    tiny = rdr.t_test_agg("delta", "size", "lang", "en", "fr")
    assert tiny["t"] is None and tiny["n_a"] == 1
    with pytest.raises(ValueError, match="t_test"):
        rdr.t_test_agg("alpha", "size", "lang", "en", "de", kind="paired")


def test_mad_boxplot_ttest_dsl_body(rdr):
    from raybm25.query.dsl import run_query

    resp = run_query(
        rdr,
        {
            "size": 0,
            "query": {"match": {"text": "alpha gamma"}},
            "aggs": {
                "m": {"median_absolute_deviation": {"field": "size"}},
                "bx": {"boxplot": {"field": "size"}},
                "tt": {
                    "t_test": {
                        "a": {"field": "size", "filter": {"term": {"lang": "en"}}},
                        "b": {"field": "size", "filter": {"term": {"lang": "de"}}},
                        "type": "heteroscedastic",
                    }
                },
            },
        },
    )
    ag = resp["aggregations"]
    assert ag["m"]["value"] == rdr.median_absolute_deviation_agg("alpha gamma", "size")
    assert ag["bx"] == rdr.boxplot_agg("alpha gamma", "size")
    assert ag["tt"] == rdr.t_test_agg("alpha gamma", "size", "lang", "en", "de")


def test_aggs_over_filter_context_queries(rdr):
    """Aggregations run over ANY filter-context query (bool / term /
    range), not just match — the ordinals_of_ids funnel."""
    import numpy as np

    from raybm25.query.dsl import run_query
    from raybm25.query.engine import IndexReader

    r = rdr
    got = run_query(
        r,
        {
            "size": 0,
            "query": {
                "bool": {
                    "must": [{"match": {"text": "alpha"}}],
                    "filter": [{"term": {"lang": "en"}}],
                }
            },
            "aggs": {"st": {"stats": {"field": "size"}}},
        },
    )["aggregations"]["st"]
    # brute force: docs matching alpha AND lang=en
    want = run_query(
        r,
        {
            "size": 100,
            "query": {
                "bool": {
                    "must": [{"match": {"text": "alpha"}}],
                    "filter": [{"term": {"lang": "en"}}],
                }
            },
        },
    )["hits"]["hits"]
    assert got["count"] == len(want)
    # top_hits over a non-scoring query refuses loudly
    import pytest as _pt

    with _pt.raises(ValueError, match="top_hits"):
        run_query(
            r,
            {
                "size": 0,
                "query": {"term": {"lang": "en"}},
                "aggs": {
                    "g": {
                        "terms": {"field": "lang"},
                        "aggs": {"h": {"top_hits": {"size": 1}}},
                    }
                },
            },
        )


def test_sort_over_filter_context_queries(rdr):
    """Field sort works over bool / term / match_all queries via the
    same ordinal funnel (unscored sort, ties by doc_id asc)."""
    from raybm25.query.dsl import run_query

    got = run_query(
        rdr,
        {
            "size": 10,
            "query": {"term": {"lang": "en"}},
            "sort": [{"size": "desc"}],
        },
    )["hits"]["hits"]
    en = [(i, s) for i, (_, l, s) in enumerate(DOCS) if l == "en"]
    want = sorted(en, key=lambda t: (-t[1], t[0]))
    assert [(h["_id"], h["sort"][0]) for h in got] == [
        (i, s) for i, s in want
    ]
    ma = run_query(
        rdr,
        {"size": 3, "query": {"match_all": {}}, "sort": [{"size": "asc"}]},
    )["hits"]["hits"]
    assert [h["_id"] for h in ma] == [0, 5, 1]


def test_filter_context_agg_guards_and_significant(rdr):
    """Scoring aggs refuse filter-context queries loudly; funnel-based
    aggs (significant_terms) work over them."""
    from raybm25.query.dsl import run_query

    got = run_query(
        rdr,
        {"size": 0, "query": {"term": {"lang": "en"}},
         "aggs": {"sig": {"significant_terms": {"field": "text"}}}},
    )["aggregations"]["sig"]["buckets"]
    assert isinstance(got, list)
    import pytest as _pt

    for agg in (
        {"s": {"sampler": {"shard_size": 2},
               "aggs": {"m": {"avg": {"field": "size"}}}}},
        {"s": {"significant_text": {"field": "text"}}},
    ):
        with _pt.raises(ValueError, match="scoring"):
            run_query(
                rdr,
                {"size": 0, "query": {"term": {"lang": "en"}}, "aggs": agg},
            )
