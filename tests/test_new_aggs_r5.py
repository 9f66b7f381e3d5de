"""Round-5 aggregation additions: string_stats, scripted_metric
(vectorized subset), rate sub-agg, cardinality + cumulative_cardinality
under date_histogram, and the _mtermvectors endpoint — checked against
brute force computed in-test. Reference behavior: OpenSearch
aggs.{string_stats,scripted_metric,rate,cumulative_cardinality} and
the _mtermvectors API."""

import math
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.query.dsl import run_mtermvectors, run_query
from raybm25.query.engine import IndexReader

TOK = re.compile(r"[a-z0-9]+")

DOCS = [
    ("alpha beta", "web", 10),
    ("beta gamma", "wiki", 250),
    ("alpha gamma delta", "web", 250),
    ("delta only", "forum", 400),
    ("alpha alpha", "web", 999),
    ("nothing here", "wiki", 50),
]

# ts (epoch ms, two days) / user_id / text for the events-shaped index
EVENTS = [
    (0 * 86400000 + 1000, 7, "error disk"),
    (0 * 86400000 + 2000, 8, "error net"),
    (0 * 86400000 + 3000, 7, "error disk"),
    (1 * 86400000 + 1000, 8, "error cpu"),
    (1 * 86400000 + 2000, 9, "error cpu"),
    (2 * 86400000 + 1000, 9, "ok boot"),
]


@pytest.fixture(scope="module")
def rdr(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("newaggs")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(DOCS))),
                "text": [t for t, _, _ in DOCS],
                "source": [s for _, s, _ in DOCS],
                "size": [n for _, _, n in DOCS],
            }
        ),
        str(tmp / "d.parquet"),
    )
    idx = str(tmp / "idx")
    build_index(str(tmp / "d.parquet"), idx, key_col="doc_id", id_col="doc_id",
                ts_col=None, keyword_cols=("source",),
                stored_cols=["text", "source", "size"], num_buckets=2)
    return IndexReader(idx)


@pytest.fixture(scope="module")
def evt_rdr(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("newaggs_evt")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "event_id": list(range(len(EVENTS))),
                "ts": pa.array(
                    [ms * 1000 for ms, _, _ in EVENTS],
                    type=pa.timestamp("us"),
                ),
                "user_id": [u for _, u, _ in EVENTS],
                "text": [t for _, _, t in EVENTS],
            }
        ),
        str(tmp / "e.parquet"),
    )
    idx = str(tmp / "idx")
    build_index(str(tmp / "e.parquet"), idx, key_col="event_id",
                id_col="event_id", ts_col=None,
                stored_cols=["ts", "user_id", "text"], num_buckets=2)
    return IndexReader(idx)


def _match(query):
    terms = set(TOK.findall(query.lower()))
    return [i for i, (t, _, _) in enumerate(DOCS)
            if set(TOK.findall(t.lower())) & terms]


def test_string_stats(rdr):
    got = rdr.string_stats_agg("alpha gamma", "source")
    vals = [DOCS[i][1] for i in _match("alpha gamma")]
    lens = [len(v) for v in vals]
    counts = Counter("".join(vals))
    total = sum(counts.values())
    ent = -sum((c / total) * math.log2(c / total) for c in counts.values())
    assert got["count"] == len(vals)
    assert got["min_length"] == min(lens)
    assert got["max_length"] == max(lens)
    assert got["avg_length"] == pytest.approx(sum(lens) / len(lens))
    assert got["entropy"] == pytest.approx(ent, abs=1e-9)


def test_string_stats_empty(rdr):
    got = rdr.string_stats_agg("zzznomatch", "source")
    assert got == {"count": 0, "min_length": None, "max_length": None,
                   "avg_length": None, "entropy": 0.0}


def test_scripted_metric_sum_expr(rdr):
    got = rdr.scripted_metric_agg(
        "alpha gamma",
        "state.acc = 5",
        "state.acc += doc['size'].value * doc['size'].value",
    )
    want = 5 + sum(DOCS[i][2] ** 2 for i in _match("alpha gamma"))
    assert got == pytest.approx(want)


def test_scripted_metric_rejects_non_subset(rdr):
    with pytest.raises(ValueError):
        rdr.scripted_metric_agg("alpha", "state.acc = []",
                                "state.acc += doc['size'].value")
    with pytest.raises(ValueError):
        # map must accumulate into the SAME state variable
        rdr.scripted_metric_agg("alpha", "state.acc = 0",
                                "state.other += doc['size'].value")
    with pytest.raises(ValueError):
        # no order-dependent reduce shapes: '=' (overwrite) is not +=
        rdr.scripted_metric_agg("alpha", "state.acc = 0",
                                "state.acc = doc['size'].value")


def test_scripted_metric_empty_match_returns_init(rdr):
    got = rdr.scripted_metric_agg("zzznomatch", "state.acc = 3",
                                  "state.acc += doc['size'].value")
    assert got == 3.0


def test_scripted_metric_via_dsl(rdr):
    resp = run_query(rdr, {
        "query": {"match": {"text": {"query": "alpha gamma"}}},
        "size": 0,
        "aggs": {"m": {"scripted_metric": {
            "init_script": "state.acc = 0",
            "map_script": "state.acc += doc['size'].value"}}},
    })
    want = sum(DOCS[i][2] for i in _match("alpha gamma"))
    assert resp["aggregations"]["m"]["value"] == pytest.approx(want)


def test_date_histogram_cardinality_engine(evt_rdr):
    rows = evt_rdr.facet_date_histogram_cardinality(
        "error", "ts", 86400000, "user_id"
    )
    # day 0: users {7,8} of 3 error events; day 1: {8,9}; cumulative
    # distinct after day 1 = {7,8,9}
    assert rows == [
        (0, 3, 2, 2),
        (86400000, 2, 2, 3),
    ]


def test_rate_and_cumulative_cardinality_dsl(evt_rdr):
    resp = run_query(evt_rdr, {
        "query": {"match": {"text": {"query": "error"}}},
        "size": 0,
        "aggs": {"daily": {
            "date_histogram": {"field": "ts", "fixed_interval_ms": 86400000},
            "aggs": {
                "hourly": {"rate": {"unit": "hour"}},
                "uniq": {"cardinality": {"field": "user_id"}},
                "cum": {"cumulative_cardinality": {"buckets_path": "uniq"}},
            },
        }},
    })
    b = resp["aggregations"]["daily"]["buckets"]
    assert [x["key"] for x in b] == [0, 86400000]
    assert [x["doc_count"] for x in b] == [3, 2]
    assert [x["hourly"]["value"] for x in b] == [3 / 24, 2 / 24]
    assert [x["uniq"]["value"] for x in b] == [2, 2]
    assert [x["cum"]["value"] for x in b] == [2, 3]


def test_rate_default_unit_is_interval(evt_rdr):
    resp = run_query(evt_rdr, {
        "query": {"match": {"text": {"query": "error"}}},
        "size": 0,
        "aggs": {"daily": {
            "date_histogram": {"field": "ts", "fixed_interval_ms": 86400000},
            "aggs": {"r": {"rate": {}}},
        }},
    })
    b = resp["aggregations"]["daily"]["buckets"]
    assert [x["r"]["value"] for x in b] == [3.0, 2.0]


def test_rate_on_field_sum(evt_rdr):
    resp = run_query(evt_rdr, {
        "query": {"match": {"text": {"query": "error"}}},
        "size": 0,
        "aggs": {"daily": {
            "date_histogram": {"field": "ts", "fixed_interval_ms": 86400000},
            "aggs": {"r": {"rate": {"field": "user_id", "unit": "day"}}}},
        },
    })
    b = resp["aggregations"]["daily"]["buckets"]
    # sum(user_id): day0 = 7+8+7 = 22, day1 = 8+9 = 17; unit == interval
    assert [x["r"]["value"] for x in b] == [22.0, 17.0]


def test_mtermvectors(rdr):
    resp = run_mtermvectors(rdr, {
        "ids": [0, 4],
        "term_statistics": True,
        "positions": False,
        "field_statistics": False,
    })
    assert [d["_id"] for d in resp["docs"]] == [0, 4]
    t0 = resp["docs"][0]["term_vectors"]["text"]["terms"]
    assert t0["alpha"]["term_freq"] == 1
    assert t0["alpha"]["doc_freq"] == 3  # docs 0, 2, 4
    assert t0["alpha"]["ttf"] == 4  # doc 4 has it twice
    t4 = resp["docs"][1]["term_vectors"]["text"]["terms"]
    assert t4["alpha"]["term_freq"] == 2
    assert set(t4) == {"alpha"}


def test_mtermvectors_docs_form_overrides(rdr):
    resp = run_mtermvectors(rdr, {
        "docs": [
            {"_id": 0, "term_statistics": True, "positions": False,
             "field_statistics": False},
            {"_id": 1, "positions": False, "field_statistics": False},
        ],
    })
    t0 = resp["docs"][0]["term_vectors"]["text"]["terms"]
    assert "doc_freq" in t0["alpha"]
    t1 = resp["docs"][1]["term_vectors"]["text"]["terms"]
    assert "doc_freq" not in t1["beta"]  # per-doc options differ


def test_moving_percentiles(evt_rdr):
    resp = run_query(evt_rdr, {
        "query": {"match": {"text": {"query": "error"}}},
        "size": 0,
        "aggs": {"daily": {
            "date_histogram": {"field": "ts", "fixed_interval_ms": 86400000},
            "aggs": {"mp": {"moving_percentiles": {
                "buckets_path": "_count", "window": 2, "shift": 1,
                "percents": [50.0, 100.0]}}},
        }},
    })
    b = resp["aggregations"]["daily"]["buckets"]
    # doc counts per day: [3, 2]; trailing-2 windows incl. current:
    # [3] then [3, 2]
    assert b[0]["mp"]["values"]["50.0"] == 3.0
    assert b[1]["mp"]["values"]["50.0"] == 2.5
    assert b[1]["mp"]["values"]["100.0"] == 3.0


def test_moving_percentiles_default_shift_excludes_current(evt_rdr):
    resp = run_query(evt_rdr, {
        "query": {"match": {"text": {"query": "error"}}},
        "size": 0,
        "aggs": {"daily": {
            "date_histogram": {"field": "ts", "fixed_interval_ms": 86400000},
            "aggs": {"mp": {"moving_percentiles": {
                "buckets_path": "_count", "window": 2, "percents": [50.0]}}},
        }},
    })
    b = resp["aggregations"]["daily"]["buckets"]
    assert b[0]["mp"]["values"]["50.0"] is None  # empty window
    assert b[1]["mp"]["values"]["50.0"] == 3.0


def test_ip_range_engine_and_dsl(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("iprange")
    import pyarrow.parquet as pq

    ips = ["10.0.0.1", "10.0.0.255", "63.255.255.255", "64.0.0.0",
           "128.1.2.3", "191.255.255.255", "192.0.0.0", "255.255.255.255"]
    pq.write_table(
        pa.table({
            "doc_id": list(range(len(ips))),
            "text": ["hit"] * len(ips),
            "client_ip": ips,
        }),
        str(tmp / "d.parquet"),
    )
    idx = str(tmp / "idx")
    build_index(str(tmp / "d.parquet"), idx, key_col="doc_id",
                id_col="doc_id", ts_col=None, text_cols=("text",),
                stored_cols=["text", "client_ip"], num_buckets=2)
    r = IndexReader(idx)
    rows = r.facet_ip_ranges("hit", "client_ip", [
        {"to": "64.0.0.0"},
        {"from": "64.0.0.0", "to": "192.0.0.0"},
        {"mask": "192.0.0.0/2"},
        {"mask": "10.0.0.0/24"},
        {"mask": "0.0.0.0/0"},
    ])
    assert rows == [
        (None, "64.0.0.0", 3),
        ("64.0.0.0", "192.0.0.0", 3),
        ("192.0.0.0", None, 2),        # /2 top block: hi overflows -> open
        ("10.0.0.0", "10.0.1.0", 2),
        (None, None, 8),               # /0 fully open
    ]
    resp = run_query(idx, {
        "query": {"match": {"text": {"query": "hit"}}}, "size": 0,
        "aggs": {"a": {"ip_range": {"field": "client_ip",
                 "ranges": [{"from": "64.0.0.0"}]}}},
    })
    b = resp["aggregations"]["a"]["buckets"][0]
    assert b["doc_count"] == 5 and b["from"] == "64.0.0.0" and "to" not in b


def test_ip_range_rejects_bad_octet(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ipbad")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"doc_id": [0], "text": ["hit"], "client_ip": ["300.0.0.1"]}),
        str(tmp / "d.parquet"),
    )
    idx = str(tmp / "idx")
    build_index(str(tmp / "d.parquet"), idx, key_col="doc_id",
                id_col="doc_id", ts_col=None, text_cols=("text",),
                stored_cols=["text", "client_ip"], num_buckets=2)
    with pytest.raises(ValueError):
        IndexReader(idx).facet_ip_ranges("hit", "client_ip",
                                         [{"to": "64.0.0.0"}])


def test_variable_width_histogram_hand_merge(rdr):
    # matching docs for 'alpha gamma': sizes [10, 250, 250, 999]
    # distinct: 10, 250(x2), 999 -> buckets=2 merges the smallest
    # centroid gap first (10<->250 = 240 < 250<->999 = 749)
    got = rdr.variable_width_histogram_agg("alpha gamma", "size", 2)
    assert got == [
        {"min": 10.0, "key": 170.0, "max": 250.0, "doc_count": 3},
        {"min": 999.0, "key": 999.0, "max": 999.0, "doc_count": 1},
    ]
    # buckets >= distinct values: one bucket per distinct value
    got = rdr.variable_width_histogram_agg("alpha gamma", "size", 10)
    assert [(b["min"], b["doc_count"]) for b in got] == [
        (10.0, 1), (250.0, 2), (999.0, 1)]
    # full merge down to one bucket
    got = rdr.variable_width_histogram_agg("alpha gamma", "size", 1)
    assert got[0]["doc_count"] == 4 and got[0]["min"] == 10.0
    assert got[0]["max"] == 999.0
    assert got[0]["key"] == pytest.approx((10 + 250 + 250 + 999) / 4)
    with pytest.raises(ValueError):
        rdr.variable_width_histogram_agg("alpha", "size", 0)


def test_variable_width_histogram_order_independent(rdr):
    # the pinned variant must give the same buckets regardless of doc
    # order; compare against a brute-force reimplementation on the
    # sorted distinct values
    got = rdr.variable_width_histogram_agg("alpha beta gamma delta", "size", 3)
    sizes = sorted(DOCS[i][2] for i in _match("alpha beta gamma delta"))
    # brute force: greedy adjacent merge on centroid gap
    clusters = []
    for s in sizes:
        if clusters and clusters[-1][0][-1] == s:
            clusters[-1][0].append(s)
        else:
            clusters.append(([s],))
    clusters = [c[0] for c in clusters]
    while len(clusters) > 3:
        gaps = [sum(clusters[i + 1]) / len(clusters[i + 1])
                - sum(clusters[i]) / len(clusters[i])
                for i in range(len(clusters) - 1)]
        i = gaps.index(min(gaps))
        clusters[i: i + 2] = [clusters[i] + clusters[i + 1]]
    want = [{"min": float(c[0]), "key": sum(c) / len(c),
             "max": float(c[-1]), "doc_count": len(c)} for c in clusters]
    assert got == want


def test_single_filter_agg_with_stats(rdr):
    resp = run_query(rdr, {
        "query": {"match": {"text": {"query": "alpha gamma delta"}}},
        "size": 0,
        "aggs": {"web_only": {
            "filter": {"term": {"source": "web"}},
            "aggs": {"sz": {"stats": {"field": "size"}},
                     "mx": {"max": {"field": "size"}}},
        }},
    })
    b = resp["aggregations"]["web_only"]
    # match set: docs 0,1,2,3,4 minus those without terms -> ids with
    # alpha/gamma/delta = {0,1,2,3,4}; source == web -> {0,2,4}
    want = [DOCS[i][2] for i in (0, 2, 4)]
    assert b["doc_count"] == 3
    assert b["sz"] == {"count": 3, "min": min(want), "max": max(want),
                       "sum": sum(want), "avg": sum(want) / 3}
    assert b["mx"] == {"value": max(want)}


def test_single_filter_agg_empty_and_bad_sub(rdr):
    resp = run_query(rdr, {
        "query": {"match": {"text": {"query": "alpha"}}},
        "size": 0,
        "aggs": {"none": {
            "filter": {"term": {"source": "nosuch"}},
            "aggs": {"sz": {"stats": {"field": "size"}}},
        }},
    })
    b = resp["aggregations"]["none"]
    assert b["doc_count"] == 0
    assert b["sz"]["count"] == 0 and b["sz"]["min"] is None
    with pytest.raises(ValueError):
        run_query(rdr, {
            "query": {"match": {"text": {"query": "alpha"}}}, "size": 0,
            "aggs": {"x": {"filter": {"term": {"source": "web"}},
                           "aggs": {"p": {"percentiles": {"field": "size"}}}}},
        })


def test_field_sorted_search_after_pages_cover_exactly(rdr):
    base = {
        "query": {"match": {"text": {"query": "alpha beta gamma delta"}}},
        "sort": [{"size": "asc"}],
        "size": 2,
    }
    seen = []
    body = dict(base)
    for _ in range(5):
        hits = run_query(rdr, body)["hits"]["hits"]
        if not hits:
            break
        seen.extend((h["_id"], h["sort"][0]) for h in hits)
        body = {**base, "search_after": hits[-1]["sort"]}
    ids = _match("alpha beta gamma delta")
    want = sorted(((i, DOCS[i][2]) for i in ids), key=lambda t: (t[1], t[0]))
    assert seen == want  # every match exactly once, in sort order


def test_field_sorted_search_after_tie_band(ray_session, tmp_path_factory):
    # equal sort values must tiebreak on doc_id across the page edge
    tmp = tmp_path_factory.mktemp("sorttie")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({
            "doc_id": [3, 1, 7, 5, 2],
            "text": ["x"] * 5,
            "v": [9, 9, 9, 9, 9],
        }),
        str(tmp / "d.parquet"),
    )
    idx = str(tmp / "idx")
    build_index(str(tmp / "d.parquet"), idx, key_col="doc_id",
                id_col="doc_id", ts_col=None, text_cols=("text",),
                stored_cols=["text", "v"], num_buckets=2)
    base = {"query": {"match": {"text": {"query": "x"}}},
            "sort": [{"v": "asc"}], "size": 2}
    p1 = run_query(idx, base)["hits"]["hits"]
    assert [h["_id"] for h in p1] == [1, 2]
    p2 = run_query(idx, {**base, "search_after": p1[-1]["sort"]})
    assert [h["_id"] for h in p2["hits"]["hits"]] == [3, 5]
    with pytest.raises(ValueError):
        run_query(idx, {**base, "from": 2, "search_after": p1[-1]["sort"]})


def test_field_sorted_search_after_desc(rdr):
    base = {"query": {"match": {"text": {"query": "alpha beta gamma delta"}}},
            "sort": [{"size": "desc"}], "size": 2}
    p1 = run_query(rdr, base)["hits"]["hits"]
    p2 = run_query(rdr, {**base, "search_after": p1[-1]["sort"]})["hits"]["hits"]
    vals = [h["sort"][0] for h in p1 + p2]
    assert vals == sorted(vals, reverse=True)
    assert len({h["_id"] for h in p1 + p2}) == len(p1 + p2)


def test_docvalue_and_script_fields(rdr):
    resp = run_query(rdr, {
        "query": {"match": {"text": {"query": "alpha"}}},
        "size": 10,
        "docvalue_fields": ["size", {"field": "source"}],
        "script_fields": {
            "half": {"script": {"source": "doc['size'].value / 2"}},
            "boosted": {"script": {"source": "_score * 0 + doc['size'].value"}},
        },
    })
    for h in resp["hits"]["hits"]:
        did = int(h["_id"])
        assert h["fields"]["size"] == [DOCS[did][2]]
        assert h["fields"]["source"] == [DOCS[did][1]]
        assert h["fields"]["half"] == [DOCS[did][2] / 2]
        assert h["fields"]["boosted"] == [float(DOCS[did][2])]


def test_script_fields_with_null_score_sort(rdr):
    # field-sorted hits carry _score None; script fields using _score
    # see 0.0 (pinned), doc-value-only scripts are unaffected
    resp = run_query(rdr, {
        "query": {"match": {"text": {"query": "alpha"}}},
        "sort": [{"size": "asc"}], "size": 3,
        "script_fields": {"s2": {"script": {"source": "doc['size'].value"}}},
    })
    for h in resp["hits"]["hits"]:
        assert h["fields"]["s2"] == [float(DOCS[int(h["_id"])][2])]


def test_decay_functions_vs_brute(rdr):
    import math

    from raybm25.oracle import OracleIndex

    oracle = OracleIndex({i: t for i, (t, _, _) in enumerate(DOCS)})
    base = {s: d for d, s in oracle.search("alpha gamma", k=100)}
    origin, scale, decay, offset = 250.0, 100.0, 0.5, 20.0

    def fv(v, fn):
        d = max(0.0, abs(v - origin) - offset)
        if fn == "gauss":
            return math.exp(d * d * math.log(decay) / (scale * scale))
        if fn == "exp":
            return math.exp(d * math.log(decay) / scale)
        return max(0.0, 1.0 - d * (1.0 - decay) / scale)

    for fn in ("gauss", "exp", "linear"):
        got = rdr.search_decay("alpha gamma", "size", origin, scale,
                               offset=offset, decay=decay, function=fn, k=10)
        want = sorted(
            ((d, s * fv(DOCS[d][2], fn)) for s, d in
             [(s, d) for d, s in oracle.search("alpha gamma", k=100)]),
            key=lambda t: (-t[1], t[0]))
        assert [d for d, _ in got] == [d for d, _ in want[:len(got)]], fn
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gs == pytest.approx(ws), fn
    with pytest.raises(ValueError):
        rdr.search_decay("alpha", "size", 0, 0)   # scale must be > 0
    with pytest.raises(ValueError):
        rdr.search_decay("alpha", "size", 0, 1, decay=1.0)


def test_random_score_deterministic_and_uniformish(rdr):
    a = rdr.search_random_score("alpha beta gamma delta", seed=42, k=100)
    b = rdr.search_random_score("alpha beta gamma delta", seed=42, k=100)
    assert a == b                         # same seed => same sample order
    c = rdr.search_random_score("alpha beta gamma delta", seed=43, k=100)
    assert [d for d, _ in a] != [d for d, _ in c]  # seed changes order
    assert all(0.0 <= s < 1.0 for _, s in a)
    assert set(d for d, _ in a) == set(_match("alpha beta gamma delta"))


def test_random_score_matches_shuffle_key_order(rdr):
    # the random_score generator IS the shuffle key: descending score
    # order must equal descending splitmix64 order
    import numpy as np

    from raybm25.extras.shuffle import splitmix64

    hits = rdr.search_random_score("alpha beta gamma delta", seed=7, k=100)
    ids = np.array([d for d, _ in hits], dtype=np.uint64)
    keys = splitmix64(ids ^ np.uint64(7))
    assert list(keys) == sorted(keys, reverse=True)
