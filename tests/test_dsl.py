"""OpenSearch-DSL adapter: every supported body form must equal the
direct engine call it maps to."""

import numpy as np
import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.query.dsl import run_query
from raybm25.query.engine import IndexReader

DOCS = [
    (0, "merge join fast", "en", 10),
    (1, "merge sort slow", "de", 40),
    (2, "join stream window", "en", 25),
    (3, "sort only tokens", "fr", 5),
    (4, "merge merge stream", "en", 60),
    (5, "window stream join merge", "de", 30),
]


@pytest.fixture(scope="module")
def rdr(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dsl")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": [i for i, _, _, _ in DOCS],
                "text": [t for _, t, _, _ in DOCS],
                "lang": [l for _, _, l, _ in DOCS],
                "size_b": [s for _, _, _, s in DOCS],
            }
        ),
        str(tmp / "d.parquet"),
    )
    idx = str(tmp / "idx")
    build_index(str(tmp / "d.parquet"), idx, key_col="doc_id", id_col="doc_id",
                ts_col=None, keyword_cols=("lang",),
                stored_cols=["text", "lang", "size_b"], num_buckets=2,
                positions=True)
    return IndexReader(idx)


def _ids(resp):
    return [h["_id"] for h in resp["hits"]["hits"]]


def _pairs(resp):
    return [(h["_id"], h["_score"]) for h in resp["hits"]["hits"]]


def test_match(rdr):
    resp = run_query(rdr, {"query": {"match": {"text": "merge stream"}}, "size": 4})
    assert _pairs(resp) == rdr.search("merge stream", k=4)


def test_match_with_from_offset(rdr):
    full = rdr.search("merge stream", k=5)
    resp = run_query(
        rdr, {"query": {"match": {"text": "merge stream"}}, "size": 3, "from": 2}
    )
    assert _pairs(resp) == full[2:5]


def test_match_phrase_and_prefix(rdr):
    resp = run_query(rdr, {"query": {"match_phrase": {"text": "merge sort"}}})
    assert _pairs(resp) == rdr.search_phrase("merge sort", k=10)
    resp = run_query(
        rdr, {"query": {"match_phrase_prefix": {"text": "stream wi"}}}
    )
    assert _ids(resp) == rdr.match_phrase_prefix("stream wi").tolist()


def test_term_prefix_wildcard_fuzzy(rdr):
    resp = run_query(rdr, {"query": {"term": {"lang": "de"}}, "size": 10})
    assert _ids(resp) == np.asarray(rdr.term_docs("lang", "de")).tolist()
    resp = run_query(rdr, {"query": {"prefix": {"text": "st"}}, "size": 10})
    assert _ids(resp) == rdr.dict_prefix_docs("st").tolist()
    resp = run_query(rdr, {"query": {"wildcard": {"text": "s??t"}}, "size": 10})
    assert _ids(resp) == rdr.wildcard_docs("s??t").tolist()
    resp = run_query(
        rdr, {"query": {"fuzzy": {"text": {"value": "sprt", "fuzziness": 1}}}}
    )
    assert _ids(resp) == rdr.fuzzy_docs("sprt", 1).tolist()
    # constant-score rewrite
    assert all(h["_score"] == 1.0 for h in resp["hits"]["hits"])


def test_bool(rdr):
    body = {
        "query": {
            "bool": {
                "must": [{"match": {"text": "merge"}}],
                "should": [{"match": {"text": "join"}}],
                "must_not": [{"match": {"text": "sort"}}],
                "filter": [{"term": {"lang": "en"}}],
            }
        },
        "size": 10,
    }
    assert _pairs(run_query(rdr, body)) == rdr.search_bool(
        must="merge", should="join", must_not="sort",
        filter_term=("lang", "en"), k=10,
    )


def test_bool_msm(rdr):
    body = {
        "query": {
            "bool": {
                "should": [
                    {"match": {"text": "merge"}},
                    {"match": {"text": "join"}},
                    {"match": {"text": "stream"}},
                ],
                "minimum_should_match": 2,
            }
        }
    }
    assert _pairs(run_query(rdr, body)) == rdr.search_bool(
        should="merge join stream", minimum_should_match=2, k=10
    )


def test_search_after(rdr):
    page1 = rdr.search("merge stream", k=2)
    body = {
        "query": {"match": {"text": "merge stream"}},
        "search_after": [page1[-1][1], page1[-1][0]],
        "size": 3,
    }
    assert _pairs(run_query(rdr, body)) == rdr.search_after(
        "merge stream", after=(page1[-1][1], page1[-1][0]), k=3
    )


def test_sort_by_field(rdr):
    body = {
        "query": {"match": {"text": "merge stream"}},
        "sort": [{"size_b": {"order": "desc"}}],
        "size": 4,
    }
    resp = run_query(rdr, body)
    want = rdr.search_sort_by("merge stream", "size_b", k=4, descending=True)
    assert [(h["_id"], h["sort"][0]) for h in resp["hits"]["hits"]] == want


def test_more_like_this(rdr):
    body = {"query": {"more_like_this": {"like_id": 0}}}
    assert _pairs(run_query(rdr, body)) == rdr.more_like_this(0, k=10)


def test_aggs(rdr):
    body = {
        "query": {"match": {"text": "merge stream"}},
        "aggs": {
            "langs": {"terms": {"field": "lang"}},
            "sizes": {"range": {"field": "size_b",
                                "ranges": [{"to": 20}, {"from": 20, "to": 50},
                                           {"from": 50}]}},
            "hist": {"histogram": {"field": "size_b", "interval": 20}},
            "sz": {"stats": {"field": "size_b"}},
            "nlang": {"cardinality": {"field": "lang"}},
        },
    }
    resp = run_query(rdr, body)
    aggs = resp["aggregations"]
    assert aggs["langs"]["buckets"] == [
        {"key": v, "doc_count": c} for v, c in rdr.facet_terms("merge stream", "lang")
    ]
    assert aggs["sizes"]["buckets"] == [
        {"from": lo, "to": hi, "doc_count": c}
        for lo, hi, c in rdr.facet_ranges(
            "merge stream", "size_b", [(None, 20), (20, 50), (50, None)]
        )
    ]
    assert aggs["hist"]["buckets"] == [
        {"key": b, "doc_count": c}
        for b, c in rdr.facet_histogram("merge stream", "size_b", 20.0)
    ]
    assert aggs["sz"] == rdr.stats_agg("merge stream", "size_b")
    assert aggs["nlang"]["value"] == rdr.cardinality_agg("merge stream", "lang")


def test_match_all_and_errors(rdr):
    resp = run_query(rdr, {"query": {"match_all": {}}, "size": 100})
    assert sorted(_ids(resp)) == [i for i, _, _, _ in DOCS]
    with pytest.raises(ValueError):
        run_query(rdr, {"query": {"nope": {"text": "x"}}})
    with pytest.raises(ValueError):
        run_query(rdr, {"query": {"match": {"text": "x"}, "extra": {}}})
    # aggs over a non-match query aggregate its filter-context doc set
    agg = run_query(
        rdr,
        {"size": 0, "query": {"term": {"lang": "en"}},
         "aggs": {"a": {"terms": {"field": "lang"}}}},
    )["aggregations"]["a"]["buckets"]
    assert agg == [
        {"key": "en", "doc_count": sum(1 for _, _, l, _ in DOCS if l == "en")}
    ]


def test_single_metric_aggs(rdr):
    """min/max/avg/sum/value_count = the stats agg projected to one key."""
    body = {
        "query": {"match": {"text": "merge stream"}},
        "aggs": {
            "lo": {"min": {"field": "size_b"}},
            "hi": {"max": {"field": "size_b"}},
            "mean": {"avg": {"field": "size_b"}},
            "tot": {"sum": {"field": "size_b"}},
            "n": {"value_count": {"field": "size_b"}},
        },
    }
    aggs = run_query(rdr, body)["aggregations"]
    st = rdr.stats_agg("merge stream", "size_b")
    assert aggs["lo"]["value"] == st["min"]
    assert aggs["hi"]["value"] == st["max"]
    assert aggs["mean"]["value"] == st["avg"]
    assert aggs["tot"]["value"] == st["sum"]
    assert aggs["n"]["value"] == st["count"] > 0


def test_filters_agg(rdr):
    """filters agg: named buckets = each clause's doc set intersected
    with the query's match set."""
    import numpy as np

    body = {
        "query": {"match": {"text": "merge stream"}},
        "aggs": {"by": {"filters": {"filters": {
            "english": {"term": {"lang": "en"}},
            "big": {"range": {"size_b": {"gte": 20}}},
            "none": {"term": {"lang": "xx"}},
        }}}},
    }
    buckets = run_query(rdr, body)["aggregations"]["by"]["buckets"]
    from raybm25.query.dsl import _match_docs

    qdocs = _match_docs(rdr, "match", {"text": "merge stream"})
    want_en = np.intersect1d(qdocs, _match_docs(rdr, "term", {"lang": "en"})).size
    want_big = np.intersect1d(
        qdocs, _match_docs(rdr, "range", {"size_b": {"gte": 20}})
    ).size
    assert buckets["english"]["doc_count"] == want_en
    assert buckets["big"]["doc_count"] == want_big > 0
    assert buckets["none"]["doc_count"] == 0


def test_run_explain_endpoint(rdr):
    """_explain response wraps engine.explain; value == the doc's
    search score, bit-exact."""
    from raybm25.query.dsl import run_explain

    hits = rdr.search("merge stream", k=1)
    d, score = hits[0]
    resp = run_explain(rdr, d, {"query": {"match": {"text": "merge stream"}}})
    assert resp["_id"] == d and resp["matched"]
    assert resp["explanation"]["value"] == score
    assert sum(
        p["contribution"] for p in resp["explanation"]["details"]
    ) == pytest.approx(score, rel=1e-12)
    miss = run_explain(rdr, d, {"query": {"match": {"text": "zzzzz"}}})
    assert not miss["matched"] and miss["explanation"]["value"] == 0.0
    with pytest.raises(ValueError):
        run_explain(rdr, d, {"query": {"term": {"lang": "en"}}})


def test_run_analyze_and_stats(rdr, tmp_path):
    """_analyze returns the engine's own token chain; _stats reports
    manifest doc count and a real on-disk size."""
    from raybm25.analysis import sayt_expand, tokenize
    from raybm25.query.dsl import run_analyze, run_stats

    text = "The Quick-Brown fox 42 jumps!"
    toks = run_analyze({"text": text})["tokens"]
    assert [t["token"] for t in toks] == tokenize(text)
    assert [t["position"] for t in toks] == list(range(len(toks)))

    sayt = run_analyze({"text": "ab cd", "analyzer": "sayt"})["tokens"]
    base = tokenize("ab cd")
    want_extra = sorted(set(sayt_expand(base)) - set(base))
    assert sorted(t["token"] for t in sayt if t["type"] == "shingle") == want_extra

    with pytest.raises(ValueError):
        run_analyze({"text": "x", "analyzer": "nope"})

    st = run_stats(rdr)
    assert st["docs"]["count"] == rdr.n_docs
    assert st["store"]["size_in_bytes"] > 0
    assert st["corpus"]["avgdl"] == pytest.approx(rdr.avgdl)


def test_track_total_hits_exact(rdr):
    # default: total is the page length
    body = {"query": {"match": {"text": "merge stream"}}, "size": 2}
    resp = run_query(rdr, body)
    assert resp["hits"]["total"]["value"] == len(resp["hits"]["hits"]) == 2
    # track_total_hits: exact whole-match-set count, page unchanged
    full = rdr.search("merge stream", k=1000)
    resp2 = run_query(rdr, {**body, "track_total_hits": True})
    assert resp2["hits"]["total"] == {"value": len(full), "relation": "eq"}
    assert resp2["hits"]["hits"] == resp["hits"]["hits"]


def test_track_total_hits_bool(rdr):
    body = {
        "query": {
            "bool": {
                "must": [{"match": {"text": "merge"}}],
                "filter": [{"term": {"lang": "en"}}],
            }
        },
        "size": 1,
        "track_total_hits": True,
    }
    resp = run_query(rdr, body)
    from raybm25.query.dsl import run_count

    assert resp["hits"]["total"]["value"] == run_count(rdr, {"query": body["query"]})["count"]


def test_validate_query(rdr):
    from raybm25.query.dsl import run_validate_query

    ok = run_validate_query(rdr, {"query": {"match": {"text": "merge"}}})
    assert ok["valid"] is True and "explanations" not in ok
    ok2 = run_validate_query(
        rdr, {"query": {"match": {"text": "merge"}}}, explain=True
    )
    assert ok2["explanations"][0]["valid"] is True
    bad = run_validate_query(rdr, {"query": {"nonsense_clause": {}}})
    assert bad["valid"] is False
    assert bad["explanations"][0]["error"]  # reason string present
    # malformed body (two clauses at the top level) is invalid, not a crash
    bad2 = run_validate_query(
        rdr, {"query": {"match": {"text": "a"}, "term": {"lang": "en"}}}
    )
    assert bad2["valid"] is False
    # bool with a bad inner clause propagates invalidity
    bad3 = run_validate_query(
        rdr, {"query": {"bool": {"must": [{"wat": {}}]}}}
    )
    assert bad3["valid"] is False


def test_response_envelope_took(rdr):
    resp = run_query(rdr, {"query": {"match": {"text": "merge"}}, "size": 2})
    assert isinstance(resp["took"], int) and resp["took"] >= 0
    assert resp["timed_out"] is False


def test_terms_lookup(rdr):
    """terms lookup ({id, path}): the referenced doc's stored field
    values become the terms list; missing doc/field -> empty hits."""
    import numpy as np

    from raybm25.query.dsl import run_query

    r = run_query(
        rdr,
        {"size": 100, "query": {"terms": {"lang": {"id": 1, "path": "lang"}}}},
    )
    ids = sorted(int(h["_id"]) for h in r["hits"]["hits"])
    lang = rdr.get_docs(np.array([1], dtype="uint64")).column("lang")[0].as_py()
    want = run_query(
        rdr, {"size": 100, "query": {"terms": {"lang": [lang]}}}
    )
    assert ids == sorted(int(h["_id"]) for h in want["hits"]["hits"])
    assert ids  # doc 1's own language matches at least itself
    # missing doc -> empty
    miss = run_query(
        rdr,
        {"size": 10, "query": {"terms": {"lang": {"id": 999999, "path": "lang"}}}},
    )
    assert miss["hits"]["hits"] == []


def test_profile_true(rdr):
    """profile: true attaches one per-clause entry with real measured
    nanoseconds for the query and collect phases."""
    from raybm25.query.dsl import run_query

    resp = run_query(
        rdr,
        {"size": 3, "profile": True,
         "query": {"match": {"text": "alpha"}}},
    )
    prof = resp["profile"]["shards"][0]["searches"][0]
    assert prof["query"][0]["type"] == "match"
    assert prof["query"][0]["time_in_nanos"] >= 0
    assert prof["collector"][0]["time_in_nanos"] >= 0
    assert "alpha" in prof["query"][0]["description"]
    # absent unless requested
    assert "profile" not in run_query(
        rdr, {"size": 1, "query": {"match": {"text": "alpha"}}}
    )


def test_highlight_over_bool(rdr):
    """highlight collects terms from every positive match-family leaf
    of a bool query; pure filters refuse loudly."""
    from raybm25.query.dsl import run_query

    resp = run_query(
        rdr,
        {
            "size": 5,
            "query": {
                "bool": {
                    "must": [{"match": {"text": "merge"}}],
                    "filter": [{"term": {"lang": "en"}}],
                }
            },
            "highlight": {"fields": {"text": {}}},
        },
    )
    hl = resp["hits"]["hits"][0]["highlight"]["text"][0]
    assert "<em>merge</em>" in hl
    with pytest.raises(ValueError, match="highlight needs"):
        run_query(
            rdr,
            {"size": 5, "query": {"range": {"size_b": {"gte": 0}}},
             "highlight": {"fields": {"text": {}}}},
        )


def test_min_score(rdr):
    """top-level min_score filters the match set before paging."""
    from raybm25.query.dsl import run_query

    full = run_query(rdr, {"size": 10, "query": {"match": {"text": "merge"}}})[
        "hits"
    ]["hits"]
    cut = full[1]["_score"]  # threshold at the 2nd hit's score
    got = run_query(
        rdr,
        {"size": 10, "min_score": cut, "query": {"match": {"text": "merge"}}},
    )["hits"]["hits"]
    assert got == [h for h in full if h["_score"] >= cut]
    # paging applies after the filter
    got2 = run_query(
        rdr,
        {"size": 1, "from": 1, "min_score": cut,
         "query": {"match": {"text": "merge"}}},
    )["hits"]["hits"]
    assert got2 == got[1:2]
    # works over bool too
    gotb = run_query(
        rdr,
        {"size": 10, "min_score": 1e9,
         "query": {"bool": {"must": [{"match": {"text": "merge"}}]}}},
    )["hits"]["hits"]
    assert gotb == []


def test_source_filter_object(rdr):
    """_source as {"includes": [...], "excludes": [...]} with
    wildcards; excludes win over includes."""
    from raybm25.query.dsl import run_query

    h = run_query(
        rdr,
        {"size": 1, "query": {"match": {"text": "merge"}},
         "_source": {"includes": ["la*", "size_b"], "excludes": ["size*"]}},
    )["hits"]["hits"][0]
    assert set(h["_source"]) == {"lang"}
    h2 = run_query(
        rdr,
        {"size": 1, "query": {"match": {"text": "merge"}},
         "_source": {"excludes": ["text"]}},
    )["hits"]["hits"][0]
    assert "text" not in h2["_source"] and "lang" in h2["_source"]


def test_explain_flag_on_search(rdr):
    """explain: true attaches a per-hit _explanation whose value
    equals the hit's _score (same kernel as _explain)."""
    from raybm25.query.dsl import run_query

    resp = run_query(
        rdr,
        {"size": 3, "explain": True,
         "query": {"match": {"text": "merge join"}}},
    )
    for h in resp["hits"]["hits"]:
        assert abs(h["_explanation"]["value"] - h["_score"]) < 1e-12
        assert h["_explanation"]["details"]
    # absent unless requested
    plain = run_query(
        rdr, {"size": 1, "query": {"match": {"text": "merge"}}}
    )["hits"]["hits"][0]
    assert "_explanation" not in plain


def test_min_score_with_field_sort_refuses(rdr):
    from raybm25.query.dsl import run_query

    with pytest.raises(ValueError, match="min_score"):
        run_query(
            rdr,
            {"size": 5, "min_score": 0.1,
             "query": {"match": {"text": "merge"}},
             "sort": [{"size_b": "desc"}]},
        )


def test_highlight_require_field_match(ray_session, tmp_path_factory):
    """A clause's terms highlight only in the field it targets
    (require_field_match, the OpenSearch default): a title clause's
    terms must not wrap inside text even when the token occurs there."""
    import pyarrow.parquet as pq

    from raybm25.query.dsl import run_query

    tmp = tmp_path_factory.mktemp("hlrfm")
    pq.write_table(
        pa.table(
            {
                "doc_id": [1, 2],
                "text": ["alpha beta here", "alpha beta there"],
                "title": ["beta title", "other title"],
            }
        ),
        str(tmp / "d.parquet"),
    )
    idx = str(tmp / "idx")
    build_index(str(tmp / "d.parquet"), idx, key_col="doc_id",
                id_col="doc_id", ts_col=None, text_cols=("text", "title"),
                stored_cols=["text", "title"], num_buckets=2)
    resp = run_query(
        idx,
        {
            "size": 3,
            "query": {
                "bool": {
                    "must": [{"match": {"text": "alpha"}}],
                    "should": [{"match": {"title": "beta"}}],
                }
            },
            "highlight": {"fields": {"text": {}}},
        },
    )
    for h in resp["hits"]["hits"]:
        hl = h["highlight"]["text"][0]
        assert "<em>alpha</em>" in hl
        # 'beta' occurs in text but only the TITLE clause asked for it
        assert "<em>beta</em>" not in hl
