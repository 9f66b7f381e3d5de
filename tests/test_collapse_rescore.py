"""collapse, rescore, explain, and _count — vs brute force."""

import re

import numpy as np
import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.query.dsl import run_count, run_query
from raybm25.query.engine import IndexReader

TOK = re.compile(r"[a-z0-9]+")

DOCS = [
    "merge sort is stable merge",
    "quick sort merge beats",
    "hash join merge join",
    "sort merge sort networks",
    "streams merge windows",
    "unrelated filler words",
    "merge sort merge sort",
    "plain sort here",
]
LANGS = ["en", "en", "de", "de", "fr", "fr", "en", "de"]


@pytest.fixture(scope="module")
def rdr(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("collapse")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {"doc_id": list(range(len(DOCS))), "text": DOCS, "lang": LANGS}
        ),
        str(tmp / "d.parquet"),
    )
    idx = str(tmp / "idx")
    build_index(
        str(tmp / "d.parquet"),
        idx,
        key_col="doc_id",
        id_col="doc_id",
        ts_col=None,
        keyword_cols=("lang",),
        stored_cols=["text", "lang"],
        num_buckets=2,
        positions=True,
    )
    return IndexReader(idx)


def test_collapse_vs_brute(rdr):
    rows = rdr.search_collapse("merge sort", "lang", k=10)
    base = dict(rdr.search("merge sort", k=100))
    best = {}
    for d, s in sorted(base.items(), key=lambda ds: (-ds[1], ds[0])):
        best.setdefault(LANGS[d], (d, s))
    want = sorted(best.values(), key=lambda ds: (-ds[1], ds[0]))
    assert [(d, s) for d, s, _ in rows] == want
    assert [g for _, _, g in rows] == [LANGS[d] for d, _ in want]
    # one hit per collapse value
    assert len({g for _, _, g in rows}) == len(rows)


def test_collapse_dsl(rdr):
    resp = run_query(
        rdr,
        {
            "query": {"match": {"text": "merge sort"}},
            "collapse": {"field": "lang"},
            "size": 10,
        },
    )
    native = rdr.search_collapse("merge sort", "lang", k=10)
    assert [(h["_id"], h["_score"]) for h in resp["hits"]["hits"]] == [
        (int(d), s) for d, s, _ in native
    ]


def test_rescore_vs_brute(rdr):
    got = rdr.rescore(
        "merge sort", "merge sort", window_size=5,
        query_weight=1.0, rescore_weight=2.0, k=5,
    )
    base = rdr.search("merge sort", k=5)
    ph = dict(rdr.search_phrase("merge sort", k=100))
    want = sorted(
        ((d, 1.0 * s + 2.0 * ph.get(d, 0.0)) for d, s in base),
        key=lambda ds: (-ds[1], ds[0]),
    )
    assert [(d, pytest.approx(s, abs=1e-12)) for d, s in want] == got


def test_rescore_window_limits(rdr):
    # a doc outside the window cannot enter the result
    all_hits = [d for d, _ in rdr.search("merge sort", k=100)]
    got = rdr.rescore("merge sort", "merge sort", window_size=2, k=10)
    assert {d for d, _ in got} == set(all_hits[:2])


def test_rescore_dsl(rdr):
    resp = run_query(
        rdr,
        {
            "query": {"match": {"text": "merge sort"}},
            "rescore": {
                "window_size": 5,
                "query": {
                    "rescore_query": {"match_phrase": {"text": "merge sort"}},
                    "query_weight": 1.0,
                    "rescore_query_weight": 2.0,
                },
            },
            "size": 5,
        },
    )
    native = rdr.rescore(
        "merge sort", "merge sort", window_size=5,
        query_weight=1.0, rescore_weight=2.0, k=5,
    )
    assert [(h["_id"], h["_score"]) for h in resp["hits"]["hits"]] == [
        (int(d), s) for d, s in native
    ]


def test_explain_matches_search(rdr):
    hits = rdr.search("merge sort", k=3)
    for d, s in hits:
        ex = rdr.explain("merge sort", d)
        assert ex["matched"]
        assert ex["value"] == s  # identical float chain
        assert {p["term"] for p in ex["details"]} <= {"merge", "sort"}
        for p in ex["details"]:
            toks = TOK.findall(DOCS[d].lower())
            assert p["tf"] == toks.count(p["term"])
            assert p["dl"] == len(toks)


def test_explain_no_match(rdr):
    ex = rdr.explain("zzz", 0)
    assert not ex["matched"] and ex["value"] == 0.0


def test_count_endpoints(rdr):
    out = run_count(rdr, {"query": {"match": {"text": "merge sort"}}})
    want = sum(
        1
        for d in DOCS
        if {"merge", "sort"} & set(TOK.findall(d.lower()))
    )
    assert out["count"] == want
    assert run_count(rdr, {"query": {"match_all": {}}})["count"] == len(DOCS)
    assert (
        run_count(rdr, {"query": {"term": {"lang": "de"}}})["count"]
        == LANGS.count("de")
    )
    b = run_count(
        rdr,
        {
            "query": {
                "bool": {
                    "must": [{"match": {"text": "merge"}}],
                    "filter": [{"term": {"lang": "en"}}],
                }
            }
        },
    )
    want_b = sum(
        1
        for i, d in enumerate(DOCS)
        if "merge" in TOK.findall(d.lower()) and LANGS[i] == "en"
    )
    assert b["count"] == want_b


def test_source_and_highlight(rdr):
    resp = run_query(
        rdr,
        {
            "query": {"match": {"text": "merge sort"}},
            "size": 3,
            "_source": ["text", "lang"],
            "highlight": {"fields": {"text": {}}},
        },
    )
    for h in resp["hits"]["hits"]:
        d = h["_id"]
        assert h["_source"]["text"] == DOCS[d]
        assert h["_source"]["lang"] == LANGS[d]
        hl = h["highlight"]["text"][0]
        # every query term occurrence is wrapped; stripping tags
        # restores the stored text
        assert hl.replace("<em>", "").replace("</em>", "") == DOCS[d]
        for t in ("merge", "sort"):
            if t in TOK.findall(DOCS[d].lower()):
                assert f"<em>{t}</em>" in hl


def test_source_all_columns(rdr):
    resp = run_query(
        rdr,
        {"query": {"match": {"text": "merge"}}, "size": 1, "_source": True},
    )
    src = resp["hits"]["hits"][0]["_source"]
    assert {"text", "lang"} <= set(src)


def test_collapse_over_bool(rdr):
    """collapse over a scored bool query keeps the best-ranked doc per
    collapse key, matching a brute-force group-best computation."""
    from raybm25.query.dsl import run_query

    body_q = {
        "bool": {
            "must": [{"match": {"text": "merge"}}],
            "filter": [{"term": {"lang": "en"}}],
        }
    }
    full = run_query(rdr, {"size": 100, "query": body_q})["hits"]["hits"]
    got = run_query(
        rdr, {"size": 10, "query": body_q, "collapse": {"field": "lang"}}
    )["hits"]["hits"]
    # all survivors are en here, so exactly one hit: the global best
    assert len(got) == 1 and got[0]["_id"] == full[0]["_id"]


def test_rescore_over_bool(rdr):
    """rescore over a scored bool re-ranks the bool window by the same
    phrase kernel plain-match rescore uses."""
    from raybm25.query.dsl import run_query

    body_q = {
        "bool": {
            "must": [{"match": {"text": "merge sort"}}],
            "filter": [{"term": {"lang": "en"}}],
        }
    }
    base = run_query(rdr, {"size": 10, "query": body_q})["hits"]["hits"]
    got = run_query(
        rdr,
        {
            "size": 10,
            "query": body_q,
            "rescore": {
                "window_size": 10,
                "query": {
                    "rescore_query": {
                        "match_phrase": {"text": "merge sort"}
                    },
                    "rescore_query_weight": 5.0,
                },
            },
        },
    )["hits"]["hits"]
    assert sorted(h["_id"] for h in got) == sorted(h["_id"] for h in base)
    # doc 0 "merge sort is stable merge" contains the exact phrase and
    # must outrank doc 6 "merge sort merge sort"? both contain it —
    # every phrase-bearing doc must outrank every phrase-free doc
    phrase_docs = {0, 6}
    got_ids = [h["_id"] for h in got]
    with_phrase = [i for i in got_ids if i in phrase_docs]
    without = [i for i in got_ids if i not in phrase_docs]
    assert all(
        got_ids.index(a) < got_ids.index(b)
        for a in with_phrase
        for b in without
    )
