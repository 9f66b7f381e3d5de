"""intervals (ordered spans, max_gaps), significant_terms (JLH), and
terms+top_hits — each against brute force computed in-test."""

import itertools
import re

import numpy as np
import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.query.dsl import run_query
from raybm25.query.engine import IndexReader

TOK = re.compile(r"[a-z0-9]+")

DOCS = [
    "merge sort is stable",                      # adjacent
    "merge the quick sort",                      # gap 2
    "sort then merge",                           # reversed
    "merge alpha beta gamma delta sort",         # gap 4
    "sort sort merge merge sort",                # repeats both orders
    "merge only here",
    "sort only here",
    "nothing relevant",
    "merge b sort z merge sort",                 # multiple spans
]
LANGS = ["en", "en", "de", "de", "fr", "en", "de", "fr", "en"]


def brute_ordered(doc: str, terms: list[str], max_gaps: int) -> bool:
    toks = TOK.findall(doc.lower())
    pos = {t: [i for i, x in enumerate(toks) if x == t] for t in set(terms)}
    if any(not pos[t] for t in set(terms)):
        return False
    for combo in itertools.product(*(pos[t] for t in terms)):
        if all(combo[i] < combo[i + 1] for i in range(len(combo) - 1)):
            if combo[-1] - combo[0] - (len(terms) - 1) <= max_gaps:
                return True
    return False


@pytest.fixture(scope="module")
def rdr(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("intervals")
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
        stored_cols=["text", "lang"],
        num_buckets=2,
        positions=True,
    )
    return IndexReader(idx)


@pytest.mark.parametrize("gaps", [0, 1, 2, 4, -1])
def test_intervals_ordered_vs_brute(rdr, gaps):
    got = rdr.intervals_docs("merge sort", max_gaps=gaps, ordered=True).tolist()
    g = gaps if gaps >= 0 else 10**9
    want = [i for i, d in enumerate(DOCS) if brute_ordered(d, ["merge", "sort"], g)]
    assert got == want


def test_intervals_three_terms(rdr):
    got = rdr.intervals_docs("merge sort merge", max_gaps=3, ordered=True).tolist()
    want = [
        i
        for i, d in enumerate(DOCS)
        if brute_ordered(d, ["merge", "sort", "merge"], 3)
    ]
    assert got == want


def test_intervals_unordered_two_terms(rdr):
    got = rdr.intervals_docs("merge sort", max_gaps=0, ordered=False).tolist()
    want = sorted(
        set(
            i
            for i, d in enumerate(DOCS)
            if brute_ordered(d, ["merge", "sort"], 0)
            or brute_ordered(d, ["sort", "merge"], 0)
        )
    )
    assert got == want


def test_intervals_unordered_three_raises(rdr):
    with pytest.raises(ValueError, match="unordered"):
        rdr.intervals_docs("merge sort merge", ordered=False)


def test_intervals_gap0_equals_phrase(rdr):
    a = rdr.intervals_docs("merge sort", max_gaps=0, ordered=True).tolist()
    b = rdr.match_phrase("merge sort").tolist()
    assert a == b


def test_intervals_dsl(rdr):
    resp = run_query(
        rdr,
        {
            "query": {
                "intervals": {
                    "text": {
                        "all_of": {
                            "ordered": True,
                            "max_gaps": 2,
                            "intervals": [
                                {"match": {"query": "merge"}},
                                {"match": {"query": "sort"}},
                            ],
                        }
                    }
                }
            },
            "size": 100,
        },
    )
    native = rdr.intervals_docs("merge sort", max_gaps=2, ordered=True)
    assert [h["_id"] for h in resp["hits"]["hits"]] == native.tolist()


def _brute_sig(query_terms, min_doc_count=1):
    toksets = [set(TOK.findall(d.lower())) for d in DOCS]
    fg_docs = [i for i, ts in enumerate(toksets) if set(query_terms) & ts]
    n_fg, n_bg = len(fg_docs), len(DOCS)
    vocab = set().union(*toksets)
    rows = []
    for t in sorted(vocab):
        fg = sum(1 for i in fg_docs if t in toksets[i])
        bg = sum(1 for ts in toksets if t in ts)
        if fg < min_doc_count:
            continue
        fgp, bgp = fg / n_fg, bg / n_bg
        if fgp > bgp:
            rows.append((t, fg, bg, (fgp - bgp) * (fgp / bgp)))
    rows.sort(key=lambda r: (-r[3], r[0]))
    return rows


def test_significant_terms_vs_brute(rdr):
    got = rdr.significant_terms("merge sort", size=20, min_doc_count=1)
    want = _brute_sig(["merge", "sort"])[:20]
    assert [(t, f, b) for t, f, b, _ in got] == [(t, f, b) for t, f, b, _ in want]
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(w[3], abs=1e-12)


def test_significant_terms_min_doc_count(rdr):
    got = rdr.significant_terms("merge sort", size=20, min_doc_count=4)
    assert all(f >= 4 for _, f, _, _ in got)


def test_top_hits_vs_brute(rdr):
    rows = rdr.facet_top_hits("merge sort", "lang", per_group_k=2)
    base = dict(rdr.search("merge sort", k=100))
    by_lang: dict[str, list] = {}
    for d, s in base.items():
        by_lang.setdefault(LANGS[d], []).append((d, s))
    want = []
    for lang in sorted(by_lang):
        hits = sorted(by_lang[lang], key=lambda ds: (-ds[1], ds[0]))[:2]
        for k, (d, s) in enumerate(hits, 1):
            want.append((lang, k, d, s))
    assert [(g, k, d) for g, k, d, _ in rows] == [(g, k, d) for g, k, d, _ in want]
    for r, w in zip(rows, want):
        assert r[3] == pytest.approx(w[3], abs=1e-12)


def test_top_hits_dsl(rdr):
    resp = run_query(
        rdr,
        {
            "query": {"match": {"text": "merge sort"}},
            "aggs": {
                "by_lang": {
                    "terms": {"field": "lang"},
                    "aggs": {"best": {"top_hits": {"size": 1}}},
                }
            },
        },
    )
    buckets = resp["aggregations"]["by_lang"]["buckets"]
    native = rdr.facet_top_hits("merge sort", "lang", per_group_k=1)
    assert [(b["key"], b["best"]["hits"]["hits"][0]["_id"]) for b in buckets] == [
        (g, d) for g, _, d, _ in native
    ]


def test_significant_terms_dsl(rdr):
    resp = run_query(
        rdr,
        {
            "query": {"match": {"text": "merge sort"}},
            "aggs": {
                "sig": {
                    "significant_terms": {
                        "field": "text", "size": 5, "min_doc_count": 1
                    }
                }
            },
        },
    )
    native = rdr.significant_terms("merge sort", size=5, min_doc_count=1)
    assert [(b["key"], b["doc_count"]) for b in
            resp["aggregations"]["sig"]["buckets"]] == [
        (t, f) for t, f, _, _ in native
    ]


def test_significant_text_sampled_subset(rdr):
    """significant_text with a huge sample equals significant_terms;
    a small sample restricts the foreground to the top hits."""
    full = rdr.significant_terms("merge sort", size=10, min_doc_count=1)
    big = rdr.significant_text(
        "merge sort", size=10, sample_size=10**6, min_doc_count=1
    )
    assert big == full
    small = rdr.significant_text(
        "merge sort", size=10, sample_size=2, min_doc_count=1
    )
    # foreground counts can never exceed the sample size
    assert all(fg <= 2 for _, fg, _, _ in small)
    assert rdr.significant_text("zzznomatch", sample_size=5) == []
