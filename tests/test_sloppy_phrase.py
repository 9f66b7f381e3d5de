"""Sloppy match_phrase (ordered greedy-chain, slop > 0) and the
multi_match phrase / phrase_prefix types, against brute force."""

import math
import re

import numpy as np
import pyarrow as pa
import pytest

from raybm25 import BM25_B, BM25_K1
from raybm25.index.build import build_index
from raybm25.query.dsl import run_query
from raybm25.query.engine import IndexReader

TOK = re.compile(r"[a-z0-9]+")

DOCS = [
    "merge sort is a classic merge based sort",
    "merge the quick sort result",
    "merge a b c sort now",
    "sort then merge later",
    "merge only here",
    "merge x sort merge y y sort",
    "nothing relevant",
]


@pytest.fixture(scope="module")
def rdr(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sloppy")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"doc_id": list(range(len(DOCS))), "text": DOCS}),
        str(tmp / "d.parquet"),
    )
    idx = str(tmp / "idx")
    build_index(
        str(tmp / "d.parquet"),
        idx,
        key_col="doc_id",
        id_col="doc_id",
        ts_col=None,
        num_buckets=2,
        positions=True,
    )
    return IndexReader(idx)


def _toks(s):
    return TOK.findall(s.lower())


def _greedy_tf(toks, qterms, slop):
    """The engine's documented semantics: each occurrence of the first
    term chains through every later term's earliest strictly-later
    occurrence; accepted iff total internal gap <= slop."""
    tf = 0
    for i, t in enumerate(toks):
        if t != qterms[0]:
            continue
        pos = i
        ok = True
        for qt in qterms[1:]:
            nxt = next((j for j in range(pos + 1, len(toks)) if toks[j] == qt), None)
            if nxt is None:
                ok = False
                break
            pos = nxt
        if ok and (pos - i - (len(qterms) - 1)) <= slop:
            tf += 1
    return tf


def _brute(query, slop, k=10):
    qterms = _toks(query)
    n = len(DOCS)
    dls = [len(_toks(d)) for d in DOCS]
    avgdl = sum(dls) / n
    idf_sum = 0.0
    for t in qterms:
        df = sum(t in _toks(d) for d in DOCS)
        idf_sum += math.log(1 + (n - df + 0.5) / (df + 0.5))
    hits = []
    for i, d in enumerate(DOCS):
        tf = _greedy_tf(_toks(d), qterms, slop)
        if tf:
            norm = tf / (tf + BM25_K1 * (1 - BM25_B + BM25_B * dls[i] / avgdl))
            hits.append((i, idf_sum * norm))
    hits.sort(key=lambda t: (-t[1], t[0]))
    return hits[:k]


@pytest.mark.parametrize("slop", [1, 2, 5])
def test_sloppy_two_terms_matches_brute(rdr, slop):
    hits = rdr.search_phrase("merge sort", k=10, slop=slop)
    exp = _brute("merge sort", slop)
    assert [d for d, _ in hits] == [d for d, _ in exp]
    for (_, s), (_, e) in zip(hits, exp):
        assert s == pytest.approx(e, rel=1e-12)


def test_sloppy_three_terms_matches_brute(rdr):
    hits = rdr.search_phrase("merge sort merge", k=10, slop=4)
    exp = _brute("merge sort merge", 4)
    assert [d for d, _ in hits] == [d for d, _ in exp]


def test_slop_zero_is_exact_phrase(rdr):
    assert rdr.search_phrase("merge sort", k=10, slop=0) == rdr.search_phrase(
        "merge sort", k=10
    )
    exact_set = set(np.asarray(rdr.match_phrase("merge sort")).tolist())
    assert exact_set == {d for d, _ in _brute("merge sort", 0)}


def test_slop_widens_monotonically(rdr):
    sets = [
        set(np.asarray(rdr.match_phrase("merge sort", slop=s)).tolist())
        for s in (0, 1, 3, 10)
    ]
    for a, b in zip(sets, sets[1:]):
        assert a <= b


def test_dsl_slop_passthrough(rdr):
    resp = run_query(
        rdr,
        {
            "size": 10,
            "query": {"match_phrase": {"text": {"query": "merge sort", "slop": 2}}},
        },
    )
    exp = _brute("merge sort", 2)
    assert [(h["_id"], h["_score"]) for h in resp["hits"]["hits"]] == [
        (d, pytest.approx(s, rel=1e-12)) for d, s in exp
    ]


def test_multi_match_phrase_type(rdr):
    # one text field in this index: phrase type == match_phrase scores
    resp = run_query(
        rdr,
        {
            "size": 10,
            "query": {
                "multi_match": {
                    "query": "merge sort",
                    "fields": ["text"],
                    "type": "phrase",
                    "slop": 1,
                }
            },
        },
    )
    exp = _brute("merge sort", 1)
    assert [h["_id"] for h in resp["hits"]["hits"]] == [d for d, _ in exp]


def test_multi_match_phrase_prefix_type(rdr):
    resp = run_query(
        rdr,
        {
            "size": 10,
            "query": {
                "multi_match": {
                    "query": "merge so",
                    "fields": ["text"],
                    "type": "phrase_prefix",
                }
            },
        },
    )
    # constant-score rewrite: docs where "merge" is adjacent to a
    # token starting with "so"
    exp = sorted(
        i
        for i, d in enumerate(DOCS)
        if any(
            a == "merge" and b.startswith("so")
            for a, b in zip(_toks(d), _toks(d)[1:])
        )
    )
    assert sorted(h["_id"] for h in resp["hits"]["hits"]) == exp
