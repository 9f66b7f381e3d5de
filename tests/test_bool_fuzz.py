"""Differential fuzz of the bool-query DSL: hypothesis generates
random must/should/must_not/filter/minimum_should_match combinations
and every hit list is checked against a brute-force per-doc evaluator
built on OracleIndex term statistics — independent of both the engine
internals and the contract's SQL oracles. Semantics under test are
the documented search_bool contract (query/engine.py): must = AND +
BM25; should = optional BM25 with >= msm DISTINCT matches (msm
defaults to 1 only when there are no must terms); must_not = ANY
excludes, unscored; filter = unscored restriction; score = sum of
qtf-weighted BM25 over must+should occurrences."""

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from raybm25.analysis import tokenize
from raybm25.index.build import build_index
from raybm25.oracle import OracleIndex
from raybm25.query.dsl import run_query

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
VOCAB = ["merge", "join", "stream", "sort", "fast", "slow", "window", "zzzmissing"]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import pyarrow.parquet as pq

    tmp = tmp_path_factory.mktemp("boolfuzz")
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(DOCS))),
                "text": DOCS,
                "lang": LANGS,
                "n": NS,
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
        sayt_cols=(),
        keyword_cols=("lang",),
        stored_cols=["text", "lang", "n"],
        num_buckets=2,
        k1=1.2,
        b=0.75,
    )
    oracle = OracleIndex({i: t for i, t in enumerate(DOCS)})
    # independent per-(term, doc) BM25 contribution table
    table: dict[tuple[str, int], float] = {}
    for term in VOCAB:
        for d, s in oracle.search(term, k=len(DOCS)):
            table[(term, d)] = s
    return out, table


def brute_force(table, must, should, must_not, flt_lang, flt_range, msm):
    """Ordered [(doc_id, score)] under the documented bool semantics."""
    mc, sc = Counter(must), Counter(should)
    effective_msm = msm if msm is not None else (0 if mc else 1)
    out = []
    for d, text in enumerate(DOCS):
        toks = set(tokenize(text))
        if mc and not all(t in toks for t in mc):
            continue
        if not mc:
            if not any(t in toks for t in sc):
                continue
        if sc and effective_msm > 0:
            if sum(1 for t in set(sc) if t in toks) < effective_msm:
                continue
        if any(t in toks for t in must_not):
            continue
        if flt_lang is not None and LANGS[d] != flt_lang:
            continue
        if flt_range is not None and not (flt_range[0] <= NS[d] < flt_range[1]):
            continue
        qtf = mc + sc
        score = sum(qtf[t] * table.get((t, d), 0.0) for t in sorted(qtf))
        out.append((d, score))
    out.sort(key=lambda p: (-p[1], p[0]))
    return out


terms_list = lambda lo, hi: st.lists(
    st.sampled_from(VOCAB), min_size=lo, max_size=hi
)


@settings(max_examples=120, deadline=None)
@given(
    must=terms_list(0, 3),
    should=terms_list(0, 3),
    must_not=terms_list(0, 2),
    flt_lang=st.sampled_from([None, "en", "de", "fr", "xx"]),
    flt_range=st.sampled_from([None, (0, 5), (3, 8), (9, 10), (0, 100)]),
    msm=st.sampled_from([None, 0, 1, 2, 3]),
)
def test_bool_dsl_matches_brute_force(
    built, must, should, must_not, flt_lang, flt_range, msm
):
    out, table = built
    spec: dict = {}
    if must:
        spec["must"] = [{"match": {"text": t}} for t in must]
    if should:
        spec["should"] = [{"match": {"text": t}} for t in should]
    if must_not:
        spec["must_not"] = [{"match": {"text": t}} for t in must_not]
    filters = []
    if flt_lang is not None:
        filters.append({"term": {"lang": flt_lang}})
    if flt_range is not None:
        filters.append(
            {"range": {"n": {"gte": flt_range[0], "lt": flt_range[1]}}}
        )
    if filters:
        spec["filter"] = filters
    if msm is not None:
        spec["minimum_should_match"] = msm
    want = (
        brute_force(
            table,
            must,
            should,
            must_not,
            None if flt_lang == "xx" else flt_lang,
            flt_range,
            msm,
        )
        if not (flt_lang == "xx")
        else []
    )
    if flt_lang == "xx":
        want = []  # keyword filter on an absent value matches nothing
    if not must and not should:
        if not must_not and (flt_lang is not None or flt_range is not None):
            # filter-only bool: the filter set itself, score 0.0
            # (OpenSearch filter context contributes no score),
            # doc_id order
            want = [
                (d, 0.0)
                for d in range(len(DOCS))
                if (flt_lang is None or LANGS[d] == flt_lang)
                and (
                    flt_range is None
                    or flt_range[0] <= NS[d] < flt_range[1]
                )
            ]
            if flt_lang == "xx":
                want = []
        else:
            # engine contract otherwise: no scoring clause -> no hits
            want = []
    resp = run_query(out, {"query": {"bool": spec}, "size": 50})
    got = [(int(h["_id"]), float(h["_score"])) for h in resp["hits"]["hits"]]
    assert [d for d, _ in got] == [d for d, _ in want], (spec, got, want)
    for (_, gs), (_, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-9, abs_tol=1e-12), (spec, got, want)
