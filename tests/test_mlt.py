"""More-like-this: term selection vs brute force and the search
composition invariant, plus typed BatchSearcher dispatch."""

import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.query.engine import BatchSearcher, IndexReader

TOK = re.compile(r"[a-z0-9]+")

DOCS = [
    (0, "merge join merge stream fast merge"),
    (1, "merge sort slow path"),
    (2, "join stream window stream"),
    (3, "rare singleton uniqueword here"),
    (4, "merge join stream"),
    (5, "fast path window sort"),
]


@pytest.fixture(scope="module")
def rdr(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mlt")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"doc_id": [i for i, _ in DOCS], "text": [t for _, t in DOCS],
                  "lang": ["en", "de", "en", "fr", "en", "de"]}),
        str(tmp / "d.parquet"),
    )
    idx = str(tmp / "idx")
    build_index(str(tmp / "d.parquet"), idx, key_col="doc_id", id_col="doc_id",
                ts_col=None, keyword_cols=("lang",), num_buckets=2)
    return IndexReader(idx), idx


def _brute_mlt_terms(doc, max_terms=25, min_df=2):
    toked = [TOK.findall(t.lower()) for _, t in DOCS]
    tfs = {}
    for t in toked[doc]:
        tfs[t] = tfs.get(t, 0) + 1
    n = len(DOCS)
    rows = []
    for t, tf in tfs.items():
        df = sum(t in set(v) for v in toked)
        if df < min_df:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        rows.append((tf * idf, t, tf, df))
    rows.sort(key=lambda r: (-r[0], r[1]))
    return [(t, tf, df) for _, t, tf, df in rows[:max_terms]]


def test_mlt_terms_vs_brute(rdr):
    r, _ = rdr
    for doc in (0, 1, 2):
        assert r.mlt_terms(doc) == _brute_mlt_terms(doc), doc


def test_mlt_min_doc_freq_drops_singletons(rdr):
    r, _ = rdr
    terms = {t for t, _, _ in r.mlt_terms(3)}
    assert "uniqueword" not in terms and "singleton" not in terms
    all_terms = {t for t, _, _ in r.mlt_terms(3, min_doc_freq=1)}
    assert "uniqueword" in all_terms


def test_mlt_max_query_terms(rdr):
    r, _ = rdr
    top2 = r.mlt_terms(0, max_query_terms=2)
    assert top2 == _brute_mlt_terms(0)[:2]


def test_more_like_this_is_search_composition(rdr):
    r, _ = rdr
    sel = r.mlt_terms(0)
    expect = [h for h in r.search(" ".join(t for t, _, _ in sel), k=11)
              if h[0] != 0][:10]
    assert r.more_like_this(0, k=10) == expect
    assert all(d != 0 for d, _ in r.more_like_this(0, k=10))
    with_self = r.more_like_this(0, k=10, include_self=True)
    assert with_self[0][0] == 0  # the doc is most like itself


def test_batch_searcher_typed_dispatch(rdr):
    r, idx = rdr
    bs = BatchSearcher(idx, k=5)
    batch = pd.DataFrame(
        {
            "query_id": [1, 2],
            "query_text": ["merge stream", "merge stream"],
            "kind": ["match", "filtered"],
            "filter_field": [None, "lang"],
            "filter_value": [None, "en"],
        }
    )
    out = bs(batch)
    m = out[out["query_id"] == 1]
    f = out[out["query_id"] == 2]
    assert list(zip(m["doc_id"].astype("int64"), m["score"])) == [
        (np.int64(d), s) for d, s in r.search("merge stream", k=5)
    ]
    assert list(zip(f["doc_id"].astype("int64"), f["score"])) == [
        (np.int64(d), s) for d, s in r.search_filtered("merge stream", "lang", "en", k=5)
    ]


def test_batch_searcher_dsl_dispatch(rdr):
    import json

    r, idx = rdr
    bs = BatchSearcher(idx, k=5)
    body = {
        "query": {
            "bool": {
                "must": [{"match": {"text": "merge stream"}}],
                "filter": [{"term": {"lang": "en"}}],
            }
        }
    }
    batch = pd.DataFrame(
        {
            "query_id": [7],
            "query_text": [json.dumps(body)],
            "kind": ["dsl"],
        }
    )
    out = bs(batch)
    want = r.search_bool(must="merge stream", filter_term=("lang", "en"), k=5)
    assert list(zip(out["doc_id"].astype("int64"), out["score"])) == [
        (np.int64(d), s) for d, s in want
    ]


def test_batch_searcher_warm_seed_parity(rdr):
    """The decode-once warm broadcast (IndexReader.warm_cache -> ray.put
    -> BatchSearcher(warm=...)) must change only WHERE postings decode,
    never scores: seeded and unseeded actors return identical hits, and
    the seeded reader serves the warmed terms from cache (no re-decode)."""
    import ray

    r, idx = rdr
    queries = ["merge stream", "fast path", "rare singleton"]
    warm = r.warm_cache(queries)
    assert warm, "warm set should contain the query terms' postings"
    warm_ref = ray.put(warm)

    cold = BatchSearcher(idx, k=5)
    hot = BatchSearcher(idx, k=5, warm=warm_ref)
    # every warmed term is already resident in the hot actor's cache
    for t in warm:
        assert t in hot.reader._term_cache
    batch = pd.DataFrame(
        {
            "query_id": [1, 2, 3],
            "query_text": queries,
            "kind": ["match"] * 3,
            "filter_field": [None] * 3,
            "filter_value": [None] * 3,
        }
    )
    a = cold(batch).reset_index(drop=True)
    b = hot(batch).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_serving_pool_matches_direct(rdr):
    """ServingPool (persistent actors + windowed round-robin) returns
    exactly what a direct BatchSearcher call returns, in submission
    order, including with more batches than the in-flight window."""
    from raybm25.query.engine import ServingPool

    r, idx = rdr
    direct = BatchSearcher(idx, k=5)
    pool = ServingPool(idx, n_actors=2, k=5, inflight_per_actor=1)
    try:
        pool.warm_up()
        batches = [
            pd.DataFrame(
                {
                    "query_id": [i],
                    "query_text": [q],
                    "kind": ["match"],
                    "filter_field": [None],
                    "filter_value": [None],
                }
            )
            for i, q in enumerate(
                ["merge stream", "fast path", "rare singleton", "join",
                 "window sort", "merge", "stream", "uniqueword"]
            )
        ]
        got = pool.score(batches)
        assert len(got) == len(batches)
        for b, g in zip(batches, got):
            pd.testing.assert_frame_equal(
                g.reset_index(drop=True), direct(b).reset_index(drop=True)
            )
    finally:
        pool.shutdown()
