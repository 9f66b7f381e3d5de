"""Bool queries, cursor pagination and terms facets against brute-force
semantics computed in-test (independent of both the engine internals and
the contract's SQL oracles). Reference behavior: OpenSearch bool query /
search_after / aggs.terms over the loader's default mappings
(/root/reference/opensearch_loader/loader.py:239-312)."""

import math
import re

import numpy as np
import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.query.engine import IndexReader

TOK = re.compile(r"[a-z0-9]+")

DOCS = [
    "merge join stream fast",          # 0 en
    "merge sort slow path",            # 1 en
    "join stream window",              # 2 de
    "merge merge stream",              # 3 en
    "sort only here",                  # 4 fr
    "merge join sort stream",          # 5 en
    "stream stream stream",            # 6 de
    "merge alone",                     # 7 en
    "join merge stream extra tokens here",  # 8 en
    "nothing relevant at all",         # 9 fr
]
LANGS = ["en", "en", "de", "en", "fr", "en", "de", "en", "en", "fr"]


def _toks(t):
    return TOK.findall(t.lower())


def _bm25_scores(terms):
    """doc_id -> score summed in sorted-term order (qtf=1 per term)."""
    toked = [_toks(t) for t in DOCS]
    n = len(DOCS)
    avgdl = sum(len(t) for t in toked) / n
    out = {}
    for term in sorted(set(terms)):
        df = sum(term in t for t in toked)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for d, t in enumerate(toked):
            tf = t.count(term)
            if tf:
                out[d] = out.get(d, 0.0) + idf * tf / (
                    tf + 1.2 * (0.25 + 0.75 * len(t) / avgdl)
                )
    return out


@pytest.fixture(scope="module")
def rdr(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("boolq")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {"doc_id": list(range(len(DOCS))), "text": DOCS, "lang": LANGS}
        ),
        str(tmp / "d.parquet"),
    )
    idx = str(tmp / "idx")
    build_index(
        str(tmp / "d.parquet"), idx, key_col="doc_id", id_col="doc_id",
        ts_col=None, keyword_cols=("lang",), num_buckets=2,
    )
    return IndexReader(idx)


def test_bool_must_and_must_not(rdr):
    # must=merge AND join; must_not=sort excludes docs 5; survivors 0, 8
    hits = rdr.search_bool(must="merge join", must_not="sort", k=10)
    ids = [d for d, _ in hits]
    assert set(ids) == {0, 8}
    ref = _bm25_scores(["merge", "join"])
    for d, s in hits:
        assert s == pytest.approx(ref[d], rel=1e-12)


def test_bool_should_scores_and_default_msm(rdr):
    # no must -> default minimum_should_match=1 (OpenSearch default)
    hits = rdr.search_bool(should="merge stream", k=20)
    ids = {d for d, _ in hits}
    toked = [_toks(t) for t in DOCS]
    want = {d for d, t in enumerate(toked) if "merge" in t or "stream" in t}
    assert ids == want
    ref = _bm25_scores(["merge", "stream"])
    for d, s in hits:
        assert s == pytest.approx(ref[d], rel=1e-12)


def test_bool_msm_two_of_three(rdr):
    hits = rdr.search_bool(should="merge join stream", minimum_should_match=2, k=20)
    toked = [_toks(t) for t in DOCS]
    want = {
        d
        for d, t in enumerate(toked)
        if sum(w in t for w in ("merge", "join", "stream")) >= 2
    }
    assert {d for d, _ in hits} == want


def test_bool_should_on_top_of_must_scores_but_not_filters(rdr):
    # must=merge alone selects all merge docs; should adds score only
    m = dict(rdr.search_bool(must="merge", k=20))
    ms = dict(rdr.search_bool(must="merge", should="join", k=20))
    assert set(m) == set(ms)
    ref = _bm25_scores(["merge", "join"])
    toked = [_toks(t) for t in DOCS]
    for d, s in ms.items():
        assert s == pytest.approx(ref[d], rel=1e-12)
        if "join" in toked[d]:
            assert s > m[d]


def test_bool_keyword_filter(rdr):
    hits = rdr.search_bool(must="stream", filter_term=("lang", "de"), k=20)
    assert {d for d, _ in hits} == {2, 6}


def test_bool_empty_cases(rdr):
    assert rdr.search_bool(k=5) == []
    assert rdr.search_bool(must="absentterm", k=5) == []
    assert rdr.search_bool(must="merge", filter_term=("lang", "zz"), k=5) == []
    # must_not of an absent term removes nothing
    a = rdr.search_bool(must="merge", k=20)
    b = rdr.search_bool(must="merge", must_not="absentterm", k=20)
    assert a == b


def test_search_after_pages_concatenate(rdr):
    full = rdr.search("merge stream", k=10)
    assert len(full) >= 6
    page1 = rdr.search("merge stream", k=3)
    cursor = (page1[-1][1], page1[-1][0])
    page2 = rdr.search_after("merge stream", after=cursor, k=3)
    cursor2 = (page2[-1][1], page2[-1][0])
    page3 = rdr.search_after("merge stream", after=cursor2, k=10)
    assert page1 + page2 + page3 == full


def test_search_after_score_ties(ray_session, tmp_path):
    """Identical docs -> identical scores; the cursor must break the
    tie by doc_id, not drop or duplicate tied hits."""
    import pyarrow.parquet as pq

    texts = ["same text here"] * 6 + ["other words entirely"]
    pq.write_table(
        pa.table({"doc_id": list(range(7)), "text": texts}),
        str(tmp_path / "d.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(str(tmp_path / "d.parquet"), idx, key_col="doc_id",
                id_col="doc_id", ts_col=None, num_buckets=2)
    r = IndexReader(idx)
    full = r.search("same text", k=10)
    assert len(full) == 6
    scores = {s for _, s in full}
    assert len(scores) == 1  # all tied
    page1 = r.search("same text", k=2)
    rest = r.search_after("same text", after=(page1[-1][1], page1[-1][0]), k=10)
    assert page1 + rest == full


def test_search_after_ties_uint64_ids(ray_session, tmp_path):
    """Hashed (url-keyed) doc ids are uint64; tied hits with ids above
    2^63 must survive the cursor comparison (regression: an int64 cast
    wrapped them negative and dropped them)."""
    import pyarrow.parquet as pq

    urls = [f"https://ex.com/{i}" for i in range(40)]
    pq.write_table(
        pa.table(
            {"url": urls, "warc_ts": ["20240101000000"] * 40,
             "text": ["same text here"] * 40}
        ),
        str(tmp_path / "d.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(str(tmp_path / "d.parquet"), idx, key_col="url",
                ts_col="warc_ts", num_buckets=4)
    r = IndexReader(idx)
    full = r.search("same text", k=40)
    assert len(full) == 40
    assert any(d >= 2**63 for d, _ in full)  # hashes straddle 2^63
    pgs, cur = [], None
    while len(pgs) < 40:
        p = (r.search("same text", k=7) if cur is None
             else r.search_after("same text", after=cur, k=7))
        assert p, f"pagination stalled at {len(pgs)}"
        pgs += p
        cur = (p[-1][1], p[-1][0])
    assert pgs == full


def test_search_after_exhausted(rdr):
    full = rdr.search("merge stream", k=50)
    last = full[-1]
    assert rdr.search_after("merge stream", after=(last[1], last[0]), k=5) == []


def test_facet_terms_counts(rdr):
    facets = rdr.facet_terms("merge join", "lang", size=10)
    toked = [_toks(t) for t in DOCS]
    match = [d for d, t in enumerate(toked) if "merge" in t or "join" in t]
    want = {}
    for d in match:
        want[LANGS[d]] = want.get(LANGS[d], 0) + 1
    assert dict(facets) == want
    # ordering: count desc, value asc
    counts = [c for _, c in facets]
    assert counts == sorted(counts, reverse=True)
    for (v1, c1), (v2, c2) in zip(facets, facets[1:]):
        if c1 == c2:
            assert v1 < v2


def test_facet_terms_size_and_empty(rdr):
    assert rdr.facet_terms("absentterm", "lang", size=5) == []
    top1 = rdr.facet_terms("merge join", "lang", size=1)
    assert len(top1) == 1
    assert top1[0] == rdr.facet_terms("merge join", "lang", size=10)[0]
