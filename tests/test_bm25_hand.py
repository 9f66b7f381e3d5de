"""BM25 formula against hand-computed values (SURVEY.md §5 item 1) —
independent of both the engine and the oracle implementations."""

import math

import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.query.engine import IndexReader


def test_bm25_hand_computed(ray_session, tmp_path):
    import pyarrow.parquet as pq

    # corpus: 3 docs; term 'cat' appears in docs 0 (tf=2) and 1 (tf=1)
    docs = ["cat cat dog", "cat bird", "dog dog dog bird"]
    pq.write_table(
        pa.table({"doc_id": [0, 1, 2], "text": docs}), str(tmp_path / "d.parquet")
    )
    idx = str(tmp_path / "idx")
    build_index(str(tmp_path / "d.parquet"), idx, key_col="doc_id", id_col="doc_id",
                ts_col=None, num_buckets=2)
    r = IndexReader(idx)

    # by hand: N=3, dl=[3,2,4], avgdl=3; df(cat)=2
    # idf = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6)
    # norm(tf,dl) = tf / (tf + 1.2*(0.25 + 0.75*dl/3))
    idf = math.log(1.6)
    s0 = idf * 2 / (2 + 1.2 * (0.25 + 0.75 * 3 / 3))  # doc 0: tf=2, dl=3
    s1 = idf * 1 / (1 + 1.2 * (0.25 + 0.75 * 2 / 3))  # doc 1: tf=1, dl=2
    hits = r.search("cat", 10)
    assert [d for d, _ in hits] == [0, 1]
    assert hits[0][1] == pytest.approx(s0, abs=1e-12)
    assert hits[1][1] == pytest.approx(s1, abs=1e-12)


def test_partitioning_invariance(ray_session, tmp_path):
    """Same corpus, different partitioning (bucket/shard counts) ->
    identical search results and corpus stats (SURVEY §5 item 5)."""
    import pyarrow.parquet as pq

    from raybm25.fixtures import make_pages, make_queries

    pages = make_pages(n_rows=300, seed=3)
    src = str(tmp_path / "p.parquet")
    pq.write_table(pages, src)
    rs = []
    for nb, ns, rb in [(2, 4, 1), (16, 64, 4)]:
        idx = str(tmp_path / f"idx_{nb}")
        build_index(src, idx, key_col="url", ts_col="warc_ts", extract_html=True,
                    num_buckets=nb, postings_shards=ns, range_buckets=rb)
        rs.append(IndexReader(idx))
    assert rs[0].n_docs == rs[1].n_docs
    assert rs[0].avgdl == rs[1].avgdl
    for q in make_queries():
        assert rs[0].search(q["query_text"], q["k"]) == rs[1].search(q["query_text"], q["k"])


def test_search_filtered_and_phrase_error_paths(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from raybm25.index.build import build_index
    from raybm25.query.engine import IndexReader

    src = tmp_path / "d.parquet"
    pq.write_table(
        pa.table(
            {
                "url": ["a", "b"],
                "text": ["alpha beta gamma", "beta gamma delta"],
                "lang": ["en", "de"],
            }
        ),
        str(src),
    )
    idx = str(tmp_path / "i")
    build_index(str(src), idx, key_col="url", ts_col=None,
                keyword_cols=("lang",), sayt_cols=("text",), num_buckets=2)
    r = IndexReader(idx)
    # phrase via shingles, both widths
    assert len(r.phrase_docs("text", "beta gamma")) == 2
    assert len(r.phrase_docs("text", "alpha beta gamma")) == 1
    assert len(r.phrase_docs("text", "gamma beta")) == 0  # order matters
    with pytest.raises(ValueError):
        r.phrase_docs("text", "only")  # 1 token: no shingle
    with pytest.raises(ValueError):
        r.phrase_docs("text", "a b c d")  # > shingle width
    with pytest.raises(ValueError):
        r.phrase_docs("lang", "en de")  # not a sayt field
    # filtered search returns [] (not an error) for unknown filter value
    assert r.search_filtered("beta", "lang", "zz", k=5) == []
