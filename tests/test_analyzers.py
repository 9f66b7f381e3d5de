"""Analyzer chains: stopword filter, S/Porter stemmers, query-time
synonym groups (OpenSearch custom analyzers + SynonymQuery — the
configurable face of SURVEY.md §2.B B1)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raybm25.analysis import (
    STOPWORDS_EN,
    analyze,
    analyzer_spec,
    analyzer_version,
    arrow_tokenize,
    filter_tokens_np,
    porter_stem,
    s_stem,
    tokenize,
)

# input -> stem pairs from Porter 1980's worked examples (one per
# rule family, steps 1a-5b)
PORTER_PAIRS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "hopping": "hop", "tanned": "tan", "falling": "fall", "hissing": "hiss",
    "fizzed": "fizz", "failing": "fail", "filing": "file", "happy": "happi",
    "sky": "sky", "relational": "relat", "conditional": "condit",
    "rational": "ration", "valenci": "valenc", "hesitanci": "hesit",
    "digitizer": "digit", "conformabli": "conform", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl", "triplicate": "triplic", "formative": "form",
    "formalize": "formal", "electriciti": "electr", "electrical": "electr",
    "hopeful": "hope", "goodness": "good", "revival": "reviv",
    "allowance": "allow", "inference": "infer", "airliner": "airlin",
    "gyroscopic": "gyroscop", "adjustable": "adjust", "defensible": "defens",
    "irritant": "irrit", "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "homologou": "homolog",
    "communism": "commun", "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect", "bowdlerize": "bowdler",
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
}


def test_porter_canonical_pairs():
    for w, want in PORTER_PAIRS.items():
        assert porter_stem(w) == want, (w, porter_stem(w), want)


def test_porter_idempotent_on_short_words():
    for w in ("a", "is", "be", "on"):
        assert porter_stem(w) == w


def test_s_stem_rules():
    # Harman 1991: ies->y (guarded), es->e (guarded), s-> (guarded)
    assert s_stem("ponies") == "pony"
    assert s_stem("classes") == "classe"
    assert s_stem("shoes") == "shoes"  # -oes guard
    assert s_stem("cats") == "cat"
    assert s_stem("bus") == "bus"  # -us guard
    assert s_stem("glass") == "glass"  # -ss guard
    assert s_stem("table") == "table"


def test_analyze_chain_order():
    spec = analyzer_spec(stopwords="_english_", stemmer="porter")
    assert analyze("The ponies are running", spec) == ["poni", "run"]
    # default chain: plain tokenize
    assert analyze("The ponies", None) == tokenize("The ponies")
    # stopwords only
    assert analyze("the cat", analyzer_spec(stopwords=["the"])) == ["cat"]


def test_analyzer_version_strings():
    assert analyzer_version(None) == "ascii-alnum-lower/1"
    assert (
        analyzer_version(analyzer_spec(stopwords="_english_", stemmer="s"))
        == "ascii-alnum-lower/1+stop:english+stem:s"
    )
    with pytest.raises(ValueError):
        analyzer_spec(stemmer="snowball")


def test_filter_tokens_np_matches_per_doc_analyze():
    """The vectorized dictionary-level filter must equal the per-doc
    python chain token-for-token, including dl decrements."""
    texts = [
        "The ponies are running fast",
        "a cat sat on the mat",
        "",
        "the the the",
        "running runs ran",
    ]
    for spec in (
        None,
        analyzer_spec(stopwords="_english_"),
        analyzer_spec(stemmer="porter"),
        analyzer_spec(stopwords="_english_", stemmer="s"),
        analyzer_spec(stopwords="_english_", stemmer="porter"),
    ):
        tid, terms, doc_pos, dl = filter_tokens_np(
            *arrow_tokenize(pa.array(texts)), spec
        )
        got = [[] for _ in texts]
        for t, p in zip(tid, doc_pos):
            got[p].append(terms[t])
        want = [analyze(t, spec) for t in texts]
        assert [sorted(g) for g in got] == [sorted(w) for w in want]
        assert dl.tolist() == [len(w) for w in want]


@pytest.fixture(scope="module")
def stem_index(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("analyzer_idx")
    tbl = pa.table(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "text": [
                "The ponies are running fast",
                "a pony runs",
                "cats and dogs",
                "the cat sat on the mat",
                "running shoes for sale",
                "no animals here",
            ],
        }
    )
    src = str(tmp / "docs.parquet")
    pq.write_table(tbl, src)
    from raybm25.index.build import build_index

    idx = str(tmp / "idx")
    build_index(
        src,
        idx,
        key_col="doc_id",
        id_col="doc_id",
        ts_col=None,
        num_buckets=2,
        postings_shards=4,
        analyzer=analyzer_spec(stopwords="_english_", stemmer="porter"),
    )
    return idx


def test_analyzer_index_end_to_end(stem_index):
    from raybm25.query.engine import IndexReader

    r = IndexReader(stem_index)
    assert r.manifest["analyzer"] == "ascii-alnum-lower/1+stop:english+stem:porter"
    # plural and singular query forms retrieve the same docs/scores
    assert r.search("ponies", k=10) == r.search("pony", k=10)
    assert {d for d, _ in r.search("pony", k=10)} == {0, 1}
    # 'running'/'runs' both stem to 'run'
    assert {d for d, _ in r.search("run", k=10)} == {0, 1, 4}
    # stopwords match nothing and score nothing
    assert r.search("the", k=10) == []
    # dl counts surviving tokens only: doc 3 has 3 content tokens
    import pyarrow.parquet as _pq

    docs = _pq.read_table(os.path.join(stem_index, "docs"))
    by_id = dict(
        zip(docs.column("doc_id").to_pylist(), docs.column("dl").to_pylist())
    )
    assert by_id[3] == 3  # cat sat mat
    assert by_id[0] == 3  # poni run fast


def test_analyzer_index_update_recomputes_analyzed_dl(stem_index, tmp_path):
    """Partial update through the analyzer index must recompute dl with
    the same chain (stopwords excluded)."""
    import shutil

    from raybm25.loader.update import apply_updates
    from raybm25.query.engine import IndexReader

    idx = str(tmp_path / "idx_copy")
    shutil.copytree(stem_index, idx)
    res = apply_updates(
        idx,
        pa.table({"doc_id": pa.array([3], pa.int64()),
                  "text": ["the running ponies"]}),
        id_field="doc_id",
    )
    assert res["updated"] == 1
    r = IndexReader(idx)
    import pyarrow.parquet as _pq

    docs = _pq.read_table(os.path.join(idx, "docs"))
    by_id = dict(
        zip(docs.column("doc_id").to_pylist(), docs.column("dl").to_pylist())
    )
    assert by_id[3] == 2  # run poni ('the' dropped)
    # the rebuilt postings serve the stemmed family
    assert 3 in {d for d, _ in r.search("pony", k=10)}


def test_synonym_query_semantics(ray_session, tmp_path):
    """SynonymQuery: df = max member df, tf = sum member tfs; absent
    members are ignored; single-member group == plain single-term
    BM25."""
    tbl = pa.table(
        {
            "doc_id": pa.array(range(5), pa.int64()),
            "text": [
                "car car truck",
                "auto repair",
                "car auto auto",
                "bike lane",
                "truck stop",
            ],
        }
    )
    src = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, src)
    from raybm25.index.build import build_index
    from raybm25.query.engine import IndexReader

    idx = str(tmp_path / "idx")
    build_index(
        src, idx, key_col="doc_id", id_col="doc_id", ts_col=None,
        num_buckets=2, postings_shards=4,
    )
    r = IndexReader(idx)
    hits = dict(r.search_synonym(["car", "auto"], k=10))
    assert set(hits) == {0, 1, 2}
    # blended by hand: df = max(df_car=2, df_auto=2) = 2
    k1, b, avgdl, n = r.k1, r.b, r.avgdl, r.n_docs
    import math

    def blended(tf, dl):
        idf = math.log(1.0 + (n - 2 + 0.5) / (2 + 0.5))
        return idf * (tf / (tf + k1 * (1.0 - b + b * dl / avgdl)))

    assert hits[0] == pytest.approx(blended(2, 3), rel=0, abs=0)
    assert hits[2] == pytest.approx(blended(3, 3), rel=0, abs=0)
    # absent members don't disturb the union
    assert r.search_synonym(["car", "auto", "zeppelin"], k=10) == r.search_synonym(
        ["car", "auto"], k=10
    )
    # single-member group == plain term BM25
    assert r.search_synonym(["truck"], k=10) == r.search("truck", k=10)
    # filter-context face
    assert r.synonym_docs(["car", "auto"]).tolist() == [0, 1, 2]


def test_synonym_dsl_kinds(ray_session, tmp_path):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(3), pa.int64()),
            "text": ["car wash", "auto shop", "bike shed"],
        }
    )
    src = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, src)
    from raybm25.index.build import build_index
    from raybm25.query.dsl import run_query

    idx = str(tmp_path / "idx")
    build_index(
        src, idx, key_col="doc_id", id_col="doc_id", ts_col=None,
        num_buckets=2, postings_shards=4,
    )
    resp = run_query(idx, {"query": {"synonym": {"text": ["car", "auto"]}}})
    assert {h["_id"] for h in resp["hits"]["hits"]} == {0, 1}
    # filter context via bool.filter: constant scores
    resp = run_query(
        idx,
        {
            "query": {
                "bool": {
                    "must": [{"match": {"text": "shop"}}],
                    "filter": [{"synonym": {"text": ["car", "auto"]}}],
                }
            }
        },
    )
    assert [h["_id"] for h in resp["hits"]["hits"]] == [1]


def test_stopword_set_is_lucene_classic():
    assert "the" in STOPWORDS_EN and "with" in STOPWORDS_EN
    assert len(STOPWORDS_EN) == 33


def test_combined_fields_bm25f(ray_session, tmp_path):
    """combined_fields = BM25F simple combination: hand-check one doc's
    score; field^boost DSL syntax; single field w=1 == plain search."""
    import math

    tbl = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": [
                "alpha beta beta",
                "alpha gamma",
                "delta delta delta",
                "beta gamma",
            ],
            "title": ["alpha", "beta beta", "gamma", "delta"],
        }
    )
    src = str(tmp_path / "d.parquet")
    pq.write_table(tbl, src)
    from raybm25.index.build import build_index
    from raybm25.query.dsl import run_query
    from raybm25.query.engine import IndexReader

    idx = str(tmp_path / "idx")
    build_index(
        src, idx, key_col="doc_id", id_col="doc_id", ts_col=None,
        text_cols=("text", "title"), num_buckets=2, postings_shards=4,
    )
    r = IndexReader(idx)
    hits = dict(r.search_combined("beta", {"text": 1.0, "title": 2.0}, k=10))
    # candidates: docs with 'beta' in any field = {0, 1(title), 3}
    assert set(hits) == {0, 1, 3}
    # hand-score doc 0: tf~ = 1*2 + 2*0 = 2; dl~ = 1*3 + 2*1 = 5
    n = 4
    avgdl_t = (3 + 2 + 3 + 2) / 4
    avgdl_ti = (1 + 2 + 1 + 1) / 4
    avgdlc = 1.0 * avgdl_t + 2.0 * avgdl_ti
    df = 3
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    want0 = idf * (2.0 / (2.0 + r.k1 * (1.0 - r.b + r.b * 5.0 / avgdlc)))
    assert hits[0] == pytest.approx(want0, rel=0, abs=0)
    # doc 1: tf~ = 0 + 2*2 = 4; dl~ = 1*2 + 2*2 = 6
    want1 = idf * (4.0 / (4.0 + r.k1 * (1.0 - r.b + r.b * 6.0 / avgdlc)))
    assert hits[1] == pytest.approx(want1, rel=0, abs=0)
    # DSL face with ^boost syntax
    resp = run_query(
        idx,
        {
            "query": {
                "combined_fields": {"query": "beta", "fields": ["text", "title^2"]}
            },
            "size": 10,
        },
    )
    assert {h["_id"]: h["_score"] for h in resp["hits"]["hits"]} == hits
    # single field at weight 1 degenerates to plain BM25 over that field
    assert r.search_combined("alpha beta", ["text"], k=10) == r.search(
        "alpha beta", k=10
    )


def test_diversified_sampler(ray_session, tmp_path):
    """max_docs_per_value caps per-value picks in global rank order;
    shard_size bounds the sample."""
    tbl = pa.table(
        {
            "doc_id": pa.array(range(8), pa.int64()),
            "text": [
                "merge " * (8 - i) + "pad" for i in range(8)
            ],  # rank order = doc_id order
            "grp": ["a", "a", "a", "b", "b", "c", "c", "c"],
        }
    )
    src = str(tmp_path / "d.parquet")
    pq.write_table(tbl, src)
    from raybm25.index.build import build_index
    from raybm25.query.dsl import run_query

    idx = str(tmp_path / "idx")
    build_index(
        src, idx, key_col="doc_id", id_col="doc_id", ts_col=None,
        keyword_cols=("grp",), stored_cols=["text", "grp"],
        num_buckets=2, postings_shards=4,
    )
    resp = run_query(
        idx,
        {
            "query": {"match": {"text": {"query": "merge"}}},
            "size": 0,
            "aggs": {
                "smp": {
                    "diversified_sampler": {
                        "shard_size": 5, "field": "grp", "max_docs_per_value": 2,
                    },
                    "aggs": {"g": {"terms": {"field": "grp", "size": 10}}},
                }
            },
        },
    )
    s = resp["aggregations"]["smp"]
    # picks in rank order: 0(a) 1(a) [2 skipped] 3(b) 4(b) 5(c) -> full at 5
    assert s["doc_count"] == 5
    assert {b["key"]: b["doc_count"] for b in s["g"]["buckets"]} == {
        "a": 2, "b": 2, "c": 1,
    }


def test_analyze_endpoint_filter_chain():
    from raybm25.query.dsl import run_analyze

    out = run_analyze(
        {"text": "The ponies are running", "filter": ["stop", "porter_stem"]}
    )
    assert [(t["token"], t["position"]) for t in out["tokens"]] == [
        ("poni", 0), ("run", 1),
    ]
    out = run_analyze({"text": "the ponies", "filter": ["s_stem"]})
    assert [t["token"] for t in out["tokens"]] == ["the", "pony"]
    with pytest.raises(ValueError):
        run_analyze({"text": "x", "filter": ["snowball"]})
    with pytest.raises(ValueError):
        run_analyze({"text": "x", "filter": ["s_stem", "porter_stem"]})
    # default path unchanged
    assert [t["token"] for t in run_analyze({"text": "A b"})["tokens"]] == ["a", "b"]
