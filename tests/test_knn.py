"""Exact k-NN over a stored vector column (the OpenSearch ``knn``
query / knn_vector field analog) against brute force computed in-test.
Covers the engine method, the DSL wiring, filtered search, and
tombstone exclusion after delete."""

import numpy as np
import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.query.dsl import run_query
from raybm25.query.engine import IndexReader

N, D = 40, 8


def _vectors():
    rng = np.random.default_rng(7)
    return rng.standard_normal((N, D)).astype(np.float32)


def _texts():
    return [f"doc number {i} about topic{i % 5}" for i in range(N)]


def _langs():
    return ["en" if i % 3 else "de" for i in range(N)]


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("knn")
    import pyarrow.parquet as pq

    vecs = _vectors()
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(N)),
                "text": _texts(),
                "lang": _langs(),
                "embedding": [v.tolist() for v in vecs],
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
        keyword_cols=("lang",),
        # text stored too: the hash-layout delete path re-tokenizes
        # surviving docs from the stored text
        stored_cols=["text", "lang", "embedding"],
        num_buckets=4,
    )
    return out


def _brute(vecs, q, k, keep=None):
    m = vecs.astype(np.float64)
    m = m / np.linalg.norm(m, axis=1)[:, None]
    qq = np.asarray(q, np.float64)
    scores = m @ (qq / np.linalg.norm(qq))
    ids = np.arange(len(vecs))
    if keep is not None:
        mask = np.isin(ids, keep)
        ids, scores = ids[mask], scores[mask]
    order = np.lexsort((ids, -scores))[:k]
    return list(zip(ids[order].tolist(), scores[order].tolist()))


def test_knn_matches_brute_force(idx):
    r = IndexReader(idx)
    vecs = _vectors()
    q = vecs[3]
    hits = r.knn_search("embedding", q, k=10)
    exp = _brute(vecs, q, 10)
    assert [d for d, _ in hits] == [d for d, _ in exp]
    for (_, s), (_, e) in zip(hits, exp):
        assert s == pytest.approx(e, rel=1e-6)  # float32 storage in parquet
    # top hit is the query's own vector, cosine 1.0
    assert hits[0][0] == 3
    assert hits[0][1] == pytest.approx(1.0, abs=1e-6)


def test_knn_filtered(idx):
    r = IndexReader(idx)
    vecs = _vectors()
    q = vecs[0]
    en = np.array([i for i in range(N) if _langs()[i] == "en"])
    filt = r.term_docs("lang", "en")
    hits = r.knn_search("embedding", q, k=5, filter_docs=filt)
    exp = _brute(vecs, q, 5, keep=en)
    assert [d for d, _ in hits] == [d for d, _ in exp]


def test_knn_dsl_with_filter(idx):
    r = IndexReader(idx)
    vecs = _vectors()
    resp = run_query(
        r,
        {
            "size": 5,
            "query": {
                "knn": {
                    "embedding": {
                        "vector": vecs[0].tolist(),
                        "k": 5,
                        "filter": {"term": {"lang": "en"}},
                    }
                }
            },
        },
    )
    en = np.array([i for i in range(N) if _langs()[i] == "en"])
    exp = _brute(vecs, vecs[0], 5, keep=en)
    assert [h["_id"] for h in resp["hits"]["hits"]] == [d for d, _ in exp]


def test_knn_excludes_deleted(idx, tmp_path):
    import shutil

    from raybm25.loader.delete import delete_docs

    work = str(tmp_path / "idx_del")
    shutil.copytree(idx, work)
    vecs = _vectors()
    q = vecs[3]
    top_before = IndexReader(work).knn_search("embedding", q, k=1)[0][0]
    assert top_before == 3
    delete_docs(work, [3])
    hits = IndexReader(work).knn_search("embedding", q, k=5)
    assert 3 not in [d for d, _ in hits]
    exp = _brute(vecs, q, 5, keep=np.array([i for i in range(N) if i != 3]))
    assert [d for d, _ in hits] == [d for d, _ in exp]


def test_knn_zero_query_vector(idx):
    r = IndexReader(idx)
    assert r.knn_search("embedding", np.zeros(D), k=5) == []


def test_loader_spec_knn_vector_field(ray_session, tmp_path):
    """A YAML index spec declaring a knn_vector field builds an index
    whose vector column is stored and knn-searchable (loader wiring:
    spec.VALID_TYPES / mapping_field_kinds 'vector' kind)."""
    import pyarrow.parquet as pq

    from raybm25.loader import Loader
    from raybm25.loader.spec import mapping_field_kinds, parse_mapping

    vecs = _vectors()
    src = str(tmp_path / "src.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(N)),
                "text": _texts(),
                "embedding": [v.tolist() for v in vecs],
            }
        ),
        src,
    )
    props = parse_mapping({"text": ["text"], "knn_vector": ["embedding"]})
    kinds = mapping_field_kinds(props)
    assert kinds["vector"] == ["embedding"]
    assert "embedding" in kinds["stored"]

    spec = {
        "indices": [
            {
                "index_name": "vecidx",
                "id_field": "doc_id",
                "mapping": {"text": ["text"], "knn_vector": ["embedding"]},
                "source": {"type": "parquet", "path": src},
            }
        ]
    }
    loader = Loader(spec, str(tmp_path / "root"))
    summary = loader.load()
    stats = {s["index"]: s for s in summary["indices"]}
    assert stats["vecidx"]["docs"] == N, stats

    r = IndexReader(str(tmp_path / "root" / "vecidx"))
    hits = r.knn_search("embedding", vecs[5], k=3)
    assert hits[0][0] == 5 and hits[0][1] == pytest.approx(1.0, abs=1e-6)


def test_knn_empty_filter_returns_empty(idx):
    """A filter clause matching zero docs yields empty hits, not an
    IndexError (OpenSearch filtered-knn semantics)."""
    r = IndexReader(idx)
    vecs = _vectors()
    assert r.knn_search("embedding", vecs[0], k=5, filter_docs=np.array([], np.uint64)) == []
    resp = run_query(
        r,
        {
            "size": 5,
            "query": {
                "knn": {
                    "embedding": {
                        "vector": vecs[0].tolist(),
                        "k": 5,
                        "filter": {"term": {"lang": "xx"}},
                    }
                }
            },
        },
    )
    assert resp["hits"]["hits"] == []


@pytest.fixture()
def idx_nulls(ray_session, tmp_path):
    """Index where some docs lack the vector field (null rows)."""
    import pyarrow.parquet as pq

    vecs = _vectors()
    emb = [v.tolist() if i % 4 else None for i, v in enumerate(vecs)]
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(N)),
                "text": _texts(),
                "lang": _langs(),
                "embedding": emb,
            }
        ),
        str(tmp_path / "d.parquet"),
    )
    out = str(tmp_path / "idx")
    build_index(
        str(tmp_path / "d.parquet"),
        out,
        key_col="doc_id",
        id_col="doc_id",
        ts_col=None,
        keyword_cols=("lang",),
        stored_cols=["text", "lang", "embedding"],
        num_buckets=4,
    )
    return out


def test_knn_skips_null_vectors(idx_nulls):
    """Docs indexed without the vector field are simply not knn
    candidates (OpenSearch skips them) instead of crashing the load."""
    r = IndexReader(idx_nulls)
    vecs = _vectors()
    with_vec = np.array([i for i in range(N) if i % 4])
    q = vecs[5]
    hits = r.knn_search("embedding", q, k=10)
    exp = _brute(vecs, q, 10, keep=with_vec)
    assert [d for d, _ in hits] == [d for d, _ in exp]
    for (_, s), (_, e) in zip(hits, exp):
        assert s == pytest.approx(e, rel=1e-6)
    # doc 0, 4, 8... (null vectors) never appear even with a huge k
    all_hits = [d for d, _ in r.knn_search("embedding", q, k=N)]
    assert not set(all_hits) & {i for i in range(N) if i % 4 == 0}


def test_knn_size_cap_routes_to_ivf(idx):
    """Oversized in-memory matrices fail fast with a pointer to the
    IVF path instead of OOMing the serving actor."""
    r = IndexReader(idx)
    r.knn_max_rows = 10  # below the 40 fixture vectors
    with pytest.raises(ValueError, match="ivf_"):
        r.knn_vectors("embedding")


def test_knn_ragged_dims_rejected(ray_session, tmp_path):
    import pyarrow.parquet as pq

    emb = [[1.0, 2.0], [3.0, 4.0, 5.0], [6.0, 7.0]]
    pq.write_table(
        pa.table(
            {
                "doc_id": [0, 1, 2],
                "text": ["a b", "b c", "c d"],
                "embedding": emb,
            }
        ),
        str(tmp_path / "d.parquet"),
    )
    out = str(tmp_path / "idx")
    build_index(
        str(tmp_path / "d.parquet"),
        out,
        key_col="doc_id",
        id_col="doc_id",
        ts_col=None,
        stored_cols=["text", "embedding"],
        num_buckets=1,
    )
    with pytest.raises(ValueError, match="ragged"):
        IndexReader(out).knn_vectors("embedding")


def test_knn_min_score_radial(idx):
    from raybm25.query.dsl import run_query

    qv = [1.0] + [0.0] * (D - 1)
    full = run_query(
        idx,
        {"query": {"knn": {"embedding": {"vector": qv, "k": 100}}}, "size": 100},
    )["hits"]["hits"]
    assert full
    cut = full[len(full) // 2]["_score"]
    rad = run_query(
        idx,
        {
            "query": {
                "knn": {
                    "embedding": {"vector": qv, "k": 100, "min_score": cut}
                }
            },
            "size": 100,
        },
    )["hits"]["hits"]
    assert [h["_id"] for h in rad] == [
        h["_id"] for h in full if h["_score"] >= cut
    ]

def test_knn_radial_min_score_and_max_distance(idx):
    from raybm25.query.dsl import run_query
    from raybm25.query.engine import IndexReader

    r = IndexReader(idx)
    vecs = _vectors()
    qv = vecs[3].tolist()
    full = run_query(r, {"size": 1000, "query": {"knn": {"embedding": {
        "vector": qv, "k": 1000}}}})["hits"]["hits"]
    thr = full[len(full) // 2]["_score"] - 1e-9
    radial = run_query(r, {"size": 1000, "query": {"knn": {"embedding": {
        "vector": qv, "min_score": thr}}}})["hits"]["hits"]
    want = [h for h in full if h["_score"] >= thr]
    assert [(h["_id"], h["_score"]) for h in radial] == [
        (h["_id"], h["_score"]) for h in want]
    # max_distance: distance = 1 - cosine, the same cut as a distance
    rad2 = run_query(r, {"size": 1000, "query": {"knn": {"embedding": {
        "vector": qv, "max_distance": 1.0 - thr}}}})["hits"]["hits"]
    assert [h["_id"] for h in rad2] == [h["_id"] for h in want]
    # with k given, min_score filters WITHIN the top-k page
    topk = run_query(r, {"size": 1000, "query": {"knn": {"embedding": {
        "vector": qv, "k": 3, "min_score": thr}}}})["hits"]["hits"]
    assert [h["_id"] for h in topk] == [h["_id"] for h in want[:3]]
