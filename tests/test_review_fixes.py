"""Regression tests for the round-2 review findings: uint64 paths that
must never round-trip through float64 or safe-cast, duplicate-column
clashes, odd ts dtypes, and empty blocks."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_stream_attach_keys_preserves_huge_ordinals(tmp_path):
    """Ordinals >= 2^53 (partition index >= 2^13) must survive the
    scan-layout update join bit-exactly — a float64 hop would round
    them onto neighboring rows."""
    from raybm25.index.build import ORD_SHIFT
    from raybm25.index.build_scan import KEYIDX_SUBDIR
    from raybm25.loader.update import _StreamAttachKeys

    idx_dir = tmp_path / "idx"
    (idx_dir / KEYIDX_SUBDIR).mkdir(parents=True)
    big = np.uint64(8192) << np.uint64(ORD_SHIFT)  # = 2^53
    big2 = big + np.uint64(1)
    assert float(big) == float(big2)  # the float64 trap this guards against
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.array([7, 9], dtype=np.uint64), pa.uint64()),
                "ordinal": pa.array(np.array([big, big2], dtype=np.uint64), pa.uint64()),
            }
        ),
        str(idx_dir / KEYIDX_SUBDIR / "kb=00000.parquet"),
    )
    upd = tmp_path / "u.parquet"
    pq.write_table(
        pa.table({"doc_id": pa.array([7, 9, 11], pa.int64()), "lang": ["a", "b", "c"]}),
        str(upd),
    )
    stage = _StreamAttachKeys(
        index_dir=str(idx_dir), id_field="doc_id", id_is_int=True,
        layout="scan", num_buckets=1, key_buckets=1,
    )
    out = stage(pa.table({"path": [str(upd)], "offset": pa.array([0], pa.int64())}))
    df = out.to_pandas().set_index("doc_id")
    assert int(df.loc[7, "ordinal"]) == int(big)
    assert int(df.loc[9, "ordinal"]) == int(big2)   # NOT rounded onto big
    assert df.loc[11, "__part"] == -1               # missing key
    assert df["ordinal"].dtype == np.uint64


def test_scan_build_with_id_column_named_doc_id(ray_session, tmp_path):
    """A source whose integer id column is literally 'doc_id' must not
    produce duplicate fields in the docstore."""
    from raybm25.index.build_scan import build_index_scan
    from raybm25.query.engine import IndexReader

    src = tmp_path / "d.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(20), pa.int64()),
                "text": [f"alpha doc{i}" for i in range(20)],
            }
        ),
        str(src),
    )
    build_index_scan(
        str(src), str(tmp_path / "idx"), key_col="doc_id", id_col="doc_id",
        ts_col=None, text_cols=("text",),
    )
    r = IndexReader(str(tmp_path / "idx"))
    assert r.n_docs == 20
    hits = r.search_pruned("doc3", 5, field="text")
    assert hits and hits[0][0] == 3
    docs = r.get_docs(np.array([5], dtype=np.uint64))
    assert docs.column("doc_id").to_pylist() == [5]


def test_scan_build_with_string_ts(ray_session, tmp_path):
    """A string-typed ts column (common for date fields) must sort
    lexicographically, not crash on an int64 reinterpret."""
    from raybm25.hashing import hash64
    from raybm25.index.build_scan import build_index_scan
    from raybm25.query.engine import IndexReader

    src = tmp_path / "d.parquet"
    pq.write_table(
        pa.table(
            {
                "url": ["u1", "u1", "u2"],
                "date": ["2024-01-02", "2024-03-01", "2024-01-01"],
                "text": ["older version", "newer version", "other"],
            }
        ),
        str(src),
    )
    build_index_scan(
        str(src), str(tmp_path / "idx"), key_col="url", ts_col="date",
        text_cols=("text",),
    )
    r = IndexReader(str(tmp_path / "idx"))
    assert r.n_docs == 2
    u1 = hash64(np.array(["u1"], dtype=object))
    got = r.get_docs(u1)
    assert got.column("text").to_pylist() == ["newer version"]  # last write wins


def test_exact_dedup_with_engine_uint64_ids(ray_session):
    """hash64-derived uint64 doc ids (~half above int64 max) must flow
    through exact_dedup without a safe-cast failure."""
    import ray.data

    from raybm25.extras.dedup import exact_dedup

    ids = np.array([2**63 + 5, 2**63 + 9, 3], dtype=np.uint64)
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.uint64()),
            "text": ["same", "same", "other"],
        }
    )
    out = exact_dedup(ray.data.from_arrow(tbl)).to_pandas()
    kept = set(out["doc_id"].astype("uint64").tolist())
    assert kept == {2**63 + 5, 3}  # min-id winner kept among the dups


def test_similarity_stages_tolerate_empty_blocks(ray_session, tmp_path):
    """An empty parquet file in the embeddings dir must not crash the
    blocked near-dup / IVF / cosine stages."""
    import ray.data

    from raybm25.extras.similarity import cosine_topk, embedding_neardup_pairs, ivf_build

    d = tmp_path / "emb"
    d.mkdir()
    vecs = [[float(i), 1.0, 0.0] for i in range(12)]
    pq.write_table(
        pa.table({"vec_id": pa.array(range(12), pa.int64()), "embedding": vecs}),
        str(d / "a.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float64())),
            }
        ),
        str(d / "empty.parquet"),
    )
    ds = ray.data.read_parquet(str(d))
    top = cosine_topk(ds, {0: vecs[0]}, k=3)
    assert top["vec_id"].iloc[0] == 0
    pairs = embedding_neardup_pairs(
        ds, threshold=0.999, work_dir=str(tmp_path / "nd"), block_rows=4
    )
    assert {"vec_a", "vec_b"} <= set(pairs.columns)
    ivf = ivf_build(ds, n_centroids=2, index_dir=str(tmp_path / "ivf"))
    assert ivf["centroids"].shape[0] == 2
