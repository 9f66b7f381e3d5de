"""Similarity search over an embedding column (list<float>).

- Brute-force cosine top-k: numpy matmul per batch against a broadcast
  query matrix (``ray.put`` once, read per actor) — the baseline.
- IVF (inverted-file) ANN: vectors assigned to their nearest centroid
  (deterministic centroids = the first C vectors, one refinement
  sweep); queries probe the P nearest centroid buckets. nprobe=C
  degrades to exact search (tested equal to brute force).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class CosineTopK:
    """map_batches stage: per-batch partial top-k against a broadcast
    query matrix. Emits (query_id, vec_id, score) candidate rows; the
    driver (or a tree-reduce) keeps the global top-k per query."""

    def __init__(self, queries_ref, k: int = 20, vec_col: str = "embedding"):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, dict) else queries_ref
        self.qids = np.array(sorted(q))
        self.qmat = _normalize(np.array([q[i] for i in self.qids], dtype=np.float64))
        self.k = k
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        emb = np.array(batch.column(self.vec_col).to_pylist(), dtype=np.float64)
        sims = _normalize(emb) @ self.qmat.T  # (n, Q)
        k = min(self.k, len(ids))
        top = np.argpartition(-sims, k - 1, axis=0)[:k]  # (k, Q)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(self.qids):
            rows = top[:, qi]
            out_q.extend([int(qid)] * len(rows))
            out_v.extend(ids[rows].tolist())
            out_s.extend(sims[rows, qi].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


def cosine_topk(ds, queries: dict[int, list[float]], k: int = 20,
                vec_col: str = "embedding") -> pd.DataFrame:
    """Global exact cosine top-k per query (ties: score desc, vec_id
    asc). Candidates stream from per-batch partial top-k; the final
    reduce is tiny (k x batches x queries rows)."""
    import ray

    qref = ray.put(queries)
    cand = ds.map_batches(
        CosineTopK,
        fn_constructor_kwargs={"queries_ref": qref, "k": k, "vec_col": vec_col},
        batch_format="pyarrow",
        concurrency=2,
    ).to_pandas()
    out = []
    for qid, g in cand.groupby("query_id"):
        order = np.lexsort((g["vec_id"].to_numpy(), -g["score"].to_numpy()))[:k]
        sel = g.iloc[order]
        out.append(
            pd.DataFrame(
                {
                    "query_id": int(qid),
                    "rank": np.arange(1, len(sel) + 1, dtype=np.int64),
                    "vec_id": sel["vec_id"].to_numpy(),
                    "score": sel["score"].to_numpy(),
                }
            )
        )
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
        columns=["query_id", "rank", "vec_id", "score"]
    )


def ivf_build(ds, n_centroids: int = 8, vec_col: str = "embedding") -> dict:
    """Deterministic IVF structure: centroids = first C vectors refined
    by one mean sweep; returns {centroids, assignments df}."""
    df = ds.select_columns(["vec_id", vec_col]).to_pandas()
    mat = _normalize(np.array(df[vec_col].tolist(), dtype=np.float64))
    ids = df["vec_id"].to_numpy()
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    cent = mat[:n_centroids].copy()
    for _ in range(2):  # fixed sweeps, deterministic
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(n_centroids):
            m = assign == c
            if m.any():
                cent[c] = _normalize(mat[m].mean(axis=0, keepdims=True))[0]
    assign = np.argmax(mat @ cent.T, axis=1)
    return {"centroids": cent, "vec_ids": ids, "vectors": mat, "assign": assign}


def ivf_search(ivf: dict, query: np.ndarray, k: int = 10, nprobe: int = 2):
    """Probe the nprobe nearest buckets, exact within. Returns
    [(vec_id, score)] ties broken by vec_id asc."""
    q = query / (np.linalg.norm(query) or 1.0)
    cent_order = np.argsort(-(ivf["centroids"] @ q))[:nprobe]
    mask = np.isin(ivf["assign"], cent_order)
    ids = ivf["vec_ids"][mask]
    sims = ivf["vectors"][mask] @ q
    order = np.lexsort((ids, -sims))[:k]
    return [(int(ids[i]), float(sims[i])) for i in order]
