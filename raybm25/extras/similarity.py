"""Similarity search over an embedding column (list<float>).

- Brute-force cosine top-k: numpy matmul per batch against a broadcast
  query matrix (``ray.put`` once, read per actor) — the baseline.
- Blocked all-pairs near-dup: normalized vectors are written into
  ``vec_id % B`` block files once, then every block pair (i <= j) is
  scored by an actor-pool matmul — O(n^2) work split into O(B^2)
  bounded-memory tasks, nothing materializes on the driver
  (VERDICT r1 "Next round" #4).
- IVF (inverted-file) ANN, bucketed + file-backed (VERDICT r1 #3):
  centroids are trained driver-side on a small deterministic sample
  (the lowest ``train_sample`` vec_ids — standard IVF practice at
  scale), assignment is a distributed ``map_batches`` against the
  broadcast centroids, and each centroid's vectors land in their own
  parquet bucket file. Queries read ONLY the probed bucket files (the
  postings-shard reader pattern). nprobe=C degrades to exact search
  (tested equal to brute force).
- Random-hyperplane LSH ANN — the brief's alternative scale path:
  fixed-seed hyperplanes (no training pass), signature-keyed parquet
  buckets via the same groupby(blk) sink, multi-probe search in
  least-confident-bit-flip order (Lv et al. 2007); nprobe=2^n_bits
  probes every bucket and equals brute force (pytest-gated).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import auto_concurrency


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _emb_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    if batch.num_rows == 0:
        return np.empty((0, 0), dtype=np.float64)
    col = batch.column(vec_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    try:  # fixed-width lists flatten zero-copy
        flat = col.flatten().to_numpy(zero_copy_only=False)
        dim = len(col[0])
        return flat.reshape(len(col), dim).astype(np.float64, copy=False)
    except Exception:
        return np.array(col.to_pylist(), dtype=np.float64)


def _list_offsets(n_rows: int, dim: int) -> np.ndarray:
    """Offsets for a fixed-dim list column; dim may be 0 only when the
    batch is empty (step must not be 0 for numpy arange)."""
    if n_rows == 0:
        return np.zeros(1, dtype=np.int64)
    return np.arange(0, (n_rows + 1) * dim, dim, dtype=np.int64)


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
        if batch.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        emb = _emb_matrix(batch, self.vec_col)
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
        concurrency=auto_concurrency(),
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


# ----------------------------------------------- int8 scalar quantization


def quantize_int8(mat: np.ndarray) -> np.ndarray:
    """Per-vector symmetric int8 scalar quantization (the OpenSearch
    knn_vector SQ codec shape): q = floor(v / max|v| * 127 + 0.5),
    integer-valued float64 in [-127, 127].  Cosine is scale-invariant,
    so quantized cosine == cosine of the int codes — and because the
    codes are small integers, every dot/norm partial sum is exact in
    float64 regardless of summation order, which is what lets the SQL
    oracle reproduce the ranking bit-for-bit (contract.py
    ``knn_quantized_topk``)."""
    m = np.abs(mat).max(axis=1, keepdims=True)
    m[m == 0] = 1.0
    return np.floor(mat / m * 127.0 + 0.5)


class QuantizedTopK:
    """Per-batch combiner for quantized brute-force knn: quantize the
    batch (quantization is stateless and per-vector, so it pipelines
    with the scan), integer-dot against the quantized query, emit the
    batch-local top-k.  4x less candidate bandwidth than float32
    brute force at 100 TB; the global reduce stays k x n_batches."""

    def __init__(self, query_vec, k: int = 20, vec_col: str = "embedding"):
        q = np.asarray(query_vec, dtype=np.float64).reshape(1, -1)
        self.q = quantize_int8(q)[0]
        self.qn = float(np.linalg.norm(self.q))
        self.k = int(k)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or self.qn == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        mat = quantize_int8(_emb_matrix(batch, self.vec_col))
        norms = np.linalg.norm(mat, axis=1)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        live = norms > 0  # zero vectors cannot cosine-match: excluded
        mat, norms, ids = mat[live], norms[live], ids[live]
        if ids.size == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        scores = (mat @ self.q) / (norms * self.qn)
        order = np.lexsort((ids, -scores))[: self.k]
        return pa.table(
            {
                "vec_id": pa.array(ids[order], pa.int64()),
                "score": pa.array(scores[order], pa.float64()),
            }
        )


def quantized_topk(ds, query_vec, k: int = 20,
                   vec_col: str = "embedding") -> pd.DataFrame:
    """Global int8-quantized cosine top-k (ties: score desc, vec_id
    asc): per-batch partial top-k stream to a tiny driver reduce."""
    cand = ds.map_batches(
        QuantizedTopK,
        fn_constructor_kwargs={"query_vec": query_vec, "k": k, "vec_col": vec_col},
        batch_format="pyarrow",
        concurrency=auto_concurrency(),
    ).to_pandas()
    order = np.lexsort((cand["vec_id"].to_numpy(), -cand["score"].to_numpy()))[:k]
    sel = cand.iloc[order]
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(sel) + 1, dtype=np.int64),
            "vec_id": sel["vec_id"].to_numpy(),
            "score": sel["score"].to_numpy(),
        }
    )


# ------------------------------------------------------- blocked near-dup
def _norm_block_stage(batch: pa.Table, vec_col: str, n_blocks: int) -> pa.Table:
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    mat = _normalize(_emb_matrix(batch, vec_col)) if batch.num_rows else np.empty((0, 0))
    offsets = _list_offsets(len(ids), mat.shape[1])
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "blk": pa.array((ids % n_blocks).astype(np.int32), pa.int32()),
            "vec": pa.LargeListArray.from_arrays(
                offsets, pa.array(mat.ravel(), pa.float64())
            ),
        }
    )


class _WriteVecBlock:
    def __init__(self, blocks_dir: str):
        self.__name__ = "WriteVecBlock"
        self.blocks_dir = blocks_dir

    def __call__(self, g: pa.Table) -> pa.Table:
        from ..index.manifest import atomic_write_parquet

        blk = int(g.column("blk")[0].as_py())
        g = g.sort_by("vec_id").drop_columns(["blk"])
        atomic_write_parquet(g, os.path.join(self.blocks_dir, f"blk={blk:05d}.parquet"))
        return pa.table(
            {"blk": pa.array([blk], pa.int32()), "rows": pa.array([g.num_rows], pa.int64())}
        )


def _load_block(blocks_dir: str, blk: int) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(blocks_dir, f"blk={blk:05d}.parquet"))
    ids = tbl.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    vec = tbl.column("vec").combine_chunks()
    flat = vec.values.to_numpy(zero_copy_only=False)
    dim = flat.size // max(1, ids.size)
    return ids, flat.reshape(ids.size, dim)


class BlockPairScorer:
    """Actor-pool stage over (bi, bj) block-pair rows: one matmul per
    pair, emit (vec_a < vec_b) with cosine >= threshold. Per-actor LRU
    keeps recently used blocks loaded."""

    def __init__(self, blocks_dir: str, threshold: float, max_cached: int = 8):
        from collections import OrderedDict

        self.blocks_dir = blocks_dir
        self.threshold = threshold
        self.max_cached = max_cached
        self._cache: "OrderedDict[int, tuple[np.ndarray, np.ndarray]]" = OrderedDict()

    def _block(self, b: int):
        got = self._cache.get(b)
        if got is not None:
            self._cache.move_to_end(b)  # true LRU: refresh on hit
            return got
        got = _load_block(self.blocks_dir, b)
        while len(self._cache) >= self.max_cached:
            self._cache.popitem(last=False)
        self._cache[b] = got
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_a, out_b = [], []
        for bi, bj in zip(
            batch.column("bi").to_pylist(), batch.column("bj").to_pylist()
        ):
            ids_i, mat_i = self._block(int(bi))
            ids_j, mat_j = self._block(int(bj))
            if not ids_i.size or not ids_j.size:
                continue
            sims = mat_i @ mat_j.T
            if bi == bj:
                ii, jj = np.triu_indices(ids_i.size, 1)
                keep = sims[ii, jj] >= self.threshold
                ii, jj = ii[keep], jj[keep]
            else:
                ii, jj = np.nonzero(sims >= self.threshold)
            a = ids_i[ii]
            b = ids_j[jj]
            lo = np.minimum(a, b)
            hi = np.maximum(a, b)
            out_a.extend(lo.tolist())
            out_b.extend(hi.tolist())
        return pa.table(
            {
                "vec_a": pa.array(out_a, pa.int64()),
                "vec_b": pa.array(out_b, pa.int64()),
            }
        )


def embedding_neardup_pairs(
    ds,
    threshold: float,
    vec_col: str = "embedding",
    work_dir: str | None = None,
    block_rows: int = 4096,
) -> pd.DataFrame:
    """All-pairs cosine >= threshold, blocked: O(B^2) bounded tasks over
    normalized block files instead of a driver-side n x n matmul."""
    import ray.data

    work_dir = work_dir or tempfile.mkdtemp(prefix="raybm25_neardup_", dir="/tmp")
    blocks_dir = os.path.join(work_dir, "blocks")
    if os.path.isdir(blocks_dir):  # stale blocks from a prior run
        import shutil

        shutil.rmtree(blocks_dir)
    os.makedirs(blocks_dir, exist_ok=True)
    n = ds.count()
    n_blocks = max(1, -(-n // block_rows))
    stats = (
        ds.map_batches(
            _norm_block_stage,
            batch_format="pyarrow",
            fn_kwargs={"vec_col": vec_col, "n_blocks": n_blocks},
        )
        .groupby("blk")
        .map_groups(_WriteVecBlock(blocks_dir), batch_format="pyarrow")
        .to_pandas()
    )
    present = sorted(stats["blk"].tolist())
    items = [
        {"bi": i, "bj": j} for ix, i in enumerate(present) for j in present[ix:]
    ]
    if not items:
        return pd.DataFrame(
            {"vec_a": pd.array([], dtype="int64"), "vec_b": pd.array([], dtype="int64")}
        )
    pairs = (
        ray.data.from_items(items, override_num_blocks=len(items))
        .map_batches(
            BlockPairScorer,
            fn_constructor_kwargs={"blocks_dir": blocks_dir, "threshold": threshold},
            batch_format="pyarrow",
            concurrency=auto_concurrency(),
        )
        .to_pandas()
    )
    if not len(pairs):
        return pd.DataFrame(
            {"vec_a": pd.array([], dtype="int64"), "vec_b": pd.array([], dtype="int64")}
        )
    out = pairs.astype("int64")
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


# ------------------------------------------------------------------- IVF ANN
def _lowest_id_sample(ds, vec_col: str, n: int) -> pd.DataFrame:
    """Deterministic training sample: the n lowest vec_ids, found with a
    per-batch partial cut + a tiny driver reduce (no full sort)."""

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows > n:
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            keep = np.argsort(ids, kind="stable")[:n]
            batch = batch.take(pa.array(np.sort(keep)))
        return batch.select(["vec_id", vec_col])

    cand = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values("vec_id", kind="mergesort").head(n)
    return cand.reset_index(drop=True)


def _train_centroids(sample: pd.DataFrame, vec_col: str, n_centroids: int,
                     sweeps: int = 2) -> np.ndarray:
    mat = _normalize(np.array(sample[vec_col].tolist(), dtype=np.float64))
    cent = mat[:n_centroids].copy()
    for _ in range(sweeps):  # fixed sweeps, deterministic
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(n_centroids):
            m = assign == c
            if m.any():
                cent[c] = _normalize(mat[m].mean(axis=0, keepdims=True))[0]
    return cent


class _AssignStage:
    """map_batches stage: nearest-centroid assignment against the
    broadcast centroid matrix (ray.put once, read per actor)."""

    def __init__(self, cent_ref, vec_col: str):
        import ray

        self.cent = ray.get(cent_ref) if not isinstance(cent_ref, np.ndarray) else cent_ref
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _normalize(_emb_matrix(batch, self.vec_col)) if batch.num_rows else np.empty((0, 0))
        assign = np.argmax(mat @ self.cent.T, axis=1).astype(np.int32) if len(ids) else np.empty(0, np.int32)
        offsets = _list_offsets(len(ids), mat.shape[1])
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "blk": pa.array(assign, pa.int32()),
                "vec": pa.LargeListArray.from_arrays(
                    offsets, pa.array(mat.ravel(), pa.float64())
                ),
            }
        )


def ivf_build(
    ds,
    n_centroids: int = 8,
    vec_col: str = "embedding",
    index_dir: str | None = None,
    train_sample: int = 4096,
) -> dict:
    """Bucketed, file-backed IVF index: per-centroid parquet bucket
    files + a centroids sidecar. No full-vector materialization on the
    driver — only the bounded training sample."""
    import ray
    import ray.data  # noqa: F401

    index_dir = index_dir or tempfile.mkdtemp(prefix="raybm25_ivf_", dir="/tmp")
    buckets_dir = os.path.join(index_dir, "buckets")
    if os.path.isdir(buckets_dir):  # stale buckets from a prior build
        import shutil

        shutil.rmtree(buckets_dir)
    os.makedirs(buckets_dir, exist_ok=True)

    sample = _lowest_id_sample(ds, vec_col, train_sample)
    cent = _train_centroids(sample, vec_col, n_centroids)
    cent_ref = ray.put(cent)

    ds.map_batches(
        _AssignStage,
        fn_constructor_kwargs={"cent_ref": cent_ref, "vec_col": vec_col},
        batch_format="pyarrow",
        concurrency=auto_concurrency(),
    ).groupby("blk").map_groups(
        _WriteVecBlock(buckets_dir), batch_format="pyarrow"
    ).materialize()

    np.save(os.path.join(index_dir, "centroids.npy"), cent)
    return {"index_dir": index_dir, "centroids": cent, "n_centroids": n_centroids}


def ivf_search(ivf: dict, query: np.ndarray, k: int = 10, nprobe: int = 2):
    """Probe the nprobe nearest centroid buckets — reading ONLY those
    bucket files — exact cosine within. Returns [(vec_id, score)], ties
    broken by vec_id asc."""
    cent = ivf["centroids"]
    buckets_dir = os.path.join(ivf["index_dir"], "buckets")
    q = query / (np.linalg.norm(query) or 1.0)
    probe = np.argsort(-(cent @ q))[:nprobe]
    ids_parts, sim_parts = [], []
    for b in probe:
        path = os.path.join(buckets_dir, f"blk={int(b):05d}.parquet")
        if not os.path.exists(path):
            continue  # centroid won no vectors
        ids, mat = _load_block(buckets_dir, int(b))
        ids_parts.append(ids)
        sim_parts.append(mat @ q)
    if not ids_parts:
        return []
    ids = np.concatenate(ids_parts)
    sims = np.concatenate(sim_parts)
    order = np.lexsort((ids, -sims))[:k]
    return [(int(ids[i]), float(sims[i])) for i in order]


class _LshAssignStage:
    """map_batches stage: random-hyperplane signature against the
    broadcast hyperplane matrix (ray.put once, read per actor). Bucket
    key = the sign-bit signature packed into an int32."""

    def __init__(self, hp_ref, vec_col: str):
        import ray

        self.hp = ray.get(hp_ref) if not isinstance(hp_ref, np.ndarray) else hp_ref
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _normalize(_emb_matrix(batch, self.vec_col)) if batch.num_rows else np.empty((0, 0))
        if len(ids):
            bits = (mat @ self.hp.T) > 0  # (n, n_bits)
            blk = (bits @ (1 << np.arange(self.hp.shape[0]))).astype(np.int32)
        else:
            blk = np.empty(0, np.int32)
        offsets = _list_offsets(len(ids), mat.shape[1])
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "blk": pa.array(blk, pa.int32()),
                "vec": pa.LargeListArray.from_arrays(
                    offsets, pa.array(mat.ravel(), pa.float64())
                ),
            }
        )


def lsh_build(
    ds,
    n_bits: int = 6,
    vec_col: str = "embedding",
    index_dir: str | None = None,
    seed: int = 0,
) -> dict:
    """Random-hyperplane LSH ANN index — the brief's alternative to
    IVF as the at-scale similarity path. Hyperplanes are drawn from a
    fixed-seed generator (deterministic index for a given corpus +
    seed, no training pass at all — the LSH advantage over IVF when no
    sample is representative); vectors land in one parquet bucket file
    per signature (<= 2^n_bits buckets), written by the same
    groupby(blk) sink as IVF. Queries read ONLY probed buckets."""
    import ray
    import ray.data  # noqa: F401

    if not 1 <= n_bits <= 16:
        raise ValueError(f"n_bits must be in [1, 16], got {n_bits}")
    index_dir = index_dir or tempfile.mkdtemp(prefix="raybm25_lsh_", dir="/tmp")
    buckets_dir = os.path.join(index_dir, "buckets")
    if os.path.isdir(buckets_dir):
        import shutil

        shutil.rmtree(buckets_dir)
    os.makedirs(buckets_dir, exist_ok=True)

    dim = len(_lowest_id_sample(ds, vec_col, 1)[vec_col].iloc[0])
    rng = np.random.default_rng(seed)
    hp = rng.standard_normal((n_bits, dim))
    hp /= np.linalg.norm(hp, axis=1, keepdims=True)
    hp_ref = ray.put(hp)

    ds.map_batches(
        _LshAssignStage,
        fn_constructor_kwargs={"hp_ref": hp_ref, "vec_col": vec_col},
        batch_format="pyarrow",
        concurrency=auto_concurrency(),
    ).groupby("blk").map_groups(
        _WriteVecBlock(buckets_dir), batch_format="pyarrow"
    ).materialize()

    np.save(os.path.join(index_dir, "hyperplanes.npy"), hp)
    return {"index_dir": index_dir, "hyperplanes": hp, "n_bits": n_bits}


def _probe_order(margins: np.ndarray, n_bits: int, nprobe: int) -> np.ndarray:
    """Multi-probe LSH bucket order: XOR masks sorted by the summed
    |margin| of the flipped bits — flipping the bits the query was
    least sure about first (Lv et al. 2007 multi-probe LSH). For small
    n_bits the full 2^n_bits mask ranking is exact; nprobe = 2^n_bits
    therefore probes every bucket (exactness gate)."""
    masks = np.arange(1 << n_bits, dtype=np.int64)
    flip_cost = np.zeros(masks.size)
    for b in range(n_bits):
        flip_cost += np.where((masks >> b) & 1 == 1, np.abs(margins[b]), 0.0)
    order = np.lexsort((masks, flip_cost))
    return masks[order][: max(1, nprobe)]


def lsh_search(lsh: dict, query: np.ndarray, k: int = 10, nprobe: int = 4):
    """Probe nprobe buckets in multi-probe order — reading ONLY those
    bucket files — exact cosine within. Returns [(vec_id, score)],
    ties broken vec_id asc; nprobe=2^n_bits is exact (== brute force,
    pytest-gated)."""
    hp = lsh["hyperplanes"]
    n_bits = int(lsh["n_bits"])
    buckets_dir = os.path.join(lsh["index_dir"], "buckets")
    q = query / (np.linalg.norm(query) or 1.0)
    margins = hp @ q
    base = int(((margins > 0) @ (1 << np.arange(n_bits))))
    ids_parts, sim_parts = [], []
    for mask in _probe_order(margins, n_bits, nprobe):
        b = base ^ int(mask)
        path = os.path.join(buckets_dir, f"blk={b:05d}.parquet")
        if not os.path.exists(path):
            continue  # signature won no vectors
        ids, mat = _load_block(buckets_dir, b)
        ids_parts.append(ids)
        sim_parts.append(mat @ q)
    if not ids_parts:
        return []
    ids = np.concatenate(ids_parts)
    sims = np.concatenate(sim_parts)
    order = np.lexsort((ids, -sims))[:k]
    return [(int(ids[i]), float(sims[i])) for i in order]
