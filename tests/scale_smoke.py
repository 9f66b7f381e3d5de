"""Scale smoke: run EVERY queries() entry at a bigger scale factor
than the driver's sf0.01 correctness gate — catches crashes and perf
cliffs the small gate can't see (not a pytest module; run manually).

Usage: python tests/scale_smoke.py [sf_dir]   (default sf0.1)

Round-3 record (sf0.1, 16 CPUs): all 39 entries ok; dominant costs are
the near-dup pipelines on the heavily-duplicated fixture corpus
(190,925 verified pairs among 5,000 docs — a ~16x banding-duplication
worst case). After vectorizing candidate generation (triu_indices):
minhash_lsh_pairs 27.5 s (was 56); everything non-near-dup < 7 s.

Round-4 record (sf0.1): all 62 entries ok, including the new query
surface (bool/msm/search_after/facets/aggs/sort/wildcard/fuzzy/
prefix/mlt/dsl, each <= 0.1 s warm) and the maintenance entries
(delete_by_query / update_by_query / export_matching, which copy and
mutate a full index per call).

Round-4 final record (sf0.1): all 86 entries ok (85 queries + the
flagship), including the late additions (dismax_generic /
boosting_demote / simple_query_string / filters + metric aggs /
analyze_tokens, each <= 0.1 s warm); slowest remain the
index-mutating maintenance entries (update_merge 5.5 s) and the
near-dup pipelines.

Round-4 continuation record (sf0.1): all entries ok (100 at run time;
101 with global_agg added after), exit 0 — the new query_string /
span / suggester / pipeline-agg / termvectors / mget entries each
<= 0.2 s warm; events_sessions 1.9 s closes the run.

Round-4 session-2 record (sf0.1): all 114 entries ok, exit 0 —
including the new match_bool_prefix / knn_dsl / scroll_pages /
phrase_sloppy / feature-query / weighted_avg / top_metrics /
matrix_stats / percentile_ranks / scrub_text / chunk_tokens /
multi_index_search entries; events_sessions 1.5 s closes the run.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def simhash_kernel_bench(sf_dir: str) -> None:
    """--simhash-kernel: measure the round-5 vectorized SimHashStage
    against the original per-doc np.unique kernel on the real sf
    documents (signature equality asserted; ray not needed)."""
    import numpy as np
    import pyarrow.parquet as pq

    from raybm25.extras.dedup import TOKEN_RE, SimHashStage
    from raybm25.extras.textstats import poly_token_hashes

    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    texts = tbl.column("text").to_pylist()

    def per_doc(texts):
        out = []
        bitcols = np.uint64(1) << np.arange(64, dtype=np.uint64)
        for t in texts:
            toks = TOKEN_RE.findall(t.lower()) if isinstance(t, str) else []
            if not toks:
                out.append(0)
                continue
            uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
            h = poly_token_hashes(uniq.tolist())
            bits = ((h[:, None] & bitcols) != 0).astype(np.int64)
            acc = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
            sig = np.uint64(0)
            for bit in np.flatnonzero(acc > 0):
                sig |= np.uint64(1) << np.uint64(bit)
            out.append(int(sig))
        return np.array(out, dtype=np.uint64)

    st = SimHashStage()
    st(tbl.slice(0, 64))  # warm imports
    t0 = time.perf_counter()
    new = st(tbl).column("simhash").to_numpy(zero_copy_only=False)
    t_new = time.perf_counter() - t0
    t0 = time.perf_counter()
    old = per_doc(texts)
    t_old = time.perf_counter() - t0
    assert (new == old).all(), "vectorized SimHash drifted from the reference"
    print(
        f"simhash kernel: {len(texts)} docs, vectorized {t_new:.3f}s "
        f"vs per-doc {t_old:.3f}s -> {t_old / t_new:.2f}x (signatures equal)"
    )


def main() -> int:
    if "--simhash-kernel" in sys.argv:
        sys.argv.remove("--simhash-kernel")
        simhash_kernel_bench(
            sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
        )
        return 0
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import __ray_entry__ as e

    failures = 0
    for name, fn in e.queries().items():
        t0 = time.perf_counter()
        try:
            out = fn(sf_dir)
            n = len(out) if hasattr(out, "__len__") else out.count()
            print(f"{name}: ok rows={n} {time.perf_counter() - t0:.1f}s")
        except Exception as ex:  # noqa: BLE001 - smoke reporting
            failures += 1
            print(f"{name}: FAIL {type(ex).__name__}: {ex}")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
