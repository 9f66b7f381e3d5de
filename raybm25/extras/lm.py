"""CCNet-style n-gram language-model quality scoring.

The web-corpus curation pipelines behind LLM training sets (CCNet,
Wenzek et al. 2020; RefinedWeb; Dolma) score every document with a
language model and filter/partition by perplexity. This module is the
Ray-Data-native version with a bigram MLE model trained on the corpus
itself, in two streaming passes:

1. **Count pass** — ``map_batches`` tokenizes each batch at C speed
   (``analysis.arrow_tokenize``) and emits PARTIAL bigram counts
   (np.unique combiner inside the batch, so the shuffle carries one
   row per distinct (w1, w2) per batch, not one per token), then a
   ``groupby(["w1", "w2"]).sum`` merges them — the classic
   combiner-before-shuffle shape.
2. **Score pass** — the merged counts collect to two dicts
   (``c(w1, w2)`` and left-marginal ``c(w1, *)``) broadcast once via
   ``ray.put``; each batch scores as
   ``mean_i -ln( c(w1_i, w2_i) / c(w1_i, *) )`` over its bigram
   instances — the per-token cross entropy under the bigram MLE.
   Lookups run once per UNIQUE batch pair (np.unique + inverse
   broadcast), log/mean math is one vectorized bincount pass.

Scale note: the collected LM is the model, not the data — its size is
the corpus bigram vocabulary. At 100-TB scale you cap it (CCNet prunes
to the top-k n-grams; a hash-partitioned two-sided join is the uncapped
alternative), and ``top_bigrams`` implements exactly that cap. Docs
with fewer than two tokens have no bigrams and are excluded, as the
oracle SQL excludes them.

Training on the scored corpus itself means no unseen bigram can occur;
``score_documents`` still fails loudly (KeyError) if scoring a corpus
the LM was not fit on introduces one, rather than silently smoothing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..analysis import arrow_tokenize

__all__ = ["fit_bigram_lm", "BigramScoreStage", "bigram_lm_topk"]


def _batch_bigram_counts(batch: pa.Table, text_col: str) -> pa.Table:
    tid, terms, doc_pos, _dl = arrow_tokenize(batch.column(text_col))
    if tid.size < 2:
        return pa.table(
            {"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
             "c": pa.array([], pa.int64())}
        )
    m = doc_pos[1:] == doc_pos[:-1]
    a, b = tid[:-1][m], tid[1:][m]
    pair = a * np.int64(len(terms)) + b
    up, cnt = np.unique(pair, return_counts=True)
    return pa.table(
        {
            "w1": terms[(up // len(terms)).astype(np.int64)],
            "w2": terms[(up % len(terms)).astype(np.int64)],
            "c": cnt.astype(np.int64),
        }
    )


def fit_bigram_lm(ds, text_col: str = "text", top_bigrams: int | None = None):
    """Train the bigram MLE on a Dataset: returns (pair_counts,
    left_counts) dicts — ``{(w1, w2): c}`` and ``{w1: c(w1, *)}``.
    ``top_bigrams`` caps the model to the most frequent bigrams (count
    desc, pair asc — deterministic), the CCNet-style vocabulary prune;
    the left marginals are computed BEFORE the cap so probabilities
    stay <= 1 and comparable across docs."""
    from ray.data.aggregate import Sum

    merged = (
        ds.map_batches(
            lambda t: _batch_bigram_counts(t, text_col),
            batch_format="pyarrow",
        )
        .groupby(["w1", "w2"])
        .aggregate(Sum("c", alias_name="c"))
    )
    tbl = merged.to_arrow_refs()
    import ray as _ray

    parts = [_ray.get(r) for r in tbl]
    t = pa.concat_tables([p for p in parts if p.num_rows]).combine_chunks()
    w1 = t.column("w1").to_numpy(zero_copy_only=False)
    w2 = t.column("w2").to_numpy(zero_copy_only=False)
    c = t.column("c").to_numpy(zero_copy_only=False)
    lefts: dict[str, int] = {}
    uw1, inv = np.unique(w1, return_inverse=True)
    sums = np.bincount(inv, weights=c).astype(np.int64)
    lefts = {str(k): int(v) for k, v in zip(uw1, sums)}
    if top_bigrams is not None and c.size > top_bigrams:
        order = np.lexsort((w2, w1, -c))[:top_bigrams]
        w1, w2, c = w1[order], w2[order], c[order]
    pairs = {
        (str(x), str(y)): int(n) for x, y, n in zip(w1, w2, c)
    }
    return pairs, lefts


class BigramScoreStage:
    """``map_batches`` stage: per-doc cross entropy under the bigram
    MLE. The LM dicts deserialize ONCE per actor (pass the plain dicts,
    or ``ray.put`` refs for a large model — resolved in __init__)."""

    def __init__(self, pairs, lefts, text_col: str = "text",
                 id_col: str = "doc_id"):
        import ray as _ray

        if isinstance(pairs, _ray.ObjectRef):
            pairs = _ray.get(pairs)
        if isinstance(lefts, _ray.ObjectRef):
            lefts = _ray.get(lefts)
        self._pairs = pairs
        self._lefts = lefts
        self._text_col = text_col
        self._id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        tid, terms, doc_pos, _dl = arrow_tokenize(
            batch.column(self._text_col)
        )
        ids = batch.column(self._id_col).to_numpy(zero_copy_only=False)
        n_rows = len(batch)
        if tid.size < 2:
            return pa.table({
                self._id_col: pa.array([], pa.int64()),
                "cross_entropy": pa.array([], pa.float64()),
            })
        m = doc_pos[1:] == doc_pos[:-1]
        a, b = tid[:-1][m], tid[1:][m]
        dp = doc_pos[:-1][m]
        pair = a * np.int64(len(terms)) + b
        up, inv = np.unique(pair, return_inverse=True)
        logp_u = np.empty(up.size, dtype=np.float64)
        for i, p in enumerate(up):
            w1 = terms[int(p) // len(terms)]
            w2 = terms[int(p) % len(terms)]
            c12 = self._pairs.get((w1, w2))
            if c12 is None:
                raise KeyError(
                    f"bigram ({w1!r}, {w2!r}) absent from the LM — scoring "
                    "a corpus the model was not fit on (or over-pruned)"
                )
            logp_u[i] = np.log(c12) - np.log(self._lefts[w1])
        logp = logp_u[inv]
        sums = np.bincount(dp, weights=logp, minlength=n_rows)
        cnts = np.bincount(dp, minlength=n_rows)
        keep = cnts > 0
        return pa.table({
            self._id_col: pa.array(
                ids[keep].astype(np.int64), pa.int64()
            ),
            "cross_entropy": pa.array(
                -sums[keep] / cnts[keep], pa.float64()
            ),
        })


def bigram_lm_topk(sf_dir_or_path: str, k: int = 20,
                   text_col: str = "text", id_col: str = "doc_id"):
    """End-to-end: fit the bigram MLE on the documents table, score
    every doc's cross entropy, return the ``k`` most surprising docs
    (score desc, doc_id asc) as (rank, doc_id). Both passes stream;
    only the LM and the top-k page materialize."""
    import os

    import ray.data

    path = sf_dir_or_path
    if os.path.isdir(path):
        path = os.path.join(path, "documents.parquet")
    ds = ray.data.read_parquet(path, columns=[id_col, text_col])
    pairs, lefts = fit_bigram_lm(ds, text_col=text_col)
    import ray as _ray

    pref, lref = _ray.put(pairs), _ray.put(lefts)
    scored = ds.map_batches(
        BigramScoreStage(pref, lref, text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        concurrency=4,
    )
    out = scored.sort(["cross_entropy", id_col], descending=[True, False])
    rows = out.limit(k).to_pandas()
    rows.insert(0, "rank", np.arange(1, len(rows) + 1, dtype=np.int64))
    return rows
