"""Train/test decontamination: flag training documents that share any
word n-gram with a held-out evaluation set.

The standard LLM-training hygiene step (e.g. GPT-3 appendix C /
PaLM-style 13-gram decontamination): the evaluation suite's n-grams
form a small reference set; every training document containing one of
them is "contaminated" and gets dropped or audited.  At 100 TB this
must be a broadcast membership test, never a join:

- the eval side is tiny (benchmarks are MBs) — its n-gram hashes are
  built once, sorted, and shipped to every worker via ``ray.put``
  (read back zero-copy in each actor, ~8 bytes per eval n-gram);
- the corpus side streams through ``map_batches``: one vectorized
  tokenize per batch (Arrow C kernels, Python strings only for the
  batch's DISTINCT terms), n-gram hashes from a Horner chain over the
  per-token hashes (n vectorized uint64 ops per batch — no joined
  n-gram strings are ever materialized), membership via
  ``np.searchsorted`` against the broadcast sorted array.

Nothing shuffles; the annotated dataset keeps streaming.  The
contamination COUNT per doc is over DISTINCT shared n-grams —
distinct hash <=> distinct token sequence up to ~2^-64 per-pair
collision odds — so the DuckDB oracle reproduces it with plain string
n-grams (contract.py::decontam_trigram).

Tokenization parity: tokens are ``[a-z0-9]+`` runs of the lowercased
text — identical to ``analysis.tokenize`` / the contract's SQL
analyzer expression.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..analysis import arrow_tokenize
from ..hashing import hash64
from ..util import auto_concurrency

DEFAULT_N = 13

# Horner multiplier for combining per-token hashes into an n-gram
# hash (odd -> bijective as a uint64 map; standard splitmix constant)
_GRAM_MULT = np.uint64(0x9E3779B97F4A7C15)


def _ranges(counts: np.ndarray) -> np.ndarray:
    """[0..c0-1, 0..c1-1, ...] without a Python loop."""
    counts = np.asarray(counts, dtype=np.int64)
    cnz = counts[counts > 0]  # empty groups emit nothing
    total = int(cnz.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(cnz)
    out = np.ones(total, dtype=np.int64)
    out[0] = 0
    out[ends[:-1]] = 1 - cnz[:-1]
    np.cumsum(out, out=out)
    return out


def ngram_hashes(texts, n: int) -> tuple[np.ndarray, np.ndarray]:
    """All word n-gram hashes of a string column.

    Returns ``(hashes, doc_pos)`` — one uint64 per n-gram and the row
    each n-gram came from.  The j-th token of every n-gram is one
    shifted gather on the flat per-token hash array; the combination
    is an n-step vectorized Horner chain (wraparound uint64).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(list(texts), type=pa.string())
    tid, terms, _doc_pos, dl = arrow_tokenize(texts)
    dl = dl.astype(np.int64)
    # hash only the batch's DISTINCT terms, then gather per token
    term_h = hash64(terms) if len(terms) else np.empty(0, dtype=np.uint64)
    tok_h = term_h[tid]
    offsets = np.concatenate(([0], np.cumsum(dl)))
    n_grams = np.maximum(dl - n + 1, 0)
    gram_doc = np.repeat(np.arange(len(dl), dtype=np.int64), n_grams)
    if gram_doc.size == 0:
        return np.empty(0, dtype=np.uint64), gram_doc
    starts = np.repeat(offsets[:-1], n_grams) + _ranges(n_grams)
    h = np.zeros(starts.size, dtype=np.uint64)
    for j in range(n):
        h = h * _GRAM_MULT + tok_h[starts + j]
    return h, gram_doc


def build_eval_ngrams(eval_texts, n: int = DEFAULT_N) -> np.ndarray:
    """Sorted unique n-gram hash set of the evaluation texts (the
    small side; broadcast the result with ``ray.put``)."""
    h, _ = ngram_hashes(eval_texts, n)
    return np.unique(h)


class ContaminationStage:
    """Actor-pool ``map_batches`` stage: annotate each row with the
    number of DISTINCT eval n-grams its text contains.

    ``eval_hashes`` may be a ``ray.ObjectRef`` (the broadcast path —
    resolved once per actor in ``__init__``, zero-copy) or a plain
    array (unit tests).  Emits ``contam_ngrams`` (int64) and
    ``contaminated`` (bool) columns appended to the batch.
    """

    def __init__(self, eval_hashes, n: int = DEFAULT_N,
                 text_col: str = "text"):
        import ray

        if isinstance(eval_hashes, ray.ObjectRef):
            eval_hashes = ray.get(eval_hashes)
        self.eval_hashes = np.ascontiguousarray(eval_hashes, dtype=np.uint64)
        self.n = int(n)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        h, gram_doc = ngram_hashes(batch.column(self.text_col), self.n)
        counts = np.zeros(batch.num_rows, dtype=np.int64)
        if h.size and self.eval_hashes.size:
            pos = np.searchsorted(self.eval_hashes, h)
            pos[pos == self.eval_hashes.size] = self.eval_hashes.size - 1
            hit = self.eval_hashes[pos] == h
            if hit.any():
                # distinct (doc, gram) pairs only: sort by (doc, hash)
                # and drop adjacent duplicates
                hd, hh = gram_doc[hit], h[hit]
                order = np.lexsort((hh, hd))
                hd, hh = hd[order], hh[order]
                first = np.ones(hd.size, dtype=bool)
                first[1:] = (hd[1:] != hd[:-1]) | (hh[1:] != hh[:-1])
                counts = np.bincount(
                    hd[first], minlength=batch.num_rows
                ).astype(np.int64)
        return batch.append_column(
            "contam_ngrams", pa.array(counts, type=pa.int64())
        ).append_column(
            "contaminated", pa.array(counts > 0, type=pa.bool_())
        )


def decontaminate(ds, eval_texts, n: int = DEFAULT_N,
                  text_col: str = "text", drop: bool = True,
                  concurrency=None):
    """Annotate (and by default filter) a Dataset against an eval set.

    Builds the eval n-gram set once, broadcasts it, and streams the
    corpus through :class:`ContaminationStage`.  With ``drop=True``
    contaminated rows are removed; otherwise the annotated dataset is
    returned for auditing.
    """
    import ray

    ref = ray.put(build_eval_ngrams(eval_texts, n))
    out = ds.map_batches(
        ContaminationStage,
        fn_constructor_kwargs={
            "eval_hashes": ref, "n": n, "text_col": text_col
        },
        batch_format="pyarrow",
        # autoscaling pool: a FIXED pool of N actors can grab every
        # CPU of a small session and starve the upstream read /
        # downstream sort into a wedge (reproduced at num_cpus=4)
        concurrency=(
            (1, concurrency) if isinstance(concurrency, int)
            else concurrency if concurrency is not None
            else auto_concurrency()
        ),
    )
    if drop:
        out = out.map_batches(
            lambda t: t.filter(pc.invert(t.column("contaminated"))),
            batch_format="pyarrow",
        )
    return out
