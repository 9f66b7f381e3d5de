"""Byte-pair-encoding vocabulary training and encoding, Ray-Data-first.

BPE (Sennrich, Haddow & Birch 2016, arXiv:1508.07909 — public
algorithm) is the canonical subword tokenizer trainer for LLM
training-data pipelines; the reference delegates all tokenization to
OpenSearch analyzers (/root/reference/opensearch_loader/loader.py:311
chooses ``text`` fields; the analysis itself runs server-side), so
this module is part of the beyond-the-reference training-data surface.

Scale shape (the part that matters at 100 TB):

- The ONLY distributed step is the word histogram: ``map_batches``
  emits per-batch pre-aggregated ``(word, count)`` rows (a combiner —
  each batch's duplicate words collapse before anything crosses an
  exchange), then one ``groupby("word").sum()`` shuffle reduces them
  globally.  Keys-only rows (~word bytes + 8), Zipf-distributed keys,
  pre-reduced per batch: the classic scalable wordcount.
- The merge LOOP runs on the histogram, never the corpus.  A 100-TB
  web corpus has a vocabulary of ~1e7-1e8 unique regex words — a
  driver-RAM-sized table — which is why every real BPE trainer
  (subword-nmt, HF tokenizers) trains on word counts, not raw text.
  ``min_count`` prunes the hapax tail when even the histogram is big.
- Encoding is embarrassingly parallel: ``BpeEncodeStage`` is an
  actor-pool ``map_batches`` stage holding the rank table (built once
  per actor in ``__init__``) with an unbounded per-actor word memo —
  Zipf means the memo hit rate approaches 1 on web text.

Determinism: ties in pair frequency break by lexicographically
smallest pair, so the learned table is a pure function of the corpus.

Encoding semantics (pinned, and what the SQL oracle mirrors): a word
is the symbol sequence ``chars + ['</w>']``; merges apply IN RANK
ORDER, each as ONE left-to-right non-overlapping pass.  For a valid
merge table (every merge's parts are single chars or outputs of
earlier merges — which training guarantees) this equals the
iterative lowest-rank-first encoder.  One pass per merge is also
exactly what a SQL ``replace()`` does on the ``|sym `` rendering of
the sequence (the leading ``|`` of the *next* token is never consumed
by a match, so consecutive matches cannot overlap), which is what
makes the encoder hash-checkable against DuckDB (contract.py
``bpe_encode_fixed``).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

from ..analysis import TOKEN_RE


def word_histogram(ds, text_col: str = "text", min_count: int = 1):
    """Global (word, count) histogram of a Dataset's text column.

    Per-batch combiner (Counter -> one small Arrow block) followed by
    one groupby-sum — the single all-to-all exchange in BPE training.
    Returns a plain ``dict[str, int]`` (the histogram IS the small
    side; at web scale pass ``min_count`` > 1 to prune the tail
    before collection)."""
    findall = TOKEN_RE.findall

    def _counts(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            if isinstance(t, str):
                c.update(findall(t.lower()))
        if not c:
            return pa.table(
                {"word": pa.array([], pa.string()), "count": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "word": pa.array(list(c.keys()), pa.string()),
                "count": pa.array(list(c.values()), pa.int64()),
            }
        )

    agg = ds.map_batches(_counts, batch_format="pyarrow").groupby("word").sum("count")
    out: dict[str, int] = {}
    for b in agg.iter_batches(batch_format="pyarrow"):
        words = b.column("word").to_pylist()
        counts = b.column("sum(count)").to_numpy(zero_copy_only=False)
        for w, n in zip(words, counts):
            n = int(n)
            if n >= min_count:
                out[w] = n
    return out


END = "</w>"


def bpe_train(
    histogram: dict[str, int], n_merges: int
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from a word histogram.

    Classic Sennrich loop over symbolized words (chars + ``</w>``):
    each round counts adjacent symbol pairs weighted by word
    frequency, merges the most frequent pair (ties -> lexicographically
    smallest, so the table is deterministic), and rewrites only the
    words containing it (an inverted pair->words index keeps each
    round proportional to the touched words, not the vocabulary).
    Returns ``[(left, right, pair_frequency), ...]`` in rank order."""
    words: list[tuple[str, ...]] = []
    freqs: list[int] = []
    for w, n in sorted(histogram.items()):
        words.append(tuple(w) + (END,))
        freqs.append(int(n))

    pair_counts: Counter = Counter()
    pair_words: dict[tuple[str, str], set[int]] = {}
    for i, (syms, n) in enumerate(zip(words, freqs)):
        for p in zip(syms, syms[1:]):
            pair_counts[p] += n
            pair_words.setdefault(p, set()).add(i)

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = None
        best_n = 0
        for p, n in pair_counts.items():
            if n > best_n or (n == best_n and best is not None and p < best):
                best, best_n = p, n
        if best is None or best_n <= 0:
            break
        merges.append((best[0], best[1], best_n))
        a, b = best
        ab = a + b
        touched = pair_words.pop(best, set())
        for i in sorted(touched):
            syms, n = words[i], freqs[i]
            # un-count the old pairs of this word
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= n
                if p != best:
                    s = pair_words.get(p)
                    if s is not None:
                        s.discard(i)
            new = _merge_pass(syms, a, b, ab)
            words[i] = new
            for p in zip(new, new[1:]):
                pair_counts[p] += n
                pair_words.setdefault(p, set()).add(i)
        pair_counts.pop(best, None)
    return merges


def _merge_pass(
    syms: tuple[str, ...], a: str, b: str, ab: str
) -> tuple[str, ...]:
    """One left-to-right non-overlapping merge pass of (a, b) -> ab."""
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_apply(word: str, merges: list[tuple[str, str]]) -> tuple[str, ...]:
    """Encode one word: merges in rank order, one pass each (the
    pinned semantics the module docstring derives; equals the
    lowest-rank-first encoder for any trained table)."""
    syms: tuple[str, ...] = tuple(word) + (END,)
    for a, b in merges:
        if len(syms) < 2:
            break
        syms = _merge_pass(syms, a, b, a + b)
    return syms


class BpeEncodeStage:
    """Actor-pool ``map_batches`` stage: per-doc BPE token count under
    a fixed merge table.  Rank table + word memo built once per actor
    (``__init__``); ``__call__`` tokenizes with the shared regex and
    sums memoized per-word subword counts — the Zipf memo makes the
    steady state one dict lookup per word occurrence."""

    def __init__(self, merges: list[tuple[str, str]], text_col: str = "text"):
        self.merges = [(a, b) for a, b, *_ in merges]
        self.text_col = text_col
        self._memo: dict[str, int] = {}

    def _word_tokens(self, w: str) -> int:
        n = self._memo.get(w)
        if n is None:
            n = len(bpe_apply(w, self.merges))
            self._memo[w] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        findall = TOKEN_RE.findall
        wt = self._word_tokens
        out = np.empty(batch.num_rows, dtype=np.int64)
        for i, t in enumerate(batch.column(self.text_col).to_pylist()):
            out[i] = (
                sum(wt(w) for w in findall(t.lower()))
                if isinstance(t, str)
                else 0
            )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bpe": pa.array(out, pa.int64()),
            }
        )
