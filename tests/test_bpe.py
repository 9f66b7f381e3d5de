"""BPE vocabulary training + encoding (extras/bpe): histogram-based
trainer vs a naive expand-the-corpus reference, encode-stage semantics,
and the Ray word-histogram path."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from raybm25.extras.bpe import (
    END,
    BpeEncodeStage,
    _merge_pass,
    bpe_apply,
    bpe_train,
    word_histogram,
)

WORDS = [
    "low", "low", "low", "lower", "lower",
    "newest", "newest", "newest", "newest", "widest", "widest",
]


def naive_train(words_with_repeats, n_merges):
    """Independent reference: operate directly on the expanded corpus
    (no histogram, no incremental pair index)."""
    corpus = [list(w) + [END] for w in words_with_repeats]
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for syms in corpus:
            for p in zip(syms, syms[1:]):
                pc[p] += 1
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((best[0], best[1], pc[best]))
        a, b = best
        corpus = [list(_merge_pass(tuple(s), a, b, a + b)) for s in corpus]
    return merges


def test_trainer_matches_naive_reference():
    got = bpe_train(dict(Counter(WORDS)), 8)
    assert got == naive_train(WORDS, 8)


def test_trainer_tie_break_deterministic():
    # 'ab' and 'cd' both appear twice; lexicographically smaller pair
    # ('a','b') must win rank 1
    hist = {"ab": 2, "cd": 2}
    m = bpe_train(hist, 1)
    assert m[0][:2] == ("a", "b")


def test_trainer_exhausts_gracefully():
    # single 1-char word: only pair is (c, </w>); further merges stop
    m = bpe_train({"c": 3}, 10)
    assert m == [("c", END, 3)]


def test_merge_pass_left_to_right_nonoverlap():
    assert _merge_pass(tuple("aaa") + (END,), "a", "a", "aa") == (
        "aa", "a", END,
    )
    assert _merge_pass(tuple("aaaa") + (END,), "a", "a", "aa") == (
        "aa", "aa", END,
    )


def test_apply_in_rank_order():
    merges = [(a, b) for a, b, _ in bpe_train(dict(Counter(WORDS)), 8)]
    assert bpe_apply("lowest", merges) == ("low", "est</w>")
    # unseen characters pass through as singletons
    assert bpe_apply("zzz", merges) == ("z", "z", "z", END)


def test_encode_stage_matches_apply():
    merges = bpe_train(dict(Counter(WORDS)), 8)
    stage = BpeEncodeStage(merges)
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": ["Lower, newest!", "", "low low wider"],
        }
    )
    out = stage(batch)
    pairs = [(a, b) for a, b, _ in merges]
    want = [
        len(bpe_apply("lower", pairs)) + len(bpe_apply("newest", pairs)),
        0,
        2 * len(bpe_apply("low", pairs)) + len(bpe_apply("wider", pairs)),
    ]
    assert out.column("n_bpe").to_pylist() == want
    # memo populated once per distinct word
    assert set(stage._memo) == {"lower", "newest", "low", "wider"}


def test_word_histogram_over_ray(ray_session):
    import ray.data

    ds = ray.data.from_items(
        [{"text": "low low lower"}, {"text": "Newest LOW"}, {"text": None}]
    )
    hist = word_histogram(ds)
    assert hist == {"low": 3, "lower": 1, "newest": 1}
    assert word_histogram(ds, min_count=2) == {"low": 3}


def test_trained_table_is_valid():
    """Every merge's parts are single chars or outputs of earlier
    merges — the property that makes rank-order application equal the
    lowest-rank-first encoder."""
    merges = bpe_train(dict(Counter(WORDS)), 8)
    produced = set()
    for a, b, _ in merges:
        for part in (a, b):
            assert len(part) == 1 or part == END or part in produced
        produced.add(a + b)
