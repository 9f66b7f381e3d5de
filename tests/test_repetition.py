"""Gopher-style repetition signals: vectorized kernel vs a per-doc
reference implementation, plus hand-checked edge cases."""

from collections import Counter

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from raybm25.analysis import tokenize
from raybm25.extras.textstats import repetition_batch


def _ref(text: str) -> dict:
    toks = tokenize(text)
    n = len(toks)
    if n == 0:
        return dict(n_tokens=0, dup_token_frac=0.0, top_bigram_frac=0.0,
                    dup_trigram_frac=0.0, max_token_run=0)
    bi = Counter(zip(toks, toks[1:]))
    tri = Counter(zip(toks, toks[1:], toks[2:]))
    n_tri = max(n - 2, 0)
    runs, cur = [], 1
    for a, b in zip(toks, toks[1:]):
        if a == b:
            cur += 1
        else:
            runs.append(cur)
            cur = 1
    runs.append(cur)
    return dict(
        n_tokens=n,
        dup_token_frac=(n - len(set(toks))) / n,
        top_bigram_frac=min(1.0, 2 * max(bi.values(), default=0) / n),
        dup_trigram_frac=((n_tri - len(tri)) / n_tri) if n_tri else 0.0,
        max_token_run=max(runs),
    )


def _run(texts):
    batch = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    return repetition_batch(batch).to_pandas()


def test_hand_cases():
    out = _run(
        [
            "a a a a",               # one token repeated
            "a b a b a b",           # top bigram covers everything
            "x y z",                 # all distinct
            "",                      # empty
            "one two three one two three",  # repeated trigram
        ]
    )
    r0 = out.iloc[0]
    assert r0.n_tokens == 4 and r0.max_token_run == 4
    assert r0.dup_token_frac == 3 / 4
    assert r0.top_bigram_frac == 1.0  # 2*3/4 capped at 1
    r1 = out.iloc[1]
    assert r1.max_token_run == 1
    assert r1.top_bigram_frac == 1.0  # "a b" x3 -> 6/6
    assert r1.dup_trigram_frac == 2 / 4  # aba/bab x2 each
    r2 = out.iloc[2]
    assert r2.dup_token_frac == 0.0 and r2.dup_trigram_frac == 0.0
    assert r2.top_bigram_frac == 2 / 3
    r3 = out.iloc[3]
    assert r3.n_tokens == 0 and r3.max_token_run == 0
    r4 = out.iloc[4]
    assert r4.dup_trigram_frac == 1 / 4  # "one two three" twice


texts_st = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=8
)


@settings(max_examples=60, deadline=None)
@given(texts=texts_st)
def test_matches_per_doc_reference(texts):
    out = _run(texts)
    for i, t in enumerate(texts):
        ref = _ref(t)
        row = out.iloc[i]
        for key, v in ref.items():
            got = row[key]
            assert got == v, (key, t, got, v)


def test_multi_doc_isolation():
    """Signals never leak across doc boundaries (no cross-doc
    bigrams/runs)."""
    out = _run(["a a", "a a"])
    assert out.max_token_run.tolist() == [2, 2]
    assert out.top_bigram_frac.tolist() == [1.0, 1.0]
    out2 = _run(["x y", "y x"])
    assert out2.dup_token_frac.tolist() == [0.0, 0.0]
