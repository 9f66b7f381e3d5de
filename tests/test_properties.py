"""Property-based checks (hypothesis) for the pure kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1), min_size=1, max_size=50))
def test_popcount64_matches_int_bit_count(vals):
    from raybm25.extras.dedup import popcount64

    arr = np.array(vals, dtype=np.uint64)
    assert popcount64(arr).tolist() == [int(v).bit_count() for v in vals]


@settings(deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcxyz019", min_size=1, max_size=24), min_size=1, max_size=40
    )
)
def test_poly_token_hash_reference_impl(toks):
    """Vectorized byte-matrix Horner == the obvious per-token loop."""
    from raybm25.extras.textstats import FP_BASE, poly_token_hashes

    def ref(tok: str) -> int:
        h = 0
        for b in tok.encode():
            h = (h * int(FP_BASE) + b) % (1 << 64)
        return h

    assert poly_token_hashes(toks).tolist() == [ref(t) for t in toks]


@settings(deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.sampled_from(["aa bb", "cc dd", "ee", "ff gg hh"])),
        min_size=1,
        max_size=60,
    )
)
def test_exact_dedup_loser_logic_matches_pandas(rows):
    """The coarse-bucket loser kernel == pandas groupby ground truth."""
    import pandas as pd

    from raybm25.extras.dedup import _losers_in_bucket
    from raybm25.hashing import hash64, hash64b

    ids = list(range(len(rows)))
    texts = [t for _, t in rows]
    df = pd.DataFrame(
        {
            "doc_id": pd.array(ids, dtype="int64"),
            "texth": hash64(np.array(texts, dtype=object)).view(np.int64),
            "texth2": hash64b(np.array(texts, dtype=object)).view(np.int64),
        }
    )
    losers = set(_losers_in_bucket(df)["doc_id"].tolist())
    winners_want = {
        min(i for i in ids if texts[i] == t) for t in set(texts)
    }
    assert losers == set(ids) - winners_want


@settings(deadline=None)
@given(st.text(alphabet="ab01 \n.", max_size=120), st.text(alphabet="ab01 \n.", max_size=120))
def test_fingerprint_shared_prefix_property(a, b):
    """Identical texts always share all fingerprints; fingerprints are
    deterministic."""
    import pyarrow as pa

    from raybm25.extras.textstats import fingerprint_batch

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()), "text": [a, a]})
    out = fingerprint_batch(t)
    f1, f2 = [list(x) for x in out.column("fingerprints").to_pylist()]
    assert f1 == f2


@settings(deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=60,
    )
)
def test_union_find_matches_bfs_components(edges):
    """union_find_pairs == BFS connected components with min-id reps."""
    import pandas as pd

    from raybm25.extras.dedup import union_find_pairs

    pairs = pd.DataFrame(
        {"doc_a": [a for a, _ in edges], "doc_b": [b for _, b in edges]}
    )
    got = dict(zip(*(union_find_pairs(pairs)[c] for c in ("doc_id", "rep"))))

    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    seen: set[int] = set()
    for start in sorted(adj):
        if start in seen:
            continue
        comp, stack = [], [start]
        while stack:
            v = stack.pop()
            if v in seen:
                continue
            seen.add(v)
            comp.append(v)
            stack.extend(adj[v] - seen)
        rep = min(comp)
        for v in comp:
            want[v] = rep
    assert got == want


@given(
    st.lists(
        st.text(alphabet="abcde01", min_size=1, max_size=8),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=1, max_value=12),
)
@settings(max_examples=60, deadline=None)
def test_bpe_trainer_matches_naive(words, n_merges):
    """Histogram-based trainer == expand-the-corpus reference on
    arbitrary small vocabularies (tie-breaks included)."""
    from collections import Counter

    from raybm25.extras.bpe import bpe_train
    from tests.test_bpe import naive_train

    assert bpe_train(dict(Counter(words)), n_merges) == naive_train(
        words, n_merges
    )


@given(
    st.lists(
        st.text(alphabet="abcde01", min_size=1, max_size=8),
        min_size=1,
        max_size=20,
    ),
    st.text(alphabet="abcde01xyz", min_size=0, max_size=12),
)
@settings(max_examples=60, deadline=None)
def test_bpe_apply_lossless_and_bounded(words, probe):
    """Encoding any word (in- or out-of-vocabulary) is lossless and
    emits between 1 and len+1 symbols."""
    from collections import Counter

    from raybm25.extras.bpe import END, bpe_apply, bpe_train

    merges = [(a, b) for a, b, _ in bpe_train(dict(Counter(words)), 8)]
    toks = bpe_apply(probe, merges)
    assert "".join(toks).replace(END, "") == probe
    assert 1 <= len(toks) <= len(probe) + 1


@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-100, max_value=100,
                allow_nan=False, allow_infinity=False,
            ),
            min_size=4,
            max_size=4,
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=60, deadline=None)
def test_quantize_int8_bounds(rows):
    import numpy as np

    from raybm25.extras.similarity import quantize_int8

    m = np.asarray(rows, dtype=np.float64)
    q = quantize_int8(m)
    assert q.shape == m.shape
    assert np.all(np.abs(q) <= 127.0)
    assert np.all(q == np.floor(q))
    # the max-|v| component always quantizes to +-127 (scale anchor)
    mx = np.abs(m).max(axis=1)
    for i in np.flatnonzero(mx > 0):
        assert np.abs(q[i]).max() == 127.0
