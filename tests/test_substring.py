"""Duplicated n-gram span detection (extras/substring): window-hash
exactness, corpus stats, coverage/scrub semantics, Bloom scale path."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from raybm25.extras.substring import (
    BloomLookup,
    DupSpanStage,
    _ExactLookup,
    dup_hashes,
    dup_span_coverage,
    ngram_stats,
    scrub_dup_spans,
    window_hashes,
)
from raybm25.extras.textstats import FP_BASE, poly_token_hashes

PHRASE = "the quick brown fox jumps over the lazy dog"  # 9 tokens


def _corpus():
    """3 docs sharing one 9-token phrase + 1 unrelated + 1 short."""
    return pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": [
                f"alpha beta {PHRASE} gamma delta",
                f"{PHRASE} omega psi chi phi upsilon",
                f"one two three four five six {PHRASE}",
                "totally unrelated words without any repeats at all here",
                "too short",
            ],
        }
    )


def test_window_hashes_match_explicit_horner():
    toks = "alpha beta gamma delta epsilon zeta eta theta iota".split()
    h = window_hashes(toks, 4)
    th = poly_token_hashes(toks)
    B = np.uint64(FP_BASE)
    with np.errstate(over="ignore"):
        for i in range(len(toks) - 3):
            acc = th[i]
            for j in range(1, 4):
                acc = acc * B + th[i + j]
            assert acc == h[i]
    assert window_hashes(toks[:3], 4).size == 0  # shorter than W


def test_ngram_stats_counts(ray_session):
    ds = ray.data.from_arrow(_corpus())
    df = ngram_stats(ds, w=8).to_pandas()
    # the 9-token shared phrase has two 8-windows, each in 3 docs
    dup = df[df.n_docs >= 2]
    assert len(dup) == 2
    assert set(dup.n_docs) == {3} and set(dup.n_total) == {3}
    # every other window is unique to its doc
    assert (df[df.n_docs == 1].n_total == 1).all()


def test_dup_span_coverage_exact(ray_session):
    ds = ray.data.from_arrow(_corpus())
    cov = dup_span_coverage(ds, w=8).to_pandas().set_index("doc_id")
    # both 8-windows of the phrase are duplicated; their union covers
    # exactly the 9 phrase tokens in each of the 3 docs holding it
    assert cov.loc[1, "n_covered"] == 9
    assert cov.loc[2, "n_covered"] == 9
    assert cov.loc[3, "n_covered"] == 9
    assert cov.loc[4, "n_covered"] == 0
    assert cov.loc[5, "n_covered"] == 0
    assert cov.loc[5, "dl"] == 2


def test_scrub_removes_exactly_covered(ray_session):
    ds = ray.data.from_arrow(_corpus())
    out = scrub_dup_spans(ds, w=8).to_pandas().set_index("doc_id")
    assert out.loc[1, "text"] == "alpha beta gamma delta"
    assert out.loc[2, "text"] == "omega psi chi phi upsilon"
    assert out.loc[3, "text"] == "one two three four five six"
    # untouched docs keep every token (normalized to analyzer form)
    for d in (4, 5):
        assert len(out.loc[d, "text"].split()) == out.loc[d, "dl"]
    assert (
        out["dl"] - out["n_covered"] == out["text"].str.split().map(len)
    ).all()


def test_bloom_lookup_no_false_negatives():
    rng = np.random.default_rng(3)
    members = rng.integers(0, 2**63, 5000, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    others = rng.integers(0, 2**63, 5000, dtype=np.uint64) * np.uint64(2)
    bl = BloomLookup(np.sort(members))
    assert bl.contains(members).all()  # never under-scrub
    fp = bl.contains(others).mean()
    assert fp < 0.05, f"false-positive rate {fp}"
    ex = _ExactLookup(np.sort(members))
    assert ex.contains(members).all()
    assert not ex.contains(others).any()


def test_bloom_coverage_superset_of_exact(ray_session):
    import ray as _ray

    ds = ray.data.from_arrow(_corpus())
    dup = dup_hashes(ds, w=8)
    exact = dup_span_coverage(ds, w=8).to_pandas().set_index("doc_id")
    bl_stage = DupSpanStage(_ray.put(BloomLookup(dup)), w=8)
    bloom = bl_stage(_corpus()).to_pandas().set_index("doc_id")
    assert (bloom["n_covered"] >= exact["n_covered"]).all()


def test_empty_and_null_text(ray_session):
    tbl = pa.table(
        {"doc_id": pa.array([1, 2], pa.int64()), "text": pa.array(["", None], pa.string())}
    )
    cov = dup_span_coverage(ray.data.from_arrow(tbl), w=8).to_pandas()
    assert (cov["n_covered"] == 0).all() and (cov["dl"] == 0).all()
