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
    """Covered spans are cut from the ORIGINAL text (separators around
    the cut survive); untouched docs come back byte-identical."""
    from raybm25.extras.textstats import TOKEN_RE

    src = dict(zip(_corpus().column("doc_id").to_pylist(),
                   _corpus().column("text").to_pylist()))
    ds = ray.data.from_arrow(_corpus())
    out = scrub_dup_spans(ds, w=8).to_pandas().set_index("doc_id")
    assert out.loc[1, "text"] == "alpha beta  gamma delta"
    assert out.loc[2, "text"] == " omega psi chi phi upsilon"
    assert out.loc[3, "text"] == "one two three four five six "
    # untouched docs are byte-identical to the input
    for d in (4, 5):
        assert out.loc[d, "text"] == src[d]
    assert (
        out["dl"] - out["n_covered"]
        == out["text"].map(lambda t: len(TOKEN_RE.findall(t.lower())))
    ).all()


def test_scrub_preserves_case_and_punctuation(ray_session):
    """The kept text keeps its original bytes: casing, punctuation and
    whitespace outside the cut spans survive."""
    shared = "one two three four five six seven eight"
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": [
                f"U.S. GDP grew 3.1%! {shared} (see Fig. 2)",
                f"{shared} -- unrelated TAIL here, ok?",
            ],
        }
    )
    out = scrub_dup_spans(ray.data.from_arrow(tbl), w=8).to_pandas()
    t1 = out.set_index("doc_id").loc[1, "text"]
    assert t1 == "U.S. GDP grew 3.1%!  (see Fig. 2)"
    t2 = out.set_index("doc_id").loc[2, "text"]
    assert t2 == " -- unrelated TAIL here, ok?"


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


def test_bloom_addresses_full_table():
    """Fibonacci-hash probes must reach the WHOLE bit array — a fixed
    shift capped addressing at 2^24 bits and saturated bigger tables."""
    rng = np.random.default_rng(5)
    members = rng.integers(0, 2**64, 64, dtype=np.uint64)
    bl = BloomLookup(members, bits_per_key=2**21)  # n_bits = 2^27
    assert bl.n_bits == 2**27
    probes = bl._probe(rng.integers(0, 2**64, 20000, dtype=np.uint64), 0)
    assert int(probes.max()) > 2**24  # top region actually addressed
    assert int(probes.max()) < bl.n_bits
    assert bl.contains(members).all()


def test_dup_span_stage_replaces_existing_counter_columns(ray_session):
    """Input already carrying dl / n_covered (a docstore export) gets
    them REPLACED, not duplicated."""
    import ray as _ray

    tbl = _corpus().append_column(
        "dl", pa.array([99] * 5, pa.int64())
    )
    from raybm25.extras.substring import dup_hashes

    dup = dup_hashes(ray.data.from_arrow(_corpus()), w=8)
    stage = DupSpanStage(_ray.put(_ExactLookup(dup)), w=8)
    out = stage(tbl)
    assert out.column_names.count("dl") == 1
    assert out.column("dl").to_pylist()[0] != 99  # recomputed


def test_empty_and_null_text(ray_session):
    tbl = pa.table(
        {"doc_id": pa.array([1, 2], pa.int64()), "text": pa.array(["", None], pa.string())}
    )
    cov = dup_span_coverage(ray.data.from_arrow(tbl), w=8).to_pandas()
    assert (cov["n_covered"] == 0).all() and (cov["dl"] == 0).all()
