"""Train/test decontamination: kernel parity with a per-doc reference
implementation, stage behavior, and the streaming wrapper."""

import numpy as np
import pyarrow as pa
import pytest

from raybm25.analysis import tokenize
from raybm25.extras.decontam import (
    ContaminationStage,
    _ranges,
    build_eval_ngrams,
    decontaminate,
    ngram_hashes,
)


def _ref_ngrams(text: str, n: int) -> list[tuple[str, ...]]:
    toks = tokenize(text)
    return [tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def test_ranges_with_zero_groups():
    assert _ranges(np.array([2, 0, 3])).tolist() == [0, 1, 0, 1, 2]
    assert _ranges(np.array([0, 0])).tolist() == []
    assert _ranges(np.array([1])).tolist() == [0]


@pytest.mark.parametrize("n", [1, 2, 3, 5])
def test_ngram_hashes_match_per_doc_reference(n):
    texts = [
        "Merge join FAST merge join fast",
        "one two",
        "",
        "alpha beta gamma delta epsilon zeta",
        "alpha beta gamma",
    ]
    h, doc = ngram_hashes(pa.array(texts), n)
    # counts per doc match the reference n-gram count
    for i, t in enumerate(texts):
        assert (doc == i).sum() == len(_ref_ngrams(t, n))
    # equal token sequences hash equal, different ones differ
    ref_all = [g for t in texts for g in _ref_ngrams(t, n)]
    by_hash: dict[int, tuple] = {}
    for hv, g in zip(h.tolist(), ref_all):
        assert by_hash.setdefault(hv, g) == g  # no intra-test collision
    # distinct sequences -> distinct hashes
    assert len(set(by_hash.values())) == len(by_hash)


def test_ngram_order_sensitivity():
    h1, _ = ngram_hashes(pa.array(["alpha beta gamma"]), 3)
    h2, _ = ngram_hashes(pa.array(["gamma beta alpha"]), 3)
    assert h1[0] != h2[0]


def test_build_eval_ngrams_sorted_unique():
    ev = build_eval_ngrams(["a b c a b c", "a b c"], n=2)
    assert np.all(np.diff(ev.astype(np.uint64).view(np.uint64)) > 0)
    # "a b", "b c", "c a" -> 3 distinct bigrams
    assert ev.size == 3


def test_stage_counts_distinct_shared_ngrams():
    eval_texts = ["the quick brown fox jumps"]
    ev = build_eval_ngrams(eval_texts, n=3)
    batch = pa.table(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                # contains "the quick brown" AND "quick brown fox",
                # "quick brown fox" twice -> distinct count 2
                "the quick brown fox and quick brown fox again",
                "totally clean document here",
                "brown fox jumps",  # one shared trigram
                "",
            ],
        }
    )
    out = ContaminationStage(ev, n=3)(batch)
    assert out.column("contam_ngrams").to_pylist() == [2, 0, 1, 0]
    assert out.column("contaminated").to_pylist() == [
        True,
        False,
        True,
        False,
    ]


def test_stage_empty_eval_set():
    out = ContaminationStage(np.empty(0, dtype=np.uint64), n=3)(
        pa.table({"text": ["a b c d"]})
    )
    assert out.column("contam_ngrams").to_pylist() == [0]


def test_decontaminate_streaming(ray_session):
    import ray.data

    eval_texts = ["held out evaluation sentence number one"]
    rows = [
        {"doc_id": 0, "text": "held out evaluation sentence leaked here"},
        {"doc_id": 1, "text": "completely unrelated training text"},
        {"doc_id": 2, "text": "another clean one"},
    ]
    ds = ray.data.from_items(rows)
    kept = decontaminate(ds, eval_texts, n=4, concurrency=1).to_pandas()
    assert sorted(kept["doc_id"].tolist()) == [1, 2]
    annotated = decontaminate(
        ds, eval_texts, n=4, drop=False, concurrency=1
    ).to_pandas()
    got = dict(zip(annotated["doc_id"], annotated["contaminated"]))
    assert got == {0: True, 1: False, 2: False}
