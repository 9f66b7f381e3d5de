"""Bigram LM quality scoring (extras/lm) vs hand-computed cross
entropy on a tiny corpus. Reference behavior: CCNet-style perplexity
partitioning (Wenzek et al. 2020), bigram MLE variant."""

import math
from collections import Counter

import pyarrow as pa
import pytest

import ray.data

from raybm25.extras.lm import BigramScoreStage, bigram_lm_topk, fit_bigram_lm

DOCS = [
    (0, "the cat sat"),
    (1, "the cat ran"),
    (2, "the dog sat"),
    (3, "zebra"),           # one token: no bigrams, excluded
    (4, "the cat sat"),     # duplicate of 0: identical score
]


def _brute_lm():
    pairs = Counter()
    for _, t in DOCS:
        toks = t.split()
        for a, b in zip(toks, toks[1:]):
            pairs[(a, b)] += 1
    lefts = Counter()
    for (a, _b), c in pairs.items():
        lefts[a] += c
    return pairs, lefts


def _brute_xent(text, pairs, lefts):
    toks = text.split()
    lps = [math.log(pairs[(a, b)] / lefts[a])
           for a, b in zip(toks, toks[1:])]
    return -sum(lps) / len(lps)


@pytest.fixture(scope="module")
def docs_path(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("lm")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({
            "doc_id": [d for d, _ in DOCS],
            "text": [t for _, t in DOCS],
        }),
        str(tmp / "documents.parquet"),
    )
    return str(tmp / "documents.parquet")


def test_fit_matches_brute(docs_path):
    ds = ray.data.read_parquet(docs_path)
    pairs, lefts = fit_bigram_lm(ds)
    bp, bl = _brute_lm()
    assert pairs == dict(bp)
    assert lefts == dict(bl)


def test_scores_match_brute(docs_path):
    ds = ray.data.read_parquet(docs_path)
    pairs, lefts = fit_bigram_lm(ds)
    scored = ds.map_batches(
        BigramScoreStage(pairs, lefts), batch_format="pyarrow"
    ).to_pandas().set_index("doc_id")["cross_entropy"]
    bp, bl = _brute_lm()
    for did, text in DOCS:
        if len(text.split()) < 2:
            assert did not in scored.index
        else:
            assert scored[did] == pytest.approx(_brute_xent(text, bp, bl))
    # duplicate docs score identically
    assert scored[0] == scored[4]


def test_topk_order_and_cap(docs_path):
    import os

    df = bigram_lm_topk(os.path.dirname(docs_path), k=10)
    assert list(df["rank"]) == list(range(1, len(df) + 1))
    xs = list(df["cross_entropy"])
    assert xs == sorted(xs, reverse=True)
    assert 3 not in set(df["doc_id"])  # no-bigram doc excluded


def test_top_bigrams_cap_and_unseen_raises(docs_path):
    ds = ray.data.read_parquet(docs_path)
    pairs, lefts = fit_bigram_lm(ds, top_bigrams=2)
    assert len(pairs) == 2
    # the cap prunes pairs -> scoring the full corpus now hits an
    # unseen bigram and must fail loudly, not smooth silently
    with pytest.raises((KeyError, Exception)):
        ds.map_batches(
            BigramScoreStage(pairs, lefts), batch_format="pyarrow"
        ).materialize()
