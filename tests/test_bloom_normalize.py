"""Bloom incremental dedup (extras/bloom) + Unicode normalize stage
(extras/textstats.normalize_batch)."""

import numpy as np
import pyarrow as pa
import pytest


def _docs(texts):
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


# ---------------------------------------------------------------- bloom


def test_bloom_no_false_negatives():
    """Membership test: every added key reads back maybe=True (Bloom's
    one-sided error), arbitrary non-keys may or may not."""
    from raybm25.extras.bloom import bloom_add, bloom_empty, bloom_maybe

    keys = np.array([f"doc number {i}" for i in range(200)], dtype=object)
    reg = bloom_empty(1 << 13)
    bloom_add(reg, keys, 1 << 13, 5)
    assert bloom_maybe(reg, keys, 1 << 13, 5).all()


def test_bloom_merge_is_union():
    from raybm25.extras.bloom import bloom_add, bloom_empty, bloom_maybe, bloom_merge

    a, b = bloom_empty(1 << 12), bloom_empty(1 << 12)
    k1 = np.array(["alpha", "beta"], dtype=object)
    k2 = np.array(["gamma"], dtype=object)
    bloom_add(a, k1, 1 << 12, 4)
    bloom_add(b, k2, 1 << 12, 4)
    m = bloom_merge([a, b])
    assert bloom_maybe(m, np.concatenate([k1, k2]), 1 << 12, 4).all()


def test_bloom_merge_empty_raises():
    from raybm25.extras.bloom import bloom_merge

    with pytest.raises(ValueError):
        bloom_merge([])


def test_incremental_new_ids_exact(ray_session):
    """End-to-end exactness vs a driver-side anti-join, with a filter
    deliberately undersized so false positives flow through the
    confirm pass — and get resolved."""
    import ray.data

    from raybm25.extras.bloom import incremental_new_ids

    rng = np.random.default_rng(7)
    corpus_texts = [f"corpus text {i} {rng.integers(1e6)}" for i in range(300)]
    # new batch: 40 true dups of the corpus + 160 genuinely new
    new_texts = [corpus_texts[i * 7] for i in range(40)] + [
        f"new text {i} {rng.integers(1e6)}" for i in range(160)
    ]
    corpus = ray.data.from_arrow(_docs(corpus_texts))
    new = ray.data.from_arrow(_docs(new_texts))
    # tiny filter: ~300 keys in 2048 bits, k=2 -> real FP rate
    ids, stats = incremental_new_ids(corpus, new, m_bits=2048, k=2)
    truth = sorted(
        i for i, t in enumerate(new_texts) if t not in set(corpus_texts)
    )
    assert ids["doc_id"].tolist() == truth
    assert stats["n_new"] == 200
    assert stats["n_candidates"] >= 40  # all true dups must be candidates
    assert stats["n_definite_new"] + stats["n_candidates"] == 200
    # the undersized filter should actually produce false positives
    # that the confirm pass then admits (otherwise the test isn't
    # exercising the exactness argument)
    assert stats["n_false_positive"] > 0


def test_incremental_no_candidates_path(ray_session):
    """Disjoint corpora with a huge filter: every new row is a bloom
    miss, the confirm pass never runs."""
    import ray.data

    from raybm25.extras.bloom import incremental_new_ids

    corpus = ray.data.from_arrow(_docs([f"old {i}" for i in range(50)]))
    new = ray.data.from_arrow(_docs([f"fresh {i}" for i in range(30)]))
    ids, stats = incremental_new_ids(corpus, new, m_bits=1 << 22, k=7)
    assert ids["doc_id"].tolist() == list(range(30))
    assert stats["n_false_positive"] == 0


# ------------------------------------------------------------ normalize


def test_normalize_matches_unicodedata_reference():
    """Pinned order NFC -> ctrl strip -> ws collapse -> trim vs a
    plain-Python reference."""
    import re
    import unicodedata

    from raybm25.extras.textstats import normalize_batch

    texts = [
        "plain ascii",
        "tabs\tand\nnewlines  and   runs",
        "ctrl\x00\x01\x08\x0b\x0c\x0e\x1f\x7fbytes",
        "e\u0301 decomposed caf\u00e9 composed \u00e9 and e\u0301",
        "  edges  ",
        "",
        None,
        " nbsp stays ",  # RE2 \s is ASCII: NBSP untouched
    ]
    out = normalize_batch(_docs(texts)).to_pandas()

    def ref(t):
        if t is None:
            return None
        t = unicodedata.normalize("NFC", t)
        t = re.sub(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "", t)
        t = re.sub(r"[\t\n\f\r ]+", " ", t)
        return t.strip(" ")

    for i, t in enumerate(texts):
        r = ref(t)
        got = out["text_norm"][i]
        assert (got is None and r is None) or got == r, (i, got, r)
        if r is not None:
            assert out["n_chars_norm"][i] == len(r)
            assert bool(out["changed"][i]) == (r != t)


def test_normalize_ascii_rows_skip_python_nfc(monkeypatch):
    """The ASCII gate: a pure-ASCII batch must not call
    unicodedata.normalize at all."""
    import unicodedata

    from raybm25.extras import textstats

    calls = []
    orig = unicodedata.normalize
    monkeypatch.setattr(
        unicodedata, "normalize", lambda f, s: calls.append(s) or orig(f, s)
    )
    out = textstats.normalize_batch(_docs(["plain", "ascii  only\t"]))
    assert calls == []
    assert out.column("text_norm").to_pylist() == ["plain", "ascii only"]


def test_normalize_contract_vs_duckdb():
    """The contract oracle replayed locally (same SQL family as
    contract.ORACLE_SQL['normalize_text'])."""
    import duckdb

    from raybm25.extras.textstats import normalize_batch

    texts = ["mix e\u0301d\x01 text  ", "pure ascii", "tr\u00e8s composed"]
    tbl = _docs(texts)
    eng = normalize_batch(tbl).to_pandas()
    con = duckdb.connect()
    con.register("documents", tbl)
    ora = con.sql(
        "SELECT doc_id, trim(regexp_replace(regexp_replace("
        "nfc_normalize(text),"
        " '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'),"
        " '\\s+', ' ', 'g'), ' ') AS text_norm FROM documents ORDER BY doc_id"
    ).df()
    assert eng["text_norm"].tolist() == ora["text_norm"].tolist()
