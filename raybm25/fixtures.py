"""Deterministic synthetic ``pages`` corpus + fixed query set (FIXTURES.md).

Schema per BASELINE.json ``input_hint``:
    (url: string, warc_ts: timestamp[us], html: binary, text: string,
     lang: string)

Properties:
- fixed seed, no wall clock — identical bytes every run;
- ~2% duplicate urls with differing ``warc_ts`` (exercises
  last-write-wins dedup, SURVEY.md §2 D1);
- ``html`` generated FROM ``text`` by the invertible template in
  :mod:`raybm25.extract`, so ``extract(html) == text`` byte-identically
  (the per-row invariant);
- Zipfian word sampler over a mixed-case vocabulary with punctuation
  and numerics, arranged into paragraphs;
- a few hand-written documents with known term frequencies for BM25
  hand-check tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .extract import render_html

EPOCH_US = 1_600_000_000_000_000  # fixed base timestamp (us)

# Hand-written docs with known term statistics (tiny-scale BM25 hand checks).
HAND_DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick quick fox",
    "lazy dogs sleep. Lazy DOGS dream; dogs!",
    "Rain-shadow valleys: rain rain rain.",
    "an entirely unrelated document about databases and indexes",
]

_PUNCT = [".", ",", ";", "!", "?", ":", " -"]


def _vocabulary(rng: np.random.Generator, size: int = 5000) -> list[str]:
    syllables = [
        "ra", "to", "ken", "ver", "mi", "lo", "sa", "du", "pex", "qua",
        "zin", "bor", "cal", "dem", "fis", "gul", "hax", "jor", "kib", "lum",
    ]
    vocab = []
    seen = set()
    while len(vocab) < size:
        n = int(rng.integers(2, 5))
        w = "".join(rng.choice(syllables) for _ in range(n))
        if int(rng.integers(0, 10)) == 0:
            w = w.capitalize()
        if int(rng.integers(0, 20)) == 0:
            w = w + str(int(rng.integers(0, 100)))
        if w.lower() not in seen:
            seen.add(w.lower())
            vocab.append(w)
    return vocab


def make_pages(n_rows: int = 2000, seed: int = 42, dup_frac: float = 0.02) -> pa.Table:
    """Build the pages table; deterministic in (n_rows, seed, dup_frac)."""
    rng = np.random.default_rng(seed)
    vocab = _vocabulary(rng)
    vsize = len(vocab)
    # Zipf ranks: probability ∝ 1/(rank+1)
    probs = 1.0 / np.arange(1, vsize + 1)
    probs /= probs.sum()

    urls: list[str] = []
    texts: list[str] = []
    langs: list[str] = []
    n_logical = max(1, n_rows - int(n_rows * dup_frac) - len(HAND_DOCS))
    for i in range(n_logical):
        n_paras = int(rng.integers(1, 4))
        paras = []
        for _ in range(n_paras):
            n_words = int(rng.integers(8, 80))
            idx = rng.choice(vsize, size=n_words, p=probs)
            words = [vocab[j] for j in idx]
            # sprinkle punctuation deterministically
            sent = []
            for w in words:
                sent.append(w)
                if int(rng.integers(0, 7)) == 0:
                    sent[-1] = w + str(rng.choice(_PUNCT))
            paras.append(" ".join(sent))
        urls.append(f"https://site{i % 97}.example/p/{i}")
        texts.append("\n\n".join(paras))
        r = int(rng.integers(0, 20))
        langs.append("en" if r < 16 else ("de" if r < 18 else ("fr" if r < 19 else "")))
    for j, doc in enumerate(HAND_DOCS):
        urls.append(f"https://hand.example/d/{j}")
        texts.append(doc)
        langs.append("en")

    ts = [EPOCH_US + i * 1_000_000 for i in range(len(urls))]

    # duplicates: re-emit some urls with a later warc_ts and different text;
    # the later (max warc_ts) version must win dedup.
    n_dups = min(int(n_rows * dup_frac), len(urls))
    dup_idx = rng.choice(len(urls) - len(HAND_DOCS), size=n_dups, replace=False)
    for d, i in enumerate(dup_idx):
        urls.append(urls[i])
        texts.append(texts[i] + "\n\nupdated revision " + str(d))
        langs.append(langs[i])
        ts.append(EPOCH_US + (len(urls) + d) * 1_000_000 + 500_000)

    htmls = [render_html(t, u) for t, u in zip(texts, urls)]
    # deterministic shuffle so dups are not adjacent to originals
    order = rng.permutation(len(urls))
    return pa.table(
        {
            "url": pa.array([urls[i] for i in order], pa.string()),
            "warc_ts": pa.array([ts[i] for i in order], pa.timestamp("us")),
            "html": pa.array([htmls[i] for i in order], pa.binary()),
            "text": pa.array([texts[i] for i in order], pa.string()),
            "lang": pa.array([langs[i] for i in order], pa.string()),
        }
    )


# Fixed reference query set (FIXTURES.md §2): single rare term, single
# hot term, multi-term mixes, absent term, case variant, punctuation.
def make_queries() -> list[dict]:
    return [
        {"query_id": 1, "query_text": "the", "k": 10},
        {"query_id": 2, "query_text": "quick fox", "k": 10},
        {"query_id": 3, "query_text": "lazy dogs", "k": 10},
        {"query_id": 4, "query_text": "Rain-shadow", "k": 10},
        {"query_id": 5, "query_text": "QUICK", "k": 10},
        {"query_id": 6, "query_text": "zzzzmissingterm", "k": 10},
        {"query_id": 7, "query_text": "databases indexes fox", "k": 10},
        {"query_id": 8, "query_text": "rato kenver", "k": 100},
        {"query_id": 9, "query_text": "ratoken", "k": 1},
        {"query_id": 10, "query_text": "verlo rain dogs quick", "k": 10},
    ]
