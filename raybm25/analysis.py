"""Text analysis: the engine's "standard analyzer".

The reference declares ``text`` fields and lets OpenSearch's standard
analyzer do the work (SURVEY.md §2.B B1, citing loader.py:311-312).
This engine defines its analyzer precisely so that the Python engine,
the in-repo brute-force oracle, and the DuckDB oracle SQL all agree:

    tokens(text) = maximal runs of [a-z0-9] in text.lower()

(i.e. lowercase, then ASCII alnum word extraction; equivalent DuckDB:
``regexp_extract_all(lower(text), '[a-z0-9]+')``). No stemming, no
stopwords — matching OpenSearch's standard-analyzer defaults for the
behaviors the reference relies on.

``keyword`` fields are untokenized exact terms (SURVEY.md §2.B B2);
``search_as_you_type`` adds 2/3-shingles and edge-ngram prefixes
(SURVEY.md §2.B B3) via :func:`sayt_expand`.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

TOKEN_RE = re.compile(r"[a-z0-9]+")

# Analyzer identity, recorded in the index manifest so readers can
# refuse to serve an index built with a different analyzer.
ANALYZER_VERSION = "ascii-alnum-lower/1"

# DuckDB-equivalent token expression (kept here so oracle SQL strings
# are generated from one source of truth).
SQL_TOKENS_EXPR = "regexp_extract_all(lower({col}), '[a-z0-9]+')"


def tokenize(text: str) -> list[str]:
    """Analyze one string into its token stream (order preserved)."""
    return TOKEN_RE.findall(text.lower())


def term_freqs(text: str) -> dict[str, int]:
    """Term -> frequency map for one document field."""
    tf: dict[str, int] = {}
    for t in TOKEN_RE.findall(text.lower()):
        tf[t] = tf.get(t, 0) + 1
    return tf


def tokenize_column(texts: pa.Array | pa.ChunkedArray | list[str]) -> list[list[str]]:
    """Tokenize a column of strings (Python-level; regex is C-backed).

    Token extraction over variable-length text is inherently per-row;
    the regex engine is compiled once at module import (stateful-setup
    rule, SURVEY.md §2 ST2) and each call is C-speed.
    """
    if isinstance(text_list := texts, (pa.Array, pa.ChunkedArray)):
        text_list = texts.to_pylist()
    findall = TOKEN_RE.findall
    return [findall(t.lower()) if t is not None else [] for t in text_list]


def doc_lengths(texts: pa.Array | pa.ChunkedArray | list[str]) -> np.ndarray:
    """Token count per document (the BM25 ``dl``), as int32."""
    return np.array([len(toks) for toks in tokenize_column(texts)], dtype=np.int32)


def arrow_tokenize(texts) -> tuple:
    """C-speed batch tokenization: utf8_lower -> split on [^a-z0-9]+ ->
    dictionary-encode. No per-token Python strings are materialized
    (the only Python strings are the UNIQUE terms of the batch), which
    avoids allocator contention when 32 workers tokenize concurrently.

    Token streams are identical to :func:`tokenize` for ASCII input
    (the analyzer's token alphabet is ASCII by definition).

    Returns (tid, terms, doc_pos, dl):
      tid     int64[np]  dictionary code per token (empties removed)
      terms   object[np] the dictionary (unique token strings)
      doc_pos int64[np]  row index per token
      dl      int32[np]  token count per row
    """
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    toks = pc.split_pattern_regex(pc.utf8_lower(texts), "[^a-z0-9]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    values = toks.values
    lens = np.diff(toks.offsets.to_numpy())
    n = len(lens)
    doc_pos = np.repeat(np.arange(n, dtype=np.int64), lens)
    keep = pc.not_equal(values, "").to_numpy(zero_copy_only=False).astype(bool)
    dl = (lens - np.bincount(doc_pos[~keep], minlength=n)).astype(np.int32)
    enc = values.dictionary_encode()
    tid = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    terms = np.asarray(enc.dictionary.to_pylist(), dtype=object)
    return tid[keep], terms, doc_pos[keep], dl


def sayt_expand(tokens: list[str], max_shingle: int = 3, max_prefix: int = 10) -> list[str]:
    """``search_as_you_type`` term expansion (SURVEY.md §2.B B3).

    Emits, per OpenSearch's search_as_you_type field semantics
    (configured by the reference's default mappings, loader.py:239-275):
      - the root analyzed tokens (caller indexes those separately),
      - ``_2gram`` / ``_3gram`` shingles joined with a space,
      - ``_index_prefix`` edge n-grams (1..max_prefix chars) of each
        shingled stream term, prefixed with ``#`` to keep the variant
        namespaced within one postings table.

    Returns the *extra* terms only (not the root tokens).
    """
    out: list[str] = []
    for n in range(2, max_shingle + 1):
        for i in range(len(tokens) - n + 1):
            out.append(" ".join(tokens[i : i + n]))
    # Edge prefixes of the joined stream (root + shingles), namespaced.
    for t in tokens + out:
        for plen in range(1, min(len(t), max_prefix) + 1):
            out.append("#" + t[:plen])
    return out
