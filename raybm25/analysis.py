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


# --------------------------------------------------------------- analyzers
#
# Configurable analyzer chains (OpenSearch custom analyzers with
# ``stop`` / stemmer token filters — the reference's mappings use the
# standard analyzer, but OpenSearch users routinely configure
# ``english`` analyzers; SURVEY.md §2.B B1). The tokenizer is always
# the standard one above; filters run AFTER tokenization, so every
# chain shares the vectorized arrow_tokenize fast path and filters
# operate on the batch's token DICTIONARY (unique terms), never per
# token occurrence.

# Lucene's classic English stop set (public; lucene
# EnglishAnalyzer.ENGLISH_STOP_WORDS_SET).
STOPWORDS_EN = frozenset(
    "a an and are as at be but by for if in into is it no not of on "
    "or such that the their then there these they this to was will with".split()
)


def s_stem(token: str) -> str:
    """Harman's S-removal stemmer (Harman 1991, "How effective is
    suffixing?"): three ordered plural rules, first match wins.

    Chosen as the oracle-checkable stemmer: each rule is a suffix
    test + constant rewrite, so the DuckDB oracle reproduces it
    exactly with CASE/regexp (see :data:`SQL_S_STEM_EXPR`).

    The first rule whose SUFFIX matches decides: a failed guard stops
    the chain (``shoes`` keeps its s — otherwise the ``-oes`` guard
    could never protect anything from the bare ``-s`` rule).
    """
    if token.endswith("ies"):
        if not token.endswith(("eies", "aies")):
            return token[:-3] + "y"
        return token
    if token.endswith("es"):
        if not token.endswith(("aes", "ees", "oes")):
            return token[:-1]
        return token
    if token.endswith("s") and not token.endswith(("us", "ss")):
        return token[:-1]
    return token


# DuckDB expression equivalent to s_stem({t}) — same rule order, same
# guards; kept adjacent to the Python so the two can't drift apart.
SQL_S_STEM_EXPR = (
    "CASE WHEN {t} LIKE '%ies' THEN"
    " (CASE WHEN {t} NOT LIKE '%eies' AND {t} NOT LIKE '%aies'"
    " THEN substr({t}, 1, length({t})-3) || 'y' ELSE {t} END)"
    " WHEN {t} LIKE '%es' THEN"
    " (CASE WHEN {t} NOT LIKE '%aes' AND {t} NOT LIKE '%ees'"
    " AND {t} NOT LIKE '%oes' THEN substr({t}, 1, length({t})-1) ELSE {t} END)"
    " WHEN {t} LIKE '%s' AND {t} NOT LIKE '%us' AND {t} NOT LIKE '%ss'"
    " THEN substr({t}, 1, length({t})-1)"
    " ELSE {t} END"
)

_VOWELS = frozenset("aeiou")


def _porter_is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _porter_is_cons(w, i - 1)
    return True


def _porter_m(stem: str) -> int:
    """The measure m in Porter's [C](VC)^m[V] decomposition."""
    forms = 0
    prev_cons = None
    for i in range(len(stem)):
        cons = _porter_is_cons(stem, i)
        if prev_cons and not cons:
            pass  # entering a V run
        elif prev_cons is False and cons:
            forms += 1  # closed a VC pair
        prev_cons = cons
    return forms


def _porter_has_vowel(stem: str) -> bool:
    return any(not _porter_is_cons(stem, i) for i in range(len(stem)))


def _porter_cvc(stem: str) -> bool:
    """*o condition: ends cvc where the final c is not w, x or y."""
    if len(stem) < 3:
        return False
    return (
        _porter_is_cons(stem, len(stem) - 3)
        and not _porter_is_cons(stem, len(stem) - 2)
        and _porter_is_cons(stem, len(stem) - 1)
        and stem[-1] not in "wxy"
    )


_PORTER_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]
_PORTER_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_PORTER_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(word: str) -> str:
    """Porter's stemming algorithm (Porter 1980, "An algorithm for
    suffix stripping" — the ``porter`` token filter in OpenSearch).
    Pure-python, applied only to a batch's unique-term dictionary so
    per-call cost is amortized across occurrences.
    """
    w = word
    if len(w) <= 2:
        return w
    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]
    # Step 1b
    if w.endswith("eed"):
        if _porter_m(w[:-3]) > 0:
            w = w[:-1]
    else:
        hit = None
        if w.endswith("ed") and _porter_has_vowel(w[:-2]):
            hit = w = w[:-2]
        elif w.endswith("ing") and _porter_has_vowel(w[:-3]):
            hit = w = w[:-3]
        if hit is not None:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif (
                len(w) >= 2
                and w[-1] == w[-2]
                and _porter_is_cons(w, len(w) - 1)
                and w[-1] not in "lsz"
            ):
                w = w[:-1]
            elif _porter_m(w) == 1 and _porter_cvc(w):
                w += "e"
    # Step 1c
    if w.endswith("y") and _porter_has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # Steps 2-4: Porter applies at most ONE rule per step — the one
    # with the LONGEST matching S1 — and if its condition fails no
    # shorter suffix is tried (Porter 1980 §"The rules").
    # Step 2
    hit2 = max(
        (sr for sr in _PORTER_STEP2 if w.endswith(sr[0])),
        key=lambda sr: len(sr[0]),
        default=None,
    )
    if hit2 is not None:
        stem = w[: -len(hit2[0])]
        if _porter_m(stem) > 0:
            w = stem + hit2[1]
    # Step 3
    hit3 = max(
        (sr for sr in _PORTER_STEP3 if w.endswith(sr[0])),
        key=lambda sr: len(sr[0]),
        default=None,
    )
    if hit3 is not None:
        stem = w[: -len(hit3[0])]
        if _porter_m(stem) > 0:
            w = stem + hit3[1]
    # Step 4
    hit4 = max(
        (s for s in _PORTER_STEP4 if w.endswith(s)), key=len, default=None
    )
    if hit4 is not None:
        stem = w[: -len(hit4)]
        if not (hit4 == "ion" and (not stem or stem[-1] not in "st")):
            if _porter_m(stem) > 1:
                w = stem
    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _porter_m(stem)
        if m > 1 or (m == 1 and not _porter_cvc(stem)):
            w = stem
    # Step 5b
    if len(w) >= 2 and w[-1] == "l" and w[-2] == "l" and _porter_m(w) > 1:
        w = w[:-1]
    return w


_STEMMERS = {"s": s_stem, "porter": porter_stem}


def analyzer_spec(stopwords=None, stemmer: str | None = None) -> dict | None:
    """Normalize an analyzer config to the manifest-stored spec dict.
    ``stopwords``: ``"_english_"`` (Lucene's classic set), an explicit
    list, or None; ``stemmer``: ``"s"`` | ``"porter"`` | None.
    Returns None for the default chain (no filters)."""
    spec: dict = {}
    if stopwords == "_english_":
        spec["stopwords"] = "_english_"
    elif stopwords:
        spec["stopwords"] = sorted(set(stopwords))
    if stemmer is not None:
        if stemmer not in _STEMMERS:
            raise ValueError(f"unknown stemmer {stemmer!r}; supported: s, porter")
        spec["stemmer"] = stemmer
    return spec or None


def analyzer_version(spec: dict | None) -> str:
    """Analyzer identity string for the index manifest."""
    if not spec:
        return ANALYZER_VERSION
    parts = [ANALYZER_VERSION]
    if "stopwords" in spec:
        sw = spec["stopwords"]
        parts.append(
            "stop:english" if sw == "_english_" else f"stop:custom({len(sw)})"
        )
    if "stemmer" in spec:
        parts.append(f"stem:{spec['stemmer']}")
    return "+".join(parts)


def _spec_stopset(spec: dict) -> frozenset:
    sw = spec.get("stopwords")
    if sw == "_english_":
        return STOPWORDS_EN
    return frozenset(sw or ())


def analyze(text: str, spec: dict | None = None) -> list[str]:
    """Full analyzer chain over one string (query-side entry point)."""
    toks = TOKEN_RE.findall(text.lower())
    if not spec:
        return toks
    stop = _spec_stopset(spec)
    if stop:
        toks = [t for t in toks if t not in stop]
    stemmer = _STEMMERS.get(spec.get("stemmer", ""))
    if stemmer is not None:
        toks = [stemmer(t) for t in toks]
    return toks


def filter_tokens_np(tid, terms, doc_pos, dl, spec: dict | None):
    """Apply an analyzer spec's token filters to arrow_tokenize output.

    Vectorized by construction: the stop mask and the stem map are
    computed once over the batch's unique-term dictionary (typically
    100-1000x smaller than the token stream), then broadcast to
    occurrences with one fancy-index each. ``dl`` is decremented for
    removed stopwords (Lucene's length norm counts surviving tokens).
    """
    if not spec or tid.size == 0:
        return tid, terms, doc_pos, dl
    stop = _spec_stopset(spec)
    if stop:
        stop_dict = np.fromiter(
            (t in stop for t in terms), dtype=bool, count=len(terms)
        )
        if stop_dict.any():
            drop = stop_dict[tid]
            removed = np.bincount(doc_pos[drop], minlength=dl.size)
            dl = (dl - removed).astype(dl.dtype)
            tid, doc_pos = tid[~drop], doc_pos[~drop]
            # compact the dictionary to surviving codes
            used = np.unique(tid)
            remap = np.empty(len(terms), dtype=np.int64)
            remap[used] = np.arange(used.size)
            tid = remap[tid]
            terms = terms[used]
    stemmer = _STEMMERS.get(spec.get("stemmer", ""))
    if stemmer is not None and len(terms):
        stemmed = np.array([stemmer(t) for t in terms], dtype=object)
        uniq, inv = np.unique(stemmed, return_inverse=True)
        tid = inv[tid].astype(np.int64)
        terms = uniq.astype(object)
    return tid, terms, doc_pos, dl


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
