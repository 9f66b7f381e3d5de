"""Text analysis stages for training-data pipelines.

Language-ID (stopword-set heuristic), quality scoring (length /
alnum / stopword ratios), token counting and document fingerprinting
(rolling-hash winnowing) — each a vectorized ``map_batches`` stage
over the documents table. Ratio arithmetic is pinned to int/int
double division so the DuckDB oracle SQL produces bit-identical
values.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..analysis import TOKEN_RE

ALNUM_RE = re.compile(r"[a-zA-Z0-9]")

# Deterministic per-language stopword sets (the corpus is synthetic;
# the OPERATOR — argmax of stopword hits with a deterministic
# tie-break — is what matters, not linguistics).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "fast", "slow"),
    "de": ("table", "value", "row"),
    "es": ("scan", "filter", "line"),
    "fr": ("merge", "join", "key"),
    "zh": ("hash", "batch", "vector"),
}

STOPWORDS = ("the", "a", "key", "row", "value")  # quality-score set


def lang_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Predict language = argmax stopword-set hits; ties broken by
    language code ascending; zero hits -> 'und'."""
    texts = batch.column(text_col).to_pylist()
    findall = TOKEN_RE.findall
    langs = sorted(LANG_STOPWORDS)
    sets = {lg: frozenset(LANG_STOPWORDS[lg]) for lg in langs}
    preds = []
    for t in texts:
        toks = findall(t.lower()) if isinstance(t, str) else []
        best_lang, best_n = "und", 0
        for lg in langs:  # ascending order = deterministic tie-break
            n = sum(1 for tok in toks if tok in sets[lg])
            if n > best_n:
                best_lang, best_n = lg, n
        preds.append(best_lang)
    out = batch.select([c for c in ("doc_id",) if c in batch.column_names])
    return out.append_column("pred_lang", pa.array(preds, pa.string()))


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(n_tokens, n_chars, alnum_ratio, stop_ratio) per doc."""
    texts = batch.column(text_col).to_pylist()
    findall = TOKEN_RE.findall
    aln = ALNUM_RE.findall
    stop = frozenset(STOPWORDS)
    n_tokens, n_chars, alnum_ratio, stop_ratio = [], [], [], []
    for t in texts:
        t = t if isinstance(t, str) else ""
        toks = findall(t.lower())
        n_tokens.append(len(toks))
        n_chars.append(len(t))
        alnum_ratio.append(len(aln(t)) / len(t) if t else 0.0)
        stop_ratio.append(
            sum(1 for tok in toks if tok in stop) / len(toks) if toks else 0.0
        )
    out = batch.select([c for c in ("doc_id",) if c in batch.column_names])
    out = out.append_column("n_tokens", pa.array(n_tokens, pa.int64()))
    out = out.append_column("n_chars", pa.array(n_chars, pa.int64()))
    out = out.append_column("alnum_ratio", pa.array(alnum_ratio, pa.float64()))
    return out.append_column("stop_ratio", pa.array(stop_ratio, pa.float64()))


GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher quality-filter rules (Rae et al. 2021, arXiv:2112.11446
    §A1.1 — the published MassiveWeb heuristics) per doc:

    - ``n_words``: whitespace tokens (``str.split()`` == ``\S+``),
      bounds [50, 100000]
    - ``mean_word_len``: non-whitespace chars / n_words, bounds [3, 10]
    - ``symbol_ratio``: ('#' chars + non-overlapping '...') / n_words,
      must be < 0.1
    - ``bullet_frac``: lines starting with '- ' or '* ', <= 0.9
    - ``ellipsis_frac``: lines ending with '...', <= 0.3
    - ``alpha_frac``: words containing an ASCII letter / n_words,
      >= 0.8
    - ``stop_hits``: how many of Gopher's 8 required stopwords occur,
      >= 2
    - ``keep``: 1 iff every rule passes

    Every metric is an exact integer count divided once, so the DuckDB
    oracle (contract.py ``gopher_quality``) reproduces the floats
    bit-for-bit. Counting is one pass per doc over split words/lines
    (strings are inherently per-row); the stage is stateless and
    shuffle-free — a pure streaming filter at 100 TB."""
    texts = batch.column(text_col).to_pylist()
    alpha = re.compile(r"[a-zA-Z]").search
    # ASCII \S+ (re.ASCII), NOT str.split(): the SQL oracle's RE2
    # character classes are ASCII-only, and str.split() would also
    # break on Unicode whitespace (U+00A0, U+2028, ...), diverging
    # the word counts and every derived ratio
    words_of = re.compile(r"\S+", re.ASCII).findall
    cols: dict[str, list] = {
        "n_words": [], "mean_word_len": [], "symbol_ratio": [],
        "bullet_frac": [], "ellipsis_frac": [], "alpha_frac": [],
        "stop_hits": [], "keep": [],
    }
    findall = TOKEN_RE.findall
    for t in texts:
        t = t if isinstance(t, str) else ""
        words = words_of(t)
        n = len(words)
        lines = t.split("\n")
        nl = len(lines)
        if n:
            nonws = sum(len(w) for w in words)
            mwl = nonws / n
            sym = (t.count("#") + t.count("...")) / n
            af = sum(1 for w in words if alpha(w)) / n
        else:
            mwl = sym = af = 0.0
        bf = sum(1 for l in lines if l.startswith(("- ", "* "))) / nl
        ef = sum(1 for l in lines if l.endswith("...")) / nl
        lw = set(findall(t.lower()))
        sh = sum(1 for w in GOPHER_STOPS if w in lw)
        keep = int(
            50 <= n <= 100000
            and 3.0 <= mwl <= 10.0
            and sym < 0.1
            and bf <= 0.9
            and ef <= 0.3
            and af >= 0.8
            and sh >= 2
        )
        for k, v in (
            ("n_words", n), ("mean_word_len", mwl), ("symbol_ratio", sym),
            ("bullet_frac", bf), ("ellipsis_frac", ef), ("alpha_frac", af),
            ("stop_hits", sh), ("keep", keep),
        ):
            cols[k].append(v)
    out = batch.select([c for c in ("doc_id",) if c in batch.column_names])
    out = out.append_column("n_words", pa.array(cols["n_words"], pa.int64()))
    for k in ("mean_word_len", "symbol_ratio", "bullet_frac",
              "ellipsis_frac", "alpha_frac"):
        out = out.append_column(k, pa.array(cols[k], pa.float64()))
    out = out.append_column("stop_hits", pa.array(cols["stop_hits"], pa.int64()))
    return out.append_column("keep", pa.array(cols["keep"], pa.int64()))


_C4_WORDS = re.compile(r"\S+", re.ASCII).findall


def c4_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """C4 cleaning rules (Raffel et al. 2020, arXiv:1910.10683 §2.2 —
    the published Colossal-Clean-Crawled-Corpus line/page heuristics)
    per doc, as counts + keep flag (the cleaned text itself is a
    trivial join of the kept lines; counts keep the entry small):

    line kept iff it ends in terminal punctuation (``. ! ? "``), has
    >= 5 whitespace words, and does not contain ``javascript``
    (case-insensitive). Page kept iff the raw text has no ``{``, no
    ``lorem ipsum`` (case-insensitive), and the kept lines carry >= 3
    sentence-terminal marks (``. ! ?``).

    Exact integer counts only — the DuckDB oracle (contract.py
    ``c4_clean``) reproduces every column bit-for-bit. Stateless
    streaming stage; no shuffle at any scale."""
    texts = batch.column(text_col).to_pylist()
    out_total, out_kept, out_clen, out_sent, out_keep = [], [], [], [], []
    for t in texts:
        t = t if isinstance(t, str) else ""
        lines = t.split("\n")
        kept = [
            l
            for l in lines
            if l.endswith((".", "!", "?", '"'))
            and len(_C4_WORDS(l)) >= 5
            and "javascript" not in l.lower()
        ]
        joined = "\n".join(kept)
        sents = sum(joined.count(c) for c in ".!?")
        keep = int(
            "{" not in t
            and "lorem ipsum" not in t.lower()
            and sents >= 3
        )
        out_total.append(len(lines))
        out_kept.append(len(kept))
        out_clen.append(len(joined))
        out_sent.append(sents)
        out_keep.append(keep)
    out = batch.select([c for c in ("doc_id",) if c in batch.column_names])
    out = out.append_column("n_lines", pa.array(out_total, pa.int64()))
    out = out.append_column("n_kept", pa.array(out_kept, pa.int64()))
    out = out.append_column("clean_len", pa.array(out_clen, pa.int64()))
    out = out.append_column("n_sents", pa.array(out_sent, pa.int64()))
    return out.append_column("keep", pa.array(out_keep, pa.int64()))


FP_BASE = np.uint64(1_000_003)
FP_WINDOW = 4


def poly_token_hashes(toks: list[str]) -> np.ndarray:
    """Polynomial byte hash per token, mod 2^64 (uint64 wraparound):
    ``h = h*B + byte`` over the token's ASCII bytes. Chosen over
    siphash BECAUSE it is SQL-expressible — the DuckDB oracle computes
    the identical values with a HUGEINT list_reduce (contract.py,
    fingerprint_stats), making the winnowing pipeline hash-checkable.
    Vectorized: tokens become a fixed-width byte matrix and the Horner
    step runs column-wise (analyzer tokens are [a-z0-9]+, so a zero
    byte is always padding)."""
    if not toks:
        return np.empty(0, dtype=np.uint64)
    b = np.array(toks, dtype=bytes)
    m = b.view(np.uint8).reshape(len(toks), -1)
    h = np.zeros(len(toks), dtype=np.uint64)
    for col in range(m.shape[1]):
        c = m[:, col].astype(np.uint64)
        active = m[:, col] > 0
        h[active] = h[active] * FP_BASE + c[active]
    return h


def fingerprint_batch(batch: pa.Table, text_col: str = "text", window: int = FP_WINDOW) -> pa.Table:
    """Winnowing document fingerprints: rolling polynomial hash over
    4-token shingles, keep the min hash of each sliding window of
    ``window`` shingles; fingerprint set identifies near-identical
    passages. Emits (doc_id, fingerprints:list<uint64>)."""
    texts = batch.column(text_col).to_pylist()
    findall = TOKEN_RE.findall
    fps: list[np.ndarray] = []
    for t in texts:
        toks = findall(t.lower()) if isinstance(t, str) else []
        if len(toks) < 4:
            fps.append(np.empty(0, dtype=np.uint64))
            continue
        tok_h = poly_token_hashes(toks)
        sh = (
            tok_h[:-3] * FP_BASE**np.uint64(3)
            + tok_h[1:-2] * FP_BASE**np.uint64(2)
            + tok_h[2:-1] * FP_BASE
            + tok_h[3:]
        )
        if sh.size <= window:
            fps.append(np.unique(sh.min(keepdims=True)))
            continue
        view = np.lib.stride_tricks.sliding_window_view(sh, window)
        fps.append(np.unique(view.min(axis=1)))
    out = batch.select([c for c in ("doc_id",) if c in batch.column_names])
    offsets = np.zeros(len(fps) + 1, dtype=np.int32)
    np.cumsum([f.size for f in fps], out=offsets[1:])
    values = np.concatenate(fps) if fps else np.empty(0, np.uint64)
    return out.append_column(
        "fingerprints", pa.ListArray.from_arrays(offsets, pa.array(values, pa.uint64()))
    )


SCRUB_PATTERNS: tuple[tuple[str, str, str], ...] = (
    # (name, RE2 pattern, replacement) — applied IN ORDER. Arrow's
    # replace_substring_regex IS RE2, the same engine as DuckDB's
    # regexp_replace(..., 'g'), so the SQL oracle is bit-identical by
    # construction.
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("number_long", r"\b[0-9]{9,}\b", "<NUM>"),
)


def scrub_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """PII-style scrubbing stage for training-data pipelines: replace
    emails, URLs and long digit runs with typed placeholders, fully
    vectorized (one RE2 pass per pattern over the whole batch column —
    no Python per row). Emits the scrubbed text plus a per-doc count
    of replaced spans (the audit column a 100-TB scrub job reports)."""
    import pyarrow.compute as pc

    col = batch.column(text_col)
    n_hits = None
    for _name, pat, repl in SCRUB_PATTERNS:
        hits = pc.count_substring_regex(col, pat)
        n_hits = hits if n_hits is None else pc.add(n_hits, hits)
        col = pc.replace_substring_regex(col, pat, repl)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "text_scrubbed": col,
            "n_scrubbed": pc.cast(n_hits, pa.int64()),
        }
    )


def chunk_batch(
    batch: pa.Table, text_col: str = "text", window: int = 64
) -> pa.Table:
    """Token-window chunking (context-length packing prep): split each
    doc's token stream into consecutive ``window``-token chunks and
    emit one row per chunk ``(doc_id, chunk_id, n_tokens)`` — the
    flat-map that turns a document corpus into training sequences.
    Vectorized: one tokenize pass, chunk counts by integer ceil-div,
    row expansion via np.repeat/arange (no Python loop over chunks)."""
    texts = batch.column(text_col).to_pylist()
    dls = np.array(
        [len(TOKEN_RE.findall((t or "").lower())) for t in texts], dtype=np.int64
    )
    n_chunks = np.maximum((dls + window - 1) // window, 0)
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    rep_ids = np.repeat(doc_ids, n_chunks)
    total = int(n_chunks.sum())
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(n_chunks, out=offsets[1:])
    chunk_id = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], n_chunks)
    last = chunk_id == np.repeat(n_chunks - 1, n_chunks)
    n_tokens = np.full(total, window, dtype=np.int64)
    rem = np.repeat(dls - (n_chunks - 1) * window, n_chunks)
    n_tokens[last] = rem[last]
    return pa.table(
        {
            "doc_id": pa.array(rep_ids, pa.int64()),
            "chunk_id": pa.array(chunk_id, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
        }
    )


def _per_doc_max(doc_of_group: np.ndarray, values: np.ndarray,
                 n_rows: int) -> np.ndarray:
    """Max of ``values`` per doc (groups sorted by doc; docs with no
    group get 0)."""
    out = np.zeros(n_rows, dtype=np.int64)
    if doc_of_group.size:
        np.maximum.at(out, doc_of_group, values)
    return out


def repetition_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1,
    adapted to token streams), one vectorized pass per batch:

    - ``n_tokens``: analyzer token count
    - ``dup_token_frac``: (n_tokens - distinct tokens) / n_tokens
    - ``top_bigram_frac``: min(1, 2 * count(most frequent bigram) /
      n_tokens) — fraction of tokens covered by the top 2-gram
    - ``dup_trigram_frac``: (trigrams - distinct trigrams) / trigrams
    - ``max_token_run``: longest run of one token repeated
      consecutively (the "aaaa..." degenerate-doc detector)

    All ratios are int/int float64 divisions, so the DuckDB oracle
    (contract.py::repetition_signals) reproduces them bit-identically.
    No Python loop over rows: tokenization is the shared Arrow kernel,
    n-gram codes are integer combinations of dictionary ids, per-doc
    reductions are sort + reduceat/maximum.at.
    """
    from ..analysis import arrow_tokenize

    tid, _terms, doc_pos, dl = arrow_tokenize(batch.column(text_col))
    n_rows = batch.num_rows
    dl = dl.astype(np.int64)
    k = np.int64(len(_terms)) if len(_terms) else np.int64(1)
    # trigram codes are base-k Horner combinations of dictionary ids:
    # exact (collision-free) while k**3 < 2**64
    if int(k) ** 3 >= 2**64:
        raise ValueError(
            f"batch has {int(k)} distinct terms; trigram codes would "
            "overflow uint64 — reduce batch_size"
        )

    # distinct tokens per doc: sort by (doc, tid), count group starts
    order = np.lexsort((tid, doc_pos))
    dsorted, tsorted = doc_pos[order], tid[order]
    new_group = np.empty(tid.size, dtype=bool)
    if tid.size:
        new_group[0] = True
        new_group[1:] = (dsorted[1:] != dsorted[:-1]) | (
            tsorted[1:] != tsorted[:-1]
        )
    nd = np.bincount(dsorted[new_group], minlength=n_rows).astype(np.int64)

    def _ngram_top_and_distinct(n: int):
        """(per-doc max n-gram count, per-doc total, per-doc distinct)."""
        if tid.size < n:
            z = np.zeros(n_rows, dtype=np.int64)
            return z, z.copy(), z.copy()
        same = np.ones(tid.size - n + 1, dtype=bool)
        code = tid[: tid.size - n + 1].astype(np.uint64)
        ku = np.uint64(k)
        for j in range(1, n):
            sl = slice(j, tid.size - n + 1 + j)
            same &= doc_pos[sl] == doc_pos[: tid.size - n + 1]
            code = code * ku + tid[sl].astype(np.uint64)
        gdoc = doc_pos[: tid.size - n + 1][same]
        gcode = code[same]
        total = np.bincount(gdoc, minlength=n_rows).astype(np.int64)
        if gdoc.size == 0:
            z = np.zeros(n_rows, dtype=np.int64)
            return z, total, z
        # groups = maximal runs of equal (doc, code) in the sorted view
        o = np.lexsort((gcode, gdoc))
        gs, gc = gdoc[o], gcode[o]
        change = np.empty(gs.size, dtype=bool)
        change[0] = True
        change[1:] = (gs[1:] != gs[:-1]) | (gc[1:] != gc[:-1])
        starts = np.flatnonzero(change)
        lengths = np.diff(np.append(starts, gs.size))
        distinct = np.bincount(gs[starts], minlength=n_rows).astype(np.int64)
        top = _per_doc_max(gs[starts], lengths, n_rows)
        return top, total, distinct

    top_bi, _tot_bi, _ = _ngram_top_and_distinct(2)
    _, tot_tri, dis_tri = _ngram_top_and_distinct(3)

    # longest same-token run per doc
    if tid.size:
        run_break = np.ones(tid.size, dtype=bool)
        run_break[1:] = (doc_pos[1:] != doc_pos[:-1]) | (
            tid[1:] != tid[:-1]
        )
        rstarts = np.flatnonzero(run_break)
        rlens = np.diff(np.append(rstarts, tid.size))
        max_run = _per_doc_max(doc_pos[rstarts], rlens, n_rows)
    else:
        max_run = np.zeros(n_rows, dtype=np.int64)

    with np.errstate(divide="ignore", invalid="ignore"):
        dup_tok = np.where(dl > 0, (dl - nd) / dl, 0.0)
        top_bi_frac = np.where(
            dl > 0, np.minimum(1.0, (2 * top_bi) / dl), 0.0
        )
        dup_tri = np.where(tot_tri > 0, (tot_tri - dis_tri) / tot_tri, 0.0)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(dl, pa.int64()),
            "dup_token_frac": pa.array(dup_tok, pa.float64()),
            "top_bigram_frac": pa.array(top_bi_frac, pa.float64()),
            "dup_trigram_frac": pa.array(dup_tri, pa.float64()),
            "max_token_run": pa.array(max_run, pa.int64()),
        }
    )


# the control range with \t \n \r carved out (those are whitespace and
# belong to the collapse step, not the strip step)
_CTRL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"


def normalize_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Unicode text normalization for training-data pipelines: NFC
    composition, control-character strip (C0/DEL except tab/newline/
    carriage-return), whitespace-run collapse, edge trim — in that
    pinned order. The strip/collapse/trim steps are Arrow-vectorized
    (two RE2 passes + trim; both Arrow and DuckDB speak RE2, so the
    chain has an exact SQL oracle: ``nfc_normalize`` +
    ``regexp_replace(..., 'g')`` + ``trim``). The NFC step cannot use
    ``pc.utf8_normalize`` — pyarrow 16's utf8proc build DECOMPOSES but
    does not recompose (NFC('e'+U+0301) stays two codepoints, while
    unicodedata and DuckDB both return U+00E9) — so it runs
    ``unicodedata.normalize`` per row, but ONLY on rows that
    ``pc.string_is_ascii`` proves need it: ASCII is NFC-invariant, so
    the (dominant, for web text after lang-split) ASCII rows never
    leave Arrow. Emits the normalized text, its codepoint length, and
    a changed flag (the audit column: at 100 TB you sample what the
    cleaner rewrote)."""
    import unicodedata

    import pyarrow.compute as pc

    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    needs_nfc = pc.fill_null(pc.invert(pc.string_is_ascii(col)), False)
    idx = np.flatnonzero(needs_nfc.to_numpy(zero_copy_only=False))
    if idx.size:
        sub = col.take(pa.array(idx)).to_pylist()
        repl = np.full(len(col), None, dtype=object)
        repl[idx] = [
            unicodedata.normalize("NFC", v) if v is not None else None
            for v in sub
        ]
        col = pc.if_else(needs_nfc, pa.array(repl, pa.string()), col)
    col = pc.replace_substring_regex(col, _CTRL_RE, "")
    col = pc.replace_substring_regex(col, r"\s+", " ")
    col = pc.utf8_trim(col, " ")
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "text_norm": col,
            "n_chars_norm": pc.cast(pc.utf8_length(col), pa.int64()),
            "changed": pc.not_equal(col, batch.column(text_col)),
        }
    )
