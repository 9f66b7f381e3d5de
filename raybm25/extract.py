"""HTML -> text extraction (byte-identical per url).

The input corpus (BASELINE.json ``input_hint``) carries both ``html``
(binary) and ``text`` (string); the per-row invariant is
``extract(html) == text`` byte-identically. The extraction spec is the
exact inverse of the fixture template (FIXTURES.md §1):

    html = <html><head><title>{esc(title)}</title></head><body>
           {"".join(f"<p>{esc(p)}</p>" for p in text.split("\\n\\n"))}
           </body></html>

where ``esc`` entity-escapes ``&``, ``<``, ``>`` (in that order).
Extraction: take the ``<p>...</p>`` contents in order, unescape
(&lt; &gt; then &amp; — reverse order), join with "\\n\\n".

Used as a stateless vectorized-ish ``map_batches`` stage: regexes are
compiled once at module import; the per-row work is C-backed regex +
str.replace over the row's bytes.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_P_RE = re.compile(r"<p>(.*?)</p>", re.S)
_P_RE_B = re.compile(rb"<p>(.*?)</p>", re.S)


def escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def unescape(s: str) -> str:
    return s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")


def render_html(text: str, title: str) -> bytes:
    body = "".join(f"<p>{escape(p)}</p>" for p in text.split("\n\n"))
    return (
        f"<html><head><title>{escape(title)}</title></head><body>{body}</body></html>"
    ).encode("utf-8")


def extract_text(html: bytes) -> str:
    s = html.decode("utf-8")
    paras = _P_RE.findall(s)
    return "\n\n".join(unescape(p) for p in paras)


def extract_text_bytes(html) -> bytes:
    """Byte-level extraction — identical output to
    ``extract_text(html).encode()`` (the escape patterns are pure
    ASCII, so operating on the raw utf-8 bytes is equivalent), without
    the decode/encode round-trip. Accepts any bytes-like (memoryview
    slices straight off Arrow buffers)."""
    return b"\n\n".join(
        p.replace(b"&lt;", b"<").replace(b"&gt;", b">").replace(b"&amp;", b"&")
        for p in _P_RE_B.findall(html)
    )


def _extract_bytes_list(col) -> list:
    """Extracted text as a list of bytes objects, reading per-row
    memoryviews straight off the Arrow value buffer (no per-row html
    copy, no utf-8 decode)."""
    if isinstance(col, pa.ChunkedArray):
        out: list = []
        for c in col.chunks:
            out.extend(_extract_bytes_list(c))
        return out
    if col.null_count:  # rare: fall back to per-row objects
        return [extract_text_bytes(h or b"") for h in col.to_pylist()]
    if pa.types.is_large_binary(col.type) or pa.types.is_large_string(col.type):
        odtype = np.int64
    else:
        odtype = np.int32
    bufs = col.buffers()
    offsets = np.frombuffer(
        bufs[1], dtype=odtype, count=col.offset + len(col) + 1
    )[col.offset :]
    data = memoryview(bufs[2])
    return [
        extract_text_bytes(data[offsets[i] : offsets[i + 1]]) for i in range(len(col))
    ]


def extract_column(col) -> pa.Array:
    """Byte-level extraction over an Arrow binary column, assembled as
    a binary array and cast (utf-8-validated) to string.

    ~18% less per-task CPU than the str path and strictly fewer
    allocations — stage-1 allocator churn was the measured single-box
    scaling limiter (VERDICT r2 'Next round' #7)."""
    return pa.array(_extract_bytes_list(col), pa.binary()).cast(pa.string())


def extract_column_hashed(col) -> tuple[pa.Array, np.ndarray]:
    """(extracted string array, texth) in one pass over the bytes.
    pandas' siphash treats ``bytes`` identically to the utf-8 ``str``,
    so texth matches the str-path hash bit-for-bit (build and update
    paths stay consistent). A buffer-level numpy polynomial hash was
    tried here (round 4) and REVERTED: numpy has no byte-stream hash
    kernel, so the vectorized form costs an 8x uint64 expansion of the
    corpus bytes plus slow gathers and a non-SIMD uint64 cumsum —
    measured 838 ms vs siphash's 7 ms on a 14 MB stage-1 file. The
    bytes objects are not a round-trip cost: they feed the C siphash
    kernel directly."""
    from .hashing import hash64

    texts = _extract_bytes_list(col)
    th = hash64(np.array(texts, dtype=object))
    return pa.array(texts, pa.binary()).cast(pa.string()), th


def extract_batch(batch: pa.Table, drop_html: bool = False) -> pa.Table:
    """map_batches stage: replace/attach ``text`` extracted from ``html``.

    Arrow in / Arrow out (zero-copy for the untouched columns).
    ``drop_html=True`` removes the html column afterwards so downstream
    shuffles (dedup groupby) don't carry the raw bytes.
    """
    texts = extract_column(batch.column("html"))
    drop = ["text"] if "text" in batch.column_names else []
    if drop_html:
        drop.append("html")
    if drop:
        batch = batch.drop_columns(drop)
    return batch.append_column("text", texts)
