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

import pyarrow as pa

_P_RE = re.compile(r"<p>(.*?)</p>", re.S)


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


def extract_batch(batch: pa.Table, drop_html: bool = False) -> pa.Table:
    """map_batches stage: replace/attach ``text`` extracted from ``html``.

    Arrow in / Arrow out (zero-copy for the untouched columns).
    ``drop_html=True`` removes the html column afterwards so downstream
    shuffles (dedup groupby) don't carry the raw bytes.
    """
    texts = pa.array(
        [extract_text(h) for h in batch.column("html").to_pylist()], type=pa.string()
    )
    drop = ["text"] if "text" in batch.column_names else []
    if drop_html:
        drop.append("html")
    if drop:
        batch = batch.drop_columns(drop)
    return batch.append_column("text", texts)
