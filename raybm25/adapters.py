"""Adapters from the driver testdata tables to the engine's corpus.

``documents(doc_id, text, lang, source, n_chars)`` becomes a pages
table per BASELINE.json ``input_hint`` (FIXTURES.md §5):
``url = doc://{doc_id}``, ``warc_ts = epoch + doc_id`` microseconds,
``html`` rendered from ``text`` by the invertible template (so the
extraction invariant is exercised on driver data too), ``text``/
``lang`` pass through.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from .extract import render_html
from .fixtures import EPOCH_US


def documents_to_pages(documents: pa.Table) -> pa.Table:
    doc_ids = documents.column("doc_id").to_pylist()
    texts = documents.column("text").to_pylist()
    urls = [f"doc://{d}" for d in doc_ids]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([EPOCH_US + d for d in doc_ids], pa.timestamp("us")),
            "html": pa.array([render_html(t, u) for t, u in zip(texts, urls)], pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": documents.column("lang"),
        }
    )


def pages_parquet_for(sf_dir: str, out_dir: str) -> str:
    """Materialize (once) the pages adaptation of ``sf_dir``'s documents
    table; returns the parquet path."""
    os.makedirs(out_dir, exist_ok=True)
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(out_dir, f"pages_{tag}.parquet")
    if not os.path.exists(out):
        docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
        tmp = out + f".tmp-{os.getpid()}"
        pq.write_table(documents_to_pages(docs), tmp)
        os.replace(tmp, out)
    return out
