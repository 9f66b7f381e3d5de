"""URL canonicalization for web-page corpora.

Common-Crawl-style pipelines dedup and join on a CANONICAL url (the
reference's documents are keyed by url the same way its OpenSearch
index is — /root/reference/opensearch_loader/loader.py:239-312 keys
docs by their id field); raw crawl urls differ in case, default
ports, tracking parameters and fragments while naming the same page.

Rules applied (in order), all vectorized Arrow kernels (RE2 — the
DuckDB oracle in contract.py::canonical_urls re-implements the same
chain with DuckDB's RE2 ``regexp_replace``, so the outputs are
checkable string-for-string):

1. strip the fragment (``#...``)
2. lowercase the scheme and host (path/query case preserved)
3. drop default ports (``http...:80``, ``https...:443``)
4. remove tracking query params (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``) and repair the separators left behind
5. collapse a bare ``/`` path-with-nothing-else to the empty path

Rows that do not parse as ``scheme://host...`` pass through
unchanged (a 100-TB crawl always has garbage rows; dropping them is a
separate filter's decision).  Percent-encoding normalization is out
of scope (documented, not silently wrong: equal canonical strings
imply the same page, not vice versa).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..util import auto_concurrency

_URL_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://"
    r"(?P<host>[^/?#]+)(?P<rest>.*)$"
)
_TRACKING_RE = r"([?&])(utm_[A-Za-z0-9]+|fbclid|gclid|msclkid)=[^&#]*"


def canonicalize_urls(urls) -> pa.Array:
    """Vectorized canonical form of a string array of urls."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    urls = pc.fill_null(urls, "")
    parts = pc.extract_regex(urls, _URL_RE)
    ok = pc.is_valid(parts)
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    host = pc.utf8_lower(pc.struct_field(parts, "host"))
    rest = pc.struct_field(parts, "rest")
    # default ports (scheme-conditional)
    host = pc.if_else(
        pc.equal(scheme, "http"),
        pc.replace_substring_regex(host, r":80$", ""),
        host,
    )
    host = pc.if_else(
        pc.equal(scheme, "https"),
        pc.replace_substring_regex(host, r":443$", ""),
        host,
    )
    # fragment, tracking params, separator repair
    rest = pc.replace_substring_regex(rest, r"#.*$", "")
    rest = pc.replace_substring_regex(rest, _TRACKING_RE, r"\1")
    rest = pc.replace_substring_regex(rest, r"\?&", "?")
    rest = pc.replace_substring_regex(rest, r"&&+", "&")
    rest = pc.replace_substring_regex(rest, r"[?&]$", "")
    rest = pc.if_else(pc.equal(rest, "/"), "", rest)
    canon = pc.binary_join_element_wise(scheme, "://", host, rest, "")
    return pc.if_else(ok, canon, urls)


class UrlCanonStage:
    """``map_batches`` stage: append ``url_canon`` to each batch."""

    def __init__(self, url_col: str = "url"):
        self.url_col = url_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "url_canon", canonicalize_urls(batch.column(self.url_col))
        )


def canonical_url_dedup(ds, url_col: str = "url", concurrency=None):
    """Annotate with ``url_canon`` — downstream exact dedup then runs
    the engine's standard keys-only last-write-wins on that column
    (index.build key_col='url_canon'), so two crawls of
    ``HTTP://Site.com/?utm_source=x`` and ``http://site.com/``
    collapse to one document."""
    return ds.map_batches(
        UrlCanonStage,
        fn_constructor_kwargs={"url_col": url_col},
        batch_format="pyarrow",
        concurrency=(
            (1, concurrency) if isinstance(concurrency, int)
            else concurrency if concurrency is not None
            else auto_concurrency()
        ),
    )
