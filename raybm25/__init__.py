"""raybm25 — a Ray-Data-native full-text indexing + BM25 query engine.

From-scratch re-expression of the capability surface of
CBIIT/opensearch-loader (see /root/repo/SURVEY.md): the reference is an
ETL control plane that feeds an OpenSearch server; this package
implements BOTH the loader dataflow (read -> validate -> project ->
upsert-dedup -> merge-update -> visibility barrier -> stats) AND the
delegated index engine (analyze -> postings build -> merge/compress ->
BM25 top-k query) as idiomatic Ray Data pipelines:

- ``ray.data.read_parquet`` -> ``map_batches`` over zero-copy Arrow
  batches for extraction / tokenization,
- hash-bucketed ``groupby().map_groups`` for dedup and the postings
  merge shuffle,
- delta+varbyte-compressed posting lists with block-max metadata,
- exact and block-max-pruned (WAND-style) BM25 top-k serving.

No module in this package calls ``ray.init()``; the driver / bench /
test fixture owns the Ray session.
"""

__version__ = "0.4.0"

# Lucene/OpenSearch default BM25 parameters (public documented defaults;
# the reference never overrides similarity — see SURVEY.md §2.B B6,
# citing opensearch_client.py:75-124).
BM25_K1 = 1.2
BM25_B = 0.75

def __getattr__(name):
    # lazy top-level exports (avoid importing ray at package import)
    if name == "build_index":
        from .index.build import build_index

        return build_index
    if name == "build_index_scan":
        from .index.build_scan import build_index_scan

        return build_index_scan
    if name == "IndexReader":
        from .query.engine import IndexReader

        return IndexReader
    if name == "Loader":
        from .loader import Loader

        return Loader
    raise AttributeError(name)
