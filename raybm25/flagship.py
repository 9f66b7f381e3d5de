"""Flagship pipeline: pages corpus -> full index build -> BM25 top-k.

This is the end-to-end path of the north rule: Common-Crawl-style
pages (here: the driver's documents table adapted to the pages schema)
flow through extraction, dedup, postings build, and the fixed query
set is served distributed via a BatchSearcher actor pool.
"""

from __future__ import annotations

import os

import pandas as pd

from .adapters import pages_parquet_for
from .contract import CACHE_ROOT
from .fixtures import make_queries
from .index.build_scan import build_index_scan
from .query.engine import BatchSearcher


def run_flagship(sf_dir: str, *, index_root: str | None = None, concurrency: int = 2) -> pd.DataFrame:
    import ray.data

    root = index_root or os.path.join(CACHE_ROOT, "flagship")
    pages = pages_parquet_for(sf_dir, os.path.join(CACHE_ROOT, "pages"))
    index_dir = os.path.join(root, f"idx_{os.path.basename(os.path.normpath(sf_dir))}")
    # scan layout: the north-star build (text never shuffles)
    build_index_scan(
        pages,
        index_dir,
        key_col="url",
        ts_col="warc_ts",
        extract_html=True,
        keyword_cols=("lang",),
        postings_shards=16,
        key_buckets=8,
    )
    queries_ds = ray.data.from_items(make_queries())
    results = queries_ds.map_batches(
        BatchSearcher,
        fn_constructor_kwargs={"index_dir": index_dir},
        batch_format="pandas",
        batch_size=4,
        concurrency=concurrency,
        num_cpus=1,
        max_restarts=0,  # index is immutable; avoids ray#53727 warning
    )
    out = results.to_pandas()
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)
