"""Index resize + query reindex — the OpenSearch ``_shrink`` /
``_split`` / ``_reindex`` analogs.

OpenSearch resizes an index by creating a new one with a different
shard count and hard-linking/rewriting segments; queries against the
resized index return identical results because doc ids and corpus
statistics are unchanged.  Here the equivalent is re-bucketing: a new
index directory with a different ``num_buckets`` (docstore partition
count) and optionally different ``postings_shards``, built by streaming
the source docstore back through the normal build pipeline
(:func:`raybm25.index.build.build_index` over the docstore parquet
files).  That composition keeps every scale property of the build —
per-file pruned reads, packed partials, salted merge — and is exactly
how a 256-node cluster would re-shard a 100-TB index: one streaming
pass, no driver-side materialization.

:func:`reindex` is the query-filtered variant (``POST _reindex`` with
``source.query``): export the matching live docs to partitioned parquet
(:func:`raybm25.loader.export.export_matching` — per-partition tasks,
broadcast match set, resumable deterministic filenames), then rebuild.
Unlike :func:`resize_index`, the destination's BM25 statistics (n_docs,
avgdl, df) are SUBSET-LOCAL — OpenSearch semantics: a reindexed index
scores with its own corpus, which is why ``_reindex`` is the idiom for
carving a focused searchable corpus out of a big one.

Correctness invariants (tested + contract-checked): a resized index has
the same doc ids and the same BM25 statistics (same corpus), therefore
bit-identical search results — only the physical layout changes
(contract entry ``resize_split_bm25``). A reindexed index holds exactly
the docs matching the query, with ids unchanged and subset-local stats
(contract entry ``reindex_query_bm25`` checks its BM25 top-k against a
subset-corpus SQL oracle).

Hash-layout only: its docstore holds live rows by construction (deletes
compact the bucket in place).  A scan-layout index must run
:func:`raybm25.loader.forcemerge.force_merge` first to reclaim
tombstones, then its partitions can be re-bucketed the same way;
reference analog: the reindex-into-new-index idiom
(/root/reference/opensearch_loader/opensearch_client.py 'recreate'
path — delete + create with new settings + bulk reload).
"""

from __future__ import annotations

import glob
import os

from ..index.manifest import load_manifest

_INTERNAL_COLS = ("doc_id", "dl", "ordinal")


def _load_hash_manifest(src_dir: str, op: str):
    man = load_manifest(src_dir)
    if man is None or not man.data.get("phases", {}).get("docs", {}).get(
        "committed"
    ):
        raise FileNotFoundError(f"no committed index at {src_dir}")
    if man.data.get("layout") == "scan":
        raise ValueError(
            f"{op} supports the hash layout; run force_merge on a "
            "scan-layout index and rebuild, or export_matching + build_index"
        )
    return man


def _rebuild_from_docstore(
    man,
    files: list[str],
    dest_dir: str,
    num_buckets: int,
    postings_shards: int | None,
    overwrite: bool,
) -> dict:
    """Stream docstore-schema parquet files back through build_index,
    carrying the source manifest's field/scoring configuration."""
    import pyarrow.parquet as pq

    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    schema_names = list(pq.read_schema(files[0]).names)
    text_cols = tuple(man.data.get("text_cols", ["text"]))
    for c in text_cols:
        if c not in schema_names:
            raise ValueError(
                f"text column {c!r} is not stored in the docstore — an "
                "index built without storing its text cannot be rebuilt "
                "(nothing to re-tokenize); rebuild from the original source"
            )
    stored = [
        c
        for c in schema_names
        if c not in _INTERNAL_COLS and not c.startswith("dl_")
    ]

    from ..index.build import build_index

    return build_index(
        files,
        dest_dir,
        key_col="doc_id",
        id_col="doc_id",  # ids pass through unchanged: same doc ids out
        ts_col=None,  # docstore rows are already deduped (LWW at build)
        text_cols=text_cols,
        keyword_cols=tuple(man.data.get("keyword_cols", [])),
        sayt_cols=tuple(man.data.get("sayt_cols", [])),
        stored_cols=stored,
        num_buckets=num_buckets,
        postings_shards=int(
            postings_shards
            if postings_shards is not None
            else man.data.get("num_shards", 64)
        ),
        k1=float(man.data.get("k1", 1.2)),
        b=float(man.data.get("b", 0.75)),
        positions=bool(man.data.get("positions", False)),
        overwrite=overwrite,
    )


def resize_index(
    src_dir: str,
    dest_dir: str,
    num_buckets: int,
    *,
    postings_shards: int | None = None,
    overwrite: bool = False,
) -> dict:
    """Create a re-bucketed copy of a committed hash-layout index.

    ``num_buckets`` larger than the source = ``_split``; smaller =
    ``_shrink`` (no divisibility constraint — re-bucketing is a full
    rehash, unlike OpenSearch's factor rule, which exists only because
    Lucene moves whole segments).  Returns the ``build_index`` metrics
    dict plus ``{"src_num_buckets", "dest_num_buckets"}``.
    """
    man = _load_hash_manifest(src_dir, "resize_index")
    docs = sorted(glob.glob(os.path.join(src_dir, "docs", "bucket=*.parquet")))
    if not docs:
        raise FileNotFoundError(f"no docstore buckets under {src_dir}")
    metrics = _rebuild_from_docstore(
        man, docs, dest_dir, num_buckets, postings_shards, overwrite
    )
    metrics["src_num_buckets"] = int(man.data.get("num_buckets", 0))
    metrics["dest_num_buckets"] = int(num_buckets)
    return metrics


def reindex(
    src_dir: str,
    dest_dir: str,
    query: str | None = None,
    field: str | None = None,
    *,
    num_buckets: int | None = None,
    postings_shards: int | None = None,
    overwrite: bool = False,
) -> dict:
    """``POST _reindex`` with ``source.query``: build a new index from
    the docs of ``src_dir`` matching ``query`` (OR over analyzed terms;
    ``None`` = whole live corpus, the plain-copy ``_reindex``).

    Two streaming phases, both resumable: (1) export the matching docs
    to ``<dest_dir>.export`` (one parquet per touched source partition,
    deterministic filenames — a re-run skips finished partitions);
    (2) rebuild from the export with the source's field configuration.
    Doc ids pass through unchanged; BM25 stats become subset-local
    (the destination scores against ITS corpus — OpenSearch semantics).
    Returns build metrics plus ``{"exported", "export_dir"}``.
    """
    man = _load_hash_manifest(src_dir, "reindex")
    export_dir = dest_dir.rstrip("/") + ".export"

    # resume guard: export_matching skips any existing part file purely
    # by name, so a leftover export from a DIFFERENT query (or an
    # updated source index) would silently feed stale docs into the
    # rebuild. A sidecar records what the export dir holds; mismatch
    # (or files with no sidecar) clears it and re-exports.
    import json
    import shutil

    meta = {
        "src_dir": os.path.abspath(src_dir),
        "query": query,
        "field": field,
        "src_docs_phase": man.data.get("phases", {}).get("docs", {}),
    }
    meta_path = os.path.join(export_dir, "_reindex_meta.json")
    if os.path.isdir(export_dir):
        prior = None
        try:
            with open(meta_path) as fh:
                prior = json.load(fh)
        except (OSError, ValueError):
            prior = None
        if prior != meta:
            shutil.rmtree(export_dir)
    os.makedirs(export_dir, exist_ok=True)
    with open(meta_path + ".tmp", "w") as fh:
        json.dump(meta, fh)
    os.replace(meta_path + ".tmp", meta_path)

    from .export import export_matching

    stats = export_matching(src_dir, export_dir, query, field)
    files = sorted(glob.glob(os.path.join(export_dir, "part=*.parquet")))
    # drop empty partitions (export writes none for them, but a resumed
    # run may still see zero-row files from a different query — guard)
    if not files or stats["exported"] == 0:
        raise ValueError(
            f"reindex query {query!r} matches no documents in {src_dir}"
        )
    metrics = _rebuild_from_docstore(
        man,
        files,
        dest_dir,
        int(num_buckets if num_buckets is not None else man.data.get("num_buckets", 32)),
        postings_shards,
        overwrite,
    )
    metrics["exported"] = int(stats["exported"])
    metrics["export_dir"] = export_dir
    return metrics
