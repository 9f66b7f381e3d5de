"""CLI entry points — the reference's ``python -m opensearch_loader.cli``
analog (SURVEY.md §3 'Entry point 1'; cli.py:200-236 semantics: parse
args, print effective config, run the Loader, always clean up).

    python -m raybm25 load   --spec indices.yaml --index-root DIR
                             [--select a,b] [--test-mode]
    python -m raybm25 build  --input pages_dir_or_glob --index DIR
                             [--layout scan|hash] [--key-col url] ...
    python -m raybm25 search --index DIR --query "text" [-k 10] [--field f]
    python -m raybm25 searchfile --index DIR --queries q.parquet --out DIR
    python -m raybm25 forcemerge --index DIR [--no-rebuild]
    python -m raybm25 bench  [...]            (delegates to bench.py envs)

Owns its Ray session (guarded init) — library code never does.
"""

from __future__ import annotations

import argparse
import json
import sys


_OWNS_RAY = False


def _ray_session():
    global _OWNS_RAY
    import ray

    if not ray.is_initialized():
        _OWNS_RAY = True
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        import logging

        from ray.data import DataContext

        logging.getLogger("ray.data").setLevel(logging.ERROR)
        DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_load(args) -> int:
    # precedence CLI > RAYBM25_* env > YAML app config (reference
    # config.py:18-43 semantics)
    from .loader.config import Config

    cfg = Config(
        args.config,
        {
            "index_spec_file": args.spec,
            "index_root": args.index_root,
            "selected_indices": args.select,
            "test_mode": True if args.test_mode else None,
            "about_file": args.about_file,
        },
    )
    spec_file = cfg.get("index_spec_file")
    index_root = cfg.get("index_root")
    if not spec_file or not index_root:
        print(
            "error: index_spec_file and index_root are required "
            "(via --spec/--index-root, RAYBM25_INDEX_SPEC_FILE/"
            "RAYBM25_INDEX_ROOT, or --config YAML)",
            file=sys.stderr,
        )
        return 2
    _ray_session()
    from .loader import Loader

    loader = Loader(
        spec_file,
        index_root,
        selected_indices=cfg.get("selected_indices"),
        test_mode=bool(cfg.get("test_mode", False)),
        log_dir=cfg.get("log_dir"),
        about_file=cfg.get("about_file"),
    )
    summary = loader.load()
    print(summary["table"])
    return 0 if all(s["error"] is None for s in summary["indices"]) else 1


def cmd_build(args) -> int:
    _ray_session()
    if args.layout == "scan":
        from .index.build_scan import build_index_scan as build

        kwargs = {}
    else:
        from .index.build import build_index as build

        kwargs = {"overwrite": args.overwrite}
    metrics = build(
        args.input,
        args.index,
        key_col=args.key_col,
        ts_col=args.ts_col or None,
        extract_html=args.extract_html,
        keyword_cols=tuple(args.keyword.split(",")) if args.keyword else (),
        **kwargs,
    )
    print(json.dumps({k: v for k, v in metrics.items() if not isinstance(v, dict)}, default=str))
    return 0


def cmd_search(args) -> int:
    from .query.engine import IndexReader

    r = IndexReader(args.index)
    hits = r.search_pruned(args.query, args.k, field=args.field)
    for rank, (doc_id, score) in enumerate(hits, 1):
        print(f"{rank}\t{doc_id}\t{score:.6f}")
    return 0


def cmd_dsl(args) -> int:
    """Run one OpenSearch-DSL request body (JSON file or '-' = stdin)
    against an index and print the JSON response — the whole query/agg
    surface from the shell."""
    import json
    import sys as _sys

    from .query.dsl import run_query

    if args.body == "-":
        body = json.load(_sys.stdin)
    else:
        with open(args.body) as f:
            body = json.load(f)
    print(json.dumps(run_query(args.index, body), default=str))
    return 0


def cmd_searchfile(args) -> int:
    """Batch serving: a parquet file of queries (query_id, query_text
    [, k]) -> partitioned parquet of (query_id, rank, doc_id, score),
    scored by a BatchSearcher actor pool (stateful stage: the reader
    opens once per actor)."""
    _ray_session()
    import ray.data

    from .query.engine import BatchSearcher
    from .util import auto_concurrency

    ds = ray.data.read_parquet(args.queries)
    out = ds.map_batches(
        BatchSearcher,
        fn_constructor_kwargs={"index_dir": args.index, "k": args.k},
        batch_format="pandas",
        batch_size=args.batch_size,
        # explicit --concurrency is honored as given; default sizes the
        # autoscaling pool from the cluster (util.auto_concurrency)
        concurrency=args.concurrency if args.concurrency else auto_concurrency(),
        num_cpus=1,
        max_restarts=0,
    )
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out}))
    return 0


def cmd_forcemerge(args) -> int:
    """Physical tombstone compaction (the ``_forcemerge`` analog) —
    scan layout only; prints the reclamation stats JSON."""
    _ray_session()
    from .loader.forcemerge import force_merge

    print(json.dumps(force_merge(args.index, rebuild=not args.no_rebuild)))
    return 0


def cmd_resize(args) -> int:
    """Re-bucket an index (the ``_split`` / ``_shrink`` analog) or
    reindex a query-matched subset (``_reindex`` with source.query);
    prints the build metrics JSON."""
    _ray_session()
    from .loader.resize import reindex, resize_index

    if args.query is not None:
        m = reindex(
            args.index,
            args.dest,
            args.query,
            num_buckets=args.buckets,
            postings_shards=args.shards,
            overwrite=args.overwrite,
        )
    else:
        if args.buckets is None:
            raise SystemExit("resize without --query requires --buckets")
        m = resize_index(
            args.index,
            args.dest,
            args.buckets,
            postings_shards=args.shards,
            overwrite=args.overwrite,
        )
    print(json.dumps({k: v for k, v in m.items() if not isinstance(v, dict)}))
    return 0


def cmd_snapshot(args) -> int:
    """Point-in-time snapshot ops (the ``_snapshot`` repository
    analog): create / restore / list / delete on an index dir."""
    from .loader.snapshot import (
        create_snapshot,
        delete_snapshot,
        list_snapshots,
        restore_snapshot,
    )

    if args.action == "create":
        print(json.dumps(
            {k: v for k, v in
             create_snapshot(args.index, args.repo, args.name).items()
             if k != "files"}
        ))
    elif args.action == "restore":
        meta = restore_snapshot(args.repo, args.name, args.index)
        print(json.dumps({"restored": meta["name"],
                          "n_files": meta["n_files"]}))
    elif args.action == "list":
        print(json.dumps(list_snapshots(args.repo)))
    else:
        delete_snapshot(args.repo, args.name)
        print(json.dumps({"deleted": args.name}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="raybm25")
    sub = p.add_subparsers(dest="cmd", required=True)

    pl = sub.add_parser("load", help="run an index-spec through the Loader")
    pl.add_argument("--spec", default=None, help="index spec YAML (or RAYBM25_INDEX_SPEC_FILE)")
    pl.add_argument("--index-root", default=None, help="output root (or RAYBM25_INDEX_ROOT)")
    pl.add_argument("--config", default=None, help="app-config YAML (lowest precedence)")
    pl.add_argument("--select", default=None, help="comma-separated index names")
    pl.add_argument("--about-file", default=None, help="about-page YAML for 'about' sources")
    pl.add_argument("--test-mode", action="store_true")
    pl.set_defaults(fn=cmd_load)

    pb = sub.add_parser("build", help="build a full-text index over parquet")
    pb.add_argument("--input", required=True)
    pb.add_argument("--index", required=True)
    pb.add_argument("--layout", choices=["scan", "hash"], default="scan")
    pb.add_argument("--key-col", default="url")
    pb.add_argument("--ts-col", default="warc_ts")
    pb.add_argument("--keyword", default="")
    pb.add_argument("--extract-html", action="store_true")
    pb.add_argument("--overwrite", action="store_true")
    pb.set_defaults(fn=cmd_build)

    ps = sub.add_parser("search", help="BM25 top-k over a built index")
    ps.add_argument("--index", required=True)
    ps.add_argument("--query", required=True)
    ps.add_argument("-k", type=int, default=10)
    ps.add_argument("--field", default=None)
    ps.set_defaults(fn=cmd_search)

    pq_ = sub.add_parser(
        "dsl", help="run an OpenSearch-DSL JSON request body"
    )
    pq_.add_argument("--index", required=True)
    pq_.add_argument(
        "--body", required=True, help="JSON file path, or '-' for stdin"
    )
    pq_.set_defaults(fn=cmd_dsl)

    pf = sub.add_parser(
        "searchfile", help="score a parquet query set via the actor pool"
    )
    pf.add_argument("--index", required=True)
    pf.add_argument("--queries", required=True, help="parquet with query_id, query_text[, k]")
    pf.add_argument("--out", required=True, help="output parquet directory")
    pf.add_argument("-k", type=int, default=10)
    pf.add_argument("--batch-size", type=int, default=16)
    pf.add_argument("--concurrency", type=int, default=None)
    pf.set_defaults(fn=cmd_searchfile)

    pm = sub.add_parser(
        "forcemerge", help="reclaim tombstoned rows (scan layout)"
    )
    pm.add_argument("--index", required=True)
    pm.add_argument(
        "--no-rebuild",
        action="store_true",
        help="skip the postings rebuild (batch maintenance ops)",
    )
    pm.set_defaults(fn=cmd_forcemerge)

    pr = sub.add_parser(
        "resize",
        help="re-bucket an index (_split/_shrink) or reindex a "
        "query subset (_reindex with source.query)",
    )
    pr.add_argument("--index", required=True, help="source index dir")
    pr.add_argument("--dest", required=True, help="destination index dir")
    pr.add_argument("--buckets", type=int, default=None,
                    help="destination docstore bucket count")
    pr.add_argument("--shards", type=int, default=None,
                    help="destination postings shard count")
    pr.add_argument("--query", default=None,
                    help="reindex only docs matching this query")
    pr.add_argument("--overwrite", action="store_true")
    pr.set_defaults(fn=cmd_resize)

    pn = sub.add_parser(
        "snapshot", help="point-in-time index snapshots (hardlink repo)"
    )
    pn.add_argument("action",
                    choices=["create", "restore", "list", "delete"])
    pn.add_argument("--repo", required=True, help="repository directory")
    pn.add_argument("--name", default=None,
                    help="snapshot name (create/restore/delete)")
    pn.add_argument("--index", default=None,
                    help="index dir (create source / restore destination)")
    pn.set_defaults(fn=cmd_snapshot)

    args = p.parse_args(argv)
    try:
        return args.fn(args)
    finally:
        import ray

        # only tear down a session this CLI started (an embedding
        # caller — tests, a driving script — owns its own session)
        if _OWNS_RAY and ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
