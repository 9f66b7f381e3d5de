#!/usr/bin/env python
"""Cluster job entrypoint: the north-rule "driven by ray job submit"
surface. Submit the same script to an N-node and a 4N-node cluster and
compare the reported docs/sec (the manifest persists the metrics with
the per-partition lineage):

    ray job submit --working-dir . -- \
        python examples/build_job.py s3://bucket/pages/ /mnt/shared/idx \
            --extract-html --key-col url --ts-col warc_ts

In this sandbox (single node) it runs as a plain script:

    python examples/build_job.py /root/testdata/sf0.001 /tmp/job_idx \
        --key-col doc_id --id-int --text-col text --no-ts

The build is resumable: re-submitting after a failure skips every
docstore partition whose input-file fingerprint already matches
(per-partition checkpoints + full-skip for unchanged inputs).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input", help="parquet file/dir of pages")
    ap.add_argument("index_dir", help="output index directory (shared fs)")
    ap.add_argument("--key-col", default="url")
    ap.add_argument("--id-int", action="store_true", help="key column is an integer id")
    ap.add_argument("--ts-col", default="warc_ts")
    ap.add_argument("--no-ts", action="store_true")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--extract-html", action="store_true")
    ap.add_argument("--keyword-cols", default="", help="comma-separated")
    ap.add_argument("--postings-shards", type=int, default=64)
    ap.add_argument("--overwrite", action="store_true")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # under `ray job submit` the runtime injects the cluster
        # address; standalone falls back to a local session
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"))

    from raybm25.index.build_scan import build_index_scan

    metrics = build_index_scan(
        args.input,
        args.index_dir,
        key_col=args.key_col,
        id_col=args.key_col if args.id_int else None,
        ts_col=None if args.no_ts else args.ts_col,
        text_cols=(args.text_col,),
        extract_html=args.extract_html,
        keyword_cols=tuple(c for c in args.keyword_cols.split(",") if c),
        postings_shards=args.postings_shards,
        overwrite=args.overwrite,
    )
    print(json.dumps(metrics, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
