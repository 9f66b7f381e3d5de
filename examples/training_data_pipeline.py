#!/usr/bin/env python
"""End-to-end LLM-training-data pipeline over this engine's stages:

    read corpus parquet
      -> PII-style scrub            (extras.textstats.scrub_batch)
      -> exact dedup                (extras.dedup.exact_dedup)
      -> near-dup dedup (MinHash)   (extras.dedup.neardup_dedup)
      -> eval decontamination       (extras.decontam.decontaminate)
      -> quality gate               (extras.textstats.quality_batch
                                     + repetition_batch signals;
                                     Gopher/C4 rule metrics reported)
      -> per-host document cap      (extras.mixture.host_cap)
      -> domain-mixture sampling    (extras.mixture.mixture_sample)
      -> token-window chunk stats   (extras.textstats.chunk_batch)
      -> sequence packing offsets   (extras.packing.pack_sequences)
      -> BPE vocab train + encode   (extras.bpe.word_histogram /
                                     bpe_train / BpeEncodeStage)
      -> full-text index build      (index.build.build_index)
      -> filtered BM25 via the DSL  (query.dsl.run_query)

Every stage is a streaming Ray Data transform chained on the SAME
dataset — nothing materializes the corpus driver-side (the dedup
stages broadcast dup-rate-sized loser sets via ray.put; the corpus
streams through anti-join filters). At 100 TB this is the same code
over more blocks. Run in this sandbox:

    python examples/training_data_pipeline.py /root/testdata/sf0.001 /tmp/tdp

Prints one JSON line of stage counts and a sample search result.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str, work: str) -> dict:
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import pyarrow.compute as pc

    from raybm25.extras.decontam import decontaminate
    from raybm25.extras.dedup import exact_dedup, neardup_dedup
    from raybm25.extras.textstats import (
        chunk_batch,
        quality_batch,
        repetition_batch,
        scrub_batch,
    )
    from raybm25.index.build import build_index
    from raybm25.query.dsl import run_query

    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    src = os.path.join(sf_dir, "documents.parquet")
    counts: dict = {"input": ray.data.read_parquet(src).count()}

    # 1. scrub: typed placeholders for emails/URLs/long digit runs
    def scrub(b):
        s = scrub_batch(b)
        return (
            b.drop_columns(["text"])
            .append_column("text", s.column("text_scrubbed"))
            .append_column("n_scrubbed", s.column("n_scrubbed"))
        )

    ds = ray.data.read_parquet(
        src, columns=["doc_id", "text", "lang", "source"]
    ).map_batches(scrub, batch_format="pyarrow")

    # 2-3. dedup, exact then fuzzy — both stream (broadcast loser sets)
    ds = exact_dedup(ds)
    ds = neardup_dedup(ds, threshold=0.9, work_dir=os.path.join(work, "lsh"))

    # 3a. duplicated-passage scrub (Lee-et-al. substring dedup at
    # 8-token windows): corpus-level dup-hash set broadcast once, the
    # covered spans dropped from surviving docs' text
    from raybm25.extras.substring import scrub_dup_spans

    def _drop_span_counters(b):
        return b.drop_columns([c for c in ("dl", "n_covered") if c in b.column_names])

    ds = scrub_dup_spans(ds, w=8).map_batches(
        _drop_span_counters, batch_format="pyarrow"
    )

    # 3b. train/test decontamination: docs sharing a 13-gram with the
    # held-out eval slice (every 97th doc stands in for a benchmark
    # suite here) are dropped — broadcast membership, no shuffle
    import pyarrow.parquet as _pq

    evt = _pq.read_table(src, columns=["doc_id", "text"])
    eval_texts = [
        t
        for i, t in zip(
            evt.column("doc_id").to_pylist(), evt.column("text").to_pylist()
        )
        if i % 97 == 0
    ]
    ds = decontaminate(ds, eval_texts, n=13)

    # 4. quality gate: drop low-alnum docs and degenerate repeaters
    # (Gopher-style repetition signals, same vectorized pass family)
    def gate(b):
        q = quality_batch(b)
        rep = repetition_batch(b)
        keep = pc.and_(
            pc.greater(q.column("alnum_ratio"), 0.5),
            pc.less(rep.column("dup_trigram_frac"), 0.9),
        )
        return b.filter(keep)

    gated_path = os.path.join(work, "gated")
    ds.map_batches(gate, batch_format="pyarrow").write_parquet(gated_path)
    counts["after_scrub_dedup_gate"] = ray.data.read_parquet(gated_path).count()

    # 4a-. published-ruleset observability: how much of the gated
    # corpus the Gopher (Rae 2021) and C4 (Raffel 2020) keep flags
    # would retain — one streaming metrics pass each, no shuffle
    from raybm25.extras.textstats import c4_batch, gopher_batch

    gds = ray.data.read_parquet(gated_path, columns=["doc_id", "text"])
    counts["gopher_keep"] = int(
        gds.map_batches(gopher_batch, batch_format="pyarrow").sum("keep")
    )
    counts["c4_keep"] = int(
        gds.map_batches(c4_batch, batch_format="pyarrow").sum("keep")
    )

    # 4a. per-host cap: no single source may contribute more than 40
    # surviving docs (keys-only rank shuffle + broadcast anti-join)
    from raybm25.extras.mixture import host_cap

    capped_path = os.path.join(work, "capped")
    host_cap(
        ray.data.read_parquet(gated_path), cap=40, group_col="source"
    ).write_parquet(capped_path)
    counts["after_host_cap"] = ray.data.read_parquet(capped_path).count()

    # 4b. domain-mixture sampling: keep all English, half of every
    # other language (deterministic id-hash rates — shuffle-free,
    # restart-stable; re-running or re-sharding keeps the same subset)
    from raybm25.extras.mixture import mixture_sample

    mixed_path = os.path.join(work, "mixed")
    mixture_sample(
        ray.data.read_parquet(capped_path),
        {"en": 1.0},
        group_col="lang",
        default_rate=0.5,
    ).write_parquet(mixed_path)
    counts["after_mixture"] = ray.data.read_parquet(mixed_path).count()

    # 5. chunk accounting for sequence packing (64-token windows)
    counts["train_chunks_64tok"] = (
        ray.data.read_parquet(mixed_path, columns=["doc_id", "text"])
        .map_batches(chunk_batch, batch_format="pyarrow")
        .count()
    )

    # 5a. deterministic shuffle: the training order is a pure function
    # of (doc_id, seed) — identical on any cluster size, resumable
    from raybm25.extras.shuffle import deterministic_shuffle

    shuffled_path = os.path.join(work, "shuffled")
    deterministic_shuffle(
        ray.data.read_parquet(mixed_path), seed=42
    ).write_parquet(shuffled_path)
    counts["shuffled_docs"] = ray.data.read_parquet(shuffled_path).count()

    # 5b. concat-and-chop packing layout: global token offsets +
    # training-sequence spans via the distributed prefix sum
    from raybm25.extras.packing import pack_sequences

    packed = pack_sequences(mixed_path, 512).to_pandas()
    counts["packed_sequences_512"] = int(packed["seq_last"].max()) + 1
    counts["packed_tokens"] = int(
        (packed["start_tok"] + packed["n_tok"]).max()
    )

    # 5c. subword accounting: train a BPE table on the surviving
    # corpus (combiner + one groupby-sum shuffle; merge loop on the
    # histogram) and count training tokens under it (actor-pool
    # encode stage with a per-actor word memo)
    from raybm25.extras.bpe import BpeEncodeStage, bpe_train, word_histogram

    merges = bpe_train(
        word_histogram(
            ray.data.read_parquet(mixed_path, columns=["text"])
        ),
        32,
    )
    counts["bpe_merges"] = len(merges)
    counts["bpe_tokens"] = int(
        ray.data.read_parquet(mixed_path, columns=["doc_id", "text"])
        .map_batches(BpeEncodeStage(merges), batch_format="pyarrow")
        .sum("n_bpe")
    )

    # 6. index the surviving corpus; serve a filtered DSL query
    idx = os.path.join(work, "idx")
    build_index(
        mixed_path,
        idx,
        key_col="doc_id",
        id_col="doc_id",
        ts_col=None,
        text_cols=("text",),
        keyword_cols=("lang",),
        num_buckets=8,
    )
    resp = run_query(
        idx,
        {
            "size": 3,
            "query": {
                "bool": {
                    "must": [{"match": {"text": {"query": "merge join"}}}],
                    "filter": [{"term": {"lang": "en"}}],
                }
            },
            "track_total_hits": True,
        },
    )
    counts["sample_query_total"] = resp["hits"]["total"]["value"]
    counts["sample_top"] = [h["_id"] for h in resp["hits"]["hits"]]
    return counts


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    wk = sys.argv[2] if len(sys.argv) > 2 else "/tmp/tdp"
    out = main(sf, wk)
    print(json.dumps(out))
    import ray

    ray.shutdown()
