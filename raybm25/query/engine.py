"""BM25 query serving over a built index.

Implements the search side the reference delegates to OpenSearch
(SURVEY.md §2.B B6/B7): Okapi BM25 with Lucene's idf, k1=1.2, b=0.75,
single-shard (= global) statistics, deterministic ties (score desc,
doc_id asc).

Two paths, required to be result-identical (tested):
- :meth:`IndexReader.search` — exact term-at-a-time vectorized scoring;
- :meth:`IndexReader.search_pruned` — block-max pruned evaluation
  (WAND-style essential-list + block-max skipping over the per-128-doc
  block metadata written at build time; north rule "block-max
  pruning"). A doc can be skipped only when an upper bound on its
  total score is provably below the current top-k threshold, so the
  returned top-k (ids AND scores) is exactly the exact path's.

Postings reads are term-pruned parquet scans (predicate pushdown on the
``term`` column; the build writes postings sorted by term so row-group
stats prune). For distributed serving, :class:`BatchSearcher` is a
``map_batches`` actor-pool stage holding the reader open per actor
(stateful-stage rule, SURVEY.md §2 ST2).
"""

from __future__ import annotations

import math
import os
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads

from ..analysis import tokenize
from ..codec import BLOCK_SIZE, varbyte_decode, delta_decode
from ..index.build import DOCS_SUBDIR, POSTINGS_SUBDIR
from ..index.manifest import load_manifest


class TermPostings:
    __slots__ = ("doc_ids", "tfs", "dls", "block_last", "block_max", "df")

    def __init__(self, doc_ids, tfs, dls, block_last, block_max):
        self.doc_ids = doc_ids
        self.tfs = tfs
        self.dls = dls
        self.block_last = block_last
        self.block_max = block_max
        self.df = int(doc_ids.size)


class IndexReader:
    def __init__(self, index_dir: str):
        man = load_manifest(index_dir)
        if man is None or not man.phase_committed("postings"):
            raise FileNotFoundError(f"no committed index at {index_dir}")
        self.index_dir = index_dir
        self.manifest = man.data
        corpus = man.data["corpus"]
        self.n_docs = int(corpus["n_docs"])
        self.avgdl = float(corpus["avgdl"])
        self.k1 = float(man.data["k1"])
        self.b = float(man.data["b"])
        self.num_buckets = int(man.data["num_buckets"])
        self._postings = pads.dataset(os.path.join(index_dir, POSTINGS_SUBDIR))
        self._docs_dir = os.path.join(index_dir, DOCS_SUBDIR)

    # ------------------------------------------------------------- postings
    def load_postings(self, terms: list[str]) -> dict[str, TermPostings]:
        """Load + decode postings for a set of terms (term-pruned scan).

        Rows for one term are segments keyed by doc-range; ranges are
        monotone in doc_id, so sorting segments by ``range`` and
        concatenating yields the globally doc_id-sorted posting list
        with no merge (the salting invariant from the build)."""
        if not terms:
            return {}
        tbl = self._postings.to_table(filter=pads.field("term").isin(terms))
        if tbl.num_rows == 0:
            return {}
        df = tbl.to_pandas()
        df = df.sort_values(["term", "range"], kind="mergesort")
        out: dict[str, TermPostings] = {}
        for term, g in df.groupby("term", sort=False):
            ids = np.concatenate(
                [delta_decode(varbyte_decode(b)) for b in g["doc_ids_enc"]]
            )
            tfs = np.concatenate([varbyte_decode(b) for b in g["tfs_enc"]]).astype(np.int64)
            dls = np.concatenate([varbyte_decode(b) for b in g["dls_enc"]]).astype(np.int64)
            block_last = np.concatenate(
                [np.asarray(x, dtype=np.uint64) for x in g["block_last_doc"]]
            )
            block_max = np.concatenate(
                [np.asarray(x, dtype=np.float32) for x in g["block_max_norm"]]
            )
            out[term] = TermPostings(ids, tfs, dls, block_last, block_max)
        return out

    def _norm(self, tfs: np.ndarray, dls: np.ndarray) -> np.ndarray:
        # association pinned: (1-b) + (b*dl)/avgdl — see codec.tf_norm
        tf = tfs.astype(np.float64)
        return tf / (tf + self.k1 * (1.0 - self.b + self.b * dls.astype(np.float64) / self.avgdl))

    def idf(self, df: int) -> float:
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    # ------------------------------------------------------------- search
    def _rank(self, ids: np.ndarray, scores: np.ndarray, k: int):
        order = np.lexsort((ids, -scores))[:k]
        return ids[order], scores[order]

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Exact BM25 top-k (ties: score desc, doc_id asc)."""
        qcounts = Counter(tokenize(query))
        postings = self.load_postings(sorted(qcounts))
        parts_ids, parts_scores = [], []
        for term in sorted(qcounts):
            p = postings.get(term)
            if p is None:
                continue
            contrib = qcounts[term] * self.idf(p.df) * self._norm(p.tfs, p.dls)
            parts_ids.append(p.doc_ids)
            parts_scores.append(contrib)
        if not parts_ids:
            return []
        all_ids = np.concatenate(parts_ids)
        all_scores = np.concatenate(parts_scores)
        uniq, inv = np.unique(all_ids, return_inverse=True)
        scores = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(scores, inv, all_scores)
        ids, sc = self._rank(uniq, scores, k)
        return list(zip(ids.tolist(), sc.tolist()))

    def _score_subset(
        self, candidates: np.ndarray, qcounts: Counter, postings: dict[str, TermPostings]
    ) -> np.ndarray:
        """Exact scores for a sorted candidate id array, summed in
        sorted-term order (same float addition order as `search`)."""
        scores = np.zeros(candidates.size, dtype=np.float64)
        for term in sorted(qcounts):
            p = postings.get(term)
            if p is None:
                continue
            pos = np.searchsorted(p.doc_ids, candidates)
            pos_c = np.minimum(pos, p.df - 1)
            hit = p.doc_ids[pos_c] == candidates
            contrib = qcounts[term] * self.idf(p.df) * self._norm(p.tfs[pos_c], p.dls[pos_c])
            scores[hit] += contrib[hit]
        return scores

    def search_pruned(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Block-max pruned BM25 top-k; result-identical to `search`.

        1. Seed a threshold θ: exact-score the top-k docs of the
           highest-upper-bound term's best blocks.
        2. Essential terms: sort terms by upper bound ascending; the
           longest prefix whose UB sum < θ is non-essential — no doc
           appearing ONLY there can reach θ (WAND invariant).
        3. Block skipping: within an essential term, a block b can be
           dropped when w·idf·blockmax(b) + Σ other terms' UB < θ; a doc
           in dropped blocks of several essential terms is still safe
           because each bound subsumes the others' full UB.
        4. Exact-score surviving candidates (+ the θ seeds).
        """
        qcounts = Counter(tokenize(query))
        postings = self.load_postings(sorted(qcounts))
        terms = [t for t in sorted(qcounts) if t in postings]
        if not terms:
            return []
        ub = {
            t: qcounts[t] * self.idf(postings[t].df) * float(postings[t].block_max.max())
            for t in terms
        }
        # --- seed θ with exact scores of k docs from the strongest term
        seed_term = max(terms, key=lambda t: ub[t])
        p = postings[seed_term]
        if p.df <= k:
            seed_ids = p.doc_ids
        else:
            # docs from the k best blocks of the strongest term
            blk = np.argsort(p.block_max)[::-1]
            take: list[np.ndarray] = []
            got = 0
            for bi in blk:
                s, e = bi * BLOCK_SIZE, min((bi + 1) * BLOCK_SIZE, p.df)
                take.append(p.doc_ids[s:e])
                got += e - s
                if got >= k:
                    break
            seed_ids = np.unique(np.concatenate(take))
        seed_scores = self._score_subset(seed_ids, qcounts, postings)
        if seed_ids.size >= k:
            idx = np.lexsort((seed_ids, -seed_scores))[:k]
            theta = float(seed_scores[idx[-1]])
        else:
            theta = 0.0

        # --- essential terms
        order = sorted(terms, key=lambda t: ub[t])
        cum = 0.0
        essential: list[str] = []
        for i, t in enumerate(order):
            if cum + ub[t] < theta:
                cum += ub[t]
            else:
                essential = order[i:]
                break
        else:
            essential = []
        if not essential:
            essential = [seed_term]  # degenerate: θ==0 etc.

        total_ub = sum(ub.values())
        cand_parts = [seed_ids]
        for t in essential:
            p = postings[t]
            other_ub = total_ub - ub[t]
            block_bound = (
                qcounts[t] * self.idf(p.df) * p.block_max.astype(np.float64) + other_ub
            )
            keep_blocks = np.flatnonzero(block_bound >= theta)
            if keep_blocks.size == 0:
                continue
            segs = []
            for bi in keep_blocks:
                s, e = bi * BLOCK_SIZE, min((bi + 1) * BLOCK_SIZE, p.df)
                segs.append(p.doc_ids[s:e])
            cand_parts.append(np.concatenate(segs) if segs else np.empty(0, np.uint64))
        candidates = np.unique(np.concatenate(cand_parts))
        scores = self._score_subset(candidates, qcounts, postings)
        ids, sc = self._rank(candidates, scores, k)
        return list(zip(ids.tolist(), sc.tolist()))

    # ------------------------------------------------------------- keyword/docs
    def term_docs(self, field: str, value: str) -> np.ndarray:
        """Exact-match doc ids for a keyword field term (SURVEY.md B2)."""
        p = self.load_postings([f"{field}:{value}"])
        key = f"{field}:{value}"
        return p[key].doc_ids if key in p else np.empty(0, np.uint64)

    def get_docs(self, doc_ids: np.ndarray) -> pa.Table:
        """Doc-store lookup by id (SURVEY.md B5): reads only the hash
        buckets the ids live in."""
        ids = np.asarray(doc_ids, dtype=np.uint64)
        buckets = np.unique(ids % np.uint64(self.num_buckets))
        paths = [
            os.path.join(self._docs_dir, f"bucket={int(b):05d}.parquet") for b in buckets
        ]
        paths = [p for p in paths if os.path.exists(p)]
        if not paths:
            return pa.table({})
        dset = pads.dataset(paths)
        return dset.to_table(filter=pads.field("doc_id").isin(ids))


class BatchSearcher:
    """Actor-pool stage: score a batch of queries against one index.

    Use: ``queries_ds.map_batches(BatchSearcher, fn_constructor_kwargs=
    {"index_dir": ...}, concurrency=N, batch_format="pandas")``.
    The reader (manifest, dataset handles, OS page cache of postings)
    is opened once per actor (__init__), per-batch work is scoring.
    """

    def __init__(self, index_dir: str, k: int = 10, pruned: bool = True):
        self.reader = IndexReader(index_dir)
        self.k = k
        self.pruned = pruned

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = {"query_id": [], "rank": [], "doc_id": [], "score": []}
        ks = batch["k"] if "k" in batch.columns else pd.Series([self.k] * len(batch))
        for qid, qtext, k in zip(batch["query_id"], batch["query_text"], ks):
            fn = self.reader.search_pruned if self.pruned else self.reader.search
            for rank, (doc_id, score) in enumerate(fn(qtext, int(k)), start=1):
                out["query_id"].append(qid)
                out["rank"].append(rank)
                out["doc_id"].append(doc_id)
                out["score"].append(score)
        return pd.DataFrame(out)
