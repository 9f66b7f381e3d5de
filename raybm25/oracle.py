"""Brute-force in-memory BM25 oracle — the correctness ground truth.

Stands in for the OpenSearch server the reference delegates scoring to
(SURVEY.md §2.B B6: Lucene BM25, k1=1.2, b=0.75, single shard => global
statistics). Deliberately simple and *independent* of the engine:
plain dicts and per-doc Python loops, no numpy, no shared code paths
beyond the analyzer definition.

Scoring (Lucene BM25, public documented formula):
    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d) = sum over distinct query terms t (in sorted term order,
               weighted by the term's multiplicity in the query) of
               w_t * idf(t) * tf / (tf + k1*(1 - b + b*dl/avgdl))
Ties: score desc, then doc_id asc (SURVEY.md §2.B B7).
"""

from __future__ import annotations

import math
from collections import Counter

from . import BM25_K1, BM25_B
from .analysis import tokenize


class OracleIndex:
    def __init__(self, docs: dict[int, str]):
        """docs: doc_id -> text (already deduped)."""
        self.tf: dict[int, Counter] = {}
        self.dl: dict[int, int] = {}
        self.df: Counter = Counter()
        for doc_id, text in docs.items():
            toks = tokenize(text)
            c = Counter(toks)
            self.tf[doc_id] = c
            self.dl[doc_id] = len(toks)
            for term in c:
                self.df[term] += 1
        self.n_docs = len(docs)
        self.avgdl = (sum(self.dl.values()) / self.n_docs) if self.n_docs else 0.0

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        qcounts = Counter(tokenize(query))
        scores: dict[int, float] = {}
        for term in sorted(qcounts):
            if term not in self.df:
                continue
            w = qcounts[term]
            idf = self.idf(term)
            for doc_id, c in self.tf.items():
                tf = c.get(term, 0)
                if tf == 0:
                    continue
                dl = self.dl[doc_id]
                norm = tf / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / self.avgdl))
                scores[doc_id] = scores.get(doc_id, 0.0) + w * idf * norm
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
