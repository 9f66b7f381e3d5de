"""``_rank_eval`` endpoint: score ranked search results against
human relevance ratings (OpenSearch Ranking Evaluation API parity).

The reference's users tune their OpenSearch queries with
``POST /index/_rank_eval`` (public OpenSearch API; the loader builds
the indexes those evaluations run over —
/root/reference/opensearch_loader/loader.py:239-312). This module
evaluates the same request shape against the local engine: each
templated request is executed through :func:`raybm25.query.dsl.run_query`
and the hit ranking is scored with one of the standard rank metrics.

Body shape (the OpenSearch subset)::

    {
      "requests": [
        {"id": "q1",
         "request": {"query": {"match": {"text": "merge"}}},
         "ratings": [{"_id": 3, "rating": 2}, ...]},
        ...
      ],
      "metric": {"precision": {"k": 10, "relevant_rating_threshold": 1,
                               "ignore_unlabeled": false}}
    }

Supported metrics (OpenSearch semantics):

- ``precision``: relevant-in-top-k / considered-in-top-k. Unlabeled
  hits count as irrelevant unless ``ignore_unlabeled`` (then they are
  dropped from the denominator). Empty denominator scores 0.
- ``recall``: relevant-in-top-k / all-relevant-in-ratings; 0 when the
  ratings contain no relevant doc.
- ``mean_reciprocal_rank``: 1/rank of the first relevant hit in the
  top k, else 0.
- ``dcg``: sum over the top k of (2^rating - 1)/log2(rank + 1) for
  rated hits (unrated contribute nothing). With ``normalize`` the sum
  is divided by the ideal DCG of the k best ratings (NDCG).
- ``expected_reciprocal_rank``: cascade model ERR with
  ``maximum_relevance`` (Chapelle et al., CIKM 2009):
  R_i = (2^rating - 1) / 2^max_rating, ERR = sum_i p(stop at i)/i.

Response: ``{"metric_score": mean-over-requests, "details": {id:
{"metric_score", "unrated_docs", "hits", "metric_details"}},
"failures": {}}`` — the subset clients read.

Per-request scores are computed by iterating the (at most k) returned
hits in rank order, so the float summation order in DCG/ERR is pinned
(ascending rank), matching the contract oracles' explicit chains.
"""

from __future__ import annotations

import math
from typing import Any

from .dsl import run_query


def _ratings_map(ratings: list[dict]) -> dict[int, int]:
    out: dict[int, int] = {}
    for r in ratings:
        out[int(r["_id"])] = int(r["rating"])
    return out


def _score_precision(
    ranked: list[tuple[int, int | None]], spec: dict
) -> tuple[float, dict]:
    thr = int(spec.get("relevant_rating_threshold", 1))
    ignore_unlabeled = bool(spec.get("ignore_unlabeled", False))
    relevant = 0
    considered = 0
    for _doc, rating in ranked:
        if rating is None:
            if not ignore_unlabeled:
                considered += 1
            continue
        considered += 1
        if rating >= thr:
            relevant += 1
    score = relevant / considered if considered else 0.0
    return score, {
        "relevant_docs_retrieved": relevant,
        "docs_retrieved": considered,
    }


def _score_recall(
    ranked: list[tuple[int, int | None]], ratings: dict[int, int], spec: dict
) -> tuple[float, dict]:
    thr = int(spec.get("relevant_rating_threshold", 1))
    total_relevant = sum(1 for v in ratings.values() if v >= thr)
    got = sum(1 for _d, r in ranked if r is not None and r >= thr)
    score = got / total_relevant if total_relevant else 0.0
    return score, {
        "relevant_docs_retrieved": got,
        "relevant_docs": total_relevant,
    }


def _score_mrr(
    ranked: list[tuple[int, int | None]], spec: dict
) -> tuple[float, dict]:
    thr = int(spec.get("relevant_rating_threshold", 1))
    for i, (_doc, rating) in enumerate(ranked, start=1):
        if rating is not None and rating >= thr:
            return 1.0 / i, {"first_relevant": i}
    return 0.0, {"first_relevant": -1}


def _score_dcg(
    ranked: list[tuple[int, int | None]], ratings: dict[int, int], spec: dict
) -> tuple[float, dict]:
    dcg = 0.0
    for i, (_doc, rating) in enumerate(ranked, start=1):
        if rating is not None:
            dcg += (2.0**rating - 1.0) / math.log2(i + 1.0)
    details: dict[str, Any] = {"dcg": dcg}
    if not spec.get("normalize", False):
        return dcg, details
    ideal = sorted(ratings.values(), reverse=True)[: len(ranked) or None]
    # ideal ranking over the k best ratings (k = hits considered; if
    # the query returned nothing, OpenSearch normalizes over the top
    # `k` ratings — degenerate 0/idcg is still 0)
    idcg = 0.0
    for i, rating in enumerate(ideal, start=1):
        idcg += (2.0**rating - 1.0) / math.log2(i + 1.0)
    details["ideal_dcg"] = idcg
    details["normalized_dcg"] = dcg / idcg if idcg else 0.0
    return details["normalized_dcg"], details


def _score_err(
    ranked: list[tuple[int, int | None]], spec: dict
) -> tuple[float, dict]:
    max_rel = int(spec.get("maximum_relevance", 4))
    denom = 2.0**max_rel
    err = 0.0
    p_continue = 1.0
    for i, (_doc, rating) in enumerate(ranked, start=1):
        r = (2.0 ** (rating or 0) - 1.0) / denom if rating is not None else 0.0
        err += p_continue * r / i
        p_continue *= 1.0 - r
    return err, {"unrated_treated_as_zero": True}


_METRIC_K_DEFAULT = {"precision": 10, "recall": 10,
                     "mean_reciprocal_rank": 10, "dcg": 10,
                     "expected_reciprocal_rank": 10}


def run_rank_eval(index_dir_or_reader, body: dict) -> dict:
    """Evaluate ``body["requests"]`` with ``body["metric"]`` and
    return the OpenSearch ``_rank_eval`` response shape."""
    requests = body.get("requests")
    if not isinstance(requests, list) or not requests:
        raise ValueError("_rank_eval requires a non-empty 'requests' list")
    metric = body.get("metric")
    if not isinstance(metric, dict) or len(metric) != 1:
        raise ValueError("_rank_eval requires exactly one 'metric'")
    mname, mspec = next(iter(metric.items()))
    if mname not in _METRIC_K_DEFAULT:
        raise ValueError(f"unsupported rank_eval metric: {mname!r}")
    mspec = dict(mspec or {})
    k = int(mspec.get("k", _METRIC_K_DEFAULT[mname]))
    if k <= 0:
        raise ValueError("metric k must be positive")

    details: dict[str, dict] = {}
    total = 0.0
    for req in requests:
        rid = str(req["id"])
        ratings = _ratings_map(req.get("ratings", []))
        search_body = dict(req["request"])
        search_body.setdefault("size", k)
        resp = run_query(index_dir_or_reader, search_body)
        hits = resp["hits"]["hits"][:k]
        ranked = [
            (int(h["_id"]), ratings.get(int(h["_id"]))) for h in hits
        ]
        if mname == "precision":
            score, mdet = _score_precision(ranked, mspec)
        elif mname == "recall":
            score, mdet = _score_recall(ranked, ratings, mspec)
        elif mname == "mean_reciprocal_rank":
            score, mdet = _score_mrr(ranked, mspec)
        elif mname == "dcg":
            score, mdet = _score_dcg(ranked, ratings, mspec)
        else:
            score, mdet = _score_err(ranked, mspec)
        details[rid] = {
            "metric_score": score,
            "unrated_docs": [
                {"_id": d} for d, r in ranked if r is None
            ],
            "hits": [
                {"hit": {"_id": d, "_score": h["_score"]}, "rating": r}
                for (d, r), h in zip(ranked, hits)
            ],
            "metric_details": {mname: mdet},
        }
        total += score

    return {
        "metric_score": total / len(requests),
        "details": details,
        "failures": {},
    }
