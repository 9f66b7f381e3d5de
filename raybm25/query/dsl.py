"""OpenSearch query-DSL adapter: run a request body dict against an
``IndexReader`` and return an OpenSearch-shaped response.

The reference's users talk to OpenSearch in this DSL (the loader
configures the indexes those queries hit —
/root/reference/opensearch_loader/loader.py:239-312); this module maps
each supported clause onto the engine's native methods so a pipeline
that today issues ``POST /index/_search`` bodies can run unchanged
against this engine.

Supported:
- query: match (with per-clause boost, operator=and,
  minimum_should_match), match_phrase (incl. slop — ordered greedy
  chains), match_phrase_prefix,
  match_bool_prefix, multi_match (best_fields incl. tie_breaker /
  most_fields / bool_prefix / phrase incl. slop / phrase_prefix),
  knn (exact cosine over a stored vector column, optional filter), term,
  terms, range, exists, ids, prefix, wildcard, regexp, fuzzy,
  more_like_this, constant_score, function_score (field_value_factor),
  dis_max (arbitrary scoring sub-clauses, tie_breaker), boosting
  (positive / negative / negative_boost), simple_query_string (terms,
  -negation, "quoted phrases", default_operator, multi-field
  most_fields sum — unsupported syntax raises instead of being
  silently dropped),
  intervals (all_of: ordered / max_gaps), query_string (full Lucene
  syntax — see query/querystring.py), span_term / span_near /
  span_first, rank_feature (saturation / log / sigmoid) and
  distance_feature over stored doc-values, bool (must / should /
  must_not / filter(term | range | terms | exists | ids, ANDed) /
  minimum_should_match), match_all; ``run_query_multi`` fans a body
  out over partition indexes (logs-* scatter-gather, per-index stats)
- size / from (offset paging), search_after + deterministic sort
  [_score, _id], sort on a numeric doc-value field, collapse (field
  collapsing), rescore (match_phrase window re-ranking), the
  ``run_count`` / ``run_msearch`` / ``run_mget`` / ``run_termvectors``
  endpoints, and ``run_scroll`` (stateless scroll continuation —
  search_after fast path on plain match queries)
- aggs: terms, range, histogram, date_histogram, stats /
  extended_stats / rare_terms / missing (and the
  single-metric min / max / avg / sum / value_count), filters (named
  buckets), percentiles, percentile_ranks (exact empirical CDF),
  weighted_avg, top_metrics, matrix_stats (pinned moment formulas),
  cardinality, significant_terms (JLH), terms + top_hits/stats
  sub-aggs, composite (after-key pagination) — each over the SAME
  query's match set; pipeline aggs: cumulative_sum / derivative /
  bucket_sort under a histogram parent, sibling
  max/min/sum/avg_bucket via buckets_path
- suggest: term (fuzzy candidates by df), phrase (fuzzy candidates
  crossed and ranked by adjacent-phrase df), completion (prefix range
  over the term dictionary, df-weighted)

Response shape (the subset clients actually read):
``{"hits": {"total": {"value": n}, "hits": [{"_id", "_score"}...]},
"aggregations": {name: ...}}``.
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np

from .engine import IndexReader


def _one(d: dict, what: str) -> tuple[str, Any]:
    if not isinstance(d, dict) or len(d) != 1:
        raise ValueError(f"{what} must be a single-key dict, got {d!r}")
    return next(iter(d.items()))


def _parse_boost_fields(fields) -> dict[str, float]:
    """``["text", "source^2"]`` -> ``{"text": 1.0, "source": 2.0}``
    (OpenSearch's field^boost list syntax, order preserved)."""
    out: dict[str, float] = {}
    for f in fields:
        name, _, boost = str(f).partition("^")
        out[name] = float(boost) if boost else 1.0
    return out


def _field_query(spec) -> tuple[str, dict]:
    """Normalize ``{field: "text"}`` / ``{field: {..opts}}``."""
    field, body = _one(spec, "query clause")
    if not isinstance(body, dict):
        body = {"query": body}
    return field, body


def _span_multi_expansions(r: IndexReader, cs: dict) -> tuple[list[str], str]:
    """Dictionary expansion of a ``span_multi`` clause's inner
    multi-term query (prefix / wildcard / fuzzy / regexp), returned in
    dictionary form (field-prefixed for non-primary fields) plus the
    raw field name for the span chain's shared-field check."""
    mk, ms = _one(cs["match"], "span_multi match")
    f, b = _field_query(ms)
    field = None if f == r.primary_field else f
    v = str(b.get("value", b.get("query", "")))
    if mk == "prefix":
        terms = r.expand_prefix(v, field)
    elif mk == "wildcard":
        terms = r.expand_wildcard(v, field)
    elif mk == "regexp":
        terms = r.expand_regexp(v, field)
    elif mk == "fuzzy":
        terms = r.expand_fuzzy(
            v,
            max_edits=_fuzziness(b.get("fuzziness", 1), v),
            prefix_length=int(b.get("prefix_length", 0)),
            field=field,
            transpositions=bool(b.get("transpositions", False)),
        )
    else:
        raise ValueError(
            "span_multi match supports prefix/wildcard/regexp/fuzzy, "
            f"got {mk!r}"
        )
    if field is not None:
        terms = [f"{field}:{t}" for t in terms]
    return terms, f


def _docs_of(r: IndexReader, kind: str, spec) -> np.ndarray:
    """Doc-id set of any clause, composing ``bool`` by set algebra —
    the evaluator join/nested inner queries use."""
    if kind == "bool":
        return _bool_docs(r, spec)
    return _match_docs(r, kind, spec)


def query_docset(r: IndexReader, body_query: dict) -> np.ndarray:
    """Sorted live ORDINALS of a filter-context DSL query dict — the
    hook the by-query maintenance ops (_delete_by_query /
    _update_by_query / export) use to accept full request bodies: the
    clause evaluates once here, and the result rides the
    _match_ordinals passthrough into the existing match-text paths."""
    k, sp = _one(body_query, "query")
    return r.ordinals_of_ids(_docs_of(r, k, sp))


def _bool_docs(r: IndexReader, spec: dict) -> np.ndarray:
    """Pure set-algebra ``bool`` (filter context): must/filter clauses
    AND, should clauses OR (>= minimum_should_match, default 1 only
    when should stands alone — OpenSearch's rule), must_not subtracts.
    Every leaf is a sorted doc-id set; no scores are computed."""
    out: np.ndarray | None = None
    for key in ("must", "filter"):
        for c in _as_list(spec.get(key)):
            ck, cs = _one(c, f"bool.{key}")
            s = _docs_of(r, ck, cs)
            out = s if out is None else out[np.isin(out, s, assume_unique=True)]
    should = _as_list(spec.get("should"))
    if should:
        msm = spec.get("minimum_should_match")
        msm = int(msm) if msm is not None else (1 if out is None else 0)
        if msm > 0:
            sets = [
                _docs_of(r, *_one(c, "bool.should")) for c in should
            ]
            allv = (
                np.concatenate(sets) if sets else np.empty(0, np.uint64)
            )
            u, cnt = np.unique(allv, return_counts=True)
            s = u[cnt >= msm]
            out = s if out is None else out[np.isin(out, s, assume_unique=True)]
    if out is None:
        out = _match_docs(r, "match_all", {})
    for c in _as_list(spec.get("must_not")):
        ck, cs = _one(c, "bool.must_not")
        s = _docs_of(r, ck, cs)
        if s.size:
            out = out[~np.isin(out, s, assume_unique=True)]
    return out


def _as_list(v) -> list:
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


# inner-query kinds whose per-child score is a real relevance score;
# everything else contributes the constant 1.0 (OpenSearch's
# constant-score rewrite for filter-ish clauses), so score_mode=sum
# over such an inner query ranks parents by matching-child COUNT —
# the standard join-field idiom.
_JOIN_SCORING = ("match", "match_phrase", "match_bool_prefix")


def _inner_child_scores(
    r: IndexReader, ik: str, ispec, type_docs: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(child doc ids, per-child scores) of a join inner query,
    restricted to the child type's docs."""
    if ik in _JOIN_SCORING:
        hits = _scored_hits(r, ik, ispec, r.n_docs)
        cids = np.array([d for d, _ in hits], dtype=np.uint64)
        cscores = np.array([s for _, s in hits], dtype=np.float64)
    else:
        cids = _docs_of(r, ik, ispec)
        cscores = np.ones(cids.size, dtype=np.float64)
    m = np.isin(cids, type_docs)
    return cids[m], cscores[m]


def _join_scored(r: IndexReader, kind: str, spec, k: int) -> list[tuple[int, float]]:
    """Scored ``has_child`` / ``nested``: aggregate matching children's
    scores per parent (score_mode sum / avg / max / min), apply the
    min_children / max_children bounds, rank parents. The per-child
    parent keys come from one pruned (doc_id, parent_field) partition
    scan — keys and float scores only, no doc bodies."""
    import pyarrow.dataset as pds

    ctype = str(spec["type"] if kind == "has_child" else spec["path"])
    rel = r._join_rel(ctype)
    mode = str(spec.get("score_mode", "avg"))
    ik, ispec = _one(spec["query"], f"{kind}.query")
    cids, cscores = _inner_child_scores(r, ik, ispec, r.join_type_docs(ctype))
    if cids.size == 0:
        return []
    ids2, pk = r._scan_column_pairs(
        str(rel["parent_field"]), pds.field("doc_id").isin(cids)
    )
    order = np.argsort(cids, kind="mergesort")
    sc = cscores[order][np.searchsorted(cids[order], ids2)]
    u, inv = np.unique(pk.astype(np.uint64), return_inverse=True)
    counts = np.bincount(inv, minlength=u.size)
    if mode == "sum":
        agg = np.bincount(inv, weights=sc, minlength=u.size)
    elif mode == "avg":
        agg = np.bincount(inv, weights=sc, minlength=u.size) / counts
    elif mode == "max":
        agg = np.full(u.size, -np.inf)
        np.maximum.at(agg, inv, sc)
    elif mode == "min":
        agg = np.full(u.size, np.inf)
        np.minimum.at(agg, inv, sc)
    else:
        raise ValueError(f"unsupported score_mode {mode!r}")
    lo = int(spec.get("min_children", 1))
    hi = spec.get("max_children")
    keep = counts >= lo
    if hi is not None:
        keep &= counts <= int(hi)
    u, agg = u[keep], agg[keep]
    live = np.isin(u, r.join_type_docs(str(rel["children"][ctype])), assume_unique=True)
    u, agg = u[live], agg[live]
    order = np.lexsort((u, -agg))[:k]
    return [(int(d), float(s)) for d, s in zip(u[order], agg[order])]


def _parent_scored(r: IndexReader, spec, k: int) -> list[tuple[int, float]]:
    """``has_parent`` with ``score: true``: every matching child
    inherits its parent's score (OpenSearch's only scored mode for
    has_parent), ranked score desc / doc_id asc."""
    import pyarrow.dataset as pds

    ptype = str(spec["parent_type"])
    ik, ispec = _one(spec["query"], "has_parent.query")
    pids, pscores = _inner_child_scores(r, ik, ispec, r.join_type_docs(ptype))
    if pids.size == 0:
        return []
    ctypes = [
        ct for ct, pt in r.relations.get("children", {}).items() if pt == ptype
    ]
    if not ctypes:
        raise ValueError(f"no child type declares parent {ptype!r}")
    rel = r.relations
    out_ids, out_sc = [], []
    order = np.argsort(pids, kind="mergesort")
    pids_s, pscores_s = pids[order], pscores[order]
    for ct in ctypes:
        kids = r.children_of(pids_s, ct)
        if kids.size == 0:
            continue
        ids2, pk = r._scan_column_pairs(
            str(rel["parent_field"]), pds.field("doc_id").isin(kids)
        )
        sc = pscores_s[np.searchsorted(pids_s, pk.astype(np.uint64))]
        out_ids.append(ids2)
        out_sc.append(sc)
    if not out_ids:
        return []
    ids = np.concatenate(out_ids)
    sc = np.concatenate(out_sc)
    order = np.lexsort((ids, -sc))[:k]
    return [(int(d), float(s)) for d, s in zip(ids[order], sc[order])]


def _match_docs(r: IndexReader, kind: str, spec) -> np.ndarray:
    """Doc-id SET (sorted uint64) for an unscored clause (filter /
    must_not contexts and the agg candidate set)."""
    if kind == "match_all":
        import glob
        import os

        import pyarrow.parquet as pq

        from ..index.build import DOCS_SUBDIR

        parts = []
        for p in sorted(
            glob.glob(os.path.join(r.index_dir, DOCS_SUBDIR, "*.parquet"))
        ):
            parts.append(
                pq.read_table(p, columns=["doc_id"]).column("doc_id").to_numpy(
                    zero_copy_only=False
                )
            )
        return np.sort(np.concatenate(parts).astype(np.uint64))
    if kind == "exists":
        return r.exists_docs(str(spec["field"]))
    if kind == "wrapper":
        # base64-wrapped JSON query (the OpenSearch escape hatch for
        # templated clients); decode and re-dispatch
        ik, ispec = _unwrap(spec)
        return _match_docs(r, ik, ispec)
    if kind == "geo_distance":
        dist = _parse_distance(spec["distance"])
        rest = {kk: v for kk, v in spec.items() if kk != "distance"}
        gfield, origin = _one(rest, "geo_distance field")
        return r.geo_distance_docs(
            gfield, float(origin["lat"]), float(origin["lon"]), dist
        )
    if kind == "geo_bounding_box":
        gfield, box = _one(spec, "geo_bounding_box")
        tl, br = box["top_left"], box["bottom_right"]
        return r.geo_bounding_box_docs(
            gfield,
            top=float(tl["lat"]),
            left=float(tl["lon"]),
            bottom=float(br["lat"]),
            right=float(br["lon"]),
        )
    if kind == "geo_polygon":
        gfield, poly = _one(spec, "geo_polygon")
        pts = [(float(pt["lat"]), float(pt["lon"])) for pt in poly["points"]]
        return r.geo_polygon_docs(gfield, pts)
    if kind == "span_multi":
        # a multi-term query lifted into span context: standalone it
        # matches exactly the inner query's doc set (each expansion
        # occurrence is a one-position span); inside span_near the
        # clause contributes its expansion set to one slot
        mk, ms = _one(spec["match"], "span_multi match")
        return _match_docs(r, mk, ms)
    if kind == "span_or":
        # union of the clause spans' doc sets — exact at doc level
        # (any matching inner span qualifies the doc)
        sets = []
        for c in spec["clauses"]:
            ck, cs = _one(c, "span_or clause")
            sets.append(_match_docs(r, ck, cs).astype(np.uint64))
        if not sets:
            return np.empty(0, np.uint64)
        out = sets[0]
        for s in sets[1:]:
            out = np.union1d(out, s)
        return out
    if kind == "query_string":
        from .querystring import query_string_docs

        return query_string_docs(r, spec)

    def _span_clause_terms(c: dict, what: str) -> tuple[list[str], int, str | None]:
        """(raw terms, slop, field) of a span_term or span_near clause
        — the two span shapes the algebra operators compose."""
        ck, cs = _one(c, what)
        if ck == "span_term":
            cf, cb = _field_query(cs)
            return (
                [str(cb.get("query", cb.get("value", "")))],
                0,
                None if cf == r.primary_field else cf,
            )
        if ck == "span_near":
            texts, sfield = [], None
            for cc in cs["clauses"]:
                cck, ccs = _one(cc, "span_near clause")
                if cck != "span_term":
                    raise ValueError("span_near supports span_term clauses")
                cf, cb = _field_query(ccs)
                if sfield is not None and cf != sfield:
                    raise ValueError("span_near clauses must share one field")
                sfield = cf
                texts.append(str(cb.get("query", cb.get("value", ""))))
            if not bool(cs.get("in_order", True)):
                raise ValueError(f"{what}: unordered span_near is unsupported")
            return (
                texts,
                int(cs.get("slop", 0)),
                None if sfield == r.primary_field else sfield,
            )
        raise ValueError(f"{what} supports span_term / span_near clauses")

    if kind == "span_not":
        inc, slop, sfield = _span_clause_terms(spec["include"], "span_not include")
        exk, exs = _one(spec["exclude"], "span_not exclude")
        if exk != "span_term":
            raise ValueError("span_not exclude supports a span_term clause")
        ef, eb = _field_query(exs)
        dist = int(spec.get("dist", 0))
        return r.span_not_docs(
            inc,
            str(eb.get("query", eb.get("value", ""))),
            slop=slop,
            pre=int(spec.get("pre", dist)),
            post=int(spec.get("post", dist)),
            field=sfield,
        ).astype(np.uint64)
    if kind in ("span_within", "span_containing"):
        # the two operators swap which span is RETURNED (little vs
        # big) but match the same documents — one doc-level kernel
        big_key, little_key = ("big", "little")
        big, slop, sfield = _span_clause_terms(
            spec[big_key], f"{kind} {big_key}"
        )
        little, lslop, _ = _span_clause_terms(
            spec[little_key], f"{kind} {little_key}"
        )
        if len(little) != 1 or lslop:
            raise ValueError(f"{kind} little supports a span_term clause")
        return r.span_within_docs(
            little[0], big, slop=slop, field=sfield
        ).astype(np.uint64)
    if kind == "span_near":
        # Lucene span_near(slop, in_order) == intervals all_of with
        # max_gaps=slop: both accept a window whose internal gap total
        # is <= slop (matchLength - clauses <= slop). Clauses are
        # span_terms on one field, plus span_multi (a multi-term query
        # expanded on the dictionary: any expansion may fill the slot)
        # and span_field_masking (the inner span_term queries ITS OWN
        # field while declaring the masked field for this shared-field
        # check — Lucene's cross-field composition, valid when both
        # fields tokenize the same underlying text).
        slots: list[list[str]] = []
        sfield = None
        multi = False
        raw_texts: list[str] = []
        for c in spec["clauses"]:
            ck, cs = _one(c, "span_near clause")
            if ck == "span_term":
                cf, cb = _field_query(cs)
                t = str(cb.get("query", cb.get("value", "")))
                raw_texts.append(t)
                alts = r.field_terms(
                    t, None if cf == r.primary_field else cf
                )
                if len(alts) > 1:
                    raise ValueError(
                        f"span_term {t!r} analyzed to {len(alts)} terms"
                    )
            elif ck == "span_multi":
                alts, cf = _span_multi_expansions(r, cs)
                multi = True
            elif ck == "span_field_masking":
                ik, ispec = _one(cs["query"], "span_field_masking query")
                if ik != "span_term":
                    raise ValueError(
                        "span_field_masking supports a span_term query"
                    )
                inner_f, cb = _field_query(ispec)
                t = str(cb.get("query", cb.get("value", "")))
                # query the INNER field's positions under the masked
                # field's name; analyzed eagerly so the slot carries
                # the field-prefixed dictionary form
                alts = r.field_terms(
                    t, None if inner_f == r.primary_field else inner_f
                )
                if len(alts) != 1:
                    raise ValueError(
                        "span_field_masking term must analyze to one term"
                    )
                cf = str(cs["field"])
                multi = True  # field mix: route to the slot kernel
            else:
                raise ValueError(
                    "span_near supports span_term / span_multi / "
                    "span_field_masking clauses"
                )
            if ck != "span_field_masking":
                if sfield is not None and cf != sfield:
                    raise ValueError(
                        "span_near clauses must share one field"
                    )
                sfield = cf
            if not alts:
                return np.empty(0, np.uint64)
            slots.append(alts)
        if not multi:
            # all-span_term chain: the pre-existing intervals route
            # (it re-analyzes the raw texts; keeps unordered support)
            sf = None if sfield in (None, r.primary_field) else sfield
            return r.intervals_docs(
                " ".join(raw_texts),
                max_gaps=int(spec.get("slop", 0)),
                ordered=bool(spec.get("in_order", True)),
                field=sf,
            ).astype(np.uint64)
        if not bool(spec.get("in_order", True)):
            raise ValueError(
                "span_near with span_multi requires in_order=true"
            )
        return r.span_near_slots_docs(
            slots, slop=int(spec.get("slop", 0))
        ).astype(np.uint64)
    if kind == "span_first":
        mk, ms = _one(spec["match"], "span_first match")
        if mk != "span_term":
            raise ValueError("span_first supports a span_term match")
        mf, mb = _field_query(ms)
        return r.span_first_docs(
            str(mb.get("query", mb.get("value", ""))),
            end=int(spec["end"]),
            field=None if mf == r.primary_field else mf,
        ).astype(np.uint64)
    if kind == "ids":
        return r.ids_docs([int(v) for v in spec["values"]])
    if kind == "match_none":
        return np.empty(0, np.uint64)
    if kind == "bool":
        return _bool_docs(r, spec)
    if kind in ("has_child", "nested"):
        # join-field / nested-object membership (filter context): docs
        # of the parent type with >= min_children children (nested:
        # >= 1 nested objects) matching the inner query. ``nested``
        # rides the same relation machinery — a nested path is a child
        # type whose rows are the nested objects, so a bool over two
        # child fields is evaluated per OBJECT (the same-object
        # semantics that distinguish nested from a flat bool).
        ctype = str(spec["type"] if kind == "has_child" else spec["path"])
        rel = r._join_rel(ctype)
        ik, ispec = _one(spec["query"], f"{kind}.query")
        inner = _docs_of(r, ik, ispec)
        child_docs = np.intersect1d(
            inner, r.join_type_docs(ctype), assume_unique=False
        )
        pk, counts = r.child_parent_counts(child_docs, ctype)
        lo = int(spec.get("min_children", 1))
        hi = spec.get("max_children")
        keep = counts >= lo
        if hi is not None:
            keep &= counts <= int(hi)
        pk = pk[keep]
        parents = r.join_type_docs(str(rel["children"][ctype]))
        return pk[np.isin(pk, parents, assume_unique=True)]
    if kind == "has_parent":
        # children whose parent matches the inner query: a keys-only
        # membership scan (broadcast semi-join shape)
        ptype = str(spec["parent_type"])
        ik, ispec = _one(spec["query"], "has_parent.query")
        pset = np.intersect1d(
            _docs_of(r, ik, ispec), r.join_type_docs(ptype)
        )
        parts = [
            r.children_of(pset, ct)
            for ct, pt in r.relations.get("children", {}).items()
            if pt == ptype
        ]
        if not parts:
            raise ValueError(f"no child type declares parent {ptype!r}")
        out = parts[0]
        for s in parts[1:]:
            out = np.union1d(out, s)
        return out
    if kind == "parent_id":
        ctype = str(spec["type"])
        r._join_rel(ctype)
        return r.children_of(
            np.array([int(spec["id"])], dtype=np.uint64), ctype
        )
    if kind == "combined_fields":
        # filter context: docs matching ANY analyzed term in ANY of
        # the listed fields (OR, the combined_fields default operator)
        hits = r.search_combined(
            str(spec["query"]), _parse_boost_fields(spec["fields"]), k=r.n_docs
        )
        return np.sort(np.array([d for d, _ in hits], dtype=np.uint64))
    if kind == "synonym":
        # engine extension: query-time synonym group ({"synonym":
        # {field: [variants...]}}), the filter-context face of
        # Lucene's SynonymQuery (see IndexReader.search_synonym)
        sfield, variants = _one(spec, "synonym")
        return r.synonym_docs(
            [str(v) for v in variants],
            None if sfield == r.primary_field else sfield,
        )
    field, body = _field_query(spec)
    q = body.get("query", body.get("value", ""))
    f = None if field == r.primary_field else field
    if kind == "intervals":
        ao = body.get("all_of")
        if not ao:
            raise ValueError("intervals supports the 'all_of' source")
        if "query" in ao:
            text = str(ao["query"])
        else:
            text = " ".join(
                str(_one(iv, "interval source")[1]["query"])
                for iv in ao["intervals"]
            )
        return r.intervals_docs(
            text,
            max_gaps=int(ao.get("max_gaps", -1)),
            ordered=bool(ao.get("ordered", False)),
            field=f,
        )
    if kind == "span_term":
        # single-term span: presence (same doc set as `term` on a text
        # field); positional filtering happens in the enclosing span op
        docs = r.intervals_docs(str(q), max_gaps=0, ordered=True, field=f)
        return docs.astype(np.uint64)
    if kind == "range":
        bounds = {kk: body[kk] for kk in ("gte", "gt", "lte", "lt") if kk in body}
        return r.range_docs(field, **bounds)
    if kind == "terms":
        if isinstance(body, dict) and "path" in body and "query" not in body:
            # terms lookup (the OpenSearch {index, id, path} form): GET
            # the referenced doc from its index (default: this one) and
            # use its stored field values as the terms list. A missing
            # doc or field means zero terms -> empty hits, the
            # OpenSearch behavior. ``index`` is an index directory in
            # this engine's multi-index convention (run_query_multi).
            src = (
                IndexReader(str(body["index"]))
                if "index" in body and str(body["index"]) != r.index_dir
                else r
            )
            tbl = src.get_docs(np.array([int(body["id"])], dtype=np.uint64))
            path = str(body["path"])
            if tbl.num_rows == 0 or path not in tbl.column_names:
                return np.empty(0, np.uint64)
            v = tbl.column(path)[0].as_py()
            vals = v if isinstance(v, list) else [v]
            return r.terms_docs(
                field, [str(x) for x in vals if x is not None]
            )
        return r.terms_docs(field, [str(v) for v in q])
    if kind == "match":
        return np.sort(r._map_ordinals(r._match_ordinals(str(q), f)).astype(np.uint64))
    if kind == "match_phrase":
        return r.match_phrase(str(q), f, slop=int(body.get("slop", 0))).astype(
            np.uint64
        )
    if kind == "match_phrase_prefix":
        return r.match_phrase_prefix(
            str(q), f, int(body.get("max_expansions", 50))
        ).astype(np.uint64)
    if kind == "match_bool_prefix":
        return r.match_bool_prefix_docs(str(q), f)
    if kind == "term":
        return r.term_docs(field, str(q)).astype(np.uint64)
    if kind == "prefix":
        return r.dict_prefix_docs(str(q), f).astype(np.uint64)
    if kind == "wildcard":
        return r.wildcard_docs(str(q), f).astype(np.uint64)
    if kind == "regexp":
        return r.regexp_docs(str(q), f).astype(np.uint64)
    if kind == "fuzzy":
        return r.fuzzy_docs(
            str(q),
            max_edits=_fuzziness(body.get("fuzziness", 1), str(q)),
            prefix_length=int(body.get("prefix_length", 0)),
            field=f,
            # OpenSearch defaults transpositions=true; this engine
            # defaults false (plain Levenshtein, exact SQL oracle at
            # every distance) and honors an explicit flag with the
            # OSA kernel (IndexReader.expand_fuzzy docstring)
            transpositions=bool(body.get("transpositions", False)),
        ).astype(np.uint64)
    if kind == "terms_set":
        # docs containing >= m of the given analyzed terms (text
        # fields; keyword fields are what `terms` covers).  m comes
        # from a literal minimum_should_match or a params.num_terms
        # script through the whitelisted bucket-script compiler.
        terms = [str(t) for t in body["terms"]]
        m = _terms_set_min(body, len(terms))
        sets = [
            np.unique(
                r._map_ordinals(r._match_ordinals(t, f)).astype(np.uint64)
            )
            for t in terms
        ]
        allv = (
            np.concatenate(sets) if sets else np.empty(0, np.uint64)
        )
        u, c = np.unique(allv, return_counts=True)
        return u[c >= max(m, 1)]
    raise ValueError(f"unsupported query kind {kind!r}")


def _fuzziness(v, term: str) -> int:
    """OpenSearch fuzziness: an int, or "AUTO" (0 edits for terms
    shorter than 3 chars, 1 for 3-5, 2 above — the documented AUTO
    ladder), optionally "AUTO:lo,hi" with custom breakpoints."""
    s = str(v).strip()
    if not s.upper().startswith("AUTO"):
        return int(v)
    lo, hi = 3, 6
    if ":" in s:
        try:
            lo, hi = (int(x) for x in s.split(":", 1)[1].split(","))
        except ValueError as e:
            raise ValueError(f"bad AUTO fuzziness {v!r}") from e
    n = len(term)
    if n < lo:
        return 0
    if n < hi:
        return 1
    return 2


_DIST_RE = re.compile(r"^\s*([0-9.]+)\s*(m|km|mi)?\s*$")


def _parse_distance(v) -> float:
    """OpenSearch distance string -> meters (m / km / mi; bare = m)."""
    if isinstance(v, (int, float)):
        return float(v)
    m = _DIST_RE.match(str(v))
    if not m:
        raise ValueError(f"unparseable distance {v!r}")
    mult = {"m": 1.0, "km": 1000.0, "mi": 1609.344, None: 1.0}[m.group(2)]
    return float(m.group(1)) * mult


def _terms_set_min(body: dict, n_terms: int) -> int:
    """Resolve a terms_set threshold: a literal minimum_should_match,
    a params.num_terms script (whitelisted compiler), or all terms."""
    if "minimum_should_match" in body:
        return int(body["minimum_should_match"])
    msrc = body.get("minimum_should_match_script")
    if msrc is None:
        return n_terms
    from .script import compile_bucket_script

    src = str(msrc.get("source", "")) if isinstance(msrc, dict) else str(msrc)
    cs = compile_bucket_script(src)
    bad = [p for p in cs.params if p != "num_terms"]
    if bad:
        raise ValueError(
            f"terms_set script may only read params.num_terms: {bad}"
        )
    return int(cs({"num_terms": np.array([float(n_terms)])})[0])


def _unwrap(spec: dict) -> tuple[str, Any]:
    """Decode a ``wrapper`` query's base64 JSON body."""
    import base64
    import json

    try:
        inner = json.loads(base64.b64decode(str(spec["query"])))
    except Exception as e:
        raise ValueError(f"wrapper.query is not base64 JSON: {e}") from e
    return _one(inner, "wrapper.query")


def _scored_hits(r: IndexReader, kind: str, spec, k: int) -> list[tuple[int, float]]:
    """Ranked (doc_id, score) for a scoring clause."""
    if kind == "match_all":
        ids = _match_docs(r, "match_all", spec)
        return [(int(d), 1.0) for d in ids[:k]]
    if kind == "wrapper":
        ik, ispec = _unwrap(spec)
        return _scored_hits(r, ik, ispec, k)
    if kind in ("has_child", "nested"):
        mode = str(spec.get("score_mode", "none" if kind == "has_child" else "avg"))
        if mode != "none":
            return _join_scored(r, kind, spec, k)
        ids = _match_docs(r, kind, spec)
        return [(int(d), 1.0) for d in ids[:k]]
    if kind == "has_parent":
        if bool(spec.get("score", False)):
            return _parent_scored(r, spec, k)
        ids = _match_docs(r, kind, spec)
        return [(int(d), 1.0) for d in ids[:k]]
    if kind in ("parent_id", "match_none"):
        ids = _match_docs(r, kind, spec)
        return [(int(d), 1.0) for d in ids[:k]]
    if kind == "hybrid":
        # hybrid search with reciprocal-rank fusion: each sub-query
        # contributes 1/(rank_constant + rank) over its top window_size
        # hits; contributions accumulate in sub-query order (pinned
        # float association), fused order = score desc, doc_id asc.
        window = int(spec.get("window_size", max(k, 100)))
        if spec.get("normalization") == "min_max":
            # score-based fusion (the OpenSearch normalization-processor
            # pipeline): each sub-query's top-window scores are min-max
            # normalized to [0, 1] — (s - min) / (max - min), a single
            # surviving hit normalizes to 1.0 — then combined as the
            # weighted arithmetic mean over ALL sub-queries (a doc
            # absent from a sub-result contributes 0 there), weights
            # defaulting to 1. Accumulation is in sub-query order
            # (pinned float association).
            weights = [
                float(w)
                for w in spec.get(
                    "weights", [1.0] * len(spec["queries"])
                )
            ]
            if len(weights) != len(spec["queries"]):
                raise ValueError("hybrid weights must match queries 1:1")
            wsum = 0.0
            for w in weights:
                wsum += w
            if wsum == 0.0:
                raise ValueError("hybrid weights must not all be zero")
            fused = {}
            for sq, w in zip(spec["queries"], weights):
                sk, ss = _one(sq, "hybrid sub-query")
                hits = _scored_hits(r, sk, ss, window)
                if not hits:
                    continue
                scores = [s for _, s in hits]
                lo, hi = min(scores), max(scores)
                rng = hi - lo
                for d, s in hits:
                    norm = 1.0 if rng == 0.0 else (s - lo) / rng
                    fused[d] = fused.get(d, 0.0) + w * norm
            ranked = sorted(
                ((d, s / wsum) for d, s in fused.items()),
                key=lambda t: (-t[1], t[0]),
            )
            return ranked[:k]
        # reciprocal-rank fusion (the default): each sub-query
        # contributes 1/(rank_constant + rank) over its top window
        rc = int(spec.get("rank_constant", 60))
        fused = {}
        for sq in spec["queries"]:
            sk, ss = _one(sq, "hybrid sub-query")
            hits = _scored_hits(r, sk, ss, window)
            for rank, (d, _) in enumerate(hits, 1):
                fused[d] = fused.get(d, 0.0) + 1.0 / (rc + rank)
        ranked = sorted(fused.items(), key=lambda t: (-t[1], t[0]))
        return ranked[:k]
    if kind == "pinned":
        # pinned docs first in the given order (only those that exist
        # in the index), then the organic hits with pinned ids removed.
        # Pinned scores mirror Lucene's huge-float promotion: distinct,
        # strictly decreasing, far above any BM25 score.
        ids = [int(v) for v in spec["ids"]]
        ok_, ospec = _one(spec["organic"], "pinned.organic")
        organic = _scored_hits(r, ok_, ospec, k + len(ids))
        mask = (1 << 64) - 1
        uids = np.array([v & mask for v in ids], dtype=np.uint64)
        present = set(int(d) for d in r.ids_docs(uids))
        base = 2.0**127
        pinned = [
            (int(u), base - i * 2.0**100)
            for i, u in enumerate(uids)
            if int(u) in present
        ]
        pinned_set = {d for d, _ in pinned}
        organic = [(d, s) for d, s in organic if d not in pinned_set]
        return (pinned + organic)[:k]
    if kind == "more_like_this":
        # spec is the options dict itself: {"like_id": ..., knobs...}
        return r.more_like_this(
            int(spec["like_id"]),
            k=k,
            max_query_terms=int(spec.get("max_query_terms", 25)),
            min_term_freq=int(spec.get("min_term_freq", 1)),
            min_doc_freq=int(spec.get("min_doc_freq", 2)),
        )
    if kind == "knn":
        # OpenSearch k-NN: {"knn": {"<field>": {"vector": [...], "k": n,
        # "filter": {...}}}} — exact cosine top-k over the stored vector
        # column; an optional filter clause restricts candidates before
        # the cut (filtered exact search)
        fname, body = _one(spec, "knn field")
        filt = None
        if "filter" in body:
            fk, fs = _one(body["filter"], "knn.filter")
            filt = _match_docs(r, fk, fs)
        radial = "min_score" in body or "max_distance" in body
        if radial and "k" not in body:
            # radial search proper (OpenSearch 2.14 min_score /
            # max_distance WITHOUT k): every doc above the similarity
            # threshold, page-capped by size — not top-k-then-filter.
            # The exact matvec scores all candidates anyway, so the
            # wide cut costs nothing extra.
            kk = 1 << 62
        else:
            kk = min(k, int(body.get("k", k)))
        hits = r.knn_search(fname, body["vector"], k=kk, filter_docs=filt)
        if "max_distance" in body:
            # cosinesimil space: distance = 1 - cosine
            ms = 1.0 - float(body["max_distance"])
            hits = [(d, s) for d, s in hits if s >= ms]
        if "min_score" in body:
            ms = float(body["min_score"])
            hits = [(d, s) for d, s in hits if s >= ms]
        return hits[:k]
    if kind == "rank_feature":
        # {"rank_feature": {"field": f, "saturation": {"pivot": p},
        #  "boost": b}} (or "log" / "sigmoid" function bodies)
        fname = str(spec["field"])
        boost = float(spec.get("boost", 1.0))
        if "log" in spec:
            return r.rank_feature(
                fname, boost=boost, function="log",
                scaling_factor=float(spec["log"]["scaling_factor"]), k=k,
            )
        if "sigmoid" in spec:
            return r.rank_feature(
                fname, boost=boost, function="sigmoid",
                pivot=float(spec["sigmoid"]["pivot"]),
                exponent=float(spec["sigmoid"]["exponent"]), k=k,
            )
        sat = spec.get("saturation", {})
        return r.rank_feature(
            fname, pivot=float(sat["pivot"]), boost=boost, k=k
        )
    if kind == "distance_feature":
        return r.distance_feature(
            str(spec["field"]),
            origin=float(spec["origin"]),
            pivot=float(spec["pivot"]),
            boost=float(spec.get("boost", 1.0)),
            k=k,
        )
    if kind == "constant_score":
        # wrapper: every doc matching the inner filter scores `boost`
        ik, ispec = _one(spec["filter"], "constant_score.filter")
        boost = float(spec.get("boost", 1.0))
        ids = _match_docs(r, ik, ispec)
        return [(int(d), boost) for d in ids[:k]]
    if kind == "function_score":
        ik, ispec = _one(spec["query"], "function_score.query")
        if ik != "match":
            raise ValueError("function_score supports a 'match' inner query")
        ifield, ibody = _field_query(ispec)
        f_ = None if ifield == r.primary_field else ifield
        qtext_ = str(ibody.get("query", ""))
        if "random_score" in spec:
            # deterministic seeded uniform score, boost_mode replace —
            # the seeded-sample idiom
            return r.search_random_score(
                qtext_,
                seed=int(spec["random_score"].get("seed", 0)),
                k=k,
                field=f_,
            )
        for dfn in ("gauss", "exp", "linear"):
            if dfn in spec:
                dfield, dspec = _one(spec[dfn], f"function_score.{dfn}")
                return r.search_decay(
                    qtext_,
                    str(dfield),
                    origin=float(dspec["origin"]),
                    scale=float(dspec["scale"]),
                    offset=float(dspec.get("offset", 0.0)),
                    decay=float(dspec.get("decay", 0.5)),
                    function=dfn,
                    boost_mode=str(spec.get("boost_mode", "multiply")),
                    k=k,
                    field=f_,
                )
        fvf = spec.get("field_value_factor")
        if not fvf:
            raise ValueError(
                "function_score requires field_value_factor, a decay "
                "function (gauss/exp/linear) or random_score"
            )
        return r.search_function_score(
            qtext_,
            str(fvf["field"]),
            factor=float(fvf.get("factor", 1.0)),
            modifier=str(fvf.get("modifier", "log1p")),
            boost_mode=str(spec.get("boost_mode", "multiply")),
            k=k,
            field=f_,
        )
    if kind == "script_score":
        # {"script_score": {"query": {"match": ...}, "script":
        #  {"source": "<painless arithmetic subset>"}}} — the script
        # replaces the inner score (query/script.py compiles it to a
        # whitelisted vectorized numpy expression)
        ik, ispec = _one(spec["query"], "script_score.query")
        if ik != "match":
            raise ValueError("script_score supports a 'match' inner query")
        ifield, ibody = _field_query(ispec)
        script = spec.get("script") or {}
        return r.search_script_score(
            str(ibody.get("query", "")),
            str(script.get("source", "")),
            k=k,
            field=None if ifield == r.primary_field else ifield,
        )
    if kind == "dis_max":
        # generic compound: per-doc score = best sub-clause score +
        # tie_breaker * (sum of the others). Sub-clauses are evaluated
        # over their FULL match sets (k = n_docs) so combining never
        # misses a doc one clause ranks low — same contract as the
        # engine's field-level search_dismax.
        tb = float(spec.get("tie_breaker", 0.0))
        best: dict[int, float] = {}
        tot: dict[int, float] = {}
        for sub in spec["queries"]:
            sk, sspec = _one(sub, "dis_max.queries")
            for d, s in _scored_hits(r, sk, sspec, r.n_docs):
                if s > best.get(d, float("-inf")):
                    best[d] = s
                tot[d] = tot.get(d, 0.0) + s
        scored = [(d, best[d] + tb * (tot[d] - best[d])) for d in best]
        scored.sort(key=lambda t: (-t[1], t[0]))
        return scored[:k]
    if kind == "boosting":
        # demote-not-exclude: positive hits keep their score unless the
        # doc also matches the negative clause, then score *= negative_boost
        pk, pspec = _one(spec["positive"], "boosting.positive")
        nk, nspec = _one(spec["negative"], "boosting.negative")
        nb = float(spec.get("negative_boost", 0.5))
        pos = _scored_hits(r, pk, pspec, r.n_docs)
        neg = {int(d) for d in _match_docs(r, nk, nspec)}
        hits = [(d, s * nb if d in neg else s) for d, s in pos]
        hits.sort(key=lambda t: (-t[1], t[0]))
        return hits[:k]
    if kind == "query_string":
        from .querystring import query_string_hits

        return query_string_hits(r, spec, k)
    if kind == "simple_query_string":
        # supported syntax subset: bare terms, -negation, "quoted
        # phrases", default_operator and|or. The grouping / boolean /
        # wildcard / fuzzy operators raise loudly rather than being
        # silently dropped (OpenSearch would *ignore* invalid syntax;
        # we refuse instead). Score = sum of clause scores over the
        # combined doc set (union for or, intersection for and) —
        # OpenSearch's sum-of-subscores semantics.
        import re as _re

        q = str(spec["query"])
        default_op = str(spec.get("default_operator", "or")).lower()
        flds = list(spec.get("fields") or [r.primary_field])
        fld = flds[0]
        f = None if fld == r.primary_field else fld
        for ch in "(|)*~+":
            if ch in q:
                raise ValueError(
                    f"unsupported simple_query_string operator {ch!r}"
                )
        phrases: list[str] = []
        terms: list[str] = []
        neg_terms: list[str] = []
        for tok in _re.findall(r'-?"[^"]*"|\S+', q):
            negated = tok.startswith("-")
            body_t = tok[1:] if negated else tok
            if body_t.startswith('"') and body_t.endswith('"') and len(body_t) >= 2:
                if negated:
                    raise ValueError("negated phrases are not supported")
                phrases.append(body_t[1:-1])
            elif negated:
                neg_terms.append(body_t)
            else:
                terms.append(body_t)
        if len(flds) > 1 and (phrases or default_op == "and"):
            raise ValueError(
                "multi-field simple_query_string supports or-mode bare "
                "terms (most_fields sum); phrases and and-mode are "
                "single-field"
            )
        clause_hits: list[dict[int, float]] = []
        if terms:
            text = " ".join(terms)
            if len(flds) > 1:
                # cross-field = most_fields: per-field BM25 summed
                hits = r.search_multi(text, flds, k=r.n_docs)
            elif default_op == "and":
                hits = r.search_bool(must=text, k=r.n_docs, field=f)
            else:
                hits = r.search_pruned(text, r.n_docs, field=f)
            clause_hits.append(dict(hits))
        for ph in phrases:
            clause_hits.append(dict(r.search_phrase(ph, r.n_docs, field=f)))
        if not clause_hits:
            raise ValueError(
                "simple_query_string needs at least one positive clause"
            )
        docs = set(clause_hits[0])
        for extra in clause_hits[1:]:
            docs = docs & set(extra) if default_op == "and" else docs | set(extra)
        if neg_terms:
            nd: set[int] = set()
            for nf in flds:
                nd |= {
                    int(d)
                    for d in _match_docs(r, "match", {nf: " ".join(neg_terms)})
                }
            docs -= nd
        out = []
        for d in docs:
            sc = clause_hits[0].get(d, 0.0)
            for extra in clause_hits[1:]:
                sc += extra.get(d, 0.0)
            out.append((d, sc))
        out.sort(key=lambda t: (-t[1], t[0]))
        return out[:k]
    if kind == "multi_match":
        # best_fields (the OpenSearch default) = dis_max over per-field
        # match queries; most_fields = per-field score sum
        q = str(spec["query"])
        fields = list(spec["fields"])
        mtype = spec.get("type", "best_fields")
        if mtype == "best_fields":
            return r.search_dismax(
                q, fields, tie_breaker=float(spec.get("tie_breaker", 0.0)), k=k
            )
        if mtype == "most_fields":
            return r.search_multi(q, fields, k=k)
        if mtype == "bool_prefix":
            # the search-as-you-type query shape: match_bool_prefix per
            # field, per-field scores summed
            return r.search_bool_prefix_multi(q, fields, k=k)
        if mtype in ("phrase", "phrase_prefix"):
            # OpenSearch: a match_phrase(_prefix) per field combined
            # best_fields — compose through the existing dis_max
            # evaluator (full match sets per clause)
            inner = "match_phrase" if mtype == "phrase" else "match_phrase_prefix"
            sub = {
                "queries": [{inner: {fl: {"query": q}}} for fl in fields],
                "tie_breaker": float(spec.get("tie_breaker", 0.0)),
            }
            if mtype == "phrase" and "slop" in spec:
                for c in sub["queries"]:
                    c[inner][next(iter(c[inner]))]["slop"] = int(spec["slop"])
            return _scored_hits(r, "dis_max", sub, k)
        raise ValueError(f"unsupported multi_match type {mtype!r}")
    if kind in (
        "span_near", "span_first", "span_or",
        "span_not", "span_within", "span_containing",
    ):
        # span queries: constant-score rewrite (multi-key specs never
        # reach _field_query)
        ids = _match_docs(r, kind, spec)
        return [(int(d), 1.0) for d in ids[:k]]
    if kind == "combined_fields":
        return r.search_combined(
            str(spec["query"]), _parse_boost_fields(spec["fields"]), k
        )
    if kind == "synonym":
        sfield, variants = _one(spec, "synonym")
        return r.search_synonym(
            [str(v) for v in variants],
            k,
            None if sfield == r.primary_field else sfield,
        )
    field, body = _field_query(spec)
    q = str(body.get("query", body.get("value", "")))
    f = None if field == r.primary_field else field
    boost = float(body.get("boost", 1.0))
    if kind == "match":
        op = str(body.get("operator", "or")).lower()
        msm = body.get("minimum_should_match")
        if op == "and":
            # all analyzed terms required: the bool-must evaluator IS
            # that semantics (same BM25 sum, candidates = AND set)
            hits = r.search_bool(must=q, k=k, field=f)
        elif msm is not None:
            hits = r.search_bool(
                should=q, minimum_should_match=int(msm), k=k, field=f
            )
        else:
            hits = r.search_pruned(q, k, field=f)
        # per-clause boost scales the clause's final score (one multiply
        # on the already-combined sum, applied identically everywhere
        # this clause's score is consumed)
        return [(d, s * boost) for d, s in hits] if boost != 1.0 else hits
    if kind == "match_phrase":
        hits = r.search_phrase(q, k, field=f, slop=int(body.get("slop", 0)))
        return [(d, s * boost) for d, s in hits] if boost != 1.0 else hits
    if kind == "match_bool_prefix":
        hits = r.match_bool_prefix(q, k, field=f)
        return [(d, s * boost) for d, s in hits] if boost != 1.0 else hits
    if kind == "terms_set":
        # scores like bool-should with minimum_should_match (the
        # OpenSearch semantics: BM25 sum over the matched terms)
        terms = [str(t) for t in body["terms"]]
        hits = r.search_bool(
            should=" ".join(terms),
            minimum_should_match=_terms_set_min(body, len(terms)),
            k=k,
            field=f,
        )
        return [(d, s * boost) for d, s in hits] if boost != 1.0 else hits
    # multi-term queries score constant 1.0 (OpenSearch constant-score
    # rewrite); rank = doc_id asc for determinism
    ids = _match_docs(r, kind, spec)
    return [(int(d), 1.0) for d in ids[:k]]


def _bool_hits(r: IndexReader, spec: dict, k: int) -> list[tuple[int, float]]:
    def _texts(clauses, want_kind):
        out = []
        for c in clauses if isinstance(clauses, list) else [clauses]:
            ck, cs = _one(c, "bool clause")
            if ck != want_kind:
                raise ValueError(
                    f"bool supports only '{want_kind}' subclauses natively; "
                    f"got {ck!r} (compose via filter/must_not doc sets instead)"
                )
            _, body = _field_query(cs)
            if "boost" in body:
                raise ValueError(
                    "per-clause boost inside bool is not supported (bool "
                    "clauses share one BM25 pass); boost a top-level match "
                    "instead"
                )
            out.append(str(body.get("query", body.get("value", ""))))
        return " ".join(out)

    must = _texts(spec.get("must", []), "match") if spec.get("must") else ""
    should = _texts(spec.get("should", []), "match") if spec.get("should") else ""
    must_not = (
        _texts(spec.get("must_not", []), "match") if spec.get("must_not") else ""
    )
    filt = None
    fdocs = None
    if spec.get("filter"):
        fcs = spec["filter"]
        sets = []
        for fc in fcs if isinstance(fcs, list) else [fcs]:
            fk, fs = _one(fc, "filter")
            if fk == "term" and filt is None:
                # first term filter takes the fast keyword-postings path
                ffield, fbody = _field_query(fs)
                filt = (ffield, str(fbody.get("query", fbody.get("value", ""))))
            else:
                # range / terms / exists / ids (and extra term filters):
                # sorted doc-id sets, ANDed together
                sets.append(_match_docs(r, fk, fs))
        if sets:
            fdocs = sets[0]
            for s in sets[1:]:
                fdocs = fdocs[np.isin(fdocs, s, assume_unique=True)]
    if not must and not should and not must_not and (
        fdocs is not None or filt is not None
    ):
        # filter-only bool: the filter set itself, score 0.0 (filter
        # context contributes no score in OpenSearch), doc_id order
        if filt is not None:
            tset = r.term_docs(*filt)
            fdocs = (
                tset
                if fdocs is None
                else fdocs[np.isin(fdocs, tset, assume_unique=True)]
            )
        return [(int(d), 0.0) for d in fdocs[:k]]
    return r.search_bool(
        must=must,
        should=should,
        must_not=must_not,
        filter_term=filt,
        minimum_should_match=spec.get("minimum_should_match"),
        k=k,
        filter_docs=fdocs,
    )


_METRIC_SUBAGGS = ("sum", "avg", "min", "max", "value_count", "stats")

_SIBLING_PIPELINE = (
    "max_bucket",
    "min_bucket",
    "sum_bucket",
    "avg_bucket",
    "stats_bucket",
    "extended_stats_bucket",
    "percentiles_bucket",
)


def _bucket_metric(bucket: dict, path: str) -> float:
    """Resolve a pipeline ``buckets_path`` inside one bucket:
    ``_count`` = doc_count, otherwise a dotted walk into sub-agg
    results (a sub-agg dict resolves to its ``value``)."""
    if path in ("_count", "doc_count", ""):
        return float(bucket["doc_count"])
    cur: Any = bucket
    for part in path.replace(">", ".").split("."):
        cur = cur[part]
    return float(cur["value"] if isinstance(cur, dict) else cur)


def _apply_parent_pipelines(result: dict, sub_aggs: dict) -> None:
    """Parent pipeline aggregations (OpenSearch ``cumulative_sum`` /
    ``derivative`` / ``bucket_sort`` declared under a histogram-family
    parent's ``aggs``): pure post-processing over the parent's bucket
    list, evaluated in declaration order. Driver-side by design — the
    bucket list is already the small aggregated result."""
    buckets = result.get("buckets")
    if not isinstance(buckets, list):
        raise ValueError("pipeline sub-aggs need a bucket-list parent")
    for sname, sub in sub_aggs.items():
        skind, sspec = _one(sub, f"sub-agg {sname}")
        path = str(sspec.get("buckets_path", "_count"))
        if skind == "cumulative_sum":
            total = 0.0
            for b in buckets:
                total += _bucket_metric(b, path)
                b[sname] = {"value": total}
        elif skind == "derivative":
            prev: float | None = None
            for b in buckets:
                v = _bucket_metric(b, path)
                if prev is not None:
                    b[sname] = {"value": v - prev}
                prev = v
        elif skind == "bucket_sort":
            sorts = sspec.get("sort", [])
            for s in reversed(sorts):  # stable sort per key, last wins least
                sk, sv = _one(s, "bucket_sort.sort")
                desc = str(sv.get("order", "asc")) == "desc"
                buckets.sort(key=lambda b: _bucket_metric(b, sk), reverse=desc)
            frm = int(sspec.get("from", 0))
            size = sspec.get("size")
            end = None if size is None else frm + int(size)
            result["buckets"] = buckets = buckets[frm:end]
        elif skind in ("bucket_script", "bucket_selector"):
            # buckets_path is a {param: path} map; the script sees each
            # param as a float64 array across the whole bucket list
            from .script import compile_bucket_script

            paths = sspec["buckets_path"]
            if not isinstance(paths, dict):
                raise ValueError(f"{skind}.buckets_path must be a map")
            compiled = compile_bucket_script(_script_source(sspec))
            missing = [p for p in compiled.params if p not in paths]
            if missing:
                raise ValueError(
                    f"{skind} script reads params absent from "
                    f"buckets_path: {missing}"
                )
            vals = {
                p: np.array(
                    [_bucket_metric(b, str(paths[p])) for b in buckets],
                    dtype=np.float64,
                )
                for p in compiled.params
            }
            out_v = compiled(vals) if buckets else np.empty(0)
            if skind == "bucket_script":
                for b, v in zip(buckets, out_v):
                    b[sname] = {"value": float(v)}
            else:
                result["buckets"] = buckets = [
                    b for b, keep in zip(buckets, out_v) if bool(keep)
                ]
        elif skind == "serial_diff":
            lag = int(sspec.get("lag", 1))
            if lag < 1:
                raise ValueError("serial_diff.lag must be >= 1")
            vs = [_bucket_metric(b, path) for b in buckets]
            for i in range(lag, len(buckets)):
                buckets[i][sname] = {"value": vs[i] - vs[i - lag]}
        elif skind == "moving_fn":
            # window = the `window` buckets before the current one,
            # shifted right by `shift` (OpenSearch: shift=0 excludes
            # the current bucket); empty windows yield null
            window = int(sspec["window"])
            shift = int(sspec.get("shift", 0))
            fn = _moving_fn(_script_source(sspec))
            vs = [_bucket_metric(b, path) for b in buckets]
            for i in range(len(buckets)):
                lo = max(0, i - window + shift)
                hi = min(len(vs), i + shift)
                win = vs[lo:hi]
                buckets[i][sname] = {"value": fn(win) if win else None}
        elif skind == "normalize":
            method = str(sspec.get("method", ""))
            vs = np.array(
                [_bucket_metric(b, path) for b in buckets], dtype=np.float64
            )
            out_v = _normalize_values(vs, method) if len(vs) else vs
            for b, v in zip(buckets, out_v):
                b[sname] = {"value": float(v)}
        elif skind == "moving_percentiles":
            # EXACT variant: linear-interpolation percentiles of the
            # raw metric values in the moving window (OpenSearch
            # merges the t-digest sketches of a percentiles sub-agg;
            # the exact form is SQL-oracle-able via windowed
            # quantile_cont). Window semantics match moving_fn:
            # ``window`` buckets before the current one, shifted
            # right by ``shift`` (shift=1 == the SQL frame
            # ``ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW``).
            window = int(sspec["window"])
            shift = int(sspec.get("shift", 0))
            pcts = tuple(
                sspec.get("percents", (1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0))
            )
            vs = [_bucket_metric(b, path) for b in buckets]
            for i in range(len(buckets)):
                lo = max(0, i - window + shift)
                hi = min(len(vs), i + shift)
                win = np.asarray(vs[lo:hi], dtype=np.float64)
                buckets[i][sname] = {
                    "values": {
                        str(float(p)): (
                            float(np.percentile(win, p)) if win.size else None
                        )
                        for p in pcts
                    }
                }
        else:
            raise ValueError(
                f"unsupported parent pipeline agg {skind!r} (supported: "
                "cumulative_sum, derivative, bucket_sort, bucket_script, "
                "bucket_selector, serial_diff, moving_fn, normalize, "
                "moving_percentiles)"
            )


def _fill_empty_buckets(rows, interval, aspec: dict):
    """OpenSearch histogram gap semantics: with ``min_doc_count: 0``
    every interval between the first and last occupied bucket (widened
    by ``extended_bounds`` when given) appears with doc_count 0; with
    the default min_doc_count 1, buckets below the threshold drop."""
    mdc = int(aspec.get("min_doc_count", 1))
    if mdc > 0:
        return [(b, c) for b, c in rows if c >= mdc] if mdc > 1 else rows
    eb = aspec.get("extended_bounds") or {}
    keys = [b for b, _ in rows]
    lo_candidates = keys[:1] + (
        [type(interval)(eb["min"])] if "min" in eb else []
    )
    hi_candidates = keys[-1:] + (
        [type(interval)(eb["max"])] if "max" in eb else []
    )
    if not lo_candidates or not hi_candidates:
        return rows
    lo = min(lo_candidates)
    hi = max(hi_candidates)
    lo = type(interval)(np.floor(lo / interval) * interval)
    hi = type(interval)(np.floor(hi / interval) * interval)
    have = dict(rows)
    out = []
    b = lo
    while b <= hi:
        out.append((b, have.get(b, 0)))
        b = type(interval)(b + interval)
    return out


def _script_source(spec: dict) -> str:
    s = spec.get("script", "")
    if isinstance(s, dict):
        s = s.get("source", "")
    return str(s)


_MOVING_FNS = {
    "max": max,
    "min": min,
    "sum": lambda w: float(sum(w)),
    "unweightedAvg": lambda w: float(sum(w)) / len(w),
    "stdDev": None,  # handled below (takes the window mean)
}

_MOVING_FN_RE = re.compile(
    r"^\s*MovingFunctions\.([A-Za-z]+)\s*\(\s*values\s*"
    r"(?:,\s*MovingFunctions\.unweightedAvg\s*\(\s*values\s*\)\s*)?\)\s*$"
)


def _moving_fn(source: str):
    """``moving_fn`` scripts: the OpenSearch ``MovingFunctions``
    built-ins over the whole window (``max/min/sum/unweightedAvg``,
    plus ``stdDev(values, unweightedAvg(values))`` — population)."""
    m = _MOVING_FN_RE.match(source)
    if not m or m.group(1) not in _MOVING_FNS:
        raise ValueError(
            f"unsupported moving_fn script {source!r} (supported: "
            "MovingFunctions.max/min/sum/unweightedAvg/stdDev over values)"
        )
    kind = m.group(1)
    if kind == "stdDev":
        def _std(w):
            mu = sum(w) / len(w)
            return float(np.sqrt(sum((x - mu) ** 2 for x in w) / len(w)))
        return _std
    return _MOVING_FNS[kind]


def _normalize_values(vs: np.ndarray, method: str) -> np.ndarray:
    """``normalize`` pipeline methods (OpenSearch names; population
    std-dev for z-score; a zero-span range yields 0s, a zero sum
    yields 0s — pinned so the SQL oracle can reproduce exactly)."""
    span = vs.max() - vs.min()
    if method == "rescale_0_1":
        return (vs - vs.min()) / span if span else np.zeros_like(vs)
    if method == "rescale_0_100":
        return (vs - vs.min()) * 100.0 / span if span else np.zeros_like(vs)
    if method == "percent_of_sum":
        t = vs.sum()
        return vs / t if t else np.zeros_like(vs)
    if method == "mean":
        return (vs - vs.mean()) / span if span else np.zeros_like(vs)
    if method == "z-score":
        sd = float(np.sqrt(((vs - vs.mean()) ** 2).mean()))
        return (vs - vs.mean()) / sd if sd else np.zeros_like(vs)
    if method == "softmax":
        e = np.exp(vs)
        return e / e.sum()
    raise ValueError(
        f"unsupported normalize method {method!r} (supported: rescale_0_1, "
        "rescale_0_100, percent_of_sum, mean, z-score, softmax)"
    )


def _sibling_pipeline(out: dict, name: str, akind: str, aspec: dict) -> None:
    """Sibling pipeline aggregations (``max_bucket`` family): reduce a
    previously-computed bucket agg referenced by ``buckets_path``
    (``parent>metric``)."""
    parent, _, metric = str(aspec["buckets_path"]).partition(">")
    if parent not in out:
        raise ValueError(f"buckets_path references unknown agg {parent!r}")
    buckets = out[parent]["buckets"]
    vals = [_bucket_metric(b, metric) for b in buckets]
    if akind == "sum_bucket":
        out[name] = {"value": float(sum(vals))}
    elif akind == "avg_bucket":
        out[name] = {"value": (float(sum(vals)) / len(vals)) if vals else None}
    elif akind in ("stats_bucket", "extended_stats_bucket"):
        n = len(vals)
        stats = {
            "count": n,
            "min": min(vals) if vals else None,
            "max": max(vals) if vals else None,
            "avg": (float(sum(vals)) / n) if vals else None,
            "sum": float(sum(vals)),
        }
        if akind == "extended_stats_bucket" and vals:
            ss = float(sum(v * v for v in vals))
            var = ss / n - stats["avg"] ** 2  # population variance
            stats["sum_of_squares"] = ss
            stats["variance"] = var
            stats["std_deviation"] = float(np.sqrt(max(var, 0.0)))
        out[name] = stats
    elif akind == "percentiles_bucket":
        # nearest-rank: sorted[round(p/100 * (n-1))], round-half-up —
        # pinned so the SQL oracle reproduces it with pure arithmetic
        percents = [float(p) for p in aspec.get(
            "percents", (1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0)
        )]
        sv = sorted(vals)
        values = {}
        for p in percents:
            if not sv:
                values[f"{p:g}"] = None
            else:
                idx = int(np.floor(p / 100.0 * (len(sv) - 1) + 0.5))
                values[f"{p:g}"] = sv[idx]
        out[name] = {"values": values}
    else:
        if not vals:
            out[name] = {"value": None, "keys": []}
            return
        best = max(vals) if akind == "max_bucket" else min(vals)
        out[name] = {
            "value": float(best),
            "keys": [str(b.get("key")) for b, v in zip(buckets, vals) if v == best],
        }


def _compile_runtime(body: dict) -> dict:
    """``runtime_mappings``: script-computed numeric doc values
    (whitelisted painless subset — ``doc['f'].value`` + arithmetic),
    usable in field sorts and metric aggregations."""
    out = {}
    for fname, m in (body.get("runtime_mappings") or {}).items():
        if str(m.get("type", "double")) not in ("double", "long"):
            raise ValueError("runtime fields support double/long types")
        from .script import compile_script

        src = m.get("script", {})
        src = src.get("source", "") if isinstance(src, dict) else str(src)
        out[str(fname)] = compile_script(str(src))
    return out


def _aggregations(
    r: IndexReader, query_kind, query_spec, aggs: dict, runtime=None
) -> dict:
    """Each agg runs over the query's match text when the query is a
    plain match (the engine aggs re-derive the candidate union);
    other query kinds aggregate over their doc set via doc-value
    gathers."""
    out: dict[str, Any] = {}
    if query_kind == "match":
        field, body = _field_query(query_spec)
        qtext = str(body.get("query", body.get("value", "")))
        f = None if field == r.primary_field else field
    elif query_kind == "_global" or query_kind == "match_all":
        # the `global` agg context / an explicit match_all query:
        # every live doc
        qtext, f, field = None, None, None
    else:
        # any other query kind: evaluate it once in filter context and
        # hand every aggregation the resulting ordinal set through the
        # _match_ordinals funnel (scores are never needed by aggs —
        # except top_hits, which requires a scoring query and is
        # guarded at its branch)
        qtext = r.ordinals_of_ids(_docs_of(r, query_kind, query_spec))
        f, field = None, None
    deferred: list[tuple[str, str, dict]] = []
    for name, agg in aggs.items():
        sub_aggs = None
        if (
            isinstance(agg, dict)
            and "aggs" in agg
            and "terms" not in agg
            and "composite" not in agg
            and "nested" not in agg
        ):
            # histogram-family parent with pipeline sub-aggs
            agg = {k: v for k, v in agg.items() if k != "aggs"}
            sub_aggs = aggs[name]["aggs"]
        if (
            isinstance(agg, dict)
            and len(agg) == 1
            and next(iter(agg)) in _SIBLING_PIPELINE
        ):
            kind = next(iter(agg))
            deferred.append((name, kind, agg[kind]))
            continue
        if isinstance(agg, dict) and "nested" in agg and "aggs" in agg:
            # nested agg: step INTO the nested docs (child rows of the
            # path's relation), bucket them by a keyword, and step back
            # out per bucket via reverse_nested (distinct-parent
            # counts). One engine pass: facet_child_terms.
            path = str(agg["nested"]["path"])
            sub_name, sub = _one(agg["aggs"], f"nested agg {name}.aggs")
            if "terms" not in sub:
                raise ValueError("nested agg supports a terms sub-agg")
            rn_name = None
            if "aggs" in sub:
                rn_name, rn = _one(sub["aggs"], f"nested terms {sub_name}.aggs")
                if not (isinstance(rn, dict) and "reverse_nested" in rn):
                    raise ValueError(
                        "nested terms sub-agg supports reverse_nested"
                    )
            rows = r.facet_child_terms(str(sub["terms"]["field"]), path)
            buckets = []
            for g, n_c, n_p in rows:
                b: dict[str, Any] = {"key": g, "doc_count": n_c}
                if rn_name is not None:
                    b[rn_name] = {"doc_count": n_p}
                buckets.append(b)
            out[name] = {
                "doc_count": int(sum(n for _, n, _ in rows)),
                sub_name: {"buckets": buckets},
            }
            continue
        if isinstance(agg, dict) and "terms" in agg and "aggs" in agg:
            # terms bucket agg with a top_hits or stats sub-agg
            sub_name, sub = _one(agg["aggs"], f"agg {name}.aggs")
            if "parent" in sub:
                # join-field `parent` agg: buckets over a CHILD keyword,
                # each stepping to its distinct parents (same engine
                # pass as nested/reverse_nested)
                ct = str(sub["parent"]["type"])
                rows = r.facet_child_terms(str(agg["terms"]["field"]), ct)
                out[name] = {
                    "buckets": [
                        {
                            "key": g,
                            "doc_count": n_c,
                            sub_name: {"doc_count": n_p},
                        }
                        for g, n_c, n_p in rows
                    ]
                }
                continue
            if "children" in sub:
                # the `children` agg: per parent-terms bucket, step to
                # that bucket's CHILD docs and aggregate a numeric
                # child doc-value (one engine pass computes every
                # bucket — facet_children_stats)
                ct = str(sub["children"]["type"])
                mname, mspec = _one(sub["aggs"], f"children {sub_name}.aggs")
                mk, mbody = _one(mspec, f"children metric {mname}")
                if mk not in ("sum", "avg", "min", "max", "value_count", "stats"):
                    raise ValueError(
                        "children sub-agg supports a single numeric metric"
                    )
                rows = r.facet_children_stats(
                    str(agg["terms"]["field"]), str(mbody.get("field", "doc_id")), ct
                )
                buckets = []
                for g, n_p, n_c, mn, mx, sm, av in sorted(rows):
                    metric: dict[str, Any]
                    if mk == "stats":
                        metric = {
                            "count": n_c, "min": mn, "max": mx,
                            "sum": sm, "avg": av,
                        }
                    else:
                        v = {"sum": sm, "avg": av, "min": mn, "max": mx,
                             "value_count": float(n_c)}[mk]
                        metric = {"value": v}
                    buckets.append(
                        {
                            "key": g,
                            "doc_count": n_p,
                            sub_name: {"doc_count": n_c, mname: metric},
                        }
                    )
                out[name] = {"buckets": buckets}
                continue
            if "top_hits" in sub:
                if not isinstance(qtext, (str, type(None))):
                    raise ValueError(
                        "top_hits needs a scoring (match) query"
                    )
                rows = r.facet_top_hits(
                    qtext,
                    agg["terms"]["field"],
                    per_group_k=int(sub["top_hits"].get("size", 3)),
                    field=f,
                )
                buckets: dict[str, dict] = {}
                for g, rank, did, score in rows:
                    b = buckets.setdefault(
                        str(g), {"key": g, sub_name: {"hits": {"hits": []}}}
                    )
                    b[sub_name]["hits"]["hits"].append(
                        {"_id": did, "_score": score}
                    )
                out[name] = {"buckets": list(buckets.values())}
            elif "stats" in sub:
                srows = r.facet_terms_stats(
                    qtext,
                    agg["terms"]["field"],
                    sub["stats"]["field"],
                    field=f,
                )
                out[name] = {
                    "buckets": [
                        {
                            "key": key,
                            "doc_count": n,
                            sub_name: {
                                "count": n, "min": mn, "max": mx,
                                "sum": sm, "avg": av,
                            },
                        }
                        for key, n, mn, mx, sm, av in srows
                    ]
                }
            elif set(sub) & {"sum", "avg", "min", "max"}:
                # single-metric sub-agg; supports ordering the parent's
                # buckets by it: order {"<sub_name>": "desc"} — metric
                # computed for EVERY bucket (facet_terms_stats computes
                # all groups in one pass), then sort + size cut
                mk, mspec = _one(sub, f"sub-agg {sub_name}")
                srows = r.facet_terms_stats(
                    qtext, agg["terms"]["field"], mspec["field"], field=f
                )
                proj = {"min": 2, "max": 3, "sum": 4, "avg": 5}[mk]
                rows2 = [(row[0], row[1], float(row[proj])) for row in srows]
                okey, asc = "_count", False
                if "order" in agg["terms"]:
                    okey, odir = _one(agg["terms"]["order"], "terms.order")
                    asc = str(odir) == "asc"
                if okey == sub_name:
                    rows2.sort(
                        key=lambda t: ((t[2] if asc else -t[2]), t[0])
                    )
                elif okey == "_key":
                    rows2.sort(key=lambda t: t[0], reverse=not asc)
                else:  # _count (ties on key asc in both directions)
                    rows2.sort(
                        key=lambda t: ((t[1] if asc else -t[1]), t[0])
                    )
                mdc = int(agg["terms"].get("min_doc_count", 1))
                rows2 = [t for t in rows2 if t[1] >= mdc]
                rows2 = rows2[: int(agg["terms"].get("size", 10))]
                out[name] = {
                    "buckets": [
                        {"key": key, "doc_count": n, sub_name: {"value": v}}
                        for key, n, v in rows2
                    ]
                }
            else:
                raise ValueError(
                    "nested sub-aggs support 'top_hits', 'stats' and "
                    "single-metric (sum/avg/min/max) kinds"
                )
            continue
        if isinstance(agg, dict) and "composite" in agg:
            # multi-source composite: compound keys in lexicographic
            # source order, after-key cursor pagination, dict keys —
            # the OpenSearch export idiom for cross-product buckets
            comp = agg["composite"]
            srcs = comp.get("sources", [])
            if not srcs:
                raise ValueError("composite requires at least one source")
            parsed: list[tuple[str, str, dict]] = []
            for s in srcs:
                sname, sspec = _one(s, "composite source")
                skind, sbody = _one(sspec, "composite source body")
                if skind not in ("terms", "histogram"):
                    raise ValueError(
                        "composite supports terms and histogram sources"
                    )
                parsed.append((sname, skind, sbody))
            after = comp.get("after")
            after_t = None
            if after is not None:
                after_t = tuple(
                    (str(after[sn]) if sk == "terms" else float(after[sn]))
                    for sn, sk, _ in parsed
                )
            rows = r.facet_composite_multi(
                qtext,
                parsed,
                size=int(comp.get("size", 10)),
                after=after_t,
                field=f,
            )
            names_ = [sn for sn, _, _ in parsed]
            out[name] = {
                "buckets": [
                    {"key": dict(zip(names_, k)), "doc_count": c}
                    for k, c in rows
                ],
                "after_key": dict(zip(names_, rows[-1][0])) if rows else None,
            }
            continue
        akind, aspec = _one(agg, f"agg {name}")
        if akind == "global":
            # bucket over EVERY live doc regardless of the query;
            # sub-aggs re-run in the all-docs context
            out[name] = {
                "doc_count": int(r._all_ordinals().size),
                **_aggregations(r, "_global", None, sub_aggs or {}),
            }
            continue
        if akind == "adjacency_matrix":
            # named filter doc sets; buckets for each filter AND each
            # intersecting pair "a&b" (a < b), zero-count buckets
            # omitted — OpenSearch semantics. Set algebra over sorted
            # id arrays, all intersected with the query's match set.
            qdocs = _match_docs(r, query_kind, query_spec)
            sets = {
                fname: np.intersect1d(
                    qdocs,
                    _match_docs(r, *_one(fc, f"adjacency.{fname}")),
                    assume_unique=True,
                )
                for fname, fc in aspec["filters"].items()
            }
            buckets = []
            for fname in sorted(sets):
                if sets[fname].size:
                    buckets.append(
                        {"key": fname, "doc_count": int(sets[fname].size)}
                    )
            names_sorted = sorted(sets)
            for i, a in enumerate(names_sorted):
                for b in names_sorted[i + 1:]:
                    inter = np.intersect1d(
                        sets[a], sets[b], assume_unique=True
                    ).size
                    if inter:
                        buckets.append(
                            {"key": f"{a}&{b}", "doc_count": int(inter)}
                        )
            out[name] = {"buckets": buckets}
            continue
        if akind == "date_range":
            # like `range` but bounds are epoch-ms over a timestamp
            # doc-value (half-open [from, to), open ends allowed)
            vals_field = aspec["field"]
            ranges = [
                (rg.get("from"), rg.get("to")) for rg in aspec["ranges"]
            ]
            rows = r.facet_date_ranges(qtext, vals_field, ranges, field=f)
            out[name] = {
                "buckets": [
                    {"from": lo, "to": hi, "doc_count": c}
                    for lo, hi, c in rows
                ]
            }
            continue
        if akind == "filter":
            # single filter bucket: the query's match set intersected
            # with the filter clause's doc set; metric sub-aggs run
            # over the intersection via one pruned (doc_id, field)
            # docstore scan (engine.stats_over_ids) — the
            # "filter + stats" OpenSearch idiom
            qdocs = _match_docs(r, query_kind, query_spec)
            fdocs = _match_docs(r, *_one(aspec, f"agg {name}.filter"))
            sel = np.intersect1d(qdocs, fdocs, assume_unique=True)
            res: dict[str, Any] = {"doc_count": int(sel.size)}
            for sn, s in (sub_aggs or {}).items():
                mk, mspec = _one(s, f"sub-agg {sn}")
                if mk not in (
                    "sum", "avg", "min", "max", "value_count", "stats"
                ):
                    raise ValueError(
                        "filter agg sub-aggs support the metric kinds "
                        "(sum/avg/min/max/value_count/stats)"
                    )
                st = r.stats_over_ids(sel, str(mspec["field"]))
                res[sn] = st if mk == "stats" else {
                    "value": st["count" if mk == "value_count" else mk]
                }
            out[name] = res
            continue
        if akind == "filters":
            # named filter buckets: each named clause's doc set
            # intersected with the query's own match set; other_bucket
            # counts match-set docs caught by NO named filter
            qdocs = _match_docs(r, query_kind, query_spec)
            caught = np.empty(0, dtype=qdocs.dtype)
            buckets = {}
            for fname, fc in aspec["filters"].items():
                sel = np.intersect1d(
                    qdocs,
                    _match_docs(r, *_one(fc, f"filters.{fname}")),
                    assume_unique=True,
                )
                buckets[fname] = {"doc_count": int(sel.size)}
                if aspec.get("other_bucket"):
                    caught = np.union1d(caught, sel)
            if aspec.get("other_bucket"):
                other = str(aspec.get("other_bucket_key", "_other_"))
                buckets[other] = {
                    "doc_count": int(qdocs.size - caught.size)
                }
            out[name] = {"buckets": buckets}
            continue
        if akind == "matrix_stats":
            out[name] = r.matrix_stats_agg(
                qtext, [str(fl) for fl in aspec["fields"]], field=f
            )
            continue
        if akind == "weighted_avg":
            out[name] = {
                "value": r.weighted_avg_agg(
                    qtext,
                    str(aspec["value"]["field"]),
                    str(aspec["weight"]["field"]),
                    field=f,
                )
            }
            continue
        if akind == "top_metrics":
            metrics = aspec["metrics"]
            if isinstance(metrics, list):
                if len(metrics) != 1:
                    raise ValueError("top_metrics supports one metric field")
                metrics = metrics[0]
            sfield, sdir = _one(aspec["sort"], "top_metrics.sort")
            out[name] = {
                "top": r.top_metrics_agg(
                    qtext,
                    str(metrics["field"]),
                    str(sfield),
                    descending=(sdir == "desc"),
                    size=int(aspec.get("size", 1)),
                    field=f,
                )
            }
            continue
        if akind in ("sampler", "diversified_sampler"):
            if not isinstance(qtext, (str, type(None))):
                raise ValueError(
                    f"{akind} needs a scoring (match) query"
                )
            # sub-aggs run over only the shard_size BEST-scoring docs
            # of the query (deterministic: score desc, doc_id asc) —
            # the sample is small by design, so its keyword values
            # come from one docstore point-read
            shard_size = int(aspec.get("shard_size", 100))
            if akind == "sampler":
                hits = r.search_pruned(qtext, shard_size, field=f)
                ids = np.array([d for d, _ in hits], dtype=np.uint64)
            else:
                # diversified_sampler: walk the full ranking in order,
                # keeping at most max_docs_per_value docs per distinct
                # value of the dedup field (OpenSearch's de-biased
                # sample). The walk stops as soon as the sample fills,
                # so its cost is sample-bounded except under
                # pathological single-value skew.
                dfield = str(aspec["field"])
                maxper = int(aspec.get("max_docs_per_value", 1))
                ranked = r.search_pruned(qtext, r.n_docs, field=f)
                ids_all = np.array([d for d, _ in ranked], dtype=np.uint64)
                picked: list[int] = []
                if ids_all.size:
                    tbl = r.get_docs(ids_all)
                    vmap = dict(
                        zip(
                            tbl.column("doc_id").to_pylist(),
                            (str(v) for v in tbl.column(dfield).to_pylist()),
                        )
                    )
                    per: dict[str, int] = {}
                    for d in ids_all.tolist():
                        v = vmap.get(d, "")
                        if per.get(v, 0) >= maxper:
                            continue
                        per[v] = per.get(v, 0) + 1
                        picked.append(d)
                        if len(picked) >= shard_size:
                            break
                ids = np.array(picked, dtype=np.uint64)
            sampled: dict[str, Any] = {"doc_count": int(ids.size)}
            for sn, s in (sub_aggs or {}).items():
                sk, sspec2 = _one(s, f"sub-agg {sn}")
                if sk != "terms":
                    raise ValueError("sampler supports terms sub-aggs")
                if ids.size == 0:
                    sampled[sn] = {"buckets": []}
                    continue
                tbl = r.get_docs(ids)
                vals = np.asarray(
                    [str(v) for v in tbl.column(str(sspec2["field"])).to_pylist()]
                )
                uniq, counts = np.unique(vals, return_counts=True)
                idx = np.lexsort((uniq, -counts))[: int(sspec2.get("size", 10))]
                sampled[sn] = {
                    "buckets": [
                        {"key": str(uniq[i]), "doc_count": int(counts[i])}
                        for i in idx
                    ]
                }
            out[name] = sampled
            sub_aggs = None
            continue
        if akind == "t_test":
            # two-sample test; populations named by term filters over
            # one keyword field (the a.filter / b.filter form)
            a, b = aspec["a"], aspec["b"]
            if a["field"] != b["field"]:
                raise ValueError("t_test a/b must share one value field")
            fk_a, fv_a = _one(a["filter"], "t_test.a.filter")
            fk_b, fv_b = _one(b["filter"], "t_test.b.filter")
            if fk_a != "term" or fk_b != "term":
                raise ValueError("t_test filters support 'term' clauses")
            (sf_a, sv_a), = fv_a.items()
            (sf_b, sv_b), = fv_b.items()
            if sf_a != sf_b:
                raise ValueError("t_test filters must split one keyword field")
            out[name] = r.t_test_agg(
                qtext, a["field"], sf_a, sv_a, sv_b,
                kind=aspec.get("type", "heteroscedastic"), field=f,
            )
            continue
        if akind == "multi_terms":
            flds = [str(t["field"]) for t in aspec["terms"]]
            rows = r.facet_multi_terms(
                qtext, flds, size=int(aspec.get("size", 10)), field=f
            )
            out[name] = {
                "buckets": [
                    {
                        "key": list(kt),
                        "key_as_string": "|".join(kt),
                        "doc_count": n,
                    }
                    for kt, n in rows
                ]
            }
            continue
        if akind == "scripted_metric":
            out[name] = {
                "value": r.scripted_metric_agg(
                    qtext,
                    aspec["init_script"],
                    aspec["map_script"],
                    field=f,
                )
            }
            continue
        afield = aspec["field"]
        if (
            runtime
            and afield in runtime
            and akind in ("min", "max", "avg", "sum", "value_count", "stats")
        ):
            cand = r._match_ordinals(qtext, f)
            vals = (
                r._runtime_values(cand, runtime[afield])
                if cand.size
                else np.empty(0)
            )
            n = int(vals.size)
            stats = {
                "count": n,
                "min": float(vals.min()) if n else None,
                "max": float(vals.max()) if n else None,
                "sum": float(vals.sum()),
                "avg": (float(vals.sum()) / n) if n else None,
            }
            out[name] = (
                stats
                if akind == "stats"
                else {
                    "value": stats[
                        "count" if akind == "value_count" else akind
                    ]
                }
            )
            continue
        if akind == "terms":
            okey, asc = "_count", False
            if "order" in aspec:
                okey, odir = _one(aspec["order"], "terms.order")
                asc = str(odir) == "asc"
            if okey not in ("_count", "_key"):
                raise ValueError(
                    "terms order by a sub-agg metric needs the sub-agg "
                    "declared under 'aggs' (the terms+aggs form)"
                )
            buckets = r.facet_terms(
                qtext,
                afield,
                size=int(aspec.get("size", 10)),
                field=f,
                order="key" if okey == "_key" else "count",
                ascending=asc,
                min_doc_count=int(aspec.get("min_doc_count", 1)),
            )
            out[name] = {
                "buckets": [{"key": v, "doc_count": c} for v, c in buckets]
            }
        elif akind == "range":
            ranges = [
                (rg.get("from"), rg.get("to")) for rg in aspec["ranges"]
            ]
            rows = r.facet_ranges(qtext, afield, ranges, field=f)
            out[name] = {
                "buckets": [
                    {"from": lo, "to": hi, "doc_count": c} for lo, hi, c in rows
                ]
            }
        elif akind == "ip_range":
            rows = r.facet_ip_ranges(qtext, afield, aspec["ranges"], field=f)
            out[name] = {
                "buckets": [
                    {
                        **({"from": lo} if lo is not None else {}),
                        **({"to": hi} if hi is not None else {}),
                        "key": f"{lo or '*'}-{hi or '*'}",
                        "doc_count": c,
                    }
                    for lo, hi, c in rows
                ]
            }
        elif akind == "variable_width_histogram":
            out[name] = {
                "buckets": r.variable_width_histogram_agg(
                    qtext, afield, int(aspec.get("buckets", 10)), field=f
                )
            }
        elif akind == "histogram":
            rows = r.facet_histogram(
                qtext, afield, float(aspec["interval"]), field=f
            )
            rows = _fill_empty_buckets(rows, float(aspec["interval"]), aspec)
            out[name] = {
                "buckets": [{"key": b, "doc_count": c} for b, c in rows]
            }
        elif akind == "stats":
            out[name] = r.stats_agg(qtext, afield, field=f)
        elif akind == "extended_stats":
            out[name] = r.extended_stats_agg(qtext, afield, field=f)
        elif akind == "rare_terms":
            rows = r.rare_terms_agg(
                qtext, afield,
                max_doc_count=int(aspec.get("max_doc_count", 1)),
                field=f,
            )
            out[name] = {
                "buckets": [{"key": v, "doc_count": c} for v, c in rows]
            }
        elif akind == "missing":
            out[name] = {"doc_count": r.missing_agg(qtext, afield, field=f)}
        elif akind in ("min", "max", "avg", "sum", "value_count"):
            # single-metric aggs are the stats agg projected to one key
            st = r.stats_agg(qtext, afield, field=f)
            out[name] = {
                "value": st["count" if akind == "value_count" else akind]
            }
        elif akind == "date_histogram":
            iv = aspec.get("fixed_interval_ms")
            if iv is None:
                iv = {"day": 86400000, "hour": 3600000, "minute": 60000}.get(
                    str(aspec.get("calendar_interval", ""))
                )
            if iv is None:
                raise ValueError(
                    "date_histogram needs fixed_interval_ms or a "
                    "calendar_interval of day/hour/minute"
                )
            rows = r.facet_date_histogram(qtext, afield, int(iv), field=f)
            rows = [
                (int(b), c)
                for b, c in _fill_empty_buckets(rows, int(iv), aspec)
            ]
            buckets = [{"key": b, "doc_count": c} for b, c in rows]
            if sub_aggs:
                # metric sub-aggs (the date_histogram + sum/avg
                # time-series idiom) compute inside the engine in the
                # same pass shape; pipeline sub-aggs stay driver-side
                metric_subs = {
                    sn: s
                    for sn, s in sub_aggs.items()
                    if isinstance(s, dict)
                    and len(s) == 1
                    and next(iter(s)) in _METRIC_SUBAGGS
                }
                for sn, s in metric_subs.items():
                    mk, mspec = _one(s, f"sub-agg {sn}")
                    srows = r.facet_date_histogram_stats(
                        qtext, afield, int(iv), mspec["field"], field=f
                    )
                    per = {b: (n, mn, mx, sm) for b, n, mn, mx, sm in srows}
                    for bkt in buckets:
                        # gap-filled empty buckets carry zero metrics
                        n, mn, mx, sm = per.get(
                            bkt["key"], (0, None, None, 0)
                        )
                        if n == 0:
                            bkt[sn] = (
                                {
                                    "count": 0,
                                    "min": None,
                                    "max": None,
                                    "sum": 0,
                                    "avg": None,
                                }
                                if mk == "stats"
                                else {
                                    "value": 0
                                    if mk in ("sum", "value_count")
                                    else None
                                }
                            )
                            continue
                        if mk == "stats":
                            bkt[sn] = {
                                "count": n,
                                "min": mn,
                                "max": mx,
                                "sum": sm,
                                "avg": float(sm) / n,
                            }
                        elif mk == "value_count":
                            bkt[sn] = {"value": n}
                        elif mk == "avg":
                            bkt[sn] = {"value": float(sm) / n}
                        else:
                            bkt[sn] = {
                                "value": {"sum": sm, "min": mn, "max": mx}[mk]
                            }
                sub_aggs = {
                    sn: s for sn, s in sub_aggs.items() if sn not in metric_subs
                }
                # rate sub-agg: per-bucket doc_count (or field sum)
                # re-expressed per time unit — value * unit_ms /
                # interval_ms with an integer numerator, so the
                # division is one exact-operand float op (oracle-
                # reproducible). Default unit = the histogram's own
                # interval (factor 1), OpenSearch semantics.
                rate_subs = {
                    sn: s["rate"]
                    for sn, s in sub_aggs.items()
                    if isinstance(s, dict) and len(s) == 1 and "rate" in s
                }
                for sn, rspec in rate_subs.items():
                    unit = rspec.get("unit")
                    unit_ms = (
                        int(iv)
                        if unit is None
                        else {
                            "second": 1000,
                            "minute": 60000,
                            "hour": 3600000,
                            "day": 86400000,
                            "week": 604800000,
                        }[str(unit)]
                    )
                    if "field" in rspec:
                        srows = r.facet_date_histogram_stats(
                            qtext, afield, int(iv), rspec["field"], field=f
                        )
                        per = {b: sm for b, _n, _mn, _mx, sm in srows}
                        for bkt in buckets:
                            v = per.get(bkt["key"], 0)
                            bkt[sn] = {"value": float(v * unit_ms) / float(iv)}
                    else:
                        for bkt in buckets:
                            bkt[sn] = {
                                "value": float(bkt["doc_count"] * unit_ms)
                                / float(iv)
                            }
                # exact cardinality sub-agg + the cumulative_cardinality
                # pipeline referencing it — one engine pass computes
                # both; gap-filled empty buckets carry the cumulative
                # value forward (no new distincts in an empty bucket)
                card_subs = {
                    sn: s["cardinality"]["field"]
                    for sn, s in sub_aggs.items()
                    if isinstance(s, dict)
                    and len(s) == 1
                    and "cardinality" in s
                }
                cum_subs = {
                    sn: s["cumulative_cardinality"]["buckets_path"]
                    for sn, s in sub_aggs.items()
                    if isinstance(s, dict)
                    and len(s) == 1
                    and "cumulative_cardinality" in s
                }
                for sn, vf in card_subs.items():
                    crows = r.facet_date_histogram_cardinality(
                        qtext, afield, int(iv), vf, field=f
                    )
                    percard = {b: (cd, cm) for b, _n, cd, cm in crows}
                    run_cm = 0
                    for bkt in buckets:
                        cd, cm = percard.get(bkt["key"], (0, None))
                        if cm is None:
                            cm = run_cm
                        run_cm = cm
                        bkt[sn] = {"value": int(cd)}
                        for cn, path in cum_subs.items():
                            if path == sn:
                                bkt[cn] = {"value": int(cm)}
                handled = (
                    set(rate_subs) | set(card_subs)
                    | {cn for cn, p in cum_subs.items() if p in card_subs}
                )
                sub_aggs = {
                    sn: s for sn, s in sub_aggs.items() if sn not in handled
                }
            out[name] = {"buckets": buckets}
        elif akind == "geotile_grid":
            rows = r.facet_geotile(
                qtext,
                afield,
                int(aspec.get("precision", 7)),
                size=int(aspec.get("size", 10)),
                field=f,
            )
            out[name] = {
                "buckets": [
                    {"key": k, "doc_count": c} for k, c in rows
                ]
            }
        elif akind == "geohash_grid":
            rows = r.facet_geohash(
                qtext,
                afield,
                int(aspec.get("precision", 5)),
                size=int(aspec.get("size", 10)),
                field=f,
            )
            out[name] = {
                "buckets": [
                    {"key": k, "doc_count": c} for k, c in rows
                ]
            }
        elif akind == "geo_distance":
            unit = {"m": 1.0, "km": 1000.0, "mi": 1609.344}[
                str(aspec.get("unit", "m"))
            ]
            origin = aspec["origin"]
            rngs = [
                (
                    None if rg.get("from") is None else float(rg["from"]) * unit,
                    None if rg.get("to") is None else float(rg["to"]) * unit,
                )
                for rg in aspec["ranges"]
            ]
            rows = r.facet_geo_distance(
                qtext,
                afield,
                (float(origin["lat"]), float(origin["lon"])),
                rngs,
                field=f,
            )
            out[name] = {
                "buckets": [
                    {
                        "from": None if lo is None else lo / unit,
                        "to": None if hi is None else hi / unit,
                        "doc_count": c,
                    }
                    for lo, hi, c in rows
                ]
            }
        elif akind == "auto_date_histogram":
            iv, rows = r.facet_auto_date_histogram(
                qtext, afield, int(aspec.get("buckets", 10)), field=f
            )
            out[name] = {
                "interval_ms": iv,
                "buckets": [{"key": b, "doc_count": c} for b, c in rows],
            }
        elif akind == "percentile_ranks":
            vals = tuple(float(v) for v in aspec["values"])
            out[name] = {
                "values": {
                    str(float(v)): pr
                    for v, pr in r.percentile_ranks_agg(
                        qtext, afield, vals, field=f
                    ).items()
                }
            }
        elif akind == "percentiles":
            pcts = tuple(aspec.get("percents", (1, 5, 25, 50, 75, 95, 99)))
            out[name] = {
                "values": {
                    str(float(p)): v
                    for p, v in r.percentiles_agg(
                        qtext, afield, pcts, field=f
                    ).items()
                }
            }
        elif akind == "cardinality":
            out[name] = {"value": r.cardinality_agg(qtext, afield, field=f)}
        elif akind == "string_stats":
            out[name] = r.string_stats_agg(qtext, afield, field=f)
        elif akind == "median_absolute_deviation":
            out[name] = {
                "value": r.median_absolute_deviation_agg(qtext, afield, field=f)
            }
        elif akind == "boxplot":
            out[name] = r.boxplot_agg(qtext, afield, field=f)
        elif akind == "geo_bounds":
            bounds = r.geo_bounds_agg(qtext, afield, field=f)
            out[name] = {"bounds": bounds}
        elif akind == "geo_centroid":
            cen = r.geo_centroid_agg(qtext, afield, field=f)
            out[name] = cen if cen is not None else {"count": 0}
        elif akind == "significant_text":
            if not isinstance(qtext, (str, type(None))):
                raise ValueError(
                    "significant_text needs a scoring (match) query"
                )
            if afield not in (r.primary_field, field):
                raise ValueError(
                    "significant_text runs over the query's text field"
                )
            rows = r.significant_text(
                qtext,
                size=int(aspec.get("size", 10)),
                sample_size=int(aspec.get("sampler_shard_size", 200)),
                field=f,
                min_doc_count=int(aspec.get("min_doc_count", 3)),
            )
            out[name] = {
                "buckets": [
                    {"key": t, "doc_count": fg, "bg_count": bg, "score": sc}
                    for t, fg, bg, sc in rows
                ]
            }
        elif akind == "significant_terms":
            if afield not in (r.primary_field, field):
                raise ValueError(
                    "significant_terms runs over the query's text field"
                )
            rows = r.significant_terms(
                qtext,
                size=int(aspec.get("size", 10)),
                field=f,
                min_doc_count=int(aspec.get("min_doc_count", 3)),
            )
            out[name] = {
                "buckets": [
                    {
                        "key": t,
                        "doc_count": fg,
                        "bg_count": bg,
                        "score": sc,
                    }
                    for t, fg, bg, sc in rows
                ]
            }
        else:
            raise ValueError(f"unsupported agg kind {akind!r}")
        if sub_aggs is not None:
            _apply_parent_pipelines(out[name], sub_aggs)
    for name, kind, spec in deferred:
        _sibling_pipeline(out, name, kind, spec)
    return out


def _attach_inner_hits(r: IndexReader, hits_out: list[dict], kind: str, spec):
    """``inner_hits`` on has_child / nested parent hits: each parent
    carries its matching children (score desc, id asc, capped at
    ``size``), with optional ``docvalue_fields``. Cost: ONE keys-only
    (doc_id, parent_key) partition scan for the whole page plus one
    batched docstore gather for the selected children — never per-hit
    I/O."""
    import pyarrow.dataset as pds

    ctype = str(spec["type"] if kind == "has_child" else spec["path"])
    rel = r._join_rel(ctype)
    ih = spec.get("inner_hits") or {}
    ih = ih if isinstance(ih, dict) else {}
    ih_name = str(ih.get("name", ctype))
    size = int(ih.get("size", 3))
    ik, ispec = _one(spec["query"], f"{kind}.query")
    cids, cscores = _inner_child_scores(r, ik, ispec, r.join_type_docs(ctype))
    page_ids = np.array([h["_id"] for h in hits_out], dtype=np.uint64)
    if cids.size:
        ids2, pk = r._scan_column_pairs(
            str(rel["parent_field"]), pds.field("doc_id").isin(cids)
        )
        order = np.argsort(cids, kind="mergesort")
        sc = cscores[order][np.searchsorted(cids[order], ids2)]
        keep = np.isin(pk.astype(np.uint64), page_ids)
        ids2, pk, sc = ids2[keep], pk.astype(np.uint64)[keep], sc[keep]
    else:
        ids2 = pk = sc = np.empty(0, np.float64)
    per_parent: dict[int, list[tuple[float, int]]] = {}
    for cid, p, s in zip(ids2, pk, sc):
        per_parent.setdefault(int(p), []).append((-float(s), int(cid)))
    selected: list[int] = []
    pages: dict[int, list[tuple[int, float]]] = {}
    for p, rows in per_parent.items():
        rows.sort()
        page = [(cid, -negs) for negs, cid in rows[:size]]
        pages[p] = page
        selected.extend(cid for cid, _ in page)
    dvf = [str(f) for f in ih.get("docvalue_fields", [])]
    by_id_row: dict[int, dict] = {}
    if dvf and selected:
        tbl = r.get_docs(np.array(sorted(set(selected)), dtype=np.uint64))
        by_id_row = {int(row["doc_id"]): row for row in tbl.to_pylist()}
    for h in hits_out:
        page = pages.get(int(h["_id"]), [])
        inner = []
        for cid, s in page:
            hit = {"_id": cid, "_score": s}
            if dvf:
                row = by_id_row.get(cid, {})
                hit["fields"] = {f: [row[f]] for f in dvf if f in row}
            inner.append(hit)
        h["inner_hits"] = {
            ih_name: {
                "hits": {
                    "total": {"value": len(per_parent.get(int(h["_id"]), []))},
                    "hits": inner,
                }
            }
        }


def _attach_page_fields(r: IndexReader, hits_out: list[dict], body: dict):
    """docvalue_fields / script_fields on a hit page: one batched
    docstore gather for the whole page (get_docs groups by bucket
    file), script fields compiled once per request through the
    script_score grammar. Field-sorted hits carry ``_score: None``;
    scripts reading ``_score`` see 0.0 there (pinned)."""
    dvf = body.get("docvalue_fields")
    sfields = body.get("script_fields")
    if not (dvf or sfields) or not hits_out:
        return
    from .script import compile_script as _compile_script

    names = [
        (str(f["field"]) if isinstance(f, dict) else str(f))
        for f in (dvf or [])
    ]
    compiled = {
        n: _compile_script(_script_source(s))
        for n, s in (sfields or {}).items()
    }
    ids = np.array([h["_id"] for h in hits_out], dtype=np.uint64)
    tbl = r.get_docs(ids)
    by_id_row = {int(rr["doc_id"]): rr for rr in tbl.to_pylist()}
    for h in hits_out:
        row = by_id_row.get(int(h["_id"]), {})
        flds = h.setdefault("fields", {})
        for nm in names:
            if nm in row:
                flds[nm] = [row[nm]]
        sc = np.array([float(h["_score"] or 0.0)])
        for nm, fn in compiled.items():
            vals = {
                f: np.array([float(row[f])], dtype=np.float64)
                for f in fn.fields
            }
            flds[nm] = [float(fn(sc, vals)[0])]


def run_count(index_dir_or_reader, body: dict) -> dict:
    """OpenSearch ``_count``: total docs matching the query, no
    scoring, no hits. Supports every unscored clause ``_match_docs``
    knows plus ``bool`` (candidate-set size)."""
    r = (
        index_dir_or_reader
        if isinstance(index_dir_or_reader, IndexReader)
        else IndexReader(index_dir_or_reader)
    )
    kind, spec = _one(body.get("query", {"match_all": {}}), "query")
    if kind == "bool":
        hits = _bool_hits(r, spec, k=r.n_docs)
        return {"count": len(hits)}
    return {"count": int(_match_docs(r, kind, spec).size)}


def run_validate_query(index_dir_or_reader, body: dict,
                       explain: bool = False) -> dict:
    """OpenSearch ``_validate/query``: check whether a request body's
    query would execute, WITHOUT running its scoring path to
    completion.  A query is valid iff ``run_query`` with ``size: 0``
    accepts it (the engine raises ``ValueError``/``KeyError``/
    ``TypeError`` on unsupported or malformed clauses — loud, not
    silently wrong — so validation is exactly that error surface).
    Response shape: ``{"valid": bool, "_shards": {...}, "explanations":
    [{"index", "valid", "error"?}]}`` (the subset clients read)."""
    r = (
        index_dir_or_reader
        if isinstance(index_dir_or_reader, IndexReader)
        else IndexReader(index_dir_or_reader)
    )
    probe = {"query": body.get("query", {"match_all": {}}), "size": 0}
    expl: dict[str, Any] = {"index": getattr(r, "index_dir", "_local")}
    try:
        run_query(r, probe)
        valid = True
        expl["valid"] = True
    except (ValueError, KeyError, TypeError) as ex:
        valid = False
        expl["valid"] = False
        expl["error"] = f"{type(ex).__name__}: {ex}"
    out = {
        "valid": valid,
        "_shards": {"total": 1, "successful": 1, "failed": 0},
    }
    if explain or not valid:
        out["explanations"] = [expl]
    return out


def run_analyze(body: dict) -> dict:
    """OpenSearch ``_analyze``: tokenize a text with the engine's
    analyzer (the same chain every indexed field goes through) and
    return positioned tokens. ``analyzer``: 'standard' (default) or
    'sayt' (adds the search_as_you_type shingle/prefix expansion,
    positionless — expansion terms are index-side artifacts).
    ``filter``: optional token-filter chain run after the standard
    tokenizer — any of 'stop' (Lucene's classic english set),
    's_stem', 'porter_stem' — the custom-analyzer face
    (analysis.analyzer_spec) of the same chain build_index accepts.
    Positions are the SURVIVING token stream's (the convention the
    index itself uses for phrase positions under an analyzer)."""
    from ..analysis import analyzer_spec, analyze, sayt_expand, tokenize

    text = str(body["text"])
    analyzer = str(body.get("analyzer", "standard"))
    filters = [str(x) for x in body.get("filter", [])]
    if filters:
        if analyzer != "standard":
            raise ValueError("filter chains apply to the standard analyzer")
        known = {"stop", "s_stem", "porter_stem"}
        bad = set(filters) - known
        if bad:
            raise ValueError(f"unsupported filters {sorted(bad)}; known: {sorted(known)}")
        stemmers = [f for f in filters if f.endswith("_stem")]
        if len(stemmers) > 1:
            raise ValueError("at most one stemmer filter")
        spec = analyzer_spec(
            stopwords="_english_" if "stop" in filters else None,
            stemmer=stemmers[0].removesuffix("_stem") if stemmers else None,
        )
        toks = analyze(text, spec)
    else:
        toks = tokenize(text)
    out = [
        {"token": t, "position": i, "type": "word"}
        for i, t in enumerate(toks)
    ]
    if analyzer == "sayt":
        seen = set(toks)
        for t in sayt_expand(toks):
            if t not in seen:
                seen.add(t)
                out.append({"token": t, "position": -1, "type": "shingle"})
    elif analyzer != "standard":
        raise ValueError(f"unsupported analyzer {analyzer!r}")
    return {"tokens": out}


def run_stats(index_dir_or_reader) -> dict:
    """OpenSearch ``_stats`` (the subset clients read): doc count,
    store size in bytes (docstore + postings + dictionaries on disk),
    and corpus token totals — all from the committed manifest plus one
    directory walk, no data reads."""
    import os as _os

    r = (
        index_dir_or_reader
        if isinstance(index_dir_or_reader, IndexReader)
        else IndexReader(index_dir_or_reader)
    )
    corpus = r.manifest["corpus"]
    size = 0
    for root, _dirs, files in _os.walk(r.index_dir):
        for fn in files:
            size += _os.path.getsize(_os.path.join(root, fn))
    return {
        "docs": {"count": int(corpus["n_docs"]), "deleted": 0},
        "store": {"size_in_bytes": int(size)},
        "corpus": {
            "sum_dl": int(corpus["sum_dl"]),
            "avgdl": corpus["sum_dl"] / corpus["n_docs"]
            if corpus["n_docs"]
            else 0.0,
        },
    }


def run_explain(index_dir_or_reader, doc_id: int, body: dict) -> dict:
    """OpenSearch ``_explain``: the BM25 score breakdown for one
    (query, doc) pair, in the endpoint's response shape. Supports a
    'match' query (the clause _explain is defined over)."""
    r = (
        index_dir_or_reader
        if isinstance(index_dir_or_reader, IndexReader)
        else IndexReader(index_dir_or_reader)
    )
    kind, spec = _one(body.get("query", {}), "query")
    if kind != "match":
        raise ValueError("_explain supports a 'match' query")
    field, qb = _field_query(spec)
    ex = r.explain(
        str(qb.get("query", "")),
        int(doc_id),
        field=None if field == r.primary_field else field,
    )
    return {
        "_id": int(doc_id),
        "matched": ex["matched"],
        "explanation": {
            "value": ex["value"],
            "description": ex["description"],
            "details": ex["details"],
        },
    }


def _highlight_terms(kind: str, spec) -> list[tuple[str | None, str]]:
    """(field, text) pairs to highlight, collected from the query tree's
    match-family leaves (match / match_phrase / *_prefix / term /
    multi_match; positive bool arms only — must_not never highlights).
    OpenSearch highlights every positive scoring clause; this walk is
    the engine's analog."""
    out: list[tuple[str | None, str]] = []
    if kind in ("match", "match_phrase", "match_phrase_prefix",
                "match_bool_prefix", "term"):
        field, qb = _field_query(spec)
        out.append((field, str(qb.get("query", qb.get("value", "")))))
    elif kind == "multi_match":
        flds = spec.get("fields") or [None]
        first = flds[0] if flds else None
        out.append((str(first).split("^")[0] if first else None,
                    str(spec.get("query", ""))))
    elif kind == "bool":
        # SCORING arms only — filter context never highlights
        # (OpenSearch's behavior), must_not never matches the hit
        for key in ("must", "should"):
            for c in _as_list(spec.get(key)):
                ck, cs = _one(c, f"bool.{key}")
                out.extend(_highlight_terms(ck, cs))
    elif kind in ("constant_score", "boosting"):
        inner = spec.get("filter") if kind == "constant_score" else spec.get("positive")
        if inner:
            out.extend(_highlight_terms(*_one(inner, kind)))
    elif kind in ("dis_max",):
        for c in _as_list(spec.get("queries")):
            out.extend(_highlight_terms(*_one(c, "dis_max.queries")))
    elif kind == "function_score":
        inner = spec.get("query")
        if inner:
            out.extend(_highlight_terms(*_one(inner, "function_score.query")))
    return out


def run_query(index_dir_or_reader, body: dict) -> dict:
    """Execute one OpenSearch-DSL request body. See module docstring
    for the supported subset; raises ValueError on anything outside
    it (loud, not silently wrong)."""
    import time as _time

    _t0 = _time.perf_counter()
    if "pit" in body:
        # point-in-time context: the body names the search state; the
        # index argument is ignored (OpenSearch PIT requests go to
        # /_search with no index)
        from ..loader.pit import pit_reader

        r = pit_reader(str(body["pit"]["id"]))
        body = {k: v for k, v in body.items() if k != "pit"}
    else:
        r = (
            index_dir_or_reader
            if isinstance(index_dir_or_reader, IndexReader)
            else IndexReader(index_dir_or_reader)
        )
    size = int(body.get("size", 10))
    offset = int(body.get("from", 0))
    min_score = body.get("min_score")
    page_size, page_offset = size, offset
    if min_score is not None:
        # min_score filters the MATCH SET before paging (OpenSearch
        # semantics), so the branches rank everything and the page cut
        # happens after the threshold filter below
        size, offset = r.n_docs, 0
    qspec = body.get("query", {"match_all": {}})
    kind, spec = _one(qspec, "query")

    runtime = _compile_runtime(body)
    sort = body.get("sort")
    after = body.get("search_after")
    if sort not in (None, "_score", ["_score", "_id"]):
        # numeric doc-value sort (runtime fields sort by their script);
        # with search_after this is the field-sorted deep-pagination
        # idiom — each page resumes strictly after (value, doc_id)
        s = sort[0] if isinstance(sort, list) else sort
        sfield, sdir = _one(s, "sort")
        if min_score is not None:
            raise ValueError(
                "min_score cannot combine with a field sort (sorted "
                "hits carry no _score to threshold)"
            )
        if after is not None and offset:
            raise ValueError(
                "'from' cannot combine with search_after (OpenSearch "
                "rejects the pair too) — page via search_after alone"
            )
        if kind == "match":
            field, qb = _field_query(spec)
            qarg = str(qb.get("query", ""))
            f_sort = None if field == r.primary_field else field
        elif kind == "match_all":
            qarg, f_sort = None, None
        else:
            # any filter-context query sorts through the same ordinal
            # funnel (search_sort_by never scores)
            qarg = r.ordinals_of_ids(_docs_of(r, kind, spec))
            f_sort = None
        hits = r.search_sort_by(
            qarg,
            sfield,
            k=offset + size,
            descending=(sdir in ("desc", {"order": "desc"})
                        or (isinstance(sdir, dict) and sdir.get("order") == "desc")),
            field=f_sort,
            script=runtime.get(str(sfield)),
            after=(after[0], int(after[1])) if after is not None else None,
        )[offset:]
        hits_out = [
            {"_id": int(d), "_score": None, "sort": [v, int(d)]}
            for d, v in hits
        ]
        _attach_page_fields(r, hits_out, body)
        return {
            "hits": {"total": {"value": len(hits_out)}, "hits": hits_out},
            "took": int((_time.perf_counter() - _t0) * 1000),
            "timed_out": False,
        }

    if after is not None:
        if kind != "match":
            raise ValueError("search_after is supported over 'match' queries")
        field, qb = _field_query(spec)
        hits = r.search_after(
            str(qb.get("query", "")),
            after=(float(after[0]), int(after[1])),
            k=size,
            field=None if field == r.primary_field else field,
        )
    elif (
        kind == "bool"
        and body.get("collapse") is None
        and body.get("rescore") is None
    ):
        hits = _bool_hits(r, spec, offset + size)[offset:]
    elif body.get("collapse") is not None:
        cfield = str(body["collapse"]["field"])
        if kind == "match":
            field, qb = _field_query(spec)
            rows = r.search_collapse(
                str(qb.get("query", "")),
                cfield,
                k=offset + size,
                field=None if field == r.primary_field else field,
            )[offset:]
            hits = [(d, s) for d, s, _ in rows]
        elif kind == "bool":
            # collapse over a scored bool: rank the FULL scored match
            # set, gather the collapse key per hit, keep the best
            # (first-ranked) doc per key — the same semantics
            # search_collapse computes in one pass for plain match
            all_hits = _bool_hits(r, spec, r.n_docs)
            if all_hits:
                ids = np.array([d for d, _ in all_hits], dtype=np.uint64)
                ords = r.ordinals_of_ids(ids)
                kmap = dict(
                    zip(
                        r._map_ordinals(ords).astype(np.uint64).tolist(),
                        r._gather_column(ords, cfield).tolist(),
                    )
                )
                seen: set = set()
                hits = []
                for d, sc in all_hits:
                    kv = kmap.get(d)
                    if kv in seen:
                        continue
                    seen.add(kv)
                    hits.append((d, sc))
                hits = hits[offset : offset + size]
            else:
                hits = []
        else:
            raise ValueError(
                "collapse is supported over 'match' and 'bool' queries"
            )
    elif body.get("rescore") is not None:
        rs = body["rescore"]
        rq = rs["query"]["rescore_query"]
        rk, rspec = _one(rq, "rescore_query")
        if rk != "match_phrase":
            raise ValueError("rescore supports a match_phrase rescore query")
        rfield, rb = _field_query(rspec)
        window = int(rs.get("window_size", 10))
        qw = float(rs["query"].get("query_weight", 1.0))
        rw = float(rs["query"].get("rescore_query_weight", 1.0))
        if kind == "match":
            field, qb = _field_query(spec)
            if rfield != field:
                raise ValueError("rescore query must target the same field")
            hits = r.rescore(
                str(qb.get("query", "")),
                str(rb.get("query", "")),
                window_size=window,
                query_weight=qw,
                rescore_weight=rw,
                k=offset + size,
                field=None if field == r.primary_field else field,
            )[offset:]
        elif kind == "bool":
            # rescore over a scored bool: the ranked window comes from
            # _bool_hits, the phrase re-ranking is the same kernel
            hits = r.rescore_hits(
                _bool_hits(r, spec, window),
                str(rb.get("query", "")),
                query_weight=qw,
                rescore_weight=rw,
                k=offset + size,
                field=None if rfield == r.primary_field else rfield,
            )[offset:]
        else:
            raise ValueError(
                "rescore is supported over 'match' and 'bool' queries"
            )
    else:
        hits = _scored_hits(r, kind, spec, offset + size)[offset:]
    if min_score is not None:
        ms = float(min_score)
        hits = [(d, sc) for d, sc in hits if sc >= ms][
            page_offset : page_offset + page_size
        ]
    _t_query = _time.perf_counter()

    resp: dict[str, Any] = {
        "hits": {
            "total": {"value": len(hits)},
            "hits": [{"_id": int(d), "_score": s} for d, s in hits],
        }
    }
    if body.get("track_total_hits"):
        # exact total across the whole match set (OpenSearch
        # track_total_hits: true) — one unscored count via the _count
        # evaluator; the default stays the page length (documented)
        resp["hits"]["total"] = {
            "value": run_count(r, {"query": body.get("query", {"match_all": {}})})[
                "count"
            ],
            "relation": "eq",
        }
    src = body.get("_source")
    if src and hits:
        # stored-field retrieval: one batched docstore gather for the
        # whole page (get_docs groups by bucket file), not per hit.
        # Accepted forms: true (everything), a list of names, or the
        # OpenSearch filter object {"includes": [...], "excludes":
        # [...]} with * wildcards (fnmatch), excludes winning.
        ids = np.array([d for d, _ in hits], dtype=np.uint64)
        tbl = r.get_docs(ids)
        if isinstance(src, dict):
            import fnmatch as _fn

            inc = src.get("includes")
            exc = src.get("excludes") or []
            names = [
                c for c in tbl.column_names if c not in ("doc_id", "ordinal")
            ]
            keep = [
                c
                for c in names
                if (
                    inc is None
                    or any(_fn.fnmatchcase(c, p) for p in _as_list(inc))
                )
                and not any(_fn.fnmatchcase(c, p) for p in _as_list(exc))
            ]
            tbl = tbl.select(["doc_id", *keep])
        elif isinstance(src, (list, tuple)):
            keep = [c for c in src if c in tbl.column_names]
            tbl = tbl.select(["doc_id", *keep])
        by_id = {
            int(row["doc_id"]): {
                k: v for k, v in row.items() if k not in ("doc_id", "ordinal")
            }
            for row in tbl.to_pylist()
        }
        for h in resp["hits"]["hits"]:
            h["_source"] = by_id.get(h["_id"], {})
    _attach_page_fields(r, resp["hits"]["hits"], body)
    if (
        kind in ("has_child", "nested")
        and isinstance(spec, dict)
        and "inner_hits" in spec
        and resp["hits"]["hits"]
    ):
        _attach_inner_hits(r, resp["hits"]["hits"], kind, spec)
    hl = body.get("highlight")
    if hl and hits:
        texts = _highlight_terms(kind, spec)
        if not texts:
            raise ValueError(
                "highlight needs at least one match-family clause in "
                "the query (nothing to highlight in a pure filter)"
            )
        hfield = texts[0][0] or r.primary_field
        tags = (
            str(hl.get("pre_tags", ["<em>"])[0]),
            str(hl.get("post_tags", ["</em>"])[0]),
        )
        for fld in hl.get("fields", {hfield: {}}):
            # require_field_match (the OpenSearch default): a field
            # highlights only the terms of clauses targeting IT — a
            # title clause's terms never wrap in the text field
            own = " ".join(
                t
                for tf, t in texts
                if (tf or r.primary_field) == fld
            )
            if not own:
                continue
            for h in resp["hits"]["hits"]:
                h.setdefault("highlight", {})[fld] = [
                    r.highlight(h["_id"], own, field=fld, tags=tags)
                ]
    if body.get("explain") and kind == "match" and resp["hits"]["hits"]:
        # per-hit _explanation (the search-body ``explain: true`` flag;
        # defined for the match clause, the same kernel as _explain) —
        # page-sized work, one explain per served hit
        efield, eqb = _field_query(spec)
        for h in resp["hits"]["hits"]:
            ex = r.explain(
                str(eqb.get("query", "")),
                int(h["_id"]),
                field=None if efield == r.primary_field else efield,
            )
            h["_explanation"] = {
                "value": ex["value"],
                "description": ex["description"],
                "details": ex["details"],
            }
    if body.get("aggs"):
        resp["aggregations"] = _aggregations(
            r, kind, spec, body["aggs"], runtime=runtime
        )
    if body.get("suggest"):
        sugg: dict[str, Any] = {}
        for name, s in body["suggest"].items():
            if "term" in s:
                t = s["term"]
                fld = t.get("field")
                sugg[name] = r.suggest_terms(
                    str(s["text"]),
                    size=int(t.get("size", 3)),
                    max_edits=int(t.get("max_edits", 2)),
                    prefix_length=int(t.get("prefix_length", 1)),
                    field=None if fld in (None, r.primary_field) else str(fld),
                )
            elif "phrase" in s:
                t = s["phrase"]
                fld = t.get("field")
                sugg[name] = r.suggest_phrase(
                    str(s["text"]),
                    size=int(t.get("size", 3)),
                    max_edits=int(t.get("max_edits", 1)),
                    prefix_length=int(t.get("prefix_length", 1)),
                    max_candidates=int(t.get("max_candidates", 5)),
                    field=None if fld in (None, r.primary_field) else str(fld),
                )
            elif "completion" in s:
                t = s["completion"]
                fld = t.get("field")
                sugg[name] = r.suggest_completion(
                    str(s.get("prefix", s.get("text", ""))),
                    size=int(t.get("size", 5)),
                    field=None if fld in (None, r.primary_field) else str(fld),
                )
            else:
                raise ValueError(
                    "supported suggesters: term, phrase, completion"
                )
        resp["suggest"] = sugg
    if body.get("profile"):
        # search profiling (OpenSearch ``profile: true``): one profile
        # entry per top-level clause with REAL measured nanoseconds —
        # the query phase (scoring/matching, everything up to the hits
        # list) vs the collect/fetch phase (_source gather, page
        # fields, aggregations, highlight, suggest). This engine runs
        # one logical shard, so shards has one element.
        import json as _json

        _t_end = _time.perf_counter()
        resp["profile"] = {
            "shards": [
                {
                    "id": "[raybm25][0]",
                    "searches": [
                        {
                            "query": [
                                {
                                    "type": kind,
                                    "description": _json.dumps(
                                        qspec, sort_keys=True, default=str
                                    ),
                                    "time_in_nanos": int(
                                        (_t_query - _t0) * 1e9
                                    ),
                                }
                            ],
                            "rewrite_time": 0,
                            "collector": [
                                {
                                    "name": "SimpleTopScoreDocCollector",
                                    "reason": "search_top_hits",
                                    "time_in_nanos": int(
                                        (_t_end - _t_query) * 1e9
                                    ),
                                }
                            ],
                        }
                    ],
                    "aggregations": [],
                }
            ]
        }
    # OpenSearch response envelope: wall-clock ms for the request
    resp["took"] = int((_time.perf_counter() - _t0) * 1000)
    resp["timed_out"] = False
    return resp


def run_msearch(index_dir_or_reader, bodies: list[dict]) -> dict:
    """OpenSearch ``_msearch``: execute several request bodies against
    one index and return ``{"responses": [...]}`` in request order. A
    body that raises surfaces as ``{"error": {...}}`` in its slot with
    status 400 — the multi-search contract (one bad request does not
    fail the batch). The reader (and its postings/doc-value caches) is
    shared across the batch, so repeated terms decode once; on the
    serving path the BatchSearcher actor pool gives the same sharing
    per actor."""
    r = (
        index_dir_or_reader
        if isinstance(index_dir_or_reader, IndexReader)
        else IndexReader(index_dir_or_reader)
    )
    readers: dict[str, IndexReader] = {}
    responses: list[dict] = []
    for body in bodies:
        try:
            # the NDJSON header-line form: a body may carry its own
            # {"index": <dir>} routing (OpenSearch msearch header);
            # per-dir readers are cached so repeated routes share
            # postings/doc-value caches across the batch
            target = r
            if isinstance(body, dict) and "index" in body:
                d = str(body["index"])
                if d not in readers:
                    readers[d] = IndexReader(d)
                target = readers[d]
                body = {k: v for k, v in body.items() if k != "index"}
            responses.append(run_query(target, body))
        except (ValueError, KeyError, FileNotFoundError) as e:
            responses.append(
                {"error": {"type": type(e).__name__, "reason": str(e)},
                 "status": 400}
            )
    return {"responses": responses}


def run_mget(index_dir_or_reader, body: dict) -> dict:
    """OpenSearch ``_mget``: fetch several stored documents by id in
    request order; absent ids come back ``found: False`` (never an
    error). One grouped docstore read serves the whole batch
    (get_docs touches only the buckets the ids hash to)."""
    r = (
        index_dir_or_reader
        if isinstance(index_dir_or_reader, IndexReader)
        else IndexReader(index_dir_or_reader)
    )
    ids = [int(v) for v in body["ids"]]
    tbl = r.get_docs(np.array(ids, dtype=np.uint64))
    by_id = {}
    cols = [c for c in tbl.column_names if c != "doc_id"]
    did = tbl.column("doc_id").to_numpy(zero_copy_only=False)
    for i in range(tbl.num_rows):
        by_id[int(did[i])] = {c: tbl.column(c)[i].as_py() for c in cols}
    docs = []
    for v in ids:
        src = by_id.get(int(np.uint64(v)))
        if src is None:
            docs.append({"_id": v, "found": False})
        else:
            docs.append({"_id": v, "found": True, "_source": src})
    return {"docs": docs}


def run_termvectors(index_dir_or_reader, doc_id: int, body: dict | None = None) -> dict:
    """OpenSearch ``_termvectors`` endpoint (see
    IndexReader.termvectors)."""
    r = (
        index_dir_or_reader
        if isinstance(index_dir_or_reader, IndexReader)
        else IndexReader(index_dir_or_reader)
    )
    body = body or {}
    fields = body.get("fields")
    field = None
    if fields:
        if len(fields) != 1:
            raise ValueError("termvectors supports one field per call")
        field = None if fields[0] == r.primary_field else str(fields[0])
    return r.termvectors(
        int(doc_id),
        field=field,
        positions=bool(body.get("positions", True)),
        term_statistics=bool(body.get("term_statistics", False)),
        field_statistics=bool(body.get("field_statistics", True)),
    )


def run_mtermvectors(index_dir_or_reader, body: dict) -> dict:
    """OpenSearch ``_mtermvectors``: term vectors for many docs in one
    call. Accepts ``{"ids": [...]}`` (shared options in the body) or
    ``{"docs": [{"_id": ..., ...per-doc options}, ...]}``; each doc's
    vector is the same shape ``run_termvectors`` returns, wrapped as
    ``{"docs": [...]}`` in request order. The reader is resolved ONCE
    for the whole batch (one manifest/docstore handle, N point
    lookups), which is the entire point of the m-endpoint."""
    r = (
        index_dir_or_reader
        if isinstance(index_dir_or_reader, IndexReader)
        else IndexReader(index_dir_or_reader)
    )
    shared = {
        k: v for k, v in (body or {}).items() if k not in ("ids", "docs")
    }
    reqs: list[tuple[int, dict]] = []
    for i in body.get("ids", []) or []:
        reqs.append((int(i), shared))
    for d in body.get("docs", []) or []:
        opts = {**shared, **{k: v for k, v in d.items() if k != "_id"}}
        reqs.append((int(d["_id"]), opts))
    return {
        "docs": [run_termvectors(r, did, opts) for did, opts in reqs]
    }


def run_scroll(
    index_dir_or_reader, body: dict | None = None, scroll_id: str | None = None
) -> dict:
    """OpenSearch scroll idiom as a STATELESS continuation token — the
    modern point-in-time + search_after construction (no server-side
    scroll context to create or expire; the index's committed manifest
    IS the point-in-time). First call: pass the request ``body``; each
    response carries ``_scroll_id``; pass that back to continue. An
    empty ``hits`` page means the scroll is exhausted.

    Fast path: a plain single-field ``match`` query (no sort / aggs /
    extra match options) continues via ``engine.search_after`` on the
    last hit's (score, doc_id) cursor — O(page) work at ANY depth, no
    deep-offset re-scoring. Every other run_query-supported body
    continues by offset re-evaluation (fine for shallow pagination;
    for full-corpus streaming use ``loader.export.export_matching``,
    the sliced-scroll export idiom).
    """
    import base64
    import json as _json

    r = (
        index_dir_or_reader
        if isinstance(index_dir_or_reader, IndexReader)
        else IndexReader(index_dir_or_reader)
    )
    if (body is None) == (scroll_id is None):
        raise ValueError("pass exactly one of body / scroll_id")
    if body is not None and "slice" in body:
        # sliced scroll (parallel-export idiom): slice membership is
        # doc_id % max == id — disjoint and complete by construction
        # (simpler than Lucene's hash slicing, same contract); each
        # slice scrolls independently via a filtering wrapper over the
        # unsliced scroll
        sl = body["slice"]
        sid, smax = int(sl["id"]), int(sl["max"])
        if not 0 <= sid < smax:
            raise ValueError(f"slice.id must be in [0, {smax}), got {sid}")
        st = {
            "slice": {"id": sid, "max": smax},
            "b": {k: v for k, v in body.items() if k != "slice"},
            "n": int(body.get("size", 10)),
        }
        return _sliced_scroll_step(r, st)
    if scroll_id is not None:
        st = _json.loads(base64.urlsafe_b64decode(scroll_id.encode()).decode())
        if "slice" in st:
            return _sliced_scroll_step(r, st)
        body = st["b"]
        size = int(st["n"])
        if st.get("done"):
            resp: dict = {"hits": {"total": {"value": 0}, "hits": []}}
            resp["_scroll_id"] = scroll_id
            return resp
    else:
        st = None
        size = int(body.get("size", 10))

    def _simple_match(b: dict):
        """(query_text, engine_field) when the body is a bare
        single-field match query, else None."""
        if set(b) - {"query", "size"}:
            return None
        q = b.get("query", {})
        if set(q) != {"match"}:
            return None
        field, mb = _field_query(q["match"])
        if isinstance(mb, dict) and set(mb) - {"query"}:
            return None
        return str(mb.get("query", "")), (None if field == r.primary_field else field)

    sm = _simple_match(body)
    if st is None:
        resp = run_query(r, {**body, "size": size})
        hits = resp["hits"]["hits"]
        next_st: dict = {"b": body, "n": size}
        if len(hits) < size:
            next_st["done"] = True
        elif sm is not None:
            next_st["a"] = [hits[-1]["_score"], hits[-1]["_id"]]
        else:
            next_st["o"] = size
    else:
        if sm is not None and "a" in st:
            q, f = sm
            page = r.search_after(
                q, after=(float(st["a"][0]), int(st["a"][1])), k=size, field=f
            )
            hits = [{"_id": int(d), "_score": s} for d, s in page]
            resp = {"hits": {"total": {"value": len(hits)}, "hits": hits}}
            next_st = {"b": body, "n": size}
            if len(hits) < size:
                next_st["done"] = True
            else:
                next_st["a"] = [hits[-1]["_score"], hits[-1]["_id"]]
        else:
            offset = int(st.get("o", size))
            resp = run_query(r, {**body, "size": size, "from": offset})
            hits = resp["hits"]["hits"]
            next_st = {"b": body, "n": size}
            if len(hits) < size:
                next_st["done"] = True
            else:
                next_st["o"] = offset + size
    resp["_scroll_id"] = base64.urlsafe_b64encode(
        _json.dumps(next_st, sort_keys=True).encode()
    ).decode()
    return resp


def _sliced_scroll_step(r: IndexReader, st: dict) -> dict:
    """One page of a sliced scroll: pull inner (unsliced) pages, keep
    the slice's members (doc_id % max == id), emit exactly ``n`` hits
    and carry any overflow in the continuation token (bounded by one
    inner page). The inner scroll rides its own fast path."""
    import base64
    import json as _json

    sid, smax = int(st["slice"]["id"]), int(st["slice"]["max"])
    size = int(st["n"])
    hits = list(st.get("pend", []))
    it = st.get("it")
    idone = bool(st.get("idone", False))
    while len(hits) < size and not idone:
        if it is None:
            resp = run_scroll(r, body={**st["b"], "size": size})
        else:
            resp = run_scroll(r, scroll_id=it)
        it = resp["_scroll_id"]
        page = resp["hits"]["hits"]
        hits.extend(h for h in page if int(h["_id"]) % smax == sid)
        if len(page) < size:
            idone = True
    out, pend = hits[:size], hits[size:]
    nst = {
        "slice": st["slice"], "b": st["b"], "n": size,
        "pend": pend, "it": it, "idone": idone,
    }
    return {
        "hits": {"total": {"value": len(out)}, "hits": out},
        "_scroll_id": base64.urlsafe_b64encode(
            _json.dumps(nst, sort_keys=True).encode()
        ).decode(),
    }


def run_query_multi_dfs(index_dirs: list, body: dict) -> dict:
    """Multi-index search with ``search_type=dfs_query_then_fetch``:
    global BM25 statistics gathered across every index before scoring
    (engine.search_dfs), so a corpus split across indices ranks — and
    scores — exactly as the unsplit index would. Supports the plain
    ``match`` body (the clause global-stats scoring is defined over
    here); richer bodies take the per-index-stats ``run_query_multi``
    path, OpenSearch's default."""
    import os as _os

    from .engine import search_dfs

    size = int(body.get("size", 10))
    q = body.get("query")
    if not isinstance(q, dict) or list(q) != ["match"]:
        raise ValueError(
            "dfs_query_then_fetch supports a 'match' query body"
        )
    fname, spec = _one(q["match"], "match")
    text = spec["query"] if isinstance(spec, dict) else spec
    readers = [
        d if isinstance(d, IndexReader) else IndexReader(d) for d in index_dirs
    ]
    # field wired through: a non-primary match field scores against its
    # own per-field postings/avgdl, same as the single-index path
    field = None if fname == readers[0].primary_field else fname
    hits = search_dfs(readers, str(text), size, field=field)
    names = {
        id(r): _os.path.basename(_os.path.normpath(r.index_dir)) for r in readers
    }
    # attribute each hit to the index that holds the doc: one grouped
    # docstore probe per reader (disjoint split: exactly one owner;
    # duplicates keep the first index listed)
    owner: dict[int, str] = {}
    hit_ids = np.array([d for d, _ in hits], dtype=np.uint64)
    for r in readers:
        if hit_ids.size == 0:
            break
        tbl = r.get_docs(hit_ids)
        for d in tbl.column("doc_id").to_pylist():
            owner.setdefault(int(d), names[id(r)])
    out_hits = [
        {"_id": int(np.int64(np.uint64(d))), "_score": float(s),
         "_index": owner.get(int(d))}
        for d, s in hits
    ]
    # exact match total: per-index match counts sum (disjoint corpora),
    # not the page length
    total = sum(int(r._match_ordinals(str(text), field).size) for r in readers)
    return {"hits": {"total": {"value": total}, "hits": out_hits}}


def run_query_multi(index_dirs: list, body: dict) -> dict:
    """Multi-index search — the ``GET /logs-*/_search`` scatter-gather
    idiom (time-partitioned indices are THE way a 100-TB corpus is
    operated: one index per day/shard-range, queries fan out and
    merge). The body runs against each index independently with that
    index's OWN BM25 statistics (n_docs / avgdl / df — OpenSearch
    semantics: scores are per-shard-local unless dfs_query_then_fetch)
    and the per-index top pages merge by (score desc, doc_id asc) —
    correct scatter-gather: each index contributes its own top ``size``,
    so the global top ``size`` is always present. Hits carry ``_index``
    (the index directory's basename)."""
    import os as _os

    size = int(body.get("size", 10))
    # indices_boost: [{"<index basename>": factor}, ...] — per-index
    # score multipliers applied before the global merge
    boosts: dict[str, float] = {}
    for ib in body.get("indices_boost", []) or []:
        bn, bv = _one(ib, "indices_boost")
        boosts[str(bn)] = float(bv)
    ignore_unavailable = bool(body.get("ignore_unavailable"))
    sub_body = {
        k: v
        for k, v in body.items()
        if k not in ("indices_boost", "ignore_unavailable")
    }
    merged: list[dict] = []
    total = 0
    relation = "eq" if body.get("track_total_hits") else None
    for d in index_dirs:
        try:
            resp = run_query(d, {**sub_body, "size": size})
        except FileNotFoundError:
            # ignore_unavailable=true: a missing index contributes
            # nothing instead of failing the whole scatter-gather
            # (the OpenSearch flag); without it the error propagates
            if ignore_unavailable:
                continue
            raise
        name = _os.path.basename(_os.path.normpath(d)) if isinstance(d, str) else (
            _os.path.basename(_os.path.normpath(d.index_dir))
        )
        boost = boosts.get(name, 1.0)
        if boost != 1.0:
            for h in resp["hits"]["hits"]:
                h["_score"] = h["_score"] * boost
        # per-index total sums to the cross-index total (exact when
        # track_total_hits; otherwise sum of page lengths, the same
        # lower bound run_query reports per index)
        total += int(resp["hits"]["total"]["value"])
        for h in resp["hits"]["hits"]:
            # carry the full per-index hit (incl. _source / highlight)
            merged.append({**h, "_index": name})
    merged.sort(key=lambda h: (-float(h["_score"]), int(h["_id"])))
    hits = merged[:size]
    tot: dict = {"value": total}
    if relation:
        tot["relation"] = relation
    return {"hits": {"total": tot, "hits": hits}}


def run_get_mapping(index_dir_or_reader) -> dict:
    """``GET /<index>/_mapping``: reconstruct the OpenSearch-style
    properties dict from the committed manifest — text fields (the
    primary first), search_as_you_type fields, keyword fields, and the
    stored doc-value columns visible in the docstore schema (numeric ->
    long/double, string -> keyword-stored, list<float> -> knn_vector).
    ``dynamic`` is always ``false``: only declared/built fields are
    indexed, the reference's own setting
    (/root/reference/opensearch_loader/opensearch_client.py:102-106)."""
    import glob as _glob
    import os as _os

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    r = (
        index_dir_or_reader
        if isinstance(index_dir_or_reader, IndexReader)
        else IndexReader(index_dir_or_reader)
    )
    man = r.manifest
    props: dict[str, dict] = {}
    sayt = set(man.get("sayt_cols", []))
    for c in man.get("text_cols", []):
        props[c] = {
            "type": "search_as_you_type" if c in sayt else "text",
            "analyzer": man.get("analyzer"),
        }
        if man.get("positions"):
            props[c]["index_options"] = "positions"
    for c in man.get("keyword_cols", []):
        props.setdefault(c, {"type": "keyword"})
    docs = sorted(
        _glob.glob(_os.path.join(r._docs_dir, f"{r.docstore_prefix}=*.parquet"))
    )
    if docs:
        schema = _pq.read_schema(docs[0])
        skip = {"doc_id", "ordinal", "texth", "dl"} | {
            f"dl_{c}" for c in man.get("text_cols", [])
        }
        for field in schema:
            if field.name in props or field.name in skip:
                continue
            t = field.type
            if _pa.types.is_list(t) and _pa.types.is_floating(t.value_type):
                props[field.name] = {"type": "knn_vector"}
            elif _pa.types.is_integer(t):
                props[field.name] = {"type": "long"}
            elif _pa.types.is_floating(t):
                props[field.name] = {"type": "double"}
            elif _pa.types.is_timestamp(t):
                props[field.name] = {"type": "date"}
            elif _pa.types.is_boolean(t):
                props[field.name] = {"type": "boolean"}
            else:
                props[field.name] = {"type": "keyword", "index": False}
    return {"mappings": {"dynamic": False, "properties": props}}


def run_get_settings(index_dir_or_reader) -> dict:
    """``GET /<index>/_settings``: the engine-level knobs a client can
    read — BM25 similarity parameters, shard/bucket layout, analyzer
    and codec versions — from the committed manifest."""
    r = (
        index_dir_or_reader
        if isinstance(index_dir_or_reader, IndexReader)
        else IndexReader(index_dir_or_reader)
    )
    man = r.manifest
    return {
        "settings": {
            "index": {
                "number_of_shards": int(man.get("num_shards", 0)),
                "layout": man.get("layout", "hash"),
                "docstore_partitions": int(man.get("num_buckets", 0)),
                "similarity": {
                    "default": {
                        "type": "BM25",
                        "k1": float(man.get("k1", 1.2)),
                        "b": float(man.get("b", 0.75)),
                    }
                },
                "analysis": {"analyzer": man.get("analyzer")},
                "positions": bool(man.get("positions", False)),
                "hash_impl": man.get("hash_impl"),
                "version": man.get("version"),
            }
        }
    }


# aggregatability per mapped type: text is searchable-only (no
# doc-values), everything else the engine stores column-backed
_FIELD_CAPS = {
    "text": (True, False),
    "search_as_you_type": (True, False),
    "keyword": (True, True),
    "long": (True, True),
    "double": (True, True),
    "date": (True, True),
    "boolean": (True, True),
    "knn_vector": (True, False),
}


def run_field_caps(index_dirs, fields: list[str] | None = None) -> dict:
    """``GET /<index>/_field_caps`` over one index dir or a list of
    them (the alias / wildcard-pattern scatter-gather shape): per
    field, per mapped type, whether it is searchable / aggregatable,
    merged across indices. When a field maps to DIFFERENT types in
    different indices, each type entry carries the ``indices`` that
    use it — the conflict shape OpenSearch clients key off before
    building cross-index queries. Derived entirely from each index's
    committed manifest via :func:`run_get_mapping` (no data reads).
    ``fields`` filters the response (exact names; None = all)."""
    import os as _os

    if isinstance(index_dirs, (str, IndexReader)):
        index_dirs = [index_dirs]
    want = set(fields) if fields is not None else None
    # field -> type -> sorted list of index names using it
    seen: dict[str, dict[str, list[str]]] = {}
    names: list[str] = []
    for d in index_dirs:
        name = (
            _os.path.basename(_os.path.normpath(d))
            if isinstance(d, str)
            else _os.path.basename(_os.path.normpath(d.index_dir))
        )
        names.append(name)
        props = run_get_mapping(d)["mappings"]["properties"]
        for fld, spec in props.items():
            if want is not None and fld not in want:
                continue
            t = spec.get("type", "keyword")
            if spec.get("index") is False:
                continue  # stored-only column: not searchable, omit
            seen.setdefault(fld, {}).setdefault(t, []).append(name)
    out: dict[str, dict] = {}
    for fld in sorted(seen):
        by_type = seen[fld]
        out[fld] = {}
        for t in sorted(by_type):
            searchable, aggregatable = _FIELD_CAPS.get(t, (True, True))
            cap = {
                "type": t,
                "searchable": searchable,
                "aggregatable": aggregatable,
            }
            # OpenSearch includes per-type index lists only on conflict
            if len(by_type) > 1:
                cap["indices"] = sorted(by_type[t])
            out[fld][t] = cap
    return {"indices": sorted(names), "fields": out}


def run_terms_enum(index_dir_or_reader, body: dict) -> dict:
    """``POST /<index>/_terms_enum``: alphabetically-sorted dictionary
    terms of one field that start with ``string`` — the index-backed
    autocomplete endpoint (reference analog: OpenSearch delegates it to
    Lucene's FST term dictionary; here the sorted Arrow dictionary of
    :meth:`IndexReader.term_dictionary` plays that role, built from a
    term-column-only scan of the postings shards and cached per
    reader — vocabulary-sized, not corpus-sized).

    Supported body keys (the documented surface minus index_filter):
    ``field`` (required), ``string`` (prefix, default "" = all terms),
    ``size`` (default 10, the response cap), ``search_after`` (resume
    strictly after this term — pagination), ``case_insensitive``
    (accepted but only ``true`` semantics: the analyzer lowercases at
    build time, so the dictionary is lowercase by construction).
    Returns ``{"terms": [...], "complete": bool}`` where ``complete``
    is True iff no matching terms were cut by ``size``."""
    r = (
        index_dir_or_reader
        if isinstance(index_dir_or_reader, IndexReader)
        else IndexReader(index_dir_or_reader)
    )
    if "field" not in body:
        raise ValueError("terms_enum requires 'field'")
    fld = str(body["field"])
    f = None if fld == r.primary_field else fld
    size = int(body.get("size", 10))
    prefix = str(body.get("string", "")).lower()
    terms = r.expand_prefix(prefix, field=f) if prefix else np.asarray(
        r.term_dictionary(f)
    ).tolist()
    after = body.get("search_after")
    if after is not None:
        import bisect

        terms = terms[bisect.bisect_right(terms, str(after).lower()):]
    return {"terms": terms[:size], "complete": len(terms) <= size}
