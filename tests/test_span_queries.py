"""Span queries (span_term / span_near / span_first) over positional
postings, checked against brute-force position scans. Reference
behavior: Lucene/OpenSearch span queries on text fields."""

import re

import numpy as np
import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.query.dsl import _match_docs, run_query
from raybm25.query.engine import IndexReader

TOK = re.compile(r"[a-z0-9]+")

DOCS = [
    "merge sort is a stable sort",        # 0: merge@0 sort@1,5
    "quick sort beats merge sort often",  # 1: merge@3 sort@1,4
    "sort then merge",                    # 2: merge@2 sort@0
    "merge the lists then sort them",     # 3: merge@0 sort@4
    "no relevant terms here",             # 4
    "deep inside this text merge hides",  # 5: merge@4
]


@pytest.fixture(scope="module")
def rdr(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("span")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"doc_id": list(range(len(DOCS))), "text": DOCS}),
        str(tmp / "d.parquet"),
    )
    idx = str(tmp / "idx")
    build_index(str(tmp / "d.parquet"), idx, key_col="doc_id",
                id_col="doc_id", ts_col=None, num_buckets=2, positions=True)
    return IndexReader(idx)


def _brute_near(a, b, slop, in_order):
    out = []
    for i, t in enumerate(DOCS):
        toks = TOK.findall(t.lower())
        pa_ = [p for p, w in enumerate(toks) if w == a]
        pb = [p for p, w in enumerate(toks) if w == b]
        pairs = [(x, y) for x in pa_ for y in pb]
        if in_order:
            pairs = [(x, y) for x, y in pairs if y > x]
        else:
            pairs = [(min(x, y), max(x, y)) for x, y in pairs if x != y]
        if any(hi - lo - 1 <= slop for lo, hi in pairs):
            out.append(i)
    return out


@pytest.mark.parametrize("slop,in_order", [(0, True), (2, True), (0, False), (3, False)])
def test_span_near_vs_brute(rdr, slop, in_order):
    got = _match_docs(rdr, "span_near", {
        "clauses": [{"span_term": {"text": "merge"}},
                    {"span_term": {"text": "sort"}}],
        "slop": slop, "in_order": in_order,
    })
    assert got.tolist() == _brute_near("merge", "sort", slop, in_order)


def test_span_first(rdr):
    # merge with span end <= 1 -> first position 0 only
    got = _match_docs(rdr, "span_first", {
        "match": {"span_term": {"text": "merge"}}, "end": 1,
    })
    assert got.tolist() == [0, 3]
    got = _match_docs(rdr, "span_first", {
        "match": {"span_term": {"text": "merge"}}, "end": 5,
    })
    assert got.tolist() == [0, 1, 2, 3, 5]


def test_span_term_docs(rdr):
    got = _match_docs(rdr, "span_term", {"text": "merge"})
    assert got.tolist() == [0, 1, 2, 3, 5]


def test_span_via_dsl_and_bool_filter(rdr):
    resp = run_query(rdr, {
        "query": {"span_near": {
            "clauses": [{"span_term": {"text": "merge"}},
                        {"span_term": {"text": "sort"}}],
            "slop": 0, "in_order": True,
        }},
        "size": 10,
    })
    assert [h["_id"] for h in resp["hits"]["hits"]] == [0, 1]
    assert all(h["_score"] == 1.0 for h in resp["hits"]["hits"])


def test_span_near_errors(rdr):
    with pytest.raises(ValueError, match="span_term / span_multi"):
        _match_docs(rdr, "span_near", {
            "clauses": [{"match": {"text": "merge"}}], "slop": 0,
        })
    with pytest.raises(ValueError, match="single-term span"):
        _match_docs(rdr, "span_first", {
            "match": {"span_term": {"text": "merge sort"}}, "end": 2,
        })


# ------------------------------------------------- span_multi / masking


def _brute_multi_near(first, pred, slop):
    """Docs where `first` is followed by a token satisfying `pred`
    with internal gap <= slop (ordered)."""
    out = []
    for i, t in enumerate(DOCS):
        toks = TOK.findall(t.lower())
        if any(
            w == first and any(pred(v) for v in toks[p + 1 : p + 2 + slop])
            for p, w in enumerate(toks)
        ):
            out.append(i)
    return out


def test_span_multi_standalone_equals_inner_query(rdr):
    got = _match_docs(
        rdr,
        "span_multi",
        {"match": {"prefix": {"text": {"value": "so"}}}},
    )
    want = _match_docs(rdr, "prefix", {"text": {"value": "so"}})
    assert got.tolist() == want.tolist()


@pytest.mark.parametrize("slop", [0, 1, 3])
def test_span_near_with_span_multi_prefix(rdr, slop):
    got = _match_docs(
        rdr,
        "span_near",
        {
            "clauses": [
                {"span_term": {"text": "merge"}},
                {"span_multi": {"match": {"prefix": {"text": {"value": "s"}}}}},
            ],
            "slop": slop,
            "in_order": True,
        },
    )
    want = _brute_multi_near("merge", lambda v: v.startswith("s"), slop)
    assert sorted(int(d) for d in got) == want


def test_span_near_with_span_multi_fuzzy(rdr):
    # 'sprt' is 1 edit from 'sort' — the fuzzy slot must accept it
    got = _match_docs(
        rdr,
        "span_near",
        {
            "clauses": [
                {"span_term": {"text": "merge"}},
                {"span_multi": {"match": {"fuzzy": {"text": {"value": "sprt"}}}}},
            ],
            "slop": 1,
            "in_order": True,
        },
    )
    want = _brute_multi_near("merge", lambda v: v == "sort", 1)
    assert sorted(int(d) for d in got) == want


def test_span_multi_unordered_rejected(rdr):
    with pytest.raises(ValueError, match="in_order"):
        _match_docs(
            rdr,
            "span_near",
            {
                "clauses": [
                    {"span_term": {"text": "merge"}},
                    {"span_multi": {"match": {"prefix": {"text": {"value": "s"}}}}},
                ],
                "in_order": False,
            },
        )


def test_span_near_all_terms_path_unchanged(rdr):
    """A pure span_term chain still routes through intervals_docs
    (ordered + unordered both work)."""
    got = _match_docs(
        rdr,
        "span_near",
        {
            "clauses": [
                {"span_term": {"text": "merge"}},
                {"span_term": {"text": "sort"}},
            ],
            "slop": 3,
            "in_order": False,
        },
    )
    assert sorted(int(d) for d in got) == _brute_near("merge", "sort", 3, False)


@pytest.fixture(scope="module")
def masked_rdr(ray_session, tmp_path_factory):
    """Index with a shadow text field carrying the SAME text — the
    aligned-positions precondition span_field_masking requires."""
    tmp = tmp_path_factory.mktemp("spanmask")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(DOCS))),
                "text": DOCS,
                "shadow": DOCS,
            }
        ),
        str(tmp / "d.parquet"),
    )
    idx = str(tmp / "idx")
    build_index(
        str(tmp / "d.parquet"),
        idx,
        key_col="doc_id",
        id_col="doc_id",
        ts_col=None,
        text_cols=("text", "shadow"),
        num_buckets=2,
        positions=True,
    )
    return IndexReader(idx)


def test_span_field_masking_cross_field_near(masked_rdr):
    """'sort' from the shadow field masked as text, chained after
    'merge' on text — must equal the single-field chain because the
    fields tokenize the same content."""
    masked = _match_docs(
        masked_rdr,
        "span_near",
        {
            "clauses": [
                {"span_term": {"text": "merge"}},
                {
                    "span_field_masking": {
                        "query": {"span_term": {"shadow": "sort"}},
                        "field": "text",
                    }
                },
            ],
            "slop": 2,
            "in_order": True,
        },
    )
    plain = _match_docs(
        masked_rdr,
        "span_near",
        {
            "clauses": [
                {"span_term": {"text": "merge"}},
                {"span_term": {"text": "sort"}},
            ],
            "slop": 2,
            "in_order": True,
        },
    )
    assert masked.tolist() == plain.tolist()
    assert sorted(int(d) for d in masked) == _brute_near("merge", "sort", 2, True)
