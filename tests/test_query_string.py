"""Lucene query_string syntax: parse shapes, scoring vs brute-force
composition of engine primitives, and loud errors. Reference behavior:
OpenSearch `query_string` (classic Lucene QueryParser)."""

import re

import numpy as np
import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.query.dsl import run_query
from raybm25.query.engine import IndexReader
from raybm25.query.querystring import (
    parse_query_string,
    query_string_docs,
    query_string_hits,
)

TOK = re.compile(r"[a-z0-9]+")

DOCS = [
    ("the quick brown fox", "en", 100),
    ("quick quick dog", "en", 250),
    ("lazy dog sleeps", "de", 250),
    ("brown bear eats fox", "fr", 400),
    ("the fox and the dog", "en", 999),
    ("testing tests", "de", 50),
    ("nothing relevant", "pt", 77),
]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("qstr")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(DOCS))),
                "text": [t for t, _, _ in DOCS],
                "lang": [l for _, l, _ in DOCS],
                "size": [s for _, _, s in DOCS],
            }
        ),
        str(tmp / "d.parquet"),
    )
    idx = str(tmp / "idx")
    build_index(
        str(tmp / "d.parquet"), idx, key_col="doc_id", id_col="doc_id",
        ts_col=None, keyword_cols=("lang",),
        stored_cols=["text", "lang", "size"], num_buckets=2,
        positions=True,
    )
    return idx, IndexReader(idx)


# ------------------------------------------------------------------ parsing
def test_parse_precedence():
    ast = parse_query_string("a OR b AND c")
    # AND binds tighter: a OR (b AND c)
    assert ast == (
        "group",
        [
            ("should", ("leaf", "match", None, "a")),
            (
                "should",
                ("group", [
                    ("must", ("leaf", "match", None, "b")),
                    ("must", ("leaf", "match", None, "c")),
                ]),
            ),
        ],
    )


def test_parse_prefixes_and_leaves():
    ast = parse_query_string('+a -b "x y" f:[1 TO 2} s:>=3 w*d e~1 _exists_:lang')
    kinds = [(occur, n[1] if n[0] == "leaf" else n[0]) for occur, n in ast[1]]
    assert kinds == [
        ("must", "match"), ("must_not", "match"), ("should", "phrase"),
        ("should", "range"), ("should", "range"), ("should", "wildcard"),
        ("should", "fuzzy"), ("should", "exists"),
    ]
    leaves = [n for _, n in ast[1]]
    assert leaves[3] == ("leaf", "range", "f", {"gte": 1, "lt": 2})
    assert leaves[4] == ("leaf", "range", "s", {"gte": 3})
    assert leaves[6] == ("leaf", "fuzzy", None, ("e", 1))
    assert leaves[7] == ("leaf", "exists", None, "lang")


def test_parse_errors():
    with pytest.raises(ValueError, match="unbalanced"):
        parse_query_string("(a b")
    with pytest.raises(ValueError, match="expected a clause"):
        parse_query_string("a AND")
    with pytest.raises(ValueError, match="range needs a field"):
        parse_query_string("[1 TO 2]")
    with pytest.raises(ValueError, match="trailing input"):
        parse_query_string("a ) b")


# ------------------------------------------------------------------ scoring
def test_terms_sum_matches_search(built):
    _, r = built
    got = query_string_hits(r, {"query": "quick fox"}, k=10)
    want = r.search("quick fox", k=10)
    assert [(d, pytest.approx(s)) for d, s in want] == got


def test_and_vs_or_default_operator(built):
    _, r = built
    or_hits = query_string_hits(r, {"query": "quick fox"}, k=10)
    and_hits = query_string_hits(
        r, {"query": "quick fox", "default_operator": "and"}, k=10
    )
    and_docs = {d for d, _ in and_hits}
    assert and_docs == {0}  # only doc 0 has both
    assert and_docs < {d for d, _ in or_hits}
    # same scores where both match
    assert dict(or_hits)[0] == pytest.approx(dict(and_hits)[0])


def test_not_and_plus(built):
    _, r = built
    hits = query_string_hits(r, {"query": "+dog -lazy"}, k=10)
    docs = {d for d, _ in hits}
    assert docs == {1, 4}  # dog docs minus the lazy one
    hits2 = query_string_hits(r, {"query": "dog NOT lazy"}, k=10)
    assert {d for d, _ in hits2} == docs


def test_boost_leaf_and_group(built):
    _, r = built
    base = dict(query_string_hits(r, {"query": "fox"}, k=10))
    boosted = dict(query_string_hits(r, {"query": "fox^3"}, k=10))
    assert boosted == {d: pytest.approx(3 * s) for d, s in base.items()}
    gb = dict(query_string_hits(r, {"query": "(fox dog)^2"}, k=10))
    plain = dict(query_string_hits(r, {"query": "fox dog"}, k=10))
    assert gb == {d: pytest.approx(2 * s) for d, s in plain.items()}


def test_fielded_keyword_and_range_score_constant(built):
    _, r = built
    hits = dict(query_string_hits(r, {"query": "lang:de"}, k=10))
    assert hits == {2: 1.0, 5: 1.0}
    hits = dict(query_string_hits(r, {"query": "size:[200 TO 400]"}, k=10))
    assert hits == {1: 1.0, 2: 1.0, 3: 1.0}
    hits = dict(query_string_hits(r, {"query": "size:>400"}, k=10))
    assert hits == {4: 1.0}


def test_phrase_and_wildcard_and_fuzzy(built):
    _, r = built
    ph = dict(query_string_hits(r, {"query": '"quick brown"'}, k=10))
    assert set(ph) == {0}
    assert ph[0] == pytest.approx(dict(r.search_phrase("quick brown", 10))[0])
    wc = dict(query_string_hits(r, {"query": "te*"}, k=10))
    assert set(wc) == {5} and wc[5] == 1.0
    fz = dict(query_string_hits(r, {"query": "quik~1"}, k=10))
    assert set(fz) == {0, 1}


def test_exists_and_mixed_sum(built):
    _, r = built
    # fox + a constant-score range: score = bm25(fox) + 1.0 on the AND set
    hits = dict(
        query_string_hits(
            r, {"query": "fox AND size:[50 TO 500]"}, k=10
        )
    )
    base = dict(r.search_pruned("fox", r.n_docs))
    assert set(hits) == {0, 3}
    for d in hits:
        assert hits[d] == pytest.approx(base[d] + 1.0)


def test_docs_and_dsl_route(built):
    idx, r = built
    docs = query_string_docs(r, {"query": "dog -lazy"})
    assert docs.tolist() == [1, 4]
    resp = run_query(idx, {
        "query": {"query_string": {"query": "quick fox"}}, "size": 3,
    })
    assert [h["_id"] for h in resp["hits"]["hits"]] == [
        d for d, _ in r.search("quick fox", k=3)
    ]


def test_pure_negative_raises(built):
    _, r = built
    with pytest.raises(ValueError, match="positive clause"):
        query_string_hits(r, {"query": "-fox"}, k=10)


# ------------------------------------------------------------- robustness
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.sampled_from('ab ()"+-^:[]{}*?~!&|125.TO'), max_size=40))
def test_parser_total(q):
    """The parser is TOTAL over arbitrary input: it returns an AST or
    raises ValueError — never an unhandled exception."""
    try:
        parse_query_string(q)
    except ValueError:
        pass


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from(["alpha", "dog", "fox", "zzz"]),
                min_size=1, max_size=4),
       st.sampled_from(["or", "and"]))
def test_bare_terms_match_engine(built, terms, op):
    """Bare-term query_strings score identically to the engine's own
    match evaluation for both default operators."""
    _, r = built
    q = " ".join(terms)
    got = query_string_hits(r, {"query": q, "default_operator": op}, k=10)
    if op == "and":
        want = r.search_bool(must=q, k=10)
    else:
        want = r.search(q, k=10)
    assert [(d, round(s, 9)) for d, s in got] == [
        (d, round(s, 9)) for d, s in want
    ]
