"""Term-dictionary multi-term queries (prefix / wildcard / fuzzy)
against brute force computed in-test. Reference behavior: OpenSearch
multi-term queries rewrite to a constant-score doc set over Lucene's
term dictionary."""

import fnmatch
import re

import numpy as np
import pyarrow as pa
import pytest

from raybm25.index.build import build_index
from raybm25.query.engine import IndexReader

TOK = re.compile(r"[a-z0-9]+")

DOCS = [
    "merge marge mirge sorting",
    "part port past fast",
    "stream steam strewn",
    "partition partial parts",
    "unrelated words only",
    "merge part stream again",
]


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]


@pytest.fixture(scope="module")
def rdr(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("multiterm")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"doc_id": list(range(len(DOCS))), "text": DOCS}),
        str(tmp / "d.parquet"),
    )
    idx = str(tmp / "idx")
    build_index(str(tmp / "d.parquet"), idx, key_col="doc_id", id_col="doc_id",
                ts_col=None, num_buckets=2)
    return IndexReader(idx)


def _vocab():
    return sorted({t for d in DOCS for t in TOK.findall(d.lower())})


def test_term_dictionary_is_sorted_vocab(rdr):
    assert rdr.term_dictionary().to_pylist() == _vocab()


def test_expand_prefix(rdr):
    for p in ["par", "m", "st", "zz", "partition"]:
        want = [t for t in _vocab() if t.startswith(p)]
        assert rdr.expand_prefix(p) == want


def test_expand_wildcard(rdr):
    for pat in ["m?rge", "p*t", "*art*", "s?????", "*", "zz*"]:
        want = [t for t in _vocab() if fnmatch.fnmatchcase(t, pat)]
        assert sorted(rdr.expand_wildcard(pat)) == want


def test_expand_fuzzy_vs_brute(rdr):
    for probe, d in [("merge", 1), ("part", 1), ("part", 2), ("stream", 2),
                     ("xyzzy", 1), ("partitio", 1)]:
        want = sorted(t for t in _vocab() if _lev(probe, t) <= d)
        assert sorted(rdr.expand_fuzzy(probe, max_edits=d)) == want


def test_expand_fuzzy_prefix_length(rdr):
    full = rdr.expand_fuzzy("part", max_edits=2)
    pl = rdr.expand_fuzzy("part", max_edits=2, prefix_length=2)
    assert sorted(pl) == sorted(t for t in full if t.startswith("pa"))


def test_docs_are_unions(rdr):
    toked = [set(TOK.findall(d.lower())) for d in DOCS]
    terms = rdr.expand_wildcard("p*t")
    want = sorted(d for d, t in enumerate(toked) if t & set(terms))
    assert rdr.wildcard_docs("p*t").tolist() == want

    terms = rdr.expand_fuzzy("merge", 1)
    want = sorted(d for d, t in enumerate(toked) if t & set(terms))
    assert rdr.fuzzy_docs("merge", 1).tolist() == want

    terms = rdr.expand_prefix("par")
    want = sorted(d for d, t in enumerate(toked) if t & set(terms))
    assert rdr.dict_prefix_docs("par").tolist() == want

    assert rdr.wildcard_docs("zz*").size == 0
    assert rdr.fuzzy_docs("qqqqqqqq", 1).size == 0


def test_keyword_terms_excluded_from_text_dictionary(ray_session, tmp_path):
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"doc_id": [0, 1], "text": ["alpha beta", "beta gamma"],
                  "lang": ["en", "de"]}),
        str(tmp_path / "d.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(str(tmp_path / "d.parquet"), idx, key_col="doc_id",
                id_col="doc_id", ts_col=None, keyword_cols=("lang",),
                num_buckets=1)
    r = IndexReader(idx)
    assert r.term_dictionary().to_pylist() == ["alpha", "beta", "gamma"]
    # keyword-field dictionary, values with the field prefix stripped
    assert r.term_dictionary("lang").to_pylist() == ["de", "en"]
    # expansion over the keyword field routes through "lang:" terms
    assert r.dict_prefix_docs("e", field="lang").tolist() == [0]


def test_fuzziness_auto_ladder():
    from raybm25.query.dsl import _fuzziness

    assert _fuzziness("AUTO", "ab") == 0
    assert _fuzziness("AUTO", "abc") == 1
    assert _fuzziness("AUTO", "abcde") == 1
    assert _fuzziness("AUTO", "abcdef") == 2
    assert _fuzziness("AUTO:2,4", "ab") == 1
    assert _fuzziness("AUTO:2,4", "a") == 0
    assert _fuzziness("AUTO:2,4", "abcd") == 2
    assert _fuzziness(2, "xy") == 2
    import pytest as _pt

    with _pt.raises(ValueError):
        _fuzziness("AUTO:x,y", "abc")


def test_fuzzy_auto_in_dsl(rdr):
    import numpy as np

    from raybm25.query.dsl import _match_docs

    auto = _match_docs(rdr, "fuzzy", {"text": {"value": "mergX", "fuzziness": "AUTO"}})
    one = _match_docs(rdr, "fuzzy", {"text": {"value": "mergX", "fuzziness": 1}})
    assert np.array_equal(auto, one)  # len 5 -> 1 edit


# ------------------------------------------------------------- OSA fuzzy
# (transpositions=True, round 5)


def _osa(a: str, b: str) -> int:
    """Reference restricted Damerau-Levenshtein (optimal string
    alignment) — Lucene's transpositions=true distance."""
    la, lb = len(a), len(b)
    d = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        d[i][0] = i
    for j in range(lb + 1):
        d[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            cost = a[i - 1] != b[j - 1]
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + cost)
            if (
                i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
    return d[la][lb]


def test_expand_fuzzy_osa_vs_brute(rdr):
    for probe, d in [("mrege", 1), ("merge", 1), ("part", 1), ("aprt", 1),
                     ("stream", 2), ("sterma", 2), ("partitio", 2)]:
        want = sorted(t for t in _vocab() if _osa(probe, t) <= d)
        got = sorted(rdr.expand_fuzzy(probe, max_edits=d, transpositions=True))
        assert got == want, (probe, d)


def test_osa_counts_swap_as_one_edit(rdr):
    # 'mrege' -> 'merge' is one adjacent swap: OSA matches at 1 edit,
    # plain Levenshtein (distance 2) does not
    assert "merge" in rdr.expand_fuzzy("mrege", max_edits=1, transpositions=True)
    assert "merge" not in rdr.expand_fuzzy("mrege", max_edits=1)


def test_osa_random_strings_vs_reference():
    # kernel-level check over random alphabet-3 strings (dense edit /
    # swap interactions, incl. the OSA != unrestricted-DL cases)
    import random

    import pyarrow as pa

    from raybm25.query.engine import IndexReader

    rng = random.Random(7)
    vocab = sorted(
        {
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
            for _ in range(160)
        }
    )

    class _Stub(IndexReader):
        def __init__(self, terms):
            self._terms = pa.array(terms, pa.string())

        def term_dictionary(self, field=None):
            return self._terms

    stub = _Stub(vocab)
    for probe in ["ab", "ba", "abc", "cab", "ca", "acb", "bca", "aabbcc"]:
        for d in (1, 2):
            want = sorted(t for t in vocab if _osa(probe, t) <= d)
            got = sorted(stub.expand_fuzzy(probe, max_edits=d, transpositions=True))
            assert got == want, (probe, d)
