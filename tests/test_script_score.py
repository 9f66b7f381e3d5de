"""script_score: the painless-subset compiler (whitelist, vectorized
eval) and the engine/DSL wiring."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raybm25.index.build import build_index
from raybm25.query.dsl import run_query
from raybm25.query.engine import IndexReader
from raybm25.query.script import compile_script


def test_compile_and_eval_vectorized():
    fn = compile_script("_score * 2 + doc['n_chars'].value / 1000.0")
    assert fn.fields == ["n_chars"]
    s = np.array([1.0, 2.0])
    out = fn(s, {"n_chars": np.array([100.0, 500.0])})
    np.testing.assert_allclose(out, [2.1, 4.5])


def test_math_functions_and_constant_result():
    fn = compile_script("Math.log(1 + _score) + Math.sqrt(doc['x'].value)")
    out = fn(np.array([0.0, np.e - 1]), {"x": np.array([4.0, 9.0])})
    np.testing.assert_allclose(out, [2.0, 4.0])
    # a script ignoring _score still broadcasts to the candidate shape
    const = compile_script("3.5")
    np.testing.assert_allclose(const(np.zeros(4), {}), [3.5] * 4)


@pytest.mark.parametrize(
    "src",
    [
        "__import__('os').system('true')",
        "open('/etc/passwd')",
        "_score ** 2",             # Pow not in the subset
        "[1,2][0]",
        "doc['x']",                # subscript without .value
        "lambda: 1",
        "_score.real",             # attribute access
        "unknown_var + 1",
        "max(1, 2, key=None)",     # keywords rejected
        "",
    ],
)
def test_compile_rejects_outside_subset(src):
    with pytest.raises(ValueError):
        compile_script(src)


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("scriptscore")
    pq.write_table(
        pa.table(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "merge join", "merge merge sort", "join stream", "merge",
                ],
                "n_chars": [1000, 200, 300, 4000],
            }
        ),
        str(tmp / "d.parquet"),
    )
    d = str(tmp / "idx")
    build_index(str(tmp / "d.parquet"), d, key_col="doc_id", id_col="doc_id",
                ts_col=None, stored_cols=["text", "n_chars"], num_buckets=2)
    return d


def test_engine_script_score_matches_hand_combination(idx):
    r = IndexReader(idx)
    base = dict(r.search("merge", k=10))
    hits = r.search_script_score(
        "merge", "_score * 2 + doc['n_chars'].value / 1000.0", k=10
    )
    assert set(d for d, _ in hits) == set(base)
    chars = {0: 1000, 1: 200, 3: 4000}
    for d, s in hits:
        assert s == pytest.approx(base[d] * 2 + chars[d] / 1000.0, abs=1e-12)
    # rank re-ordered by the script (doc 3's big n_chars wins ties up)
    assert [d for d, _ in hits] == sorted(
        base, key=lambda d: (-(base[d] * 2 + chars[d] / 1000.0), d)
    )


def test_dsl_script_score(idx):
    resp = run_query(
        idx,
        {
            "query": {
                "script_score": {
                    "query": {"match": {"text": "merge"}},
                    "script": {"source": "doc['n_chars'].value"},
                }
            },
            "size": 2,
        },
    )
    ids = [h["_id"] for h in resp["hits"]["hits"]]
    assert ids == [3, 0]  # pure doc-value order among 'merge' matches
    assert resp["hits"]["hits"][0]["_score"] == 4000.0
    with pytest.raises(ValueError, match="'match' inner query"):
        run_query(idx, {"query": {"script_score": {
            "query": {"term": {"lang": "en"}}, "script": {"source": "1"}}}})
