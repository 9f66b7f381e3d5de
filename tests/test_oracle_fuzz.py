"""Fuzz the stage-vs-SQL-oracle equivalence for the text-filter
entries on adversarial random corpora (newlines, quotes, braces,
dots, bullets — the characters the SQL mirrors must handle exactly),
not just the synthetic corpus the driver samples."""

import duckdb
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from raybm25.contract import ORACLE_SQL

# printable, SQL-literal-safe alphabet exercising every rule: no
# backslashes or single quotes (the oracle strings embed literals; the
# corpus goes in via a registered view, so quotes would be fine, but
# keeping the alphabet focused makes shrunken failures readable).
# U+00A0/U+2028 pin the ASCII-\S+ split: str.split() would treat them
# as separators while the oracle's RE2 classes do not
ALPHA = "aAbB Je.!?\"{#-* \n01javascript LOREM ipsum\u00a0\u2028"

texts_strategy = st.lists(
    st.text(alphabet=ALPHA, min_size=0, max_size=120),
    min_size=1,
    max_size=12,
)


def _run_oracle(name: str, df: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", df)
    out = con.execute(ORACLE_SQL[name]).fetchdf()
    con.close()
    return out


def _table(texts) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


@given(texts_strategy)
@settings(max_examples=40, deadline=None)
def test_gopher_matches_oracle(texts):
    from raybm25.extras.textstats import gopher_batch

    got = (
        gopher_batch(_table(texts))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        _run_oracle("gopher_quality", _table(texts).to_pandas())
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False,
    )


@given(texts_strategy)
@settings(max_examples=40, deadline=None)
def test_c4_matches_oracle(texts):
    from raybm25.extras.textstats import c4_batch

    got = (
        c4_batch(_table(texts))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        _run_oracle("c4_clean", _table(texts).to_pandas())
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False,
    )


@given(texts_strategy)
@settings(max_examples=40, deadline=None)
def test_bpe_encode_matches_oracle(texts):
    from raybm25.contract import _BPE_FIXED_MERGES
    from raybm25.extras.bpe import BpeEncodeStage

    got = (
        BpeEncodeStage(_BPE_FIXED_MERGES)(_table(texts))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        _run_oracle("bpe_encode_fixed", _table(texts).to_pandas())
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["n_bpe"].tolist() == want["n_bpe"].astype(int).tolist()
