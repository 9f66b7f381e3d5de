"""Mimics the driver's correctness harness: run every queries() entry at
sf0.001 and compare against oracle_sql() via DuckDB — row count, column
names, and order-insensitive values (exact, incl. float bits)."""

import os

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

# Entries whose oracle can only match to the driver's 6-dp bar (see the
# float-compare comment below); everything else must match bit-exactly.
ULP_TOLERANT = {
    "agg_ttest_lang",      # Welch dof: numpy vs DuckDB accumulation order
    "geo_centroid_agg",    # float means of derived degrees
    "hybrid_minmax_topk",  # cosine over float32-stored vectors
    "knn_dsl",             # same float32-storage cosine
    "embedding_cosine_topk",
    "embedding_neardup",
}

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _to_pandas(obj):
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    return obj


def pytest_generate_tests(metafunc):
    if "qname" in metafunc.fixturenames:
        import __ray_entry__ as e

        metafunc.parametrize("qname", sorted(e.queries().keys()))


def test_queries_match_oracle(qname, ray_session, con):
    import __ray_entry__ as e

    q = e.queries()[qname]
    sql = e.oracle_sql().get(qname)
    got = _normalize(_to_pandas(q(SF_DIR)))
    assert len(got) >= 0
    if sql is None:
        return
    exp = _normalize(con.sql(sql).df())
    assert list(got.columns) == list(exp.columns), f"{qname} columns"
    assert len(got) == len(exp), f"{qname} row count"
    for col in exp.columns:
        a, b = got[col].to_numpy(), exp[col].to_numpy()
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            import numpy as np

            # equal_nan: NULL range bounds (open-ended aggs) surface as
            # NaN on both sides; the driver's CSV hash treats them equal.
            # Bit-exactness is the bar for every entry EXCEPT the
            # allowlisted few whose engine-vs-DuckDB accumulation
            # differs structurally at the ULP level (Welch dof /
            # centroid means: parallel-agg order; min-max hybrid:
            # float32-storage cosine) — those get the driver's
            # round-to-6dp definition. A BM25-score regression of 1e-7
            # still fails here.
            af, bf = a.astype(float), b.astype(float)
            if qname in ULP_TOLERANT:
                assert np.array_equal(
                    np.round(af, 6), np.round(bf, 6), equal_nan=True
                ), f"{qname}.{col} float values (6dp)"
            else:
                assert np.array_equal(
                    af, bf, equal_nan=True
                ), f"{qname}.{col} float values (bit-exact)"
        else:
            assert (a == b).all(), f"{qname}.{col} values"


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    out = e.entry()
    assert len(out) >= 0
    assert {"query_id", "rank", "doc_id", "score"} <= set(out.columns)
