"""Local stand-in for the driver's contract check: run a queries()
entry and its oracle_sql() side-by-side over one sf dir and compare
rows / schema / order-insensitive value hash.

Usage: python tests/driver_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    df = _norm(df.copy())
    body = df.to_csv(index=False, float_format="%.12g").encode()
    return hashlib.sha256(body).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]

    import ray

    ray.init(
        address="local", num_cpus=int(__import__("os").environ.get("CHECK_CPUS", "8")), include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = names or list(qs)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = 0
    for name in names:
        res = qs[name](sf_dir)
        if hasattr(res, "to_pandas"):
            res = res.to_pandas()
        if name not in oracles:
            print(f"{name}: rows={len(res)} (no_oracle)")
            continue
        want = con.execute(oracles[name]).fetchdf()
        rows = len(res) == len(want)
        schema = sorted(res.columns) == sorted(want.columns)
        hmatch = value_hash(res) == value_hash(want)
        ok = rows and schema and hmatch
        failures += not ok
        print(
            f"{name}: rows={rows}({len(res)}/{len(want)}) schema={schema} hash={hmatch}"
            + ("" if ok else "  <-- FAIL")
        )
        if not schema:
            print(f"  ray cols: {sorted(res.columns)}  oracle cols: {sorted(want.columns)}")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
