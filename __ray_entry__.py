"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash ->
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship: pages(sf0.001 documents) -> extract -> dedup -> postings
    -> BM25 top-k for the fixed query set (distributed actor pool)."""
    from raybm25.flagship import run_flagship

    return run_flagship("/root/testdata/sf0.001")


def _priority_order(names: list[str]) -> list[str]:
    """Driver-sampling order under the per-round cap: entries whose
    LATEST driver check failed first (their fixed re-check must get a
    row), then entries never oracle-checked (absent from every
    committed CORRECTNESS_r*.json), then the green rest; within each
    group the original contract order is kept."""
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, bool] = {}
    for p in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(p) as f:
                for n, rec in json.load(f).items():
                    ok = rec.get("hash_match")
                    if ok is None:
                        ok = rec.get("rows_match", True) and not rec.get("err")
                    last[n] = bool(ok)
        except Exception:
            continue
    failed = [n for n in names if last.get(n) is False]
    fresh = [n for n in names if n not in last and n not in failed]
    rest = [n for n in names if n not in failed and n in last]
    return failed + fresh + rest


def queries() -> dict[str, Callable[[str], Any]]:
    from raybm25.contract import QUERIES

    return {n: QUERIES[n] for n in _priority_order(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    from raybm25.contract import ORACLE_SQL, QUERIES

    order = _priority_order(list(QUERIES))
    out = {n: ORACLE_SQL[n] for n in order if n in ORACLE_SQL}
    # rows-only entries have no SQL; any extra oracle keys keep their place
    for n, s in ORACLE_SQL.items():
        out.setdefault(n, s)
    return out
