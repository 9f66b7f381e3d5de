from .engine import IndexReader, BatchSearcher  # noqa: F401
from .dsl import (  # noqa: F401
    run_analyze,
    run_count,
    run_explain,
    run_query,
    run_stats,
)
