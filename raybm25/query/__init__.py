from .engine import IndexReader, BatchSearcher  # noqa: F401
from .dsl import run_query, run_count, run_explain  # noqa: F401
