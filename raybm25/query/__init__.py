from .engine import IndexReader, BatchSearcher  # noqa: F401
