from .build import build_index
from .query import IndexReader

__all__ = ["build_index", "IndexReader"]
