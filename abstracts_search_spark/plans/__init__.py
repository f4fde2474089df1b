from .build import build_doc_index, build_index
from .query import IndexReader

__all__ = ["build_doc_index", "build_index", "IndexReader"]
