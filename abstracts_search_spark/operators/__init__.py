from .assemble import assemble_documents
from .docids import assign_doc_ids
from .bm25_brute import bm25_score_all, bm25_topk_brute
from .stats import corpus_stats, term_df

__all__ = [
    "assemble_documents",
    "assign_doc_ids",
    "corpus_stats",
    "term_df",
    "bm25_score_all",
    "bm25_topk_brute",
]
