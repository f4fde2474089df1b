"""Corpus statistics + term document frequency (SURVEY.md §2.4 A4).

The analog of the reference's index-train step (k-means over the corpus →
global coarse structure, /root/reference/Makefile:38-39): our global
structures are the term dictionary (term → df) and scalar corpus stats
(N, avgdl). Plain hash aggregations — Spark's partial/final (map-side combine)
applies automatically, so the shuffle carries one row per (partition, term),
not per posting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def term_df(tokens: DataFrame) -> DataFrame:
    """tokens(doc_id, term, tf) -> (term, df). One row per term."""
    return tokens.groupBy("term").agg(F.count("*").alias("df"))


def corpus_stats(doclens: DataFrame) -> DataFrame:
    """doclens(doc_id, doclen) -> 1 row (n_docs, avgdl, total_tokens)."""
    return doclens.agg(
        F.count("*").alias("n_docs"),
        F.avg("doclen").alias("avgdl"),
        F.sum("doclen").alias("total_tokens"),
    )
