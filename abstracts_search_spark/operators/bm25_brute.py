"""Brute-force exact BM25 — the index-free query path (SURVEY.md §7 M1).

Scores every document for a query with pure DataFrame ops: tokenize →
posexplode → tf → join df/N/avgdl → BM25 expression → TakeOrderedAndProject.
This IS the oracle the indexed path (segments + merge + WAND) must match
rank-identically (north_rule). All arithmetic in float64.

BM25 (k1=1.2, b=0.75, BASELINE.json north_star):
    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d, q) = Σ_{t ∈ distinct(q)} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))

Duplicate query terms count once (distinct-term semantics, documented; the
same rule is applied in the WAND path and all oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import B_BM25, K1
from ..functions.tokenize import tokenize_pd, tokens_expr


def doc_tokens(
    docs: DataFrame,
    text_col: str = "document",
    id_col: str = "doc_id",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """docs -> (doc_id, [carry...], term, tf, doclen). Catalyst tokenize+explode.

    ``carry`` columns (e.g. src_part) are functionally dependent on doc_id and
    ride through the groupBy unchanged.

    Tokenization uses the Arrow-vectorized pandas UDF — the Catalyst
    tokens_expr is semantically identical (tested) but higher-order-function
    lambdas evaluate interpreted (~ms/doc), so the UDF is the hot path.
    """
    from ..functions.tokenize import tokenize_udf

    toks = docs.select(
        F.col(id_col).alias("doc_id"), *carry, tokenize_udf(text_col).alias("tokens")
    ).withColumn("doclen", F.size("tokens"))
    return (
        toks.select("doc_id", *carry, "doclen", F.explode("tokens").alias("term"))
        .groupBy("doc_id", *carry, "doclen", "term")
        .agg(F.count("*").alias("tf"))
    )


def bm25_score_all(
    tokens: DataFrame,
    query_terms: list[str],
    k1: float = K1,
    b: float = B_BM25,
) -> DataFrame:
    """tokens(doc_id, doclen, term, tf) -> (doc_id, score) for every matching doc.

    The query-term list is tiny → broadcast join against the tf table; stats
    and df are computed on the fly (the indexed path reads them from the
    `stats`/`dictionary` tables instead).
    """
    spark = tokens.sparkSession
    terms = sorted(set(query_terms))
    stats = tokens.select("doc_id", "doclen").distinct().agg(
        F.count("*").alias("n_docs"), F.avg("doclen").alias("avgdl")
    )
    dfs = term_df_for(tokens, terms)
    qt = spark.createDataFrame([(t,) for t in terms], "term string")
    matched = tokens.join(F.broadcast(qt), "term")
    scored = (
        matched.join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * F.col("tf").cast("double")
            * F.lit(k1 + 1.0)
            / (
                F.col("tf").cast("double")
                + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("doclen") / F.col("avgdl"))
            ),
        )
    )
    return scored.groupBy("doc_id").agg(F.sum("contrib").alias("score"))


def term_df_for(tokens: DataFrame, terms: list[str]) -> DataFrame:
    return (
        tokens.filter(F.col("term").isin(terms))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )


def bm25_topk_brute(
    tokens: DataFrame,
    query_text: str,
    k: int = 10,
    k1: float = K1,
    b: float = B_BM25,
) -> DataFrame:
    """Top-k (doc_id, score), tie-break (score DESC, doc_id ASC) — exact.

    `orderBy(...).limit(k)` plans as TakeOrderedAndProject: per-partition
    heaps + driver merge of k·P rows, never a global sort (SURVEY.md §2.6 T2).
    """
    import pandas as pd

    terms = list(tokenize_pd(pd.Series([query_text]))[0])
    if not terms:
        spark = tokens.sparkSession
        return spark.createDataFrame([], "doc_id long, score double")
    scores = bm25_score_all(tokens, terms, k1=k1, b=b)
    return scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
