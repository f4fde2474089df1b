"""Exact phrase matching over the normalized token stream.

The reference is an embedding engine with no phrase capability; a fulltext
engine (this repo's tier) needs one. The brute path here is pure Catalyst:
the per-doc normalized stream (the SAME ``' '.join(tokens)`` string the
uninvert roundtrip reproduces, functions/uninvert.py) is searched for the
normalized phrase with literal, boundary-padded `replace` arithmetic — no
UDF, whole-stage codegen end to end, and the identical algorithm runs in the
DuckDB oracle, so counts match bit-for-bit.

Semantics: tokens are the engine's one tokenizer ([A-Za-z0-9]+, ascii-lower);
a match is the phrase's tokens CONSECUTIVE in the stream. Occurrences are
counted non-overlapping left-to-right (immediately adjacent repeats of the
same phrase share a delimiter space and count once — deterministic and
documented; both engines implement the same rule).

At 100 TB the same predicate pushes into a scan over any column-pruned
(doc_id, text) projection; a positional-postings index variant (positions as
a fourth varint stream per posting) is the upgrade path if phrase queries
ever dominate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_expr


def _norm_stream(text: str | Column) -> Column:
    """' ' + join(tokens, ' ') + ' ' — boundary-padded normalized stream."""
    col = F.col(text) if isinstance(text, str) else text
    return F.concat(F.lit(" "), F.array_join(tokens_expr(col), " "), F.lit(" "))


def phrase_count_expr(text_col: str, phrase_norm: str) -> Column:
    """Occurrences of the normalized phrase in the normalized stream.

    count = (len(s) - len(replace(s, pat, ''))) / len(pat), pat boundary-
    padded — literal (non-regex) replace, identical in Spark and DuckDB.
    """
    pat = f" {phrase_norm} "
    s = _norm_stream(text_col)
    return (
        (F.length(s) - F.length(F.replace(s, F.lit(pat), F.lit(""))))
        / F.lit(len(pat))
    ).cast("int")


def phrase_matches(
    docs: DataFrame,
    phrase: str,
    top: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase search -> (doc_id, n_hits) ranked (n_hits DESC, doc ASC).

    The phrase is normalized with the engine tokenizer before matching, so
    'Merge... SPARK!' and 'merge spark' are the same query.
    """
    import pandas as pd

    from ..functions.tokenize import tokenize_pd

    toks = list(tokenize_pd(pd.Series([phrase]))[0])
    if not toks:
        return docs.sparkSession.createDataFrame([], "doc_id long, n_hits int")
    norm = " ".join(toks)
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        phrase_count_expr(text_col, norm).alias("n_hits"),
    ).filter(F.col("n_hits") > 0)
    return out.orderBy(F.desc("n_hits"), F.asc("doc_id")).limit(top)
