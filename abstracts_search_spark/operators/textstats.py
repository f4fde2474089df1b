"""Text-analysis operators for training-data pipelines.

All are pure Catalyst expressions over the `documents` table (driver testdata)
or any (id, text) pair: language-ID heuristic, quality scoring, token
counting, and md5-based document fingerprinting. Every one is also expressible
in ANSI/DuckDB SQL, so each has an exact driver oracle (__spark_entry__.py).

Cross-engine determinism rules used throughout this module and the dedup /
similarity modules:
- hashing is md5 hex strings (identical in Spark and DuckDB);
- float outputs are rounded to 6 decimals before comparison;
- tokenization is the engine's single tokenizer (functions/tokenize.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_expr

# deliberately tiny, fixed stopword list — part of the operator's contract
EN_STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it", "for", "on"]


def shingles_expr(tokens: Column, n: int = 3) -> Column:
    """array<string> tokens -> array<string> of n-word shingles (may be empty)."""
    count = F.size(tokens) - F.lit(n - 1)
    return F.when(
        count > 0,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-ratio language heuristic -> (id, stop_ratio, lang_pred)."""
    toks = tokens_expr(text_col)
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(EN_STOPWORDS)))
    ratio = F.when(n > 0, n_stop.cast("double") / n.cast("double")).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        F.round(ratio, 6).alias("stop_ratio"),
        F.when(ratio >= 0.03, F.lit("en")).otherwise(F.lit("other")).alias("lang_pred"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Length/punctuation/diversity quality signals + a combined score."""
    toks = tokens_expr(text_col)
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_chars = F.length(F.coalesce(F.col(text_col), F.lit("")))
    n_punct = F.size(F.expr(f"regexp_extract_all(coalesce({text_col}, ''), '[^A-Za-z0-9 ]', 0)"))
    diversity = F.when(n > 0, n_distinct.cast("double") / n).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0))
    len_score = F.least(n.cast("double") / F.lit(100.0), F.lit(1.0))
    score = F.round(len_score * 0.4 + diversity * 0.4 + (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0))) * 0.2, 6)
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.round(diversity, 6).alias("diversity"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        score.alias("quality"),
    )


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace tokens, alnum tokens, and a BPE-ish piece estimate."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    ws = F.size(F.filter(F.split(txt, "\\s+"), lambda t: t != ""))
    alnum = F.size(tokens_expr(text_col))
    # regexp over the coalesced text: F.size(NULL) is -1, which would turn a
    # NULL document into bpe_pieces = -3 while the DuckDB oracle returns 0
    alpha_runs = F.size(F.expr(f"regexp_extract_all(coalesce({text_col}, ''), '[A-Za-z]+', 0)"))
    digits = F.size(F.expr(f"regexp_extract_all(coalesce({text_col}, ''), '[0-9]', 0)"))
    other = F.size(F.expr(f"regexp_extract_all(coalesce({text_col}, ''), '[^A-Za-z0-9 ]', 0)"))
    return df.select(
        F.col(id_col),
        ws.cast("long").alias("ws_tokens"),
        alnum.cast("long").alias("alnum_tokens"),
        (alpha_runs + digits + other).cast("long").alias("bpe_pieces"),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Shingle fingerprint: min md5 over 3-word shingles (fallback: whole text).

    A deterministic content fingerprint usable for near-dup candidate keys;
    md5 keeps it identical across Spark/DuckDB.
    """
    toks = tokens_expr(text_col)
    sh = shingles_expr(toks, 3)
    min_sh = F.array_min(F.transform(sh, F.md5))
    whole = F.md5(F.concat_ws(" ", toks))
    return df.select(F.col(id_col), F.coalesce(min_sh, whole).alias("fp"))
