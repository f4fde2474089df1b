"""The engine's single tokenizer (SURVEY.md §2.8 F9).

The reference delegates tokenization to its embedding model's tokenizer
(/root/reference/requirements.txt:2-3, opaque); the target engine defines one
explicit tokenizer used IDENTICALLY at index-build time, at query time, and in
every oracle: extract ASCII alphanumeric runs ``[A-Za-z0-9]+`` from the raw
text, then lowercase each token. Lowercasing only pure-ASCII tokens keeps the
semantics engine-independent (Python/JVM/DuckDB unicode lowercasing differ on
exotic codepoints; ASCII lowering does not).

Three equivalent implementations are provided and tested for equality:

- ``tokenize_udf``  — Arrow-vectorized pandas UDF (the spec'd build path,
  BASELINE.json input_hint: "vectorized pandas/Arrow UDFs").
- ``tokens_expr``   — pure Catalyst expression (JVM-side, whole-stage
  codegen'd; used where staying in codegen wins).
- ``TOKENIZE_SQL_DUCKDB`` — the same in DuckDB SQL, for driver oracles.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

TOKEN_PATTERN = r"[A-Za-z0-9]+"
_TOKEN_RE = re.compile(TOKEN_PATTERN)

# DuckDB expression template: {col} -> list<varchar> of lowercase tokens.
TOKENIZE_SQL_DUCKDB = (
    "list_transform(list_filter(regexp_split_to_array({col}, '[^A-Za-z0-9]+'),"
    " t -> t <> ''), t -> lower(t))"
)


def tokenize_pd(texts: pd.Series) -> pd.Series:
    """pandas implementation: Series[str] -> Series[list[str]]."""
    return texts.fillna("").map(lambda t: [m.lower() for m in _TOKEN_RE.findall(t)])


@pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    return tokenize_pd(texts)


@pandas_udf(T.IntegerType())
def doclen_udf(texts: pd.Series) -> pd.Series:
    """Token count only — avoids materializing the token array through Arrow
    when just the length is needed (docID gating, docmap doclen)."""
    return texts.str.count(TOKEN_PATTERN).fillna(0).astype("int32")


def doclen_expr(col: Column | str) -> Column:
    """JVM token count: size(regexp_extract_all(text, pattern)) — a codegen
    expression, NOT a higher-order function and NOT a Python UDF, so the
    assembly stage that sums per-turn doclens stays whole-stage-codegen with
    zero Python workers. Verified equal to :func:`doclen_udf` (tests): the
    pattern is pure-ASCII, so Java and Python regex agree on every input."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(F.coalesce(c, F.lit("")), F.lit(TOKEN_PATTERN)).cast("int")


def tokens_expr(col: Column | str) -> Column:
    """Catalyst-only equivalent of :func:`tokenize_udf` (verified equal)."""
    c = F.col(col) if isinstance(col, str) else col
    split = F.split(F.coalesce(c, F.lit("")), "[^A-Za-z0-9]+")
    nonempty = F.filter(split, lambda t: t != "")
    return F.transform(nonempty, F.lower)
