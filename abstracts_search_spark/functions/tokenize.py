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


class TokenizerSpec:
    """One named tokenizer, expressed identically in all three engines.

    ``py_pattern`` (Python re), ``jvm_pattern`` (Java regex — Spark
    split/regexp_count), and ``sql_split`` (RE2 — the DuckDB oracle's
    regexp_split_to_array class) must select the SAME character set; the
    per-variant tests assert three-way token equality on a mixed-script
    fixture. Extraction is boundary-splitting on the negated class +
    lowercase, the same shape for every variant.
    """

    def __init__(self, name: str, py_pattern: str, jvm_pattern: str, sql_split: str):
        self.name = name
        self.py_pattern = py_pattern
        self.jvm_pattern = jvm_pattern
        self.sql_split = sql_split
        self.regex = re.compile(py_pattern)

    @property
    def jvm_split(self) -> str:
        """Negated class for F.split (token-boundary runs)."""
        return "[^" + self.jvm_pattern[1:]

    @property
    def duckdb_sql(self) -> str:
        """{col} -> list<varchar> of lowercase tokens (oracle template)."""
        return (
            f"list_transform(list_filter(regexp_split_to_array({{col}}, "
            f"'{self.sql_split}'), t -> t <> ''), t -> lower(t))"
        )


# The per-index tokenizer config point (params.json "tokenizer", README
# "Tokenizer contract"). "ascii" is the engine default — bit-identical to
# every pre-round-5 index. "unicode" selects letter/number runs in any
# script ([\p{L}\p{N}] ≡ Python [^\W_]: categories L* ∪ Nd/Nl/No) with full
# Unicode lowercasing. Python and the JVM agree on every codepoint
# (special-cased in tests); the DuckDB oracle's simple case mapping
# diverges ONLY on U+0130 İ (the one multi-char lowercase mapping in
# Unicode) — oracle fixtures exclude it, documented here rather than
# papered over.
TOKENIZERS: dict[str, TokenizerSpec] = {
    "ascii": TokenizerSpec(
        "ascii", r"[A-Za-z0-9]+", r"[A-Za-z0-9]+", "[^A-Za-z0-9]+"
    ),
    "unicode": TokenizerSpec(
        "unicode", r"[^\W_]+", r"[\p{L}\p{N}]+", r"[^\pL\pN]+"
    ),
}


def get_tokenizer(name: str) -> TokenizerSpec:
    try:
        return TOKENIZERS[name]
    except KeyError:
        raise ValueError(
            f"unknown tokenizer {name!r}; available: {sorted(TOKENIZERS)}"
        ) from None


def tokenize_pd(texts: pd.Series, tokenizer: str = "ascii") -> pd.Series:
    """pandas implementation: Series[str] -> Series[list[str]]."""
    rx = get_tokenizer(tokenizer).regex
    return texts.fillna("").map(lambda t: [m.lower() for m in rx.findall(t)])


@pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    return tokenize_pd(texts)


@pandas_udf(T.IntegerType())
def doclen_udf(texts: pd.Series) -> pd.Series:
    """Token count only — avoids materializing the token array through Arrow
    when just the length is needed (docID gating, docmap doclen)."""
    return texts.str.count(TOKEN_PATTERN).fillna(0).astype("int32")


def doclen_expr(col: Column | str, tokenizer: str = "ascii") -> Column:
    """JVM token count: size(regexp_extract_all(text, pattern)) — a codegen
    expression, NOT a higher-order function and NOT a Python UDF, so the
    assembly stage that sums per-turn doclens stays whole-stage-codegen with
    zero Python workers. Verified equal to :func:`doclen_udf` (tests) and,
    per variant, to the Python regex count (mixed-script fixture tests)."""
    c = F.col(col) if isinstance(col, str) else col
    pat = get_tokenizer(tokenizer).jvm_pattern
    return F.regexp_count(F.coalesce(c, F.lit("")), F.lit(pat)).cast("int")


def tokens_expr(col: Column | str, tokenizer: str = "ascii") -> Column:
    """Catalyst-only equivalent of :func:`tokenize_udf` (verified equal)."""
    c = F.col(col) if isinstance(col, str) else col
    split = F.split(F.coalesce(c, F.lit("")), get_tokenizer(tokenizer).jvm_split)
    nonempty = F.filter(split, lambda t: t != "")
    return F.transform(nonempty, F.lower)
