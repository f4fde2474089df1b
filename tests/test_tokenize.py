import duckdb
import pandas as pd
from pyspark.sql import functions as F

from abstracts_search_spark.functions.tokenize import (
    TOKENIZE_SQL_DUCKDB,
    tokenize_pd,
    tokenize_udf,
    tokens_expr,
)

CASES = [
    "Hello, World! 123",
    "user: run the QUERY plan",
    "",
    "—— ☃ !!!",
    "déjà—vu snow☃man",  # non-ASCII are separators: -> ['d', 'j', 'vu', ...]
    "a-b_c.d e\tf\ng",
    "UPPER lower MiXeD 42x7",
    None,
]


def test_pandas_vs_expr_vs_udf(spark):
    pdf = pd.DataFrame({"text": CASES})
    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.select(
            tokens_expr("text").alias("e"),
            tokenize_udf("text").alias("u"),
        )
        .toPandas()
    )
    expected = tokenize_pd(pdf["text"])
    for i in range(len(CASES)):
        assert list(got["e"][i]) == expected[i], f"expr mismatch on {CASES[i]!r}"
        assert list(got["u"][i]) == expected[i], f"udf mismatch on {CASES[i]!r}"


def test_duckdb_oracle_matches():
    con = duckdb.connect()
    expr = TOKENIZE_SQL_DUCKDB.format(col="text")
    df = pd.DataFrame({"text": [c for c in CASES if c is not None]})
    con.register("t", df)
    rows = con.sql(f"select {expr} as toks from t").fetchall()
    expected = tokenize_pd(df["text"])
    for i, (toks,) in enumerate(rows):
        assert list(toks) == expected[i]


def test_doclen_expr_equals_udf(spark):
    from abstracts_search_spark.functions.tokenize import doclen_expr, doclen_udf
    from pyspark.sql import functions as F

    rows = [
        (0, "The cat sat. 42 times!"),
        (1, None),
        (2, ""),
        (3, "  ---  "),
        (4, "a" * 5000 + " b2c"),
        (5, "Ünïcödé sépàrätors stay separators: çà12çb"),
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    got = df.select(
        "i",
        doclen_expr("t").alias("jvm"),
        F.coalesce(doclen_udf(F.col("t")), F.lit(0)).alias("py"),
    ).collect()
    for r in got:
        assert r["jvm"] == r["py"], r
