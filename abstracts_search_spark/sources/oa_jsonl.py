"""OpenAlex-works JSONL source — the reference's exact ingest format.

Re-expresses /root/reference/oa_jsonl.c end-to-end in Catalyst:

- explicit 4-field schema → every other JSON field is pruned at the scan
  (the `advance_value_skip` analog, oa_jsonl.c:100-133, 392-393);
- FAILFAST mode reproduces the parser's assert-abort on malformed input
  (oa_jsonl.c:23,129,153); PERMISSIVE is the lenient variant;
- language filter: keep iff `language` is null-or-missing or == "en"
  (oa_jsonl.c:380-385). Documented deviation (SURVEY.md §2.2 P2): the C
  parser distinguishes a MISSING key (kept) from an explicit null (dropped);
  a JSON datasource maps both to SQL null, so both are kept here;
- positional un-invert of `abstract_inverted_index` (oa_jsonl.c:232-325) via
  functions/uninvert.py — gaps closed, duplicates preserved, single spaces;
- drop rows whose abstract is null or reconstructs empty (oa_jsonl.c:386-391);
- document = title ‖ " " ‖ abstract, title-null branch handled by concat_ws
  (oa_jsonl.c:402-410).

`read_works` returns the same `{id, document}` rows the C filter prints, as a
DataFrame; `write_jsonl` is the S6 sink equivalent.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.uninvert import uninvert_expr

WORKS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("language", T.StringType(), True),
        T.StructField(
            "abstract_inverted_index",
            T.MapType(T.StringType(), T.ArrayType(T.IntegerType())),
            True,
        ),
    ]
)


def read_works(spark: SparkSession, path: str, failfast: bool = True) -> DataFrame:
    """JSONL works -> (id, document), with the reference's filter semantics."""
    mode = "FAILFAST" if failfast else "PERMISSIVE"
    works = spark.read.schema(WORKS_SCHEMA).option("mode", mode).json(path)
    kept = works.filter(F.col("language").isNull() | (F.col("language") == "en"))
    with_abstract = kept.withColumn("abstract", uninvert_expr("abstract_inverted_index"))
    nonempty = with_abstract.filter(
        F.col("abstract_inverted_index").isNotNull() & (F.col("abstract") != "")
    )
    return nonempty.select(
        "id", F.concat_ws(" ", "title", "abstract").alias("document")
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    """S6 sink analog (oa_jsonl.c:402-410): emit {id, document} JSONL."""
    df.write.mode("overwrite").json(path)


def gen_works_jsonl(path: str, n: int = 200, seed: int = 42) -> list[dict]:
    """Deterministic OpenAlex-shaped JSONL fixture covering every branch of
    the reference parser: null titles, missing/null/non-en language, position
    gaps, duplicate words, empty/missing inverted index, extra fields."""
    import numpy as np

    rng = np.random.default_rng(seed)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    rows = []
    for i in range(n):
        rec: dict = {"id": f"https://openalex.org/W{i:07d}", "extra_field": i}
        case = i % 8
        if case != 0:
            rec["title"] = f"Title {i}" if case != 1 else None
        if case == 2:
            rec["language"] = "fr"
        elif case == 3:
            rec["language"] = None
        elif case != 4:  # case 4: language key missing entirely
            rec["language"] = "en"
        if case == 5:
            rec["abstract_inverted_index"] = {}
        elif case == 6:
            pass  # missing key
        else:
            k = int(rng.integers(3, 9))
            picks = rng.choice(words, size=k, replace=True)
            positions = rng.permutation(np.arange(0, k * 2, 2))[:k]  # gaps everywhere
            aii: dict[str, list[int]] = {}
            for w, p in zip(picks, positions):
                aii.setdefault(str(w), []).append(int(p))
            rec["abstract_inverted_index"] = aii
        rows.append(rec)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return rows
