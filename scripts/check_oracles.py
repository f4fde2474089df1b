"""Local simulation of the driver's correctness gate.

Runs every `queries()[name]` on Spark and the matching `oracle_sql()[name]`
on DuckDB over the same sf dir, then compares row count, column names, and
order-insensitive values (exact for ints/strings, 1e-9 for floats).

Usage: python scripts/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from abstracts_search_spark.session import build_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> str | None:
    if len(got) != len(want):
        return f"row count {len(got)} != {len(want)}"
    if sorted(got.columns) != sorted(want.columns):
        return f"columns {sorted(got.columns)} != {sorted(want.columns)}"
    g, w = canon(got), canon(want)
    for c in g.columns:
        gv, wv = g[c], w[c]
        if gv.dtype.kind == "f" or wv.dtype.kind == "f":
            if not np.allclose(gv.astype(float), wv.astype(float), atol=1e-9, rtol=0, equal_nan=True):
                d = np.abs(gv.astype(float) - wv.astype(float))
                return f"float col {c} max diff {np.nanmax(d)}"
        else:
            if not (gv.astype(str) == wv.astype(str)).all():
                bad = (gv.astype(str) != wv.astype(str)).idxmax()
                return f"col {c} differs, e.g. row {bad}: {gv[bad]!r} != {wv[bad]!r}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = build_spark("check_oracles", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {type(e).__name__}: {e}"))
            print(f"[FAIL] {name}: spark error {e}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"[FAIL] {name}: oracle error {e}")
            continue
        err = compare(name, got, want)
        if err:
            failures.append((name, err))
            print(f"[FAIL] {name}: {err}")
        else:
            print(f"[OK] {name}: {len(got)} rows match")
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES:")
        for n, e in failures:
            print(f"  {n}: {e}")
        sys.exit(1)
    print("\nall oracle checks passed")


if __name__ == "__main__":
    main()
