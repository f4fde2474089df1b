"""Generation-stacked incremental merge: a sync after new partitions arrive
re-merges ONLY the new segments (appended as gen=G), leaves the standing
postings untouched, and queries remain rank-identical to a from-scratch
build (VERDICT r01 item 6)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from abstracts_search_spark.plans.build import build_index, compact_index
from abstracts_search_spark.plans.query import IndexReader
from abstracts_search_spark.sources.tables import read_table

QUERIES = ["index merge spark", "user assistant", "table scan value"]


def _results(spark, ix):
    r = IndexReader(spark, ix)
    return [
        [(row["conv_id"], round(row["score"], 9)) for row in r.query(q, k=10).collect()]
        for q in QUERIES
    ]


def _gen_files(ix, gen):
    root = os.path.join(ix, "postings", f"gen={gen}")
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            out[p] = os.stat(p).st_mtime_ns
    return out


def test_incremental_merge_touches_only_new_segments(spark, small_dir, tmp_path):
    # from-scratch truth over ALL partitions
    scratch = str(tmp_path / "scratch")
    build_index(spark, small_dir, scratch, buckets=8, shard_docs=64)
    want = _results(spark, scratch)

    # build parts {0,1,2} then sync part 3 separately
    ix = str(tmp_path / "ix")
    m1 = build_index(spark, small_dir, ix, buckets=8, shard_docs=64, max_parts=3)
    assert m1["pending_parts"] == 3
    gen0_before = _gen_files(ix, 0)
    assert gen0_before

    m2 = build_index(spark, small_dir, ix, buckets=8, shard_docs=64)
    assert m2["pending_parts"] == 1

    # the standing generation was not rewritten (same files, same mtimes)...
    assert _gen_files(ix, 0) == gen0_before
    # ...and the new generation covers exactly the new partition's doc range
    gen1 = read_table(spark, ix, "postings").filter(F.col("gen") == 1)
    part3_min = (
        read_table(spark, ix, "docmap")
        .filter(F.col("src_part") == 3)
        .agg(F.min("doc_id"))
        .collect()[0][0]
    )
    assert gen1.count() > 0
    assert gen1.agg(F.min("first_doc")).collect()[0][0] >= part3_min

    # rank-identical to the from-scratch build, including hot-term queries
    assert _results(spark, ix) == want

    # compaction folds generations back to gen=0, results unchanged
    compact_index(spark, ix, buckets=8, shard_docs=64)
    gens = {d for d in os.listdir(os.path.join(ix, "postings")) if d.startswith("gen=")}
    assert gens == {"gen=0"}
    assert _results(spark, ix) == want
