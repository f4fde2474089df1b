"""M2-M4 end-to-end: build index → query → rank-identical to brute force
(north_rule), including hot-term skew queries and kill/resume (SURVEY.md §5.3).
"""

import pytest
from pyspark.sql import functions as F

from abstracts_search_spark.plans.build import build_index, pending_partitions
from abstracts_search_spark.plans.query import IndexReader
from abstracts_search_spark.operators.assemble import assemble_documents
from abstracts_search_spark.operators.oracle_numpy import BM25Oracle
from abstracts_search_spark.sources.transcripts import gen_queries

# small buckets/shards so tests exercise multi-bucket + multi-shard paths
BUILD_KW = dict(buckets=8, shard_docs=64)

QUERIES = [q for _, q in gen_queries(n=12)] + ["user assistant", "the of and", "term2481 merge"]


@pytest.fixture(scope="module")
def built(spark, small_dir, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("index") / "small")
    metrics = build_index(spark, small_dir, index_dir, **BUILD_KW)
    return index_dir, metrics


@pytest.fixture(scope="module")
def oracle(spark, small_df):
    docs = assemble_documents(small_df)
    rows = docs.collect()
    # same docID rule as the engine: rank of conv_id (all convs here tokenize non-empty)
    by_conv = sorted(rows, key=lambda r: r["conv_id"])
    return BM25Oracle({i: r["document"] for i, r in enumerate(by_conv)}), [
        r["conv_id"] for r in by_conv
    ]


def test_build_metrics(built):
    _, metrics = built
    assert metrics["n_docs"] == 500
    assert metrics["n_turns"] > 0 and metrics["turns_per_sec"] > 0


@pytest.mark.parametrize("method", ["bmw", "taat", "auto"])
def test_rank_identical_to_oracle(spark, built, oracle, method):
    index_dir, _ = built
    reader = IndexReader(spark, index_dir)
    orc, convs = oracle
    for q in QUERIES:
        got = reader.query(q, k=10, method=method).collect()
        want = orc.topk(q, k=10)
        assert [r["doc_id"] for r in got] == [d for d, _ in want], f"{method} docIDs for {q!r}"
        assert [r["conv_id"] for r in got] == [convs[d] for d, _ in want]
        for r, (_, ws) in zip(got, want):
            assert abs(r["score"] - ws) <= 1e-6 * max(1.0, abs(ws)), f"score drift for {q!r}"


def test_bmw_equals_taat_many_queries(spark, built):
    index_dir, _ = built
    reader = IndexReader(spark, index_dir)
    for _, q in gen_queries(n=20):
        a = [(r["doc_id"], round(r["score"], 9)) for r in reader.query(q, k=10, method="bmw").collect()]
        b = [(r["doc_id"], round(r["score"], 9)) for r in reader.query(q, k=10, method="taat").collect()]
        assert a == b, f"bmw != taat for {q!r}"


def test_empty_and_absent_queries(spark, built):
    index_dir, _ = built
    reader = IndexReader(spark, index_dir)
    assert reader.query("—— ☃ !!!").count() == 0
    assert reader.query("zzzneverinthiscorpus").count() == 0


def test_incremental_resume_equals_oneshot(spark, small_dir, built, tmp_path_factory):
    """Build {first 2 parts}, 'crash', resume rest → identical query results
    (the make-recover property, /root/reference/Makefile:98-101)."""
    index_dir2 = str(tmp_path_factory.mktemp("index") / "resume")
    m1 = build_index(spark, small_dir, index_dir2, max_parts=2, **BUILD_KW)
    assert m1["pending_parts"] == 2
    remaining = pending_partitions(spark, small_dir, index_dir2)
    assert len(remaining) == 2  # lineage recorded exactly the 2 built parts
    m2 = build_index(spark, small_dir, index_dir2, **BUILD_KW)
    assert m2["pending_parts"] == 2
    assert pending_partitions(spark, small_dir, index_dir2) == []

    oneshot = IndexReader(spark, built[0])
    resumed = IndexReader(spark, index_dir2)
    assert resumed.n_docs == oneshot.n_docs
    assert abs(resumed.avgdl - oneshot.avgdl) < 1e-9
    for q in ["user assistant", "term2481 merge", "index scan"]:
        a = [(r["conv_id"], round(r["score"], 9)) for r in oneshot.query(q, k=10).collect()]
        b = [(r["conv_id"], round(r["score"], 9)) for r in resumed.query(q, k=10).collect()]
        assert a == b


def test_noop_rebuild(spark, small_dir, built):
    """Second build call with nothing pending is a no-op (idempotent sync,
    reference README.md:63-65)."""
    index_dir, _ = built
    m = build_index(spark, small_dir, index_dir, **BUILD_KW)
    assert m["pending_parts"] == 0 and m["n_docs"] == 0
