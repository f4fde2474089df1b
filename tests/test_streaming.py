"""Structured-Streaming incremental build ≡ batch build results (SURVEY §2.9)."""

from abstracts_search_spark.plans.build import build_index
from abstracts_search_spark.plans.query import IndexReader
from abstracts_search_spark.streaming.incremental import stream_build


def test_stream_build_matches_batch(spark, small_dir, tmp_path):
    ix_stream = str(tmp_path / "ix_stream")
    ix_batch = str(tmp_path / "ix_batch")

    r = stream_build(spark, small_dir, ix_stream, buckets=8, shard_docs=64)
    assert r["batches"] >= 1
    build_index(spark, small_dir, ix_batch, buckets=8, shard_docs=64)

    a = IndexReader(spark, ix_stream)
    b = IndexReader(spark, ix_batch)
    assert a.n_docs == b.n_docs
    assert abs(a.avgdl - b.avgdl) < 1e-9
    for q in ["user assistant", "term2481 merge", "index scan"]:
        ra = [(x["conv_id"], round(x["score"], 9)) for x in a.query(q, k=10).collect()]
        rb = [(x["conv_id"], round(x["score"], 9)) for x in b.query(q, k=10).collect()]
        assert ra == rb, f"stream vs batch mismatch for {q!r}"

    # resume semantics: rerun with no new files -> no new batches
    r2 = stream_build(spark, small_dir, ix_stream, buckets=8, shard_docs=64)
    assert r2["batches"] == 0
