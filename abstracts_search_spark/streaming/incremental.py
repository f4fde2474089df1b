"""Structured-Streaming incremental build (SURVEY.md §2.9 optional path).

The reference is batch-incremental (re-run `make`, README.md:63-65 in
/root/reference); the primary Spark re-expression is the anti-join driver in
plans/build.py. This module provides the equivalent semantics with
harness-managed checkpoints instead of the lineage anti-join:
``readStream`` over the transcripts directory + ``Trigger.AvailableNow`` +
``foreachBatch`` — each micro-batch builds posting segments exactly like the
batch path, and Spark's streaming checkpoint (WAL of processed files) plays
the role of the `events/` touch-files (Makefile:57-66).

Note on semantics: the file stream delivers whole FILES exactly once, so a
conversation split across late-arriving files would assemble per-batch. The
fixture (and any sane production layout) keeps a conversation inside one
partition file, matching the reference's assumption that one
`updated_date=%` partition is the atomic ingest unit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..plans.build import merge_index
from ..operators.docids import assign_doc_ids
from ..operators.postings import DEFAULT_BUCKETS, DEFAULT_SHARD_DOCS


def stream_build(
    spark: SparkSession,
    transcripts_dir: str,
    index_dir: str,
    checkpoint_dir: str | None = None,
    buckets: int = DEFAULT_BUCKETS,
    shard_docs: int = DEFAULT_SHARD_DOCS,
    merge_after: bool = True,
) -> dict:
    """Drain all available transcript files into segments, then merge.

    Returns {"batches": n} — rerunning after new files land processes only
    the new files (checkpointed file WAL = resume-from-checkpoint).
    """
    from pyspark.sql import functions as F

    from ..functions.tokenize import doclen_udf
    from ..operators.postings import build_segments_packed, pack_doc_tokens

    checkpoint_dir = checkpoint_dir or os.path.join(index_dir, "_stream_checkpoint")
    schema = (
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("basePath", transcripts_dir)
        .parquet(transcripts_dir)
    )
    n_batches = {"n": 0}

    def process_batch(batch_df, epoch_id: int) -> None:
        turns = batch_df.filter(F.col("text").isNotNull() & (F.col("text") != ""))
        if turns.isEmpty():
            return
        ordered = F.array_sort(F.collect_list(F.struct("turn_idx", "text")))
        docs = turns.groupBy("conv_id").agg(
            F.concat_ws(" ", F.transform(ordered, lambda s: s.getField("text"))).alias("document"),
            F.count("*").alias("n_turns"),
            F.sum(doclen_udf("text")).cast("int").alias("doclen"),
        ).filter(F.col("doclen") > 0)
        docs = docs.withColumn("src_part", F.lit(int(epoch_id)))

        docmap_path = os.path.join(index_dir, "docmap")
        start = 0
        if os.path.exists(docmap_path) and any(
            d.startswith("src_part=") for d in os.listdir(docmap_path)
        ):
            start = (
                spark.read.parquet(docmap_path).agg(F.max("doc_id")).collect()[0][0] + 1
            )
        skinny = docs.select("conv_id", "src_part", "n_turns", "doclen")
        ids = assign_doc_ids(skinny, start=start).persist()
        fat = docs.select("conv_id", "document").join(ids, "conv_id")
        packed = pack_doc_tokens(
            fat.select("doc_id", "src_part", "doclen", "document"),
            buckets=buckets,
            shard_docs=shard_docs,
        )
        build_segments_packed(packed).repartition("src_part").write.mode("append").partitionBy(
            "src_part"
        ).parquet(os.path.join(index_dir, "segments"))
        ids.select("doc_id", "conv_id", "doclen", "src_part").repartition("src_part").write.mode(
            "append"
        ).partitionBy("src_part").parquet(docmap_path)
        ids.unpersist()
        n_batches["n"] += 1

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if merge_after and n_batches["n"]:
        merge_index(spark, index_dir, buckets=buckets, shard_docs=shard_docs)
    return {"batches": n_batches["n"]}
