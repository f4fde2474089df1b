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
import shutil
import time

from pyspark.sql import SparkSession

from ..plans.build import merge_index
from ..operators.docids import assign_doc_ids
from ..operators.postings import DEFAULT_BUCKETS, DEFAULT_SHARD_DOCS
from ..sources.tables import commit, read_table, table_exists

# streaming epochs are namespaced into their own src_part range so they can
# never collide with batch-path part numbers (directory-derived small ints)
# when both build modes write the same index_dir
STREAM_PART_BASE = 1_000_000


def stream_build(
    spark: SparkSession,
    transcripts_dir: str,
    index_dir: str,
    checkpoint_dir: str | None = None,
    buckets: int = DEFAULT_BUCKETS,
    shard_docs: int = DEFAULT_SHARD_DOCS,
    merge_after: bool = True,
    with_positions: bool = False,
    tokenizer: str = "ascii",
) -> dict:
    """Drain all available transcript files into segments, then merge.

    Returns {"batches": n} — rerunning after new files land processes only
    the new files (checkpointed file WAL = resume-from-checkpoint).
    ``with_positions`` and ``tokenizer`` follow the same index-wide
    contracts as build_index: fixed at first ingest, mismatches refused.
    """
    import json as _json

    from pyspark.sql import functions as F

    from ..functions.tokenize import doclen_expr
    from ..operators.postings import build_segments_packed, pack_doc_tokens

    from ..plans.build import guard_lineage_layout

    guard_lineage_layout(index_dir)
    params_path = os.path.join(index_dir, "params.json")
    if os.path.exists(params_path):
        with open(params_path) as f:
            _prev = _json.load(f)
        prev_positions = _prev.get("positions", False)
        if bool(prev_positions) != bool(with_positions):
            raise ValueError(
                f"index at {index_dir} was built with positions={prev_positions}; "
                f"pass with_positions={prev_positions}"
            )
        prev_tok = _prev.get("tokenizer", "ascii")
        if prev_tok != tokenizer:
            raise ValueError(
                f"index at {index_dir} was built with tokenizer={prev_tok!r}; "
                f"pass tokenizer={prev_tok!r}"
            )
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
        t0 = time.time()
        src_part = STREAM_PART_BASE + int(epoch_id)
        # foreachBatch is at-least-once: a crash after the appends below but
        # before the checkpoint commit replays this epoch. Scrub any partial
        # output of the same epoch first (mirrors build_index's pending-part
        # scrub) so replays are idempotent instead of double-appending —
        # lineage included: it is src_part-partitioned exactly so a replayed
        # epoch REPLACES its lineage row instead of double-counting metrics.
        for sub in ("segments", "docmap", "lineage"):
            d = os.path.join(index_dir, sub, f"src_part={src_part}")
            if os.path.exists(d):
                shutil.rmtree(d)
        turns = batch_df.filter(F.col("text").isNotNull() & (F.col("text") != ""))
        if turns.isEmpty():
            return
        ordered = F.array_sort(F.collect_list(F.struct("turn_idx", "text")))
        docs = turns.groupBy("conv_id").agg(
            F.concat_ws(" ", F.transform(ordered, lambda s: s.getField("text"))).alias("document"),
            F.count("*").alias("n_turns"),
            F.sum(doclen_expr("text", tokenizer=tokenizer)).cast("int").alias("doclen"),
        ).filter(F.col("doclen") > 0)
        docs = docs.withColumn("src_part", F.lit(src_part))

        start = 0
        if table_exists(index_dir, "docmap"):
            start = (
                read_table(spark, index_dir, "docmap").agg(F.max("doc_id")).collect()[0][0] + 1
            )
        skinny = docs.select("conv_id", "src_part", "n_turns", "doclen")
        ids = assign_doc_ids(skinny, start=start).persist()
        fat = docs.select("conv_id", "document").join(ids, "conv_id")
        packed = pack_doc_tokens(
            fat.select("doc_id", "src_part", "doclen", "document"),
            buckets=buckets,
            shard_docs=shard_docs,
            with_positions=with_positions,
            tokenizer=tokenizer,
        )
        commit(build_segments_packed(packed), index_dir, "segments", mode="append",
               partition_by=["src_part"], repartition_by=["src_part"],
               compression="uncompressed")
        commit(ids.select("doc_id", "conv_id", "doclen", "src_part"), index_dir,
               "docmap", mode="append", partition_by=["src_part"],
               repartition_by=["src_part"])
        agg = ids.agg(
            F.count("*").alias("n_docs"),
            F.sum("n_turns").alias("n_turns"),
            F.countDistinct("conv_id").alias("n_convs"),
        ).collect()[0]
        seg = (
            read_table(spark, index_dir, "segments")
            .filter(F.col("src_part") == src_part)
            .agg(F.sum("df").alias("n_postings"), F.count("*").alias("n_term_rows"))
            .collect()[0]
        )
        ids.unpersist()
        # lineage LAST = per-epoch commit marker, same contract as the batch
        # path; a mixed batch+stream index_dir now shares one lineage table
        # with disjoint src_part namespaces, so neither mode re-ingests or
        # collides with the other's partitions
        lineage = spark.createDataFrame(
            [
                (
                    src_part,
                    int(agg["n_convs"]),
                    int(agg["n_turns"]),
                    int(agg["n_docs"]),
                    int(seg["n_postings"] or 0),
                    int(seg["n_term_rows"] or 0),
                    float(time.time() - t0),
                )
            ],
            "src_part int, n_convs long, n_turns long, n_docs long, "
            "n_postings long, n_term_rows long, wall_sec double",
        ).withColumn("ts", F.current_timestamp())
        commit(lineage, index_dir, "lineage", mode="append",
               partition_by=["src_part"], repartition_by=["src_part"])
        n_batches["n"] += 1

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if merge_after and n_batches["n"]:
        merge_index(spark, index_dir, buckets=buckets, shard_docs=shard_docs,
                    tokenizer=tokenizer)
    return {"batches": n_batches["n"]}


def stream_sync_vectors(
    spark: SparkSession,
    embeddings_dir: str,
    index_dir: str,
    kind: str = "ivf",
    checkpoint_dir: str | None = None,
    schema: str = "vec_id long, embedding array<float>",
) -> dict:
    """Streaming vector ingest: drain all available embedding parquet files
    from ``embeddings_dir`` into a persisted vector index (``kind`` =
    "ivf" | "ann") — the vector-side twin of :func:`stream_build`.

    Each micro-batch appends as the index's next generation through
    sync_ivf_index / sync_ann_index with a CONTENT-derived ``src_tag`` (the
    hash of the batch's distinct input-file set — NOT the epoch counter,
    which restarts at 0 per checkpoint location and would collide tags
    across two streams into one index, or after a lost checkpoint, silently
    dropping batches). foreachBatch's at-least-once delivery then needs no
    extra bookkeeping: a replayed batch either no-ops (tag already in
    params) or scrubs its own orphaned generation first (crash between the
    vectors append and the params marker). The streaming checkpoint (file
    WAL) decides WHAT is new; the sync tag decides whether that content
    already LANDED — the same two-level contract as the doc path's
    checkpoint + lineage.

    The index must already exist (build_ivf_index / build_ann_index trains
    the constants — centroids/quantizer or planes — which streaming batches
    never retrain). Rerunning after new files land processes only the new
    files. Returns {"batches": n_appended}.
    """
    from ..operators.ivf import _ivf_params_path, sync_ivf_index
    from ..operators.similarity import _ann_params_path, sync_ann_index

    if kind == "ivf":
        params_path, sync = _ivf_params_path(index_dir), sync_ivf_index
    elif kind == "ann":
        params_path, sync = _ann_params_path(index_dir), sync_ann_index
    else:
        raise ValueError(f"unknown vector index kind {kind!r}")
    if not os.path.exists(params_path):
        raise ValueError(
            f"no {kind} index at {index_dir} — build it first "
            f"(streaming syncs never train the index constants)"
        )
    checkpoint_dir = checkpoint_dir or os.path.join(index_dir, "_stream_checkpoint")
    # refuse a checkpoint left over from a PREVIOUS build of this index: an
    # in-place rebuild resets merged_srcs, but the stream's file WAL would
    # still mark old deliveries consumed — they would silently never reach
    # the rebuilt index. The build stamps a build_id into its params; the
    # checkpoint records which build it belongs to.
    import json as _json

    with open(params_path) as f:
        build_id = _json.load(f).get("build_id", "__legacy__")
    marker = os.path.join(checkpoint_dir, "_index_build_id")
    if os.path.exists(marker):
        with open(marker) as f:
            prev = f.read().strip()
        if prev != build_id:
            raise ValueError(
                f"checkpoint at {checkpoint_dir} belongs to a previous build "
                f"of the {kind} index at {index_dir} (the index was rebuilt) "
                "— pass a fresh checkpoint_dir, or delete the old one and "
                "re-deliver its files"
            )
    else:
        os.makedirs(checkpoint_dir, exist_ok=True)
        with open(marker, "w") as f:
            f.write(build_id)
    stream = (
        spark.readStream.schema(schema)
        .option("basePath", embeddings_dir)
        .parquet(embeddings_dir)
    )
    n_batches = {"n": 0}

    def process_batch(batch_df, epoch_id: int) -> None:
        import hashlib

        from pyspark.sql import functions as F

        if batch_df.isEmpty():
            return
        files = sorted(
            r[0] for r in batch_df.select(F.input_file_name()).distinct().collect()
        )
        tag = "stream_" + hashlib.sha256("\n".join(files).encode()).hexdigest()[:16]
        if sync(batch_df, index_dir, src_tag=tag):
            n_batches["n"] += 1

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {"batches": n_batches["n"]}
