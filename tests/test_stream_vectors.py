"""Streaming vector ingest (stream_sync_vectors): drain-new-files-only via
the file-WAL checkpoint, generation append via the sync tag contract, both
index kinds, and the build-first guard."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from abstracts_search_spark.operators.ivf import IvfIndexReader, build_ivf_index
from abstracts_search_spark.operators.similarity import AnnIndexReader, build_ann_index
from abstracts_search_spark.streaming.incremental import stream_sync_vectors

DIM = 16


def _write_emb(path, ids, seed):
    rng = np.random.default_rng(seed)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(list(ids), pa.int64()),
                "embedding": pa.array(
                    [rng.standard_normal(DIM).astype("float32") for _ in ids],
                    pa.list_(pa.float32()),
                ),
            }
        ),
        path,
    )


def test_stream_sync_ivf(spark, tmp_path):
    emb_dir = str(tmp_path / "emb")
    os.makedirs(emb_dir)
    _write_emb(os.path.join(emb_dir, "b0.parquet"), range(60), seed=1)
    ix = str(tmp_path / "ivf")
    build_ivf_index(spark.read.parquet(emb_dir), ix, n_lists=4, iters=1)

    # the stream watches a DELIVERY directory separate from the build input
    # (pointing it at the build dir would re-append the base vectors — the
    # checkpoint is per-stream, not shared with the batch build)
    deliveries = str(tmp_path / "incoming")
    os.makedirs(deliveries)
    out = stream_sync_vectors(spark, deliveries, ix, kind="ivf")
    assert out["batches"] == 0  # empty delivery dir -> nothing appended

    _write_emb(os.path.join(deliveries, "d1.parquet"), range(60, 90), seed=2)
    out = stream_sync_vectors(spark, deliveries, ix, kind="ivf")
    assert out["batches"] == 1
    r = IvfIndexReader(spark, ix)
    assert r.assignments().count() == 90
    row = spark.read.parquet(deliveries).filter(F.col("vec_id") == 75).first()
    top = r.topk([float(x) for x in row["embedding"]], k=3, nprobe=4).collect()
    assert top[0]["vec_id"] == 75 and top[0]["cos"] == 1.0

    # re-drain with nothing new: checkpoint skips the already-seen file
    out = stream_sync_vectors(spark, deliveries, ix, kind="ivf")
    assert out["batches"] == 0
    assert IvfIndexReader(spark, ix).assignments().count() == 90

    # a second delivery lands as its own epoch/generation
    _write_emb(os.path.join(deliveries, "d2.parquet"), range(90, 100), seed=3)
    out = stream_sync_vectors(spark, deliveries, ix, kind="ivf")
    assert out["batches"] == 1
    assert IvfIndexReader(spark, ix).assignments().count() == 100


def test_stream_sync_ann(spark, tmp_path):
    base = str(tmp_path / "base.parquet")
    _write_emb(base, range(50), seed=4)
    ix = str(tmp_path / "ann")
    build_ann_index(spark.read.parquet(base), ix, n_planes=4)

    deliveries = str(tmp_path / "incoming")
    os.makedirs(deliveries)
    _write_emb(os.path.join(deliveries, "d1.parquet"), range(50, 80), seed=5)
    out = stream_sync_vectors(spark, deliveries, ix, kind="ann")
    assert out["batches"] == 1
    r = AnnIndexReader(spark, ix)
    row = spark.read.parquet(deliveries).filter(F.col("vec_id") == 60).first()
    top = r.topk([float(x) for x in row["embedding"]], k=3, probe_hamming=1).collect()
    assert top[0]["vec_id"] == 60 and top[0]["cos"] == 1.0


def test_two_streams_one_index_no_tag_collision(spark, tmp_path):
    """Two delivery directories (two independent checkpoints) feed ONE
    index: per-checkpoint epoch counters both start at 0, so an epoch-based
    tag would collide and silently drop the second stream's first batch.
    Content-derived tags (file-set hash) keep both."""
    base = str(tmp_path / "base.parquet")
    _write_emb(base, range(40), seed=7)
    ix = str(tmp_path / "ivf")
    build_ivf_index(spark.read.parquet(base), ix, n_lists=4, iters=1)

    d_a = str(tmp_path / "incoming_a")
    d_b = str(tmp_path / "incoming_b")
    os.makedirs(d_a)
    os.makedirs(d_b)
    _write_emb(os.path.join(d_a, "a1.parquet"), range(40, 70), seed=8)
    _write_emb(os.path.join(d_b, "b1.parquet"), range(70, 100), seed=9)
    out_a = stream_sync_vectors(spark, d_a, ix, kind="ivf",
                                checkpoint_dir=str(tmp_path / "cp_a"))
    out_b = stream_sync_vectors(spark, d_b, ix, kind="ivf",
                                checkpoint_dir=str(tmp_path / "cp_b"))
    assert out_a["batches"] == 1 and out_b["batches"] == 1
    assert IvfIndexReader(spark, ix).assignments().count() == 100


def test_stale_checkpoint_refused_after_rebuild(spark, tmp_path):
    """An in-place index rebuild resets merged_srcs, but the stream's file
    WAL still marks old deliveries consumed — draining with the old
    checkpoint would silently leave them out of the rebuilt index forever.
    The build_id marker turns that into a hard error."""
    import pytest

    base = str(tmp_path / "base.parquet")
    _write_emb(base, range(40), seed=10)
    ix = str(tmp_path / "ivf")
    build_ivf_index(spark.read.parquet(base), ix, n_lists=4, iters=1)
    deliveries = str(tmp_path / "incoming")
    os.makedirs(deliveries)
    _write_emb(os.path.join(deliveries, "d1.parquet"), range(40, 60), seed=11)
    assert stream_sync_vectors(spark, deliveries, ix, kind="ivf")["batches"] == 1

    build_ivf_index(spark.read.parquet(base), ix, n_lists=4, iters=1)  # rebuild
    with pytest.raises(ValueError, match="previous build"):
        stream_sync_vectors(spark, deliveries, ix, kind="ivf")
    # a fresh checkpoint re-delivers into the rebuilt index
    out = stream_sync_vectors(spark, deliveries, ix, kind="ivf",
                              checkpoint_dir=str(tmp_path / "cp2"))
    assert out["batches"] == 1
    assert IvfIndexReader(spark, ix).assignments().count() == 60


def test_stream_sync_requires_built_index(spark, tmp_path):
    deliveries = str(tmp_path / "incoming")
    os.makedirs(deliveries)
    with pytest.raises(ValueError, match="build it first"):
        stream_sync_vectors(spark, deliveries, str(tmp_path / "nope"), kind="ivf")
    with pytest.raises(ValueError, match="unknown vector index kind"):
        stream_sync_vectors(spark, deliveries, str(tmp_path / "nope"), kind="hnsw")
