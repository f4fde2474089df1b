"""Multimodal column plumbing (images/audio/video as opaque binary).

The Spark-side architecture is real and tested — schemas, Arrow batch flow,
``mapInPandas`` signatures, partition-friendly metadata — while the actual
media decode is stubbed (no image/audio libs in this container): the decoder
registry falls back to a clearly-marked deterministic fake whose outputs
depend only on the bytes, so the pipeline is testable end-to-end.

Pattern: a `media` table (id, kind, payload binary, meta struct) flows through
`decode_features` (mapInPandas: per-batch vectorized decode → fixed-size
float features), then the features join the embedding/similarity operators.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 16


def _real_decode(kind: str, payload: bytes) -> np.ndarray:
    """Real decoder hook — requires PIL/librosa/ffmpeg, absent here."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "environment; the deterministic fake below exercises the same plumbing"
    )


def _fake_decode(kind: str, payload: bytes) -> np.ndarray:
    """Deterministic fake: features derived from sha256(kind ‖ hex(payload)).

    Hashing the HEX encoding (not the raw bytes) keeps the fake fully
    engine-portable: SQL engines whose sha256 takes VARCHAR only (DuckDB)
    reproduce it bit-exactly via sha256(kind || lower(hex(payload))), which
    is what the driver oracle does (__spark_entry__._media_features_sql).
    """
    h = hashlib.sha256(((kind or "") + (payload or b"").hex()).encode()).digest()
    raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def decode_features(media: DataFrame, use_real: bool = False) -> DataFrame:
    """media -> (media_id, kind, features array<float>) via mapInPandas.

    Arrow-batched; per-batch the decode loop is over payloads only (the
    unavoidable per-item media decode), everything else stays columnar.
    """
    decode = _real_decode if use_real else _fake_decode
    out_schema = "media_id long, kind string, features array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(k, p) for k, p in zip(pdf["kind"], pdf["payload"])]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "features": feats}
            )

    return media.mapInPandas(run, schema=out_schema)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame timestamp.

    The timestamps come from metadata (duration), so this is pure Catalyst —
    the actual frame extraction would happen in decode_features per frame id.
    """
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ms"),
    )


def _gen_media_rows(n: int = 64, seed: int = 42) -> list[tuple]:
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, 32, dtype=np.uint8))
        rows.append(
            (
                i,
                kind,
                payload,
                int(rng.integers(16, 4096)) if kind == "image" else None,
                int(rng.integers(16, 4096)) if kind == "image" else None,
                int(rng.integers(1000, 60000)) if kind != "image" else None,
            )
        )
    return rows


def gen_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests."""
    rows = [(i, k, bytearray(p), w, h, d) for i, k, p, w, h, d in _gen_media_rows(n, seed)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def gen_media_fixture(path: str, n: int = 64, seed: int = 42) -> str:
    """Write the fake media table as ONE parquet file (no Spark needed) so the
    Spark queries and the DuckDB oracle read the exact same bytes."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = _gen_media_rows(n, seed)
    cols = list(zip(*rows))
    table = pa.table(
        {
            "media_id": pa.array(cols[0], pa.int64()),
            "kind": pa.array(cols[1], pa.string()),
            "payload": pa.array(cols[2], pa.binary()),
            "width": pa.array(cols[3], pa.int32()),
            "height": pa.array(cols[4], pa.int32()),
            "duration_ms": pa.array(cols[5], pa.int32()),
        }
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(table, path)
    return path
