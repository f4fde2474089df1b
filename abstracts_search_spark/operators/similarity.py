"""Similarity search over an embedding column (array<float>).

- ``cosine_topk`` — brute-force exact cosine top-k: the baseline and oracle.
  Dot products via ``zip_with`` + ``aggregate`` (JVM-side fold in element
  order, float64 — matches DuckDB's list_dot_product on DOUBLE[] exactly).
- ``ann_lsh_topk`` — the scale path: random-hyperplane LSH. Each vector gets a
  sign-pattern bucket from `n_planes` fixed hyperplanes; the query probes only
  its own bucket (plus Hamming-1 neighbors for recall). The hyperplanes are
  seeded constants, so the whole pipeline is deterministic and the same plane
  matrix can be embedded into an oracle SQL. At scale the bucketed table is
  written partitioned by bucket → queries prune to a few files (the same
  IVF-probe analogy as the postings buckets, SURVEY.md §4).

The reference's FAISS-IVF index does exactly this job for embeddings
(/root/reference/Makefile:24-39); these operators are that capability
re-expressed relationally.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot_expr(a: Column, b: Column) -> Column:
    """Σ a_i·b_i as float64, sequential element order (engine-portable)."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(_to_double(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k -> (vec_id, cos). TakeOrderedAndProject."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = emb.select(
        F.col(id_col).alias("vec_id"),
        F.round(cosine_expr(F.col(vec_col), q), 6).alias("cos"),
    )
    return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)


def cosine_pairs_blocked(
    emb: DataFrame,
    top: int = 20,
    block: int = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine via blocked numpy matmul -> top pairs.

    The scalable shape for exact quadratic similarity: vectors are tiled into
    id-range blocks; each (i<=j) block pair becomes one applyInPandas group
    that does a single float64 GEMM — no per-pair expression evaluation, no
    materialized pair table. Replication factor is n_blocks/2 per side (data
    inflates by B/2, compute stays the same O(n²·d) but runs at BLAS speed).
    -> (vec_a, vec_b, cos) with cos rounded to 6 decimals,
    (cos DESC, vec_a, vec_b) top `top`.
    """
    import pandas as pd

    v = emb.select(
        F.col(id_col).alias("vid"),
        _to_double(F.col(vec_col)).alias("vec"),
        (F.col(id_col) / block).cast("int").alias("blk"),
    )
    nblk = v.agg(F.max("blk")).collect()[0][0] + 1
    spark = emb.sparkSession
    # the (i <= j) block-pair grid is built AS A PLAN (range × range), never as
    # a driver-side Python list — at 10^6 blocks the old list comprehension
    # was 5×10^11 driver tuples; this is zero driver state at any size
    gi = spark.range(nblk).select(F.col("id").cast("int").alias("gi"))
    gj = spark.range(nblk).select(F.col("id").cast("int").alias("gj"))
    grid = gi.crossJoin(gj).filter(F.col("gi") <= F.col("gj"))
    left = v.join(F.broadcast(grid), v.blk == F.col("gi")).select(
        "gi", "gj", F.lit(0).alias("side"), "vid", "vec"
    )
    right = v.join(F.broadcast(grid), v.blk == F.col("gj")).select(
        "gi", "gj", F.lit(1).alias("side"), "vid", "vec"
    )
    both = left.union(right)

    def gemm(key, pdf: pd.DataFrame) -> pd.DataFrame:
        gi, gj = int(key[0]), int(key[1])
        a = pdf[pdf["side"] == 0].sort_values("vid")
        b = pdf[pdf["side"] == 1].sort_values("vid") if gi != gj else a
        if len(a) == 0 or len(b) == 0:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos": []})
        ma = np.stack(a["vec"].to_numpy())
        mb = np.stack(b["vec"].to_numpy())
        # dot first, divide by the norm product after — the same operation
        # order as the SQL oracle (modulo summation order inside the GEMM)
        cos = (ma @ mb.T) / np.outer(np.linalg.norm(ma, axis=1), np.linalg.norm(mb, axis=1))
        ia, ib = np.meshgrid(a["vid"].to_numpy(), b["vid"].to_numpy(), indexing="ij")
        mask = ia < ib
        return pd.DataFrame(
            {"vec_a": ia[mask], "vec_b": ib[mask], "cos": np.round(cos[mask], 6)}
        )

    pairs = both.groupBy("gi", "gj").applyInPandas(gemm, "vec_a long, vec_b long, cos double")
    return pairs.orderBy(F.desc("cos"), "vec_a", "vec_b").limit(top)


def cosine_pairs_lsh(
    emb: DataFrame,
    top: int = 20,
    n_planes: int = 8,
    bands: int = 4,
    seed: int = 42,
    max_bucket: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    carry_vectors: bool = False,
) -> DataFrame:
    """Near-dup pairs via banded hyperplane LSH — the 100 TB path.

    Each of `bands` independent plane sets (seed+band) buckets every vector;
    candidate pairs are generated ONLY within (band, bucket) groups, scored
    with one float64 GEMM per group (applyInPandas), then de-duplicated across
    bands. Buckets larger than `max_bucket` are dropped (the boilerplate-skew
    valve, same contract as dedup.minhash_lsh_pairs). No all-pairs stage and
    no driver-side pair structures exist anywhere: the widest shuffles are the
    per-band bucket exchange (narrow rows) and the bounded bucket self-GEMM.

    Recall is governed by (n_planes, bands): P(pair survives) =
    1-(1-(1-θ/π)^n_planes)^bands — near-dups (θ→0) are found with
    near-certainty. Deterministic for fixed seed, so the driver oracle
    replicates the exact same pruning in SQL.
    -> (vec_a, vec_b, cos) top `top` by (cos DESC, vec_a, vec_b).

    Exchange shape: only narrow (vid, band, bucket) rows go through the
    band explode + guard; the vectors are re-joined AFTER guard pruning, in
    their original (typically float32) storage width, and widened to float64
    only inside the per-bucket GEMM — identical numbers to scoring float64
    end-to-end (float32→float64 widening is exact), at a fraction of the
    shuffle bytes. ``carry_vectors=True`` restores the old
    vector-through-explode plan; it exists solely so the shuffle-bytes win is
    measurable on the same input (scripts/shuffle_profile.py).
    """
    from typing import Iterator

    import pandas as pd

    dim = _dim_of(emb, vec_col)
    # all bands' plane matrices stacked: one (batch × dim) · (dim × B·P) GEMM
    # per Arrow batch computes every bucket bit — bucket assignment is a
    # single vectorized pass, not bands × planes interpreted HOF lambdas
    all_planes = np.concatenate(
        [hyperplanes(dim, n_planes, seed + band) for band in range(bands)]
    )  # (bands*n_planes, dim)
    weights = (1 << np.arange(n_planes, dtype=np.int64)).reshape(1, 1, n_planes)

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):  # zero-row Arrow batch: np.stack would raise
                continue
            m = np.stack([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
            bits = (m @ all_planes.T >= 0).reshape(len(pdf), bands, n_planes)
            buckets = (bits * weights).sum(axis=2).astype(np.int32)  # (n, bands)
            out = {"vid": pdf[id_col].to_numpy(), "bks": list(buckets)}
            if carry_vectors:
                out["vec"] = [row for row in m]
            yield pd.DataFrame(out)

    if carry_vectors:  # measurement baseline: float64 vectors ride the explode
        per_vec = emb.select(id_col, vec_col).mapInPandas(
            bucketize, schema="vid long, bks array<int>, vec array<double>"
        )
        banded = per_vec.select("vid", "vec", F.posexplode("bks").alias("band", "bucket"))
    else:
        per_vec = emb.select(id_col, vec_col).mapInPandas(
            bucketize, schema="vid long, bks array<int>"
        )
        banded = per_vec.select("vid", F.posexplode("bks").alias("band", "bucket"))
    guard = (
        banded.groupBy("band", "bucket")
        .agg(F.count("*").alias("bsz"))
        .filter((F.col("bsz") > 1) & (F.col("bsz") <= max_bucket))
        .select("band", "bucket")
    )
    cand = banded.join(F.broadcast(guard), ["band", "bucket"])
    if not carry_vectors:
        # vectors join the surviving candidates at storage width (array<float>)
        vecs = emb.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
        cand = cand.join(vecs, "vid")

    def gemm(key, pdf: pd.DataFrame) -> pd.DataFrame:
        a = pdf.sort_values("vid")
        # widen to float64 HERE (exact for float32 storage) — the GEMM and the
        # oracle both compute in doubles regardless of what the shuffle carried
        m = np.stack([np.asarray(x, dtype=np.float64) for x in a["vec"]])
        cos = (m @ m.T) / np.outer(np.linalg.norm(m, axis=1), np.linalg.norm(m, axis=1))
        ids = a["vid"].to_numpy()
        ia, ib = np.meshgrid(ids, ids, indexing="ij")
        mask = ia < ib
        return pd.DataFrame({"vec_a": ia[mask], "vec_b": ib[mask], "cos": np.round(cos[mask], 6)})

    pairs = cand.groupBy("band", "bucket").applyInPandas(
        gemm, "vec_a long, vec_b long, cos double"
    )
    dedup = pairs.groupBy("vec_a", "vec_b").agg(F.max("cos").alias("cos"))
    return dedup.orderBy(F.desc("cos"), "vec_a", "vec_b").limit(top)


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> np.ndarray:
    """Seeded random hyperplanes — fixed constants of the index."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def bucket_expr(vec: Column, planes: np.ndarray) -> Column:
    """Sign-pattern bucket id: bit p = (vec · plane_p) >= 0."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    _to_double(vec),
                    F.array(*[F.lit(float(w)) for w in planes[p]]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit(1 << p),
        ).otherwise(F.lit(0))
        for p in range(planes.shape[0])
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


# bumped when the persisted ANN artifact layout or bucketize math changes —
# cached index dirs built with an older format are rebuilt
ANN_INDEX_FORMAT = 2


def build_ann_index(
    emb: DataFrame,
    out_dir: str,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the LSH-bucketed embedding table, partitioned by bucket.

    The on-disk analog of the reference's IVF fill (/root/reference/
    Makefile:24-25): vectors grouped into inverted lists by coarse bucket so a
    query reads only its probed buckets' FILES (partition pruning), not just
    filters them post-scan. Bucket bits are computed with ONE float64 GEMM per
    Arrow batch (mapInPandas) — Catalyst higher-order-function lambdas
    evaluate interpreted, so the per-row ``bucket_expr`` fold would be the
    build's CPU ceiling at 100 TB. Written through the table facade like every
    other index artifact, so a rebuild-overwrite is crash-atomic (tmp→swap);
    ann_params.json (the plane seed sidecar) lands LAST as the completeness
    marker.
    """
    import json
    import os
    from typing import Iterator

    import pandas as pd

    from ..sources.tables import commit

    planes = hyperplanes(_dim_of(emb, vec_col), n_planes, seed)
    weights = (1 << np.arange(n_planes, dtype=np.int64)).reshape(1, n_planes)

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = np.stack([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
            bits = m @ planes.T >= 0  # (n, n_planes), float64 — matches the
            # oracle's per-plane double dot products for any non-degenerate input
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "embedding": list(pdf[vec_col]),
                    "bucket": (bits * weights).sum(axis=1).astype(np.int32),
                }
            )

    vec_type = emb.schema[vec_col].dataType.simpleString()
    bucketed = emb.select(id_col, vec_col).mapInPandas(
        bucketize, schema=f"vec_id long, embedding {vec_type}, bucket int"
    )
    commit(bucketed, out_dir, "vectors", partition_by=["bucket"], repartition_by=["bucket"])
    with open(os.path.join(out_dir, "ann_params.json"), "w") as f:
        json.dump(
            {
                "n_planes": n_planes,
                "seed": seed,
                "dim": int(planes.shape[1]),
                "format": ANN_INDEX_FORMAT,
            },
            f,
        )


def ann_index_topk(
    spark,
    out_dir: str,
    query_vec: list[float],
    k: int = 10,
    probe_hamming: int = 1,
) -> DataFrame:
    """Query the persisted ANN index: bucket partition pruning + exact cosine
    within probed buckets -> (vec_id, cos)."""
    import json
    import os

    from ..sources.tables import read_table

    with open(os.path.join(out_dir, "ann_params.json")) as f:
        p = json.load(f)
    planes = hyperplanes(p["dim"], p["n_planes"], p["seed"])
    qv = np.asarray(query_vec, dtype=np.float64)
    qsig = 0
    for i in range(p["n_planes"]):
        if float(qv @ planes[i]) >= 0:
            qsig |= 1 << i
    probe = {qsig} | (
        {qsig ^ (1 << i) for i in range(p["n_planes"])} if probe_hamming >= 1 else set()
    )
    vectors = read_table(spark, out_dir, "vectors")
    cand = vectors.filter(F.col("bucket").isin(sorted(probe)))  # partition pruning
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = cand.select(
        "vec_id", F.round(cosine_expr(F.col("embedding"), q), 6).alias("cos")
    )
    return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)


def _dim_of(emb: DataFrame, vec_col: str) -> int:
    return len(emb.select(vec_col).first()[0])


def ann_lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: probe the query's LSH bucket (+Hamming-1).

    Exact scoring within probed buckets; approximation is only in candidate
    pruning. Deterministic for fixed (seed, n_planes).
    """
    planes = hyperplanes(len(query_vec), n_planes, seed)
    qsig = 0
    qv = np.asarray(query_vec, dtype=np.float64)
    for p in range(n_planes):
        if float(qv @ planes[p]) >= 0:
            qsig |= 1 << p
    probe = {qsig}
    if probe_hamming >= 1:
        probe |= {qsig ^ (1 << p) for p in range(n_planes)}
    bucketed = emb.withColumn("bucket", bucket_expr(F.col(vec_col), planes))
    cand = bucketed.filter(F.col("bucket").isin(sorted(probe)))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = cand.select(
        F.col(id_col).alias("vec_id"),
        F.round(cosine_expr(F.col(vec_col), q), 6).alias("cos"),
    )
    return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)
