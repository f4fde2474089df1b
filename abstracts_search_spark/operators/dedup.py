"""Deduplication operators for training-data pipelines.

Exact, MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup —
each expressed relationally (explode/groupBy/join: Catalyst plans the
shuffles, partial aggregation applies, small sides broadcast). Hashing is md5
hex strings so the DuckDB oracles are bit-identical; at 100 TB you would swap
md5 for xxhash64 (same plan shape, cheaper hash) — the plans don't change.

Scale notes (100 TB): the all-pairs `jaccard_pairs` is the small-data oracle;
the scale path is `minhash_lsh_pairs`, whose only wide ops are
(doc→shingle→minhash) aggregations and a band-bucket self-join whose fan-out
is controlled by band width; hot buckets (boilerplate docs) are capped with a
per-bucket size guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_expr
from .textstats import shingles_expr


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup -> (text_md5, n_dups, keep_id) for groups >1."""
    return (
        df.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("text_md5"))
        .groupBy("text_md5")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("n_dups") > 1)
    )


def _doc_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """-> (doc_id, shingle) distinct."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.array_distinct(shingles_expr(tokens_expr(text_col), n))).alias("shingle"),
        )
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    top: int = 20,
) -> DataFrame:
    """Exact n-gram-shingle Jaccard for all pairs sharing >=1 shingle.

    Returns the `top` most-similar pairs (jaccard DESC, doc_a, doc_b) —
    exact but quadratic in the worst case: the ORACLE for the LSH path.
    """
    sh = _doc_shingles(df, id_col, text_col, n).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .select("doc_a", "doc_b", "jaccard")
    )
    return out.orderBy(F.desc("jaccard"), "doc_a", "doc_b").limit(top)


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 12,
    n: int = 3,
) -> DataFrame:
    """MinHash signatures as md5 hex strings -> (doc_id, perm, sig).

    'Permutation' i is the keyed hash md5(shingle || '#' || i); the signature
    is the lexicographic min — identical semantics in any engine with md5.
    """
    sh = _doc_shingles(df, id_col, text_col, n)
    perms = sh.sparkSession.range(num_perm).select(F.col("id").cast("int").alias("perm"))
    return (
        sh.crossJoin(F.broadcast(perms))
        .groupBy("doc_id", "perm")
        .agg(F.min(F.md5(F.concat_ws("#", "shingle", "perm"))).alias("sig"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 12,
    bands: int = 4,
    n: int = 3,
    max_bucket: int = 50,
) -> DataFrame:
    """LSH candidate pairs: band docs by hashed signature slices, pair within
    buckets -> (doc_a, doc_b, n_bands) distinct candidates.

    rows-per-band r = num_perm/bands; P(candidate) = 1-(1-j^r)^bands.
    Buckets larger than `max_bucket` are dropped (boilerplate guard) — the
    skew valve for pathological buckets at scale.
    """
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(df, id_col, text_col, num_perm, n)
    banded = (
        sigs.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.concat_ws(
                    "|",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("perm", "sig"))),
                        lambda s: s.getField("sig"),
                    ),
                )
            ).alias("bucket")
        )
    )
    guard = banded.groupBy("band", "bucket").agg(F.count("*").alias("bsz")).filter(
        (F.col("bsz") > 1) & (F.col("bsz") <= max_bucket)
    )
    small = banded.join(guard.select("band", "bucket"), ["band", "bucket"])
    a = small.alias("a")
    b = small.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").cast("long").alias("n_bands"))
    )


def simhash64(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash over tokens -> (doc_id, simhash).

    Bit j of the hash of token t is taken from xxhash64(t); the document bit j
    is sign(Σ_t tf·(2·bit_j(t)−1)). Engine-internal (xxhash64 has no DuckDB
    twin), so its driver check is rows-only; correctness is unit-tested.
    """
    toks = df.select(F.col(id_col).alias("doc_id"), F.explode(tokens_expr(text_col)).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    h = tf.withColumn("h", F.xxhash64("term"))
    bits = h.select(
        "doc_id",
        "tf",
        *[
            (F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, F.col("tf")).otherwise(-F.col("tf"))).alias(f"b{j}")
            for j in range(64)
        ],
    )
    sums = bits.groupBy("doc_id").agg(*[F.sum(f"b{j}").alias(f"b{j}") for j in range(64)])
    sim = sums.select(
        "doc_id",
        sum(
            [F.when(F.col(f"b{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long")) for j in range(63)],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return sim


def embedding_dup_pairs(emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", top: int = 20) -> DataFrame:
    """Embedding-cosine near-dup: top most-similar pairs (brute, small-scale
    oracle; the scale path is similarity.ann_lsh_topk's bucketing)."""
    from .similarity import cosine_expr

    v = emb.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    a, b = v.alias("a"), v.alias("b")
    pairs = a.join(b, F.col("a.vid") < F.col("b.vid")).select(
        F.col("a.vid").alias("vec_a"),
        F.col("b.vid").alias("vec_b"),
        F.round(cosine_expr(F.col("a.vec"), F.col("b.vec")), 6).alias("cos"),
    )
    return pairs.orderBy(F.desc("cos"), "vec_a", "vec_b").limit(top)
