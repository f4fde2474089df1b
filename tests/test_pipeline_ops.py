"""Unit layer for the training-data-pipeline operators (multimodal, textstats,
dedup) — previously covered only by the driver oracle loop (VERDICT r01 §missing 5).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from abstracts_search_spark.operators import dedup, textstats
from abstracts_search_spark.operators.multimodal import (
    FEATURE_DIM,
    _fake_decode,
    decode_features,
    frame_sample,
    gen_fake_media,
    gen_media_fixture,
)


# ------------------------------------------------------------- multimodal ----


def test_decode_features_deterministic(spark):
    media = gen_fake_media(spark, 12)
    a = sorted(decode_features(media).collect(), key=lambda r: r["media_id"])
    b = sorted(decode_features(media).collect(), key=lambda r: r["media_id"])
    assert len(a) == 12
    for ra, rb in zip(a, b):
        assert ra["features"] == rb["features"]
        assert len(ra["features"]) == FEATURE_DIM
    # matches the local fake decoder exactly (same bytes, same formula)
    src = {r["media_id"]: (r["kind"], bytes(r["payload"])) for r in media.collect()}
    for r in a:
        kind, payload = src[r["media_id"]]
        expected = _fake_decode(kind, payload)
        assert list(expected) == pytest.approx(r["features"], abs=0)


def test_frame_sample_grid(spark):
    rows = [(1, "video", None, None, None, 3500), (2, "image", None, 64, 64, None)]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, width int, height int, duration_ms int"
    )
    got = {r["media_id"]: r["frame_ms"] for r in frame_sample(media, every_ms=1000).collect()}
    assert 2 not in {r["media_id"] for r in frame_sample(media).collect()}
    frames = sorted(
        r["frame_ms"] for r in frame_sample(media, every_ms=1000).collect() if r["media_id"] == 1
    )
    assert frames == [0, 1000, 2000, 3000]


def test_media_fixture_roundtrip(spark, tmp_path):
    path = str(tmp_path / "media.parquet")
    gen_media_fixture(path, n=16)
    from_parquet = sorted(spark.read.parquet(path).collect(), key=lambda r: r["media_id"])
    from_gen = sorted(gen_fake_media(spark, 16).collect(), key=lambda r: r["media_id"])
    for a, b in zip(from_parquet, from_gen):
        assert (a["media_id"], a["kind"], bytes(a["payload"])) == (
            b["media_id"],
            b["kind"],
            bytes(b["payload"]),
        )
        assert (a["width"], a["height"], a["duration_ms"]) == (
            b["width"],
            b["height"],
            b["duration_ms"],
        )


# -------------------------------------------------------------- textstats ----


@pytest.fixture(scope="module")
def docs_with_null(spark):
    rows = [
        (0, "The cat sat on the mat. The cat!"),
        (1, None),
        (2, ""),
        (3, "word " * 150),
        (4, "!!! ??? ;;; ***"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_counts_null_text(spark, docs_with_null):
    got = {r["doc_id"]: r for r in textstats.token_counts(docs_with_null).collect()}
    assert (got[1]["ws_tokens"], got[1]["alnum_tokens"], got[1]["bpe_pieces"]) == (0, 0, 0)
    assert (got[2]["ws_tokens"], got[2]["alnum_tokens"], got[2]["bpe_pieces"]) == (0, 0, 0)
    assert got[0]["alnum_tokens"] == 8
    assert got[3]["ws_tokens"] == 150


def test_quality_score_bounds(spark, docs_with_null):
    for r in textstats.quality_score(docs_with_null).collect():
        assert 0.0 <= r["quality"] <= 1.0
        assert r["n_tokens"] >= 0


def test_lang_id_stopword_heuristic(spark, docs_with_null):
    got = {r["doc_id"]: r for r in textstats.lang_id(docs_with_null).collect()}
    assert got[0]["lang_pred"] == "en"  # 'the'/'on' stopwords present
    assert got[4]["lang_pred"] == "other"
    assert got[1]["stop_ratio"] == 0.0


def test_fingerprint_stable(spark, docs_with_null):
    a = {r["doc_id"]: r["fp"] for r in textstats.fingerprint(docs_with_null).collect()}
    b = {r["doc_id"]: r["fp"] for r in textstats.fingerprint(docs_with_null).collect()}
    assert a == b
    assert a[0] != a[3]


# ------------------------------------------------------------------ dedup ----


@pytest.fixture(scope="module")
def dup_docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again in the yard"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("lazy", "sleepy")),  # near dup
        (3, "completely different content about spark inverted index construction"),
        (4, "another unrelated document mentioning benchmarks and parquet files"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dup_groups(spark, dup_docs):
    got = dedup.exact_dup_groups(dup_docs).collect()
    assert len(got) == 1
    assert (got[0]["n_dups"], got[0]["keep_id"]) == (2, 0)


def test_minhash_lsh_finds_exact_and_near(spark, dup_docs):
    pairs = {(r["doc_a"], r["doc_b"]) for r in dedup.minhash_lsh_pairs(dup_docs).collect()}
    assert (0, 1) in pairs  # identical docs collide in every band
    assert all(a < b for a, b in pairs)


def test_jaccard_pairs_values(spark, dup_docs):
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in dedup.jaccard_pairs(dup_docs).collect()}
    assert got[(0, 1)] == 1.0
    assert 0.0 < got.get((0, 2), 0.0) < 1.0


def test_simhash_identical_and_distance(spark, dup_docs):
    got = {r["doc_id"]: r["simhash"] for r in dedup.simhash64(dup_docs).collect()}
    assert got[0] == got[1]
    ham_near = bin(got[0] ^ got[2]).count("1")
    ham_far = bin(got[0] ^ got[3]).count("1")
    assert ham_near < ham_far


def test_embedding_dup_lsh_finds_planted_near_dups(spark):
    """The LSH scale path must recover actual near-duplicates (cos→1) with
    near-certainty: P(miss) = (1-(1-θ/π)^8)^4 → 0 as θ → 0."""
    import numpy as np

    rng = np.random.default_rng(0)
    base = rng.standard_normal((40, 64))
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    # plant 3 near-dup pairs: ids (100,101,102) are tiny perturbations of 0,1,2
    for j in range(3):
        v = base[j] + rng.standard_normal(64) * 0.01
        rows.append((100 + j, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from abstracts_search_spark.operators.similarity import cosine_pairs_lsh

    got = {(r["vec_a"], r["vec_b"]): r["cos"] for r in cosine_pairs_lsh(emb, top=5).collect()}
    for j in range(3):
        assert (j, 100 + j) in got
        assert got[(j, 100 + j)] > 0.99
