"""Hot-term skew (SURVEY §5.4): a term in EVERY document must not create an
unbounded merge/query group — the docID-range shards cap it structurally."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from abstracts_search_spark.codecs.multilist import decode_posting_lists
from abstracts_search_spark.operators.oracle_numpy import BM25Oracle
from abstracts_search_spark.plans.build import build_index
from abstracts_search_spark.plans.query import IndexReader


def _mk_skew_corpus(tmp_path, n_convs=300, parts=3):
    """Every turn contains 'user' and 'assistant'; rare terms sprinkle."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    rng = np.random.default_rng(7)
    rows = {"conv_id": [], "turn_idx": [], "role": [], "text": [], "tool": [], "ts": []}
    base = np.datetime64("2024-01-01T00:00:00")
    for i in range(n_convs):
        for t in range(int(rng.integers(1, 6))):
            rows["conv_id"].append(f"conv{i:06d}")
            rows["turn_idx"].append(t)
            rows["role"].append("user" if t % 2 == 0 else "assistant")
            rows["text"].append(f"user assistant common{int(rng.integers(0, 5))} rare{i % 37}")
            rows["tool"].append(None)
            rows["ts"].append((base + np.timedelta64(i, "m")).astype("datetime64[us]"))
    d = str(tmp_path / "skew_tx")
    # split convs round-robin into parts (each conv entirely in one part)
    conv_part = {f"conv{i:06d}": i % parts for i in range(n_convs)}
    tbl = pa.table(
        {
            "conv_id": pa.array(rows["conv_id"]),
            "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
            "role": pa.array(rows["role"]),
            "text": pa.array(rows["text"]),
            "tool": pa.array(rows["tool"], pa.string()),
            "ts": pa.array(rows["ts"], pa.timestamp("us")),
            "part": pa.array([conv_part[c] for c in rows["conv_id"]], pa.int32()),
        }
    )
    for p in range(parts):
        sub = tbl.filter(pa.compute.equal(tbl["part"], p)).drop_columns(["part"])
        os.makedirs(f"{d}/part={p}", exist_ok=True)
        pq.write_table(sub, f"{d}/part={p}/data.parquet")
    return d


def test_hot_term_sharded_and_rank_identical(spark, tmp_path):
    shard_docs = 64
    d = _mk_skew_corpus(tmp_path)
    ix = str(tmp_path / "skew_ix")
    build_index(spark, d, ix, buckets=4, shard_docs=shard_docs)

    postings = spark.read.option("basePath", f"{ix}/postings").parquet(f"{ix}/postings")
    from abstracts_search_spark.operators.postings import term_id_of

    hot = postings.filter(F.col("term_id") == term_id_of("user")).collect()
    # the hot term is split across shards, each row bounded by the shard width
    assert len(hot) >= 4
    assert all(r["df"] <= shard_docs for r in hot)
    total_df = sum(r["df"] for r in hot)
    reader = IndexReader(spark, ix)
    assert total_df == reader.n_docs  # 'user' occurs in every doc

    # rank-identity on the hot query vs brute-force oracle
    docmap = spark.read.parquet(f"{ix}/docmap").collect()
    conv_of = {r["doc_id"]: r["conv_id"] for r in docmap}
    t = spark.read.option("basePath", d).parquet(d)
    raw = t.toPandas().sort_values(["conv_id", "turn_idx"])
    docs_by_conv = {
        c: " ".join(g["text"]) for c, g in raw.groupby("conv_id")
    }
    conv_rank = {c: i for i, c in enumerate(sorted(docs_by_conv))}
    oracle = BM25Oracle({conv_rank[c]: txt for c, txt in docs_by_conv.items()})
    for q in ["user assistant", "user rare3", "common2 assistant"]:
        got = [(r["doc_id"], r["score"]) for r in reader.query(q, k=10).collect()]
        want = oracle.topk(q, k=10)
        assert [d_ for d_, _ in got] == [d_ for d_, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) <= 1e-6 * max(1.0, abs(ws))
