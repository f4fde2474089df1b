"""Search-parameter tuning — the `sidecar-search index tune` analog
(/root/reference/Makefile:31-32: offline sweep → params.json).

The engine's query-time tunable is the shard scorer: block-max WAND (skips
decoding, wins on selective queries) vs vectorized TAAT (no skipping, zero
per-doc Python, wins on hot/dense queries). `tune_index` times both on a
sample query set against the built index and records the winner + timings in
params.json; IndexReader.query uses the tuned default when none is given.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession


def tune_index(
    spark: SparkSession,
    index_dir: str,
    sample_queries: list[str] | None = None,
    k: int = 10,
) -> dict:
    from ..sources.transcripts import gen_queries
    from .query import IndexReader

    if sample_queries is None:
        sample_queries = [q for _, q in gen_queries(n=12)]
    reader = IndexReader(spark, index_dir)
    timings: dict[str, float] = {}
    for method in ("bmw", "taat", "auto"):
        t0 = time.time()
        for q in sample_queries:
            reader.query(q, k=k, method=method).collect()
        timings[method] = round(time.time() - t0, 3)
    best = min(timings, key=timings.get)
    params_path = os.path.join(index_dir, "params.json")
    with open(params_path) as f:
        params = json.load(f)
    params["method"] = best
    params["tune_timings_sec"] = timings
    params["tune_n_queries"] = len(sample_queries)
    with open(params_path, "w") as f:
        json.dump(params, f)
    return params
