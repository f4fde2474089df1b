"""Benchmark entry point (driver contract + BASELINE.md target metrics).

Measures, on `local[$SPARK_GRAFT_CPUS]` (default 32):

1. **index-build throughput** (the authoritative metric, BASELINE.json):
   build the full inverted index over the deterministic `bench4x` transcripts
   fixture (~80k convs / ~1.6M turns) → turns/sec.
2. **query latency** over the 50-query reference set via block-max WAND.
3. **headline operator queries** at $SPARK_GRAFT_SF_DIR (default
   /root/testdata/sf0.1): BM25 brute + indexed, MinHash-LSH dedup, ANN.

Prints ONE JSON line:
{"metric": "bench_total", "value": <sec>, "unit": "sec",
 "queries": {...per-step seconds...}, "sf": ...,
 "build": {"n_turns":..., "wall_sec":..., "turns_per_sec":...},
 "query_set": {"n": 50, "total_sec":..., "qps":...}}

Run `python scripts/scaling_run.py` for the local[8]-vs-local[32] scaling
evidence (two-cluster-size criterion, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_REPO = os.path.dirname(os.path.abspath(__file__))


def main() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # bench4x (1.6M turns) by default: the 399k-turn `bench` fixture is fixed-
    # cost dominated at 32 cores (28s build, ~12s of driver-serial/JVM-warmup
    # overhead), understating sustained throughput by ~2.5×
    bench_scale = os.environ.get("SPARK_GRAFT_BENCH_SCALE", "bench4x")
    sf_tag = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "") or "0.1"

    from abstracts_search_spark.session import build_spark
    from abstracts_search_spark.sources.transcripts import gen_queries, gen_transcripts
    from abstracts_search_spark.plans.build import build_index
    from abstracts_search_spark.plans.query import IndexReader

    # fixture is deterministic → generate once, reuse across runs
    tx_dir = os.path.join(_REPO, "data", "bench", f"transcripts_{bench_scale}")
    if not os.path.exists(os.path.join(tx_dir, "part=0")):
        print(f"generating {bench_scale} fixture...", file=sys.stderr)
        gen_transcripts(tx_dir, scale=bench_scale, seed=42)

    spark = build_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    timings: dict[str, float] = {}
    t_all = time.time()

    # --- 1. index build throughput -----------------------------------------
    # one WARMUP build (JVM codegen, Python worker pool, page cache — the
    # one-time session costs a long-running 100 TB build pays once; timed and
    # disclosed separately, same policy as the query-set reader_warmup), then
    # median-of-N with raw runs disclosed: single-shot numbers on this host
    # swing up to ~4× run-to-run, which made cross-round deltas unreadable
    n_build_runs = int(os.environ.get("SPARK_GRAFT_BUILD_RUNS", "3"))
    b_runs: list[float] = []
    warmup_sec = 0.0
    n_turns = n_docs = 0
    index_dir = ""
    for i in range(n_build_runs + 1):
        if index_dir:
            shutil.rmtree(index_dir, ignore_errors=True)
        index_dir = tempfile.mkdtemp(prefix="bench_index_")
        t0 = time.time()
        metrics = build_index(spark, tx_dir, index_dir)
        wall = round(time.time() - t0, 3)
        n_turns, n_docs = int(metrics["n_turns"]), int(metrics["n_docs"])
        if i == 0:
            warmup_sec = wall
            print(f"build warmup: {wall}s", file=sys.stderr)
        else:
            b_runs.append(wall)
            print(f"build run {i}/{n_build_runs}: {wall}s", file=sys.stderr)
    build_wall = sorted(b_runs)[len(b_runs) // 2]
    timings["index_build"] = build_wall
    build = {
        "n_turns": n_turns,
        "n_docs": n_docs,
        "wall_sec": build_wall,
        "runs": b_runs,
        "warmup_sec": warmup_sec,
        "turns_per_sec": round(n_turns / build_wall, 1),
    }
    print(f"build: {build}", file=sys.stderr)

    # --- 2. reference query set via block-max WAND --------------------------
    reader = IndexReader(spark, index_dir)
    qset = gen_queries(n=50)
    # one-time costs (dictionary cache fill, scan-planning file listing,
    # python-worker/codegen warmup) are timed SEPARATELY so the query-set
    # number is steady-state throughput, the regime a long-lived reader runs in
    t0 = time.time()
    reader.query(qset[0][1], k=10).collect()
    timings["reader_warmup"] = round(time.time() - t0, 3)
    # median of 3 batched runs (raw runs disclosed) — same estimator policy as
    # scripts/scaling_run.py: this host's run-to-run noise is up to 2x
    q_runs = []
    for _ in range(3):
        t0 = time.time()
        n_rows = len(reader.query_many({qid: q for qid, q in qset}, k=10).collect())
        q_runs.append(round(time.time() - t0, 3))
    qtotal = sorted(q_runs)[1]
    timings["query_set_50_batched"] = qtotal  # raw runs live in query_set.runs
    # per-query latency sample (the interactive path: block-max WAND)
    lat = []
    for _, q in qset[:8]:
        t0 = time.time()
        reader.query(q, k=10).collect()
        lat.append(time.time() - t0)
    timings["query_single_avg"] = round(sum(lat) / len(lat), 3)
    query_set = {
        "n": len(qset),
        "total_sec": round(qtotal, 3),
        "qps": round(len(qset) / qtotal, 2),
        "runs": q_runs,
        "rows": n_rows,
        "single_query_avg_sec": timings["query_single_avg"],
    }
    print(f"query_set: {query_set}", file=sys.stderr)

    # --- 3. headline operator queries at sf_dir ----------------------------
    if os.environ.get("SPARK_GRAFT_SKIP_HEADLINE"):
        total = time.time() - t_all
        spark.stop()
        shutil.rmtree(index_dir, ignore_errors=True)
        out = {
            "metric": "index_build_turns_per_sec",
            "value": build["turns_per_sec"],
            "unit": "turns/sec",
            "queries": timings,
            "sf": float(sf_tag),
            "cpus": cpus,
            "bench_scale": bench_scale,
            "build": build,
            "query_set": query_set,
            "total_sec": round(total, 3),
        }
        print(json.dumps(out))
        return out

    import __spark_entry__ as entrymod

    # warm the persisted documents index (build-once/query-many architecture);
    # its one-time build cost is reported as its own line, never as query time
    t0 = time.time()
    entrymod._doc_index_reader(spark, sf_dir)
    timings["doc_index_open"] = round(time.time() - t0, 3)
    print(f"doc_index_open: {timings['doc_index_open']}s", file=sys.stderr)

    qs = entrymod.queries()
    for name in (
        "bm25_topk",
        "bm25_topk_indexed",
        "phrase_match",
        "phrase_match_indexed",
        "tokenize_tf",
        "minhash_lsh_pairs",
        "jaccard_pairs",
        "ann_cosine_topk",
        "embedding_dup_pairs",
        "embedding_dup_lsh",
        "quality_score",
        "fingerprint",
    ):
        t0 = time.time()
        cnt = qs[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        print(f"{name}: {timings[name]}s ({cnt} rows)", file=sys.stderr)

    total = time.time() - t_all
    spark.stop()
    shutil.rmtree(index_dir, ignore_errors=True)

    out = {
        "metric": "index_build_turns_per_sec",
        "value": build["turns_per_sec"],
        "unit": "turns/sec",
        "queries": timings,
        "sf": float(sf_tag),
        "cpus": cpus,
        "bench_scale": bench_scale,
        "build": build,
        "query_set": query_set,
        "total_sec": round(total, 3),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
