"""Extra benchmarks for the optimization rounds (bench.py is FROZEN for
measurement; everything exploratory lives here — guide §1.4/§1.5).

Times each declared query in isolation (same ``.count()`` estimator as
bench.py so numbers are comparable with the driver's), optionally captures
``explain("formatted")`` per query, and can run the same-session query A/B
(query set → build → query set again) that retires the r5 host-decline
ambiguity (VERDICT r5 item 4).

Usage:
  python bench_extra.py [--sf DIR] [--runs N] [--plans OUTDIR]
                        [--queries a,b,c] [--ab] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_REPO = os.path.dirname(os.path.abspath(__file__))

# the driver-bench query list (bench.py:243-260) — the comparison set
BENCH_QUERIES = [
    "bm25_topk",
    "bm25_topk_indexed",
    "phrase_match",
    "phrase_match_indexed",
    "tokenize_tf",
    "ann_lsh_topk",
    "ann_lsh_topk_many",
    "ivf_topk",
    "ivf_topk_sq8",
    "minhash_lsh_pairs",
    "jaccard_pairs",
    "ann_cosine_topk",
    "embedding_dup_pairs",
    "embedding_dup_lsh",
    "quality_score",
    "fingerprint",
]


def main() -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dir to write <query>.txt explain output")
    ap.add_argument("--queries", default=None, help="comma list; default = bench.py's set")
    ap.add_argument("--ab", action="store_true", help="same-session query A/B around a build")
    ap.add_argument("--json", dest="json_out", default=None)
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from abstracts_search_spark.session import build_spark

    spark = build_spark("bench_extra", master=f"local[{cpus}]", shuffle_partitions=cpus)
    names = args.queries.split(",") if args.queries else BENCH_QUERIES

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out: dict = {"sf_dir": args.sf, "cpus": cpus, "queries": {}, "runs": {}}

    if args.ab:
        _run_ab(spark, entrymod, args.sf, out)

    for name in names:
        fn = qs[name]
        runs = []
        rows = None
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}:{i}")
            t0 = time.time()
            rows = fn(spark, args.sf).count()
            runs.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        med = sorted(runs)[len(runs) // 2]
        out["queries"][name] = med
        out["runs"][name] = {"runs": runs, "rows": rows}
        print(f"{name}: median {med}s (runs {runs}, {rows} rows)", file=sys.stderr)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, args.sf)
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))

    line = json.dumps(out)
    print(line)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(line)
    return out


def _run_ab(spark, entrymod, sf_dir: str, out: dict) -> None:
    """Same-session A/B (VERDICT r5 item 4): 50-query set, then a bench4x
    index build, then the query set again — both medians reported. If the
    repeat matches the first, within-session host decline (not code) explains
    any cross-artifact qps gap."""
    import shutil
    import tempfile

    from abstracts_search_spark.plans.build import build_index
    from abstracts_search_spark.plans.query import IndexReader
    from abstracts_search_spark.sources.transcripts import gen_queries, gen_transcripts

    tx_dir = os.path.join(_REPO, "data", "bench", "transcripts_bench4x")
    if not os.path.exists(os.path.join(tx_dir, "part=0")):
        gen_transcripts(tx_dir, scale="bench4x", seed=42)
    index_dir = tempfile.mkdtemp(prefix="ab_index_")
    try:
        build_index(spark, tx_dir, index_dir)  # warmup build (also builds the index)
        reader = IndexReader(spark, index_dir)
        qset = gen_queries(n=50)
        reader.query(qset[0][1], k=10).collect()  # reader warmup

        def qmedian(tag: str) -> float:
            runs = []
            for _ in range(3):
                t0 = time.time()
                reader.query_many({qid: q for qid, q in qset}, k=10).collect()
                runs.append(round(time.time() - t0, 3))
            med = sorted(runs)[1]
            print(f"ab {tag}: median {med}s (runs {runs})", file=sys.stderr)
            return med

        q1 = qmedian("query_set#1")
        t0 = time.time()
        build_index(spark, tx_dir, os.path.join(index_dir, "rebuild"))
        build_s = round(time.time() - t0, 3)
        q2 = qmedian("query_set#2")
        out["ab"] = {
            "query_set_before": q1,
            "build_between_sec": build_s,
            "query_set_repeat": q2,
            "repeat_ratio": round(q2 / q1, 3) if q1 else None,
        }
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
