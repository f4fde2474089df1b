"""Measure the shuffle-byte win of the slim cosine_pairs_lsh exchange
(VERDICT r02 item 6): run the SAME near-dup query twice on the same input —

- wide  (carry_vectors=True):  float64 vectors ride the band posexplode
- slim  (carry_vectors=False): narrow (vid, band, bucket) rows ride the
  explode; storage-width (float32) vectors re-join only guard-surviving
  candidates

Each variant runs in its own SparkSession with an event log; total
"Shuffle Bytes Written" is summed from SparkListenerTaskEnd task metrics.
Writes BENCH_shuffle.json and prints one JSON line.

Usage: python scripts/shuffle_profile.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _shuffle_bytes(eventlog_dir: str) -> int:
    # Spark 4 writes rolling v2 event logs as DIRECTORIES (eventlog_v2_<app>/
    # events_1_... files) — walk everything under the log dir
    total = 0
    for root, _, files in os.walk(eventlog_dir):
        for fname in files:
            path = os.path.join(root, fname)
            try:
                with open(path) as f:
                    for line in f:
                        if '"SparkListenerTaskEnd"' not in line:
                            continue
                        ev = json.loads(line)
                        m = (ev.get("Task Metrics") or {}).get("Shuffle Write Metrics") or {}
                        total += int(m.get("Shuffle Bytes Written", 0))
            except (OSError, UnicodeDecodeError):
                continue
    return total


def run_variant(sf_dir: str, carry_vectors: bool) -> dict:
    from pyspark.sql import SparkSession

    from abstracts_search_spark.operators.similarity import cosine_pairs_lsh

    logdir = tempfile.mkdtemp(prefix=f"evlog_{'wide' if carry_vectors else 'slim'}_")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"shuffle_profile_{carry_vectors}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", logdir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    t0 = time.time()
    n = cosine_pairs_lsh(emb, carry_vectors=carry_vectors).count()
    wall = time.time() - t0
    spark.stop()
    return {
        "carry_vectors": carry_vectors,
        "rows": n,
        "wall_sec": round(wall, 3),
        "shuffle_bytes_written": _shuffle_bytes(logdir),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    wide = run_variant(sf_dir, carry_vectors=True)
    slim = run_variant(sf_dir, carry_vectors=False)
    assert wide["rows"] == slim["rows"], (wide, slim)
    out = {
        "sf_dir": sf_dir,
        "wide": wide,
        "slim": slim,
        "shuffle_bytes_ratio": round(
            slim["shuffle_bytes_written"] / max(1, wide["shuffle_bytes_written"]), 4
        ),
    }
    with open(os.path.join(_REPO, "BENCH_shuffle.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
