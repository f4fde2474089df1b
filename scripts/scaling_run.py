"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so the N-vs-4N-executor criterion is
evidenced by running the SAME index build at two parallelism levels on the
SAME input: local[8] vs local[32] (separate JVMs via subprocess — a Spark
local master is fixed per JVM). Reports throughput at both plus

    efficiency = (tps_32 / tps_8) / (32 / 8)

and appends the result to BENCH_scaling.json. Target: >= 0.8.

Usage: python scripts/scaling_run.py [n_low] [n_high]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, repeats: int = 1) -> dict:
    """N runs per level; the HEADLINE estimator is the median (robust under
    the documented up-to-2x single-host transient noise), with the max and the
    full raw-run list disclosed alongside."""
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    env.setdefault("SPARK_GRAFT_BENCH_SCALE", "bench")
    # scaling only needs build + query-set numbers; headline operator queries
    # at sf0.1 would also pollute the BENCH_local_latest.json snapshot
    env.setdefault("SPARK_GRAFT_SKIP_HEADLINE", "1")
    runs = []
    for _ in range(repeats):
        out = subprocess.run(
            [sys.executable, os.path.join(_REPO, "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        runs.append(json.loads(out.stdout.strip().splitlines()[-1]))
        print(f"  local[{cpus}] run: {runs[-1]['build']['turns_per_sec']} turns/sec",
              file=sys.stderr)
    raw = [r["build"]["turns_per_sec"] for r in runs]
    med = statistics.median(raw)
    rep = min(runs, key=lambda r: abs(r["build"]["turns_per_sec"] - med))
    rep = dict(rep)
    rep["all_turns_per_sec"] = raw
    rep["median_turns_per_sec"] = round(med, 1)
    rep["max_turns_per_sec"] = round(max(raw), 1)
    return rep


def main():
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_high = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "3"))
    results = {}
    for cpus in (n_low, n_high):
        print(f"=== local[{cpus}] ===", file=sys.stderr)
        r = run_at(cpus, repeats=repeats)
        results[cpus] = r
        print(
            f"local[{cpus}]: build {r['build']['turns_per_sec']} turns/sec, "
            f"queries {r['query_set']['qps']} qps",
            file=sys.stderr,
        )
    tps_low = results[n_low]["median_turns_per_sec"]
    tps_high = results[n_high]["median_turns_per_sec"]
    eff = (tps_high / tps_low) / (n_high / n_low)
    eff_max = (results[n_high]["max_turns_per_sec"] / results[n_low]["max_turns_per_sec"]) / (n_high / n_low)
    out = {
        "n_low": n_low,
        "n_high": n_high,
        "n_repeats": repeats,
        "turns_per_sec_low": tps_low,
        "turns_per_sec_high": tps_high,
        "speedup": round(tps_high / tps_low, 3),
        "scaling_efficiency": round(eff, 3),
        "scaling_efficiency_max_of_n": round(eff_max, 3),
        "max_turns_per_sec_low": results[n_low]["max_turns_per_sec"],
        "max_turns_per_sec_high": results[n_high]["max_turns_per_sec"],
        "query_qps_low": results[n_low]["query_set"]["qps"],
        "query_qps_high": results[n_high]["query_set"]["qps"],
        "bench_scale": results[n_high].get("bench_scale"),
        "method": "median-of-N per level is the headline (max-of-N and raw runs disclosed; single-host transient noise up to 2x at high N)",
        "raw_turns_per_sec_low": results[n_low]["all_turns_per_sec"],
        "raw_turns_per_sec_high": results[n_high]["all_turns_per_sec"],
    }
    with open(os.path.join(_REPO, "BENCH_scaling.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
