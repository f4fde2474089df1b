"""Microbench: k-means assignment at the reference's 65,536-list geometry
(r5 verdict #1 done-criterion).

The r5 `assign_ids` materialized TWO (batch × n_lists) float64 matrices —
at a 10k-row Arrow batch × 65,536 lists that is ~5.2 GB each per concurrent
task (>300 GB across local[32]). The r6 tiled version
(ASSIGN_ROW_CHUNK × ASSIGN_CENT_BLOCK running argmin) bounds peak memory to
the tile (~32 MB) + the inputs, regardless of batch or list count, with
identical assignments (same rounded d² per element, same tie rule).

Pure numpy driver-side measurement (no Spark): times one 10k-row batch at
n_lists=65,536, reports wall seconds and peak RSS delta, and cross-checks a
small geometry against a literal untiled reference implementation.

Usage: python scripts/ivf_assign_microbench.py [n_rows] [n_lists] [dim]
"""

from __future__ import annotations

import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from abstracts_search_spark.operators.ivf import assign_ids


def untiled_reference(m: np.ndarray, cents: np.ndarray) -> np.ndarray:
    vv = (m * m).sum(axis=1)
    vc = m @ cents.T
    cc = (cents * cents).sum(axis=1)
    d2 = np.round((vv[:, None] - 2.0 * vc) + cc[None, :], 6)
    return d2.argmin(axis=1).astype(np.int32)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    n_lists = int(sys.argv[2]) if len(sys.argv) > 2 else 65_536
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    rng = np.random.default_rng(42)
    # equivalence check at a tile-straddling geometry (forces >1 block both ways)
    ms = rng.standard_normal((2500, 16))
    cs = np.round(rng.standard_normal((5000, 16)), 6)
    assert (assign_ids(ms, cs) == untiled_reference(ms, cs)).all(), "tiled != untiled"
    # tie check: duplicated centroids must resolve to the LOWEST list id
    cdup = np.concatenate([cs, cs])
    a = assign_ids(ms, cdup)
    assert (a < 5000).all(), "tie did not resolve to the lowest list id"
    print("equivalence + tie checks: OK", file=sys.stderr)

    m = rng.standard_normal((n_rows, dim))
    cents = np.round(rng.standard_normal((n_lists, dim)), 6)
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    t0 = time.time()
    out = assign_ids(m, cents)
    wall = time.time() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    naive_bytes = 2 * n_rows * n_lists * 8
    print(
        f"assign_ids: {n_rows} rows x {n_lists} lists x dim {dim}: "
        f"{wall:.2f}s, peak-RSS delta {(rss1 - rss0) / 1024:.0f} MiB "
        f"(untiled d2 matrices alone would be {naive_bytes / 2**30:.1f} GiB); "
        f"{np.unique(out).size} distinct lists assigned"
    )


if __name__ == "__main__":
    main()
