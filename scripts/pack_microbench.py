"""Single-threaded A/B of the pack_doc_tokens inner loop (no Spark).

Reads the bench fixture with pyarrow, assembles per-conversation documents
with pandas, then times the VECTORIZED round-4 pack batch function against
the round-3 Counter-based loop on identical batches. Pure CPU — this is the
exact code the mapInPandas workers run, so the ratio here is the ratio of
the build's Python stage at any parallelism.

Usage: python scripts/pack_microbench.py [scale] [batch_rows]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd
import pyarrow.dataset as ds

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from abstracts_search_spark.functions.tokenize import _TOKEN_RE
from abstracts_search_spark.operators.postings import term_id_of

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUCKETS = 64


def load_docs(scale: str) -> pd.DataFrame:
    d = os.path.join(_REPO, "data", "bench", f"transcripts_{scale}")
    t = ds.dataset(d, format="parquet", partitioning="hive").to_table(
        columns=["conv_id", "turn_idx", "text"]
    ).to_pandas()
    t = t[t["text"].notna() & (t["text"] != "")]
    t = t.sort_values(["conv_id", "turn_idx"], kind="stable")
    docs = t.groupby("conv_id", sort=False)["text"].agg(" ".join).reset_index()
    docs["doc_id"] = np.arange(len(docs), dtype=np.int64)
    docs["src_part"] = 0
    docs["doclen"] = 0
    return docs.rename(columns={"text": "document"})


def pack_old(pdf: pd.DataFrame, id_cache: dict) -> tuple:
    """Round-3 Counter-based per-token loop (reference for the A/B)."""
    from collections import Counter

    cache_get = id_cache.get
    rows_bks, rows_ts, rows_fs, keep = [], [], [], []
    for i, text in enumerate(pdf["document"]):
        toks = [m.lower() for m in _TOKEN_RE.findall(text or "")]
        if not toks:
            continue
        by_bucket: dict[int, tuple[list, list]] = {}
        for t, n in Counter(toks).items():
            tb = cache_get(t)
            if tb is None:
                tid = term_id_of(t)
                tb = (tid, tid % BUCKETS)
                id_cache[t] = tb
            slot = by_bucket.get(tb[1])
            if slot is None:
                slot = ([], [])
                by_bucket[tb[1]] = slot
            slot[0].append(tb[0])
            slot[1].append(n)
        keep.append(i)
        rows_bks.append(list(by_bucket.keys()))
        rows_ts.append([v[0] for v in by_bucket.values()])
        rows_fs.append([v[1] for v in by_bucket.values()])
    return rows_bks, rows_ts, rows_fs


def main():
    scale = sys.argv[1] if len(sys.argv) > 1 else "bench"
    batch_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    docs = load_docs(scale)
    n_tokens = int(docs["document"].str.count(r"[A-Za-z0-9]+").sum())
    print(f"{len(docs)} docs, {n_tokens} tokens", file=sys.stderr)
    batches = [docs.iloc[i : i + batch_rows] for i in range(0, len(docs), batch_rows)]

    from abstracts_search_spark.operators.postings import pack_doc_tokens  # noqa: F401
    # grab the vectorized batch fn the way the UDF runs it: re-create the
    # closure body by calling the mapInPandas generator directly
    import abstracts_search_spark.operators.postings as P

    # build the same `run` closure pack_doc_tokens builds (positions off)
    made = {}

    class FakeDF:
        """Capture the mapInPandas closure without a SparkSession."""
        columns = ["doc_id", "src_part", "doclen", "document"]

        def mapInPandas(self, fn, schema):
            made["fn"] = fn
            raise _Captured

    class _Captured(Exception):
        pass

    try:
        P.pack_doc_tokens(FakeDF(), buckets=BUCKETS, text_col="document")
    except _Captured:
        pass
    run_new = made["fn"]

    import pyarrow as pa

    t0 = time.time()
    outs = list(run_new(iter(batches)))
    t_new = time.time() - t0
    t0 = time.time()
    for o in outs:
        pa.Table.from_pandas(o)  # the Arrow conversion the UDF boundary pays
    t_new_arrow = time.time() - t0

    cache: dict = {}
    t0 = time.time()
    olds = [pack_old(b, cache) for b in batches]
    t_old = time.time() - t0
    t0 = time.time()
    for bks, ts, fs in olds:
        pa.Table.from_pandas(pd.DataFrame({"bks": bks, "ts": ts, "fs": fs}))
    t_old_arrow = time.time() - t0

    print(
        f"new(vectorized): compute {t_new:.2f}s + arrow {t_new_arrow:.2f}s "
        f"({n_tokens / (t_new + t_new_arrow) / 1e6:.2f} M tok/s)\n"
        f"old(counter):    compute {t_old:.2f}s + arrow {t_old_arrow:.2f}s "
        f"({n_tokens / (t_old + t_old_arrow) / 1e6:.2f} M tok/s)\n"
        f"speedup x{(t_old + t_old_arrow) / (t_new + t_new_arrow):.2f}"
    )


if __name__ == "__main__":
    main()
