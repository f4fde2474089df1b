"""A/B microbench for the indexed-phrase shard matcher (r4-verdict item 2).

Times the vectorized flat-intersection matcher (operators/phrase.py,
make_phrase_matcher_multi) against the round-4 per-candidate-doc Python loop
(inlined below as the reference implementation) on a HOT phrase: every
candidate doc in the shard contains both terms, so the per-doc loop pays its
~16k × L numpy-call constant in full. Inputs are REAL posting rows — a
positional index is built over a synthetic hot corpus and the two terms'
rows are pulled into pandas — so the timed work is exactly the per-shard
applyInPandas body, without Spark in the timed loop.

Usage: python scripts/phrase_microbench.py [n_docs]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def old_matcher(term_seqs: dict[int, list[int]]):
    """Round-4 matcher body (per-candidate-doc loop) — reference for A/B."""
    all_terms = sorted({t for seq in term_seqs.values() for t in seq})

    def match_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        from abstracts_search_spark.codecs.multilist import decode_posting_lists
        from abstracts_search_spark.operators.phrase import count_nonoverlapping

        dfs = pdf["df"].to_numpy(np.int64)
        docs, tfs, _, _, pos = decode_posting_lists(
            [bytes(b) for b in pdf["doc_bin"]],
            [bytes(b) for b in pdf["tf_bin"]],
            [bytes(b) for b in pdf["dl_bin"]],
            dfs,
            pos_bins=[bytes(b) for b in pdf["pos_bin"]],
        )
        entry_tid = np.repeat(pdf["term_id"].to_numpy(np.int64), dfs)
        occ_bounds = np.zeros(tfs.shape[0] + 1, dtype=np.int64)
        np.cumsum(tfs, out=occ_bounds[1:])
        per_term = {}
        for t in all_terms:
            idx = np.flatnonzero(entry_tid == t)
            if idx.shape[0]:
                o = np.argsort(docs[idx], kind="stable")
                per_term[t] = (docs[idx][o], idx[o])
        out_q, out_d, out_n = [], [], []
        for qid, term_seq in term_seqs.items():
            L = len(term_seq)
            distinct = sorted(set(term_seq))
            if any(t not in per_term for t in distinct):
                continue
            cand = per_term[distinct[0]][0]
            for t in distinct[1:]:
                cand = np.intersect1d(cand, per_term[t][0], assume_unique=True)
                if cand.shape[0] == 0:
                    break
            for doc in cand:
                starts = None
                for i, t in enumerate(term_seq):
                    tdocs, tidx = per_term[t]
                    e = int(tidx[np.searchsorted(tdocs, doc)])
                    p = pos[occ_bounds[e] : occ_bounds[e + 1]] - i
                    starts = p if starts is None else np.intersect1d(
                        starts, p, assume_unique=True
                    )
                    if starts.shape[0] == 0:
                        break
                if starts is not None and starts.shape[0]:
                    n = count_nonoverlapping(starts, L)
                    if n > 0:
                        out_q.append(qid)
                        out_d.append(int(doc))
                        out_n.append(n)
        return pd.DataFrame({"query_id": out_q, "doc_id": out_d, "n_hits": out_n})

    return match_shard


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 16_384

    from abstracts_search_spark.functions.tokenize import tokenize_pd
    from abstracts_search_spark.operators.phrase import make_phrase_matcher_multi
    from abstracts_search_spark.operators.postings import term_id_of
    from abstracts_search_spark.plans.build import build_doc_index
    from abstracts_search_spark.session import build_spark

    rng = np.random.default_rng(7)
    fillers = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = []
    for d in range(n_docs):
        words = []
        for _ in range(int(rng.integers(2, 6))):
            words += ["the", "data"]
            words += [fillers[int(x)] for x in rng.integers(0, len(fillers), 8)]
        texts.append(" ".join(words))

    spark = build_spark("phrase-microbench", master="local[4]", shuffle_partitions=4)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    idx = tempfile.mkdtemp(prefix="phrase_bench_idx_")
    try:
        # one shard on purpose: every doc lands in the per-shard group being timed
        build_doc_index(docs, idx, shard_docs=max(n_docs, 1 << 14), with_positions=True)
        from abstracts_search_spark.sources.tables import read_table
        from pyspark.sql import functions as F

        toks = list(tokenize_pd(pd.Series(["the data"]))[0])
        tids = [term_id_of(t) for t in toks]
        pdf = (
            read_table(spark, idx, "postings")
            .filter(F.col("term_id").isin(tids))
            .toPandas()
        )
        spark.stop()
        print(f"{n_docs} docs, {len(pdf)} posting rows for phrase 'the data'")

        term_seqs = {0: tids}
        new_fn = make_phrase_matcher_multi(term_seqs)
        old_fn = old_matcher(term_seqs)

        r_new = new_fn(pdf).sort_values("doc_id").reset_index(drop=True)
        r_old = old_fn(pdf).sort_values("doc_id").reset_index(drop=True)
        assert r_new.equals(r_old), "matcher outputs diverge"
        print(f"outputs identical: {len(r_new)} matching docs")

        for name, fn in (("old(per-doc loop)", old_fn), ("new(flat vector)", new_fn)):
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(pdf)
                runs.append(time.perf_counter() - t0)
            med = sorted(runs)[1]
            print(f"{name}: median {med*1000:.1f} ms  (runs {[f'{r*1000:.1f}' for r in runs]})")
    finally:
        shutil.rmtree(idx, ignore_errors=True)


if __name__ == "__main__":
    main()
