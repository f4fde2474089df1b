"""spark-submit entry point (north_rule: `spark-submit --py-files`).

    python scripts/make_pyfiles.py                     # -> dist/abstracts_search_spark.zip
    spark-submit --py-files dist/abstracts_search_spark.zip \
        -- abstracts_search_spark/cli.py build --transcripts DIR --index DIR

Subcommands mirror the reference Makefile targets (/root/reference/Makefile):
`build` ≙ make all (incremental ingest + fill), `stream` ≙ the same via
Structured Streaming checkpoints, `tune` ≙ make tune (Makefile:31-32),
`query` ≙ the query path (README.md:16,28).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="abstracts_search_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="incremental index build (anti-join vs lineage)")
    b.add_argument("--transcripts", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--buckets", type=int, default=64)
    b.add_argument("--shard-docs", type=int, default=1 << 14)
    b.add_argument("--max-parts", type=int, default=None)
    b.add_argument("--positions", action="store_true",
                   help="carry the positional stream (enables `phrase`)")
    b.add_argument("--tokenizer", choices=["ascii", "unicode"], default="ascii",
                   help="token contract of the index (fixed at first ingest)")

    s = sub.add_parser("stream", help="incremental build via Structured Streaming")
    s.add_argument("--transcripts", required=True)
    s.add_argument("--index", required=True)
    s.add_argument("--buckets", type=int, default=64)
    s.add_argument("--shard-docs", type=int, default=1 << 14)

    t = sub.add_parser("tune", help="sweep query params -> params.json")
    t.add_argument("--index", required=True)

    c = sub.add_parser("compact", help="fold postings generations back to gen=0")
    c.add_argument("--index", required=True)
    c.add_argument("--buckets", type=int, default=64)
    c.add_argument("--shard-docs", type=int, default=1 << 14)

    q = sub.add_parser("query", help="top-k BM25 query")
    q.add_argument("--index", required=True)
    q.add_argument("--text", required=True)
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--method", choices=["bmw", "taat", "auto"], default=None)

    ph = sub.add_parser("phrase", help="exact phrase top-k over a positional index")
    ph.add_argument("--index", required=True)
    ph.add_argument("--text", required=True)
    ph.add_argument("-k", type=int, default=20)

    ab = sub.add_parser("ann-build", help="build the LSH-bucketed ANN index")
    ab.add_argument("--embeddings", required=True, help="parquet with (vec_id, embedding)")
    ab.add_argument("--index", required=True)
    ab.add_argument("--planes", type=int, default=None,
                    help="hyperplane count (default: auto-sized to the corpus)")
    ab.add_argument("--seed", type=int, default=42)

    asn = sub.add_parser("ann-sync", help="append a new vector batch as the next generation")
    asn.add_argument("--embeddings", required=True)
    asn.add_argument("--index", required=True)
    asn.add_argument("--tag", required=True, help="batch content identity (idempotency key)")

    at = sub.add_parser("ann-tune", help="sweep probe radius, record recall@k in ann_params.json")
    at.add_argument("--index", required=True)
    at.add_argument("-k", type=int, default=10)

    aq = sub.add_parser("ann-query", help="top-k cosine probe of the ANN index")
    aq.add_argument("--index", required=True)
    aq.add_argument("--embeddings", required=True,
                    help="parquet holding the query vector's row")
    aq.add_argument("--vec-id", type=int, required=True)
    aq.add_argument("-k", type=int, default=10)
    aq.add_argument("--probe-hamming", type=int, default=None,
                    help="probe radius (default: the tuned value in ann_params.json)")

    ib = sub.add_parser("ivf-build", help="train k-means cells + build the IVF index")
    ib.add_argument("--embeddings", required=True, help="parquet with (vec_id, embedding)")
    ib.add_argument("--index", required=True)
    ib.add_argument("--lists", type=int, default=None,
                    help="inverted-list count (default: auto-sized to the corpus)")
    ib.add_argument("--iters", type=int, default=2, help="Lloyd iterations")
    ib.add_argument("--nprobe", type=int, default=2, help="default probe width")
    ib.add_argument("--quantize", choices=["none", "sq8", "sq8r"], default="none",
                    help="sq8 stores vectors as uint8 codes (4x smaller than "
                         "float32); sq8r codes the residual vs the cell centroid "
                         "(tighter range, the FAISS IVF-PQ shape)")
    ib.add_argument("--train-sample-mod", type=int, default=1,
                    help="train centroids on the 1/m sample vec_id %% m == 0")

    isn = sub.add_parser("ivf-sync", help="append a new vector batch as the next generation (fixed centroids)")
    isn.add_argument("--embeddings", required=True)
    isn.add_argument("--index", required=True)
    isn.add_argument("--tag", required=True, help="batch content identity (idempotency key)")

    ic = sub.add_parser("ivf-compact", help="fold all generations back into gen=0")
    ic.add_argument("--index", required=True)

    ii = sub.add_parser("ivf-info", help="cell-occupancy stats (probe-cost balance)")
    ii.add_argument("--index", required=True)

    ai = sub.add_parser("ann-info", help="bucket-occupancy stats (probe-cost balance)")
    ai.add_argument("--index", required=True)

    ac = sub.add_parser("ann-compact", help="fold all generations back into gen=0")
    ac.add_argument("--index", required=True)

    it = sub.add_parser("ivf-tune", help="sweep nprobe, record recall@k in ivf_params.json")
    it.add_argument("--index", required=True)
    it.add_argument("-k", type=int, default=10)

    iq = sub.add_parser("ivf-query", help="top-k cosine probe of the IVF index")
    iq.add_argument("--index", required=True)
    iq.add_argument("--embeddings", required=True,
                    help="parquet holding the query vector's row")
    iq.add_argument("--vec-id", type=int, required=True)
    iq.add_argument("-k", type=int, default=10)
    iq.add_argument("--nprobe", type=int, default=None,
                    help="probe width (default: the value in ivf_params.json)")

    args = p.parse_args(argv)

    from abstracts_search_spark.session import build_spark

    spark = build_spark(f"ass-{args.cmd}")
    try:
        if args.cmd == "build":
            from abstracts_search_spark.plans.build import build_index

            m = build_index(
                spark, args.transcripts, args.index,
                buckets=args.buckets, shard_docs=args.shard_docs, max_parts=args.max_parts,
                with_positions=args.positions, tokenizer=args.tokenizer,
            )
            print(json.dumps(m))
        elif args.cmd == "stream":
            from abstracts_search_spark.streaming.incremental import stream_build

            print(json.dumps(stream_build(
                spark, args.transcripts, args.index,
                buckets=args.buckets, shard_docs=args.shard_docs,
            )))
        elif args.cmd == "tune":
            from abstracts_search_spark.plans.tune import tune_index

            print(json.dumps(tune_index(spark, args.index)))
        elif args.cmd == "compact":
            from abstracts_search_spark.plans.build import compact_index

            compact_index(spark, args.index, buckets=args.buckets, shard_docs=args.shard_docs)
            print(json.dumps({"compacted": args.index}))
        elif args.cmd == "query":
            from abstracts_search_spark.plans.query import IndexReader

            reader = IndexReader(spark, args.index)
            rows = reader.query(args.text, k=args.k, method=args.method).collect()
            for r in rows:
                print(json.dumps({"doc_id": r["doc_id"], "conv_id": r["conv_id"], "score": r["score"]}))
        elif args.cmd == "phrase":
            from abstracts_search_spark.plans.query import IndexReader

            reader = IndexReader(spark, args.index)
            for r in reader.phrase_query(args.text, k=args.k).collect():
                print(json.dumps({"doc_id": r["doc_id"], "n_hits": r["n_hits"]}))
        elif args.cmd == "ann-build":
            from abstracts_search_spark.operators.similarity import build_ann_index

            build_ann_index(
                spark.read.parquet(args.embeddings), args.index,
                n_planes=args.planes, seed=args.seed,
            )
            import json as _json

            with open(f"{args.index}/ann_params.json") as f:
                print(_json.dumps(_json.load(f)))
        elif args.cmd == "ann-sync":
            from abstracts_search_spark.operators.similarity import sync_ann_index

            appended = sync_ann_index(
                spark.read.parquet(args.embeddings), args.index, src_tag=args.tag
            )
            print(json.dumps({"appended": bool(appended), "tag": args.tag}))
        elif args.cmd == "ann-tune":
            from abstracts_search_spark.operators.similarity import tune_ann_index

            print(json.dumps(tune_ann_index(spark, args.index, k=args.k)))
        elif args.cmd == "ann-query":
            from pyspark.sql import functions as F

            from abstracts_search_spark.operators.similarity import AnnIndexReader

            row = (
                spark.read.parquet(args.embeddings)
                .filter(F.col("vec_id") == args.vec_id)
                .first()
            )
            if row is None:
                raise SystemExit(f"vec_id {args.vec_id} not found in {args.embeddings}")
            reader = AnnIndexReader(spark, args.index)
            qv = [float(x) for x in row["embedding"]]
            for r in reader.topk(qv, k=args.k, probe_hamming=args.probe_hamming).collect():
                print(json.dumps({"vec_id": r["vec_id"], "cos": r["cos"]}))
        elif args.cmd == "ivf-build":
            from abstracts_search_spark.operators.ivf import build_ivf_index

            build_ivf_index(
                spark.read.parquet(args.embeddings), args.index,
                n_lists=args.lists, iters=args.iters, nprobe=args.nprobe,
                quantize=args.quantize, train_sample_mod=args.train_sample_mod,
            )
            with open(f"{args.index}/ivf_params.json") as f:
                print(json.dumps(json.load(f)))
        elif args.cmd == "ivf-sync":
            from abstracts_search_spark.operators.ivf import sync_ivf_index

            appended = sync_ivf_index(
                spark.read.parquet(args.embeddings), args.index, src_tag=args.tag
            )
            print(json.dumps({"appended": bool(appended), "tag": args.tag}))
        elif args.cmd == "ivf-tune":
            from abstracts_search_spark.operators.ivf import tune_ivf_index

            print(json.dumps(tune_ivf_index(spark, args.index, k=args.k)))
        elif args.cmd == "ivf-compact":
            from abstracts_search_spark.operators.ivf import compact_ivf_index

            print(json.dumps({"folded_gens": compact_ivf_index(spark, args.index)}))
        elif args.cmd in ("ivf-info", "ann-info"):
            if args.cmd == "ivf-info":
                from abstracts_search_spark.operators.ivf import ivf_cell_stats

                rows = ivf_cell_stats(spark, args.index).collect()
            else:
                from abstracts_search_spark.operators.similarity import ann_bucket_stats

                rows = ann_bucket_stats(spark, args.index).collect()
            occ = [int(r["n_vecs"]) for r in rows]
            print(json.dumps({
                "cells": len(rows),
                "vectors": sum(occ),
                "empty": sum(1 for n in occ if n == 0),
                "min": min(occ) if occ else 0,
                "max": max(occ) if occ else 0,
                "avg": round(sum(occ) / len(occ), 2) if occ else 0.0,
            }))
        elif args.cmd == "ann-compact":
            from abstracts_search_spark.operators.similarity import compact_ann_index

            print(json.dumps({"folded_gens": compact_ann_index(spark, args.index)}))
        elif args.cmd == "ivf-query":
            from pyspark.sql import functions as F

            from abstracts_search_spark.operators.ivf import IvfIndexReader

            row = (
                spark.read.parquet(args.embeddings)
                .filter(F.col("vec_id") == args.vec_id)
                .first()
            )
            if row is None:
                raise SystemExit(f"vec_id {args.vec_id} not found in {args.embeddings}")
            reader = IvfIndexReader(spark, args.index)
            qv = [float(x) for x in row["embedding"]]
            for r in reader.topk(qv, k=args.k, nprobe=args.nprobe).collect():
                print(json.dumps({"vec_id": r["vec_id"], "cos": r["cos"]}))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
