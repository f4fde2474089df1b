"""Posting segment build + merge — the index centerpiece (SURVEY.md A5/A6).

Mirrors the reference's two-stage shape: per-source-partition incremental
builds that accumulate into a store (/root/reference/Makefile:57-66), then a
global fill producing on-disk inverted lists (Makefile:24-25). Here:

- **build_segments** — per src partition: tokens → dictionary-encoded to
  int64 ``term_id`` → grouped by (src_part, bucket, shard) →
  ``applyInPandas`` emits one encoded posting row per term.
  ``bucket = term_id % B`` drives query-time partition pruning (the analog of
  IVF probing only nprobe lists, SURVEY.md §4); ``shard = doc_id //
  shard_docs`` tiles the docID space so doc ranges are DISJOINT across shards.
- **merge_segments** — grouped by (bucket, shard): concatenates each term's
  per-src-partition postings (disjoint doc sets), re-sorts, re-encodes with
  block metadata.

Skew (north_star: hot terms 'user'/'assistant'): a hot term's postings are
bounded per group by the shard's doc-range width — the skew is sharded away
structurally instead of salted after the fact; a term appearing in every doc
produces `n_shards` independent, equally-sized merge rows (and query-time
rows) that process in parallel. AQE never sees a mega-group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 64
# docID-range tile per shard: bounds merge-group width AND sets the
# parallelism floor of merge + query scoring (one group per (bucket, shard));
# 16k docs/shard keeps even a 100k-doc corpus multi-shard while a hot term
# still packs ~16k postings per row
DEFAULT_SHARD_DOCS = 1 << 14

# Postings are keyed by `term_id`, the signed-int64 blake2b-8 hash of the
# term string — the dictionary-encoding of the token stream. The id is
# computed ONCE, in the same Arrow pass that tokenizes (pack_doc_tokens), so
# the build's single largest exchange moves fixed-width int64 keys instead of
# variable-length strings: severalfold fewer shuffle bytes, which is the
# memory-bandwidth ceiling of the wide build stage (BASELINE.md). Queries
# recompute term_id_of(query term) driver-side — no string dictionary needed.
# Collision math: for vocabulary V, expected colliding pairs ≈ V²/2^65
# (V=10⁹ → 0.03 expected collisions corpus-wide; a collision merges two
# terms' postings). A 128-bit id (two columns) is the config-flip if a
# trillion-term vocabulary ever matters.
_POSTING_COLS = (
    "term_id long, df long, first_doc long, last_doc long, "
    "doc_bin binary, tf_bin binary, dl_bin binary, "
    "block_last array<long>, block_max_tf array<int>, block_min_dl array<int>, "
    "doc_offs array<int>, tf_offs array<int>, dl_offs array<int>, n_blocks int"
)

SEGMENT_SCHEMA = f"src_part int, bucket int, shard long, {_POSTING_COLS}"
POSTINGS_SCHEMA = f"bucket int, shard long, {_POSTING_COLS}"


def term_id_of(term: str) -> int:
    """Signed-int64 term key: blake2b(term, 8 bytes), big-endian two's
    complement. Deterministic across batches, processes and engines — the
    only property the key needs (it is never inverted back to the string)."""
    import hashlib

    return int.from_bytes(hashlib.blake2b(term.encode(), digest_size=8).digest(), "big", signed=True)


def bucket_of_id(tid: int, buckets: int) -> int:
    """Bucket from the signed id. Python's ``%`` with a positive modulus
    equals Spark's ``pmod`` — either side may compute it, identically."""
    return tid % buckets


def _term_id_udf():
    """Vectorized term→term_id for string-token DataFrames (the build_segments
    / build_segments_raw ingest shape). Per-batch cache: hashing cost is per
    UNIQUE term, not per occurrence."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    def _run(terms):
        cache: dict[str, int] = {}
        get = cache.get

        def one(t):
            v = get(t)
            if v is None:
                v = term_id_of(t)
                cache[t] = v
            return v

        return terms.map(one)

    return pandas_udf(_run, T.LongType())


_EMPTY_COLS = (
    "term_id df first_doc last_doc doc_bin tf_bin dl_bin block_last block_max_tf "
    "block_min_dl doc_offs tf_offs dl_offs n_blocks"
).split()


def _encode_sorted(codes, uniques, docs, tfs, dls, head: dict) -> pd.DataFrame:
    """codes/docs/tfs/dls sorted by (code, doc) -> one encoded row per code.
    All lists of a group are encoded in ONE vectorized codec pass
    (codecs/multilist.py) — per-list Python work is just byte slicing."""
    from ..codecs.multilist import encode_posting_lists

    if len(codes) == 0:
        out = pd.DataFrame({c: [] for c in _EMPTY_COLS})
    else:
        bounds = np.concatenate([[0], np.flatnonzero(np.diff(codes)) + 1, [len(codes)]])
        enc = encode_posting_lists(docs, tfs, dls, bounds)
        out = pd.DataFrame({"term_id": uniques[codes[bounds[:-1]]], **enc})
    for k, v in head.items():
        out[k] = v
    return out


def _emit_rows(term_arr, doc_arr, tf_arr, dl_arr, head: dict) -> pd.DataFrame:
    """Encode one posting row per term; tf pre-aggregated per (term, doc)."""
    codes, uniques = pd.factorize(term_arr, sort=False)
    order = np.lexsort((doc_arr, codes))
    return _encode_sorted(
        codes[order], uniques, doc_arr[order], tf_arr[order], dl_arr[order], head
    )


def _emit_rows_counting(term_arr, doc_arr, dl_arr, head: dict) -> pd.DataFrame:
    """Like _emit_rows but over RAW token occurrences: computes tf by
    run-length-encoding equal (term, doc) pairs after the lexsort — the
    map-side tf aggregation happens here instead of a separate groupBy
    shuffle (one exchange of the token stream instead of two)."""
    codes, uniques = pd.factorize(term_arr, sort=False)
    order = np.lexsort((doc_arr, codes))
    codes, docs = codes[order], doc_arr[order]
    dls = dl_arr[order]
    new_pair = np.empty(len(codes), dtype=bool)
    if len(codes):
        new_pair[0] = True
        np.logical_or(np.diff(codes) != 0, np.diff(docs) != 0, out=new_pair[1:])
    starts = np.flatnonzero(new_pair)
    tfs = np.diff(np.concatenate([starts, [len(codes)]]))
    return _encode_sorted(codes[starts], uniques, docs[starts], tfs, dls[starts], head)


def build_segments(
    tokens: DataFrame,
    buckets: int = DEFAULT_BUCKETS,
    shard_docs: int = DEFAULT_SHARD_DOCS,
) -> DataFrame:
    """tokens(src_part, doc_id, doclen, term, tf) -> segment rows.

    Terms are dictionary-encoded to int64 BEFORE the wide exchange (the ids
    shuffle; the strings don't). The groupBy keys make the shuffle explicit:
    one exchange hash-partitioned on (src_part, bucket, shard) — group width
    bounded by shard_docs × (vocab / buckets), independent of term skew.
    """
    keyed = (
        tokens.withColumn("term_id", _term_id_udf()(F.col("term")))
        .drop("term")
        .withColumn("bucket", F.pmod(F.col("term_id"), F.lit(buckets)).cast("int"))
        .withColumn("shard", (F.col("doc_id") / F.lit(shard_docs)).cast("long"))
    )

    def build_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        src_part, bucket, shard = int(key[0]), int(key[1]), int(key[2])
        return _emit_rows(
            pdf["term_id"].to_numpy(np.int64),
            pdf["doc_id"].to_numpy(np.int64),
            pdf["tf"].to_numpy(np.int64),
            pdf["doclen"].to_numpy(np.int64),
            {"src_part": src_part, "bucket": bucket, "shard": shard},
        )

    return keyed.groupBy("src_part", "bucket", "shard").applyInPandas(
        build_group, schema=SEGMENT_SCHEMA
    )


def build_segments_raw(
    token_occurrences: DataFrame,
    buckets: int = DEFAULT_BUCKETS,
    shard_docs: int = DEFAULT_SHARD_DOCS,
) -> DataFrame:
    """Segment build over RAW token occurrences (src_part, doc_id, doclen, term)
    — tf is counted inside the grouped UDF (run-length encode after lexsort),
    so the token stream crosses exactly ONE exchange, carrying int64 term_ids.
    Output ≡ build_segments over pre-aggregated tf rows (tested)."""
    keyed = (
        token_occurrences.withColumn("term_id", _term_id_udf()(F.col("term")))
        .drop("term")
        .withColumn("bucket", F.pmod(F.col("term_id"), F.lit(buckets)).cast("int"))
        .withColumn("shard", (F.col("doc_id") / F.lit(shard_docs)).cast("long"))
    )

    def build_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        src_part, bucket, shard = int(key[0]), int(key[1]), int(key[2])
        return _emit_rows_counting(
            pdf["term_id"].to_numpy(np.int64),
            pdf["doc_id"].to_numpy(np.int64),
            pdf["doclen"].to_numpy(np.int64),
            {"src_part": src_part, "bucket": bucket, "shard": shard},
        )

    return keyed.groupBy("src_part", "bucket", "shard").applyInPandas(
        build_group, schema=SEGMENT_SCHEMA
    )


_PACKED_DOC_SCHEMA = (
    "src_part int, doc_id long, doclen int, "
    "bks array<int>, tslices array<array<long>>, fslices array<array<int>>"
)


def pack_doc_tokens(
    docs: DataFrame,
    buckets: int = DEFAULT_BUCKETS,
    shard_docs: int = DEFAULT_SHARD_DOCS,
    text_col: str = "document",
) -> DataFrame:
    """docs(doc_id, src_part, doclen, <text_col>) -> (doc, bucket)-packed rows
    (src_part, bucket, shard, doc_id, doclen, term_ids array, tfs array).

    The shuffle-compression stage: tokenize + per-doc tf-count + term_id +
    bucket assignment happen in ONE Arrow pass emitting a single nested row
    per doc (Counter + a dict-cached blake2b-8 per UNIQUE term — ~100µs/doc);
    the cheap fan-out to (doc, bucket) granularity is a codegen'd JVM
    arrays_zip+explode. The exchange that follows moves ~tokens/12 packed rows
    of fixed-width int64 ids instead of one string row per token occurrence —
    at 100 TB the token-stream shuffle is the single largest data movement of
    the build, and its bytes (strings vs ints) set the memory-bandwidth floor.
    """
    from typing import Iterator

    from ..functions.tokenize import _TOKEN_RE

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        id_cache: dict[str, tuple[int, int]] = {}
        cache_get = id_cache.get

        for pdf in batches:
            rows_bks, rows_ts, rows_fs = [], [], []
            keep = []
            for i, text in enumerate(pdf[text_col]):
                toks = [m.lower() for m in _TOKEN_RE.findall(text or "")]
                if not toks:
                    continue
                by_bucket: dict[int, tuple[list, list]] = {}
                for t, n in Counter(toks).items():
                    tb = cache_get(t)
                    if tb is None:
                        tid = term_id_of(t)
                        tb = (tid, tid % buckets)
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
            base = pdf.iloc[keep]
            yield pd.DataFrame(
                {
                    "src_part": base["src_part"].to_numpy(),
                    "doc_id": base["doc_id"].to_numpy(),
                    "doclen": base["doclen"].to_numpy(),
                    "bks": rows_bks,
                    "tslices": rows_ts,
                    "fslices": rows_fs,
                }
            )

    per_doc = docs.mapInPandas(run, schema=_PACKED_DOC_SCHEMA)
    z = F.explode(F.arrays_zip("bks", "tslices", "fslices")).alias("z")
    return per_doc.select("src_part", "doc_id", "doclen", z).select(
        "src_part",
        F.col("z.bks").alias("bucket"),
        (F.col("doc_id") / F.lit(shard_docs)).cast("long").alias("shard"),
        "doc_id",
        "doclen",
        F.col("z.tslices").alias("term_ids"),
        F.col("z.fslices").alias("tfs"),
    )


def build_segments_packed(packed: DataFrame) -> DataFrame:
    """Packed (doc, bucket) token groups -> encoded segment rows.

    groupBy(src_part, bucket, shard) over packed rows; inside the UDF the
    arrays are flattened with numpy (concatenate/repeat — no per-token Python)
    and encoded per term_id. Output ≡ build_segments_raw (tested).
    """

    def build_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        src_part, bucket, shard = int(key[0]), int(key[1]), int(key[2])
        lens = pdf["term_ids"].map(len).to_numpy(np.int64)
        tids = np.concatenate([np.asarray(t, dtype=np.int64) for t in pdf["term_ids"]])
        tfs = np.concatenate([np.asarray(t, dtype=np.int64) for t in pdf["tfs"]])
        doc_ids = np.repeat(pdf["doc_id"].to_numpy(np.int64), lens)
        dls = np.repeat(pdf["doclen"].to_numpy(np.int64), lens)
        return _emit_rows(
            tids, doc_ids, tfs, dls, {"src_part": src_part, "bucket": bucket, "shard": shard}
        )

    return packed.groupBy("src_part", "bucket", "shard").applyInPandas(
        build_group, schema=SEGMENT_SCHEMA
    )


def merge_segments(segments: DataFrame) -> DataFrame:
    """segment rows -> merged postings, one row per (bucket, shard, term).

    Different src partitions hold disjoint doc sets (a conversation lives in
    exactly one source partition), so the merge is concat + argsort + re-encode
    per term — the per-term analog of FAISS fill appending rowids to each
    centroid's list (/root/reference/Makefile:24-25).
    """

    def merge_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..codecs.multilist import decode_posting_lists

        bucket, shard = int(key[0]), int(key[1])
        dfs = pdf["df"].to_numpy(np.int64)
        docs, tfs, dls, _ = decode_posting_lists(
            [bytes(b) for b in pdf["doc_bin"]],
            [bytes(b) for b in pdf["tf_bin"]],
            [bytes(b) for b in pdf["dl_bin"]],
            dfs,
        )
        row_codes, uniques = pd.factorize(pdf["term_id"].to_numpy(np.int64), sort=False)
        codes = np.repeat(row_codes, dfs)
        order = np.lexsort((docs, codes))
        return _encode_sorted(
            codes[order], uniques, docs[order], tfs[order], dls[order],
            {"bucket": bucket, "shard": shard},
        )

    return segments.groupBy("bucket", "shard").applyInPandas(merge_group, schema=POSTINGS_SCHEMA)
