"""Posting segment build + merge — the index centerpiece (SURVEY.md A5/A6).

Mirrors the reference's two-stage shape: per-source-partition incremental
builds that accumulate into a store (/root/reference/Makefile:57-66), then a
global fill producing on-disk inverted lists (Makefile:24-25). Here:

- **build_segments** — per src partition: tokens → grouped by
  (src_part, bucket, shard) → ``applyInPandas`` emits one encoded posting row
  per term. ``bucket = pmod(xxhash64(term), B)`` drives query-time partition
  pruning (the analog of IVF probing only nprobe lists, SURVEY.md §4);
  ``shard = doc_id // shard_docs`` tiles the docID space so doc ranges are
  DISJOINT across shards.
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

from ..codecs.postings import BLOCK_SIZE, decode_posting_list, encode_posting_list

DEFAULT_BUCKETS = 64
DEFAULT_SHARD_DOCS = 1 << 17

_POSTING_COLS = (
    "term string, df long, first_doc long, last_doc long, "
    "doc_bin binary, tf_bin binary, dl_bin binary, "
    "block_last array<long>, block_max_tf array<int>, block_min_dl array<int>, "
    "doc_offs array<int>, tf_offs array<int>, dl_offs array<int>, n_blocks int"
)

SEGMENT_SCHEMA = f"src_part int, bucket int, shard long, {_POSTING_COLS}"
POSTINGS_SCHEMA = f"bucket int, shard long, {_POSTING_COLS}"


def bucket_of(term_col, buckets: int):
    return F.pmod(F.xxhash64(term_col), F.lit(buckets)).cast("int")


def _emit_rows(term_arr, doc_arr, tf_arr, dl_arr, head: dict) -> pd.DataFrame:
    """Encode one posting row per term; inputs sorted by (term, doc)."""
    codes, uniques = pd.factorize(term_arr, sort=False)
    order = np.lexsort((doc_arr, codes))
    codes, docs = codes[order], doc_arr[order]
    tfs, dls = tf_arr[order], dl_arr[order]
    bounds = np.concatenate([[0], np.flatnonzero(np.diff(codes)) + 1, [len(codes)]])
    rows = []
    for i in range(len(bounds) - 1):
        s, e = bounds[i], bounds[i + 1]
        enc = encode_posting_list(docs[s:e], tfs[s:e], dls[s:e])
        enc["term"] = uniques[codes[s]]
        enc.update(head)
        rows.append(enc)
    return pd.DataFrame(rows)


def build_segments(
    tokens: DataFrame,
    buckets: int = DEFAULT_BUCKETS,
    shard_docs: int = DEFAULT_SHARD_DOCS,
) -> DataFrame:
    """tokens(src_part, doc_id, doclen, term, tf) -> segment rows.

    The groupBy keys make the shuffle explicit: one exchange hash-partitioned
    on (src_part, bucket, shard) — group width bounded by
    shard_docs × (vocab / buckets), independent of term skew.
    """
    keyed = tokens.withColumn("bucket", bucket_of(F.col("term"), buckets)).withColumn(
        "shard", (F.col("doc_id") / F.lit(shard_docs)).cast("long")
    )

    def build_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        src_part, bucket, shard = int(key[0]), int(key[1]), int(key[2])
        return _emit_rows(
            pdf["term"].to_numpy(),
            pdf["doc_id"].to_numpy(np.int64),
            pdf["tf"].to_numpy(np.int64),
            pdf["doclen"].to_numpy(np.int64),
            {"src_part": src_part, "bucket": bucket, "shard": shard},
        )

    return keyed.groupBy("src_part", "bucket", "shard").applyInPandas(
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
        bucket, shard = int(key[0]), int(key[1])
        docs_l, tfs_l, dls_l, terms_l = [], [], [], []
        for row in pdf.itertuples(index=False):
            d, t, dl = decode_posting_list(row._asdict())
            docs_l.append(d)
            tfs_l.append(t)
            dls_l.append(dl)
            terms_l.append(np.repeat(row.term, d.shape[0]))
        return _emit_rows(
            np.concatenate(terms_l),
            np.concatenate(docs_l),
            np.concatenate(tfs_l),
            np.concatenate(dls_l),
            {"bucket": bucket, "shard": shard},
        )

    return segments.groupBy("bucket", "shard").applyInPandas(merge_group, schema=POSTINGS_SCHEMA)
