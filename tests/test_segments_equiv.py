"""The three segment-build paths produce identical postings.

build_segments (pre-aggregated tf), build_segments_raw (tf counted in-UDF),
and pack_doc_tokens→build_segments_packed (packed-array shuffle) must yield
the same per-(shard, term_id) posting content; all three share one term_id /
bucket hash (postings.term_id_of), so buckets are identical too.
"""

import pandas as pd
from pyspark.sql import functions as F

from abstracts_search_spark.codecs.postings import decode_posting_list
from abstracts_search_spark.operators.assemble import assemble_documents
from abstracts_search_spark.operators.bm25_brute import doc_tokens
from abstracts_search_spark.operators.docids import assign_doc_ids
from abstracts_search_spark.operators.postings import (
    build_segments,
    build_segments_packed,
    build_segments_raw,
    pack_doc_tokens,
)


def _content(seg_rows):
    out = {}
    for r in seg_rows:
        d = r.asDict()
        docs, tfs, dls = decode_posting_list(d)
        out[(d["src_part"], d["bucket"], d["shard"], d["term_id"])] = (
            docs.tolist(),
            tfs.tolist(),
            dls.tolist(),
        )
    return out


def test_three_paths_identical(spark, tiny_df):
    docs = assign_doc_ids(assemble_documents(tiny_df), num_partitions=2)
    docs = docs.withColumn("src_part", F.lit(0))

    tf = doc_tokens(docs.select("doc_id", "document"), text_col="document").withColumn(
        "src_part", F.lit(0)
    )
    a = _content(build_segments(tf, buckets=4, shard_docs=8).collect())

    raw = docs.select(
        "doc_id",
        "src_part",
        F.size(F.expr("filter(split(document, '[^A-Za-z0-9]+'), x -> x != '')")).alias("doclen"),
        F.explode(
            F.expr("transform(filter(split(document, '[^A-Za-z0-9]+'), x -> x != ''), x -> lower(x))")
        ).alias("term"),
    )
    b = _content(build_segments_raw(raw, buckets=4, shard_docs=8).collect())

    packed = pack_doc_tokens(
        docs.select(
            "doc_id",
            "src_part",
            F.size(F.expr("filter(split(document, '[^A-Za-z0-9]+'), x -> x != '')")).alias("doclen"),
            "document",
        ),
        buckets=4,
        shard_docs=8,
    )
    c = _content(build_segments_packed(packed).collect())

    assert a == b == c
    assert len(a) > 10
