"""query_many (batched TAAT, shared decode) ≡ per-query query() rankings."""

import pytest

from abstracts_search_spark.plans.build import build_index
from abstracts_search_spark.plans.query import IndexReader
from abstracts_search_spark.sources.transcripts import gen_queries


@pytest.fixture(scope="module")
def reader(spark, small_dir, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("index") / "qm")
    build_index(spark, small_dir, index_dir, buckets=8, shard_docs=64)
    return IndexReader(spark, index_dir)


def test_query_many_matches_per_query(reader):
    qset = dict(gen_queries(n=20))
    batched = reader.query_many(qset, k=10).collect()
    by_qid: dict[int, list] = {}
    for r in sorted(batched, key=lambda r: (r["query_id"], r["rank"])):
        by_qid.setdefault(r["query_id"], []).append((r["doc_id"], round(r["score"], 9)))
    for qid, q in qset.items():
        single = [(r["doc_id"], round(r["score"], 9)) for r in reader.query(q, k=10).collect()]
        assert by_qid.get(qid, []) == single, f"mismatch for query {qid}: {q!r}"


def test_query_many_empty_set(reader):
    assert reader.query_many({0: "—— ☃ !!!", 1: "zzznope"}, k=5).count() == 0
