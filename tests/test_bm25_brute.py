"""M1: brute-force DataFrame BM25 vs the pure-numpy oracle — rank identical."""

import pytest

from abstracts_search_spark.operators.assemble import assemble_documents
from abstracts_search_spark.operators.bm25_brute import bm25_topk_brute, doc_tokens
from abstracts_search_spark.operators.docids import assign_doc_ids
from abstracts_search_spark.operators.oracle_numpy import BM25Oracle
from abstracts_search_spark.sources.transcripts import gen_queries


@pytest.fixture(scope="module")
def corpus(spark, tiny_df):
    docs = assign_doc_ids(assemble_documents(tiny_df), num_partitions=2).cache()
    toks = doc_tokens(docs).cache()
    oracle = BM25Oracle({r["doc_id"]: r["document"] for r in docs.collect()})
    return docs, toks, oracle


@pytest.mark.parametrize("qid,query", gen_queries(n=15))
def test_topk_matches_oracle(corpus, qid, query):
    _, toks, oracle = corpus
    got = [(r["doc_id"], r["score"]) for r in bm25_topk_brute(toks, query, k=10).collect()]
    want = oracle.topk(query, k=10)
    assert [d for d, _ in got] == [d for d, _ in want], f"docIDs differ for {query!r}"
    for (_, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) <= 1e-6 * max(1.0, abs(ws))


def test_empty_query(corpus):
    _, toks, _ = corpus
    assert bm25_topk_brute(toks, "—— ☃ !!!").count() == 0


def test_absent_term_query(corpus):
    _, toks, _ = corpus
    assert bm25_topk_brute(toks, "zzzneverappears").count() == 0
