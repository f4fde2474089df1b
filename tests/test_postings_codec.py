import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from abstracts_search_spark.codecs.postings import (
    decode_block,
    decode_posting_list,
    encode_posting_list,
)


def _mk(n, seed=0):
    rng = np.random.default_rng(seed)
    docs = np.unique(rng.integers(0, n * 10, n))
    tfs = rng.integers(1, 50, docs.shape[0])
    dls = rng.integers(1, 3000, docs.shape[0])
    return docs, tfs, dls


def test_roundtrip_small_and_multiblock():
    for n in (1, 2, 127, 128, 129, 1000):
        docs, tfs, dls = _mk(n, seed=n)
        row = encode_posting_list(docs, tfs, dls)
        d2, t2, l2 = decode_posting_list(row)
        assert np.array_equal(d2, docs) and np.array_equal(t2, tfs) and np.array_equal(l2, dls)
        assert row["df"] == docs.shape[0]
        assert row["first_doc"] == docs[0] and row["last_doc"] == docs[-1]


def test_block_decode_matches_full():
    docs, tfs, dls = _mk(1000, seed=7)
    row = encode_posting_list(docs, tfs, dls)
    off = 0
    for b in range(row["n_blocks"]):
        bd, bt, bl = decode_block(row, b)
        n = bd.shape[0]
        assert np.array_equal(bd, docs[off : off + n])
        assert np.array_equal(bt, tfs[off : off + n])
        assert np.array_equal(bl, dls[off : off + n])
        off += n
    assert off == docs.shape[0]


def test_block_metadata():
    docs, tfs, dls = _mk(500, seed=3)
    row = encode_posting_list(docs, tfs, dls)
    for b in range(row["n_blocks"]):
        bd, bt, bl = decode_block(row, b)
        assert row["block_last"][b] == bd[-1]
        assert row["block_max_tf"][b] == bt.max()
        assert row["block_min_dl"][b] == bl.min()


@settings(max_examples=100, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=400))
def test_roundtrip_property(doc_set):
    docs = np.array(sorted(doc_set), dtype=np.int64)
    tfs = (docs % 17 + 1).astype(np.int64)
    dls = (docs % 999 + 1).astype(np.int64)
    row = encode_posting_list(docs, tfs, dls)
    d2, t2, l2 = decode_posting_list(row)
    assert np.array_equal(d2, docs) and np.array_equal(t2, tfs) and np.array_equal(l2, dls)
