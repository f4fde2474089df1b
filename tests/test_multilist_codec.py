"""Multi-list vectorized codec ≡ single-list codec, bit for bit."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from abstracts_search_spark.codecs.multilist import (
    concat_aranges,
    decode_posting_lists,
    encode_posting_lists,
)
from abstracts_search_spark.codecs.postings import encode_posting_list


def test_concat_aranges():
    assert concat_aranges(np.array([3, 2, 1])).tolist() == [0, 1, 2, 0, 1, 0]
    assert concat_aranges(np.array([], dtype=np.int64)).size == 0


def _mk_lists(seed, n_lists, max_len):
    rng = np.random.default_rng(seed)
    docs_l, tfs_l, dls_l = [], [], []
    for _ in range(n_lists):
        n = int(rng.integers(1, max_len))
        docs = np.unique(rng.integers(0, max_len * 8, n))
        tfs = rng.integers(1, 40, docs.shape[0])
        dls = rng.integers(1, 2000, docs.shape[0])
        docs_l.append(docs)
        tfs_l.append(tfs)
        dls_l.append(dls)
    return docs_l, tfs_l, dls_l


def test_multilist_matches_single_bitwise():
    docs_l, tfs_l, dls_l = _mk_lists(7, 50, 400)
    bounds = np.concatenate([[0], np.cumsum([len(d) for d in docs_l])])
    enc = encode_posting_lists(
        np.concatenate(docs_l), np.concatenate(tfs_l), np.concatenate(dls_l), bounds
    )
    for i in range(len(docs_l)):
        single = encode_posting_list(docs_l[i], tfs_l[i], dls_l[i])
        assert bytes(enc["doc_bin"][i]) == single["doc_bin"], f"doc_bin list {i}"
        assert bytes(enc["tf_bin"][i]) == single["tf_bin"]
        assert bytes(enc["dl_bin"][i]) == single["dl_bin"]
        assert enc["block_last"][i].tolist() == single["block_last"].tolist()
        assert enc["block_max_tf"][i].tolist() == single["block_max_tf"].tolist()
        assert enc["block_min_dl"][i].tolist() == single["block_min_dl"].tolist()
        assert enc["doc_offs"][i].tolist() == single["doc_offs"].tolist()
        assert enc["tf_offs"][i].tolist() == single["tf_offs"].tolist()
        assert enc["dl_offs"][i].tolist() == single["dl_offs"].tolist()
        assert enc["df"][i] == single["df"]
        assert enc["n_blocks"][i] == single["n_blocks"]


def test_multilist_decode_roundtrip():
    docs_l, tfs_l, dls_l = _mk_lists(11, 30, 500)
    bounds = np.concatenate([[0], np.cumsum([len(d) for d in docs_l])])
    enc = encode_posting_lists(
        np.concatenate(docs_l), np.concatenate(tfs_l), np.concatenate(dls_l), bounds
    )
    docs, tfs, dls, b2 = decode_posting_lists(
        [bytes(b) for b in enc["doc_bin"]],
        [bytes(b) for b in enc["tf_bin"]],
        [bytes(b) for b in enc["dl_bin"]],
        enc["df"],
    )
    assert b2.tolist() == bounds.tolist()
    assert np.array_equal(docs, np.concatenate(docs_l))
    assert np.array_equal(tfs, np.concatenate(tfs_l))
    assert np.array_equal(dls, np.concatenate(dls_l))


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.sets(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=300),
        min_size=1,
        max_size=12,
    )
)
def test_multilist_roundtrip_property(doc_sets):
    docs_l = [np.array(sorted(s), dtype=np.int64) for s in doc_sets]
    tfs_l = [(d % 9 + 1) for d in docs_l]
    dls_l = [(d % 777 + 1) for d in docs_l]
    bounds = np.concatenate([[0], np.cumsum([len(d) for d in docs_l])])
    enc = encode_posting_lists(
        np.concatenate(docs_l), np.concatenate(tfs_l), np.concatenate(dls_l), bounds
    )
    docs, tfs, dls, _ = decode_posting_lists(
        [bytes(b) for b in enc["doc_bin"]],
        [bytes(b) for b in enc["tf_bin"]],
        [bytes(b) for b in enc["dl_bin"]],
        enc["df"],
    )
    assert np.array_equal(docs, np.concatenate(docs_l))
    assert np.array_equal(tfs, np.concatenate(tfs_l))
    assert np.array_equal(dls, np.concatenate(dls_l))
