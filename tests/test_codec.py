import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from abstracts_search_spark.codecs import (
    decode_varint,
    delta_decode,
    delta_encode,
    encode_varint,
)


def test_empty():
    assert encode_varint(np.array([], dtype=np.int64)) == b""
    assert decode_varint(b"").size == 0
    assert delta_encode(np.array([], dtype=np.int64)) == b""
    assert delta_decode(b"").size == 0


def test_known_values():
    # 0 -> 0x00, 127 -> 0x7f, 128 -> 0x80 0x01, 300 -> 0xac 0x02
    assert encode_varint(np.array([0])) == b"\x00"
    assert encode_varint(np.array([127])) == b"\x7f"
    assert encode_varint(np.array([128])) == b"\x80\x01"
    assert encode_varint(np.array([300])) == b"\xac\x02"


def test_roundtrip_mixed_sizes():
    vals = np.array([0, 1, 127, 128, 2**14 - 1, 2**14, 2**35, 2**63 - 1], dtype=np.uint64)
    assert np.array_equal(decode_varint(encode_varint(vals)), vals)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
def test_varint_roundtrip_property(xs):
    arr = np.array(xs, dtype=np.uint64)
    assert np.array_equal(decode_varint(encode_varint(arr)), arr)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=200))
def test_delta_roundtrip_property(xs):
    arr = np.sort(np.array(xs, dtype=np.int64))
    out = delta_decode(delta_encode(arr))
    assert np.array_equal(out, arr)


def test_delta_rejects_unsorted():
    with pytest.raises(ValueError):
        delta_encode(np.array([5, 3, 4]))


def test_decode_count_check():
    data = encode_varint(np.array([1, 2, 3]))
    with pytest.raises(ValueError):
        decode_varint(data, count=2)
