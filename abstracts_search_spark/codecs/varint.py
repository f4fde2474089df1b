"""Numpy-vectorized LEB128 varint + delta codec for posting lists.

The reference's index keeps per-centroid inverted lists on disk
(/root/reference/Makefile:24-25, `ondisk.ivfdata`); ours keeps per-term
posting lists as delta-encoded docID gaps + tfs, varint-compressed, stored as
BinaryType columns in Parquet (SURVEY.md §2.4 A5). Both directions are
vectorized over whole arrays — no per-element Python loops over list entries
(the only loops are over the ≤10 byte positions of a varint), honoring the
"no per-row Python" constraint (BASELINE.json input_hint).
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 10  # 64 bits / 7 bits-per-byte, rounded up

# thresholds[i] = smallest value needing more than i+1 bytes
_THRESHOLDS = np.array([1 << (7 * i) for i in range(1, _MAX_VARINT_BYTES)], dtype=np.uint64)


def encode_varint(values: np.ndarray) -> bytes:
    """Encode a non-negative int64/uint64 array as concatenated LEB128 varints."""
    v = np.asarray(values)
    if v.size == 0:
        return b""
    if v.dtype != np.uint64:
        if np.any(v < 0):
            raise ValueError("varint requires non-negative values")
        v = v.astype(np.uint64)
    # byte length of each varint: 1 + number of thresholds passed
    lengths = np.ones(v.shape[0], dtype=np.int64)
    for t in _THRESHOLDS:
        lengths += (v >= t).astype(np.int64)
    starts = np.zeros(v.shape[0], dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    out = np.zeros(int(starts[-1] + lengths[-1]), dtype=np.uint8)
    for j in range(int(lengths.max())):
        mask = lengths > j
        chunk = ((v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (lengths[mask] > j + 1).astype(np.uint8) << 7
        out[starts[mask] + j] = chunk | cont
    return out.tobytes()


def decode_varint(data: bytes, count: int | None = None) -> np.ndarray:
    """Decode concatenated LEB128 varints back to a uint64 array."""
    buf = np.frombuffer(data, dtype=np.uint8)
    if buf.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (buf & 0x80) == 0
    ends = np.flatnonzero(is_end)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    if count is not None and ends.size != count:
        raise ValueError(f"expected {count} varints, found {ends.size}")
    out = np.zeros(ends.size, dtype=np.uint64)
    for j in range(int(lengths.max())):
        mask = lengths > j
        out[mask] |= (buf[starts[mask] + j] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * j)
    return out


def delta_encode(sorted_values: np.ndarray) -> bytes:
    """Gap-encode a strictly/weakly increasing int array, then varint-pack.

    First value is stored absolute; the rest as gaps (reference analog: FAISS
    inverted lists store rowids append-ordered; ours are docID-ordered so gaps
    compress, SURVEY.md §2.6 T3).
    """
    v = np.asarray(sorted_values, dtype=np.int64)
    if v.size == 0:
        return b""
    gaps = np.empty_like(v)
    gaps[0] = v[0]
    np.subtract(v[1:], v[:-1], out=gaps[1:])
    if np.any(gaps[1:] < 0):
        raise ValueError("delta_encode requires a sorted array")
    return encode_varint(gaps)


def delta_decode(data: bytes, count: int | None = None) -> np.ndarray:
    """Inverse of :func:`delta_encode` — returns int64 array."""
    gaps = decode_varint(data, count=count).astype(np.int64)
    if gaps.size == 0:
        return gaps
    return np.cumsum(gaps)
