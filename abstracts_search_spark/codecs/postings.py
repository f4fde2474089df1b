"""Block-restarted posting-list encoding (SURVEY.md §2.4 A5, §2.6 T3).

A posting list for one (term, shard) is three varint streams over 128-entry
blocks:

- ``doc_bin``: docID gaps, delta encoding RESTARTED at each block boundary
  (first value of a block is absolute) so any block decodes independently —
  this is what makes block-max skipping skip *decoding*, the analog of the
  reference's on-disk inverted lists being readable per-list
  (/root/reference/Makefile:24-25, ondisk.ivfdata).
- ``tf_bin`` / ``dl_bin``: plain varints (term frequency, doc length). Doc
  length rides inside the posting to avoid a per-query doc-stats join
  (SURVEY.md §2.3).

Per-block metadata enables query-time upper bounds that stay valid as corpus
stats drift (avgdl changes between merges): ``max_tf`` and ``min_dl`` give
``ub = idf·(k1+1)·max_tf/(max_tf + k1·(1−b+b·min_dl/avgdl))`` with the LIVE
avgdl — monotone in tf (↑) and dl (↓), hence a true upper bound.

Everything is numpy-vectorized over whole arrays; the only Python loops are
over the ≤10 varint byte positions.
"""

from __future__ import annotations

import numpy as np

from .varint import _THRESHOLDS, decode_varint, encode_varint

BLOCK_SIZE = 128


def _byte_lengths(v: np.ndarray) -> np.ndarray:
    lengths = np.ones(v.shape[0], dtype=np.int64)
    for t in _THRESHOLDS:
        lengths += (v >= t).astype(np.int64)
    return lengths


def _encode_with_offsets(values: np.ndarray, block: int) -> tuple[bytes, np.ndarray]:
    """Varint-encode; return (bytes, byte offsets of each block start + end)."""
    v = values.astype(np.uint64)
    n = v.shape[0]
    lengths = _byte_lengths(v)
    cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=cum[1:])
    starts = np.arange(0, n, block, dtype=np.int64)
    offs = np.concatenate([cum[starts], cum[-1:]]).astype(np.int32)
    return encode_varint(v), offs


def encode_posting_list(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block: int = BLOCK_SIZE,
    positions: np.ndarray | None = None,
) -> dict:
    """doc_ids must be sorted ascending and unique. Returns column dict.

    ``positions`` (optional, the phrase-search stream): flat int64 array of
    within-doc token positions, doc-major (doc i's tfs[i] positions, ascending,
    then doc i+1's). Encoded as a fourth varint stream — gap-encoded WITHIN
    each doc (first position absolute), so any doc's positions decode
    independently; ``pos_offs`` records the byte offset of each BLOCK's first
    doc, making block-granular decode possible (same skip contract as the
    other streams)."""
    docs = np.asarray(doc_ids, dtype=np.int64)
    n = docs.shape[0]
    if n == 0:
        raise ValueError("empty posting list")
    gaps = np.empty(n, dtype=np.int64)
    gaps[0] = docs[0]
    np.subtract(docs[1:], docs[:-1], out=gaps[1:])
    starts = np.arange(0, n, block, dtype=np.int64)
    gaps[starts] = docs[starts]  # restart: block-first is absolute
    doc_bin, doc_offs = _encode_with_offsets(gaps, block)
    tf_bin, tf_offs = _encode_with_offsets(np.asarray(tfs, dtype=np.int64), block)
    dl_bin, dl_offs = _encode_with_offsets(np.asarray(dls, dtype=np.int64), block)

    pos_bin, pos_offs = None, None
    if positions is not None:
        tfs64 = np.asarray(tfs, dtype=np.int64)
        pos = np.asarray(positions, dtype=np.int64)
        occ_bounds = np.zeros(n + 1, dtype=np.int64)  # doc i's positions are
        np.cumsum(tfs64, out=occ_bounds[1:])          # [occ_bounds[i], occ_bounds[i+1])
        if pos.shape[0] != occ_bounds[-1]:
            raise ValueError("positions length must equal sum(tfs)")
        pgaps = pos.copy()
        pgaps[1:] -= pos[:-1]
        pgaps[occ_bounds[:-1]] = pos[occ_bounds[:-1]]  # restart at every doc
        if np.any(pgaps < 0):
            raise ValueError("positions not ascending within doc")
        cum = np.zeros(pgaps.shape[0] + 1, dtype=np.int64)
        np.cumsum(_byte_lengths(pgaps.astype(np.uint64)), out=cum[1:])
        pos_bin = encode_varint(pgaps.astype(np.uint64))
        pos_offs = np.concatenate([cum[occ_bounds[starts]], cum[-1:]]).astype(np.int32)

    ends = np.minimum(starts + block, n)
    nblocks = starts.shape[0]
    block_last = docs[ends - 1]
    block_max_tf = np.maximum.reduceat(np.asarray(tfs, dtype=np.int64), starts)
    block_min_dl = np.minimum.reduceat(np.asarray(dls, dtype=np.int64), starts)
    return {
        "pos_bin": pos_bin,
        "pos_offs": pos_offs,
        "df": int(n),
        "first_doc": int(docs[0]),
        "last_doc": int(docs[-1]),
        "doc_bin": doc_bin,
        "tf_bin": tf_bin,
        "dl_bin": dl_bin,
        "block_last": block_last.astype(np.int64),
        "block_max_tf": block_max_tf.astype(np.int32),
        "block_min_dl": block_min_dl.astype(np.int32),
        "doc_offs": doc_offs.astype(np.int32),
        "tf_offs": tf_offs.astype(np.int32),
        "dl_offs": dl_offs.astype(np.int32),
        "n_blocks": int(nblocks),
    }


def decode_posting_list(row, block: int = BLOCK_SIZE) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full decode of one encoded posting (row: mapping with the dict keys)."""
    n = int(row["df"])
    gaps = decode_varint(bytes(row["doc_bin"]), count=n).astype(np.int64)
    c = np.cumsum(gaps)
    starts = np.arange(0, n, block, dtype=np.int64)
    # segmented cumsum: subtract the running total at each block's entry point
    base = np.zeros(starts.shape[0], dtype=np.int64)
    base[1:] = c[starts[1:] - 1]
    sizes = np.diff(np.concatenate([starts, [n]]))
    docs = c - np.repeat(base, sizes)
    tfs = decode_varint(bytes(row["tf_bin"]), count=n).astype(np.int64)
    dls = decode_varint(bytes(row["dl_bin"]), count=n).astype(np.int64)
    return docs, tfs, dls


def decode_block(row, b: int, block: int = BLOCK_SIZE) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode ONLY block b — the skip-friendly path used by block-max WAND."""
    doc_offs = np.asarray(row["doc_offs"])
    tf_offs = np.asarray(row["tf_offs"])
    dl_offs = np.asarray(row["dl_offs"])
    gaps = decode_varint(bytes(row["doc_bin"])[doc_offs[b] : doc_offs[b + 1]]).astype(np.int64)
    docs = np.cumsum(gaps)  # block-first gap is absolute, so plain cumsum works
    tfs = decode_varint(bytes(row["tf_bin"])[tf_offs[b] : tf_offs[b + 1]]).astype(np.int64)
    dls = decode_varint(bytes(row["dl_bin"])[dl_offs[b] : dl_offs[b + 1]]).astype(np.int64)
    return docs, tfs, dls


def _ungap_positions(pgaps: np.ndarray, tfs: np.ndarray) -> np.ndarray:
    """Segmented cumsum restarting at each doc boundary: per-doc gap stream →
    absolute within-doc positions (flat, doc-major, aligned with tfs)."""
    c = np.cumsum(pgaps)
    occ_starts = np.zeros(tfs.shape[0], dtype=np.int64)
    np.cumsum(tfs[:-1], out=occ_starts[1:])
    base = np.zeros(occ_starts.shape[0], dtype=np.int64)
    base[1:] = c[occ_starts[1:] - 1]
    return c - np.repeat(base, tfs)


def decode_positions(row, tfs: np.ndarray) -> np.ndarray:
    """Full positions decode (flat, doc-major): needs the decoded tfs to
    segment the stream by doc."""
    if row["pos_bin"] is None:
        raise ValueError("posting list was encoded without positions")
    n = int(np.asarray(tfs, dtype=np.int64).sum())
    pgaps = decode_varint(bytes(row["pos_bin"]), count=n).astype(np.int64)
    return _ungap_positions(pgaps, np.asarray(tfs, dtype=np.int64))


def decode_block_positions(row, b: int, tfs_b: np.ndarray) -> np.ndarray:
    """Positions of ONLY block b (tfs_b = the block's decoded tf stream)."""
    if row["pos_bin"] is None:
        raise ValueError("posting list was encoded without positions")
    pos_offs = np.asarray(row["pos_offs"])
    raw = bytes(row["pos_bin"])[pos_offs[b] : pos_offs[b + 1]]
    pgaps = decode_varint(raw).astype(np.int64)
    return _ungap_positions(pgaps, np.asarray(tfs_b, dtype=np.int64))
