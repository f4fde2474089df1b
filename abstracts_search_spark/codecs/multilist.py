"""Vectorized multi-list posting codec.

encode_posting_list/decode_posting_list (postings.py) are correct but pay
~0.5ms of numpy-call overhead per tiny list; a segment-build group encodes
~10^5-10^6 term lists, so per-list calls dominate the whole index build.
These functions process EVERY list of a group in a constant number of global
numpy passes: one varint encode/decode over the concatenated streams, with
per-list byte ranges recovered from cumulative byte-length sums, and restart
points (list starts + block starts) handled by a segmented cumsum.

Bit-compatible with the single-list codec (property-tested): slicing the
concatenated output at the per-list boundaries yields exactly
encode_posting_list's bytes, block metadata and offsets.
"""

from __future__ import annotations

import numpy as np

from .postings import BLOCK_SIZE
from .varint import _THRESHOLDS, decode_varint, encode_varint


def concat_aranges(counts: np.ndarray) -> np.ndarray:
    """[3,2] -> [0,1,2,0,1] — vectorized per-segment arange."""
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(counts[:-1])])
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


def _byte_lengths(v: np.ndarray) -> np.ndarray:
    lengths = np.ones(v.shape[0], dtype=np.int64)
    for t in _THRESHOLDS:
        lengths += (v >= t).astype(np.int64)
    return lengths


def _cum_bytes(values: np.ndarray) -> np.ndarray:
    """cum[i] = total encoded bytes of values[:i] (len n+1)."""
    cum = np.zeros(values.shape[0] + 1, dtype=np.int64)
    np.cumsum(_byte_lengths(values), out=cum[1:])
    return cum


def encode_posting_lists(
    docs: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    bounds: np.ndarray,
    block: int = BLOCK_SIZE,
    positions: np.ndarray | None = None,
) -> dict:
    """Encode T posting lists in one pass.

    docs/tfs/dls: concatenated arrays, sorted by doc WITHIN each list;
    bounds: int64 array of length T+1 — list t occupies [bounds[t], bounds[t+1]).
    ``positions`` (optional): within-doc token positions, flat across ALL
    lists in the same (list, doc) order — entry i's tfs[i] positions are
    contiguous and ascending. Encoded gap-restarted at every doc, with
    per-block byte offsets (bit-compatible with the single-list codec).
    Returns dict of T-length lists/arrays matching the single-list row schema.
    """
    docs = np.asarray(docs, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    bounds = np.asarray(bounds, dtype=np.int64)
    n = docs.shape[0]
    T = bounds.shape[0] - 1
    lengths = np.diff(bounds)
    if np.any(lengths <= 0):
        raise ValueError("empty posting list in bounds")

    nblocks = (lengths + block - 1) // block
    # global indices of every block start (list starts are block starts)
    blk_starts = np.repeat(bounds[:-1], nblocks) + concat_aranges(nblocks) * block
    blk_of_list = np.repeat(np.arange(T), nblocks)
    blk_ends = np.minimum(blk_starts + block, bounds[1:][blk_of_list]) - 1  # inclusive

    gaps = docs.copy()
    gaps[1:] -= docs[:-1]
    gaps[blk_starts] = docs[blk_starts]  # restart: absolute at every block start
    if np.any(gaps < 0):
        raise ValueError("docs not sorted within lists")

    doc_cum = _cum_bytes(gaps.astype(np.uint64))
    tf_cum = _cum_bytes(tfs.astype(np.uint64))
    dl_cum = _cum_bytes(dls.astype(np.uint64))
    doc_all = encode_varint(gaps.astype(np.uint64))
    tf_all = encode_varint(tfs.astype(np.uint64))
    dl_all = encode_varint(dls.astype(np.uint64))

    pos_all = pos_cum = occ_bounds = None
    if positions is not None:
        pos = np.asarray(positions, dtype=np.int64)
        occ_bounds = np.zeros(n + 1, dtype=np.int64)  # entry i's positions are
        np.cumsum(tfs, out=occ_bounds[1:])            # [occ_bounds[i], occ_bounds[i+1])
        if pos.shape[0] != occ_bounds[-1]:
            raise ValueError("positions length must equal sum(tfs)")
        pgaps = pos.copy()
        pgaps[1:] -= pos[:-1]
        pgaps[occ_bounds[:-1]] = pos[occ_bounds[:-1]]  # restart at every doc
        if np.any(pgaps < 0):
            raise ValueError("positions not ascending within doc")
        pos_cum = _cum_bytes(pgaps.astype(np.uint64))
        pos_all = encode_varint(pgaps.astype(np.uint64))

    block_last = docs[blk_ends]
    block_max_tf = np.maximum.reduceat(tfs, blk_starts).astype(np.int32)
    block_min_dl = np.minimum.reduceat(dls, blk_starts).astype(np.int32)

    # per-list slicing (the only python loop: one cheap slice set per list)
    nb_cum = np.concatenate([[0], np.cumsum(nblocks)])
    out: dict = {
        "df": lengths,
        "first_doc": docs[bounds[:-1]],
        "last_doc": docs[bounds[1:] - 1],
        "n_blocks": nblocks.astype(np.int32),
        "doc_bin": [],
        "tf_bin": [],
        "dl_bin": [],
        "block_last": [],
        "block_max_tf": [],
        "block_min_dl": [],
        "doc_offs": [],
        "tf_offs": [],
        "dl_offs": [],
        "pos_bin": [],
        "pos_offs": [],
    }
    for t in range(T):
        s, e = bounds[t], bounds[t + 1]
        bs, be = nb_cum[t], nb_cum[t + 1]
        starts_t = blk_starts[bs:be]
        if positions is None:
            out["pos_bin"].append(None)
            out["pos_offs"].append(None)
        else:
            ps, pe = pos_cum[occ_bounds[s]], pos_cum[occ_bounds[e]]
            out["pos_bin"].append(pos_all[ps:pe])
            out["pos_offs"].append(
                (
                    np.concatenate(
                        [pos_cum[occ_bounds[starts_t]], pos_cum[occ_bounds[e : e + 1]]]
                    )
                    - ps
                ).astype(np.int32)
            )
        out["doc_bin"].append(doc_all[doc_cum[s] : doc_cum[e]])
        out["tf_bin"].append(tf_all[tf_cum[s] : tf_cum[e]])
        out["dl_bin"].append(dl_all[dl_cum[s] : dl_cum[e]])
        out["block_last"].append(block_last[bs:be])
        out["block_max_tf"].append(block_max_tf[bs:be])
        out["block_min_dl"].append(block_min_dl[bs:be])
        # rebase in int64 FIRST, then narrow: per-list relative offsets always
        # fit int32 (a single list is < 2 GiB), but the group-absolute cum
        # offsets can exceed 2^31 when one (bucket, shard) group's concatenated
        # stream does — narrowing before subtraction would silently overflow
        out["doc_offs"].append(
            (np.concatenate([doc_cum[starts_t], doc_cum[e : e + 1]]) - doc_cum[s]).astype(np.int32)
        )
        out["tf_offs"].append(
            (np.concatenate([tf_cum[starts_t], tf_cum[e : e + 1]]) - tf_cum[s]).astype(np.int32)
        )
        out["dl_offs"].append(
            (np.concatenate([dl_cum[starts_t], dl_cum[e : e + 1]]) - dl_cum[s]).astype(np.int32)
        )
    return out


def decode_posting_lists(
    doc_bins: list[bytes],
    tf_bins: list[bytes],
    dl_bins: list[bytes],
    dfs: np.ndarray,
    block: int = BLOCK_SIZE,
    pos_bins: list[bytes] | None = None,
):
    """Decode R posting lists in one pass -> (docs, tfs, dls, bounds).

    bounds has length R+1; list r occupies [bounds[r], bounds[r+1]).
    With ``pos_bins`` the return gains a 5th element: the flat within-doc
    positions array (doc-major across all lists, entry i owns tfs[i] values).
    """
    dfs = np.asarray(dfs, dtype=np.int64)
    bounds = np.zeros(dfs.shape[0] + 1, dtype=np.int64)
    np.cumsum(dfs, out=bounds[1:])
    n = int(bounds[-1])
    gaps = decode_varint(b"".join(doc_bins), count=n).astype(np.int64)
    tfs = decode_varint(b"".join(tf_bins), count=n).astype(np.int64)
    dls = decode_varint(b"".join(dl_bins), count=n).astype(np.int64)

    nblocks = (dfs + block - 1) // block
    blk_starts = np.repeat(bounds[:-1], nblocks) + concat_aranges(nblocks) * block
    # segmented cumsum with restart at every block start
    c = np.cumsum(gaps)
    base = np.zeros(blk_starts.shape[0], dtype=np.int64)
    base[1:] = c[blk_starts[1:] - 1]
    seg_sizes = np.diff(np.concatenate([blk_starts, [n]]))
    docs = c - np.repeat(base, seg_sizes)
    if pos_bins is None:
        return docs, tfs, dls, bounds
    n_pos = int(tfs.sum())
    pgaps = decode_varint(b"".join(pos_bins), count=n_pos).astype(np.int64)
    occ_starts = np.zeros(n, dtype=np.int64)
    np.cumsum(tfs[:-1], out=occ_starts[1:])
    pc = np.cumsum(pgaps)
    pbase = np.zeros(n, dtype=np.int64)
    pbase[1:] = pc[occ_starts[1:] - 1]
    pos = pc - np.repeat(pbase, tfs)
    return docs, tfs, dls, bounds, pos
