"""Query-time top-k over merged postings (SURVEY.md §2.6 T2, §3.2).

Two exact scorers run per (shard) group inside ``applyInPandas`` — shards
tile the docID space disjointly, so per-shard top-k → global
TakeOrderedAndProject(k) is exact:

- ``bmw``  — zone-vectorized block-max WAND: per-block (max_tf, min_dl)
  upper bounds (computed with LIVE corpus stats) are folded into per-ZONE
  bounds (zones = doc ranges cut at the union of block boundaries); zones are
  scored whole-zone with numpy in descending-bound order and the loop stops
  when the k-th score meets the next bound. Blocks that can't beat θ are
  never DECODED (block-restarted varint streams make per-block decode
  possible). The analog of FAISS-IVF probing only nprobe inverted lists
  (/root/reference/Makefile:24-25; README.md:16). The classic per-document
  pivot walk is kept as ``wand_topk_docwise`` for cross-check tests.
- ``taat`` — term-at-a-time vectorized scoring: numpy bincount accumulation
  over the shard's bounded doc range. No skipping, but zero Python-per-doc
  work; wins when query terms are hot (dense lists).

Both return identical rankings (tested); tie-break everywhere is
(score DESC, doc_id ASC). All arithmetic float64.
"""

from __future__ import annotations

import heapq
import math

import numpy as np
import pandas as pd

from .. import B_BM25, K1
from ..codecs.postings import decode_block, decode_posting_list

_INF = np.iinfo(np.int64).max


def idf_of(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def _contrib(idf: float, tfs, dls, k1: float, b: float, avgdl: float):
    tfs = np.asarray(tfs, dtype=np.float64)
    dls = np.asarray(dls, dtype=np.float64)
    return idf * tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dls / avgdl))


class _Cursor:
    """Block-skipping cursor over one encoded posting list."""

    __slots__ = ("row", "idf", "k1", "b", "avgdl", "block_last", "block_ub",
                 "term_ub", "n_blocks", "bi", "docs", "contribs", "i", "cur_doc")

    def __init__(self, row: dict, idf: float, k1: float, b: float, avgdl: float):
        self.row, self.idf, self.k1, self.b, self.avgdl = row, idf, k1, b, avgdl
        self.block_last = np.asarray(row["block_last"], dtype=np.int64)
        max_tf = np.asarray(row["block_max_tf"], dtype=np.float64)
        min_dl = np.asarray(row["block_min_dl"], dtype=np.float64)
        self.block_ub = idf * max_tf * (k1 + 1.0) / (max_tf + k1 * (1.0 - b + b * min_dl / avgdl))
        self.term_ub = float(self.block_ub.max())
        self.n_blocks = self.block_last.shape[0]
        self.bi = -1
        self._load(0)

    def _load(self, bi: int) -> None:
        if bi >= self.n_blocks:
            self.cur_doc = _INF
            return
        docs, tfs, dls = decode_block(self.row, bi)
        self.bi = bi
        self.docs = docs
        self.contribs = _contrib(self.idf, tfs, dls, self.k1, self.b, self.avgdl)
        self.i = 0
        self.cur_doc = int(docs[0])

    def next_geq(self, target: int) -> None:
        """Advance to first doc >= target; skips (never decodes) dead blocks."""
        if self.cur_doc >= target:
            return
        if self.block_last[self.bi] < target:
            nb = int(np.searchsorted(self.block_last, target, side="left"))
            if nb >= self.n_blocks:
                self.cur_doc = _INF
                return
            self._load(nb)
        # block_last[bi] >= target, so a match exists inside this block
        self.i = int(np.searchsorted(self.docs, target, side="left"))
        self.cur_doc = int(self.docs[self.i])

    def advance(self) -> None:
        self.i += 1
        if self.i >= self.docs.shape[0]:
            self._load(self.bi + 1)
        else:
            self.cur_doc = int(self.docs[self.i])

    def score_current(self) -> float:
        return float(self.contribs[self.i])

    def current_block_ub(self) -> float:
        return float(self.block_ub[self.bi]) if self.cur_doc != _INF else 0.0


def wand_topk(rows: list[dict], idfs: dict[int, float], k: int, k1: float, b: float, avgdl: float):
    """Exact block-max top-k, fully vectorized (zone-at-a-time).

    The docID space is cut into ZONES at the union of every list's block
    boundaries, so each zone is covered by exactly ONE block per list and a
    doc's full score always accumulates inside its one zone. Zones are
    processed in descending upper-bound order (Σ covering blocks' block-max
    UBs); once the running k-th score θ meets the next zone's UB, every
    remaining zone is provably below θ and the loop stops. Surviving zones are
    scored whole-zone with numpy (block decode is cached per list) — Python
    cost is O(zones processed × terms), never O(docs), which is the
    vectorization of classic per-document WAND pivoting.

    Pruning is strict (< θ only), so score ties are always fully evaluated and
    the (score DESC, doc_id ASC) order matches brute force exactly.
    """
    # per-list block metadata: boundaries + live-stats upper bounds
    lists = []
    for r in rows:
        idf = idfs[r["term_id"]]
        bl = np.asarray(r["block_last"], dtype=np.int64)
        max_tf = np.asarray(r["block_max_tf"], dtype=np.float64)
        min_dl = np.asarray(r["block_min_dl"], dtype=np.float64)
        ub = idf * max_tf * (k1 + 1.0) / (max_tf + k1 * (1.0 - b + b * min_dl / avgdl))
        lists.append((r, idf, bl, ub))

    ends = np.unique(np.concatenate([bl for _, _, bl, _ in lists]))
    nz = ends.shape[0]
    zone_ub = np.zeros(nz, dtype=np.float64)
    cover = []  # per list: block index covering each zone (== n_blocks → none)
    for _, _, bl, ub in lists:
        idx = np.searchsorted(bl, ends, side="left")
        valid = idx < bl.shape[0]
        zone_ub += np.where(valid, ub[np.minimum(idx, ub.shape[0] - 1)], 0.0)
        cover.append((idx, valid))

    order = np.argsort(-zone_ub, kind="stable")
    top_docs = np.empty(0, dtype=np.int64)
    top_scores = np.empty(0, dtype=np.float64)
    theta = -1.0
    cache: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}

    for zi in order:
        zub = float(zone_ub[zi])
        if zub <= 0.0 or (top_docs.shape[0] >= k and zub < theta):
            break  # descending UB order → every remaining zone is dead too
        lo = int(ends[zi - 1]) if zi > 0 else -1
        hi = int(ends[zi])
        parts_d, parts_c = [], []
        for li, (idx, valid) in enumerate(cover):
            if not valid[zi]:
                continue
            bi = int(idx[zi])
            got = cache.get((li, bi))
            if got is None:
                row, idf, _, _ = lists[li]
                docs, tfs, dls = decode_block(row, bi)
                got = (docs, _contrib(idf, tfs, dls, k1, b, avgdl))
                cache[(li, bi)] = got
            docs, contribs = got
            a = int(np.searchsorted(docs, lo, side="right"))
            e = int(np.searchsorted(docs, hi, side="right"))
            if a < e:
                parts_d.append(docs[a:e])
                parts_c.append(contribs[a:e])
        if not parts_d:
            continue
        zdocs = np.concatenate(parts_d)
        zcontrib = np.concatenate(parts_c)
        u, inv = np.unique(zdocs, return_inverse=True)
        s = np.bincount(inv, weights=zcontrib)
        cd = np.concatenate([top_docs, u])
        cs = np.concatenate([top_scores, s])
        sel = np.lexsort((cd, -cs))[:k]
        top_docs, top_scores = cd[sel], cs[sel]
        if top_docs.shape[0] >= k:
            theta = float(top_scores[-1])
    return [(int(d), float(s)) for d, s in zip(top_docs, top_scores)]


def wand_topk_docwise(rows: list[dict], idfs: dict[int, float], k: int, k1: float, b: float, avgdl: float):
    """Reference implementation: per-document block-max WAND (Ding & Suel
    pivoting with a Python cursor walk). Kept as the property-test cross-check
    for the vectorized zone scorer above — both are exact, so their rankings
    must be identical on any input.
    """
    cursors = [_Cursor(r, idfs[r["term_id"]], k1, b, avgdl) for r in rows]
    heap: list[tuple[float, int]] = []  # min-heap keyed (score, -doc_id)

    def theta() -> float:
        return heap[0][0] if len(heap) >= k else -1.0

    while True:
        cursors = [c for c in cursors if c.cur_doc != _INF]
        if not cursors:
            break
        cursors.sort(key=lambda c: c.cur_doc)
        th = theta()
        cum = 0.0
        pivot = -1
        for i, c in enumerate(cursors):
            cum += c.term_ub
            if cum >= th:
                pivot = i
                break
        if pivot < 0:
            break  # even all remaining terms together can't reach θ
        pivot_doc = cursors[pivot].cur_doc
        if pivot_doc == _INF:
            break
        if cursors[0].cur_doc == pivot_doc:
            aligned = [c for c in cursors if c.cur_doc == pivot_doc]
            # block-max refinement: current blocks' UBs, strictly below θ → skip
            if sum(c.current_block_ub() for c in aligned) < th:
                for c in aligned:
                    c.advance()
                continue
            s = sum(c.score_current() for c in aligned)
            cand = (s, -pivot_doc)
            if len(heap) < k:
                heapq.heappush(heap, cand)
            elif cand > heap[0]:
                heapq.heapreplace(heap, cand)
            for c in aligned:
                c.advance()
        else:
            cursors[0].next_geq(pivot_doc)
    out = sorted(((s, -nd) for s, nd in heap), key=lambda x: (-x[0], x[1]))
    return [(doc, s) for s, doc in out]


def taat_topk(rows: list[dict], idfs: dict[int, float], k: int, k1: float, b: float, avgdl: float):
    """Exact vectorized term-at-a-time scoring over one shard."""
    base = min(int(r["first_doc"]) for r in rows)
    hi = max(int(r["last_doc"]) for r in rows)
    width = hi - base + 1
    acc = np.zeros(width, dtype=np.float64)
    touched = np.zeros(width, dtype=bool)
    for r in rows:
        docs, tfs, dls = decode_posting_list(r)
        contrib = _contrib(idfs[r["term_id"]], tfs, dls, k1, b, avgdl)
        idx = docs - base
        acc += np.bincount(idx, weights=contrib, minlength=width)
        touched[idx] = True
    cand = np.flatnonzero(touched)
    scores = acc[cand]
    order = np.lexsort((cand, -scores))[:k]  # (score DESC, doc ASC), exact
    return [(int(cand[i]) + base, float(scores[i])) for i in order]


def make_multi_scorer(
    query_idfs: dict[int, dict[int, float]],
    k: int,
    avgdl: float,
    k1: float = K1,
    b: float = B_BM25,
):
    """Batched scorer: decode each posting list ONCE per shard, score every
    query that references it (vectorized TAAT per query). The throughput path
    for query batches — one Spark job for the whole reference query set.
    Returns an applyInPandas fn -> (query_id, doc_id, score) top-k per query.
    """
    # A term's idf is GLOBAL (df over the whole corpus), so its per-doc BM25
    # contribution is identical for every query referencing it — that is what
    # lets each posting row be decoded AND scored exactly once per shard. The
    # invariant is ASSERTED here (driver-side, at closure creation) instead of
    # silently last-write-wins: a future caller passing per-query idfs for the
    # same term would otherwise corrupt every other query's scores.
    term_idf: dict[int, float] = {}
    for qid, idfs in query_idfs.items():
        for t, i in idfs.items():
            prev = term_idf.setdefault(t, i)
            if prev != i:
                raise ValueError(
                    f"make_multi_scorer: term_id {t} has conflicting idf values "
                    f"({prev} vs {i} in query {qid}); idf must be derived from "
                    "the global df for every query"
                )

    def score_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        # a term may appear in MULTIPLE rows of one shard (one per index
        # generation, disjoint doc sub-ranges) — accumulate, never overwrite.
        decoded: dict[int, list[tuple]] = {}
        base = int(pdf["first_doc"].min())
        hi = int(pdf["last_doc"].max())
        width = hi - base + 1
        for r in pdf.to_dict("records"):
            tid = r["term_id"]
            idf = term_idf.get(tid)
            if idf is None:
                continue
            docs, tfs, dls = decode_posting_list(r)
            decoded.setdefault(tid, []).append(
                (docs - base, _contrib(idf, tfs, dls, k1, b, avgdl))
            )
        out_q, out_d, out_s = [], [], []
        for qid, idfs in query_idfs.items():
            acc = np.zeros(width, dtype=np.float64)
            touched = np.zeros(width, dtype=bool)
            hit = False
            for term in idfs:
                got = decoded.get(term)
                if got is None:
                    continue
                hit = True
                for idx, contrib in got:
                    acc += np.bincount(idx, weights=contrib, minlength=width)
                    touched[idx] = True
            if not hit:
                continue
            cand = np.flatnonzero(touched)
            scores = acc[cand]
            order = np.lexsort((cand, -scores))[:k]
            out_q.extend([qid] * len(order))
            out_d.extend((cand[order] + base).tolist())
            out_s.extend(scores[order].tolist())
        return pd.DataFrame({"query_id": out_q, "doc_id": out_d, "score": out_s})

    return score_shard


def make_shard_scorer(idfs: dict[int, float], k: int, avgdl: float,
                      k1: float = K1, b: float = B_BM25, method: str = "auto"):
    """Returns an applyInPandas function: one shard's posting rows -> top-k.

    ``method``: "bmw" (zone-vectorized block-max), "taat" (vectorized), or
    "auto" — decided PER SHARD from candidate density: when the query terms'
    postings cover a meaningful fraction of the shard's doc range, block
    skipping can't prune much and the single-bincount TAAT path wins; on
    selective queries the zone scorer decodes only surviving blocks. Both are
    exact (bit-identical accumulation order, tested), so the switch can never
    change a ranking. The density threshold is MEASURED, not guessed: on
    random posting lists the crossover sits near one posting per ~80 docs of
    range across shard widths 16k→1M (see BASELINE.md round 3), hence ×64.
    """

    def score_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        m = method
        if m == "auto":
            width = int(pdf["last_doc"].max()) - int(pdf["first_doc"].min()) + 1
            # ≥ one posting per 64 docs of range → dense → vectorized TAAT
            m = "taat" if int(pdf["df"].sum()) * 64 >= width else "bmw"
        fn = wand_topk if m == "bmw" else taat_topk
        rows = pdf.to_dict("records")
        top = fn(rows, idfs, k, k1, b, avgdl)
        return pd.DataFrame({"doc_id": [d for d, _ in top], "score": [s for _, s in top]})

    return score_shard
