"""IVF (inverted-file) vector index trained with distributed k-means — the
reference's ACTUAL ANN geometry. The reference trains a FAISS
``OPQ32,IVF65536_HNSW32,PQ32`` index whose 65,536 inverted lists are k-means
cluster cells (/root/reference/README.md:60, Makefile:38-39); a query probes
only the ``nprobe`` nearest cells. The LSH family in
``operators/similarity.py`` approximates that geometry with data-INDEPENDENT
hyperplane signs; this module implements the trained, data-ADAPTIVE version:
list occupancy follows the data distribution, which is why the reference
trains rather than hashes.

Spark shape: Lloyd iterations are one ``mapInPandas`` pass (per-partition
GEMM assignment + per-cluster partial sums — the map-side combine) feeding a
k-row ``applyInPandas`` reduction; only (k × dim) doubles ever reach the
driver, the same footprint FAISS itself needs to hold the trained
centroids. The persisted index partitions vectors by contiguous list-range
directories (≤``IVF_MAX_GROUPS`` dirs) with list-sorted 1 MiB row groups, so
a probe prunes directory-first then row-group — the same two-level layout as
the ANN LSH index (one-dir-per-list at 65,536 lists would put a 65k-entry
listing on every query's driver path).

Cross-engine determinism contract (shared with the DuckDB oracle SQL in
``__spark_entry__``):

- all math in float64 (exact widening from float32 storage);
- centroids are rounded to 6 decimals after init and after EVERY Lloyd
  update, so both engines enter each iteration with identical constants;
- init = the ``n_lists`` lowest-``vec_id`` vectors (no RNG);
- assignment = argmin over ``round(d², 6)``, ties broken by lowest list id;
- d² composed as ``(‖v‖² − 2·v·c) + ‖c‖²`` in both engines (identical
  floating-point association);
- a Lloyd update is ``round(Σ members / count, 6)`` per dimension; an empty
  list keeps its previous (already-rounded) centroid.

Accepted residual: ``np.round`` is half-to-even while SQL ``round`` is
half-away-from-zero, so a value whose float64 form lands EXACTLY on a
6-decimal tie could round differently per engine (the same residual every
round-6 oracle in this repo carries). Ties at the 6th decimal of irrational
means/distances are measure-zero in the fixed test data — and because the
data is deterministic, a divergence would be a stable oracle failure caught
by the gate, never a flake. The SQ8 codec, where ties DO occur by
construction (code boundaries), uses floor(x + 0.5) on both engines instead.
A second residual of the same class (ADVICE r5): the Lloyd mean's partials
are summed in PARTITION-ID order on the Spark side (deterministic for a
fixed partitioning — lloyd_step sorts before stacking), but DuckDB sums in
its own internal order, so a per-dimension mean within an ulp of a
6-decimal boundary could still round differently per ENGINE.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# bumped when the persisted IVF artifact layout or training math changes
# (4: sq8r residual-coded payload (a format-3 reader would mis-read an sq8r
#  index as unquantized — the stamp exists to refuse that cleanly);
#  3: optional SQ8 scalar quantization — vectors stored as uint8 codes;
#  2: generation partitioning — incremental fills append as gen=N under the
#  same trained centroids, mirroring the ANN index's gen-stacked layout)
IVF_INDEX_FORMAT = 4

# directory fan-out bound (same rationale as similarity.ANN_GROUP_BITS)
IVF_MAX_GROUPS = 256

# auto-sizing target: vectors per inverted list — the reference's 65,536
# lists over ~10^8 abstracts is ~1.5k vectors/list (README.md:60)
AUTO_TARGET_LIST_VECS = 1536


def auto_n_lists(n_vectors: int) -> int:
    """Corpus size -> inverted-list count (reference geometry: 10^8 vectors
    -> 65,536 lists)."""
    if n_vectors <= 0:
        return 4
    return min(65536, max(4, int(round(n_vectors / AUTO_TARGET_LIST_VECS))))


def _lgroup_of(lists: np.ndarray, n_lists: int, n_groups: int) -> np.ndarray:
    """Contiguous list-range directory key: lists [0, n_lists) map onto
    [0, n_groups) preserving order, so a probe's nearest lists land in few
    directories."""
    return ((lists.astype(np.int64) * n_groups) // n_lists).astype(np.int32)


# assignment GEMM tile bounds (r5 verdict #1): peak per-task memory is
# O(ASSIGN_ROW_CHUNK × ASSIGN_CENT_BLOCK) float64 (~32 MB at 1024×4096)
# instead of O(arrow_batch × n_lists) — a 10k-row batch × the reference's
# 65,536 lists was ~5.2 GB × 2 per concurrent task, which could not run at
# the geometry this module explicitly targets (README.md:60).
ASSIGN_ROW_CHUNK = 1024
ASSIGN_CENT_BLOCK = 4096


def assign_ids(m: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Vectorized nearest-centroid assignment under the determinism contract:
    argmin over round(d², 6), ties -> lowest list id.

    Tiled (r5 verdict #1): rows in ASSIGN_ROW_CHUNK slices × centroids in
    ASSIGN_CENT_BLOCK slices with a running argmin. Each d² element is the
    same round((‖v‖² − 2·v·c) + ‖c‖², 6) as the untiled version, blocks
    scan in ascending centroid order and the running update is a strict
    ``<`` (np.argmin keeps the first index within a block), so ties still
    resolve to the lowest list id — same assignments, bounded memory
    (scripts/ivf_assign_microbench.py measures the 65,536-list geometry).
    """
    n, k = m.shape[0], cents.shape[0]
    cc = (cents * cents).sum(axis=1)
    out = np.empty(n, dtype=np.int32)
    for r0 in range(0, n, ASSIGN_ROW_CHUNK):
        rows = m[r0 : r0 + ASSIGN_ROW_CHUNK]
        vv = (rows * rows).sum(axis=1)
        best_d2: np.ndarray | None = None
        best_ix: np.ndarray | None = None
        for c0 in range(0, k, ASSIGN_CENT_BLOCK):
            cb = cents[c0 : c0 + ASSIGN_CENT_BLOCK]
            d2 = np.round((vv[:, None] - 2.0 * (rows @ cb.T)) + cc[c0 : c0 + ASSIGN_CENT_BLOCK][None, :], 6)
            ix = d2.argmin(axis=1)
            val = d2[np.arange(d2.shape[0]), ix]
            if best_d2 is None:
                best_d2, best_ix = val, ix + c0
            else:
                upd = val < best_d2  # strict: ties keep the earlier block's id
                best_d2 = np.where(upd, val, best_d2)
                best_ix = np.where(upd, ix + c0, best_ix)
        out[r0 : r0 + ASSIGN_ROW_CHUNK] = best_ix
    return out


def init_centroids(
    emb: DataFrame, n_lists: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> np.ndarray:
    """Deterministic seeding: the n_lists lowest-id vectors, rounded to 6
    decimals (both engines start from identical constants — no RNG, no
    kmeans++ sampling order to replicate)."""
    rows = emb.select(id_col, vec_col).orderBy(id_col).limit(n_lists).collect()
    mat = np.array(
        [[float(x) for x in r[vec_col]] for r in rows], dtype=np.float64
    )
    return np.round(mat, 6)


def lloyd_step(
    emb: DataFrame,
    cents: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """One distributed Lloyd update: assignment + per-list mean.

    mapInPandas computes the batch GEMM assignment and accumulates per-list
    (Σvec, count) across the partition — the map-side combine, so the shuffle
    carries at most (partitions × k) narrow rows; applyInPandas reduces to
    ≤k rows; only (k × dim) doubles are collected. Empty lists keep their
    previous centroid."""
    from typing import Iterator

    import pandas as pd

    k, d = cents.shape

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        sums = np.zeros((k, d), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
            cl = assign_ids(m, cents)
            np.add.at(sums, cl, m)
            np.add.at(counts, cl, 1)
        nz = np.nonzero(counts)[0]
        if len(nz):
            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx is not None else 0
            yield pd.DataFrame(
                {
                    "cl": nz.astype(np.int32),
                    "pid": np.full(len(nz), pid, dtype=np.int32),
                    "psum": list(sums[nz]),
                    "n": counts[nz],
                }
            )

    def reduce_cl(key, pdf: pd.DataFrame) -> pd.DataFrame:
        # partials are summed in PARTITION-ID order (ADVICE r5): the stack
        # order is then a pure function of the input partitioning, not of
        # task-arrival timing — the per-run float64 association is fixed.
        # (The cross-ENGINE summation-order residual vs DuckDB remains and
        # is documented in the module header.)
        pdf = pdf.sort_values("pid")
        s = np.stack(pdf["psum"].to_numpy()).sum(axis=0)
        return pd.DataFrame(
            {"cl": [np.int32(key[0])], "pid": [np.int32(0)], "psum": [s], "n": [pdf["n"].sum()]}
        )

    schema = "cl int, pid int, psum array<double>, n long"
    tot = (
        emb.select(id_col, vec_col)
        .mapInPandas(partials, schema=schema)
        .groupBy("cl")
        .applyInPandas(reduce_cl, schema=schema)
        .collect()
    )
    out = cents.copy()
    for r in tot:
        out[r["cl"]] = np.round(np.asarray(r["psum"], dtype=np.float64) / r["n"], 6)
    return out


def train_kmeans(
    emb: DataFrame,
    n_lists: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic distributed k-means -> (n_lists × dim) float64 centroid
    matrix (each entry rounded to 6 decimals). The analog of the reference's
    `index train` step (Makefile:24, 65,536-list k-means on a sample); here
    the full corpus participates — each iteration is one Spark job."""
    cents = init_centroids(emb, n_lists, id_col, vec_col)
    for _ in range(iters):
        cents = lloyd_step(emb, cents, id_col, vec_col)
    return cents


def _assign_fn(
    cents: np.ndarray,
    id_col: str,
    vec_col: str,
    n_groups: int,
    gen: int,
    quant: tuple[np.ndarray, np.ndarray, bool] | None = None,
):
    """Fill-stage mapInPandas: assignment always runs on the RAW vector (the
    coarse quantizer sees full precision, as in FAISS ADC); with ``quant``
    set, the stored payload is the uint8 SQ8 code bytes instead of the
    vector — a 4× storage shrink for float32 inputs. ``quant[2]`` selects
    RESIDUAL coding (codes quantize x − centroid[cell], the true FAISS
    IVF-PQ shape — residuals have a tighter range than raw coordinates, so
    the same 256 levels land closer)."""
    from typing import Iterator

    import pandas as pd

    n_lists = cents.shape[0]

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
            cl = assign_ids(m, cents)
            out = {
                "vec_id": pdf[id_col].to_numpy(),
                "list": cl,
                "lgroup": _lgroup_of(cl, n_lists, n_groups),
                "gen": np.full(len(pdf), gen, dtype=np.int32),
            }
            if quant is None:
                out["embedding"] = list(pdf[vec_col])
            else:
                qmin, qscale, residual = quant
                base = m - cents[cl] if residual else m
                codes = sq8_encode(base, qmin, qscale)
                out["codes"] = [row.tobytes() for row in codes]
            yield pd.DataFrame(out)

    return assign


QUANT_MODES = ("none", "sq8", "sq8r")


def _payload_schema(p_or_vec_type, quantize: str) -> str:
    if quantize in ("sq8", "sq8r"):
        return "codes binary"
    return f"embedding {p_or_vec_type}"


def residual_min_max(
    emb: DataFrame, cents: np.ndarray, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (min, max) of the assignment residuals x − centroid[cl]
    — the sq8r quantizer's training step."""
    return _min_max_pass(emb, vec_col, lambda m: m - cents[assign_ids(m, cents)])


def _min_max_pass(
    emb: DataFrame, vec_col: str, transform
) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (min, max) of ``transform(matrix)`` over the corpus:
    one mapInPandas pass emitting one partial row per partition, driver
    reduce over ≤partitions rows. Exact and order-independent (min/max have
    no floating-point summation-order issues), so both engines derive
    identical quantizer constants."""
    from typing import Iterator

    import pandas as pd

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lo = hi = None
        for pdf in batches:
            if not len(pdf):
                continue
            m = transform(
                np.stack([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
            )
            blo, bhi = m.min(axis=0), m.max(axis=0)
            lo = blo if lo is None else np.minimum(lo, blo)
            hi = bhi if hi is None else np.maximum(hi, bhi)
        if lo is not None:
            yield pd.DataFrame({"lo": [lo], "hi": [hi]})

    rows = (
        emb.select(vec_col)
        .mapInPandas(partials, schema="lo array<double>, hi array<double>")
        .collect()
    )
    lo = np.min(np.stack([np.asarray(r["lo"]) for r in rows]), axis=0)
    hi = np.max(np.stack([np.asarray(r["hi"]) for r in rows]), axis=0)
    return lo, hi


def corpus_min_max(
    emb: DataFrame, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (min, max) over the raw corpus — the SQ8 quantizer's
    training step."""
    return _min_max_pass(emb, vec_col, lambda m: m)


def sq8_encode(m: np.ndarray, qmin: np.ndarray, qscale: np.ndarray) -> np.ndarray:
    """float64 (n × d) -> uint8 codes under the cross-engine contract:
    code = clamp(floor((x − qmin)/qscale + 0.5), 0, 255) — floor(v + 0.5) is
    half-away-from-zero for the non-negative operand, matching SQL
    floor(v + 0.5) exactly (np.round would banker's-round). A zero-range
    dimension (qscale 0) codes to 0 and decodes to qmin."""
    with np.errstate(divide="ignore", invalid="ignore"):
        v = np.where(qscale > 0, (m - qmin) / np.where(qscale > 0, qscale, 1.0), 0.0)
    return np.clip(np.floor(v + 0.5), 0.0, 255.0).astype(np.uint8)


def sq8_decode(codes: np.ndarray, qmin: np.ndarray, qscale: np.ndarray) -> np.ndarray:
    """uint8 codes -> the reconstruction x̂ = qmin + code·qscale (float64)."""
    return qmin + codes.astype(np.float64) * qscale


def _matrix_fn(
    quant: tuple[np.ndarray, np.ndarray, bool] | None,
    cents: np.ndarray | None = None,
):
    """Candidate batch -> float64 matrix: raw vectors widened, or SQ8 codes
    reconstructed (x̂ = qmin + code·qscale — asymmetric scoring: the query
    stays full-precision, as in FAISS ADC); residual mode (sq8r) adds the
    row's cell centroid back (x̂ = centroid[list] + decode(codes), so the
    batch must carry the ``list`` column). Standalone closure (only numpy
    arrays captured), so scoring UDFs never pickle a reader/session."""
    if quant is None:
        def to_matrix(pdf) -> np.ndarray:
            return np.stack(
                [np.asarray(x, dtype=np.float64) for x in pdf["embedding"]]
            )
    else:
        qmin, qscale, residual = quant
        if residual and cents is None:
            raise ValueError("residual decode requires the centroid matrix")

        def to_matrix(pdf) -> np.ndarray:
            codes = np.stack(
                [np.frombuffer(b, dtype=np.uint8) for b in pdf["codes"]]
            )
            dec = sq8_decode(codes, qmin, qscale)
            if residual:
                dec = cents[pdf["list"].to_numpy()] + dec
            return dec

    return to_matrix


def _scrub_orphan_generations(out_dir: str, next_gen: int) -> None:
    """Shared-lifecycle delegation (vecindex.scrub_orphan_generations)."""
    from . import vecindex

    vecindex.scrub_orphan_generations(out_dir, next_gen)


def _load_centroids(spark, out_dir: str, params: dict) -> np.ndarray:
    """centroids table -> dense (n_lists × dim) float64 matrix."""
    from ..sources.tables import read_table

    cents = np.zeros((params["n_lists"], params["dim"]), dtype=np.float64)
    for r in read_table(spark, out_dir, "centroids").collect():
        cents[r["cl"]] = np.asarray(r["centroid"], dtype=np.float64)
    return cents


# shared lifecycle spec (r5 verdict #8): sync/compact/scrub/staleness live
# ONCE in operators/vecindex.py for both vector-index families
def _ivf_spec():
    from .vecindex import VecIndexSpec

    return VecIndexSpec(
        kind="IVF", params_file="ivf_params.json",
        format_version=IVF_INDEX_FORMAT, part_col="lgroup",
        sort_col="list", builder="build_ivf_index",
    )


def _ivf_params_path(out_dir: str) -> str:
    return os.path.join(out_dir, "ivf_params.json")


def _read_ivf_params(out_dir: str) -> dict:
    from . import vecindex

    return vecindex.read_params(out_dir, _ivf_spec())


def _write_ivf_params(out_dir: str, params: dict) -> None:
    from . import vecindex

    vecindex.write_params(out_dir, _ivf_spec(), params)


def build_ivf_index(
    emb: DataFrame,
    out_dir: str,
    n_lists: int | None = None,
    iters: int = 2,
    nprobe: int = 2,
    quantize: str = "none",
    train_sample_mod: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Train centroids and persist the IVF index: a ``centroids`` table
    (cl, centroid) and a ``vectors`` table partitioned by contiguous
    list-range directory (≤IVF_MAX_GROUPS dirs), list-sorted 1 MiB row
    groups — the train + fill steps of the reference's Makefile:24-25 as two
    table commits. ``ivf_params.json`` lands LAST as the completeness
    marker; writes go through the table facade, so a rebuild is
    crash-atomic (tmp→swap).

    ``quantize="sq8"`` stores each vector as uint8 codes (per-dim min/scale
    trained on the corpus alongside the centroids) — the analog of the
    reference's PQ32 compression (README.md:60: vectors live in the index as
    quantized codes, queries score asymmetrically against reconstructions;
    4× smaller than float32 storage). Like the centroids, the quantizer is
    fixed at build time; later generations encode with it unchanged.

    ``train_sample_mod=m`` trains centroids (and the SQ8 quantizer) on the
    deterministic 1/m sample ``vec_id % m == 0`` instead of the full corpus
    — the reference trains FAISS the same way (a RAM-sized sample, not all
    10^8 vectors); at 100 TB the 2×iters training scans touch 1/m of the
    data while the fill still assigns every vector. The predicate is
    engine-portable (plain modulo), so a sampled index stays oracle-able."""
    from ..sources.tables import commit

    if quantize not in QUANT_MODES:
        raise ValueError(f"unknown quantize mode {quantize!r} (one of {QUANT_MODES})")
    if train_sample_mod < 1:
        raise ValueError("train_sample_mod must be >= 1")
    train_emb = (
        emb if train_sample_mod == 1
        else emb.filter(F.col(id_col) % train_sample_mod == 0)
    )
    n = emb.count()
    if n == 0:
        raise ValueError("build_ivf_index: empty corpus (no vectors to index)")
    n_train = n if train_sample_mod == 1 else train_emb.count()
    if n_train == 0:
        raise ValueError(
            f"build_ivf_index: train sample vec_id % {train_sample_mod} == 0 "
            "selected no vectors — lower train_sample_mod"
        )
    if n_lists is None:
        n_lists = auto_n_lists(n)
    n_lists = max(1, min(n_lists, n_train))
    n_groups = min(IVF_MAX_GROUPS, n_lists)
    cents = train_kmeans(train_emb, n_lists, iters, id_col, vec_col)

    vec_type = emb.schema[vec_col].dataType.simpleString()
    quant = None
    qmin = qscale = None
    if quantize in ("sq8", "sq8r"):
        if quantize == "sq8":
            lo, hi = corpus_min_max(train_emb, vec_col)
        else:  # sq8r: bounds of the assignment residuals (FAISS IVF-PQ shape)
            lo, hi = residual_min_max(train_emb, cents, vec_col)
        qmin, qscale = lo, (hi - lo) / 255.0
        quant = (qmin, qscale, quantize == "sq8r")
    assigned = emb.select(id_col, vec_col).mapInPandas(
        _assign_fn(cents, id_col, vec_col, n_groups, gen=0, quant=quant),
        schema=f"vec_id long, {_payload_schema(vec_type, quantize)}, list int, lgroup int, gen int",
    )
    commit(assigned, out_dir, "vectors", partition_by=["gen", "lgroup"],
           repartition_by=["lgroup"], sort_by=["list"], row_group_bytes=1 << 20)

    spark = emb.sparkSession
    cdf = spark.createDataFrame(
        [(int(i), [float(x) for x in cents[i]]) for i in range(n_lists)],
        "cl int, centroid array<double>",
    )
    commit(cdf, out_dir, "centroids")
    params = {
        "n_lists": int(n_lists),
        "iters": int(iters),
        "dim": int(cents.shape[1]),
        "format": IVF_INDEX_FORMAT,
        "vec_type": vec_type,
        "n_groups": int(n_groups),
        "nprobe": int(nprobe),
        "n_vectors": int(n),
        "quantize": quantize,
        "train_sample_mod": int(train_sample_mod),
        "merged_srcs": ["__initial__"],
        "next_gen": 1,
        "build_id": uuid.uuid4().hex,
    }
    if quantize in ("sq8", "sq8r"):
        params["sq8_min"] = [float(x) for x in qmin]
        params["sq8_scale"] = [float(x) for x in qscale]
    _write_ivf_params(out_dir, params)


def sync_ivf_index(
    new_emb: DataFrame,
    out_dir: str,
    src_tag: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> bool:
    """Append a NEW vector batch to a persisted IVF index as the next
    generation — assignment under the index's FIXED trained centroids, no
    retrain (the same add-without-train contract as FAISS `index fill` on an
    already-trained index, and the same crash-replay protocol as
    similarity.sync_ann_index): ``src_tag`` is the batch's content identity;
    a tag already recorded in ivf_params.json is a no-op, and generations
    past the marker (appended, then crashed before the params update) are
    scrubbed before re-appending, so replays converge. Returns True if a
    generation was appended."""
    from . import vecindex

    spark = new_emb.sparkSession

    def make_rows(p: dict, next_gen: int):
        cents = _load_centroids(spark, out_dir, p)
        quantize = p.get("quantize", "none")
        quant = None
        if quantize in ("sq8", "sq8r"):  # index's FIXED quantizer, no retrain
            quant = (
                np.asarray(p["sq8_min"], dtype=np.float64),
                np.asarray(p["sq8_scale"], dtype=np.float64),
                quantize == "sq8r",
            )
        return new_emb.select(id_col, vec_col).mapInPandas(
            _assign_fn(cents, id_col, vec_col, int(p["n_groups"]), gen=next_gen, quant=quant),
            schema=f"vec_id long, {_payload_schema(p['vec_type'], quantize)}, list int, lgroup int, gen int",
        )

    return vecindex.sync_generation(
        new_emb, out_dir, _ivf_spec(), src_tag, vec_col, make_rows
    )


def probe_lists(query_vec, cents: np.ndarray, nprobe: int) -> list[int]:
    """The nprobe nearest centroids under round(d², 6), ties -> lowest list
    id — deterministic, so the oracle's ORDER BY d, cl LIMIT nprobe selects
    the identical probe set (the reference's nprobe knob, Makefile:31-32)."""
    qv = np.asarray(query_vec, dtype=np.float64)
    vv = float(qv @ qv)
    d2 = np.round((vv - 2.0 * (cents @ qv)) + (cents * cents).sum(axis=1), 6)
    order = np.lexsort((np.arange(cents.shape[0]), d2))
    return [int(x) for x in order[: max(1, nprobe)]]


from .vecindex import Staleness


class IvfIndexReader(Staleness):
    """Long-lived handle on a persisted IVF index: params + centroid matrix
    + the vectors table handle cached driver-side, re-attached when a
    rebuild rewrites ivf_params.json (one stat() per query — the same
    staleness protocol as IndexReader / AnnIndexReader)."""

    def __init__(self, spark, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        self._spec = _ivf_spec()
        self._sig: tuple[int, int] | None = None
        self._attach()

    def _attach(self) -> None:
        from ..sources.tables import read_table

        self._sig = self._signature()
        self.params = _read_ivf_params(self.index_dir)
        if self.params.get("format") != IVF_INDEX_FORMAT:
            raise ValueError(
                f"IVF index at {self.index_dir} is format "
                f"{self.params.get('format')} (current {IVF_INDEX_FORMAT}); "
                "rebuild with build_ivf_index"
            )
        self.centroids = _load_centroids(self.spark, self.index_dir, self.params)
        self.vectors = read_table(self.spark, self.index_dir, "vectors")
        self.quant: tuple[np.ndarray, np.ndarray, bool] | None = None
        qmode = self.params.get("quantize", "none")
        if qmode in ("sq8", "sq8r"):
            self.quant = (
                np.asarray(self.params["sq8_min"], dtype=np.float64),
                np.asarray(self.params["sq8_scale"], dtype=np.float64),
                qmode == "sq8r",
            )

    def _payload_col(self) -> str:
        return "codes" if self.quant is not None else "embedding"

    def assignments(self) -> DataFrame:
        """-> (vec_id, list_id): the full trained assignment table."""
        self._refresh_if_stale()
        return self.vectors.select(
            "vec_id", F.col("list").alias("list_id")
        )

    def topk(self, query_vec, k: int = 10, nprobe: int | None = None) -> DataFrame:
        """-> (vec_id, cos) top k: probe the nprobe nearest lists
        (directory-then-row-group pruned scan), score candidates with one
        float64 GEMM per Arrow batch, exact cosine within the probed set."""
        from typing import Iterator

        import pandas as pd

        self._refresh_if_stale()
        p = self.params
        if nprobe is None:
            nprobe = int(p.get("nprobe", 2))
        probe = probe_lists(query_vec, self.centroids, nprobe)
        groups = sorted(
            {int(x) for x in _lgroup_of(np.asarray(probe), p["n_lists"], p["n_groups"])}
        )
        cand = self.vectors.filter(
            F.col("lgroup").isin(groups) & F.col("list").isin(probe)
        )

        qv = np.asarray(query_vec, dtype=np.float64)
        qnorm = float(np.linalg.norm(qv))
        to_matrix = _matrix_fn(self.quant, self.centroids)

        def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                m = to_matrix(pdf)
                cos = (m @ qv) / (np.linalg.norm(m, axis=1) * qnorm)
                yield pd.DataFrame(
                    {"vec_id": pdf["vec_id"].to_numpy(), "cos": np.round(cos, 6)}
                )

        scored = cand.select("vec_id", "list", self._payload_col()).mapInPandas(
            score, schema="vec_id long, cos double"
        )
        return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)

    def topk_many(
        self,
        queries: dict[int, list[float]],
        k: int = 10,
        nprobe: int | None = None,
    ) -> DataFrame:
        """-> (query_id, rank, vec_id, cos): top-k per query in ONE job —
        the scan is pruned to the union of all queries' probe cells, each
        candidate batch is scored against every query with a single
        (batch × dim)·(dim × q) GEMM, rows fan out only to queries whose
        probe set contains the row's cell, and a per-query window rank
        bounds the output. Identical results to per-query :meth:`topk`
        (tested) — the IVF twin of AnnIndexReader.topk_many."""
        from typing import Iterator

        import pandas as pd
        from pyspark.sql import Window

        self._refresh_if_stale()
        empty = self.spark.createDataFrame(
            [], "query_id int, rank int, vec_id long, cos double"
        )
        if not queries:
            return empty
        p = self.params
        if nprobe is None:
            nprobe = int(p.get("nprobe", 2))
        qids = sorted(queries)
        n_lists = int(p["n_lists"])
        probes = {qid: probe_lists(queries[qid], self.centroids, nprobe) for qid in qids}
        by_list: dict[int, list[int]] = {}
        for qi, qid in enumerate(qids):
            for cell in probes[qid]:
                by_list.setdefault(cell, []).append(qi)
        # exhaustive-width shortcut (r5 verdict #5): nprobe >= n_lists for
        # every query (the tune ground-truth pass) selects every cell —
        # skip the In(list,…) filter instead of shipping an n_lists-element
        # predicate, and fan every row out to all queries
        full_scan = all(len(probes[qid]) >= n_lists for qid in qids)
        if full_scan:
            cand = self.vectors
        else:
            groups = sorted(
                {
                    int(x)
                    for x in _lgroup_of(
                        np.asarray(sorted(by_list)), p["n_lists"], p["n_groups"]
                    )
                }
            )
            cand = self.vectors.filter(
                F.col("lgroup").isin(groups) & F.col("list").isin(sorted(by_list))
            )
        qmat = np.stack([np.asarray(queries[qid], dtype=np.float64) for qid in qids])
        qnorm = np.linalg.norm(qmat, axis=1)
        qid_arr = np.asarray(qids, dtype=np.int64)
        # sorted-cell flat tables (r5 verdict #6): per-batch fan-out is
        # np.searchsorted + flat gathers — no per-row Python dict lookups
        ckeys = np.asarray(sorted(by_list), dtype=np.int64)
        ccnt = np.asarray([len(by_list[int(c)]) for c in ckeys], dtype=np.int64)
        coff = np.zeros(ckeys.shape[0] + 1, dtype=np.int64)
        np.cumsum(ccnt, out=coff[1:])
        cq = np.concatenate(
            [np.asarray(by_list[int(c)], dtype=np.int64) for c in ckeys]
        ) if ckeys.shape[0] else np.empty(0, dtype=np.int64)
        n_q = len(qids)
        to_matrix = _matrix_fn(self.quant, self.centroids)

        def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from ..codecs.multilist import concat_aranges

            for pdf in batches:
                if not len(pdf):
                    continue
                m = to_matrix(pdf)
                cos = (m @ qmat.T) / np.outer(np.linalg.norm(m, axis=1), qnorm)
                vids = pdf["vec_id"].to_numpy()
                nrows = vids.shape[0]
                if full_scan:
                    row_idx = np.repeat(np.arange(nrows, dtype=np.int64), n_q)
                    q_idx = np.tile(np.arange(n_q, dtype=np.int64), nrows)
                else:
                    pos = np.searchsorted(ckeys, pdf["list"].to_numpy())
                    reps = ccnt[pos]
                    row_idx = np.repeat(np.arange(nrows, dtype=np.int64), reps)
                    q_idx = cq[np.repeat(coff[pos], reps) + concat_aranges(reps)]
                yield pd.DataFrame(
                    {
                        "query_id": qid_arr[q_idx].astype(np.int32),
                        "vec_id": vids[row_idx],
                        "cos": np.round(cos[row_idx, q_idx], 6),
                    }
                )

        scored = cand.select("vec_id", "list", self._payload_col()).mapInPandas(
            score, schema="query_id int, vec_id long, cos double"
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "vec_id", "cos")
        )


def ivf_cell_stats(spark, out_dir: str) -> DataFrame:
    """-> (list, n_vecs) for EVERY trained cell, including empty ones (left
    join from the centroids table) — cell occupancy is the probe-cost
    variance at scale: a probe reads its cells' rows, so a hot cell is a hot
    probe (the stat FAISS exposes as invlist sizes). One narrow groupBy over
    (list), no vector payload touched thanks to column pruning."""
    from ..sources.tables import read_table

    occ = (
        read_table(spark, out_dir, "vectors")
        .groupBy("list")
        .agg(F.count("*").alias("n_vecs"))
    )
    cells = read_table(spark, out_dir, "centroids").select(
        F.col("cl").alias("list")
    )
    return (
        cells.join(occ, "list", "left")
        .select("list", F.coalesce("n_vecs", F.lit(0)).cast("long").alias("n_vecs"))
        .orderBy("list")
    )


def compact_ivf_index(spark, out_dir: str) -> int:
    """Fold all generations back into gen=0 — the vector-side analog of the
    doc index's postings compaction: a long-lived index that syncs every
    delivery accumulates one ``gen=N`` directory per batch, and every probe
    pays the per-generation file listing. Compaction rewrites the vectors
    table (same rows, same cells, payload unchanged) as a single generation
    through the crash-atomic facade swap; centroids/quantizer are untouched
    (they are fixed constants of the index). ``merged_srcs`` is RETAINED —
    every folded batch is still merged, so its tag must keep no-opping on
    replay — and only ``next_gen`` resets. Returns the generations folded.

    Concurrency contract: compaction is a MAINTENANCE operation under the
    same single-writer assumption as the doc index's compact_index — the
    swap replaces every vectors file, so a probe running concurrently from
    an already-attached reader can hit FileNotFound mid-scan and must
    re-open (the reader re-attaches on its next call once params change).
    Crash-wise the window between the swap and the params rewrite is benign:
    old tags still no-op and a new sync appends past the stale next_gen
    without touching gen=0."""
    from . import vecindex

    return vecindex.compact_generations(spark, out_dir, _ivf_spec())


def ivf_index_topk(
    spark, out_dir: str, query_vec, k: int = 10, nprobe: int | None = None
) -> DataFrame:
    """One-shot probe of a persisted IVF index (functional wrapper around
    :class:`IvfIndexReader` for callers without a long-lived handle)."""
    return IvfIndexReader(spark, out_dir).topk(query_vec, k=k, nprobe=nprobe)


def tune_ivf_index(spark, out_dir: str, n_queries: int = 8, k: int = 10) -> dict:
    """Sweep nprobe and record recall@k vs brute force — the IVF analog of
    the reference's `index tune` nprobe sweep (Makefile:31-32), twin of
    similarity.tune_ann_index. Sample queries are the index's own n_queries
    lowest-vec_id vectors (deterministic, no external data; on an SQ8 index
    the stored codes are reconstructed — the sweep measures the quantizer's
    own geometry); the sweep walks nprobe = 1, 2, 4, … and stops at the
    first width reaching recall 1.0 — guaranteed to terminate, since
    nprobe = n_lists probes every cell and IS the exhaustive scan (the
    ground truth in both storage modes). The chosen nprobe and the sweep
    land in ivf_params.json, which :meth:`IvfIndexReader.topk` reads as its
    default."""
    import pandas as pd

    reader = IvfIndexReader(spark, out_dir)
    p = reader.params
    payload = reader._payload_col()
    qrows = (
        reader.vectors.select("vec_id", "list", payload)
        .orderBy("vec_id")
        .limit(n_queries)
        .collect()
    )
    qmat = _matrix_fn(reader.quant, reader.centroids)(
        pd.DataFrame(
            {payload: [r[payload] for r in qrows], "list": [r["list"] for r in qrows]}
        )
    )
    # positional query ids (0..n-1), NOT raw vec_ids: topk_many's query_id
    # column is int32 and production vec_ids can exceed it
    qvecs = {i: [float(x) for x in qmat[i]] for i in range(len(qrows))}
    n_lists = int(p["n_lists"])

    def _topk_sets(nprobe: int) -> dict[int, set[int]]:
        # ONE topk_many job answers every sample query at this width
        # (rank-identical to per-query topk, tested) — the sweep runs
        # O(log n_lists) jobs total instead of n_queries × widths
        out: dict[int, set[int]] = {qid: set() for qid in qvecs}
        for row in reader.topk_many(qvecs, k=k, nprobe=nprobe).collect():
            out[int(row["query_id"])].add(row["vec_id"])
        return out

    truth = _topk_sets(n_lists)  # full probe = exhaustive scan
    sweep: dict[str, float] = {}
    chosen = n_lists
    nprobe = 1
    while True:
        nprobe = min(nprobe, n_lists)
        got = _topk_sets(nprobe)
        hits = sum(len(got[qid] & truth[qid]) for qid in qvecs)
        total = sum(len(truth[qid]) for qid in qvecs)
        recall = round(hits / total, 4) if total else 1.0
        sweep[str(nprobe)] = recall
        if recall >= 1.0 or nprobe >= n_lists:
            chosen = nprobe
            break
        nprobe *= 2
    p["nprobe"] = int(chosen)
    p["tune_recall_at_k"] = {"k": k, "n_queries": len(qrows), "sweep": sweep}
    # hot-cell skew disclosure (r5 verdict #7): cell occupancy IS the
    # probe-cost variance — a probe reads its cells' rows, so a hot cell is
    # a hot probe (the trained-IVF analog of the documented postings skew).
    # One narrow groupBy at tune time; recorded so operators see the ratio
    # without running a job.
    occ = np.asarray(
        [int(r["n_vecs"]) for r in ivf_cell_stats(spark, out_dir).collect()],
        dtype=np.int64,
    )
    nz = occ[occ > 0]
    med = float(np.median(nz)) if nz.size else 0.0
    p["cell_occupancy"] = {
        "n_cells": int(occ.size),
        "n_empty": int((occ == 0).sum()),
        "max": int(occ.max()) if occ.size else 0,
        "median_nonempty": med,
        "max_over_median": round(float(occ.max()) / med, 2) if med else None,
    }
    _write_ivf_params(out_dir, p)
    return p
