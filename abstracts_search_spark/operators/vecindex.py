"""Shared lifecycle for the persisted vector indexes (LSH + trained IVF).

``operators/similarity.py`` (hashed LSH buckets) and ``operators/ivf.py``
(trained k-means cells) persist the same artifact shape — a generation-
partitioned ``vectors`` table under two-level pruning directories plus a
params-json completeness marker — and until round 6 each carried its own
copy of the lifecycle: atomic marker writes, the sync tag-replay /
empty-batch / dimension guards, orphan-generation scrub, compaction, and
reader staleness. One format bump applied to only one twin would have
diverged two contracts that are tested to behave identically (r5 verdict
item 8); this module is the single implementation both now call.

Family-specific bits (params filename, format stamp, partition/sort
columns, builder name for error messages) are a small ``VecIndexSpec``.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class VecIndexSpec:
    """Per-family constants of the shared vector-index lifecycle."""

    kind: str            # "ANN" | "IVF" — error-message prefix
    params_file: str     # "ann_params.json" | "ivf_params.json"
    format_version: int  # current on-disk format stamp
    part_col: str        # directory key within a generation (bgroup/lgroup)
    sort_col: str        # row-group pruning sort key (bucket/list)
    builder: str         # rebuild entry point named in error messages


def params_path(out_dir: str, spec: VecIndexSpec) -> str:
    return os.path.join(out_dir, spec.params_file)


def read_params(out_dir: str, spec: VecIndexSpec) -> dict:
    with open(params_path(out_dir, spec)) as f:
        return json.load(f)


def write_params(out_dir: str, spec: VecIndexSpec, params: dict) -> None:
    """Atomic marker write (ADVICE r5): tmp + os.replace — a crash mid-write
    leaves the previous complete marker, never truncated JSON."""
    path = params_path(out_dir, spec)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(params, f)
    os.replace(tmp, path)


def check_format(p: dict, out_dir: str, spec: VecIndexSpec, appending: bool = False) -> None:
    """Format-stamp gate: stale dirs fail with a rebuild message instead of
    an opaque read error on a column the old layout lacks."""
    if p.get("format") != spec.format_version:
        tail = " before appending generations" if appending else ""
        raise ValueError(
            f"{spec.kind} index at {out_dir} is format {p.get('format')} "
            f"(current {spec.format_version}); rebuild with {spec.builder}{tail}"
        )


def scrub_orphan_generations(out_dir: str, next_gen: int) -> None:
    """Remove generation dirs at/past the params marker — output of a sync
    that crashed before its params rewrite. Shared by sync (before
    re-appending) and compact (an orphan folded into gen=0 would become a
    permanent untracked batch whose tag-replay then DUPLICATES every row).
    Also heals a crashed overwrite's ``vectors.__old`` first — an append
    would otherwise strand the entire old corpus."""
    from ..sources.tables import heal_table

    heal_table(out_dir, "vectors")
    vec_root = os.path.join(out_dir, "vectors")
    if os.path.exists(vec_root):
        for d in os.listdir(vec_root):
            if d.startswith("gen=") and int(d.split("=", 1)[1]) >= next_gen:
                shutil.rmtree(os.path.join(vec_root, d))


def sync_generation(
    new_emb: DataFrame,
    out_dir: str,
    spec: VecIndexSpec,
    src_tag: str,
    vec_col: str,
    make_rows,
) -> bool:
    """Append a NEW vector batch as the next generation under the shared
    crash-replay contract: a ``src_tag`` already recorded in the params is a
    no-op (replay of a committed batch), an EMPTY batch never consumes the
    tag (its real content may arrive later under the same identity), NULL
    vectors and dimension mismatches fail loudly, and orphaned generations
    are scrubbed before re-appending so replays converge.

    ``make_rows(params, next_gen) -> DataFrame`` supplies the family's
    assigned rows (bucketize / centroid-assign + optional quantize).
    Returns True if a generation was appended."""
    from ..sources.tables import commit

    p = read_params(out_dir, spec)
    check_format(p, out_dir, spec, appending=True)
    if src_tag in p["merged_srcs"]:
        return False  # replay of an already-committed batch
    first = new_emb.select(vec_col).first()
    if first is None:
        return False  # empty batch must not consume the tag
    if first[0] is None:
        raise ValueError(
            f"sync_{spec.kind.lower()}_index: batch has a NULL {vec_col} — "
            "clean the delivery before syncing"
        )
    if len(first[0]) != int(p["dim"]):
        raise ValueError(
            f"sync_{spec.kind.lower()}_index: batch dimension {len(first[0])} "
            f"!= index dimension {p['dim']} — wrong embeddings table for "
            "this index"
        )
    next_gen = int(p["next_gen"])
    scrub_orphan_generations(out_dir, next_gen)
    commit(make_rows(p, next_gen), out_dir, "vectors", mode="append",
           partition_by=["gen", spec.part_col], repartition_by=[spec.part_col],
           sort_by=[spec.sort_col], row_group_bytes=1 << 20)
    p["merged_srcs"] = p["merged_srcs"] + [src_tag]
    p["next_gen"] = next_gen + 1
    write_params(out_dir, spec, p)  # marker LAST
    return True


def compact_generations(spark, out_dir: str, spec: VecIndexSpec) -> int:
    """Fold all generations back into gen=0: same rows, same cells/buckets,
    one generation of directories afterwards, crash-atomic via the facade
    swap. ``merged_srcs`` is RETAINED — every folded batch is still merged,
    so its tag must keep no-opping on replay — and only ``next_gen``
    resets. Orphaned generations are scrubbed FIRST (folding one in would
    make it a permanent untracked batch that replay then duplicates).

    Single-writer maintenance operation: a probe running concurrently from
    an already-attached reader can hit FileNotFound mid-scan and must
    re-open; the crash window between the swap and the params rewrite is
    benign (old tags still no-op, a new sync appends past the stale
    next_gen without touching gen=0). Returns the generations folded."""
    from pyspark.sql import functions as F

    from ..sources.tables import commit, read_table

    p = read_params(out_dir, spec)
    check_format(p, out_dir, spec)
    n_gens = int(p["next_gen"])
    if n_gens <= 1:
        return 0  # single generation — nothing to fold
    scrub_orphan_generations(out_dir, n_gens)
    vectors = read_table(spark, out_dir, "vectors")
    folded = vectors.withColumn("gen", F.lit(0).cast("int"))
    commit(folded, out_dir, "vectors", partition_by=["gen", spec.part_col],
           repartition_by=[spec.part_col], sort_by=[spec.sort_col],
           row_group_bytes=1 << 20)
    p["next_gen"] = 1
    write_params(out_dir, spec, p)
    return n_gens


class Staleness:
    """Reader staleness protocol shared by AnnIndexReader / IvfIndexReader:
    the params marker is rewritten LAST by every sync/tune/compaction, so
    its (mtime_ns, size) is a complete change signal — one cheap stat() per
    query, re-``_attach`` on change (table handles must be re-created too:
    a DataFrame's file index is frozen at read time, so a new gen=G dir is
    invisible to old handles)."""

    index_dir: str
    _spec: VecIndexSpec
    _sig: tuple[int, int] | None

    def _signature(self) -> tuple[int, int]:
        st = os.stat(params_path(self.index_dir, self._spec))
        return (st.st_mtime_ns, st.st_size)

    def _refresh_if_stale(self) -> None:
        if self._signature() != self._sig:
            self._attach()
