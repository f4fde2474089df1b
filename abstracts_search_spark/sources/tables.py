"""Table facade (SURVEY.md §7d): every index artifact goes through
``read_table`` / ``commit`` so the storage layer is swappable by config.

Two backends:

- **parquet** (default, what this sandbox runs): plain directories under the
  index root. ``commit(mode="overwrite")`` is made crash-atomic with a
  write-to-temp-then-swap protocol (write ``<name>.__tmp`` → move the live
  dir to ``<name>.__old`` → rename temp into place → drop ``__old``); a crash
  at any step leaves either the old or the new complete table, and
  ``read_table`` knows how to roll back the one ambiguous window (live dir
  missing, ``__old`` present). Appends stay plain appends — the build's
  per-partition scrub + lineage-last ordering already make them idempotent
  (plans/build.py), which is this engine's `make recover` contract
  (/root/reference/Makefile:98-101).
- **iceberg**: when ``SPARK_GRAFT_TABLE_FORMAT=iceberg`` (and an Iceberg
  catalog is on the session), tables are read/written through the catalog and
  every commit is an Iceberg snapshot — the reference's atomic grouped-target
  commit (`&:` in Makefile:24,31) done properly. The runtime jars are not in
  this sandbox, so the branch is config-gated and errors out loudly rather
  than silently falling back.

``_FAIL_AFTER`` is a test-only crash-injection hook: set it to a table name
and the facade raises immediately after that table's commit completes —
tests/test_tables.py uses it to prove rerun-convergence around every write
boundary.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

# test hook: name of the table AFTER whose commit a simulated crash fires
_FAIL_AFTER: str | None = None


class InjectedCrash(RuntimeError):
    """Raised by the crash-injection hook (never in production paths)."""


def _backend() -> str:
    return os.environ.get("SPARK_GRAFT_TABLE_FORMAT", "parquet")


def _iceberg_table(root: str, name: str) -> str:
    # the index root maps to a namespace; catalog name from the env flip
    cat = os.environ.get("SPARK_GRAFT_ICEBERG_CATALOG", "spark_catalog")
    ns = os.path.basename(os.path.normpath(root)).replace("-", "_").replace(".", "_")
    return f"{cat}.{ns}.{name}"


def heal_table(root: str, name: str) -> None:
    """Roll back the one ambiguous crash window of the swap protocol: a
    previous overwrite moved the live table aside (``<name>.__old``) and
    died before renaming the new one in. ``read_table`` calls this on every
    read; writers that touch a table's DIRECTORY without reading it first
    (generation scrubs, appends) must call it themselves, or a post-crash
    append would create a fresh table next to the stranded ``__old`` and the
    rollback would never run again."""
    if _backend() == "iceberg":
        return
    path = os.path.join(root, name)
    old = path + ".__old"
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)


def read_table(spark: SparkSession, root: str, name: str) -> DataFrame:
    """Read one index artifact table. Partition columns (bucket=…, src_part=…)
    are recovered from the directory layout via basePath."""
    if _backend() == "iceberg":
        return spark.read.table(_iceberg_table(root, name))
    heal_table(root, name)
    path = os.path.join(root, name)
    return spark.read.option("basePath", path).parquet(path)


def table_exists(root: str, name: str) -> bool:
    if _backend() == "iceberg":
        raise NotImplementedError("iceberg backend requires catalog jars not in this sandbox")
    path = os.path.join(root, name)
    if not os.path.exists(path) and os.path.exists(path + ".__old"):
        return True
    return os.path.exists(path) and any(
        f.endswith(".parquet") or f.startswith(("part=", "bucket=", "src_part="))
        for f in os.listdir(path)
    )


def commit(
    df: DataFrame,
    root: str,
    name: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    repartition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    compression: str | None = None,
    row_group_bytes: int | None = None,
) -> None:
    """Write one index artifact table.

    ``repartition_by`` co-partitions the write with the directory layout (one
    file per partition dir — file count is driver-serial cost); ``sort_by``
    orders rows within files so parquet row-group min/max stats prune reads.
    ``compression`` overrides the parquet codec — posting/segment blobs are
    already-varint-packed high-entropy bytes, so general-purpose compression
    wastes CPU + memory bandwidth for near-zero ratio; those tables pass
    "uncompressed". ``row_group_bytes`` sets parquet.block.size — postings
    use small row groups so the pushed In(term_id,…) predicate prunes at
    row-group granularity inside each bucket file (the reference controls
    the same knob: --row-group-size, /root/reference/Makefile:48).
    """
    out = df
    if repartition_by:
        out = out.repartition(*repartition_by)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)

    if _backend() == "iceberg":
        writer = out.writeTo(_iceberg_table(root, name))
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        _maybe_crash(name)
        return

    path = os.path.join(root, name)
    if mode == "append":
        writer = out.write.mode("append")
        if compression:
            writer = writer.option("compression", compression)
        if row_group_bytes:
            writer = writer.option("parquet.block.size", str(row_group_bytes))
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        _maybe_crash(name)
        return

    # crash-atomic overwrite: tmp → swap → drop old
    tmp, old = path + ".__tmp", path + ".__old"
    for d in (tmp, old):
        if os.path.exists(d):
            shutil.rmtree(d)
    writer = out.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    if row_group_bytes:
        writer = writer.option("parquet.block.size", str(row_group_bytes))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)
    _maybe_crash(name)


def _maybe_crash(name: str) -> None:
    if _FAIL_AFTER == name:
        raise InjectedCrash(f"injected crash after committing '{name}'")
