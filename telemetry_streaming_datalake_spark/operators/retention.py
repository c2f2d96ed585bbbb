"""Retention purge and compaction.

Reference semantics: ``Set Up Delta Tables/Purge old data from delta
tables.scala`` (``delete from <table> where Datestamp < 'cutoff'``) and
``Gold Aggregation/Auto Optimization.scala`` (OPTIMIZE/compaction).

Without Delta in this environment the purge is expressed the way a
parquet lake does it: keep-side filter + date-partitioned rewrite.
Because every table in this engine is partitioned by ``datestamp``,
the filter is *partition pruning* — at 100 TB the purge never reads a
byte of the partitions it drops (``.explain`` shows the pruned scan).
Compaction = per-partition repartition to a target file count.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def purge_keep(df: DataFrame, cutoff_datestamp: str) -> DataFrame:
    """Rows that survive ``delete where datestamp < cutoff``."""
    return df.filter(F.col("datestamp") >= cutoff_datestamp)


def purge_rewrite(df: DataFrame, cutoff_datestamp: str, path: str) -> None:
    """Materialize the purge as a date-partitioned parquet rewrite."""
    (
        purge_keep(df, cutoff_datestamp)
        .write.mode("overwrite")
        .partitionBy("datestamp")
        .parquet(path)
    )


def _partition_cols_of(path: str) -> list[str]:
    """Hive-layout partition columns of a parquet directory, read off
    the directory names (``col=value`` levels, outermost first)."""
    cols: list[str] = []
    cur = path
    while True:
        subdirs = [
            d
            for d in os.listdir(cur)
            if "=" in d and os.path.isdir(os.path.join(cur, d))
        ]
        if not subdirs:
            return cols
        cols.append(subdirs[0].split("=", 1)[0])
        cur = os.path.join(cur, subdirs[0])


def compact(spark: SparkSession, path: str, target_file_mb: int = 128) -> None:
    """OPTIMIZE-analog: rewrite a parquet directory into ~target-sized
    files.  File count is derived from the on-disk bytes, mirroring
    what Delta's OPTIMIZE bin-packing converges to.

    Partition layout is PRESERVED: a datestamp-partitioned lake must
    come out datestamp-partitioned, or every downstream partition-
    pruned read (``purge_keep``'s PartitionFilters pin) degrades to a
    full scan.  The swap is rename-based — the old copy stays intact
    on disk until the compacted rewrite is fully written, so a crash
    at any point leaves a complete copy under either the live path or
    the staging suffix (the in-place overwrite this replaces deleted
    the only full copy first)."""
    import shutil

    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files if f.endswith(".parquet"))
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    parts = _partition_cols_of(path)
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    writer = df.repartition(n_files, *parts) if parts else df.repartition(n_files)
    w = writer.write.mode("overwrite")
    if parts:
        w = w.partitionBy(*parts)
    w.parquet(tmp)
    old = path.rstrip("/") + "__precompact"
    shutil.rmtree(old, ignore_errors=True)  # stale leftover of a crash
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


def zorder_value(col_a, col_b, bits: int = 16):
    """Morton (Z-order) interleave of two columns, each min-max scaled
    to ``bits`` bits by the caller: bit i of a lands at position 2i,
    bit i of b at 2i+1.  Pure shift/and/or arithmetic — whole-stage
    codegen, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftrightunsigned(col_a, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(F.shiftleft(F.shiftrightunsigned(col_b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        )
    return z


def zorder_rewrite(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """OPTIMIZE ZORDER analog: rewrite ``df`` sorted by the Morton
    interleave of two filter columns so every output file covers a
    narrow range of BOTH — parquet min/max footer stats then let any
    reader skip most files for a predicate on either column (Delta's
    ZORDER rationale, on plain parquet).

    Min-max scaling bounds come from one tiny agg (4 scalars to the
    driver); the rewrite itself is ``repartitionByRange`` on the
    z-value — a single range shuffle, the same cost as any sort-write.
    ``tests/test_retention.py`` measures the per-file stat ranges.
    """
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    span = (1 << bits) - 1

    def scaled(c, lo, hi):
        width = max(int(hi) - int(lo), 1)
        return ((F.col(c).cast("long") - F.lit(int(lo))) * span / width).cast("long")

    z = zorder_value(scaled(col_a, lo_a, hi_a), scaled(col_b, lo_b, hi_b), bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def purge_oracle(source_cte: str, cutoff_datestamp: str) -> str:
    return f"""
WITH src AS ({source_cte})
SELECT * FROM src WHERE datestamp >= '{cutoff_datestamp}'
"""


# --------------------------------------------------------------------------
# OPTIMIZE bin-packing planner
# --------------------------------------------------------------------------

COMPACTION_TARGET_BYTES = 4096
COMPACTION_ROW_BYTES = 64


def compaction_plan(
    bronze: DataFrame,
    target_bytes: int = COMPACTION_TARGET_BYTES,
    row_bytes: int = COMPACTION_ROW_BYTES,
) -> DataFrame:
    """OPTIMIZE planning layer: which small files merge into which
    target-sized bin, per partition — the decision Delta's bin-packing
    OPTIMIZE makes before any rewrite I/O (``Gold Aggregation/Auto
    Optimization.scala`` delegates this to Databricks; :func:`compact`
    is this repo's rewrite executor, this operator is the plan it
    would execute per-partition).

    File model: each (datestamp, hourstamp) micro-batch slice is one
    append-sink file with ``n_rows * row_bytes`` estimated bytes (the
    hourly batch cadence of the reference's trigger).  Packing is
    deterministic first-fit in hourstamp order: a file's bin is
    ``floor(cum_bytes_before / target_bytes)`` — pure window-cumsum
    arithmetic, no driver loop, engine-portable.

    Shape: one partial-agg shuffle to file-cardinality, then a
    per-partition window over file-cardinality rows, then one more
    tiny aggregate to bins.  Output: one row per (datestamp, bin) with
    file count, byte total, and the hourstamp span the rewrite would
    read — ``needs_compaction`` marks multi-file bins.
    """
    from pyspark.sql import Window

    files = (
        bronze.groupBy("datestamp", "hourstamp")
        .agg((F.count(F.lit(1)) * row_bytes).alias("est_bytes"))
    )
    w = (
        Window.partitionBy("datestamp")
        .orderBy("hourstamp")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = files.withColumn(
        "bin",
        F.floor(F.coalesce(F.sum("est_bytes").over(w), F.lit(0)) / target_bytes),
    )
    return binned.groupBy("datestamp", "bin").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("est_bytes").alias("bin_bytes"),
        F.min("hourstamp").alias("first_hour"),
        F.max("hourstamp").alias("last_hour"),
        (F.count(F.lit(1)) > 1).alias("needs_compaction"),
    )


def compaction_plan_oracle(
    bronze_sql: str,
    target_bytes: int = COMPACTION_TARGET_BYTES,
    row_bytes: int = COMPACTION_ROW_BYTES,
) -> str:
    return f"""
WITH bronze AS ({bronze_sql}),
files AS (
    SELECT datestamp, hourstamp, count(*) * {row_bytes} AS est_bytes
    FROM bronze GROUP BY 1, 2
),
binned AS (
    SELECT datestamp, hourstamp, est_bytes,
           CAST(floor(coalesce(sum(est_bytes) OVER (
               PARTITION BY datestamp ORDER BY hourstamp
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) / {target_bytes}) AS BIGINT) AS bin
    FROM files
)
SELECT datestamp, bin,
       count(*) AS n_files,
       CAST(sum(est_bytes) AS BIGINT) AS bin_bytes,
       min(hourstamp) AS first_hour,
       max(hourstamp) AS last_hour,
       count(*) > 1 AS needs_compaction
FROM binned
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# ZORDER layout audit (driver-checkable twin of zorder_rewrite)
# --------------------------------------------------------------------------

ZORDER_BITS = 16
ZORDER_FILES = 16


def zorder_layout(
    bronze: DataFrame, n_files: int = ZORDER_FILES, bits: int = ZORDER_BITS
) -> DataFrame:
    """The ZORDER file layout as a relation: every row Morton-keyed on
    (unix_ts, quantized value), assigned to an equal-width z-range file
    bucket, summarized to per-file footer stats — the min/max ranges a
    reader's skipping decision would use (what ``zorder_rewrite``
    materializes physically; ``tests/test_retention.py`` proves the
    physical variant skips).

    Engine-portable arithmetic end to end: min-max scaling is exact
    integer ``(x - lo) * span div width`` (both operands non-negative,
    so Spark ``div`` == DuckDB ``//``), the interleave is pure
    shift/and bit math (disjoint bits, so OR == sum — the oracle uses
    +), and the file bucket is an equal-width z-range.  All map-side
    after one 4-scalar bounds aggregate broadcasts back; the per-file
    summary is one partial-agg shuffle to ``n_files`` rows.  No global
    sort anywhere (the physical rewrite uses ``repartitionByRange``,
    never a window).
    """
    vq = F.floor(F.col("value") * 1000).cast("long")
    bounds = bronze.agg(
        F.min("unix_ts").alias("lo_a"), F.max("unix_ts").alias("hi_a"),
        F.min(vq).alias("lo_b"), F.max(vq).alias("hi_b"),
    )
    span = (1 << bits) - 1
    j = bronze.select("unix_ts", vq.alias("vq")).crossJoin(F.broadcast(bounds))
    a = F.expr(
        f"((unix_ts - lo_a) * {span}) div greatest(hi_a - lo_a, 1L)"
    ).cast("long")
    b = F.expr(f"((vq - lo_b) * {span}) div greatest(hi_b - lo_b, 1L)").cast("long")
    z = zorder_value(a, b, bits)
    z_cells = 1 << (2 * bits)
    file_id = F.least(
        F.lit(n_files - 1), F.floor(z * n_files / z_cells)
    ).cast("long")
    return (
        j.withColumn("file_id", file_id)
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("unix_ts").alias("min_ts"),
            F.max("unix_ts").alias("max_ts"),
            F.min("vq").alias("min_vq"),
            F.max("vq").alias("max_vq"),
        )
    )


def zorder_layout_oracle(
    bronze_sql: str, n_files: int = ZORDER_FILES, bits: int = ZORDER_BITS
) -> str:
    span = (1 << bits) - 1
    z_cells = 1 << (2 * bits)
    terms = []
    for i in range(bits):
        terms.append(f"((((a >> {i}) & 1) << {2 * i}))")
        terms.append(f"((((b >> {i}) & 1) << {2 * i + 1}))")
    morton = " + ".join(terms)
    return f"""
WITH bronze AS ({bronze_sql}),
q AS (
    SELECT unix_ts, CAST(floor(value * 1000) AS BIGINT) AS vq FROM bronze
),
bounds AS (
    SELECT min(unix_ts) AS lo_a, max(unix_ts) AS hi_a,
           min(vq) AS lo_b, max(vq) AS hi_b
    FROM q
),
scaled AS (
    SELECT ((unix_ts - lo_a) * {span}) // greatest(hi_a - lo_a, 1) AS a,
           ((vq - lo_b) * {span}) // greatest(hi_b - lo_b, 1) AS b,
           unix_ts, vq
    FROM q, bounds
),
keyed AS (
    SELECT unix_ts, vq,
           least({n_files - 1},
                 CAST(floor(({morton}) * {n_files} / {z_cells}.0) AS BIGINT))
               AS file_id
    FROM scaled
)
SELECT file_id, count(*) AS n_rows,
       min(unix_ts) AS min_ts, max(unix_ts) AS max_ts,
       min(vq) AS min_vq, max(vq) AS max_vq
FROM keyed
GROUP BY 1
"""
