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


def compact(spark: SparkSession, path: str, target_file_mb: int = 128) -> None:
    """OPTIMIZE-analog: rewrite a parquet directory into ~target-sized
    files.  File count is derived from the on-disk bytes, mirroring
    what Delta's OPTIMIZE bin-packing converges to."""
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files if f.endswith(".parquet"))
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(path)
    # best-effort cleanup of the staging dir
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


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
