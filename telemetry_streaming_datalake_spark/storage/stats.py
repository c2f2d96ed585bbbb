"""Partition-stats index: the Delta/lakehouse data-skipping analog.

Delta (and every modern table format) keeps per-file min/max column
stats in its transaction log so readers can skip files whose range
cannot match a predicate; the reference gets this for free from
Databricks Delta (``Gold Aggregation/Auto Optimization.scala`` tunes
it via OPTIMIZE).  This module computes the same stats table over the
datestamp-partitioned lake and uses it to prune scans.

Scale shape: the stats build is one partial-agg shuffle keyed by the
partition column — output cardinality = number of partitions, i.e.
dimension-sized however big the lake is.  Pruning then intersects the
predicate's value interval with each partition's [min, max] — a
driver-trivial operation on the tiny stats table, never touching data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from telemetry_streaming_datalake_spark.operators.derived import floor_round


def partition_stats(bronze: DataFrame) -> DataFrame:
    """Per-datestamp stats footer: row count, unix_ts / value ranges,
    and the distinct-serial count (exact here; at extreme cardinality
    swap ``approx_count_distinct`` — same plan shape, HLL sketch)."""
    return bronze.groupBy("datestamp").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("unix_ts").alias("min_unix_ts"),
        F.max("unix_ts").alias("max_unix_ts"),
        floor_round(F.min("value"), 6).alias("min_value"),
        floor_round(F.max("value"), 6).alias("max_value"),
        F.count_distinct("serial").alias("n_serials"),
    )


def partition_stats_oracle(bronze_sql: str) -> str:
    return f"""
WITH bronze AS ({bronze_sql})
SELECT datestamp,
       count(*) AS n_rows,
       min(unix_ts) AS min_unix_ts,
       max(unix_ts) AS max_unix_ts,
       floor(min(value) * 1000000.0 + 0.5) / 1000000.0 AS min_value,
       floor(max(value) * 1000000.0 + 0.5) / 1000000.0 AS max_value,
       count(DISTINCT serial) AS n_serials
FROM bronze
GROUP BY datestamp
"""


def prune_by_ts(stats: DataFrame, lo_unix: int, hi_unix: int) -> DataFrame:
    """Partitions whose [min_unix_ts, max_unix_ts] intersects
    [lo, hi) — the file-skipping decision, computed on the stats table
    alone.  Callers pass the surviving datestamps to a partition
    filter (→ partition pruning at the scan, proven in
    ``tests/test_stats.py``)."""
    return stats.filter(
        (F.col("max_unix_ts") >= lo_unix) & (F.col("min_unix_ts") < hi_unix)
    ).select("datestamp")
