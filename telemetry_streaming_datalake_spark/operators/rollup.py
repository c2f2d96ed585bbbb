"""Time-bucketed rollups: Hour / Day / Month sum/avg/min/max.

Reference semantics (``Gold Aggregation/Step 05 - Metric aggregates by
Day, Month. Hour ….scala:91-101, 139-149, 194-205``): the gold-raw
stream is bucketed (unix ts truncated to hour / day; month via the
datestamp prefix), filtered to SUM/AVG metrics with non-zero values,
grouped by (bucket, remoteId, kymetaMetricId, metricProviderId,
categoryId) and aggregated with sum/avg/min/max, then given a composite
``id`` — ``remote|bucket|metric|provider|category`` — for the serving
store MERGE.

Spark-first shape: bucket keys are pure integer arithmetic / built-in
date functions (JVM codegen), so the rollup is a single hash shuffle
with map-side partial aggregation — the plan shows
``HashAggregate(partial)`` → Exchange → ``HashAggregate(final)``.
Doubles are rounded to 6 decimals at the output edge so results are
bit-stable across engines and partitionings (summation order varies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GROUP = ("remote_id", "metric_id", "provider_id", "category_id")


def _rollup(gold: DataFrame, bucket_expr, bucket_name: str) -> DataFrame:
    eligible = gold.filter(
        F.col("agg_type").isin("SUM", "AVG") & (F.col("value_double") != 0)
    )
    v = F.col("value_double").cast("double")
    out = (
        eligible.withColumn(bucket_name, bucket_expr)
        .groupBy(bucket_name, *_GROUP)
        .agg(
            F.round(F.sum(v), 6).alias("sum_value"),
            F.round(F.avg(v), 6).alias("avg_value"),
            F.round(F.min(v), 6).alias("min_value"),
            F.round(F.max(v), 6).alias("max_value"),
            F.count(F.lit(1)).alias("n_points"),
        )
    )
    return out.withColumn(
        "id",
        F.concat_ws(
            "|",
            F.col("remote_id").cast("string"),
            F.col(bucket_name).cast("string"),
            F.col("metric_id").cast("string"),
            F.col("provider_id").cast("string"),
            F.col("category_id").cast("string"),
        ),
    )


def rollup_hour(gold: DataFrame) -> DataFrame:
    """Bucket = unix seconds truncated to the hour (exact int arith)."""
    return _rollup(gold, (F.col("unix_ts") - F.col("unix_ts") % 3600), "bucket_ts")


def rollup_day(gold: DataFrame) -> DataFrame:
    return _rollup(gold, (F.col("unix_ts") - F.col("unix_ts") % 86400), "bucket_ts")


def rollup_month(gold: DataFrame) -> DataFrame:
    """Month key is the calendar prefix of the datestamp (string),
    mirroring the reference's ``substring(dateStamp, 0, 7)``."""
    return _rollup(gold, F.substring("datestamp", 1, 7), "bucket_month")


def rollup_oracle(gold_cte: str, bucket_sql: str, bucket_name: str) -> str:
    """DuckDB oracle for any of the three rollups."""
    return f"""
WITH gold AS ({gold_cte})
SELECT
    {bucket_sql} AS {bucket_name},
    remote_id, metric_id, provider_id, category_id,
    round(sum(CAST(value_double AS DOUBLE)), 6) AS sum_value,
    round(avg(CAST(value_double AS DOUBLE)), 6) AS avg_value,
    round(min(CAST(value_double AS DOUBLE)), 6) AS min_value,
    round(max(CAST(value_double AS DOUBLE)), 6) AS max_value,
    count(*) AS n_points,
    CAST(remote_id AS VARCHAR) || '|' || CAST({bucket_sql} AS VARCHAR) || '|' ||
    CAST(metric_id AS VARCHAR) || '|' || CAST(provider_id AS VARCHAR) || '|' ||
    CAST(category_id AS VARCHAR)               AS id
FROM gold
WHERE agg_type IN ('SUM','AVG') AND value_double <> 0
GROUP BY ALL
"""


# --------------------------------------------------------------------------
# incremental rollup maintenance (delta-aggregation merge)
# --------------------------------------------------------------------------


def _partial_hour(gold: DataFrame) -> DataFrame:
    """Unrounded partial aggregates per hour bucket — the mergeable
    form (sum/count/min/max are associative; avg is derived at the
    edge, never merged)."""
    eligible = gold.filter(
        F.col("agg_type").isin("SUM", "AVG") & (F.col("value_double") != 0)
    )
    v = F.col("value_double").cast("double")
    return (
        eligible.withColumn("bucket_ts", F.col("unix_ts") - F.col("unix_ts") % 3600)
        .groupBy("bucket_ts", *_GROUP)
        .agg(
            F.sum(v).alias("p_sum"),
            F.min(v).alias("p_min"),
            F.max(v).alias("p_max"),
            F.count(F.lit(1)).alias("p_n"),
        )
    )


def incremental_rollup_hour(gold: DataFrame, cutoff_unix: int) -> DataFrame:
    """Hour rollup maintained incrementally: the pre-cutoff partials
    (the stored state) merge with the post-cutoff delta — including
    boundary buckets receiving contributions from BOTH sides — and the
    result equals the from-scratch rollup (the SQL oracle).

    This is the reference's production cadence (history backfill +
    per-batch upsert, ``Load History load/*`` + ``Step 05``): the
    serving store keeps associative partials, each increment is one
    partial-agg shuffle over the NEW slice only, and the merge is a
    key-equi full-outer join — O(delta + touched keys), never a
    rescan of history.  Derived columns (avg, rounding) materialize at
    the serving edge so partials stay mergeable.
    """
    base = _partial_hour(gold.filter(F.col("unix_ts") < cutoff_unix))
    delta = _partial_hour(gold.filter(F.col("unix_ts") >= cutoff_unix))
    keys = ["bucket_ts", *_GROUP]
    b = base.select(*keys, *[F.col(c).alias(f"b_{c}") for c in ("p_sum", "p_min", "p_max", "p_n")])
    d = delta.select(*keys, *[F.col(c).alias(f"d_{c}") for c in ("p_sum", "p_min", "p_max", "p_n")])
    m = b.join(d, keys, "full_outer")
    zero = F.lit(0.0)
    merged = m.select(
        *keys,
        (F.coalesce("b_p_sum", zero) + F.coalesce("d_p_sum", zero)).alias("p_sum"),
        F.least(
            F.coalesce("b_p_min", F.col("d_p_min")), F.coalesce("d_p_min", F.col("b_p_min"))
        ).alias("p_min"),
        F.greatest(
            F.coalesce("b_p_max", F.col("d_p_max")), F.coalesce("d_p_max", F.col("b_p_max"))
        ).alias("p_max"),
        (F.coalesce("b_p_n", F.lit(0)) + F.coalesce("d_p_n", F.lit(0))).alias("p_n"),
    )
    out = merged.select(
        "bucket_ts",
        *_GROUP,
        F.round("p_sum", 6).alias("sum_value"),
        F.round(F.col("p_sum") / F.col("p_n"), 6).alias("avg_value"),
        F.round("p_min", 6).alias("min_value"),
        F.round("p_max", 6).alias("max_value"),
        F.col("p_n").alias("n_points"),
    )
    return out.withColumn(
        "id",
        F.concat_ws(
            "|",
            F.col("remote_id").cast("string"),
            F.col("bucket_ts").cast("string"),
            F.col("metric_id").cast("string"),
            F.col("provider_id").cast("string"),
            F.col("category_id").cast("string"),
        ),
    )
