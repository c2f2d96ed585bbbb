"""Custom-metric derivation: mapping-driven SUM rollup and JOIN pairing.

Reference semantics:

- mappingType ``SUM`` (``Gold state/Step 04-04b ….scala:182-193``):
  a custom metric id maps to several constituent kymeta metric ids;
  constituent gold rows are summed per (unixTimestamp, remoteId,
  metricProviderId, categoryId) into a synthetic gold row carrying the
  custom metric id, value cast Decimal(30,15).
- mappingType ``JOIN`` (``Gold state/Step 06c - write custom join
  metrics to cosmos.scala``): two constituent metrics are paired at the
  same (remote, bucket) into one document (here: purchase vs click per
  remote per day → ratio).

Both are broadcast joins against the tiny custommetrics dim plus one
hash aggregation — no extra shuffles beyond the unavoidable groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from telemetry_streaming_datalake_spark.datamodel import CUSTOM_METRIC_CTE
from telemetry_streaming_datalake_spark.operators.derived import floor_round


def custom_metric_sum(gold: DataFrame, custom_mapping: DataFrame) -> DataFrame:
    """SUM-type custom metrics."""
    m = F.broadcast(custom_mapping.filter(F.col("mapping_type") == "SUM"))
    joined = gold.join(m, gold["metric_id"] == m["mapping_metric_id"])
    return (
        joined.groupBy("unix_ts", "remote_id", "provider_id", "category_id", "custom_metric_id")
        .agg(floor_round(F.sum(F.col("value_double").cast("double")), 6).alias("value_double"))
        .withColumnRenamed("custom_metric_id", "metric_id")
    )


def custom_metric_join(gold: DataFrame, custom_mapping: DataFrame) -> DataFrame:
    """JOIN-type custom metric: pair two constituent metrics per
    (remote, day) — conditional aggregation, not a self-join, so the
    fact table is scanned once and shuffled once."""
    m = F.broadcast(custom_mapping.filter(F.col("mapping_type") == "JOIN"))
    joined = gold.join(m, gold["metric_id"] == m["mapping_metric_id"])
    v = F.col("value_double").cast("double")
    return (
        joined.groupBy("remote_id", "datestamp", "custom_metric_id")
        .agg(
            floor_round(F.sum(F.when(F.col("metric") == "purchase", v)), 6).alias("purchase_value"),
            floor_round(F.sum(F.when(F.col("metric") == "click", v)), 6).alias("click_value"),
        )
        .withColumn(
            "pair_ratio",
            floor_round(
                F.when(
                    F.col("click_value").isNotNull() & (F.col("click_value") != 0),
                    F.col("purchase_value") / F.col("click_value"),
                ),
                6,
            ),
        )
        .withColumnRenamed("custom_metric_id", "metric_id")
    )


def custom_metric_sum_oracle(gold_cte: str) -> str:
    return (
        f"WITH gold AS ({gold_cte}), "
        + CUSTOM_METRIC_CTE.strip()
        + """
SELECT unix_ts, remote_id, provider_id, category_id,
       custom_metric_id AS metric_id,
       floor(sum(CAST(value_double AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS value_double
FROM gold g
JOIN custom_metric_mapping m
  ON g.metric_id = m.mapping_metric_id AND m.mapping_type = 'SUM'
GROUP BY ALL
"""
    )


def custom_metric_join_oracle(gold_cte: str) -> str:
    return (
        f"WITH gold AS ({gold_cte}), "
        + CUSTOM_METRIC_CTE.strip()
        + """
SELECT remote_id, datestamp, custom_metric_id AS metric_id,
       floor(sum(CASE WHEN metric = 'purchase' THEN CAST(value_double AS DOUBLE) END) * 1000000.0 + 0.5) / 1000000.0 AS purchase_value,
       floor(sum(CASE WHEN metric = 'click'    THEN CAST(value_double AS DOUBLE) END) * 1000000.0 + 0.5) / 1000000.0 AS click_value,
       floor(CASE WHEN sum(CASE WHEN metric = 'click' THEN CAST(value_double AS DOUBLE) END) <> 0
             THEN (floor(sum(CASE WHEN metric = 'purchase' THEN CAST(value_double AS DOUBLE) END) * 1000000.0 + 0.5) / 1000000.0)
                / (floor(sum(CASE WHEN metric = 'click'    THEN CAST(value_double AS DOUBLE) END) * 1000000.0 + 0.5) / 1000000.0)
             END * 1000000.0 + 0.5) / 1000000.0 AS pair_ratio
FROM gold g
JOIN custom_metric_mapping m
  ON g.metric_id = m.mapping_metric_id AND m.mapping_type = 'JOIN'
GROUP BY ALL
"""
    )
