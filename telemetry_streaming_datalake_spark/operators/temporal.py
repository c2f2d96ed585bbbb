"""Gold stage: SCD2 temporal (interval / as-of) join and dimension
enrichment.

Reference semantics (``Gold state/Step 04-04b - Gold Phase Raw and
custom metric.scala:65-80``): each silver record finds its remote by
probing the modem-history interval table with
``serial = Serial AND AddedOn <= ts AND (RemovedOn IS NULL OR ts <
RemovedOn)``, then joins agg-type and provider dims, drops private
remotes, and splits the value into ``value_double`` (Decimal for
SUM/AVG metrics) vs ``value_string``.

Spark-first shape: the history table is dimension-sized (a few rows per
serial), so we broadcast it; the range predicate rides along inside the
same BroadcastHashJoin on the ``serial`` equi-key — the 100 TB fact
side is never shuffled and no cartesian/range explosion is possible
because intervals per serial are disjoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


from telemetry_streaming_datalake_spark.datamodel import REMOTE_HISTORY_CTE
from telemetry_streaming_datalake_spark.ingest.bronze import BRONZE_PARSE_ORACLE
from telemetry_streaming_datalake_spark.ingest.silver import SILVER_ORACLE_TEMPLATE


def enrich_gold(silver: DataFrame, history: DataFrame) -> DataFrame:
    """Temporal join to resolve remote_id + typed value split.

    Output is the ``Metric-gold-raw`` analog: one row per silver record
    that maps to a non-private remote whose interval contains the
    event's timestamp.
    """
    h = F.broadcast(history)
    cond = (
        (silver["serial"].cast("bigint") == history["serial"])
        & (silver["unix_ts"] >= history["added_on"])
        & (history["removed_on"].isNull() | (silver["unix_ts"] < history["removed_on"]))
    )
    joined = silver.join(h, cond).filter(~history["is_private"])
    return joined.select(
        silver["event_id"],
        silver["serial"],
        history["remote_id"],
        silver["unix_ts"],
        silver["datestamp"],
        silver["hourstamp"],
        silver["metric"],
        silver["metric_id"],
        silver["provider_id"],
        silver["category_id"],
        silver["agg_type"],
        # The reference casts to Decimal(30,15) here; double→decimal
        # widening is engine-specific (shortest-repr vs exact binary),
        # so this engine standardizes on double rounded to 6 — ample
        # for telemetry readings and bit-stable across engines.
        F.when(
            F.col("agg_type").isin("SUM", "AVG"),
            F.round(silver["value"], 6),
        ).alias("value_double"),
        F.when(
            ~F.col("agg_type").isin("SUM", "AVG"),
            silver["value"].cast("string"),
        ).alias("value_string"),
    )


def silver_oracle() -> str:
    """Composed DuckDB CTE chain: bronze → dedup → silver."""
    return SILVER_ORACLE_TEMPLATE.format(bronze=BRONZE_PARSE_ORACLE)


#: Gold oracle on top of the silver chain.  value_double mirrors the
#: Decimal(30,15) cast; value_string only for non-SUM/AVG metrics.
GOLD_ORACLE = (
    "WITH silver AS ("
    + silver_oracle()
    + "), "
    + REMOTE_HISTORY_CTE.strip().lstrip()
    + """
SELECT
    s.event_id, s.serial, h.remote_id, s.unix_ts, s.datestamp, s.hourstamp,
    s.metric, s.metric_id, s.provider_id, s.category_id, s.agg_type,
    CASE WHEN s.agg_type IN ('SUM','AVG')
         THEN round(s.value, 6) END               AS value_double,
    CASE WHEN s.agg_type NOT IN ('SUM','AVG')
         THEN CAST(s.value AS VARCHAR) END        AS value_string
FROM silver s
JOIN remote_history h
  ON CAST(s.serial AS BIGINT) = h.serial
 AND s.unix_ts >= h.added_on
 AND (h.removed_on IS NULL OR s.unix_ts < h.removed_on)
WHERE NOT h.is_private
"""
)
