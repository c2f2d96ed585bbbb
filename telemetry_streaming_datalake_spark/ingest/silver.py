"""Silver stage: metric-mapping join and value normalization.

Reference semantics: the exploded name/value metric stream joins the
``metricmappings`` dimension on the raw symbol to attach the canonical
metric id / provider id (``Bronze-Silver/Part1 ….scala:189-204``), and
status-like raw values are normalized to numeric codes with
``when``/``otherwise`` ladders (``Part1 ….scala:160-165``).

The mapping dimension is tiny (it is in the reference too), so the join
is an explicit ``F.broadcast`` — at 100 TB the fact side streams through
map tasks untouched; there is zero shuffle in this stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from telemetry_streaming_datalake_spark.datamodel import METRIC_MAPPING_CTE


def to_silver(bronze_deduped: DataFrame, mapping: DataFrame) -> DataFrame:
    """Attach metric ids and normalize values.

    Normalization rules (mirroring the reference's status ladders):

    - ``signup`` is a status metric: any positive raw value → 1 else 0.
    - ``error`` values are clamped at 0 (the reference drops negative
      rtt readings; we clamp so the row survives for AVG).
    - everything else passes through.
    """
    joined = bronze_deduped.join(F.broadcast(mapping), F.col("metric") == mapping["raw_symbol"])
    value_norm = (
        F.when(F.col("metric") == "signup", F.when(F.col("value") > 0, F.lit(1.0)).otherwise(F.lit(0.0)))
        .when(F.col("metric") == "error", F.greatest(F.col("value"), F.lit(0.0)))
        .otherwise(F.col("value"))
    )
    return joined.select(
        "event_id",
        "serial",
        "metric",
        value_norm.alias("value"),
        "payload_k",
        "unix_ts",
        "datestamp",
        "hourstamp",
        "metric_id",
        "provider_id",
        "agg_type",
        "category_id",
    )


#: DuckDB oracle: identical mapping join + normalization over a deduped
#: bronze CTE (callers compose with BRONZE_PARSE_ORACLE).
SILVER_ORACLE_TEMPLATE = (
    "WITH "
    + METRIC_MAPPING_CTE
    + """,
bronze AS ({bronze}),
deduped AS (
    SELECT * FROM (
        SELECT b.*, row_number() OVER (PARTITION BY unique_hash_key ORDER BY event_id) AS rn
        FROM bronze b
    ) WHERE rn = 1
)
SELECT
    event_id, serial, metric,
    CASE WHEN metric = 'signup' THEN CASE WHEN value > 0 THEN 1.0 ELSE 0.0 END
         WHEN metric = 'error'  THEN greatest(value, 0.0)
         ELSE value END                      AS value,
    payload_k, unix_ts, datestamp, hourstamp,
    metric_id, provider_id, agg_type, category_id
FROM deduped d
JOIN metric_mapping m ON d.metric = m.raw_symbol
"""
)
