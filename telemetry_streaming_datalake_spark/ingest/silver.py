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


# --------------------------------------------------------------------------
# name/value payload explode — the reference's core silver move
# --------------------------------------------------------------------------

#: regex twin of the from_json extraction: pull the k value straight
#: out of the raw JSON text (the reference normalizes status/version
#: strings with regexp_extract the same way)
PAYLOAD_K_REGEX = r'"k":\s*(-?\d+)'


def explode_metrics(bronze_payload: DataFrame) -> DataFrame:
    """One input record → N metric rows (reference:
    ``Bronze-Silver/Part1 ….scala:170-178`` builds an array of metric
    structs from the parsed payload and ``explode``s it).

    Three readings per record here: the native (metric, value) pair,
    the ``from_json``-struct payload field, and the same field pulled
    by ``regexp_extract`` from the raw JSON text (the regex
    normalization seam).  Null readings are dropped, as the reference
    drops absent payload fields.  Map-only: generate + filter inside
    one codegen stage, no shuffle.
    """
    readings = F.array(
        F.struct(
            F.col("metric").alias("name"), F.col("value").cast("double").alias("reading")
        ),
        F.struct(
            F.lit("payload_k").alias("name"),
            # payload_k (parse_bronze's get_json_object + BIGINT cast)
            # is what the oracle reads (json_extract_string + CAST —
            # the engines agree, including erroring on a non-integer
            # $.k under ANSI; the quarantine router try_casts and
            # routes such records to bad_payload BEFORE bronze, so the
            # strict cast here only ever sees screened feeds);
            # referencing it — not the
            # from_json struct — lets Catalyst PRUNE the from_json
            # evaluation out of this plan entirely (the struct remains
            # on parse_bronze_payload's schema as the reference's
            # explicit-schema seam, costing nothing unless selected)
            F.col("payload_k").cast("double").alias("reading"),
        ),
        F.struct(
            F.lit("payload_k_re").alias("name"),
            F.regexp_extract(F.col("props"), PAYLOAD_K_REGEX, 1)
            .cast("double")
            .alias("reading"),
        ),
    )
    ex = bronze_payload.select(
        "event_id",
        "serial",
        "unix_ts",
        "datestamp",
        "hourstamp",
        F.explode(readings).alias("r"),
    ).filter(F.col("r.reading").isNotNull())
    return ex.select(
        "event_id",
        "serial",
        F.col("r.name").alias("metric"),
        F.col("r.reading").alias("value"),
        "unix_ts",
        "datestamp",
        "hourstamp",
    )


def to_silver_exploded(bronze_payload_deduped: DataFrame, mapping: DataFrame) -> DataFrame:
    """Exploded silver: name/value rows joined to the mapping dim with
    the same normalization ladder as :func:`to_silver`.  The mapping
    broadcast means the exploded fact stream never shuffles."""
    ex = explode_metrics(bronze_payload_deduped)
    joined = ex.join(F.broadcast(mapping), ex["metric"] == mapping["raw_symbol"])
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
        "unix_ts",
        "datestamp",
        "hourstamp",
        "metric_id",
        "provider_id",
        "agg_type",
        "category_id",
    )


def silver_explode_oracle(bronze_payload_sql: str) -> str:
    """DuckDB twin: the explode is expressed as a UNION ALL over the
    deduped payload-bronze (identical row multiset)."""
    from telemetry_streaming_datalake_spark.datamodel import METRIC_MAPPING_CTE

    return (
        "WITH "
        + METRIC_MAPPING_CTE
        + f""",
bronze AS ({bronze_payload_sql}),
deduped AS (
    SELECT * FROM (
        SELECT b.*, row_number() OVER (PARTITION BY unique_hash_key ORDER BY event_id) AS rn
        FROM bronze b
    ) WHERE rn = 1
),
exploded AS (
    SELECT event_id, serial, metric, value, unix_ts, datestamp, hourstamp
    FROM deduped WHERE value IS NOT NULL
    UNION ALL
    SELECT event_id, serial, 'payload_k', CAST(payload_k AS DOUBLE),
           unix_ts, datestamp, hourstamp
    FROM deduped WHERE payload_k IS NOT NULL
    UNION ALL
    SELECT event_id, serial, 'payload_k_re',
           CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS DOUBLE),
           unix_ts, datestamp, hourstamp
    FROM deduped
    WHERE regexp_extract(props, '"k":\\s*(-?\\d+)', 1) IS NOT NULL
      AND regexp_extract(props, '"k":\\s*(-?\\d+)', 1) <> ''
)
SELECT
    e.event_id, e.serial, e.metric,
    CASE WHEN e.metric = 'signup' THEN CASE WHEN e.value > 0 THEN 1.0 ELSE 0.0 END
         WHEN e.metric = 'error'  THEN greatest(e.value, 0.0)
         ELSE e.value END                    AS value,
    e.unix_ts, e.datestamp, e.hourstamp,
    m.metric_id, m.provider_id, m.agg_type, m.category_id
FROM exploded e
JOIN metric_mapping m ON e.metric = m.raw_symbol
"""
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
