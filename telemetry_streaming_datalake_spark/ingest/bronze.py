"""Bronze stage: schema-on-read JSON extraction, timestamp
normalization, and hash-key exact dedup.

Re-expresses the reference's Kafka→bronze notebooks
(``Bronze-Silver/Part1 - Step 01-02 ….scala:33-74``): there, each raw
Kafka record is pulled apart with ``get_json_object``, the timestamp is
normalized to unix seconds plus a ``Datestamp`` partition column, a
``sha1(concat(...))`` hash key is added, and watermarked
``dropDuplicates`` removes re-deliveries.

Here the raw feed is the ``events`` table (``props`` is the JSON
payload, ``user_id`` the terminal serial, ``event_type`` the raw metric
symbol).  md5 stands in for sha1 purely so the DuckDB oracle can verify
the exact same key (DuckDB has no sha1); the dedup semantics are
identical.  Everything is built-in JVM expressions — no Python UDFs —
so the whole stage stays inside WholeStageCodegen and the only shuffle
is the one hash-partitioned exchange the dedup itself requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: salt prefixed into the hash key, like the reference's per-source
#: literal (``sha1(concat(lit("peplink"), ...))``).
HASH_SALT = "telemetry"


def parse_bronze(events: DataFrame, extra: list | None = None) -> DataFrame:
    """JSON extraction + timestamp normalization + hash key.

    Input: raw ``events`` (``ts`` already TimestampType via the loader).
    Output columns (all derived with codegen-friendly built-ins):

    - ``serial``          terminal serial number (string)
    - ``metric``          raw metric symbol
    - ``value``           measurement (double)
    - ``payload_k``       extracted JSON field ``$.k`` (bigint)
    - ``unix_ts``         unix seconds (bigint, exact floor)
    - ``datestamp``       'yyyy-MM-dd' partition key
    - ``hourstamp``       'yyyy-MM-dd HH'
    - ``unique_hash_key`` md5 over (salt, serial, metric, unix_ts)

    ``extra``: additional columns appended after the standard set
    (used by :func:`parse_bronze_payload`; default output unchanged).
    """
    return events.select(
        F.col("event_id"),
        F.col("user_id").cast("string").alias("serial"),
        F.col("event_type").alias("metric"),
        F.col("value"),
        F.get_json_object("props", "$.k").cast("bigint").alias("payload_k"),
        F.unix_timestamp("ts").alias("unix_ts"),
        F.date_format("ts", "yyyy-MM-dd").alias("datestamp"),
        F.date_format("ts", "yyyy-MM-dd HH").alias("hourstamp"),
        *(extra or []),
    ).withColumn(
        "unique_hash_key",
        F.md5(
            F.concat_ws(
                "|",
                F.lit(HASH_SALT),
                F.col("serial"),
                F.col("metric"),
                F.col("unix_ts").cast("string"),
            )
        ),
    )


#: explicit schema for the props payload — the reference parses every
#: feed with ``from_json`` + an explicit struct schema, never inference
#: (``Bronze-Silver/Part1 ….scala:119``)
PAYLOAD_JSON_SCHEMA = "k BIGINT"


def parse_bronze_payload(events: DataFrame) -> DataFrame:
    """:func:`parse_bronze` + the raw ``props`` string and its
    ``from_json``-parsed struct retained, feeding the silver
    name/value explode (payload fields become their own metric rows).
    Map-only, same single codegen stage as :func:`parse_bronze`.
    """
    return parse_bronze(
        events,
        extra=[
            F.col("props"),
            F.from_json(F.col("props"), PAYLOAD_JSON_SCHEMA).alias("payload"),
        ],
    )


def dedup_exact(bronze: DataFrame) -> DataFrame:
    """Keep exactly one row per hash key, deterministically.

    The reference's streaming ``dropDuplicates("uniqueHashKey")`` keeps
    the first arrival; batch Spark has no arrival order, so we keep the
    lowest ``event_id`` — deterministic and oracle-checkable.

    Scale: one hash-partitioned shuffle on an md5 key (uniform, no
    skew); ``row_number`` sorts only within each key group, and —
    decisive — Catalyst prunes columns THROUGH the window: a consumer
    selecting 3 of the 9 bronze columns reads a 4-column scan (its 3 +
    the key/order columns) and never evaluates the pruned expressions
    (``get_json_object``, date formats).

    A ``min_by(whole-row, event_id)`` aggregate form was tried and
    REVERTED: it gains map-side combine (a 10× full-replay union
    dedup'd at 1.8× the clean wall because only ~unique rows cross the
    exchange), but the whole-row struct defeats column pruning — every
    narrow consumer pays the full 9-column parse (measured +30-95%
    on gap_detect/ewma/trend at sf0.1, plan-verified: the struct form
    reads all columns and keeps the JSON extraction alive for a
    3-column projection).  Dedup runs under EVERY query; replay
    collapse is the streaming edge's job (``dropDuplicates`` state in
    the silver stream), so pruning wins.  The pruning property is
    plan-pinned in tests/test_plans.py.
    """
    # NULLS LAST matches the DuckDB oracles' ORDER BY default (Spark's
    # is NULLS FIRST): a group holding a NULL event_id keeps a real row
    # either way, and the survivor agrees across engines.
    w = Window.partitionBy("unique_hash_key").orderBy(
        F.col("event_id").asc_nulls_last()
    )
    return (
        bronze.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


#: Shared SELECT used by the DuckDB oracle for :func:`parse_bronze`.
_BRONZE_ORACLE_BODY = """
    event_id,
    CAST(user_id AS VARCHAR)                       AS serial,
    event_type                                     AS metric,
    value,
    CAST(json_extract_string(props, '$.k') AS BIGINT) AS payload_k,
    (epoch_us(ts) // 1000000)         AS unix_ts,
    strftime(ts, '%Y-%m-%d')                       AS datestamp,
    strftime(ts, '%Y-%m-%d %H')                    AS hourstamp,
    md5('telemetry' || '|' || CAST(user_id AS VARCHAR) || '|' || event_type
        || '|' || CAST((epoch_us(ts) // 1000000) AS VARCHAR))
                                                   AS unique_hash_key
FROM events
"""

BRONZE_PARSE_ORACLE = "SELECT" + _BRONZE_ORACLE_BODY

#: payload-retaining twin of :data:`BRONZE_PARSE_ORACLE`
BRONZE_PAYLOAD_ORACLE = "SELECT\n    props," + _BRONZE_ORACLE_BODY


# --------------------------------------------------------------------------
# ingest validation gate (dead-letter / quarantine router)
# --------------------------------------------------------------------------

#: records older than this are stale — the fixed-cutoff analog of the
#: reference's rolling ingest window (`Part2 ….scala:52` filters
#: `timestamp > unix_timestamp() - 172800`; a deterministic engine
#: pins the boundary instead of calling now())
QUARANTINE_STALE_BEFORE = "2024-01-05"
#: plausibility bounds for the measurement value
QUARANTINE_VALUE_MAX = 450.0
#: the provider this ingest leg serves — only its symbols are valid
#: here (the reference scopes each parser to one provider's mappings,
#: `Part2 ….scala:309`)
QUARANTINE_PROVIDER_ID = 1


def bronze_quarantine(events: DataFrame, mapping: DataFrame) -> DataFrame:
    """Route every raw record to ``bronze`` or ``quarantine`` with a
    reason — the auditable version of the reference's silent ingest
    filters (stale-window drop `Part2 ….scala:52`, shape drop
    `Part3 ….scala:38`, provider-scoped mapping `Part2 ….scala:309`).

    First matching rule wins: malformed payload, stale timestamp,
    symbol unknown to this leg's provider, value out of plausible
    range; survivors route to bronze.  The mapping vocabulary is a
    broadcast left join (null provider ⇒ unmapped); everything else is
    a codegen `when` ladder — map-only, zero shuffles, the same plan
    at any ingest rate.
    """
    vocab = mapping.filter(
        F.col("provider_id") == QUARANTINE_PROVIDER_ID
    ).select(F.col("raw_symbol"), F.lit(True).alias("mapped"))
    parsed = events.select(
        "event_id",
        F.col("user_id").cast("string").alias("serial"),
        F.col("event_type").alias("metric"),
        "value",
        # try_cast, not cast: a NON-INTEGER $.k must route to
        # bad_payload — under ANSI a strict cast would crash the
        # router on exactly the records it exists to screen (the
        # oracle mirrors with TRY_CAST)
        F.get_json_object("props", "$.k").try_cast("bigint").alias("payload_k"),
        F.unix_timestamp("ts").alias("unix_ts"),
        F.date_format("ts", "yyyy-MM-dd").alias("datestamp"),
    )
    joined = parsed.join(
        F.broadcast(vocab), parsed["metric"] == vocab["raw_symbol"], "left_outer"
    ).drop("raw_symbol")
    reason = (
        F.when(F.col("payload_k").isNull(), "bad_payload")
        .when(F.col("datestamp") < QUARANTINE_STALE_BEFORE, "stale_ts")
        .when(F.col("mapped").isNull(), "unmapped_metric")
        .when(
            (F.col("value") <= 0) | (F.col("value") > QUARANTINE_VALUE_MAX),
            "out_of_range",
        )
        .otherwise("ok")
    )
    return joined.select(
        "event_id",
        "serial",
        "metric",
        "value",
        "unix_ts",
        "datestamp",
        reason.alias("reason"),
        F.when(reason == "ok", "bronze").otherwise("quarantine").alias("route"),
    )


def bronze_quarantine_oracle() -> str:
    return f"""
WITH parsed AS (
    SELECT event_id,
           CAST(user_id AS VARCHAR) AS serial,
           event_type AS metric,
           value,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS payload_k,
           (epoch_us(ts) // 1000000) AS unix_ts,
           strftime(ts, '%Y-%m-%d') AS datestamp
    FROM events
),
reasoned AS (
    SELECT p.*,
           CASE
               WHEN payload_k IS NULL THEN 'bad_payload'
               WHEN datestamp < '{QUARANTINE_STALE_BEFORE}' THEN 'stale_ts'
               WHEN metric NOT IN ('click', 'view', 'purchase') THEN 'unmapped_metric'
               WHEN value <= 0 OR value > {QUARANTINE_VALUE_MAX} THEN 'out_of_range'
               ELSE 'ok'
           END AS reason
    FROM parsed p
)
SELECT event_id, serial, metric, value, unix_ts, datestamp, reason,
       CASE WHEN reason = 'ok' THEN 'bronze' ELSE 'quarantine' END AS route
FROM reasoned
"""
