"""Multi-provider feed parsing: a second, structurally different raw
JSON shape.

The reference ingests six providers whose payloads differ structurally
— flat single-reading records (Peplink-style) vs *array-of-records*
batches with record-level metadata and absent-field defaults
(Cubic-style: ``Bronze-Silver/Part1 - Step 01-02 ….scala:259-274``
parses an array payload with conditional element selection and
``na.fill`` defaults).  The engine's primary feed (``bronze.py``) is
the flat shape; this module is the batched shape, proving the
multi-schema seam: same downstream silver, different parser.

Provider-B record (one JSON document per device-day):

.. code-block:: json

    {"device": "123", "fw": "v3",
     "readings": [{"id": 7, "m": "click", "v": 1.5, "t": 1704067200},
                  ...]}

``fw`` is optionally absent (→ ``na.fill`` default), ``readings`` is
ordered by reading id, and the first element's timestamp is the
batch-start watermark a provider-B consumer reads via conditional
array-element selection (``element_at(readings, 1)``).

Because the driver's test data has no second raw feed, the feed is
*packed* from the ``events`` table deterministically (``pack_feed_b``)
and then parsed back (``parse_bronze_feed_b``) — the parse path
(explicit ``from_json`` array schema → element selection → ``explode``
→ ``na.fill`` → hash key) is the operator under test; the DuckDB
oracle reproduces the final rows from ``events`` directly, so any
parse defect breaks the match.  Both halves are map-side except the
one groupBy(device, day) shuffle the pack itself needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: explicit from_json schema for the provider-B batch record — schema
#: on read is always explicit, never inferred
FEED_B_SCHEMA = (
    "device STRING, fw STRING, "
    "readings ARRAY<STRUCT<id: BIGINT, m: STRING, v: DOUBLE, t: BIGINT>>"
)

#: per-source hash-key salt, like the reference's per-provider literal
FEED_B_SALT = "feedb"

#: firmware default when the field is absent from the raw record
FW_DEFAULT = "unknown"


def pack_feed_b(events: DataFrame) -> DataFrame:
    """Deterministically pack the events table into provider-B raw
    JSON documents (one per device-day, readings ordered by id).
    Devices with ``user_id % 3 == 0`` omit the ``fw`` field entirely
    (``to_json`` drops nulls), exercising the ``na.fill`` seam."""
    e = events.select(
        "user_id",
        F.unix_timestamp("ts").alias("t"),
        F.date_format("ts", "yyyy-MM-dd").alias("d"),
        F.struct(
            F.col("event_id").alias("id"),
            F.col("event_type").alias("m"),
            F.col("value").alias("v"),
            F.unix_timestamp("ts").alias("t"),
        ).alias("r"),
    )
    g = e.groupBy("user_id", "d").agg(
        F.array_sort(F.collect_list("r")).alias("readings")
    )
    fw = F.when(F.col("user_id") % 3 == 0, F.lit(None).cast("string")).otherwise(
        F.concat(F.lit("v"), (F.col("user_id") % 5).cast("string"))
    )
    return g.select(
        F.to_json(
            F.struct(
                F.col("user_id").cast("string").alias("device"),
                fw.alias("fw"),
                F.col("readings"),
            )
        ).alias("raw")
    )


def parse_bronze_feed_b(feed: DataFrame) -> DataFrame:
    """Provider-B bronze parser: explicit-schema ``from_json`` →
    conditional array-element selection (batch-start ts) → ``explode``
    to one row per reading → ``na.fill`` defaults → per-source hash
    key.  All JVM built-ins in one codegen stage; the explode is
    map-only."""
    rec = F.from_json(F.col("raw"), FEED_B_SCHEMA)
    base = feed.select(rec.alias("rec")).select(
        F.col("rec.device").alias("serial"),
        F.col("rec.fw").alias("fw"),
        F.element_at(F.col("rec.readings"), 1)["t"].alias("batch_start_ts"),
        F.explode("rec.readings").alias("r"),
    )
    out = base.select(
        F.col("r.id").alias("event_id"),
        "serial",
        F.col("r.m").alias("metric"),
        F.col("r.v").alias("value"),
        F.col("r.t").alias("unix_ts"),
        F.from_unixtime("r.t", "yyyy-MM-dd").alias("datestamp"),
        F.from_unixtime("r.t", "yyyy-MM-dd HH").alias("hourstamp"),
        "fw",
        "batch_start_ts",
    ).na.fill({"fw": FW_DEFAULT})
    return out.withColumn(
        "unique_hash_key",
        F.md5(
            F.concat_ws(
                "|",
                F.lit(FEED_B_SALT),
                F.col("serial"),
                F.col("metric"),
                F.col("unix_ts").cast("string"),
            )
        ),
    )


def bronze_feed_b(events: DataFrame) -> DataFrame:
    """Pack + parse: the provider-B ingest chain over the test feed."""
    return parse_bronze_feed_b(pack_feed_b(events))


BRONZE_FEED_B_ORACLE = f"""
SELECT
    event_id,
    CAST(user_id AS VARCHAR)          AS serial,
    event_type                        AS metric,
    value,
    (epoch_us(ts) // 1000000)         AS unix_ts,
    strftime(ts, '%Y-%m-%d')          AS datestamp,
    strftime(ts, '%Y-%m-%d %H')       AS hourstamp,
    CASE WHEN user_id % 3 = 0 THEN '{FW_DEFAULT}'
         ELSE 'v' || CAST(user_id % 5 AS VARCHAR) END AS fw,
    first_value((epoch_us(ts) // 1000000)) OVER (
        PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
        ORDER BY event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )                                 AS batch_start_ts,
    md5('{FEED_B_SALT}' || '|' || CAST(user_id AS VARCHAR) || '|' || event_type
        || '|' || CAST((epoch_us(ts) // 1000000) AS VARCHAR))
                                      AS unique_hash_key
FROM events
"""


# --------------------------------------------------------------------------
# provider C: ONE topic, MIXED record schemas, type-dispatched parse
# --------------------------------------------------------------------------

#: unified explicit schema for the mixed-type provider-C topic: every
#: record carries ``type``; the remaining fields are populated per
#: type (absent fields parse as NULL and the dispatch ignores them)
FEED_C_SCHEMA = (
    "type STRING, sn STRING, m STRING, "
    "eid BIGINT, ts BIGINT, val DOUBLE, code STRING, "
    "eid_arr ARRAY<BIGINT>, ts_arr ARRAY<BIGINT>, val_arr ARRAY<DOUBLE>"
)

FEED_C_SALT = "feedc"


def _status_ladder(code):
    """The hubstatus-style discrete remap (reference:
    ``Bronze-Silver/Part2 ….scala:498`` remaps raw status codes with a
    nested ``when`` ladder: 1→1, 6→3, 2..5→0, else 2)."""
    return (
        F.when(code == "1", F.lit(1.0))
        .when(code == "6", F.lit(3.0))
        .when(code.isin("2", "3", "4", "5"), F.lit(0.0))
        .otherwise(F.lit(2.0))
    )


def pack_feed_c(events: DataFrame) -> DataFrame:
    """Deterministically pack ``events`` into the mixed provider-C
    topic: ``event_id % 3`` routes each event to one of three record
    shapes sharing a single stream —

    - ``reading``: flat single-reading record (Peplink-style),
    - ``batch``: per (device, metric, day) record with zip-aligned
      ``ts/val/eid`` arrays (hubstats-style),
    - ``status``: flat record whose value is a discrete STRING code
      (hubstatus-style) the parser must remap.
    """
    base = events.select(
        "event_id",
        F.col("user_id").cast("string").alias("sn"),
        F.col("event_type").alias("m"),
        F.col("value").alias("val"),
        F.unix_timestamp("ts").alias("t"),
        F.date_format("ts", "yyyy-MM-dd").alias("d"),
    )
    reading = base.filter(F.col("event_id") % 3 == 0).select(
        F.to_json(
            F.struct(
                F.lit("reading").alias("type"),
                "sn",
                "m",
                F.col("event_id").alias("eid"),
                F.col("t").alias("ts"),
                "val",
            )
        ).alias("raw")
    )
    batch = (
        base.filter(F.col("event_id") % 3 == 1)
        .select(
            "sn", "m", "d",
            F.struct(F.col("event_id").alias("eid"), "t", "val").alias("r"),
        )
        .groupBy("sn", "m", "d")
        .agg(F.array_sort(F.collect_list("r")).alias("rs"))
        .select(
            F.to_json(
                F.struct(
                    F.lit("batch").alias("type"),
                    "sn",
                    "m",
                    F.transform("rs", lambda r: r["eid"]).alias("eid_arr"),
                    F.transform("rs", lambda r: r["t"]).alias("ts_arr"),
                    F.transform("rs", lambda r: r["val"]).alias("val_arr"),
                )
            ).alias("raw")
        )
    )
    status = base.filter(F.col("event_id") % 3 == 2).select(
        F.to_json(
            F.struct(
                F.lit("status").alias("type"),
                "sn",
                "m",
                F.col("event_id").alias("eid"),
                F.col("t").alias("ts"),
                (F.col("event_id") % 7).cast("string").alias("code"),
            )
        ).alias("raw")
    )
    return reading.unionByName(batch).unionByName(status)


def parse_bronze_feed_c(feed: DataFrame) -> DataFrame:
    """Type-dispatched bronze parser for the mixed provider-C topic.

    ONE ``from_json`` with the unified schema, then a ``when`` ladder
    routes each record to its parse path (reference: ``Bronze-Silver/
    Part2/Part3 ….scala`` parse hubstats/hubstatus/hubusage records —
    different payload schemas — into one silver contract, including
    the Part2:498 status-code remap).  The two flat shapes become a
    1-element array, the batch shape zips its parallel arrays; a
    single ``explode`` then serves all three, so the whole parse is
    one map-only codegen stage regardless of mix — no per-type scan,
    no union of three subplans reading the topic three times.
    """
    rec = F.from_json(F.col("raw"), FEED_C_SCHEMA)
    item = lambda e, t, v: F.struct(  # noqa: E731 — shared shape
        e.alias("eid"), t.alias("ts"), v.alias("val")
    )
    items = (
        F.when(
            rec["type"] == "batch",
            F.zip_with(
                F.arrays_zip(rec["eid_arr"], rec["ts_arr"]),
                rec["val_arr"],
                lambda et, v: item(et["eid_arr"], et["ts_arr"], v),
            ),
        )
        .when(
            rec["type"] == "status",
            F.array(item(rec["eid"], rec["ts"], _status_ladder(rec["code"]))),
        )
        .otherwise(F.array(item(rec["eid"], rec["ts"], rec["val"])))
    )
    base = feed.select(
        rec["type"].alias("record_type"),
        rec["sn"].alias("serial"),
        rec["m"].alias("metric"),
        F.explode(items).alias("r"),
    )
    return base.select(
        F.col("r.eid").alias("event_id"),
        "serial",
        "metric",
        F.col("r.val").alias("value"),
        F.col("r.ts").alias("unix_ts"),
        F.from_unixtime("r.ts", "yyyy-MM-dd").alias("datestamp"),
        F.from_unixtime("r.ts", "yyyy-MM-dd HH").alias("hourstamp"),
        "record_type",
    ).withColumn(
        "unique_hash_key",
        F.md5(
            F.concat_ws(
                "|",
                F.lit(FEED_C_SALT),
                F.col("record_type"),
                F.col("serial"),
                F.col("metric"),
                F.col("unix_ts").cast("string"),
            )
        ),
    )


def bronze_feed_c(events: DataFrame) -> DataFrame:
    """Pack + parse: the provider-C mixed-schema ingest chain."""
    return parse_bronze_feed_c(pack_feed_c(events))


BRONZE_FEED_C_ORACLE = f"""
SELECT
    event_id,
    CAST(user_id AS VARCHAR)    AS serial,
    event_type                  AS metric,
    CASE
        WHEN event_id % 3 = 2 THEN
            CASE CAST(event_id % 7 AS VARCHAR)
                WHEN '1' THEN 1.0
                WHEN '6' THEN 3.0
                WHEN '2' THEN 0.0 WHEN '3' THEN 0.0
                WHEN '4' THEN 0.0 WHEN '5' THEN 0.0
                ELSE 2.0
            END
        ELSE value
    END                         AS value,
    (epoch_us(ts) // 1000000)   AS unix_ts,
    strftime(ts, '%Y-%m-%d')    AS datestamp,
    strftime(ts, '%Y-%m-%d %H') AS hourstamp,
    CASE event_id % 3
        WHEN 0 THEN 'reading' WHEN 1 THEN 'batch' ELSE 'status'
    END                         AS record_type,
    md5('{FEED_C_SALT}' || '|'
        || CASE event_id % 3
               WHEN 0 THEN 'reading' WHEN 1 THEN 'batch' ELSE 'status' END
        || '|' || CAST(user_id AS VARCHAR) || '|' || event_type
        || '|' || CAST((epoch_us(ts) // 1000000) AS VARCHAR))
                                AS unique_hash_key
FROM events
"""
