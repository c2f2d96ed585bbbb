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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


from telemetry_streaming_datalake_spark.datamodel import REMOTE_HISTORY_CTE
from telemetry_streaming_datalake_spark.operators.derived import floor_round
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


# --------------------------------------------------------------------------
# generic as-of join (union–sort formulation) and bounded range join
# --------------------------------------------------------------------------


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Distributed as-of join: for every left row, attach the right row
    with the greatest ``right_ts <= left_ts`` for the same ``key``.

    The SCD2 interval join (:func:`enrich_gold`) covers the
    dimension-sized right side by broadcasting.  This is the *big×big*
    formulation: both inputs are unioned, hash-partitioned on the key,
    sorted once by time, and each left row picks up the most recent
    right attributes with ``last(..., ignorenulls)`` over the preceding
    frame.  ONE shuffle + one in-partition sort, zero pair explosion —
    the classic equi-join-then-filter spelling explodes to
    |left| × |matching rights| intermediate rows, which at 100 TB is
    the difference between a working plan and an OOM.

    Right rows order *before* left rows at equal timestamps, giving the
    inclusive ``right_ts <= left_ts`` bound.  ``right`` must be unique
    per (key, right_ts) — pre-dedupe if not; otherwise "the" as-of row
    is ill-defined in any engine.
    """
    lhs = left.withColumn("__side", F.lit(1))
    # all right attributes ride in ONE struct so the window carries the
    # single most recent right ROW — carrying each column independently
    # would let a legitimately-NULL column fall back to an older
    # observation while its siblings take the newest (not as-of semantics)
    # a NULL right_ts row must match NOTHING (as-of needs a real
    # observation time): ascending sort puts NULLS FIRST, so without
    # this filter such a row would carry its attributes into every
    # left row that precedes the first real right observation
    rhs = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(key).alias(key),
        F.col(right_ts).alias(left_ts),
        F.struct(*right_cols).alias("__r"),
    ).withColumn("__side", F.lit(0))
    for c in (c for c in lhs.columns if c not in rhs.columns):
        rhs = rhs.withColumn(c, F.lit(None).cast(dict(lhs.dtypes)[c]))
    lhs = lhs.withColumn("__r", F.lit(None).cast(dict(rhs.dtypes)["__r"]))
    u = lhs.unionByName(rhs)
    w = (
        Window.partitionBy(key)
        .orderBy(left_ts, "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        *[c for c in left.columns],
        "__side",
        F.last("__r", ignorenulls=True).over(w).alias("__r"),
    )
    out = filled.filter(F.col("__side") == 1).drop("__side")
    return out.select(
        *[c for c in left.columns],
        *[F.col(f"__r.{c}").alias(c) for c in right_cols],
    )


def asof_latest_order(events: DataFrame, orders: DataFrame) -> DataFrame:
    """As-of attach each telemetry event to its user's most recent
    order at or before the event time (the "configuration active at
    reading time" pattern, big-fact × big-fact).

    Orders are first collapsed to one row per (custkey, orderdate) —
    highest orderkey wins — so the as-of row is well-defined (DuckDB's
    ``ASOF JOIN`` is otherwise free to pick any of the tied rows).
    Inner semantics: events before their user's first order drop.
    """
    o = (
        orders.select(
            F.col("o_custkey").alias("user_id"),
            F.unix_timestamp("o_orderdate").alias("order_ts"),
            F.struct("o_orderkey", "o_totalprice").alias("ok"),
        )
        .groupBy("user_id", "order_ts")
        .agg(F.max("ok").alias("ok"))
        .select(
            "user_id",
            "order_ts",
            F.col("ok.o_orderkey").alias("o_orderkey"),
            F.round(F.col("ok.o_totalprice"), 2).alias("o_totalprice"),
        )
    )
    ev = events.select("event_id", "user_id", F.unix_timestamp("ts").alias("unix_ts"))
    joined = asof_join(
        ev, o, key="user_id", left_ts="unix_ts", right_ts="order_ts",
        right_cols=["o_orderkey", "o_totalprice"],
    )
    return joined.filter(F.col("o_orderkey").isNotNull())


ASOF_LATEST_ORDER_ORACLE = """
WITH o AS (
    SELECT o_custkey AS user_id,
           (epoch_us(o_orderdate) // 1000000) AS order_ts,
           max(o_orderkey) AS o_orderkey,
           round(arg_max(o_totalprice, o_orderkey), 2) AS o_totalprice
    FROM orders
    GROUP BY 1, 2
),
ev AS (
    SELECT event_id, user_id, (epoch_us(ts) // 1000000) AS unix_ts FROM events
)
SELECT ev.event_id, ev.user_id, ev.unix_ts, o.o_orderkey, o.o_totalprice
FROM ev ASOF JOIN o
  ON ev.user_id = o.user_id AND o.order_ts <= ev.unix_ts
"""

#: activity-window length for the bounded range join (seconds)
RANGE_WINDOW_SECS = 7 * 86400


def order_window_activity(events: DataFrame, orders: DataFrame) -> DataFrame:
    """Per order: the customer's telemetry activity inside the week
    following the order — an equi-key join on custkey with a bounded
    time-range residual.

    Spark-first shape: the equi key carries the shuffle (SortMergeJoin
    or broadcast under AQE); the range predicate is a cheap residual
    filter inside the join — NOT a cartesian.  The bounded window is
    what keeps the multiplicity O(events-per-week) instead of
    O(all-history).  Orders with no in-window activity survive with
    zeros (left join + coalesce).
    """
    ev = events.select(
        F.col("user_id").alias("o_custkey"),
        F.unix_timestamp("ts").alias("ev_ts"),
        "value",
    )
    o = orders.select(
        "o_orderkey", "o_custkey", F.unix_timestamp("o_orderdate").alias("order_ts")
    )
    cond = (
        (o["o_custkey"] == ev["o_custkey"])
        & (ev["ev_ts"] >= o["order_ts"])
        & (ev["ev_ts"] < o["order_ts"] + RANGE_WINDOW_SECS)
    )
    j = o.join(ev, cond, "left")
    return j.groupBy(o["o_orderkey"]).agg(
        F.count(ev["ev_ts"]).alias("n_events"),
        floor_round(F.coalesce(F.sum("value"), F.lit(0.0)), 6).alias("sum_value"),
    )


ORDER_WINDOW_ACTIVITY_ORACLE = f"""
WITH ev AS (
    SELECT user_id AS o_custkey, (epoch_us(ts) // 1000000) AS ev_ts, value
    FROM events
),
o AS (
    SELECT o_orderkey, o_custkey, (epoch_us(o_orderdate) // 1000000) AS order_ts FROM orders
)
SELECT o.o_orderkey,
       count(ev.ev_ts) AS n_events,
       floor(coalesce(sum(ev.value), 0.0) * 1000000.0 + 0.5) / 1000000.0 AS sum_value
FROM o LEFT JOIN ev
  ON o.o_custkey = ev.o_custkey
 AND ev.ev_ts >= o.order_ts
 AND ev.ev_ts < o.order_ts + {RANGE_WINDOW_SECS}
GROUP BY o.o_orderkey
"""


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
