"""Behavioural cohort analytics over the raw event feed.

The reference's ad-hoc layer slices the lake by calendar buckets and
entities (``Query the Metric tables/Query the delta tables.scala``,
``Gold Aggregation/Step 05 ….scala``); the classic product-analytics
companions to those slices are the retention cohort matrix and the
step-funnel — both pure relational shapes over the same events table,
included here so a lake user gets them without a second engine.

Scale shapes (both operators):
- everything keys on ``user_id`` (uniform, high-cardinality — no skew),
  with map-side partial aggregation before each shuffle;
- the per-user relations that join back to facts are user-cardinality
  (orders of magnitude below event-cardinality), and the final matrices
  are day²- or day-cardinality — tiny;
- no windows over the full fact, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from telemetry_streaming_datalake_spark.operators.derived import floor_round

FUNNEL_WITHIN_S = 3600


def cohort_retention(events: DataFrame) -> DataFrame:
    """Daily retention matrix: users grouped by first-activity date
    (their cohort), counted distinct on each subsequent activity date.

    Output: (cohort_date, activity_date, days_since, n_active,
    cohort_size, retention_pct).  ``days_since = 0`` rows define
    ``cohort_size``, so retention_pct is self-normalizing.

    Shape: ONE user-keyed aggregation computes each user's cohort date
    AND the set of distinct activity dates (collect_set of day-grain
    dates — bounded by the calendar, not by event volume), exploded to
    (user, cohort, activity) and re-aggregated to the day² matrix.
    The events fact is scanned once and shuffled once, on user_id.
    """
    per_user = (
        events.select("user_id", F.to_date("ts").alias("d"))
        .groupBy("user_id")
        .agg(
            F.min("d").alias("cohort_date"),
            F.collect_set("d").alias("active_dates"),
        )
    )
    matrix = (
        per_user.select(
            "user_id", "cohort_date", F.explode("active_dates").alias("activity_date")
        )
        .groupBy("cohort_date", "activity_date")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    from pyspark.sql import Window

    cohort_size = F.max(
        F.when(F.col("activity_date") == F.col("cohort_date"), F.col("n_active"))
    ).over(Window.partitionBy("cohort_date"))
    return (
        matrix.withColumn("cohort_size", cohort_size)
        .select(
            F.col("cohort_date").cast("string").alias("cohort_date"),
            F.col("activity_date").cast("string").alias("activity_date"),
            F.datediff("activity_date", "cohort_date").cast("long").alias("days_since"),
            "n_active",
            "cohort_size",
            floor_round(F.col("n_active") / F.col("cohort_size"), 6).alias(
                "retention_pct"
            ),
        )
    )


def cohort_retention_oracle() -> str:
    return """
WITH per_user AS (
    SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date
    FROM events GROUP BY 1
),
matrix AS (
    SELECT cohort_date, CAST(ts AS DATE) AS activity_date,
           count(DISTINCT e.user_id) AS n_active
    FROM events e JOIN per_user u ON e.user_id = u.user_id
    GROUP BY 1, 2
)
SELECT CAST(cohort_date AS VARCHAR)   AS cohort_date,
       CAST(activity_date AS VARCHAR) AS activity_date,
       CAST(activity_date - cohort_date AS BIGINT) AS days_since,
       n_active,
       max(CASE WHEN activity_date = cohort_date THEN n_active END)
           OVER (PARTITION BY cohort_date) AS cohort_size,
       floor(n_active * 1.0 /
             max(CASE WHEN activity_date = cohort_date THEN n_active END)
                 OVER (PARTITION BY cohort_date) * 1000000.0 + 0.5) / 1000000.0 AS retention_pct
FROM matrix
"""


def funnel_conversion(
    events: DataFrame,
    step_a: str = "click",
    step_b: str = "purchase",
    within_s: int = FUNNEL_WITHIN_S,
) -> DataFrame:
    """Two-step funnel: of the users whose FIRST ``step_a`` event
    happened on day D, how many reached ``step_b`` within ``within_s``
    seconds of that first ``step_a`` — per entry day D.

    Output: (entry_date, n_entered, n_converted, conversion_pct,
    avg_seconds_to_convert).

    Shape: first-touch per user is one user-keyed partial-agg shuffle;
    the ``step_b`` slice LEFT-joins onto it ONCE (both sides
    user-partitioned, the entered side user-cardinality) with the time
    bound inside the conversion aggregate's ``when`` — a separate
    inner-join branch plus a second ``entered`` consumption would
    re-execute the step_a scan+agg lineage (it did, before r8-late);
    the final matrix is day-cardinality.  Timestamps floor to unix
    seconds before differencing so both engines agree on boundary
    events (TIMESTAMP(NANOS) parquet).
    """
    e = events.select(
        "user_id",
        "event_type",
        F.unix_timestamp("ts").alias("unix_ts"),
        F.to_date("ts").alias("d"),
    )
    entered = (
        e.filter(F.col("event_type") == step_a)
        .groupBy("user_id")
        .agg(
            F.min("unix_ts").alias("first_a_ts"),
            F.min_by("d", "unix_ts").alias("entry_date"),
        )
    )
    b_events = e.filter(F.col("event_type") == step_b).select(
        "user_id", F.col("unix_ts").alias("b_ts")
    )
    per_user = (
        entered.join(b_events, "user_id", "left")
        .groupBy("user_id", "entry_date")
        .agg(
            F.min(
                F.when(
                    (F.col("b_ts") >= F.col("first_a_ts"))
                    & (F.col("b_ts") <= F.col("first_a_ts") + within_s),
                    F.col("b_ts") - F.col("first_a_ts"),
                )
            ).alias("secs_to_convert")
        )
    )
    return (
        per_user
        .groupBy(F.col("entry_date").cast("string").alias("entry_date"))
        .agg(
            F.count(F.lit(1)).alias("n_entered"),
            F.count("secs_to_convert").alias("n_converted"),
            floor_round(F.count("secs_to_convert") / F.count(F.lit(1)), 6).alias(
                "conversion_pct"
            ),
            floor_round(F.avg("secs_to_convert"), 6).alias("avg_seconds_to_convert"),
        )
    )


def funnel_conversion_oracle(
    step_a: str = "click", step_b: str = "purchase", within_s: int = FUNNEL_WITHIN_S
) -> str:
    return f"""
WITH e AS (
    SELECT user_id, event_type,
           CAST(floor(epoch(ts)) AS BIGINT) AS unix_ts,
           CAST(ts AS DATE) AS d
    FROM events
),
entered AS (
    SELECT user_id, min(unix_ts) AS first_a_ts,
           min_by(d, unix_ts) AS entry_date
    FROM e WHERE event_type = '{step_a}' GROUP BY 1
),
converted AS (
    SELECT en.user_id, min(b.unix_ts - en.first_a_ts) AS secs_to_convert
    FROM entered en
    JOIN e b ON b.user_id = en.user_id AND b.event_type = '{step_b}'
            AND b.unix_ts >= en.first_a_ts
            AND b.unix_ts <= en.first_a_ts + {within_s}
    GROUP BY 1
)
SELECT CAST(entry_date AS VARCHAR) AS entry_date,
       count(*) AS n_entered,
       count(secs_to_convert) AS n_converted,
       floor(count(secs_to_convert) * 1.0 / count(*) * 1000000.0 + 0.5) / 1000000.0 AS conversion_pct,
       floor(avg(secs_to_convert) * 1000000.0 + 0.5) / 1000000.0 AS avg_seconds_to_convert
FROM entered LEFT JOIN converted USING (user_id)
GROUP BY 1
"""


# --------------------------------------------------------------------------
# sliding-window distinct actives
# --------------------------------------------------------------------------

ROLLING_WINDOW_DAYS = 7


def rolling_active_users(
    events: DataFrame, window_days: int = ROLLING_WINDOW_DAYS
) -> DataFrame:
    """Trailing N-day distinct active users per day (the WAU/MAU
    family).  Distinct counts don't merge across windows, so the
    scalable spelling is CONTRIBUTION EXPLODE: dedup activity to
    (user, day) — event-volume collapses to user×day cardinality in
    one partial-agg shuffle — then each activity day contributes
    itself to the ≤N report days it falls in (a ``sequence`` explode,
    ×N on the already-tiny frame), and the report is a distinct count
    per report day.  No per-day re-scan of the fact, no
    O(days × events) self-join; swap the final exact distinct for an
    HLL union (cf. ``approx_distinct_rollup``) at extreme user
    cardinality.

    Report days are restricted to days with ≥1 event (the observed
    spine), keeping the output deterministic without a calendar dim.
    """
    # ONE distinct + ONE explode + ONE aggregate, single events scan:
    # the observed-day spine is NOT a second branch (which would either
    # leak a persist — ADVICE r5 — or rescan events): a report day is
    # observed iff some contribution has offset 0 (report_day == its
    # own activity day), carried as a flag into the same aggregate.
    activity = events.select("user_id", F.to_date("ts").alias("d")).distinct()
    contributions = activity.select(
        "user_id",
        "d",
        F.explode(
            F.sequence(
                F.col("d"), F.date_add(F.col("d"), window_days - 1)
            )
        ).alias("report_day"),
    )
    return (
        contributions.groupBy("report_day")
        .agg(
            F.count_distinct("user_id").alias("active_users"),
            F.max((F.col("report_day") == F.col("d")).cast("int")).alias("__obs"),
        )
        .filter(F.col("__obs") == 1)
        .select(
            F.col("report_day").cast("string").alias("report_day"),
            "active_users",
        )
    )


def rolling_active_users_oracle(window_days: int = ROLLING_WINDOW_DAYS) -> str:
    return f"""
WITH activity AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
contributions AS (
    SELECT a.user_id, a.d + CAST(x.i AS INTEGER) AS report_day
    FROM activity a, (SELECT unnest(range({window_days})) AS i) x
),
observed AS (SELECT DISTINCT d AS report_day FROM activity)
SELECT CAST(report_day AS VARCHAR) AS report_day,
       count(DISTINCT user_id) AS active_users
FROM contributions JOIN observed USING (report_day)
GROUP BY 1
"""


# --------------------------------------------------------------------------
# event-transition matrix
# --------------------------------------------------------------------------


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order transition matrix over each user's event sequence:
    for every consecutive pair (A → B) in per-user time order, the
    count and the share of all transitions leaving A — the path-
    analysis companion to :func:`funnel_conversion` (which checks ONE
    step; this surveys all of them).

    Shape: one user-partitioned window (hash shuffle on user_id +
    in-partition sort — the same cost class as sessionize) computes
    the successor; the matrix aggregate is event-type² cardinality.
    Ordering ties break on event_id, making the successor — and the
    whole matrix — deterministic across engines and partitionings.
    """
    from pyspark.sql import Window

    e = events.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_timestamp("ts").alias("unix_ts"),
    )
    w = Window.partitionBy("user_id").orderBy("unix_ts", "event_id")
    pairs = (
        e.withColumn("to_type", F.lead("event_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    from_w = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n_transitions",
        floor_round(
            F.col("n_transitions") / F.sum("n_transitions").over(from_w), 6
        ).alias("share_from"),
    )


def event_transitions_oracle() -> str:
    return """
WITH e AS (
    SELECT user_id, event_id, event_type,
           CAST(floor(epoch(ts)) AS BIGINT) AS unix_ts
    FROM events
),
pairs AS (
    SELECT event_type AS from_type,
           lead(event_type) OVER (
               PARTITION BY user_id ORDER BY unix_ts, event_id
           ) AS to_type
    FROM e
),
matrix AS (
    SELECT from_type, to_type, count(*) AS n_transitions
    FROM pairs WHERE to_type IS NOT NULL
    GROUP BY 1, 2
)
SELECT from_type, to_type, n_transitions,
       floor(n_transitions * 1.0 /
             sum(n_transitions) OVER (PARTITION BY from_type)
             * 1000000.0 + 0.5) / 1000000.0
           AS share_from
FROM matrix
"""
