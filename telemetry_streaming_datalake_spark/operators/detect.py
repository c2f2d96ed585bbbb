"""Operational detection queries: data-gap/lag monitoring and orphaned
usage.

Reference semantics:

- ``Detection Data Lack/Bronze to Gold - Report the time through
  system ….scala`` + ``Monitor the latest timestamps ….scala``: latest
  timestamp per source/provider, compared against the global newest
  timestamp to flag lagging feeds.
- ``Detection Data Lack/Data Lack Detection for Orphaned Usage due to
  Unmapped Remote.scala:22-65``: silver records whose serial has no
  (current) modem-history mapping, aggregated per (datestamp, serial,
  provider) with counts, then provider names attached.

Both are single-scan aggregations; the orphan check is a broadcast
anti-join (NOT EXISTS) against the dimension-sized history table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from telemetry_streaming_datalake_spark.operators.derived import floor_round

from telemetry_streaming_datalake_spark.datamodel import (
    METRIC_MAPPING_CTE,
    REMOTE_HISTORY_CTE,
)

#: feeds lagging more than this many seconds behind the newest event
#: are flagged (the reference uses wall-clock now; we use the global
#: max so the check is deterministic/replayable).
GAP_THRESHOLD_S = 6 * 3600


def gap_detect(silver: DataFrame, threshold_s: int = GAP_THRESHOLD_S) -> DataFrame:
    """Latest ts per (provider_id, metric) + lag vs global newest."""
    per_feed = silver.groupBy("provider_id", "metric").agg(
        F.max("unix_ts").alias("latest_ts"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    # the global newest is the max of the per-feed maxes — an
    # unpartitioned window over the ALREADY-AGGREGATED frame (a few
    # rows per provider×metric), so the silver chain executes exactly
    # once.  A separate agg branch — even one reading per_feed — would
    # re-execute the whole upstream chain: two full scans at 100 TB
    # for one scalar.  The single-partition window is safe because its
    # input is dimension-sized by construction.
    from pyspark.sql import Window

    w = Window.partitionBy()
    return (
        per_feed.withColumn("global_latest", F.max("latest_ts").over(w))
        .withColumn("lag_seconds", F.col("global_latest") - F.col("latest_ts"))
        .withColumn("is_lagging", F.col("lag_seconds") > threshold_s)
        .select(
            "provider_id", "metric", "latest_ts", "n_rows",
            "global_latest", "lag_seconds", "is_lagging",
        )
    )


def serving_latest_monitor(
    latest: DataFrame, threshold_s: int = GAP_THRESHOLD_S
) -> DataFrame:
    """Freshness monitor over the SERVING copy (the latest-value
    store), not the lake: per provider, the newest key update and its
    lag vs the store's global newest.

    Reference: ``Detection Data Lack/Monitor the latest timestamps
    from Cosmos Containers DBR 8v.scala`` reads each serving container
    and reports its latest document timestamp — catching the failure
    mode where the lake is fresh but a serving writer died.  Input is
    the already-key-reduced latest store, so both aggregations are
    trivial; same deterministic global-max formulation as
    :func:`gap_detect`.
    """
    per_store = latest.groupBy("provider_id").agg(
        F.max("unix_ts").alias("latest_ts"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    # max of the per-store maxes via an unpartitioned window over the
    # aggregated frame — one latest-chain execution (see gap_detect)
    from pyspark.sql import Window

    return (
        per_store.withColumn(
            "global_latest", F.max("latest_ts").over(Window.partitionBy())
        )
        .withColumn("lag_seconds", F.col("global_latest") - F.col("latest_ts"))
        .withColumn("is_stale", F.col("lag_seconds") > threshold_s)
        .select(
            "provider_id", "latest_ts", "n_keys",
            "global_latest", "lag_seconds", "is_stale",
        )
    )


def serving_latest_monitor_oracle(
    latest_cte: str, threshold_s: int = GAP_THRESHOLD_S
) -> str:
    return f"""
WITH latest AS ({latest_cte}),
per_store AS (
    SELECT provider_id, max(unix_ts) AS latest_ts, count(*) AS n_keys
    FROM latest GROUP BY ALL
),
g AS (SELECT max(unix_ts) AS global_latest FROM latest)
SELECT provider_id, latest_ts, n_keys, global_latest,
       global_latest - latest_ts AS lag_seconds,
       (global_latest - latest_ts) > {threshold_s} AS is_stale
FROM per_store, g
"""


def orphan_usage(bronze: DataFrame, history: DataFrame, mapping: DataFrame) -> DataFrame:
    """Bronze records whose serial has no history interval at all.

    Anti-join on the broadcast history dim, then the reference's
    per-(datestamp, serial) count with provider names attached.
    """
    serials = history.select(F.col("serial").cast("string").alias("h_serial")).distinct()
    orphans = bronze.join(
        F.broadcast(serials), bronze["serial"] == F.col("h_serial"), "left_anti"
    )
    with_provider = orphans.join(
        F.broadcast(mapping), orphans["metric"] == mapping["raw_symbol"]
    )
    return (
        with_provider.groupBy("datestamp", "serial", "provider_id", "provider_name")
        .agg(F.count(F.lit(1)).alias("unmap_count"))
        .withColumn("unmap_remote_status", F.lit("NEVER_MAPPED"))
    )


def gap_detect_oracle(silver_cte: str, threshold_s: int = GAP_THRESHOLD_S) -> str:
    return f"""
WITH silver AS ({silver_cte}),
per_feed AS (
    SELECT provider_id, metric, max(unix_ts) AS latest_ts, count(*) AS n_rows
    FROM silver GROUP BY ALL
),
g AS (SELECT max(unix_ts) AS global_latest FROM silver)
SELECT provider_id, metric, latest_ts, n_rows, global_latest,
       global_latest - latest_ts AS lag_seconds,
       (global_latest - latest_ts) > {threshold_s} AS is_lagging
FROM per_feed, g
"""


def orphan_usage_oracle(bronze_cte: str) -> str:
    return (
        "WITH bronze_all AS ("
        + bronze_cte
        + "), "
        + REMOTE_HISTORY_CTE.strip()
        + ", "
        + METRIC_MAPPING_CTE.strip()
        + """
SELECT b.datestamp, b.serial, m.provider_id, m.provider_name,
       count(*) AS unmap_count,
       'NEVER_MAPPED' AS unmap_remote_status
FROM bronze_all b
JOIN metric_mapping m ON b.metric = m.raw_symbol
WHERE NOT EXISTS (
    SELECT 1 FROM remote_history h WHERE CAST(h.serial AS VARCHAR) = b.serial
)
GROUP BY ALL
"""
    )


# --------------------------------------------------------------------------
# cross-stage time-through-system report
# --------------------------------------------------------------------------

#: pipeline stage order for the delay report
STAGE_IDX = {"BRONZE": 0, "SILVER": 1, "GOLD": 2}


def stage_delay_report(
    bronze: DataFrame, silver: DataFrame, gold: DataFrame, mapping: DataFrame
) -> DataFrame:
    """Time-through-system report: latest timestamp per provider at
    EACH medallion stage, with the stage-to-stage relative delays.

    Reference: ``Detection Data Lack/Bronze to Gold - Report the time
    through system and capture relative delays.scala:60-150`` (per-
    provider bronze/gold/serving delay aggregates merged into one
    monitoring table) and ``Data Lack Detection for
    d-pipeline.scala:32-80`` (per-stage ``max(timestamp)`` unioned
    under a ``Stage`` label).  This is the reference's main operational
    dashboard: a provider whose GOLD latest trails its BRONZE latest
    has rows stuck between stages.

    Output: one row per (stage, provider) with ``latest_ts``,
    ``n_rows``, the provider's bronze high-water mark, ``delay_vs_
    bronze`` (how far this stage trails ingest) and ``delay_vs_prev``
    (the delay introduced by this stage alone; NULL on BRONZE rows).

    Scale shape: each stage contributes ONE partial-agg shuffle over
    its (materialized) table, reduced to provider-count rows before
    the union; the windows and the provider-name join run on a frame
    of ~3 × n_providers rows.  Deterministic (no wall-clock): delays
    are relative between stages, not vs now.
    """
    from pyspark.sql import Window

    providers = mapping.select("provider_id", "provider_name").distinct()
    b = bronze.join(
        F.broadcast(mapping.select("raw_symbol", "provider_id")),
        bronze["metric"] == F.col("raw_symbol"),
    )

    def stage_agg(df: DataFrame, label: str) -> DataFrame:
        return (
            df.groupBy("provider_id")
            .agg(F.max("unix_ts").alias("latest_ts"), F.count(F.lit(1)).alias("n_rows"))
            .select(
                F.lit(label).alias("stage"),
                F.lit(STAGE_IDX[label]).alias("__idx"),
                "provider_id",
                "latest_ts",
                "n_rows",
            )
        )

    staged = (
        stage_agg(b, "BRONZE")
        .unionByName(stage_agg(silver, "SILVER"))
        .unionByName(stage_agg(gold, "GOLD"))
    )
    per_provider = Window.partitionBy("provider_id")
    by_stage = Window.partitionBy("provider_id").orderBy("__idx")
    return (
        staged.withColumn(
            "bronze_latest",
            F.max(F.when(F.col("stage") == "BRONZE", F.col("latest_ts"))).over(
                per_provider
            ),
        )
        .withColumn("delay_vs_bronze", F.col("bronze_latest") - F.col("latest_ts"))
        .withColumn(
            "delay_vs_prev", F.lag("latest_ts").over(by_stage) - F.col("latest_ts")
        )
        .join(F.broadcast(providers), "provider_id")
        .select(
            "stage",
            "provider_id",
            "provider_name",
            "latest_ts",
            "n_rows",
            "bronze_latest",
            "delay_vs_bronze",
            "delay_vs_prev",
        )
    )


def stage_delay_report_oracle(bronze_cte: str, silver_cte: str, gold_cte: str) -> str:
    return (
        f"WITH bronze AS ({bronze_cte}), silver AS ({silver_cte}), "
        f"gold AS ({gold_cte}), "
        + METRIC_MAPPING_CTE.strip()
        + """,
b AS (
    SELECT m.provider_id, max(unix_ts) AS latest_ts, count(*) AS n_rows
    FROM bronze JOIN metric_mapping m ON bronze.metric = m.raw_symbol
    GROUP BY 1
),
staged AS (
    SELECT 'BRONZE' AS stage, 0 AS idx, provider_id, latest_ts, n_rows FROM b
    UNION ALL
    SELECT 'SILVER', 1, provider_id, max(unix_ts), count(*) FROM silver GROUP BY 3
    UNION ALL
    SELECT 'GOLD', 2, provider_id, max(unix_ts), count(*) FROM gold GROUP BY 3
),
providers AS (SELECT DISTINCT provider_id, provider_name FROM metric_mapping),
rep AS (
    SELECT stage, idx, provider_id, latest_ts, n_rows,
           max(CASE WHEN stage = 'BRONZE' THEN latest_ts END)
               OVER (PARTITION BY provider_id) AS bronze_latest,
           lag(latest_ts) OVER (PARTITION BY provider_id ORDER BY idx)
               - latest_ts AS delay_vs_prev
    FROM staged
)
SELECT stage, r.provider_id, provider_name, latest_ts, n_rows, bronze_latest,
       bronze_latest - latest_ts AS delay_vs_bronze, delay_vs_prev
FROM rep r JOIN providers USING (provider_id)
"""
    )


# --------------------------------------------------------------------------
# cross-stage aggregate consistency
# --------------------------------------------------------------------------


def agg_consistency(day_rollup: DataFrame, month_rollup: DataFrame) -> DataFrame:
    """Cross-stage rollup drift check.

    Reference (``Detection Data Lack/Data Lack Detection for Aggregated
    tables.scala:62-70, 167-177``): re-sum ``sumValue`` per
    metricProviderId from the Day-aggregated table and from the
    Month-aggregated table, label each with its ``Stage``, and union —
    any divergence between stages means a rollup or upsert dropped or
    double-counted data.  (The reference also pulls the serving-store
    copies of both; here the parquet rollups ARE the serving analog.)

    Scale shape: both inputs are already-aggregated tables, orders of
    magnitude smaller than gold — each branch is one partial-agg
    shuffle over a small frame, and the union is plan-level (no
    exchange of its own).
    """
    def stage(df: DataFrame, label: str) -> DataFrame:
        return (
            df.groupBy("metric_id", "provider_id")
            # sum_value is 6dp by contract → the decimal re-sum is
            # EXACT (see rollup._rollup), immune to accumulation order
            .agg(
                floor_round(
                    F.sum(F.col("sum_value").cast("decimal(38,6)")).cast("double"), 6
                ).alias("sum_of_sum")
            )
            .select(
                F.lit(label).alias("stage"), "metric_id", "provider_id", "sum_of_sum"
            )
        )

    return stage(day_rollup, "agg_day").unionByName(stage(month_rollup, "agg_month"))


def agg_consistency_oracle(day_cte: str, month_cte: str) -> str:
    return f"""
WITH day_agg AS ({day_cte}),
month_agg AS ({month_cte})
SELECT 'agg_day' AS stage, metric_id, provider_id,
       floor(CAST(sum(CAST(sum_value AS DECIMAL(38,6))) AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS sum_of_sum
FROM day_agg GROUP BY ALL
UNION ALL
SELECT 'agg_month' AS stage, metric_id, provider_id,
       floor(CAST(sum(CAST(sum_value AS DECIMAL(38,6))) AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS sum_of_sum
FROM month_agg GROUP BY ALL
"""


# --------------------------------------------------------------------------
# online-entities dashboard rollup
# --------------------------------------------------------------------------


def online_entities(gold: DataFrame) -> DataFrame:
    """Monthly distinct-active-entity counts, by entity type.

    Reference (``Set Up Delta Tables/Load Spark Table for Distinct
    Remotes & Antennas online.scala``): per (Year, Month), distinct
    active ids split into two Type-labelled rows (Remote vs Antenna by
    id shape) and unioned into a dashboard table.  This engine's
    entity axes are the resolved ``remote_id`` and the raw terminal
    ``serial``, so the split is RemoteOnline vs TerminalOnline.

    Scale shape: count-distinct runs as two-phase partial aggregation
    (distinct on (year, month, id) map-side, then count) — no row-level
    shuffle of gold; both branches prune to three columns at the scan.
    """
    year = F.substring("datestamp", 1, 4).alias("year")
    month = F.substring("datestamp", 6, 2).alias("month")

    def branch(id_col: str, label: str) -> DataFrame:
        return (
            gold.select(year, month, F.col(id_col).cast("string").alias("id"))
            .distinct()
            .groupBy("year", "month")
            .agg(F.count(F.lit(1)).alias("n_online"))
            .select("year", "month", F.lit(label).alias("entity_type"), "n_online")
        )

    return branch("remote_id", "RemoteOnline").unionByName(
        branch("serial", "TerminalOnline")
    )


def online_entities_oracle(gold_cte: str) -> str:
    return f"""
WITH gold AS ({gold_cte})
SELECT substr(datestamp, 1, 4) AS year, substr(datestamp, 6, 2) AS month,
       'RemoteOnline' AS entity_type,
       count(DISTINCT CAST(remote_id AS VARCHAR)) AS n_online
FROM gold GROUP BY 1, 2
UNION ALL
SELECT substr(datestamp, 1, 4) AS year, substr(datestamp, 6, 2) AS month,
       'TerminalOnline' AS entity_type,
       count(DISTINCT CAST(serial AS VARCHAR)) AS n_online
FROM gold GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# data-quality table profile (ANALYZE/summarize-style audit)
# --------------------------------------------------------------------------

#: bronze columns the profile audits (name, is_numeric)
PROFILE_COLS = [
    ("serial", False),
    ("metric", False),
    ("value", True),
    ("unix_ts", True),
    ("datestamp", False),
]


def table_profile(bronze: DataFrame) -> DataFrame:
    """Per-column quality profile of a lake table: row count, null
    count, distinct count, lexical min/max — the `summarize` / dbt-test
    audit an operator runs before trusting a backfill.

    One aggregation pass computes every column's metrics together
    (Spark expands the multi-`count_distinct` internally — the
    documented 100 TB swap-in is `approx_count_distinct`, same shape,
    one expand less); the wide 1-row aggregate then unpivots to
    long-form (column, metric rows) with a map-only `stack` — no
    second scan, no per-column job.  Min/max stringify so one schema
    carries all column types.
    """
    aggs = []
    for c, _num in PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            # min/max in the column's NATIVE order, stringified after —
            # stringify-then-compare would rank '99.93' above '490.02'
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = bronze.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c, _ in PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(PROFILE_COLS)}, {stack_args}) AS "
            "(column_name, n_rows, n_nulls, n_distinct, min_str, max_str)"
        )
    ).select(
        "column_name",
        F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
        F.coalesce("n_nulls", F.lit(0)).alias("n_nulls"),
        "n_distinct",
        "min_str",
        "max_str",
    )


def table_profile_oracle(bronze_cte: str) -> str:
    branches = "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS column_name, count(*) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       count(DISTINCT {c}) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_str,
       CAST(max({c}) AS VARCHAR) AS max_str
FROM bronze"""
        for c, _ in PROFILE_COLS
    )
    return f"WITH bronze AS ({bronze_cte})\n{branches}"


# --------------------------------------------------------------------------
# per-device daily availability / uptime report
# --------------------------------------------------------------------------

#: a reporting gap longer than this counts as downtime (the reference's
#: data-lack detection asks "which feeds went quiet"; this asks "for
#: HOW LONG, per device-day" — the SLA number an ops dashboard exports)
AVAIL_SLACK_S = 600


def availability_report(
    bronze_deduped: DataFrame, slack_s: int = AVAIL_SLACK_S
) -> DataFrame:
    """Per (serial, datestamp): seconds of downtime and the resulting
    availability fraction.  A device is "down" whenever the time since
    its previous reading exceeds ``slack_s`` — the excess over the
    slack counts as downtime — including the head gap from midnight to
    the first reading and the tail gap from the last reading to
    midnight (a device first seen at noon was down all morning, by
    definition: the report is about coverage of the DAY, not of the
    device's own activity span).

    One series-day-keyed window (lag) + one aggregate on the same key
    — a single shuffle; the day-boundary epochs come from the
    datestamp string, no second scan.
    """
    from pyspark.sql import Window

    day0 = F.unix_timestamp(F.col("datestamp"), "yyyy-MM-dd")
    w = Window.partitionBy("serial", "datestamp").orderBy("unix_ts")
    with_gap = bronze_deduped.select(
        "serial", "datestamp", "unix_ts"
    ).withColumn(
        "gap",
        F.col("unix_ts") - F.coalesce(F.lag("unix_ts").over(w), day0),
    )
    return (
        with_gap.groupBy("serial", "datestamp")
        .agg(
            F.count(F.lit(1)).alias("n_readings"),
            (
                F.sum(F.greatest(F.col("gap") - slack_s, F.lit(0)))
                + F.greatest(
                    (day0 + 86400) - F.max("unix_ts") - slack_s, F.lit(0)
                )
            ).alias("downtime_secs"),
        )
        .select(
            "serial",
            "datestamp",
            "n_readings",
            "downtime_secs",
            floor_round(1.0 - F.col("downtime_secs") / F.lit(86400.0), 6).alias(
                "availability"
            ),
        )
    )


def availability_report_oracle(
    bronze_dedup_sql: str, slack_s: int = AVAIL_SLACK_S
) -> str:
    return f"""
WITH deduped AS ({bronze_dedup_sql}),
gaps AS (
    SELECT serial, datestamp, unix_ts,
           unix_ts - coalesce(
               lag(unix_ts) OVER (PARTITION BY serial, datestamp ORDER BY unix_ts),
               CAST(epoch(strptime(datestamp, '%Y-%m-%d')) AS BIGINT)
           ) AS gap,
           CAST(epoch(strptime(datestamp, '%Y-%m-%d')) AS BIGINT) AS day0
    FROM deduped
)
SELECT serial, datestamp,
       count(*) AS n_readings,
       CAST(sum(greatest(gap - {slack_s}, 0))
           + greatest(max(day0) + 86400 - max(unix_ts) - {slack_s}, 0) AS BIGINT)
           AS downtime_secs,
       floor((1.0 - (sum(greatest(gap - {slack_s}, 0))
           + greatest(max(day0) + 86400 - max(unix_ts) - {slack_s}, 0)) / 86400.0)
           * 1000000.0 + 0.5) / 1000000.0
           AS availability
FROM gaps
GROUP BY serial, datestamp
"""


# --------------------------------------------------------------------------
# seasonal (hour-of-day) baseline and anomaly counts
# --------------------------------------------------------------------------

#: modified-z threshold against the seasonal profile
SEASONAL_Z = 3.0


def seasonal_baseline(bronze_deduped: DataFrame) -> DataFrame:
    """Per (metric, hour-of-day) seasonal profile with anomaly counts
    — the diurnal-pattern detector the flat z-score family
    (``anomaly_zscore`` / ``anomaly_mad``) cannot express: a value
    normal at peak hours is anomalous at 3am, so the baseline must be
    conditioned on the hour.

    Shape: one (metric, hour)-keyed moment aggregate (24×|metrics|
    rows — dimension-sized), broadcast back onto the fact for the
    z-test, then a second same-key aggregate for the counts.  The
    fact scans once and never shuffles raw rows (both aggregates are
    map-side partial); the hour comes from the already-oracle-checked
    ``hourstamp`` string, so no timezone dependency enters.

    Engine-parity discipline (the ``cusum_changepoint`` rule): moments
    round to 6dp BEFORE the z computation and the z itself rounds to
    6dp before the threshold compare, so both engines compare
    identical IEEE doubles.  Groups with zero variance (or n=1, where
    sample std is NULL) report zero anomalies by definition.
    """
    hod = F.substring("hourstamp", 12, 2).cast("int")
    fact = bronze_deduped.select(
        "metric", hod.alias("hour_of_day"), "value"
    )
    moments = fact.groupBy("metric", "hour_of_day").agg(
        floor_round(F.avg("value"), 6).alias("mean_value"),
        floor_round(F.stddev_samp("value"), 6).alias("std_value"),
    )
    z = floor_round(
        F.abs(F.col("value") - F.col("mean_value")) / F.col("std_value"), 6
    )
    # the second aggregate carries the (group-constant) moments through
    # via max(), so ONE fact aggregate yields the whole report — no
    # moments⋈counts join, and the moments frame computes exactly once
    # (on the broadcast side)
    return (
        fact.join(F.broadcast(moments), ["metric", "hour_of_day"])
        .withColumn(
            "is_anom",
            F.when((F.col("std_value") > 0) & (z > SEASONAL_Z), 1).otherwise(0),
        )
        .groupBy("metric", "hour_of_day")
        .agg(
            F.count(F.lit(1)).alias("n_readings"),
            F.max("mean_value").alias("mean_value"),
            F.max("std_value").alias("std_value"),
            F.sum("is_anom").cast("bigint").alias("n_anomalies"),
        )
    )


def seasonal_baseline_oracle(bronze_dedup_sql: str) -> str:
    return f"""
WITH deduped AS ({bronze_dedup_sql}),
fact AS (
    SELECT metric, CAST(substr(hourstamp, 12, 2) AS INTEGER) AS hour_of_day,
           value
    FROM deduped
),
moments AS (
    SELECT metric, hour_of_day,
           count(*) AS n_readings,
           floor(avg(value) * 1000000.0 + 0.5) / 1000000.0 AS mean_value,
           floor(stddev_samp(value) * 1000000.0 + 0.5) / 1000000.0 AS std_value
    FROM fact GROUP BY metric, hour_of_day
),
counts AS (
    SELECT f.metric, f.hour_of_day,
           CAST(sum(CASE WHEN m.std_value > 0
                          AND floor(abs(f.value - m.mean_value) / m.std_value
                                    * 1000000.0 + 0.5) / 1000000.0
                              > {SEASONAL_Z}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM fact f JOIN moments m USING (metric, hour_of_day)
    GROUP BY f.metric, f.hour_of_day
)
SELECT metric, hour_of_day, n_readings, mean_value, std_value, n_anomalies
FROM moments JOIN counts USING (metric, hour_of_day)
"""


# --------------------------------------------------------------------------
# multi-window SLO burn-rate alerting
# --------------------------------------------------------------------------

#: fraction of events allowed to be errors under the fleet SLO
#: (75% success — sized to the synthetic fleet's ~20% error mix so the
#: burn ratios exercise both sides of the alert thresholds)
SLO_ERROR_BUDGET = 0.25
#: page when BOTH the 1h and 6h burn rates exceed this factor
SLO_PAGE_FACTOR = 1.5
#: open a ticket when BOTH the 6h and 24h burn rates exceed this factor
SLO_TICKET_FACTOR = 1.2


def slo_burn_alerts(bronze_deduped: DataFrame) -> DataFrame:
    """Fleet-wide multi-window, multi-burn-rate SLO alerting — the
    Google SRE workbook's alerting policy (ch. 5) scaled to hourly
    grain: burn rate = (observed error fraction / error budget) over a
    window; a PAGE requires the short (1h) AND medium (6h) windows to
    both burn above ``SLO_PAGE_FACTOR`` (fast + sustained), a TICKET
    requires the 6h AND 24h windows above ``SLO_TICKET_FACTOR``
    (slow leak).  Pairing a short with a long window is what keeps a
    one-hour blip from paging while still catching real regressions
    within minutes of the page condition holding.

    Shape: ONE fact aggregate to hourly grain (map-side partial, one
    shuffle, output is dimension-sized — |hours| rows ≈ 9k/year), then
    RANGE-frame rolling sums over the integer hour index.  The rolling
    stage is a single-partition window BY DESIGN: it runs on the
    post-aggregate frame, never on raw rows — at 100 TB the fact still
    scans once and reduces to O(hours) before any ordering happens.
    RANGE (not ROWS) frames make silent hours count correctly: an hour
    with no events contributes nothing, and the frame spans wall-clock
    hours, not adjacent present rows.

    Engine parity: burn ratios round to 6dp before the threshold
    compare (the ``seasonal_baseline`` discipline), so both engines
    compare identical IEEE doubles.
    """
    return slo_rolling(slo_hourly(bronze_deduped))


def slo_hourly(bronze_deduped: DataFrame) -> DataFrame:
    """The fact-reducing stage of :func:`slo_burn_alerts`: ONE hourly
    aggregate (count + error count are algebraic, so the streaming
    twin maintains the identical frame incrementally)."""
    return (
        bronze_deduped.groupBy(
            (F.col("unix_ts") - F.col("unix_ts") % 3600).alias("hour_epoch")
        )
        .agg(
            F.max("hourstamp").alias("hourstamp"),
            F.count(F.lit(1)).alias("n_1h"),
            F.sum(F.when(F.col("metric") == "error", 1).otherwise(0))
            .cast("bigint")
            .alias("err_1h"),
        )
        .withColumn("hour_idx", (F.col("hour_epoch") / 3600).cast("bigint"))
    )


def slo_rolling(hourly: DataFrame) -> DataFrame:
    """The dimension-sized stage of :func:`slo_burn_alerts`: RANGE
    rolling frames + burn ratios + alert gates over the hourly frame.
    Shared verbatim by the streaming twin (same code = bit-exact
    batch/stream parity by construction)."""
    from pyspark.sql import Window

    w6 = Window.orderBy("hour_idx").rangeBetween(-5, 0)
    w24 = Window.orderBy("hour_idx").rangeBetween(-23, 0)
    burn = lambda e, t: floor_round(  # noqa: E731
        F.col(e).cast("double") / F.col(t) / F.lit(SLO_ERROR_BUDGET), 6
    )
    out = (
        hourly.withColumn("err_6h", F.sum("err_1h").over(w6))
        .withColumn("tot_6h", F.sum("n_1h").over(w6))
        .withColumn("err_24h", F.sum("err_1h").over(w24))
        .withColumn("tot_24h", F.sum("n_1h").over(w24))
        .withColumn("burn_1h", burn("err_1h", "n_1h"))
        .withColumn("burn_6h", burn("err_6h", "tot_6h"))
        .withColumn("burn_24h", burn("err_24h", "tot_24h"))
    )
    return out.select(
        "hourstamp",
        "n_1h",
        "err_1h",
        "burn_1h",
        "burn_6h",
        "burn_24h",
        (
            (F.col("burn_1h") >= SLO_PAGE_FACTOR)
            & (F.col("burn_6h") >= SLO_PAGE_FACTOR)
        ).alias("page"),
        (
            (F.col("burn_6h") >= SLO_TICKET_FACTOR)
            & (F.col("burn_24h") >= SLO_TICKET_FACTOR)
        ).alias("ticket"),
    )


def slo_burn_alerts_oracle(bronze_dedup_sql: str) -> str:
    return f"""
WITH deduped AS ({bronze_dedup_sql}),
hourly AS (
    SELECT unix_ts - unix_ts % 3600 AS hour_epoch,
           max(hourstamp) AS hourstamp,
           count(*) AS n_1h,
           CAST(sum(CASE WHEN metric = 'error' THEN 1 ELSE 0 END) AS BIGINT)
               AS err_1h,
           (unix_ts - unix_ts % 3600) // 3600 AS hour_idx
    FROM deduped
    GROUP BY 1
),
rolled AS (
    SELECT hourstamp, n_1h, err_1h,
           sum(err_1h) OVER w6  AS err_6h,  sum(n_1h) OVER w6  AS tot_6h,
           sum(err_1h) OVER w24 AS err_24h, sum(n_1h) OVER w24 AS tot_24h
    FROM hourly
    WINDOW w6  AS (ORDER BY hour_idx RANGE BETWEEN 5 PRECEDING AND CURRENT ROW),
           w24 AS (ORDER BY hour_idx RANGE BETWEEN 23 PRECEDING AND CURRENT ROW)
),
burns AS (
    SELECT hourstamp, n_1h, err_1h,
           floor(CAST(err_1h AS DOUBLE) / n_1h / {SLO_ERROR_BUDGET} * 1000000.0 + 0.5) / 1000000.0
               AS burn_1h,
           floor(CAST(err_6h AS DOUBLE) / tot_6h / {SLO_ERROR_BUDGET} * 1000000.0 + 0.5) / 1000000.0
               AS burn_6h,
           floor(CAST(err_24h AS DOUBLE) / tot_24h / {SLO_ERROR_BUDGET} * 1000000.0 + 0.5) / 1000000.0
               AS burn_24h
    FROM rolled
)
SELECT hourstamp, n_1h, err_1h, burn_1h, burn_6h, burn_24h,
       (burn_1h >= {SLO_PAGE_FACTOR} AND burn_6h >= {SLO_PAGE_FACTOR})
           AS page,
       (burn_6h >= {SLO_TICKET_FACTOR} AND burn_24h >= {SLO_TICKET_FACTOR})
           AS ticket
FROM burns
"""
