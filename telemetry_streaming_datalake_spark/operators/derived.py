"""Derived-signal operators over the deduped bronze stream: counter→rate
conversion, time-range rolling means, z-score anomaly flags, exact
percentile rollups, and the wide pivoted serving table.

These are the standard second-order telemetry derivations a metrics
platform computes on top of the medallion stages (the reference derives
its custom metrics the same way — mapping-driven arithmetic over the
gold stream, ``Gold state/Step 04-04b ….scala:175-200``; rate/rolling/
percentile are the time-series analogs every serving dashboard needs).

Scale shapes
------------
- ``counter_rate`` / ``rolling_avg``: ONE hash exchange on the series
  key (serial, metric) with an in-partition time sort — exactly the
  state layout a streaming stateful operator would keep.  No global
  sort, no self-join; lag/avg are computed inside the sorted window
  frame (JVM codegen).  md5-free natural keys here are low-cardinality
  per partition but high-cardinality overall → uniform hash spread.
- ``anomaly_zscore``: per-metric moments are a 5-row aggregate —
  broadcast back over the fact stream, which is never shuffled.
- ``percentile_rollup``: exact percentiles group-shuffle the readings
  once; at 100 TB swap ``F.percentile`` for ``F.approx_percentile``
  (t-digest sketch, map-side combinable) — same plan shape, bounded
  state; exact is kept here because the DuckDB oracle checks it
  bit-for-bit.
- ``pivot_metrics``: the metric vocabulary is fixed and supplied
  literally, so the pivot compiles to one partial-agg shuffle over
  conditional aggregates — no second "discover the columns" pass over
  the data (that collect is the classic pivot scale trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: fixed metric vocabulary of the telemetry feed (mirrors the
#: reference's metricmappings dimension — known up front, never
#: discovered by scanning the fact table)
METRIC_NAMES = ("click", "error", "purchase", "signup", "view")

#: rolling-mean lookback (seconds)
ROLLING_WINDOW_SECS = 3600

#: |z| threshold for the anomaly flag
Z_THRESHOLD = 3.0


def floor_round(col, k: int):
    """Deterministic decimal rounding via ``floor(x*10^k + 0.5)/10^k``.

    ``F.round`` (Java HALF_UP on the shortest decimal repr), Python's
    ``round`` (banker's), and DuckDB's ``round`` disagree on decimal
    MIDPOINTS — measured at sf0.1 as single-row crosscheck flips on
    division-derived columns (rate, MAD score).  The floor form is
    pure IEEE multiply/add/floor/divide, which every engine evaluates
    bit-identically given bit-identical input, so the output survives
    any data scale.  (Negative midpoints round toward +inf instead of
    away from zero — both engines shift together, and the same form
    is the quantize_embeddings convention already.)
    """
    m = F.lit(float(10 ** k))
    return F.floor(col * m + F.lit(0.5)) / m


def counter_rate(bronze_deduped: DataFrame) -> DataFrame:
    """Per-series first difference: (Δvalue / Δt) between consecutive
    readings of the same (serial, metric).

    After hash-key dedup, (serial, metric, unix_ts) is unique, so the
    sort key is total and Δt > 0 always — no divide-by-zero row.  The
    first reading of each series has no predecessor and is dropped.
    """
    w = Window.partitionBy("serial", "metric").orderBy("unix_ts")
    prev_v = F.lag("value").over(w)
    prev_ts = F.lag("unix_ts").over(w)
    return (
        bronze_deduped.select("serial", "metric", "unix_ts", "value")
        .withColumn("prev_ts", prev_ts)
        .withColumn("delta_secs", F.col("unix_ts") - prev_ts)
        # "+ 0.0" collapses IEEE negative zero (a tiny negative delta
        # rounds to -0.0, whose textual form differs across engines)
        .withColumn(
            "rate_per_sec",
            floor_round((F.col("value") - prev_v) / (F.col("unix_ts") - prev_ts), 6)
            + 0.0,
        )
        .filter(F.col("prev_ts").isNotNull())
        .select("serial", "metric", "unix_ts", "value", "delta_secs", "rate_per_sec")
    )


def counter_rate_oracle(bronze_dedup_sql: str) -> str:
    return f"""
WITH deduped AS ({bronze_dedup_sql})
SELECT serial, metric, unix_ts, value, delta_secs, rate_per_sec FROM (
    SELECT serial, metric, unix_ts, value,
           unix_ts - lag(unix_ts) OVER w AS delta_secs,
           floor((value - lag(value) OVER w)
                 / (unix_ts - lag(unix_ts) OVER w) * 1000000.0 + 0.5)
             / 1000000.0 + 0.0 AS rate_per_sec
    FROM deduped
    WINDOW w AS (PARTITION BY serial, metric ORDER BY unix_ts)
) WHERE delta_secs IS NOT NULL
"""


def rolling_avg(bronze_deduped: DataFrame, window_secs: int = ROLLING_WINDOW_SECS) -> DataFrame:
    """Trailing time-range mean per series: avg of all readings in
    ``[ts - window_secs, ts]`` of the same (serial, metric).

    ``rangeBetween`` on the integer ``unix_ts`` ordering gives the
    value-range frame (not N-rows) — irregular sampling intervals are
    handled exactly.  Same single exchange + in-partition sort as
    :func:`counter_rate`.
    """
    w = (
        Window.partitionBy("serial", "metric")
        .orderBy("unix_ts")
        .rangeBetween(-window_secs, 0)
    )
    return bronze_deduped.select(
        "serial",
        "metric",
        "unix_ts",
        "value",
        floor_round(F.avg("value").over(w), 6).alias("rolling_avg"),
        F.count(F.lit(1)).over(w).alias("n_in_window"),
    )


def rolling_avg_oracle(bronze_dedup_sql: str, window_secs: int = ROLLING_WINDOW_SECS) -> str:
    return f"""
WITH deduped AS ({bronze_dedup_sql})
SELECT serial, metric, unix_ts, value,
       floor(avg(value) OVER w * 1000000.0 + 0.5) / 1000000.0 AS rolling_avg,
       count(*) OVER w AS n_in_window
FROM deduped
WINDOW w AS (PARTITION BY serial, metric ORDER BY unix_ts
             RANGE BETWEEN {window_secs} PRECEDING AND CURRENT ROW)
"""


def anomaly_zscore(bronze_deduped: DataFrame, z_threshold: float = Z_THRESHOLD) -> DataFrame:
    """Flag readings whose |z| exceeds ``z_threshold`` against their
    metric's global moments.

    The moments table is metric-cardinality (a handful of rows): one
    partial-agg shuffle produces it, then it broadcasts back onto the
    unshuffled fact stream.  Moments are rounded to 6dp *before* the
    z computation so the flag is bit-stable across engines and
    summation orders.
    """
    moments = bronze_deduped.groupBy("metric").agg(
        floor_round(F.avg("value"), 6).alias("mean_value"),
        floor_round(F.stddev_samp("value"), 6).alias("std_value"),
    )
    j = bronze_deduped.select("event_id", "metric", "value").join(
        F.broadcast(moments), "metric"
    )
    z = (F.col("value") - F.col("mean_value")) / F.col("std_value")
    return j.select(
        "event_id",
        "metric",
        "value",
        "mean_value",
        "std_value",
        floor_round(z, 4).alias("zscore"),
        (F.abs(F.col("value") - F.col("mean_value")) > z_threshold * F.col("std_value")).alias(
            "is_anomaly"
        ),
    )


def anomaly_zscore_oracle(bronze_dedup_sql: str, z_threshold: float = Z_THRESHOLD) -> str:
    return f"""
WITH deduped AS ({bronze_dedup_sql}),
moments AS (
    SELECT metric,
           floor(avg(value) * 1000000.0 + 0.5) / 1000000.0 AS mean_value,
           floor(stddev_samp(value) * 1000000.0 + 0.5) / 1000000.0 AS std_value
    FROM deduped GROUP BY metric
)
SELECT d.event_id, d.metric, d.value, m.mean_value, m.std_value,
       floor((d.value - m.mean_value) / m.std_value * 10000.0 + 0.5) / 10000.0
           AS zscore,
       abs(d.value - m.mean_value) > {z_threshold} * m.std_value AS is_anomaly
FROM deduped d JOIN moments m USING (metric)
"""


def percentile_rollup(bronze_deduped: DataFrame) -> DataFrame:
    """Exact p50/p95/p99 of readings per (metric, datestamp) — the
    latency-style distribution rollup serving dashboards read.

    ``F.percentile`` (exact, linear interpolation) matches DuckDB's
    ``quantile_cont`` definition bit-for-bit after 6dp rounding.  At
    100 TB the drop-in replacement is ``F.approx_percentile`` with the
    same call shape (bounded-memory sketch, map-side combinable);
    exact is used here because the oracle verifies values.
    """
    return bronze_deduped.groupBy("metric", "datestamp").agg(
        F.count(F.lit(1)).alias("n_points"),
        floor_round(F.percentile("value", 0.5), 6).alias("p50"),
        floor_round(F.percentile("value", 0.95), 6).alias("p95"),
        floor_round(F.percentile("value", 0.99), 6).alias("p99"),
    )


def percentile_rollup_oracle(bronze_dedup_sql: str) -> str:
    return f"""
WITH deduped AS ({bronze_dedup_sql})
SELECT metric, datestamp,
       count(*) AS n_points,
       floor(quantile_cont(value, 0.5)  * 1000000.0 + 0.5) / 1000000.0 AS p50,
       floor(quantile_cont(value, 0.95) * 1000000.0 + 0.5) / 1000000.0 AS p95,
       floor(quantile_cont(value, 0.99) * 1000000.0 + 0.5) / 1000000.0 AS p99
FROM deduped
GROUP BY metric, datestamp
"""


def pivot_metrics(bronze_deduped: DataFrame) -> DataFrame:
    """Wide per-(serial, datestamp) serving table: one column per
    metric holding that day's summed readings.

    The metric list is passed literally (``METRIC_NAMES``) so Catalyst
    compiles straight to conditional aggregates in ONE partial-agg
    shuffle; omitting it would trigger an extra distinct-scan of the
    fact table to discover columns — the pivot anti-pattern at scale.
    """
    return (
        bronze_deduped.groupBy("serial", "datestamp")
        .pivot("metric", list(METRIC_NAMES))
        .agg(floor_round(F.sum("value"), 6))
    )


def pivot_metrics_oracle(bronze_dedup_sql: str) -> str:
    cols = ",\n       ".join(
        f"floor(sum(CASE WHEN metric = '{m}' THEN value END) * 1000000.0 + 0.5) / 1000000.0 AS {m}"
        for m in METRIC_NAMES
    )
    return f"""
WITH deduped AS ({bronze_dedup_sql})
SELECT serial, datestamp,
       {cols}
FROM deduped
GROUP BY serial, datestamp
"""


# --------------------------------------------------------------------------
# gap-filled time buckets (hypertable gapfill + LOCF analog)
# --------------------------------------------------------------------------

GAPFILL_BUCKET_SECS = 3600


def gapfill_hourly(bronze_deduped: DataFrame, bucket_secs: int = GAPFILL_BUCKET_SECS) -> DataFrame:
    """Dense hourly series per (serial, metric): every bucket between a
    series' first and last reading exists in the output, empty buckets
    carry the last observed value forward (LOCF) — the
    `time_bucket_gapfill` + `locf` shape time-series stores provide.

    ONE exchange total: after the per-bucket aggregate (hash-partition
    on the series key), each observed bucket looks at the NEXT observed
    bucket (`lead` in the same sorted partition) and directly emits
    itself plus its carry-forward rows via `sequence`+`posexplode` —
    the fill rows are generated from the observation that owns them, so
    there is no dense-spine build, no spine×observations join, and no
    second window pass.  Row amplification (hours spanned) happens
    AFTER aggregation, map-side.
    """
    b = (F.col("unix_ts") - F.col("unix_ts") % bucket_secs).alias("bucket_ts")
    per_bucket = (
        bronze_deduped.select("serial", "metric", b, "value")
        .groupBy("serial", "metric", "bucket_ts")
        .agg(
            floor_round(F.avg("value"), 6).alias("avg_value"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )
    w = Window.partitionBy("serial", "metric").orderBy("bucket_ts")
    with_next = per_bucket.withColumn("next_b", F.lead("bucket_ts").over(w))
    # each observation owns the buckets [bucket_ts, next_b): itself plus
    # the empty buckets it fills; the series' last observation owns
    # exactly itself
    fill_end = F.coalesce(F.col("next_b") - bucket_secs, F.col("bucket_ts"))
    ex = with_next.select(
        "serial",
        "metric",
        "avg_value",
        "n_obs",
        F.posexplode(
            F.sequence(F.col("bucket_ts"), fill_end, F.lit(bucket_secs))
        ).alias("offset", "bucket_ts"),
    )
    return ex.select(
        "serial",
        "metric",
        "bucket_ts",
        F.col("avg_value").alias("value_locf"),
        F.when(F.col("offset") == 0, F.col("n_obs")).otherwise(F.lit(0)).alias("n_obs"),
        (F.col("offset") > 0).alias("is_filled"),
    )


def gapfill_hourly_oracle(bronze_dedup_sql: str, bucket_secs: int = GAPFILL_BUCKET_SECS) -> str:
    return f"""
WITH deduped AS ({bronze_dedup_sql}),
per_bucket AS (
    SELECT serial, metric, unix_ts - unix_ts % {bucket_secs} AS bucket_ts,
           floor(avg(value) * 1000000.0 + 0.5) / 1000000.0 AS avg_value, count(*) AS n_obs
    FROM deduped GROUP BY 1, 2, 3
),
bounds AS (
    SELECT serial, metric, min(bucket_ts) AS min_b, max(bucket_ts) AS max_b
    FROM per_bucket GROUP BY 1, 2
),
spine AS (
    SELECT serial, metric, t.bucket_ts
    FROM bounds, unnest(range(min_b, max_b + {bucket_secs}, {bucket_secs})) AS t(bucket_ts)
),
dense AS (
    SELECT s.serial, s.metric, s.bucket_ts, p.avg_value, p.n_obs
    FROM spine s LEFT JOIN per_bucket p
      ON s.serial = p.serial AND s.metric = p.metric AND s.bucket_ts = p.bucket_ts
)
SELECT serial, metric, bucket_ts,
       last_value(avg_value IGNORE NULLS) OVER (
           PARTITION BY serial, metric ORDER BY bucket_ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS value_locf,
       coalesce(n_obs, 0) AS n_obs,
       avg_value IS NULL AS is_filled
FROM dense
"""


# --------------------------------------------------------------------------
# robust (median/MAD) anomaly flags
# --------------------------------------------------------------------------

#: modified z-score threshold (Iglewicz–Hoaglin recommend 3.5)
MAD_THRESHOLD = 3.5
#: consistency constant making MAD comparable to a stddev under normality
MAD_K = 0.6745


def anomaly_mad(bronze_deduped: DataFrame, threshold: float = MAD_THRESHOLD) -> DataFrame:
    """Outlier-robust twin of :func:`anomaly_zscore`: flag readings by
    modified z-score ``0.6745·(x − median)/MAD`` — unlike mean/stddev,
    the median and MAD do not move when the outliers themselves grow,
    so a burst of bad readings cannot mask itself.

    Shape: two metric-cardinality aggregates (median, then median of
    absolute deviations — the second pass is inherent to MAD), each
    broadcast back onto the unshuffled fact stream; flags are computed
    map-side.  Exact `F.percentile` matches `quantile_cont`; at 100 TB
    the documented swap-in is `approx_percentile`, same call shape.
    Stats round to 6dp before the score so flags are bit-stable
    across engines and summation orders; MAD floors at 1e-9 so a
    constant-valued metric flags nothing instead of dividing by zero.
    """
    b = bronze_deduped.select("event_id", "metric", "value")
    med = b.groupBy("metric").agg(
        floor_round(F.percentile("value", F.lit(0.5)), 6).alias("med_value")
    )
    mad = (
        b.join(F.broadcast(med), "metric")
        .groupBy("metric")
        .agg(
            F.min("med_value").alias("med_value"),
            floor_round(
                F.percentile(F.abs(F.col("value") - F.col("med_value")), F.lit(0.5)), 6
            ).alias("mad_value"),
        )
    )
    j = b.join(F.broadcast(mad), "metric")
    score = (
        F.lit(MAD_K)
        * (F.col("value") - F.col("med_value"))
        / F.greatest(F.col("mad_value"), F.lit(1e-9))
    )
    return j.select(
        "event_id",
        "metric",
        "value",
        "med_value",
        "mad_value",
        floor_round(score, 4).alias("robust_z"),
        (F.abs(floor_round(score, 4)) > threshold).alias("is_anomaly"),
    )


def anomaly_mad_oracle(bronze_dedup_sql: str, threshold: float = MAD_THRESHOLD) -> str:
    return f"""
WITH deduped AS ({bronze_dedup_sql}),
med AS (
    SELECT metric,
           floor(quantile_cont(value, 0.5) * 1000000.0 + 0.5) / 1000000.0
               AS med_value
    FROM deduped GROUP BY metric
),
mad AS (
    SELECT d.metric, min(m.med_value) AS med_value,
           floor(quantile_cont(abs(d.value - m.med_value), 0.5) * 1000000.0 + 0.5)
               / 1000000.0 AS mad_value
    FROM deduped d JOIN med m USING (metric)
    GROUP BY d.metric
)
SELECT d.event_id, d.metric, d.value, s.med_value, s.mad_value,
       floor({MAD_K} * (d.value - s.med_value)
             / greatest(s.mad_value, 1e-9) * 10000.0 + 0.5) / 10000.0 AS robust_z,
       abs(floor({MAD_K} * (d.value - s.med_value)
                 / greatest(s.mad_value, 1e-9) * 10000.0 + 0.5) / 10000.0)
           > {threshold} AS is_anomaly
FROM deduped d JOIN mad s USING (metric)
"""


# --------------------------------------------------------------------------
# per-metric terminal league table (window-rank report)
# --------------------------------------------------------------------------

RANK_NTILES = 4


def metric_rank_report(bronze_deduped: DataFrame, n_tiles: int = RANK_NTILES) -> DataFrame:
    """League table: every terminal ranked within its metric by total
    reading volume — dense rank, percentile position, and quartile
    bucket.  The per-entity-standings view an operations dashboard
    reads next to the :func:`latest` serving table.

    Shape: one partial-agg shuffle (metric, serial) reduces the fact
    to entity cardinality; the three window functions then share ONE
    metric-keyed sort over that reduced frame (all use the same window
    spec, so Catalyst plans a single exchange + sort).  The ordering
    ties on serial after total_value, making every rank column fully
    deterministic across engines and partitionings.
    """
    from pyspark.sql import Window

    per_entity = bronze_deduped.groupBy("metric", "serial").agg(
        floor_round(F.sum("value"), 6).alias("total_value"),
        F.count(F.lit(1)).alias("n_readings"),
    )
    w = Window.partitionBy("metric").orderBy(F.col("total_value").desc(), "serial")
    return per_entity.select(
        "metric",
        "serial",
        "total_value",
        "n_readings",
        F.dense_rank().over(w).cast("long").alias("rank_in_metric"),
        floor_round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.ntile(n_tiles).over(w).cast("long").alias("quartile"),
    )


def metric_rank_report_oracle(bronze_dedup_sql: str, n_tiles: int = RANK_NTILES) -> str:
    return f"""
WITH deduped AS ({bronze_dedup_sql}),
per_entity AS (
    SELECT metric, serial,
           floor(sum(value) * 1000000.0 + 0.5) / 1000000.0 AS total_value,
           count(*) AS n_readings
    FROM deduped GROUP BY 1, 2
)
SELECT metric, serial, total_value, n_readings,
       CAST(dense_rank() OVER w AS BIGINT) AS rank_in_metric,
       floor(percent_rank() OVER w * 1000000.0 + 0.5) / 1000000.0 AS pct_rank,
       CAST(ntile({n_tiles}) OVER w AS BIGINT) AS quartile
FROM per_entity
WINDOW w AS (PARTITION BY metric ORDER BY total_value DESC, serial)
"""


# --------------------------------------------------------------------------
# per-metric value-distribution histogram
# --------------------------------------------------------------------------

HIST_BUCKETS = 10


def value_histogram(bronze_deduped: DataFrame, n_buckets: int = HIST_BUCKETS) -> DataFrame:
    """Equal-width value histogram per metric — the distribution
    profile a dashboard renders next to :func:`percentile_rollup`.

    Bucket edges come from each metric's [min, max] (a metric-
    cardinality aggregate broadcast back, same pattern as
    :func:`anomaly_zscore`); bucket index is pure arithmetic
    ``floor((v - min) / width)`` clamped so v == max lands in the top
    bucket.  Degenerate metrics (min == max) collapse to bucket 0.
    One partial-agg shuffle per pass; the fact never sorts.
    """
    bounds = bronze_deduped.groupBy("metric").agg(
        floor_round(F.min("value"), 6).alias("lo"),
        floor_round(F.max("value"), 6).alias("hi"),
    )
    j = bronze_deduped.select("metric", "value").join(F.broadcast(bounds), "metric")
    width = (F.col("hi") - F.col("lo")) / n_buckets
    raw_idx = F.floor((F.col("value") - F.col("lo")) / width)
    # clamp BOTH ends: lo is rounded to 6dp and can exceed the true min
    # by up to 5e-7, which would push a minimum-value row to bucket -1
    idx = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.greatest(F.least(raw_idx, F.lit(n_buckets - 1)), F.lit(0))
    )
    return (
        j.withColumn("bucket", idx.cast("long"))
        .groupBy("metric", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            floor_round(F.min("value"), 6).alias("bucket_min"),
            floor_round(F.max("value"), 6).alias("bucket_max"),
        )
    )


def value_histogram_oracle(bronze_dedup_sql: str, n_buckets: int = HIST_BUCKETS) -> str:
    return f"""
WITH deduped AS ({bronze_dedup_sql}),
bounds AS (
    SELECT metric, floor(min(value) * 1000000.0 + 0.5) / 1000000.0 AS lo,
           floor(max(value) * 1000000.0 + 0.5) / 1000000.0 AS hi
    FROM deduped GROUP BY 1
)
SELECT d.metric,
       CAST(CASE WHEN b.hi = b.lo THEN 0
            ELSE greatest(least(floor((d.value - b.lo) / ((b.hi - b.lo) / {n_buckets})),
                          {n_buckets - 1}), 0) END AS BIGINT) AS bucket,
       count(*) AS n_points,
       floor(min(d.value) * 1000000.0 + 0.5) / 1000000.0 AS bucket_min,
       floor(max(d.value) * 1000000.0 + 0.5) / 1000000.0 AS bucket_max
FROM deduped d JOIN bounds b USING (metric)
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# per-series cumulative running total
# --------------------------------------------------------------------------


def cumulative_metric(bronze_deduped: DataFrame) -> DataFrame:
    """Running total of readings per (serial, metric) in event-time
    order — the lifetime-usage accumulation the reference derives from
    counters (``Step 04-04b ….scala:175-200`` sums constituents; this
    is the time-cumulative companion served next to counter→rate).

    Shape: one hash shuffle on the series key + in-partition sort —
    identical cost class to :func:`counter_rate`'s lag window; no
    global ordering.  The frame order ties on event_id, so the
    running-sum sequence (and its 6dp rounding) is deterministic
    across engines and partitionings.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy("serial", "metric")
        .orderBy("unix_ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return bronze_deduped.select(
        "serial",
        "metric",
        "event_id",
        "unix_ts",
        "value",
        floor_round(F.sum("value").over(w), 6).alias("running_total"),
        F.row_number()
        .over(Window.partitionBy("serial", "metric").orderBy("unix_ts", "event_id"))
        .cast("long")
        .alias("reading_seq"),
    )


def cumulative_metric_oracle(bronze_dedup_sql: str) -> str:
    return f"""
WITH deduped AS ({bronze_dedup_sql})
SELECT serial, metric, event_id, unix_ts, value,
       floor(sum(value) OVER w * 1000000.0 + 0.5) / 1000000.0 AS running_total,
       CAST(row_number() OVER w2 AS BIGINT) AS reading_seq
FROM deduped
WINDOW w AS (PARTITION BY serial, metric ORDER BY unix_ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       w2 AS (PARTITION BY serial, metric ORDER BY unix_ts, event_id)
"""


# --------------------------------------------------------------------------
# metric correlation matrix
# --------------------------------------------------------------------------


def metric_correlation(bronze_deduped: DataFrame) -> DataFrame:
    """Pairwise Pearson correlation between metrics over their daily
    per-terminal sums — the cross-signal diagnostic read next to the
    anomaly flags (correlated metrics alarm together; a correlation
    break is itself a signal).

    Shape: the wide frame is the same literal-vocabulary conditional
    aggregation as :func:`pivot_metrics` (ONE partial-agg shuffle);
    all M·(M−1)/2 correlations then compute in ONE aggregate pass over
    it (corr's co-moments combine map-side), unpivoted with a map-only
    ``stack``.  Inputs to corr are the 6dp-rounded sums, so both
    engines correlate identical numbers; the result rounds to 6dp to
    absorb accumulation-order residue.  NULL days (metric absent for a
    terminal) are skipped pairwise by corr in both engines.
    """
    # the serving pivot IS the wide frame — one definition, so a change
    # to the pivot (vocabulary, rounding form) can't silently diverge
    # the correlation inputs from the served table
    wide = pivot_metrics(bronze_deduped)
    names = list(METRIC_NAMES)
    aggs, stack_parts = [], []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            key = f"{a}__{b}"
            aggs.append(floor_round(F.corr(a, b), 6).alias(f"c_{key}"))
            aggs.append(
                F.count(
                    F.when(F.col(a).isNotNull() & F.col(b).isNotNull(), 1)
                ).alias(f"n_{key}")
            )
            stack_parts.append(f"'{a}', '{b}', c_{key}, n_{key}")
    n_pairs = len(stack_parts)
    return wide.agg(*aggs).select(
        F.expr(
            f"stack({n_pairs}, " + ", ".join(stack_parts)
            + ") as (metric_a, metric_b, corr, n_days)"
        )
    )


def metric_correlation_oracle(bronze_dedup_sql: str) -> str:
    names = list(METRIC_NAMES)
    cols = ",\n       ".join(
        f"floor(sum(CASE WHEN metric = '{m}' THEN value END) * 1000000.0 + 0.5) / 1000000.0 AS {m}"
        for m in names
    )
    selects = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            selects.append(
                f"SELECT '{a}' AS metric_a, '{b}' AS metric_b, "
                f"floor(corr({a}, {b}) * 1000000.0 + 0.5) / 1000000.0 AS corr, "
                f"count(CASE WHEN {a} IS NOT NULL AND {b} IS NOT NULL THEN 1 END) AS n_days "
                f"FROM wide"
            )
    return f"""
WITH deduped AS ({bronze_dedup_sql}),
wide AS (
    SELECT serial, datestamp,
       {cols}
    FROM deduped
    GROUP BY serial, datestamp
)
{" UNION ALL ".join(selects)}
"""


# --------------------------------------------------------------------------
# finite-horizon EWMA smoothing (bounded-state exponential smoothing)
# --------------------------------------------------------------------------

#: smoothing factor and trailing horizon: weights below a*(1-a)^19
#: (~0.05% of mass at alpha 0.3) are truncated — the bounded-state
#: form a streaming smoother keeps per series
EWMA_ALPHA = 0.3
EWMA_HORIZON = 20

#: weight constants shared VERBATIM by the Spark expression and the
#: SQL oracle, so both engines multiply the identical IEEE doubles
#: (pow() at plan time could differ in the last ulp and flip a 6dp
#: rounding boundary)
_EWMA_POW = [(1.0 - EWMA_ALPHA) ** j for j in range(EWMA_HORIZON)]
_EWMA_APOW = [EWMA_ALPHA * p for p in _EWMA_POW]


def ewma_smooth(bronze_deduped: DataFrame) -> DataFrame:
    """Per-series exponentially weighted moving average — the standard
    telemetry smoother (adjust=False recursion ``e_t = a*x_t +
    (1-a)*e_{t-1}``, seeded with the first reading), evaluated over a
    bounded trailing horizon of :data:`EWMA_HORIZON` rows so state
    stays O(1) per series at any scale.

    Within the horizon the value is EXACTLY the recursion: for a row
    whose trailing frame still reaches the series head, the first
    element carries the full seed weight ``(1-a)^(L-1)`` (adjust=False
    seeding); deeper rows truncate the tail below ~0.05% of the weight
    mass — the bounded-state trade every streaming EWMA makes.

    Spark shape: ONE series-keyed window (same single shuffle as every
    per-series operator here), ``collect_list`` over the ROWS frame,
    and the weighted sum unrolled into plan-time literals — whole-stage
    codegen, no UDF, no per-row Python.
    """
    K = EWMA_HORIZON
    w = (
        Window.partitionBy("serial", "metric")
        .orderBy("unix_ts")
        .rowsBetween(-(K - 1), Window.currentRow)
    )
    wn = Window.partitionBy("serial", "metric").orderBy("unix_ts")
    sub = bronze_deduped.select(
        "serial", "metric", "unix_ts", "value"
    ).withColumn("win", F.collect_list("value").over(w)).withColumn(
        "rn", F.row_number().over(wn)
    )
    L = F.size("win")
    head = F.col("rn") <= F.lit(K)  # frame reaches the series head
    apow = F.array(*[F.lit(x) for x in _EWMA_APOW])
    pow_ = F.array(*[F.lit(x) for x in _EWMA_POW])
    terms = None
    for i in range(1, K + 1):
        wgt = F.when(
            (F.lit(i) == 1) & head,
            F.element_at(pow_, L),  # seed weight (1-a)^(L-1)
        ).otherwise(F.element_at(apow, L - F.lit(i) + 1))
        t = F.when(L >= i, F.element_at("win", i) * wgt).otherwise(F.lit(0.0))
        terms = t if terms is None else terms + t
    return sub.select(
        "serial",
        "metric",
        "unix_ts",
        "value",
        # floor-form rounding (see floor_round): the summed terms are
        # bit-identical on both engines (same literals, same add
        # order), so the only cross-engine risk was the round()
        # midpoint convention — measured as a 1-row sf0.1 flip
        floor_round(terms, 6).alias("ewma"),
    )


def ewma_smooth_oracle(bronze_dedup_sql: str) -> str:
    K = EWMA_HORIZON
    # ::DOUBLE pins the literal type (DuckDB defaults decimal literals
    # to DECIMAL); repr() round-trips to the identical IEEE double
    apow = "[" + ", ".join(f"{x!r}::DOUBLE" for x in _EWMA_APOW) + "]"
    pow_ = "[" + ", ".join(f"{x!r}::DOUBLE" for x in _EWMA_POW) + "]"
    terms = []
    for i in range(1, K + 1):
        wgt = (
            f"CASE WHEN {i} = 1 AND rn <= {K} THEN ({pow_})[len(win)] "
            f"ELSE ({apow})[len(win) - {i} + 1] END"
        )
        terms.append(
            f"CASE WHEN len(win) >= {i} THEN win[{i}] * ({wgt}) ELSE 0.0 END"
        )
    expr = " + ".join(terms)
    return f"""
WITH deduped AS ({bronze_dedup_sql}),
sub AS (
    SELECT serial, metric, unix_ts, value,
           list(value) OVER (
               PARTITION BY serial, metric ORDER BY unix_ts
               ROWS BETWEEN {K - 1} PRECEDING AND CURRENT ROW
           ) AS win,
           row_number() OVER (
               PARTITION BY serial, metric ORDER BY unix_ts
           ) AS rn
    FROM deduped
)
SELECT serial, metric, unix_ts, value,
       floor(({expr}) * 1000000.0 + 0.5) / 1000000.0 AS ewma FROM sub
"""


# --------------------------------------------------------------------------
# OHLC downsampling (chart-resolution reduction)
# --------------------------------------------------------------------------


def downsample_ohlc(bronze_deduped: DataFrame, bucket_secs: int = 3600) -> DataFrame:
    """Downsample every (serial, metric) series to one OHLC row per
    time bucket — open/high/low/close + mean + count, the lossy
    resolution reduction a charting/serving layer stores instead of
    raw points (the M4/OHLC family of time-series downsamplers).

    One partial-agg shuffle on (serial, metric, bucket): open/close
    ride ``min_by``/``max_by`` on the timestamp — post-dedup unix_ts
    is unique within a series, so both are deterministic without a
    window pass.  min_by keeps the whole pipeline in HashAggregate
    with map-side combine (a min-over-struct formulation forces
    SortAggregate — an in-partition sort per side — because struct
    buffers are not hash-aggregable); no second scan, no sort.
    """
    bucket = (F.col("unix_ts") - F.col("unix_ts") % bucket_secs).alias("bucket_ts")
    return (
        bronze_deduped.groupBy("serial", "metric", bucket)
        .agg(
            F.min_by("value", "unix_ts").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "unix_ts").alias("close"),
            floor_round(F.avg("value"), 6).alias("mean"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def downsample_ohlc_oracle(bronze_dedup_sql: str, bucket_secs: int = 3600) -> str:
    return f"""
WITH deduped AS ({bronze_dedup_sql})
SELECT serial, metric,
       unix_ts - unix_ts % {bucket_secs} AS bucket_ts,
       arg_min(value, unix_ts) AS open,
       max(value) AS high,
       min(value) AS low,
       arg_max(value, unix_ts) AS close,
       floor(avg(value) * 1000000.0 + 0.5) / 1000000.0 AS mean,
       count(*) AS n
FROM deduped
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# CUSUM change-point detection
# --------------------------------------------------------------------------

#: CUSUM slack and alarm threshold, in units of the metric's stddev
#: (the classic k=sigma/2, h=5*sigma tuning from Page 1954 practice)
CUSUM_K = 0.5
CUSUM_H = 5.0


def cusum_changepoint(bronze_deduped: DataFrame) -> DataFrame:
    """Per-series tabular CUSUM drift detector (Page 1954): the
    one-sided statistics ``S+_t = max(0, S+_{t-1} + (x_t - mu - k*sigma))``
    / ``S-_t`` symmetric, alarming when either exceeds ``h*sigma`` —
    the change-point alarm a telemetry pipeline runs on counters whose
    MEAN shifts (device regression, config push) without any single
    reading being a z-score outlier.

    Spark-first shape — the sequential max(0, ·) recursion is NOT a
    fold here: by the prefix-sum identity ``S_t = cum_t -
    min(0, min_{j<=t} cum_j)`` it collapses to a running sum + running
    min over ONE series-keyed window (the same single shuffle every
    per-series operator takes, whole-stage codegen, no UDF, no
    collect_list state).  Per-metric moments come from one tiny
    broadcast aggregate, rounded 6dp BEFORE the cumsum so both engines
    accumulate identical doubles in identical order.
    """
    moments = bronze_deduped.groupBy("metric").agg(
        floor_round(F.avg("value"), 6).alias("mean_value"),
        floor_round(F.stddev_samp("value"), 6).alias("std_value"),
    )
    j = bronze_deduped.select("serial", "metric", "unix_ts", "value").join(
        F.broadcast(moments), "metric"
    )
    w = (
        Window.partitionBy("serial", "metric")
        .orderBy("unix_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the per-row drifts are accumulated as EXACT integers at 1e7 scale
    # (values have 2 decimals, rounded moments 6, k*sigma 7 — all exact
    # decimal integers at 1e7): running FP sums are association-order-
    # dependent and DuckDB's segment-tree window sum associates
    # differently than Spark's in-order accumulation, which flips 6dp
    # roundings; integer cumsums are bit-identical everywhere
    scale = 1e7
    d_pos = F.col("value") - F.col("mean_value") - F.lit(CUSUM_K) * F.col("std_value")
    d_neg = F.col("mean_value") - F.col("value") - F.lit(CUSUM_K) * F.col("std_value")
    # two window stages (cumsum, then running min of it) — Catalyst
    # merges same-spec Window operators, so the series still sorts once
    staged = j.select(
        "serial",
        "metric",
        "unix_ts",
        "value",
        "std_value",
        F.sum(F.round(d_pos * scale).cast("long")).over(w).alias("cum_pos"),
        F.sum(F.round(d_neg * scale).cast("long")).over(w).alias("cum_neg"),
    )
    # round at 7dp — the EXACT decimal precision of the integer-scaled
    # statistic (rounding to 6 would sit square on half-boundaries,
    # where Spark's shortest-repr HALF_UP and DuckDB's binary round
    # disagree); at 7dp both engines reproduce the identical decimal
    s_pos = F.round(
        (F.col("cum_pos") - F.least(F.min("cum_pos").over(w), F.lit(0).cast("long")))
        / F.lit(scale),
        7,
    )
    s_neg = F.round(
        (F.col("cum_neg") - F.least(F.min("cum_neg").over(w), F.lit(0).cast("long")))
        / F.lit(scale),
        7,
    )
    return staged.select(
        "serial",
        "metric",
        "unix_ts",
        "value",
        s_pos.alias("cusum_pos"),
        s_neg.alias("cusum_neg"),
        (
            (s_pos > F.lit(CUSUM_H) * F.col("std_value"))
            | (s_neg > F.lit(CUSUM_H) * F.col("std_value"))
        ).alias("is_change"),
    )


def cusum_changepoint_oracle(bronze_dedup_sql: str) -> str:
    k, h = CUSUM_K, CUSUM_H
    return f"""
WITH deduped AS ({bronze_dedup_sql}),
moments AS (
    SELECT metric,
           floor(avg(value) * 1000000.0 + 0.5) / 1000000.0 AS mean_value,
           floor(stddev_samp(value) * 1000000.0 + 0.5) / 1000000.0 AS std_value
    FROM deduped GROUP BY metric
),
staged AS (
    SELECT d.serial, d.metric, d.unix_ts, d.value, m.std_value,
           sum(CAST(round((d.value - m.mean_value - {k} * m.std_value) * 1e7) AS BIGINT))
               OVER w AS cum_pos,
           sum(CAST(round((m.mean_value - d.value - {k} * m.std_value) * 1e7) AS BIGINT))
               OVER w AS cum_neg
    FROM deduped d JOIN moments m USING (metric)
    WINDOW w AS (PARTITION BY d.serial, d.metric ORDER BY d.unix_ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
scored AS (
    SELECT serial, metric, unix_ts, value, std_value, cum_pos, cum_neg,
           min(cum_pos) OVER w2 AS run_min_pos,
           min(cum_neg) OVER w2 AS run_min_neg
    FROM staged
    WINDOW w2 AS (PARTITION BY serial, metric ORDER BY unix_ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT serial, metric, unix_ts, value,
       round((cum_pos - least(run_min_pos, 0)) / 1e7, 7) AS cusum_pos,
       round((cum_neg - least(run_min_neg, 0)) / 1e7, 7) AS cusum_neg,
       (round((cum_pos - least(run_min_pos, 0)) / 1e7, 7) > {h} * std_value
        OR round((cum_neg - least(run_min_neg, 0)) / 1e7, 7) > {h} * std_value)
           AS is_change
FROM scored
"""


# --------------------------------------------------------------------------
# approx-percentile audit (the 100 TB swap-in's accuracy contract)
# --------------------------------------------------------------------------

#: sketch accuracy for the audited swap-in; the audited claim is the
#: sketch's OWN documented guarantee — rank error <= 1/accuracy — plus
#: one rank of discreteness (the sketch returns an actual sample, the
#: exact percentile interpolates between order statistics)
APPROX_PCTL_ACCURACY = 10000


def approx_percentile_audit(
    bronze_deduped: DataFrame,
    accuracy: int = APPROX_PCTL_ACCURACY,
) -> DataFrame:
    """Driver-checkable audit of the ``approx_percentile`` swap-in the
    percentile rollup documents for 100 TB: per (metric, datestamp),
    the EXACT p50/p95/p99 plus a ``within_tol`` flag asserting every
    sketch estimate honors the sketch's contract IN RANK SPACE —
    the fraction of group values below/at the estimate brackets the
    target quantile within ``1/accuracy + 1/n`` (rank error plus one
    rank of sample-vs-interpolation discreteness; a value-space
    tolerance would be a lie at small n, where adjacent order
    statistics in the tail sit several percent apart).

    Same gate shape as ``rollup.approx_distinct_audit``: the sketch
    values are engine-specific and stay OUT of the output; the group
    set, exact values, and the in-contract claim are what the oracle
    hash-compares (literal TRUE — one out-of-contract estimate
    mismatches the row).  Cost: the one grouped aggregate both paths
    share, plus a broadcast of the group-cardinality estimates back
    onto the fact for the rank counts — the fact shuffles on the same
    key twice, never more."""
    qs = [0.5, 0.95, 0.99]
    aggs = [F.count(F.lit(1)).alias("n_points")]
    for q in qs:
        tag = f"p{int(q * 100)}"
        # floor-form: dyadic values interpolated at g = k/100 reach
        # exact 6dp midpoints, where engine round() modes diverge
        aggs.append(floor_round(F.percentile("value", q), 6).alias(f"{tag}_exact"))
        aggs.append(
            F.approx_percentile("value", q, accuracy).alias(f"_{tag}_approx")
        )
    # materialize the group-cardinality estimate frame ONCE — it feeds
    # both the broadcast into the rank counts and the final join, and
    # without the pin each branch would re-run the full fact aggregate
    est = (
        bronze_deduped.groupBy("metric", "datestamp")
        .agg(*aggs)
        .localCheckpoint(eager=True)
    )
    joined = bronze_deduped.select("metric", "datestamp", "value").join(
        F.broadcast(est), ["metric", "datestamp"]
    )
    rank_aggs = []
    for q in qs:
        tag = f"p{int(q * 100)}"
        rank_aggs.append(
            F.sum(
                F.when(F.col("value") < F.col(f"_{tag}_approx"), 1).otherwise(0)
            ).alias(f"_{tag}_lt")
        )
        rank_aggs.append(
            F.sum(
                F.when(F.col("value") <= F.col(f"_{tag}_approx"), 1).otherwise(0)
            ).alias(f"_{tag}_le")
        )
    ranks = joined.groupBy("metric", "datestamp").agg(*rank_aggs)
    df = est.join(ranks, ["metric", "datestamp"])
    slack = F.lit(1.0 / accuracy) + 1.0 / F.col("n_points")
    ok = None
    for q in qs:
        tag = f"p{int(q * 100)}"
        this = (
            (F.col(f"_{tag}_lt") / F.col("n_points") <= F.lit(q) + slack)
            & (F.col(f"_{tag}_le") / F.col("n_points") >= F.lit(q) - slack)
        )
        ok = this if ok is None else (ok & this)
    return df.select(
        "metric",
        "datestamp",
        "n_points",
        "p50_exact",
        "p95_exact",
        "p99_exact",
        ok.alias("within_tol"),
    )


def approx_percentile_audit_oracle(bronze_dedup_sql: str) -> str:
    return f"""
WITH deduped AS ({bronze_dedup_sql})
SELECT metric, datestamp,
       count(*) AS n_points,
       floor(quantile_cont(value, 0.5)  * 1000000.0 + 0.5) / 1000000.0 AS p50_exact,
       floor(quantile_cont(value, 0.95) * 1000000.0 + 0.5) / 1000000.0 AS p95_exact,
       floor(quantile_cont(value, 0.99) * 1000000.0 + 0.5) / 1000000.0 AS p99_exact,
       TRUE AS within_tol
FROM deduped
GROUP BY metric, datestamp
"""


# --------------------------------------------------------------------------
# per-series linear trend report
# --------------------------------------------------------------------------

#: |rounded slope| below this (per day) classifies as 'flat'
TREND_EPS = 0.05


def trend_report(bronze_deduped: DataFrame) -> DataFrame:
    """Per (serial, metric) linear trend over the daily value sums —
    the capacity-planning / drift question the point-anomaly family
    doesn't answer: is this series going somewhere?  OLS slope per
    day, intercept, r² and a rising/flat/falling classification.

    Shape: daily micro-unit sums first (ONE key-partitioned
    partial-agg shuffle — the fact never reaches the regression),
    then closed-form regression from EXACT INTEGER moment sums
    (map-side partial) over the dimension-sized daily frame.  Engine
    parity goes a step BEYOND the `metric_correlation` round-6dp
    discipline — see the inline comment: regression ratios routinely
    land exactly ON rounding boundaries, where Spark's HALF_UP and
    DuckDB's rounding disagree, so the value quantizes to integer
    micro-units PER ROW (row-level rounding has no accumulation order
    to disagree on — unlike `round(sum(value), 6)`, whose float sum
    is partition-order-dependent and can itself straddle a 6dp
    boundary), every moment accumulates as an exact 128-bit integer,
    and slope / intercept / r² derive from those identical integers
    through identical double arithmetic — bit-equal outputs with no
    rounding step at all.  The moment COMBINATION (n·Σxy − Σx·Σy
    etc.) happens in DOUBLE over the exact sums: still deterministic
    (identical inputs, identical expression), and immune to the
    decimal-width overflow a 128-bit product would hit once
    |Σy_micro| ≥ 1e19.  Zero-variance y gives r² = 0; series with a
    single day report NULL slope/intercept and flat.

    The regressor is the day index CENTERED on each series' first day
    (a window min over the dimension-sized daily frame): with raw
    epoch-day x ≈ 19.7k the intercept extrapolates ~2e4 days back and
    its catastrophic cancellation overwhelms 6dp rounding (observed:
    the two engines' intercepts differed in the 6th decimal at 1e5
    magnitude); centered, the intercept IS the fitted value at series
    start — small, stable, and the more useful number.
    """
    from pyspark.sql import Window

    # exact integer-scaled accumulation (the CUSUM discipline,
    # hardened further): float co-moment aggregates (var/covar/regr_*)
    # accumulate in engine- and partition-order-dependent ways, and
    # 6dp output rounding cannot absorb the residue when the true
    # value sits ON a rounding boundary — observed: an intercept of
    # exactly 105.0390625 (a dyadic rational, typical of the
    # small-denominator ratios regression produces) rounds HALF_UP in
    # Spark and half-even in DuckDB.  The value quantizes to micro-
    # units at the ROW level (order-independent), daily sums and every
    # regression moment are then EXACT integer sums (DECIMAL(38,0)
    # here, HUGEINT in the oracle); ANSI single-point groups are
    # guarded (denominator 0 -> NULL slope, flat), where regr_slope
    # would raise DIVIDE_BY_ZERO.
    # CAPACITY BOUND (explicit, not accidental): yv must stay within
    # DECIMAL(18,0) because the syy moment squares it — (18,0)×(18,0)
    # is the widest product Spark's 38-digit decimals hold exactly, so
    # a per-series-DAY value sum is bounded at |sum| < 1e12 (1e18
    # micro-units).  Beyond it Spark nulls the cast (non-ANSI) while
    # the oracle's HUGEINT keeps going — if a deployment's daily sums
    # can cross 1e12, pre-scale `value` or aggregate at a finer grain;
    # exactness (bit-identical moments) is the contract being bought.
    row_micro = F.round(F.col("value") * 1_000_000).cast("decimal(18,0)")
    daily = (
        bronze_deduped.groupBy("serial", "metric", "datestamp")
        .agg(F.sum(row_micro).cast("decimal(18,0)").alias("yv"))
        .withColumn(
            "day_idx",
            (F.unix_timestamp("datestamp", "yyyy-MM-dd") / 86400).cast("bigint"),
        )
    )
    w0 = Window.partitionBy("serial", "metric")
    ivals = daily.withColumn(
        "x0", F.col("day_idx") - F.min("day_idx").over(w0)
    ).select("serial", "metric", "x0", "yv")
    n = F.count(F.lit(1))
    moments = ivals.groupBy("serial", "metric").agg(
        n.cast("bigint").alias("n_days"),
        F.sum("x0").cast("bigint").alias("sx"),
        F.sum(F.col("x0") * F.col("x0")).cast("bigint").alias("sxx"),
        F.sum("yv").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("yv") * F.col("yv")).cast("decimal(38,0)").alias("syy"),
        F.sum(F.col("yv") * F.col("x0")).cast("decimal(38,0)").alias("sxy"),
    )
    # combine the exact sums in DOUBLE: deterministic (identical
    # inputs, identical expression both engines) and overflow-free
    # where a decimal(38) x decimal(38) product would silently
    # saturate once |sy| >= 1e19
    nd = F.col("n_days").cast("double")
    sx_d = F.col("sx").cast("double")
    sy_d = F.col("sy").cast("double")
    num = nd * F.col("sxy").cast("double") - sx_d * sy_d
    denx = nd * F.col("sxx").cast("double") - sx_d * sx_d
    deny = nd * F.col("syy").cast("double") - sy_d * sy_d
    slope_micro = F.when(denx > 0, num / denx)
    reg = moments.select(
        "serial",
        "metric",
        "n_days",
        (slope_micro / 1e6).alias("slope_per_day"),
        (
            (
                F.col("sy").cast("double")
                - slope_micro * F.col("sx").cast("double")
            )
            / F.col("n_days").cast("double")
            / 1e6
        ).alias("intercept"),
        F.coalesce(
            F.when((denx > 0) & (deny > 0), (num * num) / (denx * deny)),
            F.lit(0.0),
        ).alias("r2"),
    )
    return reg.select(
        "serial",
        "metric",
        "n_days",
        "slope_per_day",
        "intercept",
        "r2",
        F.when(F.col("slope_per_day").isNull(), "flat")
        .when(F.col("slope_per_day") > TREND_EPS, "rising")
        .when(F.col("slope_per_day") < -TREND_EPS, "falling")
        .otherwise("flat")
        .alias("trend"),
    )


def trend_report_oracle(bronze_dedup_sql: str) -> str:
    return f"""
WITH deduped AS ({bronze_dedup_sql}),
daily AS (
    SELECT serial, metric, datestamp,
           CAST(sum(CAST(round(value * 1000000) AS HUGEINT)) AS HUGEINT) AS yv,
           CAST(epoch(strptime(datestamp, '%Y-%m-%d')) // 86400 AS BIGINT)
               AS day_idx
    FROM deduped
    GROUP BY serial, metric, datestamp
),
centered AS (
    SELECT serial, metric, yv,
           CAST(day_idx - min(day_idx)
                    OVER (PARTITION BY serial, metric) AS HUGEINT) AS x0
    FROM daily
),
moments AS (
    SELECT serial, metric,
           CAST(count(*) AS BIGINT) AS n_days,
           sum(x0) AS sx, sum(x0 * x0) AS sxx,
           sum(yv) AS sy, sum(yv * yv) AS syy,
           sum(yv * x0) AS sxy
    FROM centered
    GROUP BY serial, metric
),
terms AS (
    SELECT serial, metric, n_days,
           CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
           CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS denx,
           CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS deny,
           CAST(sy AS DOUBLE) AS sy_d, CAST(sx AS DOUBLE) AS sx_d,
           CAST(n_days AS DOUBLE) AS n_d
    FROM moments
),
reg AS (
    SELECT serial, metric, n_days,
           (CASE WHEN denx > 0 THEN num / denx END) / 1000000.0
               AS slope_per_day,
           ((sy_d - (CASE WHEN denx > 0 THEN num / denx END) * sx_d) / n_d)
               / 1000000.0 AS intercept,
           coalesce(CASE WHEN denx > 0 AND deny > 0
                         THEN (num * num) / (denx * deny) END, 0.0) AS r2
    FROM terms
)
SELECT serial, metric, n_days, slope_per_day, intercept, r2,
       CASE WHEN slope_per_day IS NULL THEN 'flat'
            WHEN slope_per_day > {TREND_EPS} THEN 'rising'
            WHEN slope_per_day < -{TREND_EPS} THEN 'falling'
            ELSE 'flat' END AS trend
FROM reg
"""
