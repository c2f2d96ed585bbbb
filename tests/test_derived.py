"""Derived-signal operators: rate, rolling mean, z-score, percentiles,
pivot; plus the as-of / range joins and the partition-stats index."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from telemetry_streaming_datalake_spark.ingest import bronze as B
from telemetry_streaming_datalake_spark.operators import derived as DV
from telemetry_streaming_datalake_spark.operators import temporal as T
from telemetry_streaming_datalake_spark.session import load_table
from telemetry_streaming_datalake_spark.storage import stats as ST

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def deduped(spark, events):
    return B.dedup_exact(B.parse_bronze(events)).cache()


def test_counter_rate_literal(spark):
    df = spark.createDataFrame(
        [
            Row(serial="a", metric="m", unix_ts=0, value=10.0),
            Row(serial="a", metric="m", unix_ts=10, value=15.0),
            Row(serial="a", metric="m", unix_ts=30, value=14.0),
            Row(serial="b", metric="m", unix_ts=5, value=1.0),
        ]
    )
    rows = {(r.serial, r.unix_ts): r for r in DV.counter_rate(df).collect()}
    # first reading of each series is dropped
    assert ("a", 0) not in rows and ("b", 5) not in rows
    assert rows[("a", 10)].rate_per_sec == pytest.approx(0.5)
    assert rows[("a", 10)].delta_secs == 10
    assert rows[("a", 30)].rate_per_sec == pytest.approx(-0.05)


def test_rolling_avg_range_frame(spark):
    df = spark.createDataFrame(
        [
            Row(serial="a", metric="m", unix_ts=0, value=2.0),
            Row(serial="a", metric="m", unix_ts=3000, value=4.0),
            # 7000 is outside [3400, 7000]'s... window is [ts-3600, ts]
            Row(serial="a", metric="m", unix_ts=7000, value=6.0),
        ]
    )
    rows = {r.unix_ts: r for r in DV.rolling_avg(df).collect()}
    assert rows[0].rolling_avg == pytest.approx(2.0)
    assert rows[3000].rolling_avg == pytest.approx(3.0)  # 0 and 3000 in range
    assert rows[7000].rolling_avg == pytest.approx(6.0)  # 3000 aged out (Δ=4000s)
    assert rows[7000].n_in_window == 1


def test_anomaly_zscore_flags_outlier(spark):
    base = [Row(event_id=i, metric="m", value=1.0 + (i % 2) * 0.1) for i in range(20)]
    out = [Row(event_id=99, metric="m", value=50.0)]
    df = spark.createDataFrame(base + out)
    res = {r.event_id: r for r in DV.anomaly_zscore(df).collect()}
    assert res[99].is_anomaly
    assert not res[0].is_anomaly
    assert res[99].zscore > 3


def test_percentile_rollup_exact(spark):
    df = spark.createDataFrame(
        [Row(metric="m", datestamp="d", value=float(v)) for v in range(1, 101)]
    )
    row = DV.percentile_rollup(df).collect()[0]
    assert row.n_points == 100
    assert row.p50 == pytest.approx(50.5)
    assert row.p95 == pytest.approx(95.05)


def test_pivot_metrics_columns(deduped):
    wide = DV.pivot_metrics(deduped)
    assert wide.columns == ["serial", "datestamp", *DV.METRIC_NAMES]
    # sum of a metric column equals the filtered sum from the long table
    total_click = wide.agg(F.sum("click")).first()[0]
    expect = (
        deduped.filter(F.col("metric") == "click").agg(F.round(F.sum("value"), 2)).first()[0]
    )
    assert total_click == pytest.approx(expect, abs=0.1)


def test_asof_join_picks_latest_prior(spark):
    left = spark.createDataFrame(
        [Row(k=1, t=10), Row(k=1, t=25), Row(k=1, t=4), Row(k=2, t=10)]
    ).select(F.col("k").alias("key"), F.col("t").alias("ts"))
    right = spark.createDataFrame(
        [Row(k=1, t=5, v="a"), Row(k=1, t=20, v="b"), Row(k=3, t=1, v="z")]
    ).select(F.col("k").alias("key"), F.col("t").alias("rts"), "v")
    res = T.asof_join(left, right, key="key", left_ts="ts", right_ts="rts", right_cols=["v"])
    got = {(r.key, r.ts): r.v for r in res.collect()}
    assert got[(1, 10)] == "a"   # 5 <= 10 < 20
    assert got[(1, 25)] == "b"   # latest prior is 20
    assert got[(1, 4)] is None   # before first right row
    assert got[(2, 10)] is None  # key never on right side


def test_asof_join_null_right_column_same_row(spark):
    """All attached attributes must come from the SINGLE as-of row —
    a legitimately-NULL column must not fall back to an older right row
    while its siblings take the newest."""
    left = spark.createDataFrame([Row(key=1, ts=25)])
    right = spark.createDataFrame(
        [Row(key=1, rts=5, v="old", w="x"), Row(key=1, rts=20, v=None, w="y")]
    )
    res = T.asof_join(
        left, right, key="key", left_ts="ts", right_ts="rts", right_cols=["v", "w"]
    )
    row = res.collect()[0]
    assert row.w == "y"
    assert row.v is None  # NOT "old" — ASOF returns the row including its NULLs


def test_asof_join_inclusive_bound(spark):
    left = spark.createDataFrame([Row(key=1, ts=10)])
    right = spark.createDataFrame([Row(key=1, rts=10, v="same")])
    res = T.asof_join(left, right, key="key", left_ts="ts", right_ts="rts", right_cols=["v"])
    assert res.collect()[0].v == "same"  # rts <= ts is inclusive


def test_asof_latest_order_sf(spark):
    ev = load_table(spark, SF_DIR, "events")
    orders = load_table(spark, SF_DIR, "orders")
    res = T.asof_latest_order(ev, orders)
    assert res.count() > 0
    # spot-check one event against a driver-side computation
    sample = res.limit(1).collect()[0]
    o = [
        r
        for r in orders.select(
            "o_custkey", "o_orderkey", F.unix_timestamp("o_orderdate").alias("ots")
        ).collect()
        if r.o_custkey == int(sample.user_id) and r.ots <= sample.unix_ts
    ]
    best_ts = max(r.ots for r in o)
    best_key = max(r.o_orderkey for r in o if r.ots == best_ts)
    assert sample.o_orderkey == best_key


def test_order_window_activity_zero_rows_survive(spark):
    ev = load_table(spark, SF_DIR, "events")
    orders = load_table(spark, SF_DIR, "orders")
    res = T.order_window_activity(ev, orders)
    assert res.count() == orders.count()  # left join: every order present
    assert res.filter(F.col("n_events") == 0).count() > 0


def test_partition_stats_and_pruning(deduped):
    st = ST.partition_stats(deduped).cache()
    assert st.count() == deduped.select("datestamp").distinct().count()
    total = st.agg(F.sum("n_rows")).first()[0]
    assert total == deduped.count()
    lo = st.agg(F.min("min_unix_ts")).first()[0]
    keep = ST.prune_by_ts(st, lo, lo + 1)
    # a 1-second probe interval must prune to at most a few partitions
    assert 1 <= keep.count() < st.count()


def test_gapfill_hourly_locf(spark):
    from telemetry_streaming_datalake_spark.operators.derived import gapfill_hourly

    df = spark.createDataFrame(
        [
            Row(serial="a", metric="m", unix_ts=0, value=1.0),
            Row(serial="a", metric="m", unix_ts=3600 * 3, value=4.0),
        ]
    )
    rows = {r.bucket_ts: r for r in gapfill_hourly(df).collect()}
    # dense spine: 4 buckets 0..3h, the middle two filled with LOCF
    assert sorted(rows) == [0, 3600, 7200, 10800]
    assert rows[3600].value_locf == 1.0 and rows[3600].is_filled
    assert rows[7200].value_locf == 1.0 and rows[7200].n_obs == 0
    assert rows[10800].value_locf == 4.0 and not rows[10800].is_filled


def test_incremental_rollup_boundary_bucket_merges(spark, events, customer):
    """The cutoff is mid-hour, so the boundary hour bucket must take
    rows from BOTH the stored partials and the delta — and still equal
    the from-scratch rollup exactly."""
    from telemetry_streaming_datalake_spark import datamodel as dm
    from telemetry_streaming_datalake_spark.ingest import silver as S
    from telemetry_streaming_datalake_spark.operators import rollup as R
    from telemetry_streaming_datalake_spark.operators import temporal as TT

    silver = S.to_silver(B.dedup_exact(B.parse_bronze(events)), dm.metric_mapping(spark))
    gold = TT.enrich_gold(silver, dm.remote_history(spark, customer)).cache()
    mid = int(gold.agg(F.expr("percentile(unix_ts, 0.5)")).first()[0])
    cutoff = (mid - mid % 3600) + 1800  # mid-hour
    inc = R.incremental_rollup_hour(gold, cutoff)
    full = R.rollup_hour(gold)
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, full.collect()))
    # the boundary bucket exists on both sides of the cutoff
    b = cutoff - cutoff % 3600
    pre = gold.filter((F.col("unix_ts") >= b) & (F.col("unix_ts") < cutoff)).count()
    post = gold.filter((F.col("unix_ts") >= cutoff) & (F.col("unix_ts") < b + 3600)).count()
    assert pre > 0 and post > 0


def test_anomaly_mad_is_robust_to_the_outlier_itself(spark):
    """The property that motivates MAD over mean/stddev: one huge
    outlier must not drag the center/scale enough to mask itself."""
    from telemetry_streaming_datalake_spark.ingest import bronze as B
    from telemetry_streaming_datalake_spark.operators import derived as DV
    import datetime

    rows = [(i, datetime.datetime(2024, 1, 10, 0, i), 1, "click", 10.0 + (i % 5) * 0.1, '{"k":1}')
            for i in range(20)]
    rows.append((99, datetime.datetime(2024, 1, 10, 1, 0), 1, "click", 10000.0, '{"k":1}'))
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = {r.event_id: r for r in DV.anomaly_mad(B.dedup_exact(B.parse_bronze(events))).collect()}
    assert out[99].is_anomaly
    assert not any(out[i].is_anomaly for i in range(20))
    # median/MAD sit in the bulk, unmoved by the outlier
    assert 9.9 <= out[99].med_value <= 10.5


def test_metric_correlation_matches_numpy(spark):
    import datetime

    import numpy as np

    from telemetry_streaming_datalake_spark.ingest import bronze as B
    from telemetry_streaming_datalake_spark.operators import derived as DV

    # two serials, two days; click and view perfectly correlated for
    # the constructed sums, error anti-correlated with click
    rows = []
    i = 0
    data = {
        ("s1", 1): {"click": 1.0, "view": 2.0, "error": 4.0},
        ("s1", 2): {"click": 2.0, "view": 4.0, "error": 3.0},
        ("s2", 1): {"click": 3.0, "view": 6.0, "error": 2.0},
        ("s2", 2): {"click": 4.0, "view": 8.0, "error": 1.0},
    }
    for (serial, day), metrics in data.items():
        for m, v in metrics.items():
            rows.append(
                (i, datetime.datetime(2024, 1, day, 0, 0, i % 60), int(serial[1]), m, v, "{}")
            )
            i += 1
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ded = B.dedup_exact(B.parse_bronze(spark.createDataFrame(rows, schema)))
    out = {
        (r.metric_a, r.metric_b): r
        for r in DV.metric_correlation(ded).collect()
    }
    cl = [1.0, 2.0, 3.0, 4.0]
    er = [4.0, 3.0, 2.0, 1.0]
    assert out[("click", "view")].corr == 1.0
    assert out[("click", "error")].corr == round(float(np.corrcoef(cl, er)[0, 1]), 6)
    assert out[("click", "view")].n_days == 4
    # metrics never observed → NULL corr, 0 overlapping days
    assert out[("purchase", "signup")].corr is None
    assert out[("purchase", "signup")].n_days == 0


def test_ewma_matches_pandas_recursion_within_horizon(spark):
    """Within the trailing horizon the finite-horizon EWMA must equal
    the exact adjust=False recursion (pandas ewm reference); series
    shorter than the horizon match everywhere."""
    import pandas as pd

    from telemetry_streaming_datalake_spark.operators import derived as DV

    vals = [5.0, 9.0, 2.0, 7.0, 7.0, 1.0, 4.0, 8.0, 3.0, 6.0]
    rows = [
        (i, f"2024-01-01 00:{i:02d}:00", 1, "m", v, "{}")
        for i, v in enumerate(vals)
    ]
    from telemetry_streaming_datalake_spark.ingest import bronze as B

    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    ded = B.dedup_exact(B.parse_bronze(df))
    got = {
        r.unix_ts: r.ewma
        for r in DV.ewma_smooth(ded).collect()
    }
    want = pd.Series(vals).ewm(alpha=DV.EWMA_ALPHA, adjust=False).mean()
    got_ordered = [got[k] for k in sorted(got)]
    for g, w in zip(got_ordered, want):
        assert abs(g - w) < 1e-6, (g, w)


def test_downsample_ohlc_semantics(spark):
    """open/close are the bucket's chronologically first/last values;
    high/low the extremes; one row per (series, bucket)."""
    from telemetry_streaming_datalake_spark.ingest import bronze as B
    from telemetry_streaming_datalake_spark.operators import derived as DV

    rows = [
        (0, "2024-01-01 00:05:00", 1, "m", 10.0, "{}"),
        (1, "2024-01-01 00:20:00", 1, "m", 99.0, "{}"),
        (2, "2024-01-01 00:50:00", 1, "m", 3.0, "{}"),
        (3, "2024-01-01 01:10:00", 1, "m", 42.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r.bucket_ts: r
        for r in DV.downsample_ohlc(B.dedup_exact(B.parse_bronze(df))).collect()
    }
    assert len(out) == 2
    h0 = out[min(out)]
    assert (h0.open, h0.high, h0.low, h0.close, h0.n) == (10.0, 99.0, 3.0, 3.0, 3)
    h1 = out[max(out)]
    assert (h1.open, h1.close, h1.n) == (42.0, 42.0, 1)


def test_cusum_matches_direct_recursion_and_alarms_after_shift(spark):
    """The prefix-sum formulation must equal the textbook recursion
    S_t = max(0, S_{t-1} + d_t) exactly (same rounded moments), and a
    mean shift must alarm only after the shift point."""
    from telemetry_streaming_datalake_spark.ingest import bronze as B
    from telemetry_streaming_datalake_spark.operators import derived as DV

    base = [10.0, 11.0, 9.0, 10.0] * 10  # 40 in-control points
    shift = [22.0, 23.0, 21.0, 22.0, 23.0, 21.0, 22.0, 23.0, 21.0, 22.0]
    vals = base + shift
    rows = [
        (i, f"2024-01-01 00:{i:02d}:00", 1, "m", v, "{}")
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    ded = B.dedup_exact(B.parse_bronze(df))
    out = sorted(DV.cusum_changepoint(ded).collect(), key=lambda r: r.unix_ts)

    import statistics

    mu = round(statistics.mean(vals), 6)
    sd = round(statistics.stdev(vals), 6)
    sp = sn = 0.0
    for r, v in zip(out, vals):
        sp = max(0.0, sp + (v - mu - DV.CUSUM_K * sd))
        sn = max(0.0, sn + (mu - v - DV.CUSUM_K * sd))
        assert abs(r.cusum_pos - sp) < 1e-6 and abs(r.cusum_neg - sn) < 1e-6
        assert r.is_change == (
            round(sp, 6) > DV.CUSUM_H * sd or round(sn, 6) > DV.CUSUM_H * sd
        )
    # the shifted regime must eventually alarm; in-control never does
    assert not any(r.is_change for r in out[: len(base)])
    assert any(r.is_change for r in out[len(base):])


def test_approx_percentile_audit_contract(spark):
    """All groups in-contract on real data; a deliberately broken
    'estimate' (rank far off target) would flip the flag — checked by
    shrinking accuracy until the claim still holds (the sketch is
    better than its guarantee) and by construction on a tiny group."""
    from telemetry_streaming_datalake_spark.ingest import bronze as B
    from telemetry_streaming_datalake_spark.operators import derived as DV
    from telemetry_streaming_datalake_spark.session import load_table

    ded = B.dedup_exact(B.parse_bronze(load_table(spark, SF_DIR, "events")))
    rows = DV.approx_percentile_audit(ded).collect()
    assert rows and all(r.within_tol for r in rows)
    exact = {
        (r.metric, r.datestamp): r
        for r in DV.percentile_rollup(ded).collect()
    }
    for r in rows:
        assert r.p50_exact == exact[(r.metric, r.datestamp)].p50
        assert r.p99_exact == exact[(r.metric, r.datestamp)].p99


def test_availability_report_gap_accounting(spark):
    """Head gap (midnight -> first reading), interior gap, and tail gap
    (last reading -> midnight) all count downtime beyond the slack; a
    steadily-reporting device scores ~1.0."""
    from telemetry_streaming_datalake_spark.operators import detect as DT

    day0 = 1704067200  # 2024-01-01 00:00 UTC
    # device A: reads at 01:00 and 02:00 then silent => head 3600,
    # interior 3600, tail 79200 — downtime = sum(gap - 600 over slack)
    rows_a = [("a", "2024-01-01", day0 + 3600), ("a", "2024-01-01", day0 + 7200)]
    # device B: every 5 min all day => all gaps under the 600s slack
    rows_b = [("b", "2024-01-01", day0 + i * 300) for i in range(288)]
    df = spark.createDataFrame(
        rows_a + rows_b, "serial string, datestamp string, unix_ts long"
    )
    out = {r.serial: r for r in DT.availability_report(df).collect()}
    want_a = (3600 - 600) + (3600 - 600) + (86400 - 7200 - 600)
    assert out["a"].downtime_secs == want_a
    assert abs(out["a"].availability - (1 - want_a / 86400)) < 1e-6
    # B: head gap 0 (reads at midnight), tail gap 300 < slack
    assert out["b"].downtime_secs == 0 and out["b"].availability == 1.0


def test_seasonal_baseline_conditions_on_hour(spark):
    """A value that is normal at its own hour's baseline but extreme
    against another hour's must only be flagged when the hour says so
    — and a zero-variance group reports zero anomalies."""
    from telemetry_streaming_datalake_spark.operators import detect as DT

    rows = []
    # hour 03: tight baseline around 10, one wild outlier
    for i in range(20):
        rows.append(("m", f"2024-01-01 03", 10.0 + (i % 5) * 0.1))
    rows.append(("m", "2024-01-01 03", 500.0))
    # hour 12: values around 500 are NORMAL here
    for i in range(20):
        rows.append(("m", "2024-01-01 12", 500.0 + (i % 7) * 2.0))
    # hour 23: constant => std NULL-or-0 => no anomalies by definition
    for i in range(5):
        rows.append(("m", "2024-01-01 23", 7.0))
    df = spark.createDataFrame(
        rows, "metric string, hourstamp string, value double"
    )
    out = {r.hour_of_day: r for r in DT.seasonal_baseline(df).collect()}
    assert out[3].n_anomalies == 1       # the 500 at 3am
    assert out[12].n_anomalies == 0      # 500s are the 12h baseline
    assert out[23].n_anomalies == 0 and out[23].n_readings == 5
    assert out[3].n_readings == 21


def test_slo_burn_multiwindow_gating(spark):
    """The page alert needs BOTH the 1h and 6h burn above the page
    factor: a single bad hour inside an otherwise-healthy 6h window
    must NOT page; six bad hours in a row must.  RANGE frames mean a
    silent hour still ages the window (wall-clock, not row-adjacency)."""
    from telemetry_streaming_datalake_spark.operators import detect as DT

    day0 = 1704067200  # 2024-01-01 00:00 UTC

    def hour_rows(h, n_err, n_ok):
        ts = day0 + h * 3600
        hs = f"2024-01-01 {h:02d}"
        rows = [("s", "error", ts + i, hs) for i in range(n_err)]
        rows += [("s", "view", ts + 100 + i, hs) for i in range(n_ok)]
        return rows

    rows = []
    # hours 0-5: healthy (1 error in 10 => burn 0.4)
    for h in range(6):
        rows += hour_rows(h, 1, 9)
    # hour 6: one terrible hour (8/10 errors => burn_1h 3.2) but the
    # 6h window still dilutes it below the page factor
    rows += hour_rows(6, 8, 2)
    # hours 8-13 (hour 7 SILENT): sustained 50% errors => burn 2.0
    for h in range(8, 14):
        rows += hour_rows(h, 5, 5)
    df = spark.createDataFrame(
        rows, "serial string, metric string, unix_ts long, hourstamp string"
    )
    out = {r.hourstamp: r for r in DT.slo_burn_alerts(df).collect()}
    spike = out["2024-01-01 06"]
    assert spike.burn_1h == 3.2 and not spike.page
    # by hour 13 the trailing 6h window is hours 08..13 — all at 50%
    sustained = out["2024-01-01 13"]
    assert sustained.burn_1h == 2.0 and sustained.burn_6h == 2.0
    assert sustained.page and sustained.ticket
    # the silent hour 7 produced no row but still aged hour 6 out of
    # hour 13's RANGE window (rows-frame would have kept it in)
    assert "2024-01-01 07" not in out


def test_trend_report_classifies_and_fits(spark):
    """Exact synthetic lines: slope/intercept recover the generating
    parameters (r2 = 1), noisy-flat stays flat, and a single-day
    series reports NULL slope + flat instead of crashing."""
    from telemetry_streaming_datalake_spark.operators import derived as DV

    rows = []
    days = [f"2024-01-{d:02d}" for d in range(1, 11)]
    for i, ds in enumerate(days):
        rows.append(("up", "m", ds, 10.0 + 2.5 * i))     # slope +2.5/day
        rows.append(("down", "m", ds, 100.0 - 3.0 * i))  # slope -3.0/day
        rows.append(("flat", "m", ds, 42.0))             # slope 0
    rows.append(("single", "m", "2024-01-01", 7.0))
    df = spark.createDataFrame(
        rows, "serial string, metric string, datestamp string, value double"
    )
    out = {r.serial: r for r in DV.trend_report(df).collect()}
    up = out["up"]
    assert up.trend == "rising" and up.slope_per_day == 2.5
    assert up.intercept == 10.0 and up.r2 == 1.0 and up.n_days == 10
    assert out["down"].trend == "falling" and out["down"].slope_per_day == -3.0
    assert out["flat"].trend == "flat" and out["flat"].slope_per_day == 0.0
    single = out["single"]
    assert single.trend == "flat" and single.slope_per_day is None
