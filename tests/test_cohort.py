"""Cohort retention and funnel conversion unit tests."""

import datetime

from telemetry_streaming_datalake_spark.operators import cohort as CO

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def _ev(i, day, hour, user, typ):
    return (
        i,
        datetime.datetime(2024, 1, day, hour, 0, 0),
        user,
        typ,
        1.0,
        "{}",
    )


def test_cohort_retention_matrix(spark):
    # u1 active day 1 and 3; u2 active day 1 only; u3 cohort day 2
    rows = [
        _ev(1, 1, 0, 1, "click"),
        _ev(2, 3, 0, 1, "view"),
        _ev(3, 1, 5, 2, "click"),
        _ev(4, 2, 0, 3, "signup"),
        _ev(5, 2, 1, 3, "click"),  # same user same day: one distinct date
    ]
    out = {
        (r.cohort_date, r.activity_date): r
        for r in CO.cohort_retention(spark.createDataFrame(rows, SCHEMA)).collect()
    }
    d0 = out[("2024-01-01", "2024-01-01")]
    assert d0.n_active == 2 and d0.cohort_size == 2 and d0.days_since == 0
    d2 = out[("2024-01-01", "2024-01-03")]
    assert d2.n_active == 1 and d2.retention_pct == 0.5 and d2.days_since == 2
    d3 = out[("2024-01-02", "2024-01-02")]
    assert d3.n_active == 1 and d3.cohort_size == 1
    assert len(out) == 3


def test_funnel_counts_only_first_step_a_and_window(spark):
    rows = [
        # u1: click at 01:00, purchase at 01:30 → converts (1800 s)
        _ev(1, 1, 1, 1, "click"),
        (2, datetime.datetime(2024, 1, 1, 1, 30), 1, "purchase", 1.0, "{}"),
        # u2: click at 02:00, purchase next day → outside 1 h window
        _ev(3, 1, 2, 2, "click"),
        _ev(4, 2, 2, 2, "purchase"),
        # u3: purchase BEFORE the first click → not a conversion
        _ev(5, 1, 0, 3, "purchase"),
        _ev(6, 1, 4, 3, "click"),
        # u4: never clicks → not entered
        _ev(7, 1, 6, 4, "purchase"),
    ]
    out = {
        r.entry_date: r
        for r in CO.funnel_conversion(spark.createDataFrame(rows, SCHEMA)).collect()
    }
    assert set(out) == {"2024-01-01"}
    r = out["2024-01-01"]
    assert r.n_entered == 3
    assert r.n_converted == 1
    assert r.conversion_pct == round(1 / 3, 6)
    assert r.avg_seconds_to_convert == 1800.0


def test_funnel_uses_earliest_qualifying_purchase(spark):
    rows = [
        _ev(1, 1, 1, 1, "click"),
        (2, datetime.datetime(2024, 1, 1, 1, 10), 1, "purchase", 1.0, "{}"),
        (3, datetime.datetime(2024, 1, 1, 1, 50), 1, "purchase", 1.0, "{}"),
    ]
    [r] = CO.funnel_conversion(spark.createDataFrame(rows, SCHEMA)).collect()
    assert r.avg_seconds_to_convert == 600.0


def test_rolling_active_users_window_semantics(spark):
    # u1 active day 1; u2 active day 3; window=3 days
    rows = [
        _ev(1, 1, 0, 1, "click"),
        _ev(2, 3, 0, 2, "view"),
        _ev(3, 3, 1, 2, "view"),  # same user/day dedups
    ]
    from telemetry_streaming_datalake_spark.operators import cohort as CO

    out = {
        r.report_day: r.active_users
        for r in CO.rolling_active_users(
            spark.createDataFrame(rows, SCHEMA), window_days=3
        ).collect()
    }
    # report days restricted to observed days {1, 3}
    assert out == {"2024-01-01": 1, "2024-01-03": 2}


def test_value_histogram_buckets(spark):
    import datetime

    from telemetry_streaming_datalake_spark.ingest import bronze as B
    from telemetry_streaming_datalake_spark.operators import derived as DV

    rows = [
        (i, datetime.datetime(2024, 1, 1, 0, 0, i), 1, "m", float(v), "{}")
        for i, v in enumerate([0.0, 5.0, 10.0])
    ]
    ded = B.dedup_exact(B.parse_bronze(spark.createDataFrame(rows, SCHEMA)))
    out = {
        r.bucket: r for r in DV.value_histogram(ded, n_buckets=10).collect()
    }
    assert out[0].n_points == 1 and out[0].bucket_min == 0.0
    assert out[5].n_points == 1
    # v == max clamps into the top bucket
    assert out[9].n_points == 1 and out[9].bucket_max == 10.0
    assert set(out) == {0, 5, 9}


def test_event_transitions_matrix(spark):
    rows = [
        _ev(1, 1, 1, 1, "click"),
        _ev(2, 1, 2, 1, "view"),
        _ev(3, 1, 3, 1, "click"),
        _ev(4, 1, 4, 1, "view"),
        _ev(5, 1, 1, 2, "click"),
        _ev(6, 1, 2, 2, "purchase"),
    ]
    out = {
        (r.from_type, r.to_type): r
        for r in CO.event_transitions(spark.createDataFrame(rows, SCHEMA)).collect()
    }
    # u1: click→view, view→click, click→view; u2: click→purchase
    assert out[("click", "view")].n_transitions == 2
    assert out[("view", "click")].n_transitions == 1
    assert out[("click", "purchase")].n_transitions == 1
    assert out[("click", "view")].share_from == round(2 / 3, 6)
    assert len(out) == 3
