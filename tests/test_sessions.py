"""Sessionization (session_window) and cross-stage consistency tests."""

import datetime

from pyspark.sql import functions as F

from telemetry_streaming_datalake_spark import datamodel as dm
from telemetry_streaming_datalake_spark.ingest import bronze as B
from telemetry_streaming_datalake_spark.ingest import silver as S
from telemetry_streaming_datalake_spark.operators import detect as DT
from telemetry_streaming_datalake_spark.operators import rollup as R
from telemetry_streaming_datalake_spark.operators import sessions as SES
from telemetry_streaming_datalake_spark.operators import temporal as T


def _events(spark, rows):
    """rows: (user_id, unix_seconds)"""
    data = [
        (i, u, datetime.datetime.fromtimestamp(ts, datetime.timezone.utc).replace(tzinfo=None))
        for i, (u, ts) in enumerate(rows)
    ]
    return spark.createDataFrame(data, "event_id long, user_id long, ts timestamp")


def test_gap_boundary_is_inclusive(spark):
    """Exactly-gap_s apart merges; gap_s+1 apart splits."""
    t0 = 1_704_067_200
    df = _events(spark, [(1, t0), (1, t0 + 1800), (1, t0 + 1800 + 1801)])
    out = SES.sessionize(df).orderBy("session_start").collect()
    assert [(r.session_start, r.session_end, r.n_events) for r in out] == [
        (t0, t0 + 1800, 2),
        (t0 + 3601, t0 + 3601, 1),
    ]


def test_sessions_are_per_user(spark):
    t0 = 1_704_067_200
    df = _events(spark, [(1, t0), (2, t0 + 60), (1, t0 + 120)])
    out = SES.sessionize(df).orderBy("user_id").collect()
    assert [(r.user_id, r.n_events, r.duration_s) for r in out] == [(1, 2, 120), (2, 1, 0)]


def test_single_event_session(spark):
    df = _events(spark, [(9, 1_704_067_200)])
    r = SES.sessionize(df).first()
    assert (r.session_start, r.session_end, r.duration_s, r.n_events) == (
        1_704_067_200,
        1_704_067_200,
        0,
        1,
    )


def test_agg_consistency_stages_agree_on_total(spark, events, customer):
    silver = S.to_silver(B.dedup_exact(B.parse_bronze(events)), dm.metric_mapping(spark))
    gold = T.enrich_gold(silver, dm.remote_history(spark, customer)).cache()
    out = DT.agg_consistency(R.rollup_day(gold), R.rollup_month(gold)).cache()
    stages = {r.stage for r in out.select("stage").distinct().collect()}
    assert stages == {"agg_day", "agg_month"}
    # same underlying data → per-(metric, provider) sums match across stages
    day = {
        (r.metric_id, r.provider_id): r.sum_of_sum
        for r in out.filter(F.col("stage") == "agg_day").collect()
    }
    month = {
        (r.metric_id, r.provider_id): r.sum_of_sum
        for r in out.filter(F.col("stage") == "agg_month").collect()
    }
    assert day.keys() == month.keys()
    for k in day:
        assert abs(day[k] - month[k]) < 1e-5, k


def test_stage_delay_report_invariants(spark, events, customer):
    """BRONZE rows anchor the report: delay_vs_bronze == 0 and no
    previous stage; later stages only ever trail ingest (silver/gold
    are row subsets of bronze), so delays are non-negative."""
    bronze = B.parse_bronze(events)
    silver = S.to_silver(B.dedup_exact(bronze), dm.metric_mapping(spark))
    gold = T.enrich_gold(silver, dm.remote_history(spark, customer))
    rep = DT.stage_delay_report(bronze, silver, gold, dm.metric_mapping(spark)).collect()
    stages = {(r.stage, r.provider_id) for r in rep}
    providers = {p for _, p in stages}
    assert {s for s, _ in stages} == {"BRONZE", "SILVER", "GOLD"}
    for r in rep:
        if r.stage == "BRONZE":
            assert r.delay_vs_bronze == 0 and r.delay_vs_prev is None
        else:
            assert r.delay_vs_bronze >= 0 and r.delay_vs_prev >= 0
        assert r.bronze_latest >= r.latest_ts
    # every provider reports every stage on this corpus
    assert len(stages) == 3 * len(providers)
