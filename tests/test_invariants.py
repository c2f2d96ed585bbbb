"""Cross-operator invariants for the round-5-late additions — cheap
structural truths that must hold at any scale, checked on sf0.001."""

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def q(spark):
    import __spark_entry__ as E

    return {k: (lambda fn=fn: fn(spark, SF)) for k, fn in E.queries().items()}


def test_compaction_plan_bins_bounded(q):
    from telemetry_streaming_datalake_spark.operators.retention import (
        COMPACTION_TARGET_BYTES,
        COMPACTION_ROW_BYTES,
    )

    rows = q["compaction_plan"]().collect()
    assert rows
    for r in rows:
        # first-fit by cum-before: a bin only exceeds target via its
        # LAST file straddling the boundary — never by more than one
        # extra file's bytes, and single-file bins are unbounded
        # (a jumbo file stays alone).
        if r.n_files > 1:
            assert r.bin_bytes >= COMPACTION_TARGET_BYTES - (
                COMPACTION_TARGET_BYTES - 1
            )
        assert r.needs_compaction == (r.n_files > 1)
        assert r.first_hour <= r.last_hour


def test_cohort_retention_is_a_probability(q):
    for r in q["cohort_retention"]().collect():
        assert 0 < r.retention_pct <= 1.0
        assert r.n_active <= r.cohort_size
        assert r.days_since >= 0


def test_funnel_converted_subset_of_entered(q):
    for r in q["funnel_conversion"]().collect():
        assert 0 <= r.n_converted <= r.n_entered
        if r.n_converted:
            assert 0 <= r.avg_seconds_to_convert <= 3600


def test_zorder_layout_partitions_all_rows(spark, q):
    from telemetry_streaming_datalake_spark.ingest import bronze as B
    from telemetry_streaming_datalake_spark.session import load_table

    total = B.dedup_exact(B.parse_bronze(load_table(spark, SF, "events"))).count()
    rows = q["zorder_layout"]().collect()
    assert sum(r.n_rows for r in rows) == total
    assert all(0 <= r.file_id <= 15 for r in rows)
    # z-ordering's point: each file covers a narrow slice of BOTH dims
    for r in rows:
        assert r.min_ts <= r.max_ts and r.min_vq <= r.max_vq


def test_rolling_actives_at_least_daily_actives(spark, q):
    from telemetry_streaming_datalake_spark.session import load_table

    daily = {
        str(r.d): r.n
        for r in load_table(spark, SF, "events")
        .select(F.to_date("ts").alias("d"), "user_id")
        .groupBy("d")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for r in q["rolling_active_users"]().collect():
        # the trailing window can only add users vs the single day
        assert r.active_users >= daily[r.report_day]


def test_rank_report_ranks_are_dense_and_bounded(q):
    rows = q["metric_rank_report"]().collect()
    by_metric = {}
    for r in rows:
        by_metric.setdefault(r.metric, []).append(r)
    for metric, rs in by_metric.items():
        ranks = sorted({r.rank_in_metric for r in rs})
        assert ranks[0] == 1
        assert ranks == list(range(1, len(ranks) + 1)), metric  # dense
        for r in rs:
            assert 0.0 <= r.pct_rank <= 1.0
            assert 1 <= r.quartile <= 4


def test_grouping_sets_no_null_grain_keys(q):
    # registry key retired r10 (oracle survives via the streaming
    # twin) — build the batch relation directly from the operator
    from telemetry_streaming_datalake_spark.operators import rollup as R

    for r in R.rollup_grouping_sets(q["gold_enrich"]()).collect():
        assert r.grain in ("HOUR", "DAY", "MONTH")
        assert r.bucket is not None
        assert r.id.startswith(r.grain + "|")


def test_histogram_counts_cover_all_readings(spark, q):
    from telemetry_streaming_datalake_spark.ingest import bronze as B
    from telemetry_streaming_datalake_spark.session import load_table

    total = B.dedup_exact(B.parse_bronze(load_table(spark, SF, "events"))).count()
    rows = q["value_histogram"]().collect()
    assert sum(r.n_points for r in rows) == total
    assert all(0 <= r.bucket <= 9 for r in rows)
    assert all(r.bucket_min <= r.bucket_max for r in rows)


def test_new_operators_survive_empty_feed(spark):
    """Empty micro-batch / filtered-to-empty window: every round-5-late
    operator must plan and return empty without error."""
    from telemetry_streaming_datalake_spark.ingest import bronze as B
    from telemetry_streaming_datalake_spark.operators import cohort as CO
    from telemetry_streaming_datalake_spark.operators import derived as DV
    from telemetry_streaming_datalake_spark.operators import retention as RT
    from telemetry_streaming_datalake_spark.operators import rollup as R
    from telemetry_streaming_datalake_spark.operators import corpus as CP

    ev = spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    ded = B.dedup_exact(B.parse_bronze(ev))
    for df in [
        CO.cohort_retention(ev),
        CO.funnel_conversion(ev),
        CO.rolling_active_users(ev),
        CO.event_transitions(ev),
        DV.metric_rank_report(ded),
        DV.value_histogram(ded),
        RT.compaction_plan(ded),
        RT.zorder_layout(ded),
        R.approx_distinct_rollup(ded),
        CP.importance_sample(docs),
        CP.source_reputation(docs),
    ]:
        assert df.count() == 0
    # grouping-sets needs the gold schema; empty gold comes from the
    # enrich chain over the empty feed
    from telemetry_streaming_datalake_spark import datamodel as dm
    from telemetry_streaming_datalake_spark.ingest import silver as S
    from telemetry_streaming_datalake_spark.operators import temporal as T

    cust = spark.createDataFrame(
        [(1, "c", 1, 0.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    gold = T.enrich_gold(
        S.to_silver(ded, dm.metric_mapping(spark)),
        dm.remote_history(spark, cust),
    )
    assert R.rollup_grouping_sets(gold).count() == 0
