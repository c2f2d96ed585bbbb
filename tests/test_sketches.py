"""Accuracy + mergeability contracts for the HLL approx-distinct rollup.

The operator has no SQL oracle (estimates are engine-specific), so its
correctness contract lives here: every estimate within tolerance of the
exact distinct count, and the month grain — built by UNIONING the day
sketches, never re-touching raw rows — consistent with a direct
month-level sketch (DataSketches HLL union at one lgConfigK is
lossless).
"""

from pyspark.sql import functions as F

from telemetry_streaming_datalake_spark.ingest import bronze as B
from telemetry_streaming_datalake_spark.operators import rollup as R
from telemetry_streaming_datalake_spark.session import load_table

SF = "/root/testdata/sf0.001"
TOL = 0.03


def _deduped(spark):
    return B.dedup_exact(B.parse_bronze(load_table(spark, SF, "events")))


def test_estimates_within_tolerance_of_exact(spark):
    ded = _deduped(spark).cache()
    try:
        approx = {
            (r.grain, r.metric, r.bucket): r.n_serials_approx
            for r in R.approx_distinct_rollup(ded).collect()
        }
        exact_day = {
            ("DAY", r.metric, r.datestamp): r.n
            for r in ded.groupBy("metric", "datestamp")
            .agg(F.count_distinct("serial").alias("n"))
            .collect()
        }
        exact_month = {
            ("MONTH", r.metric, r.bucket): r.n
            for r in ded.withColumn("bucket", F.substring("datestamp", 1, 7))
            .groupBy("metric", "bucket")
            .agg(F.count_distinct("serial").alias("n"))
            .collect()
        }
        exact = {**exact_day, **exact_month}
        assert set(approx) == set(exact)
        for k, est in approx.items():
            assert abs(est - exact[k]) <= max(1, TOL * exact[k]), (k, est, exact[k])
    finally:
        ded.unpersist()


def test_month_from_merged_day_sketches_equals_direct_sketch(spark):
    ded = _deduped(spark)
    merged = {
        (r.metric, r.bucket): r.n_serials_approx
        for r in R.approx_distinct_rollup(ded).filter(F.col("grain") == "MONTH").collect()
    }
    direct = {
        (r.metric, r.bucket): r.est
        for r in ded.withColumn("bucket", F.substring("datestamp", 1, 7))
        .groupBy("metric", "bucket")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("serial", F.lit(R.HLL_LG_K))
            ).alias("est")
        )
        .collect()
    }
    assert merged == direct


def test_approx_distinct_audit_all_groups_in_contract(spark):
    """The gate twin of the sketch rollup: full group set present and
    every estimate within the ±3% contract (within_tol all true) —
    the relation the driver hash-compares against exact SQL."""
    ded = _deduped(spark)
    rows = R.approx_distinct_audit(ded).collect()
    assert rows and all(r.within_tol for r in rows)
    day = [r for r in rows if r.grain == "DAY"]
    mon = [r for r in rows if r.grain == "MONTH"]
    assert day and mon
    exact_day = {
        (r.metric, r.datestamp): r.n
        for r in ded.groupBy("metric", "datestamp")
        .agg(F.countDistinct("serial").alias("n"))
        .collect()
    }
    for r in day:
        assert r.n_serials_exact == exact_day[(r.metric, r.bucket)]


# --------------------------------------------------------------------------
# count-min frequency sketch
# --------------------------------------------------------------------------


def test_cms_estimate_never_below_exact(spark):
    """CMS one-sidedness is deterministic: min-over-rows of cells each
    counting a superset of the key's events can never undercount —
    checked for EVERY serial, not just the audited top-k."""
    ded = _deduped(spark).cache()
    try:
        sketch = R.cms_sketch(ded)
        exact = ded.groupBy("serial").agg(F.count(F.lit(1)).alias("n_exact"))
        joined = R.cms_estimate(sketch, exact.select("serial")).join(exact, "serial")
        bad = joined.filter(F.col("cms_estimate") < F.col("n_exact")).count()
        assert bad == 0
    finally:
        ded.unpersist()


def test_cms_sketch_merges_cellwise(spark):
    """sketch(all) == cellwise sum of sketches over any split — the
    algebraic property that lets a serving store fold micro-batch /
    incremental partials without rescanning history."""
    ded = _deduped(spark).cache()
    try:
        a = R.cms_sketch(ded.filter(F.col("event_id") % 2 == 0))
        b = R.cms_sketch(ded.filter(F.col("event_id") % 2 == 1))
        merged = (
            a.unionByName(b)
            .groupBy("row_idx", "col_idx")
            .agg(F.sum("cell_count").alias("cell_count"))
        )
        full = R.cms_sketch(ded)
        assert merged.exceptAll(full).count() == 0
        assert full.exceptAll(merged).count() == 0
    finally:
        ded.unpersist()


def test_freq_sketch_audit_all_within_contract(spark):
    ded = _deduped(spark)
    rows = R.freq_sketch_audit(ded).collect()
    assert 0 < len(rows) <= R.CMS_TOP_K
    assert all(r.within_contract for r in rows)
    # ranks are the contiguous prefix, descending exact counts
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    counts = [r.n_events_exact for r in rows]
    assert counts == sorted(counts, reverse=True)
