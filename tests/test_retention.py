"""Retention purge rewrite + compaction (OPTIMIZE-analog) tests.

Mirrors ``Set Up Delta Tables/Purge old data from delta tables.scala``
(datestamp-cutoff delete) and ``Gold Aggregation/Auto Optimization.scala``
(small-file rewrite).
"""

import glob
import os

from pyspark.sql import functions as F

from telemetry_streaming_datalake_spark.operators import retention as RT


def _frame(spark):
    rows = [
        (i, f"2024-01-{(i % 20) + 1:02d}", float(i)) for i in range(200)
    ]
    return spark.createDataFrame(rows, "event_id long, datestamp string, value double")


def test_purge_rewrite_drops_old_partitions(spark, tmp_path):
    df = _frame(spark)
    out = str(tmp_path / "purged")
    RT.purge_rewrite(df, "2024-01-10", out)
    # partition-column inference reads datestamp back as DATE; the
    # engine's own tables keep it string via the explicit select
    back = spark.read.parquet(out).withColumn(
        "datestamp", F.col("datestamp").cast("string")
    )
    dates = {r.datestamp for r in back.select("datestamp").distinct().collect()}
    assert min(dates) == "2024-01-10"
    assert back.count() == df.filter(F.col("datestamp") >= "2024-01-10").count()
    # partition layout on disk: only kept datestamp dirs exist
    on_disk = {os.path.basename(p).split("=")[1] for p in glob.glob(f"{out}/datestamp=*")}
    assert on_disk == dates


def test_purge_scan_prunes_partitions(spark, tmp_path):
    """The purge filter must reach the scan as partition pruning —
    at 100 TB the purge never reads dropped partitions."""
    src = str(tmp_path / "src")
    _frame(spark).write.partitionBy("datestamp").parquet(src)
    lake = spark.read.parquet(src)
    spark.catalog.clearCache()  # plan pin: assert the uncached shape
    plan = (
        RT.purge_keep(lake, "2024-01-10")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "2024-01-10" in plan


def test_compact_reduces_file_count_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "lake")
    df = _frame(spark)
    # fragment: 50 tiny files
    df.repartition(50).write.mode("overwrite").parquet(path)
    before_files = len(glob.glob(f"{path}/*.parquet"))
    before = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    RT.compact(spark, path, target_file_mb=128)
    after_files = len(glob.glob(f"{path}/*.parquet"))
    after = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert after == before
    assert after_files < before_files
    assert after_files == 1  # 200 rows << 128 MB target


def test_zorder_rewrite_narrows_file_stats(spark, events, tmp_path):
    """After a Z-order rewrite on (event_id, user_id), every parquet
    file's min/max footer range must cover a small fraction of BOTH
    columns' global ranges — the file-skipping property OPTIMIZE
    ZORDER exists for.  A plain (unsorted) write has ~full-range files
    on at least one column."""
    import glob

    import pyarrow.parquet as pq

    from telemetry_streaming_datalake_spark.operators import retention as RT

    df = events.select("event_id", "user_id", "value")
    plain = str(tmp_path / "plain")
    zed = str(tmp_path / "zorder")
    df.repartition(8).write.parquet(plain)
    RT.zorder_rewrite(spark, df, zed, "event_id", "user_id", n_files=16)

    def avg_frac(path, col):
        fracs, los, his = [], [], []
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.read_metadata(f)
            idx = md.schema.names.index(col)
            lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
            fracs.append((f, lo, hi))
            los.append(lo)
            his.append(hi)
        g_lo, g_hi = min(los), max(his)
        width = max(g_hi - g_lo, 1)
        return sum((hi - lo) / width for _f, lo, hi in fracs) / len(fracs)

    # round-robin repartition: every file spans ~the whole event_id range
    assert avg_frac(plain, "event_id") > 0.8
    # z-ordered: each file covers a narrow window of BOTH columns
    assert avg_frac(zed, "event_id") < 0.45
    assert avg_frac(zed, "user_id") < 0.45
    # and the rewrite lost no rows
    assert spark.read.parquet(zed).count() == df.count()
