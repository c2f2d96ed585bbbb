"""Retention purge and compaction.

Reference semantics: ``Set Up Delta Tables/Purge old data from delta
tables.scala`` (``delete from <table> where Datestamp < 'cutoff'``) and
``Gold Aggregation/Auto Optimization.scala`` (OPTIMIZE/compaction).

Without Delta in this environment the purge is expressed the way a
parquet lake does it: keep-side filter + date-partitioned rewrite.
Because every table in this engine is partitioned by ``datestamp``,
the filter is *partition pruning* — at 100 TB the purge never reads a
byte of the partitions it drops (``.explain`` shows the pruned scan).
Compaction = per-partition repartition to a target file count.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def purge_keep(df: DataFrame, cutoff_datestamp: str) -> DataFrame:
    """Rows that survive ``delete where datestamp < cutoff``."""
    return df.filter(F.col("datestamp") >= cutoff_datestamp)


def purge_rewrite(df: DataFrame, cutoff_datestamp: str, path: str) -> None:
    """Materialize the purge as a date-partitioned parquet rewrite."""
    (
        purge_keep(df, cutoff_datestamp)
        .write.mode("overwrite")
        .partitionBy("datestamp")
        .parquet(path)
    )


def compact(spark: SparkSession, path: str, target_file_mb: int = 128) -> None:
    """OPTIMIZE-analog: rewrite a parquet directory into ~target-sized
    files.  File count is derived from the on-disk bytes, mirroring
    what Delta's OPTIMIZE bin-packing converges to."""
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files if f.endswith(".parquet"))
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(path)
    # best-effort cleanup of the staging dir
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


def purge_oracle(source_cte: str, cutoff_datestamp: str) -> str:
    return f"""
WITH src AS ({source_cte})
SELECT * FROM src WHERE datestamp >= '{cutoff_datestamp}'
"""
