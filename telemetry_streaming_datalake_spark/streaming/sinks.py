"""Streaming sinks: keyed upsert (MERGE-analog) and latest-value store.

Reference semantics: every aggregate stream lands via ``foreachBatch``
+ MERGE/ItemOverwrite (``Gold Aggregation/Step 05 ….scala:108-121`` and
the Cosmos ``ItemOverwrite`` write strategy) — i.e. the sink is a
keyed upsert, newest batch wins per id.

Parquet-lake formulation: the store is a directory of row groups; an
upsert micro-batch unions the incoming keys over the existing store and
keeps the winner per key (here: the incoming row — ItemOverwrite), then
rewrites.  On Delta this is literally ``MERGE``; the logic below keeps
the same contract so swapping the storage layer is a one-function
change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window


class ParquetUpsertStore:
    """Keyed upsert store over parquet (foreachBatch target).

    ``apply_batch`` is what you hand to ``foreachBatch``; it implements
    ItemOverwrite: rows from the newer batch replace same-id rows.
    """

    def __init__(self, spark: SparkSession, path: str, key: str = "id") -> None:
        self.spark = spark
        self.path = path
        self.key = key
        self._version = 0

    def read(self) -> DataFrame | None:
        if not os.path.exists(self.path):
            return None
        return self.spark.read.parquet(self.path)

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        current = self.read()
        incoming = batch_df.withColumn("_v", F.lit(batch_id + 1))
        if current is None:
            merged = incoming
        else:
            merged = current.withColumn("_v", F.lit(0)).unionByName(incoming)
        w = Window.partitionBy(self.key).orderBy(F.col("_v").desc())
        winner = (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_v")
        )
        tmp = f"{self.path}__v{self._version}"
        self._version += 1
        winner.write.mode("overwrite").parquet(tmp)
        final = self.spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(self.path)
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


def stream_upsert_rollup(
    spark: SparkSession,
    agg_stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
) -> None:
    """Stream a (complete-mode) aggregate into the upsert store via
    foreachBatch — the Step 05 pattern: update-mode agg + MERGE."""
    store = ParquetUpsertStore(spark, store_path)
    (
        agg_stream.writeStream.outputMode("complete")
        .foreachBatch(store.apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
