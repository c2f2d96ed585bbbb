"""Structured Streaming surfaces of the engine.

The reference's whole topology is streaming (Kafka → bronze Delta →
silver Delta → gold Delta → serving), each hop a ``readStream`` /
``writeStream`` pair with a checkpoint, watermarked dedup state, and
``foreachBatch`` MERGE at the serving edge.

This environment has no Kafka broker or Delta, so the streaming
surfaces use the file source/sink (the standard local test rig for
Structured Streaming): ``readStream.parquet(dir)`` plays Kafka,
date-partitioned parquet plays Delta, ``availableNow`` plays the
processing-time trigger for deterministic runs.  The *transformations*
are byte-identical to the batch path — the same ``parse_bronze`` /
``to_silver`` functions are applied to the streaming frame, which is
exactly how Spark unifies batch and streaming (one logical plan API).

Scale notes: the watermark bounds dropDuplicates state exactly like the
reference's 48 h watermark (``Part1 ….scala:69``); sinks partition by
``datestamp``; the upsert sink rewrites only the partitions present in
each micro-batch (dynamic partition overwrite), which is the parquet
analog of a keyed MERGE.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from telemetry_streaming_datalake_spark.ingest.bronze import parse_bronze
from telemetry_streaming_datalake_spark.ingest.silver import to_silver
from telemetry_streaming_datalake_spark.session import load_table

#: watermark delay for dedup state (reference uses 48 h)
DEDUP_WATERMARK = "48 hours"


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the raw events feed (Kafka stand-in).

    Schema comes from a batch peek — the file source requires one, same
    as the reference reads its sample.json for ``from_json`` schemas.
    """
    schema = load_table(spark, sf_dir, "events").schema
    raw = (
        spark.readStream.schema(schema)
        .parquet(os.path.join(sf_dir))
    )
    return raw


def _events_glob(spark: SparkSession, sf_dir: str, work_dir: str | None = None) -> DataFrame:
    """Stage the feed file into a landing directory and stream it —
    the file source watches directories (like a Kafka topic watches
    partitions), so this mirrors real file-drop ingestion."""
    import shutil
    import tempfile

    src = os.path.join(sf_dir, "events.parquet")
    landing = os.path.join(work_dir or tempfile.mkdtemp(prefix="tsdl_land_"), "landing")
    os.makedirs(landing, exist_ok=True)
    shutil.copy(src, os.path.join(landing, "events.parquet"))
    schema = spark.read.parquet(src).schema
    return spark.readStream.schema(schema).parquet(landing)


def streaming_bronze(spark: SparkSession, sf_dir: str, work_dir: str | None = None) -> DataFrame:
    """Streaming bronze: parse + watermarked exactly-once dedup.

    Same dataflow as the reference's query1
    (kafka → parse → watermark → dropDuplicates → partitioned append).
    The raw nanosecond LongType ``ts`` is converted exactly like the
    batch loader so batch and stream agree bit-for-bit.
    """
    raw = _events_glob(spark, sf_dir, work_dir)
    raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    bronze = parse_bronze(raw)
    return (
        bronze.withColumn("event_time", F.timestamp_seconds(F.col("unix_ts")))
        .withWatermark("event_time", DEDUP_WATERMARK)
        .dropDuplicates(["unique_hash_key"])
        .drop("event_time")
    )


def run_stream_to_parquet(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    partition_by: str | None = "datestamp",
) -> None:
    """Append sink + checkpoint, availableNow (deterministic drain)."""
    writer = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.start().awaitTermination()


def streaming_silver_dedup(spark: SparkSession, sf_dir: str, work_dir: str) -> DataFrame:
    """End-to-end streaming bronze→silver, drained with availableNow
    and read back as a batch frame.

    Because the feed is a single file (one micro-batch), the result is
    identical to the batch ``silver_dedup`` — which is exactly what the
    oracle checks.
    """
    out = os.path.join(work_dir, "bronze_out")
    ckpt = os.path.join(work_dir, "ckpt")
    run_stream_to_parquet(streaming_bronze(spark, sf_dir, work_dir), out, ckpt)
    cols = [
        "event_id", "serial", "metric", "value", "payload_k",
        "unix_ts", "datestamp", "hourstamp", "unique_hash_key",
    ]
    # the date-partitioned sink makes Spark re-infer datestamp as DATE;
    # normalize back to the engine's string datestamp
    return (
        spark.read.parquet(out)
        .withColumn("datestamp", F.col("datestamp").cast("string"))
        .select(*cols)
    )


def streaming_upsert_rollup(spark: SparkSession, sf_dir: str, work_dir: str) -> DataFrame:
    """Streaming hour-rollup upserted into the serving store — the
    ``Gold Aggregation/Step 05`` pattern: complete-mode aggregate →
    ``foreachBatch`` MERGE (ItemOverwrite) into a keyed store.

    The stream applies the stateless bronze parse, aggregates per
    (metric, datestamp, hourstamp) — ONE stateful operator, as complete
    mode requires — and lands each micro-batch through
    :class:`~..streaming.sinks.ParquetUpsertStore`.  Returns the store
    contents after the availableNow drain.
    """
    from telemetry_streaming_datalake_spark.streaming.sinks import ParquetUpsertStore

    raw = _events_glob(spark, sf_dir, work_dir)
    raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    bronze = parse_bronze(raw)
    agg = bronze.groupBy("metric", "datestamp", "hourstamp").agg(
        F.count(F.lit(1)).alias("n_events"),
        # rounded at the edge like the batch rollups: summation order
        # varies with partitioning, 6dp makes results engine-stable
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    ).withColumn(
        "id", F.concat_ws("|", F.col("metric"), F.col("datestamp"), F.col("hourstamp"))
    )
    store_path = os.path.join(work_dir, "rollup_store")
    ckpt = os.path.join(work_dir, "upsert_ckpt")
    store = ParquetUpsertStore(spark, store_path, key="id")
    (
        agg.writeStream.outputMode("complete")
        .foreachBatch(store.apply_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.read.parquet(store_path).select(
        "id", "metric", "datestamp", "hourstamp",
        "n_events", "sum_value", "min_value", "max_value",
    )
