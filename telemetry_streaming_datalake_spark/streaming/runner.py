"""Always-on topology runner: the reference's production posture.

The reference does not run drain-and-exit jobs: every hop is a NAMED
continuous query on a ``ProcessingTime`` trigger, pinned to a fair-
scheduler pool, and the notebook's last cells watch
``spark.streams`` — e.g. ``Bronze-Silver/Part1 ….scala:66-79``::

    spark.sparkContext.setLocalProperty("spark.scheduler.pool", "PeplinkPool1")
    ….writeStream.queryName("PeplinkQuery1")…
      .trigger(Trigger.ProcessingTime("120 seconds")).start()

This module reproduces that operational shape over the engine's
feed→bronze→silver→gold→serving topology: :class:`AlwaysOnRunner`
starts the four hops as concurrent named queries (each in its own
pool so a slow gold enrichment cannot starve ingest — the exact
reason the reference splits pools per feed), exposes
``StreamingQueryManager`` status, and stops cleanly.  The availableNow variants in
``pipeline.py`` remain the deterministic-drain twins the correctness
gate checks; the runner is the long-running deployment of the SAME
hop transforms (one logical plan, two trigger policies).

Scale notes: each hop checkpoints independently (the recovery unit is
the hop); pools map to the reference's per-feed isolation; trigger
interval is the latency/throughput knob (120 s in the reference's
bulk feeds, 30 s on the low-latency one).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from telemetry_streaming_datalake_spark.datamodel import metric_mapping, remote_history
from telemetry_streaming_datalake_spark.ingest.bronze import parse_bronze
from telemetry_streaming_datalake_spark.ingest.silver import to_silver
from telemetry_streaming_datalake_spark.operators.temporal import enrich_gold
from telemetry_streaming_datalake_spark.session import load_table, normalize_nano_ts
from telemetry_streaming_datalake_spark.streaming.pipeline import DEDUP_WATERMARK

#: hop names — the queryName() handles the manager reports
BRONZE_QUERY = "bronze-hop"
SILVER_QUERY = "silver-hop"
GOLD_QUERY = "gold-hop"
SERVING_QUERY = "serving-hop"


class AlwaysOnRunner:
    """Feed→bronze→silver→gold→serving as four concurrent queries.

    ``landing_dir`` is the watched feed directory (drop parquet files
    in, the Kafka-topic analog); each hop writes an unpartitioned
    parquet lake under ``work_dir`` and the next hop streams that lake
    (the Delta-as-stream-source pattern, ``Part1 ….scala:93-96``).
    """

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        work_dir: str,
        trigger_interval: str = "1 second",
    ) -> None:
        self.spark = spark
        self.sf_dir = sf_dir
        self.work_dir = work_dir
        self.trigger = trigger_interval
        self.landing_dir = os.path.join(work_dir, "landing")
        self.bronze_dir = os.path.join(work_dir, "bronze_lake")
        self.silver_dir = os.path.join(work_dir, "silver_lake")
        self.gold_dir = os.path.join(work_dir, "gold_lake")
        self.serving_dir = os.path.join(work_dir, "serving_store")
        self.queries: dict[str, StreamingQuery] = {}

    # ---------------------------------------------------------- hops

    def _feed_schema(self):
        return load_table(self.spark, self.sf_dir, "events").schema

    def _bronze_stream(self) -> DataFrame:
        raw = (
            self.spark.readStream.schema(self._feed_schema())
            .parquet(self.landing_dir)
        )
        raw = normalize_nano_ts(raw, "ts")
        bronze = parse_bronze(raw)
        return (
            bronze.withColumn("event_time", F.timestamp_seconds(F.col("unix_ts")))
            .withWatermark("event_time", DEDUP_WATERMARK)
            .dropDuplicatesWithinWatermark(["unique_hash_key"])
            .drop("event_time")
        )

    def _silver_stream(self) -> DataFrame:
        schema = parse_bronze(
            normalize_nano_ts(
                self.spark.read.schema(self._feed_schema()).parquet(
                    self.landing_dir
                ),
                "ts",
            )
        ).schema
        bronze = self.spark.readStream.schema(schema).parquet(self.bronze_dir)
        return to_silver(bronze, metric_mapping(self.spark))

    def _gold_stream(self) -> DataFrame:
        silver_schema = self._silver_stream_schema()
        silver = self.spark.readStream.schema(silver_schema).parquet(
            self.silver_dir
        )
        history = remote_history(
            self.spark, load_table(self.spark, self.sf_dir, "customer")
        )
        return enrich_gold(silver, history)

    def _silver_stream_schema(self):
        return self._silver_stream().schema

    def _gold_stream_schema(self):
        return self._gold_stream().schema

    def _start_serving(self) -> StreamingQuery:
        """Hop 4 — the reference's serving edge (`Metric Stream to
        Cosmos/Step 06.b`): the gold lake streams into a foreachBatch
        that reduces each micro-batch to its per-key latest and lands
        it through the :class:`..sinks.ServingStoreWriter` contract
        (ItemOverwrite: the newest batch wins per key, exactly the
        reference's Cosmos write strategy — a late-arriving batch can
        regress a key, as it can in the reference)."""
        from telemetry_streaming_datalake_spark.operators.latest import latest_metric
        from telemetry_streaming_datalake_spark.streaming.sinks import (
            ParquetUpsertStore,
        )

        gold = self.spark.readStream.schema(self._gold_stream_schema()).parquet(
            self.gold_dir
        )
        store = ParquetUpsertStore(self.spark, self.serving_dir, key="id")

        def upsert_latest(batch_df, batch_id):
            latest = latest_metric(batch_df).withColumn(
                "id",
                F.concat_ws("|", "remote_id", "metric_id", "provider_id"),
            )
            store.apply_batch(latest, batch_id)

        self.spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", "ServingPool"
        )
        q = (
            gold.writeStream.queryName(SERVING_QUERY)
            .foreachBatch(upsert_latest)
            .option(
                "checkpointLocation",
                os.path.join(self.work_dir, f"ckpt_{SERVING_QUERY}"),
            )
            .trigger(processingTime=self.trigger)
            .start()
        )
        self.spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)
        self.queries[SERVING_QUERY] = q
        return q

    # ------------------------------------------------------- control

    def _start(self, name: str, pool: str, df: DataFrame, out: str) -> StreamingQuery:
        # pool pinning exactly as the reference: local property at
        # start time; the query's micro-batch thread inherits it
        self.spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
        q = (
            df.writeStream.queryName(name)
            .format("parquet")
            .option("path", out)
            .option(
                "checkpointLocation", os.path.join(self.work_dir, f"ckpt_{name}")
            )
            .outputMode("append")
            .trigger(processingTime=self.trigger)
            .start()
        )
        self.spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)
        self.queries[name] = q
        return q

    def start(self) -> dict[str, StreamingQuery]:
        """Start all three hops.  The downstream lakes must exist
        before their consumers start (empty dirs are fine — schemas
        are explicit), mirroring table-creation-before-stream in the
        reference."""
        os.makedirs(self.landing_dir, exist_ok=True)
        os.makedirs(self.bronze_dir, exist_ok=True)
        os.makedirs(self.silver_dir, exist_ok=True)
        os.makedirs(self.gold_dir, exist_ok=True)
        self._start(BRONZE_QUERY, "BronzePool", self._bronze_stream(), self.bronze_dir)
        self._start(SILVER_QUERY, "SilverPool", self._silver_stream(), self.silver_dir)
        self._start(GOLD_QUERY, "GoldPool", self._gold_stream(), self.gold_dir)
        self._start_serving()
        return dict(self.queries)

    def feed(self, src_parquet: str, name: str = "drop.parquet") -> None:
        """Drop a feed file into the landing dir (a producer publish)."""
        import shutil

        shutil.copy(src_parquet, os.path.join(self.landing_dir, name))

    def status(self) -> list[dict]:
        """StreamingQueryManager view — one row per managed query, the
        reference's monitoring surface (``spark.streams.active``)."""
        out = []
        for q in self.spark.streams.active:
            if q.name not in self.queries:
                continue
            lp = q.lastProgress or {}
            out.append(
                {
                    "name": q.name,
                    "id": str(q.id),
                    "is_active": q.isActive,
                    "batches_seen": lp.get("batchId"),
                    "input_rows_last": lp.get("numInputRows"),
                }
            )
        return out

    def await_rows(self, path: str, n_rows: int, timeout_s: float = 120.0) -> int:
        """Poll a hop's lake until it holds ≥ ``n_rows`` rows (or
        timeout).  Returns the observed count."""
        deadline = time.monotonic() + timeout_s
        seen = 0
        while time.monotonic() < deadline:
            try:
                seen = self.spark.read.parquet(path).count()
            except Exception:
                seen = 0  # no files yet
            if seen >= n_rows:
                return seen
            time.sleep(1.0)
        return seen

    def stop(self) -> None:
        """Stop every managed query (newest hop first so upstreams
        don't write into a dead consumer's lake mid-stop)."""
        for name in [SERVING_QUERY, GOLD_QUERY, SILVER_QUERY, BRONZE_QUERY]:
            q = self.queries.pop(name, None)
            if q is not None and q.isActive:
                q.stop()
                q.awaitTermination(30)
