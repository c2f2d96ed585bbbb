"""Pipeline configuration seam: the reference's ``Configuration.scala``
notebooks as typed data.

Every reference notebook `%run`s a Configuration cell that defines the
stage, the Kafka brokers, one topic per feed, the lake ``basePath``,
and a handful of streaming-runtime session confs
(``Bronze-Silver/Configuration.scala``: RocksDB state store,
``stopActiveRunOnRestart``).  This module re-expresses that contract
as a frozen dataclass + an ``apply_runtime_conf`` step so a deployment
configures the engine in one place — and so the Kafka seam
(:mod:`..sources.kafka`) and the always-on runner
(:mod:`..streaming.runner`) draw topics/paths from the same object.

All values here are placeholders; a real deployment injects its own
(secrets NEVER belong in this file — the reference notebook inlines a
storage account key, which is exactly the practice this seam
replaces).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession

#: the per-feed topic map of the reference Configuration (names are the
#: public notebook's feed identities; values are deploy-time inputs)
DEFAULT_TOPICS = {
    "feed_a": "feed-a-events",
    "feed_b": "feed-b-events",
    "feed_c": "feed-c-events",
}

#: session confs the reference sets for its streaming runtime, mapped
#: to their open-source Spark equivalents (RocksDB state store is OSS
#: since Spark 3.2; the Databricks-only optimizeWrite conf has no OSS
#: twin and is intentionally absent)
STREAMING_RUNTIME_CONF = {
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
    "spark.sql.streaming.stopActiveRunOnRestart": "true",
}


@dataclass(frozen=True)
class PipelineConfig:
    """One object per deployment stage — everything the notebooks'
    Configuration cell provided, typed."""

    stage: str = "debug"
    kafka_brokers: str = "localhost:9092"
    topics: dict[str, str] = field(default_factory=lambda: dict(DEFAULT_TOPICS))
    base_path: str = "/tmp/tsdl_lake"
    trigger_interval: str = "120 seconds"
    dedup_watermark: str = "48 hours"

    def topic(self, feed: str) -> str:
        return self.topics[feed]

    def lake_path(self, table: str) -> str:
        return f"{self.base_path.rstrip('/')}/{table}"

    def checkpoint_path(self, query: str) -> str:
        return f"{self.base_path.rstrip('/')}/_checkpoint/{query}"

    def kafka_source(self, feed: str):
        """The reader config for a feed, pre-wired to this deployment's
        brokers — drop into :func:`..sources.kafka.kafka_read_stream`."""
        from telemetry_streaming_datalake_spark.sources.kafka import (
            KafkaSourceConfig,
        )

        return KafkaSourceConfig(
            bootstrap_servers=self.kafka_brokers, subscribe=self.topic(feed)
        )


def apply_runtime_conf(spark: SparkSession, extra: dict[str, str] | None = None) -> None:
    """Set the streaming-runtime session confs (RocksDB state store,
    restart policy) — the imperative tail of the Configuration
    notebook.  Conf keys that require restart are session-level in
    OSS Spark and apply to queries started afterwards."""
    conf = dict(STREAMING_RUNTIME_CONF)
    if extra:
        conf.update(extra)
    for k, v in conf.items():
        spark.conf.set(k, v)
