"""PySpark-native telemetry streaming datalake engine.

A from-scratch re-expression of the capabilities of the reference
pipeline (arijit-das-us/Telemetry-Streaming-Datalake — a Databricks/Scala
medallion architecture for satellite-terminal telemetry) on idiomatic
PySpark: DataFrame/Catalyst declarations, broadcast dimension joins,
built-in (JVM/codegen) expressions in every hot path, Structured
Streaming for the streaming surfaces, plus the LLM-training-data
operators (dedup, similarity search, multimodal columns, text analysis)
a 100 TB pipeline needs.
"""

from telemetry_streaming_datalake_spark.session import get_spark, load_table, load_tables

__all__ = ["get_spark", "load_table", "load_tables"]
