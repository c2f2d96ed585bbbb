"""Text source connectors: JSONL / CSV ingestion must land the exact
bronze rows the parquet path produces (same downstream parse)."""

from pyspark.sql import functions as F

from telemetry_streaming_datalake_spark.ingest import bronze as B
from telemetry_streaming_datalake_spark.sources import textfeeds as TF

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_jsonl_equals_parquet_bronze(spark, events):
    expect = _rows(B.parse_bronze(events))
    got = _rows(TF.bronze_from_jsonl(spark, SF_DIR))
    assert got == expect


def test_csv_equals_parquet_bronze(spark, events):
    expect = _rows(B.parse_bronze(events))
    got = _rows(TF.bronze_from_csv(spark, SF_DIR))
    assert got == expect


def test_props_json_survives_escaping(spark):
    """The nested props JSON string round-trips both transports intact
    (quotes escaped in JSONL, quoting in CSV)."""
    path = TF.stage_events_jsonl(spark, SF_DIR)
    back = TF.read_events_jsonl(spark, path)
    assert back.filter(F.col("props").isNull()).count() == 0
    k = back.select(F.get_json_object("props", "$.k").cast("bigint").alias("k"))
    assert k.filter(F.col("k").isNull()).count() == 0
