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


def test_schema_evolution_mergeschema(spark, tmp_path):
    """A feed that grows a column mid-stream: batch 2 adds `extra`.
    mergeSchema=true unions the file schemas; batch-1 rows surface
    NULL for the new column (the lakehouse schema-evolution contract
    the reference gets from Delta's mergeSchema on its bronze appends)."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "lake")
    spark.range(3).select(F.col("id"), F.lit("a").alias("v")).write.parquet(p)
    spark.range(3, 5).select(
        F.col("id"), F.lit("b").alias("v"), F.lit(1.5).alias("extra")
    ).write.mode("append").parquet(p)
    df = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(df.columns) == {"id", "v", "extra"}
    rows = {r.id: r for r in df.collect()}
    assert rows[0].extra is None and rows[4].extra == 1.5
    # and the widened schema is stable for downstream parses
    assert df.filter(F.col("extra").isNull()).count() == 3
