"""Versioned-manifest store: time travel, copy-on-write delete,
vacuum — the Delta-log-analog contracts."""

import glob
import os

from pyspark.sql import functions as F

from telemetry_streaming_datalake_spark.storage.versioned import VersionedParquetStore


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, datestamp string, v double")


def test_append_overwrite_and_time_travel(spark, tmp_path):
    store = VersionedParquetStore(spark, str(tmp_path / "t"))
    v0 = store.write(_df(spark, [(1, "2024-01-01", 1.0)]), mode="overwrite")
    v1 = store.write(_df(spark, [(2, "2024-01-02", 2.0)]), mode="append")
    assert (v0, v1) == (0, 1)
    assert {r.id for r in store.read().collect()} == {1, 2}
    assert {r.id for r in store.read(version=0).collect()} == {1}
    ops = [h["op"] for h in store.history()]
    assert ops == ["overwrite", "append"]


def test_copy_on_write_delete_shares_untouched_files(spark, tmp_path):
    store = VersionedParquetStore(spark, str(tmp_path / "t"))
    store.write(
        _df(spark, [(1, "2024-01-01", 1.0), (2, "2024-01-02", 2.0), (3, "2024-01-02", 3.0)]),
        mode="overwrite",
        partition_col="datestamp",
    )
    before = store._read_manifest(0)["files"]
    d1_files = [f for f in before if "datestamp=2024-01-01" in f]
    # delete day 2 rows with v < 3 (copy-on-write of that partition only)
    store.delete_partitions("datestamp", ["2024-01-02"], keep_predicate=F.col("v") >= 3.0)
    after = store._read_manifest(1)["files"]
    # day-1 files carried by reference, byte-identical paths
    assert set(d1_files) <= set(after)
    got = {(r.id, r.v) for r in store.read().collect()}
    assert got == {(1, 1.0), (3, 3.0)}
    # time travel still sees the pre-delete snapshot
    assert {r.id for r in store.read(version=0).collect()} == {1, 2, 3}


def test_vacuum_drops_expired_versions(spark, tmp_path):
    store = VersionedParquetStore(spark, str(tmp_path / "t"))
    store.write(_df(spark, [(1, "2024-01-01", 1.0)]), mode="overwrite")
    store.write(_df(spark, [(2, "2024-01-02", 2.0)]), mode="overwrite")  # v1 replaces v0
    removed = store.vacuum(retain_last=1)
    assert removed  # v0's files were only referenced by v0
    assert store.versions() == [1]
    assert {r.id for r in store.read().collect()} == {2}
    # the removed files are really gone from disk
    for f in removed:
        assert not os.path.exists(os.path.join(store.path, f))
