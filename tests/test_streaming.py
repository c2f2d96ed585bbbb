"""Structured Streaming tests: watermarked dedup ingest, upsert sink."""

import os

from pyspark.sql import functions as F

from telemetry_streaming_datalake_spark.ingest import bronze as B
from telemetry_streaming_datalake_spark.operators import retention as RT
from telemetry_streaming_datalake_spark.streaming import pipeline as SP
from telemetry_streaming_datalake_spark.streaming.sinks import ParquetUpsertStore

from tests.conftest import SF_DIR


def test_streaming_bronze_matches_batch(spark, events, tmp_path):
    out = SP.streaming_silver_dedup(spark, SF_DIR, str(tmp_path))
    batch = B.dedup_exact(B.parse_bronze(events))
    assert out.count() == batch.count()
    s = {tuple(r) for r in out.select("event_id", "unique_hash_key").collect()}
    b = {tuple(r) for r in batch.select("event_id", "unique_hash_key").collect()}
    assert s == b


def test_streaming_sink_partitions_by_datestamp(spark, tmp_path):
    work = str(tmp_path / "w")
    SP.streaming_silver_dedup(spark, SF_DIR, work)
    parts = [p for p in os.listdir(os.path.join(work, "bronze_out")) if p.startswith("datestamp=")]
    assert len(parts) > 1  # date-partitioned layout, like the reference


def test_upsert_store_item_overwrite(spark, tmp_path):
    store = ParquetUpsertStore(spark, str(tmp_path / "store"), key="id")
    b0 = spark.createDataFrame([("a", 1), ("b", 2)], "id string, v int")
    b1 = spark.createDataFrame([("b", 20), ("c", 3)], "id string, v int")
    store.apply_batch(b0, 0)
    store.apply_batch(b1, 1)
    final = {r.id: r.v for r in store.read().collect()}
    assert final == {"a": 1, "b": 20, "c": 3}


def _partition_files(root: str, part: str) -> dict[str, tuple[int, int]]:
    d = os.path.join(root, part)
    return {
        f: (os.path.getsize(os.path.join(d, f)), os.stat(os.path.join(d, f)).st_mtime_ns)
        for f in sorted(os.listdir(d))
        if not f.startswith(".") and not f.startswith("_")
    }


def test_upsert_store_rewrites_only_touched_partitions(spark, tmp_path):
    """A micro-batch touching only datestamp=d2 must leave the
    datestamp=d1 partition files byte-for-byte untouched on disk —
    the O(batch)-not-O(store) MERGE contract."""
    path = str(tmp_path / "store")
    store = ParquetUpsertStore(spark, path, key="id", partition_col="datestamp")
    schema = "id string, datestamp string, v int"
    b0 = spark.createDataFrame(
        [("a", "2024-01-01", 1), ("b", "2024-01-02", 2)], schema
    )
    store.apply_batch(b0, 0)
    before = _partition_files(store.current_data_dir(), "datestamp=2024-01-01")
    assert before  # d1 exists
    b1 = spark.createDataFrame(
        [("b", "2024-01-02", 20), ("c", "2024-01-02", 3)], schema
    )
    store.apply_batch(b1, 1)
    # hardlink carry: the new version's untouched partition shares the
    # previous version's inodes — same names, bytes, and mtimes
    after = _partition_files(store.current_data_dir(), "datestamp=2024-01-01")
    assert after == before  # same files, sizes, and mtimes
    final = {r.id: r.v for r in store.read().collect()}
    assert final == {"a": 1, "b": 20, "c": 3}


def test_upsert_store_escaped_partition_values(spark, tmp_path):
    """Partition values Spark URL-escapes in directory names (space,
    colon) must still be recognized as TOUCHED: the untouched-carry is
    decided by dir-name set difference against the merged write, not a
    raw-value string compare, so a touched escaped partition never has
    its stale files hardlinked back in (duplicate/stale rows)."""
    path = str(tmp_path / "store")
    store = ParquetUpsertStore(spark, path, key="id", partition_col="datestamp")
    schema = "id string, datestamp string, v int"
    weird = "2024-01-02 10:00"  # space + colon -> escaped dir name
    b0 = spark.createDataFrame(
        [("a", "2024-01-01", 1), ("b", weird, 2)], schema
    )
    store.apply_batch(b0, 0)
    b1 = spark.createDataFrame([("b", weird, 20), ("c", weird, 3)], schema)
    store.apply_batch(b1, 1)
    rows = [(r.id, r.datestamp, r.v) for r in store.read().collect()]
    assert sorted(rows) == [
        ("a", "2024-01-01", 1),
        ("b", weird, 20),
        ("c", weird, 3),
    ]
    # the untouched plain partition was still carried by hardlink
    assert os.path.isdir(
        os.path.join(store.current_data_dir(), "datestamp=2024-01-01")
    )


def test_purge_and_compact_rewrite(spark, events, tmp_path):
    bronze = B.parse_bronze(events)
    path = str(tmp_path / "lake")
    RT.purge_rewrite(bronze, "2024-01-15", path)
    kept = spark.read.parquet(path)
    assert kept.filter(F.col("datestamp") < "2024-01-15").count() == 0
    kept_count = kept.count()
    assert kept_count == bronze.filter(F.col("datestamp") >= "2024-01-15").count()
    RT.compact(spark, path)
    assert spark.read.parquet(path).count() == kept_count


def test_streaming_upsert_rollup_matches_batch_agg(spark, tmp_path):
    """One availableNow drain of the complete-mode hour rollup through
    the foreachBatch upsert store equals the batch aggregate."""
    from pyspark.sql import functions as F

    from telemetry_streaming_datalake_spark.ingest.bronze import parse_bronze
    from telemetry_streaming_datalake_spark.session import load_table
    from telemetry_streaming_datalake_spark.streaming.pipeline import (
        streaming_upsert_rollup,
    )

    sf = "/root/testdata/sf0.001"
    got = streaming_upsert_rollup(spark, sf, str(tmp_path))
    bronze = parse_bronze(load_table(spark, sf, "events"))
    want = bronze.groupBy("metric", "datestamp", "hourstamp").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    assert got.count() == want.count()
    diff = got.select("id", "n_events").exceptAll(
        want.select(
            F.concat_ws("|", "metric", "datestamp", "hourstamp").alias("id"), "n_events"
        )
    )
    assert diff.count() == 0


def test_streaming_feed_b_matches_batch(spark, tmp_path):
    """Provider-B JSON documents consumed as a text-file stream (Kafka
    value analog) must parse to exactly the batch bronze_feed_b rows."""
    from telemetry_streaming_datalake_spark.ingest.feeds import bronze_feed_b
    from telemetry_streaming_datalake_spark.session import load_table
    from telemetry_streaming_datalake_spark.streaming.pipeline import (
        streaming_bronze_feed_b,
    )

    sf = "/root/testdata/sf0.001"
    got = streaming_bronze_feed_b(spark, sf, str(tmp_path)).cache()
    want = bronze_feed_b(load_table(spark, sf, "events")).cache()
    assert got.count() == want.count()
    assert got.select(*want.columns).exceptAll(want).count() == 0


def test_streaming_feed_c_matches_batch(spark, tmp_path):
    """The mixed-schema provider-C topic consumed as a text stream
    must parse to exactly the batch bronze_feed_c rows (type dispatch
    under micro-batch execution)."""
    from telemetry_streaming_datalake_spark.ingest.feeds import bronze_feed_c
    from telemetry_streaming_datalake_spark.session import load_table
    from telemetry_streaming_datalake_spark.streaming.pipeline import (
        streaming_bronze_feed_c,
    )

    sf = "/root/testdata/sf0.001"
    got = streaming_bronze_feed_c(spark, sf, str(tmp_path)).cache()
    want = bronze_feed_c(load_table(spark, sf, "events")).cache()
    assert got.count() == want.count()
    assert got.select(*want.columns).exceptAll(want).count() == 0


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """SURVEY row 25c's streaming half: session_window as the stateful
    streaming session operator must produce exactly the batch
    sessions."""
    from telemetry_streaming_datalake_spark.operators.sessions import sessionize
    from telemetry_streaming_datalake_spark.session import load_table
    from telemetry_streaming_datalake_spark.streaming.pipeline import (
        streaming_sessionize,
    )

    sf = "/root/testdata/sf0.001"
    got = streaming_sessionize(spark, sf, str(tmp_path)).cache()
    want = sessionize(load_table(spark, sf, "events")).cache()
    assert got.count() == want.count()
    assert got.select(*want.columns).exceptAll(want).count() == 0


def test_multimodal_resize_real_nearest_neighbor(spark):
    """resize_image is a real decode -> nearest-neighbor -> re-encode:
    downsampling a 2x2 to 1x1 keeps the top-left pixel."""
    from telemetry_streaming_datalake_spark.operators.multimodal import (
        decode_image,
        resize_image,
    )

    src = b"P6\n2 2\n255\n" + bytes(range(12))
    thumb = resize_image(src, 1, 1)
    img = decode_image(thumb)
    assert img.shape == (1, 1, 3)
    assert bytes(img.reshape(-1)) == bytes((0, 1, 2))  # top-left RGB


def test_stateful_latest_carries_state_across_batches(spark, tmp_path):
    """Split the feed into two files and drain with one file per
    micro-batch: applyInPandasWithState must merge batch-2 rows into
    batch-1 state, and each key's final emission must equal the batch
    aggregate over the whole feed."""
    import os

    from pyspark.sql import functions as F

    from telemetry_streaming_datalake_spark.ingest.bronze import parse_bronze
    from telemetry_streaming_datalake_spark.session import load_table
    from telemetry_streaming_datalake_spark.streaming.pipeline import (
        streaming_stateful_latest,
    )

    sf = "/root/testdata/sf0.001"
    raw = spark.read.parquet(os.path.join(sf, "events.parquet"))
    cut = raw.approxQuantile("event_id", [0.5], 0.0)[0]
    landing = tmp_path / "landing"
    landing.mkdir()
    # two disjoint halves, one flat parquet file each in the landing
    # dir (state for a serial present in both halves must merge across
    # the two micro-batches)
    import glob
    import shutil

    for i, half in enumerate(
        [raw.filter(F.col("event_id") <= cut), raw.filter(F.col("event_id") > cut)]
    ):
        tmp_out = str(tmp_path / f"half{i}")
        half.coalesce(1).write.parquet(tmp_out)
        part = glob.glob(os.path.join(tmp_out, "part-*.parquet"))[0]
        shutil.move(part, str(landing / f"feed{i}.parquet"))
    got = streaming_stateful_latest(
        spark, sf, str(tmp_path), max_files_per_trigger=1
    ).cache()

    bronze = parse_bronze(load_table(spark, sf, "events"))
    want = (
        bronze.groupBy("serial", "metric")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.max(F.struct("unix_ts", "event_id", "value")).alias("s"),
        )
        .select(
            "serial", "metric", "n_events", "sum_value",
            F.col("s.unix_ts").alias("last_ts"),
            F.col("s.value").alias("last_value"),
        )
    ).cache()
    assert got.count() == want.count()
    # emissions prove multi-batch execution: some key must have emitted twice
    emissions = spark.read.parquet(str(tmp_path / "latest_state_out"))
    assert emissions.count() > got.count()
    diff = got.exceptAll(want)
    assert diff.count() == 0


def test_stateful_latest_runs_under_rocksdb_state_store(spark, tmp_path):
    """The config seam's RocksDB posture, EXECUTED (VERDICT r10 #6):
    ``apply_runtime_conf`` switches the session to
    RocksDBStateStoreProvider, the ``applyInPandasWithState`` twin
    drains a state-carrying query under it and matches the batch
    aggregate, and the checkpoint's state dir carries RocksDB's
    snapshot layout (``.zip``/``.changelog`` files) — proving the
    provider engaged rather than silently falling back to the
    HDFS-backed default."""
    import glob
    import os

    from pyspark.sql import functions as F

    from telemetry_streaming_datalake_spark.config import apply_runtime_conf
    from telemetry_streaming_datalake_spark.ingest.bronze import parse_bronze
    from telemetry_streaming_datalake_spark.session import load_table
    from telemetry_streaming_datalake_spark.streaming.pipeline import (
        streaming_stateful_latest,
    )

    from telemetry_streaming_datalake_spark.config import STREAMING_RUNTIME_CONF

    sf = "/root/testdata/sf0.001"
    key = "spark.sql.streaming.stateStore.providerClass"
    # restore EVERY conf apply_runtime_conf sets — leaking any of them
    # into the shared session is the SURVEY §5 order-dependence class
    prev = {k: spark.conf.get(k, None) for k in STREAMING_RUNTIME_CONF}
    got = want = None
    try:
        apply_runtime_conf(spark)
        assert "RocksDBStateStoreProvider" in spark.conf.get(key)
        got = streaming_stateful_latest(spark, sf, str(tmp_path)).cache()
        bronze = parse_bronze(load_table(spark, sf, "events"))
        want = (
            bronze.groupBy("serial", "metric")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 6).alias("sum_value"),
                F.max(F.struct("unix_ts", "event_id", "value")).alias("s"),
            )
            .select(
                "serial", "metric", "n_events", "sum_value",
                F.col("s.unix_ts").alias("last_ts"),
                F.col("s.value").alias("last_value"),
            )
        ).cache()
        assert got.count() == want.count()
        assert got.exceptAll(want).count() == 0
        state_files = glob.glob(
            os.path.join(str(tmp_path), "latest_state_ckpt", "state", "**"),
            recursive=True,
        )
        assert any(
            f.endswith(".zip") or f.endswith(".changelog") for f in state_files
        ), state_files[:20]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        for df in (got, want):
            if df is not None:
                df.unpersist()


def test_two_hop_table_as_stream_matches_batch_silver(spark, tmp_path):
    """Hop 2 consumes the bronze lake directory as a stream source
    (Delta-as-stream analog) and must reproduce the batch silver."""
    from pyspark.sql import functions as F

    from telemetry_streaming_datalake_spark import datamodel as dm
    from telemetry_streaming_datalake_spark.ingest import bronze as B
    from telemetry_streaming_datalake_spark.ingest.silver import to_silver
    from telemetry_streaming_datalake_spark.session import load_table
    from telemetry_streaming_datalake_spark.streaming.pipeline import (
        streaming_silver_two_hop,
    )

    sf = "/root/testdata/sf0.001"
    got = streaming_silver_two_hop(spark, sf, str(tmp_path)).cache()
    want = to_silver(
        B.dedup_exact(B.parse_bronze(load_table(spark, sf, "events"))),
        dm.metric_mapping(spark),
    ).cache()
    assert got.count() == want.count()
    assert got.exceptAll(want.select(*got.columns)).count() == 0


def test_three_hop_streaming_gold_matches_batch(spark, tmp_path):
    """feed → bronze → silver → gold, all hops streaming; the drained
    gold lake must equal the batch gold_enrich output (the SCD2 join
    runs stream-static with the history dim broadcast)."""
    from telemetry_streaming_datalake_spark import datamodel as dm
    from telemetry_streaming_datalake_spark.ingest import bronze as B
    from telemetry_streaming_datalake_spark.ingest.silver import to_silver
    from telemetry_streaming_datalake_spark.operators.temporal import enrich_gold
    from telemetry_streaming_datalake_spark.session import load_table
    from telemetry_streaming_datalake_spark.streaming.pipeline import (
        streaming_gold_three_hop,
    )

    sf = "/root/testdata/sf0.001"
    got = streaming_gold_three_hop(spark, sf, str(tmp_path)).cache()
    silver = to_silver(
        B.dedup_exact(B.parse_bronze(load_table(spark, sf, "events"))),
        dm.metric_mapping(spark),
    )
    want = enrich_gold(
        silver, dm.remote_history(spark, load_table(spark, sf, "customer"))
    ).cache()
    assert got.count() == want.count()
    assert got.exceptAll(want.select(*got.columns)).count() == 0


def test_rate_state_fn_group_spanning_chunks():
    """applyInPandasWithState delivers a group's rows across multiple
    Arrow chunks in arbitrary order — the rate function must see the
    whole group sorted, not sort/dedup each chunk independently (an
    out-of-order reading in a later chunk would be silently dropped)."""
    import pandas as pd

    class FakeState:
        exists = False
        get = None

        def update(self, v):
            self.stored = v

    def run(chunks):
        state = FakeState()
        frames = list(
            SP._rate_state_fn(("s1", "m1"), iter(chunks), state)
        )
        return pd.concat(frames, ignore_index=True), state.stored

    cols = ["unix_ts", "event_id", "value"]
    # chunk 2 holds a reading EARLIER than chunk 1's — shuffle order
    chunk1 = pd.DataFrame([[100, 1, 10.0], [300, 3, 30.0]], columns=cols)
    chunk2 = pd.DataFrame([[200, 2, 20.0]], columns=cols)
    out, stored = run([chunk1, chunk2])
    want, want_state = run(
        [pd.DataFrame([[100, 1, 10.0], [200, 2, 20.0], [300, 3, 30.0]], columns=cols)]
    )
    assert out.values.tolist() == want.values.tolist()
    assert stored == want_state
    assert list(out["unix_ts"]) == [200, 300]  # both rates emitted
    assert list(out["delta_secs"]) == [100, 100]


def test_streaming_counter_rate_carries_state_across_batches(spark, tmp_path):
    """Time-split the feed into two files drained one per micro-batch:
    the rate of the first batch-2 reading must be computed against the
    LAST batch-1 reading (state carry), and the union of emissions must
    equal the batch counter_rate exactly."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from telemetry_streaming_datalake_spark.ingest.bronze import (
        dedup_exact,
        parse_bronze,
    )
    from telemetry_streaming_datalake_spark.operators.derived import counter_rate
    from telemetry_streaming_datalake_spark.session import load_table
    from telemetry_streaming_datalake_spark.streaming.pipeline import (
        streaming_counter_rate,
    )

    sf = "/root/testdata/sf0.001"
    raw = load_table(spark, sf, "events")
    # split by TIME so batch 2 is strictly later than batch 1 for every
    # series (the operator's documented in-order contract)
    ts_cut = raw.select(F.unix_timestamp("ts").alias("u")).approxQuantile("u", [0.5], 0.0)[0]
    landing = tmp_path / "landing"
    landing.mkdir()
    halves = [
        raw.filter(F.unix_timestamp("ts") <= ts_cut),
        raw.filter(F.unix_timestamp("ts") > ts_cut),
    ]
    for i, half in enumerate(halves):
        tmp_out = str(tmp_path / f"half{i}")
        half.coalesce(1).write.parquet(tmp_out)
        part = glob.glob(os.path.join(tmp_out, "part-*.parquet"))[0]
        shutil.move(part, str(landing / f"feed{i}.parquet"))
    got = streaming_counter_rate(spark, sf, str(tmp_path), max_files_per_trigger=1)
    want = counter_rate(dedup_exact(parse_bronze(raw)))
    g = sorted(tuple(r) for r in got.collect())
    w = sorted(tuple(r) for r in want.collect())
    assert g == w


def test_streaming_quarantine_split_matches_batch_router(spark, tmp_path):
    import os

    from telemetry_streaming_datalake_spark import datamodel as dm
    from telemetry_streaming_datalake_spark.ingest import bronze as B
    from telemetry_streaming_datalake_spark.session import load_table
    from telemetry_streaming_datalake_spark.streaming import pipeline as SP

    sf = "/root/testdata/sf0.001"
    out = SP.streaming_quarantine_split(spark, sf, str(tmp_path))
    batch = B.bronze_quarantine(load_table(spark, sf, "events"), dm.metric_mapping(spark))
    assert out.count() == batch.count()
    assert out.exceptAll(batch).count() == 0 and batch.exceptAll(out).count() == 0
    # the dead-letter sink is reason-partitioned (replayable by cause)
    # inside each batchId-scoped commit directory
    dlq = os.path.join(str(tmp_path), "dead_letter")
    reasons = {
        d.split("=", 1)[1]
        for b in os.listdir(dlq)
        if b.startswith("batch-")
        for d in os.listdir(os.path.join(dlq, b))
        if d.startswith("reason_dir=")
    }
    assert reasons and reasons <= {"bad_payload", "stale_ts", "unmapped_metric", "out_of_range"}


def test_streaming_quarantine_split_replay_is_idempotent(spark, tmp_path):
    """Checkpoint replay must not double-append: re-draining the same
    feed into the same sinks with a WIPED checkpoint re-delivers every
    batch under the same ids, and the batchId-scoped overwrite dirs
    must leave the union unchanged (the pre-r9 append form doubled
    every row here)."""
    import os
    import shutil

    from telemetry_streaming_datalake_spark.streaming import pipeline as SP

    sf = "/root/testdata/sf0.001"
    first = SP.streaming_quarantine_split(spark, sf, str(tmp_path)).collect()
    shutil.rmtree(os.path.join(str(tmp_path), "quarantine_ckpt"))
    replayed = SP.streaming_quarantine_split(spark, sf, str(tmp_path)).collect()
    assert sorted(map(tuple, replayed)) == sorted(map(tuple, first))


def test_streaming_grouping_sets_matches_batch(spark, tmp_path):
    """Single-drain equality: the incrementally-maintained multi-grain
    store equals the batch GROUPING SETS rollup row-for-row."""
    from telemetry_streaming_datalake_spark import datamodel as dm
    from telemetry_streaming_datalake_spark.ingest.bronze import dedup_exact, parse_bronze
    from telemetry_streaming_datalake_spark.ingest.silver import to_silver
    from telemetry_streaming_datalake_spark.operators.rollup import rollup_grouping_sets
    from telemetry_streaming_datalake_spark.operators.temporal import enrich_gold
    from telemetry_streaming_datalake_spark.session import load_table
    from telemetry_streaming_datalake_spark.streaming.pipeline import (
        streaming_grouping_sets,
    )

    sf = "/root/testdata/sf0.001"
    got = streaming_grouping_sets(spark, sf, str(tmp_path))
    gold = enrich_gold(
        to_silver(
            dedup_exact(parse_bronze(load_table(spark, sf, "events"))),
            dm.metric_mapping(spark),
        ),
        dm.remote_history(spark, load_table(spark, sf, "customer")),
    )
    want = rollup_grouping_sets(gold)
    g = sorted(tuple(r) for r in got.select(*want.columns).collect())
    w = sorted(tuple(r) for r in want.collect())
    assert g == w


def test_streaming_grouping_sets_merges_across_batches(spark, tmp_path):
    """Two micro-batches split mid-hour: boundary buckets receive
    partials from BOTH batches and the additive merge must still equal
    the from-scratch batch rollup (associativity of the partials)."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from telemetry_streaming_datalake_spark import datamodel as dm
    from telemetry_streaming_datalake_spark.ingest.bronze import dedup_exact, parse_bronze
    from telemetry_streaming_datalake_spark.ingest.silver import to_silver
    from telemetry_streaming_datalake_spark.operators.rollup import rollup_grouping_sets
    from telemetry_streaming_datalake_spark.operators.temporal import enrich_gold
    from telemetry_streaming_datalake_spark.session import load_table
    from telemetry_streaming_datalake_spark.streaming.pipeline import (
        streaming_grouping_sets,
    )

    sf = "/root/testdata/sf0.001"
    raw = load_table(spark, sf, "events")
    ts_cut = raw.select(F.unix_timestamp("ts").alias("u")).approxQuantile(
        "u", [0.5], 0.0
    )[0]
    # mid-hour split: NOT on an hour boundary, so hour/day/month buckets
    # straddle the two batches
    ts_cut += 1800 - (int(ts_cut) % 3600 or 1800) % 1800
    landing = tmp_path / "landing"
    landing.mkdir()
    halves = [
        raw.filter(F.unix_timestamp("ts") <= ts_cut),
        raw.filter(F.unix_timestamp("ts") > ts_cut),
    ]
    for i, half in enumerate(halves):
        tmp_out = str(tmp_path / f"half{i}")
        half.coalesce(1).write.parquet(tmp_out)
        part = glob.glob(os.path.join(tmp_out, "part-*.parquet"))[0]
        shutil.move(part, str(landing / f"feed{i}.parquet"))
    got = streaming_grouping_sets(spark, sf, str(tmp_path), max_files_per_trigger=1)
    gold = enrich_gold(
        to_silver(
            dedup_exact(parse_bronze(raw)), dm.metric_mapping(spark)
        ),
        dm.remote_history(spark, load_table(spark, sf, "customer")),
    )
    want = rollup_grouping_sets(gold)
    g = sorted(tuple(r) for r in got.select(*want.columns).collect())
    w = sorted(tuple(r) for r in want.collect())
    assert g == w



def test_streaming_grouping_sets_replay_skips_applied_batches(spark, tmp_path):
    """sum/count partials are additive, not idempotent: a replayed
    batch id must be SKIPPED by the store's applied-batch ledger, not
    re-merged (the pre-r9 form double-counted every partial here).
    Wiping the checkpoint re-delivers all batches under their original
    ids; the drained store must be byte-identical to the first run."""
    import os
    import shutil

    from telemetry_streaming_datalake_spark.streaming.pipeline import (
        streaming_grouping_sets,
    )

    sf = "/root/testdata/sf0.001"
    first = streaming_grouping_sets(spark, sf, str(tmp_path)).collect()
    shutil.rmtree(os.path.join(str(tmp_path), "gs_ckpt"))
    replayed = streaming_grouping_sets(spark, sf, str(tmp_path)).collect()
    assert sorted(map(tuple, replayed)) == sorted(map(tuple, first))


def test_watermark_late_within_horizon_merges(spark, tmp_path):
    """Append-mode watermarked tumbling agg over two micro-batches: a
    batch-2 event that is late but INSIDE the watermark horizon must
    merge into its window (the contractual guarantee — no data loss
    within the horizon; dropping beyond it is permitted but not
    required by the engine, so only the guaranteed side is pinned)."""
    import datetime
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ev(i, hours):
        return (i, base + datetime.timedelta(hours=hours), 1, "click", 1.0, "{}")

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    # batch 1: h=9.2 and h=10 → watermark after batch 1 = 9h
    # batch 2: h=9.5 (late vs batch-1 max, inside the 1 h horizon) must
    # merge with 9.2 into the [9,10) window; h=20 closes every window
    batches = [[ev(1, 9.2), ev(2, 10)], [ev(3, 9.5), ev(4, 20)]]
    landing = tmp_path / "landing"
    landing.mkdir()
    for i, rows in enumerate(batches):
        out = str(tmp_path / f"b{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(out)
        part = glob.glob(os.path.join(out, "part-*.parquet"))[0]
        shutil.move(part, str(landing / f"feed{i}.parquet"))
    stream = (
        spark.readStream.schema(spark.read.parquet(str(landing)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sink = str(tmp_path / "sink")
    (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {r.window.start.hour: r.n for r in spark.read.parquet(sink).collect()}
    assert got[9] == 2   # 9.2 (batch 1) + 9.5 (batch 2) merged
    assert got[10] == 1


def test_always_on_runner_three_concurrent_queries(spark):
    """VERDICT r5 item 6: ≥3 concurrent named ProcessingTime queries,
    files fed while running, progress observed on every hop, clean
    stop.  The drained gold lake must carry the batch row count."""
    import os
    import tempfile

    from telemetry_streaming_datalake_spark.streaming import runner as RN

    sf = "/root/testdata/sf0.001"
    work = tempfile.mkdtemp(prefix="tsdl_runner_")
    r = RN.AlwaysOnRunner(spark, sf, work, trigger_interval="500 milliseconds")
    try:
        qs = r.start()
        assert set(qs) == {
            RN.BRONZE_QUERY, RN.SILVER_QUERY, RN.GOLD_QUERY, RN.SERVING_QUERY,
        }
        assert all(q.isActive for q in qs.values())
        # feed the topic while the queries run
        r.feed(os.path.join(sf, "events.parquet"))
        # batch twins give the expected landed row counts
        import __spark_entry__ as E

        queries = E.queries()
        want_gold = queries["gold_enrich"](spark, sf).count()
        got = r.await_rows(r.gold_dir, want_gold, timeout_s=180)
        assert got == want_gold
        # hop 4: the serving store converges to one row per latest key
        # (latest_metric's registry key retired r13 — build direct)
        from telemetry_streaming_datalake_spark.operators import latest as L

        want_latest = L.latest_metric(
            queries["gold_enrich"](spark, sf)
        ).count()
        got_latest = r.await_store_rows(want_latest, timeout_s=120)
        assert got_latest == want_latest
        st = {s["name"]: s for s in r.status()}
        assert set(st) == {
            RN.BRONZE_QUERY, RN.SILVER_QUERY, RN.GOLD_QUERY, RN.SERVING_QUERY,
        }
        for s in st.values():
            assert s["is_active"]
            assert s["batches_seen"] is not None  # progress observed
    finally:
        r.stop()
    assert not any(
        q.name
        in (RN.BRONZE_QUERY, RN.SILVER_QUERY, RN.GOLD_QUERY, RN.SERVING_QUERY)
        for q in spark.streams.active
    )


def test_serving_store_interface_replay_idempotency(spark):
    """VERDICT r5 item 9: the extracted writer contract — a replayed
    batch_id (post-recovery re-delivery) leaves any conforming store
    unchanged.  Proven on the fake KV client AND the parquet store."""
    import tempfile

    from telemetry_streaming_datalake_spark.streaming import sinks as SK

    batch0 = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], "id string, v double"
    )
    batch1 = spark.createDataFrame(
        [("b", 9.0), ("c", 3.0)], "id string, v double"
    )
    kv = SK.InMemoryKVServingStore()
    kv.apply_batch(batch0, 0)
    kv.apply_batch(batch1, 1)
    after = dict(kv.data)
    assert after["b"]["v"] == 9.0  # ItemOverwrite: newest batch wins
    kv.apply_batch(batch0, 0)  # replay after recovery
    assert kv.data == after
    assert kv.apply_calls == 3

    pq = SK.ParquetUpsertStore(
        spark, tempfile.mkdtemp(prefix="tsdl_pqstore_") + "/store", key="id"
    )
    pq.apply_batch(batch0, 0)
    pq.apply_batch(batch1, 1)
    want = sorted((r.id, r.v) for r in pq.read().collect())
    pq.apply_batch(batch1, 1)  # replay
    assert sorted((r.id, r.v) for r in pq.read().collect()) == want
    assert dict(want)["b"] == 9.0


def test_always_on_runner_restart_recovery_exactly_once(spark):
    """Checkpoint recovery: stop the topology, start a NEW runner on
    the same work dir, re-feed the SAME records — the restored
    watermark-dedup state must drop every duplicate, leaving bronze
    exactly-once.  This is the recovery contract the reference's
    checkpointLocation exists for."""
    import os
    import tempfile

    from telemetry_streaming_datalake_spark.ingest import bronze as B
    from telemetry_streaming_datalake_spark.session import load_table
    from telemetry_streaming_datalake_spark.streaming import runner as RN

    sf = "/root/testdata/sf0.001"
    work = tempfile.mkdtemp(prefix="tsdl_runner2_")
    want = B.dedup_exact(B.parse_bronze(load_table(spark, sf, "events"))).count()

    r1 = RN.AlwaysOnRunner(spark, sf, work, trigger_interval="500 milliseconds")
    try:
        r1.start()
        r1.feed(os.path.join(sf, "events.parquet"), "drop_a.parquet")
        got1 = r1.await_rows(r1.bronze_dir, want, timeout_s=120)
        assert got1 == want
    finally:
        r1.stop()

    r2 = RN.AlwaysOnRunner(spark, sf, work, trigger_interval="500 milliseconds")
    try:
        r2.start()
        # the same records again, as a "replayed" producer file
        r2.feed(os.path.join(sf, "events.parquet"), "drop_b.parquet")
        import time

        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            st = {s_["name"]: s_ for s_ in r2.status()}
            b = st.get(RN.BRONZE_QUERY, {})
            if b.get("batches_seen") and b["batches_seen"] >= 1 and b.get("input_rows_last") == 0:
                break
            time.sleep(1.0)
        # every replayed row deduped against the RESTORED state
        assert spark.read.parquet(r2.bronze_dir).count() == want
    finally:
        r2.stop()


def test_corpus_gate_batch_replay_is_idempotent(spark, tmp_path):
    """A re-delivered micro-batch (checkpoint restart after a partial
    commit) must not double-append: gate_and_land_batch writes each
    batch to its own batchId-scoped directory in overwrite mode
    (ADVICE r6)."""
    keep_dir = str(tmp_path / "keep")
    rej_dir = str(tmp_path / "rej")
    docs = spark.createDataFrame(
        [
            (1, "web", "the quick brown fox jumps over the lazy dog and then some more of it"),
            (2, "web", "zz zz zz"),
        ],
        "doc_id long, source string, text string",
    )
    SP.gate_and_land_batch(docs, keep_dir, rej_dir, 0)
    # replay of batch 0, then a genuinely new batch 1
    SP.gate_and_land_batch(docs, keep_dir, rej_dir, 0)
    SP.gate_and_land_batch(docs.filter(F.col("doc_id") == 1), keep_dir, rej_dir, 1)
    total = (
        spark.read.option("recursiveFileLookup", "true").parquet(keep_dir).count()
        + spark.read.option("recursiveFileLookup", "true").parquet(rej_dir).count()
    )
    assert total == 3  # 2 from batch 0 (once), 1 from batch 1


def test_resilient_store_retries_transient_item_faults(spark):
    """A flaky item (fails twice, succeeds third) must land within one
    apply_batch via in-batch retries, without disturbing other items."""
    from telemetry_streaming_datalake_spark.streaming.sinks import (
        ResilientKVServingStore,
    )

    fail_left = {"b": 2}
    store = ResilientKVServingStore(max_attempts=3)
    real_write = store._write_item

    def flaky(k, v):
        if fail_left.get(k, 0) > 0:
            fail_left[k] -= 1
            raise IOError("throttled")
        real_write(k, v)

    store._write_item = flaky
    batch = spark.createDataFrame([("a", 1), ("b", 2), ("c", 3)], "id string, v long")
    store.apply_batch(batch, 0)
    assert set(store.data) == {"a", "b", "c"}
    assert 0 in store.applied_batches
    assert store.write_attempts == 5  # 3 items + 2 retries of 'b'
    assert not store.dead_letters


def test_resilient_store_persistent_fault_converges_on_replay(spark):
    """An item failing past max_attempts must fail the batch WITHOUT
    data loss: successes are landed, the batch stays unapplied, and the
    replayed batch converges once the fault clears (ItemOverwrite makes
    re-landing successes harmless)."""
    import pytest as _pytest

    from telemetry_streaming_datalake_spark.streaming.sinks import (
        ResilientKVServingStore,
    )

    broken = {"b"}
    store = ResilientKVServingStore(max_attempts=2)
    real_write = store._write_item

    def faulty(k, v):
        if k in broken:
            raise IOError("item too large")
        real_write(k, v)

    store._write_item = faulty
    batch = spark.createDataFrame([("a", 1), ("b", 2), ("c", 3)], "id string, v long")
    with _pytest.raises(RuntimeError, match="not marked applied"):
        store.apply_batch(batch, 7)
    assert set(store.data) == {"a", "c"}  # error isolated, no loss
    assert 7 not in store.applied_batches
    assert "b" in store.dead_letters
    # fault clears; the engine replays the same batch_id
    broken.clear()
    store.apply_batch(batch, 7)
    assert set(store.data) == {"a", "b", "c"}
    assert 7 in store.applied_batches
    # an exact re-replay is now a no-op (idempotency high-water mark)
    n = store.write_attempts
    store.apply_batch(batch, 7)
    assert store.write_attempts == n


def test_streaming_ewma_carries_tail_across_batches(spark, tmp_path):
    """Time-split the feed into two files drained one per micro-batch:
    batch-2 smoothing must weight the trailing batch-1 readings (tail
    state carry), and the union of emissions must equal the batch
    finite-horizon ewma_smooth EXACTLY — same weights, same FP order,
    same HALF_UP rounding."""
    import glob
    import os as _os
    import shutil

    from telemetry_streaming_datalake_spark.ingest.bronze import (
        dedup_exact,
        parse_bronze,
    )
    from telemetry_streaming_datalake_spark.operators.derived import ewma_smooth
    from telemetry_streaming_datalake_spark.session import load_table
    from telemetry_streaming_datalake_spark.streaming.pipeline import streaming_ewma

    sf = "/root/testdata/sf0.001"
    raw = load_table(spark, sf, "events")
    ts_cut = raw.select(F.unix_timestamp("ts").alias("u")).approxQuantile("u", [0.5], 0.0)[0]
    landing = tmp_path / "landing"
    landing.mkdir()
    halves = [
        raw.filter(F.unix_timestamp("ts") <= ts_cut),
        raw.filter(F.unix_timestamp("ts") > ts_cut),
    ]
    for i, half in enumerate(halves):
        tmp_out = str(tmp_path / f"half{i}")
        half.coalesce(1).write.parquet(tmp_out)
        part = glob.glob(_os.path.join(tmp_out, "part-*.parquet"))[0]
        shutil.move(part, str(landing / f"feed{i}.parquet"))
    got = streaming_ewma(spark, sf, str(tmp_path), max_files_per_trigger=1)
    want = ewma_smooth(dedup_exact(parse_bronze(raw)))
    g = sorted(tuple(r) for r in got.collect())
    w = sorted(tuple(r) for r in want.collect())
    assert g == w


def test_streaming_ohlc_merges_window_partials_across_batches(spark, tmp_path):
    """Split the feed by alternating event_id so every hour window
    receives rows in BOTH micro-batches: the merged min_by/max_by
    partials must still pick the chronologically first/last reading of
    the window — equal to the batch downsample exactly."""
    import glob
    import os as _os
    import shutil

    from telemetry_streaming_datalake_spark.ingest.bronze import (
        dedup_exact,
        parse_bronze,
    )
    from telemetry_streaming_datalake_spark.operators.derived import downsample_ohlc
    from telemetry_streaming_datalake_spark.session import load_table
    from telemetry_streaming_datalake_spark.streaming.pipeline import streaming_ohlc

    sf = "/root/testdata/sf0.001"
    raw = load_table(spark, sf, "events")
    landing = tmp_path / "landing"
    landing.mkdir()
    halves = [
        raw.filter(F.col("event_id") % 2 == 0),
        raw.filter(F.col("event_id") % 2 == 1),
    ]
    for i, half in enumerate(halves):
        tmp_out = str(tmp_path / f"half{i}")
        half.coalesce(1).write.parquet(tmp_out)
        part = glob.glob(_os.path.join(tmp_out, "part-*.parquet"))[0]
        shutil.move(part, str(landing / f"feed{i}.parquet"))
    got = streaming_ohlc(spark, sf, str(tmp_path), max_files_per_trigger=1)
    want = downsample_ohlc(dedup_exact(parse_bronze(raw)))
    g = sorted(tuple(r) for r in got.collect())
    w = sorted(tuple(r) for r in want.collect())
    assert g == w


def test_streaming_ohlc_dedups_duplicate_readings(spark, tmp_path):
    """Inject hash-key duplicates (same serial/metric/ts, higher
    event_id, DIFFERENT value) into a second micro-batch file: the
    silver-hop dedup must drop them, so the OHLC output still equals
    the batch twin over dedup_exact input — without the dedup hop the
    duplicates would inflate n/mean and flip min_by/max_by ties."""
    import glob
    import os as _os
    import shutil

    from telemetry_streaming_datalake_spark.ingest.bronze import (
        dedup_exact,
        parse_bronze,
    )
    from telemetry_streaming_datalake_spark.operators.derived import downsample_ohlc
    from telemetry_streaming_datalake_spark.session import load_table
    from telemetry_streaming_datalake_spark.streaming.pipeline import streaming_ohlc

    sf = "/root/testdata/sf0.001"
    raw = load_table(spark, sf, "events")
    max_id = raw.agg(F.max("event_id")).collect()[0][0]
    dups = (
        raw.orderBy("event_id")
        .limit(200)
        .withColumn("event_id", F.col("event_id") + max_id + 1)
        .withColumn("value", F.col("value") * 10 + 1)
    )
    landing = tmp_path / "landing"
    landing.mkdir()
    for i, part_df in enumerate([raw, dups]):
        tmp_out = str(tmp_path / f"half{i}")
        part_df.coalesce(1).write.parquet(tmp_out)
        part = glob.glob(_os.path.join(tmp_out, "part-*.parquet"))[0]
        shutil.move(part, str(landing / f"feed{i}.parquet"))
    got = streaming_ohlc(spark, sf, str(tmp_path), max_files_per_trigger=1)
    full = raw.unionByName(dups)
    want = downsample_ohlc(dedup_exact(parse_bronze(full)))
    g = sorted(tuple(r) for r in got.collect())
    w = sorted(tuple(r) for r in want.collect())
    assert g == w


def test_streaming_hll_union_is_lossless_across_batches(spark, tmp_path):
    """Chop the feed into two micro-batches: the store's merged
    sketches must estimate EXACTLY what one batch sketch over the
    whole feed estimates (union at one lgConfigK is lossless), and the
    audit flag must hold for every group."""
    import glob
    import os as _os
    import shutil

    from telemetry_streaming_datalake_spark.ingest.bronze import parse_bronze
    from telemetry_streaming_datalake_spark.session import load_table
    from telemetry_streaming_datalake_spark.streaming.pipeline import (
        HLL_STREAM_LG_K,
        streaming_approx_distinct,
    )

    sf = "/root/testdata/sf0.001"
    raw = load_table(spark, sf, "events")
    landing = tmp_path / "landing"
    landing.mkdir()
    halves = [
        raw.filter(F.col("event_id") % 2 == 0),
        raw.filter(F.col("event_id") % 2 == 1),
    ]
    for i, half in enumerate(halves):
        tmp_out = str(tmp_path / f"half{i}")
        half.coalesce(1).write.parquet(tmp_out)
        part = glob.glob(_os.path.join(tmp_out, "part-*.parquet"))[0]
        shutil.move(part, str(landing / f"feed{i}.parquet"))
    out = streaming_approx_distinct(spark, sf, str(tmp_path), max_files_per_trigger=1)
    rows = out.collect()
    assert rows and all(r.within_tol for r in rows)
    # merged estimates == direct single-sketch estimates over the feed
    from telemetry_streaming_datalake_spark.streaming.pipeline import read_hll_store

    merged = read_hll_store(spark, str(tmp_path / "hll_store")).select(
        "metric", "datestamp", F.hll_sketch_estimate("sketch").alias("est")
    )
    direct = (
        parse_bronze(raw)
        .groupBy("metric", "datestamp")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("serial", F.lit(HLL_STREAM_LG_K))
            ).alias("est")
        )
    )
    assert sorted(tuple(r) for r in merged.collect()) == sorted(
        tuple(r) for r in direct.collect()
    )


def test_hll_store_merge_is_replay_idempotent(spark, tmp_path):
    """HLL union is idempotent (register maxima), so re-merging the
    same micro-batch after a checkpoint replay leaves every estimate
    unchanged — no batch-id bookkeeping needed for THIS sink."""
    from telemetry_streaming_datalake_spark.streaming.pipeline import (
        HLL_STREAM_LG_K,
        _merge_hll_store,
        read_hll_store,
    )

    store = str(tmp_path / "hll")
    batch = spark.createDataFrame(
        [("m", "d1", f"s{i}") for i in range(50)],
        "metric string, datestamp string, serial string",
    )
    agg = batch.groupBy("metric", "datestamp").agg(
        F.hll_sketch_agg("serial", F.lit(HLL_STREAM_LG_K)).alias("sketch")
    )
    _merge_hll_store(spark, store, agg)
    first = read_hll_store(spark, store).select(
        F.hll_sketch_estimate("sketch")
    ).collect()[0][0]
    _merge_hll_store(spark, store, agg)  # replayed batch
    again = read_hll_store(spark, store).select(
        F.hll_sketch_estimate("sketch")
    ).collect()[0][0]
    assert first == again


def test_hll_store_crash_mid_write_keeps_previous_version(spark, tmp_path):
    """A version dir written WITHOUT the pointer swap (crash before
    commit) must be invisible: reads return the previous committed
    store, and the next merge ignores the orphan and sweeps it."""
    import os as _os

    from telemetry_streaming_datalake_spark.streaming.pipeline import (
        HLL_STREAM_LG_K,
        _merge_hll_store,
        read_hll_store,
    )

    store = str(tmp_path / "hll")

    def sketch_of(serials):
        batch = spark.createDataFrame(
            [("m", "d1", s) for s in serials],
            "metric string, datestamp string, serial string",
        )
        return batch.groupBy("metric", "datestamp").agg(
            F.hll_sketch_agg("serial", F.lit(HLL_STREAM_LG_K)).alias("sketch")
        )

    _merge_hll_store(spark, store, sketch_of([f"s{i}" for i in range(50)]))
    committed = read_hll_store(spark, store).select(
        F.hll_sketch_estimate("sketch")
    ).collect()[0][0]
    # simulate a crash: v1 data lands but CURRENT never moves
    sketch_of(["zz1", "zz2"]).write.parquet(_os.path.join(store, "v1"))
    assert read_hll_store(spark, store).select(
        F.hll_sketch_estimate("sketch")
    ).collect()[0][0] == committed
    # replayed batch merges into the COMMITTED version, orphan is swept
    _merge_hll_store(spark, store, sketch_of([f"t{i}" for i in range(10)]))
    versions = sorted(d for d in _os.listdir(store) if d.startswith("v"))
    assert versions == [_os.path.basename(
        _os.path.join(store, open(_os.path.join(store, "CURRENT")).read().strip())
    )]
    final = read_hll_store(spark, store).select(
        F.hll_sketch_estimate("sketch")
    ).collect()[0][0]
    assert final >= committed  # 50 + 10 serials, zz* never merged
    assert final < committed + 12


def test_resilient_store_attaches_to_real_stream(spark, tmp_path):
    """ResilientKVServingStore drops into the shared writeStream
    plumbing (attach_serving_sink) and lands a streamed aggregate with
    a transient per-item fault retried in-flight."""
    from telemetry_streaming_datalake_spark.streaming.sinks import (
        ResilientKVServingStore,
        attach_serving_sink,
    )

    src_dir = tmp_path / "feed"
    spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0)], "id string, v double"
    ).write.parquet(str(src_dir))
    schema = spark.read.parquet(str(src_dir)).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(str(src_dir))
        .groupBy("id")
        .agg(F.sum("v").alias("total"))
    )
    fail_left = {"b": 1}
    store = ResilientKVServingStore(max_attempts=3)
    real_write = store._write_item

    def flaky(k, v):
        if fail_left.get(k, 0) > 0:
            fail_left[k] -= 1
            raise IOError("throttled")
        real_write(k, v)

    store._write_item = flaky
    attach_serving_sink(stream, store, str(tmp_path / "ckpt"))
    assert store.data["a"]["total"] == 3.0
    assert store.data["b"]["total"] == 5.0
    assert not store.dead_letters


def test_streaming_cusum_carries_drift_across_batches(spark, tmp_path):
    """Time-split feed at maxFilesPerTrigger=1: batch-2 statistics must
    continue batch-1's integer drift state, and the union of emissions
    must equal the batch cusum_changepoint exactly (integer state ==
    bit-exact parity)."""
    import glob
    import os as _os
    import shutil

    from telemetry_streaming_datalake_spark.ingest.bronze import (
        dedup_exact,
        parse_bronze,
    )
    from telemetry_streaming_datalake_spark.operators.derived import (
        cusum_changepoint,
    )
    from telemetry_streaming_datalake_spark.session import load_table
    from telemetry_streaming_datalake_spark.streaming.pipeline import streaming_cusum

    sf = "/root/testdata/sf0.001"
    raw = load_table(spark, sf, "events")
    ts_cut = raw.select(F.unix_timestamp("ts").alias("u")).approxQuantile("u", [0.5], 0.0)[0]
    landing = tmp_path / "landing"
    landing.mkdir()
    halves = [
        raw.filter(F.unix_timestamp("ts") <= ts_cut),
        raw.filter(F.unix_timestamp("ts") > ts_cut),
    ]
    for i, half in enumerate(halves):
        tmp_out = str(tmp_path / f"half{i}")
        half.coalesce(1).write.parquet(tmp_out)
        part = glob.glob(_os.path.join(tmp_out, "part-*.parquet"))[0]
        shutil.move(part, str(landing / f"feed{i}.parquet"))
    got = streaming_cusum(spark, sf, str(tmp_path), max_files_per_trigger=1)
    want = cusum_changepoint(dedup_exact(parse_bronze(raw)))
    g = sorted(tuple(r) for r in got.collect())
    w = sorted(tuple(r) for r in want.collect())
    assert g == w


def test_upsert_store_abort_mid_apply_keeps_committed_state(spark, tmp_path):
    """An apply that dies before the pointer swap must be invisible:
    reads return the previous committed version, and the next
    successful apply sweeps the orphan dir."""
    import os as _os

    path = str(tmp_path / "store")
    store = ParquetUpsertStore(spark, path, key="id")
    b0 = spark.createDataFrame([("a", 1), ("b", 2)], "id string, v int")
    store.apply_batch(b0, 0)
    committed = {r.id: r.v for r in store.read().collect()}
    # simulate a crash: v1 data lands but CURRENT never moves
    spark.createDataFrame([("zz", 99)], "id string, v int").write.parquet(
        _os.path.join(path, "v1")
    )
    assert {r.id: r.v for r in store.read().collect()} == committed
    # replayed/next batch applies on the COMMITTED state; orphan swept
    b1 = spark.createDataFrame([("b", 20)], "id string, v int")
    store.apply_batch(b1, 1)
    assert {r.id: r.v for r in store.read().collect()} == {"a": 1, "b": 20}
    versions = sorted(
        d for d in _os.listdir(path) if d.startswith("v") and d[1:].isdigit()
    )
    cur = _os.path.basename(store.current_data_dir())
    assert cur in versions and "v1" not in versions or cur == "v1"


def test_streaming_slo_burn_equals_batch(spark, tmp_path):
    """Drained streaming SLO burn == the batch operator row-for-row:
    the hourly partials merge across micro-batches and the rolling
    stage is literally the batch code (`slo_rolling`), so every burn
    ratio and both alert gates must be bit-identical."""
    from telemetry_streaming_datalake_spark.ingest.bronze import (
        dedup_exact,
        parse_bronze,
    )
    from telemetry_streaming_datalake_spark.operators.detect import slo_burn_alerts
    from telemetry_streaming_datalake_spark.session import load_table
    from telemetry_streaming_datalake_spark.streaming.pipeline import (
        streaming_slo_burn,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r) for r in streaming_slo_burn(spark, sf, str(tmp_path)).collect()
    )
    want = sorted(
        tuple(r)
        for r in slo_burn_alerts(
            dedup_exact(parse_bronze(load_table(spark, sf, "events")))
        ).collect()
    )
    assert got == want and len(got) > 0


def test_streaming_cdc_apply_equals_batch(spark, tmp_path):
    """Drained streaming CDC fold == the batch apply row-for-row,
    including keys whose final op is a tombstone (absent) and the
    audit counts."""
    from telemetry_streaming_datalake_spark.ingest.bronze import (
        dedup_exact,
        parse_bronze,
    )
    from telemetry_streaming_datalake_spark.operators.merge import cdc_apply
    from telemetry_streaming_datalake_spark.session import load_table
    from telemetry_streaming_datalake_spark.streaming.pipeline import (
        streaming_cdc_apply,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r) for r in streaming_cdc_apply(spark, sf, str(tmp_path)).collect()
    )
    batch = cdc_apply(dedup_exact(parse_bronze(load_table(spark, sf, "events"))))
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want and len(got) > 0


def test_streaming_cms_cells_equal_batch_sketch_across_batches(spark, tmp_path):
    """Chop the feed into two micro-batches: the store's merged cells
    must equal the single batch sketch over the whole (deduped) feed
    EXACTLY — cell-wise addition is lossless — and the drained audit
    (the batch audit code path fed the store's cells) must hold for
    every row."""
    import glob
    import os as _os
    import shutil

    from telemetry_streaming_datalake_spark.ingest.bronze import (
        dedup_exact,
        parse_bronze,
    )
    from telemetry_streaming_datalake_spark.operators.rollup import cms_sketch
    from telemetry_streaming_datalake_spark.session import load_table
    from telemetry_streaming_datalake_spark.streaming.pipeline import (
        read_cms_store,
        streaming_freq_sketch,
    )

    sf = "/root/testdata/sf0.001"
    raw = load_table(spark, sf, "events")
    landing = tmp_path / "landing"
    landing.mkdir()
    halves = [
        raw.filter(F.col("event_id") % 2 == 0),
        raw.filter(F.col("event_id") % 2 == 1),
    ]
    for i, half in enumerate(halves):
        tmp_out = str(tmp_path / f"half{i}")
        half.coalesce(1).write.parquet(tmp_out)
        part = glob.glob(_os.path.join(tmp_out, "part-*.parquet"))[0]
        shutil.move(part, str(landing / f"feed{i}.parquet"))
    out = streaming_freq_sketch(spark, sf, str(tmp_path), max_files_per_trigger=1)
    rows = out.collect()
    assert rows and all(r.within_contract for r in rows)
    merged = {
        (r.row_idx, r.col_idx): r.cell_count
        for r in read_cms_store(spark, str(tmp_path / "cms_store")).collect()
    }
    direct = {
        (r.row_idx, r.col_idx): r.cell_count
        for r in cms_sketch(
            dedup_exact(parse_bronze(raw))
        ).collect()
    }
    assert merged == direct


def test_cms_store_replay_is_skipped_by_ledger(spark, tmp_path):
    """Cell-wise addition is NOT idempotent (unlike HLL register
    union), so a checkpoint-replayed batch id must be skipped by the
    store's applied-batch ledger; a NEW batch id still merges."""
    from telemetry_streaming_datalake_spark.operators.rollup import cms_sketch
    from telemetry_streaming_datalake_spark.streaming.pipeline import (
        _merge_cms_store,
        read_cms_store,
    )

    store = str(tmp_path / "store")
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "serial string")
    cells = cms_sketch(df)
    _merge_cms_store(spark, store, cells, 0)
    first = sorted(tuple(r) for r in read_cms_store(spark, store).collect())
    _merge_cms_store(spark, store, cells, 0)  # replayed batch id
    assert sorted(tuple(r) for r in read_cms_store(spark, store).collect()) == first
    _merge_cms_store(spark, store, cells, 1)  # genuinely new batch
    doubled = {
        (r.row_idx, r.col_idx): r.cell_count
        for r in read_cms_store(spark, store).collect()
    }
    assert doubled == {
        (r.row_idx, r.col_idx): 2 * r.cell_count
        for r in cells.collect()
    }


def test_cms_store_ignores_uncommitted_version_dir(spark, tmp_path):
    """A v-dir without the CURRENT pointer swap (crash mid-write) must
    be invisible: reads resolve the committed version and a subsequent
    merge overwrites the leftover."""
    import os as _os

    from telemetry_streaming_datalake_spark.operators.rollup import cms_sketch
    from telemetry_streaming_datalake_spark.streaming.pipeline import (
        _merge_cms_store,
        read_cms_store,
    )

    store = str(tmp_path / "store")
    df = spark.createDataFrame([("a",), ("b",)], "serial string")
    cells = cms_sketch(df)
    _merge_cms_store(spark, store, cells, 0)
    committed = sorted(tuple(r) for r in read_cms_store(spark, store).collect())
    # simulate a crash: v1 data written, pointer never swapped
    crash_dir = _os.path.join(store, "v1", "cells")
    cells.write.mode("overwrite").parquet(crash_dir)
    assert sorted(tuple(r) for r in read_cms_store(spark, store).collect()) == committed
    _merge_cms_store(spark, store, cells, 1)  # recovery merge lands in v1
    assert {
        (r.row_idx, r.col_idx): r.cell_count
        for r in read_cms_store(spark, store).collect()
    } == {(r.row_idx, r.col_idx): 2 * r.cell_count for r in cells.collect()}


def test_streaming_cms_drops_cross_batch_duplicates(spark, tmp_path):
    """A reading replayed VERBATIM in a later micro-batch (same
    unique_hash_key) must not inflate the sketch: the watermarked
    dropDuplicatesWithinWatermark state spans batches, so the store
    still equals the batch sketch over the DEDUPED feed.  The sf
    fixtures carry no duplicates, so this injects one — the dedup
    parity claim gets its own red path."""
    import glob
    import os as _os
    import shutil

    from telemetry_streaming_datalake_spark.ingest.bronze import (
        dedup_exact,
        parse_bronze,
    )
    from telemetry_streaming_datalake_spark.operators.rollup import cms_sketch
    from telemetry_streaming_datalake_spark.session import load_table
    from telemetry_streaming_datalake_spark.streaming.pipeline import (
        read_cms_store,
        streaming_freq_sketch,
    )

    sf = "/root/testdata/sf0.001"
    raw = load_table(spark, sf, "events")
    landing = tmp_path / "landing"
    landing.mkdir()
    first = raw.filter(F.col("event_id") % 2 == 0)
    # batch 2 = the odd half PLUS a verbatim replay of 50 batch-1 rows
    # (same serial/metric/ts -> same unique_hash_key, higher event_id)
    replay = (
        first.orderBy("event_id")
        .limit(50)
        .withColumn("event_id", F.col("event_id") + F.lit(10_000_000))
    )
    second = raw.filter(F.col("event_id") % 2 == 1).unionByName(replay)
    for i, half in enumerate([first, second]):
        tmp_out = str(tmp_path / f"half{i}")
        half.coalesce(1).write.parquet(tmp_out)
        part = glob.glob(_os.path.join(tmp_out, "part-*.parquet"))[0]
        shutil.move(part, str(landing / f"feed{i}.parquet"))
    out = streaming_freq_sketch(spark, sf, str(tmp_path), max_files_per_trigger=1)
    assert all(r.within_contract for r in out.collect())
    merged = {
        (r.row_idx, r.col_idx): r.cell_count
        for r in read_cms_store(spark, str(tmp_path / "cms_store")).collect()
    }
    direct = {
        (r.row_idx, r.col_idx): r.cell_count
        for r in cms_sketch(dedup_exact(parse_bronze(raw))).collect()
    }
    assert merged == direct  # the 50 replayed rows left no trace


def test_web_front_door_runs_as_a_stream(spark, tmp_path):
    """The crawl-ingest shape end-to-end under Structured Streaming:
    raw HTML pages stream in, `html_extract` runs per micro-batch
    (map-only — streamable as-is, no state), and the drained
    extraction equals the batch extraction row-for-row (batch==stream
    code, the streaming_corpus_gate discipline)."""
    import shutil

    from telemetry_streaming_datalake_spark.operators import web as W
    from telemetry_streaming_datalake_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    pages = W.attach_html_payload(docs)
    src = str(tmp_path / "pages")
    pages.write.mode("overwrite").parquet(src)

    out_dir = str(tmp_path / "extracted")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    (
        W.html_extract(None, payloads=stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    drained = {
        (r.doc_id, r.extracted_text, r.n_blocks, r.n_dropped)
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = {
        (r.doc_id, r.extracted_text, r.n_blocks, r.n_dropped)
        for r in W.html_extract(docs).collect()
    }
    assert drained == batch
    shutil.rmtree(out_dir, ignore_errors=True)


def test_streaming_url_frontier_matches_batch_keepers(spark, tmp_path):
    """The crawl frontier drained over four doc_id-ranged micro-batches
    admits EXACTLY the batch operator's keeper rows (unblocked,
    earliest doc_id per canonical URL) — first-batch-wins across the
    persisted seen-store coincides with the batch min-doc_id rule."""
    from telemetry_streaming_datalake_spark.operators import web as W
    from telemetry_streaming_datalake_spark.session import load_table

    got = {
        (r.doc_id, r.canonical_url)
        for r in SP.streaming_url_frontier(spark, SF_DIR, str(tmp_path)).collect()
    }
    batch = W.url_canonicalize(load_table(spark, SF_DIR, "documents"))
    want = {
        (r.doc_id, r.canonical_url)
        for r in batch.filter("is_keeper").collect()
    }
    assert got == want
    # the frontier admitted strictly fewer rows than arrived (dedup
    # and blocklist both live)
    assert len(got) < load_table(spark, SF_DIR, "documents").count()


def test_streaming_frontier_staging_order_survives_ten_plus_files(
    spark, tmp_path
):
    """≥10 staged landing files (VERDICT r14 #2): lexicographic file
    order breaks at i>=10 ('10_' < '2_'), which would scramble the
    arrival order first-batch-wins == min-doc_id relies on.  The
    staging stamps mtimes under a NUMERIC sort key, so a 12-file drain
    must (a) stage files whose mtimes strictly increase in doc_id-range
    order and (b) admit exactly the batch keeper rows."""
    import os

    from telemetry_streaming_datalake_spark.operators import web as W
    from telemetry_streaming_datalake_spark.session import load_table

    got = {
        (r.doc_id, r.canonical_url)
        for r in SP.streaming_url_frontier(
            spark, SF_DIR, str(tmp_path), n_files=12
        ).collect()
    }
    landing = str(tmp_path / "frontier_landing")
    staged = sorted(
        os.listdir(landing), key=lambda f: int(f.split("_", 1)[0])
    )
    assert len(staged) >= 10, "staging must actually cross the i>=10 seam"
    mtimes = [os.path.getmtime(os.path.join(landing, f)) for f in staged]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == len(mtimes), (
        "mtimes must strictly increase in numeric index (= doc_id range) "
        f"order, got {list(zip(staged, mtimes))}"
    )
    batch = W.url_canonicalize(load_table(spark, SF_DIR, "documents"))
    want = {
        (r.doc_id, r.canonical_url)
        for r in batch.filter("is_keeper").collect()
    }
    assert got == want


def test_streaming_url_frontier_compaction_folds_and_bounds_store(
    spark, tmp_path
):
    """With compact_every=2 over five micro-batches, the delta dirs
    fold twice (batch 2: 0-1; batch 4: compacted+2-3) — admissions
    are unchanged and the final store is ONE compacted dir + the last
    batch's delta, not O(batches) dirs (VERDICT r13 #3)."""
    import os

    from telemetry_streaming_datalake_spark.operators import web as W
    from telemetry_streaming_datalake_spark.session import load_table

    got = {
        (r.doc_id, r.canonical_url)
        for r in SP.streaming_url_frontier(
            spark, SF_DIR, str(tmp_path), n_files=5, compact_every=2
        ).collect()
    }
    batch = W.url_canonicalize(load_table(spark, SF_DIR, "documents"))
    want = {
        (r.doc_id, r.canonical_url)
        for r in batch.filter("is_keeper").collect()
    }
    assert got == want
    state = sorted(
        d
        for d in os.listdir(str(tmp_path / "frontier_seen"))
        if d.startswith(("batch=", "compacted_v="))
    )
    assert state == ["batch=4", "compacted_v=4"]
    # the compacted store is hive-bucketed for partition-pruned probes
    comp = str(tmp_path / "frontier_seen" / "compacted_v=4")
    assert any(d.startswith("bucket=") for d in os.listdir(comp))
    # compacted + last delta together hold every admission exactly once
    delta = str(tmp_path / "frontier_seen" / "batch=4")
    urls = [
        r.canonical_url
        for r in spark.read.option("basePath", comp)
        .parquet(comp)
        .unionByName(
            spark.read.option("basePath", delta).parquet(delta)
        )
        .collect()
    ]
    assert sorted(urls) == sorted({u for _d, u in got})


def test_streaming_paragraph_dedup_equals_batch_operator(spark, tmp_path):
    """Corpus-grain paragraph dedup drained over doc_id-ranged
    micro-batches equals the batch rewrite exactly: the cross-batch
    chunk-hash store makes first-batch-wins coincide with the global
    min-(doc_id, idx) winner (identical oracle — the batch->stream
    twin pattern)."""
    from telemetry_streaming_datalake_spark.operators import dedup as DD
    from telemetry_streaming_datalake_spark.session import load_table

    got = {
        tuple(r)
        for r in SP.streaming_paragraph_dedup(
            spark, SF_DIR, str(tmp_path), n_files=3, compact_every=2
        ).collect()
    }
    want = {
        tuple(r)
        for r in DD.paragraph_dedup(
            load_table(spark, SF_DIR, "documents")
        ).collect()
    }
    assert got == want and len(got) > 0
    # the chunk store compacted at batch 2 (fold proof: bounded dirs)
    state = sorted(
        d
        for d in os.listdir(str(tmp_path / "para_seen"))
        if d.startswith(("batch=", "compacted_v="))
    )
    assert state == ["batch=2", "compacted_v=2"]


def test_streaming_paragraph_dedup_full_replay_is_idempotent(spark, tmp_path):
    first, second = _rerun_after_checkpoint_loss(
        spark,
        tmp_path,
        lambda: SP.streaming_paragraph_dedup(
            spark, SF_DIR, str(tmp_path), n_files=2
        ),
        "para_ckpt",
    )
    assert first == second and len(first) > 0


def test_streaming_url_frontier_replay_with_compaction_is_idempotent(
    spark, tmp_path
):
    """Checkpoint loss AFTER a compaction has folded (and deleted) the
    early delta dirs: every batch replays against the compacted store
    and re-admits identical rows — the _SUCCESS guard skips the
    re-fold whose inputs are gone."""
    first, second = _rerun_after_checkpoint_loss(
        spark,
        tmp_path,
        lambda: SP.streaming_url_frontier(
            spark, SF_DIR, str(tmp_path), n_files=3, compact_every=2
        ),
        "frontier_ckpt",
    )
    assert first == second and len(first) > 0


def test_seen_probe_is_partition_pruned_on_touched_buckets(spark, tmp_path):
    """The cross-batch anti-join's scan of the seen-store carries a
    pushed PartitionFilter on `bucket` — per-batch probe I/O is
    O(touched buckets), never a full-store scan (the bm25_indexed /
    ann_ivf_indexed pruned-probe posture)."""
    import re

    seen_dir = str(tmp_path / "seen")
    os.makedirs(seen_dir)
    prior = (
        spark.createDataFrame(
            [(f"http://h{i}.example.com/",) for i in range(40)],
            "canonical_url string",
        )
        .withColumn("bucket", SP._seen_bucket_col())
    )
    prior.write.partitionBy("bucket").parquet(
        os.path.join(seen_dir, "batch=0")
    )
    cand = (
        spark.createDataFrame(
            [(1, "http://h1.example.com/"), (2, "http://new.example.com/")],
            "doc_id long, canonical_url string",
        )
        .withColumn("bucket", SP._seen_bucket_col())
        .localCheckpoint(eager=True)
    )
    probed = SP._seen_probe(cand, seen_dir, 1)
    p = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in p
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", p)
    assert m and "bucket" in m.group(1) and "IN" in m.group(1).upper()
    # and the probe is correct: the seen URL drops, the new one stays
    assert {r.doc_id for r in probed.collect()} == {2}


def test_streaming_web_ingest_matches_batch_manifest(spark, tmp_path):
    """The full front door drained as a stream (frontier admission →
    robots → WARC parse → html_extract over the parsed body → Gopher
    gate) lands EXACTLY the batch web_ingest_manifest's final_keep
    rows joined to their extractions — and the html_md5 column proves
    the extraction consumed the PARSED record body, not a
    re-synthesis."""
    from telemetry_streaming_datalake_spark.operators import web as W
    from telemetry_streaming_datalake_spark.session import load_table

    got = {
        (r.doc_id, r.canonical_url, r.html_md5, r.extracted_text, r.n_blocks)
        for r in SP.streaming_web_ingest(spark, SF_DIR, str(tmp_path)).collect()
    }
    docs = load_table(spark, SF_DIR, "documents")
    m = W.web_ingest_manifest(docs).filter("final_keep").select(
        "doc_id", "canonical_url"
    )
    ext = W.html_extract(docs)
    pages = W.attach_html_payload(docs).select(
        "doc_id", F.md5("html").alias("html_md5")
    )
    want = {
        (r.doc_id, r.canonical_url, r.html_md5, r.extracted_text, r.n_blocks)
        for r in m.join(ext, "doc_id").join(pages, "doc_id").select(
            "doc_id", "canonical_url", "html_md5", "extracted_text", "n_blocks"
        ).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_change_feed_matches_batch_silver_post_cutoff(spark, tmp_path):
    """A silver hop drained FROM read_changes(v0) equals batch silver
    restricted to the post-cutoff delta — the startingVersion chaining
    run end-to-end through a stream."""
    from telemetry_streaming_datalake_spark import datamodel as dm
    from telemetry_streaming_datalake_spark.ingest.silver import to_silver
    from telemetry_streaming_datalake_spark.session import load_table

    got = {
        (r.event_id, r.metric_id, r.value, r.unix_ts)
        for r in SP.streaming_change_feed(spark, SF_DIR, str(tmp_path)).collect()
    }
    ded = B.dedup_exact(B.parse_bronze(load_table(spark, SF_DIR, "events")))
    want = {
        (r.event_id, r.metric_id, r.value, r.unix_ts)
        for r in to_silver(
            ded.filter(F.col("unix_ts") >= 1705276800), dm.metric_mapping(spark)
        ).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_publish_jsonl_roundtrip_equals_batch_dedup(spark, tmp_path):
    """The published JSONL feed re-read through the wire schema is a
    LOSSLESS round trip of the deduped bronze — the pin that lets the
    registry key ride `streaming_silver_dedup`'s identical oracle
    (r13 retirement; the publish sink stays covered here)."""
    got = {
        (r.event_id, r.unique_hash_key, r.value, r.unix_ts)
        for r in SP.streaming_publish_jsonl(spark, SF_DIR, str(tmp_path)).collect()
    }
    from telemetry_streaming_datalake_spark.session import load_table

    want = {
        (r.event_id, r.unique_hash_key, r.value, r.unix_ts)
        for r in B.dedup_exact(
            B.parse_bronze(load_table(spark, SF_DIR, "events"))
        ).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_change_feed_empty_delta_is_empty_not_an_error(spark, tmp_path):
    """A subscription with nothing past the high-water mark drains
    zero batches and returns the hop's EMPTY relation with the right
    schema — never a path error or a snapshot redelivery."""
    out = SP.streaming_change_feed(
        spark, SF_DIR, str(tmp_path), cutoff=4_000_000_000
    )
    assert out.count() == 0
    assert "metric_id" in out.columns and "value" in out.columns


def _rerun_after_checkpoint_loss(spark, tmp_path, fn, ckpt_name):
    """Drain once, then delete ONLY the checkpoint and drain again —
    every batch replays against the surviving cross-batch state, the
    exact scenario of the r12 frontier replay bug (a replayed batch
    anti-joining its own prior output and erasing its admissions)."""
    import shutil

    first = {tuple(r) for r in fn().collect()}
    shutil.rmtree(str(tmp_path / ckpt_name))
    second = {tuple(r) for r in fn().collect()}
    return first, second


def test_streaming_url_frontier_full_replay_is_idempotent(spark, tmp_path):
    # n_files=2: the replay property needs >=2 batches, not 4 — halves
    # the double-drain cost (partest budget)
    first, second = _rerun_after_checkpoint_loss(
        spark,
        tmp_path,
        lambda: SP.streaming_url_frontier(spark, SF_DIR, str(tmp_path), n_files=2),
        "frontier_ckpt",
    )
    assert first == second and len(first) > 0


def test_streaming_web_ingest_full_replay_is_idempotent(spark, tmp_path):
    first, second = _rerun_after_checkpoint_loss(
        spark,
        tmp_path,
        lambda: SP.streaming_web_ingest(spark, SF_DIR, str(tmp_path), n_files=2),
        "ingest_ckpt",
    )
    assert first == second and len(first) > 0


def test_streaming_change_feed_full_replay_is_idempotent(spark, tmp_path):
    first, second = _rerun_after_checkpoint_loss(
        spark,
        tmp_path,
        lambda: SP.streaming_change_feed(spark, SF_DIR, str(tmp_path)),
        "feed_ckpt",
    )
    assert first == second and len(first) > 0
