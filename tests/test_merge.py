"""MERGE INTO analog + connected-components dup clustering."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from telemetry_streaming_datalake_spark.operators import merge as M


def test_merge_into_three_clauses(spark):
    target = spark.createDataFrame(
        [Row(id="keep", v=1, w="t1"), Row(id="upd", v=2, w="t2")]
    )
    source = spark.createDataFrame(
        [Row(id="upd", v=20, w="s2"), Row(id="ins", v=30, w="s3")]
    )
    got = {r.id: r for r in M.merge_into(target, source, "id", ["v", "w"]).collect()}
    assert len(got) == 3
    assert (got["keep"].v, got["keep"].w) == (1, "t1")   # unmatched target kept
    assert (got["upd"].v, got["upd"].w) == (20, "s2")     # matched → source wins
    assert (got["ins"].v, got["ins"].w) == (30, "s3")     # unmatched source inserted


def test_merge_into_null_source_value_overwrites(spark):
    """A matched source row with a NULL value column must still
    overwrite (MERGE semantics), not fall back to the target value."""
    target = spark.createDataFrame([Row(id="a", v=1)])
    source = spark.createDataFrame([("a", None)], "id string, v bigint")
    got = M.merge_into(target, source, "id", ["v"]).collect()[0]
    assert got.v is None


def test_dup_clusters_transitive(spark):
    """A≈B and B≈C must land in ONE cluster labelled min(doc_id)."""
    pairs = spark.createDataFrame(
        [Row(doc_a=2, doc_b=1), Row(doc_a=2, doc_b=3), Row(doc_a=10, doc_b=11)]
    )
    got = {r.doc_id: r.cluster_id for r in M.dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_dup_clusters_chain_diameter(spark):
    """A long path graph exercises multi-round label propagation."""
    pairs = spark.createDataFrame([Row(doc_a=i, doc_b=i + 1) for i in range(1, 9)])
    got = {r.doc_id: r.cluster_id for r in M.dup_clusters(pairs).collect()}
    assert set(got.values()) == {1}
    assert len(got) == 9


def test_dup_clusters_nonconvergence_raises(spark, monkeypatch):
    """A component whose diameter exceeds the round bound must fail
    loudly instead of returning split cluster_ids as if correct."""
    monkeypatch.setattr(M, "CC_MAX_ITERS", 3)
    pairs = spark.createDataFrame([Row(doc_a=i, doc_b=i + 1) for i in range(1, 9)])
    with pytest.raises(RuntimeError, match="did not converge"):
        M.dup_clusters(pairs).collect()


def test_merge_upsert_latest_equals_global_latest(spark, events, customer):
    """Merging the pre-cutoff store with the post-cutoff batch must
    reproduce the latest view computed over ALL data in one pass."""
    from telemetry_streaming_datalake_spark import datamodel as dm
    from telemetry_streaming_datalake_spark.ingest import bronze as B
    from telemetry_streaming_datalake_spark.ingest import silver as S
    from telemetry_streaming_datalake_spark.operators import temporal as T

    silver = S.to_silver(B.dedup_exact(B.parse_bronze(events)), dm.metric_mapping(spark))
    gold = T.enrich_gold(silver, dm.remote_history(spark, customer)).cache()
    cutoff = int(
        gold.agg(F.expr("percentile(unix_ts, 0.5)")).first()[0]
    )
    merged = M.merge_upsert_latest(gold, cutoff)
    # global latest without any cutoff split
    eligible = gold.filter(F.col("value_double").isNotNull())
    key = F.concat_ws("|", "remote_id", "metric_id", "provider_id", "category_id")
    want = (
        eligible.select(key.alias("id"), F.struct("unix_ts", "event_id", "value_double").alias("s"))
        .groupBy("id")
        .agg(F.max("s").alias("s"))
        .select("id", F.col("s.unix_ts").alias("last_ts"), F.col("s.value_double").alias("last_value"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, want.collect()))


def test_table_diff_classifies_all_three_changes(spark):
    from telemetry_streaming_datalake_spark.operators import merge as M

    old = spark.createDataFrame(
        [("a", 1, 10.0), ("b", 2, None), ("c", 3, 30.0)], "id string, ts long, v double"
    )
    new = spark.createDataFrame(
        [("a", 1, 10.0), ("b", 5, 20.0), ("d", 7, 70.0)], "id string, ts long, v double"
    )
    out = {r.id: r for r in M.table_diff(old, new, "id", ["ts", "v"]).collect()}
    assert set(out) == {"b", "c", "d"}         # 'a' unchanged → dropped
    assert out["b"].change == "updated"        # NULL old value diffs null-safely
    assert out["c"].change == "deleted" and out["c"].new_ts is None
    assert out["d"].change == "inserted" and out["d"].old_ts is None


def test_canonical_docs_keep_policy(spark):
    from pyspark.sql import functions as F

    from telemetry_streaming_datalake_spark.operators import merge as M

    docs = spark.createDataFrame(
        [(1, "a", "en", "s", 100), (2, "b", "en", "s", 300),
         (3, "c", "en", "s", 300), (4, "d", "en", "s", 50)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # 1-2-3 form one near-dup cluster; 4 is a singleton
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "doc_id long, cluster_id long"
    )
    out = {r.doc_id: r for r in M.canonical_docs(docs, clusters).collect()}
    # longest wins; tie between 2 and 3 (both 300 chars) → lowest id (2)
    assert out[1].canonical_id == 2 and not out[1].is_canonical
    assert out[2].is_canonical
    assert out[3].canonical_id == 2 and not out[3].is_canonical
    assert out[4].cluster_id == 4 and out[4].is_canonical


def test_dup_clusters_iso_fast_path_and_clique_mix(spark):
    """The isolated-pair fast path must coexist with iterated
    components: two degree-1 pairs (one listed in BOTH orientations —
    canonicalization keeps it on the fast path), a triangle clique,
    and a 3-node path, with no duplicated or missing nodes."""
    pairs = spark.createDataFrame(
        [
            Row(doc_a=20, doc_b=21), Row(doc_a=21, doc_b=20),  # iso, reversed dup
            Row(doc_a=30, doc_b=31),                            # iso
            Row(doc_a=1, doc_b=2), Row(doc_a=2, doc_b=3), Row(doc_a=1, doc_b=3),  # clique
            Row(doc_a=40, doc_b=41), Row(doc_a=41, doc_b=42),   # path
        ]
    )
    rows = M.dup_clusters(pairs).collect()
    got = {r.doc_id: r.cluster_id for r in rows}
    assert len(rows) == len(got) == 10  # no duplicate node rows
    assert got == {
        20: 20, 21: 20, 30: 30, 31: 30,
        1: 1, 2: 1, 3: 1, 40: 40, 41: 40, 42: 40,
    }


def test_cdc_apply_last_op_wins(spark):
    """A trailing tombstone removes the key entirely; a delete in the
    middle of the log is overridden by a later upsert; audit counts
    see every op regardless of outcome."""
    rows = [
        # key (a, m): U then D  -> absent from the result
        ("a", "m", 100, 1, 10.0, 3),   # payload_k=3 -> U
        ("a", "m", 200, 2, 11.0, 7),   # payload_k=7 -> D (last)
        # key (b, m): D then U  -> resurrected, latest value wins
        ("b", "m", 100, 3, 20.0, 14),  # D
        ("b", "m", 300, 4, 21.0, 8),   # U (last)
        # key (c, m): same-ts tie broken by event_id
        ("c", "m", 500, 5, 30.0, 1),   # U
        ("c", "m", 500, 6, 31.0, 2),   # U, higher event_id -> wins
    ]
    df = spark.createDataFrame(
        rows,
        "serial string, metric string, unix_ts long, event_id long,"
        " value double, payload_k long",
    )
    out = {(r.serial, r.metric): r for r in M.cdc_apply(df).collect()}
    assert ("a", "m") not in out
    b = out[("b", "m")]
    assert b.last_value == 21.0 and b.n_ops == 2 and b.n_deletes == 1
    c = out[("c", "m")]
    assert c.last_value == 31.0 and c.n_deletes == 0
