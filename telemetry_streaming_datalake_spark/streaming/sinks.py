"""Streaming sinks: keyed upsert (MERGE-analog) and latest-value store.

Reference semantics: every aggregate stream lands via ``foreachBatch``
+ MERGE/ItemOverwrite (``Gold Aggregation/Step 05 ….scala:108-121`` and
the Cosmos ``ItemOverwrite`` write strategy) — i.e. the sink is a
keyed upsert, newest batch wins per id.

Parquet-lake formulation: the store is a *partitioned* directory; an
upsert micro-batch touches ONLY the partitions its keys live in —
read those partitions (partition-pruned scan), resolve the winner per
key (incoming row wins: ItemOverwrite), and land the result through
Spark's dynamic partition overwrite, which replaces exactly the
partitions present in the written frame and leaves every other
partition's files untouched on disk.  That is the parquet analog of a
Delta ``MERGE``: cost is O(touched partitions), never O(store) — at
100 TB serving scale a micro-batch touching one hour of one day must
not rewrite years of history.  (``tests/test_streaming.py`` pins the
untouched-partition bytes.)  Swapping in Delta turns ``apply_batch``
into a literal MERGE with the same contract.
"""

from __future__ import annotations

import abc
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window


class ServingStoreWriter(abc.ABC):
    """The foreachBatch serving-sink contract a real KV client drops
    into (the reference's Cosmos ``ItemOverwrite`` strategy is one
    implementation; :class:`ParquetUpsertStore` is the lake analog).

    Contract:

    - ``apply_batch(batch_df, batch_id)`` upserts the batch keyed by
      ``self.key`` — newest batch wins per key (ItemOverwrite).
    - **Replay idempotency**: Structured Streaming re-delivers the
      SAME ``batch_id`` after a recovery; applying a batch twice must
      leave the store exactly as applying it once.  Key-overwrite
      semantics give this for free when the batch content is
      deterministic; writers with non-idempotent effects must track
      ``batch_id`` high-water marks themselves (see
      :class:`InMemoryKVServingStore`).
    """

    key: str = "id"

    @abc.abstractmethod
    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Land one micro-batch.  MUST be safe to call twice with the
        same (content, batch_id) pair."""


def attach_serving_sink(
    agg_stream: DataFrame,
    writer: ServingStoreWriter,
    checkpoint_dir: str,
    output_mode: str = "complete",
) -> None:
    """Shared writeStream plumbing for any serving-store writer:
    foreachBatch + checkpoint + deterministic availableNow drain."""
    (
        agg_stream.writeStream.outputMode(output_mode)
        .foreachBatch(writer.apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


class InMemoryKVServingStore(ServingStoreWriter):
    """Fake KV client proving the interface: dict-backed ItemOverwrite
    with an explicit applied-``batch_id`` set, so a replayed batch is
    skipped rather than re-applied — the high-water-mark discipline a
    real non-idempotent client (HTTP upsert API, accumulating
    counters) needs.  ``collect()`` limits it to test scale by design;
    a production client writes per-partition via ``foreachPartition``.
    """

    def __init__(self, key: str = "id") -> None:
        self.key = key
        self.data: dict = {}
        self.applied_batches: set[int] = set()
        self.apply_calls = 0

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        self.apply_calls += 1
        if batch_id in self.applied_batches:
            return  # replay after recovery — already landed
        for row in batch_df.collect():
            d = row.asDict()
            self.data[d[self.key]] = d
        self.applied_batches.add(batch_id)


class ResilientKVServingStore(ServingStoreWriter):
    """Per-item error isolation + bounded retry over a pluggable item
    writer — the posture of the reference's Cosmos sink config
    (``Metric Stream to Cosmos/Step 06.a Raw & Latest - Stream metric
    data to Cosmos DB.scala:12-15``: ``spark.cosmos.write.maxRetryCount
    -> 50`` with ``write.strategy -> ItemOverwrite``), which survives
    per-item throttling/faults inside a batch instead of failing the
    whole micro-batch on the first bad item.

    Contract:

    - each item lands through ``write_item(key, row_dict)``; a raising
      item does NOT abort the rest of the batch (error isolation);
    - failed items are retried up to ``max_attempts`` within the batch
      (transient-fault convergence, the maxRetryCount analog);
    - if any item still fails after the attempts, ``apply_batch``
      raises WITHOUT marking the batch applied — Structured Streaming
      then replays the same ``batch_id``, and because the strategy is
      ItemOverwrite, re-landing the already-successful items is
      harmless; the store converges with no data loss once the fault
      clears.  Items that exhaust retries are also recorded in
      ``dead_letters`` for observability (count + last error per key).

    Driver-side ``collect()`` limits this class to test scale by
    design (same note as :class:`InMemoryKVServingStore`); a production
    client runs the identical loop inside ``foreachPartition``.
    """

    def __init__(
        self,
        key: str = "id",
        max_attempts: int = 3,
        write_item=None,
    ) -> None:
        self.key = key
        self.max_attempts = max_attempts
        self.data: dict = {}
        self.applied_batches: set[int] = set()
        self.write_attempts = 0
        self.dead_letters: dict = {}
        self._write_item = write_item or (
            lambda k, v: self.data.__setitem__(k, v)
        )

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self.applied_batches:
            return  # replay after recovery — already landed
        pending = [r.asDict() for r in batch_df.collect()]
        last_err: dict = {}
        for _attempt in range(self.max_attempts):
            failed = []
            for d in pending:
                try:
                    self.write_attempts += 1
                    self._write_item(d[self.key], d)
                except Exception as exc:  # noqa: BLE001 — isolate per item
                    failed.append(d)
                    last_err[d[self.key]] = exc
            pending = failed
            if not pending:
                break
        if pending:
            for d in pending:
                self.dead_letters[d[self.key]] = last_err[d[self.key]]
            raise RuntimeError(
                f"batch {batch_id}: {len(pending)} item(s) failed after "
                f"{self.max_attempts} attempts "
                f"(keys: {sorted(d[self.key] for d in pending)[:5]}); "
                "batch not marked applied — replay will converge once "
                "the fault clears"
            )
        self.applied_batches.add(batch_id)


class ParquetUpsertStore(ServingStoreWriter):
    """Keyed upsert store over versioned partitioned parquet
    (foreachBatch target).

    ``apply_batch`` is what you hand to ``foreachBatch``; it implements
    ItemOverwrite: rows from the newer batch replace same-key rows.
    ``partition_col`` is the pruning axis (e.g. ``datestamp``); with it
    set, a batch REWRITES only the partitions it touches and carries
    every untouched partition file across by hardlink (O(touched
    data + #files metadata), never O(store)).  Without it the store
    degrades to a documented full rewrite (only acceptable for tiny
    key-value stores).

    CONTRACT required by the pruned path: the partition value must be
    functionally determined by the key (every caller here embeds the
    datestamp in ``id``).  The same constraint governs any
    partition-pruned MERGE (Delta included): if a key could MIGRATE
    partitions between batches, its stale row would sit in an
    untouched partition the prune never reads, and the store would
    serve two rows for the key.  Keys that can move partitions must
    use ``partition_col=None`` (full winner rewrite) or a partition
    scheme keyed off the key itself.

    Durability (r8): every apply lands in a fresh ``v{n}`` directory
    and becomes visible only via an atomic ``CURRENT`` pointer swap
    (tmp + ``os.replace``) — the pre-r8 layout overwrote the store
    directory in place, so a query stop or crash mid-apply could leave
    the store EMPTY with no replay able to restore the lost rows (the
    checkpoint only re-delivers unapplied batches).  With the swap, an
    aborted apply leaves an orphan ``v{n}`` that the next apply's
    sweep removes, and readers always see the last committed state.
    The previous version is kept until the next successful apply so
    in-flight lazy readers of the prior snapshot stay valid.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str = "id",
        partition_col: str | None = None,
    ) -> None:
        self.spark = spark
        self.path = path
        self.key = key
        self.partition_col = partition_col

    # ------------------------------------------------------ versioning

    def current_data_dir(self) -> str | None:
        """The committed version directory (None for an empty store)."""
        ptr = os.path.join(self.path, "CURRENT")
        if not os.path.exists(ptr):
            return None
        with open(ptr) as fh:
            return os.path.join(self.path, fh.read().strip())

    def _publish(self, version: int) -> None:
        import shutil

        tmp = os.path.join(self.path, "CURRENT.tmp")
        with open(tmp, "w") as fh:
            fh.write(f"v{version}")
        os.replace(tmp, os.path.join(self.path, "CURRENT"))
        # sweep everything older than the PREVIOUS version (kept for
        # in-flight readers) plus any aborted-apply orphans newer than
        # the committed one
        for d in os.listdir(self.path):
            if d.startswith("v") and d[1:].isdigit() and int(d[1:]) not in (
                version,
                version - 1,
            ):
                shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)

    def _next_version(self) -> int:
        cur = self.current_data_dir()
        return 0 if cur is None else int(os.path.basename(cur)[1:]) + 1

    # ------------------------------------------------------------ read

    def read(self) -> DataFrame | None:
        cur = self.current_data_dir()
        if cur is None:
            return None
        df = self.spark.read.parquet(cur)
        if self.partition_col:
            # partition-column values come back type-inferred (e.g.
            # DATE for 'yyyy-MM-dd'); restore the stored string form so
            # unions against incoming batches stay schema-stable
            df = df.withColumn(
                self.partition_col, F.col(self.partition_col).cast("string")
            )
        return df

    def _winners(self, merged: DataFrame) -> DataFrame:
        w = Window.partitionBy(self.key).orderBy(F.col("_v").desc())
        return (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_v")
        )

    # ----------------------------------------------------------- write

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        incoming = batch_df.withColumn("_v", F.lit(1))
        cur = self.current_data_dir()
        version = self._next_version()
        new_dir = os.path.join(self.path, f"v{version}")
        if cur is None:
            writer = incoming.drop("_v").write.mode("overwrite")
            if self.partition_col:
                writer = writer.partitionBy(self.partition_col)
            writer.parquet(new_dir)
            self._publish(version)
            return
        current = self.read()
        if self.partition_col:
            # partitions this batch touches — bounded by batch size
            parts = {
                str(r[0])
                for r in batch_df.select(self.partition_col).distinct().collect()
            }
            merged = self._winners(
                current.filter(F.col(self.partition_col).isin(list(parts)))
                .withColumn("_v", F.lit(0))
                .unionByName(incoming)
            )
            merged.write.mode("overwrite").partitionBy(
                self.partition_col
            ).parquet(new_dir)
            # carry untouched partitions by hardlink: same inode, so
            # bytes/mtimes are literally the previous version's —
            # O(#files) metadata, no data copied or rewritten.
            # "Untouched" is decided by directory-name set difference
            # against what the merged write just produced — NOT by
            # comparing raw values to dir suffixes, because Spark
            # URL-escapes special characters (space, colon, %) in
            # partition dir names and a raw-value compare would
            # hardlink stale files into a just-rewritten partition.
            prefix = f"{self.partition_col}="
            written = set(os.listdir(new_dir))
            for entry in os.listdir(cur):
                if not entry.startswith(prefix) or entry in written:
                    continue
                src_dir = os.path.join(cur, entry)
                dst_dir = os.path.join(new_dir, entry)
                os.makedirs(dst_dir, exist_ok=True)
                for fname in os.listdir(src_dir):
                    if fname.startswith(".") or fname.startswith("_"):
                        continue
                    os.link(
                        os.path.join(src_dir, fname),
                        os.path.join(dst_dir, fname),
                    )
            self._publish(version)
            return
        # unpartitioned: documented full winner rewrite, atomic via the
        # same version swap
        merged = self._winners(
            current.withColumn("_v", F.lit(0)).unionByName(incoming)
        )
        merged.write.mode("overwrite").parquet(new_dir)
        self._publish(version)


def stream_upsert_rollup(
    spark: SparkSession,
    agg_stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    partition_col: str | None = "datestamp",
) -> None:
    """Stream a (complete-mode) aggregate into the upsert store via
    foreachBatch — the Step 05 pattern: update-mode agg + MERGE.
    Any :class:`ServingStoreWriter` slots into the same plumbing."""
    store = ParquetUpsertStore(spark, store_path, partition_col=partition_col)
    attach_serving_sink(agg_stream, store, checkpoint_dir)
