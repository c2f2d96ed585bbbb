"""Slowly-changing-dimension maintenance.

Reference semantics: ``Set Up Delta Tables/Set up Delta tables for
Slowly changing Data.scala`` maintains interval dimensions
(remotedevicehistory etc.) via MERGE: a changed key closes the open row
(sets RemovedOn) and inserts a fresh open row; the "current" view is
``WHERE RemovedOn IS NULL``.

Batch-functional formulation (Delta-free): :func:`scd2_apply` merges a
batch of updates into a history frame; :func:`scd2_current` derives the
current snapshot.  Both are window/union compositions — a MERGE under
AQE does the same shuffle work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from telemetry_streaming_datalake_spark.datamodel import REMOTE_HISTORY_CTE


def scd2_current(history: DataFrame) -> DataFrame:
    """Current (open) row per serial.

    The open row is the one with NULL ``removed_on``; picking it via
    row_number over (added_on desc) also handles dimensions whose final
    row was closed (no current row → excluded by the filter).
    """
    w = Window.partitionBy("serial").orderBy(F.col("added_on").desc())
    return (
        history.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & F.col("removed_on").isNull())
        .drop("rn")
    )


def scd2_apply(history: DataFrame, updates: DataFrame, effective_ts_col: str = "effective_ts") -> DataFrame:
    """Close open rows for updated serials and append the new rows.

    ``updates`` columns: serial, remote_id, <effective_ts_col>.
    Equivalent to the reference's two-phase MERGE (update + insert).
    """
    upd = updates.select(
        F.col("serial"),
        F.col("remote_id").alias("new_remote_id"),
        F.col(effective_ts_col).alias("new_added_on"),
    )
    closed = (
        history.join(F.broadcast(upd), "serial", "left")
        .withColumn(
            "removed_on",
            F.when(
                F.col("removed_on").isNull() & F.col("new_added_on").isNotNull(),
                F.col("new_added_on"),
            ).otherwise(F.col("removed_on")),
        )
        .select(*history.columns)
    )
    inserted = upd.select(
        "serial",
        F.col("new_remote_id").alias("remote_id"),
        F.col("new_added_on").alias("added_on"),
        F.lit(None).cast("long").alias("removed_on"),
        F.lit(False).alias("is_private"),
    )
    return closed.unionByName(inserted)


def scd2_current_oracle() -> str:
    return (
        "WITH "
        + REMOTE_HISTORY_CTE.strip()
        + """
SELECT serial, remote_id, added_on, removed_on, is_private
FROM (
    SELECT h.*, row_number() OVER (PARTITION BY serial ORDER BY added_on DESC) AS rn
    FROM remote_history h
)
WHERE rn = 1 AND removed_on IS NULL
"""
    )
