"""Gap-based sessionization of the telemetry event stream.

The reference pipeline buckets by fixed calendar windows (Hour / Day /
Month — ``Gold Aggregation/Step 05 ….scala:91-92``); a training-data /
behavioural pipeline additionally needs *dynamic* sessions: consecutive
events of one terminal merged while the gap between them stays under a
threshold.  Spark has a first-class operator for exactly this —
``session_window`` — which runs as a single hash shuffle on the user
key followed by an in-partition merge of overlapping [ts, ts+gap)
intervals.  No window-function global sort, no Python: the same plan
shape at 60k rows and at 100 TB, and in Structured Streaming the same
expression becomes the stateful session operator (with watermark-based
state eviction), which is why we use it rather than a lag()/cumsum
gaps-and-islands formulation — that formulation is how the *oracle*
verifies us instead.

Timestamps are floored to unix seconds before windowing so the result
is engine-stable (test parquet carries TIMESTAMP(NANOS); sub-second
jitter must not decide session boundaries differently across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: two events of one terminal belong to the same session while the gap
#: between them is strictly under this many seconds
SESSION_GAP_S = 1800


def sessionize(events: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """Per-user sessions: (user_id, session_start, session_end,
    n_events, duration_s), one row per maximal run of events with
    inter-event gaps < ``gap_s``.

    ``session_window`` semantics (measured, and covered by
    ``tests/test_sessions.py``): an event landing exactly ``gap_s``
    after its predecessor still MERGES — the session-end boundary is
    inclusive; only a gap strictly greater than ``gap_s`` splits.  The
    oracle replicates this with lag()+cumsum over unix seconds.
    """
    e = events.select("user_id", F.unix_timestamp("ts").alias("unix_ts"))
    sw = F.session_window(F.timestamp_seconds("unix_ts"), f"{gap_s} seconds")
    return (
        e.groupBy(sw.alias("w"), "user_id")
        .agg(
            F.min("unix_ts").alias("session_start"),
            F.max("unix_ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            "session_start",
            "session_end",
            (F.col("session_end") - F.col("session_start")).alias("duration_s"),
            "n_events",
        )
    )


def sessionize_oracle(gap_s: int = SESSION_GAP_S) -> str:
    """Gaps-and-islands twin: a new session starts when the gap to the
    previous event is strictly greater than gap_s (session_window's
    merge boundary is inclusive)."""
    return f"""
WITH e AS (
    SELECT user_id, (epoch_us(ts) // 1000000) AS unix_ts FROM events
),
flagged AS (
    SELECT user_id, unix_ts,
           CASE WHEN unix_ts - lag(unix_ts) OVER (
                    PARTITION BY user_id ORDER BY unix_ts
                ) > {gap_s} THEN 1 ELSE 0 END AS new_session
    FROM e
),
numbered AS (
    SELECT user_id, unix_ts,
           sum(new_session) OVER (
               PARTITION BY user_id ORDER BY unix_ts
               ROWS UNBOUNDED PRECEDING
           ) AS session_no
    FROM flagged
)
SELECT user_id,
       min(unix_ts)               AS session_start,
       max(unix_ts)               AS session_end,
       max(unix_ts) - min(unix_ts) AS duration_s,
       count(*)                   AS n_events
FROM numbered
GROUP BY user_id, session_no
"""
