"""Time-series subsequence similarity search over the telemetry lake.

Given a query pattern of length L, find the top-k most similar
L-length windows across every (serial, metric) reading series under
z-normalized Euclidean distance — the shape-matching primitive of
distributed time-series search systems (cf. "Time Series Similarity
Search for Streaming Data in Distributed Systems", EDBT 2019; the
z-normalized distance is the UCR-suite standard).

Spark-first shape:
- candidate windows come from ONE series-keyed window aggregation
  (``collect_list`` over a forward ROWS frame — the same single hash
  shuffle + in-partition sort every per-series operator here takes);
- the distance is explicit per-index arithmetic over ``element_at``
  (L terms generated at plan-build time) — whole-stage codegen, no
  higher-order-function interpretation and no Python in the row path;
  the z-normalized query constants fold into the expression;
- top-k is ``orderBy(...).limit(k)`` — Spark executes TakeOrdered
  (a per-partition heap + driver merge of k rows), never a global
  sort of the scored frame.

Determinism: distances round to 6dp before ranking and ties break on
(serial, metric, start_ts), so the top-k set is identical in both
engines.  Windows shorter than L (series tails) are excluded.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from telemetry_streaming_datalake_spark.operators.derived import floor_round

#: default query pattern: one rise-and-fall pulse (shape is what
#: matters — z-normalization removes scale and offset)
TS_QUERY_PATTERN = [0.0, 1.0, 3.0, 6.0, 6.0, 3.0, 1.0, 0.0]
TS_TOP_K = 25


def _znorm(pattern: list[float]) -> list[float]:
    n = len(pattern)
    m = sum(pattern) / n
    var = sum((x - m) ** 2 for x in pattern) / n
    s = max(math.sqrt(var), 1e-12)
    return [(x - m) / s for x in pattern]


def ts_similarity(
    bronze_deduped: DataFrame,
    pattern: list[float] | None = None,
    k: int = TS_TOP_K,
) -> DataFrame:
    """Top-``k`` z-normalized matches of ``pattern`` across all
    (serial, metric) series.  Output: (serial, metric, start_ts,
    window_values, zdist) ranked best-first."""
    from pyspark.sql import Window

    q = _znorm(pattern if pattern is not None else TS_QUERY_PATTERN)
    L = len(q)
    w = (
        Window.partitionBy("serial", "metric")
        .orderBy("unix_ts", "event_id")
        .rowsBetween(Window.currentRow, L - 1)
    )
    sub = (
        bronze_deduped.select(
            "serial", "metric", "unix_ts", "event_id", "value"
        )
        # NULL readings must leave the series BEFORE windowing on both
        # engines: Spark's collect_list silently DROPS NULLs while
        # DuckDB's list() keeps them, so an unfiltered NULL would
        # misalign every window that spans it
        .filter(F.col("value").isNotNull())
        .withColumn("win", F.collect_list("value").over(w))
        .filter(F.size("win") == L)
    )
    elems = [F.element_at("win", i + 1) for i in range(L)]
    mean = sum(elems[1:], elems[0]) / L
    var = sum(((e - mean) * (e - mean) for e in elems[1:]), (elems[0] - mean) * (elems[0] - mean)) / L
    std = F.greatest(F.sqrt(var), F.lit(1e-12))
    terms = None
    for i in range(L):
        z = (elems[i] - mean) / std
        t = (z - q[i]) * (z - q[i])
        terms = t if terms is None else terms + t
    # window_values ships as a comma-joined fixed-point STRING, not an
    # array<double>: the driver's canonicalizer pandas-sorts every output
    # column and dies on unhashable list cells (round-6 red row).  6dp
    # decimal(18,6) renders identically in Spark and DuckDB ("1.500000"),
    # so the value hash stays engine-portable.
    scored = sub.select(
        "serial",
        "metric",
        F.col("unix_ts").alias("start_ts"),
        F.concat_ws(
            ",",
            F.transform(
                F.col("win"),
                lambda v: floor_round(v, 6).cast("decimal(18,6)").cast("string"),
            ),
        ).alias("window_values"),
        floor_round(F.sqrt(terms), 6).alias("zdist"),
    )
    return scored.orderBy("zdist", "serial", "metric", "start_ts").limit(k)


def ts_similarity_oracle(
    bronze_dedup_sql: str,
    pattern: list[float] | None = None,
    k: int = TS_TOP_K,
) -> str:
    q = _znorm(pattern if pattern is not None else TS_QUERY_PATTERN)
    L = len(q)
    mean = " + ".join(f"win[{i + 1}]" for i in range(L))
    var = " + ".join(f"(win[{i + 1}] - m) * (win[{i + 1}] - m)" for i in range(L))
    dist = " + ".join(
        f"((win[{i + 1}] - m) / s - ({q[i]!r})) * ((win[{i + 1}] - m) / s - ({q[i]!r}))"
        for i in range(L)
    )
    return f"""
WITH deduped AS ({bronze_dedup_sql}),
sub AS (
    SELECT serial, metric, unix_ts,
           list(value) OVER (
               PARTITION BY serial, metric ORDER BY unix_ts, event_id
               ROWS BETWEEN CURRENT ROW AND {L - 1} FOLLOWING
           ) AS win
    FROM deduped WHERE value IS NOT NULL
),
full_wins AS (SELECT * FROM sub WHERE len(win) = {L}),
stats AS (
    SELECT serial, metric, unix_ts, win,
           ({mean}) / {L} AS m
    FROM full_wins
),
scored AS (
    SELECT serial, metric, unix_ts AS start_ts,
           array_to_string(
               list_transform(win, v -> CAST(CAST(floor(v * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS VARCHAR)),
               ','
           ) AS window_values,
           floor(sqrt({dist}) * 1000000.0 + 0.5) / 1000000.0 AS zdist
    FROM (
        SELECT *, greatest(sqrt(({var}) / {L}), 1e-12) AS s FROM stats
    )
)
SELECT serial, metric, start_ts, window_values, zdist
FROM scored
ORDER BY zdist, serial, metric, start_ts
LIMIT {k}
"""
