"""Time-series subsequence similarity: planted-pattern recovery."""

import datetime

from telemetry_streaming_datalake_spark.ingest import bronze as B
from telemetry_streaming_datalake_spark.operators import tseries as TS

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def _series(vals, metric="m", start_id=0):
    return [
        (start_id + i, datetime.datetime(2024, 1, 1, 0, i, 0), 1, metric, float(v), "{}")
        for i, v in enumerate(vals)
    ]


def test_planted_pattern_is_rank_one(spark):
    """A scaled+shifted copy of the query pulse must rank first with
    zdist 0 (z-normalization removes scale and offset); a flat series
    must rank behind noise that merely resembles the pulse."""
    pulse = TS.TS_QUERY_PATTERN
    planted = [100 + 7 * v for v in pulse]  # affine copy → zdist 0
    noise = [5, 2, 8, 1, 9, 3, 7, 4, 6, 2]
    rows = _series(planted, "planted") + _series(noise, "noise", 100)
    ded = B.dedup_exact(B.parse_bronze(spark.createDataFrame(rows, SCHEMA)))
    out = TS.ts_similarity(ded, k=3).collect()
    assert out[0].metric == "planted"
    assert out[0].zdist == 0.0
    # window_values is a driver-safe comma-joined fixed-point string
    vals = out[0].window_values.split(",")
    assert len(vals) == len(pulse)
    assert vals[0] == "100.000000"


def test_series_tails_excluded(spark):
    """Series shorter than the pattern produce no candidate windows."""
    rows = _series([1.0, 2.0, 3.0], "short")
    ded = B.dedup_exact(B.parse_bronze(spark.createDataFrame(rows, SCHEMA)))
    assert TS.ts_similarity(ded, k=5).count() == 0
