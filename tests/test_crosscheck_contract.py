"""Dtype-fidelity contract for the driver's correctness hash.

Round-7 lesson (the third "locally green, driver red" variant): the
driver fetches the DuckDB oracle via ``fetch_df()``, where an integer
``sum()`` (HUGEINT) lands as float64 while Spark emits int64 — equal
values, different dtypes, hash mismatch.  Two guards:

1. ``tools/crosscheck.compare_frames`` must itself FAIL on that shape
   (a synthetic hugeint-sum frame pair), so the local replica can
   never again pass what the driver rejects.
2. No registered oracle may type any output column as HUGEINT — the
   only way DuckDB produces one is an un-CAST integer aggregate, and
   the Spark twin of an integer aggregate is always BIGINT.  Checked
   statically via ``DESCRIBE <oracle>`` (plans, doesn't execute).
"""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from telemetry_streaming_datalake_spark.session import TABLE_NAMES
from tools.crosscheck import compare_frames

SF = "/root/testdata/sf0.001"


def test_compare_frames_flags_hugeint_float_coercion():
    """int64 Spark column vs float64 oracle column with EQUAL values
    must fail — this is exactly what fetch_df does to a HUGEINT sum."""
    con = duckdb.connect()
    pdf_o = con.execute(
        "SELECT k, sum(v) AS total FROM (VALUES (1, 10), (1, 32), (2, 7)) "
        "t(k, v) GROUP BY k ORDER BY k"
    ).fetch_df()
    assert pdf_o["total"].dtype.kind == "f", "fixture lost its HUGEINT coercion"
    pdf_s = pd.DataFrame({"k": [1, 2], "total": [42, 7]}).astype("int64")
    problems = compare_frames(pdf_s, pdf_o)
    assert problems and "dtype mismatch" in problems[0], problems
    # and the CAST fix greens it
    pdf_o2 = con.execute(
        "SELECT k, CAST(sum(v) AS BIGINT) AS total FROM (VALUES (1, 10), "
        "(1, 32), (2, 7)) t(k, v) GROUP BY k ORDER BY k"
    ).fetch_df()
    assert compare_frames(pdf_s, pdf_o2) == []


def test_compare_frames_passes_matching_floats():
    a = pd.DataFrame({"x": [1.5, 2.5]})
    b = pd.DataFrame({"x": [2.5, 1.5]})  # order-insensitive
    assert compare_frames(a, b) == []


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLE_NAMES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def test_no_oracle_emits_hugeint_or_decimal_columns(con):
    """Static type audit of every registered oracle: HUGEINT means an
    un-CAST integer aggregate (driver-red against Spark's BIGINT);
    DECIMAL means an un-CAST exact-numeric expression (fetch_df lands
    it as float64 — only safe when the Spark twin is a double, so we
    ban it too and require an explicit CAST to DOUBLE)."""
    offenders = {}
    for name, sql in E.oracle_sql().items():
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
        bad = [
            (col, typ)
            for col, typ, *_ in desc
            if "HUGEINT" in typ.upper() or "DECIMAL" in typ.upper()
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"un-CAST exact-numeric oracle columns: {offenders}"
