"""Local replica of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() twin on DuckDB
over the same sf dir, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted).

Usage: python tools/crosscheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as E
from telemetry_streaming_datalake_spark.session import TABLE_NAMES, get_spark


def complex_cols(schema) -> list[str]:
    """Column names with array/map/struct types — the driver's pandas
    canonicalizer (`sort_values` over ALL columns) dies on unhashable
    list/dict cells, so any such output schema is locally-green /
    driver-red waiting to happen (round-6 `ts_similarity`).  Reject."""
    from pyspark.sql import types as T

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def unhashable_cells(rows) -> bool:
    """DuckDB-side twin of the schema check: list/dict cells in the
    fetched oracle rows would also crash the driver's canonicalizer."""
    for r in rows[:100]:
        for v in r:
            if isinstance(v, (list, dict, set)):
                return True
    return False


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(repr(v))
        out.append("\x01".join(vals))
    out.sort()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("crosscheck")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            bad = complex_cols(sdf.schema)
            if bad:
                print(
                    f"FAIL {name}: driver-incompatible schema — "
                    f"array/map/struct columns {bad} (stringify them)"
                )
                failures += 1
                continue
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures += 1
            continue
        if unhashable_cells(orows):
            print(
                f"FAIL {name}: driver-incompatible oracle output — "
                "list/dict cells (stringify them in the SQL)"
            )
            failures += 1
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            a = normalize(srows, scols)
            b = normalize(orows, ocols)
            if a != b:
                diff = next(
                    (i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y
                )
                problems.append(f"values differ at sorted row {diff[0]}:\n  S={diff[1]}\n  D={diff[2]}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
