"""Local replica of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() twin on DuckDB
over the same sf dir, then compares row count, column names, pandas
DTYPES, and an order-insensitive value hash (columns sorted by name,
rows sorted).

Dtype fidelity (round-8 hardening): the driver fetches BOTH sides into
pandas and hashes dtype-sensitively — DuckDB ``sum()`` over integers
returns HUGEINT which ``fetch_df()`` lands as float64, while Spark
emits int64, so equal values still hash-mismatch (round-7
``availability_report`` / ``tokenize_fixed_vocab``).  This replica
therefore fetches the oracle via ``fetch_df()`` (NOT ``fetchall()``,
whose native-int conversion hides the coercion) and the Spark side via
``toPandas()``, and FAILS on any numeric-kind mismatch between the two
frames before values are even compared.  The rule this enforces: every
oracle aggregate over integers must carry ``CAST(... AS BIGINT)``.

Usage: python tools/crosscheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


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


def _kind(dtype) -> str:
    """Collapse a pandas dtype to the equivalence class the driver's
    hash is sensitive to: integer / float / bool / datetime / other."""
    k = getattr(dtype, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "object"


def compare_frames(pdf_s, pdf_o) -> list[str]:
    """Driver-faithful comparison of a Spark-side and oracle-side
    pandas frame: column names, row count, per-column dtype KIND, then
    order-insensitive values.  Returns a list of problems (empty =
    pass).  Factored out so the contract test can drive it directly
    with a synthetic HUGEINT-sum oracle."""
    problems: list[str] = []
    scols, ocols = list(pdf_s.columns), list(pdf_o.columns)
    if sorted(scols) != sorted(ocols):
        return [f"cols spark={sorted(scols)} oracle={sorted(ocols)}"]
    if len(pdf_s) != len(pdf_o):
        problems.append(f"rowcount spark={len(pdf_s)} oracle={len(pdf_o)}")
    for c in sorted(scols):
        ks, ko = _kind(pdf_s[c].dtype), _kind(pdf_o[c].dtype)
        if ks != ko:
            problems.append(
                f"dtype mismatch on {c!r}: spark={pdf_s[c].dtype}({ks}) "
                f"oracle={pdf_o[c].dtype}({ko}) — the driver hashes "
                "dtype-sensitively; CAST the oracle column explicitly"
            )
    if problems:
        return problems
    order = sorted(scols)
    a = _normalize_pdf(pdf_s, order)
    b = _normalize_pdf(pdf_o, order)
    if a != b:
        diff = next((i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y)
        problems.append(
            f"values differ at sorted row {diff[0]}:\n  S={diff[1]}\n  D={diff[2]}"
        )
    return problems


def _normalize_pdf(pdf, order: list[str]) -> list[str]:
    import math

    out = []
    for row in pdf[order].itertuples(index=False, name=None):
        vals = []
        for v in row:
            if hasattr(v, "item"):  # numpy scalar -> native python
                v = v.item()
            if isinstance(v, float):
                v = None if math.isnan(v) else round(v, 9)
            vals.append(repr(v))
        out.append("\x01".join(vals))
    out.sort()
    return out


def main() -> None:
    import duckdb

    import __spark_entry__ as E
    from telemetry_streaming_datalake_spark.session import (
        TABLE_NAMES,
        get_spark,
    )

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
            bad = complex_cols(sdf.schema)
            if bad:
                print(
                    f"FAIL {name}: driver-incompatible schema — "
                    f"array/map/struct columns {bad} (stringify them)"
                )
                failures += 1
                continue
            pdf_s = sdf.toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(pdf_s)} rows)")
            continue
        try:
            pdf_o = con.execute(oracles[name]).fetch_df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures += 1
            continue
        if any(
            isinstance(v, (list, dict, set))
            for v in pdf_o.head(100).to_numpy().ravel()
        ):
            print(
                f"FAIL {name}: driver-incompatible oracle output — "
                "list/dict cells (stringify them in the SQL)"
            )
            failures += 1
            continue
        problems = compare_frames(pdf_s, pdf_o)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"PASS {name} ({len(pdf_s)} rows)")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
