"""Single-node baseline: DuckDB executing the oracle SQL at an sf dir.

The reference pipeline runs on a hosted Spark/Delta runtime that cannot
run in this environment, so the published baseline (BASELINE.md) is the
strongest single-node engine available here — DuckDB — executing the
semantically-identical oracle queries over the same parquet.  bench.py's
Spark numbers are compared against these.

Usage: python tools/baseline.py [sf_dir]   # prints one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as E
from telemetry_streaming_datalake_spark.session import TABLE_NAMES


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracles = E.oracle_sql()
    from bench import HEADLINE

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in oracles:
            continue  # non-SQL-expressible (minhash etc.) — no proxy
        t0 = time.perf_counter()
        con.execute(oracles[name]).fetchall()
        timings[name] = round(time.perf_counter() - t0, 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "oracle-SQL wall time (DuckDB single-node proxy)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
