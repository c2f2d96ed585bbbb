"""Time + explain individual queries() keys (optimization-round harness).

Usage: python tools/qtime.py [--explain-dir DIR] [--runs N] key [key ...]

Per key: builds the DataFrame, optionally writes .explain("formatted")
to DIR/<key>.txt, then times N noop-sink executions (bench.py
methodology: clearCache between runs, report best).  Reads
$SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS like bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from telemetry_streaming_datalake_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    explain_dir = None
    runs = 2
    while args and args[0].startswith("--"):
        if args[0] == "--explain-dir":
            explain_dir = args[1]
            args = args[2:]
        elif args[0] == "--runs":
            runs = int(args[1])
            args = args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("qtime")
    import bench

    bench._warmup(spark, sf_dir)
    qs = E.queries()
    out: dict[str, float] = {}
    for name in args:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"qtime:{name}")
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        best = float("inf")
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"total": round(sum(out.values()), 3), "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
