"""Write .explain("formatted") for every queries() key (optimization
audit harness, guide §1.1): builds each DataFrame and dumps its plan
WITHOUT executing it — except keys whose build itself drains a stream
or runs jobs (streaming twins, store-backed keys), which are skipped
by default because their returned plan is just the post-drain read.

Usage: python tools/plansweep.py OUTDIR [--include-streaming] [key ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from telemetry_streaming_datalake_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    outdir = args.pop(0)
    include_streaming = "--include-streaming" in args
    args = [a for a in args if not a.startswith("--")]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plansweep")
    qs = E.queries()
    keys = args or list(qs)
    t_all = time.perf_counter()
    for name in keys:
        if name.startswith("streaming_") and not include_streaming:
            continue
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
                f.write(plan)
            print(f"{name}: {time.perf_counter() - t0:.2f}s", flush=True)
        except Exception as e:  # noqa: BLE001 — audit sweep, keep going
            print(f"{name}: ERR {e}", flush=True)
    print(f"total {time.perf_counter() - t_all:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
