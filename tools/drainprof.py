"""Decompose a streaming drain key's wall time (VERDICT r14 #3).

Runs ONE streaming key end-to-end and itemizes where the wall goes:

- per-query, per-batch ``StreamingQueryProgress.durationMs`` —
  ``triggerExecution`` split into ``addBatch`` (plan + run the batch),
  ``getBatch``/``latestOffset`` (source listing), ``walCommit`` /
  ``commitOffsets`` (offset/commit log fsyncs), ``queryPlanning``;
- per-batch ``stateOperators`` commit times and row counts (state
  store cost);
- the residue (key wall − sum of trigger executions) = session-side
  setup, batch-plan construction in foreachBatch callbacks, batch
  (non-streaming) jobs the key runs around the drain, and query
  start/stop lifecycle.

Usage: python tools/drainprof.py <key> [--sf DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("key")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()

    import bench as B  # noqa: E402  (repo root on path)
    from pyspark.sql.streaming import StreamingQueryListener

    from telemetry_streaming_datalake_spark.session import get_spark

    spark = get_spark("drainprof")

    events: list[dict] = []

    class Prof(StreamingQueryListener):
        def onQueryStarted(self, e):  # noqa: N802
            events.append({"ev": "start", "t": time.time(), "id": str(e.id)})

        def onQueryProgress(self, e):  # noqa: N802
            p = json.loads(e.progress.json)
            events.append(
                {
                    "ev": "progress",
                    "t": time.time(),
                    "id": p.get("id"),
                    "batchId": p.get("batchId"),
                    "durationMs": p.get("durationMs", {}),
                    "stateOperators": [
                        {
                            k: so.get(k)
                            for k in (
                                "operatorName",
                                "commitTimeMs",
                                "numRowsTotal",
                                "numRowsUpdated",
                                "numShufflePartitions",
                                "numStateStoreInstances",
                            )
                        }
                        for so in p.get("stateOperators", [])
                    ],
                    "sink_desc": (p.get("sink") or {}).get("description", "")[:60],
                }
            )

        def onQueryIdle(self, e):  # noqa: N802
            pass

        def onQueryTerminated(self, e):  # noqa: N802
            events.append({"ev": "stop", "t": time.time(), "id": str(e.id)})

    spark.streams.addListener(Prof())

    import __spark_entry__ as E  # noqa: E402

    fns = dict(E.queries())
    fns.update(B._retired_bench())
    fn = fns[args.key]
    for run in range(args.runs):
        events.clear()
        spark.catalog.clearCache()
        t0 = time.time()
        df = fn(spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        # listener events arrive asynchronously; give the bus a moment
        time.sleep(1.0)

        print(f"\n=== {args.key} run {run}: wall {wall:.2f}s ===")
        by_q: dict[str, list[dict]] = {}
        for ev in events:
            by_q.setdefault(ev["id"], []).append(ev)
        total_trigger = 0.0
        for qid, evs in by_q.items():
            progs = [e for e in evs if e["ev"] == "progress"]
            start = next((e["t"] for e in evs if e["ev"] == "start"), None)
            stop = next((e["t"] for e in evs if e["ev"] == "stop"), None)
            q_wall = (stop - start) if start and stop else None
            sums: dict[str, float] = {}
            state_commit = 0.0
            state_parts = set()
            for p in progs:
                for k, v in p["durationMs"].items():
                    sums[k] = sums.get(k, 0.0) + (v or 0) / 1000.0
                for so in p["stateOperators"]:
                    state_commit += (so.get("commitTimeMs") or 0) / 1000.0
                    state_parts.add(
                        (
                            so.get("operatorName"),
                            so.get("numShufflePartitions"),
                            so.get("numStateStoreInstances"),
                        )
                    )
            total_trigger += sums.get("triggerExecution", 0.0)
            qw = f"{q_wall:.2f}" if q_wall is not None else "?"
            print(
                f"  query {qid[:8]} ({progs[0]['sink_desc'] if progs else ''}): "
                f"{len(progs)} batches, query-wall {qw}s"
            )
            for k in sorted(sums, key=lambda k: -sums[k]):
                print(f"    {k:>18}: {sums[k]:7.2f}s")
            if state_commit:
                print(f"    {'stateCommit(sum)':>18}: {state_commit:7.2f}s  {state_parts}")
        print(
            f"  SUM triggerExecution over all queries: {total_trigger:.2f}s; "
            f"residue (wall - triggers) = {wall - total_trigger:.2f}s"
        )


if __name__ == "__main__":
    main()
