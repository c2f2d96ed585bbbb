"""Two-process test runner — the `pytest -n 2` VERDICT r9 #6 asked
for, without the xdist plugin (not installable in this environment).

Splits the test FILES into N buckets balanced by file size (a stable
proxy for wall time: the heavy files are heavy because they hold many
Spark-action tests) and runs one pytest process per bucket
concurrently, each with its own SparkSession at local[32/N] threads.
Every test still runs exactly once — no skips, no markers; this only
overlaps the per-action scheduling floor two sessions at a time.

Usage: python tools/partest.py [n_procs]      (default 2)
Exit code: 0 iff every bucket's pytest exited 0.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import time


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(
        glob.glob(os.path.join(root, "tests", "test_*.py")),
        key=lambda p: -os.path.getsize(p),
    )
    buckets: list[list[str]] = [[] for _ in range(n)]
    weights = [0] * n
    for f in files:  # greedy longest-processing-time assignment
        i = weights.index(min(weights))
        buckets[i].append(f)
        weights[i] += os.path.getsize(f)

    cpus = str(max(4, 32 // n))
    env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
    t0 = time.time()
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "pytest", "-q", *b],
            env=env,
            cwd=root,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for b in buckets
    ]
    rc = 0
    for i, p in enumerate(procs):
        out, _ = p.communicate()
        tail = out.decode(errors="replace").strip().splitlines()
        print(f"--- bucket {i} (rc={p.returncode}, {len(buckets[i])} files) ---")
        print("\n".join(tail[-15:]))
        rc |= p.returncode
    print(f"partest wall: {time.time() - t0:.1f}s  rc={rc}")
    sys.exit(rc)


if __name__ == "__main__":
    main()
