"""Full-registry hostile-corpus sweep (the out-of-band big brother of
``tests/test_fuzz_crosscheck.py``).

The in-suite fuzz tests pin a ~100-key subset at pytest speed; THIS
tool runs EVERY registry key — batch and (optionally) streaming —
against the seeded hostile corpus and the driver-faithful compare, so
each round can re-certify the whole surface against the divergence
classes frozen parquet can't witness (NULL text/embeddings/media,
astral-plane unicode, dyadic 6dp midpoints, boundary timestamps,
duplicate floods).  Round-9 continuation provenance: this sweep
surfaced seven real divergence classes (BASELINE.md "second hardening
continuation"); both the original seed and a second seed now pass
clean (batch 152/152, streaming 19/19).

Usage:
    python tools/fuzzcheck.py [--seed N] [--streaming] [key ...]

Prints one RESULT line per key and a SUMMARY; exit 1 on any failure.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)


class _Tmp:
    """Minimal stand-in for pytest's tmp_path so the test module's
    corpus builder can be reused verbatim."""

    def __init__(self, d: str) -> None:
        self.d = d

    def __truediv__(self, other: str) -> "_Tmp":
        return _Tmp(os.path.join(self.d, other))

    def __str__(self) -> str:
        return self.d

    def __fspath__(self) -> str:
        return self.d


def main() -> None:
    import duckdb

    import test_fuzz_crosscheck as TF
    import __spark_entry__ as E
    from tools.crosscheck import compare_frames, complex_cols
    from telemetry_streaming_datalake_spark.session import TABLE_NAMES, get_spark

    args = sys.argv[1:]
    seed = TF.SEED
    if "--seed" in args:
        i = args.index("--seed")
        seed = int(args[i + 1])
        del args[i : i + 2]
    include_streaming = "--streaming" in args
    if include_streaming:
        args.remove("--streaming")
    only = set(args)

    TF.SEED = seed
    # cache dir keyed on the corpus BUILDER SOURCE, not just the seed
    # (ADVICE r9): any edit to the generators invalidates the cached
    # parquet instead of silently re-certifying against a stale corpus
    import hashlib
    import inspect

    builder_src = "".join(
        inspect.getsource(f)
        for f in (TF._doc_rows, TF._emb_rows, TF._event_rows, TF._write_dir)
    )
    tag = hashlib.md5(builder_src.encode()).hexdigest()[:10]
    base = f"/tmp/tsdl_fuzzcheck_{seed}_{tag}"
    os.makedirs(base, exist_ok=True)
    d = os.path.join(base, "main")
    if not os.path.exists(os.path.join(d, "documents.parquet")):
        TF._write_dir(_Tmp(base), "main", TF._FLOOD_MAIN)

    spark = get_spark("fuzzcheck")
    qs, orc = E.queries(), E.oracle_sql()
    n = {"PASS": 0, "MISMATCH": 0, "ERROR": 0}
    for key in qs:
        if only and key not in only:
            continue
        if key.startswith("streaming_") and not include_streaming and not only:
            continue
        t0 = time.time()
        try:
            sdf = qs[key](spark, d)
            bad = complex_cols(sdf.schema)
            if bad:
                raise RuntimeError(f"complex output columns {bad}")
            pdf_s = sdf.toPandas()
            con = duckdb.connect()
            try:
                for t in TABLE_NAMES:
                    con.execute(
                        f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{d}/{t}.parquet')"
                    )
                pdf_o = con.execute(orc[key]).fetch_df()
            finally:
                con.close()
            problems = compare_frames(pdf_s, pdf_o)
            status = "PASS" if not problems else "MISMATCH"
            detail = "" if not problems else "; ".join(problems)[:300]
        except Exception:  # noqa: BLE001
            status = "ERROR"
            detail = traceback.format_exc().splitlines()[-1][:300]
        n[status] += 1
        print(f"RESULT {status} {key} {time.time() - t0:.1f}s {detail}", flush=True)
    print("SUMMARY", n, flush=True)
    sys.exit(1 if n["MISMATCH"] or n["ERROR"] else 0)


if __name__ == "__main__":
    main()
