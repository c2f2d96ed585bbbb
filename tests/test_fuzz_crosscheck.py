"""Adversarial randomized engine-vs-oracle crosscheck.

The driver gate runs every registry key against its DuckDB oracle on
the FROZEN testdata — which can't witness divergence classes the
fixtures happen not to contain (NULL text/embeddings, empty and
whitespace-only docs, cap-binding duplicate floods, sub-second and
exact-hour timestamp boundaries, midpoint-prone dyadic values,
duplicate readings).  This suite regenerates those hostile shapes
deterministically (seeded numpy) and runs a cross-section of the real
``queries()`` / ``oracle_sql()`` entries over them with the same
comparison the driver uses — so "latent with the current parquet"
divergences (the round-9 review class: interval-join precision,
fingerprint-0 NULL pairs, uncapped oracles) fail HERE instead of on
the first regenerated feed.

Two corpora:
- ``fuzz_main``: every hostile shape, duplicate flood kept UNDER
  ``BUCKET_CAP`` so the one deliberately cap-slack oracle
  (``dedup_minhash`` — xxhash64 band keys have no DuckDB twin) stays
  comparable;
- ``fuzz_hot``: a 300-doc identical flood that BINDS the cap, run only
  against the oracles that model it (the `_banded_pairs_tail_sql`
  convention) — proving the cap contract exact, not just argued.
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

from tools.crosscheck import compare_frames, complex_cols

SEED = 20260815
_DIM = 64

#: frozen driver fixtures the hostile dirs borrow their star tables
#: from — env-resolvable so the suite isn't coupled to this machine's
#: layout (ADVICE r9); fixtures skip cleanly when the dir is absent
_SMOKE_DIR = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")


def _require_smoke_dir() -> str:
    if not os.path.isdir(_SMOKE_DIR):
        pytest.skip(f"frozen smoke fixtures missing: {_SMOKE_DIR}")
    return _SMOKE_DIR
#: documents flood sizes: main stays under BUCKET_CAP=256, hot binds it
_FLOOD_MAIN = 120
_FLOOD_HOT = 300

_WORDS = (
    "the of and to in is was for on are with they be at one have this from "
    "or had by word but what some we can out other were all there when up "
    "use your how said an each she der die und ist das nicht le la et les "
    "el de que en un".split()
)


def _doc_rows(rng: np.random.Generator, flood: int) -> pd.DataFrame:
    rows = []

    def add(text, lang="en", source=None):
        rows.append(
            {
                "doc_id": len(rows),
                "text": text,
                "lang": lang,
                "source": source or f"src{len(rows) % 20}",
                "n_chars": len(text) if text is not None else 0,
            }
        )

    # normal docs across languages (stopword markers present)
    for i in range(80):
        n = int(rng.integers(5, 120))
        text = " ".join(rng.choice(_WORDS, n))
        add(text, lang=["en", "de", "fr", "es", "zh"][i % 5])
    # near-duplicates: same base with small edits
    base = " ".join(rng.choice(_WORDS, 60))
    add(base)
    add(base + " extra")
    add(base.replace("the", "a", 1))
    # identical flood — one shared fingerprint / simhash / band bucket
    flood_text = "the quick brown fox jumps over the lazy dog again"
    for _ in range(flood):
        add(flood_text)
    # repeated-line doc (repetition_stats) and newline noise
    add("menu\nmenu\nmenu\ncontact\nmenu", lang="en")
    add("\n\n\n", lang="en")
    # degenerate shapes
    add("", lang="en")
    add("   ", lang="en")
    add(None, lang="en")
    # TWO NULL-text docs: the r11 review class — NULL fingerprints must
    # not pair in the engine (groupBy groups NULL keys) while every
    # oracle's equi-join drops them
    add(None, lang="de")
    add("x", lang="en")
    add("the " * 3000, lang="en")  # long doc, window grams
    add("césar naïve коро 中文 🙂 tab\tchars", lang="zh")
    return pd.DataFrame(rows)


def _emb_rows(rng: np.random.Generator) -> pd.DataFrame:
    n = 160
    m = rng.standard_normal((n, _DIM)).astype(np.float32)
    # near-duplicate pairs (LSH/semantic dedup should pair them)
    m[40] = m[41] + rng.standard_normal(_DIM).astype(np.float32) * 1e-4
    m[42] = m[43]
    # tiny-norm vector (normalization floor path, not exactly zero)
    m[50] = np.float32(1e-7)
    rows = []
    for i in range(n):
        emb = None if i in (150, 151, 152) else [float(x) for x in m[i]]
        rows.append({"vec_id": i, "embedding": emb, "label": int(i % 10)})
    return pd.DataFrame(rows)


def _event_rows(rng: np.random.Generator) -> pd.DataFrame:
    n = 3000
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    for i in range(n):
        # spread over ~40 days; mix exact-second / exact-hour / sub-second
        day = int(rng.integers(0, 40))
        sec = int(rng.integers(0, 86400))
        us = int(rng.integers(0, 1_000_000))
        if i % 7 == 0:
            us = 0  # exact-second boundary
        if i % 31 == 0:
            sec, us = (sec // 3600) * 3600, 0  # exact-hour boundary
        ts = base + pd.Timedelta(days=day, seconds=sec, microseconds=us)
        # dyadic-rational values reach exact 6dp rounding midpoints
        val = float(int(rng.integers(-2_000_000, 2_000_000))) / 1024.0
        rows.append(
            {
                "event_id": i,
                "ts": ts,
                "user_id": int(rng.integers(0, 20)),
                "event_type": ["click", "view", "purchase", "signup", "error"][
                    int(rng.integers(0, 5))
                ],
                "value": val,
                "props": None if i % 97 == 0 else json.dumps({"k": int(i % 100)}),
            }
        )
    # duplicate readings: same (user, type, second) — exact-dedup fodder
    for i in range(60):
        src = dict(rows[i])
        src["event_id"] = n + i
        rows.append(src)
    # sub-second click→error pair (the interval-join boundary class)
    rows.append(
        {
            "event_id": n + 100,
            "ts": base + pd.Timedelta(hours=1, microseconds=700_000),
            "user_id": 3,
            "event_type": "click",
            "value": 1.0,
            "props": json.dumps({"k": 1}),
        }
    )
    rows.append(
        {
            "event_id": n + 101,
            "ts": base + pd.Timedelta(hours=1, microseconds=300_000),
            "user_id": 3,
            "event_type": "error",
            "value": 2.0,
            "props": json.dumps({"k": 2}),
        }
    )
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    return df


def _write_dir(tmp, name: str, flood: int) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(SEED)
    d = str(tmp / name)
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(_doc_rows(rng, flood)), os.path.join(d, "documents.parquet")
    )
    emb = _emb_rows(rng)
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(emb, schema=schema), os.path.join(d, "embeddings.parquet")
    )
    pq.write_table(
        pa.Table.from_pandas(_event_rows(rng)), os.path.join(d, "events.parquet")
    )
    # the TPC-H star tables aren't fuzzed — link the frozen fixtures so
    # any key that joins a dimension still resolves
    if not os.path.isdir(_SMOKE_DIR):
        raise RuntimeError(f"frozen smoke fixtures missing: {_SMOKE_DIR}")
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        os.symlink(
            os.path.join(_SMOKE_DIR, f"{t}.parquet"), os.path.join(d, f"{t}.parquet")
        )
    return d


@pytest.fixture(scope="module")
def fuzz_main(tmp_path_factory):
    _require_smoke_dir()
    return _write_dir(tmp_path_factory.mktemp("fuzz"), "main", _FLOOD_MAIN)


@pytest.fixture(scope="module")
def fuzz_hot(tmp_path_factory):
    _require_smoke_dir()
    return _write_dir(tmp_path_factory.mktemp("fuzz"), "hot", _FLOOD_HOT)


def _extreme_ts_rows() -> pd.DataFrame:
    """Events at epoch extremes: negative epochs (pre-1970), the
    int32-epoch rollover (2038+), a far-future stamp, leap day, and
    epoch zero — the class where engines could disagree on datestamp
    formatting or sub-second flooring of negative seconds."""
    stamps = [
        pd.Timestamp("1969-12-31 23:59:59.5"),
        pd.Timestamp("1969-06-01 00:00:00"),
        pd.Timestamp("2038-01-19 03:14:08"),
        pd.Timestamp("2100-06-15 12:00:00.25"),
        pd.Timestamp("2024-02-29 10:00:00"),
        pd.Timestamp("1970-01-01 00:00:00"),
    ]
    rows = []
    # each SERIES (user) stays within one epoch era, jittered by a few
    # seconds (the 1969 era deliberately crosses into 1970): the
    # boundary class under test is per-VALUE formatting/flooring, and
    # a series spanning 1969..2100 only adds volume — gapfill's hourly
    # grid over a 131-year min..max was a 65 s test for zero extra
    # boundary coverage
    for i in range(len(stamps) * 20):
        era = i % len(stamps)
        rows.append(
            {
                "event_id": i,
                "ts": stamps[era] + pd.Timedelta(seconds=i // len(stamps)),
                "user_id": era,
                "event_type": ["click", "view", "purchase", "signup", "error"][i % 5],
                "value": float(i % 37) / 8.0,
                "props": json.dumps({"k": i % 10}),
            }
        )
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    return df


@pytest.fixture(scope="module")
def fuzz_extreme_ts(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    smoke = _require_smoke_dir()
    d = str(tmp_path_factory.mktemp("fuzz") / "ts")
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(_extreme_ts_rows()), os.path.join(d, "events.parquet")
    )
    for t in (
        "region nation customer supplier part orders lineitem documents embeddings"
    ).split():
        os.symlink(
            os.path.join(smoke, f"{t}.parquet"), os.path.join(d, f"{t}.parquet")
        )
    return d


def _run_key(spark, sf_dir: str, key: str) -> None:
    import duckdb

    import __spark_entry__ as E

    sdf = E.queries()[key](spark, sf_dir)
    assert not complex_cols(sdf.schema), f"{key}: complex output columns"
    pdf_s = sdf.toPandas()
    con = duckdb.connect()
    try:
        for t in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings".split()
        ):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        pdf_o = con.execute(E.oracle_sql()[key]).fetch_df()
    finally:
        con.close()
    problems = compare_frames(pdf_s, pdf_o)
    assert not problems, f"{key}: " + "; ".join(problems)


_MAIN_KEYS = [
    # documents — dedup family + text analysis over hostile text
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_simhash_weighted",
    "doc_fingerprint",
    "lang_id_model",
    "token_count",
    "text_quality",
    # gopher_filter's key retired r13 -> streaming_corpus_gate runs the
    # identical oracle in _STREAMING_KEYS below
    "quality_classifier",
    "quality_percentile_gate",
    "repetition_stats",
    "dup_spans",
    # decontaminate's key retired r14 -> decontamination_overlap
    # (whose oracle carries decontaminate_oracle verbatim as its
    # ngram-method CTE) runs in _MAIN_KEYS_EXT below
    # embeddings — NULL rows, near-dups, tiny norms
    "ann_cosine_topk",
    "ann_lsh",
    # ann_ivf / ann_ivf_incremental keys retired r13 -> ann_ivf_indexed
    # (identical oracle) carries the family in _MAIN_KEYS_EXT
    "ann_ivfpq",
    "quantize_embeddings",
    "semantic_dedup",
    "semantic_decontaminate",
    "dedup_embedding",
    "embedding_drift",
    # events — boundary timestamps, dyadic values, duplicate readings
    "rolling_avg",
    "anomaly_zscore",
    "anomaly_mad",
    "seasonal_baseline",
    "gap_detect",
    "percentile_rollup",
    "value_histogram",
    "trend_report",
]

#: round-9 continuation extension: the classes the first fuzz list
#: missed — each of these found (or now pins) a real divergence class:
#: NULL-media decode crashes, astral-plane surrogate splits, dyadic
#: 6dp-midpoint sums, NULL-embedding oracle asymmetries, phantom NULL
#: grams.  Everything here PASSed a full 120-key hostile sweep after
#: the round's fixes; keep the list broad so the next hostile class
#: fails HERE, not on a regenerated driver feed.
_MAIN_KEYS_EXT = [
    # medallion + rollup family (decimal-exact sums under dyadic values)
    "bronze_parse",
    "silver_explode",
    "bronze_feed_b",
    "bronze_feed_c",
    # latest_metric's key retired r13 -> the latest relation rides
    # always_on_topology; merge_upsert_latest + the stateful streaming
    # twin keep the latest-state arithmetic hostile-pinned here
    "gate_rule_report",
    "incremental_rollup",
    "agg_consistency",
    "rollup_restate",
    "custom_metric_sum",
    "custom_metric_join",
    "merge_upsert_latest",
    "scd2_current",
    "partition_stats",
    "table_profile",
    "stage_delay_report",
    # temporal / detect over boundary timestamps (sessionize's key
    # retired r11 -> the streaming twin runs the identical oracle)
    "streaming_sessionize",
    "availability_report",
    "dedup_threshold_curve",
    "funnel_conversion",
    "cohort_retention",
    "event_transitions",
    "cumulative_metric",
    "metric_correlation",
    "asof_latest_order",
    "order_window_activity",
    "gapfill_hourly",
    "pivot_metrics",
    "approx_percentile_audit",
    # text / corpus over hostile unicode + NULL text
    "boilerplate_ngrams",
    "lm_perplexity",
    "bm25_indexed",
    "decontamination_overlap",
    "tokenize_fixed_vocab",
    "bpe_merges",
    "pii_redact",
    "doc_chunks",
    "corpus_stats",
    "zipf_fit",
    "domain_cap_sample",
    "canonical_docs",
    "curation_manifest",
    "fuzzy_join",
    "char_entropy",
    "top_ngrams",
    "tfidf_top_terms",
    "ngram_lm",
    "badwords_filter",
    # multimodal over NULL-text (missing-media) rows
    "multimodal_meta",
    "multimodal_features",
    "frame_sample",
    "multimodal_thumb",
    "audio_features",
    "png_meta",
    # r11: real-zlib pixel decode + the three new corpus/text keys over
    # hostile unicode, NULL text, and the duplicate flood
    "png_pixels",
    "tokenize_roundtrip",
    "domain_quality_report",
    "dedup_index_incremental",
    "leakage_safe_split",
    "dedup_containment",
    "perplexity_buckets",
    # embeddings with NULL rows
    "label_centroids",
    "centroid_confusion",
    "hard_negatives",
    "ann_ivf_indexed",
    "kmeans_refine",
    # r12/r13 web front door + mix materializer over hostile text
    # (entity strings, NULL/empty docs, astral unicode, regexp
    # metachars).  html_extract / url_canonicalize keys retired r13 —
    # web_ingest_manifest composes both verbatim, so their hostile
    # coverage rides the capstone (plus robots + yield + WARC, all
    # registered r13)
    "train_mix_materialize",
    # paragraph_dedup's key retired r14 -> streaming_paragraph_dedup
    # drains the identical oracle over this hostile corpus; the batch
    # operator's window==agg equality runs in
    # test_fuzz_pytest_only_extras on the same corpus
    "streaming_paragraph_dedup",
    "warc_extract",
    "extraction_yield_report",
    "robots_gate",
    "web_ingest_manifest",
]

#: streaming twins over the hostile corpus — the full streaming sweep
#: runs once per round out-of-band (every key PASSed after the round's
#: fixes); this in-suite subset pins the two classes that actually
#:  diverged (the gate's NULL-keep partition, the OHLC mean floor
#: round) plus the stateful/store paths, at ~6 s/key
_STREAMING_KEYS = [
    "streaming_corpus_gate",
    "streaming_ohlc",
    # cusum/slo-burn/CMS boundary-value coverage moved here when the
    # batch keys retired (r10): identical oracles, drained-stream path
    "streaming_cusum",
    "streaming_slo_burn",
    "streaming_freq_sketch",
    "streaming_quarantine_split",
    "streaming_stateful_latest",
    "streaming_grouping_sets",
    "streaming_cdc_apply",
]

#: keys whose oracles MODEL the hot-bucket cap — run on the binding flood
_HOT_KEYS = [
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_simhash_weighted",
    "dup_spans",
]


@pytest.mark.parametrize("key", _MAIN_KEYS)
def test_fuzz_main(spark, fuzz_main, key):
    _run_key(spark, fuzz_main, key)


@pytest.mark.parametrize("key", _MAIN_KEYS_EXT)
def test_fuzz_main_ext(spark, fuzz_main, key):
    _run_key(spark, fuzz_main, key)


@pytest.mark.parametrize("key", _STREAMING_KEYS)
def test_fuzz_streaming(spark, fuzz_main, key):
    _run_key(spark, fuzz_main, key)


#: time-derivation representatives over the epoch-extreme corpus
_EXTREME_TS_KEYS = [
    "bronze_parse",
    "streaming_sessionize",
    "gapfill_hourly",
    "availability_report",
    "streaming_grouping_sets",
    "seasonal_baseline",
]


@pytest.mark.parametrize("key", _EXTREME_TS_KEYS)
def test_fuzz_extreme_timestamps(spark, fuzz_extreme_ts, key):
    _run_key(spark, fuzz_extreme_ts, key)


@pytest.mark.parametrize("key", _HOT_KEYS)
def test_fuzz_cap_binding(spark, fuzz_hot, key):
    _run_key(spark, fuzz_hot, key)


def test_fuzz_pytest_only_extras(spark, fuzz_main):
    """`host_politeness_report` and `wet_emit` are registry-key-free by
    design (VERDICT r12 #7 debt freeze), so the out-of-band fuzzcheck
    never sees them — THIS is their hostile-corpus certification, the
    same driver-faithful compare built direct (the retired-key
    plan-pin precedent).  The skew-safe agg dedup paths are equality-
    pinned against their window twins on the SAME hostile corpus."""
    import duckdb

    from telemetry_streaming_datalake_spark.operators import dedup as DD
    from telemetry_streaming_datalake_spark.operators import web as W
    from telemetry_streaming_datalake_spark.session import load_table

    docs = load_table(spark, fuzz_main, "documents")
    a = {tuple(r) for r in W.url_canonicalize(docs).collect()}
    b = {tuple(r) for r in W.url_canonicalize(docs, dedup_via_agg=True).collect()}
    assert a == b
    pa = {tuple(r) for r in DD.paragraph_dedup(docs).collect()}
    pb = {
        tuple(r) for r in DD.paragraph_dedup(docs, dedup_via_agg=True).collect()
    }
    assert pa == pb
    for name, frame, oracle in (
        (
            "host_politeness_report",
            W.host_politeness_report(docs),
            W.host_politeness_report_oracle(),
        ),
        ("wet_emit", W.wet_emit(docs), W.wet_emit_oracle()),
    ):
        pdf_s = frame.toPandas()
        con = duckdb.connect()
        try:
            con.execute(
                "CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{fuzz_main}/documents.parquet')"
            )
            pdf_o = con.execute(oracle).fetch_df()
        finally:
            con.close()
        problems = compare_frames(pdf_s, pdf_o)
        assert not problems, f"{name}: " + "; ".join(problems)
