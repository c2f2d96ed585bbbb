"""End-to-end corpus curation manifest: the whole keep-decision in ONE plan.

A training-data pipeline's terminal artifact is not any single
operator's output — it is the per-document MANIFEST that records, for
every doc, whether it survives the full curation pass and why not:
quality gate (Gopher rules) → exact dedup (content-hash keeper) →
near-dup clustering (fingerprint-blocked Jaccard pairs → connected
components → canonical survivor) → deterministic train/val split.

This module composes the existing operators into that one declarative
plan — no materialization between stages, Catalyst sees the whole DAG
(the quality gate is a map-only projection fused into the scan; the
exact-keeper is one content-hash shuffle; the near-dup leg reuses the
single-scan pair pipeline; the split is pure hash arithmetic) — which
is exactly how a 100 TB curation pass should run: one job, one pass
over the corpus per independent shuffle key, a manifest at the end.

Drop precedence mirrors pipeline order: a doc failing the gate is
`gate` even if it is also a duplicate; `exact_dup` before `near_dup`;
survivors carry NULL reason and their split assignment.

Stage ordering is LOAD-BEARING for content survival (r9 review): the
exact keeper is the lowest doc_id among GATE SURVIVORS of a hash, and
near-dup clustering runs over gate∧exact survivors only — were keepers
picked over the ungated corpus, duplicated content whose lowest-id
copy fails the gate would vanish from the training set even when a
clean copy exists (keeper dropped as `gate`, clean copy dropped as
`exact_dup`).  This is the gate-then-dedup order real curation
pipelines run, at the price of one doc-keyed semi-join to restrict
the near-dup leg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from telemetry_streaming_datalake_spark.operators.corpus import (
    VAL_THRESHOLD_HEX,
)
from telemetry_streaming_datalake_spark.operators.dedup import (
    ngram_jaccard_dedup,
    ngram_jaccard_oracle,
    normalize_text,
)
from telemetry_streaming_datalake_spark.operators.merge import (
    canonical_docs,
    canonical_docs_oracle,
    dup_clusters,
)
from telemetry_streaming_datalake_spark.operators.text import (
    gopher_filter,
    gopher_filter_oracle,
)


def curation_manifest(documents: DataFrame) -> DataFrame:
    """Per-document curation manifest: gate/dedup/canonical/split in
    one composed plan.  Columns: doc_id, gate_keep, is_exact_keeper,
    is_canonical, split, final_keep, drop_reason."""
    # gate + content hash in ONE scan/projection (both map-only over
    # the same text column); the exact-keeper window rides that frame
    ch = F.md5(normalize_text(F.col("text")))
    gate = gopher_filter(
        documents, extra_cols=[ch.alias("content_hash")]
    ).select("doc_id", F.col("keep").alias("gate_keep"), "content_hash")
    # exact keeper = lowest doc_id among the hash's GATE SURVIVORS
    # (conditional window min); a hash with no surviving member has no
    # keeper — every copy already drops as `gate`
    min_keep = F.min(
        F.when(F.col("gate_keep"), F.col("doc_id"))
    ).over(Window.partitionBy("content_hash"))
    # eager localCheckpoint: the gate+window subtree feeds BOTH the
    # survivor semi-join (under the near-dup leg) and the final
    # manifest — without the checkpoint the text-heavy gate features
    # would compute twice (one extra corpus scan); checkpointed, the
    # corpus text is scanned once and this narrow (id, bool, bool,
    # hex4) frame serves both consumers (ContextCleaner reclaims it)
    gate_exact = gate.select(
        "doc_id",
        "gate_keep",
        F.coalesce(F.col("doc_id") == min_keep, F.lit(False)).alias(
            "is_exact_keeper"
        ),
        F.substring("content_hash", 1, 4).alias("__h4"),
    ).localCheckpoint(eager=True)
    # near-dup clustering over gate∧exact survivors only (the
    # gate-then-dedup order; see module docstring)
    surv_ids = gate_exact.filter(
        F.col("gate_keep") & F.col("is_exact_keeper")
    ).select("doc_id")
    docs_surv = documents.join(surv_ids, "doc_id", "left_semi")
    canon = canonical_docs(
        docs_surv, dup_clusters(ngram_jaccard_dedup(docs_surv))
    ).select("doc_id", "is_canonical")
    manifest = (
        gate_exact
        .join(canon, "doc_id", "left")
        .select(
            "doc_id",
            "gate_keep",
            "is_exact_keeper",
            F.coalesce("is_canonical", F.lit(False)).alias("is_canonical"),
            F.when(F.col("__h4") < VAL_THRESHOLD_HEX, "val")
            .otherwise("train")
            .alias("split"),
            (
                F.col("gate_keep")
                & F.col("is_exact_keeper")
                & F.coalesce("is_canonical", F.lit(False))
            ).alias("final_keep"),
            F.when(~F.col("gate_keep"), "gate")
            .when(~F.col("is_exact_keeper"), "exact_dup")
            .when(~F.coalesce("is_canonical", F.lit(False)), "near_dup")
            .alias("drop_reason"),
        )
    )
    return manifest


def curation_manifest_oracle() -> str:
    """DuckDB twin composed from the stage oracles — the same joins,
    the same precedence, the same survivor-restricted keeper/canonical
    (the stage oracles take a ``src`` so the near-dup leg reads the
    ``surv_docs`` CTE, exactly like the engine's semi-join)."""
    return f"""
WITH gate AS (
    SELECT doc_id, keep AS gate_keep FROM ({gopher_filter_oracle()})
),
ge AS (
    SELECT d.doc_id, g.gate_keep,
           coalesce(
               d.doc_id = min(CASE WHEN g.gate_keep THEN d.doc_id END) OVER (
                   PARTITION BY md5(lower(trim(regexp_replace(d.text, '\\s+', ' ', 'g'))))
               ), false) AS is_exact_keeper,
           substr(md5(lower(trim(regexp_replace(d.text, '\\s+', ' ', 'g')))), 1, 4) AS h4
    FROM documents d JOIN gate g USING (doc_id)
),
surv_docs AS (
    SELECT d.* FROM documents d
    JOIN ge ON d.doc_id = ge.doc_id AND ge.gate_keep AND ge.is_exact_keeper
),
canon AS (
    SELECT doc_id, is_canonical
    FROM ({canonical_docs_oracle(ngram_jaccard_oracle(src="surv_docs"), src="surv_docs")})
)
SELECT ge.doc_id, ge.gate_keep, ge.is_exact_keeper,
       coalesce(c.is_canonical, false) AS is_canonical,
       CASE WHEN ge.h4 < '{VAL_THRESHOLD_HEX}' THEN 'val' ELSE 'train' END AS split,
       ge.gate_keep AND ge.is_exact_keeper AND coalesce(c.is_canonical, false)
           AS final_keep,
       CASE WHEN NOT ge.gate_keep THEN 'gate'
            WHEN NOT ge.is_exact_keeper THEN 'exact_dup'
            WHEN NOT coalesce(c.is_canonical, false) THEN 'near_dup'
            END AS drop_reason
FROM ge
LEFT JOIN canon c USING (doc_id)
"""
