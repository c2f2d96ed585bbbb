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
    gate_exact = gate.select(
        "doc_id",
        "gate_keep",
        (
            F.col("doc_id")
            == F.min("doc_id").over(Window.partitionBy("content_hash"))
        ).alias("is_exact_keeper"),
        F.substring("content_hash", 1, 4).alias("__h4"),
    )
    canon = canonical_docs(
        documents, dup_clusters(ngram_jaccard_dedup(documents))
    ).select("doc_id", "is_canonical")
    manifest = (
        gate_exact
        .join(canon, "doc_id")
        .select(
            "doc_id",
            "gate_keep",
            "is_exact_keeper",
            "is_canonical",
            F.when(F.col("__h4") < VAL_THRESHOLD_HEX, "val")
            .otherwise("train")
            .alias("split"),
            (
                F.col("gate_keep")
                & F.col("is_exact_keeper")
                & F.col("is_canonical")
            ).alias("final_keep"),
            F.when(~F.col("gate_keep"), "gate")
            .when(~F.col("is_exact_keeper"), "exact_dup")
            .when(~F.col("is_canonical"), "near_dup")
            .alias("drop_reason"),
        )
    )
    return manifest


def curation_manifest_oracle() -> str:
    """DuckDB twin composed from the stage oracles — the same joins,
    the same precedence."""
    return f"""
WITH gate AS (
    SELECT doc_id, keep AS gate_keep FROM ({gopher_filter_oracle()})
),
exact AS (
    SELECT doc_id,
           doc_id = min(doc_id) OVER (
               PARTITION BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
           ) AS is_exact_keeper,
           substr(md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))), 1, 4) AS h4
    FROM documents
),
canon AS (
    SELECT doc_id, is_canonical FROM ({canonical_docs_oracle(ngram_jaccard_oracle())})
)
SELECT g.doc_id, g.gate_keep, e.is_exact_keeper, c.is_canonical,
       CASE WHEN e.h4 < '{VAL_THRESHOLD_HEX}' THEN 'val' ELSE 'train' END AS split,
       g.gate_keep AND e.is_exact_keeper AND c.is_canonical AS final_keep,
       CASE WHEN NOT g.gate_keep THEN 'gate'
            WHEN NOT e.is_exact_keeper THEN 'exact_dup'
            WHEN NOT c.is_canonical THEN 'near_dup'
            END AS drop_reason
FROM gate g
JOIN exact e USING (doc_id)
JOIN canon c USING (doc_id)
"""
