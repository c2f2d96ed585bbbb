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


def curation_manifest(
    documents: DataFrame, shingle_base: DataFrame | None = None
) -> DataFrame:
    """Per-document curation manifest: gate/dedup/canonical/split in
    one composed plan.  Columns: doc_id, gate_keep, is_exact_keeper,
    is_canonical, split, final_keep, drop_reason.

    ``shingle_base``: optional checkpointed full-corpus
    `_fingerprint_and_shingle_sets(documents)` frame from a composing
    caller (`dup_keep_audit` builds pairs over BOTH the full corpus
    and the gate-survivor subset) — the near-dup leg then restricts it
    by the survivor semi-join instead of re-running the text
    explode+hash pass.  Pair-identical: per-doc fingerprints/shingles
    are corpus-independent and the hot-bucket cap applies after the
    restriction (see `ngram_jaccard_dedup`)."""
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
    surv_base = (
        shingle_base.join(surv_ids, "doc_id", "left_semi")
        if shingle_base is not None
        else None
    )
    canon = canonical_docs(
        docs_surv, dup_clusters(ngram_jaccard_dedup(docs_surv, base=surv_base))
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


def dup_keep_audit(documents: DataFrame) -> DataFrame:
    """Per-CLUSTER keep-rate audit — the cluster-level form of
    `fuzzy_blocking_report`'s no-silent-caps discipline: for every
    near-dup cluster of the FULL corpus (so members the gate dropped
    stay visible), where did the cluster's mass go?

    Joins the three artifacts the audit question spans: corpus-level
    `dup_clusters` labels (which docs are the same content),
    `canonical_docs`' content-canonical choice (who the best
    representative IS — longest normalized doc), and the
    `curation_manifest` drop reasons (what the pipeline actually did
    to each member).  The load-bearing columns: `fully_dropped`
    flags clusters whose content vanished from the training set
    entirely, and `canonical_survived` flags clusters whose BEST copy
    was lost (e.g. gate-dropped) while a lesser copy carried the
    content — both invisible in per-document views.

    Scale shape: the cluster labels are near-dup-subset-sized and the
    manifest is the one-pass composed plan; the audit itself is one
    cluster-keyed aggregate over the (small) clustered subset —
    nothing new is corpus-sized.  Note the manifest's own `near_dup`
    reasons come from its survivor-restricted clustering (the
    gate-then-dedup order); THIS audit clusters the full corpus on
    purpose, so the two legs answer different questions and their
    composition here is the point.
    """
    from telemetry_streaming_datalake_spark.operators.derived import floor_round
    from telemetry_streaming_datalake_spark.operators.dedup import (
        _fingerprint_and_shingle_sets,
    )

    # ONE text explode+hash pass serves BOTH pair pipelines (the
    # full-corpus cluster leg here and the manifest's survivor-
    # restricted leg): per-doc fingerprints/shingles are corpus-
    # independent, so restricting this checkpointed frame is
    # pair-identical to recomputing per leg — r14 opt, was the
    # audit's second-largest cost after the manifest itself
    base = _fingerprint_and_shingle_sets(documents).localCheckpoint(
        eager=True
    )
    pairs = ngram_jaccard_dedup(documents, base=base)
    clusters = dup_clusters(pairs)
    # the canonical window only matters for CLUSTER MEMBERS and a
    # cluster's choice never depends on non-members — restrict the
    # window input to the near-dup-subset-sized member frame instead
    # of sorting the whole corpus into it
    members = documents.join(clusters.select("doc_id"), "doc_id", "left_semi")
    canon = canonical_docs(members, clusters).select("doc_id", "canonical_id")
    manifest = curation_manifest(documents, shingle_base=base).select(
        "doc_id", "final_keep", "drop_reason"
    )
    joined = clusters.join(manifest, "doc_id").join(canon, "doc_id")
    n_kept = F.sum(F.col("final_keep").cast("int"))
    reason = lambda r: F.sum((F.col("drop_reason") == r).cast("int")).cast("int")
    return joined.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("int").alias("cluster_size"),
        F.min("canonical_id").alias("content_canonical_id"),
        n_kept.cast("int").alias("n_kept"),
        floor_round(n_kept / F.count(F.lit(1)), 6).alias("keep_rate"),
        reason("gate").alias("n_gate_dropped"),
        reason("exact_dup").alias("n_exact_dup_dropped"),
        reason("near_dup").alias("n_near_dup_dropped"),
        (n_kept == 0).alias("fully_dropped"),
        (
            F.coalesce(
                F.max(
                    F.when(
                        F.col("doc_id") == F.col("canonical_id"),
                        F.col("final_keep").cast("int"),
                    )
                ),
                F.lit(0),
            )
            == 1
        ).alias("canonical_survived"),
    )


def dup_keep_audit_oracle() -> str:
    """Composed twin: the same three stage oracles (full-corpus
    cluster labels, content-canonical window, manifest reasons) and
    the same cluster-keyed aggregate."""
    from telemetry_streaming_datalake_spark.operators.merge import (
        dup_clusters_oracle,
    )

    floor6 = lambda e: f"floor(({e}) * 1000000.0 + 0.5) / 1000000.0"
    return f"""
WITH clusters AS ({dup_clusters_oracle(ngram_jaccard_oracle())}),
labeled AS (
    SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id, d.n_chars
    FROM documents d LEFT JOIN clusters c USING (doc_id)
),
canon AS (
    SELECT doc_id, cluster_id,
           min(CASE WHEN rk = 1 THEN doc_id END) OVER (PARTITION BY cluster_id)
               AS canonical_id
    FROM (
        SELECT doc_id, cluster_id,
               row_number() OVER (
                   PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id
               ) AS rk
        FROM labeled
    )
),
manifest AS ({curation_manifest_oracle()})
SELECT cl.cluster_id,
       CAST(count(*) AS INTEGER) AS cluster_size,
       min(cn.canonical_id) AS content_canonical_id,
       CAST(sum(CAST(m.final_keep AS INT)) AS INTEGER) AS n_kept,
       {floor6("sum(CAST(m.final_keep AS INT)) * 1.0 / count(*)")} AS keep_rate,
       CAST(sum(CASE WHEN m.drop_reason = 'gate' THEN 1 ELSE 0 END) AS INTEGER)
           AS n_gate_dropped,
       CAST(sum(CASE WHEN m.drop_reason = 'exact_dup' THEN 1 ELSE 0 END) AS INTEGER)
           AS n_exact_dup_dropped,
       CAST(sum(CASE WHEN m.drop_reason = 'near_dup' THEN 1 ELSE 0 END) AS INTEGER)
           AS n_near_dup_dropped,
       sum(CAST(m.final_keep AS INT)) = 0 AS fully_dropped,
       coalesce(max(CASE WHEN cl.doc_id = cn.canonical_id
                         THEN CAST(m.final_keep AS INT) END), 0) = 1
           AS canonical_survived
FROM clusters cl
JOIN manifest m USING (doc_id)
JOIN canon cn USING (doc_id)
GROUP BY cl.cluster_id
"""


# --------------------------------------------------------------------------
# per-domain curation dashboard: dup-rate x quality x token-share
# --------------------------------------------------------------------------


def domain_quality_report(documents: DataFrame, cap: int | None = None) -> DataFrame:
    """Per-DOMAIN knob-pricing dashboard joining the three curation
    axes that are otherwise read separately (`domain_cap_sample`'s cap,
    `source_reputation`'s dup rate, `gate_rule_report`'s quality gate):
    for each source — doc volume, token volume and corpus token share,
    exact-dup rate, Gopher-gate pass rate, and what the default domain
    frequency cap would cut here (`cap_excess_docs` / `cap_loss_rate`).
    One row per domain answers "which knob removes how much of WHOSE
    data" before any knob is turned.

    Scale shape: ONE corpus scan — the gate is a map-only projection
    (:func:`..text.gopher_filter` with the content hash appended into
    the same stage), one source-keyed aggregate with map-side partials
    (the exact DISTINCT swaps for ``approx_count_distinct`` at 100 TB,
    the `source_reputation` note), then the domain-cardinality result
    crossJoins a broadcast 1-row total for the share column — the
    fact table never shuffles twice.
    """
    from telemetry_streaming_datalake_spark.operators.corpus import DOMAIN_CAP
    from telemetry_streaming_datalake_spark.operators.derived import floor_round

    cap = DOMAIN_CAP if cap is None else cap
    g = gopher_filter(
        documents,
        extra_cols=[F.md5(normalize_text(F.col("text"))).alias("content_hash")],
    )
    per = (
        g.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("n_tokens"),
            floor_round(
                1.0 - F.count_distinct("content_hash") / F.count(F.lit(1)), 6
            ).alias("dup_rate"),
            floor_round(
                F.sum(F.col("keep").cast("int")) / F.count(F.lit(1)), 6
            ).alias("gate_pass_rate"),
        )
        # domain-cardinality frame feeds BOTH the output rows and the
        # token total — checkpoint it so the corpus lineage executes
        # once, not once per consumer (the gate_rule_report pattern)
        .localCheckpoint(eager=True)
    )
    total = per.agg(F.sum("n_tokens").alias("__total_tokens"))
    excess = F.greatest(F.col("n_docs") - F.lit(cap), F.lit(0).cast("long"))
    return per.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "n_tokens",
        floor_round(F.col("n_tokens") / F.col("__total_tokens"), 6).alias(
            "token_share"
        ),
        "dup_rate",
        "gate_pass_rate",
        excess.alias("cap_excess_docs"),
        floor_round(excess / F.col("n_docs"), 6).alias("cap_loss_rate"),
    )


def domain_quality_report_oracle(cap: int | None = None) -> str:
    from telemetry_streaming_datalake_spark.operators.corpus import DOMAIN_CAP

    cap = DOMAIN_CAP if cap is None else cap
    floor6 = lambda e: f"floor(({e}) * 1000000.0 + 0.5) / 1000000.0"
    norm = r"lower(trim(regexp_replace(text, '\s+', ' ', 'g')))"
    return f"""
WITH g AS ({gopher_filter_oracle()}),
h AS (SELECT doc_id, md5({norm}) AS content_hash FROM documents),
per AS (
    SELECT g.source,
           count(*) AS n_docs,
           CAST(sum(g.n_words) AS BIGINT) AS n_tokens,
           {floor6("1.0 - count(DISTINCT h.content_hash) * 1.0 / count(*)")}
               AS dup_rate,
           {floor6("sum(CAST(g.keep AS INT)) * 1.0 / count(*)")}
               AS gate_pass_rate
    FROM g JOIN h USING (doc_id)
    GROUP BY g.source
)
SELECT source, n_docs, n_tokens,
       {floor6(f"n_tokens * 1.0 / (SELECT sum(n_tokens) FROM per)")}
           AS token_share,
       dup_rate, gate_pass_rate,
       CAST(greatest(n_docs - {cap}, 0) AS BIGINT) AS cap_excess_docs,
       {floor6(f"greatest(n_docs - {cap}, 0) * 1.0 / n_docs")} AS cap_loss_rate
FROM per
"""


# --------------------------------------------------------------------------
# leakage-safe train/val split (near-dup closure)
# --------------------------------------------------------------------------


def leakage_safe_split(documents: DataFrame, threshold_hex: str | None = None) -> DataFrame:
    """Train/val split CLOSED under near-duplication — the eval-
    leakage fix every corpus paper re-learns: the content-hash split
    (`corpus.train_val_split`) keeps byte-identical copies together,
    but a NEAR-duplicate pair can still straddle the boundary and leak
    val content into train verbatim-minus-an-edit.  Here every
    fingerprint-blocked Jaccard near-dup cluster (the `dup_clusters`
    components) rides ONE side, decided by the md5 of the cluster
    representative's normalized content (min doc_id — deterministic,
    rerun-stable, same threshold convention as the naive split).

    Output per doc: the split group (`group_id` — cluster id, or the
    doc itself for singletons), the leakage-safe `split`, the
    `naive_split` the content-hash rule alone would give, and
    `rescued` — the docs this operator actually moved, i.e. the
    leakage the naive split WOULD have had (engine-computed, oracle-
    recomputed: the count of TRUE rescues is the operator's value
    measured on every run).

    Scale shape: the pair pipeline and min-label propagation are the
    `dup_clusters` cost (bucket-blocked, never all-pairs); cluster
    labels and rep hashes are pair-participant-cardinality frames
    that broadcast onto the corpus only BELOW the size gate
    (`skew.broadcast_if_small`) — at crawl-scale dup fractions 30-50%
    of docs are pair participants, O(corpus) frames that must
    shuffle-join instead (VERDICT r11); the split itself is map-only
    hash arithmetic.
    """
    from telemetry_streaming_datalake_spark.operators.corpus import (
        VAL_THRESHOLD_HEX,
        train_val_split,
    )
    from telemetry_streaming_datalake_spark.operators.skew import (
        broadcast_if_small,
    )

    thr = VAL_THRESHOLD_HEX if threshold_hex is None else threshold_hex
    naive = train_val_split(documents, thr).select(
        "doc_id", "content_hash", F.col("split").alias("naive_split")
    )
    # pair-participant cardinality — size-gated broadcast onto the
    # corpus-sized naive frame (reps keep only clustered docs)
    clusters = broadcast_if_small(dup_clusters(ngram_jaccard_dedup(documents)))
    reps = clusters.join(
        naive.select(
            F.col("doc_id").alias("cluster_id"),
            F.col("content_hash").alias("rep_hash"),
        ),
        "cluster_id",
    )
    out = naive.join(broadcast_if_small(reps), "doc_id", "left")
    decide = F.coalesce(F.col("rep_hash"), F.col("content_hash"))
    split = F.when(F.substring(decide, 1, 4) < thr, "val").otherwise("train")
    return out.select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("group_id"),
        split.alias("split"),
        "naive_split",
        (split != F.col("naive_split")).alias("rescued"),
    )


def leakage_safe_split_oracle(threshold_hex: str | None = None) -> str:
    from telemetry_streaming_datalake_spark.operators.corpus import (
        VAL_THRESHOLD_HEX,
        train_val_split_oracle,
    )
    from telemetry_streaming_datalake_spark.operators.merge import (
        dup_clusters_oracle,
    )

    thr = VAL_THRESHOLD_HEX if threshold_hex is None else threshold_hex
    clusters = dup_clusters_oracle(ngram_jaccard_oracle()).strip()
    naive = train_val_split_oracle(thr).strip()
    return f"""
WITH clusters AS ({clusters}),
naive AS (SELECT doc_id, content_hash, split AS naive_split FROM ({naive})),
reps AS (
    SELECT c.doc_id, c.cluster_id, n.content_hash AS rep_hash
    FROM clusters c JOIN naive n ON n.doc_id = c.cluster_id
)
SELECT n.doc_id,
       COALESCE(r.cluster_id, n.doc_id) AS group_id,
       CASE WHEN substr(COALESCE(r.rep_hash, n.content_hash), 1, 4) < '{thr}'
            THEN 'val' ELSE 'train' END AS split,
       n.naive_split,
       (CASE WHEN substr(COALESCE(r.rep_hash, n.content_hash), 1, 4) < '{thr}'
             THEN 'val' ELSE 'train' END) <> n.naive_split AS rescued
FROM naive n LEFT JOIN reps r USING (doc_id)
"""
