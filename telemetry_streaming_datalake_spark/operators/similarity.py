"""Similarity search over embedding columns.

Two tiers, mirroring how a 100 TB pipeline actually runs ANN:

- :func:`cosine_topk` — brute-force exact top-k of a *small broadcast
  query set* against the full corpus.  The corpus side streams through
  map tasks (one broadcast join, no shuffle of the big side); per-pair
  cosine is a ``zip_with``/``aggregate`` JVM expression.
- :func:`ann_lsh_topk` — random-hyperplane LSH: each vector gets a
  signature from the signs of dot products with H fixed hyperplanes;
  candidates are corpus vectors sharing a signature band with the
  query; exact cosine is computed only within buckets.  The shuffle is
  keyed by (band, band-signature) — never all-pairs.

Hyperplanes are deterministic (hash-derived, seed fixed) so results
are reproducible and oracle-checkable.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a, b):
    """Cosine similarity between two array<numeric> columns (double)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    round_to: int = 4,
) -> DataFrame:
    """Exact top-k neighbours for each query vector.

    Cosine is rounded before ranking so ordering (and therefore the
    result set) is engine-stable; ties break on vec_id.
    """
    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    pairs = embeddings.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("q_emb"), F.col("embedding")), round_to).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def cosine_topk_oracle(query_ids: list[int], k: int = 5, round_to: int = 4) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
    WHERE vec_id IN ({ids})
),
scored AS (
    SELECT q.query_id, e.vec_id,
           round(
             list_dot_product(CAST(q.q_emb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
             / (sqrt(list_dot_product(CAST(q.q_emb AS DOUBLE[]), CAST(q.q_emb AS DOUBLE[])))
              * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))),
             {round_to}) AS cosine
    FROM embeddings e, q
    WHERE e.vec_id <> q.query_id
)
SELECT query_id, vec_id, cosine, rank FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, vec_id
    ) AS rank
    FROM scored
) WHERE rank <= {k}
"""


# --------------------------------------------------------------------------
# LSH-bucketed ANN
# --------------------------------------------------------------------------

#: hyperplane count (signature bits) and banding
LSH_PLANES = 16
LSH_SIG_BANDS = 4


def _hyperplanes(dim: int, planes: int = LSH_PLANES, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (public trick:
    fixed-seed Gaussian)."""
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((planes, dim))
    return [[float(x) for x in row] for row in m]


def lsh_signature(embedding_col, planes: list[list[float]]):
    """Sign-bit signature array (one 0/1 per hyperplane), computed as
    JVM dot products against literal hyperplane arrays."""
    sig_bits = []
    for p in planes:
        plane = F.array(*[F.lit(v) for v in p])
        sig_bits.append(F.when(_dot(embedding_col, plane) >= 0, 1).otherwise(0))
    return F.array(*sig_bits)


def ann_lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    dim: int = 64,
    round_to: int = 4,
) -> DataFrame:
    """Approximate top-k via banded hyperplane signatures.

    A corpus vector is a candidate if it matches the query on *any*
    signature band (multi-probe style recall).  Exact cosine + ranking
    happen only on candidates.
    """
    planes = _hyperplanes(dim)
    per_band = LSH_PLANES // LSH_SIG_BANDS
    sig = embeddings.select(
        "vec_id", "embedding", lsh_signature(F.col("embedding"), planes).alias("sig")
    )
    bands = sig.select(
        "vec_id",
        "embedding",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(b), *[F.col("sig")[b * per_band + r] for r in range(per_band)]
                    )
                    for b in range(LSH_SIG_BANDS)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )
    q = bands.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "band_idx",
        "band_hash",
    )
    cands = (
        bands.join(F.broadcast(q), ["band_idx", "band_hash"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "q_emb", "vec_id", "embedding")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cands.select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("q_emb"), F.col("embedding")), round_to).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
