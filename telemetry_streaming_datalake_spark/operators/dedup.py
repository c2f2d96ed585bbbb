"""Document deduplication family: exact, MinHash+LSH, SimHash.

These are the LLM-training-data operators a 100 TB pipeline needs on
top of the reference's telemetry surface.  Design rules at scale:

- **Never all-pairs.**  Candidate generation is always a bucket join
  (same-band groupBy for MinHash, same-signature groupBy for SimHash),
  so the shuffle is keyed by band/signature and the cross product only
  happens *within* a bucket (collision sets, tiny by construction).
- **JVM-side hashing.**  Shingling and the k hash functions are
  ``transform``/``xxhash64`` column expressions — no Python in the
  per-row path, the whole signature computation is one codegen stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def normalize_text(col):
    """Whitespace-collapse + lowercase; the canonical form hashed for
    exact dedup (and the shingle source for near-dup)."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def dedup_exact_docs(documents: DataFrame) -> DataFrame:
    """Group identical normalized texts; keep the lowest doc_id.

    One hash-partitioned aggregation on the md5 key — the same shape
    at 500 rows and at 100 TB (md5 keys are uniform, skew-free).
    """
    h = documents.withColumn("content_hash", F.md5(normalize_text(F.col("text"))))
    return h.groupBy("content_hash").agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


DEDUP_EXACT_ORACLE = r"""
SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash,
       min(doc_id) AS keep_doc_id,
       count(*)    AS n_copies
FROM documents
GROUP BY ALL
"""

# --------------------------------------------------------------------------
# MinHash + LSH banding
# --------------------------------------------------------------------------

#: signature length and banding (16 bands × 8 rows → catches J≳0.75)
MINHASH_K = 128
LSH_BANDS = 16
LSH_ROWS = MINHASH_K // LSH_BANDS


def shingles(col, n: int = 5):
    """Character n-gram shingle array of the normalized text (distinct).

    ``transform(sequence(...))`` keeps shingling JVM-side; substring is
    1-indexed.  Width-5 char shingles are the standard choice for
    near-dup detection on web text.
    """
    norm = normalize_text(col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(1))),
            lambda i: norm.substr(i, F.lit(n)),
        )
    )


def minhash_signatures(documents: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """k-permutation MinHash signature per doc.

    Each permutation is ``min(xxhash64(shingle, seed))`` — k JVM
    expressions over one shingle array, no shuffle at all.
    """
    docs = documents.select("doc_id", shingles(F.col("text")).alias("sh"))

    def perm(seed: int):
        # NB: closure, not a default arg — PySpark treats extra lambda
        # params as the (element, index) binary form.
        return F.array_min(F.transform(F.col("sh"), lambda s: F.xxhash64(s, F.lit(seed))))

    sig = F.array(*[perm(i) for i in range(k)])
    return docs.select("doc_id", sig.alias("signature"))


def lsh_candidate_pairs(signatures: DataFrame, bands: int = LSH_BANDS) -> DataFrame:
    """Banded LSH: docs sharing any band hash become a candidate pair.

    explode(bands) → groupBy(band_idx, band_hash) → within-bucket join.
    The shuffle key is the band hash (uniform); no crossJoin anywhere —
    this is the scale path the all-pairs approach cannot take.
    """
    rows = MINHASH_K // bands
    band_arr = F.array(
        *[
            F.xxhash64(*[F.col("signature")[b * rows + r] for r in range(rows)])
            for b in range(bands)
        ]
    )
    banded = (
        signatures.select("doc_id", F.posexplode(band_arr).alias("band_idx", "band_hash"))
    )
    left = banded.alias("a")
    right = banded.alias("b")
    pairs = (
        left.join(
            right,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return pairs


def jaccard_verify(documents: DataFrame, pairs: DataFrame, threshold: float = 0.7) -> DataFrame:
    """Exact shingle-Jaccard on candidate pairs only (n-gram Jaccard
    verification step).  The join fans each pair to its two shingle
    sets; intersection/union via ``array_intersect``/``array_union``."""
    sh = documents.select("doc_id", shingles(F.col("text")).alias("sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    j = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .select("doc_a", "doc_b", "jaccard")
    )
    return j.filter(F.col("jaccard") >= threshold)


def dedup_minhash(documents: DataFrame, threshold: float = 0.7) -> DataFrame:
    """Full near-dup pass: signatures → banded candidates → verified
    pairs above the Jaccard threshold."""
    sigs = minhash_signatures(documents)
    cands = lsh_candidate_pairs(sigs)
    return jaccard_verify(documents, cands, threshold)


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

SIMHASH_BITS = 64


def simhash(documents: DataFrame) -> DataFrame:
    """64-bit SimHash over word tokens, fully JVM-side.

    For each bit b: sum over tokens of ±1 according to bit b of
    xxhash64(token); sign of the sum is the fingerprint bit.  The
    per-bit sums are ``aggregate`` expressions over the token array —
    no shuffle, no Python.
    """
    toks = F.array_distinct(F.split(normalize_text(F.col("text")), " "))
    docs = documents.select("doc_id", toks.alias("toks"))

    def bit_contrib(b: int):
        # closure over b (see note in minhash_signatures)
        return F.aggregate(
            F.col("toks"),
            F.lit(0).cast("long"),
            lambda acc, t: acc
            + F.when(F.shiftright(F.xxhash64(t), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    bit_exprs = []
    for b in range(SIMHASH_BITS):
        contrib = bit_contrib(b)
        bit_exprs.append(
            F.shiftleft(
                F.when(contrib > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")),
                b,
            )
        )
    fingerprint = sum(bit_exprs[1:], bit_exprs[0])
    return docs.select("doc_id", fingerprint.alias("simhash"))


def simhash_near_dups(documents: DataFrame, prefix_bits: int = 16) -> DataFrame:
    """Near-dup candidates: same ``prefix_bits`` high bits of the
    SimHash (a bucketed, shuffle-keyed block — not all-pairs), ranked
    by Hamming distance of the full fingerprint."""
    fp = simhash(documents)
    bucket = F.shiftrightunsigned(F.col("simhash"), SIMHASH_BITS - prefix_bits)
    b = fp.withColumn("bucket", bucket)
    left, right = b.alias("a"), b.alias("b")
    return (
        left.join(
            right,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
    )
