"""Multimodal columns: opaque binary payloads with typed metadata.

A 100 TB multimodal pipeline stores image/audio/video as ``binary``
columns plus typed metadata, and runs decode/feature-extraction as
Arrow-batched Pandas stages (``mapInPandas``) so bytes never leave the
executor as Python row objects.

The actual media codecs are not available in this container, so
:func:`decode_image` is an explicitly stubbed seam — the *plumbing*
(schema, batch shape, partitioning, deterministic fake features) is
real and tested.  The payloads here are utf-8 bytes of the document
text standing in for media bytes; everything downstream treats them as
opaque binary.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: histogram bins for the fake feature extractor
FEATURE_BINS = 16


def attach_payload(documents: DataFrame) -> DataFrame:
    """Materialize the opaque binary column + typed metadata.

    ``payload`` is utf-8 bytes (media stand-in); ``media_type`` is the
    container tag a real pipeline would carry alongside.
    """
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain;fake-media").alias("media_type"),
    )


def multimodal_meta(documents: DataFrame) -> DataFrame:
    """Typed metadata extracted from the binary column with JVM
    built-ins only: byte length, content digest, magic prefix."""
    p = attach_payload(documents)
    return p.select(
        "doc_id",
        "media_type",
        F.length("payload").alias("byte_len"),
        F.md5("payload").alias("payload_md5"),
        F.substring(F.col("payload").cast("string"), 1, 8).alias("magic_prefix"),
    )


MULTIMODAL_META_ORACLE = """
SELECT doc_id,
       'text/plain;fake-media' AS media_type,
       octet_length(encode(text)) AS byte_len,
       md5(text)                  AS payload_md5,
       substr(text, 1, 8)         AS magic_prefix
FROM documents
"""


def decode_image(payload: bytes) -> "object":
    """Decode seam for real media. Requires an image codec library,
    which this environment does not ship."""
    raise NotImplementedError(
        "media decode requires an image/audio codec library (PIL/av); "
        "wire it here when available"
    )


_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("byte_len", LongType(), False),
        StructField("features", ArrayType(LongType()), False),
    ]
)


def extract_features(payloads: DataFrame, bins: int = FEATURE_BINS) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    The deterministic fake feature is a ``bins``-bucket byte histogram —
    the same batch shape (binary in, fixed-length vector out) a real
    decode-and-embed stage has.  ``mapInPandas`` keeps the transfer
    Arrow-vectorized; partitioning is whatever the upstream scan chose,
    i.e. the stage adds no shuffle.
    """

    import numpy as np

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for raw in pdf["payload"]:
                # vectorized per-payload: view bytes as uint8, bucket,
                # bincount — no Python-level per-byte loop
                b = np.frombuffer(raw, dtype=np.uint8) % bins
                feats.append(np.bincount(b, minlength=bins).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": [len(r) for r in pdf["payload"]],
                    "features": feats,
                }
            )

    return payloads.mapInPandas(_batches, _FEATURE_SCHEMA)


def feature_histogram(payloads: DataFrame, bins: int = FEATURE_BINS) -> DataFrame:
    """Canonical (exploded) form of :func:`extract_features`: one row
    per (doc, bin) with the bin's byte count — the layout a feature
    store ingests and the layout the correctness driver can hash
    (array columns are not canonicalizable).  ``posexplode`` of the
    fixed-length histogram is JVM-side and keeps zero-count bins.
    """
    f = extract_features(payloads, bins)
    return f.select(
        "doc_id",
        "media_type",
        "byte_len",
        F.posexplode("features").alias("bin", "bin_count"),
    )


def feature_histogram_oracle(bins: int = FEATURE_BINS) -> str:
    """DuckDB twin of the byte-histogram features.

    DuckDB has no direct byte indexing, but ``hex(encode(text))``
    exposes every byte as two hex chars; for ``bins=16`` the bin of a
    byte (= byte % 16) is exactly its low nibble — the hex digit at
    even position ``2*i``.
    """
    assert bins == 16, "hex-nibble oracle only expresses 16 bins"
    return """
WITH h AS (
    SELECT doc_id,
           'text/plain;fake-media'    AS media_type,
           octet_length(encode(text)) AS byte_len,
           hex(encode(text))          AS hx
    FROM documents
),
b AS (
    SELECT doc_id,
           unnest([strpos('0123456789ABCDEF', substr(hx, CAST(2*i AS INTEGER), 1)) - 1
                   for i in range(1, byte_len + 1)]) AS bin
    FROM h
),
counts AS (
    SELECT doc_id, bin, count(*) AS c FROM b GROUP BY doc_id, bin
),
grid AS (
    SELECT doc_id, media_type, byte_len, unnest(range(16)) AS bin FROM h
)
SELECT g.doc_id, g.media_type, g.byte_len,
       CAST(g.bin AS INTEGER) AS bin,
       coalesce(c.c, 0)       AS bin_count
FROM grid g
LEFT JOIN counts c ON g.doc_id = c.doc_id AND g.bin = c.bin
"""


# --------------------------------------------------------------------------
# frame sampling (video-analog: strided fixed-size blocks of the payload)
# --------------------------------------------------------------------------

#: frame geometry for the stand-in codec: 64-byte "frames", every 2nd kept
FRAME_SIZE = 64
FRAME_STRIDE = 2


def frame_sample(
    documents: DataFrame, frame_size: int = FRAME_SIZE, stride: int = FRAME_STRIDE
) -> DataFrame:
    """Sample every ``stride``-th fixed-size block of the payload as a
    "frame" and digest it — the plumbing of video frame-sampling
    (seek → decode keyframe → fingerprint) with the codec stubbed to
    byte-block slicing.  Frame digests keep their temporal order (the
    array is built positionally, not via collect_list), which is the
    contract a real frame-dedup stage needs.

    Map-only: no shuffle, one scan, output rows = input rows.
    """
    n_frames = F.greatest(F.ceil(F.length("text") / F.lit(frame_size)), F.lit(1)).cast("int")
    # explode(sequence) → substring → md5 keeps the per-frame hashing
    # inside whole-stage codegen (higher-order-function lambdas are
    # CodegenFallback — interpreted per element); the ordered re-agg
    # sorts each doc's few sampled frames locally after the partial agg
    base = documents.select(
        "doc_id", "text", n_frames.alias("n_frames_total")
    ).select(
        "doc_id",
        "n_frames_total",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames_total") - 1, F.lit(stride))
        ).alias("i"),
        F.col("text"),
    )
    hashed = base.select(
        "doc_id",
        "n_frames_total",
        "i",
        F.md5(
            F.encode(F.col("text").substr(F.col("i") * frame_size + 1, F.lit(frame_size)), "UTF-8")
        ).alias("frame_md5"),
    )
    # serialized (driver-canonicalizable) digest string, temporal order
    return hashed.groupBy("doc_id", "n_frames_total").agg(
        F.array_join(
            F.array_sort(F.collect_list(F.struct("i", "frame_md5"))).frame_md5, "|"
        ).alias("frame_hashes")
    )


def frame_sample_oracle(frame_size: int = FRAME_SIZE, stride: int = FRAME_STRIDE) -> str:
    n_frames = f"greatest(CAST(ceil(length(text) / {frame_size}.0) AS INTEGER), 1)"
    return f"""
SELECT doc_id,
       {n_frames} AS n_frames_total,
       array_to_string(
         [md5(substr(text, CAST(i * {frame_size} + 1 AS INTEGER), {frame_size}))
          for i in range(0, {n_frames}, {stride})], '|') AS frame_hashes
FROM documents
"""


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Resize seam for real media, like :func:`decode_image`: requires
    an image codec library this environment does not ship."""
    raise NotImplementedError(
        "image resize requires a codec library (PIL/opencv); "
        "wire it here when available"
    )


def thumbnail_digest(documents: DataFrame, thumb_bytes: int = 256) -> DataFrame:
    """Deterministic stand-in for decode→resize→re-encode: digest the
    leading ``thumb_bytes`` of the payload (the "thumbnail"), keeping
    the exact batch shape (binary in, binary-derived metadata out) a
    real resize stage has.  Map-only, no shuffle."""
    p = attach_payload(documents)
    return p.select(
        "doc_id",
        "media_type",
        F.length("payload").alias("byte_len"),
        F.md5(F.substring(F.col("payload").cast("string"), 1, thumb_bytes)).alias("thumb_md5"),
    )


THUMBNAIL_ORACLE = """
SELECT doc_id,
       'text/plain;fake-media'    AS media_type,
       octet_length(encode(text)) AS byte_len,
       md5(substr(text, 1, 256))  AS thumb_md5
FROM documents
"""
