"""Multimodal plumbing queries. The corpus is pure ASCII (verified),
so byte-level oracles can use ascii()/octet_length() on the text the
payload was encoded from."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_library_spark.operators.multimodal import (
    extract_binary_meta,
    extract_features,
    resize_images,
    sample_frames,
    with_binary_payload,
)
from map_reduce_library_spark.queries import register
from map_reduce_library_spark.tables import load_table


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_binary_payload(load_table(spark, sf_dir, "documents"))


@register(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(CASE WHEN length(text) = 0 THEN -1
                     ELSE ascii(substr(text, 1, 1)) END AS INT) AS first_byte,
           CAST(CASE WHEN length(text) = 0 THEN -1
                     ELSE ascii(substr(text, length(text), 1)) END AS INT) AS last_byte
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched metadata extraction over a binary payload column
    (mapInPandas; bytes in, typed columns out)."""
    return extract_binary_meta(_payloads(spark, sf_dir))


@register(
    "multimodal_features",
    oracle="""
    SELECT doc_id, CAST(u.i AS INT) AS feature_idx, u.v AS value
    FROM (
      SELECT doc_id,
             unnest([
               {'i': 0, 'v': CAST(octet_length(encode(text)) AS DOUBLE)},
               {'i': 1, 'v': CAST(CASE WHEN length(text) = 0 THEN -1
                        ELSE ascii(substr(text, 1, 1)) END AS DOUBLE)},
               {'i': 2, 'v': CAST(CASE WHEN length(text) = 0 THEN -1
                        ELSE ascii(substr(text, length(text), 1)) END AS DOUBLE)},
               {'i': 3, 'v': CAST(octet_length(encode(text)) % 256 AS DOUBLE)}
             ]) AS u
      FROM documents
    )
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake feature extraction (stub for an embedding
    model) through the real binary→array<double> Arrow pipeline.

    The declared query unnests the feature vector to one
    (doc_id, feature_idx, value) row per element so the driver's
    value-hasher (which can't digest nested array cells) gets flat
    scalars; the array-returning operator itself is exercised
    unchanged in the pytest e2e (tests/test_multimodal.py)."""
    return extract_features(_payloads(spark, sf_dir)).select(
        "doc_id", F.posexplode("features").alias("feature_idx", "value")
    )


@register(
    "multimodal_frames",
    oracle="""
    SELECT doc_id, CAST(i AS INT) AS frame_idx,
           hex(encode(substr(text, i * 64 + 1, 1))) AS frame_hex
    FROM (
      SELECT doc_id, text,
             unnest(generate_series(
               0, least(CAST(ceil(length(text) / 64.0) AS INT), 8) - 1)) AS i
      FROM documents WHERE length(text) > 0
    )
    """,
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Frame sampling' 1→N fan-out over binary payloads; each frame
    is a 1-byte slice at 64-byte stride (max 8 frames), so the oracle
    reproduces frames from the source text (pure-ASCII corpus).

    The declared query hex-encodes the binary frame cell (the
    driver's value-hasher can't digest bytearray cells); the
    binary-returning operator is exercised unchanged in pytest."""
    return sample_frames(_payloads(spark, sf_dir)).select(
        "doc_id", "frame_idx", F.hex("frame").alias("frame_hex")
    )


@register(
    "multimodal_resize",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS orig_len,
           CAST(octet_length(encode(thumb)) AS BIGINT) AS new_len,
           hex(encode(thumb)) AS resized_hex
    FROM (
      SELECT doc_id, text,
             CASE WHEN length(text) = 0 THEN ''
                  ELSE array_to_string(
                    list_transform(
                      generate_series(0, least(15, (length(text) - 1) // 4)),
                      i -> substr(text, 1 + i * 4, 1)),
                    '')
             END AS thumb
      FROM documents
    )
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resize stage of the multimodal pipeline (decode →
    features / resize / frames): strided byte thumbnail through the
    binary→binary Arrow path; hex projection for the driver hasher
    (same convention as multimodal_frames)."""
    return resize_images(_payloads(spark, sf_dir)).select(
        "doc_id",
        "orig_len",
        "new_len",
        F.hex("resized").alias("resized_hex"),  # hex() is uppercase
    )
