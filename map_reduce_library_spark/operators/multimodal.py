"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: store the media as an opaque
``binary`` column (or a reference to object storage) next to typed
metadata columns; run decode / feature-extraction / resize /
frame-sampling as Arrow-batched ``mapInPandas`` stages so each task
processes a columnar batch of payloads without ever materializing
them on the driver.

The decode step is REAL for every supported format — stdlib-only
codecs for binary netpbm, PNG (``operators/imaging.py``) and baseline
JPEG (``operators/jpeg.py``) — and everything Spark-side is real and
tested: the binary schema, the Arrow batch shapes, the UDF
signatures, the partitioning, and a deterministic fake feature
extractor whose output an SQL oracle can reproduce (the EMBEDDING
step stays a deterministic fake — a real image-embedding model is a
model artifact, not a codec).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "doc_id bigint, n_bytes bigint, first_byte int, last_byte int"
FEATURE_SCHEMA = "doc_id bigint, features array<double>"


def with_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Attach an opaque binary payload column (UTF-8 bytes of the text
    here; in production the image/audio bytes) plus typed metadata —
    the canonical multimodal row layout."""
    return df.select(
        id_col,
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("format"),
            F.length(F.col(text_col)).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def extract_binary_meta(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column.

    Each ``mapInPandas`` batch arrives as a pandas DataFrame whose
    payload cells are Python ``bytes`` — the real decode pipeline
    shape. Output is plain typed columns."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # None payloads (a corrupt/missing media row — nulls ARE
            # an admitted input upstream) yield NULL metadata instead
            # of TypeError-ing the whole scan (code-review r8). The
            # nullable Int64/Int32 pandas dtypes carry the NULLs
            # through Arrow.
            rows = pdf["payload"].map(
                lambda b: (None, None, None)
                if b is None
                else (
                    len(b),
                    b[0] if len(b) else -1,
                    b[-1] if len(b) else -1,
                )
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.array(
                        [r[0] for r in rows], dtype="Int64"
                    ),
                    "first_byte": pd.array(
                        [r[1] for r in rows], dtype="Int32"
                    ),
                    "last_byte": pd.array(
                        [r[2] for r in rows], dtype="Int32"
                    ),
                }
            )

    return binary_df.mapInPandas(batches, schema=META_SCHEMA)


def decode_image(payload: bytes) -> object:
    """Image decode dispatch — every format decoded FOR REAL by the
    stdlib-only codecs in this package: PNG (``operators/imaging.py``:
    chunk walk, CRC verify, zlib inflate, all five filter
    reconstructions), binary netpbm (header parse + raw pixels), and
    baseline JPEG (``operators/jpeg.py``: marker walk, stream-defined
    Huffman/quant tables, entropy decode with restart markers,
    vectorized IDCT, chroma upsampling, YCbCr→RGB — round 12; the
    former all-formats stub is fully closed). Unknown magics raise
    ValueError. The Spark-side contract (bytes in, array out) is
    identical for every branch."""
    from map_reduce_library_spark.operators.imaging import (
        PNG_SIG,
        decode_netpbm,
        decode_png,
    )
    from map_reduce_library_spark.operators.jpeg import decode_jpeg

    if payload[:8] == PNG_SIG:
        return decode_png(payload)
    if payload[:2] in (b"P6", b"P5"):
        return decode_netpbm(payload)
    if payload[:2] == b"\xff\xd8":
        return decode_jpeg(payload)
    raise ValueError(
        f"unknown image magic {payload[:8]!r} (PNG, netpbm P5/P6, and "
        "baseline JPEG are supported); transcode at ingest"
    )


def extract_features(binary_df: DataFrame) -> DataFrame:
    """Deterministic fake 'feature extraction' over binary payloads —
    stands in for an image-embedding model while exercising the real
    pipeline shape (binary in, array<double> out, Arrow both ways)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # None payload -> NULL features (code-review r8): a
            # missing media blob has no embedding, and one corrupt
            # row must not kill the scan.
            feats = pdf["payload"].map(
                lambda b: None
                if b is None
                else [
                    float(len(b)),
                    float(b[0]) if len(b) else -1.0,
                    float(b[-1]) if len(b) else -1.0,
                    float(len(b) % 256),
                ]
            )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return binary_df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def sample_frames(
    binary_df: DataFrame, every: int = 64, max_frames: int = 8
) -> DataFrame:
    """'Video frame sampling' over an opaque payload: emit one row per
    sampled offset (frame), exercising the 1→N mapInPandas fan-out
    every video pipeline needs. Frame bytes are single-byte slices
    here; a real decoder would emit JPEG frames."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # no media -> no frames (cr r8)
                    continue
                for i, off in enumerate(range(0, len(payload), every)):
                    if i >= max_frames:
                        break
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(payload[off : off + 1])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return binary_df.mapInPandas(
        batches, schema="doc_id bigint, frame_idx int, frame binary"
    )


def resize_images(
    binary_df: DataFrame, stride: int = 4, max_bytes: int = 16
) -> DataFrame:
    """'Image resize' over an opaque payload: deterministic strided
    byte subsample (every ``stride``-th byte, capped at ``max_bytes``)
    standing in for decode → PIL resize → re-encode, while exercising
    the real thumbnailing pipeline shape — binary in, smaller binary
    out, Arrow both directions, output rows 1:1 with input. A real
    deployment swaps the lambda body for ``decode_image(payload)`` +
    ``imaging.box_resize`` (both real in this package); the strided
    variant survives as the format-agnostic fallback."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            # None payload -> NULL thumbnail + NULL lengths, 1:1 row
            # contract preserved without crashing the scan (cr r8).
            resized = payloads.map(
                lambda b: None if b is None else b[::stride][:max_bytes]
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_len": pd.array(
                        [None if b is None else len(b) for b in payloads],
                        dtype="Int64",
                    ),
                    "new_len": pd.array(
                        [None if b is None else len(b) for b in resized],
                        dtype="Int64",
                    ),
                    "resized": resized,
                }
            )

    return binary_df.mapInPandas(
        batches,
        schema="doc_id bigint, orig_len bigint, new_len bigint, resized binary",
    )
