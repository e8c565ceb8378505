"""REAL image decode/resize for uncompressed formats — pure numpy,
no PIL/libvips required.

``operators/multimodal.py`` ships the generic binary-column pipeline
with its decode step stubbed (JPEG/PNG need an imaging library this
container lacks). This module closes the gap for the formats a
codec-free environment CAN decode: binary PPM (P6, RGB) and PGM (P5,
grayscale) — trivial headers + raw bytes, the interchange format of
the netpbm family. The pipeline shape is identical to the stubbed
one (binary in → Arrow batch → typed arrays out), but the decode,
the box-filter resize, and the feature extraction are genuine pixel
math, so the tests pin real image semantics (shape, dtype, mean
brightness, downsample averaging) instead of a deterministic fake.

At 100 TB the shape is unchanged from multimodal.py: payloads stay
columnar in Arrow batches on executors, the driver never sees bytes,
and per-task memory is bounded by batch size × image size
(`spark.sql.execution.arrow.maxRecordsPerBatch` is the knob).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

DECODED_SCHEMA = (
    "doc_id bigint, height int, width int, channels int, mean_lum double"
)
THUMB_SCHEMA = (
    "doc_id bigint, height int, width int, channels int, thumb binary"
)


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary PPM (P6); (H, W) uint8 → PGM (P5)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 3 and a.shape[2] == 3:
        magic = b"P6"
    elif a.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"expected (H,W,3) or (H,W), got {a.shape}")
    h, w = a.shape[0], a.shape[1]
    return magic + f"\n{w} {h}\n255\n".encode() + a.tobytes()


def decode_netpbm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (H, W, 3) uint8; PGM (P5) → (H, W) uint8.
    Tolerates comment lines and arbitrary whitespace in the header
    (the netpbm spec). Raises ValueError on other magics — JPEG/PNG
    genuinely need a codec library (the multimodal.py stub)."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError(
            f"not a binary netpbm payload (magic {payload[:2]!r}); "
            "compressed formats need PIL/libvips"
        )
    rgb = payload[:2] == b"P6"
    # header = magic + 3 ints (w, h, maxval) separated by whitespace,
    # with '#' comments running to end-of-line; pixel data starts after
    # the single whitespace byte following maxval.
    fields: list[int] = []
    i, n = 2, len(payload)
    while len(fields) < 3:
        if i >= n:  # truncated header must RAISE, never loop: one
            # corrupt blob would otherwise hang its executor task
            raise ValueError("truncated netpbm header")
        c = payload[i : i + 1]
        if c == b"#":
            nl = payload.find(b"\n", i)
            if nl < 0:
                raise ValueError("truncated netpbm header")
            i = nl + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not payload[j : j + 1].isspace():
                j += 1
            if j == n:  # maxval must be followed by a whitespace byte
                raise ValueError("truncated netpbm header")
            fields.append(int(payload[i:j]))
            i = j
    i += 1  # the single whitespace separating maxval from pixel data
    w, h, maxval = fields
    if w <= 0 or h <= 0:
        # np.frombuffer treats a negative count as read-everything and
        # reshape(-1) infers the dimension — a corrupt header would
        # silently fabricate an image (or a 0-pixel one whose mean is
        # NaN) instead of failing
        raise ValueError(f"invalid netpbm dimensions {w}x{h}")
    if maxval != 255:
        raise ValueError(f"only 8-bit netpbm supported (maxval {maxval})")
    n_px = w * h * (3 if rgb else 1)
    a = np.frombuffer(payload, dtype=np.uint8, count=n_px, offset=i)
    return a.reshape((h, w, 3) if rgb else (h, w))


def box_resize(a: np.ndarray, factor: int) -> np.ndarray:
    """Integer-factor box-filter downsample (mean over factor×factor
    blocks; trailing rows/cols beyond a full block are cropped — the
    standard thumbnailing behavior). Works for (H,W) and (H,W,C)."""
    if factor < 1:
        raise ValueError("factor must be >= 1")
    h, w = a.shape[0] // factor, a.shape[1] // factor
    if h == 0 or w == 0:
        raise ValueError(f"image {a.shape} too small for factor {factor}")
    a = a[: h * factor, : w * factor]
    if a.ndim == 2:
        blocks = a.reshape(h, factor, w, factor)
        return blocks.mean(axis=(1, 3)).round().astype(np.uint8)
    blocks = a.reshape(h, factor, w, factor, a.shape[2])
    return blocks.mean(axis=(1, 3)).round().astype(np.uint8)


def decode_stats(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode: payload → pixels → (shape, mean
    luminance). Mean luminance uses the Rec.601 weights for RGB."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {
                "doc_id": [],
                "height": [],
                "width": [],
                "channels": [],
                "mean_lum": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rows["doc_id"].append(doc_id)
                # NULL payload -> NULL stats row (the multimodal.py
                # convention): a missing blob is not a format error,
                # and one corrupt row must not TypeError the whole
                # scan (code-review r8). Malformed non-null payloads
                # still raise, by design.
                if payload is None:
                    for k in ("height", "width", "channels", "mean_lum"):
                        rows[k].append(None)
                    continue
                a = decode_netpbm(payload)
                if a.ndim == 3:
                    lum = (
                        a[..., 0] * 0.299
                        + a[..., 1] * 0.587
                        + a[..., 2] * 0.114
                    ).mean()
                    ch = 3
                else:
                    lum = a.mean()
                    ch = 1
                rows["height"].append(a.shape[0])
                rows["width"].append(a.shape[1])
                rows["channels"].append(ch)
                rows["mean_lum"].append(float(lum))
            for k in ("height", "width", "channels"):
                rows[k] = pd.array(rows[k], dtype="Int32")
            yield pd.DataFrame(rows)

    return binary_df.mapInPandas(batches, schema=DECODED_SCHEMA)


def thumbnail(binary_df: DataFrame, factor: int = 4) -> DataFrame:
    """Arrow-batched REAL resize: decode → box downsample → re-encode
    as netpbm. Output rows 1:1 with input, thumb is a valid payload
    decode_netpbm round-trips."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {
                "doc_id": [],
                "height": [],
                "width": [],
                "channels": [],
                "thumb": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rows["doc_id"].append(doc_id)
                if payload is None:  # NULL blob -> NULL thumb (cr r8)
                    for k in ("height", "width", "channels", "thumb"):
                        rows[k].append(None)
                    continue
                small = box_resize(decode_netpbm(payload), factor)
                rows["height"].append(small.shape[0])
                rows["width"].append(small.shape[1])
                rows["channels"].append(
                    small.shape[2] if small.ndim == 3 else 1
                )
                rows["thumb"].append(encode_ppm(small))
            for k in ("height", "width", "channels"):
                rows[k] = pd.array(rows[k], dtype="Int32")
            yield pd.DataFrame(rows)

    return binary_df.mapInPandas(batches, schema=THUMB_SCHEMA)
