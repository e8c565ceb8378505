"""Real (pure-numpy) netpbm decode / box-resize over binary columns —
the un-stubbed counterpart of the multimodal pipeline's decode stage."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from map_reduce_library_spark.operators.imaging import (
    box_resize,
    decode_netpbm,
    decode_stats,
    encode_ppm,
    thumbnail,
)


def _img(doc_id: int, h: int, w: int, rgb: bool = True) -> np.ndarray:
    rng = np.random.default_rng(doc_id)
    shape = (h, w, 3) if rgb else (h, w)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


def test_codec_roundtrip_rgb_and_gray():
    for rgb in (True, False):
        a = _img(7, 13, 9, rgb)
        b = decode_netpbm(encode_ppm(a))
        assert b.shape == a.shape and b.dtype == np.uint8
        assert np.array_equal(a, b)


def test_decoder_tolerates_comments_and_whitespace():
    a = _img(1, 4, 5)
    raw = encode_ppm(a)
    # same pixels, ugly-but-legal header
    hacked = b"P6 # a comment\n# another\n  5\t4\n255\n" + a.tobytes()
    assert np.array_equal(decode_netpbm(raw), decode_netpbm(hacked))


def test_decoder_rejects_compressed_formats():
    with pytest.raises(ValueError, match="PIL|netpbm"):
        decode_netpbm(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(ValueError, match="PIL|netpbm"):
        decode_netpbm(b"\xff\xd8\xff\xe0JFIF")


def test_decoder_raises_on_truncated_headers():
    """A corrupt/truncated blob must RAISE, never loop — a hang here
    stalls an executor task forever (code-review r6 finding)."""
    for bad in (
        b"P6",
        b"P6 ",
        b"P6\n5",
        b"P6\n5 4",
        b"P6\n5 4 255",      # maxval not followed by whitespace
        b"P6\n# only a comment",
        b"P6\nx y z\n",      # non-numeric fields
    ):
        with pytest.raises(ValueError):
            decode_netpbm(bad)
    # pixel data shorter than header promises also raises (frombuffer)
    with pytest.raises(ValueError):
        decode_netpbm(b"P6\n5 4\n255\n\x00\x01")
    # negative/zero dimensions must raise, not fabricate an image
    # (np.frombuffer reads everything on a negative count and
    # reshape(-1) infers the width) or return NaN-mean empty pixels
    for bad in (b"P6\n-1 4\n255\n" + b"\x00" * 12, b"P6\n0 4\n255\n"):
        with pytest.raises(ValueError, match="dimensions"):
            decode_netpbm(bad)


def test_box_resize_is_block_mean():
    a = np.arange(16, dtype=np.uint8).reshape(4, 4)
    small = box_resize(a, 2)
    # blocks: [[0,1],[4,5]] mean 2.5 -> 2 (round-half-even), etc.
    want = np.array([[2, 4], [10, 12]], dtype=np.uint8)
    assert np.array_equal(small, want)
    # trailing rows/cols cropped
    assert box_resize(_img(3, 5, 7), 2).shape == (2, 3, 3)


def _payload_df(spark, imgs):
    return spark.createDataFrame(
        [(i, bytearray(encode_ppm(a))) for i, a in imgs],
        "doc_id bigint, payload binary",
    )


def test_decode_stats_real_pixels(spark):
    imgs = [(i, _img(i, 8 + i, 6, rgb=(i % 2 == 0))) for i in range(6)]
    df = _payload_df(spark, imgs)
    got = {r.doc_id: r for r in decode_stats(df).collect()}
    assert set(got) == set(range(6))
    for i, a in imgs:
        r = got[i]
        assert (r.height, r.width) == a.shape[:2]
        assert r.channels == (3 if a.ndim == 3 else 1)
        if a.ndim == 3:
            want = (
                a[..., 0] * 0.299 + a[..., 1] * 0.587 + a[..., 2] * 0.114
            ).mean()
        else:
            want = a.mean()
        assert abs(r.mean_lum - float(want)) < 1e-9


def test_thumbnail_roundtrips_and_preserves_brightness(spark):
    imgs = [(i, _img(i, 16, 12)) for i in range(4)]
    df = _payload_df(spark, imgs)
    got = {r.doc_id: r for r in thumbnail(df, factor=4).collect()}
    for i, a in imgs:
        r = got[i]
        small = decode_netpbm(bytes(r.thumb))
        assert small.shape == (4, 3, 3) == (r.height, r.width, r.channels)
        # box-filter preserves mean brightness to rounding error
        assert abs(float(small.mean()) - float(a.mean())) < 2.0


def test_pipeline_is_arrow_batched(spark):
    df = _payload_df(spark, [(0, _img(0, 4, 4))])
    plan = (
        decode_stats(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_composes_with_multimodal_payload_layout(spark):
    """The imaging stages consume the SAME (doc_id, payload) layout
    multimodal.py's stages use — swap-in compatible: feed thumbnails
    back through decode_stats."""
    imgs = [(i, _img(i, 8, 8)) for i in range(3)]
    thumbs = thumbnail(_payload_df(spark, imgs), factor=2).select(
        "doc_id", F.col("thumb").alias("payload")
    )
    rows = decode_stats(thumbs).collect()
    assert {(r.height, r.width) for r in rows} == {(4, 4)}


def test_imaging_null_payloads_yield_null_rows(spark):
    """code-review r8: a NULL payload used to TypeError the whole scan
    inside decode; it now yields a NULL stats/thumb row (the
    multimodal.py convention) while malformed non-null payloads still
    raise."""
    from map_reduce_library_spark.operators.imaging import (
        decode_stats,
        encode_ppm,
        thumbnail,
    )
    import numpy as np

    img = encode_ppm(np.zeros((8, 8, 3), dtype=np.uint8))
    df = spark.createDataFrame(
        [(1, None), (2, img)], "doc_id bigint, payload binary"
    )
    stats = {r.doc_id: r for r in decode_stats(df).collect()}
    assert stats[1].height is None and stats[1].mean_lum is None
    assert stats[2].height == 8 and stats[2].channels == 3

    th = {r.doc_id: r for r in thumbnail(df).collect()}
    assert th[1].thumb is None
    assert th[2].thumb is not None
