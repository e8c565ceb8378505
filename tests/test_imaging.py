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


# ---- PNG codec (round 11) ---------------------------------------------------


def test_png_roundtrip_rgb_and_gray():
    """encode_png → decode_png is pixel-exact for both color types —
    a REAL zlib container roundtrip, not a shape check."""
    import numpy as np

    from map_reduce_library_spark.operators.imaging import (
        decode_png,
        encode_png,
        synth_image,
    )

    for doc_id, n_chars in [(2, 13), (3, 7), (10, 0), (11, 4)]:
        a = synth_image(doc_id, n_chars)
        b = decode_png(encode_png(a))
        assert b.shape == a.shape and b.dtype == np.uint8
        assert (b == a).all()


def test_png_decoder_reconstructs_all_five_filters():
    """The encoder emits filter 0, but a real decoder must accept
    whatever an external writer chose: craft an image whose scanlines
    cycle through None/Sub/Up/Average/Paeth (forward-filtering the
    known pixels per the spec) and require pixel-exact recovery."""
    import struct
    import zlib

    import numpy as np

    from map_reduce_library_spark.operators.imaging import (
        PNG_SIG,
        _png_chunk,
        decode_png,
        synth_image,
    )

    a = synth_image(4, 9)  # RGB
    h, w, c = a.shape
    stride = w * c
    flat = a.reshape(h, stride).astype(int)

    def filt_row(y: int, f: int) -> bytes:
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, int)
        out = []
        for x in range(stride):
            left = cur[x - c] if x >= c else 0
            up = prev[x]
            ul = prev[x - c] if x >= c else 0
            if f == 0:
                v = cur[x]
            elif f == 1:
                v = cur[x] - left
            elif f == 2:
                v = cur[x] - up
            elif f == 3:
                v = cur[x] - ((left + up) >> 1)
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = (
                    left
                    if (pa <= pb and pa <= pc)
                    else (up if pb <= pc else ul)
                )
                v = cur[x] - pred
            out.append(v & 0xFF)
        return bytes([f]) + bytes(out)

    raw = b"".join(filt_row(y, y % 5) for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    assert (decode_png(payload) == a).all()


def test_png_rejects_undecodable_payloads():
    """Non-PNG magic, truncation, CRC corruption, and out-of-scope
    IHDR shapes (16-bit, palette, interlace) must all raise loudly —
    the decode_netpbm/decode_wav discipline."""
    import struct
    import zlib

    import pytest

    from map_reduce_library_spark.operators.imaging import (
        PNG_SIG,
        _png_chunk,
        decode_png,
        encode_png,
        synth_image,
    )

    good = encode_png(synth_image(4, 9))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\xff\xd8\xff\xe0 jpeg bytes")
    with pytest.raises(ValueError):
        decode_png(good[:40])  # truncated mid-chunk
    corrupt = bytearray(good)
    corrupt[20] ^= 0xFF  # flip an IHDR byte under its CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupt))

    def with_ihdr(depth, color, interlace=0):
        ihdr = struct.pack(">IIBBBBB", 4, 4, depth, color, 0, 0, interlace)
        return (
            PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 20))
            + _png_chunk(b"IEND", b"")
        )

    with pytest.raises(ValueError, match="8-bit"):
        decode_png(with_ihdr(16, 0))
    with pytest.raises(ValueError, match="8-bit"):
        decode_png(with_ihdr(8, 3))  # palette
    with pytest.raises(ValueError, match="interlace"):
        decode_png(with_ihdr(8, 0, interlace=1))

    # zlib bomb: IHDR declares 4x4 but the IDAT inflates to 10 MB —
    # must fail the length contract WITHOUT allocating the bomb (the
    # decompressobj max_length cap)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    bomb = (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 10_000_000))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="inflated length"):
        decode_png(bomb)


def test_decode_image_dispatch_routes_all_real_codecs():
    """multimodal.decode_image REALLY decodes PNG, netpbm, and (round
    12) baseline JPEG; unknown magics raise ValueError."""
    import pytest

    from map_reduce_library_spark.operators.imaging import (
        encode_png,
        encode_ppm,
        synth_image,
    )
    from map_reduce_library_spark.operators.jpeg import (
        encode_jpeg,
        synth_tile_image,
    )
    from map_reduce_library_spark.operators.multimodal import decode_image

    a = synth_image(2, 13)
    assert (decode_image(encode_png(a)) == a).all()
    assert (decode_image(encode_ppm(a)) == a).all()
    j = synth_tile_image(4, 7)
    assert (decode_image(encode_jpeg(j)) == j).all()
    with pytest.raises(ValueError, match="unknown image magic"):
        decode_image(b"GIF89a not supported")


def test_png_image_stats_oracle(spark):
    from conftest import assert_oracle_match

    assert_oracle_match(spark, "png_image_stats")
