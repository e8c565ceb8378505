"""Baseline-JPEG codec: exactness contract, general lossy round
trips, restart markers, and the loud-ValueError contract for
malformed untrusted inputs (the decode_png/decode_netpbm discipline).
"""

from __future__ import annotations

import numpy as np
import pytest

from map_reduce_library_spark.operators.jpeg import (
    Q_CHROMA,
    Q_LUMA,
    _ZIGZAG,
    classify_jpeg_decode,
    decode_jpeg,
    encode_jpeg,
    synth_tile_image,
)

ONES = np.ones(64, np.int64)


# ---- the exactness contract (what makes the oracle possible) ----------------


@pytest.mark.parametrize("doc_id,n_chars", [(1, 0), (2, 1), (3, 2), (4, 5)])
def test_constant_tile_roundtrip_is_bit_exact(doc_id, n_chars):
    """Constant 16×16 gray-valued tiles survive FDCT → quant → Huffman
    → stuffing → (4:2:0 for color) → IDCT → color transform EXACTLY:
    DC-only blocks with a DC quant step of 8 (module doc contract)."""
    img = synth_tile_image(doc_id, n_chars)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_constant_tiles_exact_through_444_too():
    img = synth_tile_image(8, 4)
    out = decode_jpeg(encode_jpeg(img, subsampling="444"))
    assert np.array_equal(out, img)


def test_restart_markers_roundtrip_and_reset_predictors():
    """DRI/RSTn path: per-segment DC predictor reset must be applied
    on BOTH sides — a decoder that carries the predictor across a
    restart boundary shifts every later tile's value."""
    img = synth_tile_image(4, 8)  # 48x32x3 -> 6 MCUs at 4:2:0
    out = decode_jpeg(encode_jpeg(img, restart=2))
    assert np.array_equal(out, img)
    gray = synth_tile_image(7, 8)  # 48x32 gray -> 24 MCUs at 8x8
    out = decode_jpeg(encode_jpeg(gray, restart=5))
    assert np.array_equal(out, gray)


# ---- general lossy behavior --------------------------------------------------


def test_arbitrary_image_unit_quant_error_is_coefficient_rounding():
    """With all-ones quant tables the only loss is rounding each DCT
    coefficient to an integer — a few counts per pixel, never more.
    This drives REAL AC coefficients through the full Huffman
    run-length machinery (ZRL, EOB, magnitude categories)."""
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (24, 40, 3), dtype=np.uint8)
    out = decode_jpeg(
        encode_jpeg(img, subsampling="444", q_luma=ONES, q_chroma=ONES)
    )
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4

    gray = rng.randint(0, 256, (17, 23), dtype=np.uint8)  # ragged dims
    out = decode_jpeg(encode_jpeg(gray, q_luma=ONES))
    assert out.shape == gray.shape  # MCU padding cropped back off
    assert np.abs(out.astype(int) - gray.astype(int)).max() <= 1


def test_default_tables_bounded_error_on_smooth_image():
    yy, xx = np.mgrid[0:32, 0:32]
    img = np.stack(
        [(yy * 2).astype(np.uint8), (xx * 2).astype(np.uint8),
         (yy + xx).astype(np.uint8)],
        axis=2,
    )
    out = decode_jpeg(encode_jpeg(img, subsampling="420"))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 16


def test_dc_only_planted_pixel_decode_against_formula():
    """Independent of the encoder's FDCT: a mid-gray image with one
    planted constant block decodes to exactly the planted values —
    pins dezigzag + dequant + IDCT level shift against hand math."""
    img = np.full((16, 16), 128, np.uint8)
    img[8:16, 0:8] = 200
    out = decode_jpeg(encode_jpeg(img, q_luma=ONES))
    assert np.array_equal(out, img)


# ---- malformed-input contract: everything is a loud ValueError ---------------


def test_rejects_non_jpeg_magic():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG\r\n\x1a\nrest")


def test_rejects_progressive_sof2():
    payload = bytearray(encode_jpeg(synth_tile_image(3, 0)))
    i = payload.find(b"\xff\xc0")
    payload[i + 1] = 0xC2  # rewrite the frame marker to progressive
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg(bytes(payload))


def test_rejects_truncated_entropy_stream():
    payload = encode_jpeg(synth_tile_image(3, 0))
    with pytest.raises(ValueError, match="JPEG"):
        decode_jpeg(payload[: len(payload) - 8])


def test_rejects_oversized_declared_dimensions():
    """A crafted SOF0 declaring 2^15×2^15 pixels must refuse BEFORE
    allocating (the PNG_MAX_PIXELS rationale)."""
    payload = bytearray(encode_jpeg(np.full((8, 8), 7, np.uint8)))
    i = payload.find(b"\xff\xc0")
    payload[i + 5 : i + 7] = (32768).to_bytes(2, "big")  # height
    payload[i + 7 : i + 9] = (32768).to_bytes(2, "big")  # width
    with pytest.raises(ValueError, match="decode cap"):
        decode_jpeg(bytes(payload))


def test_rejects_sixteen_bit_quant_tables():
    payload = bytearray(encode_jpeg(np.full((8, 8), 7, np.uint8)))
    i = payload.find(b"\xff\xdb")
    payload[i + 4] = 0x10  # Pq=1 (16-bit)
    with pytest.raises(ValueError, match="8-bit"):
        decode_jpeg(bytes(payload))


def test_rejects_missing_eoi():
    payload = encode_jpeg(synth_tile_image(3, 0))
    assert payload.endswith(b"\xff\xd9")
    with pytest.raises(ValueError, match="no EOI|exhausted|JPEG"):
        decode_jpeg(payload[:-2])


def test_rejects_garbage_between_soi_and_segments():
    with pytest.raises(ValueError, match="marker expected"):
        decode_jpeg(b"\xff\xd8garbage-no-marker" + b"\x00" * 16)


# ---- encoder invariants -------------------------------------------------------


def test_quant_tables_carry_exact_dc_step():
    """The shipped tables are Annex K with the DC entry replaced by 8
    — the divisor that keeps constant-block DC (8·v) exact."""
    assert Q_LUMA[0] == 8 and Q_CHROMA[0] == 8
    assert Q_LUMA[1] == 11  # and the AC body is still the spec's


def test_zigzag_is_an_involution_partner():
    """dezigzag(zigzag(x)) == x — the decoder inverts the encoder's
    scan order exactly."""
    x = np.arange(64)
    zz = x[_ZIGZAG]
    inv = np.zeros(64, np.int64)
    inv[_ZIGZAG] = zz
    assert np.array_equal(inv, x)


def test_byte_stuffing_roundtrip():
    """An image whose entropy stream necessarily contains 0xFF bytes
    still round-trips (stuffed 0xFF00 on the way out, unstuffed on
    the way in)."""
    # many distinct tiles -> long varied bitstream; some 0xFF bytes
    rng = np.random.RandomState(3)
    img = (rng.randint(0, 16, (32, 32)) * 16).astype(np.uint8)
    payload = encode_jpeg(img, q_luma=ONES)
    out = decode_jpeg(payload)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_422_subsampling_roundtrip():
    """4:2:2 (luma 2×1) exercises the decoder's asymmetric-sampling
    MCU interleave and horizontal-only chroma upsampling."""
    img = synth_tile_image(4, 7)
    out = decode_jpeg(encode_jpeg(img, subsampling="422"))
    assert np.array_equal(out, img)
    rng = np.random.RandomState(5)
    g = rng.randint(0, 256, (24, 40), dtype=np.uint8)
    full = np.repeat(g[:, :, None], 3, axis=2)  # gray-valued: chroma flat
    out = decode_jpeg(
        encode_jpeg(full, subsampling="422", q_luma=ONES, q_chroma=ONES)
    )
    assert np.abs(out.astype(int) - full.astype(int)).max() <= 1


def test_thumbnail_pipeline_closed_form():
    """decode → box_resize(2) on constant tiles: dims halve, values
    survive (box mean of a constant region is the constant)."""
    from map_reduce_library_spark.operators.imaging import box_resize

    img = synth_tile_image(4, 5)
    thumb = box_resize(decode_jpeg(encode_jpeg(img)), 2)
    assert thumb.shape == (img.shape[0] // 2, img.shape[1] // 2, 3)
    # every 8x8 thumb block is the original tile's constant value
    assert np.array_equal(thumb, img[::2, ::2])


# ---- property tests: the codec as an untrusted-input boundary ----------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    color=st.booleans(),
    sub=st.sampled_from(["444", "422", "420"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_property_roundtrip_bounded_error_any_shape(h, w, color, sub, seed):
    """Any uint8 image of any shape round-trips through encode→decode
    with per-pixel error bounded by coefficient rounding (unit quant):
    shape recovered exactly (MCU padding cropped), no exception, no
    silent garbage. Chroma subsampling is lossy on COLOR detail by
    design, so color inputs are gray-valued unless 4:4:4."""
    rng = np.random.RandomState(seed)
    if color:
        if sub == "444":
            img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        else:
            g = rng.randint(0, 256, (h, w), dtype=np.uint8)
            img = np.repeat(g[:, :, None], 3, axis=2)
    else:
        img = rng.randint(0, 256, (h, w), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, subsampling=sub, q_luma=ONES,
                                  q_chroma=ONES))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int)).max()
    # unit-quant loss = one rounding per DCT coefficient (±0.5 each,
    # partially cancelling) + color-transform rounding for 3-channel
    assert err <= 6, err


@settings(max_examples=60, deadline=None)
@given(
    cut=st.integers(2, 200),
    flip_pos=st.integers(2, 199),
    flip_val=st.integers(0, 255),
    data=st.binary(min_size=0, max_size=64),
)
def test_property_malformed_inputs_raise_valueerror_only(
    cut, flip_pos, flip_val, data
):
    """Truncations, byte flips, and random prefixes surface as
    ValueError (or decode to SOMETHING for benign flips in pixel
    data) — never struct.error / IndexError / OverflowError /
    MemoryError: the executor-task contract for untrusted blobs."""
    payload = encode_jpeg(synth_tile_image(3, 1))
    victims = [
        payload[: min(cut, len(payload) - 1)],  # truncation
        b"\xff\xd8" + data,  # garbage after SOI
    ]
    if flip_pos < len(payload):
        victims.append(
            payload[:flip_pos]
            + bytes([flip_val])
            + payload[flip_pos + 1 :]
        )
    for v in victims:
        try:
            out = decode_jpeg(v)
        except ValueError:
            continue  # the documented loud failure
        # benign flip (e.g. inside entropy data): must still be a
        # well-formed decode of the DECLARED geometry
        assert out.dtype == np.uint8
        assert out.shape[0] > 0 and out.shape[1] > 0


def test_single_component_scan_is_non_interleaved():
    """T.81 A.2: a one-component scan ignores declared sampling
    factors — data units are raster-ordered 8×8 blocks. A grayscale
    file whose SOF0 declares 2×2 sampling must decode identically to
    the 1×1 encoding of the same pixels (code-review r12: the
    interleaved-MCU interpretation transposed block positions)."""
    img = synth_tile_image(7, 8)  # 48x32 gray, multiple of 16
    payload = bytearray(encode_jpeg(img))
    i = payload.find(b"\xff\xc0")
    # SOF0 payload: len(2) prec(1) h(2) w(2) ncomp(1) [id hv tq]
    hv_off = i + 4 + 6 + 1
    assert payload[hv_off] == 0x11
    payload[hv_off] = 0x22  # declare 2x2 sampling
    out = decode_jpeg(bytes(payload))
    assert np.array_equal(out, img)


def test_trailing_garbage_after_scan_raises():
    """Extra whole bytes after the last MCU's entropy data are
    garbage, not padding — they must raise, not silently decode
    (code-review r12: the old guard was unreachable)."""
    payload = encode_jpeg(synth_tile_image(3, 0))
    assert payload.endswith(b"\xff\xd9")
    doctored = payload[:-2] + b"\x55\x66\x77\x88" + b"\xff\xd9"
    with pytest.raises(ValueError, match="trailing garbage"):
        decode_jpeg(doctored)


# ---- ADVICE r12: marker-walk and entropy edge cases --------------------------


def test_fill_bytes_before_marker_are_skipped():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
    marker code; a spec-valid stream padded that way must decode to
    the same pixels, not be rejected with the fill byte misread as a
    marker code (ADVICE r12)."""
    img = synth_tile_image(5, 9)
    payload = encode_jpeg(img)
    ref = decode_jpeg(payload)
    i = payload.find(b"\xff\xdb")  # pad before DQT
    padded = payload[:i] + b"\xff" * 3 + payload[i:]
    out = decode_jpeg(padded)
    assert np.array_equal(out, ref)
    j = payload.find(b"\xff\xc0")  # and before SOF0
    padded = payload[:j] + b"\xff" + payload[j:]
    assert np.array_equal(decode_jpeg(padded), ref)


def _minimal_gray_jpeg(entropy: bytes) -> bytes:
    """Hand-built 8x8 grayscale baseline stream with degenerate
    1-bit Huffman tables so a test controls the entropy bits exactly:
    DC table {code 0 -> category 0}; AC table {code 0 -> ZRL 0xF0,
    code 1 -> EOB 0x00}."""
    soi = b"\xff\xd8"
    dqt = b"\xff\xdb" + (2 + 65).to_bytes(2, "big") + b"\x00" + b"\x01" * 64
    sof = (
        b"\xff\xc0" + (8 + 3).to_bytes(2, "big")
        + b"\x08" + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
        + b"\x01" + b"\x01" + b"\x11" + b"\x00"
    )
    dc_bits = bytes([1] + [0] * 15)
    dht_dc = (
        b"\xff\xc4" + (3 + 16 + 1).to_bytes(2, "big")
        + b"\x00" + dc_bits + b"\x00"
    )
    ac_bits = bytes([2] + [0] * 15)
    dht_ac = (
        b"\xff\xc4" + (3 + 16 + 2).to_bytes(2, "big")
        + b"\x10" + ac_bits + b"\xf0\x00"
    )
    sos = (
        b"\xff\xda" + (6 + 2).to_bytes(2, "big")
        + b"\x01" + b"\x01\x00" + b"\x00\x3f\x00"
    )
    return soi + dqt + sof + dht_dc + dht_ac + sos + entropy + b"\xff\xd9"


def test_zrl_run_past_block_end_raises():
    """A ZRL whose 16-zero run overflows the 63 AC slots must raise,
    not silently exit the block loop (ADVICE r12). Entropy bits:
    DC cat 0 ('0'), then four ZRLs ('0'x4) -> k = 1+64 = 65 > 64."""
    with pytest.raises(ValueError, match="ZRL run past block end"):
        decode_jpeg(_minimal_gray_jpeg(b"\x07"))  # 00000 + 111 padding


def test_zrl_exactly_filling_block_is_accepted():
    """Three ZRLs then the block ends at k=49+16=65? No: k=1 +16*3=49;
    a 4th would overflow. Exact fill needs k to land on 64: DC, ZRL x3
    leaves k=49 — EOB closes it legally. The boundary case k==64
    (accepted, as libjpeg does) is constructed as 63 zeros via 3 ZRLs
    + run-15 not expressible with this degenerate table, so assert
    the legal EOB path still decodes and yields the DC-only block."""
    # entropy: DC '0', ZRL '0' x3, EOB '1' -> bits 0 0 0 0 1 + 111 pad
    out = decode_jpeg(_minimal_gray_jpeg(b"\x0f"))
    assert out.shape == (8, 8)
    # DC diff 0 with unit quant -> flat 128 block
    assert np.all(out == 128)


def test_extra_bytes_inside_restart_segment_raise():
    """Garbage bytes appended before a RSTn marker (not just in the
    final segment) must raise — the per-segment leftover check
    (ADVICE r12)."""
    img = synth_tile_image(4, 7)
    payload = encode_jpeg(img, restart=2)
    i = payload.find(b"\xff\xd0")  # first restart marker
    assert i > 0, "fixture must contain a restart marker"
    doctored = payload[:i] + b"\x55" + payload[i:]
    with pytest.raises(ValueError, match="before restart marker"):
        decode_jpeg(doctored)


def test_classify_and_doctored_fixture_classes():
    """The mixed-ingest triage (VERDICT r12 item 7): every doctored
    class lands in its designed verdict, including the spec-valid
    fill-byte class that must remain 'ok' (the ADVICE r12 marker-walk
    fix, exercised through the triage path)."""
    from map_reduce_library_spark.operators.jpeg import (
        classify_jpeg_decode,
        doctor_jpeg_payload,
    )

    expected = {
        0: "unsupported_mode",
        1: "truncated",
        2: "not_jpeg",
        3: "ok",
        4: "ok",
    }
    for doc_id in range(10):
        payload = doctor_jpeg_payload(
            doc_id, encode_jpeg(synth_tile_image(doc_id, doc_id % 3))
        )
        got = classify_jpeg_decode(payload)
        want = expected.get(doc_id % 10, "ok")
        assert got == want, f"doc {doc_id}: {got} != {want}"
    # and a genuinely corrupt entropy stream is 'malformed', not a
    # success or a misfiled truncation
    p = bytearray(encode_jpeg(synth_tile_image(1, 1)))
    i = p.find(b"\xff\xda")
    p[i + 20] ^= 0x5A  # flip bits mid-entropy
    assert classify_jpeg_decode(bytes(p)) in ("malformed", "truncated")
    # spec-valid-but-out-of-profile shapes beyond the frame type all
    # route to unsupported_mode, the transcode-at-ingest bucket
    # (code-review r13: 12-bit/CMYK were misfiled as 'malformed')
    p12 = bytearray(encode_jpeg(synth_tile_image(2, 1)))
    j = p12.find(b"\xff\xc0")
    p12[j + 4] = 12  # sample precision 12-bit
    assert classify_jpeg_decode(bytes(p12)) == "unsupported_mode"
    cmyk = bytearray(encode_jpeg(synth_tile_image(2, 1)))
    j = cmyk.find(b"\xff\xc0")
    cmyk[j + 9] = 4  # component count 4 (CMYK-shaped)
    assert classify_jpeg_decode(bytes(cmyk)) == "unsupported_mode"


def test_fill_bytes_property_any_header_marker_any_count():
    """Property form of the T.81 B.1.1.2 fix: 1-4 fill bytes inserted
    before ANY header-segment marker (DQT, DHT, SOF0, DRI, SOS)
    preserve the decode bit-exactly. Deterministic sweep, not random:
    every (marker, count) pair is checked."""
    img = synth_tile_image(6, 2)
    payload = encode_jpeg(img, restart=2)
    ref = decode_jpeg(payload)
    for marker in (b"\xff\xdb", b"\xff\xc4", b"\xff\xc0",
                   b"\xff\xdd", b"\xff\xda"):
        i = payload.find(marker)
        assert i > 0, f"fixture lacks {marker!r}"
        for n_fill in (1, 2, 3, 4):
            padded = payload[:i] + b"\xff" * n_fill + payload[i:]
            out = decode_jpeg(padded)
            assert np.array_equal(out, ref), (marker, n_fill)


def test_fill_bytes_before_eoi_classified_eoi_not_truncated():
    """ADVICE r13: a stream ending in spec-valid fill bytes
    immediately before EOI (… FF FF D9) with no scan must be reported
    as 'JPEG EOI before any scan' — the accurate structural error —
    not 'truncated' (the old skip-loop bound stopped one byte short
    and never read the EOI code). Both are refusals; the message and
    triage class must name the real reason."""
    import pytest

    stream = b"\xff\xd8" + b"\xff" * 2 + b"\xff\xd9"
    with pytest.raises(ValueError, match="EOI before any scan"):
        decode_jpeg(stream)
    assert classify_jpeg_decode(stream) == "malformed"
    # minimal EOI-before-scan without padding: same class
    with pytest.raises(ValueError, match="EOI before any scan"):
        decode_jpeg(b"\xff\xd8\xff\xd9")
    # genuinely cut-off stream still reports truncated
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(b"\xff\xd8\xff")
    assert classify_jpeg_decode(b"\xff\xd8\xff") == "truncated"
    # fill bytes running into end-of-stream (no marker code follows)
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(b"\xff\xd8" + b"\xff" * 5)


@settings(max_examples=200, deadline=None)
@given(data=st.binary(min_size=0, max_size=400), seed=st.integers(0, 2**31 - 1))
def test_property_classify_is_total_on_arbitrary_bytes(data, seed):
    """ADVICE r13: the triage boundary is TOTAL — classify_jpeg_decode
    returns one of the five routing classes on arbitrary bytes, raw
    fuzz and doctored-valid-stream fuzz alike, and never raises (a
    wild payload crashing the audit stage would take the whole ingest
    job down, contrary to the counted-and-routed stance)."""
    classes = {"ok", "unsupported_mode", "truncated", "not_jpeg", "malformed"}
    assert classify_jpeg_decode(bytes(data)) in classes
    # splice fuzz bytes into a valid stream: exercises deep decoder
    # paths (segment walk, huffman, scan) rather than the magic check
    rng = np.random.RandomState(seed)
    img = synth_tile_image(2, 2)
    payload = bytearray(encode_jpeg(img))
    pos = int(rng.randint(2, len(payload)))
    spliced = bytes(payload[:pos]) + bytes(data) + bytes(payload[pos:])
    assert classify_jpeg_decode(spliced) in classes
