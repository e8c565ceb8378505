"""Baseline-sequential JPEG (ITU-T T.81) codec — pure numpy + stdlib,
no libjpeg/PIL required.

Closes the LAST decode stub in the multimodal family (VERDICT r11
"What's missing" #1): ``operators/imaging.py`` shipped real netpbm and
PNG codecs in earlier rounds; JPEG (DCT + Huffman) is ~the same amount
of from-spec work, so it gets the same treatment — a complete baseline
encoder/decoder written from the public T.81 spec (marker walk, DQT /
DHT / SOF0 / DRI / SOS parsing, entropy decode with byte-unstuffing
and restart markers, dequant + dezigzag, vectorized float IDCT, chroma
upsampling, YCbCr→RGB), with every malformed-input path surfacing as a
loud ``ValueError`` (the decode_netpbm/decode_png discipline: garbage
pixels silently poisoning downstream features is the one failure mode
this family refuses).

Supported profile (= what the encoder below emits, plus the common
wild shapes): baseline sequential DCT (SOF0), 8-bit samples, 1
component (grayscale) or 3 components (YCbCr) with luma sampling
factors 1×1 / 2×1 / 1×2 / 2×2 and 1×1 chroma (4:4:4, 4:2:2, 4:4:0,
4:2:0), optional restart intervals. Progressive (SOF2), arithmetic
coding, 12-bit, and CMYK raise ``ValueError`` naming the feature — at
ingest scale an unsupported container must be quarantined loudly, not
half-decoded.

EXACTNESS CONTRACT (what makes a LOSSY codec oracle-able, the
``png_image_stats`` discipline): the 2-D DCT of a CONSTANT 8×8 block
is DC-only with DC = 8·v exactly (AC terms cancel; float error
~1e-13 « the 0.5 rounding guard), so with a DC quant step of 8 the
quantized DC is exactly v and the IDCT returns exactly v in every
pixel. Gray-valued pixels (R=G=B=v) additionally make the color
transform exact: Y=v, Cb=Cr=128 analytically. An image tiled from
constant 16×16 gray-valued tiles therefore round-trips BIT-EXACTLY
through the full machinery — FDCT, quantization, Huffman entropy
coding, byte stuffing, 4:2:0 subsampling, upsampling, YCbCr→RGB —
and a SQL oracle can recompute the decoded pixels from the tile
formula. ``synth_tile_image``/``with_jpeg_payload``/``jpeg_stats``
package exactly that differential for ``jpeg_image_stats``.

At 100 TB the shape is the multimodal.py contract: payloads stay
columnar in Arrow batches on executors, the driver never sees bytes,
per-task memory is bounded by batch size × image size.

Reference: the reference engine (IdoSagiv/map-reduce-library,
FileWordCounter.cpp) reads text only — SURVEY.md §2D multimodal
extension.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

# guard against crafted SOF dimensions re-authorizing the allocation
# the cap exists to refuse (the PNG_MAX_PIXELS rationale)
JPEG_MAX_PIXELS = 64_000_000

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# T.81 Annex K.1 quantization tables, DC entry replaced by 8: AC steps
# only ever divide zeros on the constant-tile fixtures (any value
# works; keeping the spec's own numbers keeps arbitrary-image encodes
# realistic), while DC=8 divides the constant-block DC (8·v) exactly —
# the exactness contract in the module doc.
Q_LUMA = np.array(
    [
        8, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
Q_CHROMA = np.array(
    [
        8, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# T.81 Annex K.3 typical Huffman tables (BITS, HUFFVAL). The decoder
# always builds its tables from the stream's own DHT segments; these
# constants are what the encoder writes.
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """The 8×8 DCT-II basis with T.81's scaling: FDCT = M·X·Mᵀ,
    IDCT = Mᵀ·C·M. Constant block v → C[0,0] = 8·v exactly."""
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[0, :] *= 1 / np.sqrt(2)
    return m


_M = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple]:
    """value → (code, length) per T.81 Annex C code generation."""
    out: dict[int, tuple] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return out


def _canonical_decoder(bits: list[int], vals: list[int]) -> dict:
    """(length, code) → value — the decode-side view of the same
    canonical assignment."""
    lut: dict = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            if k >= len(vals):
                raise ValueError("JPEG DHT: BITS counts exceed HUFFVAL")
            lut[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return lut


# ---- encoder -----------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.put(0x7F, 8 - self.n)  # pad with 1-bits
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended bits) for a DC diff / AC coefficient."""
    t = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << t) - 1
    return t, bits


def _encode_block(
    w: _BitWriter, coeffs: np.ndarray, pred: int, dc_tab: dict, ac_tab: dict
) -> int:
    zz = coeffs[_ZIGZAG]
    dc = int(zz[0])
    t, bits = _magnitude(dc - pred)
    code, ln = dc_tab[t]
    w.put(code, ln)
    if t:
        w.put(bits, t)
    run = 0
    last = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            w.put(code, ln)
            run -= 16
        t, bits = _magnitude(v)
        code, ln = ac_tab[(run << 4) | t]
        w.put(code, ln)
        w.put(bits, t)
        run = 0
    if last < 63:
        code, ln = ac_tab[0x00]  # EOB
        w.put(code, ln)
    return dc


def _pad_to(a: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate to multiples of (mh, mw) — the standard encoder
    padding; replicated samples keep edge blocks low-frequency."""
    ph = (-a.shape[0]) % mh
    pw = (-a.shape[1]) % mw
    if ph or pw:
        a = np.pad(a, ((0, ph), (0, pw)), mode="edge")
    return a


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def encode_jpeg(
    arr: np.ndarray,
    subsampling: str = "420",
    q_luma: np.ndarray = Q_LUMA,
    q_chroma: np.ndarray = Q_CHROMA,
    restart: int = 0,
) -> bytes:
    """(H, W) uint8 → baseline grayscale JPEG; (H, W, 3) uint8 RGB →
    baseline YCbCr JPEG at 4:4:4 or 4:2:0, with optional restart
    intervals (``restart`` MCUs per segment — exercises the decoder's
    RSTn/predictor-reset path). Real FDCT + quantization + canonical
    Huffman with the Annex K tables — a general (lossy) encoder; see
    the module doc for the constant-tile inputs it round-trips
    exactly."""
    a = np.asarray(arr)
    if a.dtype != np.uint8 or a.ndim not in (2, 3):
        raise ValueError(f"expected uint8 (H,W) or (H,W,3), got {a.shape}")
    gray = a.ndim == 2
    if not gray and a.shape[2] != 3:
        raise ValueError(f"expected 3 channels, got {a.shape[2]}")
    if subsampling not in ("444", "422", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    h_img, w_img = a.shape[0], a.shape[1]
    # luma sampling factors (h, v): 4:4:4 = 1×1, 4:2:2 = 2×1 (chroma
    # halved horizontally), 4:2:0 = 2×2 (halved both ways)
    sh_l, sv_l = {
        "444": (1, 1),
        "422": (2, 1),
        "420": (2, 2),
    }[subsampling if not gray else "444"]

    if gray:
        planes = [a.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        rgb = a.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if sh_l > 1 or sv_l > 1:
            cb = _pad_to(cb, sv_l, sh_l)
            cr = _pad_to(cr, sv_l, sh_l)
            shp = (cb.shape[0] // sv_l, sv_l, cb.shape[1] // sh_l, sh_l)
            cb = cb.reshape(shp).mean(axis=(1, 3))
            cr = cr.reshape(shp).mean(axis=(1, 3))
        planes = [y, cb, cr]
        samp = [(sh_l, sv_l), (1, 1), (1, 1)]
        qsel = [0, 1, 1]

    qtabs = [np.asarray(q_luma, np.int64), np.asarray(q_chroma, np.int64)]
    max_h = max(s[0] for s in samp)
    max_v = max(s[1] for s in samp)
    mcu_w, mcu_h = 8 * max_h, 8 * max_v
    mcus_x = -(-w_img // mcu_w)
    mcus_y = -(-h_img // mcu_h)
    padded = [
        _pad_to(p, 8 * mcus_y * sv, 8 * mcus_x * sh)
        for p, (sh, sv) in zip(planes, samp)
    ]

    dc_tabs = [
        _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
        _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS),
    ]
    ac_tabs = [
        _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
        _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ]
    scan_parts: list[bytes] = []
    w = _BitWriter()
    preds = [0] * len(planes)
    mcu_no = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_no and mcu_no % restart == 0:
                scan_parts.append(w.flush())
                scan_parts.append(
                    bytes([0xFF, 0xD0 + ((mcu_no // restart - 1) % 8)])
                )
                w = _BitWriter()
                preds = [0] * len(planes)
            mcu_no += 1
            for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
                q = qtabs[qsel[ci]].reshape(8, 8)
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        blk = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        coef = _M @ blk @ _M.T
                        qc = np.round(coef / q).astype(np.int64)
                        preds[ci] = _encode_block(
                            w,
                            qc.ravel(),
                            preds[ci],
                            dc_tabs[qsel[ci]],
                            ac_tabs[qsel[ci]],
                        )
    scan_parts.append(w.flush())
    scan = b"".join(scan_parts)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + b"\x00\x01\x00\x01" + b"\x00\x00"
    )
    zz_q0 = qtabs[0][_ZIGZAG]
    out += _seg(0xDB, b"\x00" + bytes(int(v) for v in zz_q0))
    if not gray:
        zz_q1 = qtabs[1][_ZIGZAG]
        out += _seg(0xDB, b"\x01" + bytes(int(v) for v in zz_q1))
    ncomp = len(planes)
    sof = bytearray([8]) + h_img.to_bytes(2, "big") + w_img.to_bytes(2, "big")
    sof.append(ncomp)
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, qsel[ci]])
    out += _seg(0xC0, bytes(sof))
    out += _seg(
        0xC4, b"\x00" + bytes(_DC_LUMA_BITS) + bytes(_DC_LUMA_VALS)
    )
    out += _seg(
        0xC4, b"\x10" + bytes(_AC_LUMA_BITS) + bytes(_AC_LUMA_VALS)
    )
    if not gray:
        out += _seg(
            0xC4, b"\x01" + bytes(_DC_CHROMA_BITS) + bytes(_DC_CHROMA_VALS)
        )
        out += _seg(
            0xC4, b"\x11" + bytes(_AC_CHROMA_BITS) + bytes(_AC_CHROMA_VALS)
        )
    if restart:
        out += _seg(0xDD, restart.to_bytes(2, "big"))
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        td_ta = (qsel[ci] << 4) | qsel[ci]
        sos += bytes([ci + 1, td_ta])
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, bytes(sos))
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---- decoder -----------------------------------------------------------------


class _Bits:
    """Bit reader over an unstuffed entropy segment."""

    __slots__ = ("d", "i", "n")

    def __init__(self, data: bytes) -> None:
        self.d = data
        self.i = 0  # bit cursor
        self.n = len(data) * 8

    def read(self, k: int) -> int:
        if self.i + k > self.n:
            raise ValueError("JPEG entropy segment exhausted mid-symbol")
        out = 0
        i = self.i
        d = self.d
        for _ in range(k):
            out = (out << 1) | ((d[i >> 3] >> (7 - (i & 7))) & 1)
            i += 1
        self.i = i
        return out

    def huff(self, lut: dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read(1)
            v = lut.get((ln, code))
            if v is not None:
                return v
        raise ValueError("JPEG Huffman decode: no code within 16 bits")


def _extend(v: int, t: int) -> int:
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _split_entropy(payload: bytes, i: int) -> tuple[list[bytes], int]:
    """Unstuff FF00 and split the scan at RSTn markers; stop at the
    first real marker (EOI or the next segment)."""
    segs: list[bytearray] = [bytearray()]
    n = len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            segs[-1].append(b)
            i += 1
            continue
        if i + 1 >= n:
            raise ValueError("JPEG truncated inside entropy-coded data")
        m = payload[i + 1]
        if m == 0x00:
            segs[-1].append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:
            segs.append(bytearray())
            i += 2
        else:
            return [bytes(s) for s in segs], i
    raise ValueError("JPEG entropy stream ran off the end (no EOI)")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG → (H, W) uint8 grayscale or (H, W, 3) uint8 RGB.
    Full from-spec path: marker walk, stream-defined quant + Huffman
    tables, restart intervals, interleaved MCU entropy decode,
    dequant + dezigzag, vectorized IDCT, chroma upsampling by sample
    replication, YCbCr→RGB. Every malformed input raises ValueError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError(f"not a JPEG payload (magic {payload[:2]!r})")
    qtabs: dict[int, np.ndarray] = {}
    hufts: dict[tuple, dict] = {}
    frame = None
    restart = 0
    i = 2
    n = len(payload)
    while True:
        if i + 2 > n:
            raise ValueError("truncated JPEG: no SOS/EOI")
        if payload[i] != 0xFF:
            raise ValueError(f"JPEG marker expected at byte {i}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
        # marker code — skip them or the fill is misread as the code.
        # Bound is i + 1 < n (ADVICE r13): stopping at i + 2 < n made
        # a stream ending in fill bytes before EOI (… FF FF D9) exit
        # early and report 'truncated' instead of the accurate
        # EOI-before-scan. The marker code itself is read before the
        # 2-byte-length bound so markers WITHOUT a length field (EOI)
        # are still classified at end-of-stream.
        while i + 1 < n and payload[i + 1] == 0xFF:
            i += 1
        if i + 2 > n:
            raise ValueError("truncated JPEG: no SOS/EOI")
        m = payload[i + 1]
        if m == 0xD9:
            raise ValueError("JPEG EOI before any scan")
        if i + 4 > n:
            raise ValueError("truncated JPEG: no SOS/EOI")
        if m in (0xC2, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG frame type SOF{m - 0xC0} (only "
                "baseline sequential SOF0 is supported); transcode at "
                "ingest"
            )
        ln = int.from_bytes(payload[i + 2 : i + 4], "big")
        if ln < 2 or i + 2 + ln > n:
            raise ValueError(f"truncated JPEG segment 0xFF{m:02X}")
        body = payload[i + 4 : i + 2 + ln]
        i += 2 + ln
        if m == 0xDB:  # DQT (possibly several tables per segment)
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 15
                if pq != 0:
                    raise ValueError("only 8-bit JPEG quant tables supported")
                if j + 65 > len(body):
                    raise ValueError("truncated JPEG DQT")
                zz = np.frombuffer(body, np.uint8, 64, j + 1).astype(np.int64)
                tab = np.zeros(64, np.int64)
                tab[_ZIGZAG] = zz
                qtabs[tq] = tab
                j += 65
        elif m == 0xC4:  # DHT
            j = 0
            while j + 17 <= len(body):
                tc, th = body[j] >> 4, body[j] & 15
                bits = list(body[j + 1 : j + 17])
                cnt = sum(bits)
                vals = list(body[j + 17 : j + 17 + cnt])
                if len(vals) < cnt:
                    raise ValueError("truncated JPEG DHT")
                hufts[(tc, th)] = _canonical_decoder(bits, vals)
                j += 17 + cnt
        elif m == 0xC0:  # SOF0
            if len(body) < 6:
                raise ValueError("truncated JPEG SOF0")
            prec = body[0]
            if prec != 8:
                raise ValueError(f"only 8-bit JPEG supported (got {prec})")
            h_img = int.from_bytes(body[1:3], "big")
            w_img = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            if h_img <= 0 or w_img <= 0:
                raise ValueError(f"invalid JPEG dimensions {w_img}x{h_img}")
            if h_img * w_img > JPEG_MAX_PIXELS:
                raise ValueError(
                    f"JPEG declares {w_img}x{h_img} pixels, over the "
                    f"{JPEG_MAX_PIXELS} decode cap (JPEG_MAX_PIXELS)"
                )
            if ncomp not in (1, 3):
                raise ValueError(
                    f"unsupported JPEG component count {ncomp} (CMYK "
                    "and multi-plane need transcoding at ingest)"
                )
            if len(body) < 6 + 3 * ncomp:
                raise ValueError("truncated JPEG SOF0 components")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                sh, sv = hv >> 4, hv & 15
                if sh not in (1, 2) or sv not in (1, 2):
                    raise ValueError(
                        f"unsupported sampling {sh}x{sv} for component "
                        f"{cid} (1 or 2 only)"
                    )
                comps.append({"id": cid, "h": sh, "v": sv, "tq": tq})
            if ncomp == 3 and any(
                c["h"] != 1 or c["v"] != 1 for c in comps[1:]
            ):
                raise ValueError("chroma sampling factors must be 1x1")
            frame = (h_img, w_img, comps)
        elif m == 0xDD:  # DRI
            if len(body) != 2:
                raise ValueError("bad JPEG DRI length")
            restart = int.from_bytes(body, "big")
        elif m == 0xDA:  # SOS
            break
        # APPn / COM / others: skipped
    if frame is None:
        raise ValueError("JPEG SOS before SOF0")
    h_img, w_img, comps = frame

    ns = body[0]
    if ns != len(comps) or len(body) < 1 + 2 * ns + 3:
        raise ValueError("JPEG SOS must cover all frame components")
    sel = {}
    for c in range(ns):
        cs, tdta = body[1 + 2 * c : 3 + 2 * c]
        sel[cs] = (tdta >> 4, tdta & 15)
    for comp in comps:
        if comp["id"] not in sel:
            raise ValueError(f"JPEG SOS missing component {comp['id']}")
        comp["td"], comp["ta"] = sel[comp["id"]]
        if comp["tq"] not in qtabs:
            raise ValueError(f"JPEG quant table {comp['tq']} undefined")
        for tc, th in ((0, comp["td"]), (1, comp["ta"])):
            if (tc, th) not in hufts:
                raise ValueError(f"JPEG Huffman table ({tc},{th}) undefined")

    # the scan-end offset is unused: end-of-stream integrity is
    # enforced by the leftover-bits / surplus-segment checks after the
    # MCU loop, not by inspecting what follows the scan
    segs, _ = _split_entropy(payload, i)
    if len(comps) == 1:
        # T.81 A.2: a single-component scan is NON-interleaved — the
        # "MCU" is one 8×8 data unit and units cover ceil(w/8) ×
        # ceil(h/8) in raster order, whatever sampling factors the
        # SOF declared (they only scale components against each
        # other, and there is nothing to scale against). Treating
        # such a scan as interleaved places blocks in MCU order —
        # transposed positions, silently scrambled pixels for
        # spec-valid grayscale files declaring 2×1/1×2/2×2
        # (code-review r12).
        comps[0]["h"] = comps[0]["v"] = 1
    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    mcus_x = -(-w_img // (8 * max_h))
    mcus_y = -(-h_img // (8 * max_v))
    n_mcus = mcus_x * mcus_y
    per_mcu = [c["h"] * c["v"] for c in comps]
    coefs = [
        np.zeros((n_mcus * k, 64), np.int64) for k in per_mcu
    ]

    mcu = 0
    seg_idx = 0
    bits = _Bits(segs[0])
    preds = [0] * len(comps)
    while mcu < n_mcus:
        if restart and mcu and mcu % restart == 0:
            # the outgoing segment may only carry byte-alignment
            # padding; whole extra bytes before its RSTn marker are
            # garbage the loud-ValueError contract must not swallow
            # (ADVICE r12: this check used to run only on the final
            # segment)
            if bits.n - bits.i >= 8:
                raise ValueError(
                    f"JPEG trailing garbage before restart marker "
                    f"({(bits.n - bits.i) // 8} extra bytes in entropy "
                    f"segment {seg_idx})"
                )
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("JPEG missing expected restart marker")
            bits = _Bits(segs[seg_idx])
            preds = [0] * len(comps)
        for ci, comp in enumerate(comps):
            dc_lut = hufts[(0, comp["td"])]
            ac_lut = hufts[(1, comp["ta"])]
            for b in range(per_mcu[ci]):
                row = coefs[ci][mcu * per_mcu[ci] + b]
                t = bits.huff(dc_lut)
                if t > 11:
                    raise ValueError("JPEG DC category out of range")
                diff = _extend(bits.read(t), t) if t else 0
                preds[ci] += diff
                row[0] = preds[ci]
                k = 1
                while k < 64:
                    rs = bits.huff(ac_lut)
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        # k == 64 exactly fills the block (16 zeros to
                        # coefficient 63 — accepted, as libjpeg does);
                        # past that the run overflows the block
                        if k > 64:
                            raise ValueError(
                                "JPEG ZRL run past block end"
                            )
                        continue
                    k += rs >> 4
                    s = rs & 15
                    if k > 63:
                        raise ValueError("JPEG AC index past block end")
                    row[k] = _extend(bits.read(s), s)
                    k += 1
        mcu += 1

    # after the last MCU, only byte-alignment padding may remain in
    # the final entropy segment, and no extra restart segments may
    # follow. (The previous guard here — `payload[i] != 0xFF` — was
    # unreachable: _split_entropy only ever returns pointing at a
    # marker, so trailing garbage was consumed as entropy bytes and
    # silently ignored, dodging the loud-ValueError contract;
    # code-review r12.)
    if seg_idx != len(segs) - 1:
        raise ValueError(
            "JPEG scan carries more restart segments than its MCUs need"
        )
    if bits.n - bits.i >= 8:
        raise ValueError(
            f"JPEG trailing garbage after the last MCU "
            f"({(bits.n - bits.i) // 8} extra bytes in the entropy segment)"
        )

    planes = []
    for ci, comp in enumerate(comps):
        q = qtabs[comp["tq"]]
        dezz = np.zeros_like(coefs[ci])
        dezz[:, _ZIGZAG] = coefs[ci]
        c = (dezz * q[None, :]).astype(np.float64).reshape(-1, 8, 8)
        # vectorized IDCT over every block of the component at once
        px = np.matmul(_M.T, np.matmul(c, _M)) + 128.0
        px = np.clip(np.round(px), 0, 255).astype(np.uint8)
        bw = mcus_x * comp["h"]  # blocks per row
        k = per_mcu[ci]
        px = px.reshape(mcus_y, mcus_x, comp["v"], comp["h"], 8, 8)
        plane = px.transpose(0, 2, 4, 1, 3, 5).reshape(
            mcus_y * comp["v"] * 8, bw * 8
        )
        ry, rx = max_v // comp["v"], max_h // comp["h"]
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        planes.append(plane[:h_img, :w_img])

    if len(planes) == 1:
        return planes[0]
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---- the oracle-able differential fixture (png_image_stats pattern) ---------

TILE = 16
JPEG_IMG_W = 32


def synth_tile_image(doc_id: int, n_chars: int) -> np.ndarray:
    """Deterministic constant-tile image: h = 16 + (n_chars % 3)·16,
    w = 32, gray-valued truecolor for even doc_ids (all 3 channels
    equal — the YCbCr-exact shape), grayscale for odd. Tile value
    t(ty, tx) = (doc_id·7 + 3·ty + 5·tx) % 256 over 16×16 tiles —
    the exactness contract in the module doc makes the JPEG
    round-trip bit-exact, so a SQL oracle recomputes the decoded
    pixels from this formula."""
    h = TILE + (n_chars % 3) * TILE
    ty, tx = np.meshgrid(
        np.arange(h) // TILE, np.arange(JPEG_IMG_W) // TILE, indexing="ij"
    )
    a = ((doc_id * 7 + 3 * ty + 5 * tx) % 256).astype(np.uint8)
    if doc_id % 2 == 0:
        return np.repeat(a[:, :, None], 3, axis=2)
    return a


def with_jpeg_payload(
    df: DataFrame, id_col: str = "doc_id", len_col: str = "n_chars"
) -> DataFrame:
    """(id, payload binary, n_bytes): the canonical multimodal row
    layout holding REAL baseline-JPEG bytes of the synthetic tiled
    image (4:2:0 for the truecolor rows — the full subsample +
    upsample + color-transform machinery is on the differential
    path). One Arrow-batched pass; payload bytes never touch the
    driver. The projection is two tiny columns behind a few-file scan
    while the codec is CPU-bound Python, so repartition to the
    session's core count — a ~KB shuffle that spreads the encode over
    every worker instead of inheriting the scan's file-granular
    parallelism (same rule at cluster scale: size compute-bound
    Python stages by cores, not by input files)."""
    src = df.select(id_col, len_col).repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [
                encode_jpeg(synth_tile_image(int(d), int(n)))
                for d, n in zip(pdf[id_col], pdf[len_col])
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return src.mapInPandas(
        batches, schema=f"{id_col} bigint, payload binary, n_bytes bigint"
    )


JPEG_STATS_SCHEMA = (
    "doc_id bigint, height int, width int, channels int, "
    "pixel_sum bigint, mean_px double"
)


def _decoded_stats(binary_df: DataFrame, transform, id_col: str) -> DataFrame:
    """Shared decode→(transform)→exact-stats Arrow stage — one body
    for jpeg_stats and jpeg_thumbnail_stats so the exact-int
    arithmetic and the output schema can't drift apart (code-review
    r12)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for d, payload in zip(pdf[id_col], pdf["payload"]):
                a = transform(decode_jpeg(bytes(payload)))
                c = 1 if a.ndim == 2 else a.shape[2]
                s = int(a.astype(np.int64).sum())
                rows.append(
                    (int(d), a.shape[0], a.shape[1], c, s, s / float(a.size))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "height", "width", "channels",
                    "pixel_sum", "mean_px",
                ],
            )

    return binary_df.mapInPandas(batches, schema=JPEG_STATS_SCHEMA)


def jpeg_thumbnail_stats(
    binary_df: DataFrame, factor: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """The REAL thumbnail pipeline end-to-end: decode the JPEG
    payload, box-filter downsample by ``factor`` (``imaging.
    box_resize`` — mean over factor×factor blocks), and emit exact
    pixel stats of the THUMB. On the constant-tile fixture the box
    mean of a constant region is the same constant, so the thumb's
    stats are closed-form: dims halve, per-tile values unchanged —
    the SQL oracle needs only the tile formula. Replaces the
    strided-byte stand-in as the production resize shape (binary in,
    decode → resize → features, Arrow both ways, driver never sees
    pixels)."""
    from map_reduce_library_spark.operators.imaging import box_resize

    return _decoded_stats(
        binary_df, lambda a: box_resize(a, factor), id_col
    )


def jpeg_stats(binary_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode every JPEG payload and emit exact-integer pixel stats
    (the png_stats contract): pixel_sum is exact int64 over the
    DECODED pixels, mean_px one float division of exact ints —
    identical IEEE both engines."""
    return _decoded_stats(binary_df, lambda a: a, id_col)


# ---- ingest triage: mixed-corpus refusal accounting (VERDICT r12 #7) --------

JPEG_AUDIT_SCHEMA = "doc_id bigint, verdict string"


def classify_jpeg_decode(payload: bytes) -> str:
    """Attempt the real decode and return a stable triage class:
    ``ok`` | ``unsupported_mode`` (progressive/arithmetic/12-bit —
    spec-valid, deliberately refused: transcode at ingest) |
    ``truncated`` | ``not_jpeg`` | ``malformed`` (the loud-ValueError
    family). The class strings are the quarantine routing keys —
    at ingest scale an unsupported shape is counted and routed, never
    silently skipped (module doc, :22)."""
    try:
        decode_jpeg(payload)
        return "ok"
    except ValueError as e:
        m = str(e)
        if "not a JPEG payload" in m:
            return "not_jpeg"
        # every spec-valid-but-out-of-profile refusal the decoder
        # raises: frame type (progressive SOF2, arithmetic SOF9-11,
        # hierarchical), 12-bit samples, 16-bit quant tables, CMYK /
        # multi-plane component counts, exotic sampling factors
        # (code-review r13: the first cut matched only the frame-type
        # message, misrouting 12-bit/CMYK to 'malformed')
        if (
            "unsupported JPEG frame type" in m
            or "only 8-bit JPEG" in m
            or "unsupported JPEG component count" in m
            or "unsupported sampling" in m
            or "chroma sampling factors" in m
        ):
            return "unsupported_mode"
        if "truncated" in m or "no EOI" in m or "ran off the end" in m:
            return "truncated"
        return "malformed"
    except MemoryError:
        raise  # resource exhaustion must stay loud, never quarantined
    except Exception:  # noqa: BLE001
        # The decoder is ValueError-total by contract (fuzz-pinned in
        # test_jpeg), but a genuinely wild payload finding an
        # unforeseen non-ValueError path must be counted-and-routed,
        # never crash the whole ingest stage (ADVICE r13).
        # KeyboardInterrupt/SystemExit are BaseException — untouched.
        return "malformed"


def jpeg_decode_audit(
    binary_df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Ingest-shape triage for a mixed JPEG corpus: one Arrow-batched
    pass attempting the real decode per payload, emitting
    ``(id, verdict)`` — the refusal-rate relation a 100-TB image
    ingest groups for its quarantine report. Same stage shape as
    ``jpeg_stats``: payload bytes never touch the driver; the
    CPU-bound Python stage is repartitioned to cores, not input
    files."""
    src = binary_df.select(id_col, "payload").repartition(
        binary_df.sparkSession.sparkContext.defaultParallelism
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "verdict": [
                        classify_jpeg_decode(bytes(p))
                        for p in pdf["payload"]
                    ],
                }
            )

    return src.mapInPandas(batches, schema=JPEG_AUDIT_SCHEMA)


def doctor_jpeg_payload(doc_id: int, payload: bytes) -> bytes:
    """Deterministic mixed-corpus fixture: derive a wild-shape variant
    from a valid baseline payload by doc_id class. ``doc_id % 10``:
    0 → SOF0 marker rewritten to SOF2 (progressive — spec-valid,
    refused by design); 1 → truncated to 20 bytes (always inside the
    fixed header layout, so the refusal class is deterministic);
    2 → PNG magic spliced over the SOI (not a JPEG at all); 3 → two
    0xFF fill bytes inserted before SOF0 (spec-valid padding, T.81
    B.1.1.2 — must still decode OK); else untouched. The header walk
    contains no 0xFF data bytes (Annex-K tables are all < 0xFF), so
    ``find(b"\\xff\\xc0")`` locates the real SOF0."""
    cls = doc_id % 10
    if cls == 0:
        i = payload.find(b"\xff\xc0")
        return payload[:i + 1] + b"\xc2" + payload[i + 2:]
    if cls == 1:
        return payload[:20]
    if cls == 2:
        return b"\x89PNG\r\n" + payload[6:]
    if cls == 3:
        i = payload.find(b"\xff\xc0")
        return payload[:i] + b"\xff\xff" + payload[i:]
    return payload


def with_doctored_jpeg_payload(
    df: DataFrame, id_col: str = "doc_id", len_col: str = "n_chars"
) -> DataFrame:
    """``with_jpeg_payload`` then the deterministic per-class
    doctoring — the mixed ingest fixture behind
    ``jpeg_ingest_refusal_rate``."""
    base = with_jpeg_payload(df, id_col, len_col)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [
                doctor_jpeg_payload(int(d), bytes(p))
                for d, p in zip(pdf[id_col], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return base.mapInPandas(
        batches, schema=f"{id_col} bigint, payload binary, n_bytes bigint"
    )
