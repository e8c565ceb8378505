"""Audio modality (operators/audio.py): the RIFF/WAVE codec is REAL —
round-trip sample fidelity, loud rejection of undecodable payloads,
and the closed-form oracle differentials for the registered queries."""

from __future__ import annotations

import numpy as np
import pytest
from conftest import SF_CORRECTNESS, assert_oracle_match
from pyspark.sql import functions as F

from map_reduce_library_spark.operators.audio import (
    FRAME_SAMPLES,
    SAMPLE_RATE,
    _synth_samples,
    decode_wav,
    synth_wav_bytes,
    wav_frame_energy,
    wav_features,
    with_wav_payload,
)


def test_wav_roundtrip_is_sample_exact():
    """Container write → parse must return the EXACT int16 samples —
    byte fidelity, not shape fidelity (a truncated data chunk or an
    off-by-one header would shift every downstream feature)."""
    for doc_id, n_chars in [(0, 0), (7, 123), (29, 456), (123456, 9)]:
        want = _synth_samples(doc_id, n_chars)
        sr, ch, got = decode_wav(synth_wav_bytes(doc_id, n_chars))
        assert (sr, ch) == (SAMPLE_RATE, 1)
        assert got.dtype == np.dtype("<i2")
        assert np.array_equal(got, want)


def test_wav_rejects_undecodable_payloads():
    """Non-RIFF magic and truncated containers must raise ValueError
    loudly (imaging.decode_netpbm discipline) — garbage samples would
    silently poison every feature."""
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"\xff\xd8\xff\xe0 not audio")
    with pytest.raises(ValueError):
        decode_wav(synth_wav_bytes(1, 50)[:20])  # truncated header


def test_wav_rejects_zero_rate_fmt_chunk():
    """A crafted fmt chunk declaring framerate 0 must raise the
    module's loud ValueError, not surface later as ZeroDivisionError
    inside wav_features' duration math (ADVICE r10). The stdlib wave
    READER trusts the chunk verbatim, so the payload is forged by
    patching the little-endian sample-rate field (byte offset 24 of a
    canonical 44-byte RIFF header) of a valid container."""
    payload = bytearray(synth_wav_bytes(1, 50))
    payload[24:28] = (0).to_bytes(4, "little")  # nSamplesPerSec := 0
    with pytest.raises(ValueError, match="framerate"):
        decode_wav(bytes(payload))


def test_wav_signal_is_frame_and_half_aligned():
    """The synthesis contract the oracles lean on: length is a
    multiple of 80 (so 5 ms frames never straddle the amplitude
    boundary), first half peaks at A, second at exactly 2A."""
    x = _synth_samples(3, 1)  # A = 2000, n = 160
    assert x.size % (2 * FRAME_SAMPLES) == 0
    half = x.size // 2
    assert int(np.abs(x[:half].astype(np.int64)).max()) == 2000
    assert int(np.abs(x[half:].astype(np.int64)).max()) == 4000


def test_wav_features_matches_oracle(spark):
    assert_oracle_match(spark, "wav_audio_features")


def test_wav_frame_energy_matches_oracle(spark):
    assert_oracle_match(spark, "wav_frame_energy")


def test_frame_energies_are_bimodal_and_ordered(spark):
    """End-to-end through the Arrow stages at sf0.01: every document's
    frames split exactly half low-energy (20A²) / half high-energy
    (80A² = 4×), in index order — framing alignment, not just totals."""
    docs = spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet")
    frames = wav_frame_energy(with_wav_payload(docs)).collect()
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append((r.frame_idx, r.energy))
    amps = {
        r.doc_id: 500 + (r.doc_id % 30) * 500
        for r in docs.select("doc_id").collect()
    }
    for doc_id, fr in by_doc.items():
        fr.sort()
        a = amps[doc_id]
        half = len(fr) // 2
        assert all(e == 20 * a * a for _i, e in fr[:half])
        assert all(e == 80 * a * a for _i, e in fr[half:])


def _stereo_wav_bytes(seconds_frames: int = 8000) -> bytes:
    """A stereo PCM16 WAV: `seconds_frames` frames at 8 kHz (1.0 s for
    the default), constant L=1000 / R=-1000."""
    import io
    import wave as _wave

    frames = np.zeros((seconds_frames, 2), dtype=np.int16)
    frames[:, 0], frames[:, 1] = 1000, -1000
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(SAMPLE_RATE)
        w.writeframes(frames.tobytes())
    return buf.getvalue()


def test_stereo_duration_is_wall_clock_and_framing_refuses(spark):
    """code-review r10: duration must count FRAMES (per-channel
    samples), not the interleaved stream — a 1-second stereo file is
    one second, not two; and frame energies over interleaved channels
    would mix L/R, so the framing stage refuses non-mono loudly."""
    payload = _stereo_wav_bytes(8000)  # 1.0 s, 16000 interleaved
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id bigint, payload binary"
    )
    row = wav_features(df).collect()[0]
    assert row.channels == 2
    assert row.n_samples == 16000  # interleaved count, documented
    assert row.duration_sec == 1.0  # wall-clock, not 2.0
    assert row.peak == 1000

    with pytest.raises(Exception, match="mono"):
        wav_frame_energy(df).collect()


def test_wav_pipeline_has_no_row_python(spark):
    """The audio stages must be Arrow-batched (ArrowEvalPython /
    MapInPandas), never row-at-a-time BatchEvalPython."""
    docs = spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet")
    plan = (
        wav_features(with_wav_payload(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
