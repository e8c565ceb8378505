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
