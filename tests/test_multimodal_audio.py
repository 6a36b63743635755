"""Real WAV PCM decode (multimodal/audio.py): known-signal physics
checks — the decode is NOT a stub, so the assertions are about the
actual signal content, not plumbing shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from server_spark.multimodal.audio import (
    ENVELOPE_FRAMES,
    decode_wav_features,
    synthetic_wav,
)


def _media_df(spark, blobs):
    return spark.createDataFrame(
        [(i, b) for i, b in enumerate(blobs)],
        "media_id long, content binary",
    )


def test_sine_features_match_physics(spark):
    rate, f, amp, secs = 8000, 440.0, 0.5, 0.25
    df = _media_df(
        spark, [synthetic_wav(0, secs, rate, freq=f, amplitude=amp)]
    )
    row = decode_wav_features(df).collect()[0]
    assert row["ok"] and row["sample_rate"] == rate
    assert row["n_channels"] == 1
    assert row["n_samples"] == int(secs * rate)
    assert row["duration_s"] == pytest.approx(secs, abs=1e-9)
    # RMS of a sine = A/sqrt(2); peak = A (int16 quantization ~1e-4)
    assert row["rms"] == pytest.approx(amp / math.sqrt(2), abs=1e-3)
    assert row["peak"] == pytest.approx(amp, abs=1e-3)
    # a sine crosses zero 2f times per second → zcr ≈ 2f/rate
    assert row["zcr"] == pytest.approx(2 * f / rate, rel=0.02)
    # constant-amplitude tone → flat envelope at the global rms
    assert len(row["envelope"]) == ENVELOPE_FRAMES
    for e in row["envelope"]:
        assert e == pytest.approx(row["rms"], rel=0.02)


def test_stereo_downmix_and_garbage_quarantine(spark):
    good = synthetic_wav(1, 0.1, 16000, freq=880.0, channels=2)
    garbage = b"RIFFxxxxWAVEnot-a-real-chunk-walk"
    truncated = good[:30]
    df = _media_df(spark, [good, garbage, truncated, None])
    rows = {r["media_id"]: r for r in decode_wav_features(df).collect()}
    assert rows[0]["ok"] and rows[0]["n_channels"] == 2
    assert rows[0]["sample_rate"] == 16000
    # identical channels downmix to the same sine
    assert rows[0]["rms"] == pytest.approx(0.5 / math.sqrt(2), abs=1e-3)
    for bad in (1, 2, 3):
        assert rows[bad]["ok"] is False
        assert rows[bad]["rms"] is None


def test_silence_detector_envelope(spark):
    """Half tone, half silence → first half of the envelope hot, the
    second half ~0 (the trim/silence gate a speech pipeline applies)."""
    import numpy as np

    rate = 8000
    tone = synthetic_wav(0, 0.2, rate, freq=330.0)
    # append pure silence: extend the data chunk with zeros
    n_extra = int(0.2 * rate) * 2
    body = tone[44:] + b"\x00" * n_extra
    header = bytearray(tone[:44])
    header[4:8] = (36 + len(body)).to_bytes(4, "little")
    header[40:44] = len(body).to_bytes(4, "little")
    df = _media_df(spark, [bytes(header) + body])
    row = decode_wav_features(df).collect()[0]
    env = row["envelope"]
    assert np.mean(env[: ENVELOPE_FRAMES // 2]) > 0.2
    assert np.mean(env[ENVELOPE_FRAMES // 2 :]) < 0.01


def test_distributed_over_many_clips(spark):
    """The decode scales as a narrow mapInPandas over partitions —
    64 clips with id-keyed frequencies all decode to their own zcr."""
    blobs = [synthetic_wav(i, 0.05, 8000) for i in range(64)]
    df = _media_df(spark, blobs).repartition(8)
    rows = decode_wav_features(df).collect()
    assert len(rows) == 64 and all(r["ok"] for r in rows)
    for r in rows:
        f = 220.0 * (1 + r["media_id"] % 5)
        assert r["zcr"] == pytest.approx(2 * f / 8000, rel=0.05)


def test_sql_composability(spark):
    """Feature output is a plain DataFrame: quality gates compose as
    ordinary filters (the x18 pattern over audio)."""
    blobs = [synthetic_wav(i, 0.05, 8000, amplitude=0.5) for i in range(4)]
    blobs.append(b"not audio at all")
    df = _media_df(spark, blobs)
    kept = (
        decode_wav_features(df)
        .filter(F.col("ok") & (F.col("rms") > 0.1))
        .count()
    )
    assert kept == 4


def test_truncated_wav_quarantines():
    """r11 review finding: a data chunk whose declared size overruns
    the payload (a truncated upload) must return None, not ok=True
    with roughly half the real duration."""
    from server_spark.multimodal.audio import parse_pcm16, synthetic_wav

    full = synthetic_wav(1, seconds=0.1)
    assert parse_pcm16(full) is not None
    cut = full[: len(full) // 2]
    assert parse_pcm16(cut) is None
