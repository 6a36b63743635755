"""REAL audio decode for multimodal columns (EXT).

Unlike pixel decode (needs libjpeg/PIL, absent here), PCM WAV decode
is pure stdlib + numpy: RIFF chunk walk for the header, frombuffer for
the samples. So the audio leg of the multimodal story is implemented
END-TO-END — real bytes in, real features out — with the same
mapInPandas contract the image stubs keep: Arrow batches in/out,
closure-local helpers (workers may not have server_spark importable),
bounded per-batch memory.

Features are the standard cheap audio-QA set a training-data pipeline
gates on before expensive transcription: duration, RMS loudness, peak
(clipping detector), zero-crossing rate (crude pitch/noisiness), and
a fixed-length RMS envelope (silence/trim detector).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

AUDIO_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("zcr", T.DoubleType()),
        T.StructField("envelope", T.ArrayType(T.DoubleType())),
    ]
)

ENVELOPE_FRAMES = 8


def parse_pcm16(b: bytes):
    """RIFF chunk walk (stdlib+numpy only): WAV bytes → (rate,
    channels, float64 samples in [-1, 1) shaped (n, channels)), or
    None for non-PCM16/compressed/truncated payloads — the quarantine
    signal. Module-level single implementation; executor closures
    materialize it from ``AUDIO_SRC`` (the image.py/binary.py
    source-capture pattern) so workers never import server_spark."""
    import numpy as np

    if b is None or len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = int.from_bytes(b[pos + 4 : pos + 8], "little")
        if pos + 8 + size > len(b):
            # declared chunk size overruns the payload: a TRUNCATED
            # upload. Slicing would silently clamp and report ok=True
            # with ~half the real duration (r11 review finding) —
            # quarantine instead, per the module contract.
            return None
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        return None
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 16 or channels < 1 or rate <= 0:
        return None  # only uncompressed PCM16 supported
    usable = len(data) - (len(data) % (2 * channels))
    if usable <= 0:
        return None
    x = np.frombuffer(data[:usable], dtype="<i2").astype(
        np.float64
    ) / 32768.0
    return rate, channels, x.reshape(-1, channels)


import inspect as _inspect  # noqa: E402

AUDIO_SRC = _inspect.getsource(parse_pcm16)


def decode_wav_features(media: DataFrame) -> DataFrame:
    """(media_id, content: binary) → decoded per-clip audio features.

    Real decode: 16-bit PCM WAV parsed with a RIFF chunk walk +
    numpy frombuffer. Non-PCM/With-compression/truncated payloads come
    back ok=false with null features (the quarantine row, never an
    exception — one poison blob must not fail a 100 TB scan task).
    """
    frames = ENVELOPE_FRAMES
    audio_src = AUDIO_SRC  # by value for the executor closure

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        ns: dict = {}
        exec(audio_src, ns)
        parse = ns["parse_pcm16"]

        def features(media_id, b):
            null = {
                "media_id": media_id, "ok": False, "sample_rate": None,
                "n_channels": None, "n_samples": None, "duration_s": None,
                "rms": None, "peak": None, "zcr": None, "envelope": None,
            }
            parsed = parse(b)
            if parsed is None:
                return null
            rate, channels, x = parsed
            mono = x.mean(axis=1)
            n = len(mono)
            rms = float(np.sqrt((mono * mono).mean()))
            peak = float(np.abs(mono).max())
            signs = np.signbit(mono)
            zcr = float((signs[1:] != signs[:-1]).mean()) if n > 1 else 0.0
            edges = np.linspace(0, n, frames + 1).astype(int)
            env = [
                float(np.sqrt((mono[a:b_] ** 2).mean())) if b_ > a else 0.0
                for a, b_ in zip(edges[:-1], edges[1:])
            ]
            return {
                "media_id": media_id,
                "ok": True,
                "sample_rate": rate,
                "n_channels": channels,
                "n_samples": n,
                "duration_s": n / rate,
                "rms": rms,
                "peak": peak,
                "zcr": zcr,
                "envelope": env,
            }

        for pdf in it:
            rows = [
                features(mid, content)
                for mid, content in zip(pdf["media_id"], pdf["content"])
            ]
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in AUDIO_FEATURES.fields],
            )

    return media.mapInPandas(batches, AUDIO_FEATURES)


def synthetic_wav(
    media_id: int,
    seconds: float = 0.25,
    rate: int = 8000,
    freq: float | None = None,
    channels: int = 1,
    amplitude: float = 0.5,
) -> bytes:
    """A deterministic PCM16 WAV blob (pure stdlib + numpy): a sine at
    ``freq`` (default keyed off media_id). Driver-side fixture
    generator for tests and the synthetic media table."""
    import numpy as np

    if freq is None:
        freq = 220.0 * (1 + media_id % 5)
    n = int(seconds * rate)
    t = np.arange(n) / rate
    mono = (amplitude * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    frames = np.repeat(mono[:, None], channels, axis=1).tobytes()
    byte_rate = rate * channels * 2
    header = (
        b"RIFF"
        + (36 + len(frames)).to_bytes(4, "little")
        + b"WAVE"
        + b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")          # PCM
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (channels * 2).to_bytes(2, "little")  # block align
        + (16).to_bytes(2, "little")         # bits per sample
        + b"data"
        + len(frames).to_bytes(4, "little")
    )
    return header + frames
