"""Real-codec seam closure (VERDICT r7 #5): RIFF/WAVE integer PCM is
decoded by ``wav_pcm_decode`` — pure stdlib parsing, no external codec
libs — and drives ``audio_energy_windows`` end-to-end through the Arrow
``mapInPandas`` stage on genuine WAV bytes produced by the stdlib
``wave`` writer (an independent RIFF implementation, so the parser is
checked against a second encoder, not against itself)."""

from __future__ import annotations

import io
import math
import struct
import wave

import numpy as np
import pytest


def _make_wav(samples: np.ndarray, sampwidth: int, n_channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(sampwidth)
        w.setframerate(8000)
        if sampwidth == 1:
            raw = (samples.astype(np.int64) + 128).astype(np.uint8).tobytes()
        elif sampwidth == 2:
            raw = samples.astype("<i2").tobytes()
        elif sampwidth == 3:
            raw = b"".join(
                struct.pack("<i", int(s) << 8)[1:] for s in samples
            )
        else:
            raw = samples.astype("<i4").tobytes()
        w.writeframes(raw)
    return buf.getvalue()


def _sine(n: int, amp: int) -> np.ndarray:
    return np.array(
        [int(amp * math.sin(2 * math.pi * 7 * i / n)) for i in range(n)],
        dtype=np.int64,
    )


@pytest.mark.parametrize("sampwidth,amp", [(1, 100), (2, 20_000), (3, 4_000_000), (4, 1_000_000_000)])
def test_wav_pcm_decode_roundtrips_all_bit_depths(sampwidth, amp):
    from deathmetal_datalake_spark.operators.multimodal import wav_pcm_decode

    samples = _sine(240, amp)
    got = wav_pcm_decode(_make_wav(samples, sampwidth))
    assert got.dtype == np.int64
    np.testing.assert_array_equal(got, samples)


def test_wav_pcm_decode_takes_channel_zero_of_stereo():
    from deathmetal_datalake_spark.operators.multimodal import wav_pcm_decode

    left = _sine(100, 12_000)
    right = -left
    interleaved = np.empty(200, dtype=np.int64)
    interleaved[0::2], interleaved[1::2] = left, right
    got = wav_pcm_decode(_make_wav(interleaved, 2, n_channels=2))
    np.testing.assert_array_equal(got, left)


def test_wav_pcm_decode_rejects_garbage():
    from deathmetal_datalake_spark.operators.multimodal import wav_pcm_decode

    with pytest.raises(ValueError):
        wav_pcm_decode(b"not a wave file at all")
    # float-PCM format tag (3) is out of scope and must fail loudly
    samples = _sine(16, 100)
    wav = bytearray(_make_wav(samples, 2))
    fmt_at = wav.index(b"fmt ")
    wav[fmt_at + 8 : fmt_at + 10] = struct.pack("<H", 3)
    with pytest.raises(ValueError):
        wav_pcm_decode(bytes(wav))


def test_audio_energy_windows_on_real_wav_end_to_end(spark):
    from deathmetal_datalake_spark.operators.multimodal import (
        audio_energy_windows,
        wav_pcm_decode,
    )

    win = 32
    payloads = {
        1: _sine(200, 20_000),          # 16-bit mono, ragged last window
        2: np.zeros(64, dtype=np.int64),  # silence: zero energy
        3: _sine(96, 100),
    }
    rows = [
        (mid, bytearray(_make_wav(s, 2 if mid != 3 else 1)))
        for mid, s in payloads.items()
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {
        (r["media_id"], r["window_id"]): (r["n_samples"], r["energy"])
        for r in audio_energy_windows(df, window_samples=win, decoder=wav_pcm_decode).collect()
    }
    want = {}
    for mid, s in payloads.items():
        for w0 in range(0, len(s), win):
            chunk = s[w0 : w0 + win]
            want[(mid, w0 // win)] = (len(chunk), int((chunk * chunk).sum()))
    assert got == want
