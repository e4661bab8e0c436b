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


# ---------------------------------------------------------------------------
# G.711 companded formats (round 9): mu-law (tag 7) and A-law (tag 6).
# The reference decoders below are INDEPENDENT branchy transcriptions of
# the published G.711 piecewise expansion (the classic sun-audio
# switch/case form); the production decoder is vectorized bit
# arithmetic — structural independence in the WAV-vs-`wave` pattern.
# ---------------------------------------------------------------------------

import struct as _struct


def _make_g711_wav(payload: bytes, fmt_tag: int, n_channels: int = 1) -> bytes:
    fmt = _struct.pack("<HHIIHH", fmt_tag, n_channels, 8000,
                       8000 * n_channels, n_channels, 8)
    chunks = (
        b"fmt " + _struct.pack("<I", len(fmt)) + fmt
        + b"data" + _struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) & 1 else b"")
    )
    return b"RIFF" + _struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _ulaw_ref(b: int) -> int:
    exp_lut = [0, 132, 396, 924, 1980, 4092, 8316, 16764]
    b = ~b & 0xFF
    sign = b & 0x80
    exponent = (b >> 4) & 0x07
    mantissa = b & 0x0F
    sample = exp_lut[exponent] + (mantissa << (exponent + 3))
    return -sample if sign else sample


def _alaw_ref(b: int) -> int:
    b ^= 0x55
    t = (b & 0x0F) << 4
    seg = (b & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t += 0x108
        t <<= seg - 1
    return t if b & 0x80 else -t


def test_wav_ulaw_decode_matches_reference_on_all_256_bytes():
    from deathmetal_datalake_spark.operators.multimodal import wav_pcm_decode

    payload = bytes(range(256))
    got = wav_pcm_decode(_make_g711_wav(payload, 7))
    want = np.array([_ulaw_ref(b) for b in payload], dtype=np.int64)
    np.testing.assert_array_equal(got, want)


def test_wav_alaw_decode_matches_reference_on_all_256_bytes():
    from deathmetal_datalake_spark.operators.multimodal import wav_pcm_decode

    payload = bytes(range(256))
    got = wav_pcm_decode(_make_g711_wav(payload, 6))
    want = np.array([_alaw_ref(b) for b in payload], dtype=np.int64)
    np.testing.assert_array_equal(got, want)


def test_wav_g711_multichannel_takes_first_channel():
    from deathmetal_datalake_spark.operators.multimodal import wav_pcm_decode

    # Interleaved stereo: channel 0 = bytes 0..9, channel 1 = 200..209.
    inter = bytes(x for pair in zip(range(10), range(200, 210)) for x in pair)
    got = wav_pcm_decode(_make_g711_wav(inter, 7, n_channels=2))
    want = np.array([_ulaw_ref(b) for b in range(10)], dtype=np.int64)
    np.testing.assert_array_equal(got, want)


def test_wav_g711_rejects_nonstandard_bit_depth():
    from deathmetal_datalake_spark.operators.multimodal import wav_pcm_decode

    fmt = _struct.pack("<HHIIHH", 7, 1, 8000, 16000, 2, 16)  # 16-bit mu-law: invalid
    bad = (b"RIFF" + _struct.pack("<I", 36) + b"WAVE"
           + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
           + b"data" + _struct.pack("<I", 4) + b"\x00\x01\x02\x03")
    with pytest.raises(ValueError):
        wav_pcm_decode(bad)


def test_audio_energy_windows_with_ulaw_wav_end_to_end(spark):
    from deathmetal_datalake_spark.operators.multimodal import (
        audio_energy_windows,
        wav_pcm_decode,
    )

    rng = np.random.RandomState(9)
    payloads = {
        1: _make_g711_wav(bytes(rng.randint(0, 256, 300, dtype=np.uint8).tolist()), 7),
        2: _make_g711_wav(bytes(rng.randint(0, 256, 128, dtype=np.uint8).tolist()), 6),
    }
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()],
        "media_id long, content binary",
    )
    got = audio_energy_windows(df, window_samples=64, decoder=wav_pcm_decode)
    rows = got.collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], 0)
        by_media[r["media_id"]] += r["n_samples"]
    assert by_media == {1: 300, 2: 128}
    # Energies must equal the reference decode's windowed squares.
    # 300 data bytes (even → no RIFF pad), so the chunk tail IS the data.
    ref = {1: [_ulaw_ref(b) for b in payloads[1][-300:]]}
    w1 = [r for r in rows if r["media_id"] == 1 and r["window_id"] == 0][0]
    expect = sum(s * s for s in ref[1][:64])
    assert w1["energy"] == expect


def test_audio_spectral_windows_pure_tone_centroid(spark):
    # A pure cosine at k cycles per 64-sample window concentrates ALL
    # non-DC energy in bin k: centroid == peak == k/64 exactly (up to
    # float rounding), rolloff at the same bin.
    import wave as _wave
    from io import BytesIO

    from deathmetal_datalake_spark.operators.multimodal import (
        audio_spectral_windows,
        wav_pcm_decode,
    )

    k = 5
    n = 256  # 4 windows of 64
    t = np.arange(n)
    tone = (10000 * np.cos(2 * np.pi * k * t / 64)).astype("<i2")
    buf = BytesIO()
    with _wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(8000)
        wv.writeframes(tone.tobytes())
    payload = buf.getvalue()

    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, content binary"
    )
    rows = audio_spectral_windows(
        df, window_samples=64, decoder=wav_pcm_decode
    ).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["peak_bin"] == k
        assert abs(r["centroid"] - k / 64) < 1e-3
        assert abs(r["rolloff85"] - k / 64) < 1e-9
        assert r["n_samples"] == 64


def test_audio_spectral_windows_silence_yields_nulls(spark):
    from deathmetal_datalake_spark.operators.multimodal import (
        audio_spectral_windows,
        deterministic_pcm_decode,
    )

    df = spark.createDataFrame(
        [(7, bytearray(b"\x80" * 100))], "media_id long, content binary"
    )
    rows = audio_spectral_windows(
        df, window_samples=64, decoder=deterministic_pcm_decode
    ).collect()
    # Constant signal = DC only; DC is excluded -> NULL features.
    assert {r["window_id"] for r in rows} == {0, 1}
    assert all(r["centroid"] is None and r["peak_bin"] is None for r in rows)
    assert [r["n_samples"] for r in sorted(rows, key=lambda x: x["window_id"])] == [64, 36]
