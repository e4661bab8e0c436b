"""Real-codec seam closure (VERDICT r9 #5): lossless FLAC decoded by
``operators/flac.flac_decode`` — stdlib fixed/Rice arithmetic, no codec
libs — round-tripped against the package's own spec-following encoder
(the WAV-vs-``wave`` pattern: encoder and decoder are structurally
independent code paths — bit-writer vs bit-reader, differencing vs
prediction — and every integrity field, CRC-8/CRC-16/MD5, is produced
by one side and verified by the other), then driven end-to-end through
the Arrow ``mapInPandas`` audio stage via the sniffing dispatcher."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from deathmetal_datalake_spark.operators.flac import (
    flac_decode,
    flac_encode,
    flac_pcm_decode,
)


def _sine(n: int, amp: int, noise: int = 0, seed: int = 3) -> list[int]:
    rng = random.Random(seed)
    return [
        int(amp * math.sin(2 * math.pi * 7 * i / n))
        + (rng.randint(-noise, noise) if noise else 0)
        for i in range(n)
    ]


@pytest.mark.parametrize(
    "bits,amp", [(8, 100), (16, 20_000), (24, 4_000_000)]
)
def test_flac_roundtrips_all_bit_depths(bits, amp):
    samples = _sine(1000, amp, noise=max(1, amp // 500))
    enc = flac_encode(samples, bits=bits, block_size=256)
    got, sr, nch = flac_decode(enc)
    assert got.dtype == np.int64
    assert (sr, nch) == (8000, 1)
    assert list(got) == samples


def test_flac_actually_compresses_smooth_signals():
    samples = _sine(4096, 20_000)
    enc = flac_encode(samples, bits=16, block_size=512)
    assert len(enc) < 2 * len(samples) * 0.7  # beats raw 16-bit PCM


def test_flac_constant_and_verbatim_paths():
    enc = flac_encode([42] * 300, bits=16)
    assert list(flac_pcm_decode(enc)) == [42] * 300
    rng = random.Random(11)
    noise = [rng.randint(-30000, 30000) for _ in range(500)]
    assert list(flac_pcm_decode(flac_encode(noise, bits=16, block_size=192))) == noise


def test_flac_stereo_takes_channel_zero():
    left = _sine(700, 2_000)
    right = [-s for s in left]
    enc = flac_encode(None, bits=16, channels=[left, right], block_size=256)
    got, _, nch = flac_decode(enc)
    assert nch == 2
    assert list(got) == left


def test_flac_ragged_last_block_and_tiny_streams():
    for n in (1, 2, 255, 257, 513):
        s = _sine(n, 5000, noise=9, seed=n)
        assert list(flac_pcm_decode(flac_encode(s, bits=16, block_size=256))) == s


def test_flac_rejects_garbage_and_corruption_with_valueerror():
    with pytest.raises(ValueError):
        flac_decode(b"not a flac stream at all")
    enc = flac_encode(_sine(600, 18_000, noise=25), bits=16, block_size=256)
    # Truncations at every region: magic, streaminfo, frame bodies.
    for cut in (2, 10, 40, len(enc) // 2, len(enc) - 1):
        with pytest.raises(ValueError):
            flac_decode(enc[:cut])
    # Any single bit flip must be caught by CRC-8, CRC-16, or the MD5.
    rng = random.Random(1)
    for _ in range(12):
        i = rng.randrange(8, len(enc))
        bad = bytearray(enc)
        bad[i] ^= 1 << rng.randrange(8)
        with pytest.raises(ValueError):
            flac_decode(bytes(bad))


def test_sniffer_classifies_flac_and_dispatcher_routes_it():
    from deathmetal_datalake_spark.operators.multimodal import (
        audio_pcm_decode,
        sniff_format,
    )

    s = _sine(300, 12_000)
    enc = flac_encode(s, bits=16)
    assert sniff_format(enc) == "flac"
    assert list(audio_pcm_decode(enc)) == s
    with pytest.raises(ValueError):
        audio_pcm_decode(b"\x89PNG\r\n\x1a\n garbage")  # image, not audio


def _ar2(n: int, seed: int = 42, amp: int = 30) -> np.ndarray:
    """An AR(2) signal — the shape LPC predicts far better than the
    fixed polynomial predictors, so the exact-cost selector provably
    emits LPC subframes for it (asserted via compression win)."""
    rng = np.random.default_rng(seed)
    x = np.zeros(n)
    for i in range(2, n):
        x[i] = 1.6 * x[i - 1] - 0.7 * x[i - 2] + rng.normal(0, amp)
    return np.clip(np.round(x), -30000, 30000).astype(np.int64)


def test_flac_lpc_roundtrip_and_compression_win():
    # Round-11 (VERDICT r10 #3): LPC subframes decode exactly — integer
    # quantized predictor + shift, same pure-integer pattern as FIXED.
    x = _ar2(5000)
    enc_fixed = flac_encode(x, bits=16, block_size=512)
    enc_lpc = flac_encode(x, bits=16, block_size=512, max_lpc_order=8)
    assert np.array_equal(flac_pcm_decode(enc_lpc), x)
    assert len(enc_lpc) < len(enc_fixed)  # LPC actually selected & won


@pytest.mark.parametrize("mode", ["left_side", "right_side", "mid_side"])
def test_flac_stereo_decorrelation_roundtrip(mode):
    # Round-11: all three inter-channel modes reconstruct BOTH channels
    # exactly (the MD5 covers the interleaved stream, so a wrong right
    # channel fails decode even though channel 0 is returned).
    rng = np.random.default_rng(7)
    left = _ar2(3000, seed=7)
    right = np.clip(
        (left * 0.9).astype(np.int64) + rng.integers(-5, 5, len(left)),
        -30000,
        30000,
    )
    enc = flac_encode(
        None, channels=[left, right], bits=16, block_size=256,
        stereo_mode=mode, max_lpc_order=6,
    )
    indep = flac_encode(
        None, channels=[left, right], bits=16, block_size=256,
        max_lpc_order=6,
    )
    got, _, nch = flac_decode(enc)
    assert nch == 2
    assert np.array_equal(got, left)
    assert len(enc) < len(indep)  # correlated channels: side coding wins


def test_flac_coded_frame_number_all_widths():
    from deathmetal_datalake_spark.operators.flac import (
        _BitReader,
        _BitWriter,
        _read_coded_number,
        _write_coded_number,
    )

    for v in (0, 1, 0x7F, 0x80, 2047, 2048, 65535, 1 << 20, (1 << 31) - 1,
              (1 << 36) - 1):
        w = _BitWriter()
        _write_coded_number(w, v)
        assert _read_coded_number(_BitReader(w.bytes())) == v
    w = _BitWriter()
    with pytest.raises(ValueError):
        _write_coded_number(w, 1 << 36)


def test_flac_over_2048_frames_stays_spec_valid():
    # r10 ADVICE: the old 2-byte-only coded form silently truncated
    # frame numbers >= 2048; the general form keeps long streams valid.
    rng = np.random.default_rng(5)
    s = rng.integers(-100, 100, 2100 * 16).astype(np.int64)
    enc = flac_encode(s, bits=16, block_size=16)
    assert np.array_equal(flac_pcm_decode(enc), s)


def test_flac_lpc_and_stereo_corruption_fuzz():
    # Bit flips in LPC/stereo streams must still be caught by CRC/MD5.
    left = _ar2(1200, seed=3)
    right = np.clip(left + 7, -30000, 30000)
    enc = flac_encode(
        None, channels=[left, right], bits=16, block_size=256,
        stereo_mode="mid_side", max_lpc_order=8,
    )
    rng = random.Random(2)
    for _ in range(12):
        i = rng.randrange(8, len(enc))
        bad = bytearray(enc)
        bad[i] ^= 1 << rng.randrange(8)
        with pytest.raises(ValueError):
            flac_decode(bytes(bad))


def test_audio_energy_windows_on_real_flac_end_to_end(spark):
    # Mixed WAV + FLAC corpus through ONE Arrow stage via the sniffing
    # dispatcher — the decode plumbing the 100 TB pipeline runs.
    import io
    import wave as wave_mod

    from deathmetal_datalake_spark.operators.multimodal import (
        audio_energy_windows,
        audio_pcm_decode,
    )

    win = 32
    payloads = {
        1: _sine(200, 20_000, noise=15, seed=4),
        2: [0] * 64,
        3: _sine(96, 900, seed=9),
    }
    def wav_bytes(s):
        buf = io.BytesIO()
        with wave_mod.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(np.array(s, dtype="<i2").tobytes())
        return buf.getvalue()

    rows = [
        (1, bytearray(flac_encode(payloads[1], bits=16, block_size=64))),
        (2, bytearray(wav_bytes(payloads[2]))),
        (3, bytearray(flac_encode(payloads[3], bits=16, block_size=96))),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {
        (r["media_id"], r["window_id"]): (r["n_samples"], r["energy"])
        for r in audio_energy_windows(
            df, window_samples=win, decoder=audio_pcm_decode
        ).collect()
    }
    want = {}
    for mid, s in payloads.items():
        arr = np.array(s, dtype=np.int64)
        for w0 in range(0, len(arr), win):
            chunk = arr[w0 : w0 + win]
            want[(mid, w0 // win)] = (len(chunk), int((chunk * chunk).sum()))
    assert got == want
