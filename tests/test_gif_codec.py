"""GIF codec seam closure (round 9): ``gif_decode`` — stdlib LZW
decompression with variable-width codes, clears, dictionary growth and
the KwKwK case — checked against an independent minimal GIF encoder
written here that includes a REAL LZW COMPRESSOR (so growth/width
paths are exercised on repetitive data, not just the literal-code
shortcut), plus interlacing and the shared 60-bit aHash."""

from __future__ import annotations

import struct

import numpy as np
import pytest


def _lzw_compress(indices, mcs):
    """Textbook LZW with GIF semantics: emit CLEAR first, grow the
    dictionary per emitted code, widen at 2^width, reset at 4096."""
    clear = 1 << mcs
    eoi = clear + 1
    out_codes = []

    def reset():
        return {(i,): i for i in range(clear)}, eoi + 1, mcs + 1

    table, next_code, width = reset()
    out_codes.append((clear, width))
    buf = ()
    for sym in indices:
        cand = buf + (sym,)
        if cand in table:
            buf = cand
            continue
        out_codes.append((table[buf], width))
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code > 4095:
            out_codes.append((clear, width))
            table, next_code, width = reset()
        buf = (sym,)
    if buf:
        out_codes.append((table[buf], width))
    out_codes.append((eoi, width))

    acc = 0
    nbits = 0
    data = bytearray()
    for code, w in out_codes:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    return bytes(data)


def _interlace_rows(h):
    return (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )


def _encode_gif(idx: np.ndarray, palette: np.ndarray, interlaced=False) -> bytes:
    h, w = idx.shape
    n_colors = palette.shape[0]
    pal_bits = max(1, (n_colors - 1).bit_length())
    pal_size = 1 << pal_bits
    pal = np.zeros((pal_size, 3), dtype=np.uint8)
    pal[:n_colors] = palette
    mcs = max(2, pal_bits)
    flags = 0x80 | (pal_bits - 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, flags, 0, 0)
    out += pal.tobytes()
    iflags = 0x40 if interlaced else 0x00
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
    rows = idx[_interlace_rows(h)] if interlaced else idx
    data = _lzw_compress([int(v) for v in rows.reshape(-1)], mcs)
    out.append(mcs)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


_PALETTE = np.array(
    [[0, 0, 0], [255, 255, 255], [255, 0, 0], [0, 255, 0], [0, 0, 255],
     [128, 128, 128], [20, 200, 90], [200, 20, 90]],
    dtype=np.uint8,
)


def _lut(palette):
    p = palette.astype(np.int64)
    return (299 * p[:, 0] + 587 * p[:, 1] + 114 * p[:, 2]) // 1000


def test_gif_decode_repetitive_image_exercises_dictionary_growth():
    from deathmetal_datalake_spark.operators.multimodal import gif_decode

    rng = np.random.RandomState(31)
    # Repetitive texture → long LZW matches → growth + width increases.
    tile = rng.randint(0, 8, (8, 16), dtype=np.uint8)
    idx = np.tile(tile, (8, 8))  # 64 x 128
    got = gif_decode(_encode_gif(idx, _PALETTE))
    np.testing.assert_array_equal(got, _lut(_PALETTE)[idx.astype(np.int64)])


def test_gif_decode_random_and_tiny_images():
    from deathmetal_datalake_spark.operators.multimodal import gif_decode

    rng = np.random.RandomState(32)
    for shape in [(1, 1), (3, 5), (40, 61)]:
        idx = rng.randint(0, 8, shape, dtype=np.uint8)
        got = gif_decode(_encode_gif(idx, _PALETTE))
        np.testing.assert_array_equal(got, _lut(_PALETTE)[idx.astype(np.int64)])


def test_gif_decode_interlaced():
    from deathmetal_datalake_spark.operators.multimodal import gif_decode

    rng = np.random.RandomState(33)
    idx = rng.randint(0, 8, (19, 23), dtype=np.uint8)
    got = gif_decode(_encode_gif(idx, _PALETTE, interlaced=True))
    np.testing.assert_array_equal(got, _lut(_PALETTE)[idx.astype(np.int64)])


def test_gif_decode_skips_extensions_and_rejects_garbage():
    from deathmetal_datalake_spark.operators.multimodal import gif_decode

    rng = np.random.RandomState(34)
    idx = rng.randint(0, 8, (6, 6), dtype=np.uint8)
    good = bytearray(_encode_gif(idx, _PALETTE))
    # Splice a graphics-control extension before the image descriptor.
    at = good.index(0x2C, 13)
    gce = bytes([0x21, 0xF9, 0x04, 0, 0, 0, 0, 0x00])
    spliced = bytes(good[:at]) + gce + bytes(good[at:])
    got = gif_decode(spliced)
    np.testing.assert_array_equal(got, _lut(_PALETTE)[idx.astype(np.int64)])
    with pytest.raises(ValueError):
        gif_decode(b"NOTAGIF.........................")
    with pytest.raises(ValueError):
        gif_decode(b"GIF89a" + b"\x00" * 7 + b"\x3b")  # no image block


def test_gif_and_png_hashes_agree_on_identical_pixels(spark):
    from deathmetal_datalake_spark.operators.multimodal import (
        gif_average_hash,
        perceptual_hashes,
        png_average_hash,
        png_encode_gray,
    )

    rng = np.random.RandomState(35)
    idx = rng.randint(0, 8, (32, 32), dtype=np.uint8)
    gray = _lut(_PALETTE)[idx.astype(np.int64)].astype(np.uint8)
    gif_payload = _encode_gif(idx, _PALETTE)
    assert gif_average_hash(gif_payload) == png_average_hash(
        png_encode_gray(gray)
    )
    # And through the Arrow stage:
    df = spark.createDataFrame(
        [(1, bytearray(gif_payload))], "media_id long, content binary"
    )
    rows = perceptual_hashes(df, hasher=gif_average_hash).collect()
    assert rows[0]["phash"] == gif_average_hash(gif_payload)
