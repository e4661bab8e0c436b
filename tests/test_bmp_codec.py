"""Real image-codec seam closure (round 8, the image twin of the WAV
decoder): uncompressed BMP parsed by ``bmp_decode`` — pure stdlib, no
codec libs — and a real 8x8 average hash (``bmp_average_hash``) driven
end-to-end through the Arrow ``perceptual_hashes`` stage. Fixture BMPs
are written by an independent minimal encoder following the spec
(BITMAPFILEHEADER + BITMAPINFOHEADER), including the 4-byte row
padding and bottom-up row order the parser must invert."""

from __future__ import annotations

import struct

import numpy as np
import pytest


def _encode_bmp24(img_rgb: np.ndarray, top_down: bool = False) -> bytes:
    """Minimal spec-following 24-bit BI_RGB encoder (independent of the
    parser): rows bottom-up unless top_down, padded to 4 bytes."""
    h, w, _ = img_rgb.shape
    stride = (w * 3 + 3) & ~3
    pixel_bytes = bytearray()
    row_range = range(h) if top_down else range(h - 1, -1, -1)
    for r in row_range:
        row = bytearray()
        for c in range(w):
            rr, gg, bb = img_rgb[r, c]
            row += bytes([bb, gg, rr])  # spec order: B, G, R
        row += b"\x00" * (stride - len(row))
        pixel_bytes += row
    height_field = -h if top_down else h
    info = struct.pack("<IiiHHIIiiII", 40, w, height_field, 1, 24, 0,
                       len(pixel_bytes), 2835, 2835, 0, 0)
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixel_bytes), 0, 0, 54)
    return file_hdr + info + bytes(pixel_bytes)


def _gradient(h, w, seed=0):
    rng = np.random.RandomState(seed)
    base = np.linspace(0, 255, w, dtype=np.int64)[None, :].repeat(h, axis=0)
    img = np.stack([base, base, base], axis=-1)
    return (img + rng.randint(0, 4, img.shape)).clip(0, 255).astype(np.uint8)


def test_bmp_decode_exact_pixels_bottom_up_and_top_down():
    from deathmetal_datalake_spark.operators.multimodal import bmp_decode

    img = np.array(
        [[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
         [[0, 0, 0], [128, 128, 128], [255, 255, 255]]],
        dtype=np.uint8,
    )
    want = np.array(
        [[(299 * 255) // 1000, (587 * 255) // 1000, (114 * 255) // 1000],
         [0, 128, 255]],
        dtype=np.int64,
    )
    for top_down in (False, True):
        got = bmp_decode(_encode_bmp24(img, top_down=top_down))
        np.testing.assert_array_equal(got, want)


def test_bmp_decode_rejects_garbage_and_compressed():
    from deathmetal_datalake_spark.operators.multimodal import bmp_decode

    with pytest.raises(ValueError):
        bmp_decode(b"PNG? definitely not a bitmap......................")
    wav = bytearray(_encode_bmp24(_gradient(4, 4)))
    struct.pack_into("<I", wav, 30, 1)  # BI_RLE8 compression tag
    with pytest.raises(ValueError):
        bmp_decode(bytes(wav))


def test_bmp_average_hash_tracks_perceptual_similarity():
    from deathmetal_datalake_spark.operators.multimodal import bmp_average_hash

    a = bmp_average_hash(_encode_bmp24(_gradient(32, 48, seed=1)))
    near = bmp_average_hash(_encode_bmp24(_gradient(32, 48, seed=2)))  # same scene, new noise
    # A different scene: the gradient mirrored (dark side swaps)
    far_img = _gradient(32, 48, seed=1)[:, ::-1]
    far = bmp_average_hash(_encode_bmp24(np.ascontiguousarray(far_img)))
    ham = lambda x, y: bin(x ^ y).count("1")
    assert ham(a, near) <= 6
    assert ham(a, far) >= 20
    assert 0 <= a < (1 << 60)


def test_perceptual_hashes_arrow_stage_with_real_bmp_hasher(spark):
    from deathmetal_datalake_spark.operators.multimodal import (
        bmp_average_hash,
        perceptual_hashes,
    )

    payloads = {
        1: _encode_bmp24(_gradient(16, 24, seed=3)),
        2: _encode_bmp24(_gradient(16, 24, seed=4)),          # near-dup of 1
        3: _encode_bmp24(np.ascontiguousarray(_gradient(16, 24, seed=3)[:, ::-1])),
    }
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()],
        "media_id long, content binary",
    )
    got = {
        r["media_id"]: r["phash"]
        for r in perceptual_hashes(df, hasher=bmp_average_hash).collect()
    }
    assert got == {k: bmp_average_hash(v) for k, v in payloads.items()}
    ham = lambda x, y: bin(x ^ y).count("1")
    assert ham(got[1], got[2]) <= 6 < ham(got[1], got[3])


def test_bmp_decode_8bit_paletted():
    from deathmetal_datalake_spark.operators.multimodal import bmp_decode

    # 3x2 indexed image over a 4-color palette (B, G, R, reserved).
    palette = [(0, 0, 0, 0), (255, 255, 255, 0), (0, 0, 255, 0), (0, 255, 0, 0)]
    idx = np.array([[0, 1, 2], [3, 0, 1]], dtype=np.uint8)
    h, w = idx.shape
    stride = (w + 3) & ~3
    rows = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        row = bytes(idx[r]) + b"\x00" * (stride - w)
        rows += row
    pal_bytes = b"".join(bytes(c) for c in palette)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(rows),
                       2835, 2835, len(palette), 0)
    offset = 14 + 40 + len(pal_bytes)
    file_hdr = struct.pack("<2sIHHI", b"BM", offset + len(rows), 0, 0, offset)
    got = bmp_decode(file_hdr + info + pal_bytes + bytes(rows))
    lut = [(299 * r + 587 * g + 114 * b) // 1000 for (b, g, r, _x) in palette]
    want = np.array([[lut[0], lut[1], lut[2]], [lut[3], lut[0], lut[1]]])
    np.testing.assert_array_equal(got, want)
