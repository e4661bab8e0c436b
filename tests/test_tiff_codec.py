"""TIFF codec seam closure (round-9 continuation): baseline TIFF
parsed by ``tiff_decode`` — pure stdlib IFD walk + PackBits, no codec
libs — and the shared 8x8 average hash (``tiff_average_hash``) driven
end-to-end through the Arrow ``perceptual_hashes`` stage. Fixture
TIFFs are written by an independent minimal encoder following the
spec (header + IFD + strips), covering BOTH byte orders, grayscale
(incl. WhiteIsZero inversion) and RGB, uncompressed and PackBits, and
multi-strip layouts the parser must reassemble."""

from __future__ import annotations

import struct

import numpy as np
import pytest


def _packbits_encode(data: bytes) -> bytes:
    """Independent minimal PackBits encoder: greedy runs ≥3 become
    repeat packets, everything else literal packets of ≤128."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        j = i
        lit = bytearray()
        while j < n and len(lit) < 128:
            run = 1
            while j + run < n and run < 3 and data[j + run] == data[j]:
                run += 1
            if run >= 3:
                break
            lit.append(data[j])
            j += 1
        out += bytes([len(lit) - 1]) + lit
        i = j
    return bytes(out)


def _encode_tiff(
    img: np.ndarray,
    *,
    big_endian: bool = False,
    packbits: bool = False,
    rows_per_strip: int | None = None,
    photometric: int | None = None,
) -> bytes:
    """Minimal spec-following TIFF encoder (independent of the parser):
    8-bit gray (H, W) or RGB (H, W, 3), strip-organized."""
    bo = ">" if big_endian else "<"
    gray = img.ndim == 2
    h, w = img.shape[:2]
    spp = 1 if gray else 3
    phot = photometric if photometric is not None else (1 if gray else 2)
    rps = rows_per_strip or h
    raw = img.astype(np.uint8).tobytes()
    row_bytes = w * spp
    strips = []
    for r0 in range(0, h, rps):
        chunk = raw[r0 * row_bytes : min(r0 + rps, h) * row_bytes]
        strips.append(_packbits_encode(chunk) if packbits else chunk)

    entries = {
        256: (4, [w]),
        257: (4, [h]),
        258: (3, [8] * spp),
        259: (3, [32773 if packbits else 1]),
        262: (3, [phot]),
        277: (3, [spp]),
        278: (4, [rps]),
    }
    n_entries = len(entries) + 2  # + StripOffsets, StripByteCounts
    ifd_off = 8
    ifd_size = 2 + 12 * n_entries + 4
    extra = bytearray()  # out-of-line values, then strip data
    extra_base = ifd_off + ifd_size

    def pack_value(typ, vals):
        fmt = {3: "H", 4: "I"}[typ]
        size = {3: 2, 4: 4}[typ] * len(vals)
        blob = struct.pack(bo + str(len(vals)) + fmt, *vals)
        if size <= 4:
            return blob + b"\x00" * (4 - size)
        off = extra_base + len(extra)
        extra.extend(blob)
        return struct.pack(bo + "I", off)

    # place strips after the (not yet final) extra block: reserve the
    # value blobs first, then append strip bytes and record offsets.
    tag_blobs = []
    for tag in sorted(entries):
        typ, vals = entries[tag]
        tag_blobs.append((tag, typ, len(vals), pack_value(typ, vals)))
    strip_offsets = []
    for sdata in strips:
        strip_offsets.append(extra_base + len(extra))
        extra.extend(sdata)
    for tag, typ, vals in (
        (273, 4, strip_offsets),
        (279, 4, [len(s) for s in strips]),
    ):
        tag_blobs.append((tag, typ, len(vals), pack_value(typ, vals)))
    tag_blobs.sort()

    out = bytearray()
    out += (b"MM" if big_endian else b"II") + struct.pack(bo + "HI", 42, ifd_off)
    out += struct.pack(bo + "H", n_entries)
    for tag, typ, cnt, vblob in tag_blobs:
        out += struct.pack(bo + "HHI", tag, typ, cnt) + vblob
    out += struct.pack(bo + "I", 0)  # next-IFD terminator
    assert len(out) == extra_base
    out += extra
    return bytes(out)


def _luma(rgb: np.ndarray) -> np.ndarray:
    px = rgb.astype(np.int64)
    return (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000


def _gradient(h, w, seed=0):
    rng = np.random.RandomState(seed)
    base = np.linspace(0, 255, w, dtype=np.int64)[None, :].repeat(h, axis=0)
    img = np.stack([base, base, base], axis=-1)
    return (img + rng.randint(0, 4, img.shape)).clip(0, 255).astype(np.uint8)


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("packbits", [False, True])
def test_tiff_decode_rgb_exact(big_endian, packbits):
    from deathmetal_datalake_spark.operators.multimodal import tiff_decode

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (13, 17, 3), dtype=np.uint8)
    got = tiff_decode(
        _encode_tiff(img, big_endian=big_endian, packbits=packbits)
    )
    np.testing.assert_array_equal(got, _luma(img))


@pytest.mark.parametrize("packbits", [False, True])
def test_tiff_decode_gray_multistrip_and_whiteiszero(packbits):
    from deathmetal_datalake_spark.operators.multimodal import tiff_decode

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (21, 9), dtype=np.uint8)
    got = tiff_decode(_encode_tiff(img, packbits=packbits, rows_per_strip=4))
    np.testing.assert_array_equal(got, img.astype(np.int64))
    inv = tiff_decode(
        _encode_tiff(img, packbits=packbits, rows_per_strip=4, photometric=0)
    )
    np.testing.assert_array_equal(inv, 255 - img.astype(np.int64))


def test_tiff_decode_repetitive_image_exercises_packbits_runs():
    from deathmetal_datalake_spark.operators.multimodal import tiff_decode

    img = np.zeros((16, 32), dtype=np.uint8)
    img[:, 16:] = 200  # long runs on both sides of the split
    img[7, 13] = 77    # and a literal island
    got = tiff_decode(_encode_tiff(img, packbits=True, rows_per_strip=5))
    np.testing.assert_array_equal(got, img.astype(np.int64))


def test_packbits_roundtrip_random():
    from deathmetal_datalake_spark.operators.multimodal import _packbits_decode

    rng = np.random.RandomState(11)
    for _ in range(25):
        n = int(rng.randint(0, 700))
        # mixture of runs and noise
        data = bytearray()
        while len(data) < n:
            if rng.rand() < 0.5:
                data += bytes([int(rng.randint(0, 256))]) * int(rng.randint(1, 20))
            else:
                data += bytes(rng.randint(0, 256, int(rng.randint(1, 10))).astype(np.uint8))
        data = bytes(data[:n])
        assert _packbits_decode(_packbits_encode(data)) == data


def test_tiff_decode_rejects_garbage_and_unsupported():
    from deathmetal_datalake_spark.operators.multimodal import tiff_decode

    with pytest.raises(ValueError):
        tiff_decode(b"BM not a tiff at all.............")
    lzw = bytearray(_encode_tiff(_gradient(4, 4)))
    # patch Compression (tag 259) value to 5 (LZW): find its entry
    bo = "<"
    (n_entries,) = struct.unpack_from(bo + "H", lzw, 8)
    for k in range(n_entries):
        pos = 10 + 12 * k
        tag, typ, cnt = struct.unpack_from(bo + "HHI", lzw, pos)
        if tag == 259:
            struct.pack_into(bo + "H", lzw, pos + 8, 5)
    with pytest.raises(ValueError):
        tiff_decode(bytes(lzw))


def test_tiff_average_hash_tracks_perceptual_similarity():
    from deathmetal_datalake_spark.operators.multimodal import tiff_average_hash

    a = tiff_average_hash(_encode_tiff(_gradient(32, 48, seed=1)))
    near = tiff_average_hash(_encode_tiff(_gradient(32, 48, seed=2), packbits=True))
    far_img = _gradient(32, 48, seed=1)[:, ::-1]
    far = tiff_average_hash(_encode_tiff(np.ascontiguousarray(far_img)))
    ham = lambda x, y: bin(x ^ y).count("1")  # noqa: E731
    assert ham(a, near) <= 6
    assert ham(a, far) > ham(a, near)


def test_tiff_hash_agrees_with_bmp_hash_on_same_image():
    # The SAME pixels through two REAL decoders must produce the SAME
    # aHash — the strongest cross-codec consistency check available
    # without library decoders.
    from deathmetal_datalake_spark.operators.multimodal import (
        bmp_average_hash,
        tiff_average_hash,
    )
    from tests.test_bmp_codec import _encode_bmp24

    img = _gradient(24, 40, seed=9)
    assert tiff_average_hash(_encode_tiff(img)) == bmp_average_hash(
        _encode_bmp24(img)
    )


def test_tiff_hash_rides_the_arrow_perceptual_stage(spark):
    from deathmetal_datalake_spark.operators.multimodal import (
        perceptual_hashes,
        tiff_average_hash,
    )

    payloads = {
        int(i): _encode_tiff(_gradient(16, 16, seed=i), packbits=bool(i % 2))
        for i in range(6)
    }
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()],
        "media_id long, content binary",
    )
    got = {
        r["media_id"]: r["phash"]
        for r in perceptual_hashes(df, hasher=tiff_average_hash).collect()
    }
    assert got == {k: tiff_average_hash(v) for k, v in payloads.items()}


# ---------------------------------------------------------------------------
# Format sniffing + auto-dispatch (round-9 continuation): the mixed-
# corpus entry point routes payloads by MAGIC BYTES to the real
# decoders; the dispatched hash must equal the format-specific one.
# ---------------------------------------------------------------------------


def test_sniff_format_magic_bytes():
    from deathmetal_datalake_spark.operators.multimodal import sniff_format
    from tests.test_bmp_codec import _encode_bmp24

    img = _gradient(8, 8)
    assert sniff_format(_encode_bmp24(img)) == "bmp"
    assert sniff_format(_encode_tiff(img)) == "tiff"
    assert sniff_format(_encode_tiff(img, big_endian=True)) == "tiff"
    assert sniff_format(b"\x89PNG\r\n\x1a\nrest") == "png"
    assert sniff_format(b"GIF89a....") == "gif"
    assert sniff_format(b"\xff\xd8\xff\xe0JFIF") == "jpeg"
    assert sniff_format(b"RIFF\x00\x00\x00\x00WAVEfmt ") == "wav"
    assert sniff_format(b"RIFF\x00\x00\x00\x00AVI LIST") == "avi"
    assert sniff_format(b"fLaC\x80\x00\x00\x22rest") == "flac"
    assert sniff_format(b"plain text payload") == "unknown"
    assert sniff_format(b"") == "unknown"


def test_media_average_hash_dispatch_matches_specific_decoders(spark):
    from deathmetal_datalake_spark.operators.multimodal import (
        bmp_average_hash,
        media_average_hash,
        perceptual_hashes,
        tiff_average_hash,
    )
    from tests.test_bmp_codec import _encode_bmp24

    img = _gradient(16, 24, seed=4)
    bmp, tif = _encode_bmp24(img), _encode_tiff(img, packbits=True)
    assert media_average_hash(bmp) == bmp_average_hash(bmp)
    assert media_average_hash(tif) == tiff_average_hash(tif)
    assert media_average_hash(bmp) == media_average_hash(tif)  # same pixels
    with pytest.raises(ValueError):
        media_average_hash(b"not an image at all")
    # mixed-format corpus through the Arrow stage with ONE hasher
    payloads = {0: bmp, 1: tif, 2: _encode_tiff(img, big_endian=True)}
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()],
        "media_id long, content binary",
    )
    got = {
        r["media_id"]: r["phash"]
        for r in perceptual_hashes(df, hasher=media_average_hash).collect()
    }
    assert got == {k: media_average_hash(v) for k, v in payloads.items()}


def test_malformed_payloads_raise_valueerror_never_struct_error():
    # ADVICE r9: a corrupt IFD / out-of-range value offset used to
    # escape as struct.error, bypassing callers that catch ValueError
    # for quarantine routing. Fuzz the header fields and truncations:
    # ONLY ValueError may escape.
    import numpy as np

    from deathmetal_datalake_spark.operators.multimodal import tiff_decode

    img = (np.arange(48, dtype=np.int64).reshape(6, 8) * 5) % 256
    good = bytearray(_encode_tiff(img))
    cases = []
    # Truncations at every interesting boundary.
    for cut in (3, 7, 8, 9, 11, 16, len(good) // 2, len(good) - 1):
        cases.append(bytes(good[:cut]))
    # Corrupt the IFD offset to point far out of range / mid-file.
    for off in (0xFFFFFFF0, len(good) + 1, len(good) - 3):
        c = bytearray(good)
        c[4:8] = off.to_bytes(4, "little")
        cases.append(bytes(c))
    # Corrupt the entry count so the table runs off the payload.
    (ifd_off,) = (int.from_bytes(good[4:8], "little"),)
    c = bytearray(good)
    c[ifd_off : ifd_off + 2] = (60000).to_bytes(2, "little")
    cases.append(bytes(c))
    # Corrupt a value offset inside the first IFD entry.
    c = bytearray(good)
    c[ifd_off + 2 + 8 : ifd_off + 2 + 12] = (0xFFFFFF00).to_bytes(4, "little")
    cases.append(bytes(c))
    for payload in cases:
        try:
            tiff_decode(payload)
        except ValueError:
            pass  # the documented contract
        # anything else (struct.error, IndexError, ...) fails the test
