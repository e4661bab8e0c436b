"""Baseline-JPEG codec seam closure (round 9): ``jpeg_decode`` — pure
stdlib+numpy marker parse, Huffman entropy decode, dequant, inverse
zigzag, orthonormal IDCT, 4:2:0 upsampling — checked against an
independent minimal spec-following ENCODER written here (the
PNG/WAV-test pattern). The encoder uses simple VALID canonical Huffman
tables (all 12 DC categories at 4 bits, all 162 AC symbols at 8 bits)
rather than the Annex-K optimized ones, which exercises the decoder's
canonical-table construction rather than assuming the common tables.

Exactness anchor: with an all-ones quantization table, a CONSTANT 8×8
block has only a DC coefficient and round-trips bit-exactly; smooth
content is bounded within ±2 levels (float rounding only)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from deathmetal_datalake_spark.operators.jpeg import ZIGZAG, _C

# ---------------------------------------------------------------------------
# Minimal spec-following encoder (independent of the parser).
# ---------------------------------------------------------------------------

_DC_BITS = [0, 0, 0, 12] + [0] * 12          # all 12 categories at 4 bits
_DC_VALS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_BITS = [0] * 7 + [len(_AC_SYMBOLS)] + [0] * 8   # all at 8 bits
_AC_VALS = list(_AC_SYMBOLS)


def _canonical_codes(bits, vals):
    codes = {}
    code = 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[i]] = (code, ln)
            code += 1
            i += 1
        code <<= 1
    return codes


_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, ln):
        for i in range(ln - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def pad(self):
        while self.n:
            self.put(1, 1)


def _category(v):
    return 0 if v == 0 else int(abs(v)).bit_length()


def _put_coef(wr, v, t):
    if t == 0:
        return
    raw = v if v >= 0 else v + (1 << t) - 1
    wr.put(raw, t)


def _encode_block(wr, block, q, pred):
    # Orthonormal forward DCT == the spec's 1/4 C(u)C(v) form.
    coef = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    qz = np.round(coef / q.reshape(8, 8)).astype(np.int64)
    zz = qz.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - pred
    t = _category(diff)
    c, ln = _DC_CODES[t]
    wr.put(c, ln)
    _put_coef(wr, diff, t)
    run = 0
    last_nz = max([k for k in range(1, 64) if zz[k]], default=0)
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = _AC_CODES[0xF0]
            wr.put(c, ln)
            run -= 16
        s = _category(v)
        c, ln = _AC_CODES[(run << 4) | s]
        wr.put(c, ln)
        _put_coef(wr, v, s)
        run = 0
    if last_nz < 63:
        c, ln = _AC_CODES[0x00]
        wr.put(c, ln)
    return int(zz[0])


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _dht_payload(tc, th, bits, vals):
    return bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)


def _encode_jpeg(planes, subsampling, q, restart_interval=0):
    """planes: list of (H, W) uint8 arrays (1 = grayscale, 3 = YCbCr
    full-res; chroma is box-subsampled here per `subsampling`)."""
    h, w = planes[0].shape
    ncomp = len(planes)
    if subsampling == "444" or ncomp == 1:
        samp = [(1, 1)] * ncomp
    elif subsampling == "420":
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        raise AssertionError(subsampling)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for i, (sh, sv) in enumerate(samp):
        sof += bytes([i + 1, (sh << 4) | sv, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht_payload(0, 0, _DC_BITS, _DC_VALS))
    out += _seg(0xC4, _dht_payload(1, 0, _AC_BITS, _AC_VALS))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    # Component planes padded to MCU multiples, chroma subsampled.
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    comp_planes = []
    for i, p in enumerate(planes):
        sh, sv = samp[i]
        if (sh, sv) != (hmax, vmax):
            ry, rx = vmax // sv, hmax // sh
            hh = (h + ry - 1) // ry
            ww = (w + rx - 1) // rx
            pad = np.pad(p, ((0, ry * hh - h), (0, rx * ww - w)), mode="edge")
            p = pad.reshape(hh, ry, ww, rx).mean(axis=(1, 3))
            p = np.round(p)
        ph = mcuy * sv * 8
        pw = mcux * sh * 8
        p = np.pad(
            p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
        )
        comp_planes.append(p.astype(np.float64))

    wr = _BitWriter()
    pred = [0] * ncomp
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                wr.pad()
                wr.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                pred = [0] * ncomp
            mcu_count += 1
            for i in range(ncomp):
                sh, sv = samp[i]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        blk = comp_planes[i][y0 : y0 + 8, x0 : x0 + 8]
                        pred[i] = _encode_block(wr, blk, q, pred[i])
    wr.pad()
    out += wr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


_Q_ONES = np.ones(64, dtype=np.int64)


def _gradient(h, w, seed=0):
    rng = np.random.RandomState(seed)
    base = np.linspace(40, 215, w)[None, :].repeat(h, axis=0)
    return np.clip(base + rng.randint(0, 4, (h, w)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_jpeg_flat_blocks_roundtrip_exactly():
    from deathmetal_datalake_spark.operators.jpeg import jpeg_decode

    img = np.full((16, 24), 113, dtype=np.uint8)
    got = jpeg_decode(_encode_jpeg([img], "444", _Q_ONES))
    np.testing.assert_array_equal(got, img.astype(np.int64))


def test_jpeg_gray_smooth_content_within_two_levels():
    from deathmetal_datalake_spark.operators.jpeg import jpeg_decode

    img = _gradient(24, 40, seed=1)
    got = jpeg_decode(_encode_jpeg([img], "444", _Q_ONES))
    assert got.shape == (24, 40)
    assert np.abs(got - img.astype(np.int64)).max() <= 2


def test_jpeg_nonaligned_dimensions_crop_correctly():
    from deathmetal_datalake_spark.operators.jpeg import jpeg_decode

    img = _gradient(13, 21, seed=2)  # not multiples of 8
    got = jpeg_decode(_encode_jpeg([img], "444", _Q_ONES))
    assert got.shape == (13, 21)
    assert np.abs(got - img.astype(np.int64)).max() <= 2


def test_jpeg_color_444_luma_matches_y_plane():
    from deathmetal_datalake_spark.operators.jpeg import jpeg_decode

    y = _gradient(16, 16, seed=3)
    cb = np.full((16, 16), 90, dtype=np.uint8)
    cr = np.full((16, 16), 160, dtype=np.uint8)
    got = jpeg_decode(_encode_jpeg([y, cb, cr], "444", _Q_ONES))
    assert np.abs(got - y.astype(np.int64)).max() <= 2


def test_jpeg_420_subsampled_decodes_full_resolution_luma():
    from deathmetal_datalake_spark.operators.jpeg import jpeg_decode

    y = _gradient(32, 48, seed=4)
    cb = _gradient(32, 48, seed=5)
    cr = _gradient(32, 48, seed=6)
    got = jpeg_decode(_encode_jpeg([y, cb, cr], "420", _Q_ONES))
    assert got.shape == (32, 48)
    assert np.abs(got - y.astype(np.int64)).max() <= 2


def test_jpeg_quantization_coarsens_but_preserves_structure():
    from deathmetal_datalake_spark.operators.jpeg import jpeg_decode

    img = _gradient(24, 24, seed=7)
    q = np.full(64, 16, dtype=np.int64)
    q[0] = 8
    got = jpeg_decode(_encode_jpeg([img], "444", q))
    # Coarse quant: bounded by half the largest AC step + DC step.
    assert np.abs(got - img.astype(np.int64)).max() <= 40
    assert abs(float(got.mean()) - float(img.mean())) <= 4.0


def test_jpeg_restart_markers_reset_dc_prediction():
    from deathmetal_datalake_spark.operators.jpeg import jpeg_decode

    img = _gradient(8, 64, seed=8)  # 8 MCUs in a row
    got = jpeg_decode(_encode_jpeg([img], "444", _Q_ONES, restart_interval=2))
    assert np.abs(got - img.astype(np.int64)).max() <= 2


def test_jpeg_rejects_garbage_and_progressive():
    from deathmetal_datalake_spark.operators.jpeg import jpeg_decode

    with pytest.raises(ValueError):
        jpeg_decode(b"\x89PNG not a jpeg .....................")
    good = bytearray(_encode_jpeg([_gradient(8, 8)], "444", _Q_ONES))
    sof_at = bytes(good).find(b"\xff\xc0")
    good[sof_at + 1] = 0xC2  # pretend progressive
    with pytest.raises(ValueError):
        jpeg_decode(bytes(good))


def test_jpeg_and_png_hashes_agree_on_flat_exact_pixels():
    # Flat blocks round-trip exactly, so the SAME image through the
    # lossless PNG path and the JPEG path must produce the IDENTICAL
    # 60-bit aHash.
    from deathmetal_datalake_spark.operators.jpeg import jpeg_average_hash
    from deathmetal_datalake_spark.operators.multimodal import png_average_hash
    from tests.test_png_codec import _encode_png

    img = np.zeros((32, 32), dtype=np.uint8)
    img[:, 16:] = 200  # two flat halves, block-aligned
    img[:16, :] += 20
    jh = jpeg_average_hash(_encode_jpeg([img], "444", _Q_ONES))
    ph = png_average_hash(_encode_png(img, 0))
    assert jh == ph


def test_perceptual_hashes_arrow_stage_with_real_jpeg_hasher(spark):
    from deathmetal_datalake_spark.operators.jpeg import jpeg_average_hash
    from deathmetal_datalake_spark.operators.multimodal import perceptual_hashes

    payloads = {
        1: _encode_jpeg([_gradient(16, 24, seed=10)], "444", _Q_ONES),
        2: _encode_jpeg([_gradient(16, 24, seed=11)], "444", _Q_ONES),
        3: _encode_jpeg(
            [np.ascontiguousarray(_gradient(16, 24, seed=10)[:, ::-1])],
            "444",
            _Q_ONES,
        ),
    }
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()],
        "media_id long, content binary",
    )
    got = {
        r["media_id"]: r["phash"]
        for r in perceptual_hashes(df, hasher=jpeg_average_hash).collect()
    }
    assert got == {k: jpeg_average_hash(v) for k, v in payloads.items()}
    ham = lambda x, y: bin(x ^ y).count("1")
    assert ham(got[1], got[2]) <= 6 < ham(got[1], got[3])


# ---------------------------------------------------------------------------
# MJPEG-in-AVI: the real video path. The test writes a minimal
# spec-shaped AVI (RIFF/AVI, LIST hdrl with avih + strl/strh/strf,
# LIST movi with word-aligned 00dc frames) around frames produced by
# the independent JPEG encoder above.
# ---------------------------------------------------------------------------


def _riff_chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _riff_list(ltype: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", ltype + body)


def _encode_avi_mjpeg(frames, w, h, fps=10) -> bytes:
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, 0, 0, 0x10, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps,
                                        0, len(frames), 0, 0, 0, 0)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    movi = _riff_list(b"movi", b"".join(_riff_chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_avi_mjpeg_frames_roundtrip_flat_exactly():
    from deathmetal_datalake_spark.operators.jpeg import avi_mjpeg_frame_luma

    imgs = [np.full((16, 16), 40 + 30 * i, dtype=np.uint8) for i in range(4)]
    frames = [_encode_jpeg([im], "444", _Q_ONES) for im in imgs]
    avi = _encode_avi_mjpeg(frames, 16, 16)
    got = avi_mjpeg_frame_luma(avi)
    assert [no for no, _ in got] == [0, 1, 2, 3]
    for (no, gray), im in zip(got, imgs):
        np.testing.assert_array_equal(gray, im.astype(np.int64))


def test_avi_mjpeg_every_n_sampling_and_odd_sized_frames():
    from deathmetal_datalake_spark.operators.jpeg import avi_mjpeg_frame_luma

    imgs = [_gradient(13, 21, seed=20 + i) for i in range(6)]
    frames = [_encode_jpeg([im], "444", _Q_ONES) for im in imgs]
    avi = _encode_avi_mjpeg(frames, 21, 13)
    got = avi_mjpeg_frame_luma(avi, every_n=2)
    assert [no for no, _ in got] == [0, 2, 4]
    for no, gray in got:
        assert gray.shape == (13, 21)
        assert np.abs(gray - imgs[no].astype(np.int64)).max() <= 2


def test_avi_rejects_non_avi_and_empty_movi():
    from deathmetal_datalake_spark.operators.jpeg import avi_mjpeg_frames

    with pytest.raises(ValueError):
        list(avi_mjpeg_frames(b"RIFF\x04\x00\x00\x00WAVE"))
    empty = b"RIFF" + struct.pack("<I", 4) + b"AVI "
    with pytest.raises(ValueError):
        list(avi_mjpeg_frames(empty))


def test_video_scene_change_pipeline_with_real_mjpeg(spark):
    # End-to-end: AVI payloads through an Arrow mapInPandas stage that
    # decodes REAL frames and reports per-frame mean luma — the actual
    # video feature-extract shape (the byte-slicing fake's real twin).
    import pandas as pd

    from deathmetal_datalake_spark.operators.jpeg import avi_mjpeg_frame_luma

    def batches(it):
        for pdf in it:
            ids, nos, means = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                for no, gray in avi_mjpeg_frame_luma(bytes(content)):
                    ids.append(mid)
                    nos.append(no)
                    means.append(int(gray.mean()))
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": nos, "mean_luma": means}
            )

    flat = [np.full((16, 16), v, dtype=np.uint8) for v in (10, 10, 200, 200)]
    avi = _encode_avi_mjpeg(
        [_encode_jpeg([im], "444", _Q_ONES) for im in flat], 16, 16
    )
    df = spark.createDataFrame(
        [(1, bytearray(avi))], "media_id long, content binary"
    )
    rows = df.mapInPandas(
        batches, schema="media_id long, frame_no long, mean_luma long"
    ).collect()
    got = {r["frame_no"]: r["mean_luma"] for r in rows}
    assert got == {0: 10, 1: 10, 2: 200, 3: 200}
