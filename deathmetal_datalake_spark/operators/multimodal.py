"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB (per the build mandate): the
payload is an opaque ``binary`` column carried next to typed metadata;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes never round-trip through Python row by
row. The compressed-media codec work (PIL/ffmpeg/librosa) is NOT
available in this environment, so those codec call sites are stubbed
behind ``NotImplementedError`` with a deterministic fake used by tests
and the oracle-checked query — the Spark-side plumbing (schema,
batching, partitioning, UDF signatures) is real. Five codecs ARE
real, stdlib-only, behind the same decoder protocol: ``wav_pcm_decode``
(RIFF/WAVE integer PCM + µ-law/A-law, rounds 8-9), ``bmp_decode``
(uncompressed BMP, round 8), ``png_decode`` (zlib inflate + per-row
unfilter incl. Paeth, round 9), and ``operators/jpeg.jpeg_decode``
(baseline sequential JPEG from first principles — Huffman entropy
decode, dequant, orthonormal IDCT, 4:2:0 upsampling, round 9) plus
``jpeg.avi_mjpeg_frames`` (MJPEG-in-AVI container walk — REAL video
frame sampling, round 9) and ``gif_decode`` (stdlib LZW incl. KwKwK +
interlacing, round 9). MP3/H.264 remain environment-bound stubs.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Canonical multimodal record layout: payload + typed metadata columns.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),  # image|audio|video
        StructField("content", BinaryType(), True),
        StructField("source", StringType(), True),
    ]
)

_DECODE_OUT = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("digest", StringType(), True),
    ]
)


def _real_decode(content: bytes) -> dict:
    """Codec call site. Image/audio libs are not installed in this
    container; a real deployment plugs PIL/ffmpeg in here."""
    raise NotImplementedError(
        "media codecs (PIL/ffmpeg) are not available in this environment; "
        "use deterministic_decode for tests"
    )


def deterministic_decode(content: bytes) -> dict:
    """Deterministic fake decoder: byte length + md5 hex digest —
    cross-checkable from SQL (octet_length / md5)."""
    import hashlib

    return {"n_bytes": len(content), "digest": hashlib.md5(content).hexdigest()}


def decode_media(
    df: DataFrame,
    decoder: Callable[[bytes], dict] = _real_decode,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Arrow-batched decode stage: (id, binary) → (id, n_bytes, digest).

    ``mapInPandas`` streams whole Arrow record batches into one Python
    call per batch — the payload column is a zero-copy Arrow buffer, not
    per-row pickled bytes. Partitioning is inherited from the input, so
    at scale you ``repartition`` upstream by expected decode cost, not
    here.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = pdf[content_col].map(lambda b: decoder(bytes(b)))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "n_bytes": decoded.map(lambda d: d["n_bytes"]),
                    "digest": decoded.map(lambda d: d["digest"]),
                }
            )

    spread = df.select(id_col, content_col)
    spread = spread.repartition(spread.sparkSession.sparkContext.defaultParallelism)
    return spread.mapInPandas(batches, schema=_DECODE_OUT)


_FRAME_OUT = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_no", LongType(), False),
        StructField("frame", BinaryType(), True),
    ]
)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 64,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Frame-sampling plumbing (video → frames fan-out shape): one input
    row explodes to N output rows through an Arrow batch iterator. The
    deterministic fake slices the payload every ``every_n_bytes``; a real
    deployment replaces the slicer with an ffmpeg keyframe reader."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nos, frames = [], [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                raw = bytes(content)
                for i in range(0, max(len(raw), 1), every_n_bytes):
                    ids.append(mid)
                    nos.append(i // every_n_bytes)
                    frames.append(raw[i : i + every_n_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frames})

    spread = df.select(id_col, content_col)
    spread = spread.repartition(spread.sparkSession.sparkContext.defaultParallelism)
    return spread.mapInPandas(batches, schema=_FRAME_OUT)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: the documents table viewed as a binary corpus (utf-8
    payloads) — lets the multimodal plumbing be exercised and
    oracle-checked against real test data."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
        F.col("source").alias("source"),
    )


_RESIZE_OUT = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("content", BinaryType(), True),
        StructField("orig_bytes", LongType(), True),
        StructField("new_bytes", LongType(), True),
    ]
)


def resize_media(
    df: DataFrame,
    target_bytes: int = 256,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Resize stage (image downscale shape): payload in, smaller payload
    out, sizes reported. The deterministic fake caps the payload at
    ``target_bytes`` (truncate-only, so the size law is cross-checkable
    as LEAST(octet_length, target) from SQL); a real deployment replaces
    the slicer with a PIL thumbnail/ffmpeg scale call."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            raws = pdf[content_col].map(bytes)
            resized = raws.map(lambda b: b[:target_bytes])
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "content": resized,
                    "orig_bytes": raws.map(len),
                    "new_bytes": resized.map(len),
                }
            )

    spread = df.select(id_col, content_col)
    spread = spread.repartition(spread.sparkSession.sparkContext.defaultParallelism)
    return spread.mapInPandas(batches, schema=_RESIZE_OUT)


_FEATURE_DIM = 16

_FEATURE_OUT = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("features", ArrayType(LongType()), True),
    ]
)


def extract_features(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Feature-extraction stage (CLIP-embedding shape): payload →
    fixed-dim vector, one Arrow batch per Python call. The deterministic
    fake embeds the md5 digest's 16 bytes, which SQL reproduces from
    hex-slicing md5() — so the whole Arrow path is oracle-checkable; a
    real deployment swaps in a model forward pass over the batch."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf[content_col].map(
                lambda b: list(hashlib.md5(bytes(b)).digest())
            )
            yield pd.DataFrame({"media_id": pdf[id_col], "features": feats})

    spread = df.select(id_col, content_col)
    spread = spread.repartition(spread.sparkSession.sparkContext.defaultParallelism)
    return spread.mapInPandas(batches, schema=_FEATURE_OUT)


# ---------------------------------------------------------------------------
# Audio path: PCM decode → windowed energy. The codec call site
# (librosa/ffmpeg resample) is stubbed like the image path; the
# deterministic fake reads the payload as unsigned 8-bit PCM, which
# makes the windowed energy (sum of squared samples) an EXACT integer
# law DuckDB can replay byte-for-byte via hex().
# ---------------------------------------------------------------------------

_AUDIO_ENERGY_OUT = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("window_id", LongType(), False),
        StructField("n_samples", LongType(), False),
        StructField("energy", LongType(), False),
    ]
)


def _real_pcm_decode(content: bytes):
    """Codec call site: a real deployment decodes LOSSY-COMPRESSED audio
    to a PCM sample array here (ffmpeg/librosa — MP3/AAC need external
    libs). RIFF/WAVE PCM + G.711 (``wav_pcm_decode``) and lossless FLAC
    (``operators/flac.flac_pcm_decode``) are already REAL stdlib paths —
    ``audio_pcm_decode`` below sniffs and dispatches both."""
    raise NotImplementedError(
        "lossy-audio codecs (MP3/AAC) are not available in this "
        "environment; use audio_pcm_decode for WAV/FLAC payloads or "
        "deterministic_pcm_decode for oracle-checked tests"
    )


def audio_pcm_decode(content: bytes):
    """Sniff-and-dispatch REAL audio decode: RIFF/WAVE → stdlib chunk
    parser, FLAC → the stdlib fixed/Rice decoder. Raises ``ValueError``
    for formats with no real path here (the ``media_average_hash``
    convention: mixed corpora fail loudly, nothing hashes noise)."""
    fmt = sniff_format(content)
    if fmt == "wav":
        return wav_pcm_decode(content)
    if fmt == "flac":
        from deathmetal_datalake_spark.operators.flac import flac_pcm_decode

        return flac_pcm_decode(content)
    raise ValueError(f"no real PCM decode path for sniffed format '{fmt}'")


def deterministic_pcm_decode(content: bytes):
    """Deterministic fake: payload bytes AS unsigned 8-bit samples."""
    import numpy as np

    return np.frombuffer(bytes(content), dtype=np.uint8).astype(np.int64)


def wav_pcm_decode(content: bytes):
    """REAL decoder for RIFF/WAVE integer-PCM payloads — pure-stdlib
    chunk parsing, no external codec libs (round 8: the first genuine
    codec behind the decoder protocol; the deterministic fake stays the
    default for oracle-checked queries). Round 9 widens it to the
    G.711 companded telephony formats (tag 7 mu-law, tag 6 A-law) via
    table-free bit arithmetic, so a real-world telephony corpus no
    longer degrades to the loud ValueError.

    Walks the RIFF chunk list (word-aligned), reads ``fmt `` (format
    tag, channels, bit depth) and ``data``, and returns the first
    channel's samples as int64: 8-bit PCM is unsigned-biased per spec
    (centered by -128), 16/24/32-bit are little-endian signed (24-bit
    sign-extended manually — numpy has no 3-byte dtype). Raises
    ``ValueError`` on non-WAVE payloads and non-integer-PCM format tags
    so a mis-tagged corpus fails loudly instead of yielding garbage
    energies.
    """
    import struct

    import numpy as np

    b = bytes(content)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    pos = 12
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, _rate, _byte_rate, _block_align, bits = fmt
    if audio_format not in (1, 6, 7):
        raise ValueError(
            f"unsupported WAVE format tag {audio_format} "
            "(integer PCM, A-law, mu-law only)"
        )
    if n_channels < 1:
        raise ValueError("zero-channel WAVE")
    if audio_format in (6, 7):
        # G.711 companded telephony audio (round 9): table-free stdlib
        # expansion to 16-bit linear PCM. Format tag 7 = mu-law
        # (complement, then mag = ((m<<3)+0x84)<<e - 0x84, sign bit set
        # means negative); tag 6 = A-law (XOR 0x55; seg 0 is linear,
        # segs >= 1 add the 0x100 leading bit then shift; sign bit SET
        # means POSITIVE — the convention difference that bites every
        # hand-rolled decoder). Both are 8-bit by spec.
        if bits != 8:
            raise ValueError(f"G.711 WAVE must be 8-bit, got {bits}")
        u = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
        if audio_format == 7:
            u = (~u) & 0xFF
            mag = ((((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)) - 0x84
            arr = np.where(u & 0x80, -mag, mag)
        else:
            a = u ^ 0x55
            e = (a >> 4) & 0x07
            m = a & 0x0F
            mag = np.where(
                e == 0, (m << 4) + 8, ((m << 4) + 0x108) << np.maximum(e - 1, 0)
            )
            arr = np.where(a & 0x80, mag, -mag)
        frames = arr.shape[0] // n_channels
        return arr[: frames * n_channels].reshape(-1, n_channels)[:, 0]
    if bits == 8:
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.int64) - 128
    elif bits == 16:
        arr = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2").astype(np.int64)
    elif bits == 32:
        arr = np.frombuffer(data[: len(data) // 4 * 4], dtype="<i4").astype(np.int64)
    elif bits == 24:
        raw = np.frombuffer(data[: len(data) // 3 * 3], dtype=np.uint8)
        raw = raw.reshape(-1, 3).astype(np.int64)
        arr = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
        arr = (arr ^ 0x800000) - 0x800000  # sign-extend bit 23
    else:
        raise ValueError(f"unsupported PCM bit depth {bits}")
    frames = arr.shape[0] // n_channels
    return arr[: frames * n_channels].reshape(-1, n_channels)[:, 0]


def audio_energy_windows(
    df: DataFrame,
    window_samples: int = 64,
    decoder: Callable[[bytes], "object"] = _real_pcm_decode,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """(id, binary) → per-window (n_samples, energy) rows, vectorized.

    Energy is the sum of squared samples per fixed-size window — the
    standard VAD / silence-trim feature. The window reduction runs as
    one numpy ``reduceat`` per payload (no Python loop over samples);
    fan-out and batching go through the same Arrow ``mapInPandas``
    shape as the frame sampler.
    """
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, wins, counts, energies = [], [], [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                samples = decoder(content)
                n = len(samples)
                if n == 0:
                    continue
                edges = np.arange(0, n, window_samples)
                sq = samples * samples
                e = np.add.reduceat(sq, edges)
                c = np.diff(np.append(edges, n))
                ids.extend([mid] * len(edges))
                wins.extend(range(len(edges)))
                counts.extend(int(x) for x in c)
                energies.extend(int(x) for x in e)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "window_id": pd.Series(wins, dtype="int64"),
                    "n_samples": pd.Series(counts, dtype="int64"),
                    "energy": pd.Series(energies, dtype="int64"),
                }
            )

    spread = df.select(id_col, content_col)
    spread = spread.repartition(spread.sparkSession.sparkContext.defaultParallelism)
    return spread.mapInPandas(batches, schema=_AUDIO_ENERGY_OUT)


# ---------------------------------------------------------------------------
# Perceptual hashing: payload → compact bit signature whose Hamming
# distance tracks perceptual similarity (pHash/aHash family). The real
# image pipeline decodes pixels, downsamples, and thresholds a DCT /
# mean grid; that codec step is stubbed like every decode here, and the
# deterministic fake applies the SAME mean-threshold law to 60 evenly
# sampled payload bytes — an exact integer rule SQL replays from
# hex(), so the Arrow stage is oracle-checkable end-to-end.
# ---------------------------------------------------------------------------

_PHASH_BITS = 60

_PHASH_OUT = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("phash", LongType(), False),
    ]
)


def _real_phash(content: bytes) -> int:
    """Codec call site: a real deployment plugs its preferred library
    decoder here. BMP, PNG, TIFF, GIF, and baseline JPEG already have
    REAL stdlib paths — ``bmp_average_hash``, ``png_average_hash``,
    ``tiff_average_hash``, ``gif_average_hash``, and
    ``operators/jpeg.jpeg_average_hash``."""
    raise NotImplementedError(
        "no library codecs in this environment; use bmp/png/tiff/gif"
        "_average_hash or jpeg.jpeg_average_hash for those formats, "
        "or deterministic_phash for oracle-checked tests"
    )


def bmp_decode(content: bytes):
    """REAL decoder for uncompressed BMP (BI_RGB) payloads — pure
    stdlib struct parsing, no codec libs (round 8: the image twin of
    ``wav_pcm_decode``). Returns the image as an (H, W) int64 GRAYSCALE
    array via the integer ITU-R 601 luma ((299·R + 587·G + 114·B) //
    1000 — exact, no floats). Supports 24-bit true color and 8-bit
    paletted pixels, bottom-up (positive height) and top-down rows,
    and the spec's 4-byte row padding. Raises ``ValueError`` on
    non-BMP payloads and compressed/unsupported variants so a
    mis-tagged corpus fails loudly.
    """
    import struct

    import numpy as np

    b = bytes(content)
    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pixel_offset,) = struct.unpack_from("<I", b, 10)
    (hdr_size,) = struct.unpack_from("<I", b, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack_from("<ii", b, 18)
    (bpp,) = struct.unpack_from("<H", b, 28)
    (compression,) = struct.unpack_from("<I", b, 30)
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression} (BI_RGB only)")
    if width <= 0 or height == 0:
        raise ValueError("degenerate BMP dimensions")
    top_down = height < 0
    h = abs(height)
    if bpp == 24:
        stride = (width * 3 + 3) & ~3
        rows = []
        for r in range(h):
            off = pixel_offset + r * stride
            row = np.frombuffer(b[off : off + width * 3], dtype=np.uint8)
            if row.shape[0] < width * 3:
                raise ValueError("truncated BMP pixel data")
            px = row.reshape(-1, 3).astype(np.int64)  # spec order: B, G, R
            rows.append((299 * px[:, 2] + 587 * px[:, 1] + 114 * px[:, 0]) // 1000)
        img = np.stack(rows)
    elif bpp == 8:
        (colors_used,) = struct.unpack_from("<I", b, 46)
        n_colors = colors_used or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            b[pal_off : pal_off + 4 * n_colors], dtype=np.uint8
        ).reshape(-1, 4).astype(np.int64)  # B, G, R, reserved
        gray_lut = (299 * pal[:, 2] + 587 * pal[:, 1] + 114 * pal[:, 0]) // 1000
        stride = (width + 3) & ~3
        rows = []
        for r in range(h):
            off = pixel_offset + r * stride
            idx = np.frombuffer(b[off : off + width], dtype=np.uint8)
            if idx.shape[0] < width:
                raise ValueError("truncated BMP pixel data")
            rows.append(gray_lut[idx.astype(np.int64)])
        img = np.stack(rows)
    else:
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    return img if top_down else img[::-1]


def _ahash_from_gray(img) -> int:
    """Classic 8×8 average hash over an (H, W) int64 grayscale array:
    exact integer area pooling, mean-threshold, packed to the low 60
    bits (``_PHASH_BITS`` positive-BIGINT convention) so every real
    decoder (BMP, PNG, ...) rides the same banded-LSH/Hamming
    machinery as the deterministic fake."""
    import numpy as np

    h, w = img.shape
    # Integer area pooling: cell (i, j) averages rows [i*h//8, (i+1)*h//8).
    re = (np.arange(9, dtype=np.int64) * h) // 8
    ce = (np.arange(9, dtype=np.int64) * w) // 8
    cells = np.empty((8, 8), dtype=np.int64)
    for i in range(8):
        for j in range(8):
            blk = img[re[i] : max(re[i + 1], re[i] + 1),
                      ce[j] : max(ce[j + 1], ce[j] + 1)]
            cells[i, j] = int(blk.sum()) // blk.size
    flat = cells.ravel()
    mean = int(flat.sum()) // 64
    # Pack the first 60 of the 64 grid bits (≡ masking the full hash
    # to the low 60 — and bit 59 is the widest int64-safe shift).
    bits = (flat > mean).astype(np.int64)[:_PHASH_BITS]
    return int((bits << np.arange(_PHASH_BITS, dtype=np.int64)).sum())


def bmp_average_hash(content: bytes) -> int:
    """REAL perceptual hash for BMP payloads: ``bmp_decode`` +
    :func:`_ahash_from_gray` (round 8)."""
    return _ahash_from_gray(bmp_decode(content))


def png_decode(content: bytes):
    """REAL decoder for PNG payloads — pure stdlib (zlib inflate +
    struct chunk walk + per-row unfilter), no codec libs (round 9:
    PNG is the one compressed image format decodable without external
    libraries). Returns the image as an (H, W) int64 GRAYSCALE array
    via the same integer ITU-R 601 luma as ``bmp_decode``.

    Supports 8-bit-depth images of every PNG color type — grayscale
    (0), truecolor (2), palette (3, via PLTE), gray+alpha (4) and
    RGBA (6, alpha dropped: luma only) — and all five row filters
    (None/Sub/Up/Average/Paeth). Raises ``ValueError`` on non-PNG
    payloads, non-8-bit depths, and Adam7 interlacing so a mis-tagged
    corpus fails loudly instead of yielding garbage hashes.
    """
    import struct
    import zlib

    import numpy as np

    b = bytes(content)
    if len(b) < 8 or b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(b):
        (length,) = struct.unpack_from(">I", b, pos)
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data[:13])
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7 interlacing not supported")
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (8 only)")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"unknown PNG color type {color_type}")
    if width == 0 or height == 0:
        raise ValueError("degenerate PNG dimensions")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) < height * (stride + 1):
        raise ValueError("truncated PNG pixel data")

    # Per-row unfiltering (spec §6): Up/None vectorize; Sub/Average/
    # Paeth recur on the previous pixel, so those rows run a per-byte
    # loop — fine for the decode sizes this stage batches (an Arrow
    # batch of thumbnails), and exactness beats cleverness here.
    def _paeth(a, p, c):
        q = a + p - c
        pa, pb, pc = abs(q - a), abs(q - p), abs(q - c)
        if pa <= pb and pa <= pc:
            return a
        return p if pb <= pc else c

    prior = np.zeros(stride, dtype=np.int64)
    out_rows = []
    for r in range(height):
        off = r * (stride + 1)
        ftype = raw[off]
        row = np.frombuffer(raw[off + 1 : off + 1 + stride], dtype=np.uint8).astype(
            np.int64
        )
        if ftype == 0:
            recon = row
        elif ftype == 2:
            recon = (row + prior) & 0xFF
        elif ftype in (1, 3, 4):
            recon = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                a = recon[x - channels] if x >= channels else 0
                p = prior[x]
                c = prior[x - channels] if x >= channels else 0
                if ftype == 1:
                    recon[x] = (row[x] + a) & 0xFF
                elif ftype == 3:
                    recon[x] = (row[x] + (a + p) // 2) & 0xFF
                else:
                    recon[x] = (row[x] + _paeth(a, p, c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG row filter {ftype}")
        prior = recon
        out_rows.append(recon)
    px = np.stack(out_rows).reshape(height, width, channels)
    if color_type == 0:
        return px[:, :, 0]
    if color_type == 4:
        return px[:, :, 0]  # gray + alpha: luma is the gray channel
    if color_type == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("paletted PNG without a valid PLTE chunk")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
        lut = (299 * pal[:, 0] + 587 * pal[:, 1] + 114 * pal[:, 2]) // 1000
        return lut[px[:, :, 0]]
    # truecolor (2) / RGBA (6): integer ITU-R 601 luma, alpha dropped.
    return (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000


def png_average_hash(content: bytes) -> int:
    """REAL perceptual hash for PNG payloads: ``png_decode`` +
    :func:`_ahash_from_gray` — the same 60-bit aHash convention as
    ``bmp_average_hash``, so PNG payloads ride the identical
    banded-LSH/Hamming machinery (round 9)."""
    return _ahash_from_gray(png_decode(content))


def deterministic_phash(content: bytes) -> int:
    """Mean-threshold hash over 60 evenly sampled payload bytes:
    bit_i = 1 iff 60·byte[i·n//60] > sum(sampled bytes). Exact integer
    arithmetic — no floats — so DuckDB reproduces it bit-for-bit."""
    import numpy as np

    arr = np.frombuffer(bytes(content), dtype=np.uint8).astype(np.int64)
    n = arr.shape[0]
    if n == 0:
        # Empty payload: defined as 0 (no sampled byte exceeds the
        # mean). The oracle mirrors this rule (n = 0 branch).
        return 0
    idx = (np.arange(_PHASH_BITS, dtype=np.int64) * n) // _PHASH_BITS
    sample = arr[idx]
    total = int(sample.sum())
    bits = (_PHASH_BITS * sample > total).astype(np.int64)
    return int((bits << np.arange(_PHASH_BITS, dtype=np.int64)).sum())


def perceptual_hashes(
    df: DataFrame,
    hasher: Callable[[bytes], int] = _real_phash,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Arrow-batched perceptual-hash stage: (id, binary) → (id, phash).
    One Python call per Arrow batch; payloads stay in Arrow buffers."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashes = pdf[content_col].map(lambda b: hasher(bytes(b)))
            yield pd.DataFrame({"media_id": pdf[id_col], "phash": hashes})

    spread = df.select(id_col, content_col)
    spread = spread.repartition(spread.sparkSession.sparkContext.defaultParallelism)
    return spread.mapInPandas(batches, schema=_PHASH_OUT)


def png_encode_gray(img) -> bytes:
    """Minimal lossless PNG ENCODER for (H, W) uint8/int grayscale
    arrays — stdlib zlib + struct, filter type 0 every row (round 9:
    the write half that makes the resize stage REAL for images; the
    decoder round-trips it bit-exactly, and the decoder itself is
    validated against an independent encoder in the tests)."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(img)
    if a.ndim != 2:
        raise ValueError("png_encode_gray expects an (H, W) array")
    a = np.clip(a, 0, 255).astype(np.uint8)
    h, w = a.shape

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + a[r].tobytes() for r in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def png_resize_gray(content: bytes, max_side: int) -> bytes:
    """REAL image resize: ``png_decode`` → exact integer box-average
    downscale to ``max_side`` on the longer edge (area pooling over an
    integer-boundary grid, the aHash pooling law) → ``png_encode_gray``.
    Images already within bounds are re-encoded unchanged (lossless)."""
    import numpy as np

    img = png_decode(content)
    h, w = img.shape
    if max(h, w) > max_side:
        if h >= w:
            nh = max_side
            nw = max(1, (w * max_side) // h)
        else:
            nw = max_side
            nh = max(1, (h * max_side) // w)
        re = (np.arange(nh + 1, dtype=np.int64) * h) // nh
        ce = (np.arange(nw + 1, dtype=np.int64) * w) // nw
        out = np.empty((nh, nw), dtype=np.int64)
        for i in range(nh):
            for j in range(nw):
                blk = img[re[i] : max(re[i + 1], re[i] + 1),
                          ce[j] : max(ce[j + 1], ce[j] + 1)]
                out[i, j] = int(blk.sum()) // blk.size
        img = out
    return png_encode_gray(img)


def resize_media_png(
    df: DataFrame,
    max_side: int = 64,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """The REAL twin of ``resize_media`` for PNG payloads: decode,
    integer box downscale, lossless re-encode — same Arrow
    ``mapInPandas`` shape and output schema as the byte-cap fake."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            raws = pdf[content_col].map(bytes)
            resized = raws.map(lambda b: png_resize_gray(b, max_side))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "content": resized,
                    "orig_bytes": raws.map(len),
                    "new_bytes": resized.map(len),
                }
            )

    spread = df.select(id_col, content_col)
    spread = spread.repartition(spread.sparkSession.sparkContext.defaultParallelism)
    return spread.mapInPandas(batches, schema=_RESIZE_OUT)


_SPECTRAL_OUT = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("window_id", LongType(), False),
        StructField("n_samples", LongType(), False),
        StructField("centroid", DoubleType(), True),
        StructField("rolloff85", DoubleType(), True),
        StructField("peak_bin", LongType(), True),
    ]
)


def audio_spectral_windows(
    df: DataFrame,
    window_samples: int = 64,
    decoder: Callable[[bytes], "object"] = _real_pcm_decode,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """REAL frequency-domain audio features (round 9): per fixed-size
    window, the rFFT magnitude spectrum's CENTROID (energy-weighted
    mean normalized frequency, cycles/sample ∈ [0, 0.5]), 85% energy
    ROLLOFF frequency, and the peak bin — the classic VAD/music-vs-
    speech feature set one tier above time-domain energy. One batched
    ``numpy.fft.rfft`` per payload (windows stacked into a matrix —
    no Python loop over windows), Arrow ``mapInPandas`` shape as the
    energy stage. DC is excluded from the spectrum statistics so a
    constant (silent-offset) window reports NULL centroid instead of
    calling bias "frequency content"."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, wins, counts, cents, rolls, peaks = [], [], [], [], [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                samples = np.asarray(decoder(content), dtype=np.float64)
                n = samples.shape[0]
                if n == 0:
                    continue
                nwin = (n + window_samples - 1) // window_samples
                # Edge-pad the ragged last window: zero-padding would
                # inject a step (artificial spectrum) into constant
                # signals; repeating the final sample keeps a constant
                # window constant (DC-only -> NULL features).
                padded = np.full(nwin * window_samples, samples[-1], dtype=np.float64)
                padded[:n] = samples
                mat = padded.reshape(nwin, window_samples)
                spec = np.abs(np.fft.rfft(mat, axis=1))
                spec[:, 0] = 0.0  # drop DC from the statistics
                power = spec * spec
                tot = power.sum(axis=1)
                nbins = spec.shape[1]
                freqs = np.arange(nbins) / float(window_samples)
                for wid in range(nwin):
                    ids.append(mid)
                    wins.append(wid)
                    counts.append(
                        int(min(window_samples, n - wid * window_samples))
                    )
                    if tot[wid] <= 0.0:
                        cents.append(None)
                        rolls.append(None)
                        peaks.append(None)
                        continue
                    p = power[wid]
                    cents.append(round(float((freqs * p).sum() / tot[wid]), 6))
                    cum = np.cumsum(p)
                    k = int(np.searchsorted(cum, 0.85 * tot[wid]))
                    rolls.append(round(float(freqs[min(k, nbins - 1)]), 6))
                    peaks.append(int(p.argmax()))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "window_id": pd.Series(wins, dtype="int64"),
                    "n_samples": pd.Series(counts, dtype="int64"),
                    "centroid": pd.Series(cents, dtype="float64"),
                    "rolloff85": pd.Series(rolls, dtype="float64"),
                    "peak_bin": pd.Series(peaks, dtype="Int64"),
                }
            )

    spread = df.select(id_col, content_col)
    spread = spread.repartition(spread.sparkSession.sparkContext.defaultParallelism)
    return spread.mapInPandas(batches, schema=_SPECTRAL_OUT)


def gif_decode(content: bytes):
    """REAL decoder for GIF87a/GIF89a payloads — pure stdlib LZW
    decompression (variable-width LSB-first codes, clear/EOI handling,
    dictionary growth to 4096 incl. the KwKwK case), global/local
    color tables, Adam-style 4-pass interlacing, first frame only
    (round 9: the last stdlib-reachable mainstream image format).
    Returns the usual (H, W) int64 grayscale grid via the integer
    ITU-R 601 luma of the palette. Raises ``ValueError`` on non-GIF
    payloads or truncated/invalid LZW streams."""
    import struct

    import numpy as np

    b = bytes(content)
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_pal = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8).reshape(
            -1, 3
        )
        pos += 3 * n
    while pos < len(b):
        block = b[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
        _lx, _ly, w, h, iflags = struct.unpack_from("<HHHHB", b, pos + 1)
        pos += 10
        pal = global_pal
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image without a color table")
        interlaced = bool(iflags & 0x40)
        mcs = b[pos]
        pos += 1
        data = bytearray()
        while pos < len(b) and b[pos] != 0:
            ln = b[pos]
            data += b[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1  # sub-block terminator

        # --- LZW decompression ---
        clear = 1 << mcs
        eoi = clear + 1
        width = mcs + 1
        dict_init = [(i,) for i in range(clear)] + [None, None]
        table = list(dict_init)
        out: list[int] = []
        prev = None
        acc = 0
        nbits = 0
        di = 0
        finished = False
        while not finished:
            while nbits < width:
                if di >= len(data):
                    raise ValueError("truncated GIF LZW stream")
                acc |= data[di] << nbits
                nbits += 8
                di += 1
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(dict_init)
                width = mcs + 1
                prev = None
                continue
            if code == eoi:
                finished = True
                continue
            if code < len(table) and table[code] is not None:
                entry = table[code]
                if prev is not None:
                    table.append(prev + (entry[0],))
            elif code == len(table) and prev is not None:
                entry = prev + (prev[0],)  # the KwKwK case
                table.append(entry)
            else:
                raise ValueError("invalid GIF LZW code")
            out.extend(entry)
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
        idx = np.array(out[: w * h], dtype=np.int64)
        if idx.shape[0] < w * h:
            raise ValueError("GIF pixel data short of the frame size")
        img = idx.reshape(h, w)
        if interlaced:
            deinter = np.empty_like(img)
            rows = (
                list(range(0, h, 8))
                + list(range(4, h, 8))
                + list(range(2, h, 4))
                + list(range(1, h, 2))
            )
            for src, dst in enumerate(rows):
                deinter[dst] = img[src]
            img = deinter
        p = pal.astype(np.int64)
        lut = (299 * p[:, 0] + 587 * p[:, 1] + 114 * p[:, 2]) // 1000
        return lut[img]
    raise ValueError("GIF payload contains no image block")


def gif_average_hash(content: bytes) -> int:
    """60-bit aHash over the decoded GIF luma — same convention as the
    BMP/PNG/JPEG hashes."""
    return _ahash_from_gray(gif_decode(content))


def _packbits_decode(b: bytes) -> bytes:
    """Apple PackBits (TIFF compression 32773), pure stdlib: n in
    0..127 copies n+1 literal bytes; n in 129..255 repeats the next
    byte 257−n times; n == 128 is a no-op."""
    out = bytearray()
    i, n = 0, len(b)
    while i < n:
        c = b[i]
        i += 1
        if c < 128:
            j = i + c + 1
            if j > n:
                raise ValueError("truncated PackBits literal run")
            out += b[i:j]
            i = j
        elif c > 128:
            if i >= n:
                raise ValueError("truncated PackBits repeat run")
            out += bytes([b[i]]) * (257 - c)
            i += 1
        # c == 128: no-op
    return bytes(out)


def tiff_decode(content: bytes):
    """REAL decoder for baseline TIFF payloads — pure stdlib IFD walk,
    no codec libs (the strip-organized sibling of ``bmp_decode``).
    Supports both byte orders (II/MM), 8-bit grayscale
    (PhotometricInterpretation 0/1 — WhiteIsZero inverts) and 8-bit
    RGB, uncompressed (1) and PackBits (32773) strips, and multi-strip
    images. Returns (H, W) int64 grayscale via the same exact integer
    ITU-R 601 luma as BMP/PNG. Raises ``ValueError`` on non-TIFF
    payloads and unsupported variants (tiles, LZW, sub-8-bit) so a
    mis-tagged corpus fails loudly.
    """
    import struct

    import numpy as np

    b = bytes(content)
    if len(b) < 8 or b[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF payload")
    bo = "<" if b[:2] == b"II" else ">"
    (magic,) = struct.unpack_from(bo + "H", b, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    (ifd_off,) = struct.unpack_from(bo + "I", b, 4)
    if ifd_off + 2 > len(b):
        raise ValueError("truncated TIFF IFD offset")
    (n_entries,) = struct.unpack_from(bo + "H", b, ifd_off)
    if ifd_off + 2 + 12 * n_entries > len(b):
        raise ValueError("truncated TIFF IFD entry table")

    _TYPE_SIZE = {1: 1, 3: 2, 4: 4}

    def entry_values(pos: int):
        # Every offset is bounds-checked before unpacking so a corrupt
        # IFD or value offset raises the documented ValueError, never a
        # bare struct.error that bypasses callers' quarantine routing
        # (ADVICE r9).
        tag, typ, cnt = struct.unpack_from(bo + "HHI", b, pos)
        if typ not in _TYPE_SIZE:
            return tag, None
        size = _TYPE_SIZE[typ] * cnt
        off = pos + 8 if size <= 4 else struct.unpack_from(bo + "I", b, pos + 8)[0]
        if off + size > len(b):
            raise ValueError(f"TIFF tag {tag} value offset out of range")
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        vals = struct.unpack_from(bo + str(cnt) + fmt, b, off)
        return tag, list(vals)

    tags: dict = {}
    for k in range(n_entries):
        tag, vals = entry_values(ifd_off + 2 + 12 * k)
        if vals is not None:
            tags[tag] = vals

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    width, height = one(256), one(257)
    spp = one(277, 1)
    bits = tags.get(258, [8])
    compression = one(259, 1)
    photometric = one(262, 1)
    if any(x != 8 for x in bits):
        raise ValueError(f"unsupported TIFF BitsPerSample {bits} (8-bit only)")
    if spp not in (1, 3):
        raise ValueError(f"unsupported TIFF SamplesPerPixel {spp}")
    if compression not in (1, 32773):
        raise ValueError(
            f"unsupported TIFF compression {compression} (none/PackBits only)"
        )
    if photometric not in (0, 1, 2):
        raise ValueError(f"unsupported TIFF photometric {photometric}")
    if width <= 0 or height <= 0:
        raise ValueError("degenerate TIFF dimensions")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF strip tables missing or inconsistent")

    data = bytearray()
    for off, cnt in zip(offsets, counts):
        strip = b[off : off + cnt]
        if len(strip) < cnt:
            raise ValueError("truncated TIFF strip")
        data += _packbits_decode(strip) if compression == 32773 else strip
    need = width * height * spp
    if len(data) < need:
        raise ValueError("TIFF pixel data shorter than dimensions require")
    px = np.frombuffer(bytes(data[:need]), dtype=np.uint8).astype(np.int64)
    if spp == 3:
        px = px.reshape(height, width, 3)
        img = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
    else:
        img = px.reshape(height, width)
        if photometric == 0:  # WhiteIsZero
            img = 255 - img
    return img


def tiff_average_hash(content: bytes) -> int:
    """REAL perceptual hash for TIFF payloads: ``tiff_decode`` +
    :func:`_ahash_from_gray` — same 60-bit convention as BMP/PNG/GIF/
    JPEG, so TIFF corpora ride the identical near-dup machinery."""
    return _ahash_from_gray(tiff_decode(content))


# ---------------------------------------------------------------------------
# Format sniffing + auto-dispatch: a real ingestion corpus is a bag of
# mixed payloads, so the decode stage first classifies by MAGIC BYTES
# (never by file extension — the thing mis-tagged corpora lie about)
# and routes each payload to its REAL stdlib decoder. Unknown formats
# stay unknown — the caller decides whether to quarantine or fall back
# to the deterministic fake; nothing silently guesses.
# ---------------------------------------------------------------------------


def sniff_format(content: bytes) -> str:
    """Classify a payload by magic bytes: one of 'bmp', 'png', 'gif',
    'tiff', 'jpeg', 'wav', 'flac', 'avi', or 'unknown'."""
    b = bytes(content[:16])
    if b[:4] == b"fLaC":
        return "flac"
    if b[:2] == b"BM":
        return "bmp"
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if b[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if b[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav"
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        return "avi"
    return "unknown"


def media_average_hash(content: bytes) -> int:
    """Sniff the payload format and route to the matching REAL decoder
    + the shared 60-bit aHash. Raises ``ValueError`` on formats with
    no visual-hash path here (wav/unknown) so mixed corpora fail
    loudly instead of hashing noise."""
    fmt = sniff_format(content)
    if fmt == "bmp":
        return bmp_average_hash(content)
    if fmt == "png":
        return png_average_hash(content)
    if fmt == "gif":
        return gif_average_hash(content)
    if fmt == "tiff":
        return tiff_average_hash(content)
    if fmt == "jpeg":
        from deathmetal_datalake_spark.operators.jpeg import jpeg_average_hash

        return jpeg_average_hash(content)
    raise ValueError(f"no average-hash path for sniffed format '{fmt}'")


def wav_pcm_encode(samples, bits: int = 16, rate: int = 8000) -> bytes:
    """REAL RIFF/WAVE integer-PCM encoder (round 12) — the write half
    of ``wav_pcm_decode``'s stdlib chunk parser, closing the WAV round
    trip the way ``operators/flac.flac_encode`` closed FLAC's. One
    mono channel, little-endian signed 16/32-bit or unsigned-biased
    8-bit per spec; raises on samples outside the target depth so a
    clipped corpus fails loudly instead of wrapping."""
    import struct

    import numpy as np

    s = np.asarray(samples, dtype=np.int64)
    if bits == 8:
        if s.size and (s.min() < -128 or s.max() > 127):
            raise ValueError("samples exceed 8-bit range")
        data = (s + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        if s.size and (s.min() < -(1 << 15) or s.max() >= (1 << 15)):
            raise ValueError("samples exceed 16-bit range")
        data = s.astype("<i2").tobytes()
    elif bits == 32:
        if s.size and (s.min() < -(1 << 31) or s.max() >= (1 << 31)):
            raise ValueError("samples exceed 32-bit range")
        data = s.astype("<i4").tobytes()
    else:
        raise ValueError("bits must be 8, 16, or 32")
    block_align = bits // 8
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * block_align, block_align, bits)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
