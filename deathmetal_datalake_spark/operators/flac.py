"""REAL stdlib FLAC codec — fixed/verbatim prediction + Rice coding,
pure integer math, no codec libs (the PNG/JPEG pattern applied to
lossless audio; round-10, closing the last stdlib-reachable codec-seam
item — MP3/H.264 genuinely need external libs and stay stubbed).

Implements the profile a lossless PCM corpus needs, per the public
FLAC format (RFC 9639): STREAMINFO parsing, fixed-blocking frames,
subframe types CONSTANT / VERBATIM / FIXED orders 0-4 / LPC orders
1-32 (quantized integer predictor + shift), both Rice residual methods
(4- and 5-bit parameters) including the escape-to-raw form, arbitrary
partition orders, wasted-bits shifting, 8/16/24-bit depths, up to 8
independently-coded channels, and all three inter-channel
decorrelation modes for stereo (left/side, right/side, mid/side — the
side channel carries one extra bit per the spec). Every integrity
field is verified — header CRC-8 (poly 0x07), frame CRC-16 (poly
0x8005), and the STREAMINFO MD5 of the decoded stream — raising
``ValueError`` on any mismatch so a corrupt corpus fails loudly (the
same contract as ``wav_pcm_decode``/``tiff_decode``).

``flac_encode`` is the test-side synthesizer (the WAV-vs-``wave``
round-trip pattern): fixed-order prediction chosen per block by exact
cost, optional quantized-LPC prediction (Levinson-Durbin analysis,
integer coefficients + shift, exact integer residual), optional stereo
decorrelation, Rice parameter swept exactly, VERBATIM/CONSTANT
fallbacks, and the general n-byte coded frame number (so streams with
>= 2048 frames stay spec-valid) — enough to produce real, spec-valid
streams for the decoder tests and the Arrow-path end-to-end checks.

Reference parity: the reference pipeline treats media as opaque binary
columns and defers decode to external tooling; this codec makes the
decode stage real for lossless audio the same way the PNG/TIFF/JPEG
decoders did for images (reference analog: its notebooks' media
passthrough, e.g. datalake/flows/bronze.py's untyped blob columns).
"""

from __future__ import annotations

import hashlib
import struct


def _make_crc8_table() -> list[int]:
    table = []
    for v in range(256):
        crc = v
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
        table.append(crc)
    return table


def _make_crc16_table() -> list[int]:
    table = []
    for v in range(256):
        crc = v << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
        table.append(crc)
    return table


_CRC8_TABLE = _make_crc8_table()
_CRC16_TABLE = _make_crc16_table()


def _crc8(data: bytes) -> int:
    # Table-driven byte-at-a-time form of the poly-0x07 bit loop —
    # identical output, 8x fewer Python ops (the bit loop was 32% of
    # encode time in the round-13 roundtrip profile).
    crc = 0
    table = _CRC8_TABLE
    for byte in data:
        crc = table[crc ^ byte]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    table = _CRC16_TABLE
    for byte in data:
        crc = ((crc << 8) & 0xFF00) ^ table[(crc >> 8) ^ byte]
    return crc


class _BitReader:
    """MSB-first bit reader with byte-position access (CRC spans).

    ``bits``/``ones`` (optional) are the whole buffer's unpacked bit
    array and the sorted positions of its one-bits — computed once per
    stream by ``flac_decode`` so the vectorized field/Rice readers
    below can run in numpy instead of bit-by-bit Python (the bit loop
    was 68% of decode time in the round-13 roundtrip profile). The
    scalar ``read`` path is kept for headers and stays bit-identical.
    """

    def __init__(self, b: bytes, pos: int = 0, bits=None, ones=None):
        self.b = b
        self.pos = pos  # byte position
        self.bit = 0  # bits consumed within current byte
        self.bits = bits  # np.uint8[8*len(b)] or None
        self.ones = ones  # np.int64 sorted one-bit positions or None

    def read(self, n: int) -> int:
        out = 0
        while n:
            if self.pos >= len(self.b):
                raise ValueError("truncated FLAC bitstream")
            avail = 8 - self.bit
            take = min(n, avail)
            cur = self.b[self.pos]
            out = (out << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
            n -= take
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self):
        if self.bit:
            self.bit = 0
            self.pos += 1

    # -- vectorized helpers (require self.bits) -------------------------

    def _bitpos(self) -> int:
        return (self.pos << 3) + self.bit

    def _seek_bit(self, bitpos: int):
        self.pos = bitpos >> 3
        self.bit = bitpos & 7

    def read_fixed_signed_vector(self, count: int, width: int):
        """``count`` consecutive ``width``-bit two's-complement fields
        as an int64 array — the vector form of ``read_signed`` in a
        loop (VERBATIM subframes, escaped-raw Rice partitions)."""
        import numpy as np

        if count == 0:
            return np.zeros(0, dtype=np.int64)
        start = self._bitpos()
        end = start + count * width
        if end > len(self.bits):
            raise ValueError("truncated FLAC bitstream")
        field_bits = self.bits[start:end].reshape(count, width).astype(np.int64)
        weights = np.left_shift(np.int64(1), np.arange(width - 1, -1, -1, dtype=np.int64))
        v = field_bits @ weights
        half = np.int64(1) << (width - 1)
        v = np.where(v & half, v - (np.int64(1) << width), v)
        self._seek_bit(end)
        return v

    def read_rice_vector(self, count: int, param: int):
        """``count`` Rice(``param``) codes (unary quotient, stop bit,
        ``param`` remainder bits) decoded to the SIGNED residuals —
        exactly ``(v >> 1) ^ -(v & 1)`` per code, as int64. Advances
        the reader past the last code."""
        import numpy as np

        if count == 0:
            return np.zeros(0, dtype=np.int64)
        bits, ones = self.bits, self.ones
        start = self._bitpos()
        j = int(np.searchsorted(ones, start))
        n_ones = len(ones)
        if param == 0:
            # No remainder bits: every one-bit IS the next stop bit.
            if j + count > n_ones:
                raise ValueError("truncated FLAC bitstream")
            stops = ones[j : j + count].astype(np.int64)
            pos = int(stops[-1]) + 1
        else:
            # Each code consumes exactly one stop bit plus at most
            # ``param`` payload one-bits, so the partition's codes live
            # inside the next count*(1+param) one-bits — slice that
            # window and build a vectorized jump table: nxt[i] = index
            # of the first one-bit usable as the NEXT stop after a stop
            # at ones_w[i] (i.e. >= ones_w[i]+1+param). The stop walk
            # is then one list lookup per code instead of a bit loop.
            win = ones[j : j + count * (1 + param) + 1].astype(np.int64)
            nxt = np.searchsorted(win, win + 1 + param).tolist()
            idx = np.empty(count, dtype=np.int64)
            cur = 0
            try:
                for k in range(count):
                    idx[k] = cur
                    cur = nxt[cur]
            except IndexError:
                raise ValueError("truncated FLAC bitstream") from None
            if count and idx[-1] >= len(win):
                raise ValueError("truncated FLAC bitstream")
            stops = win[idx]
            pos = int(stops[-1]) + 1 + param
        if pos > len(bits):
            raise ValueError("truncated FLAC bitstream")
        prev_end = np.empty(count, dtype=np.int64)
        prev_end[0] = start
        if count > 1:
            prev_end[1:] = stops[:-1] + 1 + param
        q = stops - prev_end
        if param:
            rem_bits = (
                bits[stops[:, None] + 1 + np.arange(param, dtype=np.int64)]
                .astype(np.int64)
            )
            weights = np.left_shift(
                np.int64(1), np.arange(param - 1, -1, -1, dtype=np.int64)
            )
            v = (q << param) | (rem_bits @ weights)
        else:
            v = q
        self._seek_bit(pos)
        return (v >> 1) ^ -(v & 1)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        # Whole-field write (not bit-by-bit): fold the n-bit value into
        # the current partial byte, emit the completed bytes in one
        # slice off a big int. The encoder calls this once per Rice
        # residual, so the per-call constant dominates encode time
        # (bit-looping here made the 10x round-trip benchmark
        # Python-bound at ~3x this form's cost).
        acc = (self.cur << n) | (value & ((1 << n) - 1))
        total = self.nbits + n
        rem = total & 7
        nbytes = total >> 3
        if nbytes:
            self.out += (acc >> rem).to_bytes(nbytes, "big")
        self.cur = acc & ((1 << rem) - 1)
        self.nbits = rem

    def align(self):
        if self.nbits:
            self.cur <<= 8 - self.nbits
            self.out.append(self.cur)
            self.cur = 0
            self.nbits = 0

    def write_bits(self, bit_arr):
        """Append a uint8 0/1 bit array in one numpy pack — the vector
        form of many consecutive ``write`` calls (identical stream)."""
        import numpy as np

        if self.nbits:
            lead = np.empty(self.nbits + len(bit_arr), dtype=np.uint8)
            for i in range(self.nbits):
                lead[i] = (self.cur >> (self.nbits - 1 - i)) & 1
            lead[self.nbits :] = bit_arr
            bit_arr = lead
            self.cur = 0
            self.nbits = 0
        rem = len(bit_arr) & 7
        head = len(bit_arr) - rem
        if head:
            self.out += np.packbits(bit_arr[:head]).tobytes()
        for i in range(rem):
            self.cur = (self.cur << 1) | int(bit_arr[head + i])
        self.nbits = rem

    def bytes(self) -> bytes:
        self.align()
        return bytes(self.out)


# Fixed-predictor residual: res_n[i] = n-th order forward difference.
_FIXED_COEF = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_TABLE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}

_SAMPLE_SIZE_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _read_coded_number(r: _BitReader) -> int:
    """The UTF-8-like extended coded number in frame headers."""
    first = r.read(8)
    if first < 0x80:
        return first
    n_follow = 0
    mask = 0x40
    while first & mask:
        n_follow += 1
        mask >>= 1
    if n_follow < 1 or n_follow > 6:
        raise ValueError("invalid FLAC coded frame number")
    val = first & (mask - 1)
    for _ in range(n_follow):
        byte = r.read(8)
        if byte & 0xC0 != 0x80:
            raise ValueError("invalid FLAC coded frame number continuation")
    # value bits accumulate 6 per continuation byte
        val = (val << 6) | (byte & 0x3F)
    return val


def _undiff(warm, res, order: int):
    """Invert the ``order``-th forward difference: given the first
    ``order`` samples and the residual (= order-th difference) array,
    rebuild the sample array by ``order`` exact int64 cumsums — the
    closed form of the per-sample ``pred = sum(coef * history)`` loop
    for the FIXED predictors (whose coefficient rows are exactly the
    binomial rows of repeated differencing). Intermediate arrays equal
    the true k-th difference sequences of the decoded signal, so their
    magnitudes are bounded by 2^(bps+order) — no int64 overflow for
    any spec-valid stream."""
    import numpy as np

    if order == 0:
        return res.copy()
    w = np.asarray(warm, dtype=np.int64)
    heads = [int(w[0])]
    for _ in range(order - 1):
        w = np.diff(w)
        heads.append(int(w[0]))
    x = res
    for k in range(order - 1, -1, -1):
        full = np.empty(len(x) + 1, dtype=np.int64)
        full[0] = heads[k]
        full[1:] = x
        x = np.cumsum(full)
    return x


def _decode_subframe(r: _BitReader, n: int, bps: int):
    import numpy as np

    if r.read(1) != 0:
        raise ValueError("FLAC subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    eff = bps - wasted
    if stype == 0:  # CONSTANT
        v = r.read_signed(eff)
        samples = np.full(n, v, dtype=np.int64)
    elif stype == 1:  # VERBATIM
        samples = r.read_fixed_signed_vector(n, eff)
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        if order > n:
            raise ValueError("FLAC fixed order exceeds block size")
        warm = r.read_fixed_signed_vector(order, eff)
        res = _decode_residual(r, n, order)
        samples = _undiff(warm, res, order)
    elif stype >= 32:  # LPC orders 1-32
        order = (stype & 0x1F) + 1
        if order > n:
            raise ValueError("FLAC LPC order exceeds block size")
        warm = r.read_fixed_signed_vector(order, eff)
        prec = r.read(4)
        if prec == 15:
            raise ValueError("invalid FLAC LPC coefficient precision")
        prec += 1
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coef = [r.read_signed(prec) for _ in range(order)]
        res = _decode_residual(r, n, order)
        # The LPC recursion floor-shifts EVERY step, so it is not a
        # linear filter over the residuals — it stays an exact
        # per-sample loop (Python ints; history as a plain list).
        out = [int(v) for v in warm]
        res_l = res.tolist()
        for i in range(order, n):
            pred = sum(c * out[i - 1 - j] for j, c in enumerate(coef)) >> shift
            out.append(res_l[i - order] + pred)
        samples = np.asarray(out, dtype=np.int64)
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    if wasted:
        samples = samples << wasted
    return samples


def _decode_residual(r: _BitReader, n: int, order: int):
    import numpy as np

    method = r.read(2)
    if method not in (0, 1):
        raise ValueError(f"reserved FLAC residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = r.read(4)
    nparts = 1 << po
    if n % nparts:
        raise ValueError("FLAC block size not divisible by partition count")
    if (n >> po) < order:
        raise ValueError("invalid FLAC partition order")
    parts = []
    for part in range(nparts):
        cnt = (n >> po) - (order if part == 0 else 0)
        if cnt < 0:
            raise ValueError("invalid FLAC partition layout")
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            if raw:
                parts.append(r.read_fixed_signed_vector(cnt, raw))
            else:
                parts.append(np.zeros(cnt, dtype=np.int64))
        else:
            parts.append(r.read_rice_vector(cnt, param))
    return parts[0] if nparts == 1 else np.concatenate(parts)


def flac_decode(content: bytes):
    """Decode a FLAC payload to per-channel int64 samples. Returns
    ``(samples, sample_rate, n_channels)`` where ``samples`` is the
    FIRST channel as a numpy int64 array (the ``wav_pcm_decode``
    convention). Supports FIXED and LPC prediction and all three
    stereo decorrelation modes. Raises ``ValueError`` on non-FLAC
    payloads, CRC or MD5 mismatches, and reserved/invalid fields."""
    import numpy as np

    b = bytes(content)
    if len(b) < 42 or b[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    # Metadata blocks; STREAMINFO is mandatory first.
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(b):
            raise ValueError("truncated FLAC metadata")
        hdr = b[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + b[pos + 1 : pos + 4])
        body = b[pos + 4 : pos + 4 + ln]
        if len(body) < ln:
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:
            streaminfo = body
        pos += 4 + ln
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("FLAC STREAMINFO missing")
    r = _BitReader(streaminfo)
    r.read(16)  # min block size
    r.read(16)  # max block size
    r.read(24)  # min frame size
    r.read(24)  # max frame size
    sample_rate = r.read(20)
    n_channels = r.read(3) + 1
    bps = r.read(5) + 1
    total = r.read(36)
    md5_expect = streaminfo[18:34]
    if bps not in (8, 16, 24):
        raise ValueError(f"unsupported FLAC bits-per-sample {bps}")

    # One bit-unpack + one-bit index for the whole stream: every frame
    # reader below shares them for the vectorized field/Rice decode.
    all_bits = np.unpackbits(np.frombuffer(b, dtype=np.uint8))
    all_ones = np.flatnonzero(all_bits)
    channels: list[list] = [[] for _ in range(n_channels)]
    while pos < len(b):
        frame_start = pos
        r = _BitReader(b, pos, bits=all_bits, ones=all_ones)
        sync = r.read(14)
        if sync != 0b11111111111110:
            raise ValueError("bad FLAC frame sync")
        if r.read(1):
            raise ValueError("reserved FLAC frame bit set")
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        chan_code = r.read(4)
        ss_code = r.read(3)
        if r.read(1):
            raise ValueError("reserved FLAC frame bit set")
        _read_coded_number(r)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        elif bs_code == 6:
            block = r.read(8) + 1
        elif bs_code == 7:
            block = r.read(16) + 1
        else:
            block = _BLOCKSIZE_TABLE[bs_code]
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        elif sr_code == 15:
            raise ValueError("invalid FLAC sample rate code")
        frame_bps = _SAMPLE_SIZE_TABLE.get(ss_code, bps) if ss_code else bps
        if ss_code == 3:
            raise ValueError("reserved FLAC sample size code")
        r.align()
        header_bytes = b[frame_start : r.pos]
        crc8 = r.read(8)
        if crc8 != _crc8(header_bytes):
            raise ValueError("FLAC frame header CRC-8 mismatch")
        if chan_code > 10:
            raise ValueError(f"reserved FLAC channel assignment {chan_code}")
        if chan_code < 8:
            if chan_code + 1 != n_channels:
                raise ValueError(
                    "FLAC frame channel count disagrees with STREAMINFO"
                )
            for ch in range(n_channels):
                channels[ch].append(_decode_subframe(r, block, frame_bps))
        else:
            # Inter-channel decorrelation — stereo only; the SIDE
            # (difference) channel carries one extra bit.
            if n_channels != 2:
                raise ValueError(
                    "FLAC frame channel count disagrees with STREAMINFO"
                )
            if chan_code == 8:  # left/side: right = left - side
                left = _decode_subframe(r, block, frame_bps)
                side = _decode_subframe(r, block, frame_bps + 1)
                right = left - side
            elif chan_code == 9:  # right/side: left = side + right
                side = _decode_subframe(r, block, frame_bps + 1)
                right = _decode_subframe(r, block, frame_bps)
                left = side + right
            else:  # mid/side: mid = (l+r)>>1 (floor), side = l-r.
                # (l+r) = (mid<<1)|(side&1) since (l+r)&1 == (l-r)&1;
                # both halves below are exact integers.
                mid = _decode_subframe(r, block, frame_bps)
                side = _decode_subframe(r, block, frame_bps + 1)
                lr = (mid << 1) | (side & 1)
                left = (lr + side) >> 1
                right = (lr - side) >> 1
            channels[0].append(left)
            channels[1].append(right)
        r.align()
        body_bytes = b[frame_start : r.pos]
        crc16 = r.read(16)
        if crc16 != _crc16(body_bytes):
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = r.pos

    arrs = [
        np.concatenate(c) if c else np.zeros(0, dtype=np.int64) for c in channels
    ]
    if total and any(len(a) != total for a in arrs):
        raise ValueError("FLAC decoded sample count disagrees with STREAMINFO")
    # MD5 check: interleaved little-endian signed samples, bps/8 bytes
    # (vectorized — the per-sample to_bytes loop dominated decode time).
    if md5_expect != b"\x00" * 16:
        m = hashlib.md5()
        width = bps // 8
        inter = (
            np.column_stack(arrs).reshape(-1)
            if len(arrs[0])
            else np.array([], dtype=np.int64)
        )
        if width == 1:
            m.update(inter.astype("<i1").tobytes())
        elif width == 2:
            m.update(inter.astype("<i2").tobytes())
        else:
            quads = inter.astype("<i4").view(np.uint8).reshape(-1, 4)
            m.update(quads[:, :3].tobytes())
        if m.digest() != md5_expect:
            raise ValueError("FLAC MD5 mismatch (corrupt or mis-decoded stream)")
    return arrs[0], sample_rate, n_channels


def flac_pcm_decode(content: bytes):
    """First-channel samples as int64 — the ``wav_pcm_decode``-shaped
    entry the audio stages dispatch to."""
    samples, _, _ = flac_decode(content)
    return samples


# ---------------------------------------------------------------------------
# Encoder (test-side synthesizer)
# ---------------------------------------------------------------------------


def _zigzag(res):
    """Vectorized Rice zigzag: non-negatives to even, negatives to odd."""
    import numpy as np

    r = np.asarray(res, dtype=np.int64)
    return np.where(r >= 0, r << 1, ((-r) << 1) - 1)


def _best_rice(u) -> tuple[int, int]:
    """(param, bit cost) minimizing the Rice cost of zigzagged
    residuals — one 15-row shift matrix instead of 15 passes; argmin
    keeps the FIRST minimum, matching the strict-< sweep it replaced."""
    import numpy as np

    n = len(u)
    params = np.arange(15, dtype=np.int64)
    costs = (u[None, :] >> params[:, None]).sum(axis=1) + n * (1 + params)
    best_p = int(np.argmin(costs))
    return best_p, int(costs[best_p])


def _write_coded_number(w: _BitWriter, val: int):
    """General n-byte UTF-8-like coded number (frame headers) — the
    exact inverse of ``_read_coded_number``; 1-7 bytes cover the full
    36-bit sample/frame-number space, so streams with >= 2048 frames
    stay spec-valid (the 2-byte-only form silently truncated them)."""
    if val < 0 or val >= 1 << 36:
        raise ValueError("FLAC coded number out of range")
    if val < 0x80:
        w.write(val, 8)
        return
    for n_follow in range(1, 7):
        # leading byte: n_follow+1 ones, a zero, then 6-n_follow
        # payload bits; each continuation byte is 10xxxxxx.
        lead_bits = 6 - n_follow
        if val < 1 << (lead_bits + 6 * n_follow):
            w.write((1 << (n_follow + 2)) - 2, n_follow + 2)
            if lead_bits:
                w.write(val >> (6 * n_follow), lead_bits)
            for k in range(n_follow - 1, -1, -1):
                w.write(0b10, 2)
                w.write((val >> (6 * k)) & 0x3F, 6)
            return
    raise ValueError("FLAC coded number out of range")


def _quantized_lpc(arr, bps: int, max_order: int):
    """Levinson-Durbin LPC analysis + coefficient quantization.
    Returns ``(order, qcoef, shift, precision)`` or ``None`` when the
    block has no usable predictor. Pure analysis — the encoder computes
    the residual with the QUANTIZED integer predictor, so decode is
    exact regardless of analysis precision."""
    import numpy as np

    x = arr.astype(np.float64)
    n = len(x)
    max_order = min(max_order, n - 1, 32)
    if max_order < 1:
        return None
    autoc = np.array(
        [float(np.dot(x[: n - i], x[i:])) for i in range(max_order + 1)]
    )
    if autoc[0] <= 0:
        return None
    # Levinson-Durbin recursion; keep the highest stable order.
    err = autoc[0]
    lpc = np.zeros(max_order)
    order = 0
    for i in range(max_order):
        acc = autoc[i + 1] - float(np.dot(lpc[:i], autoc[i:0:-1]))
        if err <= 0:
            break
        k = acc / err
        if not np.isfinite(k) or abs(k) >= 1.0:
            break
        lpc[:i] = lpc[:i] - k * lpc[i - 1 :: -1] if i else lpc[:i]
        lpc[i] = k
        err *= 1.0 - k * k
        order = i + 1
    if order < 1:
        return None
    coefs = lpc[:order]
    precision = 12
    cmax = float(np.abs(coefs).max())
    if cmax <= 0:
        return None
    # Largest shift (<= 15, the positive half of the signed 5-bit
    # field) keeping every quantized coefficient inside precision bits.
    shift = 15
    while shift > 0 and cmax * (1 << shift) >= (1 << (precision - 1)) - 1:
        shift -= 1
    if shift == 0:
        return None
    qcoef = np.round(coefs * (1 << shift)).astype(np.int64)
    lim = 1 << (precision - 1)
    qcoef = np.clip(qcoef, -lim, lim - 1)
    if not qcoef.any():
        return None
    return order, qcoef, shift, precision


def flac_encode(
    samples,
    *,
    sample_rate: int = 8000,
    bits: int = 16,
    block_size: int = 256,
    channels=None,
    stereo_mode: str = "independent",
    max_lpc_order: int = 0,
) -> bytes:
    """Encode signed integer samples (one mono list/array, or a list of
    per-channel sequences via ``channels``) into a spec-valid FLAC
    stream: fixed blocking, FIXED order 0-2 / CONSTANT / VERBATIM
    subframes chosen by exact cost (plus quantized-LPC candidates when
    ``max_lpc_order`` > 0), Rice partition order 0 with an exact
    parameter sweep, the general n-byte coded frame number, real
    CRC-8/CRC-16 and STREAMINFO MD5. ``stereo_mode`` selects the
    2-channel decorrelation: ``independent`` (default), ``left_side``,
    ``right_side``, or ``mid_side`` — the side channel is encoded at
    bits+1 per the spec."""
    import numpy as np

    if stereo_mode not in ("independent", "left_side", "right_side", "mid_side"):
        raise ValueError(f"unknown stereo_mode {stereo_mode!r}")
    chans = channels if channels is not None else [samples]
    # asarray directly for array/list/tuple inputs (list(c) round-
    # tripped a 100k-sample numpy array through a Python list);
    # fromiter keeps generator inputs working.
    chans = [
        np.asarray(c, dtype=np.int64)
        if isinstance(c, (np.ndarray, list, tuple))
        else np.fromiter(c, dtype=np.int64)
        for c in chans
    ]
    n_ch = len(chans)
    ntot = len(chans[0])
    if any(len(c) != ntot for c in chans):
        raise ValueError("channel length mismatch")
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    for c in chans:
        if len(c) and (int(c.min()) < lo or int(c.max()) > hi):
            raise ValueError("sample out of range for bit depth")

    out = bytearray(b"fLaC")
    w = _BitWriter()
    w.write(block_size, 16)
    w.write(block_size, 16)
    w.write(0, 24)
    w.write(0, 24)
    w.write(sample_rate, 20)
    w.write(n_ch - 1, 3)
    w.write(bits - 1, 5)
    w.write(ntot, 36)
    info = w.bytes()
    m = hashlib.md5()
    width = bits // 8
    inter = np.column_stack(chans).reshape(-1) if ntot else np.array([], dtype=np.int64)
    if width == 1:
        m.update(inter.astype("<i1").tobytes())
    elif width == 2:
        m.update(inter.astype("<i2").tobytes())
    else:  # 24-bit: 4-byte LE with the sign-carrying top byte dropped
        quads = inter.astype("<i4").view(np.uint8).reshape(-1, 4)
        m.update(quads[:, :3].tobytes())
    out += bytes([0x80]) + (34).to_bytes(3, "big") + info + m.digest()

    ss_code = {8: 1, 16: 4, 24: 6}[bits]
    decorrelate = stereo_mode != "independent" and n_ch == 2
    chan_field = (
        {"left_side": 8, "right_side": 9, "mid_side": 10}[stereo_mode]
        if decorrelate
        else n_ch - 1
    )
    frame_no = 0
    for start in range(0, ntot, block_size):
        blk = [c[start : start + block_size] for c in chans]
        n = len(blk[0])
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocking
        w.write(7, 4)  # 16-bit block size - 1 at header end
        w.write(0, 4)  # sample rate from STREAMINFO
        w.write(chan_field, 4)
        w.write(ss_code, 3)
        w.write(0, 1)
        _write_coded_number(w, frame_no)
        w.write(n - 1, 16)
        header = w.bytes()
        frame = bytearray(header)
        frame.append(_crc8(bytes(frame)))
        w = _BitWriter()
        if decorrelate:
            left, right = blk
            side = left - right
            if stereo_mode == "left_side":
                subs = [(left, bits), (side, bits + 1)]
            elif stereo_mode == "right_side":
                subs = [(side, bits + 1), (right, bits)]
            else:  # mid_side: mid = floor((l+r)/2) — exact with side's
                # low bit carrying the dropped parity (decoder invariant)
                subs = [((left + right) >> 1, bits), (side, bits + 1)]
            for c, sub_bps in subs:
                _encode_subframe(w, c, sub_bps, max_lpc_order=max_lpc_order)
        else:
            for c in blk:
                _encode_subframe(w, c, bits, max_lpc_order=max_lpc_order)
        frame += w.bytes()
        frame += _crc16(bytes(frame)).to_bytes(2, "big")
        out += frame
        frame_no += 1
    return bytes(out)


def _write_rice_residual(w: _BitWriter, u, param: int):
    import numpy as np

    w.write(0, 2)  # rice method 0 (4-bit params)
    w.write(0, 4)  # partition order 0
    w.write(param, 4)
    # Vectorized packing of every residual's (q zeros, stop 1, param
    # remainder bits) field: compute each field's end offset, drop the
    # stop and remainder bits into one 0-bit canvas, pack once —
    # bit-identical to the per-residual ``write`` loop it replaces
    # (which was 43% of encode time in the round-13 profile).
    if not len(u):
        return
    lens = (u >> param) + 1 + param
    ends = np.cumsum(lens)
    canvas = np.zeros(int(ends[-1]), dtype=np.uint8)
    canvas[ends - 1 - param] = 1
    for t in range(param):
        canvas[ends - param + t] = (u >> (param - 1 - t)) & 1
    w.write_bits(canvas)


def _encode_subframe(w: _BitWriter, samples, bps: int, *, max_lpc_order: int = 0):
    import numpy as np

    arr = np.asarray(samples, dtype=np.int64)
    n = len(arr)
    if bool((arr == arr[0]).all()):
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)
        w.write(int(arr[0]) & ((1 << bps) - 1), bps)
        return
    best = None  # (cost, kind, order, u, param, lpc_meta)
    for order in range(0, 3):
        if n <= order:
            continue
        # order-k fixed-predictor residual == k-th forward difference;
        # warmup = samples[:order]. numpy diff + the vectorized zigzag
        # keep the parameter sweep in C (the pure-Python form made the
        # 10x round-trip benchmark encoder-bound).
        res = np.diff(arr, n=order) if order else arr
        u = _zigzag(res)
        param, cost = _best_rice(u)
        cost += order * bps
        if best is None or cost < best[0]:
            best = (cost, "fixed", order, u, param, None)
    if max_lpc_order > 0:
        lpc = _quantized_lpc(arr, bps, max_lpc_order)
        if lpc is not None:
            order, qcoef, shift, prec = lpc
            if n > order:
                # Exact integer residual with the QUANTIZED predictor:
                # pred[i] = (sum_j qcoef[j] * arr[i-1-j]) >> shift, a
                # correlation — one np.convolve keeps it in C.
                pred = np.convolve(arr, qcoef)[order - 1 : n - 1] >> shift
                res = arr[order:] - pred
                u = _zigzag(res)
                param, cost = _best_rice(u)
                cost += order * bps + 4 + 5 + order * prec
                if best is None or cost < best[0]:
                    best = (cost, "lpc", order, u, param, (qcoef, shift, prec))
    verbatim_cost = n * bps
    if best is None or best[0] >= verbatim_cost:
        w.write(0, 1)
        w.write(1, 6)  # VERBATIM
        w.write(0, 1)
        mask = (1 << bps) - 1
        v = arr & mask
        shifts = np.arange(bps - 1, -1, -1, dtype=np.int64)
        w.write_bits(((v[:, None] >> shifts) & 1).astype(np.uint8).ravel())
        return
    _, kind, order, u, param, meta = best
    mask = (1 << bps) - 1
    if kind == "fixed":
        w.write(0, 1)
        w.write(8 + order, 6)  # FIXED
        w.write(0, 1)
        for s in arr[:order].tolist():
            w.write(s & mask, bps)
    else:
        qcoef, shift, prec = meta
        w.write(0, 1)
        w.write(32 | (order - 1), 6)  # LPC
        w.write(0, 1)
        for s in arr[:order].tolist():
            w.write(s & mask, bps)
        w.write(prec - 1, 4)
        w.write(shift, 5)
        cmask = (1 << prec) - 1
        for c in qcoef.tolist():
            w.write(c & cmask, prec)
    _write_rice_residual(w, u, param)
