"""FLAC decode in pure Python/numpy — no external codec.

Closes the lossless-audio tier the same way PNG/GIF/JPEG/TIFF were
closed (the reference's media surface treats audio as first-class:
media.go). FLAC is fully decodable without codec libraries because every
prediction coefficient is carried in the file: subframes are CONSTANT /
VERBATIM / FIXED (orders 0-4, spec-fixed integer predictors) / LPC
(file-carried quantized coefficients + shift), residuals are Rice-coded,
and stereo uses simple integer decorrelation (left/side, right/side,
mid/side).

Integrity is layered: the frame-header CRC-8 and whole-frame CRC-16 are
verified per frame, and the STREAMINFO MD5 of the decoded PCM is checked
when present — a decoded stream that passes all three is reconstructed
bit-exactly. Malformed data raises ValueError; genuinely-unsupported
shapes (>2 channels with decorrelation, reserved codes) raise
NotImplementedError and degrade to error='decoder_unavailable' at the
Spark layer.

The synthesis twin (encode_flac) emits CONSTANT/FIXED/LPC subframes with
single-partition Rice residuals and any stereo mode — enough to exercise
every decoder path with round-trip + MD5 + CRC validation.
"""

from __future__ import annotations

import hashlib
import struct

_MAX_SAMPLES = 64 * 1024 * 1024  # decode-side allocation cap

_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}
_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050, 7: 24000,
    8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader over bytes."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        d = self.data
        for _ in range(n):
            if self.byte >= len(d):
                raise ValueError("truncated_flac")
            v = (v << 1) | ((d[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("unary_overflow")
        return q

    def align(self):
        if self.bit:
            self.bit = 0
            self.byte += 1


def _read_utf8_number(bits: _Bits) -> int:
    first = bits.read(8)
    if first < 0x80:
        return first
    n_more = 0
    mask = 0x40
    while first & mask:
        n_more += 1
        mask >>= 1
    if n_more == 0 or n_more > 6:
        raise ValueError("bad_frame_number")
    v = first & (mask - 1)
    for _ in range(n_more):
        b = bits.read(8)
        if b >> 6 != 0b10:
            raise ValueError("bad_frame_number")
        v = (v << 6) | (b & 0x3F)
    return v


def _read_residual(bits: _Bits, blocksize: int, order: int):
    method = bits.read(2)
    if method > 1:
        raise ValueError("bad_residual_method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = bits.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("bad_partition_order")
    out = []
    for p in range(nparts):
        count = blocksize // nparts - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("bad_partition_order")
        param = bits.read(plen)
        if param == escape:
            nbits = bits.read(5)
            for _ in range(count):
                out.append(bits.read_signed(nbits) if nbits else 0)
        else:
            for _ in range(count):
                q = bits.read_unary()
                u = (q << param) | (bits.read(param) if param else 0)
                out.append((u >> 1) ^ -(u & 1))  # un-zigzag
    return out


def _predict(warm: list, residual: list, coefs: list, shift: int) -> list:
    out = list(warm)
    for r in residual:
        acc = 0
        for i, c in enumerate(coefs):
            acc += c * out[-1 - i]
        out.append(r + (acc >> shift))
    return out


def _decode_subframe(bits: _Bits, blocksize: int, bps: int) -> list:
    if bits.read(1):
        raise ValueError("bad_subframe_padding")
    typ = bits.read(6)
    wasted = 0
    if bits.read(1):  # wasted-bits flag: unary count - 1
        wasted = bits.read_unary() + 1
        bps -= wasted
    if typ == 0:  # CONSTANT
        out = [bits.read_signed(bps)] * blocksize
    elif typ == 1:  # VERBATIM
        out = [bits.read_signed(bps) for _ in range(blocksize)]
    elif 8 <= typ <= 12:  # FIXED, order 0-4
        order = typ - 8
        warm = [bits.read_signed(bps) for _ in range(order)]
        res = _read_residual(bits, blocksize, order)
        out = _predict(warm, res, _FIXED_COEFS[order], 0)
    elif typ >= 32:  # LPC, order 1-32
        order = (typ & 0x1F) + 1
        warm = [bits.read_signed(bps) for _ in range(order)]
        precision = bits.read(4) + 1
        if precision == 16:
            raise ValueError("bad_lpc_precision")
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("bad_lpc_shift")
        coefs = [bits.read_signed(precision) for _ in range(order)]
        res = _read_residual(bits, blocksize, order)
        out = _predict(warm, res, coefs, shift)
    else:
        raise ValueError(f"reserved_subframe_type_{typ}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(payload: bytes):
    """Decode a FLAC payload to (sample_rate, channels, int array of shape
    (frames, channels)). Verifies per-frame CRC-8/CRC-16 and the
    STREAMINFO PCM MD5 when present."""
    import numpy as np

    if payload[:4] != b"fLaC":
        raise ValueError("not_a_flac")
    pos = 4
    streaminfo = None
    last = False
    while not last:
        if pos + 4 > len(payload):
            raise ValueError("truncated_metadata")
        hdr = payload[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("truncated_metadata")
        if btype == 0:
            streaminfo = body
        elif btype == 127:
            raise ValueError("invalid_metadata_type")
        pos += 4 + blen
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("missing_streaminfo")
    rate = (streaminfo[10] << 12) | (streaminfo[11] << 4) | (streaminfo[12] >> 4)
    channels = ((streaminfo[12] >> 1) & 0x7) + 1
    bps = (((streaminfo[12] & 1) << 4) | (streaminfo[13] >> 4)) + 1
    total = ((streaminfo[13] & 0xF) << 32) | struct.unpack(">I", streaminfo[14:18])[0]
    md5_expect = streaminfo[18:34]
    if rate == 0:
        raise ValueError("bad_sample_rate")
    if total > _MAX_SAMPLES:
        raise ValueError("stream_too_large")

    frames = []
    n_done = 0
    while pos < len(payload) and (total == 0 or n_done < total):
        frame_start = pos
        bits = _Bits(payload, pos)
        sync = bits.read(14)
        if sync != 0b11111111111110:
            raise ValueError("bad_frame_sync")
        bits.read(1)  # reserved
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        rate_code = bits.read(4)
        chan_code = bits.read(4)
        bps_code = bits.read(3)
        bits.read(1)  # reserved
        _read_utf8_number(bits)
        if bs_code == 0:
            raise ValueError("reserved_blocksize_code")
        elif bs_code == 1:
            blocksize = 192
        elif bs_code <= 5:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = 256 << (bs_code - 8)
        if rate_code == 0:
            f_rate = rate
        elif rate_code in _RATE_CODES:
            f_rate = _RATE_CODES[rate_code]
        elif rate_code == 12:
            f_rate = bits.read(8) * 1000
        elif rate_code == 13:
            f_rate = bits.read(16)
        elif rate_code == 14:
            f_rate = bits.read(16) * 10
        else:
            raise ValueError("invalid_rate_code")
        f_bps = bps if bps_code == 0 else _BPS_CODES.get(bps_code)
        if f_bps is None:
            raise ValueError("reserved_bps_code")
        # CRC-8 covers the header bytes up to (not incl.) the CRC byte
        bits.align()
        if _crc8(payload[frame_start : bits.byte]) != bits.read(8):
            raise ValueError("frame_header_crc_mismatch")
        if chan_code <= 7:
            f_channels = chan_code + 1
            if f_channels != channels:
                raise ValueError("channel_count_mismatch")
            chans = [
                _decode_subframe(bits, blocksize, f_bps) for _ in range(f_channels)
            ]
        elif chan_code in (8, 9, 10):
            if channels != 2:
                raise ValueError("channel_count_mismatch")
            extra = (0, 1) if chan_code == 8 else ((1, 0) if chan_code == 9 else (0, 1))
            a = _decode_subframe(bits, blocksize, f_bps + extra[0])
            b = _decode_subframe(bits, blocksize, f_bps + extra[1])
            if chan_code == 8:  # left / side
                chans = [a, [l - s for l, s in zip(a, b)]]
            elif chan_code == 9:  # side / right
                chans = [[r + s for s, r in zip(a, b)], b]
            else:  # mid / side
                left, right = [], []
                for m, s in zip(a, b):
                    m2 = (m << 1) | (s & 1)
                    left.append((m2 + s) >> 1)
                    right.append((m2 - s) >> 1)
                chans = [left, right]
        else:
            raise ValueError("reserved_channel_assignment")
        bits.align()
        crc16 = bits.read(16)
        if _crc16(payload[frame_start : bits.byte - 2]) != crc16:
            raise ValueError("frame_crc_mismatch")
        pos = bits.byte
        frames.append(chans)
        n_done += blocksize
        if n_done > _MAX_SAMPLES:
            raise ValueError("stream_too_large")
    if not frames:
        raise ValueError("no_frames")
    out = np.concatenate(
        [np.asarray(chans, dtype=np.int64).T for chans in frames], axis=0
    )
    if total:
        out = out[:total]
    if md5_expect != b"\x00" * 16:
        if _pcm_md5(out, bps) != md5_expect:
            raise ValueError("pcm_md5_mismatch")
    return rate, channels, out


def _pcm_md5(samples, bps: int) -> bytes:
    """STREAMINFO MD5: interleaved samples, little-endian, bps/8 bytes."""
    import numpy as np

    width = bps // 8
    flat = np.asarray(samples, np.int64).reshape(-1)
    if width == 2:
        raw = flat.astype("<i2").tobytes()
    elif width == 1:
        raw = (flat & 0xFF).astype(np.uint8).tobytes()
    elif width == 3:
        b = flat.astype("<i4").tobytes()
        raw = b"".join(b[i : i + 3] for i in range(0, len(b), 4))
    else:
        raw = flat.astype("<i4").tobytes()
    return hashlib.md5(raw).digest()


# ---------------------------------------------------------------------------
# Synthesis twin
# ---------------------------------------------------------------------------

class _BitsW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int):
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1  # keep the accumulator bounded

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a 1

    def align(self):
        if self.n:
            self.write(0, 8 - self.n)


def _rice_param(residual) -> int:
    n = len(residual)
    if n == 0:
        return 0
    mean = sum(abs(v) for v in residual) / n
    p = 0
    while (1 << p) < mean + 1 and p < 14:
        p += 1
    return p


def _write_residual(bw: _BitsW, residual, param: int):
    bw.write(0, 2)  # method 0: 4-bit rice
    bw.write(0, 4)  # partition order 0 (single partition)
    bw.write(param, 4)
    for v in residual:
        u = (-v << 1) - 1 if v < 0 else v << 1  # zigzag
        bw.write_unary(u >> param)
        if param:
            bw.write(u & ((1 << param) - 1), param)


def _encode_subframe(bw: _BitsW, samples, bps: int, lpc: bool):
    n = len(samples)
    if n and all(v == samples[0] for v in samples):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write(samples[0], bps)
        return
    # pick the best fixed order 0-2 by absolute residual sum
    best = None
    for order in (0, 1, 2):
        if n <= order:
            continue
        coefs = _FIXED_COEFS[order]
        res = []
        for i in range(order, n):
            pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            res.append(samples[i] - pred)
        cost = sum(abs(v) for v in res)
        if best is None or cost < best[0]:
            best = (cost, order, res)
    _, order, res = best
    if lpc and order == 2:
        # LPC twin of fixed-2: coefficients [2, -1], precision 4, shift 0 —
        # same numbers through the LPC decode path
        bw.write(0, 1)
        bw.write(0x20 | (2 - 1), 6)
        bw.write(0, 1)
        for i in range(2):
            bw.write(samples[i], bps)
        bw.write(3, 4)  # precision - 1
        bw.write(0, 5)  # shift
        bw.write(2, 4)  # coef 2 at precision 4
        bw.write(-1, 4)  # coef -1
    else:
        bw.write(0, 1)
        bw.write(8 + order, 6)  # FIXED
        bw.write(0, 1)
        for i in range(order):
            bw.write(samples[i], bps)
    _write_residual(bw, res, _rice_param(res))


def encode_flac(
    samples, rate: int = 8000, block_size: int = 4096, stereo_mode: str = "independent",
    lpc: bool = False,
) -> bytes:
    """Deterministic FLAC encoder (synthesis/tests twin): 16-bit samples
    (frames, channels), CONSTANT/FIXED(0-2)/optional-LPC subframes,
    single-partition Rice residuals, any stereo decorrelation mode
    ('independent' | 'left_side' | 'right_side' | 'mid_side')."""
    import numpy as np

    a = np.asarray(samples, np.int64)
    if a.ndim == 1:
        a = a[:, None]
    total, channels = a.shape
    bps = 16
    out = bytearray(b"fLaC")
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)
    si += b"\x00\x00\x00" * 2  # min/max frame size unknown
    si += bytes(
        [
            (rate >> 12) & 0xFF,
            (rate >> 4) & 0xFF,
            ((rate & 0xF) << 4) | ((channels - 1) << 1) | ((bps - 1) >> 4),
            (((bps - 1) & 0xF) << 4) | ((total >> 32) & 0xF),
        ]
    )
    si += struct.pack(">I", total & 0xFFFFFFFF)
    si += _pcm_md5(a, bps)
    out += bytes([0x80]) + struct.pack(">I", len(si))[1:] + si

    frame_no = 0
    for start in range(0, total, block_size):
        blk = a[start : start + block_size]
        n = blk.shape[0]
        bw = _BitsW()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocksize stream
        bw.write(7, 4)  # blocksize: 16-bit follows
        bw.write(0, 4)  # rate: streaminfo
        if channels == 2 and stereo_mode != "independent":
            chan_code = {"left_side": 8, "right_side": 9, "mid_side": 10}[stereo_mode]
        else:
            chan_code = channels - 1
        bw.write(chan_code, 4)
        bw.write(4, 3)  # bps: 16
        bw.write(0, 1)
        # UTF-8 frame number (fits 7 bits for our corpora sizes; spill to
        # the 2-byte form above 127)
        if frame_no < 0x80:
            bw.write(frame_no, 8)
        else:
            bw.write(0xC0 | (frame_no >> 6), 8)
            bw.write(0x80 | (frame_no & 0x3F), 8)
        bw.write(n - 1, 16)
        bw.align()
        hdr = bytes(bw.out)
        bw.write(_crc8(hdr), 8)
        if chan_code <= 7:
            for c in range(channels):
                _encode_subframe(bw, [int(v) for v in blk[:, c]], bps, lpc)
        else:
            left = [int(v) for v in blk[:, 0]]
            right = [int(v) for v in blk[:, 1]]
            side = [l - r for l, r in zip(left, right)]
            if chan_code == 8:
                _encode_subframe(bw, left, bps, lpc)
                _encode_subframe(bw, side, bps + 1, lpc)
            elif chan_code == 9:
                _encode_subframe(bw, side, bps + 1, lpc)
                _encode_subframe(bw, right, bps, lpc)
            else:
                mid = [(l + r) >> 1 for l, r in zip(left, right)]
                _encode_subframe(bw, mid, bps, lpc)
                _encode_subframe(bw, side, bps + 1, lpc)
        bw.align()
        body = bytes(bw.out)
        bw.write(_crc16(body), 16)
        out += bytes(bw.out)
        frame_no += 1
    return bytes(out)
