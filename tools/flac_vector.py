"""Hand-assembled FLAC anchor vector, constructed INDEPENDENTLY of
htmlx.spark.flac — the last synthesis-twin blind spot named in VERDICT
r4/r5: every other codec has a real-encoder anchor (javax.imageio /
javax.sound), but no independent FLAC encoder exists in this container,
so this generator builds a minimal stream byte-by-byte from the
published format definition (RFC 9639 / xiph.org format spec) with its
OWN bit assembly (string-of-bits), its OWN table-driven CRC-8/CRC-16
(polynomials 0x07 / 0x8005, the spec constants), and hashlib MD5 —
sharing no code with the decoder under test or its encoder twin.

The expected PCM is computed here from the spec's prediction recurrences
(fixed-predictor difference equations and the stereo decorrelation
formulas as written in the spec), not by running the decoder.

Deliberate coverage beyond what the in-repo twin emits:
  - partitioned Rice residual (partition order 1 -> 2 partitions; the
    twin writes single-partition only)
  - blocksize-at-end-of-header coding (code 0110, 8-bit value)
  - uncommon-rate-at-end-of-header coding (code 12, 8-bit kHz value)
  - left/side AND mid/side stereo frames in one stream
  - a wasted-bits subframe (verbatim at bps-1, output << 1)
  - a final short frame (fixed blocksize stream, smaller last block)

Usage: python tools/flac_vector.py  (writes tests/fixtures/real_anchors/
flac_spec_vector.flac and .expected.json; run once, freeze, never
regenerate without a documented spec-reading correction).
"""

import hashlib
import json
import os
import struct


class BitStr:
    """Bit assembly as a growing '0'/'1' string, packed MSB-first at the
    end — deliberately unlike the decoder twin's incremental byte
    writer."""

    def __init__(self):
        self.bits = []

    def u(self, value: int, width: int):
        self.bits.append(format(value & ((1 << width) - 1), f"0{width}b"))

    def s(self, value: int, width: int):
        self.u(value & ((1 << width) - 1), width)

    def align(self):
        n = len("".join(self.bits)) % 8
        if n:
            self.u(0, 8 - n)

    def to_bytes(self) -> bytes:
        s = "".join(self.bits)
        assert len(s) % 8 == 0, "unaligned"
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def _table(poly: int, width: int):
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tab = []
    for byte in range(256):
        c = byte << (width - 8)
        for _ in range(8):
            c = ((c << 1) ^ poly) & mask if c & top else (c << 1) & mask
        tab.append(c)
    return tab


_CRC8_TAB = _table(0x07, 8)
_CRC16_TAB = _table(0x8005, 16)


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8_TAB[c ^ b]
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16_TAB[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


def rice_write(bw: BitStr, values, param: int):
    """Rice code per the spec: zigzag to unsigned, quotient in unary
    (q zero bits then a one), remainder in `param` plain bits."""
    for v in values:
        u = 2 * v if v >= 0 else -2 * v - 1
        q, r = u >> param, u & ((1 << param) - 1)
        bw.u(0, q) if q else None
        bw.u(1, 1)
        if param:
            bw.u(r, param)


def fixed_predict(warm, residual, order):
    """Spec fixed-predictor difference equations, written from the
    polynomial definitions (order 1: p=a[n-1]; order 2: p=2a[n-1]-a[n-2])."""
    out = list(warm)
    for r in residual:
        if order == 1:
            p = out[-1]
        elif order == 2:
            p = 2 * out[-1] - out[-2]
        else:
            raise ValueError(order)
        out.append(r + p)
    return out


def build() -> tuple[bytes, dict]:
    RATE, BPS, CH = 8000, 16, 2
    BLK = 16

    # ---- frame 0: blocksize 16, left/side, fixed-order-2 + constant ----
    left_warm = [100, 102]
    res_p0 = [1, -2, 3, 0, -1, 2]          # partition 0: 16/2 - order = 6
    res_p1 = [5, -6, 7, -8, 0, 1, -1, 2]   # partition 1: 8
    left = fixed_predict(left_warm, res_p0 + res_p1, 2)
    side0 = 3                               # constant side: right = left - 3
    right = [v - side0 for v in left]

    f0 = BitStr()
    f0.u(0b11111111111110, 14)  # sync
    f0.u(0, 1)                  # reserved
    f0.u(0, 1)                  # blocking strategy: fixed
    f0.u(6, 4)                  # blocksize: 8-bit value at end of header
    f0.u(4, 4)                  # rate code 4 = 8000
    f0.u(8, 4)                  # channel assignment: left/side
    f0.u(4, 3)                  # bps code 4 = 16
    f0.u(0, 1)                  # reserved
    f0.u(0, 8)                  # frame number 0 (utf-8, 1 byte)
    f0.u(BLK - 1, 8)            # blocksize-1
    hdr = f0.to_bytes()
    f0.u(crc8(hdr), 8)
    # subframe 0: FIXED order 2 (type 001010), bps 16
    f0.u(0, 1); f0.u(10, 6); f0.u(0, 1)
    for w in left_warm:
        f0.s(w, BPS)
    f0.u(0, 2)                  # residual method 0 (4-bit rice)
    f0.u(1, 4)                  # partition order 1 -> 2 partitions
    f0.u(2, 4); rice_write(f0, res_p0, 2)
    f0.u(3, 4); rice_write(f0, res_p1, 3)
    # subframe 1: CONSTANT side at bps+1 = 17
    f0.u(0, 1); f0.u(0, 6); f0.u(0, 1)
    f0.s(side0, BPS + 1)
    f0.align()
    body = f0.to_bytes()
    f0.u(crc16(body), 16)
    frame0 = f0.to_bytes()

    # ---- frame 1: short last block (8), mid/side, verbatim(wasted) + fixed-1
    BLK1 = 8
    mid = [40, -40, 120, 6, -6, 0, 88, -2]  # all even: 1 wasted bit
    side_warm = [2]
    side_res = [1, -1, 3, -2, 0, 4, -3]
    side = fixed_predict(side_warm, side_res, 1)
    # spec reconstruction: mid carries (l+r)>>1, side l-r; decoder forms
    # m2 = (mid<<1)|(side&1), l=(m2+side)>>1, r=(m2-side)>>1
    l1 = [((m << 1 | (s & 1)) + s) >> 1 for m, s in zip(mid, side)]
    r1 = [((m << 1 | (s & 1)) - s) >> 1 for m, s in zip(mid, side)]

    f1 = BitStr()
    f1.u(0b11111111111110, 14)
    f1.u(0, 1)
    f1.u(0, 1)
    f1.u(6, 4)                  # blocksize at end of header
    f1.u(12, 4)                 # rate code 12: 8-bit kHz value at end
    f1.u(10, 4)                 # channel assignment: mid/side
    f1.u(4, 3)
    f1.u(0, 1)
    f1.u(1, 8)                  # frame number 1
    f1.u(BLK1 - 1, 8)
    f1.u(RATE // 1000, 8)       # 8 kHz
    hdr = f1.to_bytes()
    f1.u(crc8(hdr), 8)
    # subframe 0: VERBATIM mid with 1 wasted bit (samples stored >> 1 at
    # bps-1 = 15 bits; wasted count coded as unary count-1 -> a lone 1)
    f1.u(0, 1); f1.u(1, 6); f1.u(1, 1)
    f1.u(1, 1)                  # unary 0 -> wasted = 0 + 1 = 1
    for m in mid:
        f1.s(m >> 1, BPS - 1)
    # subframe 1: FIXED order 1 side at bps+1 = 17, single partition
    f1.u(0, 1); f1.u(9, 6); f1.u(0, 1)
    for w in side_warm:
        f1.s(w, BPS + 1)
    f1.u(0, 2)
    f1.u(0, 4)
    f1.u(1, 4); rice_write(f1, side_res, 1)
    f1.align()
    body = f1.to_bytes()
    f1.u(crc16(body), 16)
    frame1 = f1.to_bytes()

    # ---- interleaved PCM + streaminfo ----
    total = BLK + BLK1
    inter = []
    for l, r in zip(left + l1, right + r1):
        inter += [l, r]
    pcm = b"".join(struct.pack("<h", v) for v in inter)
    md5 = hashlib.md5(pcm).digest()

    si = BitStr()
    si.u(BLK, 16)               # min blocksize (== max: fixed strategy)
    si.u(BLK, 16)
    si.u(0, 24)                 # min/max frame size unknown
    si.u(0, 24)
    si.u(RATE, 20)
    si.u(CH - 1, 3)
    si.u(BPS - 1, 5)
    si.u(total, 36)
    streaminfo = si.to_bytes() + md5
    assert len(streaminfo) == 34

    stream = (
        b"fLaC"
        + bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
        + frame0 + frame1
    )
    expected = {
        "sample_rate": RATE,
        "channels": CH,
        "bps": BPS,
        "left": left + l1,
        "right": right + r1,
    }
    return stream, expected


def main():
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "real_anchors",
    )
    os.makedirs(out_dir, exist_ok=True)
    stream, expected = build()
    with open(os.path.join(out_dir, "flac_spec_vector.flac"), "wb") as f:
        f.write(stream)
    with open(os.path.join(out_dir, "flac_spec_vector.expected.json"), "w") as f:
        json.dump(expected, f, indent=1)
    print(f"wrote {len(stream)}-byte vector, {len(expected['left'])} samples/ch")


if __name__ == "__main__":
    main()
