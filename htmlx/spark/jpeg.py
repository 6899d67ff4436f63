"""Baseline JPEG (JFIF) decode in pure numpy — no external codec.

The reference treats images as first-class media (media.go,
extract.go:1044-1089) and JPEG is the dominant web image format; this
module closes that tier the same way PNG/GIF were closed: a real decoder
for the codec-free-reachable subset plus a deterministic synthesis twin
for tests and formula oracles.

Scope: baseline sequential DCT (SOF0/1) AND progressive DCT (SOF2:
spectral selection + successive approximation — DC first/refine, AC first
with EOB runs, AC refine with correction bits), 8-bit AND 12-bit sample
precision (12-bit legal on SOF1/SOF2 only, per T.81 Table B.2; decoded
samples emit their high byte, the same convention as the 16-bit TIFF
tier), 1 or 3 components, any sampling factors (chroma upsampled by
replication), restart intervals, multi-segment DQT/DHT. Arithmetic
coding, lossless and hierarchical modes raise NotImplementedError and
degrade to error='decoder_unavailable' at the Spark layer (their exact
conditioning/probability tables are not reproducible here, and a guessed
table would be silently wrong rather than honestly degraded); malformed
data raises ValueError.

Exactness note for oracles: JPEG is lossy in general, but a raster that
is CONSTANT within each 8x8 block has only a DC coefficient (exactly
8*(v-128)), so with an all-ones quant table decode(encode(x)) == x
bit-for-bit — the trick the jpeg_pixel_decode driver query builds on,
analogous to the gray-identity palette used for GIF.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# Spec constants (ITU-T T.81)
# ---------------------------------------------------------------------------

# zigzag scan: (row, col) per coefficient index, generated from the
# diagonal traversal rule rather than hardcoded
_ZIGZAG: list[tuple[int, int]] = []
for _s in range(15):
    _rng = range(max(0, _s - 7), min(_s, 7) + 1)
    for _r in _rng if _s % 2 else reversed(_rng):
        _ZIGZAG.append((_r, _s - _r))

# Annex K.3 typical Huffman tables: (bits[1..16], values)
_STD_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_STD_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_STD_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_STD_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

_MAX_JPEG_RASTER = 128 * 1024 * 1024  # same decode-side cap as PNG/GIF


def _dct_matrix():
    """Orthonormal 8x8 DCT-II basis: forward S = C @ f @ C.T, inverse
    f = C.T @ S @ C. DC-only blocks are exact: C[0,:] = 1/sqrt(8)."""
    import numpy as np

    n = np.arange(8)
    c = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16) / 2
    c[0, :] = 1 / (2 * np.sqrt(2))
    return c


def _canonical_codes(bits, vals):
    """Canonical Huffman code assignment (T.81 C.2): codes of each length
    in value order, left-aligned increments."""
    codes = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes.append((length, code, vals[k]))
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    def __init__(self, bits, vals):
        if sum(bits) != len(vals):
            raise ValueError("bad_dht")
        self.lut = {}
        for length, code, val in _canonical_codes(bits, vals):
            self.lut[(length, code)] = val


class _BitReader:
    """Entropy-coded-segment reader: 0xFF00 unstuffing, RSTn awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated_scan")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise ValueError("hit_restart_marker")  # caller must sync
            else:
                raise ValueError("truncated_scan")  # EOI/marker mid-block
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        bit = (self.acc >> self.nbits) & 1
        self.acc &= (1 << self.nbits) - 1  # keep the accumulator bounded
        return bit

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: _HuffDecoder) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            v = table.lut.get((length, code))
            if v is not None:
                return v
        raise ValueError("bad_huffman_code")

    def sync_restart(self):
        """Align to and consume the next RSTn marker; reset bit state."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("truncated_scan")


def _extend(v: int, size: int) -> int:
    """T.81 F.12: map `size`-bit magnitude to signed coefficient."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes):
    """Decode a baseline (SOF0/1) or progressive (SOF2) JFIF payload to an
    (h, w, channels) uint8 array (1 channel for grayscale, 3 for
    YCbCr->RGB). Progressive scans — DC first/refine, AC first with EOB
    runs, AC refinement with correction bits (T.81 G.1/G.2) — accumulate
    into the coefficient planes; dequant + IDCT run once at the end."""
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not_a_jpeg")
    qt: dict[int, "np.ndarray"] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    frame = None
    progressive = False
    precision = 8
    restart_interval = 0
    pos = 2
    n = len(payload)
    plan = None  # per component: [hs, vs, quant, coefs, nbw, nbh]
    any_scan = False
    hmax = vmax = mcux = mcuy = 1

    def alloc_plan():
        nonlocal plan, hmax, vmax, mcux, mcuy
        h, w, comps = frame
        if h == 0 or w == 0:
            raise ValueError("bad_dimensions")
        if len(comps) not in (1, 3):
            raise NotImplementedError(f"jpeg components={len(comps)}")
        if h * w * len(comps) > _MAX_JPEG_RASTER:
            raise ValueError("image_too_large")
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
            raise ValueError("bad_sampling")
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        plan = {}
        for cid, hs, vs, tq in comps:
            if tq not in qt:
                raise ValueError("missing_table")
            coefs = np.zeros((mcuy * vs, mcux * hs, 8, 8), np.int32)
            # non-interleaved scans traverse the component's OWN block
            # grid (ceil of its sample dims), not the MCU-padded grid
            nbw = (-(-w * hs // hmax) + 7) // 8
            nbh = (-(-h * vs // vmax) + 7) // 8
            plan[cid] = [hs, vs, qt[tq], coefs, nbw, nbh]
        return plan

    def decode_scan(scan_hdr, start):
        """Decode one scan's entropy data; returns the byte offset of the
        next marker."""
        nonlocal any_scan
        any_scan = True
        scomps, ss, se, ah, al = scan_hdr
        if ss > se or se > 63 or al > 13:
            raise ValueError("bad_scan_band")
        br = _BitReader(payload, start)
        eobrun = 0
        preds = {cid: 0 for cid, _td, _ta in scomps}
        tabs = {}
        for cid, td, ta in scomps:
            if cid not in plan:
                raise ValueError("scan_component_mismatch")
            dct = huff_dc.get(td)
            act = huff_ac.get(ta)
            if ss == 0 and ah == 0 and dct is None:
                raise ValueError("missing_table")  # DC refine needs no table
            if se > 0 and act is None:
                raise ValueError("missing_table")
            tabs[cid] = (dct, act)

        def dc_decode(blk, cid):
            dct = tabs[cid][0]
            if ah == 0:
                size = br.decode_huff(dct)
                # T.81 F.1.2.1.2: DC size category caps at 11 for 8-bit
                # samples, 15 for 12-bit
                if size > (15 if precision == 12 else 11):
                    raise ValueError("bad_dc_size")
                diff = _extend(br.receive(size), size) if size else 0
                preds[cid] += diff
                blk[0, 0] = preds[cid] << al
            else:  # refinement: one magnitude bit (two's-complement OR)
                if br.read_bit():
                    blk[0, 0] |= 1 << al

        def ac_first(blk, cid):
            nonlocal eobrun
            if eobrun > 0:
                eobrun -= 1
                return
            act = tabs[cid][1]
            k = ss
            while k <= se:
                rs = br.decode_huff(act)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r < 15:  # EOB run of 2^r + receive(r) blocks
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.receive(r)
                        return
                    k += 16  # ZRL
                    continue
                k += r
                if k > se:
                    raise ValueError("bad_ac_run")
                zr, zc = _ZIGZAG[k]
                blk[zr, zc] = _extend(br.receive(s), s) << al
                k += 1

        def ac_refine(blk, cid):
            # T.81 G.1.2.3 (the libjpeg-style correction-bit walk)
            nonlocal eobrun
            act = tabs[cid][1]
            p1, m1 = 1 << al, -1 << al
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = br.decode_huff(act)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r < 15:
                            # full run count here (unlike ac_first, which
                            # pre-decrements): the tail walk below consumes
                            # the CURRENT block and decrements once per block
                            eobrun = 1 << r
                            if r:
                                eobrun += br.receive(r)
                            break
                        newval = 0  # ZRL: skip 16 zero-history coefs
                    elif s == 1:
                        newval = p1 if br.read_bit() else m1
                    else:
                        raise ValueError("bad_ac_refine_symbol")
                    while k <= se:
                        zr, zc = _ZIGZAG[k]
                        v = int(blk[zr, zc])
                        if v != 0:
                            # history coef: consume its correction bit
                            if br.read_bit() and (v & p1) == 0:
                                blk[zr, zc] = v + (p1 if v >= 0 else m1)
                        else:
                            if r == 0:
                                if newval:
                                    blk[zr, zc] = newval
                                k += 1
                                break
                            r -= 1
                        k += 1
            if eobrun > 0:
                while k <= se:
                    zr, zc = _ZIGZAG[k]
                    v = int(blk[zr, zc])
                    if v != 0:
                        if br.read_bit() and (v & p1) == 0:
                            blk[zr, zc] = v + (p1 if v >= 0 else m1)
                    k += 1
                eobrun -= 1

        def visit(blk, cid):
            if ss == 0:
                dc_decode(blk, cid)
                if se > 0:  # baseline: DC + full AC band in one scan
                    k = 1
                    act = tabs[cid][1]
                    while k <= se:
                        rs = br.decode_huff(act)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > se:
                            raise ValueError("bad_ac_run")
                        zr, zc = _ZIGZAG[k]
                        blk[zr, zc] = _extend(br.receive(s), s)
                        k += 1
            elif ah == 0:
                ac_first(blk, cid)
            else:
                ac_refine(blk, cid)

        def restart():
            nonlocal eobrun
            br.sync_restart()
            eobrun = 0
            for cid in preds:
                preds[cid] = 0

        unit = 0
        if len(scomps) == 1:
            cid = scomps[0][0]
            _hs, _vs, _q, coefs, nbw, nbh = plan[cid]
            for by in range(nbh):
                for bx in range(nbw):
                    if restart_interval and unit and unit % restart_interval == 0:
                        restart()
                    unit += 1
                    visit(coefs[by, bx], cid)
        else:
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and unit and unit % restart_interval == 0:
                        restart()
                    unit += 1
                    for cid, _td, _ta in scomps:
                        hs, vs, _q, coefs, _nbw, _nbh = plan[cid]
                        for by in range(vs):
                            for bx in range(hs):
                                visit(coefs[my * vs + by, mx * hs + bx], cid)
        # skip to the next marker (consume pad bits / stuffing / RSTs)
        p = br.pos
        while p + 1 < n:
            if payload[p] == 0xFF and payload[p + 1] != 0x00 and not (
                0xD0 <= payload[p + 1] <= 0xD7
            ):
                return p
            p += 1
        return n

    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("bad_marker")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker == 0xD8:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > n:
            raise ValueError("truncated_segment")
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        seg = payload[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated_segment")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0xF
                i += 1
                cnt = 64 * (2 if prec else 1)
                if i + cnt > len(seg):
                    raise ValueError("bad_dqt")
                raw = seg[i : i + cnt]
                vals = (
                    np.frombuffer(raw, ">u2").astype(np.int32)
                    if prec
                    else np.frombuffer(raw, np.uint8).astype(np.int32)
                )
                tbl = np.zeros((8, 8), np.int32)
                for k, (r, c) in enumerate(_ZIGZAG):
                    tbl[r, c] = vals[k]
                qt[tid] = tbl
                i += cnt
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                cnt = sum(bits)
                vals = list(seg[i + 17 : i + 17 + cnt])
                if len(vals) != cnt:
                    raise ValueError("bad_dht")
                (huff_ac if cls else huff_dc)[tid] = _HuffDecoder(bits, vals)
                i += 17 + cnt
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            if len(seg) < 6:
                raise ValueError("bad_sof")
            depth, h0, w0, nc0 = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if len(seg) < 6 + 3 * nc0:
                raise ValueError("bad_sof")
            # T.81 Table B.2: SOF0 (baseline) is 8-bit only; extended
            # sequential (SOF1) and progressive (SOF2) also allow 12-bit
            if not (depth == 8 or (depth == 12 and marker != 0xC0)):
                raise NotImplementedError(f"jpeg depth={depth}")
            precision = depth
            progressive = marker == 0xC2
            comps = []
            for ci in range(nc0):
                cid, samp, tq = seg[6 + ci * 3 : 9 + ci * 3]
                comps.append((cid, samp >> 4, samp & 0xF, tq))
            frame = (h0, w0, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"jpeg sof={marker:#x} (non-baseline)")
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("bad_dri")
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("missing_sof_or_sos")
            if plan is None:
                alloc_plan()
            if not seg or len(seg) < 1 + 2 * seg[0] + 3:
                raise ValueError("bad_sos")
            ns = seg[0]
            scomps = []
            for si in range(ns):
                cs, tsel = seg[1 + si * 2 : 3 + si * 2]
                scomps.append((cs, tsel >> 4, tsel & 0xF))
            ss, se, a = seg[1 + ns * 2 : 4 + ns * 2]
            pos = decode_scan((scomps, ss, se, a >> 4, a & 0xF), pos + 2 + seglen)
            continue
        # APPn/COM/others: skip
        pos += 2 + seglen
    if frame is None or not any_scan:
        raise ValueError("missing_sof_or_sos")
    h, w, comps = frame
    nc = len(comps)

    # dequant + batch IDCT per component, assemble, upsample, crop
    C = _dct_matrix()
    shift = 1 << (precision - 1)  # level shift: 128 (8-bit) / 2048 (12-bit)
    maxv = (1 << precision) - 1
    planes = []
    for cid, _hs, _vs, _tq in comps:
        hs, vs, q, coefs, _nbw, _nbh = plan[cid]
        deq = coefs.astype(np.float64) * q[None, None]
        spatial = np.einsum("ij,byjk,kl->byil", C.T, deq, C)
        by, bx = coefs.shape[:2]
        plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        plane = np.clip(np.rint(plane + shift), 0, maxv)
        if hs != hmax or vs != vmax:
            plane = np.repeat(np.repeat(plane, vmax // vs, 0), hmax // hs, 1)
        planes.append(plane[:h, :w])
    if nc == 1:
        out = np.clip(np.rint(planes[0]), 0, maxv).astype(np.uint16)[:, :, None]
    else:
        y, cb, cr = planes
        r = y + 1.402 * (cr - shift)
        g = y - 0.344136 * (cb - shift) - 0.714136 * (cr - shift)
        b = y + 1.772 * (cb - shift)
        rgb = np.stack([r, g, b], axis=2)
        out = np.clip(np.rint(rgb), 0, maxv).astype(np.uint16)
    if precision == 12:
        out >>= 4  # emit the high byte (16-bit-TIFF convention)
    return out.astype(np.uint8)


# ---------------------------------------------------------------------------
# Synthesis twin
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1  # keep the accumulator bounded

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            b = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _enc_lut(bits, vals):
    return {val: (length, code) for length, code, val in _canonical_codes(bits, vals)}


def _size_cat(v: int) -> int:
    return abs(v).bit_length()


# Flat tables for progressive synthesis: Annex K's AC tables lack the
# EOBn symbols (r<<4 with r>0, s=0) progressive scans emit, so the
# progressive encoder declares its own DHTs — all DC symbols at 4 bits,
# all 176 progressive AC symbols (r 0..15, s 0..10) at 8 bits. Canonical,
# prefix-free, deliberately simple; real files carry optimized tables and
# the decoder reads whatever the DHT declares.
_FLAT_DC = ([0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_FLAT_AC = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for r in range(16) for s in range(11)],
)
# 12-bit variants: DC size categories reach 15 (T.81 F.1.2.1.2) and AC
# magnitude categories reach 14 — 16 DC symbols at 5 bits, 240 AC symbols
# (r 0..15, s 0..14) at 8 bits; both leave the all-ones code unused as the
# spec's canonical-code rule requires.
_FLAT_DC12 = ([0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0], list(range(16)))
_FLAT_AC12 = (
    [0, 0, 0, 0, 0, 0, 0, 240, 0, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for r in range(16) for s in range(15)],
)


def _sos_header(scomps, ss, se, ah, al) -> bytes:
    """scomps: list of (component_index_0based, dc_table, ac_table)."""
    body = bytes([len(scomps)])
    for cidx, td, ta in scomps:
        body += bytes([cidx + 1, (td << 4) | ta])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body


def _progressive_scans(comps, nc, w, h, enc_dc, enc_ac) -> bytes:
    """Emit the four progressive scan families (T.81 G.2): interleaved DC
    first at Al=1 and DC refine, then per-component AC first (EOB-run
    coded) and AC refine (correction bits, the two-buffer discipline:
    run-level bits flush after the EOB-run symbol, block-level bits after
    the ZRL/coefficient symbol they ride on)."""
    AL = 1
    hmax = max(c[0] for c in comps)
    vmax = max(c[1] for c in comps)
    mcux = w // (8 * hmax)
    mcuy = h // (8 * vmax)
    out = bytearray()

    def interleaved_blocks():
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (hs, vs, coefs) in enumerate(comps):
                    for by in range(vs):
                        for bx in range(hs):
                            yield ci, coefs[my * vs + by, mx * hs + bx]

    all_comps = [(ci, 0 if ci == 0 else 1, 0) for ci in range(nc)]

    # scan 1: DC first (Al=AL)
    bw = _BitWriter()
    preds = [0] * nc
    for ci, blk in interleaved_blocks():
        t = 0 if ci == 0 else 1
        dc = int(blk[0, 0]) >> AL  # arithmetic shift = the point transform
        diff = dc - preds[ci]
        preds[ci] = dc
        size = _size_cat(diff)
        ln, code = enc_dc[t][size]
        bw.put(code, ln)
        if size:
            bw.put(diff if diff > 0 else diff + (1 << size) - 1, size)
    bw.flush()
    out += _sos_header(all_comps, 0, 0, 0, AL) + bw.out

    # scan 2: DC refine (Ah=AL, Al=0): one raw magnitude bit per block
    bw = _BitWriter()
    for _ci, blk in interleaved_blocks():
        bw.put(int(blk[0, 0]) & 1, 1)
    bw.flush()
    out += _sos_header(all_comps, 0, 0, AL, 0) + bw.out

    for ci, (_hs, _vs, coefs) in enumerate(comps):
        t = 0 if ci == 0 else 1
        nbh, nbw = coefs.shape[:2]

        # AC first (Ss=1..63, Al=AL), EOB-run coded
        bw = _BitWriter()
        eobrun = 0

        def emit_eobrun():
            nonlocal eobrun
            if eobrun:
                nb = eobrun.bit_length() - 1
                ln, code = enc_ac[t][nb << 4]
                bw.put(code, ln)
                if nb:
                    bw.put(eobrun - (1 << nb), nb)
                eobrun = 0

        for by in range(nbh):
            for bx in range(nbw):
                blk = coefs[by, bx]
                r = 0
                for k in range(1, 64):
                    zr, zc = _ZIGZAG[k]
                    v = int(blk[zr, zc])
                    mag = (-v if v < 0 else v) >> AL
                    if mag == 0:
                        r += 1
                        continue
                    emit_eobrun()
                    while r > 15:
                        ln, code = enc_ac[t][0xF0]
                        bw.put(code, ln)
                        r -= 16
                    s = mag.bit_length()
                    ln, code = enc_ac[t][(r << 4) | s]
                    bw.put(code, ln)
                    bw.put(mag if v > 0 else (~mag) & ((1 << s) - 1), s)
                    r = 0
                if r:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        emit_eobrun()
        emit_eobrun()
        bw.flush()
        out += _sos_header([(ci, 0, t)], 1, 63, 0, AL) + bw.out

        # AC refine (Ah=AL, Al=0)
        bw = _BitWriter()
        eobrun = 0
        be_bits = []  # correction bits riding on the pending EOB run

        def emit_eobrun_r():
            nonlocal eobrun, be_bits
            if eobrun:
                nb = eobrun.bit_length() - 1
                ln, code = enc_ac[t][nb << 4]
                bw.put(code, ln)
                if nb:
                    bw.put(eobrun - (1 << nb), nb)
                for b in be_bits:
                    bw.put(b, 1)
                eobrun = 0
                be_bits = []

        for by in range(nbh):
            for bx in range(nbw):
                blk = coefs[by, bx]
                mags = [0] * 64
                eob_k = 0
                for k in range(1, 64):
                    zr, zc = _ZIGZAG[k]
                    v = int(blk[zr, zc])
                    mags[k] = -v if v < 0 else v  # >> Al with Al == 0
                    if mags[k] == 1:
                        eob_k = k  # last NEWLY-nonzero position
                r = 0
                br_bits = []  # block-local correction bits
                for k in range(1, 64):
                    temp = mags[k]
                    if temp == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eob_k:
                        emit_eobrun_r()
                        ln, code = enc_ac[t][0xF0]
                        bw.put(code, ln)
                        r -= 16
                        for b in br_bits:
                            bw.put(b, 1)
                        br_bits = []
                    if temp > 1:  # history coef: buffer its correction bit
                        br_bits.append(temp & 1)
                        continue
                    emit_eobrun_r()
                    ln, code = enc_ac[t][(r << 4) | 1]
                    bw.put(code, ln)
                    zr, zc = _ZIGZAG[k]
                    bw.put(0 if int(blk[zr, zc]) < 0 else 1, 1)
                    for b in br_bits:
                        bw.put(b, 1)
                    br_bits = []
                    r = 0
                if r > 0 or br_bits:
                    eobrun += 1
                    be_bits.extend(br_bits)
                    if eobrun == 0x7FFF:
                        emit_eobrun_r()
        emit_eobrun_r()
        bw.flush()
        out += _sos_header([(ci, 0, t)], 1, 63, AL, 0) + bw.out
    return bytes(out)


def encode_jpeg(
    arr, quality_table=None, subsampling=(1, 1), restart_interval=0,
    progressive=False, precision=8,
) -> bytes:
    """Deterministic JFIF encoder (synthesis/tests twin): forward DCT +
    quant + Annex-K Huffman tables. `arr` is (h, w) or (h, w, 1)
    grayscale, or (h, w, 3) taken as ALREADY-YCbCr planes (callers wanting
    RGB input must convert; the formula corpora feed Y with Cb=Cr=128 so
    decoded RGB is exactly gray). `quality_table` is an (8, 8) int quant
    table for ALL components (default all-ones = lossless for
    block-constant rasters). `subsampling=(ch, cv)` divides the chroma
    resolution (luma sampling factors become (ch, cv)). Dimensions must be
    multiples of the MCU size — the synthesis corpora guarantee it.
    `progressive=True` emits SOF2 with four scan families: interleaved DC
    first (Al=1) and DC refine, then per-component AC first (Ss=1..63,
    Al=1, EOB-run coded) and AC refine (correction bits) — exercising
    every progressive decode path. Restart intervals apply to the
    baseline mode only. `precision=12` takes uint16 samples in 0..4095
    and emits SOF1 (extended sequential) or SOF2 with 12-bit-range flat
    Huffman tables — SOF0 is 8-bit-only per T.81 Table B.2."""
    import numpy as np

    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    a = np.asarray(arr, np.uint8 if precision == 8 else np.uint16)
    if precision == 12 and a.size and int(a.max()) > 4095:
        raise ValueError("12-bit samples must be in 0..4095")
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nc = a.shape
    if nc not in (1, 3):
        raise ValueError("encode supports 1 or 3 channels")
    ch, cv = subsampling if nc == 3 else (1, 1)
    if h % (8 * cv) or w % (8 * ch):
        raise ValueError("dimensions must be multiples of the MCU size")
    q = np.asarray(
        quality_table if quality_table is not None else np.ones((8, 8)), np.int32
    )
    C = _dct_matrix()

    def block_coefs(plane):
        bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).astype(
            np.float64
        ) - (1 << (precision - 1))
        S = np.einsum("ij,byjk,kl->byil", C, blocks, C.T)
        return np.rint(S / q[None, None]).astype(np.int32)

    comps = []
    if nc == 1:
        comps.append((1, 1, block_coefs(a[:, :, 0])))
    else:
        comps.append((ch, cv, block_coefs(a[:, :, 0])))
        for p in (1, 2):
            sub = a[::cv, ::ch, p] if (ch > 1 or cv > 1) else a[:, :, p]
            comps.append((1, 1, block_coefs(sub)))

    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    # DQT (table 0, 8-bit)
    zz = bytes(int(q[r, c]) & 0xFF for r, c in _ZIGZAG)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz
    # SOF0 (baseline 8-bit) / SOF1 (extended sequential, 12-bit) /
    # SOF2 (progressive, either precision)
    sof = struct.pack(">BHHB", precision, h, w, nc)
    for ci, (hs, vs, _) in enumerate(comps):
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    if progressive:
        sof_marker = b"\xff\xc2"
    elif precision == 12:
        sof_marker = b"\xff\xc1"
    else:
        sof_marker = b"\xff\xc0"
    out += sof_marker + struct.pack(">H", len(sof) + 2) + sof
    # DHT: lum tables always; chrom tables for color
    def dht(cls, tid, bits, vals):
        body = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body

    if progressive:
        dc_t, ac_t = (_FLAT_DC12, _FLAT_AC12) if precision == 12 else (_FLAT_DC, _FLAT_AC)
        out += dht(0, 0, *dc_t) + dht(1, 0, *ac_t)
        if nc == 3:
            out += dht(0, 1, *dc_t) + dht(1, 1, *ac_t)
        flat_dc = [_enc_lut(*dc_t)] * 2
        flat_ac = [_enc_lut(*ac_t)] * 2
        out += _progressive_scans(comps, nc, w, h, flat_dc, flat_ac)
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    if precision == 12:
        out += dht(0, 0, *_FLAT_DC12) + dht(1, 0, *_FLAT_AC12)
        if nc == 3:
            out += dht(0, 1, *_FLAT_DC12) + dht(1, 1, *_FLAT_AC12)
        enc_dc = [_enc_lut(*_FLAT_DC12)] * 2
        enc_ac = [_enc_lut(*_FLAT_AC12)] * 2
    else:
        out += dht(0, 0, *_STD_DC_LUM) + dht(1, 0, *_STD_AC_LUM)
        if nc == 3:
            out += dht(0, 1, *_STD_DC_CHR) + dht(1, 1, *_STD_AC_CHR)
        enc_dc = [_enc_lut(*_STD_DC_LUM), _enc_lut(*_STD_DC_CHR)]
        enc_ac = [_enc_lut(*_STD_AC_LUM), _enc_lut(*_STD_AC_CHR)]

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([nc])
    for ci in range(nc):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    bw_ = _BitWriter()
    hmax = max(c[0] for c in comps)
    vmax = max(c[1] for c in comps)
    mcux = w // (8 * hmax)
    mcuy = h // (8 * vmax)
    preds = [0] * nc
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw_.flush()
                bw_.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                preds = [0] * nc
            mcu_count += 1
            for ci, (hs, vs, coefs) in enumerate(comps):
                t = 0 if ci == 0 else 1
                for by in range(vs):
                    for bx in range(hs):
                        blk = coefs[my * vs + by, mx * hs + bx]
                        diff = int(blk[0, 0]) - preds[ci]
                        preds[ci] = int(blk[0, 0])
                        size = _size_cat(diff)
                        ln, code = enc_dc[t][size]
                        bw_.put(code, ln)
                        if size:
                            mag = diff if diff > 0 else diff + (1 << size) - 1
                            bw_.put(mag, size)
                        # AC run-length
                        run = 0
                        for k in range(1, 64):
                            zr, zc = _ZIGZAG[k]
                            v = int(blk[zr, zc])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                ln, code = enc_ac[t][0xF0]  # ZRL
                                bw_.put(code, ln)
                                run -= 16
                            s = _size_cat(v)
                            ln, code = enc_ac[t][(run << 4) | s]
                            bw_.put(code, ln)
                            mag = v if v > 0 else v + (1 << s) - 1
                            bw_.put(mag, s)
                            run = 0
                        if run:
                            ln, code = enc_ac[t][0x00]  # EOB
                            bw_.put(code, ln)
    bw_.flush()
    out += bw_.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
