"""Pure-stdlib+numpy baseline JPEG codec (ITU-T T.81).

The sandbox ships no imaging library, but baseline JPEG is just Huffman
entropy coding over quantized 8x8 DCT blocks - all expressible with the
standard library plus numpy. This upgrades the multimodal image path
from "PNG only" to the two formats that dominate real web crawls.

Supported subset (decode): baseline sequential DCT (SOF0/1) AND
progressive DCT (SOF2 - spectral selection + successive approximation,
per T.81 G.1/G.2 with libjpeg's EOB-run and correction-bit semantics),
8-bit, 1 or 3 components, any sampling factors (4:4:4 / 4:2:2 /
4:2:0 ...), restart intervals, 16-bit DQT precision. Arithmetic coding,
hierarchical, lossless, 12-bit, and CMYK stay NotImplementedError.

Decode is validated in tests against Java ImageIO (Spark's own `image`
data source decodes via libjpeg under javax.imageio) on the real-world
JPEGs Spark ships in data/mllib/images - an independent decoder, so our
Huffman/IDCT cannot silently cancel a bug in our own encoder.

The encoder is a minimal baseline writer (grayscale or 4:4:4 RGB,
Annex K tables scaled by a quality knob) used to build deterministic
test fixtures; it emits standard streams any decoder can read.
"""

from __future__ import annotations

import struct

import numpy as np

# Zigzag scan order: ZIGZAG[i] = raster index of the i-th scanned coeff.
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# Orthogonal 8-point DCT-II basis: A[u, x] = c(u)/2 * cos((2x+1)u*pi/16).
# spatial = A.T @ coeffs @ A ; coeffs = A @ spatial @ A.T
_A = np.array([[(np.sqrt(0.5) if u == 0 else 1.0) / 2.0
                * np.cos((2 * x + 1) * u * np.pi / 16.0)
                for x in range(8)] for u in range(8)])


class _BitReader:
    """MSB-first bit reader over an unstuffed entropy segment."""

    __slots__ = ("bits", "pos")

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        self.pos = p + n
        v = 0
        for b in self.bits[p:p + n]:
            v = (v << 1) | int(b)
        return v


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


class _Huffman:
    """Canonical Huffman table from BITS (16 counts) + HUFFVAL."""

    def __init__(self, bits, values):
        self.lut = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lut[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, reader: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            v = self.lut.get((length, code))
            if v is not None:
                return v
        raise ValueError("bad Huffman code in entropy stream")


def _split_entropy(data: bytes, pos: int):
    """Entropy-coded bytes from `pos` to EOI, unstuffed, split at RSTn.

    Returns (segments, end_pos)."""
    segs, out = [], bytearray()
    n = len(data)
    while pos < n:
        b = data[pos]
        if b != 0xFF:
            out.append(b)
            pos += 1
            continue
        m = data[pos + 1] if pos + 1 < n else 0xD9
        if m == 0x00:                       # stuffed 0xFF literal
            out.append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:             # restart marker
            segs.append(bytes(out))
            out = bytearray()
            pos += 2
        else:                               # EOI or next real marker
            break
    segs.append(bytes(out))
    return segs, pos


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (height, width, channels) uint8 array.

    channels = 1 (grayscale) or 3 (RGB, converted from JFIF YCbCr)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt = {}                                  # id -> 64 ints (raster order)
    huff_dc, huff_ac = {}, {}
    frame = None                             # (H, W, comps)
    progressive = None                       # _ProgressiveState once SOF2
    restart_interval = 0
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:                   # EOI
            break
        seg_len = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
        seg = payload[pos + 4:pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:                   # DQT (may hold several tables)
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if prec:
                    vals = np.frombuffer(seg[i:i + 128], dtype=">u2")
                    i += 128
                else:
                    vals = np.frombuffer(seg[i:i + 64], dtype=np.uint8)
                    i += 64
                table = np.zeros(64, dtype=np.int64)
                table[ZIGZAG] = vals.astype(np.int64)
                qt[tid] = table
        elif marker in (0xC0, 0xC1, 0xC2):   # SOF0/1 baseline, SOF2 progr.
            _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if _prec != 8:
                raise NotImplementedError(f"{_prec}-bit JPEG")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = (h, w, comps)
            if marker == 0xC2:
                progressive = _ProgressiveState(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG (SOF marker 0x{marker:02x}; baseline "
                "sequential SOF0/1 and progressive SOF2 are supported)")
        elif marker == 0xC4:                 # DHT (may hold several tables)
            i = 0
            while i < len(seg):
                tclass, tid = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                values = list(seg[i + 17:i + 17 + nv])
                (huff_ac if tclass else huff_dc)[tid] = _Huffman(bits,
                                                                 values)
                i += 17 + nv
        elif marker == 0xDD:                 # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:                 # SOS -> entropy data follows
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((cs, tables >> 4, tables & 0xF))
            segments, pos = _split_entropy(payload, pos)
            if progressive is None:
                return _decode_scan(frame, qt, huff_dc, huff_ac, scan,
                                    segments, restart_interval)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            progressive.decode_scan(scan, huff_dc, huff_ac, segments,
                                    restart_interval, ss, se,
                                    ahal >> 4, ahal & 0xF)
        # else: APPn/COM/etc - skipped
    if progressive is not None:
        return progressive.finish(qt)
    raise ValueError("no SOS marker found")


def _decode_scan(frame, qt, huff_dc, huff_ac, scan, segments,
                 restart_interval) -> np.ndarray:
    if frame is None:
        raise ValueError("SOS before SOF")
    H, W, comps = frame
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-W // (8 * hmax))
    mcus_y = -(-H // (8 * vmax))
    order = []                               # scan-ordered component specs
    for cs, td, ta in scan:
        c = by_id[cs]
        # quant table scattered to scan order so `zz * q` lines up
        order.append((c, huff_dc[td], huff_ac[ta], qt[c["tq"]][ZIGZAG]))
    planes = {c["id"]: np.zeros((mcus_y * 8 * c["v"], mcus_x * 8 * c["h"]),
                                dtype=np.float64) for c in comps}
    pred = {c["id"]: 0 for c in comps}
    seg_iter = iter(segments)
    reader = _BitReader(next(seg_iter))
    since_restart = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and since_restart == restart_interval:
                reader = _BitReader(next(seg_iter))
                pred = {c["id"]: 0 for c in comps}
                since_restart = 0
            since_restart += 1
            for c, hdc, hac, q in order:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = hdc.decode(reader)
                        diff = _extend(reader.receive(t), t)
                        pred[c["id"]] += diff
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = hac.decode(reader)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break        # EOB
                            k += r
                            zz[k] = _extend(reader.receive(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = (zz * q).astype(np.float64)  # q is scan-order
                        spatial = _A.T @ block.reshape(8, 8) @ _A
                        py = (my * c["v"] + by) * 8
                        px = (mx * c["h"] + bx) * 8
                        planes[c["id"]][py:py + 8, px:px + 8] = spatial
    return _compose(frame, planes, hmax, vmax)


def _compose(frame, planes, hmax, vmax) -> np.ndarray:
    """Level shift, upsample component planes to full resolution, crop,
    and convert JFIF YCbCr -> RGB (shared by baseline + progressive)."""
    H, W, comps = frame
    out = []
    for c in comps:
        p = planes[c["id"]] + 128.0
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)
        out.append(p[:H, :W])
    if len(out) == 1:
        return np.clip(np.rint(out[0]), 0, 255).astype(np.uint8)[:, :, None]
    if len(out) != 3:
        raise NotImplementedError(f"{len(out)}-component JPEG (CMYK?)")
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


class _ProgressiveState:
    """Coefficient accumulator for SOF2 scans (T.81 G.2).

    Coefficients are stored in SCAN (zigzag) order per block; each scan
    merges its spectral band / approximation bit into them, and
    ``finish`` dequantizes + IDCTs everything at EOI. Algorithms mirror
    libjpeg's jdphuff.c (decode_mcu_DC_first/_refine, _AC_first/_refine)
    - in particular the EOB-run bookkeeping and the correction-bit rule
    that a history-nonzero coefficient consumes one bit per refinement
    scan that covers it."""

    def __init__(self, frame):
        H, W, comps = frame
        self.frame = frame
        self.hmax = max(c["h"] for c in comps)
        self.vmax = max(c["v"] for c in comps)
        self.mcus_x = -(-W // (8 * self.hmax))
        self.mcus_y = -(-H // (8 * self.vmax))
        self.coefs, self.bdims = {}, {}
        for c in comps:
            self.coefs[c["id"]] = np.zeros(
                (self.mcus_y * c["v"], self.mcus_x * c["h"], 64), np.int64)
            cw = -(-W * c["h"] // self.hmax)     # component dims (B.2.2)
            ch = -(-H * c["v"] // self.vmax)
            self.bdims[c["id"]] = (-(-ch // 8), -(-cw // 8))
        self.by_id = {c["id"]: c for c in comps}

    def decode_scan(self, scan, huff_dc, huff_ac, segments, ri,
                    ss, se, ah, al):
        if ss == 0:
            if se != 0:
                raise ValueError("progressive DC scan with Se != 0")
            self._dc_scan(scan, huff_dc, segments, ri, ah, al)
        else:
            if len(scan) != 1:
                raise ValueError("interleaved progressive AC scan")
            self._ac_scan(scan[0], huff_ac, segments, ri, ss, se, ah, al)

    # ------------------------------------------------------------- DC

    def _dc_scan(self, scan, huff_dc, segments, ri, ah, al):
        if len(scan) > 1:                    # interleaved: MCU geometry
            units = []
            for my in range(self.mcus_y):
                for mx in range(self.mcus_x):
                    mcu = []
                    for cs, td, _ta in scan:
                        c = self.by_id[cs]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                mcu.append((cs, td, my * c["v"] + by,
                                            mx * c["h"] + bx))
                    units.append(mcu)
        else:                                # single comp: real block grid
            cs, td, _ta = scan[0]
            bh, bw = self.bdims[cs]
            units = [[(cs, td, y, x)]
                     for y in range(bh) for x in range(bw)]
        seg_iter = iter(segments)
        reader = _BitReader(next(seg_iter))
        pred = {cs: 0 for cs, _, _ in scan}
        since = 0
        for mcu in units:
            if ri and since == ri:
                reader = _BitReader(next(seg_iter))
                pred = {k: 0 for k in pred}
                since = 0
            since += 1
            for cs, td, y, x in mcu:
                blk = self.coefs[cs]
                if ah == 0:
                    t = huff_dc[td].decode(reader)
                    pred[cs] += _extend(reader.receive(t), t)
                    blk[y, x, 0] = pred[cs] << al
                elif reader.read_bit():
                    blk[y, x, 0] |= (1 << al)

    # ------------------------------------------------------------- AC

    def _ac_scan(self, comp_scan, huff_ac, segments, ri, ss, se, ah, al):
        cs, _td, ta = comp_scan
        hac = huff_ac[ta]
        arr = self.coefs[cs]
        bh, bw = self.bdims[cs]
        seg_iter = iter(segments)
        reader = _BitReader(next(seg_iter))
        eobrun = 0
        since = 0
        decode = self._ac_refine if ah else self._ac_first
        for y in range(bh):
            for x in range(bw):
                if ri and since == ri:
                    reader = _BitReader(next(seg_iter))
                    eobrun = 0
                    since = 0
                since += 1
                eobrun = decode(arr[y, x], reader, hac, ss, se, al, eobrun)

    @staticmethod
    def _ac_first(zz, reader, hac, ss, se, al, eobrun):
        if eobrun > 0:
            return eobrun - 1
        k = ss
        while k <= se:
            rs = hac.decode(reader)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r != 15:                  # EOBn: run of 2^r + bits
                    eobrun = (1 << r) - 1    # -1 accounts this block
                    if r:
                        eobrun += reader.receive(r)
                    return eobrun
                k += 16                      # ZRL
                continue
            k += r
            zz[k] = _extend(reader.receive(s), s) << al
            k += 1
        return 0

    @staticmethod
    def _ac_refine(zz, reader, hac, ss, se, al, eobrun):
        p1, m1 = 1 << al, -(1 << al)
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = hac.decode(reader)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r      # current block counted below
                        if r:
                            eobrun += reader.receive(r)
                        break
                    s_val = 0                # ZRL: skip 16 history zeros
                else:
                    s_val = p1 if reader.read_bit() else m1
                # advance over history-nonzero coeffs (append correction
                # bits) and r history zeros, then place the new coeff
                while k <= se:
                    c = int(zz[k])
                    if c != 0:
                        if reader.read_bit() and (c & p1) == 0:
                            zz[k] = c + (p1 if c >= 0 else m1)
                    else:
                        r -= 1
                        if r < 0:
                            break
                    k += 1
                if s_val and k <= se:
                    zz[k] = s_val
                k += 1
        if eobrun > 0:
            # end-of-band: remaining history coeffs still take bits
            while k <= se:
                c = int(zz[k])
                if c != 0 and reader.read_bit() and (c & p1) == 0:
                    zz[k] = c + (p1 if c >= 0 else m1)
                k += 1
            eobrun -= 1
        return eobrun

    # -------------------------------------------------------- finish

    def finish(self, qt) -> np.ndarray:
        planes = {}
        for c in self.frame[2]:
            q = qt[c["tq"]][ZIGZAG]          # quant in scan order
            arr = self.coefs[c["id"]]
            ny, nx, _ = arr.shape
            raster = np.zeros((ny, nx, 64), np.float64)
            raster[:, :, ZIGZAG] = (arr * q).astype(np.float64)
            b = raster.reshape(ny, nx, 8, 8)
            spatial = np.einsum("ij,yxjk,kl->yxil", _A.T, b, _A)
            planes[c["id"]] = spatial.transpose(0, 2, 1, 3) \
                .reshape(ny * 8, nx * 8)
        return _compose(self.frame, planes, self.hmax, self.vmax)


# ---------------------------------------------------------------- encoder

# Annex K.1/K.2 example quantization tables (raster order after unzigzag).
_K_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103,
    99], dtype=np.int64)
_K_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.int64)

# Annex K.3 typical Huffman tables: (BITS, HUFFVAL)
_K_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
              list(range(12)))
_K_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                list(range(12)))
_K_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_K_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _encode_codes(bits, values):
    """(BITS, HUFFVAL) -> {value: (code, length)} for the encoder side."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)        # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _scale_table(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (1-100) of an Annex K table."""
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((table * scale + 50) // 100, 1, 255)


def _quantize_block(block, q) -> np.ndarray:
    """Spatial 8x8 (level-unshifted uint8-ish floats) -> quantized
    coefficients in scan order (int64[64])."""
    coeffs = _A @ (block - 128.0) @ _A.T
    return np.rint(coeffs.reshape(64)[ZIGZAG] / q[ZIGZAG]).astype(np.int64)


def _encode_block(writer, block, q, dc_codes, ac_codes, pred):
    zz = _quantize_block(block, q)
    diff = int(zz[0]) - pred
    t = _category(diff)
    code, length = dc_codes[t]
    writer.write(code, length)
    if t:
        writer.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        if k > last_nz:
            break
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]    # ZRL
            writer.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]        # EOB
        writer.write(code, length)
    return int(zz[0])


def encode_jpeg(arr: np.ndarray, quality: int = 90) -> bytes:
    """(h, w) or (h, w, 1|3) uint8 -> baseline JPEG bytes (no
    subsampling: 4:4:4, so fidelity is bounded by quantization only)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg supports 1 or 3 channels")
    luma_q = _scale_table(_K_LUMA, quality)
    chroma_q = _scale_table(_K_CHROMA, quality)
    if nc == 3:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
                  128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b]
        qids = [0, 1, 1]
        qtabs = [luma_q, chroma_q, chroma_q]
        hids = [0, 1, 1]
    else:
        planes = [arr[:, :, 0].astype(np.float64)]
        qids, qtabs, hids = [0], [luma_q], [0]

    out = bytearray(b"\xff\xd8")             # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, q in ([(0, luma_q), (1, chroma_q)] if nc == 3
                   else [(0, luma_q)]):
        zz = q[ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zz
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for c in range(nc):
        out += bytes([c + 1, 0x11, qids[c]])
    tables = ([(0x00, _K_DC_LUMA), (0x10, _K_AC_LUMA)] if nc == 1 else
              [(0x00, _K_DC_LUMA), (0x10, _K_AC_LUMA),
               (0x01, _K_DC_CHROMA), (0x11, _K_AC_CHROMA)])
    codes = {}
    for tc, (bits, values) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values)) \
            + bytes([tc]) + bytes(bits) + bytes(values)
        codes[tc] = _encode_codes(bits, values)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for c in range(nc):
        out += bytes([c + 1, (hids[c] << 4) | hids[c]])
    out += b"\x00\x3f\x00"                   # Ss=0 Se=63 Ah/Al=0

    writer = _BitWriter()
    preds = [0] * nc
    bh, bw = -(-h // 8), -(-w // 8)
    padded = [np.pad(p, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
              for p in planes]
    for by in range(bh):
        for bx in range(bw):
            for c in range(nc):
                block = padded[c][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                dc = codes[0x01 if hids[c] else 0x00]
                ac = codes[0x11 if hids[c] else 0x10]
                preds[c] = _encode_block(writer, block, qtabs[c], dc, ac,
                                         preds[c])
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"                       # EOI
    return bytes(out)


# ---------------------------------------------------- progressive encoder

# Flat AC Huffman table holding ALL 256 symbols (255 at 9 bits + 1 at 10;
# Kraft sum 0.499 < 1, so it is a valid canonical table): progressive AC
# scans need EOBn symbols 0x10..0xE0 that the Annex K tables lack (libjpeg
# always Huffman-optimizes progressive streams for the same reason). We
# trade compression for a fixed, spec-valid table - these streams are
# deterministic test fixtures, not production output.
_FLAT_AC = ([0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0],
            list(range(256)))

# libjpeg's default progressive scan script (jcparam.c), 4:4:4 geometry:
# (component indices, Ss, Se, Ah, Al)
_SCRIPT_COLOR = [
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2), ((2,), 1, 63, 0, 1), ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2), ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0), ((1,), 1, 63, 1, 0), ((0,), 1, 63, 1, 0),
]
_SCRIPT_GRAY = [
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2), ((0,), 6, 63, 0, 2), ((0,), 1, 63, 2, 1),
    ((0,), 0, 0, 1, 0), ((0,), 1, 63, 1, 0),
]


class _ProgScanWriter:
    """One scan's entropy encoder (jcphuff.c semantics): EOB-run
    accumulation and, for refinement scans, the buffered correction
    bits that ride behind the next emitted symbol."""

    def __init__(self, dc_codes, ac_codes):
        self.w = _BitWriter()
        self.dc, self.ac = dc_codes, ac_codes
        self.eobrun = 0
        self.be = []                          # bits pending behind an EOB

    def _sym(self, codes, v):
        code, length = codes[v]
        self.w.write(code, length)

    def emit_eobrun(self):
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            self._sym(self.ac, r << 4)
            if r:
                self.w.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
            for b in self.be:
                self.w.write(b, 1)
            self.be = []

    # ---- DC

    def dc_first(self, dc, pred, al):
        v = int(dc) >> al
        diff = v - pred
        t = _category(diff)
        self._sym(self.dc, t)
        if t:
            self.w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        return v

    def dc_refine(self, dc, al):
        self.w.write((int(dc) >> al) & 1, 1)

    # ---- AC

    def ac_first(self, zz, ss, se, al):
        r = 0
        for k in range(ss, se + 1):
            v = int(zz[k])
            a = (-v if v < 0 else v) >> al
            if a == 0:
                r += 1
                continue
            self.emit_eobrun()
            while r > 15:
                self._sym(self.ac, 0xF0)
                r -= 16
            s = a.bit_length()
            self._sym(self.ac, (r << 4) | s)
            self.w.write(a if v >= 0 else (~a) & ((1 << s) - 1), s)
            r = 0
        if r > 0:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.emit_eobrun()

    def ac_refine(self, zz, ss, se, al):
        absv = [(-int(v) if v < 0 else int(v)) >> al
                for v in zz[ss:se + 1]]
        eob = 0                               # last NEWLY-nonzero index
        for i, a in enumerate(absv):
            if a == 1:
                eob = ss + i
        r = 0
        br = []                               # this block's pending bits
        for k in range(ss, se + 1):
            a = absv[k - ss]
            if a == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                self.emit_eobrun()
                self._sym(self.ac, 0xF0)
                r -= 16
                for b in br:
                    self.w.write(b, 1)
                br = []
            if a > 1:                         # history coeff: one bit
                br.append(a & 1)
                continue
            self.emit_eobrun()
            self._sym(self.ac, (r << 4) | 1)
            self.w.write(1 if int(zz[k]) >= 0 else 0, 1)
            for b in br:
                self.w.write(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            self.eobrun += 1
            self.be.extend(br)
            if self.eobrun == 0x7FFF:
                self.emit_eobrun()

    def finish(self) -> bytes:
        self.emit_eobrun()
        self.w.flush()
        return bytes(self.w.out)


def encode_jpeg_progressive(arr: np.ndarray, quality: int = 90) -> bytes:
    """(h, w) or (h, w, 1|3) uint8 -> PROGRESSIVE JPEG (SOF2) bytes,
    4:4:4, libjpeg's default scan script. Encodes the same quantized
    coefficients as encode_jpeg, so decode(progressive) must equal
    decode(baseline) bit-for-bit - the round-trip tests lean on this."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if nc not in (1, 3):
        raise ValueError("1 or 3 channels")
    luma_q = _scale_table(_K_LUMA, quality)
    chroma_q = _scale_table(_K_CHROMA, quality)
    if nc == 3:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
                  128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b]
        qids = [0, 1, 1]
        qtabs = [luma_q, chroma_q, chroma_q]
    else:
        planes = [arr[:, :, 0].astype(np.float64)]
        qids, qtabs = [0], [luma_q]

    bh, bw = -(-h // 8), -(-w // 8)
    padded = [np.pad(p, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
              for p in planes]
    coefs = []                                # per comp: (bh, bw, 64)
    for c in range(nc):
        zz = np.zeros((bh, bw, 64), np.int64)
        for by in range(bh):
            for bx in range(bw):
                zz[by, bx] = _quantize_block(
                    padded[c][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8],
                    qtabs[c])
        coefs.append(zz)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, q in ([(0, luma_q), (1, chroma_q)] if nc == 3
                   else [(0, luma_q)]):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) \
            + q[ZIGZAG].astype(np.uint8).tobytes()
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for c in range(nc):
        out += bytes([c + 1, 0x11, qids[c]])
    dhts = [(0x00, _K_DC_LUMA), (0x10, _FLAT_AC)]
    if nc == 3:
        dhts.append((0x01, _K_DC_CHROMA))
    codes = {}
    for tc, (bits, values) in dhts:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values)) \
            + bytes([tc]) + bytes(bits) + bytes(values)
        codes[tc] = _encode_codes(bits, values)

    script = _SCRIPT_COLOR if nc == 3 else _SCRIPT_GRAY
    for comps_in_scan, ss, se, ah, al in script:
        out += b"\xff\xda" \
            + struct.pack(">HB", 6 + 2 * len(comps_in_scan),
                          len(comps_in_scan))
        for ci in comps_in_scan:
            dc_id = 0x01 if (nc == 3 and ci > 0) else 0x00
            out += bytes([ci + 1, ((dc_id & 0xF) << 4) | 0x0])
        out += bytes([ss, se, (ah << 4) | al])
        sw = _ProgScanWriter(None, codes[0x10])
        if ss == 0:
            preds = {ci: 0 for ci in comps_in_scan}
            for by in range(bh):
                for bx in range(bw):
                    for ci in comps_in_scan:
                        sw.dc = codes[0x01 if (nc == 3 and ci > 0)
                                      else 0x00]
                        dc = coefs[ci][by, bx, 0]
                        if ah == 0:
                            preds[ci] = sw.dc_first(dc, preds[ci], al)
                        else:
                            sw.dc_refine(dc, al)
        else:
            ci = comps_in_scan[0]
            for by in range(bh):
                for bx in range(bw):
                    if ah == 0:
                        sw.ac_first(coefs[ci][by, bx], ss, se, al)
                    else:
                        sw.ac_refine(coefs[ci][by, bx], ss, se, al)
        out += sw.finish()
    out += b"\xff\xd9"
    return bytes(out)
