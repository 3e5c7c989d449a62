# -*- coding: utf-8 -*-
"""Library-free JPEG codec (numpy only): baseline AND progressive.

The last codec refusal in ``multimodal.decode_image`` was JPEG; this
module closes it for the baseline sequential Huffman process (the
format of essentially every crawled photo): full marker walk, DQT /
DHT / SOF0-SOF1 / SOS / DRI parsing, canonical Huffman entropy decode
with 0xFF00 unstuffing and RSTn restarts, dequantize + unzigzag, 2-D
IDCT as two 8x8 matrix products, nearest-neighbor chroma upsampling
for any (h,v) sampling factors in {1,2} (4:4:4 / 4:2:2 / 4:2:0 /
4:4:0), and the JFIF YCbCr->RGB transform. Since round 5 the
PROGRESSIVE Huffman process (SOF2, T.81 Annex G — the other format
crawls actually meet) decodes too: multi-scan coefficient
accumulation with spectral selection, successive-approximation DC/AC
first + refinement scans, EOB-run amortization, then one shared
reconstruction at EOI. Arithmetic-coded, 12-bit and hierarchical
streams still raise ``NotImplementedError`` — honest refusals,
matching the module convention in ``multimodal``.

The encoders exist so the engine can MAKE test payloads without an
imaging library (the sandbox has none): same pipeline in reverse,
standard Annex-K quantization (libjpeg quality scaling) and Annex-K
Huffman tables, optional restart intervals;
``encode_jpeg_progressive`` emits a real multi-scan script (split
spectral bands, Al=1 successive approximation, refinement to Al=0),
so a progressive stream decodes BIT-IDENTICALLY to the baseline
stream of the same input — the equality the tests pin.

Exactness contract used by the ``jpeg_pipeline`` driver query: a
block that is CONSTANT has only a DC coefficient (all AC vanish
identically), and with a DC quantizer of 8 the quantized DC equals
``v - 128`` exactly, so decode returns the constant bit-for-bit —
real JPEG arithmetic, zero quantization loss. The oracle can
therefore reconstruct the decoded-pixel digest with no JPEG code,
exactly like ``png_pipeline``'s zlib round trip.

Reference behavior being re-expressed: the reference pipeline treats
media as opaque payloads plus typed metadata; decode parity here is
defined against the JPEG spec (ITU T.81) itself, not reference code.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Shared constant tables (ITU T.81 Annex K)
# ---------------------------------------------------------------------------

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)
_UNZIGZAG = np.argsort(_ZIGZAG)

_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# (BITS[1..16], HUFFVAL) per Annex K
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_HUFF_AC_CHROMA = (
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# Orthonormal 8x8 DCT matrix: FDCT is C @ f @ C.T, IDCT its transpose
# pair. C[0,:] uses 1/sqrt(8); rows 1..7 are cos((2x+1)u*pi/16)/2.
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = np.cos((2 * _x + 1) * _u * np.pi / 16) * (
            (1 / np.sqrt(8)) if _u == 0 else 0.5
        )


def _fdct2(block):
    """8x8 forward DCT (level-shifted float input)."""
    return _C @ block @ _C.T


def _idct2(coef):
    """8x8 inverse DCT."""
    return _C.T @ coef @ _C


def quality_tables(quality: int):
    """Annex-K tables scaled by the libjpeg quality formula, returned
    in ZIGZAG order (the order DQT stores and this codec quantizes
    in — the Annex-K constants above are the natural row-major
    presentation)."""
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_Q_LUMA, _Q_CHROMA):
        q = (base * scale + 50) // 100
        out.append(np.clip(q, 1, 255).astype(np.int32)[_ZIGZAG])
    return out[0], out[1]


# ---------------------------------------------------------------------------
# Huffman coding
# ---------------------------------------------------------------------------

def _canonical_codes(bits, values):
    """(symbol -> (code, length)) by the T.81 canonical assignment."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code, length):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad_and_flush(self):
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1-bits

    def marker(self, byte):
        self.pad_and_flush()
        self.out += bytes((0xFF, byte))


class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, stops AT any
    other marker (the caller handles RSTn)."""

    def __init__(self, data, pos):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d, n = self.data, len(self.data)
        while self.nbits < 25 and self.pos < n:
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < n else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    return  # restart marker: caller consumes it
                else:
                    return  # real marker: segment over
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read(self, n):
        if n == 0:
            return 0
        self._fill()
        if self.nbits < n:
            raise NotImplementedError("truncated JPEG entropy stream")
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def align_restart(self):
        """Drop pad bits, consume one RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d, n = self.data, len(self.data)
        while self.pos + 1 < n and not (
            d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        if self.pos + 1 >= n:
            raise NotImplementedError("missing JPEG restart marker")
        self.pos += 2

    def decode(self, table):
        """Decode one Huffman symbol via (mincode, maxcode, valptr)."""
        mincode, maxcode, valptr, values = table
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            if maxcode[length] >= 0 and code <= maxcode[length]:
                return values[valptr[length] + code - mincode[length]]
        raise NotImplementedError("invalid JPEG Huffman code")


def _decode_table(bits, values):
    """Build the T.81 F.16 decode arrays from BITS/HUFFVAL."""
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    code, k = 0, 0
    for length in range(1, 17):
        if bits[length - 1]:
            valptr[length] = k
            mincode[length] = code
            code += bits[length - 1]
            k += bits[length - 1]
            maxcode[length] = code - 1
        code <<= 1
    return mincode, maxcode, valptr, list(values)


def _extend(v, size):
    """Sign-extend a magnitude-coded value (T.81 F.12)."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v):
    return int(v).bit_length() if v else 0


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _rgb_to_ycbcr(arr):
    r = arr[:, :, 0].astype(np.float64)
    g = arr[:, :, 1].astype(np.float64)
    b = arr[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return [np.clip(np.round(p), 0, 255) for p in (y, cb, cr)]


def _ycbcr_to_rgb(y, cb, cr):
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.stack(
        [np.clip(np.round(p), 0, 255).astype(np.uint8) for p in (r, g, b)],
        axis=2,
    )


def _pad_to(plane, h, w):
    return np.pad(plane, ((0, h - plane.shape[0]), (0, w - plane.shape[1])),
                  mode="edge")


def _encode_block(writer, block, qtab, dc_codes, ac_codes, pred):
    coef = _fdct2(block - 128.0)
    q = np.round(coef.ravel()[_ZIGZAG] / qtab).astype(np.int32)
    diff = int(q[0]) - pred
    size = _category(diff)
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        writer.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = int(np.max(np.nonzero(q)[0])) if np.any(q[1:]) else 0
    for k in range(1, 64):
        v = int(q[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zrl, zl = ac_codes[0xF0]
            writer.write(zrl, zl)
            run -= 16
        size = _category(v)
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        writer.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        eob, el = ac_codes[0x00]
        writer.write(eob, el)
    return int(q[0])


def encode_jpeg(arr, quality: int = 90, subsampling: str = "444",
                restart_interval: int = 0,
                quant_tables=None) -> bytes:
    """(h, w, 3) uint8 RGB (or (h, w) grayscale) -> baseline JFIF
    JPEG. ``subsampling``: '444', '420' or 'gray'. ``quant_tables``
    overrides the quality-scaled Annex-K pair with explicit zigzag-
    order (luma, chroma) arrays — the jpeg_pipeline exactness hook."""
    import struct

    arr = np.asarray(arr, dtype=np.uint8)
    gray = subsampling == "gray" or arr.ndim == 2
    if arr.ndim == 2:
        planes = [arr.astype(np.float64)]
    elif gray:
        planes = [_rgb_to_ycbcr(arr)[0]]
    else:
        planes = _rgb_to_ycbcr(arr)
    h, w = planes[0].shape
    if quant_tables is not None:
        qluma, qchroma = (np.asarray(t, np.int32) for t in quant_tables)
    else:
        qluma, qchroma = quality_tables(quality)
    hsub, vsub = {"420": (2, 2), "422": (2, 1)}.get(subsampling, (1, 1))
    hv = [(hsub, vsub)] + [(1, 1)] * (len(planes) - 1)
    mcu_h, mcu_w = 8 * hv[0][1], 8 * hv[0][0]
    mcus_y = (h + mcu_h - 1) // mcu_h
    mcus_x = (w + mcu_w - 1) // mcu_w
    comps = []
    for ci, p in enumerate(planes):
        if ci and (hsub > 1 or vsub > 1):  # box-mean chroma downsample
            ph = (h + vsub - 1) // vsub
            pw = (w + hsub - 1) // hsub
            pp = _pad_to(p, ph * vsub, pw * hsub)
            acc = None
            for dy in range(vsub):
                for dx in range(hsub):
                    tile = pp[dy::vsub, dx::hsub]
                    acc = tile if acc is None else acc + tile
            p = acc / float(hsub * vsub)
        bh = mcus_y * 8 * hv[ci][1]
        bw = mcus_x * 8 * hv[ci][0]
        comps.append(_pad_to(p, bh, bw))

    out = bytearray(b"\xFF\xD8")  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)
    for tid, tab in enumerate([qluma] + ([qchroma] if not gray else [])):
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tid) \
            + bytes(int(x) for x in tab)
    nc = 1 if gray else 3
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        out += struct.pack(
            "BBB", ci + 1, (hv[ci][0] << 4) | hv[ci][1], 0 if ci == 0 else 1
        )
    tables = [_HUFF_DC_LUMA, _HUFF_AC_LUMA]
    if not gray:
        tables += [_HUFF_DC_CHROMA, _HUFF_AC_CHROMA]
    for ti, (bits, values) in enumerate(tables):
        cls, tid = ti % 2, ti // 2
        out += b"\xFF\xC4" + struct.pack(
            ">HB", 19 + len(values), (cls << 4) | tid
        ) + bytes(bits) + bytes(values)
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += struct.pack("BB", ci + 1, 0 if ci == 0 else 0x11)
    out += b"\x00\x3F\x00"

    dc_l = _canonical_codes(*_HUFF_DC_LUMA)
    ac_l = _canonical_codes(*_HUFF_AC_LUMA)
    dc_c = _canonical_codes(*_HUFF_DC_CHROMA)
    ac_c = _canonical_codes(*_HUFF_AC_CHROMA)
    writer = _BitWriter()
    preds = [0] * nc
    rst = 0
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                writer.marker(0xD0 + rst)
                rst = (rst + 1) & 7
                preds = [0] * nc
            for ci in range(nc):
                hh, vv = hv[ci]
                qt = qluma if ci == 0 else qchroma
                dct_, act_ = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                for by in range(vv):
                    for bx in range(hh):
                        y0 = (my * vv + by) * 8
                        x0 = (mx * hh + bx) * 8
                        block = comps[ci][y0:y0 + 8, x0:x0 + 8]
                        preds[ci] = _encode_block(
                            writer, block, qt, dct_, act_, preds[ci]
                        )
            n_mcu += 1
    writer.pad_and_flush()
    out += writer.out
    out += b"\xFF\xD9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def parse_jpeg_header(data: bytes):
    """format/width/height/channels from the SOFn segment (header
    walk only, no entropy decode); None when not a JPEG."""
    if len(data) < 4 or data[:2] != b"\xFF\xD8":
        return None
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            return None
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before
        # a marker; skip them so the next byte is the marker id
        while pos + 4 <= n and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > n:
            return None
        m = data[pos + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        size = int.from_bytes(data[pos + 2:pos + 4], "big")
        if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
            if pos + 9 > n:
                return None
            h = int.from_bytes(data[pos + 5:pos + 7], "big")
            w = int.from_bytes(data[pos + 7:pos + 9], "big")
            nc = data[pos + 9]
            return {
                "format": "jpeg", "width": w, "height": h,
                "channels": nc, "sample_rate": None, "duration_ms": None,
                "_sof": m, "_bit_depth": data[pos + 4],
            }
        pos += 2 + size
    return None


def decode_jpeg(data: bytes):
    """Baseline or progressive JPEG -> (h, w, 3) uint8 RGB. Raises
    NotImplementedError for arithmetic-coded / 12-bit / hierarchical
    streams and malformed input."""
    hdr = parse_jpeg_header(data)
    if hdr is None:
        raise NotImplementedError("not a JPEG")
    sof = hdr["_sof"]
    if sof == 0xC2:
        return _decode_progressive(data, hdr)
    if sof not in (0xC0, 0xC1):
        raise NotImplementedError(
            "only baseline/extended-sequential/progressive Huffman "
            "JPEG decodable without codecs (SOF marker 0x%02X)" % sof
        )
    if hdr["_bit_depth"] != 8:
        raise NotImplementedError("only 8-bit JPEG supported")

    qtabs = {}
    htabs = {}
    comps = []  # (id, h, v, tq)
    scan = None
    restart = 0
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise NotImplementedError("JPEG marker desync")
        # skip 0xFF fill bytes (T.81 B.1.1.2 legal marker padding)
        while pos + 4 <= n and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > n:
            break
        m = data[pos + 1]
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        size = int.from_bytes(data[pos + 2:pos + 4], "big")
        seg = data[pos + 4:pos + 2 + size]
        if m == 0xDB:
            s = 0
            while s < len(seg):
                pq, tq = seg[s] >> 4, seg[s] & 15
                if pq:
                    raise NotImplementedError("16-bit DQT unsupported")
                qtabs[tq] = np.frombuffer(
                    seg, np.uint8, count=64, offset=s + 1
                ).astype(np.int32)
                s += 65
        elif m == 0xC4:
            s = 0
            while s + 17 <= len(seg):
                cls, tid = seg[s] >> 4, seg[s] & 15
                bits = list(seg[s + 1:s + 17])
                cnt = sum(bits)
                vals = list(seg[s + 17:s + 17 + cnt])
                htabs[(cls, tid)] = _decode_table(bits, vals)
                s += 17 + cnt
        elif m in (0xC0, 0xC1):
            nc = seg[5]
            for ci in range(nc):
                cid = seg[6 + 3 * ci]
                hv = seg[7 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 15, seg[8 + 3 * ci]))
        elif m == 0xDD:
            restart = int.from_bytes(seg[:2], "big")
        elif m == 0xDA:
            ns = seg[0]
            scan = {}
            for si in range(ns):
                scan[seg[1 + 2 * si]] = (
                    seg[2 + 2 * si] >> 4, seg[2 + 2 * si] & 15
                )
            pos += 2 + size
            break
        pos += 2 + size
    if scan is None or not comps:
        raise NotImplementedError("JPEG without SOS/SOF")
    for _, hh, vv, _ in comps:
        if hh not in (1, 2) or vv not in (1, 2):
            raise NotImplementedError(
                "JPEG sampling factors beyond 2 unsupported"
            )

    h, w = hdr["height"], hdr["width"]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcus_y * 8 * vv, mcus_x * 8 * hh), np.float64)
        for _, hh, vv, _ in comps
    ]
    reader = _BitReader(data, pos)
    preds = {cid: 0 for cid, *_ in comps}
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and n_mcu and n_mcu % restart == 0:
                reader.align_restart()
                preds = {cid: 0 for cid, *_ in comps}
            for ci, (cid, hh, vv, tq) in enumerate(comps):
                if tq not in qtabs:
                    raise NotImplementedError("missing DQT %d" % tq)
                dc_t = htabs.get((0, scan[cid][0]))
                ac_t = htabs.get((1, scan[cid][1]))
                if dc_t is None or ac_t is None:
                    raise NotImplementedError("missing DHT for scan")
                qt = qtabs[tq]
                for by in range(vv):
                    for bx in range(hh):
                        zz = np.zeros(64, np.int32)
                        size = reader.decode(dc_t)
                        diff = _extend(reader.read(size), size) if size else 0
                        preds[cid] += diff
                        zz[0] = preds[cid]
                        k = 1
                        while k < 64:
                            rs = reader.decode(ac_t)
                            run, size = rs >> 4, rs & 15
                            if size == 0:
                                if run == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise NotImplementedError(
                                    "JPEG AC index overflow"
                                )
                            zz[k] = _extend(reader.read(size), size)
                            k += 1
                        coef = np.zeros(64, np.float64)
                        coef[_ZIGZAG] = (zz * qt).astype(np.float64)
                        block = _idct2(coef.reshape(8, 8)) + 128.0
                        y0 = (my * vv + by) * 8
                        x0 = (mx * hh + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = block
            n_mcu += 1

    full = []
    for ci, (cid, hh, vv, _) in enumerate(comps):
        p = planes[ci]
        if hh < hmax:
            p = np.repeat(p, hmax // hh, axis=1)
        if vv < vmax:
            p = np.repeat(p, vmax // vv, axis=0)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if len(full) != 3:
        raise NotImplementedError(
            "JPEG with %d components unsupported" % len(full)
        )
    return _ycbcr_to_rgb(full[0], full[1], full[2])


# ---------------------------------------------------------------------------
# Progressive mode (ITU T.81 Annex G: spectral selection + successive
# approximation, Huffman entropy coding)
# ---------------------------------------------------------------------------
#
# A progressive stream carries the SAME quantized DCT coefficients as a
# baseline one, split across multiple SOS scans: DC first/refinement
# scans (interleaved or per-component) and per-component AC scans over
# a spectral band [Ss, Se] at successive-approximation precision
# Ah/Al, with EOB-run symbols amortizing trailing zero bands across
# blocks. The decoder accumulates coefficients per component across
# scans and reconstructs once at EOI — which is also exactly the shape
# a Spark decode UDF wants: one pass over the byte payload, no
# intermediate pixel materialization.


def _comp_grids(comps, h, w):
    """Per-component (padded block grid, coded block grid): the MCU-
    padded grid (interleaved scans) and the ceil(comp_size/8) grid
    (non-interleaved scans code ONLY these blocks, T.81 A.2.2)."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    grids = []
    for _, hh, vv, _ in comps:
        cw = (w * hh + hmax - 1) // hmax
        ch = (h * vv + vmax - 1) // vmax
        grids.append({
            "pad_w": mcus_x * hh, "pad_h": mcus_y * vv,
            "cod_w": (cw + 7) // 8, "cod_h": (ch + 7) // 8,
        })
    return hmax, vmax, mcus_x, mcus_y, grids


def _refine_ac(reader, coef, ac_t, ss, se, al, eobrun):
    """AC successive-approximation refinement for ONE block
    (T.81 G.1.2.3 / the classic libjpeg control flow). ``coef`` is
    the zigzag-order int32 array; returns the updated EOB run."""
    p1, m1 = 1 << al, -1 << al

    def correct(k):
        if reader.read(1) and (coef[k] & p1) == 0:
            coef[k] += p1 if coef[k] >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode(ac_t)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read(r)
                    break
                newval = 0  # ZRL: skip 16 zero-history positions
            else:
                if s != 1:
                    raise NotImplementedError(
                        "invalid size %d in AC refinement scan" % s)
                newval = p1 if reader.read(1) else m1
            while k <= se:
                if coef[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        if newval:
                            coef[k] = newval
                        k += 1
                        break
                    r -= 1
                k += 1
    if eobrun > 0:
        while k <= se:
            if coef[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _first_ac(reader, coef, ac_t, ss, se, al, eobrun):
    """AC first scan for one block (T.81 G.1.2.2); returns EOB run
    (count of FOLLOWING all-zero-band blocks)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode(ac_t)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read(r)
            break
        k += r
        if k > se:
            raise NotImplementedError("JPEG AC index overflow")
        coef[k] = _extend(reader.read(s), s) << al
        k += 1
    return eobrun


def _decode_progressive(data: bytes, hdr) -> "np.ndarray":
    if hdr["_bit_depth"] != 8:
        raise NotImplementedError("only 8-bit JPEG supported")
    h, w = hdr["height"], hdr["width"]
    qtabs = {}
    htabs = {}
    comps = []  # (cid, h, v, tq)
    restart = 0
    pos = 2
    n = len(data)
    coefs = None
    grids = None
    hmax = vmax = mcus_x = mcus_y = 0
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise NotImplementedError("JPEG marker desync")
        while pos + 4 <= n and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > n:
            break
        m = data[pos + 1]
        if m == 0xD9:
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        size = int.from_bytes(data[pos + 2:pos + 4], "big")
        seg = data[pos + 4:pos + 2 + size]
        if m == 0xDB:
            s = 0
            while s < len(seg):
                pq, tq = seg[s] >> 4, seg[s] & 15
                if pq:
                    raise NotImplementedError("16-bit DQT unsupported")
                qtabs[tq] = np.frombuffer(
                    seg, np.uint8, count=64, offset=s + 1
                ).astype(np.int32)
                s += 65
        elif m == 0xC4:
            s = 0
            while s + 17 <= len(seg):
                cls, tid = seg[s] >> 4, seg[s] & 15
                bits = list(seg[s + 1:s + 17])
                cnt = sum(bits)
                htabs[(cls, tid)] = _decode_table(
                    bits, list(seg[s + 17:s + 17 + cnt]))
                s += 17 + cnt
        elif m == 0xC2:
            nc = seg[5]
            for ci in range(nc):
                cid = seg[6 + 3 * ci]
                hv = seg[7 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 15, seg[8 + 3 * ci]))
            for _, hh, vv, _ in comps:
                if hh not in (1, 2) or vv not in (1, 2):
                    raise NotImplementedError(
                        "JPEG sampling factors beyond 2 unsupported")
            hmax, vmax, mcus_x, mcus_y, grids = _comp_grids(comps, h, w)
            coefs = [
                np.zeros((g["pad_h"], g["pad_w"], 64), np.int32)
                for g in grids
            ]
        elif m == 0xDD:
            restart = int.from_bytes(seg[:2], "big")
        elif m == 0xDA:
            if coefs is None:
                raise NotImplementedError("JPEG SOS before SOF2")
            ns = seg[0]
            scomps = []  # (comp index, dc table id, ac table id)
            for si in range(ns):
                cid = seg[1 + 2 * si]
                idx = next(
                    (i for i, c in enumerate(comps) if c[0] == cid), None)
                if idx is None:
                    raise NotImplementedError("SOS names unknown component")
                scomps.append((idx, seg[2 + 2 * si] >> 4,
                               seg[2 + 2 * si] & 15))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 15
            pos = _progressive_scan(
                data, pos + 2 + size, comps, scomps, coefs, grids,
                htabs, mcus_x, mcus_y, ss, se, ah, al, restart)
            continue
        pos += 2 + size

    if coefs is None:
        raise NotImplementedError("JPEG without SOF2/SOS")
    # reconstruction: dequantize + unzigzag + IDCT every block at once
    planes = []
    for ci, (cid, hh, vv, tq) in enumerate(comps):
        if tq not in qtabs:
            raise NotImplementedError("missing DQT %d" % tq)
        arr = (coefs[ci] * qtabs[tq]).astype(np.float64)
        nat = arr[:, :, _UNZIGZAG].reshape(
            arr.shape[0], arr.shape[1], 8, 8)
        blocks = np.einsum("ij,yxjk,kl->yxil", _C.T, nat, _C) + 128.0
        plane = blocks.transpose(0, 2, 1, 3).reshape(
            arr.shape[0] * 8, arr.shape[1] * 8)
        if hh < hmax:
            plane = np.repeat(plane, hmax // hh, axis=1)
        if vv < vmax:
            plane = np.repeat(plane, vmax // vv, axis=0)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if len(planes) != 3:
        raise NotImplementedError(
            "JPEG with %d components unsupported" % len(planes))
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])


def _progressive_scan(data, pos, comps, scomps, coefs, grids, htabs,
                      mcus_x, mcus_y, ss, se, ah, al, restart):
    """Decode one progressive SOS entropy segment; returns the byte
    position after it."""
    reader = _BitReader(data, pos)
    if ss == 0:
        if se != 0:
            raise NotImplementedError("progressive DC scan with Se != 0")
        dc_ts = {}
        for idx, dct, _ in scomps:
            if ah == 0:
                t = htabs.get((0, dct))
                if t is None:
                    raise NotImplementedError("missing DC DHT for scan")
                dc_ts[idx] = t
        preds = {idx: 0 for idx, _, _ in scomps}
        n_units = 0

        def dc_unit(idx, by, bx):
            c = coefs[idx][by, bx]
            if ah == 0:
                size = reader.decode(dc_ts[idx])
                diff = _extend(reader.read(size), size) if size else 0
                preds[idx] += diff
                c[0] = preds[idx] << al
            else:
                if reader.read(1):
                    c[0] |= 1 << al

        if len(scomps) > 1:
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if restart and n_units and n_units % restart == 0:
                        reader.align_restart()
                        preds = {i: 0 for i in preds}
                    for idx, _, _ in scomps:
                        _, hh, vv, _ = comps[idx]
                        for by in range(vv):
                            for bx in range(hh):
                                dc_unit(idx, my * vv + by, mx * hh + bx)
                    n_units += 1
        else:
            idx = scomps[0][0]
            g = grids[idx]
            for by in range(g["cod_h"]):
                for bx in range(g["cod_w"]):
                    if restart and n_units and n_units % restart == 0:
                        reader.align_restart()
                        preds = {i: 0 for i in preds}
                    dc_unit(idx, by, bx)
                    n_units += 1
    else:
        if len(scomps) != 1:
            raise NotImplementedError(
                "progressive AC scan must be non-interleaved")
        idx, _, act = scomps[0]
        ac_t = htabs.get((1, act))
        if ac_t is None:
            raise NotImplementedError("missing AC DHT for scan")
        g = grids[idx]
        eobrun = 0
        n_units = 0
        for by in range(g["cod_h"]):
            for bx in range(g["cod_w"]):
                if restart and n_units and n_units % restart == 0:
                    reader.align_restart()
                    eobrun = 0
                c = coefs[idx][by, bx]
                if ah == 0:
                    eobrun = _first_ac(reader, c, ac_t, ss, se, al, eobrun)
                else:
                    eobrun = _refine_ac(reader, c, ac_t, ss, se, al, eobrun)
                n_units += 1
    # skip to the next marker (drop pad bits)
    p = reader.pos
    n = len(data)
    while p + 1 < n and not (
        data[p] == 0xFF and data[p + 1] != 0x00
        and not (0xD0 <= data[p + 1] <= 0xD7)
    ):
        p += 1
    return p


# ---------------------------------------------------------------------------
# Progressive encoder (test-vector source: the sandbox has no imaging
# library, so the decoder's spec coverage is proven against streams
# built here — same Annex-K tables, SOF2, a scan script exercising
# spectral selection, successive approximation, EOB runs and the
# AC-refinement correction-bit protocol)
# ---------------------------------------------------------------------------

# Progressive AC scans use EOBn run symbols (0x10..0xE0) that the
# baseline Annex-K tables do not contain; this table carries every
# symbol a progressive AC scan can emit — (run<<4|size) for size 1-10,
# ZRL, and EOB0..EOB14 — as a flat 8-bit canonical code (176 codes,
# Kraft 176/256, all-ones code unused). Valid for DHT emission and
# for any conformant decoder; compactness is irrelevant for test
# vectors.
_HUFF_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    sorted(
        [(r << 4) | s for r in range(16) for s in range(1, 11)]
        + [r << 4 for r in range(15)] + [0xF0]
    ),
)


def _enc_ac_first(writer, blocks, ac_codes, ss, se, al):
    """AC first scan over a component's coded blocks: point-transformed
    band runs + cross-block EOB-run accumulation (T.81 G.1.2.2)."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if not eobrun:
            return
        r = eobrun.bit_length() - 1
        code, length = ac_codes[r << 4]
        writer.write(code, length)
        if r:
            writer.write(eobrun - (1 << r), r)
        eobrun = 0

    for zz in blocks:
        band = [int(v) for v in zz[ss:se + 1]]
        t = [(abs(v) >> al) * (1 if v >= 0 else -1) for v in band]
        last = max((i for i, v in enumerate(t) if v), default=-1)
        if last < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        for i in range(last + 1):
            v = t[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]
                writer.write(code, length)
                run -= 16
            size = _category(v)
            code, length = ac_codes[(run << 4) | size]
            writer.write(code, length)
            writer.write(v if v > 0 else v + (1 << size) - 1, size)
            run = 0
        if last < se - ss:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _enc_ac_refine(writer, blocks, ac_codes, ss, se, al):
    """AC refinement scan (T.81 G.1.2.3): newly-nonzero coefficients
    coded as run/1 symbols + sign, previously-nonzero ones as
    correction bits buffered behind the symbol (or the EOB run) they
    ride with — the exact bit order the decoder's walk consumes."""
    eobrun = 0
    bebits: list = []

    def flush_eob():
        nonlocal eobrun, bebits
        if not eobrun and not bebits:
            return
        if not eobrun:  # bits can only ride an EOB or a symbol
            raise AssertionError("dangling correction bits")
        r = eobrun.bit_length() - 1
        code, length = ac_codes[r << 4]
        writer.write(code, length)
        if r:
            writer.write(eobrun - (1 << r), r)
        for b in bebits:
            writer.write(b, 1)
        eobrun = 0
        bebits = []

    for zz in blocks:
        band = [int(v) for v in zz[ss:se + 1]]
        t = [abs(v) >> al for v in band]
        eobpos = max((i for i, v in enumerate(t) if v == 1), default=-1)
        if eobpos < 0:
            # no newly-nonzero coefficient: the whole block rides the
            # EOB run; its previously-nonzero corrections queue up
            eobrun += 1
            bebits.extend((v >> al) & 1 for v in
                          (abs(x) for x in band) if (v >> (al + 1)))
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        br: list = []
        for i, v in enumerate(band):
            ti = t[i]
            if ti == 0:
                run += 1
                continue
            while run > 15 and i <= eobpos:
                code, length = ac_codes[0xF0]
                writer.write(code, length)
                for b in br:
                    writer.write(b, 1)
                br = []
                run -= 16
            if ti > 1:  # previously nonzero: correction bit
                br.append((abs(v) >> al) & 1)
                continue
            code, length = ac_codes[(run << 4) | 1]
            writer.write(code, length)
            writer.write(1 if v > 0 else 0, 1)
            for b in br:
                writer.write(b, 1)
            br = []
            run = 0
        if run > 0 or br:
            eobrun += 1
            bebits.extend(br)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def encode_jpeg_progressive(arr, quality: int = 90,
                            subsampling: str = "444",
                            quant_tables=None) -> bytes:
    """(h, w, 3) uint8 RGB (or (h, w) / 'gray') -> progressive JFIF
    JPEG (SOF2). Scan script: interleaved DC at Al=1 + DC refinement;
    luma AC split into two spectral bands at Al=1, chroma AC full-band
    at Al=1; one full-band AC refinement per component to Al=0 — so
    the stream transmits EXACTLY the baseline-quantized coefficients
    and decode equals the baseline decode bit-for-bit."""
    import struct

    arr = np.asarray(arr, dtype=np.uint8)
    gray = subsampling == "gray" or arr.ndim == 2
    if arr.ndim == 2:
        planes = [arr.astype(np.float64)]
    elif gray:
        planes = [_rgb_to_ycbcr(arr)[0]]
    else:
        planes = _rgb_to_ycbcr(arr)
    h, w = planes[0].shape
    if quant_tables is not None:
        qluma, qchroma = (np.asarray(t, np.int32) for t in quant_tables)
    else:
        qluma, qchroma = quality_tables(quality)
    hsub, vsub = {"420": (2, 2), "422": (2, 1)}.get(subsampling, (1, 1))
    hv = [(hsub, vsub)] + [(1, 1)] * (len(planes) - 1)
    nc = len(planes)
    comps_meta = [(ci + 1, hv[ci][0], hv[ci][1], 0 if ci == 0 else 1)
                  for ci in range(nc)]
    hmax, vmax, mcus_x, mcus_y, grids = _comp_grids(comps_meta, h, w)

    # quantized zigzag coefficient grids, padded like the decoder's
    qgrids = []
    for ci, p in enumerate(planes):
        if ci and (hsub > 1 or vsub > 1):
            ph = (h + vsub - 1) // vsub
            pw = (w + hsub - 1) // hsub
            pp = _pad_to(p, ph * vsub, pw * hsub)
            acc = None
            for dy in range(vsub):
                for dx in range(hsub):
                    tile = pp[dy::vsub, dx::hsub]
                    acc = tile if acc is None else acc + tile
            p = acc / float(hsub * vsub)
        g = grids[ci]
        pp = _pad_to(p, g["pad_h"] * 8, g["pad_w"] * 8)
        qt = qluma if ci == 0 else qchroma
        grid = np.zeros((g["pad_h"], g["pad_w"], 64), np.int32)
        for by in range(g["pad_h"]):
            for bx in range(g["pad_w"]):
                block = pp[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                coef = _fdct2(block - 128.0)
                grid[by, bx] = np.round(
                    coef.ravel()[_ZIGZAG] / qt).astype(np.int32)
        qgrids.append(grid)

    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)
    for tid, tab in enumerate([qluma] + ([qchroma] if nc > 1 else [])):
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tid) \
            + bytes(int(x) for x in tab)
    out += b"\xFF\xC2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for cid, hh, vv, tq in comps_meta:
        out += struct.pack("BBB", cid, (hh << 4) | vv, tq)
    tables = [(0, 0, _HUFF_DC_LUMA), (1, 0, _HUFF_AC_PROG)]
    if nc > 1:
        tables.append((0, 1, _HUFF_DC_CHROMA))
    for cls, tid, (bits, values) in tables:
        out += b"\xFF\xC4" + struct.pack(
            ">HB", 19 + len(values), (cls << 4) | tid
        ) + bytes(bits) + bytes(values)

    dc_codes = [_canonical_codes(*(_HUFF_DC_LUMA if ci == 0
                                   else _HUFF_DC_CHROMA))
                for ci in range(nc)]
    ac_codes = [_canonical_codes(*_HUFF_AC_PROG) for _ in range(nc)]

    def sos_header(comp_ids, ss, se, ah, al):
        hdr = b"\xFF\xDA" + struct.pack(
            ">HB", 6 + 2 * len(comp_ids), len(comp_ids))
        for cid in comp_ids:
            ci = cid - 1
            td = 0 if ci == 0 else 1
            hdr += struct.pack("BB", cid, (td << 4) | 0)
        return hdr + struct.pack("BBB", ss, se, (ah << 4) | al)

    # scan 1: interleaved DC, Al=1
    out += sos_header([c[0] for c in comps_meta], 0, 0, 0, 1)
    writer = _BitWriter()
    preds = [0] * nc
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(nc):
                hh, vv = hv[ci]
                for by in range(vv):
                    for bx in range(hh):
                        d = int(qgrids[ci][my * vv + by, mx * hh + bx, 0])
                        d >>= 1  # arithmetic shift = DC point transform
                        diff = d - preds[ci]
                        preds[ci] = d
                        size = _category(diff)
                        code, length = dc_codes[ci][size]
                        writer.write(code, length)
                        if size:
                            writer.write(
                                diff if diff > 0
                                else diff + (1 << size) - 1, size)
    writer.pad_and_flush()
    out += writer.out

    # scan 2: interleaved DC refinement to Al=0 (raw bits, no Huffman)
    out += sos_header([c[0] for c in comps_meta], 0, 0, 1, 0)
    writer = _BitWriter()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(nc):
                hh, vv = hv[ci]
                for by in range(vv):
                    for bx in range(hh):
                        writer.write(
                            int(qgrids[ci][my * vv + by,
                                           mx * hh + bx, 0]) & 1, 1)
    writer.pad_and_flush()
    out += writer.out

    def coded_blocks(ci):
        g = grids[ci]
        return [qgrids[ci][by, bx]
                for by in range(g["cod_h"]) for bx in range(g["cod_w"])]

    # AC first scans at Al=1: luma split into two spectral bands
    bands = [(0, 1, 5), (0, 6, 63)] + [(ci, 1, 63) for ci in range(1, nc)]
    for ci, ss, se in bands:
        out += sos_header([ci + 1], ss, se, 0, 1)
        writer = _BitWriter()
        _enc_ac_first(writer, coded_blocks(ci), ac_codes[ci], ss, se, 1)
        writer.pad_and_flush()
        out += writer.out
    # AC refinement scans to Al=0, full band per component
    for ci in range(nc):
        out += sos_header([ci + 1], 1, 63, 1, 0)
        writer = _BitWriter()
        _enc_ac_refine(writer, coded_blocks(ci), ac_codes[ci], 1, 63, 0)
        writer.pad_and_flush()
        out += writer.out

    out += b"\xFF\xD9"
    return bytes(out)
