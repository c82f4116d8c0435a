"""Baseline JPEG (SOF0) codec — pure stdlib + numpy.

Public-knowledge implementation of ITU-T T.81 baseline sequential DCT
(the ubiquitous 8-bit Huffman JPEG): the encoder writes JFIF files with
the Annex K quantization/Huffman tables (luma + chroma, 4:4:4), the
decoder handles arbitrary baseline streams — multiple DQT/DHT
segments, 16-bit quant precision, component sampling factors 1–2
(4:4:4 / 4:2:2 / 4:2:0 via replication upsampling), restart markers,
odd dimensions.  Progressive (SOF2) and arithmetic-coded streams are
out of scope and raise ``ValueError``.

Like :mod:`.png`, this exists so the media pipeline's decode stage is
REAL for the two dominant web image formats without PIL in the
container (the reference has no media handling at all — this is a
beyond-reference training-data-pipeline component).  Correctness over
throughput: Huffman entropy decode is a Python bit loop (the IDCT and
color transform are vectorized numpy over all blocks at once); a
production deployment would swap in a codec library inside the same
actor-pool stage.

Verification without a reference codec in the container: round-trip
tests (encode → decode) with hand-checkable cases — a uniform image
must round-trip EXACTLY (DC-only blocks), high-quality noise/gradient
round-trips within a small MSE, odd sizes keep exact dimensions.
"""

from __future__ import annotations

import struct

import numpy as np

# raster index of the k-th coefficient in zigzag scan order (T.81 §A.3.6)
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIG = np.argsort(ZIGZAG)  # raster position -> zigzag index

# Annex K.1 quantization tables (quality 50 base)
_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 Huffman table specs: (BITS[1..16], HUFFVAL)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal 8-point DCT-II basis: T @ block @ T.T == JPEG FDCT
_DCT_T = np.zeros((8, 8))
_DCT_T[0, :] = 1.0 / np.sqrt(8.0)
for _k in range(1, 8):
    for _n in range(8):
        _DCT_T[_k, _n] = 0.5 * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def is_jpeg(payload: bytes) -> bool:
    return len(payload) > 3 and payload[:2] == b"\xff\xd8"


def _canonical_codes(bits, values):
    """(BITS, HUFFVAL) → list of (length, code, symbol) — T.81 §C.2."""
    out = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((length, code, values[k]))
            code += 1
            k += 1
        code <<= 1
    return out


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling (public formula)."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


def _magnitude(v: int) -> tuple[int, int]:
    """value → (category size, appended bits) — T.81 §F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) edge-padded plane → (n_blocks_y, n_blocks_x, 8, 8)."""
    h, w = plane.shape
    ph = (-h) % 8
    pw = (-w) % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    return plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)


def encode_jpeg_baseline(img: np.ndarray, quality: int = 85) -> bytes:
    """uint8 grayscale (H, W) or RGB (H, W, 3) → baseline JFIF bytes
    (4:4:4, Annex K tables scaled by ``quality``)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg_baseline expects uint8")
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("expected (H,W) or (H,W,3)")
    h, w = img.shape[:2]
    if not (h and w):
        raise ValueError("empty image")

    ql = _scale_quant(_QUANT_LUMA, quality).reshape(8, 8)
    qc = _scale_quant(_QUANT_CHROMA, quality).reshape(8, 8)
    planes = (
        [img.astype(np.float64)]
        if gray
        else list(np.moveaxis(_rgb_to_ycbcr(img), -1, 0))
    )
    qtabs = [ql] if gray else [ql, qc, qc]

    # quantized zigzag coefficients per component, all blocks at once
    comp_coefs = []
    for plane, q in zip(planes, qtabs):
        blocks = _blocks_of(plane) - 128.0
        coefs = np.einsum("ij,yxjk,lk->yxil", _DCT_T, blocks, _DCT_T)
        zz = np.rint(coefs / q).astype(np.int64).reshape(-1, 64)[:, ZIGZAG]
        comp_coefs.append(zz)

    enc_tables = {}
    for tclass, tid, spec in (
        (0, 0, _DC_LUMA), (1, 0, _AC_LUMA),
        (0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA),
    ):
        enc_tables[(tclass, tid)] = {
            sym: (length, code)
            for length, code, sym in _canonical_codes(*spec)
        }

    bw = _BitWriter()
    n_comp = 1 if gray else 3
    preds = [0] * n_comp
    n_blocks = comp_coefs[0].shape[0]
    for bi in range(n_blocks):
        for ci in range(n_comp):
            tid = 0 if ci == 0 else 1
            dc_tab = enc_tables[(0, tid)]
            ac_tab = enc_tables[(1, tid)]
            zz = comp_coefs[ci][bi]
            diff = int(zz[0]) - preds[ci]
            preds[ci] = int(zz[0])
            size, bits = _magnitude(diff)
            length, code = dc_tab[size]
            bw.write(code, length)
            bw.write(bits, size)
            run = 0
            last_nz = 0
            nz = np.nonzero(zz[1:])[0]
            last_nz = (nz[-1] + 1) if len(nz) else 0
            for k in range(1, last_nz + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    length, code = ac_tab[0xF0]  # ZRL
                    bw.write(code, length)
                    run -= 16
                size, bits = _magnitude(v)
                length, code = ac_tab[(run << 4) | size]
                bw.write(code, length)
                bw.write(bits, size)
                run = 0
            if last_nz < 63:
                length, code = ac_tab[0x00]  # EOB
                bw.write(code, length)
    bw.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 1, 1) + b"\x00\x00"  # APP0
    # DQT
    for tid, q in ((0, ql),) if gray else ((0, ql), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(x) for x in q.reshape(-1)[ZIGZAG])
    # SOF0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * n_comp, 8, h, w, n_comp)
    for ci in range(n_comp):
        out += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    # DHT
    specs = ((0, 0, _DC_LUMA), (1, 0, _AC_LUMA)) if gray else (
        (0, 0, _DC_LUMA), (1, 0, _AC_LUMA),
        (0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA),
    )
    for tclass, tid, (bits_, vals) in specs:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([(tclass << 4) | tid]) + bytes(bits_) + bytes(vals)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * n_comp, n_comp)
    for ci in range(n_comp):
        tid = 0 if ci == 0 else 1
        out += bytes([ci + 1, (tid << 4) | tid])
    out += b"\x00\x3f\x00"
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-segment bit reader: FF00 unstuffing, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker = None  # set when a non-RST marker ends the scan

    def _fill(self) -> bool:
        d = self.data
        p = self.pos
        if p >= len(d):
            return False
        byte = d[p]
        if byte == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos = p + 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn consumed by caller
                return False
            else:
                self.marker = nxt
                return False
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | byte
        self.n += 8
        return True

    def read_bit(self) -> int:
        if self.n == 0 and not self._fill():
            return 0  # missing bits decode as 0 (truncated stream)
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def at_restart(self) -> bool:
        d, p = self.data, self.pos
        return (
            p + 1 < len(d) and d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7
        )

    def skip_restart(self) -> None:
        self.acc = 0
        self.n = 0
        self.pos += 2


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


class _HuffDecoder:
    """Canonical-code decoder: min/max code per length (T.81 §F.2.2.3)."""

    __slots__ = ("mincode", "maxcode", "valptr", "values")

    def __init__(self, bits, values):
        self.values = values
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = br.read_bit()
        length = 1
        while code > self.maxcode[length]:
            if length >= 16:
                raise ValueError("invalid Huffman code")
            code = (code << 1) | br.read_bit()
            length += 1
        return self.values[self.valptr[length] + code - self.mincode[length]]


def decode_jpeg_baseline(payload: bytes) -> np.ndarray:
    """Baseline JFIF/EXIF bytes → uint8 (H, W) grayscale or (H, W, 3)
    RGB.  Raises ``ValueError`` on progressive/arithmetic streams."""
    d = payload
    if not is_jpeg(d):
        raise ValueError("not a JPEG stream")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    restart_interval = 0
    while pos < len(d):
        if d[pos] != 0xFF:
            pos += 1
            continue
        marker = d[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI before SOS
            break
        seg_len = struct.unpack(">H", d[pos:pos + 2])[0]
        seg = d[pos + 2:pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec = seg[p] >> 4
                tid = seg[p] & 0x0F
                p += 1
                if prec:
                    q = np.frombuffer(
                        seg[p:p + 128], dtype=">u2"
                    ).astype(np.int64)
                    p += 128
                else:
                    q = np.frombuffer(
                        seg[p:p + 64], dtype=np.uint8
                    ).astype(np.int64)
                    p += 64
                raster = np.zeros(64, dtype=np.int64)
                raster[ZIGZAG] = q
                qtables[tid] = raster.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tclass = seg[p] >> 4
                tid = seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                n_vals = sum(bits)
                vals = list(seg[p + 17:p + 17 + n_vals])
                htables[(tclass, tid)] = _HuffDecoder(bits, vals)
                p += 17 + n_vals
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            precision, height, width, n_comp = struct.unpack(
                ">BHHB", seg[:6]
            )
            if precision != 8:
                raise ValueError("only 8-bit baseline JPEG supported")
            comps = []
            for ci in range(n_comp):
                cid, hv, tq = seg[6 + 3 * ci:9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"h": height, "w": width, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "unsupported JPEG coding process (progressive/arithmetic)"
            )
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            n_scan = seg[0]
            scan_tabs = {}
            for si in range(n_scan):
                cid = seg[1 + 2 * si]
                td = seg[2 + 2 * si] >> 4
                ta = seg[2 + 2 * si] & 0x0F
                scan_tabs[cid] = (td, ta)
            return _decode_scan(
                d, pos + seg_len, frame, scan_tabs, qtables, htables,
                restart_interval,
            )
        pos += seg_len
    raise ValueError("no scan data found")


def _decode_scan(d, pos, frame, scan_tabs, qtables, htables,
                 restart_interval):
    h_img, w_img = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in comps):
        raise ValueError("sampling factors beyond 1-2 unsupported")
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))

    # per-component dequantized coefficient store (blocks in MCU order)
    store = []
    for c in comps:
        bx = mcus_x * c["h"]
        by = mcus_y * c["v"]
        store.append(np.zeros((by, bx, 64), dtype=np.float64))

    br = _BitReader(d, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                if br.at_restart():
                    br.skip_restart()
                    preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = scan_tabs[c["id"]]
                dc = htables[(0, td)]
                ac = htables[(1, ta)]
                q = qtables[c["tq"]].reshape(-1)
                for byy in range(c["v"]):
                    for bxx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        size = dc.decode(br)
                        diff = _extend(br.read_bits(size), size)
                        preds[ci] += diff
                        zz[0] = preds[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = ac.decode(br)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                break
                            zz[k] = _extend(br.read_bits(s), s) * \
                                q[ZIGZAG[k]]
                            k += 1
                        store[ci][
                            my * c["v"] + byy, mx * c["h"] + bxx
                        ] = zz
            mcu_count += 1

    # vectorized IDCT + reassembly per component
    planes = []
    for ci, c in enumerate(comps):
        by, bx, _ = store[ci].shape
        raster = np.zeros((by, bx, 64), dtype=np.float64)
        raster[:, :, ZIGZAG] = store[ci]
        blocks = raster.reshape(by, bx, 8, 8)
        pix = np.einsum("ji,yxjk,kl->yxil", _DCT_T, blocks, _DCT_T)
        plane = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8) + 128.0
        # replication upsample to full MCU grid resolution
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1:
            plane = np.repeat(plane, fy, axis=0)
        if fx > 1:
            plane = np.repeat(plane, fx, axis=1)
        planes.append(plane[:h_img, :w_img])

    if len(planes) == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1], planes[2]
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.rint(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)
