"""Minimal pure-stdlib PNG codec (zlib + struct — no PIL needed).

Supports what a data pipeline's decode stage actually meets in bulk
corpora: 8-bit greyscale (color type 0) and 8-bit RGB/RGBA (color
types 2/6), non-interlaced, all five scanline filters.  Used by
:mod:`.multimodal` to make the image-decode path REAL in this
container (reference parity: the engine's media stage is not a stub
for PNG inputs); exotic variants (palette, 16-bit, Adam7) raise
``ValueError`` and fall through to the caller's policy.

The encoder (filter-0 scanlines, one IDAT) exists so tests and
corpus synthesis can round-trip without external fixtures.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def is_png(payload: bytes) -> bool:
    return payload[:8] == _MAGIC


def encode_png(img: np.ndarray) -> bytes:
    """uint8 array (H, W) grey / (H, W, 3) RGB / (H, W, 4) RGBA → PNG."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color, channels = 0, 1
    elif img.ndim == 3 and img.shape[2] == 3:
        color, channels = 2, 3
    elif img.ndim == 3 and img.shape[2] == 4:
        color, channels = 6, 4
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = img.reshape(h, w * channels)
    # filter byte 0 (None) per scanline
    scanlines = np.concatenate(
        [np.zeros((h, 1), np.uint8), raw], axis=1
    ).tobytes()
    return (
        _MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc_:
        return a
    return b if pb <= pc_ else c


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (H, W) or (H, W, C).  Raises
    ``ValueError`` on non-PNG input or unsupported variants."""
    if not is_png(payload):
        raise ValueError("not a PNG (bad magic)")
    pos, w = 8, None
    idat = bytearray()
    h = color = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color not in _CHANNELS:
                raise ValueError(f"unsupported color type {color}")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG (no IHDR/IDAT)")
    channels = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG payload size mismatch")
    out = np.empty((h, stride), np.uint16)
    prev = np.zeros(stride, np.uint16)
    bpp = channels
    for y in range(h):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw, np.uint8, stride, row_start + 1
        ).astype(np.uint16)
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub — sequential in x, vector in channels
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:  # Up — fully vectorized
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                ul = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (cur[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype}")
        out[y] = cur
        prev = cur
    img = out.astype(np.uint8)
    if channels == 1:
        return img.reshape(h, w)
    return img.reshape(h, w, channels)


def average_hash(img: np.ndarray, *, grid: int = 8) -> str:
    """Perceptual average-hash: grid×grid block means thresholded at
    their mean → hex string (64 bits for the default grid)."""
    if img.ndim == 3:
        img = img.mean(axis=2)
    img = np.asarray(img, np.float64)
    h, w = img.shape
    if h < grid or w < grid:
        # pad tiny images by edge-repeat so the hash is still defined
        img = np.pad(img, ((0, max(0, grid - h)), (0, max(0, grid - w))),
                     mode="edge")
        h, w = img.shape
    ys = (np.arange(grid, dtype=np.int64) * h) // grid
    xs = (np.arange(grid, dtype=np.int64) * w) // grid
    blocks = np.add.reduceat(np.add.reduceat(img, ys, axis=0), xs, axis=1)
    ycnt = np.diff(np.concatenate((ys, [h])))
    xcnt = np.diff(np.concatenate((xs, [w])))
    means = blocks / np.outer(ycnt, xcnt)
    bits = (means > means.mean()).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return f"{val:0{grid * grid // 4}x}"
