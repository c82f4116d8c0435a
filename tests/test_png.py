"""Pure-stdlib PNG codec + real image-decode path."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from obsidian_parser_ray.stages.png import (
    average_hash,
    decode_png,
    encode_png,
    is_png,
)


@pytest.mark.parametrize("shape", [(5, 7), (16, 16, 3), (9, 4, 4)])
def test_roundtrip_exact(shape):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    payload = encode_png(img)
    assert is_png(payload)
    out = decode_png(payload)
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def _filter_scanlines(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Reference PNG filtering (spec §9) to exercise every unfilter."""
    h, w, c = img.shape
    stride = w * c
    raw = img.reshape(h, stride).astype(np.int64)
    out = bytearray()
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        cur = raw[y]
        ft = ftypes[y % len(ftypes)]
        left = np.concatenate((np.zeros(c, np.int64), cur[:-c]))
        upleft = np.concatenate((np.zeros(c, np.int64), prev[:-c]))
        if ft == 0:
            enc = cur
        elif ft == 1:
            enc = cur - left
        elif ft == 2:
            enc = cur - prev
        elif ft == 3:
            enc = cur - ((left + prev) >> 1)
        else:  # Paeth
            p = left + prev - upleft
            pa_, pb, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, prev, upleft)
            )
            enc = cur - pred
        out.append(ft)
        out.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    return bytes(out)


def test_all_filter_types_decode():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (10, 6, 3), dtype=np.uint8)
    scan = _filter_scanlines(img, [0, 1, 2, 3, 4])

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 10, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), img)


def test_unsupported_variants_raise():
    with pytest.raises(ValueError, match="bad magic"):
        decode_png(b"JFIF not a png")
    bad_depth = encode_png(np.zeros((4, 4), np.uint8))
    # patch IHDR bit depth byte (offset: 8 magic + 8 hdr + 8 w/h = 24)
    bad = bytearray(bad_depth)
    bad[24] = 16
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(bad))


def test_average_hash_properties():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 200, (32, 32, 3), dtype=np.uint8)
    h1 = average_hash(img)
    # brightness shift preserves the hash (threshold is the mean)
    h2 = average_hash(np.clip(img.astype(np.int64) + 40, 0, 255).astype(np.uint8))
    assert h1 == h2
    assert len(h1) == 16  # 64 bits
    other = np.zeros((32, 32, 3), np.uint8)
    other[:16] = 255  # structurally different
    assert average_hash(other) != h1
    assert len(average_hash(np.ones((3, 3), np.uint8))) == 16  # tiny pad


def test_decoder_real_png_end_to_end(ray_session):
    import ray.data as rd

    from obsidian_parser_ray.stages.multimodal import decode_media

    rng = np.random.default_rng(9)
    rows = []
    for i, (w, h) in enumerate([(12, 7), (30, 30), (8, 20)]):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        rows.append(
            {
                "asset_id": f"img_{i}",
                "media_type": "image",
                "payload": encode_png(img),
                "meta_json": "{}",
            }
        )
    media = rd.from_arrow(
        pa.table(
            {
                "asset_id": pa.array([r["asset_id"] for r in rows]),
                "media_type": pa.array([r["media_type"] for r in rows]),
                "payload": pa.array([r["payload"] for r in rows], pa.binary()),
                "meta_json": pa.array([r["meta_json"] for r in rows]),
            }
        )
    )
    # strict=True: REAL decode must carry the whole batch (no fake path)
    out = decode_media(media, strict=True, concurrency=1).to_pandas()
    got = {r.asset_id: (r.width, r.height) for r in out.itertuples()}
    assert got == {"img_0": (12, 7), "img_1": (30, 30), "img_2": (8, 20)}
    assert (out["phash"].str.len() == 16).all()


def test_decoder_strict_rejects_non_png(ray_session):
    import ray.data as rd

    from obsidian_parser_ray.stages.multimodal import decode_media

    media = rd.from_arrow(
        pa.table(
            {
                "asset_id": pa.array(["a"]),
                "media_type": pa.array(["image"]),
                "payload": pa.array([b"not a png"], pa.binary()),
                "meta_json": pa.array(["{}"]),
            }
        )
    )
    with pytest.raises(Exception, match="strict decode"):
        decode_media(media, strict=True, concurrency=1).materialize()
