"""Progressive JPEG (SOF2) codec: round-trip equivalence against the
baseline codec (shared quantized-coefficient pipeline → decode must be
BIT-EXACT), format detection, and the strict media-decode path."""

import hashlib

import numpy as np
import pytest

from obsidian_parser_ray.stages.jpeg import (
    decode_jpeg_baseline,
    encode_jpeg_baseline,
)
from obsidian_parser_ray.stages.jpeg_progressive import (
    decode_jpeg_progressive,
    encode_jpeg_progressive,
    is_progressive_jpeg,
)


def _cases():
    rng = np.random.RandomState(42)
    grad = (np.indices((24, 17)).sum(0) * 3 % 256).astype(np.uint8)
    return {
        "uniform_gray": np.full((16, 16), 130, np.uint8),
        "gradient_rgb": np.ascontiguousarray(
            grad[..., None].repeat(3, -1)
        ),
        "noise_rgb": rng.randint(0, 256, (33, 41, 3), dtype=np.uint8),
        "noise_gray_odd": rng.randint(0, 256, (19, 23), dtype=np.uint8),
        "tiny": rng.randint(0, 256, (3, 5, 3), dtype=np.uint8),
        "photo_like": np.clip(
            128.0
            + 60 * np.sin(np.linspace(0, 7, 48))[:, None, None]
            + 50 * np.cos(np.linspace(0, 5, 37))[None, :, None]
            + rng.randn(48, 37, 3) * 12,
            0, 255,
        ).astype(np.uint8),
    }


class TestProgressiveRoundTrip:
    @pytest.mark.parametrize("quality", [85, 50, 95])
    def test_decode_bit_exact_vs_baseline(self, quality):
        """Progressive encode→decode must reproduce EXACTLY the pixels
        the baseline encode→decode yields for the same image (both
        paths share the quantized coefficients, so any scan-loop bug —
        DC/AC × first/refine, EOB runs, ZRL, correction bits — shows
        up as a pixel diff)."""
        for name, img in _cases().items():
            pb = encode_jpeg_progressive(img, quality=quality)
            bb = encode_jpeg_baseline(img, quality=quality)
            got = decode_jpeg_progressive(pb)
            ref = decode_jpeg_baseline(bb)
            assert got.shape == ref.shape, name
            assert np.array_equal(got, ref), name

    def test_uniform_image_round_trips_exactly(self):
        img = np.full((24, 24, 3), 77, np.uint8)
        out = decode_jpeg_progressive(encode_jpeg_progressive(img))
        assert np.array_equal(out, img)

    def test_dimensions_preserved_odd_sizes(self):
        rng = np.random.RandomState(7)
        for shape in [(9, 11), (8, 8, 3), (17, 1), (1, 31, 3)]:
            img = rng.randint(0, 256, shape, dtype=np.uint8)
            out = decode_jpeg_progressive(encode_jpeg_progressive(img))
            assert out.shape[:2] == shape[:2]


class TestFormatDetection:
    def test_is_progressive(self):
        img = np.zeros((8, 8), np.uint8)
        assert is_progressive_jpeg(encode_jpeg_progressive(img))
        assert not is_progressive_jpeg(encode_jpeg_baseline(img))
        assert not is_progressive_jpeg(b"\x89PNG\r\n\x1a\n")
        assert not is_progressive_jpeg(b"")

    def test_baseline_decoder_rejects_progressive(self):
        img = np.zeros((8, 8), np.uint8)
        with pytest.raises(ValueError):
            decode_jpeg_baseline(encode_jpeg_progressive(img))

    def test_progressive_decoder_rejects_baseline(self):
        img = np.zeros((8, 8), np.uint8)
        with pytest.raises(ValueError):
            decode_jpeg_progressive(encode_jpeg_baseline(img))


class TestStrictMediaPath:
    def test_strict_decoder_recovers_planted_dims_from_sof2(self):
        """A MediaDecoder(strict=True) must recover width/height from a
        progressive payload through the REAL scan loop (no fake
        fallback exists in strict mode)."""
        import json

        import pyarrow as pa

        from obsidian_parser_ray.stages.multimodal import MediaDecoder

        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, (37, 29, 3), dtype=np.uint8)
        payload = encode_jpeg_progressive(img, quality=85)
        t = pa.table({
            "asset_id": pa.array(["a1"]),
            "media_type": pa.array(["image"]),
            "payload": pa.array([payload], pa.binary()),
            "meta_json": pa.array([json.dumps({})]),
        })
        out = MediaDecoder(strict=True)(t)
        assert out["width"][0].as_py() == 29
        assert out["height"][0].as_py() == 37

    def test_synth_real_media_covers_all_three_image_formats(self):
        """The driver gate's asset-id space must plant PNG, baseline
        AND progressive payloads (md5 byte-10 split)."""
        import pyarrow as pa

        from obsidian_parser_ray.stages.jpeg import is_jpeg
        from obsidian_parser_ray.stages.multimodal import (
            synth_real_media_batch,
        )
        from obsidian_parser_ray.stages.png import is_png

        ids = [f"assets/img_{i}.png" for i in range(10)]
        media = synth_real_media_batch(
            pa.table({"asset_id": pa.array(ids)})
        )
        fmts = set()
        for aid, mt, payload in zip(
            media["asset_id"].to_pylist(),
            media["media_type"].to_pylist(),
            media["payload"].to_pylist(),
        ):
            if mt != "image":
                continue
            h = hashlib.md5(aid.encode()).digest()
            if is_png(payload):
                fmts.add("png")
                assert h[10] % 3 == 0
            elif is_progressive_jpeg(payload):
                fmts.add("progressive")
                assert h[10] % 3 == 2
            elif is_jpeg(payload):
                fmts.add("baseline")
                assert h[10] % 3 == 1
        assert fmts == {"png", "baseline", "progressive"}
