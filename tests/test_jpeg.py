"""Baseline JPEG codec (stages/jpeg.py): round-trip correctness with
hand-checkable anchors — no reference codec exists in this container,
so the tests are built to catch encoder/decoder co-bugs: exact DC-only
round-trips, monotone gradients, MSE bounds at high quality, exact
dimensions at awkward sizes, marker-level format checks."""

from __future__ import annotations

import numpy as np
import pytest

from obsidian_parser_ray.stages.jpeg import (
    decode_jpeg_baseline,
    encode_jpeg_baseline,
    is_jpeg,
)


def _mse(a: np.ndarray, b: np.ndarray) -> float:
    return float(((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean())


class TestRoundTrip:
    def test_uniform_gray_exact(self):
        # a constant image is DC-only in every block: quantization
        # cannot distort it, so the round-trip must be EXACT — this
        # anchors the DCT scaling, level shift, and DC diff coding
        for val in (0, 1, 128, 200, 255):
            img = np.full((24, 16), val, np.uint8)
            out = decode_jpeg_baseline(encode_jpeg_baseline(img, 90))
            assert out.shape == img.shape
            assert np.array_equal(out, img), val

    def test_uniform_rgb_near_exact(self):
        # RGB adds the YCbCr round-trip (float transform + rint): allow
        # off-by-one per channel but nothing more
        img = np.zeros((16, 24, 3), np.uint8)
        img[..., 0], img[..., 1], img[..., 2] = 90, 160, 220
        out = decode_jpeg_baseline(encode_jpeg_baseline(img, 95))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 1

    def test_gradient_high_quality(self):
        img = np.tile(np.linspace(0, 255, 64, dtype=np.uint8), (32, 1))
        out = decode_jpeg_baseline(encode_jpeg_baseline(img, 95))
        assert out.shape == img.shape
        assert _mse(out, img) < 2.0

    def test_noise_rgb_bounded_error(self):
        rng = np.random.RandomState(0)
        img = rng.randint(0, 256, (37, 41, 3)).astype(np.uint8)
        out = decode_jpeg_baseline(encode_jpeg_baseline(img, 95))
        assert out.shape == img.shape
        assert _mse(out, img) < 60.0  # noise at q95: small but lossy

    def test_odd_dimensions_exact_shape(self):
        # non-multiple-of-8 dims exercise edge padding + crop
        rng = np.random.RandomState(1)
        for shape in ((17, 23), (8, 9), (33, 8), (23, 17, 3), (9, 31, 3)):
            img = rng.randint(0, 256, shape).astype(np.uint8)
            out = decode_jpeg_baseline(encode_jpeg_baseline(img, 85))
            assert out.shape == img.shape

    def test_tiny_image(self):
        img = np.array([[10, 250], [130, 60]], np.uint8)
        out = decode_jpeg_baseline(encode_jpeg_baseline(img, 95))
        assert out.shape == (2, 2)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 24

    def test_quality_monotone(self):
        # lower quality must not DECREASE distortion on a busy image
        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, (32, 32)).astype(np.uint8)
        errs = [
            _mse(decode_jpeg_baseline(encode_jpeg_baseline(img, q)), img)
            for q in (95, 50, 10)
        ]
        assert errs[0] < errs[1] < errs[2]


class TestFormat:
    def test_markers_and_sniff(self):
        img = np.full((8, 8), 7, np.uint8)
        enc = encode_jpeg_baseline(img)
        assert is_jpeg(enc)
        assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
        assert b"JFIF" in enc[:24]
        assert not is_jpeg(b"\x89PNG\r\n\x1a\n")
        assert not is_jpeg(b"")

    def test_rejects_non_jpeg(self):
        with pytest.raises(ValueError):
            decode_jpeg_baseline(b"\x89PNG\r\n\x1a\nnot a jpeg")

    def test_rejects_progressive(self):
        # minimal stream with an SOF2 (progressive) frame header
        img = np.full((8, 8), 7, np.uint8)
        enc = bytearray(encode_jpeg_baseline(img))
        i = enc.find(b"\xff\xc0")
        enc[i + 1] = 0xC2
        with pytest.raises(ValueError, match="progressive|arithmetic"):
            decode_jpeg_baseline(bytes(enc))

    def test_encoder_rejects_bad_input(self):
        with pytest.raises(ValueError):
            encode_jpeg_baseline(np.zeros((4, 4), np.float32))
        with pytest.raises(ValueError):
            encode_jpeg_baseline(np.zeros((4, 4, 2), np.uint8))


class TestMediaDecoderIntegration:
    def test_strict_decode_png_and_jpeg(self):
        """strict mode must succeed on a PNG + JPEG fixture (both real
        codecs) and report true decoded dimensions."""
        from obsidian_parser_ray.stages.multimodal import MediaDecoder
        from obsidian_parser_ray.stages.png import encode_png

        import pyarrow as pa

        rng = np.random.RandomState(5)
        png_img = rng.randint(0, 256, (19, 27)).astype(np.uint8)
        jpg_img = rng.randint(0, 256, (21, 33, 3)).astype(np.uint8)
        t = pa.table(
            {
                "asset_id": pa.array(["a.png", "b.jpg"], pa.string()),
                "media_type": pa.array(["image", "image"], pa.string()),
                "payload": pa.array(
                    [encode_png(png_img),
                     encode_jpeg_baseline(jpg_img, 90)],
                    pa.binary(),
                ),
                "meta_json": pa.array(["{}", "{}"], pa.string()),
            }
        )
        out = MediaDecoder(strict=True)(t)
        rows = {r["asset_id"]: r for r in out.to_pylist()}
        assert (rows["a.png"]["width"], rows["a.png"]["height"]) == (27, 19)
        assert (rows["b.jpg"]["width"], rows["b.jpg"]["height"]) == (33, 21)
        for r in rows.values():
            assert len(r["phash"]) == 16
            assert abs(
                sum(x * x for x in r["embedding"]) - 1.0
            ) < 1e-3  # unit-norm embedding

    def test_strict_still_raises_on_undecodable(self):
        from obsidian_parser_ray.stages.multimodal import MediaDecoder

        import pyarrow as pa

        t = pa.table(
            {
                "asset_id": pa.array(["x"], pa.string()),
                "media_type": pa.array(["audio"], pa.string()),
                "payload": pa.array([b"\x00" * 64], pa.binary()),
                "meta_json": pa.array(['{"ms": 5}'], pa.string()),
            }
        )
        with pytest.raises(NotImplementedError):
            MediaDecoder(strict=True)(t)

    def test_synth_real_batch_matches_md5_plants(self):
        """synth_real_media_batch payloads decode (strict) to the
        md5-derived dimensions/durations — the invariant the SQL
        oracle of the media_decode_real driver query relies on — and
        the fixture set exercises every real codec variant (PNG,
        baseline + progressive JPEG, PCM + IMA-ADPCM WAV, MP4
        container probe)."""
        import hashlib

        import pyarrow as pa

        from obsidian_parser_ray.stages.multimodal import (
            MediaDecoder,
            synth_real_media_batch,
        )

        ids = [f"assets/img_{i}.png" for i in range(60)]
        media = synth_real_media_batch(
            pa.table({"asset_id": pa.array(ids, pa.string())})
        )
        out = MediaDecoder(strict=True)(media)
        rows = {r["asset_id"]: r for r in out.to_pylist()}
        codecs = set()
        for a in ids:
            h = hashlib.md5(a.encode()).digest()
            kind = h[0] % 3
            if kind == 0:
                assert rows[a]["media_type"] == "image"
                assert rows[a]["width"] == 16 + h[2] % 64
                assert rows[a]["height"] == 16 + h[3] % 64
                assert rows[a]["duration_ms"] == 0
                codecs.add(("png", "jpeg", "jpeg_prog")[h[10] % 3])
            elif kind == 1:
                assert rows[a]["media_type"] == "audio"
                assert rows[a]["duration_ms"] == 500 + h[4] * 20
                assert rows[a]["width"] == 0 and rows[a]["height"] == 0
                codecs.add("wav_pcm" if h[11] % 2 == 0 else "wav_adpcm")
            else:
                assert rows[a]["media_type"] == "video"
                assert rows[a]["width"] == 16 + h[2] % 64
                assert rows[a]["height"] == 16 + h[3] % 64
                assert rows[a]["duration_ms"] == 500 + h[4] * 20
                codecs.add("mp4")
        assert codecs == {
            "png", "jpeg", "jpeg_prog", "wav_pcm", "wav_adpcm", "mp4",
        }  # every real codec variant hit


class TestJpegProperties:
    """Property-based round-trips: any uint8 image of any legal shape
    must decode to exact dimensions with bounded error at high
    quality (no reference codec exists in-container, so the encoder
    and decoder check each other across the whole shape space)."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @staticmethod
    def _img(h, w, ch, seed):
        rng = np.random.RandomState(seed)
        shape = (h, w) if ch == 1 else (h, w, 3)
        return rng.randint(0, 256, shape).astype(np.uint8)

    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        ch=st.sampled_from([1, 3]),
        seed=st.integers(0, 2**16),
    )
    @settings(max_examples=40, deadline=None)
    def test_shape_and_bounded_error(self, h, w, ch, seed):
        img = self._img(h, w, ch, seed)
        out = decode_jpeg_baseline(encode_jpeg_baseline(img, 95))
        assert out.shape == img.shape
        err = np.abs(out.astype(int) - img.astype(int)).mean()
        assert err < 20.0  # noise at q95: visually lossy but bounded

    @given(
        h=st.integers(1, 32),
        w=st.integers(1, 32),
        val=st.integers(0, 255),
    )
    @settings(max_examples=25, deadline=None)
    def test_constant_images_exact(self, h, w, val):
        img = np.full((h, w), val, np.uint8)
        out = decode_jpeg_baseline(encode_jpeg_baseline(img, 85))
        assert np.array_equal(out, img)
