"""Multimodal plumbing: schema, decode-stub lifecycle, vault media join."""

from __future__ import annotations

import pyarrow as pa
import pytest

from obsidian_parser_ray.stages.multimodal import (
    FEATURES_SCHEMA,
    MEDIA_SCHEMA,
    MediaDecoder,
    decode_media,
    media_from_vault,
    synth_media_batch,
)


def _media_table(ids):
    return synth_media_batch(pa.table({"asset_id": pa.array(ids, pa.string())}))


class TestSynthAndDecode:
    def test_synth_deterministic(self):
        a = _media_table(["x.png", "y.wav"])
        b = _media_table(["x.png", "y.wav"])
        assert a.equals(b)
        assert a.schema == MEDIA_SCHEMA

    def test_decoder_features(self):
        t = _media_table([f"asset_{i}" for i in range(10)])
        out = MediaDecoder()(t)
        assert out.schema == FEATURES_SCHEMA
        assert out.num_rows == 10
        d = out.to_pylist()
        for r in d:
            if r["media_type"] == "image":
                assert r["width"] > 0 and r["height"] > 0 and r["duration_ms"] == 0
            else:
                assert r["duration_ms"] > 0 and r["width"] == 0
            assert len(r["embedding"]) == 8
            assert r["n_bytes"] >= 256

    def test_strict_raises_not_implemented(self):
        t = _media_table(["a"])
        with pytest.raises(NotImplementedError):
            MediaDecoder(strict=True)(t)


@pytest.mark.usefixtures("ray_session")
class TestPipeline:
    def test_vault_media_to_features(self):
        from obsidian_parser_ray import synth_vault

        docs = synth_vault("/root/testdata/sf0.001")
        media = media_from_vault(docs)
        feats = decode_media(media, batch_size=16, concurrency=1).to_pandas()
        # vault media refs are assets/img_{0,2,4,6,8}.png (d%6==0 → d even)
        assert sorted(feats["asset_id"]) == [
            f"assets/img_{i}.png" for i in (0, 2, 4, 6, 8)
        ]
        assert feats["phash"].nunique() == len(feats)


class TestResizeImages:
    def test_box_downsample_matches_reference_loop(self):
        """Vectorized reduceat kernel == the per-pixel definition on
        random shapes, grayscale and RGB."""
        import numpy as np

        from obsidian_parser_ray.stages.multimodal import (
            box_downsample,
            thumb_dims,
        )

        def ref(img, oh, ow):
            h, w = img.shape[:2]
            out = np.zeros((oh, ow) + img.shape[2:], np.uint8)
            for i in range(oh):
                r0, r1 = (i * h) // oh, ((i + 1) * h) // oh
                for j in range(ow):
                    c0, c1 = (j * w) // ow, ((j + 1) * w) // ow
                    blk = img[r0:r1, c0:c1].astype(np.int64)
                    out[i, j] = (
                        blk.reshape(-1, *img.shape[2:]).sum(0)
                        // ((r1 - r0) * (c1 - c0))
                    )
            return out

        rng = np.random.RandomState(3)
        for _ in range(25):
            h, w = rng.randint(1, 70, 2)
            shape = (h, w) if rng.rand() < 0.5 else (h, w, 3)
            img = rng.randint(0, 256, shape).astype(np.uint8)
            ow, oh = thumb_dims(w, h, 16)
            assert (box_downsample(img, oh, ow) == ref(img, oh, ow)).all()

    def test_constant_image_stays_constant(self):
        import numpy as np

        from obsidian_parser_ray.stages.multimodal import box_downsample

        img = np.full((57, 31, 3), 77, np.uint8)
        assert (box_downsample(img, 9, 5) == 77).all()

    def test_thumb_dims_contract(self):
        from obsidian_parser_ray.stages.multimodal import thumb_dims

        assert thumb_dims(10, 12, 16) == (10, 12)       # fits: unchanged
        assert thumb_dims(64, 32, 16) == (16, 8)        # long side pinned
        assert thumb_dims(32, 64, 16) == (8, 16)
        assert thumb_dims(400, 3, 16) == (16, 1)        # never below 1

    def test_resize_stage_round_trip(self, ray_session):
        """Stage output thumbnails decode back to the contract dims
        and to the exact box-filter pixels of the decoded source."""
        import hashlib

        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.stages.multimodal import (
            box_downsample,
            resize_images,
            synth_real_media_batch,
            thumb_dims,
        )
        from obsidian_parser_ray.stages.jpeg import decode_jpeg_baseline, is_jpeg
        from obsidian_parser_ray.stages.jpeg_progressive import (
            decode_jpeg_progressive,
            is_progressive_jpeg,
        )
        from obsidian_parser_ray.stages.png import decode_png, is_png

        ids = [f"assets/img_{i}.png" for i in range(30)]
        media_t = synth_real_media_batch(
            pa.table({"asset_id": pa.array(ids, pa.string())})
        )
        out = resize_images(
            rd.from_arrow(media_t), max_dim=16, strict=True
        ).take_all()
        src = {
            a: p for a, m, p in zip(
                media_t["asset_id"].to_pylist(),
                media_t["media_type"].to_pylist(),
                media_t["payload"].to_pylist(),
            ) if m == "image"
        }
        assert {r["asset_id"] for r in out} == set(src)
        for r in out:
            p = src[r["asset_id"]]
            if is_png(p):
                img = decode_png(p)
            elif is_progressive_jpeg(p):
                img = decode_jpeg_progressive(p)
            else:
                assert is_jpeg(p)
                img = decode_jpeg_baseline(p)
            h, w = img.shape[:2]
            assert (r["src_w"], r["src_h"]) == (w, h)
            ow, oh = thumb_dims(w, h, 16)
            assert (r["width"], r["height"]) == (ow, oh)
            thumb = decode_png(r["thumb"])
            want = box_downsample(img, oh, ow)
            # PNG round trip is lossless: pixels must be identical
            assert thumb.shape == want.shape
            assert (thumb == want).all()

    def test_strict_raises_on_garbage_image(self, ray_session):
        import pyarrow as pa
        import pytest
        import ray.data as rd

        from obsidian_parser_ray.stages.multimodal import resize_images

        t = pa.table({
            "asset_id": pa.array(["x"]),
            "media_type": pa.array(["image"]),
            "payload": pa.array([b"\x01" * 50], pa.binary()),
            "meta_json": pa.array(["{}"]),
        })
        with pytest.raises(Exception):
            resize_images(rd.from_arrow(t), strict=True).take_all()
        # non-strict drops the row instead
        assert resize_images(rd.from_arrow(t), strict=False).count() == 0


class TestSampleVideoFrames:
    def test_sampled_grays_and_dims(self, ray_session):
        """Every 2nd frame of every synthesized MJPEG asset decodes to
        the planted md5-derived dims and exact gray."""
        import hashlib

        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.stages.multimodal import (
            sample_video_frames,
            synth_mjpeg_media_batch,
        )

        ids = [f"assets/img_{i}.png" for i in range(8)]
        media_t = synth_mjpeg_media_batch(
            pa.table({"asset_id": pa.array(ids, pa.string())})
        )
        rows = sample_video_frames(
            rd.from_arrow(media_t), stride=2, strict=True
        ).take_all()
        by_asset = {}
        for r in rows:
            by_asset.setdefault(r["asset_id"], []).append(r)
        for a in ids:
            h = hashlib.md5(a.encode()).digest()
            n = 2 + h[5] % 6
            got = sorted(by_asset[a], key=lambda r: r["frame_index"])
            assert [r["frame_index"] for r in got] == list(range(0, n, 2))
            for r in got:
                assert r["width"] == 16 + h[2] % 64
                assert r["height"] == 16 + h[3] % 64
                assert r["gray"] == 63 + 5 * ((h[4] + r["frame_index"]) % 26)

    def test_non_video_rows_dropped(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.stages.multimodal import (
            sample_video_frames,
            synth_real_media_batch,
        )

        ids = [f"assets/img_{i}.png" for i in range(12)]
        media_t = synth_real_media_batch(
            pa.table({"asset_id": pa.array(ids, pa.string())})
        )
        # synth_real videos are metadata-only MP4s (no sample tables)
        # → strict=False drops them along with image/audio rows
        out = sample_video_frames(
            rd.from_arrow(media_t), strict=False
        ).count()
        assert out == 0


class TestImageNeardup:
    def test_planted_groups_found_exactly(self, ray_session):
        """Strict decode → ahash → pigeonhole pairing returns exactly
        the same-base-group pairs on a 24-asset planted universe."""
        import hashlib
        from itertools import combinations

        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.stages.multimodal import (
            image_neardup_pairs,
            synth_neardup_images_batch,
        )

        ids = [f"imgs/pic_{i}" for i in range(24)]
        media_t = synth_neardup_images_batch(
            pa.table({"asset_id": pa.array(ids, pa.string())})
        )
        out = image_neardup_pairs(
            rd.from_arrow(media_t), max_hamming=3, strict=True
        ).take_all()
        got = {(r["id_a"], r["id_b"]) for r in out}
        base = {a: hashlib.md5(a.encode()).digest()[1] % 4 for a in ids}
        want = {
            (a, b) for a, b in combinations(sorted(ids), 2)
            if base[a] == base[b]
        }
        assert got == want
        for r in out:
            assert r["hamming"] <= 2  # the synth's construction bound

    def test_hash64_pairing_on_raw_ints(self, ray_session):
        """hash64_neardup_pairs over explicit hashes: Hamming ≤ 3
        found (pigeonhole guarantee), > 3 excluded."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.stages.dedup import hash64_neardup_pairs

        base = np.uint64(0xDEADBEEFCAFEF00D)
        hs = np.array([
            base,
            base ^ np.uint64(0b101),            # hamming 2 from base
            base ^ (np.uint64(1) << np.uint64(63)),  # hamming 1
            np.uint64(0x0123456789ABCDEF),      # far away
        ], dtype=np.uint64)
        t = pa.table({
            "doc_id": pa.array(["a", "b", "c", "d"], pa.string()),
            "h": pa.array(hs.view(np.int64), pa.int64()),
        })
        out = hash64_neardup_pairs(
            rd.from_arrow(t), hash_col="h", id_col="doc_id",
            max_hamming=3,
        ).take_all()
        got = {(r["id_a"], r["id_b"]): r["hamming"] for r in out}
        assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 3}

    def test_non_image_and_strict_paths(self, ray_session):
        import pyarrow as pa
        import pytest
        import ray.data as rd

        from obsidian_parser_ray.stages.multimodal import (
            image_neardup_pairs,
        )

        t = pa.table({
            "asset_id": pa.array(["x", "y"]),
            "media_type": pa.array(["audio", "image"]),
            "payload": pa.array([b"\x00" * 32, b"\x01" * 32], pa.binary()),
            "meta_json": pa.array(["{}", "{}"]),
        })
        # non-strict: audio row and garbage image both dropped
        assert image_neardup_pairs(
            rd.from_arrow(t), strict=False
        ).count() == 0
        with pytest.raises(Exception):
            image_neardup_pairs(rd.from_arrow(t), strict=True).take_all()
