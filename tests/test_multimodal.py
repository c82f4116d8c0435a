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
