"""ISO BMFF (MP4) container probe: round-trip, box-walk robustness,
and the strict video media-decode path."""

import struct

import numpy as np
import pytest

from obsidian_parser_ray.stages.mp4 import (
    encode_minimal_mp4,
    is_mp4,
    probe_mp4,
)


class TestProbeRoundTrip:
    @pytest.mark.parametrize(
        "w,h,ms",
        [(640, 360, 12345), (33, 17, 1), (1920, 1080, 3_600_000),
         (16, 16, 500)],
    )
    def test_planted_values_recovered(self, w, h, ms):
        b = encode_minimal_mp4(width=w, height=h, duration_ms=ms)
        assert is_mp4(b)
        got = probe_mp4(b)
        assert (got["width"], got["height"], got["duration_ms"]) == (
            w, h, ms
        )

    def test_audio_only_movie_has_zero_dims(self):
        b = encode_minimal_mp4(width=0, height=0, duration_ms=777)
        got = probe_mp4(b)
        assert got == {"width": 0, "height": 0, "duration_ms": 777}

    def test_not_mp4_raises(self):
        with pytest.raises(ValueError, match="ISO BMFF"):
            probe_mp4(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)
        assert not is_mp4(b"")
        assert not is_mp4(b"\x00" * 11)

    def test_truncated_moov_raises(self):
        b = encode_minimal_mp4(width=8, height=8, duration_ms=100)
        with pytest.raises(ValueError, match="moov"):
            probe_mp4(b[:20])

    def test_largesize_and_trailing_boxes(self):
        """A 64-bit largesize mdat before moov and trailing free boxes
        must not derail the walk."""
        core = encode_minimal_mp4(width=12, height=34, duration_ms=56)
        ftyp_end = struct.unpack(">I", core[:4])[0]
        ftyp, moov = core[:ftyp_end], core[ftyp_end:]
        mdat = (
            struct.pack(">I", 1) + b"mdat"
            + struct.pack(">Q", 16 + 8) + b"\x00" * 8
        )
        free = struct.pack(">I", 8) + b"free"
        got = probe_mp4(ftyp + mdat + moov + free)
        assert (got["width"], got["height"], got["duration_ms"]) == (
            12, 34, 56
        )

    def test_version1_tkhd_and_mvhd(self):
        """Hand-built version-1 (64-bit times) boxes parse at the v1
        offsets."""
        matrix = bytes.fromhex(
            "000100000000000000000000"
            "000000000001000000000000"
            "000000000000000040000000"
        )

        def box(btype, body):
            return struct.pack(">I", 8 + len(body)) + btype + body

        mvhd = box(
            b"mvhd",
            b"\x01\x00\x00\x00"
            + struct.pack(">QQ", 0, 0)        # creation, modification
            + struct.pack(">I", 1000)          # timescale
            + struct.pack(">Q", 4321)          # duration (64-bit)
            + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
            + b"\x00" * 10 + matrix + b"\x00" * 24
            + struct.pack(">I", 2),
        )
        tkhd = box(
            b"tkhd",
            b"\x01\x00\x00\x07"
            + struct.pack(">QQ", 0, 0)
            + struct.pack(">I", 1) + b"\x00" * 4
            + struct.pack(">Q", 4321)
            + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
            + matrix
            + struct.pack(">II", 100 << 16, 50 << 16),
        )
        payload = (
            box(b"ftyp", b"isom" + struct.pack(">I", 512))
            + box(b"moov", mvhd + box(b"trak", tkhd))
        )
        got = probe_mp4(payload)
        assert (got["width"], got["height"], got["duration_ms"]) == (
            100, 50, 4321
        )


@pytest.mark.usefixtures("ray_session")
class TestStrictVideoPath:
    def test_strict_decoder_probes_planted_video_metadata(self):
        import json

        import pyarrow as pa

        from obsidian_parser_ray.stages.multimodal import MediaDecoder

        payload = encode_minimal_mp4(
            width=320, height=240, duration_ms=9000
        )
        t = pa.table({
            "asset_id": pa.array(["v1"]),
            "media_type": pa.array(["video"]),
            "payload": pa.array([payload], pa.binary()),
            "meta_json": pa.array([json.dumps({})]),
        })
        out = MediaDecoder(strict=True)(t)
        assert out["width"][0].as_py() == 320
        assert out["height"][0].as_py() == 240
        assert out["duration_ms"][0].as_py() == 9000
        emb = np.asarray(out["embedding"][0].as_py())
        assert abs(float(np.linalg.norm(emb)) - 1.0) < 1e-6

    def test_strict_decoder_rejects_non_mp4_video(self):
        import json

        import pyarrow as pa

        from obsidian_parser_ray.stages.multimodal import MediaDecoder

        t = pa.table({
            "asset_id": pa.array(["v2"]),
            "media_type": pa.array(["video"]),
            "payload": pa.array([b"\x00" * 64], pa.binary()),
            "meta_json": pa.array([json.dumps({"ms": 5})]),
        })
        with pytest.raises(NotImplementedError):
            MediaDecoder(strict=True)(t)


class TestMjpegSampleTables:
    def test_frame_round_trip_byte_exact(self):
        """sample_frames recovers every frame byte-exactly from the
        stsz/stco tables, at every stride."""
        import numpy as np

        from obsidian_parser_ray.stages.jpeg import encode_jpeg_baseline
        from obsidian_parser_ray.stages.mp4 import (
            encode_mjpeg_mp4,
            probe_mp4,
            sample_frames,
        )

        rng = np.random.RandomState(7)
        frames = [
            encode_jpeg_baseline(
                rng.randint(0, 256, (24, 16)).astype(np.uint8)
            )
            for _ in range(5)
        ]
        mp4 = encode_mjpeg_mp4(frames, width=16, height=24, fps=10)
        # container metadata probes like any other MP4
        assert probe_mp4(mp4) == {
            "width": 16, "height": 24, "duration_ms": 500,
        }
        for stride in (1, 2, 3):
            got = sample_frames(mp4, stride=stride)
            assert [i for i, _ in got] == list(range(0, 5, stride))
            for i, fb in got:
                assert fb == frames[i]
        # limit caps the count
        assert [i for i, _ in sample_frames(mp4, limit=2)] == [0, 1]

    def test_constant_gray_decodes_exactly(self):
        """Grays that are multiples of the q85 DC quantizer step (5)
        around 128 survive the JPEG round trip bit-for-bit — the
        invariant the media_frame_sample oracle relies on."""
        import numpy as np

        from obsidian_parser_ray.stages.jpeg import (
            decode_jpeg_baseline,
            encode_jpeg_baseline,
        )

        for g in range(63, 189, 5):
            img = np.full((20, 33), g, np.uint8)  # non-multiple-of-8
            out = decode_jpeg_baseline(encode_jpeg_baseline(img, quality=85))
            assert (out == g).all(), g

    def test_sample_frames_rejects_plain_mp4(self):
        import pytest

        from obsidian_parser_ray.stages.mp4 import (
            encode_minimal_mp4,
            sample_frames,
        )

        payload = encode_minimal_mp4(width=8, height=8, duration_ms=100)
        with pytest.raises(ValueError):
            sample_frames(payload)
