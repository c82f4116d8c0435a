"""WAV codec (stages/wav.py): exact PCM round-trips, format-variant
decode, duration math, and the MediaDecoder audio integration."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from obsidian_parser_ray.stages.wav import (
    decode_wav,
    duration_ms,
    encode_wav_pcm16,
    energy_hash,
    is_wav,
    segment_energies,
)


class TestRoundTrip:
    def test_pcm16_mono_exact(self):
        rng = np.random.RandomState(0)
        x = rng.randint(-32768, 32767, 1000).astype(np.int16)
        samples, rate = decode_wav(encode_wav_pcm16(x, 22050))
        assert rate == 22050
        assert samples.shape == (1000, 1)
        back = np.round(samples[:, 0] * 32768.0).astype(np.int64)
        assert np.array_equal(back, x.astype(np.int64))

    def test_pcm16_stereo_exact(self):
        rng = np.random.RandomState(1)
        x = rng.randint(-30000, 30000, (500, 2)).astype(np.int16)
        samples, rate = decode_wav(encode_wav_pcm16(x, 8000))
        assert samples.shape == (500, 2)
        assert np.array_equal(
            np.round(samples * 32768.0).astype(np.int64), x.astype(np.int64)
        )

    def test_duration_exact_at_8khz(self):
        # 8 kHz → frames = ms × 8 with zero rounding slack (the
        # invariant media_decode_real's SQL oracle relies on)
        for ms in (500, 501, 1234, 5600):
            x = np.zeros(ms * 8, np.int16)
            assert duration_ms(encode_wav_pcm16(x, 8000)) == ms

    def test_sniff(self):
        assert is_wav(encode_wav_pcm16(np.zeros(8, np.int16)))
        assert not is_wav(b"RIFFxxxxAVI ")
        assert not is_wav(b"")
        with pytest.raises(ValueError):
            decode_wav(b"\x00" * 64)


class TestFormatVariants:
    def _raw(self, fmt_code, ch, rate, bits, data):
        fmt = struct.pack("<HHIIHH", fmt_code, ch, rate,
                          rate * ch * bits // 8, ch * bits // 8, bits)
        out = bytearray()
        body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(data)) + data
        out += b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
        return bytes(out)

    def test_pcm8(self):
        data = bytes([0, 128, 255, 64])
        samples, rate = decode_wav(self._raw(1, 1, 8000, 8, data))
        assert samples.shape == (4, 1)
        assert abs(samples[1, 0]) < 1e-9  # 128 is the 8-bit zero point
        assert samples[0, 0] == -1.0

    def test_float32(self):
        x = np.array([0.5, -0.25, 1.0], np.float32)
        samples, _ = decode_wav(self._raw(3, 1, 16000, 32, x.tobytes()))
        assert np.allclose(samples[:, 0], x)

    def test_extra_chunks_tolerated(self):
        # LIST chunk before fmt/data (common in real files)
        inner = self._raw(1, 1, 8000, 16,
                          np.zeros(16, np.int16).tobytes())
        body = b"LIST" + struct.pack("<I", 4) + b"INFO" + inner[12:]
        payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
        samples, rate = decode_wav(payload)
        assert samples.shape == (16, 1) and rate == 8000

    def test_unsupported_codec_raises(self):
        with pytest.raises(ValueError, match="format code"):
            decode_wav(self._raw(85, 1, 8000, 16, b"\x00\x00"))  # MP3-in-WAV


class TestFeatures:
    def test_segment_energies_shape_and_scale(self):
        x = np.concatenate([np.zeros(4000), np.ones(4000) * 0.5])
        seg = segment_energies(x, 8)
        assert seg.shape == (8,)
        assert np.allclose(seg[:4], 0.0) and np.allclose(seg[4:], 0.5)

    def test_energy_hash_stable_and_discriminative(self):
        rng = np.random.RandomState(2)
        a = rng.standard_normal(8000)
        assert energy_hash(a) == energy_hash(a)
        b = np.concatenate([np.zeros(4000), rng.standard_normal(4000)])
        assert energy_hash(a) != energy_hash(b)


class TestMediaDecoderAudio:
    def test_strict_wav_decode(self):
        import pyarrow as pa

        from obsidian_parser_ray.stages.multimodal import MediaDecoder

        x = (np.sin(np.arange(16000) / 20.0) * 20000).astype(np.int16)
        t = pa.table(
            {
                "asset_id": pa.array(["clip.wav"], pa.string()),
                "media_type": pa.array(["audio"], pa.string()),
                "payload": pa.array(
                    [encode_wav_pcm16(x, 16000)], pa.binary()
                ),
                "meta_json": pa.array(["{}"], pa.string()),
            }
        )
        out = MediaDecoder(strict=True)(t).to_pylist()[0]
        assert out["duration_ms"] == 1000
        assert out["width"] == 0 and out["height"] == 0
        assert len(out["phash"]) == 16
        assert abs(sum(v * v for v in out["embedding"]) - 1.0) < 1e-3
