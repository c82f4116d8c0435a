"""WAV codec (stages/wav.py): exact PCM round-trips, format-variant
decode, duration math, and the MediaDecoder audio integration."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from obsidian_parser_ray.stages.wav import (
    _IMA_INDEX_ADJ,
    _IMA_STEPS,
    decode_wav,
    duration_ms,
    encode_wav_adpcm,
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


def _scalar_ima_decode(data: bytes, block_align: int) -> np.ndarray:
    """Textbook one-sample-at-a-time IMA ADPCM decode (public IMA
    reference recurrence) — the independent oracle the vectorized
    lockstep decoder must match bit-exactly."""
    out = []
    nblocks = len(data) // block_align
    for b in range(nblocks):
        blk = data[b * block_align:(b + 1) * block_align]
        pred = struct.unpack("<h", blk[0:2])[0]
        index = min(max(blk[2], 0), 88)
        out.append(pred)
        nibbles = []
        for byte in blk[4:]:
            nibbles.append(byte & 0x0F)
            nibbles.append(byte >> 4)
        for nib in nibbles:
            step = int(_IMA_STEPS[index])
            vpdiff = step >> 3
            if nib & 4:
                vpdiff += step
            if nib & 2:
                vpdiff += step >> 1
            if nib & 1:
                vpdiff += step >> 2
            pred = pred - vpdiff if nib & 8 else pred + vpdiff
            pred = min(max(pred, -32768), 32767)
            index = min(max(index + int(_IMA_INDEX_ADJ[nib & 7]), 0), 88)
            out.append(pred)
    return np.array(out, dtype=np.int16)


class TestAdpcm:
    def _tone(self, n, seed=0, noise=0.0):
        rng = np.random.RandomState(seed)
        t = np.arange(n)
        x = 12000 * np.sin(2 * np.pi * 440 * t / 8000)
        if noise:
            x = x + rng.normal(0, noise, n)
        return np.clip(x, -32768, 32767).astype(np.int16)

    def test_lockstep_decode_matches_scalar_reference(self):
        # the vectorized across-blocks sweep must replay the exact
        # integer recurrence of the per-sample reference decoder
        x = self._tone(10000, seed=3, noise=800.0)
        payload = encode_wav_adpcm(x, 8000, block_align=256)
        dec, rate = decode_wav(payload)
        assert rate == 8000
        # locate the data chunk and replay it with the scalar oracle
        pos, data = 12, None
        while pos + 8 <= len(payload):
            tag = payload[pos:pos + 4]
            size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
            if tag == b"data":
                data = payload[pos + 8:pos + 8 + size]
            pos += 8 + size + (size & 1)
        ref = _scalar_ima_decode(data, 256)[: len(x)]
        got = np.round(dec[:, 0] * 32768.0).astype(np.int16)
        assert np.array_equal(got, ref)

    def test_round_trip_error_bounded(self):
        x = self._tone(16000)
        dec, _ = decode_wav(encode_wav_adpcm(x, 8000))
        ref = x.astype(np.float64) / 32768.0
        rel = np.sqrt(np.mean((dec[:, 0] - ref) ** 2)) / np.sqrt(
            np.mean(ref ** 2)
        )
        assert rel < 0.1  # 4-bit lossy, smooth tone tracks closely

    def test_fact_chunk_frame_exactness(self):
        # encoder pads the last block; fact chunk trims decode back
        x = self._tone(6000, seed=1, noise=500.0)
        for n in (1, 2, 505, 506, 1000, 5999):
            dec, _ = decode_wav(encode_wav_adpcm(x[:n], 8000))
            assert dec.shape == (n, 1)

    def test_duration_exact_at_8khz(self):
        for ms in (500, 501, 1234):
            x = self._tone(ms * 8)
            assert duration_ms(encode_wav_adpcm(x, 8000)) == ms

    def test_compression_ratio(self):
        x = self._tone(80000)
        payload = encode_wav_adpcm(x, 8000)
        assert 2 * len(x) / len(payload) > 3.5  # ~4:1 vs PCM16

    def test_input_validation(self):
        with pytest.raises(ValueError, match="int16"):
            encode_wav_adpcm(np.zeros(8, np.float32))
        with pytest.raises(ValueError, match="empty"):
            encode_wav_adpcm(np.zeros(0, np.int16))

    def test_media_decoder_strict_adpcm(self):
        import pyarrow as pa

        from obsidian_parser_ray.stages.multimodal import MediaDecoder

        x = self._tone(16000, seed=2, noise=300.0)
        t = pa.table(
            {
                "asset_id": pa.array(["clip.adpcm.wav"], pa.string()),
                "media_type": pa.array(["audio"], pa.string()),
                "payload": pa.array(
                    [encode_wav_adpcm(x, 8000)], pa.binary()
                ),
                "meta_json": pa.array(["{}"], pa.string()),
            }
        )
        out = MediaDecoder(strict=True)(t).to_pylist()[0]
        assert out["duration_ms"] == 2000
        assert abs(sum(v * v for v in out["embedding"]) - 1.0) < 1e-3


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
