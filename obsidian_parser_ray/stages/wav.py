"""WAV (RIFF/PCM) audio codec — pure stdlib + numpy.

The audio analogue of :mod:`.png` / :mod:`.jpeg`: uncompressed PCM WAV
is the baseline interchange format every audio pipeline meets, and it
is fully decodable without ffmpeg/torchaudio.  The encoder writes
16-bit PCM RIFF files; the decoder handles 8/16/32-bit integer PCM and
32-bit float PCM, mono or multi-channel, tolerating extra chunks
(LIST/fact/cue) before or after ``data``.  Compressed codecs (MP3,
AAC, Opus) are out of scope — :class:`..multimodal.MediaDecoder`
treats them as undecodable (fake fallback or strict raise).

Feature extraction for the media pipeline lives here too:
:func:`segment_energies` (fixed-count RMS energy profile — the audio
counterpart of the image pixel histogram) and :func:`energy_hash`
(sign-of-mean-crossing perceptual hash over segments).
"""

from __future__ import annotations

import struct

import numpy as np


def is_wav(payload: bytes) -> bool:
    return (
        len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    )


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 samples → RIFF/WAVE bytes."""
    samples = np.asarray(samples)
    if samples.dtype != np.int16:
        raise ValueError("encode_wav_pcm16 expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    out = bytearray()
    out += b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
    out += b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return bytes(out)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → (float64 samples in [-1, 1] of shape
    (n_frames, channels), sample_rate).  PCM 8/16/32-bit int and
    32-bit float supported; raises ``ValueError`` otherwise."""
    if not is_wav(payload):
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            audio_fmt, ch, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt == 0xFFFE and size >= 40:  # WAVE_FORMAT_EXTENSIBLE
                audio_fmt = struct.unpack("<H", body[24:26])[0]
            fmt = (audio_fmt, ch, rate, bits)
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, ch, rate, bits = fmt
    if audio_fmt == 1:  # integer PCM
        if bits == 8:
            x = (np.frombuffer(data, np.uint8).astype(np.float64) - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, "<i2").astype(np.float64) / 32768.0
        elif bits == 32:
            x = np.frombuffer(data, "<i4").astype(np.float64) / 2147483648.0
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif audio_fmt == 3 and bits == 32:  # IEEE float
        x = np.frombuffer(data, "<f4").astype(np.float64)
    else:
        raise ValueError(f"unsupported WAV format code {audio_fmt}/{bits}")
    n = (len(x) // ch) * ch
    return x[:n].reshape(-1, ch), rate


def duration_ms(payload: bytes) -> int:
    samples, rate = decode_wav(payload)
    return int(round(1000.0 * samples.shape[0] / rate))


def segment_energies(samples: np.ndarray, n_segments: int = 256) -> np.ndarray:
    """Fixed-count RMS energy profile (mono-mixed): the audio feature
    vector the media stage projects into its embedding space —
    length-invariant, so clips of any duration compare."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = len(mono)
    if n == 0:
        return np.zeros(n_segments, dtype=np.float32)
    edges = (np.arange(n_segments + 1, dtype=np.int64) * n) // n_segments
    sq = np.concatenate(([0.0], np.cumsum(mono * mono)))
    cnt = np.maximum(np.diff(edges), 1)
    seg = (sq[edges[1:]] - sq[edges[:-1]]) / cnt
    return np.sqrt(seg).astype(np.float32)


def energy_hash(samples: np.ndarray, *, grid: int = 64) -> str:
    """Perceptual audio hash: sign of (segment RMS − mean RMS) over
    ``grid`` segments → hex string (the audio twin of
    :func:`..png.average_hash`)."""
    seg = segment_energies(samples, grid)
    bits = seg > seg.mean()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return f"{val:0{grid // 4}x}"
