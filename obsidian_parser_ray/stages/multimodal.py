"""Multimodal (image/audio/video) plumbing: opaque binary payload
columns with typed metadata, decoded/featurized by batch stages.

The media table schema::

    asset_id: string, media_type: string ('image'|'audio'|'video'),
    payload: binary, meta_json: string

The four stages of the brief's multimodal family, all REAL:

* **decode / feature-extract** — :class:`MediaDecoder` decodes PNG,
  baseline (SOF0) AND progressive (SOF2) JPEG, PCM + IMA-ADPCM WAV,
  and probes ISO BMFF/MP4 containers with the pure-stdlib codecs in
  :mod:`.png` / :mod:`.jpeg` / :mod:`.jpeg_progressive` / :mod:`.wav`
  / :mod:`.mp4` (true dimensions/durations, perceptual hashes,
  histogram/energy embeddings).
* **resize** — :func:`resize_images`: real decode → exact vectorized
  box-filter downsample → real PNG re-encode.
* **frame-sample** — :func:`sample_video_frames`: real ``stsz``/
  ``stco`` sample-table walk over motion-JPEG MP4s, byte-exact frame
  extraction, real JPEG decode per sampled frame.

Formats beyond those (arithmetic-coded JPEG, perceptual audio codecs
like MP3/AAC/Opus, non-MJPEG video codecs) need PIL / torchaudio /
ffmpeg, which are NOT in this container: ``strict=False`` (default)
falls back to a deterministic fake decode derived from the payload
bytes, ``strict=True`` raises ``NotImplementedError`` for them (the
production hook — drop a real library into ``_decode_impl``).  The
surrounding plumbing — schema, Arrow binary round-trip, small-batch
sizing, output layout — is shared by both paths and tested.

Scale notes: binary payloads make rows wide → the stage runs with a
small ``batch_size`` (payload bytes × batch_size × concurrency must
fit the worker heap) and ``batch_format='pyarrow'`` (binary columns do
not round-trip pandas cleanly).
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("asset_id", pa.string()),
        ("media_type", pa.string()),
        ("payload", pa.binary()),
        ("meta_json", pa.string()),
    ]
)

def features_schema(embed_dim: int = 8) -> pa.Schema:
    return pa.schema(
        [
            ("asset_id", pa.string()),
            ("media_type", pa.string()),
            ("n_bytes", pa.int64()),
            ("width", pa.int64()),
            ("height", pa.int64()),
            ("duration_ms", pa.int64()),
            ("phash", pa.string()),
            ("embedding", pa.list_(pa.float32(), embed_dim)),
        ]
    )


FEATURES_SCHEMA = features_schema(8)


def synth_media_batch(batch: pa.Table) -> pa.Table:
    """Deterministic fake media table from asset-id strings (for tests
    and the rows-only driver query): payload bytes are a seeded stream
    derived from the id, metadata encodes the 'true' decode answer."""
    ids = batch["asset_id"].to_pylist()
    types, payloads, metas = [], [], []
    for a in ids:
        # md5 (not blake2b) on purpose: DuckDB has md5(), so the
        # driver's SQL oracle can re-derive media_type / n_bytes /
        # width / height / duration_ms from the asset id and
        # hash-check the decode output end-to-end
        h = hashlib.md5(a.encode()).digest()
        is_img = h[0] % 2 == 0
        size = 256 + h[1] * 8
        rng = np.random.RandomState(int.from_bytes(h[2:6], "little"))
        payloads.append(rng.bytes(size))
        if is_img:
            types.append("image")
            metas.append(json.dumps({"w": 16 + h[2] % 64, "h": 16 + h[3] % 64}))
        else:
            types.append("audio")
            metas.append(json.dumps({"ms": 1000 + h[4] * 100}))
    return pa.Table.from_arrays(
        [
            pa.array(ids, pa.string()),
            pa.array(types, pa.string()),
            pa.array(payloads, pa.binary()),
            pa.array(metas, pa.string()),
        ],
        schema=MEDIA_SCHEMA,
    )


def synth_real_media_batch(batch: pa.Table) -> pa.Table:
    """Deterministic REAL-codec media table from asset-id strings:
    every payload is an actual encoded file — PNG, baseline JPEG or
    PROGRESSIVE (SOF2) JPEG for images, PCM WAV for audio, chosen by
    the id's md5 — whose planted dimensions/duration derive from the
    same md5 bytes the SQL oracle can recompute.  Unlike
    :func:`synth_media_batch` (random bytes + metadata passthrough),
    the only way a decoder recovers the right width/height/duration
    here is to REALLY parse the codec's headers and payload — the
    media_decode_real driver query value-checks all five real decode
    paths end-to-end (``meta_json`` is deliberately left empty).
    Type split: ``md5[0] % 3`` (0 image, 1 audio, 2 video — the video
    member is an ISO BMFF container with planted dims + duration);
    image format is ``md5[10] % 3`` (0 PNG, 1 baseline, 2 progressive)
    and audio format is ``md5[11] % 2`` (0 uncompressed PCM16, 1
    IMA-ADPCM 0x11 — lossy 4-bit, but the ``fact`` chunk keeps the
    decoded frame count, hence the planted duration, EXACT) — bytes
    chosen so the driver gate's asset-id space hits every type AND
    every format variant."""
    from .jpeg import encode_jpeg_baseline
    from .jpeg_progressive import encode_jpeg_progressive
    from .mp4 import encode_minimal_mp4
    from .png import encode_png
    from .wav import encode_wav_adpcm, encode_wav_pcm16

    ids = batch["asset_id"].to_pylist()
    types, payloads, metas = [], [], []
    for a in ids:
        h = hashlib.md5(a.encode()).digest()
        rng = np.random.RandomState(int.from_bytes(h[6:10], "little"))
        kind = h[0] % 3
        if kind == 0:
            types.append("image")
            w = 16 + h[2] % 64
            hh = 16 + h[3] % 64
            shape = (hh, w) if h[7] % 2 == 0 else (hh, w, 3)
            img = rng.randint(0, 256, shape).astype(np.uint8)
            fmt = h[10] % 3
            if fmt == 0:
                payloads.append(encode_png(img))
            elif fmt == 1:
                payloads.append(encode_jpeg_baseline(img, quality=85))
            else:
                payloads.append(
                    encode_jpeg_progressive(img, quality=85)
                )
        elif kind == 1:
            types.append("audio")
            # 8 kHz → frames = ms × 8 exactly, so the decoded duration
            # reproduces the planted value with no rounding slack
            ms = 500 + h[4] * 20
            samples = rng.randint(
                -20000, 20000, ms * 8
            ).astype(np.int16)
            if h[11] % 2 == 0:
                payloads.append(
                    encode_wav_pcm16(samples, sample_rate=8000)
                )
            else:
                payloads.append(
                    encode_wav_adpcm(samples, sample_rate=8000)
                )
        else:
            types.append("video")
            payloads.append(encode_minimal_mp4(
                width=16 + h[2] % 64, height=16 + h[3] % 64,
                duration_ms=500 + h[4] * 20,
            ))
        metas.append("{}")
    return pa.Table.from_arrays(
        [
            pa.array(ids, pa.string()),
            pa.array(types, pa.string()),
            pa.array(payloads, pa.binary()),
            pa.array(metas, pa.string()),
        ],
        schema=MEDIA_SCHEMA,
    )


def media_from_vault(docs, synth=synth_media_batch):
    """Vault documents → media asset table (one row per distinct
    media_ref, asset ids from the media spans).  ``synth`` maps the
    deduped asset-id table to payload rows — :func:`synth_media_batch`
    (fake bytes + metadata) by default, :func:`synth_real_media_batch`
    for real PNG/JPEG/WAV payloads."""
    def refs(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        spans = batch["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = spans.flatten()
        media_mask = pc.equal(flat.field("kind"), "media")
        out = flat.field("media_ref").filter(media_mask)
        return pa.table({"asset_id": out})

    # distributed dedup (groupby-count keys) — Dataset.unique() would
    # funnel every distinct ref through the driver
    assets = (
        docs.map_batches(refs, batch_format="pyarrow")
        .groupby("asset_id")
        .count()
        .select_columns(["asset_id"])
    )
    return assets.map_batches(synth, batch_format="pyarrow")


class MediaDecoder:
    """Actor-pool decode/featurize stage (stub — see module docstring).

    ``__init__`` is where a real implementation loads its model/codec
    ONCE per actor; the fake path "loads" a seeded projection matrix to
    exercise the same lifecycle.
    """

    def __init__(self, strict: bool = False, embed_dim: int = 8, seed: int = 42):
        self.strict = strict
        rng = np.random.RandomState(seed)
        self.proj = rng.standard_normal((256, embed_dim)).astype(np.float32)
        self.embed_dim = embed_dim
        self.schema = features_schema(embed_dim)

    def _decode_impl(self, media_type: str, payload: bytes, meta: dict):
        # REAL decode path: PNG, baseline JPEG (SOF0/1) AND progressive
        # JPEG (SOF2) images are decoded with the pure-stdlib codecs
        # (stages/png.py, stages/jpeg.py, stages/jpeg_progressive.py) —
        # true dimensions, perceptual average-hash, pixel-histogram
        # embedding.  Remaining fall-through payloads (arithmetic-coded
        # JPEG, perceptual audio codecs) hit the deterministic fake
        # (strict=True raises instead: those codecs aren't in this
        # container).
        if media_type == "image":
            from .jpeg import decode_jpeg_baseline, is_jpeg
            from .jpeg_progressive import (
                decode_jpeg_progressive,
                is_progressive_jpeg,
            )
            from .png import average_hash, decode_png, is_png

            img = None
            if is_png(payload):
                img = decode_png(payload)
            elif is_jpeg(payload):
                try:
                    if is_progressive_jpeg(payload):
                        img = decode_jpeg_progressive(payload)
                    else:
                        img = decode_jpeg_baseline(payload)
                except ValueError:
                    img = None  # arithmetic/hierarchical → fake/strict
            if img is not None:
                h_px, w_px = img.shape[:2]
                hist = np.bincount(
                    img.reshape(-1), minlength=256
                )[:256].astype(np.float32)
                emb = hist @ self.proj
                norm = float(np.linalg.norm(emb)) or 1.0
                return w_px, h_px, 0, average_hash(img), emb / norm
        elif media_type == "audio":
            # REAL audio path: RIFF WAV via stages/wav.py — PCM
            # (8/16/32-bit int, float32) AND compressed IMA-ADPCM
            # (format 0x11) — true duration, segment-RMS embedding,
            # energy hash.  Perceptual codecs (MP3/AAC/Opus) fall
            # through to fake/strict.
            from .wav import (
                decode_wav,
                energy_hash,
                is_wav,
                segment_energies,
            )

            if is_wav(payload):
                try:
                    samples, rate = decode_wav(payload)
                except ValueError:
                    samples = None
                if samples is not None:
                    dur = int(round(1000.0 * samples.shape[0] / rate))
                    feats = segment_energies(samples, 256)
                    emb = feats @ self.proj
                    norm = float(np.linalg.norm(emb)) or 1.0
                    return 0, 0, dur, energy_hash(samples), emb / norm
        elif media_type == "video":
            # REAL video path is CONTAINER-level: ISO BMFF box walk
            # (stages/mp4.py) recovers true dimensions + duration from
            # moov/mvhd/tkhd.  Frame decode needs ffmpeg (absent), so
            # the embedding is the payload byte histogram and the hash
            # is the content md5 — metadata real, frames out of scope.
            from .mp4 import is_mp4, probe_mp4

            if is_mp4(payload):
                try:
                    meta_v = probe_mp4(payload)
                except ValueError:
                    meta_v = None
                if meta_v is not None:
                    hist = np.bincount(
                        np.frombuffer(payload, dtype=np.uint8),
                        minlength=256,
                    ).astype(np.float32)
                    emb = hist @ self.proj
                    norm = float(np.linalg.norm(emb)) or 1.0
                    return (
                        meta_v["width"], meta_v["height"],
                        meta_v["duration_ms"],
                        hashlib.md5(payload).hexdigest()[:16],
                        emb / norm,
                    )
        if self.strict:
            raise NotImplementedError(
                "strict decode: only PNG, baseline/progressive JPEG, "
                "PCM WAV and MP4-container probing are decodable "
                "without PIL/torchaudio/ffmpeg in this container — "
                f"payload is {media_type!r} and none of those"
            )
        # deterministic fake: byte-histogram "embedding" + meta passthrough
        hist = np.bincount(
            np.frombuffer(payload, dtype=np.uint8), minlength=256
        ).astype(np.float32)
        emb = hist @ self.proj
        norm = float(np.linalg.norm(emb)) or 1.0
        emb = emb / norm
        if media_type == "image":
            w, h = int(meta.get("w", 0)), int(meta.get("h", 0))
            dur = 0
        else:
            w = h = 0
            dur = int(meta.get("ms", 0))
        phash = hashlib.md5(payload).hexdigest()[:16]
        return w, h, dur, phash, emb

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["asset_id"].to_pylist()
        types = t["media_type"].to_pylist()
        payloads = t["payload"].to_pylist()
        metas = [json.loads(m) for m in t["meta_json"].to_pylist()]
        ws, hs, ds_, phs, embs, nb = [], [], [], [], [], []
        for mt, p, m in zip(types, payloads, metas):
            w, h, dur, ph, emb = self._decode_impl(mt, p, m)
            ws.append(w)
            hs.append(h)
            ds_.append(dur)
            phs.append(ph)
            embs.append(emb)
            nb.append(len(p))
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.string()),
                pa.array(types, pa.string()),
                pa.array(nb, pa.int64()),
                pa.array(ws, pa.int64()),
                pa.array(hs, pa.int64()),
                pa.array(ds_, pa.int64()),
                pa.array(phs, pa.string()),
                pa.array(
                    [e.tolist() for e in embs], pa.list_(pa.float32(), self.embed_dim)
                ),
            ],
            schema=self.schema,
        )


def decode_media(media, *, strict: bool = False, batch_size: int = 64,
                 concurrency=(1, 4)):
    """Media table → features table via the actor-pool decoder.

    Small ``batch_size`` on purpose: payload × batch × concurrency
    bounds worker heap for wide binary rows.
    """
    return media.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# Image resize (real, vectorized box filter)
# ---------------------------------------------------------------------------

def box_downsample(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Exact area-average (box-filter) downsample, fully vectorized.

    Output pixel ``(i, j)`` is the integer mean (floor division — a
    fixed, reproducible rounding rule) of the source rectangle
    ``rows [floor(i*H/out_h), floor((i+1)*H/out_h)) ×
    cols [floor(j*W/out_w), floor((j+1)*W/out_w))`` — the standard
    integer-edge area bucketing.  Two ``np.add.reduceat`` passes (rows
    then cols) over an int64 accumulator; no per-pixel Python loop.
    Works for (H, W) and (H, W, C) uint8; requires out dims ≤ src dims
    (downsample only — a training-data thumbnail stage never upsamples).
    """
    h, w = img.shape[:2]
    if not (0 < out_h <= h and 0 < out_w <= w):
        raise ValueError("box_downsample is downsample-only")
    r_edges = (np.arange(out_h, dtype=np.int64) * h) // out_h
    c_edges = (np.arange(out_w, dtype=np.int64) * w) // out_w
    r_cnt = np.diff(np.append(r_edges, h))
    c_cnt = np.diff(np.append(c_edges, w))
    acc = np.add.reduceat(img.astype(np.int64), r_edges, axis=0)
    acc = np.add.reduceat(acc, c_edges, axis=1)
    cnt = r_cnt[:, None] * c_cnt[None, :]
    if img.ndim == 3:
        cnt = cnt[:, :, None]
    return (acc // cnt).astype(np.uint8)


def thumb_dims(w: int, h: int, max_dim: int) -> tuple[int, int]:
    """Aspect-preserving thumbnail dims: unchanged when both fit,
    else the long side becomes ``max_dim`` and the short side scales
    by the same integer-floor ratio (never below 1).  Pure integer
    arithmetic so a SQL oracle reproduces it exactly."""
    m = max(w, h)
    if m <= max_dim:
        return w, h
    return max(1, (w * max_dim) // m), max(1, (h * max_dim) // m)


def resize_images(media, *, max_dim: int = 16, strict: bool = False,
                  batch_size: int = 64):
    """Media table → PNG thumbnail table (REAL decode → box filter →
    REAL re-encode), the standard vision-pipeline preprocessing stage.

    Each ``image`` row's payload is sniffed and decoded with the real
    pure-stdlib codecs (PNG / baseline JPEG / progressive SOF2 JPEG),
    area-averaged down to fit ``max_dim`` (:func:`box_downsample`,
    aspect preserved via :func:`thumb_dims`), and re-encoded as PNG.
    Non-image rows and (when ``strict=False``) undecodable payloads
    are dropped; ``strict=True`` raises on an undecodable image — the
    driver-gate mode.

    Stateless per row (no model, no compiled state) → a plain
    ``map_batches`` task stage, not an actor pool; small
    ``batch_size`` bounds heap for wide binary rows exactly like
    :func:`decode_media`.

    Output: ``(asset_id, src_w, src_h, width, height, thumb)`` where
    ``thumb`` is the encoded PNG and (width, height) its dimensions.
    No reference analog (the reference has no media handling); extends
    the beyond-reference multimodal family (brief: decode /
    feature-extract / **resize** / frame-sample).
    """
    def kernel(t: pa.Table) -> pa.Table:
        from .jpeg import decode_jpeg_baseline, is_jpeg
        from .jpeg_progressive import (
            decode_jpeg_progressive,
            is_progressive_jpeg,
        )
        from .png import decode_png, encode_png, is_png

        ids, sw, sh, tw, th, thumbs = [], [], [], [], [], []
        mt = t["media_type"].to_pylist()
        for a, m, p in zip(
            t["asset_id"].to_pylist(), mt, t["payload"].to_pylist()
        ):
            if m != "image":
                continue
            img = None
            if is_png(p):
                img = decode_png(p)
            elif is_jpeg(p):
                try:
                    img = (decode_jpeg_progressive(p)
                           if is_progressive_jpeg(p)
                           else decode_jpeg_baseline(p))
                except ValueError:
                    img = None
            if img is None:
                if strict:
                    raise ValueError(
                        f"resize_images(strict): undecodable image {a!r}"
                    )
                continue
            h_px, w_px = img.shape[:2]
            ow, oh = thumb_dims(w_px, h_px, max_dim)
            small = box_downsample(img, oh, ow)
            ids.append(a)
            sw.append(w_px)
            sh.append(h_px)
            tw.append(ow)
            th.append(oh)
            thumbs.append(encode_png(small))
        return pa.table({
            "asset_id": pa.array(ids, pa.string()),
            "src_w": pa.array(sw, pa.int64()),
            "src_h": pa.array(sh, pa.int64()),
            "width": pa.array(tw, pa.int64()),
            "height": pa.array(th, pa.int64()),
            "thumb": pa.array(thumbs, pa.binary()),
        })

    return media.map_batches(
        kernel, batch_format="pyarrow", batch_size=batch_size
    )


# ---------------------------------------------------------------------------
# Video frame sampling (real MJPEG container walk + real JPEG decode)
# ---------------------------------------------------------------------------

def synth_mjpeg_media_batch(batch: pa.Table) -> pa.Table:
    """Deterministic motion-JPEG media table: every asset becomes a
    REAL MJPEG MP4 (:func:`~.mp4.encode_mjpeg_mp4`) of ``2 + md5[5]%6``
    constant-gray frames at planted dims ``(16+md5[2]%64) ×
    (16+md5[3]%64)``; frame ``i``'s gray is ``63 + 5*((md5[4]+i)%26)``
    — multiples of 5 around 128, so the quality-85 DC quantizer (step
    5) reproduces every pixel EXACTLY and the frame-sample gate can
    value-check decoded grays bit-for-bit.  Same md5 derivation the
    SQL oracle recomputes."""
    from .jpeg import encode_jpeg_baseline
    from .mp4 import encode_mjpeg_mp4

    ids = batch["asset_id"].to_pylist()
    payloads = []
    for a in ids:
        h = hashlib.md5(a.encode()).digest()
        w = 16 + h[2] % 64
        hh = 16 + h[3] % 64
        n = 2 + h[5] % 6
        frames = [
            encode_jpeg_baseline(
                np.full((hh, w), 63 + 5 * ((h[4] + i) % 26), np.uint8),
                quality=85,
            )
            for i in range(n)
        ]
        payloads.append(encode_mjpeg_mp4(frames, width=w, height=hh))
    return pa.Table.from_arrays(
        [
            pa.array(ids, pa.string()),
            pa.array(["video"] * len(ids), pa.string()),
            pa.array(payloads, pa.binary()),
            pa.array(["{}"] * len(ids), pa.string()),
        ],
        schema=MEDIA_SCHEMA,
    )


def sample_video_frames(media, *, stride: int = 2,
                        max_frames: int | None = None,
                        strict: bool = False, batch_size: int = 16):
    """Media table → per-frame feature rows: every ``stride``-th frame
    of each video is located by a REAL ISO BMFF sample-table walk
    (``stsz``/``stco`` via :func:`~.mp4.sample_frames`) and decoded by
    the REAL baseline-JPEG codec — the frame-sample stage of a
    multimodal training pipeline (brief: decode / feature-extract /
    resize / **frame-sample**).

    Non-video rows are dropped; a video whose container or frames
    don't parse is dropped when ``strict=False`` and raises when
    ``strict=True`` (the driver-gate mode).  Stateless per row → a
    plain ``map_batches`` task stage; ``batch_size`` is small because
    one input row explodes into ``n_frames`` decoded images.

    Output: ``(asset_id, frame_index, width, height, gray)`` — decoded
    dims and the rounded mean gray level of each sampled frame.
    """
    def kernel(t: pa.Table) -> pa.Table:
        from .jpeg import decode_jpeg_baseline
        from .mp4 import is_mp4, sample_frames

        ids, idxs, ws, hs, gs = [], [], [], [], []
        for a, m, p in zip(
            t["asset_id"].to_pylist(),
            t["media_type"].to_pylist(),
            t["payload"].to_pylist(),
        ):
            if m != "video":
                continue
            try:
                if not is_mp4(p):
                    raise ValueError("not ISO BMFF")
                for i, fb in sample_frames(
                    p, stride=stride, limit=max_frames
                ):
                    img = decode_jpeg_baseline(fb)
                    h_px, w_px = img.shape[:2]
                    ids.append(a)
                    idxs.append(i)
                    ws.append(w_px)
                    hs.append(h_px)
                    gs.append(int(round(float(img.mean()))))
            except ValueError:
                if strict:
                    raise
                continue
        return pa.table({
            "asset_id": pa.array(ids, pa.string()),
            "frame_index": pa.array(idxs, pa.int64()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "gray": pa.array(gs, pa.int64()),
        })

    return media.map_batches(
        kernel, batch_format="pyarrow", batch_size=batch_size
    )


# ---------------------------------------------------------------------------
# Image near-duplicate pairs (perceptual hash × pigeonhole pairing)
# ---------------------------------------------------------------------------

def synth_neardup_images_batch(batch: pa.Table) -> pa.Table:
    """Deterministic near-duplicate image table: every asset is a real
    PNG of the shared 32×32 base image of its md5-derived group
    (``md5[1] % 4``) plus a mean-preserving two-pixel perturbation
    (+4 / −4 at md5-derived positions).  Because the perturbation
    preserves the pixel sum and touches at most two 4×4 cells of the
    8×8 average-hash grid, same-group assets are GUARANTEED within
    Hamming ≤ 2 of each other while cross-group hashes are
    independent random 64-bit patterns — so the expected near-dup
    pair set is exactly 'same base group', SQL-derivable from
    md5(asset_id)."""
    from .png import encode_png

    ids = batch["asset_id"].to_pylist()
    payloads = []
    bases = {}
    for a in ids:
        h = hashlib.md5(a.encode()).digest()
        base = h[1] % 4
        if base not in bases:
            bases[base] = np.random.RandomState(7000 + base).randint(
                50, 200, (32, 32)
            ).astype(np.uint8)
        img = bases[base].copy()
        flat = img.reshape(-1)
        p1 = h[6] % flat.size
        p2 = (p1 + 1 + h[7] % (flat.size - 1)) % flat.size
        flat[p1] += 4
        flat[p2] -= 4
        payloads.append(encode_png(img))
    return pa.Table.from_arrays(
        [
            pa.array(ids, pa.string()),
            pa.array(["image"] * len(ids), pa.string()),
            pa.array(payloads, pa.binary()),
            pa.array(["{}"] * len(ids), pa.string()),
        ],
        schema=MEDIA_SCHEMA,
    )


def image_neardup_pairs(media, *, max_hamming: int = 3,
                        strict: bool = False, batch_size: int = 64,
                        num_partitions: int = 64):
    """Near-duplicate image pairs: REAL decode → perceptual
    average-hash → the shared 64-bit pigeonhole pairing
    (:func:`~.dedup.hash64_neardup_pairs`) — the image twin of
    SimHash text dedup, the crawl-dedup stage that removes re-hosted
    / lightly-edited copies of the same picture.

    Non-image rows and (``strict=False``) undecodable payloads are
    dropped; ``strict=True`` raises.  Output: (id_a, id_b, hamming),
    id_a < id_b.
    """
    from .dedup import hash64_neardup_pairs

    def ahash64(t: pa.Table) -> pa.Table:
        from .jpeg import decode_jpeg_baseline, is_jpeg
        from .jpeg_progressive import (
            decode_jpeg_progressive,
            is_progressive_jpeg,
        )
        from .png import average_hash, decode_png, is_png

        ids, hs = [], []
        for a, m, p in zip(
            t["asset_id"].to_pylist(),
            t["media_type"].to_pylist(),
            t["payload"].to_pylist(),
        ):
            if m != "image":
                continue
            img = None
            if is_png(p):
                img = decode_png(p)
            elif is_jpeg(p):
                try:
                    img = (decode_jpeg_progressive(p)
                           if is_progressive_jpeg(p)
                           else decode_jpeg_baseline(p))
                except ValueError:
                    img = None
            if img is None:
                if strict:
                    raise ValueError(
                        f"image_neardup_pairs(strict): undecodable {a!r}"
                    )
                continue
            ids.append(a)
            hs.append(int(average_hash(img), 16))
        h = np.array(hs, dtype=np.uint64) if hs else np.empty(0, np.uint64)
        return pa.table({
            "asset_id": pa.array(ids, pa.string()),
            "_h64": pa.array(h.view(np.int64), pa.int64()),
        })

    hashed = media.map_batches(
        ahash64, batch_format="pyarrow", batch_size=batch_size
    )
    return hash64_neardup_pairs(
        hashed, hash_col="_h64", id_col="asset_id",
        max_hamming=max_hamming, num_partitions=num_partitions,
    )
