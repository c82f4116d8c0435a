"""Pluggable embedding-inference stage (actor pool).

The missing piece between the text corpus and the vector operators
(:mod:`.similarity`, :mod:`.clustering`, :mod:`.dedup` embedding
near-dup): an actor-pool ``map_batches`` stage that loads an encoder
ONCE per actor (``__init__``), embeds documents in batches
(``__call__``), validates the model's output contract, and emits a
dense ``embedding`` column the downstream operators consume as-is.

The model is a PLUGGABLE factory — ``model_factory()`` runs once per
actor and returns ``model_fn(list[str]) -> np.ndarray (n, dim)`` — so
a real encoder (torch/ONNX, absent from this container) drops in with
zero pipeline changes; the same lifecycle as :class:`..text.LangId`
and :class:`..multimodal.MediaDecoder`.  The DEFAULT model is the
deterministic signed feature-hash encoder (hashing trick, Weinberger
et al. 2009) matching :func:`..text.hashed_doc_vectors`'s md5
bucket/sign derivation exactly — so the stage is oracle-checkable
today: DuckDB can recompute every vector from ``md5(token)`` and the
driver gate hash-compares real kNN ranks end-to-end
(``doc_embed_knn``).

At 100 TB: embeddings dominate bytes (dim × 8 per doc), so the stage
keeps batches bounded (``batch_size``) and emits fixed-size-list
float64 columns (one flat buffer per batch, no per-row Python lists);
model weights live once per actor, never per batch; sizing is
``concurrency × num_cpus`` like every other actor stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def feature_hash_model(dim: int = 64):
    """Default deterministic encoder: term-frequency signed feature
    hashing, bucket ``md5(w)[:8] % dim``, sign from the 9th md5 hex
    digit — IDENTICAL derivation to :func:`..text.hashed_doc_vectors`
    (and its SQL oracle), but assembled dense.

    Returns ``model_fn(texts) -> (n, dim) float64``; the md5 cache
    persists across batches (it lives in the actor)."""
    import hashlib
    from collections import Counter

    from .dedup import _ASCII_WORD_RE

    cache: dict[str, tuple[int, int]] = {}

    def model_fn(texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), dim), dtype=np.float64)
        for i, x in enumerate(texts):
            for w, c in Counter(
                _ASCII_WORD_RE.findall((x or "").lower())
            ).items():
                bs = cache.get(w)
                if bs is None:
                    h = hashlib.md5(w.encode("utf-8")).hexdigest()
                    bs = (
                        int(h[:8], 16) % dim,
                        1 if int(h[8], 16) % 2 == 0 else -1,
                    )
                    cache[w] = bs
                out[i, bs[0]] += bs[1] * c
        return out

    return model_fn


class DocumentEmbedder:
    """Actor-pool embedding stage: model loaded once per actor,
    batched inference per call, output contract validated."""

    def __init__(self, model_factory=None, *, dim: int = 64,
                 text_col: str = "text", id_col: str = "doc_id",
                 normalize: bool = False):
        self.model_fn = (
            model_factory() if model_factory is not None
            else feature_hash_model(dim)
        )
        self.dim = dim
        self.text_col = text_col
        self.id_col = id_col
        self.normalize = normalize

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col].to_pylist()
        emb = self.model_fn(texts)
        emb = np.asarray(emb, dtype=np.float64)
        # the model contract is validated HERE, per batch, so a
        # misbehaving plug-in model fails loudly at the first batch
        # instead of corrupting the vector column silently
        if emb.ndim != 2 or emb.shape != (len(texts), self.dim):
            raise ValueError(
                f"model_fn returned shape {emb.shape}, expected "
                f"({len(texts)}, {self.dim})"
            )
        if len(texts) and not np.isfinite(emb).all():
            raise ValueError("model_fn returned non-finite values")
        if self.normalize:
            n = np.linalg.norm(emb, axis=1)
            n[n == 0] = 1.0
            emb = emb / n[:, None]
        vec = pa.FixedSizeListArray.from_arrays(
            pa.array(np.ascontiguousarray(emb).ravel(), pa.float64()),
            self.dim,
        )
        return pa.table({self.id_col: t[self.id_col], "embedding": vec})


def embed_documents(ds, *, model_factory=None, dim: int = 64,
                    text_col: str = "text", id_col: str = "doc_id",
                    normalize: bool = False, concurrency=(1, 8),
                    batch_size: int | None = 512):
    """documents Dataset → ``(id_col, embedding)`` Dataset.

    ``model_factory``: zero-arg callable run once per ACTOR returning
    ``model_fn(list[str]) -> (n, dim) float array`` — load weights /
    build tables there, not per batch.  ``None`` → the deterministic
    :func:`feature_hash_model` (oracle-checkable).  ``normalize`` emits
    unit vectors (cosine-ready).
    """
    return ds.map_batches(
        DocumentEmbedder,
        fn_constructor_kwargs={
            "model_factory": model_factory,
            "dim": dim,
            "text_col": text_col,
            "id_col": id_col,
            "normalize": normalize,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
