"""Distributed k-means (Lloyd's) over an embedding column.

The canonical Ray Data shape for iterative centroid fitting:

* centroids live in ONE object-store entry per round (``ray.put`` —
  broadcast once, read zero-copy by every task, never re-shipped per
  batch),
* the E-step + partial M-step run fused in ``map_batches``: each block
  emits at most k rows of ``(cluster_id, n, sum_blob)`` — a float64
  per-cluster running sum serialized to bytes (same mergeable-partial
  pattern as the HLL/quantile sketches in ``stages.sketch``),
* partials merge in a k-row ``groupby(cluster_id).map_groups`` — the
  only shuffle, and it carries k × blocks tiny rows,
* the driver folds k rows into the next k×d matrix (array assembly
  only — O(k·d), independent of the dataset size).

At 100 TB nothing here materializes the input: per round the dataset
is re-streamed from its (checkpointed) source, and the shuffle volume
is kilobytes.  Assignment ties break toward the LOWEST cluster id
(np.argmin first-hit), matching the driver-side exact twin used by
the ``emb_kmeans`` gate oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _batch_matrix(t: pa.Table, vec_col: str) -> np.ndarray:
    col = t[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(col), -1)


def _assign(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    # argmin over squared Euclidean via the matmul expansion; the
    # ||x||² term is constant per row and dropped
    d2 = -2.0 * (x @ cents.T) + (cents * cents).sum(axis=1)[None, :]
    return np.argmin(d2, axis=1)


def kmeans_fit(ds, k: int, *, n_iter: int = 10, seed: int = 42,
               vec_col: str = "embedding", id_col: str = "vec_id") -> np.ndarray:
    """Fit k centroids with ``n_iter`` Lloyd rounds; returns the
    final (k, d) float64 matrix.  Init = the deterministic seeded
    hash-sample used by the IVF index (no full sort).  An empty
    cluster keeps its previous centroid."""
    import ray

    from .similarity import _sample_centroids

    cents = np.asarray(
        _sample_centroids(ds, k, seed, vec_col, id_col), dtype=np.float64
    )
    if len(cents) < k:
        raise ValueError(f"need ≥{k} rows to seed {k} centroids")

    for _ in range(n_iter):
        ref = ray.put(cents)

        def partial(t: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            x = _batch_matrix(t, vec_col)
            if not len(x):
                return pa.table({
                    "cluster_id": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "blob": pa.array([], pa.binary()),
                })
            a = _assign(x, c)
            ids, counts, blobs = [], [], []
            for cid in np.unique(a):
                m = a == cid
                ids.append(int(cid))
                counts.append(int(m.sum()))
                blobs.append(x[m].sum(axis=0).tobytes())
            return pa.table({
                "cluster_id": pa.array(ids, pa.int64()),
                "n": pa.array(counts, pa.int64()),
                "blob": pa.array(blobs, pa.binary()),
            })

        def merge(t: pa.Table) -> pa.Table:
            n = int(pa.compute.sum(t["n"]).as_py())
            s = np.zeros_like(np.frombuffer(t["blob"][0].as_py(),
                                            dtype=np.float64))
            for b in t["blob"].to_pylist():
                s = s + np.frombuffer(b, dtype=np.float64)
            return pa.table({
                "cluster_id": t["cluster_id"].slice(0, 1),
                "n": pa.array([n], pa.int64()),
                "blob": pa.array([s.tobytes()], pa.binary()),
            })

        rows = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("cluster_id")
            .map_groups(merge, batch_format="pyarrow")
            .take_all()  # ≤ k tiny rows — array assembly only
        )
        new = cents.copy()
        for r in rows:
            new[r["cluster_id"]] = (
                np.frombuffer(r["blob"], dtype=np.float64) / r["n"]
            )
        cents = new
    return cents


def kmeans_assign(ds, centroids: np.ndarray, *,
                  vec_col: str = "embedding", id_col: str = "vec_id"):
    """Streaming assignment pass: ``(id, cluster_id)`` per row."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        x = _batch_matrix(t, vec_col)
        a = _assign(x, c) if len(x) else np.array([], dtype=np.int64)
        return pa.table({
            id_col: t[id_col],
            "cluster_id": pa.array(a.astype(np.int64), pa.int64()),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def grouped_centroid_sums(ds, *, key_col: str, vec_col: str = "embedding",
                          scale: float = 1_000_000.0):
    """Per-key embedding centroid as EXACT integer-grid sums:
    ``(key, dim, sum_scaled, n_vecs)`` with
    ``sum_scaled = Σ floor(value × scale)`` as int64.

    Working on the floor-scaled integer grid makes the distributed
    result bit-identical to a sequential (or SQL) evaluation — float
    summation order across blocks can differ in the last ulp, which
    would break hash-level oracle comparison; int64 addition is
    associative.  ``floor`` (not round) avoids the half-way
    tie-breaking difference between IEEE round-half-even and SQL
    round-half-away.  The true centroid is
    ``sum_scaled / (n_vecs × scale)`` within 1/scale per element.

    Dataflow: one fused map_batches computes per-block (key, dim)
    partial sums via ``np.add.at`` (k×d rows per block, independent of
    block size), then a tiny groupby merges the partials — the same
    mergeable-partial shape as :func:`kmeans_fit`'s M-step.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        x = _batch_matrix(t, vec_col)
        n, d = x.shape if x.size else (0, 0)
        if not n:
            return pa.table({
                key_col: pa.array([], keys.type),
                "dim": pa.array([], pa.int64()),
                "_s": pa.array([], pa.int64()),
                "_n": pa.array([], pa.int64()),
            })
        scaled = np.floor(x * scale).astype(np.int64)
        uniq, codes = np.unique(np.asarray(keys), return_inverse=True)
        sums = np.zeros((len(uniq), d), np.int64)
        np.add.at(sums, codes, scaled)
        cnt = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        k = len(uniq)
        return pa.table({
            key_col: pa.array(np.repeat(uniq, d), keys.type),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), k)),
            "_s": pa.array(sums.reshape(-1)),
            "_n": pa.array(np.repeat(cnt, d)),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "dim"])
        .aggregate(
            Sum("_s", alias_name="sum_scaled"),
            Sum("_n", alias_name="n_vecs"),
        )
    )
