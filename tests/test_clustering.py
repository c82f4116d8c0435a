"""k-means: numpy parity, blob recovery, empty-cluster survival."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _make_ds(x: np.ndarray, blocks: int = 4):
    import ray

    t = pa.table({
        "vec_id": pa.array(range(len(x)), pa.int64()),
        "embedding": pa.array(
            [row.tolist() for row in x], pa.list_(pa.float32())
        ),
    })
    return ray.data.from_arrow(t).repartition(blocks)


@pytest.mark.usefixtures("ray_session")
class TestKMeans:
    def test_blob_recovery_and_numpy_parity(self):
        from obsidian_parser_ray.stages.clustering import (
            _assign, kmeans_assign, kmeans_fit,
        )
        from obsidian_parser_ray.stages.similarity import _sample_centroids

        rng = np.random.default_rng(3)
        centers = np.array([[0.0] * 8, [10.0] * 8, [-10.0, 10.0] * 4])
        x32 = np.concatenate(
            [rng.normal(c, 0.5, size=(40, 8)) for c in centers]
        ).astype(np.float32)
        ds = _make_ds(x32)
        x = x32.astype(np.float64)

        k, iters = 3, 6
        cents = kmeans_fit(ds, k, n_iter=iters)
        got = {
            r["vec_id"]: r["cluster_id"]
            for r in kmeans_assign(ds, cents).take_all()
        }

        # driver twin: same init, same math
        c = np.asarray(
            _sample_centroids(ds, k, 42, "embedding", "vec_id"),
            dtype=np.float64,
        )
        for _ in range(iters):
            a = _assign(x, c)
            nc = c.copy()
            for cid in range(k):
                m = a == cid
                if m.any():
                    nc[cid] = x[m].sum(axis=0) / m.sum()
            c = nc
        exp = _assign(x, c)
        assert np.abs(cents - c).max() < 1e-9
        assert got == {i: int(v) for i, v in enumerate(exp)}

        # blobs must land in distinct clusters, pure per blob
        blobs = [set(got[i] for i in range(b * 40, (b + 1) * 40))
                 for b in range(3)]
        assert all(len(b) == 1 for b in blobs)
        assert len(set().union(*blobs)) == 3

    def test_empty_cluster_keeps_centroid(self):
        from obsidian_parser_ray.stages.clustering import kmeans_fit

        # k=4 over 2 tight far-apart blobs: some centroids never win a
        # point after round 1; the fit must not NaN or crash
        rng = np.random.default_rng(5)
        x = np.concatenate([
            rng.normal(0, 0.01, size=(20, 4)),
            rng.normal(100, 0.01, size=(20, 4)),
        ]).astype(np.float32)
        cents = kmeans_fit(_make_ds(x), 4, n_iter=4)
        assert np.isfinite(cents).all()


@pytest.mark.usefixtures("ray_session")
class TestGroupedCentroids:
    def test_matches_numpy_reference_exactly(self):
        import ray.data as rd

        from obsidian_parser_ray.stages.clustering import grouped_centroid_sums

        rng = np.random.RandomState(7)
        n, d = 400, 6
        x = rng.standard_normal((n, d)).astype(np.float32)
        keys = rng.choice(["en", "de", "fr"], size=n)
        ds = rd.from_arrow(
            pa.table(
                {
                    "lang": pa.array(keys),
                    "embedding": pa.array(
                        [row.tolist() for row in x], pa.list_(pa.float32())
                    ),
                }
            )
        ).repartition(8)  # partials must merge across blocks

        out = grouped_centroid_sums(ds, key_col="lang").to_pandas()
        scaled = np.floor(x.astype(np.float64) * 1_000_000).astype(np.int64)
        for k in ("en", "de", "fr"):
            mask = keys == k
            want = scaled[mask].sum(axis=0)
            got = (
                out[out["lang"] == k]
                .sort_values("dim")["sum_scaled"]
                .to_numpy()
            )
            assert np.array_equal(got, want)  # bit-exact, order-independent
            assert (out[out["lang"] == k]["n_vecs"] == mask.sum()).all()
        assert len(out) == 3 * d
