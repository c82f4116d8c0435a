"""Similarity search: brute-force cosine top-k + IVF approximate."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from obsidian_parser_ray.stages.similarity import knn_bruteforce, knn_ivf, load_queries


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(123)
    vecs = rng.standard_normal((200, 16))
    df = pd.DataFrame(
        {"vec_id": range(200), "embedding": [v.tolist() for v in vecs]}
    )
    return rd.from_pandas(df), vecs


def _numpy_topk(vecs, q_ids, k=5):
    unit = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    sim = unit[q_ids] @ unit.T
    out = {}
    for qi, q in enumerate(q_ids):
        row = sim[qi].copy()
        order = [
            i for i in np.lexsort((np.arange(len(row)), -row)) if i != q
        ][:k]
        out[q] = order
    return out


def test_bruteforce_matches_numpy(emb_ds):
    ds, vecs = emb_ds
    q = load_queries(ds, n_queries=5)
    assert q[0] == [0, 1, 2, 3, 4]
    out = knn_bruteforce(ds, q, k=5, concurrency=1).to_pandas()
    expected = _numpy_topk(vecs, q[0], k=5)
    for qid in q[0]:
        got = list(
            out[out["query_id"] == qid].sort_values("rank")["neighbor_id"]
        )
        assert got == expected[qid], (qid, got, expected[qid])
    assert set(out["rank"]) == {1, 2, 3, 4, 5}


def test_bruteforce_self_excluded(emb_ds):
    ds, _ = emb_ds
    out = knn_bruteforce(ds, load_queries(ds, n_queries=3), k=5, concurrency=1).to_pandas()
    assert not ((out["query_id"] == out["neighbor_id"]).any())


def test_ivf_recall_vs_bruteforce(emb_ds):
    ds, vecs = emb_ds
    q = load_queries(ds, n_queries=5)
    exact = knn_bruteforce(ds, q, k=5, concurrency=1).to_pandas()
    approx = knn_ivf(ds, q, k=5, n_centroids=8, nprobe=4).to_pandas()
    # recall@5 of IVF with half the lists probed should be substantial
    recalls = []
    for qid in q[0]:
        e = set(exact[exact["query_id"] == qid]["neighbor_id"])
        a = set(approx[approx["query_id"] == qid]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5, recalls


def test_ivf_full_probe_is_exact(emb_ds):
    ds, vecs = emb_ds
    q = load_queries(ds, n_queries=3)
    exact = knn_bruteforce(ds, q, k=3, concurrency=1).to_pandas()
    full = knn_ivf(ds, q, k=3, n_centroids=4, nprobe=4).to_pandas()
    for qid in q[0]:
        e = list(exact[exact["query_id"] == qid].sort_values("rank")["neighbor_id"])
        f = list(full[full["query_id"] == qid].sort_values("rank")["neighbor_id"])
        assert e == f


class TestPersistedIVF:
    def test_build_and_search(self, tmp_path, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.stages.similarity import (
            build_ivf_index,
            knn_bruteforce,
            search_ivf_index,
        )

        rng = np.random.RandomState(7)
        n, dim = 400, 16
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        ds = rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(n), pa.int64()),
                    "embedding": pa.array(
                        [v.tolist() for v in vecs], pa.list_(pa.float32())
                    ),
                }
            )
        )
        idx_dir = str(tmp_path / "ivf")
        man = build_ivf_index(ds, idx_dir, n_centroids=8)
        assert man["n_centroids"] == 8
        assert sum(man["list_rows"].values()) == n

        q = ([0, 1, 2], vecs[:3].astype(np.float64))
        exact = {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in knn_bruteforce(ds, q, k=5).take_all()
        }
        approx = {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in search_ivf_index(idx_dir, q, k=5, nprobe=8).take_all()
        }
        # probing ALL lists == exact search
        assert approx == exact
        # probing fewer lists still returns k ranked rows per query
        some = search_ivf_index(idx_dir, q, k=5, nprobe=2).take_all()
        per_q = {}
        for r in some:
            per_q.setdefault(r["query_id"], []).append(r["rank"])
        assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


@pytest.mark.usefixtures("ray_session")
class TestPQ:
    def test_pq_recall_and_schema(self):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.stages.similarity import (
            knn_bruteforce,
            load_queries,
            pq_knn,
        )

        rng = np.random.RandomState(0)
        n, d = 400, 32
        # clustered data: PQ codebooks should capture the structure
        centers = rng.standard_normal((8, d)) * 3
        x = centers[rng.randint(0, 8, n)] + rng.standard_normal((n, d))
        ds = rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(n), pa.int64()),
                    "embedding": pa.array(
                        [r.tolist() for r in x.astype(np.float32)],
                        pa.list_(pa.float32()),
                    ),
                }
            )
        ).repartition(4)
        q = load_queries(ds, n_queries=8)
        exact = knn_bruteforce(ds, q, k=5, concurrency=1).to_pandas()
        approx = pq_knn(
            ds, q, k=5, m=8, refine=48, sample_size=400, concurrency=1
        ).to_pandas()
        assert set(approx.columns) == {"query_id", "neighbor_id",
                                       "cosine", "rank"}
        te = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
        ta = {(r.query_id, r.neighbor_id) for r in approx.itertuples()}
        assert len(te & ta) / len(te) >= 0.8
        # exact re-rank: any overlapping (query, neighbor) pair must
        # carry the IDENTICAL exact cosine as brute force
        me = {(r.query_id, r.neighbor_id): r.cosine
              for r in exact.itertuples()}
        for r in approx.itertuples():
            if (r.query_id, r.neighbor_id) in me:
                assert abs(me[(r.query_id, r.neighbor_id)] - r.cosine) < 1e-12

    def test_pq_deterministic(self):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.stages.similarity import load_queries, pq_knn

        rng = np.random.RandomState(1)
        n, d = 200, 16
        x = rng.standard_normal((n, d)).astype(np.float32)
        ds = rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(n), pa.int64()),
                    "embedding": pa.array(
                        [r.tolist() for r in x], pa.list_(pa.float32())
                    ),
                }
            )
        )
        q = load_queries(ds, n_queries=5)
        a = pq_knn(ds, q, k=3, m=4, sample_size=200,
                   concurrency=1).to_pandas()
        b = pq_knn(ds, q, k=3, m=4, sample_size=200,
                   concurrency=1).to_pandas()
        key = lambda df: sorted(  # noqa: E731
            (r.query_id, r.rank, r.neighbor_id) for r in df.itertuples()
        )
        assert key(a) == key(b)

    def test_pq_rejects_bad_dim(self):
        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.stages.similarity import train_pq_codebooks

        ds = rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array([0, 1], pa.int64()),
                    "embedding": pa.array(
                        [[1.0, 2.0, 3.0]] * 2, pa.list_(pa.float32())
                    ),
                }
            )
        )
        with pytest.raises(ValueError, match="divisible"):
            train_pq_codebooks(ds, m=2)
