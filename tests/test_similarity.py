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
