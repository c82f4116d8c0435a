import numpy as np
import pyarrow as pa
import ray.data as rd

from obsidian_parser_ray.pipelines.pagerank import pagerank


def _np_pagerank(edges, weights, d, iters):
    """Dense power-iteration oracle with uniform dangling redistribution."""
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    M = np.zeros((n, n))
    out_w = np.zeros(n)
    for (a, b), w in zip(edges, weights):
        out_w[idx[a]] += w
    for (a, b), w in zip(edges, weights):
        M[idx[b], idx[a]] += w / out_w[idx[a]]
    r = np.full(n, 1.0 / n)
    has_out = out_w > 0
    for _ in range(iters):
        dangling = r[~has_out].sum()
        r = (1 - d) / n + d * (M @ r + dangling / n)
    return dict(zip(nodes, r))


def _edges_ds(edges, weights):
    return rd.from_arrow(
        pa.table(
            {
                "subj": pa.array([a for a, _ in edges], pa.string()),
                "obj": pa.array([b for _, b in edges], pa.string()),
                "weight": pa.array(weights, pa.int64()),
            }
        )
    )


def test_pagerank_matches_numpy_with_dangling(ray_session):
    # n4 is dangling (no out-edges); n1 is a hub; weighted edges
    edges = [("n1", "n2"), ("n1", "n3"), ("n2", "n3"), ("n3", "n4"),
             ("n2", "n1"), ("n5", "n1")]
    weights = [2, 1, 1, 3, 1, 1]
    ranks, delta = pagerank(
        _edges_ds(edges, weights), damping=0.85, iterations=12,
        num_partitions=4,
    )
    got = {r["node"]: r["rank"] for r in ranks.take_all()}
    exp = _np_pagerank(edges, weights, 0.85, 12)
    assert set(got) == set(exp)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-9, v
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert delta <= 2 * 0.85**12 + 1e-12


def test_pagerank_uniform_on_cycle(ray_session):
    # symmetric cycle → uniform stationary distribution, any damping
    edges = [("a", "b"), ("b", "c"), ("c", "a")]
    ranks, delta = pagerank(
        _edges_ds(edges, [1, 1, 1]), iterations=10, num_partitions=2
    )
    got = ranks.to_pandas()
    assert np.allclose(got["rank"], 1.0 / 3, atol=1e-12)
    assert delta < 1e-12  # exact fixed point from the first iterate


def test_pagerank_random_graph_block_invariance(ray_session):
    rng = np.random.default_rng(7)
    pairs = sorted(
        {
            (f"v{int(a)}", f"v{int(b)}")
            for a, b in zip(rng.integers(0, 30, 150), rng.integers(0, 30, 150))
            if a != b
        }
    )
    weights = [int(w) for w in rng.integers(1, 4, len(pairs))]
    ranks, _ = pagerank(
        _edges_ds(pairs, weights).repartition(11), iterations=10,
        num_partitions=4,
    )
    got = {r["node"]: r["rank"] for r in ranks.take_all()}
    exp = _np_pagerank(pairs, weights, 0.85, 10)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-9, v
