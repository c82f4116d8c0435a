"""Connected components (A7) — parity between the distributed
label-propagation and the driver union-find, plus golden-vault checks
(reference: petgraph connected_components via examples/analyzer.rs:86-88)."""

import pyarrow as pa
import pytest
import ray.data as rd

from obsidian_parser_ray import build_graph
from obsidian_parser_ray.pipelines.components import (
    connected_components,
    connected_components_local,
    n_components,
)
from obsidian_parser_ray.sources import from_markdown_items


def _edges_ds(pairs):
    return rd.from_arrow(
        pa.table(
            {
                "subj": pa.array([p[0] for p in pairs], pa.string()),
                "obj": pa.array([p[1] for p in pairs], pa.string()),
            }
        )
    )


def _nodes_ds(ids):
    return rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.string())}))


class TestLocal:
    def test_two_components_and_isolate(self):
        comp = connected_components_local(
            _edges_ds([("a", "b"), ("b", "c"), ("x", "y")]),
            _nodes_ds(["a", "b", "c", "x", "y", "lone"]),
        )
        assert comp["a"] == comp["b"] == comp["c"] == "a"
        assert comp["x"] == comp["y"] == "x"
        assert comp["lone"] == "lone"
        assert len(set(comp.values())) == 3


class TestDistributed:
    def test_matches_local(self):
        pairs = [("a", "b"), ("b", "c"), ("x", "y"), ("c", "a"), ("p", "q")]
        nodes = ["a", "b", "c", "x", "y", "p", "q", "solo"]
        dist = {
            r["node"]: r["component"]
            for r in connected_components(
                _edges_ds(pairs), _nodes_ds(nodes), num_partitions=2
            ).take_all()
        }
        local = connected_components_local(_edges_ds(pairs), _nodes_ds(nodes))
        assert dist == local

    def test_chain_needs_iterations(self):
        # a long path exercises multi-round propagation
        n = 20
        pairs = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(n)]
        nodes = [f"n{i:02d}" for i in range(n + 1)]
        labels = connected_components(
            _edges_ds(pairs), _nodes_ds(nodes), num_partitions=2
        )
        assert n_components(labels) == 1
        assert all(r["component"] == "n00" for r in labels.take_all())


class TestGoldenVaultComponents:
    """3-file golden vault (vault_test.rs:13-36) is one cycle →
    1 component, matching petgraph on the same edges."""

    def test_one_component(self):
        docs = from_markdown_items(
            [
                ("main", "[[data/main|main]]"),
                ("link", "[[main]]"),
                ("data/main", "[[link]]"),
            ]
        )
        g = build_graph(docs, include_child_of=False, include_tags=False)
        edges = g.triples.filter(expr="pred == 'links_to'")
        nodes = g.notes
        local = connected_components_local(edges, nodes)
        assert len(set(local.values())) == 1
        labels = connected_components(edges, nodes, num_partitions=2)
        assert n_components(labels) == 1


def test_long_chain_converges_in_log_rounds(ray_session):
    """A 200-node path needs ~200 hash-min rounds without pointer
    jumping; with label-of-label compression it must converge well
    inside max_iters=12 (≈ log2 diameter + constant)."""
    import pyarrow as pa
    import ray.data as rd

    from obsidian_parser_ray.pipelines.components import connected_components

    n = 200
    names = ["n%03d" % i for i in range(n)]
    edges = pa.table(
        {
            "subj": pa.array(names[:-1], pa.string()),
            "obj": pa.array(names[1:], pa.string()),
        }
    )
    nodes = pa.table({"doc_id": pa.array(names, pa.string())})
    out = connected_components(
        rd.from_arrow(edges).repartition(4),
        rd.from_arrow(nodes),
        max_iters=12,
        num_partitions=4,
    ).to_pandas()
    assert (out["component"] == "n000").all()
    assert len(out) == n
