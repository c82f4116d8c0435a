"""Distributed PageRank over the canonical triple graph.

The reference stops at degree statistics (examples/analyzer.rs:74-84);
PageRank is the canonical "which notes matter" extension of the same
graph surface.  Implemented as the textbook power iteration expressed
entirely in Dataset operations — the same join + groupby round shape
as :mod:`.components` (label propagation), so all state lives in the
object store and every round is an explicit hash-partitioned exchange,
never a driver-side matrix.

Per-round cost is kept to TWO executions:

* one scalar reduction for the dangling mass — the rank table carries
  a STATIC ``dang`` flag (1.0 on nodes without out-edges, joined once
  at setup), so the reduction is ``sum(rank·dang)`` over the already-
  materialized ranks, no per-round join;
* one shuffle execution building the next iterate: ranks ⋈ transitions
  on subj (``hash_join_unique`` — partition-robust, actor-free, unlike
  ``Dataset.join``) → groupby obj → rebase with the damping constant
  and the dangling share.  ``Max(dang)`` inside the same groupby
  re-attaches the static flag (the zeros row carries it; contribution
  rows carry 0).

Total rank mass is exactly 1 per round by construction
(``(1−d) + d·(transferred + dangling) = 1``), so no totals pass.
L1 convergence is bounded by ``2 · damping^iterations`` regardless of
graph shape (power-iteration contraction), which the oracle gate in
``__ray_entry__`` relies on.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def pagerank(edges, *, damping: float = 0.85, iterations: int = 40,
             num_partitions: int = 64):
    """Directed weighted PageRank → ``(ranks, l1_delta)``.

    ``edges``: Dataset with (subj, obj) string columns and an optional
    int/float ``weight`` (edge multiplicity; defaults to 1).  ``ranks``
    is a ``(node, rank)`` Dataset over subj ∪ obj; ``l1_delta`` is the
    L1 distance between the last two iterates.

    Every round's shuffle volume is O(edges + nodes); nothing driver-
    side grows with the graph (the dangling-mass scalar is a
    ``Dataset.sum`` reduction).
    """
    from ray.data.aggregate import Max, Sum

    from ..stages.joins import hash_join_unique

    def proj(t: pa.Table) -> pa.Table:
        w = (
            pc.cast(t["weight"], pa.float64())
            if "weight" in t.column_names
            else pa.array([1.0] * t.num_rows, pa.float64())
        )
        return pa.table({"subj": t["subj"], "obj": t["obj"], "w": w})

    e = edges.map_batches(proj, batch_format="pyarrow")

    # out-weight per source, folded into a per-edge transition
    # probability p = w / out_w (built once, probed every round)
    out_w = e.groupby("subj").aggregate(Sum("w", alias_name="out_w"))
    trans = hash_join_unique(
        e, out_w, left_key="subj", num_partitions=num_partitions
    ).map_batches(
        lambda t: pa.table(
            {
                "subj": t["subj"],
                "obj": t["obj"],
                "p": pc.divide(t["w"], t["out_w"]),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    # node universe = subj ∪ obj (distinct), with the static dangling
    # flag: dang = 1.0 iff the node has NO out-edges (left semi miss)
    def col_as_node(name):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({"node": t[name]})

        return f

    node_ids = (
        e.map_batches(col_as_node("subj"), batch_format="pyarrow")
        .union(e.map_batches(col_as_node("obj"), batch_format="pyarrow"))
        .groupby("node")
        .count()
        .select_columns(["node"])
    )
    nodes = hash_join_unique(
        node_ids,
        out_w.map_batches(
            lambda t: pa.table(
                {
                    "subj": t["subj"],
                    "_has_out": pa.array([1.0] * t.num_rows, pa.float64()),
                }
            ),
            batch_format="pyarrow",
        ),
        left_key="node",
        right_key="subj",
        how="left",
        num_partitions=num_partitions,
    ).map_batches(
        lambda t: pa.table(
            {
                "node": t["node"],
                "dang": pc.subtract(
                    pa.scalar(1.0),
                    pc.coalesce(t["_has_out"], pa.scalar(0.0)),
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    n = nodes.count()
    if n == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {"node": pa.array([], pa.string()),
                 "rank": pa.array([], pa.float64())}
            )
        ), 0.0

    def with_rank(value: float):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": t["node"],
                    "rank": pa.array([value] * t.num_rows, pa.float64()),
                    "dang": t["dang"],
                }
            )

        return f

    ranks = nodes.map_batches(with_rank(1.0 / n), batch_format="pyarrow")
    zeros = nodes.map_batches(with_rank(0.0), batch_format="pyarrow")
    delta = float("nan")

    for it in range(iterations):
        ranks = ranks.materialize()
        # dangling mass: one scalar reduction over materialized ranks
        dangling = (
            ranks.map_batches(
                lambda t: pa.table({"dm": pc.multiply(t["rank"], t["dang"])}),
                batch_format="pyarrow",
            ).sum("dm")
            or 0.0
        )

        contrib = hash_join_unique(
            trans,
            ranks.select_columns(["node", "rank"]),
            left_key="subj",
            right_key="node",
            num_partitions=num_partitions,
        ).map_batches(
            lambda t: pa.table(
                {
                    "node": t["obj"],
                    "rank": pc.multiply(t["p"], t["rank"]),
                    "dang": pa.array([0.0] * t.num_rows, pa.float64()),
                }
            ),
            batch_format="pyarrow",
        )
        base = (1.0 - damping) / n + damping * dangling / n
        new_ranks = (
            contrib.union(zeros)
            .groupby("node")
            .aggregate(
                Sum("rank", alias_name="in_sum"),
                Max("dang", alias_name="dang"),
            )
            .map_batches(
                lambda t, b=base: pa.table(
                    {
                        "node": t["node"],
                        "rank": pc.add(
                            pc.multiply(
                                pc.cast(t["in_sum"], pa.float64()), damping
                            ),
                            pa.scalar(b, pa.float64()),
                        ),
                        "dang": t["dang"],
                    }
                ),
                batch_format="pyarrow",
            )
            # coalesce (metadata-level, no exchange): the join unions
            # left+right block lists and the aggregate's output block
            # count tracks its input's, so WITHOUT this clamp the rank
            # table gains ~|trans blocks| blocks per round and
            # per-round cost grows linearly with the iteration index
            .repartition(num_partitions, shuffle=False)
            .materialize()
        )
        if it == iterations - 1:
            delta = (
                hash_join_unique(
                    new_ranks.select_columns(["node", "rank"]),
                    ranks.map_batches(
                        lambda t: pa.table(
                            {"node": t["node"], "old": t["rank"]}
                        ),
                        batch_format="pyarrow",
                    ),
                    left_key="node",
                    num_partitions=num_partitions,
                )
                .map_batches(
                    lambda t: pa.table(
                        {"d": pc.abs(pc.subtract(t["rank"], t["old"]))}
                    ),
                    batch_format="pyarrow",
                )
                .sum("d")
            )
        ranks = new_ranks

    return ranks.select_columns(["node", "rank"]), float(delta)
