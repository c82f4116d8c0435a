"""Connected components (SURVEY.md §2.5 A7).

The reference delegates to ``petgraph::algo::connected_components``
(/root/reference/examples/analyzer.rs:4,86-88) — a single-machine graph
walk.  Two Ray-Data-native equivalents:

* :func:`connected_components` — distributed min-label propagation
  with POINTER JUMPING: every node starts labeled with itself; each
  round, every node takes the min label over itself and its neighbors
  (hash-join of the edge list against the label table + groupby-min),
  then labels are compressed once via label-of-label (one more
  node-sized join) — the jump squares the distance covered per round,
  so convergence is O(log diameter) rounds instead of O(diameter)
  (the classic Hash-Min + pointer-jumping scheme, cf. Kiveris et al.,
  "Connected Components in MapReduce and Beyond").  Long
  representative chains — e.g. the giant components LSH dedup
  produces on template-heavy corpora — would otherwise pay one full
  edge shuffle PER HOP.  Each round materializes a label table
  bounded by node count, never the full edge × label product.  This
  is the 10^12-scale path — all state lives in Datasets, rounds are
  joins + groupbys with explicit ``num_partitions``.
* :func:`connected_components_local` — exact streaming union-find on
  the driver (O(nodes) driver memory, edges streamed once).  This is
  the analyzer-parity oracle and the right tool whenever the NODE
  count (not edge count) fits one machine — same regime where the
  reference itself applies.
"""

from __future__ import annotations

import pyarrow as pa


def _norm_edges(edges):
    """Edge Dataset → undirected (src, dst) message pairs, both ways."""

    def fwd(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["subj"], "dst": t["obj"]})

    def rev(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["obj"], "dst": t["subj"]})

    e = edges.select_columns(["subj", "obj"])
    return e.map_batches(fwd, batch_format="pyarrow").union(
        e.map_batches(rev, batch_format="pyarrow")
    )


def connected_components(edges, nodes, *, max_iters: int = 50,
                         num_partitions: int = 16):
    """Distributed label propagation → Dataset ``(node, component)``.

    ``edges``: Dataset with string columns (subj, obj) — treated
    undirected.  ``nodes``: Dataset with ``doc_id`` (isolated nodes get
    their own component).  ``component`` = min node id in the
    component (deterministic canonical representative).
    """
    from ray.data.aggregate import Count, Min

    from ..stages.joins import broadcast_join_unique

    # coalesce BEFORE the loop: the edge lineage often ends in a wide
    # shuffle whose many near-empty blocks would otherwise multiply
    # every round's task count (per-round cost is dominated by
    # scheduling latency × task count, not bytes, on small graphs)
    msgs = (
        _norm_edges(edges)
        .repartition(num_partitions, shuffle=False)
        .materialize()
    )
    # exchange width ∝ measured (directed) message count; per-round
    # joins go through the guarded size-adaptive broadcast join — the
    # label table is node-scale, so while it fits the guard each round
    # is map-side probes + ONE groupby exchange, and a huge graph
    # falls back to the shuffle join automatically (r5 scale-sweep
    # finding: 57 s -> ~11 s at sf0.1)
    num_partitions = max(4, min(num_partitions,
                                msgs.count() // 400_000 + 4))

    def init_labels(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["doc_id"], "label": t["doc_id"]})

    def endpoint_labels(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["src"], "label": t["src"]})

    # seed from nodes UNION edge endpoints: an endpoint absent from the
    # nodes table must still participate in the convergence check (its
    # first-appearance round would otherwise be invisible to the
    # changed-count and the loop could declare convergence early)
    labels = (
        nodes.select_columns(["doc_id"])
        .map_batches(init_labels, batch_format="pyarrow")
        .union(msgs.map_batches(endpoint_labels, batch_format="pyarrow"))
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )

    converged = False
    for _ in range(max_iters):
        # neighbor labels: msg (src,dst) ⋈ labels(node=src) → (dst, label)
        # — hash_join_unique (labels are unique per node) instead of
        # Dataset.join: robust to empty hash partitions (small graphs
        # on many-CPU clusters) and free of per-partition join actors
        joined = broadcast_join_unique(
            msgs,
            labels,
            left_key="src",
            right_key="node",
            num_partitions=num_partitions,
        ).select_columns(["dst", "label"])

        def as_node(t: pa.Table) -> pa.Table:
            return pa.table({"node": t["dst"], "label": t["label"]})

        candidates = joined.map_batches(as_node, batch_format="pyarrow").union(
            labels
        )
        # materialized: consumed twice below (mid side + lut side) —
        # lazy, each consumer would re-run the union + groupby
        hooked = candidates.groupby("node").aggregate(
            Min("label", alias_name="label")
        ).materialize()

        # pointer jumping: label ← label(label).  Labels only decrease
        # (they are mins over node ids and label(x) ≤ x), so the jump
        # needs no extra min — it strictly compresses representative
        # chains, squaring the per-round propagation distance.
        def as_mid(t: pa.Table) -> pa.Table:
            return pa.table({"node": t["node"], "mid": t["label"]})

        def as_lut(t: pa.Table) -> pa.Table:
            return pa.table({"mid": t["node"], "label": t["label"]})

        new_labels = (
            broadcast_join_unique(
                hooked.map_batches(as_mid, batch_format="pyarrow"),
                hooked.map_batches(as_lut, batch_format="pyarrow"),
                left_key="mid",
                num_partitions=num_partitions,
            )
            .select_columns(["node", "label"])
            # coalesce (metadata-level): the union + aggregate would
            # otherwise grow the label table's block count every round
            .repartition(num_partitions, shuffle=False)
            .materialize()
        )
        # converged iff no node's label changed — tiny anti-join check
        changed = (
            broadcast_join_unique(
                new_labels,
                labels.map_batches(
                    lambda t: pa.table({"node": t["node"], "old": t["label"]}),
                    batch_format="pyarrow",
                ),
                left_key="node",
                num_partitions=num_partitions,
            )
            .filter(expr="label != old")
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"label propagation did not converge in {max_iters} rounds "
            "(component diameter exceeds max_iters) — raise max_iters"
        )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "component": t["label"]})

    return labels.map_batches(rename, batch_format="pyarrow")


def n_components(labels) -> int:
    """Count distinct components from a (node, component) Dataset."""
    return labels.groupby("component").count().count()


def connected_components_local(edges, nodes) -> dict[str, str]:
    """Streaming union-find on the driver → {node: component-root}.

    Exact parity oracle for petgraph ``connected_components``.  Edges
    stream through once (no driver materialization of the edge list);
    state is O(nodes).
    """
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        # path compression
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            # canonical representative = min id (deterministic)
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    for batch in nodes.select_columns(["doc_id"]).iter_batches(
        batch_format="pyarrow", batch_size=65536
    ):
        for n in batch["doc_id"].to_pylist():
            parent.setdefault(n, n)
    for batch in edges.select_columns(["subj", "obj"]).iter_batches(
        batch_format="pyarrow", batch_size=65536
    ):
        for a, b in zip(batch["subj"].to_pylist(), batch["obj"].to_pylist()):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            union(a, b)
    return {n: find(n) for n in parent}
