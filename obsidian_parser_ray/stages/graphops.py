"""Graph-analytic operators over the canonical triples table.

:func:`triangle_counts` — EXACT per-node triangle participation counts
on the undirected graph induced by the triples (all predicates, self
loops dropped).  The classic degree-orientation algorithm, expressed
as Ray Data shuffles:

1. distinct undirected edge set (two-phase distinct, same shape as
   canonicalize: per-block partial → hash-partition → per-partition
   collapse),
2. degree per node (partial counts → small groupby),
3. orient every edge from its lower-(degree, node) endpoint to the
   higher one (two broadcast-free hash joins of the unique degree
   table onto the edges),
4. wedge generation per source node (one shuffle on the source key;
   out-degree under degree orientation is O(sqrt(m)), so per-node
   pair emission is bounded without any hub cap — the count stays
   EXACT, unlike cocitation's ``max_fanin`` drop),
5. close wedges with a semi join against the oriented edge set on the
   (v, w) composite key (each triangle matched exactly once), then
   explode the 3 corners and count per node.

Every stage is a bounded shuffle or a vectorized Arrow/numpy kernel;
nothing materializes on the driver.  Reference has no graph analytics
beyond degree (examples/analyzer.rs:74-84); this is part of the
beyond-reference training-data/graph surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SEP = "\x00"


def _edge_key(a, b):
    return pc.binary_join_element_wise(a, b, _SEP)


def undirected_edges(triples, *, num_partitions: int = 64):
    """Distinct undirected edge set ``(a, b)`` with ``a < b`` from the
    canonical triples (all predicates, self loops dropped)."""
    from ..hashing import hash_bucket_array

    def partial(t: pa.Table) -> pa.Table:
        s, o = t["subj"], t["obj"]
        a = pc.min_element_wise(s, o)
        b = pc.max_element_wise(s, o)
        keep = pc.not_equal(s, o)
        out = pa.table({"a": a, "b": b}).filter(keep)
        out = out.group_by(["a", "b"]).aggregate([])
        return out.append_column(
            "part", hash_bucket_array(_edge_key(out["a"], out["b"]),
                                      num_partitions)
        )

    def collapse(t: pa.Table) -> pa.Table:
        return t.drop_columns(["part"]).group_by(["a", "b"]).aggregate([])

    return (
        triples.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(collapse, batch_format="pyarrow")
    )


def triangle_counts(triples, *, num_partitions: int = 64):
    """Per-node triangle participation: ``(node, n_triangles)`` —
    one row per node appearing in ≥1 triangle of the undirected
    distinct graph.  Exact (no caps, no sampling)."""
    from ray.data.aggregate import Sum

    from ..hashing import hash_bucket_array
    from .joins import hash_join_unique

    ue = undirected_edges(triples, num_partitions=num_partitions)

    def deg_partial(t: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays(
            [t["a"].combine_chunks(), t["b"].combine_chunks()]
        )
        out = pa.table({"node": nodes}).group_by(["node"]).aggregate(
            [([], "count_all")]
        )
        return out.rename_columns(
            ["_d" if c == "count_all" else c for c in out.column_names]
        )

    deg = (
        ue.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("_d", alias_name="deg"))
    )

    # orient: carry deg of both endpoints, direct the edge toward the
    # higher (deg, node) endpoint — a total order, so exactly one
    # orientation per edge
    e = hash_join_unique(ue, deg, left_key="a", right_key="node",
                         num_partitions=num_partitions)
    e = hash_join_unique(e, deg, left_key="b", right_key="node",
                         suffix="_b", num_partitions=num_partitions)

    def orient(t: pa.Table) -> pa.Table:
        da, db = t["deg"], t["deg_b"]
        # a-first iff (deg_a, a) < (deg_b, b); a < b already holds, so
        # ties in degree keep a first
        a_first = pc.or_(
            pc.less(da, db),
            pc.equal(da, db),
        )
        u = pc.if_else(a_first, t["a"], t["b"])
        v = pc.if_else(a_first, t["b"], t["a"])
        dv = pc.if_else(a_first, db, da)
        return pa.table({"u": u, "v": v, "dv": dv})

    oriented = e.map_batches(orient, batch_format="pyarrow")

    def add_upart(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part", hash_bucket_array(t["u"], num_partitions)
        )

    def wedges(t: pa.Table) -> pa.Table:
        # out-neighbors of u sorted by the SAME (deg, node) total
        # order used for orientation, so each emitted pair (v, w) is
        # oriented and matches the closing edge's (u, v) key exactly
        t = t.sort_by([("u", "ascending"), ("dv", "ascending"),
                       ("v", "ascending")])
        u = t["u"].combine_chunks()
        v = t["v"].combine_chunks()
        n = t.num_rows
        if n == 0:
            return pa.table({
                "u": pa.array([], pa.string()),
                "v": pa.array([], pa.string()),
                "w": pa.array([], pa.string()),
            })
        same = pc.equal(u.slice(1), u.slice(0, n - 1))
        starts = np.flatnonzero(
            np.concatenate(([True], ~same.to_numpy(zero_copy_only=False)))
        )
        sizes = np.diff(np.concatenate((starts, [n])))
        li: list[np.ndarray] = []
        ri: list[np.ndarray] = []
        for o, s in zip(starts, sizes):
            if s < 2:
                continue
            x, y = np.triu_indices(int(s), k=1)
            li.append(x + o)
            ri.append(y + o)
        if not li:
            return pa.table({
                "u": pa.array([], pa.string()),
                "v": pa.array([], pa.string()),
                "w": pa.array([], pa.string()),
            })
        lii = np.concatenate(li)
        rii = np.concatenate(ri)
        idx_l = pa.array(lii, pa.int64())
        idx_r = pa.array(rii, pa.int64())
        return pa.table({
            "u": u.take(idx_l),
            "v": v.take(idx_l),
            "w": v.take(idx_r),
        })

    wedge_ds = (
        oriented.map_batches(add_upart, batch_format="pyarrow")
        .groupby("part")
        .map_groups(wedges, batch_format="pyarrow")
    )

    def wedge_key(t: pa.Table) -> pa.Table:
        return t.append_column("_ek", _edge_key(t["v"], t["w"]))

    def oedge_key(t: pa.Table) -> pa.Table:
        return pa.table({"_ek": _edge_key(t["u"], t["v"])})

    triangles = hash_join_unique(
        wedge_ds.map_batches(wedge_key, batch_format="pyarrow"),
        oriented.map_batches(oedge_key, batch_format="pyarrow"),
        left_key="_ek", how="semi", num_partitions=num_partitions,
    )

    def corner_partial(t: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays([
            t["u"].combine_chunks(),
            t["v"].combine_chunks(),
            t["w"].combine_chunks(),
        ])
        out = pa.table({"node": nodes}).group_by(["node"]).aggregate(
            [([], "count_all")]
        )
        return out.rename_columns(
            ["_n" if c == "count_all" else c for c in out.column_names]
        )

    from ray.data.aggregate import Sum as _Sum

    return (
        triangles.map_batches(corner_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(_Sum("_n", alias_name="n_triangles"))
    )


def bfs_hops(triples, sources: list[str], *, pred: str = "links_to",
             directed: bool = False, max_hops: int = 8,
             num_partitions: int = 32):
    """Hop distances from ``sources`` over the ``pred`` edge set:
    ``(node, dist)`` for every node within ``max_hops``.

    Frontier-expansion BFS as rounds of bounded Ray joins: each round
    is one semi join (edges whose tail sits in the frontier) plus one
    anti join (drop already-visited heads) — both via the
    partition-robust ``hash_join_unique``, so the per-round shuffle
    carries only frontier-adjacent edges, and the distance label of a
    node is written exactly once (the first round that reaches it,
    which IS its BFS distance).  State tables are coalesced +
    materialized per round (the iterative-pipeline block-growth rule —
    same as pagerank/components).
    """
    import ray.data as rd

    from .joins import hash_join_unique

    def keep_pred(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["pred"], pa.scalar(pred, pa.string())))

    e = triples.map_batches(keep_pred, batch_format="pyarrow")

    def fwd(t: pa.Table) -> pa.Table:
        return pa.table({"a": t["subj"], "b": t["obj"]})

    edges = e.map_batches(fwd, batch_format="pyarrow")
    if not directed:
        def rev(t: pa.Table) -> pa.Table:
            return pa.table({"a": t["obj"], "b": t["subj"]})

        edges = edges.union(e.map_batches(rev, batch_format="pyarrow"))
    edges = edges.materialize()

    visited = rd.from_arrow(pa.table({
        "node": pa.array(sorted(set(sources)), pa.string()),
        "dist": pa.array([0] * len(set(sources)), pa.int64()),
    })).materialize()
    frontier = visited

    for d in range(1, max_hops + 1):
        # heads of edges leaving the frontier, deduped per partition
        reached = hash_join_unique(
            edges, frontier.select_columns(["node"]),
            left_key="a", right_key="node", how="semi",
            num_partitions=num_partitions,
        )

        def heads(t: pa.Table) -> pa.Table:
            out = pa.table({"node": t["b"]})
            return out.group_by(["node"]).aggregate([])

        cand = reached.map_batches(heads, batch_format="pyarrow")
        # global dedup (a head can arrive from many partitions)
        from ..hashing import hash_bucket_array

        def addp(t: pa.Table) -> pa.Table:
            return t.append_column(
                "part", hash_bucket_array(t["node"], num_partitions))

        def collapse(t: pa.Table) -> pa.Table:
            return (t.drop_columns(["part"])
                    .group_by(["node"]).aggregate([]))

        cand = (cand.map_batches(addp, batch_format="pyarrow")
                .groupby("part")
                .map_groups(collapse, batch_format="pyarrow"))
        new = hash_join_unique(
            cand, visited.select_columns(["node"]),
            left_key="node", how="anti", num_partitions=num_partitions,
        )

        def label(t: pa.Table) -> pa.Table:
            return t.append_column(
                "dist", pa.array([d] * t.num_rows, pa.int64()))

        frontier = new.map_batches(
            label, batch_format="pyarrow"
        ).repartition(num_partitions // 4 or 1, shuffle=False).materialize()
        if frontier.count() == 0:
            break
        visited = visited.union(frontier).repartition(
            num_partitions // 4 or 1, shuffle=False
        ).materialize()

    return visited


def k_core(triples, *, k: int = 2, num_partitions: int = 16,
           max_iters: int = 100):
    """Nodes of the ``k``-core: the maximal subgraph where every node
    has degree ≥ k (undirected, distinct edges, self loops dropped).

    Iterative peeling as Ray rounds, following the repo's iterative
    rules (state coalesced with a metadata-only repartition before each
    ``materialize``; joins via the partition-robust hash join):

    1. degrees from the CURRENT edge set (per-block partial counts →
       groupby-sum);
    2. survivors = nodes with degree ≥ k;
    3. edges = edges with BOTH endpoints surviving (two semi joins);
    repeat until no node is dropped — each round removes at least one
    node, so rounds ≤ nodes (``max_iters`` is a backstop, not a
    tuning knob).  Returns ``(node, degree)`` with the degree inside
    the final core (≥ k by construction).

    A chain peels away end-first under k=2 while a cycle survives —
    the classic distinction tests assert.  Reference has no graph
    analytics beyond degree; this extends the beyond-reference
    surface (cores are the standard KG-quality filter for dense
    subregions).
    """
    from ray.data.aggregate import Sum

    import ray.data as rd

    from .joins import hash_join_unique

    empty = pa.table(
        {"node": pa.array([], pa.string()), "degree": pa.array([], pa.int64())}
    )

    edges = undirected_edges(triples, num_partitions=num_partitions)
    edges = edges.repartition(num_partitions, shuffle=False).materialize()
    n_prev = None

    def deg_partial(t: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays(
            [t["a"].combine_chunks(), t["b"].combine_chunks()]
        )
        flat = pa.table(
            {"node": nodes, "degree": pa.array([1] * len(nodes), pa.int64())}
        )
        out = flat.group_by("node").aggregate([("degree", "sum")])
        return out.rename_columns(
            ["degree" if c == "degree_sum" else c for c in out.column_names]
        ).select(["node", "degree"])

    for _ in range(max_iters):
        if edges.count() == 0:
            return rd.from_arrow(empty)
        degrees = edges.map_batches(
            deg_partial, batch_format="pyarrow"
        ).groupby("node").aggregate(Sum("degree", alias_name="degree"))

        def keep_core(t: pa.Table) -> pa.Table:
            return t.filter(pc.greater_equal(t["degree"], pa.scalar(k)))

        core = degrees.map_batches(keep_core, batch_format="pyarrow")
        core = core.repartition(num_partitions, shuffle=False).materialize()
        n_core = core.count()
        if n_core == 0:
            return rd.from_arrow(empty)
        if n_core == n_prev:
            return core
        n_prev = n_core
        survivors = core.select_columns(["node"])
        edges = hash_join_unique(
            edges, survivors, left_key="a", right_key="node", how="semi",
            num_partitions=num_partitions,
        )
        edges = hash_join_unique(
            edges, survivors, left_key="b", right_key="node", how="semi",
            num_partitions=num_partitions,
        )
        edges = edges.repartition(num_partitions, shuffle=False).materialize()
    raise RuntimeError(f"k_core did not converge in {max_iters} rounds")


def random_walks(triples, *, walks_per_node: int = 1, walk_len: int = 4,
                 pred: str | None = "links_to", seed: int = 42,
                 num_partitions: int = 64):
    """Deterministic uniform random walks over the directed edge set —
    DeepWalk/node2vec-style corpus generation for graph ML.

    Every node starts ``walks_per_node`` walks; at each step the next
    hop is chosen uniformly among the current node's out-neighbors by
    HASH-MIN sampling: ``argmin hash64(seed, walk_id, step, neighbor)``
    — deterministic (reruns emit identical walks), uniform per step,
    and computable inside the partition holding the node's adjacency.
    Walks at sink nodes (no out-edges) simply stop.

    Dataflow per step (``walk_len`` bounded rounds, the BFS shape):
    co-partition the walk frontier with the edges on the current node
    (one bounded hash shuffle per step); inside each partition a
    pandas merge fans each walk out to its neighbors and a grouped
    idxmin picks the hash-min hop — per-step work is Σ deg(cur), the
    inherent cost of uniform neighbor sampling without a prebuilt
    alias table.  The frontier re-partitions every round exactly like
    ``bfs_hops`` (coalesced blocks, no growth).

    Output: ``(walk_id, step, node)`` rows, step 0 = the start node.
    """
    import pandas as pd

    from ..hashing import hash64_array, hash_bucket_array

    edges = triples
    if pred is not None:
        edges = edges.filter(expr=f"pred == '{pred}'")
    edges = edges.select_columns(["subj", "obj"])

    # start frontier: every distinct subject × walks_per_node
    def starts(t: pa.Table) -> pa.Table:
        import numpy as _np

        subj = t["subj"]
        if isinstance(subj, pa.ChunkedArray):
            subj = subj.combine_chunks()
        u = pc.unique(subj)
        n = len(u)
        rep = pc.take(u, pa.array(
            _np.repeat(_np.arange(n), walks_per_node)))
        k = pa.array(
            _np.tile(_np.arange(walks_per_node), n).astype("int64"))
        wid = pc.binary_join_element_wise(
            rep, pc.cast(k, pa.string()), "#")
        return pa.table({"walk_id": wid, "cur": rep})

    frontier = edges.map_batches(starts, batch_format="pyarrow")
    # distinct start rows (subjects repeat across blocks)
    frontier = frontier.groupby("walk_id").map_groups(
        lambda t: t.slice(0, 1), batch_format="pyarrow"
    ).materialize()

    out_parts = []

    def emit(step: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "walk_id": t["walk_id"],
                    "step": pa.array([step] * t.num_rows, pa.int64()),
                    "node": t["cur"],
                }
            )

        return f

    out_parts.append(frontier.map_batches(emit(0), batch_format="pyarrow"))

    def tag_walk(t: pa.Table) -> pa.Table:
        cur = t["cur"]
        if isinstance(cur, pa.ChunkedArray):
            cur = cur.combine_chunks()
        n = t.num_rows
        return pa.table(
            {
                "part": hash_bucket_array(cur, num_partitions),
                "is_edge": pa.array([False] * n, pa.bool_()),
                "key": cur,
                "walk_id": t["walk_id"],
                "obj": pa.nulls(n, pa.string()),
            }
        )

    def tag_edge(t: pa.Table) -> pa.Table:
        subj = t["subj"]
        if isinstance(subj, pa.ChunkedArray):
            subj = subj.combine_chunks()
        n = t.num_rows
        return pa.table(
            {
                "part": hash_bucket_array(subj, num_partitions),
                "is_edge": pa.array([True] * n, pa.bool_()),
                "key": subj,
                "walk_id": pa.nulls(n, pa.string()),
                "obj": t["obj"],
            }
        )

    tagged_edges = edges.map_batches(tag_edge, batch_format="pyarrow")

    for step in range(1, walk_len + 1):
        step_seed = f"{seed}|{step}|"

        def hop(g: pa.Table, _ss=step_seed) -> pa.Table:
            is_edge = g["is_edge"]
            if isinstance(is_edge, pa.ChunkedArray):
                is_edge = is_edge.combine_chunks()
            walks = g.filter(pc.invert(is_edge))
            if walks.num_rows == 0:
                return pa.table(
                    {"walk_id": pa.array([], pa.string()),
                     "cur": pa.array([], pa.string())}
                )
            eg = g.filter(is_edge)
            wdf = pd.DataFrame(
                {"walk_id": walks["walk_id"].to_pylist(),
                 "cur": walks["key"].to_pylist()}
            )
            edf = pd.DataFrame(
                {"cur": eg["key"].to_pylist(),
                 "nxt": eg["obj"].to_pylist()}
            )
            m = wdf.merge(edf, on="cur", how="inner")
            if not len(m):
                return pa.table(
                    {"walk_id": pa.array([], pa.string()),
                     "cur": pa.array([], pa.string())}
                )
            # NB: pandas `Series + "\x00"` silently drops the NUL
            # (C-string truncation) — use a printable separator; the
            # hash key only needs distinctness WITHIN one walk group,
            # where walk_id is constant and nxt values are distinct
            h = hash64_array(
                (_ss + m["walk_id"] + "|" + m["nxt"]).to_numpy()
            )
            m = m.assign(_h=h)
            pick = m.loc[m.groupby("walk_id", sort=False)["_h"].idxmin()]
            return pa.table(
                {
                    "walk_id": pa.array(pick["walk_id"].to_numpy(),
                                        pa.string()),
                    "cur": pa.array(pick["nxt"].to_numpy(), pa.string()),
                }
            )

        frontier = (
            frontier.map_batches(tag_walk, batch_format="pyarrow")
            .union(tagged_edges)
            .groupby("part")
            .map_groups(hop, batch_format="pyarrow")
            .repartition(num_partitions, shuffle=False)
            .materialize()
        )
        if frontier.count() == 0:
            break
        out_parts.append(
            frontier.map_batches(emit(step), batch_format="pyarrow")
        )

    out = out_parts[0]
    for p in out_parts[1:]:
        out = out.union(p)
    return out


def biased_walks(triples, *, walks_per_node: int = 1, walk_len: int = 4,
                 p: float = 1.0, q: float = 1.0,
                 pred: str | None = "links_to", seed: int = 42,
                 num_partitions: int = 64):
    """node2vec-biased random walks (Grover & Leskovec 2016): the next
    hop is drawn with weight ``1/p`` for returning to the previous
    node, ``1`` for a neighbor of the previous node (BFS-ish), and
    ``1/q`` otherwise (DFS-ish).

    Weighted sampling is DETERMINISTIC via Efraimidis–Spirakis keys:
    ``argmin −ln(u)/w`` with ``u`` derived from
    ``hash64(seed, walk_id, step, candidate)`` — reruns emit identical
    walks; ``p = q = 1`` degenerates to uniform sampling.  The first
    hop (no previous node) is uniform.

    Cost per step: the candidate fan-out shuffle (Σ deg(cur), as in
    :func:`random_walks`) PLUS one distance-1 classification join of
    the (prev, candidate) pairs against the unique edge-key set —
    node2vec's inherent extra lookup, kept as a bounded
    ``hash_join_unique(how="left")``.

    Output: ``(walk_id, step, node)`` rows, step 0 = the start node.
    """
    import pandas as pd

    from ..hashing import hash64_array, hash_bucket_array
    from .joins import hash_join_unique

    edges = triples
    if pred is not None:
        edges = edges.filter(expr=f"pred == '{pred}'")
    edges = edges.select_columns(["subj", "obj"])

    def starts(t: pa.Table) -> pa.Table:
        import numpy as _np

        subj = t["subj"]
        if isinstance(subj, pa.ChunkedArray):
            subj = subj.combine_chunks()
        u = pc.unique(subj)
        n = len(u)
        rep = pc.take(u, pa.array(_np.repeat(_np.arange(n), walks_per_node)))
        k = pa.array(_np.tile(_np.arange(walks_per_node), n).astype("int64"))
        wid = pc.binary_join_element_wise(rep, pc.cast(k, pa.string()), "#")
        return pa.table(
            {"walk_id": wid, "prev": pa.array([""] * len(wid), pa.string()),
             "cur": rep}
        )

    frontier = (
        edges.map_batches(starts, batch_format="pyarrow")
        .groupby("walk_id")
        .map_groups(lambda t: t.slice(0, 1), batch_format="pyarrow")
        .materialize()
    )

    def emit(step: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "walk_id": t["walk_id"],
                    "step": pa.array([step] * t.num_rows, pa.int64()),
                    "node": t["cur"],
                }
            )

        return f

    out_parts = [frontier.map_batches(emit(0), batch_format="pyarrow")]

    def edge_marks(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pk": pc.binary_join_element_wise(
                    t["subj"], t["obj"], "\x00"
                ),
                "is_d1": pa.array([True] * t.num_rows, pa.bool_()),
            }
        )

    edge_key_tbl = edges.map_batches(edge_marks, batch_format="pyarrow")

    def tag_walk(t: pa.Table) -> pa.Table:
        cur = t["cur"]
        if isinstance(cur, pa.ChunkedArray):
            cur = cur.combine_chunks()
        n = t.num_rows
        return pa.table(
            {
                "part": hash_bucket_array(cur, num_partitions),
                "is_edge": pa.array([False] * n, pa.bool_()),
                "key": cur,
                "walk_id": t["walk_id"],
                "prev": t["prev"],
                "obj": pa.nulls(n, pa.string()),
            }
        )

    def tag_edge(t: pa.Table) -> pa.Table:
        subj = t["subj"]
        if isinstance(subj, pa.ChunkedArray):
            subj = subj.combine_chunks()
        n = t.num_rows
        return pa.table(
            {
                "part": hash_bucket_array(subj, num_partitions),
                "is_edge": pa.array([True] * n, pa.bool_()),
                "key": subj,
                "walk_id": pa.nulls(n, pa.string()),
                "prev": pa.nulls(n, pa.string()),
                "obj": t["obj"],
            }
        )

    tagged_edges = edges.map_batches(tag_edge, batch_format="pyarrow")

    for step in range(1, walk_len + 1):
        def fanout(g: pa.Table) -> pa.Table:
            is_edge = g["is_edge"]
            if isinstance(is_edge, pa.ChunkedArray):
                is_edge = is_edge.combine_chunks()
            walks = g.filter(pc.invert(is_edge))
            empty = pa.table(
                {"walk_id": pa.array([], pa.string()),
                 "prev": pa.array([], pa.string()),
                 "cur": pa.array([], pa.string()),
                 "nxt": pa.array([], pa.string())}
            )
            if walks.num_rows == 0:
                return empty
            eg = g.filter(is_edge)
            wdf = pd.DataFrame(
                {"walk_id": walks["walk_id"].to_pylist(),
                 "prev": walks["prev"].to_pylist(),
                 "cur": walks["key"].to_pylist()}
            )
            edf = pd.DataFrame(
                {"cur": eg["key"].to_pylist(), "nxt": eg["obj"].to_pylist()}
            )
            m = wdf.merge(edf, on="cur", how="inner")
            if not len(m):
                return empty
            return pa.table(
                {
                    "walk_id": pa.array(m["walk_id"].to_numpy(), pa.string()),
                    "prev": pa.array(m["prev"].to_numpy(), pa.string()),
                    "cur": pa.array(m["cur"].to_numpy(), pa.string()),
                    "nxt": pa.array(m["nxt"].to_numpy(), pa.string()),
                }
            )

        cands = (
            frontier.map_batches(tag_walk, batch_format="pyarrow")
            .union(tagged_edges)
            .groupby("part")
            .map_groups(fanout, batch_format="pyarrow")
        )

        def add_pk(t: pa.Table) -> pa.Table:
            return t.append_column(
                "pk",
                pc.binary_join_element_wise(t["prev"], t["nxt"], "\x00"),
            )

        classified = hash_join_unique(
            cands.map_batches(add_pk, batch_format="pyarrow"),
            edge_key_tbl,
            left_key="pk", how="left", num_partitions=num_partitions,
        )

        step_seed = f"{seed}|{step}|"

        def pick(g: pd.DataFrame, _ss=step_seed) -> pd.DataFrame:
            if not len(g):
                return pd.DataFrame(
                    {"walk_id": pd.Series([], dtype="object"),
                     "prev": pd.Series([], dtype="object"),
                     "cur": pd.Series([], dtype="object")}
                )
            h = hash64_array((_ss + g["walk_id"] + "|" + g["nxt"]).to_numpy())
            u = (h.astype(np.float64) + 0.5) / 2.0**64
            w = np.where(
                g["nxt"].to_numpy() == g["prev"].to_numpy(), 1.0 / p,
                np.where(g["is_d1"].fillna(False).to_numpy(), 1.0, 1.0 / q),
            )
            g = g.assign(_es=(-np.log(u)) / w)
            sel = g.loc[g.groupby("walk_id", sort=False)["_es"].idxmin()]
            return pd.DataFrame(
                {"walk_id": sel["walk_id"].to_numpy(),
                 "prev": sel["cur"].to_numpy(),
                 "cur": sel["nxt"].to_numpy()}
            )

        def tag_by_walk(t: pa.Table) -> pa.Table:
            w = t["walk_id"]
            if isinstance(w, pa.ChunkedArray):
                w = w.combine_chunks()
            return t.append_column(
                "wpart", hash_bucket_array(w, num_partitions)
            )

        frontier = (
            classified.map_batches(tag_by_walk, batch_format="pyarrow")
            .groupby("wpart")
            .map_groups(pick, batch_format="pandas")
            .repartition(num_partitions, shuffle=False)
            .materialize()
        )
        if frontier.count() == 0:
            break
        out_parts.append(
            frontier.map_batches(emit(step), batch_format="pyarrow")
        )

    out = out_parts[0]
    for prt in out_parts[1:]:
        out = out.union(prt)
    return out
