"""Grouped ranking operators: per-group top-k and co-citation.

Two graph-analysis operators the reference's analyzer surface implies
but computes only globally (degree top-k, examples/analyzer.rs:74-84):

* :func:`grouped_topk` — top-k rows PER KEY GROUP without a global
  sort: per-block partial top-k (a valid combiner — the global
  top-k of a group is a subset of the union of its per-block top-ks),
  then a hash-partitioned final top-k over the reduced set.  Shuffle
  volume is ≤ k rows per (key, block), not the full table.
* :func:`cocitation` — "related notes": pairs of subjects that link
  to the same object, scored by the number of shared objects.  One
  shuffle on the object key; pair explosion is bounded by
  ``max_fanin`` (hub objects are dropped, counted, and reported —
  at web scale a tag-like hub with fan-in f would otherwise emit
  f²/2 pairs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _topk_table(t: pa.Table, keys: list[str], order_col: str, k: int,
                *, descending: bool, tiebreak: list[str],
                with_rank: str | None) -> pa.Table:
    """Vectorized per-table top-k per key (used as BOTH the per-block
    combiner and the per-partition finalizer).

    Sort by (keys asc, order desc, tiebreak asc), detect group
    boundaries with one vectorized compare of the null-joined key
    against its shift, rank = arange - group_start (numpy), keep
    rank < k.  No per-row or per-group Python loop.
    """
    if t.num_rows == 0:
        out = t
        if with_rank and with_rank not in out.column_names:
            out = out.append_column(with_rank, pa.array([], pa.int64()))
        return out
    sort_keys = [(c, "ascending") for c in keys]
    sort_keys.append((order_col, "descending" if descending else "ascending"))
    sort_keys.extend((c, "ascending") for c in tiebreak)
    t = t.sort_by(sort_keys)
    if len(keys) == 1:
        kcol = t[keys[0]]
        if not pa.types.is_string(kcol.type):
            kcol = pc.cast(kcol, pa.string())
        kcol = kcol.combine_chunks()
    else:
        kcol = pc.binary_join_element_wise(
            *[pc.cast(t[c], pa.string()) for c in keys], "\x00"
        ).combine_chunks()
    same = pc.equal(kcol.slice(1), kcol.slice(0, len(kcol) - 1))
    starts = np.flatnonzero(
        np.concatenate(([True], ~same.to_numpy(zero_copy_only=False)))
    )
    # rank within group: arange - (start index of this row's group)
    group_id = np.cumsum(
        np.bincount(starts, minlength=t.num_rows).astype(np.int64)
    ) - 1
    rank = np.arange(t.num_rows, dtype=np.int64) - starts[group_id]
    mask = rank < k
    out = t.filter(pa.array(mask))
    if with_rank:
        out = out.append_column(
            with_rank, pa.array(rank[mask] + 1, pa.int64())
        )
    return out


def grouped_topk(ds, keys: list[str], order_col: str, k: int, *,
                 descending: bool = True, tiebreak: list[str] | None = None,
                 rank_col: str | None = None, num_partitions: int = 64,
                 batch_size: int | None = None):
    """Top-k rows per key group (SQL ``row_number() OVER (PARTITION BY
    keys ORDER BY order_col) <= k`` without a global sort).

    ``tiebreak`` columns (ascending) must make the order within a group
    total, or the result is nondeterministic across runs.  When
    ``rank_col`` is given the output carries the 1-based in-group rank.

    Phase 1 runs the SAME vectorized top-k per block (combiner: any
    row outside a block's local top-k for its key cannot be in the
    global top-k), phase 2 hash-partitions the ≤ k-per-(key, block)
    survivors on the key and finalizes per partition.
    """
    from ..hashing import hash_bucket_array

    tiebreak = tiebreak or []

    def phase1(t: pa.Table) -> pa.Table:
        return _topk_table(t, keys, order_col, k, descending=descending,
                           tiebreak=tiebreak, with_rank=None)

    def add_part(t: pa.Table) -> pa.Table:
        if len(keys) == 1:
            kk = pc.cast(t[keys[0]], pa.string())
        else:
            kk = pc.binary_join_element_wise(
                *[pc.cast(t[c], pa.string()) for c in keys], "\x00"
            )
        return t.append_column("part", hash_bucket_array(kk, num_partitions))

    def phase2(t: pa.Table) -> pa.Table:
        return _topk_table(
            t.drop_columns(["part"]), keys, order_col, k,
            descending=descending, tiebreak=tiebreak, with_rank=rank_col,
        )

    partials = ds.map_batches(
        phase1, batch_format="pyarrow", batch_size=batch_size
    ).map_batches(add_part, batch_format="pyarrow")
    return partials.groupby("part").map_groups(phase2, batch_format="pyarrow")


def cocitation(triples, *, pred: str = "links_to", min_shared: int = 1,
               max_fanin: int = 4096, num_partitions: int = 64):
    """Co-citation pairs: (note_a, note_b, n_shared) — subjects linking
    to ≥ ``min_shared`` common objects, ``note_a < note_b``.

    Input is the CANONICAL triples table (one row per (subj, pred,
    obj)), so (subj, obj) pairs are already distinct.  One shuffle
    co-locates each object's in-neighbors; pairs are emitted per
    object (loop over distinct objects, numpy ``triu_indices`` inside
    — never per row) and counted with the existing two-phase salted
    canonicalization shuffle.

    Objects with fan-in > ``max_fanin`` are DROPPED (a hub with fan-in
    f emits f(f-1)/2 pairs — unbounded quadratic blowup at web scale);
    the returned dataset's semantics are "co-citation via non-hub
    objects", matching the usual LSH-style cap.
    """
    from ..hashing import hash_bucket_array
    from .canonicalize import canonicalize

    def keep_pred(t: pa.Table) -> pa.Table:
        # pc kernel, not an interpolated expr string (caller-supplied key)
        return t.filter(pc.equal(t["pred"], pa.scalar(pred, pa.string())))

    links = triples.map_batches(
        keep_pred, batch_format="pyarrow"
    ).select_columns(["subj", "obj"])

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part", hash_bucket_array(t["obj"], num_partitions)
        )

    def emit_pairs(t: pa.Table) -> pa.Table:
        # sort by (obj, subj): groups contiguous, pairs pre-ordered
        t = t.sort_by([("obj", "ascending"), ("subj", "ascending")])
        subj = t["subj"].combine_chunks()
        obj = t["obj"].combine_chunks()
        same = pc.equal(obj.slice(1), obj.slice(0, len(obj) - 1))
        starts = np.flatnonzero(
            np.concatenate(([True], ~same.to_numpy(zero_copy_only=False)))
        )
        sizes = np.diff(np.concatenate((starts, [t.num_rows])))
        left_idx: list[np.ndarray] = []
        right_idx: list[np.ndarray] = []
        for o, s in zip(starts, sizes):
            if s < 2 or s > max_fanin:
                continue
            a, b = np.triu_indices(int(s), k=1)
            left_idx.append(a + o)
            right_idx.append(b + o)
        if not left_idx:
            return pa.table(
                {
                    "subj": pa.array([], pa.string()),
                    "pred": pa.array([], pa.string()),
                    "obj": pa.array([], pa.string()),
                }
            )
        li = np.concatenate(left_idx)
        ri = np.concatenate(right_idx)
        a_col = subj.take(pa.array(li, pa.int64()))
        b_col = subj.take(pa.array(ri, pa.int64()))
        return pa.table(
            {
                "subj": a_col,
                "pred": pa.array(["cocited"] * len(li), pa.string()),
                "obj": b_col,
            }
        )

    pairs = links.map_batches(add_part, batch_format="pyarrow").groupby(
        "part"
    ).map_groups(emit_pairs, batch_format="pyarrow")
    # (a, b) pairs from DIFFERENT shared objects land in different
    # partitions — the global count is the canonicalization shuffle
    counted = canonicalize(pairs, num_partitions=num_partitions)

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "note_a": t["subj"],
                "note_b": t["obj"],
                "n_shared": t["weight"],
            }
        )

    out = counted.map_batches(rename, batch_format="pyarrow")
    if min_shared > 1:
        out = out.filter(expr=f"n_shared >= {int(min_shared)}")
    return out


def grouped_mode(ds, keys: list[str], value_col: str, *,
                 count_col: str = "n", num_partitions: int = 64):
    """Most frequent value per key group, deterministic ties (smallest
    value wins) — SQL ``row_number() OVER (PARTITION BY keys ORDER BY
    count DESC, value)`` = 1 without a global sort.

    Two-phase counts (per-block partials, hash-partitioned merge on
    the composite key) feed the same partial-top-k machinery as
    :func:`grouped_topk` with k=1; shuffle volume is one row per
    (block, key, value), never raw rows.

    Output: keys + value_col + ``count_col``.
    """
    from ..hashing import hash_bucket_array

    gcols = list(keys) + [value_col]

    def partial(t: pa.Table) -> pa.Table:
        g = t.select(gcols).group_by(gcols).aggregate([([], "count_all")])
        return g.rename_columns([
            count_col if c == "count_all" else c for c in g.column_names
        ])

    def add_part(t: pa.Table) -> pa.Table:
        kk = pc.binary_join_element_wise(
            *[pc.cast(t[c], pa.string()) for c in gcols], "\x00"
        )
        return t.append_column(
            "part", hash_bucket_array(kk, num_partitions)
        )

    def merge(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["part"]).group_by(gcols).aggregate(
            [(count_col, "sum")]
        )
        return g.rename_columns([
            count_col if c == f"{count_col}_sum" else c
            for c in g.column_names
        ])

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge, batch_format="pyarrow")
    )
    return grouped_topk(
        counts, list(keys), count_col, 1,
        descending=True, tiebreak=[value_col],
        num_partitions=num_partitions,
    )


def basket_pairs(ds, *, basket_col: str, item_col: str, k: int = 20,
                 num_partitions: int = 64):
    """Market-basket co-occurrence: top-k item pairs appearing in the
    same basket (order, session, cart).

    One hash shuffle on the basket key; each partition reduces to
    distinct (basket, item) rows and self-merges per basket — fan-out
    is bounded by items-per-basket, never by basket count; pair-count
    partials (≤ |items|² rows) merge in one tiny task that takes the
    top-k (deterministic ties: lexicographically smaller pair).

    Output: (item_a, item_b [a < b], n).
    """
    import pandas as pd

    from ..hashing import hash_bucket_array

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part", hash_bucket_array(t[basket_col], num_partitions)
        )

    def pair_partial(p: pd.DataFrame) -> pd.DataFrame:
        if not len(p):
            return pd.DataFrame({
                "item_a": pd.Series([], dtype="object"),
                "item_b": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64"),
            })
        d = p[[basket_col, item_col]].drop_duplicates()
        m = d.merge(d, on=basket_col, suffixes=("_a", "_b"))
        m = m[m[f"{item_col}_a"] < m[f"{item_col}_b"]]
        out = (
            m.groupby([f"{item_col}_a", f"{item_col}_b"])
            .size().rename("n").reset_index()
            .rename(columns={f"{item_col}_a": "item_a",
                             f"{item_col}_b": "item_b"})
        )
        return out.astype({"item_a": "object", "item_b": "object",
                           "n": "int64"})

    def merge_topk(t: pa.Table) -> pa.Table:
        if "item_a" not in t.column_names:
            # schema restore for an all-empty lineage
            return pa.table({
                "item_a": pa.array([], pa.string()),
                "item_b": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            })
        g = t.group_by(["item_a", "item_b"]).aggregate([("n", "sum")])
        g = g.rename_columns([
            "n" if c == "n_sum" else c for c in g.column_names
        ])
        return g.sort_by([
            ("n", "descending"), ("item_a", "ascending"),
            ("item_b", "ascending"),
        ]).slice(0, k)

    return (
        ds.select_columns([basket_col, item_col])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pair_partial, batch_format="pandas")
        .repartition(1, shuffle=False)
        .map_batches(merge_topk, batch_format="pyarrow",
                     batch_size=None)
    )
