"""Generic hash equi-join against a unique-keyed build side.

``Dataset.join`` in Ray 2.49 crashes when a hash partition receives no
blocks for one input sequence (the aggregator builds a ZERO-COLUMN
empty table and Acero then fails with "No match ... for key field" —
ray/data/_internal/execution/operators/join.py:104-125), which any
small or skewed join can trigger.  It also allocates ``num_partitions``
concurrent 1-CPU actors.  For the dominant join shape in this engine —
probe a fact table against a side that is UNIQUE per key (a dictionary,
an aggregate, a rank/label table) — this module provides a
partition-robust, actor-free alternative built from the repo's standard
primitives: union-tag the two sides, hash-partition on the key, and
resolve each partition with one vectorized ``pc.index_in`` probe (the
same pattern as dedup's candidate↔signature join, dedup.py:380-401).

Shuffle volume is |left| + |right| rows, the per-partition work is
O(rows) Arrow kernels, and empty partitions are simply absent groups.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def hash_join_unique(left, right, *, left_key: str, right_key: str | None = None,
                     how: str = "inner", suffix: str = "_r",
                     num_partitions: int = 64, salt: int = 1,
                     left_schema: pa.Schema | None = None,
                     right_schema: pa.Schema | None = None):
    """Equi-join ``left`` against a ``right`` side unique per key.

    ``right`` MUST have at most one row per ``right_key`` value (an
    aggregate / dictionary / rank table); rows beyond the first per key
    would be silently ignored, so callers own that invariant — except
    for ``how="semi"``/``"anti"``, which are pure presence checks and
    accept any right side.  ``how`` is ``"inner"``, ``"left"``
    (unmatched left rows keep typed nulls on the right value columns),
    ``"semi"`` (left rows WITH a match, left columns only), ``"anti"``
    (left rows WITHOUT a match, left columns only) or ``"full"`` (left
    mode PLUS one row per unmatched right key; USING-style key
    semantics — the ``left_key`` column carries the coalesced key, so
    right-only rows stay identifiable, matching
    ``FULL JOIN ... USING (k)`` in SQL).  Right value columns
    colliding with a left column name get ``suffix``.

    Output columns: all left columns, then (inner/left/full only)
    each right non-key column.

    ``salt > 1`` splits every key partition into ``salt`` slots: left
    rows round-robin across the slots of their key partition and the
    (unique-keyed, hence small) right side replicates into every slot
    — the standard hot-key remedy, turning one straggler task holding
    the whole hub key into ``salt`` even tasks.  Results are
    IDENTICAL for left-driven modes (inner/left/semi/anti: every left
    row still meets its full right set); ``how="full"`` rejects
    ``salt > 1`` because right-only detection needs cross-slot
    visibility.  Cost: ``salt × |right|`` extra shuffle rows.

    ``left_schema`` / ``right_schema``: pass the known Arrow schema of
    a side whose lineage contains an all-to-all (groupby/sort) —
    otherwise the plan's ``schema()`` probe executes that whole
    subtree once just for inference and the real run repeats it.
    """
    if how not in ("inner", "left", "semi", "anti", "full"):
        raise ValueError(
            f"how must be 'inner', 'left', 'semi', 'anti' or 'full', "
            f"got {how!r}"
        )
    salt = max(1, int(salt))
    if salt > 1 and how == "full":
        raise ValueError(
            "hash_join_unique(how='full') does not support salt > 1: "
            "right-only rows need cross-slot visibility"
        )
    right_key = right_key or left_key

    from ..hashing import hash_bucket_array

    # schema inference on a lazy side whose lineage holds an
    # all-to-all EXECUTES that subtree and discards the work; callers
    # that know their schemas pass them to skip the probe entirely
    l_schema = left_schema if left_schema is not None else left.schema()
    r_schema = (
        right_schema if right_schema is not None else right.schema()
    )
    # a fully-empty input can surface as a block-less dataset whose
    # schema is unknown (e.g. a map_groups stage that emitted only
    # empty tables) — the join result is then determined without it
    if l_schema is None:
        if how == "full":
            raise ValueError(
                "hash_join_unique(how='full'): left side has no schema "
                "(block-less empty dataset) — cannot type the null left "
                "columns of right-only rows; materialize an empty typed "
                "table instead"
            )
        return left  # empty: inner/semi/anti/left results are all empty
    if r_schema is None:
        if how == "anti":
            return left  # nothing to subtract
        if how in ("semi", "inner"):
            return left.limit(0)
        raise ValueError(
            f"hash_join_unique(how={how!r}): right side has no schema "
            "(block-less empty dataset) — cannot type the null value "
            "columns; materialize an empty typed table instead"
        )
    l_fields = [pa.field(n, t) for n, t in zip(l_schema.names, l_schema.types)]
    l_names = [f.name for f in l_fields]
    r_value = (
        []
        if how in ("semi", "anti")
        else [
            pa.field(n, t)
            for n, t in zip(r_schema.names, r_schema.types)
            if n != right_key
        ]
    )
    rename = {
        f.name: (f.name + suffix if f.name in set(l_names) else f.name)
        for f in r_value
    }
    out_schema = pa.schema(
        l_fields + [pa.field(rename[f.name], f.type) for f in r_value]
    )
    kt = l_schema.types[l_schema.names.index(left_key)]
    rkt = r_schema.types[r_schema.names.index(right_key)]
    if kt != rkt:
        raise ValueError(f"key type mismatch: {kt} vs {rkt}")

    # combined carrier schema: key + left values + right values + markers
    carrier = pa.schema(
        [pa.field("_k", kt)]
        + l_fields
        + [pa.field("_rv_" + f.name, f.type) for f in r_value]
        + [pa.field("_side", pa.int8()), pa.field("part", pa.int32())]
    )

    def pad_left(t: pa.Table) -> pa.Table:
        import numpy as np

        base = hash_bucket_array(t[left_key], num_partitions)
        if salt > 1:
            slot = np.arange(t.num_rows, dtype=np.int64) % salt
            part = pa.array(
                (base.to_numpy().astype(np.int64) * salt + slot).astype(
                    "int32"
                ),
                pa.int32(),
            )
        else:
            part = base
        cols = [t[left_key]]
        cols += [t[n] for n in l_names]
        cols += [pa.nulls(t.num_rows, f.type) for f in r_value]
        cols += [pa.array([0] * t.num_rows, pa.int8()), part]
        return pa.Table.from_arrays(
            [c.cast(f.type) if hasattr(c, "cast") else c
             for c, f in zip(cols, carrier)],
            schema=carrier,
        )

    def pad_right(t: pa.Table) -> pa.Table:
        import numpy as np

        base = hash_bucket_array(t[right_key], num_partitions)
        if salt > 1:
            # replicate each right row into every slot of its partition
            n = t.num_rows
            rep = np.repeat(np.arange(n, dtype=np.int64), salt)
            t = t.take(pa.array(rep))
            slots = np.tile(np.arange(salt, dtype=np.int64), n)
            part = pa.array(
                (base.to_numpy().astype(np.int64)[rep] * salt
                 + slots).astype("int32"),
                pa.int32(),
            )
        else:
            part = base
        cols = [t[right_key]]
        cols += [pa.nulls(t.num_rows, f.type) for f in l_fields]
        cols += [t[f.name] for f in r_value]
        cols += [pa.array([1] * t.num_rows, pa.int8()), part]
        return pa.Table.from_arrays(
            [c.cast(f.type) if hasattr(c, "cast") else c
             for c, f in zip(cols, carrier)],
            schema=carrier,
        )

    tagged = left.map_batches(pad_left, batch_format="pyarrow").union(
        right.map_batches(pad_right, batch_format="pyarrow")
    )

    empty = pa.table({f.name: pa.nulls(0, f.type) for f in out_schema})

    def join_partition(t: pa.Table) -> pa.Table:
        side = t["_side"]
        lf = t.filter(pc.equal(side, 0))
        if lf.num_rows == 0 and how != "full":
            return empty
        rf = t.filter(pc.equal(side, 1))
        rkeys = rf["_k"].combine_chunks()
        idx = pc.index_in(lf["_k"], rkeys)
        if how in ("inner", "semi", "anti"):
            keep = pc.is_valid(idx)
            if how == "anti":
                keep = pc.invert(keep)
            lf = lf.filter(keep)
            idx = idx.filter(keep)
            if lf.num_rows == 0:
                return empty
        cols = [lf[n] for n in l_names]
        for f in r_value:
            cols.append(pc.take(rf["_rv_" + f.name], idx))
        out = pa.Table.from_arrays(cols, schema=out_schema)
        if how != "full" or rf.num_rows == 0:
            return out
        # full: append one row per right key with NO left match —
        # left columns null except left_key, which carries the key
        # (USING-style coalesced-key semantics)
        r_unmatched = pc.invert(
            pc.is_in(rkeys, value_set=lf["_k"].combine_chunks())
        )
        ro = rf.filter(r_unmatched)
        if ro.num_rows == 0:
            return out
        ro_cols = []
        for f in l_fields:
            if f.name == left_key:
                ro_cols.append(ro["_k"].cast(f.type))
            else:
                ro_cols.append(pa.nulls(ro.num_rows, f.type))
        for f in r_value:
            ro_cols.append(ro["_rv_" + f.name])
        return pa.concat_tables(
            [out, pa.Table.from_arrays(ro_cols, schema=out_schema)]
        )

    return tagged.groupby("part").map_groups(
        join_partition, batch_format="pyarrow"
    )


def broadcast_join_unique(left, right, *, left_key: str,
                          right_key: str | None = None, how: str = "inner",
                          suffix: str = "_r",
                          max_broadcast_rows: int = 2_000_000,
                          max_broadcast_bytes: int = 512 << 20,
                          num_partitions: int = 64):
    """Map-side equi-join against a SMALL unique-keyed right side.

    The right side is fetched once, shipped to the object store with
    ``ray.put`` (one zero-copy Arrow buffer, shared by every task —
    never re-serialized per batch), and probed inside ``map_batches``
    with one vectorized ``pc.index_in`` per batch.  The left side is
    NEVER shuffled — this is the join for dimension tables
    (nation/region/supplier-sized sides), saving a full sort-exchange
    of the fact table versus :func:`hash_join_unique`.

    Same semantics as :func:`hash_join_unique` (right unique per key;
    ``how`` ∈ inner/left/semi/anti; colliding right value columns get
    ``suffix``).  If the right side exceeds ``max_broadcast_rows`` OR
    ``max_broadcast_bytes`` (wide value columns can be multi-GB under
    the row guard alone) the call falls back to
    :func:`hash_join_unique` — the broadcast cliff is a deliberate,
    guarded decision, not a silent OOM.  This makes
    the operator a size-ADAPTIVE join: pass any right side whose size
    is data-dependent (a filtered dimension, a pre-aggregated table)
    and the plan picks map-side vs shuffle at run time.

    The right side is ``materialize()``d for the size probe (count +
    fetch must not execute its subtree twice); a right side KNOWN to
    be fact-table-sized should go straight to :func:`hash_join_unique`
    so it streams through the shuffle instead of pinning the object
    store.
    """
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(
            f"how must be 'inner', 'left', 'semi' or 'anti', got {how!r}"
        )
    right_key = right_key or left_key

    import ray

    # NOTE deliberately no left.schema() probe: on a lazy left whose
    # lineage contains an all-to-all (groupby/sort), schema inference
    # EXECUTES that whole subtree and throws the work away — a 3×
    # wall-clock trap when an expensive left feeds two chained joins
    # (measured: 46 s -> 15 s on the record-linkage pipeline).  Column
    # names are read from each batch inside `probe` instead.
    right = right.materialize()
    r_schema = right.schema()
    if r_schema is None:
        if how == "anti":
            return left
        if how in ("semi", "inner"):
            return left.limit(0)
        raise ValueError(
            "broadcast_join_unique(how='left'): right side has no schema"
        )

    n_right = right.count()
    # bound by BYTES as well as rows: a right side with wide value
    # columns (text payloads) can be multi-GB under the row guard, and
    # the pa.concat_tables below assembles it ON THE DRIVER —
    # size_bytes() on a materialized dataset is metadata-only (free)
    if n_right > max_broadcast_rows or right.size_bytes() > max_broadcast_bytes:
        return hash_join_unique(
            left, right, left_key=left_key, right_key=right_key, how=how,
            suffix=suffix, num_partitions=num_partitions,
        )

    r_tbl = pa.concat_tables(
        list(right.iter_batches(batch_format="pyarrow"))
        or [pa.table({n: pa.nulls(0, t)
                      for n, t in zip(r_schema.names, r_schema.types)})]
    ).combine_chunks()
    r_ref = ray.put(r_tbl)

    r_value = (
        []
        if how in ("semi", "anti")
        else [n for n in r_schema.names if n != right_key]
    )

    def probe(t: pa.Table) -> pa.Table:
        r = ray.get(r_ref)  # zero-copy plasma read, once per task
        rkeys = r[right_key].combine_chunks()
        idx = pc.index_in(t[left_key], rkeys)
        if how in ("inner", "semi", "anti"):
            keep = pc.is_valid(idx)
            if how == "anti":
                keep = pc.invert(keep)
            t = t.filter(keep)
            idx = idx.filter(keep)
        if how in ("semi", "anti"):
            return t
        l_names = list(t.column_names)
        rename = {
            n: (n + suffix if n in set(l_names) else n) for n in r_value
        }
        cols = [t[n] for n in l_names]
        names = list(l_names)
        for n in r_value:
            cols.append(pc.take(r[n], idx))
            names.append(rename[n])
        return pa.Table.from_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
             for c in cols],
            names=names,
        )

    return left.map_batches(probe, batch_format="pyarrow")
