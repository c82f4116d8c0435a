"""Pipeline observability: partition-skew and block-shape diagnostics.

At 100 TB the difference between a smooth run and a stuck one is
usually ONE hot key or one bloated block; these helpers answer "what
would the shuffle see?" BEFORE paying for it — the operational
counterpart of ``resolution_stats`` (link metrics) and the checkpoint
manifests (per-partition rows/bytes).

Everything here is a streaming aggregate: per-block partials, tiny
merges, driver output bounded by the partition/heavy-hitter count —
never O(rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import hash_bucket_array


def partition_skew(ds, key_col: str, *, num_partitions: int = 64):
    """Row count per hash partition — exactly the histogram a
    ``groupby(hash(key) % num_partitions)`` shuffle would produce.
    Output: ``(part, n_rows)``, one row per non-empty partition."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        parts = hash_bucket_array(keys, num_partitions).to_numpy()
        counts = np.bincount(parts, minlength=num_partitions)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "part": pa.array(nz.astype(np.int32), pa.int32()),
                "_n": pa.array(counts[nz].astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .aggregate(Sum("_n", alias_name="n_rows"))
    )


def skew_report(ds, key_col: str, *, num_partitions: int = 64,
                heavy_k: int = 10) -> dict:
    """Driver-side skew summary: partition-count stats + the
    Misra–Gries heavy-hitter candidates for the key.

    Returns ``{n_rows, n_parts, max_rows, mean_rows, skew_ratio,
    heavy_hitters: [(key, lower_bound_count), ...]}`` —
    ``skew_ratio = max/mean`` is the straggler multiplier a shuffle on
    this key would suffer; the heavy hitters name the culprits (lower
    bounds, standard MG semantics via ``stages.sketch``)."""
    from .sketch import frequent_items

    parts = partition_skew(
        ds, key_col, num_partitions=num_partitions
    ).take_all()
    counts = np.asarray([r["n_rows"] for r in parts], dtype=np.int64)
    total = int(counts.sum()) if len(counts) else 0
    mean = float(counts.mean()) if len(counts) else 0.0
    mx = int(counts.max()) if len(counts) else 0
    hh = frequent_items(ds, key_col, k=max(heavy_k * 4, 16))
    top = sorted(hh.items(), key=lambda kv: -kv[1])[:heavy_k]
    return {
        "n_rows": total,
        "n_parts": int(len(counts)),
        "max_rows": mx,
        "mean_rows": mean,
        "skew_ratio": (mx / mean) if mean else 0.0,
        "heavy_hitters": [(k, int(v)) for k, v in top],
    }


def block_shape(ds) -> dict:
    """Block-size histogram of a Dataset AS EXECUTED: per-block
    (rows, bytes) partials → driver summary.  The go-to probe when a
    stage OOMs or starves (block too big / too many tiny blocks)."""
    def partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "rows": pa.array([t.num_rows], pa.int64()),
                "bytes": pa.array([t.nbytes], pa.int64()),
            }
        )

    rows = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).take_all()
    r = np.asarray([x["rows"] for x in rows], dtype=np.int64)
    b = np.asarray([x["bytes"] for x in rows], dtype=np.int64)
    if not len(r):
        return {"n_blocks": 0, "rows_total": 0, "bytes_total": 0}
    return {
        "n_blocks": int(len(r)),
        "rows_total": int(r.sum()),
        "bytes_total": int(b.sum()),
        "rows_max": int(r.max()),
        "bytes_max": int(b.max()),
        "rows_p50": float(np.median(r)),
        "bytes_p50": float(np.median(b)),
    }


def profile_table(ds, *, hll_p: int = 12):
    """One-pass column profile of ANY table: per column
    ``{n_rows, n_nulls, approx_distinct, min, max}``.

    The data-quality sweep every ingestion job runs first.  One
    streaming pass computes per-block partials — null counts, exact
    min/max, HyperLogLog registers for distincts — merged on the
    driver (blocks × columns tiny rows; register blobs merge by max).
    Numeric/temporal/bool columns merge min/max numerically (temporals
    as epoch int64), strings lexicographically, other types report
    None; distincts are HLL estimates (±~1.6% at p=12) — pair with an
    exact groupby when a column's exact cardinality matters.
    """
    import pyarrow.compute as pc

    from .sketch import HllSketch, _hash64_bytes

    names = list(ds.schema().names)

    def _minmax(c: pa.Array):
        t = c.type
        try:
            if (pa.types.is_integer(t) or pa.types.is_floating(t)
                    or pa.types.is_boolean(t)):
                return float(pc.min(c).as_py()), float(pc.max(c).as_py()), \
                    None, None
            if pa.types.is_temporal(t):
                ci = c.cast(pa.int64())
                return (float(pc.min(ci).as_py()),
                        float(pc.max(ci).as_py()), None, None)
            if pa.types.is_string(t) or pa.types.is_large_string(t):
                return None, None, pc.min(c).as_py(), pc.max(c).as_py()
        except (pa.ArrowNotImplementedError, TypeError):
            pass
        return None, None, None, None

    def partial(t: pa.Table) -> pa.Table:
        cols, rows_, nulls = [], [], []
        mn_num, mx_num, mn_str, mx_str, regs = [], [], [], [], []
        for name in names:
            c = t[name]
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            cols.append(name)
            rows_.append(t.num_rows)
            vals = c.drop_null()
            nulls.append(t.num_rows - len(vals))
            if len(vals):
                a, b, x, y = _minmax(vals)
            else:
                a = b = x = y = None
            mn_num.append(a)
            mx_num.append(b)
            mn_str.append(x)
            mx_str.append(y)
            hll = HllSketch(hll_p)
            if len(vals):
                try:
                    hll.add_hashes(_hash64_bytes(vals.to_pylist()))
                except TypeError:
                    hll.add_hashes(
                        _hash64_bytes([str(v) for v in vals.to_pylist()])
                    )
            regs.append(hll.registers.tobytes())
        return pa.table(
            {
                "column": pa.array(cols, pa.string()),
                "n_rows": pa.array(rows_, pa.int64()),
                "n_nulls": pa.array(nulls, pa.int64()),
                "min_num": pa.array(mn_num, pa.float64()),
                "max_num": pa.array(mx_num, pa.float64()),
                "min_str": pa.array(mn_str, pa.string()),
                "max_str": pa.array(mx_str, pa.string()),
                "regs": pa.array(regs, pa.binary()),
            }
        )

    # seed from the schema so columns of an empty/blockless dataset
    # still appear in the profile
    acc: dict = {
        name: {"rows": 0, "nulls": 0, "min": None, "max": None,
               "hll": HllSketch(hll_p)}
        for name in names
    }
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for i in range(b.num_rows):
            name = b["column"][i].as_py()
            st = acc.setdefault(
                name,
                {"rows": 0, "nulls": 0, "min": None, "max": None,
                 "hll": HllSketch(hll_p)},
            )
            st["rows"] += b["n_rows"][i].as_py()
            st["nulls"] += b["n_nulls"][i].as_py()
            for lo_col, hi_col in (("min_num", "max_num"),
                                   ("min_str", "max_str")):
                lo = b[lo_col][i].as_py()
                hi = b[hi_col][i].as_py()
                if lo is not None and (st["min"] is None or lo < st["min"]):
                    st["min"] = lo
                if hi is not None and (st["max"] is None or hi > st["max"]):
                    st["max"] = hi
            other = HllSketch(
                hll_p,
                np.frombuffer(b["regs"][i].as_py(), dtype=np.uint8).copy(),
            )
            st["hll"] = st["hll"].merge(other)
    return {
        name: {
            "n_rows": st["rows"],
            "n_nulls": st["nulls"],
            "approx_distinct": int(round(st["hll"].estimate())),
            "min": st["min"],
            "max": st["max"],
        }
        for name, st in acc.items()
    }


# ---------------------------------------------------------------------------
# Per-group standardization (exact integer moments → deterministic z)
# ---------------------------------------------------------------------------


def group_zscores(ds, *, value_col: str, group_col: str,
                  out_col: str = "z"):
    """Per-group z-score standardization of an INTEGER column —
    feature normalization with bit-reproducible doubles.

    A distributed double mean/std is order-dependent; instead the
    per-group moments are exact int64 sums (Σx, Σx², n — associative
    under any block order), merged in one bounded task, and the only
    floating-point steps are the final per-group divisions and ONE
    ``sqrt`` (IEEE-754 requires sqrt correctly rounded, so it is as
    deterministic as + and ×).  The per-row map then computes
    ``(x - mean) / std`` with a fixed expression shape — a SQL twin
    spelled identically hashes identically.  Population std; groups
    with zero variance emit null.

    Output: input columns + ``out_col`` (float64).
    (Σx² of int64 values: safe while n·max(x)² < 2⁶³ — doc lengths,
    token counts; at larger magnitudes move the moments to
    decimal128.)
    """
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        v = pc.cast(t[value_col], pa.int64())
        flat = pa.table({
            group_col: t[group_col],
            "s1": v,
            "s2": pc.multiply(v, v),
            "n": pa.array([1] * t.num_rows, pa.int64()),
        })
        g = flat.group_by(group_col).aggregate(
            [("s1", "sum"), ("s2", "sum"), ("n", "sum")]
        )
        return g.rename_columns([
            c[:-4] if c.endswith("_sum") else c for c in g.column_names
        ])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(group_col).aggregate(
            [("s1", "sum"), ("s2", "sum"), ("n", "sum")]
        )
        return g.rename_columns([
            c[:-4] if c.endswith("_sum") else c for c in g.column_names
        ])

    moments = (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1, shuffle=False)
        .map_batches(merge, batch_format="pyarrow")
        .take_all()
    )
    # bounded group cardinality → broadcast the scalar pairs
    stats = {}
    for r in moments:
        n = float(r["n"])
        mean = float(r["s1"]) / n
        var = (float(r["s2"]) / n) - (mean * mean)
        stats[r[group_col]] = (mean, var ** 0.5 if var > 0 else None)

    groups = list(stats)
    mean_arr = pa.array([stats[g][0] for g in groups], pa.float64())
    std_arr = pa.array([stats[g][1] for g in groups], pa.float64())
    group_arr = pa.array(groups)

    def z(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t[group_col], value_set=group_arr)
        mean = pc.take(mean_arr, idx)
        std = pc.take(std_arr, idx)
        zv = pc.divide(
            pc.subtract(pc.cast(t[value_col], pa.float64()), mean), std
        )
        return t.append_column(out_col, zv)

    return ds.map_batches(z, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Keyed table diff (snapshot reconciliation)
# ---------------------------------------------------------------------------


def table_diff(old, new, *, key_col: str, compare_cols: list[str],
               num_partitions: int = 64):
    """Row-level diff of two snapshots of the same keyed table:
    which keys were ``added``, ``removed``, or ``changed`` (any
    compared column differs).  The reconciliation primitive for
    incremental pipelines — audit a delta before applying it.

    Both sides are hash co-partitioned on the key (one exchange
    each, the same union-tag shuffle the joins use); each partition
    resolves its keys independently with vectorized Arrow kernels.
    Unchanged rows are dropped partition-side, so the output is
    O(delta), not O(table).

    Output: (key_col, change) with change ∈ {'added','removed',
    'changed'}.
    """
    import pyarrow.compute as pc

    from ..hashing import hash_bucket_array

    cols = [key_col] + list(compare_cols)

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            t = t.select(cols)
            return t.append_column(
                "_side", pa.array([side] * t.num_rows, pa.int8())
            ).append_column(
                "part", hash_bucket_array(t[key_col], num_partitions)
            )
        return fn

    tagged = old.map_batches(tag(0), batch_format="pyarrow").union(
        new.map_batches(tag(1), batch_format="pyarrow")
    )

    def resolve(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_old = pc.equal(t["_side"], 0)
        o = t.filter(is_old)
        n = t.filter(pc.invert(is_old))
        o_keys, n_keys = o[key_col], n[key_col]
        in_old = pc.is_in(n_keys, value_set=pc.unique(
            o_keys.combine_chunks() if isinstance(o_keys, pa.ChunkedArray)
            else o_keys))
        in_new = pc.is_in(o_keys, value_set=pc.unique(
            n_keys.combine_chunks() if isinstance(n_keys, pa.ChunkedArray)
            else n_keys))
        added = n_keys.filter(pc.invert(in_old))
        removed = o_keys.filter(pc.invert(in_new))
        # changed: keys in both with any differing compare column —
        # vectorized via a probe of old rows by new keys
        o_pos = pc.index_in(n_keys, value_set=(
            o_keys.combine_chunks() if isinstance(o_keys, pa.ChunkedArray)
            else o_keys))
        both_mask = pc.is_valid(o_pos)
        n_both = n.filter(both_mask)
        o_aligned = o.take(o_pos.filter(both_mask))
        diff = None
        for c in compare_cols:
            d = pc.invert(pc.equal(n_both[c], o_aligned[c]))
            # treat null-vs-null as equal, null-vs-value as changed
            d = pc.fill_null(d, True)
            nn = pc.and_(pc.is_null(n_both[c]), pc.is_null(o_aligned[c]))
            d = pc.and_(d, pc.invert(nn))
            diff = d if diff is None else pc.or_(diff, d)
        changed = n_both[key_col].filter(diff) if diff is not None else \
            pa.array([], n_both[key_col].type)
        key_type = t.schema.field(key_col).type

        def block(keys, label):
            arr = keys.combine_chunks() if isinstance(
                keys, pa.ChunkedArray) else keys
            return pa.table({
                key_col: pc.cast(arr, key_type),
                "change": pa.array([label] * len(arr), pa.string()),
            })

        return pa.concat_tables([
            block(added, "added"),
            block(removed, "removed"),
            block(changed, "changed"),
        ])

    return tagged.groupby("part").map_groups(
        resolve, batch_format="pyarrow"
    )


def grouped_int_quantile(ds, *, value_col: str, group_col: str,
                         q: float = 0.5) -> dict:
    """EXACT per-group discrete quantile of an integer column —
    grouped twin of ``sketch.exact_int_quantiles`` (same DuckDB
    ``quantile_disc`` semantics: smallest value whose cumulative count
    reaches ``ceil(q * n)``, same double multiply before the ceil).

    Affordable whenever |groups| × |distinct values| is bounded
    (lengths per language, sizes per source): every block folds to a
    (group, value, count) histogram partial, one tiny task merges them
    — the exchange is O(groups × distinct), never O(rows).

    Returns ``{group: quantile}``.
    """
    import math

    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        flat = pa.table({
            group_col: t[group_col],
            value_col: pc.cast(t[value_col], pa.int64()),
        })
        g = flat.group_by([group_col, value_col]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns([
            "n" if c == "count_all" else c for c in g.column_names
        ])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by([group_col, value_col]).aggregate([("n", "sum")])
        return g.rename_columns([
            "n" if c == "n_sum" else c for c in g.column_names
        ])

    hist = (
        ds.select_columns([group_col, value_col])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1, shuffle=False)
        .map_batches(merge, batch_format="pyarrow")
        .take_all()
    )
    by_group: dict = {}
    for r in hist:
        by_group.setdefault(r[group_col], []).append(
            (r[value_col], r["n"])
        )
    out = {}
    for grp, pairs in by_group.items():
        pairs.sort()
        counts = np.cumsum([n for _, n in pairs])
        rank = math.ceil(q * int(counts[-1]))
        idx = int(np.searchsorted(counts, max(rank, 1), side="left"))
        out[grp] = int(pairs[idx][0])
    return out


def group_mad_outliers(ds, *, value_col: str, group_col: str,
                       z: int = 3):
    """Robust per-group outlier flags via the median absolute
    deviation: a row is an outlier when
    ``|x - median(group)| > z * MAD(group)``.

    Everything is exact integer arithmetic (discrete-quantile medians
    via the grouped histogram reduction above, absolute deviations,
    one integer multiply) — no doubles anywhere, so the flags are
    bit-reproducible under any block order and match the SQL twin
    row-for-row.  Three column-pruned passes over the input (median
    histogram, deviation histogram, final flag map); each exchange is
    O(groups × distinct values).

    Output: input columns + ``dev`` (int64) + ``is_outlier`` (bool).
    """
    import pyarrow.compute as pc

    med = grouped_int_quantile(
        ds, value_col=value_col, group_col=group_col, q=0.5
    )
    med_keys = pa.array(list(med.keys()))
    med_vals = pa.array([med[k] for k in med.keys()], pa.int64())

    def add_dev(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t[group_col], value_set=med_keys)
        m = pc.take(med_vals, idx)
        dev = pc.abs(pc.subtract(pc.cast(t[value_col], pa.int64()), m))
        return t.append_column("dev", dev)

    devs = ds.map_batches(add_dev, batch_format="pyarrow")
    mad = grouped_int_quantile(
        devs, value_col="dev", group_col=group_col, q=0.5
    )
    mad_vals = pa.array([mad[k] for k in med.keys()], pa.int64())

    def flag(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t[group_col], value_set=med_keys)
        thresh = pc.multiply(
            pc.take(mad_vals, idx), pa.scalar(z, pa.int64())
        )
        return t.append_column(
            "is_outlier", pc.greater(t["dev"], thresh)
        )

    return devs.map_batches(flag, batch_format="pyarrow")


def grouped_pearson(ds, *, x_col: str, y_col: str, group_col: str):
    """Per-group Pearson correlation of two integer columns via EXACT
    int64 moments (n, Σx, Σy, Σxy, Σx², Σy²) — associative under any
    block order, so the distributed sums are bit-reproducible; the
    only doubles are the final arithmetic, spelled with the same
    expression shape as the SQL twin (two correctly-rounded sqrts).

    int64 holds the moments to ~9.2e18: at Σx² ≈ n·x², that is
    n ≈ 1e12 rows of 3-digit values — beyond that a deployment moves
    the moments to decimal128; the pipeline shape is unchanged.

    Output: (group_col, n, corr [float64; null when either variance
    is zero]).
    """
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        x = pc.cast(t[x_col], pa.int64())
        y = pc.cast(t[y_col], pa.int64())
        flat = pa.table({
            group_col: t[group_col],
            "n": pa.array(np.ones(t.num_rows, np.int64)),
            "sx": x,
            "sy": y,
            "sxy": pc.multiply(x, y),
            "sxx": pc.multiply(x, x),
            "syy": pc.multiply(y, y),
        })
        g = flat.group_by(group_col).aggregate(
            [(c, "sum") for c in ["n", "sx", "sy", "sxy", "sxx", "syy"]]
        )
        return g.rename_columns([
            c[:-4] if c.endswith("_sum") else c for c in g.column_names
        ])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(group_col).aggregate(
            [(c, "sum") for c in ["n", "sx", "sy", "sxy", "sxx", "syy"]]
        )
        g = g.rename_columns([
            c[:-4] if c.endswith("_sum") else c for c in g.column_names
        ])
        n = g["n"].to_numpy()
        sx, sy = g["sx"].to_numpy(), g["sy"].to_numpy()
        sxy = g["sxy"].to_numpy()
        sxx, syy = g["sxx"].to_numpy(), g["syy"].to_numpy()
        # exact int64 numerators, then ONE double division / two sqrts
        cov_n = (n * sxy - sx * sy).astype(np.float64)
        vx_n = (n * sxx - sx * sx).astype(np.float64)
        vy_n = (n * syy - sy * sy).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            corr = cov_n / (np.sqrt(vx_n) * np.sqrt(vy_n))
        valid = (vx_n > 0) & (vy_n > 0)
        return pa.table({
            group_col: g[group_col],
            "n": g["n"],
            "corr": pa.array(
                np.where(valid, corr, np.nan), pa.float64(),
                mask=~valid,
            ),
        })

    return (
        ds.select_columns([group_col, x_col, y_col])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1, shuffle=False)
        .map_batches(merge, batch_format="pyarrow")
    )
