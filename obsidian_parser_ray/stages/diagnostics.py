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
