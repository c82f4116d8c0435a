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
