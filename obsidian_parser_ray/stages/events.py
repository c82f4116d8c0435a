"""Event-stream operators: tumbling-window aggregates + sessionization.

Ray Data is a batch engine (no watermarks); stream-shaped semantics are
expressed per the standard pattern: treat the events table as a
partitioned log — partition by key (``groupby(user_id)``), order by
``ts`` within the partition (sort inside ``map_groups``) — and compute
windows over the sorted group.  Ordering assumption: per-key processing
sees ALL events of that key (the groupby guarantees co-location);
cross-key order is irrelevant.

Timestamps are compared as integer epoch seconds/hours (floor), which
DuckDB reproduces exactly (``epoch_us(ts)//1_000_000``) — no float
time arithmetic anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _epoch_seconds(ts: pd.Series) -> pd.Series:
    return pd.Series(
        ts.to_numpy().astype("datetime64[ns]").astype(np.int64) // 1_000_000_000,
        index=ts.index,
    )


def tumbling_counts(events, *, key_col: str = "user_id", ts_col: str = "ts",
                    window_seconds: int = 3600,
                    window_col: str = "window_epoch"):
    """Tumbling fixed-width window counts per key:
    ``(key, window_epoch, n_events)`` with
    ``window_epoch = epoch_seconds // window_seconds`` (floor — exact
    integer window ids, reproducible in SQL).

    Partial per-batch combine → small global groupby (shuffle carries
    one row per (key, window) per block).
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = t.select([key_col, ts_col]).to_pandas()
        df[window_col] = _epoch_seconds(df[ts_col]) // window_seconds
        g = (
            df.groupby([key_col, window_col], as_index=False)
            .size()
            .rename(columns={"size": "_n"})
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, window_col])
        .aggregate(Sum("_n", alias_name="n_events"))
    )


def hourly_counts(events, *, key_col: str = "user_id", ts_col: str = "ts"):
    """Tumbling 1-hour window counts per key: (key, hour_epoch,
    n_events) — the 3600 s special case of :func:`tumbling_counts`."""
    return tumbling_counts(
        events, key_col=key_col, ts_col=ts_col,
        window_seconds=3600, window_col="hour_epoch",
    )


def type_stats(events, *, type_col: str = "event_type", value_col: str = "value"):
    """Per-type count/min/max (exact — no float summation in compared
    output)."""
    from ray.data.aggregate import Count, Max, Min

    return events.groupby(type_col).aggregate(
        Count(alias_name="n_events"),
        Min(value_col, alias_name="min_value"),
        Max(value_col, alias_name="max_value"),
    )


def sessionize(events, *, key_col: str = "user_id", ts_col: str = "ts",
               gap_minutes: int = 30, num_partitions: int = 64):
    """Session windows: a new session starts after a gap > gap_minutes.

    Output: (key, session_idx [1-based per key in ts order], n_events,
    start_s, end_s) — all integers, reproducible by a DuckDB window
    query.  Each hash partition is processed with ONE vectorized sweep:
    sort by (key, ts), diff/cumsum the break flags across the whole
    partition frame, then a single C-speed groupby-agg — no per-key
    Python loop.
    """
    gap_s = gap_minutes * 60

    def add_part(t: pa.Table) -> pa.Table:
        # bounded shuffle key (shared deterministic hash — works for
        # int AND string keys): one Ray task per partition
        from ..hashing import hash_bucket_array

        return t.append_column(
            "part", hash_bucket_array(t[key_col], num_partitions)
        )

    empty = pd.DataFrame(
        {
            key_col: pd.Series([], dtype="object"),
            "session_idx": pd.Series([], dtype="int64"),
            "n_events": pd.Series([], dtype="int64"),
            "start_s": pd.Series([], dtype="int64"),
            "end_s": pd.Series([], dtype="int64"),
        }
    )

    def sessions_partition(p: pd.DataFrame) -> pd.DataFrame:
        if not len(p):
            e = empty.copy()
            e[key_col] = e[key_col].astype(p[key_col].dtype)
            return e
        p = p.sort_values([key_col, ts_col], kind="stable")
        keys = p[key_col].to_numpy()
        secs = _epoch_seconds(p[ts_col]).to_numpy()
        n = len(p)
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = keys[1:] != keys[:-1]
        brk = new_key.copy()
        brk[1:] |= secs[1:] - secs[:-1] > gap_s
        # global session counter, then rebased 1-per-key: the counter
        # value at each key's first row is carried forward by a
        # running max (counter is nondecreasing)
        sg = np.cumsum(brk.astype(np.int64))
        key_first = np.maximum.accumulate(np.where(new_key, sg, 0))
        sidx = sg - key_first + 1
        out = pd.DataFrame(
            {key_col: keys, "_sg": sg, "session_idx": sidx, "_s": secs}
        )
        g = out.groupby("_sg", as_index=False, sort=False).agg(
            **{
                key_col: (key_col, "first"),
                "session_idx": ("session_idx", "first"),
                "n_events": ("_s", "size"),
                "start_s": ("_s", "min"),
                "end_s": ("_s", "max"),
            }
        )
        return g[
            [key_col, "session_idx", "n_events", "start_s", "end_s"]
        ].astype(
            {
                "session_idx": "int64",
                "n_events": "int64",
                "start_s": "int64",
                "end_s": "int64",
            }
        )

    return (
        events.select_columns([key_col, ts_col])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(sessions_partition, batch_format="pandas")
    )


def value_histogram(events, *, type_col: str = "event_type",
                    value_col: str = "value", bin_width: float = 1.0):
    """Fixed-width value histogram per event type (exact integer bins →
    oracle-checkable).  Partial per-block combine before the shuffle."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = t.select([type_col, value_col]).to_pandas()
        df["bin"] = np.floor(df[value_col] / bin_width).astype(np.int64)
        g = (
            df.groupby([type_col, "bin"], as_index=False)
            .size()
            .rename(columns={"size": "_n"})
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby([type_col, "bin"])
        .aggregate(Sum("_n", alias_name="n_events"))
    )
