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


def hourly_counts(events, *, key_col: str = "user_id", ts_col: str = "ts"):
    """Tumbling 1-hour window counts per key: (key, hour_epoch, n_events).

    Partial per-batch combine → small global groupby (shuffle carries
    one row per (key, hour) per block).
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = t.select([key_col, ts_col]).to_pandas()
        df["hour_epoch"] = _epoch_seconds(df[ts_col]) // 3600
        g = (
            df.groupby([key_col, "hour_epoch"], as_index=False)
            .size()
            .rename(columns={"size": "_n"})
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "hour_epoch"])
        .aggregate(Sum("_n", alias_name="n_events"))
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
               gap_minutes: int = 30):
    """Session windows: a new session starts after a gap > gap_minutes.

    Output: (key, session_idx [1-based per key in ts order], n_events,
    start_s, end_s) — all integers, reproducible by a DuckDB window
    query.  Per-key state lives inside ``map_groups`` over the sorted
    group (the reference pattern for session semantics in a batch
    engine).
    """
    gap_s = gap_minutes * 60

    def add_part(t: pa.Table) -> pa.Table:
        # bounded shuffle key (shared deterministic hash — works for
        # int AND string keys): one Ray task per partition, per-key
        # session logic runs in a pandas groupby inside the task
        from ..hashing import hash_bucket_array

        return t.append_column("part", hash_bucket_array(t[key_col], 64))

    def sessions_partition(p: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, g in p.groupby(key_col, sort=False):
            g = g.sort_values(ts_col, kind="stable")
            secs = _epoch_seconds(g[ts_col]).to_numpy()
            brk = np.ones(len(g), dtype=np.int64)
            if len(g) > 1:
                brk[1:] = (secs[1:] - secs[:-1] > gap_s).astype(np.int64)
            sess = brk.cumsum()
            out = pd.DataFrame(
                {key_col: g[key_col].to_numpy(), "session_idx": sess, "_s": secs}
            )
            frames.append(
                out.groupby([key_col, "session_idx"], as_index=False).agg(
                    n_events=("_s", "size"), start_s=("_s", "min"), end_s=("_s", "max")
                )
            )
        if not frames:
            return pd.DataFrame(
                {
                    key_col: pd.Series([], dtype=p[key_col].dtype),
                    "session_idx": pd.Series([], dtype="int64"),
                    "n_events": pd.Series([], dtype="int64"),
                    "start_s": pd.Series([], dtype="int64"),
                    "end_s": pd.Series([], dtype="int64"),
                }
            )
        return pd.concat(frames, ignore_index=True).astype(
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
