"""Event-stream operators: tumbling windows + sessionization."""

from __future__ import annotations

import pandas as pd
import pytest

from obsidian_parser_ray.stages.events import hourly_counts, sessionize, type_stats


def _events_ds(rows):
    import ray.data as rd

    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"])
    return rd.from_pandas(df)


@pytest.mark.usefixtures("ray_session")
class TestWindows:
    def test_hourly_counts(self):
        ds = _events_ds(
            [
                {"user_id": 1, "ts": "2024-01-01 10:05:00"},
                {"user_id": 1, "ts": "2024-01-01 10:55:00"},
                {"user_id": 1, "ts": "2024-01-01 11:01:00"},
                {"user_id": 2, "ts": "2024-01-01 10:30:00"},
            ]
        )
        out = hourly_counts(ds).to_pandas()
        got = {
            (int(r.user_id), int(r.hour_epoch)): int(r.n_events)
            for r in out.itertuples()
        }
        h10 = pd.Timestamp("2024-01-01 10:00:00").value // 10**9 // 3600
        assert got == {(1, h10): 2, (1, h10 + 1): 1, (2, h10): 1}

    def test_tumbling_generalized(self):
        from obsidian_parser_ray.stages.events import tumbling_counts

        ds = _events_ds(
            [
                {"user_id": 1, "ts": "2024-01-01 10:05:00"},
                {"user_id": 1, "ts": "2024-01-01 10:09:30"},
                {"user_id": 1, "ts": "2024-01-01 10:12:00"},
            ]
        )
        out = tumbling_counts(ds, window_seconds=600).to_pandas()
        w = pd.Timestamp("2024-01-01 10:00:00").value // 10**9 // 600
        got = {
            (int(r.user_id), int(r.window_epoch)): int(r.n_events)
            for r in out.itertuples()
        }
        assert got == {(1, w): 2, (1, w + 1): 1}

    def test_sessionize_gap_semantics(self):
        ds = _events_ds(
            [
                {"user_id": 1, "ts": "2024-01-01 10:00:00"},
                {"user_id": 1, "ts": "2024-01-01 10:29:00"},  # within gap
                {"user_id": 1, "ts": "2024-01-01 11:30:00"},  # > 30 min → new
                {"user_id": 2, "ts": "2024-01-01 09:00:00"},
            ]
        )
        out = sessionize(ds, gap_minutes=30).to_pandas()
        u1 = out[out["user_id"] == 1].sort_values("session_idx")
        assert list(u1["session_idx"]) == [1, 2]
        assert list(u1["n_events"]) == [2, 1]
        s0 = pd.Timestamp("2024-01-01 10:00:00").value // 10**9
        assert int(u1.iloc[0]["start_s"]) == s0
        assert int(out[out["user_id"] == 2]["session_idx"].iloc[0]) == 1

    def test_sessionize_exact_boundary_not_a_break(self):
        ds = _events_ds(
            [
                {"user_id": 1, "ts": "2024-01-01 10:00:00"},
                {"user_id": 1, "ts": "2024-01-01 10:30:00"},  # exactly 30min → same
            ]
        )
        out = sessionize(ds, gap_minutes=30).to_pandas()
        assert len(out) == 1 and int(out["n_events"].iloc[0]) == 2

    def test_type_stats(self):
        ds = _events_ds(
            [
                {"user_id": 1, "ts": "2024-01-01", "event_type": "a", "value": 1.5},
                {"user_id": 1, "ts": "2024-01-01", "event_type": "a", "value": 2.5},
                {"user_id": 1, "ts": "2024-01-01", "event_type": "b", "value": -1.0},
            ]
        )
        out = type_stats(ds).to_pandas().set_index("event_type")
        assert int(out.loc["a", "n_events"]) == 2
        assert out.loc["a", "min_value"] == 1.5
        assert out.loc["a", "max_value"] == 2.5
        assert out.loc["b", "min_value"] == -1.0


class TestStringUserIds:
    def test_sessionize_string_keys(self, ray_session):
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.stages.events import sessionize

        ts = pd.to_datetime(
            ["2026-01-01 00:00", "2026-01-01 00:10", "2026-01-01 02:00",
             "2026-01-01 00:05"]
        )
        ds = rd.from_arrow(
            pa.table(
                {
                    "user_id": pa.array(["alice", "alice", "alice", "bob"]),
                    "ts": pa.array(ts),
                }
            )
        )
        rows = {(r["user_id"], r["session_idx"]): r["n_events"]
                for r in sessionize(ds).take_all()}
        assert rows == {("alice", 1): 2, ("alice", 2): 1, ("bob", 1): 1}
