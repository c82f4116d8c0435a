"""Skew/observability diagnostics (stages/diagnostics.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


@pytest.mark.usefixtures("ray_session")
class TestDiagnostics:
    def test_partition_skew_counts_exact(self):
        from obsidian_parser_ray.hashing import hash_bucket_scalar
        from obsidian_parser_ray.stages.diagnostics import partition_skew

        keys = [f"k{i % 7}" for i in range(210)]
        ds = rd.from_arrow(pa.table({"k": pa.array(keys)})).repartition(5)
        got = {r["part"]: r["n_rows"]
               for r in partition_skew(ds, "k", num_partitions=8).take_all()}
        want: dict = {}
        for k in keys:
            p = hash_bucket_scalar(k, 8)
            want[p] = want.get(p, 0) + 1
        assert got == want
        assert sum(got.values()) == 210

    def test_skew_report_flags_hot_key(self):
        from obsidian_parser_ray.stages.diagnostics import skew_report

        rng = np.random.default_rng(0)
        keys = ["hot"] * 5000 + [f"c{i}" for i in rng.integers(0, 400, 500)]
        ds = rd.from_arrow(pa.table({"k": pa.array(keys)})).repartition(6)
        rep = skew_report(ds, "k", num_partitions=16, heavy_k=3)
        assert rep["n_rows"] == len(keys)
        assert rep["skew_ratio"] > 3.0  # the hot partition dominates
        assert rep["heavy_hitters"][0][0] == "hot"
        # MG lower bound: reported count <= true count
        assert rep["heavy_hitters"][0][1] <= 5000

    def test_block_shape(self):
        from obsidian_parser_ray.stages.diagnostics import block_shape

        ds = rd.from_arrow(
            pa.table({"x": pa.array(list(range(1000)), pa.int64())})
        ).repartition(4)
        rep = block_shape(ds)
        assert rep["rows_total"] == 1000
        assert rep["n_blocks"] >= 4
        assert rep["bytes_total"] > 0

    def test_empty_dataset(self):
        from obsidian_parser_ray.stages.diagnostics import (
            block_shape,
            partition_skew,
        )

        ds = rd.from_arrow(pa.table({"k": pa.array([], pa.string())}))
        assert partition_skew(ds, "k").take_all() == []
        rep = block_shape(ds)
        assert rep["rows_total"] == 0
