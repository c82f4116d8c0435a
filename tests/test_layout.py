"""Z-order clustered layout: Morton kernel, pruning, exactness."""

import numpy as np
import pyarrow as pa
import pytest


def _corpus(n=8000, seed=0):
    rng = np.random.RandomState(seed)
    return (
        np.arange(n),
        rng.randint(0, 1000, n),
        rng.randint(0, 1000, n),
    )


class TestMortonKernel:
    def test_matches_scalar_interleave(self):
        from obsidian_parser_ray.stages.layout import morton_codes

        rng = np.random.RandomState(1)
        a = rng.randint(0, 1 << 10, 200).astype(np.uint64)
        b = rng.randint(0, 1 << 10, 200).astype(np.uint64)
        z = morton_codes([a, b], 10)
        for i in range(200):
            exp = 0
            for j in range(10):
                exp |= ((int(a[i]) >> j) & 1) << (2 * j)
                exp |= ((int(b[i]) >> j) & 1) << (2 * j + 1)
            assert int(z[i]) == exp

    def test_rejects_overflow(self):
        from obsidian_parser_ray.stages.layout import morton_codes

        with pytest.raises(ValueError):
            morton_codes([np.zeros(1, np.uint64)] * 4, 16)


class TestZorderLayout:
    def _build(self, tmp_path, ray_session, bits=10, num_files=64):
        import ray.data as rd

        from obsidian_parser_ray.stages.layout import write_zorder

        rid, x, y = _corpus()
        ds = rd.from_arrow(
            pa.table({"rid": rid, "x": x, "y": y})
        ).repartition(8)
        out = str(tmp_path / "zl")
        manifest = write_zorder(ds, out, ["x", "y"], bits=bits,
                                num_files=num_files)
        return out, manifest, (rid, x, y)

    def test_box_exact_and_pruned(self, tmp_path, ray_session):
        from obsidian_parser_ray.stages.layout import (
            read_zorder,
            zorder_plan,
        )

        out, manifest, (rid, x, y) = self._build(tmp_path, ray_session)
        assert sum(p["rows"] for p in manifest["partitions"].values()) == len(
            rid
        )
        ranges = {"x": (100, 199), "y": (300, 399)}
        sel, total = zorder_plan(out, ranges)
        # a ~1% box on a z-ordered 64-partition layout touches a
        # handful of files; the claim under test is >50% pruned
        assert len(sel) < total / 2
        got = sorted(
            read_zorder(out, ranges).to_pandas()["rid"].tolist()
        )
        mask = (x >= 100) & (x <= 199) & (y >= 300) & (y <= 399)
        assert got == sorted(rid[mask].tolist())

    def test_open_bounds_and_empty_box(self, tmp_path, ray_session):
        from obsidian_parser_ray.stages.layout import read_zorder

        out, _, (rid, x, y) = self._build(tmp_path, ray_session)
        assert read_zorder(out, {"x": (None, None)}).count() == len(rid)
        half = read_zorder(out, {"y": (500, None)}).count()
        assert half == int((y >= 500).sum())
        empty = read_zorder(out, {"x": (5000, 6000)})
        assert empty.count() == 0
        assert "rid" in empty.schema().names

    def test_column_projection_and_unknown_range_col(
        self, tmp_path, ray_session
    ):
        from obsidian_parser_ray.stages.layout import (
            read_zorder,
            zorder_plan,
        )

        out, _, _ = self._build(tmp_path, ray_session)
        ds = read_zorder(out, {"x": (0, 10)}, columns=["rid"])
        assert ds.schema().names == ["rid"]
        with pytest.raises(ValueError):
            zorder_plan(out, {"nope": (0, 1)})

    def test_rebuild_replaces_atomically(self, tmp_path, ray_session):
        import ray.data as rd

        from obsidian_parser_ray.stages.layout import (
            read_zorder,
            write_zorder,
        )

        out, _, _ = self._build(tmp_path, ray_session)
        small = rd.from_arrow(
            pa.table({"rid": [1, 2], "x": [5, 6], "y": [7, 8]})
        )
        write_zorder(small, out, ["x", "y"], bits=4, num_files=4)
        assert read_zorder(out, {"x": (None, None)}).count() == 2


class TestStatsColsAndClusteringContrast:
    def test_zorder_prunes_where_stats_only_cannot(
        self, tmp_path, ray_session
    ):
        """The data-skipping claim itself: a y-range query prunes on
        the z-ordered (x, y) layout but selects ~every partition on an
        x-clustered layout that merely RECORDS y stats (y values
        scatter, so every partition's y range is wide)."""
        import ray.data as rd

        from obsidian_parser_ray.stages.layout import (
            read_zorder,
            write_zorder,
            zorder_plan,
        )

        rid, x, y = _corpus()
        ds = rd.from_arrow(
            pa.table({"rid": rid, "x": x, "y": y})
        ).repartition(8)
        z2 = str(tmp_path / "z2")
        z1 = str(tmp_path / "z1")
        write_zorder(ds, z2, ["x", "y"], bits=10, num_files=64)
        write_zorder(ds, z1, ["x"], bits=10, num_files=64,
                     stats_cols=["y"])
        ranges = {"y": (100, 199)}
        sel2, tot2 = zorder_plan(z2, ranges)
        sel1, tot1 = zorder_plan(z1, ranges)
        assert len(sel2) < tot2 / 2          # clustered: real skipping
        assert len(sel1) > tot1 * 0.9        # stats-only: near-full scan
        # both answer the query exactly
        mask = (y >= 100) & (y <= 199)
        exp = sorted(rid[mask].tolist())
        for out_dir in (z2, z1):
            got = sorted(
                read_zorder(out_dir, ranges).to_pandas()["rid"].tolist()
            )
            assert got == exp
