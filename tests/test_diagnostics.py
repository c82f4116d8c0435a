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


@pytest.mark.usefixtures("ray_session")
class TestProfileTable:
    def test_profile_mixed_types(self):
        import datetime as dt

        from obsidian_parser_ray.stages.diagnostics import profile_table

        n = 500
        ds = rd.from_arrow(
            pa.table(
                {
                    "i": pa.array(list(range(n)), pa.int64()),
                    "f": pa.array(
                        [None if x % 10 == 0 else x / 4.0 for x in range(n)],
                        pa.float64(),
                    ),
                    "s": pa.array([f"v{x % 37}" for x in range(n)]),
                    "t": pa.array(
                        [dt.datetime(2024, 1, 1) +
                         dt.timedelta(minutes=x) for x in range(n)]
                    ),
                }
            )
        ).repartition(4)
        prof = profile_table(ds)
        assert prof["i"]["n_rows"] == n and prof["i"]["n_nulls"] == 0
        assert prof["i"]["min"] == 0.0 and prof["i"]["max"] == float(n - 1)
        assert prof["f"]["n_nulls"] == 50
        assert prof["s"]["min"] == "v0" and prof["s"]["max"] == "v9"
        # HLL within 10% of true cardinalities
        assert abs(prof["i"]["approx_distinct"] - n) / n < 0.1
        assert abs(prof["s"]["approx_distinct"] - 37) / 37 < 0.1
        assert prof["t"]["min"] < prof["t"]["max"]  # epoch int64 order

    def test_profile_empty(self):
        from obsidian_parser_ray.stages.diagnostics import profile_table

        ds = rd.from_arrow(pa.table({"x": pa.array([], pa.int64())}))
        prof = profile_table(ds)
        assert prof["x"]["n_rows"] == 0
        assert prof["x"]["approx_distinct"] == 0
        assert prof["x"]["min"] is None


@pytest.mark.usefixtures("ray_session")
class TestGroupZscores:
    def test_matches_numpy_population_z(self):
        from obsidian_parser_ray.stages.diagnostics import group_zscores

        rng = np.random.RandomState(4)
        g = rng.choice(["en", "de", "fr"], 300)
        x = rng.randint(10, 500, 300).astype("int64")
        ds = rd.from_arrow(pa.table({"grp": g, "x": x})).repartition(5)
        out = group_zscores(ds, value_col="x", group_col="grp").to_pandas()
        for grp in ["en", "de", "fr"]:
            vals = x[g == grp].astype(float)
            mean, std = vals.mean(), vals.std()  # population
            sub = out[out.grp == grp].sort_index()
            got = sub.z.to_numpy()
            exp = (sub.x.to_numpy().astype(float) - mean) / std
            assert np.allclose(got, exp, atol=1e-12)

    def test_zero_variance_group_is_null(self):
        from obsidian_parser_ray.stages.diagnostics import group_zscores

        ds = rd.from_arrow(pa.table({
            "grp": pa.array(["a", "a", "b", "b"]),
            "x": pa.array([5, 5, 1, 3], pa.int64()),
        }))
        out = group_zscores(ds, value_col="x", group_col="grp").to_pandas()
        assert out[out.grp == "a"].z.isna().all()
        assert out[out.grp == "b"].z.notna().all()


@pytest.mark.usefixtures("ray_session")
class TestTableDiff:
    def test_added_removed_changed(self):
        from obsidian_parser_ray.stages.diagnostics import table_diff

        old = rd.from_arrow(pa.table({
            "k": pa.array([1, 2, 3, 4], pa.int64()),
            "v": pa.array(["a", "b", "c", "d"]),
            "w": pa.array([10, 20, 30, 40], pa.int64()),
        })).repartition(2)
        new = rd.from_arrow(pa.table({
            "k": pa.array([2, 3, 4, 5], pa.int64()),
            "v": pa.array(["b", "C", "d", "e"]),   # 3 changed
            "w": pa.array([20, 30, 41, 50], pa.int64()),  # 4 changed
        })).repartition(3)
        out = table_diff(old, new, key_col="k",
                         compare_cols=["v", "w"]).to_pandas()
        got = dict(zip(out.k, out.change))
        assert got == {1: "removed", 3: "changed", 4: "changed", 5: "added"}

    def test_null_vs_null_is_equal(self):
        from obsidian_parser_ray.stages.diagnostics import table_diff

        old = rd.from_arrow(pa.table({
            "k": pa.array([1, 2], pa.int64()),
            "v": pa.array([None, "x"], pa.string()),
        }))
        new = rd.from_arrow(pa.table({
            "k": pa.array([1, 2], pa.int64()),
            "v": pa.array([None, None], pa.string()),
        }))
        out = table_diff(old, new, key_col="k",
                         compare_cols=["v"]).to_pandas()
        got = dict(zip(out.k, out.change)) if len(out) else {}
        assert got == {2: "changed"}


@pytest.mark.usefixtures("ray_session")
class TestGroupedQuantileAndMad:
    def test_grouped_quantile_matches_duckdb(self):
        import duckdb
        import pandas as pd

        from obsidian_parser_ray.stages.diagnostics import (
            grouped_int_quantile,
        )

        rng = np.random.RandomState(5)
        df = pd.DataFrame(
            {
                "g": rng.choice(list("xyz"), 300),
                "v": rng.randint(0, 40, 300),
            }
        )
        con = duckdb.connect()
        con.register("t", df)
        for q in (0.05, 0.5, 0.95):
            got = grouped_int_quantile(
                rd.from_pandas(df).repartition(4),
                value_col="v", group_col="g", q=q,
            )
            exp = dict(
                con.execute(
                    f"SELECT g, quantile_disc(v, {q})::BIGINT "
                    "FROM t GROUP BY g"
                ).fetchall()
            )
            assert got == exp

    def test_mad_outliers_flags(self):
        from obsidian_parser_ray.stages.diagnostics import (
            group_mad_outliers,
        )

        # group 'a': tight cluster at 10 (MAD 1) + one far point
        t = pa.table({
            "id": pa.array(list(range(8)), pa.int64()),
            "g": pa.array(["a"] * 7 + ["b"]),
            "v": pa.array([9, 10, 10, 10, 11, 11, 99, 5], pa.int64()),
        })
        out = (
            group_mad_outliers(
                rd.from_arrow(t).repartition(3),
                value_col="v", group_col="g",
            )
            .to_pandas().set_index("id").sort_index()
        )
        assert bool(out.loc[6, "is_outlier"])  # the 99
        assert not out.loc[[0, 1, 2, 3, 4, 5], "is_outlier"].any()
        # singleton group: dev 0, MAD 0 -> not an outlier
        assert not bool(out.loc[7, "is_outlier"])
        assert out.loc[6, "dev"] == 89


@pytest.mark.usefixtures("ray_session")
class TestGroupedPearson:
    def test_matches_numpy(self):
        import pandas as pd

        from obsidian_parser_ray.stages.diagnostics import grouped_pearson

        rng = np.random.RandomState(17)
        df = pd.DataFrame(
            {
                "g": rng.choice(["u", "v"], 400),
                "x": rng.randint(0, 100, 400),
            }
        )
        df["y"] = df["x"] * 2 + rng.randint(0, 50, 400)
        out = (
            grouped_pearson(
                rd.from_pandas(df).repartition(5),
                x_col="x", y_col="y", group_col="g",
            )
            .to_pandas().set_index("g").sort_index()
        )
        for g in ["u", "v"]:
            sub = df[df["g"] == g]
            exp = np.corrcoef(sub["x"], sub["y"])[0, 1]
            assert abs(out.loc[g, "corr"] - exp) < 1e-12
            assert out.loc[g, "n"] == len(sub)

    def test_zero_variance_is_null(self):
        import pandas as pd

        from obsidian_parser_ray.stages.diagnostics import grouped_pearson

        df = pd.DataFrame({"g": ["a"] * 5, "x": [7] * 5,
                           "y": [1, 2, 3, 4, 5]})
        out = grouped_pearson(
            rd.from_pandas(df), x_col="x", y_col="y", group_col="g"
        ).to_pandas()
        assert out["corr"].isna().all()
