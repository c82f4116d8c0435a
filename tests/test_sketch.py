"""HyperLogLog approx-distinct: accuracy vs exact, merge associativity."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from obsidian_parser_ray.stages.sketch import HllSketch, _hash64_bytes, approx_distinct


def test_accuracy_within_bound(ray_session):
    n = 20000
    ds = rd.from_arrow(
        pa.table({"v": pa.array([f"user_{i % 5000}" for i in range(n)], pa.string())})
    )
    est = approx_distinct(ds, "v", p=12)
    assert abs(est - 5000) / 5000 < 0.05  # 3x the 1.6% std error


def test_merge_equals_single_pass():
    vals = [f"x{i}" for i in range(3000)]
    whole = HllSketch(10)
    whole.add_hashes(_hash64_bytes(vals))
    a, b = HllSketch(10), HllSketch(10)
    a.add_hashes(_hash64_bytes(vals[:1500]))
    b.add_hashes(_hash64_bytes(vals[1500:]))
    assert np.array_equal(a.merge(b).registers, whole.registers)


def test_small_range_linear_counting():
    sk = HllSketch(12)
    sk.add_hashes(_hash64_bytes([f"v{i}" for i in range(10)]))
    assert abs(sk.estimate() - 10) < 1.0


def test_int_column(ray_session):
    ds = rd.range(10000).map_batches(
        lambda t: pa.table({"u": pa.array([int(x) % 777 for x in t["id"].to_pylist()], pa.int64())}),
        batch_format="pyarrow",
    )
    est = approx_distinct(ds, "u", p=12)
    assert abs(est - 777) / 777 < 0.05


# ---------------------------------------------------------------------------
# QuantileSummary
# ---------------------------------------------------------------------------


def test_quantile_rank_error_bound():
    from obsidian_parser_ray.stages.sketch import QuantileSummary

    rng = np.random.default_rng(3)
    data = rng.exponential(10.0, size=50_000)
    # simulate 40 blocks compacted to k=256, concatenated on the driver
    merged = QuantileSummary(256)
    for chunk in np.array_split(data, 40):
        merged = merged.merge(QuantileSummary.from_array(chunk, 256))
    s = np.sort(data)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        est = merged.quantile(q)
        rank = np.searchsorted(s, est, side="right") / len(s)
        assert abs(rank - q) <= 1 / 256 + 1e-9, (q, rank)


def test_quantile_exact_when_small():
    from obsidian_parser_ray.stages.sketch import QuantileSummary

    sk = QuantileSummary.from_array(np.arange(100, dtype=np.float64), k=512)
    assert sk.quantile(0.5) == 49.0  # no compaction below k
    assert sk.quantile(0.0) == 0.0
    assert sk.quantile(1.0) == 99.0


def test_quantile_compact_merge_and_blob_roundtrip():
    from obsidian_parser_ray.stages.sketch import QuantileSummary

    a = QuantileSummary.from_array(np.arange(0, 5000, dtype=np.float64), 128)
    b = QuantileSummary.from_array(np.arange(5000, 10000, dtype=np.float64), 128)
    m = a.merge(b, compact=True)
    assert len(m.values) <= 128
    assert int(m.weights.sum()) == 10000
    rt = QuantileSummary.from_blob(m.to_blob(), 128)
    assert np.array_equal(rt.values, m.values)
    assert np.array_equal(rt.weights, m.weights)
    assert abs(m.quantile(0.5) - 5000) / 10000 <= 1 / 64


def test_approx_quantiles_distributed(ray_session):
    from obsidian_parser_ray.stages.sketch import approx_quantiles

    vals = np.arange(10_000, dtype=np.float64)
    ds = rd.from_arrow(pa.table({"v": pa.array(vals)})).repartition(16)
    q10, q50, q90 = approx_quantiles(ds, "v", [0.1, 0.5, 0.9], k=256)
    assert abs(q10 - 1000) <= 10000 / 256 + 1
    assert abs(q50 - 5000) <= 10000 / 256 + 1
    assert abs(q90 - 9000) <= 10000 / 256 + 1


# ---------------------------------------------------------------------------
# Misra–Gries frequent items
# ---------------------------------------------------------------------------


def test_mg_guarantee_heavy_items_present():
    from obsidian_parser_ray.stages.sketch import MisraGries

    # 3 heavy items over a long uniform tail, k small enough to force
    # many reductions
    vals = ["heavy_a"] * 3000 + ["heavy_b"] * 2000 + ["heavy_c"] * 1500 + [
        f"tail_{i}" for i in range(8000)
    ]
    n = len(vals)
    k = 64
    sk = MisraGries(k)
    # feed in chunks like per-block partials
    for i in range(0, n, 500):
        chunk = vals[i: i + 500]
        uniq, counts = np.unique(chunk, return_counts=True)
        sk.add_counts(uniq.tolist(), counts.tolist())
    bound = n / (k + 1)
    for item, true in (("heavy_a", 3000), ("heavy_b", 2000), ("heavy_c", 1500)):
        est = sk.estimate(item)
        assert true - bound <= est <= true, (item, est)


def test_mg_merge_preserves_bound():
    from obsidian_parser_ray.stages.sketch import MisraGries

    rng = np.random.default_rng(11)
    vals = np.concatenate(
        [np.zeros(5000, np.int64), rng.integers(1, 2000, size=20_000)]
    )
    n = len(vals)
    k = 128
    parts = []
    for chunk in np.array_split(vals, 10):
        sk = MisraGries(k)
        uniq, counts = np.unique(chunk, return_counts=True)
        sk.add_counts(uniq.tolist(), counts.tolist())
        parts.append(sk)
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merge(p)
    est = merged.estimate(0)
    assert 5000 - n / (k + 1) <= est <= 5000


def test_frequent_items_distributed_with_empty_blocks(ray_session):
    from obsidian_parser_ray.stages.sketch import frequent_items

    t = pa.table(
        {"u": pa.array([7] * 500 + list(range(100, 400)), pa.int64())}
    )
    ds = rd.from_arrow(t).repartition(32)  # some blocks will be tiny/empty
    out = frequent_items(ds, "u", k=64)
    n = 800
    assert 7 in out
    assert 500 - n / 65 <= out[7] <= 500


def test_approx_quantiles_by_groups(ray_session):
    from obsidian_parser_ray.stages.sketch import approx_quantiles_by

    rng = np.random.default_rng(21)
    n = 20_000
    keys = rng.integers(0, 4, n)
    # each group has a different distribution (shifted uniforms)
    vals = rng.uniform(0, 100, n) + keys * 1000
    t = pa.table({"g": pa.array([f"k{int(x)}" for x in keys]),
                  "v": pa.array(vals, pa.float64())})
    ds = rd.from_arrow(t).repartition(16)
    out = approx_quantiles_by(ds, "g", "v", [0.1, 0.5, 0.9], k=256).to_pandas()
    assert len(out) == 4
    for _, r in out.iterrows():
        gi = int(r["g"][1])
        gvals = np.sort(vals[keys == gi])
        for q, col in [(0.1, "q10"), (0.5, "q50"), (0.9, "q90")]:
            rank = np.searchsorted(gvals, r[col], side="right") / len(gvals)
            assert abs(rank - q) <= 1 / 256 + 1e-9, (r["g"], col, rank)


def test_approx_quantiles_by_tiny_groups_exact(ray_session):
    from obsidian_parser_ray.stages.sketch import approx_quantiles_by

    t = pa.table({"g": pa.array(["a"] * 3 + ["b"]),
                  "v": pa.array([1.0, 2.0, 3.0, 7.0])})
    out = approx_quantiles_by(
        rd.from_arrow(t).repartition(4), "g", "v", [0.5], k=64
    ).to_pandas().set_index("g")
    assert out.loc["a", "q50"] == 2.0
    assert out.loc["b", "q50"] == 7.0


def test_approx_distinct_by_groups(ray_session):
    from obsidian_parser_ray.stages.sketch import approx_distinct_by

    rng = np.random.default_rng(33)
    n = 30_000
    keys = rng.integers(0, 3, n)
    truth = {0: 500, 1: 3000, 2: 40}
    vals = np.array([rng.integers(0, truth[int(k)]) for k in keys])
    t = pa.table({"g": pa.array([f"k{int(x)}" for x in keys]),
                  "u": pa.array(vals, pa.int64())})
    out = approx_distinct_by(
        rd.from_arrow(t).repartition(12), "g", "u", p=12
    ).to_pandas().set_index("g")
    for k, tr in truth.items():
        exact = len(np.unique(vals[keys == k]))
        est = out.loc[f"k{k}", "approx_distinct"]
        assert abs(est - exact) / exact < 0.05, (k, est, exact)


class TestBloom:
    def test_no_false_negatives_and_low_fp(self, ray_session):
        import numpy as np

        from obsidian_parser_ray.hashing import hash64_array
        from obsidian_parser_ray.stages.sketch import BloomFilter

        bf = BloomFilter(1 << 16, 5)
        keys = ["k%d" % i for i in range(5000)]
        bf.add_hashes(hash64_array(keys))
        assert bf.contains_hashes(hash64_array(keys)).all()
        fp = bf.contains_hashes(
            hash64_array(["x%d" % i for i in range(20000)])
        ).mean()
        assert fp < 0.02, fp

    def test_merge_equals_single_build(self, ray_session):
        import numpy as np

        from obsidian_parser_ray.hashing import hash64_array
        from obsidian_parser_ray.stages.sketch import BloomFilter

        a, b = BloomFilter(1 << 12, 4), BloomFilter(1 << 12, 4)
        whole = BloomFilter(1 << 12, 4)
        ka = ["a%d" % i for i in range(100)]
        kb = ["b%d" % i for i in range(100)]
        a.add_hashes(hash64_array(ka))
        b.add_hashes(hash64_array(kb))
        whole.add_hashes(hash64_array(ka + kb))
        assert (a.merge(b).words == whole.words).all()

    def test_distributed_build_matches_local(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.hashing import hash64_array
        from obsidian_parser_ray.stages.sketch import BloomFilter, build_bloom

        keys = ["u%d" % i for i in range(2000)]
        ds = rd.from_arrow(
            pa.table({"k": pa.array(keys)})
        ).repartition(7)
        got = build_bloom(ds, "k", num_bits=1 << 14, num_hashes=4)
        local = BloomFilter(1 << 14, 4)
        local.add_hashes(hash64_array(keys))
        assert (got.words == local.words).all()

    def test_bloom_semi_filter_superset_of_exact(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.stages.sketch import (
            bloom_semi_filter,
            build_bloom,
        )

        fact = rd.from_arrow(
            pa.table(
                {
                    "k": pa.array(["u%d" % (i % 50) for i in range(400)]),
                    "v": pa.array(list(range(400)), pa.int64()),
                }
            )
        ).repartition(5)
        keys = rd.from_arrow(
            pa.table({"k": pa.array(["u%d" % i for i in range(0, 50, 2)])})
        )
        bloom = build_bloom(keys, "k", num_bits=1 << 14, num_hashes=4)
        got = set(bloom_semi_filter(fact, bloom, "k").to_pandas()["v"])
        exact = {i for i in range(400) if (i % 50) % 2 == 0}
        assert exact <= got          # zero false negatives
        assert len(got) <= 400


class TestExactIntQuantiles:
    def test_matches_duckdb_quantile_disc(self, ray_session):
        import duckdb
        import numpy as np
        import ray.data as rd

        from obsidian_parser_ray.stages.sketch import exact_int_quantiles

        rng = np.random.RandomState(5)
        vals = rng.randint(0, 300, 5000).astype("int64")
        ds = rd.from_arrow(pa.table({"x": vals})).repartition(9)
        got = exact_int_quantiles(ds, "x", [0.05, 0.5, 0.95, 0.0, 1.0])
        exp = duckdb.sql(
            "SELECT quantile_disc(x, 0.05), quantile_disc(x, 0.5), "
            "quantile_disc(x, 0.95), quantile_disc(x, 0.0), "
            "quantile_disc(x, 1.0) FROM (SELECT unnest(?) x)",
            params=[vals.tolist()],
        ).fetchone()
        assert got == list(exp)

    def test_winsorize_clamps(self, ray_session):
        import numpy as np
        import ray.data as rd

        from obsidian_parser_ray.stages.sketch import winsorize

        vals = np.concatenate([np.full(98, 50), [0, 1000]]).astype("int64")
        ds = rd.from_arrow(pa.table({"doc": np.arange(100), "x": vals}))
        out = winsorize(ds, column="x").to_pandas().sort_values("doc")
        # p05 of 100 values = the 5th smallest = 50; p95 = 50
        assert out.x_w.min() == 50 and out.x_w.max() == 50
        assert (out.x == vals).all()  # original column untouched


class TestBm25:
    def test_bm25_ranks_rarer_term_higher(self, ray_session):
        import ray.data as rd

        from obsidian_parser_ray.stages.text import bm25_topk

        docs = pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array([
                "apple banana banana banana",
                "apple apple cherry",
                "banana cherry cherry",
                "durian durian durian",
            ]),
        })
        out = bm25_topk(
            rd.from_arrow(docs).repartition(3), ["cherry"], k=4
        ).to_pandas()
        # only docs containing 'cherry' rank; doc 3 (tf=2, short) first
        assert out.doc_id.tolist()[0] == 3
        assert set(out.doc_id) == {2, 3}
        assert (out.score > 0).all()

    def test_bm25_checkpoint_equals_recompute(self, ray_session, tmp_path):
        import numpy as np
        import ray.data as rd

        from obsidian_parser_ray.stages.text import bm25_topk

        rng = np.random.RandomState(2)
        words = ["alpha", "beta", "gamma", "delta", "epsilon"]
        texts = [
            " ".join(rng.choice(words, rng.randint(3, 30)))
            for _ in range(120)
        ]
        docs = pa.table({
            "doc_id": pa.array(range(120), pa.int64()),
            "text": pa.array(texts),
        })
        ds = rd.from_arrow(docs).repartition(5)
        a = bm25_topk(ds, ["beta", "delta"], k=10).to_pandas()
        b = bm25_topk(
            ds, ["beta", "delta"], k=10,
            checkpoint_dir=str(tmp_path / "bm25_ckpt"),
        ).to_pandas()
        assert a.equals(b)


class TestGroupedPercentRanks:
    def test_matches_window_oracle(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data as rd

        rng = np.random.RandomState(29)
        df = pd.DataFrame(
            {
                "id": np.arange(500),
                "g": rng.choice(["p", "q", "r"], 500),
                "v": rng.randint(0, 30, 500),
            }
        )
        from obsidian_parser_ray.stages.sketch import grouped_percent_ranks

        out = (
            grouped_percent_ranks(
                rd.from_pandas(df).repartition(5),
                column="v", group_col="g",
            )
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", df)
        exp = con.execute(
            """
            SELECT id, g, v,
              ((rank() OVER (PARTITION BY g ORDER BY v) - 1)::DOUBLE
               / (count(*) OVER (PARTITION BY g) - 1)::DOUBLE) AS pr
            FROM t ORDER BY id
            """
        ).fetchdf()
        assert out.equals(exp)

    def test_singleton_group_is_null(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from obsidian_parser_ray.stages.sketch import grouped_percent_ranks

        df = pd.DataFrame({"g": ["a", "b", "b"], "v": [1, 2, 3]})
        out = (
            grouped_percent_ranks(rd.from_pandas(df), column="v",
                                  group_col="g")
            .to_pandas()
        )
        assert out[out["g"] == "a"]["pr"].isna().all()
        assert sorted(out[out["g"] == "b"]["pr"]) == [0.0, 1.0]


class TestGroupedWinsorize:
    def test_per_group_cuts(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data as rd

        from obsidian_parser_ray.stages.sketch import grouped_winsorize

        rng = np.random.RandomState(47)
        df = pd.DataFrame(
            {
                "id": np.arange(400),
                "g": rng.choice(["a", "b"], 400),
                "v": rng.randint(0, 100, 400),
            }
        )
        out = (
            grouped_winsorize(rd.from_pandas(df).repartition(4),
                              column="v", group_col="g")
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", df)
        exp = con.execute(
            """
            WITH q AS (SELECT g, quantile_disc(v, 0.05)::BIGINT AS lo,
                              quantile_disc(v, 0.95)::BIGINT AS hi
                       FROM t GROUP BY g)
            SELECT id, g, v,
              CASE WHEN v < lo THEN lo WHEN v > hi THEN hi
                   ELSE v::BIGINT END AS v_w
            FROM t JOIN q USING (g) ORDER BY id
            """
        ).fetchdf()
        exp = exp.astype({"id": "int64", "v": "int64"})
        out = out.astype({"id": "int64", "v": "int64"})
        assert out.equals(exp)


class TestCountMin:
    def test_overestimates_and_bound(self):
        import numpy as np

        from obsidian_parser_ray.stages.sketch import CountMinSketch

        rng = np.random.RandomState(5)
        # zipf-ish: heavy keys + a long tail
        vals = [f"k{i}" for i in rng.zipf(1.5, 20000) if i < 5000]
        from collections import Counter

        exact = Counter(vals)
        sk = CountMinSketch(width=1024, depth=4)
        sk.add_counts(list(exact.keys()), list(exact.values()))
        keys = list(exact.keys())
        est = sk.query(keys)
        true = np.array([exact[k] for k in keys])
        assert (est >= true).all()  # one-sided error, always
        n = sum(exact.values())
        # CM bound: overestimate <= (e/width)*N w.p. 1-e^-depth;
        # assert a generous 4x slack on the MAX over all keys
        assert (est - true).max() <= 4 * (np.e / 1024) * n

    def test_merge_equals_single_pass(self):
        import numpy as np

        from obsidian_parser_ray.stages.sketch import CountMinSketch

        a = CountMinSketch(width=256, depth=3)
        b = CountMinSketch(width=256, depth=3)
        whole = CountMinSketch(width=256, depth=3)
        a.add_counts(["x", "y"], [3, 5])
        b.add_counts(["y", "z"], [2, 7])
        whole.add_counts(["x", "y", "z"], [3, 7, 7])
        assert (a.merge(b).table == whole.table).all()

    def test_distributed_build_matches_local(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.stages.sketch import (
            CountMinSketch,
            countmin_counts,
        )

        rng = np.random.RandomState(9)
        vals = [f"t{rng.randint(40)}" for _ in range(5000)]
        ds = rd.from_arrow(pa.table({"v": vals})).repartition(6)
        sk = countmin_counts(ds, "v", width=512, depth=4)
        local = CountMinSketch(width=512, depth=4)
        from collections import Counter

        c = Counter(vals)
        local.add_counts(list(c.keys()), list(c.values()))
        assert (sk.table == local.table).all()
        est = sk.query(list(c.keys()))
        true = np.array([c[k] for k in c.keys()])
        assert (est >= true).all()


class TestGroupedFrequentItems:
    def test_exact_regime_full_parity(self, ray_session):
        from collections import Counter

        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.stages.sketch import grouped_frequent_items

        rng = np.random.RandomState(3)
        rows = [
            (f"k{i % 3}", f"v{rng.zipf(1.6)}")
            for i in range(20000)
        ]
        rows = [(a, b) for a, b in rows if int(b[1:]) < 40]
        ds = rd.from_arrow(
            pa.table(
                {"key": [a for a, _ in rows], "val": [b for _, b in rows]}
            )
        ).repartition(6)
        out = grouped_frequent_items(ds, "key", "val", k=64).to_pandas()
        exact = Counter(rows)
        # distinct per key < k → no evictions → EXACT counts, full set
        assert len(out) == len(exact)
        for r in out.itertuples():
            assert r.est_count == exact[(r.key, r.val)]

    def test_null_values_are_dropped(self, ray_session):
        # ADVICE r4: null items used to reach the MG counters and make
        # the deterministic merge sort raise (None vs str)
        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.stages.sketch import grouped_frequent_items

        ds = rd.from_arrow(
            pa.table(
                {
                    "key": ["a", "a", "a", "b"],
                    "val": pa.array(["x", None, "x", None], pa.string()),
                }
            )
        ).repartition(2)
        out = grouped_frequent_items(ds, "key", "val", k=8).to_pandas()
        got = {(r.key, r.val): r.est_count for r in out.itertuples()}
        assert got == {("a", "x"): 2}

    def test_eviction_regime_keeps_heavy_hitter(self, ray_session):
        from collections import Counter

        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.stages.sketch import grouped_frequent_items

        rows = [("g", "hot")] * 1000 + [
            ("g", f"cold{i}") for i in range(200)
        ]
        ds = rd.from_arrow(
            pa.table(
                {"key": [a for a, _ in rows], "val": [b for _, b in rows]}
            )
        ).repartition(4)
        out = grouped_frequent_items(ds, "key", "val", k=4).to_pandas()
        exact = Counter(rows)
        hot = out[(out.key == "g") & (out.val == "hot")]
        n_g = sum(exact.values())
        assert len(hot) == 1
        # MG guarantee: undercount ≤ n/(k+1)
        assert hot.iloc[0].est_count >= 1000 - n_g // 5
