import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from obsidian_parser_ray.stages.ranking import cocitation, grouped_topk


def _pandas_topk(df, keys, order_col, k, tiebreak):
    out = df.sort_values(
        keys + [order_col] + tiebreak,
        ascending=[True] * len(keys) + [False] + [True] * len(tiebreak),
    )
    out = out.groupby(keys, sort=False).head(k)
    out["rn"] = out.groupby(keys, sort=False).cumcount() + 1
    return out.reset_index(drop=True)


@pytest.mark.parametrize("num_blocks", [1, 7, 32])
def test_grouped_topk_matches_pandas(ray_session, num_blocks):
    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 40, 2000).astype(str),
            "v": rng.integers(0, 100, 2000),
            "t": [f"t{i:04d}" for i in range(2000)],
        }
    )
    # block layout must NOT affect the result (phase-1 is a combiner)
    ds = rd.from_pandas(df).repartition(num_blocks)
    got = (
        grouped_topk(ds, ["g"], "v", 3, tiebreak=["t"], rank_col="rn")
        .to_pandas()
        .sort_values(["g", "rn"])
        .reset_index(drop=True)
    )
    exp = _pandas_topk(df, ["g"], "v", 3, ["t"]).sort_values(
        ["g", "rn"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["g", "v", "t", "rn"]], exp[["g", "v", "t", "rn"]]
    )


def test_grouped_topk_multi_key_and_ascending(ray_session):
    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {
            "a": rng.integers(0, 5, 500).astype(str),
            "b": rng.integers(0, 4, 500),
            "v": rng.normal(size=500),
            "t": [f"x{i}" for i in range(500)],
        }
    )
    ds = rd.from_pandas(df).repartition(9)
    got = grouped_topk(
        ds, ["a", "b"], "v", 2, descending=False, tiebreak=["t"]
    ).to_pandas()
    exp = (
        df.sort_values(["a", "b", "v", "t"])
        .groupby(["a", "b"], sort=False)
        .head(2)
    )
    got_s = got.sort_values(["a", "b", "v", "t"]).reset_index(drop=True)
    exp_s = exp.sort_values(["a", "b", "v", "t"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, exp_s)


def test_grouped_topk_group_smaller_than_k(ray_session):
    ds = rd.from_arrow(
        pa.table({"g": ["a", "a", "b"], "v": [1, 2, 5], "t": ["x", "y", "z"]})
    )
    got = grouped_topk(ds, ["g"], "v", 10, tiebreak=["t"], rank_col="rn")
    df = got.to_pandas().sort_values(["g", "rn"]).reset_index(drop=True)
    assert list(df["g"]) == ["a", "a", "b"]
    assert list(df["rn"]) == [1, 2, 1]
    assert list(df["v"]) == [2, 1, 5]  # descending within group


def _triples(rows):
    return rd.from_arrow(
        pa.table(
            {
                "subj": pa.array([r[0] for r in rows], pa.string()),
                "pred": pa.array([r[1] for r in rows], pa.string()),
                "obj": pa.array([r[2] for r in rows], pa.string()),
                "weight": pa.array([1] * len(rows), pa.int64()),
            }
        )
    )


def test_cocitation_basic(ray_session):
    t = _triples(
        [
            ("n1", "links_to", "x"),
            ("n2", "links_to", "x"),
            ("n3", "links_to", "x"),
            ("n1", "links_to", "y"),
            ("n2", "links_to", "y"),
            ("n1", "tagged", "z"),  # other predicate ignored
            ("n2", "tagged", "z"),
        ]
    )
    got = (
        cocitation(t)
        .to_pandas()
        .sort_values(["note_a", "note_b"])
        .reset_index(drop=True)
    )
    exp = pd.DataFrame(
        {
            "note_a": ["n1", "n1", "n2"],
            "note_b": ["n2", "n3", "n3"],
            "n_shared": [2, 1, 1],
        }
    )
    pd.testing.assert_frame_equal(got, exp)


def test_cocitation_min_shared_and_hub_cap(ray_session):
    rows = [("n1", "links_to", "x"), ("n2", "links_to", "x"),
            ("n1", "links_to", "y"), ("n2", "links_to", "y")]
    # hub object cited by 5 notes — dropped when max_fanin < 5
    rows += [(f"h{i}", "links_to", "hub") for i in range(5)]
    t = _triples(rows)
    got = cocitation(t, min_shared=2, max_fanin=4).to_pandas()
    assert len(got) == 1
    assert got.iloc[0].tolist() == ["n1", "n2", 2]
    # without the cap the hub contributes C(5,2)=10 pairs
    all_pairs = cocitation(t, max_fanin=4096).to_pandas()
    assert len(all_pairs) == 1 + 10


def test_cocitation_block_layout_invariant(ray_session):
    rng = np.random.default_rng(3)
    rows = [
        (f"n{int(s)}", "links_to", f"o{int(o)}")
        for s, o in zip(rng.integers(0, 60, 400), rng.integers(0, 30, 400))
    ]
    # dedupe (canonical triples have distinct (subj, pred, obj))
    rows = sorted(set(rows))
    a = cocitation(_triples(rows).repartition(1)).to_pandas()
    b = cocitation(_triples(rows).repartition(17), num_partitions=5).to_pandas()
    key = ["note_a", "note_b"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


@pytest.mark.usefixtures("ray_session")
class TestGroupedMode:
    def test_mode_with_deterministic_ties(self):
        import pandas as pd
        import ray.data as rd

        from obsidian_parser_ray.stages.ranking import grouped_mode

        df = pd.DataFrame(
            {
                # g1: b wins 3-2; g2: tie a/c 2-2 -> 'a' (smallest)
                "g": ["g1"] * 5 + ["g2"] * 4,
                "v": ["a", "b", "b", "b", "a", "c", "a", "c", "a"],
            }
        )
        out = (
            grouped_mode(rd.from_pandas(df).repartition(4), ["g"], "v")
            .to_pandas().set_index("g").sort_index()
        )
        assert out.loc["g1", "v"] == "b" and out.loc["g1", "n"] == 3
        assert out.loc["g2", "v"] == "a" and out.loc["g2", "n"] == 2

    def test_matches_window_oracle_random(self):
        import duckdb
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from obsidian_parser_ray.stages.ranking import grouped_mode

        rng = np.random.RandomState(23)
        df = pd.DataFrame(
            {
                "g": rng.randint(0, 12, 600),
                "v": rng.choice(list("abcdef"), 600),
            }
        )
        out = (
            grouped_mode(rd.from_pandas(df).repartition(6), ["g"], "v")
            .to_pandas().sort_values("g").reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", df)
        exp = con.execute(
            """
            WITH c AS (SELECT g, v, count(*)::BIGINT AS n
                       FROM t GROUP BY 1, 2),
            r AS (SELECT *, row_number() OVER (PARTITION BY g
                        ORDER BY n DESC, v) AS rk FROM c)
            SELECT g, v, n FROM r WHERE rk = 1 ORDER BY g
            """
        ).fetchdf()
        assert out.equals(exp)


@pytest.mark.usefixtures("ray_session")
class TestBasketPairs:
    def test_distinct_within_basket_and_topk(self):
        import pandas as pd
        import ray.data as rd

        from obsidian_parser_ray.stages.ranking import basket_pairs

        df = pd.DataFrame(
            {
                # basket 1: a,b,b,c -> pairs ab, ac, bc (duplicates of
                # an item inside one basket count once)
                # basket 2: a,b -> ab
                "o": [1, 1, 1, 1, 2, 2],
                "i": ["a", "b", "b", "c", "a", "b"],
            }
        )
        out = (
            basket_pairs(rd.from_pandas(df).repartition(3),
                         basket_col="o", item_col="i", k=10)
            .to_pandas()
        )
        got = {(r.item_a, r.item_b): r.n for r in out.itertuples()}
        assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}
        # top-1 cut keeps the highest count
        top = basket_pairs(rd.from_pandas(df), basket_col="o",
                           item_col="i", k=1).to_pandas()
        assert list(top["item_a"]) == ["a"]
        assert list(top["n"]) == [2]


@pytest.mark.usefixtures("ray_session")
class TestBasketPairsRandomParity:
    def test_matches_self_join_oracle(self):
        import duckdb
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from obsidian_parser_ray.stages.ranking import basket_pairs

        rng = np.random.RandomState(41)
        df = pd.DataFrame(
            {
                "o": rng.randint(0, 80, 600),
                "i": rng.choice(list("abcdefg"), 600),
            }
        )
        out = (
            basket_pairs(rd.from_pandas(df).repartition(6),
                         basket_col="o", item_col="i", k=50)
            .to_pandas().reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", df)
        exp = con.execute(
            """
            WITH d AS (SELECT DISTINCT o, i FROM t)
            SELECT a.i AS item_a, b.i AS item_b,
                   count(*)::BIGINT AS n
            FROM d a JOIN d b ON a.o = b.o AND a.i < b.i
            GROUP BY 1, 2 ORDER BY n DESC, item_a, item_b LIMIT 50
            """
        ).fetchdf()
        assert out.equals(exp)
