"""Relational-analytics pipelines vs a DuckDB oracle on a tiny
synthesized multi-table schema (plus edge cases the sf tables can't
plant: zero-order customers dominating, empty filter windows, revenue
ties at the top-k boundary)."""

from __future__ import annotations

import datetime as dt

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from obsidian_parser_ray.pipelines.analytics import (
    customer_order_distribution,
    global_topk,
    late_order_priority,
    pricing_summary,
    region_nation_revenue,
    top_orders_by_revenue,
    top_suppliers,
)


def _ts_array(days: list[int], base=dt.datetime(1996, 1, 1)) -> pa.Array:
    return pa.array(
        [base + dt.timedelta(days=int(d)) for d in days], pa.timestamp("us")
    )


@pytest.fixture(scope="module")
def tables():
    rng = np.random.RandomState(7)
    n_li, n_ord, n_cust, n_supp = 600, 150, 40, 8
    orderkeys = rng.randint(0, n_ord, n_li)
    li = pa.table(
        {
            "l_orderkey": pa.array(orderkeys, pa.int64()),
            "l_suppkey": pa.array(rng.randint(0, n_supp, n_li), pa.int64()),
            "l_quantity": pa.array(rng.randint(1, 50, n_li).astype(float)),
            "l_extendedprice": pa.array(np.round(rng.uniform(900, 10_000, n_li), 2)),
            "l_discount": pa.array(np.round(rng.uniform(0, 0.1, n_li), 2)),
            "l_tax": pa.array(np.round(rng.uniform(0, 0.08, n_li), 2)),
            "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n_li)),
            "l_linestatus": pa.array(rng.choice(["O", "F"], n_li)),
            "l_shipdate": _ts_array(list(rng.randint(0, 700, n_li))),
        }
    )
    orders = pa.table(
        {
            "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
            # only the first half of customers ever order → zero-order tail
            "o_custkey": pa.array(rng.randint(0, n_cust // 2, n_ord), pa.int64()),
            "o_orderdate": _ts_array(list(rng.randint(0, 600, n_ord))),
            "o_orderpriority": pa.array(
                rng.choice(["1-URGENT", "2-HIGH", "3-LOW"], n_ord)
            ),
        }
    )
    customer = pa.table(
        {
            "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
            "c_nationkey": pa.array(rng.randint(0, 6, n_cust).astype(np.int32)),
            "c_mktsegment": pa.array(rng.choice(["BUILDING", "AUTO"], n_cust)),
        }
    )
    supplier = pa.table(
        {
            "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
            "s_name": pa.array([f"supp_{i}" for i in range(n_supp)]),
            "s_nationkey": pa.array(rng.randint(0, 6, n_supp).astype(np.int32)),
        }
    )
    nation = pa.table(
        {
            "n_nationkey": pa.array(np.arange(6, dtype=np.int32)),
            "n_name": pa.array([f"nation_{i}" for i in range(6)]),
            "n_regionkey": pa.array((np.arange(6) % 2).astype(np.int32)),
        }
    )
    region = pa.table(
        {
            "r_regionkey": pa.array(np.arange(2, dtype=np.int32)),
            "r_name": pa.array(["EVEN", "ODD"]),
        }
    )
    return {
        "lineitem": li, "orders": orders, "customer": customer,
        "supplier": supplier, "nation": nation, "region": region,
    }


@pytest.fixture(scope="module")
def con(tables):
    c = duckdb.connect()
    for name, t in tables.items():
        c.register(name, t)
    return c


def _cmp(ds, con, sql):
    got = ds.to_pandas()
    exp = con.execute(sql).fetchdf()
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    for df in (got, exp):
        for c in df.columns:
            if str(df[c].dtype).startswith(("int", "uint")):
                df[c] = df[c].astype("int64")
    got = got.sort_values(list(got.columns)).reset_index(drop=True)
    exp = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp), (len(got), len(exp))
    assert got.equals(exp), f"\n{got.head()}\n{exp.head()}"


_REV = "CAST(floor(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)"


def test_pricing_summary(ray_session, tables, con):
    ds = pricing_summary(
        rd.from_arrow(tables["lineitem"]).repartition(7),
        cutoff=dt.datetime(1997, 1, 1),
    )
    _cmp(ds, con, """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(floor(l_quantity * 1000000) AS BIGINT)) AS BIGINT) AS sum_qty_micro,
  CAST(sum(CAST(floor(l_extendedprice * 1000000) AS BIGINT)) AS BIGINT) AS sum_base_micro,
  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)) AS BIGINT) AS sum_disc_micro,
  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)) AS BIGINT) AS sum_charge_micro,
  CAST(sum(CAST(floor(l_discount * 1000000) AS BIGINT)) AS BIGINT) AS sum_discount_micro,
  count(*)::BIGINT AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1997-01-01'
GROUP BY l_returnflag, l_linestatus
""")


def test_pricing_summary_empty_window(ray_session, tables):
    ds = pricing_summary(
        rd.from_arrow(tables["lineitem"]), cutoff=dt.datetime(1990, 1, 1)
    )
    assert ds.count() == 0


def test_top_orders(ray_session, tables, con):
    cut = dt.datetime(1996, 9, 1)
    ds = top_orders_by_revenue(
        rd.from_arrow(tables["lineitem"]).repartition(5),
        rd.from_arrow(tables["orders"]).repartition(3),
        rd.from_arrow(tables["customer"]),
        segment="BUILDING", cutoff=cut, k=7, num_partitions=8,
    )
    _cmp(ds, con, f"""
WITH r AS (
  SELECT l_orderkey, CAST(sum({_REV}) AS BIGINT) AS revenue_micro
  FROM lineitem WHERE l_shipdate > TIMESTAMP '1996-09-01' GROUP BY l_orderkey)
SELECT o_orderkey, revenue_micro, epoch(o_orderdate)::BIGINT AS o_orderdate_s,
       o_orderpriority
FROM r JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1996-09-01'
ORDER BY revenue_micro DESC, o_orderkey LIMIT 7
""")


def test_late_order_priority(ray_session, tables, con):
    ds = late_order_priority(
        rd.from_arrow(tables["lineitem"]).repartition(5),
        rd.from_arrow(tables["orders"]),
        late_days=120,
    )
    _cmp(ds, con, """
SELECT o_orderpriority, count(*)::BIGINT AS n_late_orders
FROM orders
JOIN (SELECT l_orderkey, max(l_shipdate) AS max_ship FROM lineitem
      GROUP BY l_orderkey) x ON o_orderkey = l_orderkey
WHERE max_ship > o_orderdate + INTERVAL 120 DAY
GROUP BY o_orderpriority
""")


def test_region_nation_revenue(ray_session, tables, con):
    ds = region_nation_revenue(
        rd.from_arrow(tables["lineitem"]).repartition(5),
        rd.from_arrow(tables["orders"]),
        rd.from_arrow(tables["customer"]),
        rd.from_arrow(tables["supplier"]),
        rd.from_arrow(tables["nation"]),
        rd.from_arrow(tables["region"]),
        region_name="EVEN",
        date_from=dt.datetime(1996, 1, 1), date_to=dt.datetime(1997, 6, 1),
        num_partitions=8,
    )
    _cmp(ds, con, f"""
SELECT n_name, CAST(sum({_REV}) AS BIGINT) AS revenue_micro
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON n_nationkey = c_nationkey
JOIN region   ON r_regionkey = n_regionkey
WHERE r_name = 'EVEN'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-06-01'
GROUP BY n_name
""")


def test_customer_order_distribution(ray_session, tables, con):
    ds = customer_order_distribution(
        rd.from_arrow(tables["orders"]).repartition(4),
        rd.from_arrow(tables["customer"]),
    )
    _cmp(ds, con, """
SELECT n_orders, count(*)::BIGINT AS n_customers FROM (
  SELECT c_custkey, count(o_orderkey)::BIGINT AS n_orders
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey) GROUP BY n_orders
""")
    # the zero-order tail must be present (customers n_cust//2.. never order)
    got = ds.to_pandas()
    assert (got[got["n_orders"] == 0]["n_customers"] == 20).all()
    assert len(got[got["n_orders"] == 0]) == 1


def test_top_suppliers(ray_session, tables, con):
    ds = top_suppliers(
        rd.from_arrow(tables["lineitem"]).repartition(5),
        rd.from_arrow(tables["supplier"]),
        date_from=dt.datetime(1996, 1, 1), date_to=dt.datetime(1997, 1, 1),
        k=4,
    )
    _cmp(ds, con, f"""
WITH r AS (
  SELECT l_suppkey, CAST(sum({_REV}) AS BIGINT) AS revenue_micro
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey)
SELECT l_suppkey AS s_suppkey, s_name, revenue_micro
FROM r JOIN supplier ON s_suppkey = l_suppkey
ORDER BY revenue_micro DESC, s_suppkey LIMIT 4
""")


def test_global_topk_ties(ray_session):
    # four rows tied at the max — tiebreak column decides, deterministic
    t = pa.table(
        {
            "id": pa.array([3, 1, 2, 4, 5], pa.int64()),
            "score": pa.array([9, 9, 9, 9, 1], pa.int64()),
        }
    )
    got = global_topk(
        rd.from_arrow(t).repartition(3), "score", 3, tiebreak=["id"]
    ).to_pandas()
    assert got["id"].tolist() == [1, 2, 3]
    assert got["score"].tolist() == [9, 9, 9]


# ---------------------------------------------------------------------------
# Q16 / Q18 / Q22 shapes
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tables2():
    """Extension tables for the Q16/Q18/Q22 shapes: parts with
    colliding attribute triples, supplier balances straddling zero,
    customers with only-old / recent / no orders."""
    rng = np.random.RandomState(11)
    n_li, n_part, n_supp, n_ord, n_cust = 800, 60, 10, 120, 30
    li = pa.table({
        "l_orderkey": pa.array(rng.randint(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.randint(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.randint(0, n_supp, n_li), pa.int64()),
        "l_quantity": pa.array(rng.randint(1, 50, n_li).astype(float)),
    })
    part = pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        # few distinct triples → many parts share one (the Q16 trap)
        "p_brand": pa.array(rng.choice(["Brand#1", "Brand#2", "Brand#5"], n_part)),
        "p_type": pa.array(rng.choice(["ECONOMY X", "PROMO Y"], n_part)),
        "p_size": pa.array(rng.randint(1, 13, n_part).astype(np.int32)),
    })
    supplier = pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_acctbal": pa.array(
            np.where(np.arange(n_supp) % 4 == 0, -10.5, 100.25)),
    })
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.randint(0, n_cust - 5, n_ord), pa.int64()),
        "o_orderdate": _ts_array(list(rng.randint(0, 700, n_ord))),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 300_000, n_ord), 2)),
    })
    customer = pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": pa.array([f"cust_{i}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.randint(0, 4, n_cust).astype(np.int32)),
        # mix of negative / low / high balances around the average
        "c_acctbal": pa.array(np.round(rng.uniform(-500, 9000, n_cust), 2)),
    })
    return {"lineitem": li, "part": part, "supplier": supplier,
            "orders": orders, "customer": customer}


@pytest.fixture(scope="module")
def con2(tables2):
    c = duckdb.connect()
    for name, t in tables2.items():
        c.register(name, t)
    return c


def test_part_supplier_counts(ray_session, tables2, con2):
    from obsidian_parser_ray.pipelines.analytics import part_supplier_counts

    ds = part_supplier_counts(
        rd.from_arrow(tables2["lineitem"]).repartition(5),
        rd.from_arrow(tables2["part"]),
        rd.from_arrow(tables2["supplier"]),
        sizes=tuple(range(1, 11)),
    )
    _cmp(ds, con2, """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5' AND p_type NOT LIKE 'ECONOMY%'
  AND p_size BETWEEN 1 AND 10
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
""")


def test_big_orders_threshold_boundary(ray_session, tables2, con2):
    from obsidian_parser_ray.pipelines.analytics import big_orders

    # pick a threshold that lands ON an achieved sum → boundary must
    # be strictly-greater on both sides
    import duckdb as _d
    edge = con2.execute(
        "SELECT sum(l_quantity) FROM lineitem GROUP BY l_orderkey "
        "ORDER BY 1 DESC LIMIT 1 OFFSET 5").fetchone()[0]
    ds = big_orders(
        rd.from_arrow(tables2["lineitem"]).repartition(4),
        rd.from_arrow(tables2["orders"]),
        rd.from_arrow(tables2["customer"]),
        min_qty=float(edge), k=50,
    )
    _cmp(ds, con2, f"""
WITH q AS (
  SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > {edge}
)
SELECT c_name, c_custkey, o_orderkey,
       epoch(o_orderdate)::BIGINT AS o_orderdate_s,
       CAST(floor(o_totalprice * 1000000) AS BIGINT) AS totalprice_micro,
       sum_qty
FROM q JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY totalprice_micro DESC, o_orderkey LIMIT 50
""")


def test_idle_customers(ray_session, tables2, con2):
    from obsidian_parser_ray.pipelines.analytics import idle_customers

    since = dt.datetime(1997, 1, 1)
    ds = idle_customers(
        rd.from_arrow(tables2["customer"]).repartition(3),
        rd.from_arrow(tables2["orders"]),
        since=since,
    )
    _cmp(ds, con2, """
WITH s AS (
  SELECT CAST(sum(CAST(floor(c_acctbal * 1000000) AS BIGINT)) AS BIGINT)
           AS total_micro,
         count(*)::BIGINT AS n_pos
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey, count(*)::BIGINT AS numcust,
  CAST(sum(CAST(floor(c_acctbal * 1000000) AS BIGINT)) AS BIGINT)
    AS totacctbal_micro
FROM customer, s
WHERE CAST(floor(c_acctbal * 1000000) AS BIGINT) * n_pos > total_micro
  AND c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderdate >= TIMESTAMP '1997-01-01')
GROUP BY c_nationkey
""")


def test_revenue_rollup(ray_session, tables, con):
    from obsidian_parser_ray.pipelines.analytics import revenue_rollup

    ds = revenue_rollup(
        rd.from_arrow(tables["lineitem"]).repartition(6),
        rd.from_arrow(tables["supplier"]),
        rd.from_arrow(tables["nation"]),
        rd.from_arrow(tables["region"]),
    )
    _cmp(ds, con, f"""
SELECT COALESCE(r_name, 'ALL') AS r_name,
       COALESCE(n_name, 'ALL') AS n_name,
       CAST(sum(rev_micro) AS BIGINT) AS revenue_micro
FROM (SELECT s_nationkey, {_REV} AS rev_micro
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey) li
JOIN nation ON n_nationkey = s_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY ROLLUP (r_name, n_name)
""")


def test_revenue_rollup_levels_consistent(ray_session, tables):
    """The derived super-aggregates must equal the sums of their
    children (exact integers)."""
    from obsidian_parser_ray.pipelines.analytics import revenue_rollup

    df = revenue_rollup(
        rd.from_arrow(tables["lineitem"]),
        rd.from_arrow(tables["supplier"]),
        rd.from_arrow(tables["nation"]),
        rd.from_arrow(tables["region"]),
    ).to_pandas()
    leaves = df[(df.r_name != "ALL") & (df.n_name != "ALL")]
    regions = df[(df.r_name != "ALL") & (df.n_name == "ALL")]
    total = df[(df.r_name == "ALL") & (df.n_name == "ALL")]
    per_region = leaves.groupby("r_name")["revenue_micro"].sum()
    for r in regions.itertuples():
        assert per_region[r.r_name] == r.revenue_micro
    assert len(total) == 1
    assert total.revenue_micro.iloc[0] == leaves.revenue_micro.sum()


@pytest.mark.usefixtures("ray_session")
class TestMarketShareAndDisjunctive:
    """Q8 / Q19 shapes on a small synthetic star (oracle parity for the
    real tables is covered by the driver twins)."""

    def test_disjunctive_envelope_keeps_all_matches(self):
        import ray.data as rd

        from obsidian_parser_ray.pipelines.analytics import (
            disjunctive_revenue,
        )

        part = pa.table({
            "p_partkey": pa.array([1, 2, 3, 4], pa.int64()),
            "p_brand": pa.array(
                ["Brand#1", "Brand#2", "Brand#3", "Brand#9"]),
            "p_size": pa.array([5, 10, 15, 1], pa.int64()),
        })
        li = pa.table({
            "l_partkey": pa.array([1, 1, 2, 3, 4], pa.int64()),
            "l_quantity": pa.array([5.0, 50.0, 15.0, 25.0, 5.0]),
            "l_extendedprice": pa.array([10.0, 10.0, 20.0, 30.0, 40.0]),
            "l_discount": pa.array([0.0, 0.0, 0.5, 0.0, 0.0]),
        })
        out = disjunctive_revenue(
            rd.from_arrow(li).repartition(2), rd.from_arrow(part),
        ).to_pandas()
        # matches: row0 (Brand#1 qty 5), row2 (Brand#2 qty 15, rev 10),
        # row3 (Brand#3 qty 25); row1 fails qty, row4 wrong brand
        assert out["n_items"].iloc[0] == 3
        assert out["revenue_micro"].iloc[0] == (10 + 10 + 30) * 1_000_000

    def test_market_share_flags_numerator_subset(self):
        import datetime as dt

        import ray.data as rd

        from obsidian_parser_ray.pipelines.analytics import market_share

        nation = pa.table({
            "n_nationkey": pa.array([0, 1], pa.int64()),
            "n_name": pa.array(["N_A", "N_B"]),
            "n_regionkey": pa.array([0, 0], pa.int64()),
        })
        region = pa.table({
            "r_regionkey": pa.array([0], pa.int64()),
            "r_name": pa.array(["R"]),
        })
        part = pa.table({
            "p_partkey": pa.array([1, 2], pa.int64()),
            "p_type": pa.array(["T", "OTHER"]),
        })
        supplier = pa.table({
            "s_suppkey": pa.array([1, 2], pa.int64()),
            "s_nationkey": pa.array([0, 1], pa.int64()),
        })
        customer = pa.table({
            "c_custkey": pa.array([1], pa.int64()),
            "c_nationkey": pa.array([0], pa.int64()),
        })
        orders = pa.table({
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_custkey": pa.array([1, 1], pa.int64()),
            "o_orderdate": pa.array(
                [dt.datetime(1995, 6, 1), dt.datetime(1995, 7, 1)],
                pa.timestamp("us")),
        })
        li = pa.table({
            "l_orderkey": pa.array([1, 2, 2], pa.int64()),
            "l_partkey": pa.array([1, 1, 2], pa.int64()),
            "l_suppkey": pa.array([1, 2, 1], pa.int64()),
            "l_extendedprice": pa.array([100.0, 300.0, 999.0]),
            "l_discount": pa.array([0.0, 0.0, 0.0]),
        })
        out = market_share(
            rd.from_arrow(li), rd.from_arrow(orders),
            rd.from_arrow(customer), rd.from_arrow(supplier),
            rd.from_arrow(part), rd.from_arrow(nation),
            rd.from_arrow(region),
            target_nation="N_A", region_name="R", part_type="T",
            date_from=dt.datetime(1995, 1, 1),
            date_to=dt.datetime(1996, 1, 1),
        ).to_pandas()
        # part 2 excluded by type; nation-A supplier sold 100 of 400
        assert len(out) == 1
        assert out["total_micro"].iloc[0] == 400 * 1_000_000
        assert out["nation_micro"].iloc[0] == 100 * 1_000_000
        assert out["mkt_share"].iloc[0] == 0.25


@pytest.mark.usefixtures("ray_session")
class TestDailyMovingAvg:
    def test_rolling_window_exact(self):
        import ray.data as rd

        from obsidian_parser_ray.pipelines.analytics import daily_moving_avg

        li = pa.table({
            "l_shipdate": pa.array(
                [dt.datetime(2024, 1, d) for d in [1, 1, 2, 3, 4]],
                pa.timestamp("us")),
            "l_extendedprice": pa.array([10.0, 20.0, 30.0, 40.0, 50.0]),
            "l_discount": pa.array([0.0] * 5),
        })
        out = daily_moving_avg(
            rd.from_arrow(li).repartition(3), window=3
        ).to_pandas()
        m = 1_000_000
        assert list(out["day"]) == [20240101, 20240102, 20240103,
                                    20240104]
        assert list(out["rev_micro"]) == [30 * m, 30 * m, 40 * m, 50 * m]
        assert list(out["ma_sum_micro"]) == [30 * m, 60 * m, 100 * m,
                                             120 * m]
        assert list(out["ma_n"]) == [1, 2, 3, 3]
        assert out["ma"].iloc[3] == 120 * m / 3


@pytest.mark.usefixtures("ray_session")
class TestNationShareAndPareto:
    def test_nation_share_sums_to_one_per_region(self):
        import ray.data as rd

        from obsidian_parser_ray.pipelines.analytics import nation_share

        nation = pa.table({
            "n_nationkey": pa.array([0, 1, 2], pa.int64()),
            "n_name": pa.array(["N0", "N1", "N2"]),
            "n_regionkey": pa.array([0, 0, 1], pa.int64()),
        })
        region = pa.table({
            "r_regionkey": pa.array([0, 1], pa.int64()),
            "r_name": pa.array(["R0", "R1"]),
        })
        supplier = pa.table({
            "s_suppkey": pa.array([1, 2, 3], pa.int64()),
            "s_nationkey": pa.array([0, 1, 2], pa.int64()),
        })
        li = pa.table({
            "l_suppkey": pa.array([1, 1, 2, 3], pa.int64()),
            "l_extendedprice": pa.array([10.0, 20.0, 30.0, 40.0]),
            "l_discount": pa.array([0.0] * 4),
        })
        out = nation_share(
            rd.from_arrow(li).repartition(2), rd.from_arrow(supplier),
            rd.from_arrow(nation), rd.from_arrow(region),
        ).to_pandas().set_index("n_name")
        m = 1_000_000
        assert out.loc["N0", "revenue_micro"] == 30 * m
        assert out.loc["N0", "region_micro"] == 60 * m
        assert out.loc["N0", "share"] == 0.5
        assert out.loc["N2", "share"] == 1.0
        g = out.groupby("r_name")["share"].sum()
        assert (abs(g - 1.0) < 1e-12).all()

    def test_pareto_covers_threshold(self):
        import ray.data as rd

        from obsidian_parser_ray.pipelines.analytics import supplier_pareto

        # revenues 50, 30, 15, 5 -> 80% reached after the first two
        li = pa.table({
            "l_suppkey": pa.array([1, 2, 3, 4], pa.int64()),
            "l_extendedprice": pa.array([50.0, 30.0, 15.0, 5.0]),
            "l_discount": pa.array([0.0] * 4),
        })
        out = supplier_pareto(
            rd.from_arrow(li).repartition(2)
        ).to_pandas().set_index("s_suppkey")
        assert out.loc[1, "in_pareto"] and out.loc[2, "in_pareto"]
        # supplier 3 starts at cum-before 80 == exactly 80% -> excluded
        assert not out.loc[3, "in_pareto"]
        assert not out.loc[4, "in_pareto"]
        assert out.loc[2, "cum_micro"] == 80 * 1_000_000


@pytest.mark.usefixtures("ray_session")
class TestYoyGrowth:
    def test_lag_semantics(self):
        import ray.data as rd

        from obsidian_parser_ray.pipelines.analytics import yoy_growth

        nation = pa.table({
            "n_nationkey": pa.array([0], pa.int64()),
            "n_name": pa.array(["N0"]),
            "n_regionkey": pa.array([0], pa.int64()),
        })
        supplier = pa.table({
            "s_suppkey": pa.array([1], pa.int64()),
            "s_nationkey": pa.array([0], pa.int64()),
        })
        li = pa.table({
            "l_suppkey": pa.array([1, 1, 1], pa.int64()),
            "l_shipdate": pa.array(
                [dt.datetime(1995, 6, 1), dt.datetime(1996, 6, 1),
                 dt.datetime(1998, 6, 1)],
                pa.timestamp("us")),
            "l_extendedprice": pa.array([100.0, 150.0, 80.0]),
            "l_discount": pa.array([0.0] * 3),
        })
        out = yoy_growth(
            rd.from_arrow(li).repartition(2), rd.from_arrow(supplier),
            rd.from_arrow(nation),
        ).to_pandas().set_index("yr")
        # only 1996 has a predecessor (1998's 1997 is missing)
        assert list(out.index) == [1996]
        assert out.loc[1996, "yoy"] == 0.5


@pytest.mark.usefixtures("ray_session")
class TestDailyMovingAvgRange:
    def test_calendar_gaps_shrink_window(self):
        import ray.data as rd

        from obsidian_parser_ray.pipelines.analytics import (
            daily_moving_avg_range,
        )

        li = pa.table({
            "l_shipdate": pa.array(
                [dt.datetime(2024, 1, d) for d in [1, 2, 5]],
                pa.timestamp("us")),
            "l_extendedprice": pa.array([10.0, 20.0, 50.0]),
            "l_discount": pa.array([0.0] * 3),
        })
        out = daily_moving_avg_range(
            rd.from_arrow(li).repartition(2), window_days=3
        ).to_pandas()
        m = 1_000_000
        # day 5 is > 2 days after day 2 -> window is only itself
        assert list(out["ma_sum_micro"]) == [10 * m, 30 * m, 50 * m]
        assert list(out["ma_n"]) == [1, 2, 1]


@pytest.mark.usefixtures("ray_session")
class TestQ6NtileFirstLast:
    def test_forecast_discount_amount_not_net(self):
        import ray.data as rd

        from obsidian_parser_ray.pipelines.analytics import (
            forecast_revenue,
        )

        li = pa.table({
            "l_shipdate": pa.array(
                [dt.datetime(1996, 6, 1)] * 3, pa.timestamp("us")),
            "l_discount": pa.array([0.06, 0.06, 0.10]),
            "l_quantity": pa.array([10.0, 30.0, 10.0]),
            "l_extendedprice": pa.array([100.0, 100.0, 100.0]),
        })
        out = forecast_revenue(
            rd.from_arrow(li).repartition(2),
            date_from=dt.datetime(1996, 1, 1),
            date_to=dt.datetime(1997, 1, 1),
            disc_lo=0.05, disc_hi=0.07, qty_max=24.0,
        ).to_pandas()
        # only row 0 passes (row1 qty, row2 discount); 100*0.06 = 6
        assert out["n_items"].iloc[0] == 1
        assert out["revenue_micro"].iloc[0] == 6_000_000

    def test_ntile_uneven_boundaries(self):
        import ray.data as rd

        from obsidian_parser_ray.pipelines.analytics import (
            supplier_quartiles,
        )

        # 6 suppliers -> NTILE(4) sizes 2,2,1,1
        li = pa.table({
            "l_suppkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "l_extendedprice": pa.array(
                [60.0, 50.0, 40.0, 30.0, 20.0, 10.0]),
            "l_discount": pa.array([0.0] * 6),
        })
        out = supplier_quartiles(
            rd.from_arrow(li).repartition(3)
        ).to_pandas().set_index("s_suppkey")
        assert list(out["tile"]) == [1, 1, 2, 2, 3, 4]

    def test_first_last_packed_order(self):
        import ray.data as rd

        from obsidian_parser_ray.pipelines.analytics import (
            customer_first_last,
        )

        orders = pa.table({
            "o_custkey": pa.array([1, 1, 1], pa.int64()),
            "o_orderkey": pa.array([5, 2, 9], pa.int64()),
            "o_orderdate": pa.array(
                [dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 2),
                 dt.datetime(2024, 1, 1)],
                pa.timestamp("us")),
            "o_totalprice": pa.array([10.0, 20.0, 30.0]),
        })
        out = customer_first_last(
            rd.from_arrow(orders).repartition(3)
        ).to_pandas()
        # first = (day 1, key 9, 30); last = (day 2, key 5, 10) — the
        # same-day tie resolves by orderkey (2 < 5)
        assert out["first_price_micro"].iloc[0] == 30_000_000
        assert out["last_price_micro"].iloc[0] == 10_000_000


@pytest.mark.usefixtures("ray_session")
class TestRevenueCube:
    def test_all_four_grouping_sets_consistent(self):
        import ray.data as rd

        from obsidian_parser_ray.pipelines.analytics import revenue_cube

        li = pa.table({
            "l_orderkey": pa.array([1, 1, 2], pa.int64()),
            "l_returnflag": pa.array(["A", "B", "A"]),
            "l_extendedprice": pa.array([10.0, 20.0, 40.0]),
            "l_discount": pa.array([0.0] * 3),
        })
        orders = pa.table({
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_orderpriority": pa.array(["HIGH", "LOW"]),
        })
        out = revenue_cube(
            rd.from_arrow(li).repartition(2), rd.from_arrow(orders),
        ).to_pandas().set_index(["l_returnflag", "o_orderpriority"])
        m = 1_000_000
        assert out.loc[("A", "HIGH"), "revenue_micro"] == 10 * m
        assert out.loc[("A", "ALL"), "revenue_micro"] == 50 * m
        assert out.loc[("ALL", "LOW"), "revenue_micro"] == 40 * m
        assert out.loc[("ALL", "ALL"), "revenue_micro"] == 70 * m
        # lattice consistency: margins sum to the grand total
        flags = out.loc[
            (slice(None), "ALL"), "revenue_micro"
        ].drop(("ALL", "ALL"), errors="ignore")
        assert flags.sum() == 70 * m


@pytest.mark.usefixtures("ray_session")
class TestGiniAndHhi:
    def test_gini_extremes(self):
        import ray.data as rd

        from obsidian_parser_ray.pipelines.analytics import supplier_gini

        # perfectly equal revenues -> G = (n-1)/n - ... actually for
        # equal x: 2*S1 = (n+1)*S0 -> G = 0
        li = pa.table({
            "l_suppkey": pa.array([1, 2, 3, 4], pa.int64()),
            "l_extendedprice": pa.array([10.0] * 4),
            "l_discount": pa.array([0.0] * 4),
        })
        out = supplier_gini(rd.from_arrow(li).repartition(2)).to_pandas()
        assert out["gini"].iloc[0] == 0.0
        # total concentration in one supplier of n -> G = (n-1)/n
        li2 = pa.table({
            "l_suppkey": pa.array([1, 2, 3, 4], pa.int64()),
            "l_extendedprice": pa.array([0.0, 0.0, 0.0, 40.0]),
            "l_discount": pa.array([0.0] * 4),
        })
        out2 = supplier_gini(rd.from_arrow(li2)).to_pandas()
        assert out2["gini"].iloc[0] == 0.75

    def test_hhi_extremes(self):
        import ray.data as rd

        from obsidian_parser_ray.pipelines.analytics import region_hhi

        nation = pa.table({
            "n_nationkey": pa.array([0, 1, 2], pa.int64()),
            "n_name": pa.array(["N0", "N1", "N2"]),
            "n_regionkey": pa.array([0, 0, 1], pa.int64()),
        })
        region = pa.table({
            "r_regionkey": pa.array([0, 1], pa.int64()),
            "r_name": pa.array(["R0", "R1"]),
        })
        supplier = pa.table({
            "s_suppkey": pa.array([1, 2, 3], pa.int64()),
            "s_nationkey": pa.array([0, 1, 2], pa.int64()),
        })
        li = pa.table({
            "l_suppkey": pa.array([1, 2, 3], pa.int64()),
            "l_extendedprice": pa.array([10.0, 10.0, 5.0]),
            "l_discount": pa.array([0.0] * 3),
        })
        out = region_hhi(
            rd.from_arrow(li).repartition(2), rd.from_arrow(supplier),
            rd.from_arrow(nation), rd.from_arrow(region),
        ).to_pandas().set_index("r_name")
        # R0: two equal nations -> HHI = 0.5; R1: monopoly -> 1.0
        assert out.loc["R0", "hhi"] == 0.5
        assert out.loc["R1", "hhi"] == 1.0


@pytest.mark.usefixtures("ray_session")
class TestMissingShipDays:
    def test_spine_gaps(self):
        import ray.data as rd

        from obsidian_parser_ray.pipelines.analytics import (
            missing_ship_days,
        )

        li = pa.table({
            "l_shipdate": pa.array(
                [dt.datetime(2024, 1, d) for d in [1, 2, 4]],
                pa.timestamp("us")),
        })
        out = missing_ship_days(
            rd.from_arrow(li).repartition(2),
            date_from=dt.datetime(2024, 1, 1),
            date_to=dt.datetime(2024, 1, 6),
        ).to_pandas()
        base = (dt.datetime(2024, 1, 1)
                - dt.datetime(1970, 1, 1)).days
        assert list(out["epoch_day"]) == [base + 2, base + 4]


class TestFirstLastProperty:
    """Hypothesis sweep: the packed argmin/argmax reduce must match a
    per-customer nested-loop reference (same-day orderkey ties,
    single-order customers, arbitrary block splits)."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(seed=st.integers(0, 2**16), n=st.integers(1, 50))
    @settings(max_examples=12, deadline=None)
    def test_matches_bruteforce(self, ray_session, seed, n):
        import numpy as np
        import ray.data as rd

        from obsidian_parser_ray.pipelines.analytics import (
            customer_first_last,
        )

        rng = np.random.default_rng(seed)
        orders = pa.table({
            "o_custkey": pa.array(
                rng.integers(0, 6, n).astype("int64")),
            "o_orderkey": pa.array(np.arange(n, dtype="int64")),
            "o_orderdate": pa.array(
                [dt.datetime(2024, 1, 1)
                 + dt.timedelta(days=int(d))
                 for d in rng.integers(0, 5, n)],
                pa.timestamp("us")),
            "o_totalprice": pa.array(
                rng.integers(1, 100, n).astype("float64")),
        })
        out = customer_first_last(
            rd.from_arrow(orders).repartition(3)
        ).to_pandas().set_index("c_custkey")
        df = orders.to_pandas()
        for cust, sub in df.groupby("o_custkey"):
            sub = sub.sort_values(["o_orderdate", "o_orderkey"])
            first, last = sub.iloc[0], sub.iloc[-1]
            assert out.loc[cust, "first_price_micro"] == int(
                first["o_totalprice"] * 1_000_000)
            assert out.loc[cust, "last_price_micro"] == int(
                last["o_totalprice"] * 1_000_000)
