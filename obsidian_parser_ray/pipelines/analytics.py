"""Cross-table relational analytics over the TPC-H-style tables.

The reference engine's analyzer surface is single-table (counts, dup
groups, degree — examples/analyzer.rs:60-96); a training-data engine
additionally needs the classic multi-table shapes: filtered fact→dim
joins, join-then-aggregate, aggregate-then-join, left joins with
absent-key semantics, and global top-k.  This module provides them as
composable Ray-Data pipelines over ``lineitem / orders / customer /
supplier / nation / region`` and exercises the repo's partition-robust
:func:`~obsidian_parser_ray.stages.joins.hash_join_unique` on real
multi-table data.

Scale discipline shared by every pipeline here:

* **Pre-aggregate before every join or shuffle** — the fact table
  (lineitem) is always reduced per block (``pa.Table.group_by`` inside
  ``map_batches``) and then per key BEFORE it meets another table, so
  join inputs are one row per key, never raw fact rows, wherever the
  query allows it.
* **Bounded dims ride the driver, scaling dims ride the shuffle** —
  ``nation``/``region`` are schema-bounded (25/5 rows) and are fetched
  once and captured as Arrow arrays probed with ``pc.index_in``
  (a broadcast map join); ``customer``/``supplier``/``orders`` grow
  with scale and go through ``hash_join_unique`` (shuffle volume
  |probe|+|build|, empty partitions safe).
* **Money is exact int64 micro-units** — every price expression is
  floored to micros with the SAME IEEE-double expression the DuckDB
  oracle uses (``floor(expr * 1000000)``), so distributed sums are
  integer, associative, and bit-reproducible under any block order.
  (At ~1e12-row sums the micro representation approaches int64 range;
  a deployment at that scale would move these columns to decimal128 —
  the pipeline shapes are unchanged.)
* **Global top-k is partial top-k per block + a tiny final sort** —
  never a full sort of the fact table.
"""

from __future__ import annotations

import datetime as _dt

import pyarrow as pa
import pyarrow.compute as pc

_MICRO = 1_000_000.0


def _micro(col) -> pa.Array:
    """floor(col * 1e6) as int64 — parity with SQL
    ``CAST(floor(x * 1000000) AS BIGINT)`` (same double multiply, same
    floor, per row)."""
    return pc.cast(pc.floor(pc.multiply(col, _MICRO)), pa.int64())


def _ts(d: _dt.datetime) -> pa.Scalar:
    return pa.scalar(d, pa.timestamp("us"))


def _epoch_s(col) -> pa.Array:
    """timestamp[us] → epoch seconds int64 (dates are midnight-aligned,
    so the integer division is exact) — oracle: ``epoch(col)::BIGINT``."""
    return pc.divide(pc.cast(col, pa.int64()), 1_000_000)


def _rename_sums(t: pa.Table, mapping: dict[str, str]) -> pa.Table:
    """Name-based rename of ``pa.Table.group_by`` aggregate outputs
    (column ORDER of the aggregate result is not a pyarrow guarantee)."""
    return t.rename_columns([mapping.get(c, c) for c in t.column_names])


def _merge_bounded(partials, keys: list[str], sums: list[str]):
    """Final aggregate for BOUNDED key cardinality (flag/status,
    nation, priority — ≤ dozens of groups): per-block partials are
    already tiny, so coalesce every block into one
    (``repartition(1, shuffle=False)`` is metadata-only — no
    sort-exchange) and merge with a single vectorized ``group_by``
    task.  Saves one full sort barrier versus
    ``Dataset.groupby().aggregate()``; NOT for unbounded keys
    (per-order, per-supplier) — those stay on the shuffle groupby."""

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate([(c, "sum") for c in sums])
        return _rename_sums(g, {c + "_sum": c for c in sums})

    return partials.repartition(1, shuffle=False).map_batches(
        merge, batch_format="pyarrow"
    )


def global_topk(ds, order_col: str, k: int, *, tiebreak: list[str]):
    """Global top-k by ``order_col`` desc: per-block partial top-k
    (a valid combiner — the global top-k is a subset of the union of
    per-block top-ks), then one tiny sort+limit over ≤ k·n_blocks rows.
    Ties broken ascending on ``tiebreak`` for determinism."""
    keys = [(order_col, "descending")] + [(c, "ascending") for c in tiebreak]

    def partial(t: pa.Table) -> pa.Table:
        return t.sort_by(keys).slice(0, k)

    reduced = ds.map_batches(partial, batch_format="pyarrow")
    return reduced.sort(
        [order_col] + list(tiebreak),
        descending=[True] + [False] * len(tiebreak),
    ).limit(k)


# ---------------------------------------------------------------------------
# Q1-shape: pricing summary (pure partial aggregate, no join)
# ---------------------------------------------------------------------------


def pricing_summary(lineitem, *, cutoff: _dt.datetime):
    """Per (returnflag, linestatus) pricing roll-up of shipped items.

    map_batches: filter + per-block ``pa.Table.group_by`` partials
    (≤ 6 rows leave each block) → one coalesced merge task (bounded
    key space — no sort barrier)."""
    cut = _ts(cutoff)
    sums = [
        "sum_qty_micro",
        "sum_base_micro",
        "sum_disc_micro",
        "sum_charge_micro",
        "sum_discount_micro",
        "count_order",
    ]

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cut))
        ep = t["l_extendedprice"]
        one_minus_d = pc.subtract(pa.scalar(1.0), t["l_discount"])
        disc_price = pc.multiply(ep, one_minus_d)
        charge = pc.multiply(
            disc_price, pc.add(pa.scalar(1.0), t["l_tax"])
        )
        flat = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty_micro": _micro(t["l_quantity"]),
                "sum_base_micro": _micro(ep),
                "sum_disc_micro": _micro(disc_price),
                "sum_charge_micro": _micro(charge),
                "sum_discount_micro": _micro(t["l_discount"]),
                "count_order": pa.array([1] * t.num_rows, pa.int64()),
            }
        )
        g = flat.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [(c, "sum") for c in sums]
        )
        return _rename_sums(g, {c + "_sum": c for c in sums})

    return _merge_bounded(
        lineitem.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"], sums,
    )


# ---------------------------------------------------------------------------
# Q3-shape: top unshipped orders by revenue (semi join + agg + join + top-k)
# ---------------------------------------------------------------------------


def _revenue_per_order(lineitem, *, after: _dt.datetime | None):
    """lineitem → one (l_orderkey, revenue_micro) row per order:
    per-block partial sum, then a global groupby-sum."""
    from ray.data.aggregate import Sum

    cut = _ts(after) if after is not None else None

    def partial(t: pa.Table) -> pa.Table:
        if cut is not None:
            t = t.filter(pc.greater(t["l_shipdate"], cut))
        rev = _micro(
            pc.multiply(
                t["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), t["l_discount"]),
            )
        )
        flat = pa.table({"l_orderkey": t["l_orderkey"], "revenue_micro": rev})
        g = flat.group_by("l_orderkey").aggregate([("revenue_micro", "sum")])
        return _rename_sums(g, {"revenue_micro_sum": "revenue_micro"})

    return lineitem.map_batches(partial, batch_format="pyarrow").groupby(
        "l_orderkey"
    ).aggregate(Sum("revenue_micro", alias_name="revenue_micro"))


def top_orders_by_revenue(lineitem, orders, customer, *,
                          segment: str = "BUILDING",
                          cutoff: _dt.datetime = _dt.datetime(1998, 3, 15),
                          k: int = 10, num_partitions: int = 64):
    """Top-k open orders by pending-lineitem revenue for one market
    segment (the Q3 shape).

    customer(segment) ──semi──▶ orders(date<cutoff) ──inner──▶
    per-order revenue of lineitems shipping AFTER cutoff → global
    top-k.  Output: (o_orderkey, revenue_micro, o_orderdate_s,
    o_orderpriority)."""
    from ..stages.joins import hash_join_unique

    cut = _ts(cutoff)

    def cust_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["c_mktsegment"], pa.scalar(segment)))
        return pa.table({"c_custkey": t["c_custkey"]})

    def open_orders(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["o_orderdate"], cut))
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "o_orderdate_s": _epoch_s(t["o_orderdate"]),
                "o_orderpriority": t["o_orderpriority"],
            }
        )

    ords = hash_join_unique(
        orders.map_batches(open_orders, batch_format="pyarrow"),
        customer.map_batches(cust_keys, batch_format="pyarrow"),
        left_key="o_custkey", right_key="c_custkey", how="semi",
        num_partitions=num_partitions,
    ).drop_columns(["o_custkey"])

    rev = _revenue_per_order(lineitem, after=cutoff)
    joined = hash_join_unique(
        rev, ords, left_key="l_orderkey", right_key="o_orderkey",
        how="inner", num_partitions=num_partitions,
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["o_orderkey" if c == "l_orderkey" else c for c in t.column_names]
        )

    return global_topk(
        joined.map_batches(rename, batch_format="pyarrow"),
        "revenue_micro", k, tiebreak=["o_orderkey"],
    )


# ---------------------------------------------------------------------------
# Q4-shape: late-shipment order priority counts (agg + join + date math)
# ---------------------------------------------------------------------------


def late_order_priority(lineitem, orders, *, late_days: int = 90):
    """Count orders per priority whose LAST lineitem shipped more than
    ``late_days`` after the order date.

    lineitem → per-order max(l_shipdate) (partial max per block, then a
    global groupby-max) ──inner──▶ orders → lateness filter → tiny
    priority groupby.  Output: (o_orderpriority, n_late_orders)."""
    from ray.data.aggregate import Max

    from ..stages.joins import hash_join_unique

    def partial(t: pa.Table) -> pa.Table:
        flat = pa.table(
            {"l_orderkey": t["l_orderkey"], "max_ship": t["l_shipdate"]}
        )
        g = flat.group_by("l_orderkey").aggregate([("max_ship", "max")])
        return _rename_sums(g, {"max_ship_max": "max_ship"})

    max_ship = lineitem.map_batches(partial, batch_format="pyarrow").groupby(
        "l_orderkey"
    ).aggregate(Max("max_ship", alias_name="max_ship"))

    joined = hash_join_unique(
        max_ship,
        orders.select_columns(["o_orderkey", "o_orderdate", "o_orderpriority"]),
        left_key="l_orderkey", right_key="o_orderkey", how="inner",
    )
    late = pa.scalar(_dt.timedelta(days=late_days))

    def count_late(t: pa.Table) -> pa.Table:
        keep = pc.greater(t["max_ship"], pc.add(t["o_orderdate"], late))
        t = t.filter(keep)
        flat = pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "n_late_orders": pa.array([1] * t.num_rows, pa.int64()),
            }
        )
        g = flat.group_by("o_orderpriority").aggregate([("n_late_orders", "sum")])
        return _rename_sums(g, {"n_late_orders_sum": "n_late_orders"})

    return _merge_bounded(
        joined.map_batches(count_late, batch_format="pyarrow"),
        ["o_orderpriority"], ["n_late_orders"],
    )


# ---------------------------------------------------------------------------
# Q5-shape: regional nation revenue (fact ⋈ 3 scaling dims ⋈ 2 bounded dims)
# ---------------------------------------------------------------------------


def region_nation_revenue(lineitem, orders, customer, supplier, nation,
                          region, *, region_name: str = "ASIA",
                          date_from: _dt.datetime = _dt.datetime(1996, 1, 1),
                          date_to: _dt.datetime = _dt.datetime(1997, 1, 1),
                          num_partitions: int = 64):
    """Revenue per nation where customer and supplier share the nation
    and the nation is in ``region_name`` (the Q5 shape).

    ``nation``/``region`` are schema-bounded dims: fetched ONCE on the
    driver and captured as Arrow arrays (broadcast map join, probed via
    ``pc.index_in``); the nationkey membership filter is applied the
    moment c_nationkey exists, shrinking every later exchange ~5×.
    The scaling sides (customer projection, the date+region-filtered
    order set, supplier) go through the size-ADAPTIVE join
    (:func:`~obsidian_parser_ray.stages.joins.broadcast_join_unique`):
    map-side broadcast while the build side fits the guard, automatic
    fallback to the partition-robust shuffle join past it — the fact
    table is never counted or materialized either way.
    Output: (n_name, revenue_micro)."""
    from ..stages.joins import broadcast_join_unique

    # bounded dims (25 + 5 rows by schema): one driver fetch, no shuffle
    nat = pa.concat_tables(
        [b for b in nation.iter_batches(batch_format="pyarrow")]
        or [pa.table({"n_nationkey": pa.array([], pa.int32()),
                      "n_name": pa.array([], pa.string()),
                      "n_regionkey": pa.array([], pa.int32())})]
    )
    reg = pa.concat_tables(
        [b for b in region.iter_batches(batch_format="pyarrow")]
        or [pa.table({"r_regionkey": pa.array([], pa.int32()),
                      "r_name": pa.array([], pa.string())})]
    )
    keep_region = reg.filter(pc.equal(reg["r_name"], pa.scalar(region_name)))
    region_keys = keep_region["r_regionkey"].combine_chunks()
    nat_in_region = nat.filter(pc.is_in(nat["n_regionkey"], value_set=region_keys))
    nation_keys = nat_in_region["n_nationkey"].combine_chunks()
    nation_names = nat_in_region["n_name"].combine_chunks()

    lo, hi = _ts(date_from), _ts(date_to)

    def order_rows(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t["o_orderdate"], lo),
            pc.less(t["o_orderdate"], hi),
        )
        t = t.filter(keep)
        return pa.table(
            {"o_orderkey": t["o_orderkey"], "o_custkey": t["o_custkey"]}
        )

    # orders ⋈ customer → c_nationkey; size-adaptive: broadcast the
    # customer projection while it fits, shuffle-join past the guard
    ordc = broadcast_join_unique(
        orders.map_batches(order_rows, batch_format="pyarrow"),
        customer.select_columns(["c_custkey", "c_nationkey"]),
        left_key="o_custkey", right_key="c_custkey", how="inner",
        num_partitions=num_partitions,
    )

    def in_region(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["c_nationkey"], value_set=nation_keys))
        return pa.table(
            {"o_orderkey": t["o_orderkey"], "c_nationkey": t["c_nationkey"]}
        )

    ordc = ordc.map_batches(in_region, batch_format="pyarrow")

    def li_rows(t: pa.Table) -> pa.Table:
        rev = _micro(
            pc.multiply(
                t["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), t["l_discount"]),
            )
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "revenue_micro": rev,
            }
        )

    li = lineitem.map_batches(li_rows, batch_format="pyarrow")
    # ordc is the date+region-FILTERED order set — small at moderate
    # selectivity, fact-sized in the worst case → size-adaptive again;
    # the fact side (lineitem) is never counted, never materialized
    li_ord = broadcast_join_unique(
        li, ordc, left_key="l_orderkey", right_key="o_orderkey", how="inner",
        num_partitions=num_partitions,
    )
    # supplier is the smallest scaling dim (TPC-H SF×10k) → map-side
    # broadcast join (no second sort-exchange of the fact rows); the
    # guard falls back to the shuffle join past 2M suppliers
    li_supp = broadcast_join_unique(
        li_ord, supplier.select_columns(["s_suppkey", "s_nationkey"]),
        left_key="l_suppkey", right_key="s_suppkey", how="inner",
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["c_nationkey"], t["s_nationkey"]))
        idx = pc.index_in(t["c_nationkey"], nation_keys)
        flat = pa.table(
            {
                "n_name": pc.take(nation_names, idx),
                "revenue_micro": t["revenue_micro"],
            }
        )
        g = flat.group_by("n_name").aggregate([("revenue_micro", "sum")])
        return _rename_sums(g, {"revenue_micro_sum": "revenue_micro"})

    return _merge_bounded(
        li_supp.map_batches(finish, batch_format="pyarrow"),
        ["n_name"], ["revenue_micro"],
    )


# ---------------------------------------------------------------------------
# Q13-shape: customer order-count distribution (left join, absent keys = 0)
# ---------------------------------------------------------------------------


def customer_order_distribution(orders, customer):
    """Distribution of per-customer order counts INCLUDING customers
    with zero orders (the left-join-with-absent-keys shape).

    orders → per-custkey partial counts → groupby-sum; customer
    ──left──▶ counts, null→0; tiny groupby over the count value.
    Output: (n_orders, n_customers)."""
    from ray.data.aggregate import Sum

    from ..stages.joins import hash_join_unique

    def partial(t: pa.Table) -> pa.Table:
        flat = pa.table(
            {
                "o_custkey": t["o_custkey"],
                "n_orders": pa.array([1] * t.num_rows, pa.int64()),
            }
        )
        g = flat.group_by("o_custkey").aggregate([("n_orders", "sum")])
        return _rename_sums(g, {"n_orders_sum": "n_orders"})

    counts = orders.map_batches(partial, batch_format="pyarrow").groupby(
        "o_custkey"
    ).aggregate(Sum("n_orders", alias_name="n_orders"))

    joined = hash_join_unique(
        customer.select_columns(["c_custkey"]), counts,
        left_key="c_custkey", right_key="o_custkey", how="left",
    )

    def dist(t: pa.Table) -> pa.Table:
        n = pc.fill_null(t["n_orders"], pa.scalar(0, pa.int64()))
        flat = pa.table(
            {"n_orders": n, "n_customers": pa.array([1] * t.num_rows, pa.int64())}
        )
        g = flat.group_by("n_orders").aggregate([("n_customers", "sum")])
        return _rename_sums(g, {"n_customers_sum": "n_customers"})

    return _merge_bounded(
        joined.map_batches(dist, batch_format="pyarrow"),
        ["n_orders"], ["n_customers"],
    )


# ---------------------------------------------------------------------------
# Q15-shape: top suppliers by shipped revenue in a window
# ---------------------------------------------------------------------------


def top_suppliers(lineitem, supplier, *,
                  date_from: _dt.datetime = _dt.datetime(1996, 1, 1),
                  date_to: _dt.datetime = _dt.datetime(1996, 4, 1),
                  k: int = 10):
    """Top-k suppliers by lineitem revenue shipped in [from, to).

    lineitem → per-suppkey partial revenue → groupby-sum → broadcast
    name join (supplier is the smallest scaling dim) → global top-k.
    Output: (s_suppkey, s_name, revenue_micro)."""
    from ray.data.aggregate import Sum

    from ..stages.joins import broadcast_join_unique

    lo, hi = _ts(date_from), _ts(date_to)

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi)
        )
        t = t.filter(keep)
        rev = _micro(
            pc.multiply(
                t["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), t["l_discount"]),
            )
        )
        flat = pa.table({"l_suppkey": t["l_suppkey"], "revenue_micro": rev})
        g = flat.group_by("l_suppkey").aggregate([("revenue_micro", "sum")])
        return _rename_sums(g, {"revenue_micro_sum": "revenue_micro"})

    rev = lineitem.map_batches(partial, batch_format="pyarrow").groupby(
        "l_suppkey"
    ).aggregate(Sum("revenue_micro", alias_name="revenue_micro"))

    joined = broadcast_join_unique(
        rev, supplier.select_columns(["s_suppkey", "s_name"]),
        left_key="l_suppkey", right_key="s_suppkey", how="inner",
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["s_suppkey" if c == "l_suppkey" else c for c in t.column_names]
        )

    return global_topk(
        joined.map_batches(rename, batch_format="pyarrow"),
        "revenue_micro", k, tiebreak=["s_suppkey"],
    )
