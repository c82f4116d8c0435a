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

import numpy as np
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
    """lineitem → one (l_orderkey, revenue_micro) row per order via
    the partitioned Arrow aggregate (orderkey is fact-scale)."""
    from ..stages.joins import grouped_aggregate

    cut = _ts(after) if after is not None else None

    def rows(t: pa.Table) -> pa.Table:
        if cut is not None:
            t = t.filter(pc.greater(t["l_shipdate"], cut))
        rev = _micro(
            pc.multiply(
                t["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), t["l_discount"]),
            )
        )
        return pa.table(
            {"l_orderkey": t["l_orderkey"], "revenue_micro": rev}
        )

    return grouped_aggregate(
        lineitem.map_batches(rows, batch_format="pyarrow"),
        ["l_orderkey"], [("revenue_micro", "sum", "revenue_micro")],
    )


def top_orders_by_revenue(lineitem, orders, customer, *,
                          segment: str = "BUILDING",
                          cutoff: _dt.datetime = _dt.datetime(1998, 3, 15),
                          k: int = 10, num_partitions: int = 64):
    """Top-k open orders by pending-lineitem revenue for one market
    segment (the Q3 shape).

    customer(segment) ──semi──▶ orders(date<cutoff) ──inner──▶
    per-order revenue of lineitems shipping AFTER cutoff → global
    top-k.  Output: (o_orderkey, revenue_micro, o_orderdate_s,
    o_orderpriority).

    Both joins go through the guarded size-adaptive broadcast join:
    the segment key set and the filtered open-order table are
    dimension/filtered-fact sized (map-side while they fit, shuffle
    fallback past the guard) — at sf0.1 this halves the query wall.
    """
    from ..stages.joins import broadcast_join_unique

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

    ords = broadcast_join_unique(
        orders.map_batches(open_orders, batch_format="pyarrow"),
        customer.map_batches(cust_keys, batch_format="pyarrow"),
        left_key="o_custkey", right_key="c_custkey", how="semi",
        num_partitions=num_partitions,
    ).drop_columns(["o_custkey"])

    rev = _revenue_per_order(lineitem, after=cutoff)
    joined = broadcast_join_unique(
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

    from ..stages.joins import hash_join_unique

    def partial(t: pa.Table) -> pa.Table:
        flat = pa.table(
            {"l_orderkey": t["l_orderkey"], "max_ship": t["l_shipdate"]}
        )
        g = flat.group_by("l_orderkey").aggregate([("max_ship", "max")])
        return _rename_sums(g, {"max_ship_max": "max_ship"})

    from ..stages.joins import broadcast_join_unique, grouped_aggregate

    max_ship = grouped_aggregate(
        lineitem.map_batches(partial, batch_format="pyarrow"),
        ["l_orderkey"], [("max_ship", "max", "max_ship")],
    )

    # guarded adaptive: the 3-column order side rides map-side while
    # it fits, falls back to the shuffle join at scale
    joined = broadcast_join_unique(
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

    def partial(t: pa.Table) -> pa.Table:
        flat = pa.table(
            {
                "o_custkey": t["o_custkey"],
                "n_orders": pa.array([1] * t.num_rows, pa.int64()),
            }
        )
        g = flat.group_by("o_custkey").aggregate([("n_orders", "sum")])
        return _rename_sums(g, {"n_orders_sum": "n_orders"})

    from ..stages.joins import broadcast_join_unique, grouped_aggregate

    counts = grouped_aggregate(
        orders.map_batches(partial, batch_format="pyarrow"),
        ["o_custkey"], [("n_orders", "sum", "n_orders")],
    )

    joined = broadcast_join_unique(
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


# ---------------------------------------------------------------------------
# Q16-shape: distinct suppliers per part attribute group
# ---------------------------------------------------------------------------


def part_supplier_counts(lineitem, part, supplier, *,
                         exclude_brand: str = "Brand#5",
                         exclude_type_prefix: str = "ECONOMY",
                         sizes: tuple[int, ...] = (1, 2, 3, 4, 5, 6, 7, 8, 9, 10)):
    """Q16 shape (``reference has no relational layer; TPC-H Q16
    semantics over the driver tables``): how many DISTINCT suppliers
    ship each (brand, type, size) part group, excluding one brand, one
    type prefix, and suppliers in bad standing (negative balance — the
    stand-in for Q16's complaints subquery).

    Scale shape: COUNT(DISTINCT) is a pre-dedup, not a fused
    aggregate — lineitem is locally deduped to (partkey, suppkey)
    pairs inside each block (a huge reducer: ~60 rows/pair in TPC-H),
    then one multi-key hash groupby makes the pairs globally unique,
    an anti join drops bad suppliers (bounded negative-balance dim),
    a partkey hash join attaches part attributes, and the final
    (brand, type, size) count is a per-block partial merged with one
    tiny task (25×6×50 bounded groups).  No all-to-all beyond the two
    key shuffles; nothing driver-side.

    Output: (p_brand, p_type, p_size, supplier_cnt).
    """
    from ..stages.joins import broadcast_join_unique, distinct_rows

    # partitioned Arrow distinct (stages/joins.py distinct_rows) — the
    # pair key set is fact-scale, where Ray's multi-key sort aggregate
    # is the measured pathology
    pairs = distinct_rows(lineitem, ["l_partkey", "l_suppkey"])

    def bad(t: pa.Table) -> pa.Table:
        return pa.table(
            {"s_suppkey": t.filter(pc.less(t["s_acctbal"], 0.0))["s_suppkey"]}
        )

    bad_suppliers = supplier.map_batches(bad, batch_format="pyarrow")
    pairs = broadcast_join_unique(
        pairs, bad_suppliers, left_key="l_suppkey", right_key="s_suppkey",
        how="anti",
    )

    def part_attrs(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.not_equal(t["p_brand"], exclude_brand),
                pc.invert(pc.starts_with(t["p_type"], exclude_type_prefix)),
            ),
            pc.is_in(t["p_size"], pa.array(sizes, t["p_size"].type)),
        )
        return t.filter(keep).select(["p_partkey", "p_brand", "p_type", "p_size"])

    attrs = part.map_batches(part_attrs, batch_format="pyarrow")
    joined = broadcast_join_unique(
        pairs, attrs, left_key="l_partkey", right_key="p_partkey", how="inner",
    )

    # DISTINCT is per (brand, type, size) GROUP, not per part: a
    # supplier shipping two parts that share the attribute triple
    # counts once — dedupe locally (reducer), then one hash groupby
    # over the 4-tuple makes it global (cardinality ≤ groups ×
    # suppliers, far below the pair table).
    group_suppliers = distinct_rows(
        joined, ["p_brand", "p_type", "p_size", "l_suppkey"]
    )

    def partial(t: pa.Table) -> pa.Table:
        flat = pa.table({
            "p_brand": t["p_brand"], "p_type": t["p_type"],
            "p_size": t["p_size"],
            "supplier_cnt": pa.array([1] * t.num_rows, pa.int64()),
        })
        g = flat.group_by(["p_brand", "p_type", "p_size"]).aggregate(
            [("supplier_cnt", "sum")]
        )
        return _rename_sums(g, {"supplier_cnt_sum": "supplier_cnt"})

    return _merge_bounded(
        group_suppliers.map_batches(partial, batch_format="pyarrow"),
        ["p_brand", "p_type", "p_size"], ["supplier_cnt"],
    )


# ---------------------------------------------------------------------------
# Q18-shape: large-volume orders (HAVING on a big groupby, then joins)
# ---------------------------------------------------------------------------


def big_orders(lineitem, orders, customer, *,
               min_qty: float = 300.0, k: int = 100):
    """Q18 shape: orders whose total lineitem quantity exceeds
    ``min_qty``, with customer names, top-``k`` by total price.

    Scale shape: the HAVING filter runs on the big side FIRST —
    per-block partial sums of quantity per orderkey, one hash groupby,
    then the > min_qty filter collapses the set to a tiny survivor
    table (TPC-H: ~1 row per 15k orders).  Joins against orders and
    customer are keyed hash joins driven by that tiny left side; the
    final ranking is a partial top-k.  Quantities are integer-valued
    doubles (TPC-H qty ∈ [1, 50]) so the distributed sum is
    order-independent and exact.

    Output: (c_name, c_custkey, o_orderkey, o_orderdate_s,
    totalprice_micro, sum_qty).
    """
    from ..stages.joins import grouped_aggregate, hash_join_unique

    def as_qty(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderkey": t["l_orderkey"], "sum_qty": t["l_quantity"]}
        )

    # orderkey is fact-scale: the partitioned Arrow aggregate (2.9x
    # the Ray sort aggregate on this shape at sf0.1)
    qty = grouped_aggregate(
        lineitem.map_batches(as_qty, batch_format="pyarrow"),
        ["o_orderkey"], [("sum_qty", "sum", "sum_qty")],
    )

    def having(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["sum_qty"], min_qty))
        return t.set_column(
            t.schema.get_field_index("sum_qty"), "sum_qty",
            pc.cast(t["sum_qty"], pa.int64()),
        )

    survivors = qty.map_batches(having, batch_format="pyarrow")

    def order_cols(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"], "o_custkey": t["o_custkey"],
            "o_orderdate_s": _epoch_s(t["o_orderdate"]),
            "totalprice_micro": _micro(t["o_totalprice"]),
        })

    from ..stages.joins import broadcast_join_unique

    # swapped orientation: the HAVING survivors are the TINY side
    # (~1 row / 15k orders), so they broadcast and the orders table is
    # never shuffled (inner join is symmetric; survivors unique per
    # orderkey keeps the right-unique contract)
    joined = broadcast_join_unique(
        orders.map_batches(order_cols, batch_format="pyarrow"), survivors,
        left_key="o_orderkey", how="inner",
    )
    joined = broadcast_join_unique(
        joined, customer.select_columns(["c_custkey", "c_name"]),
        left_key="o_custkey", right_key="c_custkey", how="inner",
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["c_custkey" if c == "o_custkey" else c for c in t.column_names]
        )

    return global_topk(
        joined.map_batches(rename, batch_format="pyarrow"),
        "totalprice_micro", k, tiebreak=["o_orderkey"],
    )


# ---------------------------------------------------------------------------
# Q22-shape: idle high-balance customers (global scalar + anti join)
# ---------------------------------------------------------------------------


def idle_customers(customer, orders, *,
                   since: _dt.datetime = _dt.datetime(1997, 6, 1)):
    """Q22 shape: customers whose balance exceeds the positive-balance
    average and who placed no order on/after ``since``, counted per
    nation (the driver corpus has no order-less customers, so the
    anti join runs against the recent-order subset — same shape,
    non-vacuous result).

    The global average is never computed as a double (a distributed
    double sum is order-dependent): the threshold test
    ``c_acctbal > avg`` is evaluated as the exact integer cross
    multiplication ``bal_micro * n_pos > total_micro`` over
    ``floor(c_acctbal·1e6)`` partial sums — both sides replicate it
    bit-for-bit.  (Overflow bound: |bal_micro| ≤ 1e10 and n_pos ≤ 9e8
    before i64 overflow — fine past 100 TB of customers.)

    Scale shape: one tiny 2-number aggregate broadcast into the
    filter, one anti join against the orders custkey projection
    (presence check — right side needs no dedup), bounded per-nation
    partials merged in a single task.

    Output: (c_nationkey, numcust, totacctbal_micro).
    """
    from ..stages.joins import broadcast_join_unique

    def bal_partial(t: pa.Table) -> pa.Table:
        pos = t.filter(pc.greater(t["c_acctbal"], 0.0))
        micro = _micro(pos["c_acctbal"])
        return pa.table({
            "total_micro": pa.array(
                [pc.sum(micro).as_py() or 0], pa.int64()),
            "n_pos": pa.array([len(pos)], pa.int64()),
        })

    stats = (
        customer.map_batches(bal_partial, batch_format="pyarrow")
        .repartition(1, shuffle=False)
        .map_batches(
            lambda t: pa.table({
                "total_micro": pa.array(
                    [pc.sum(t["total_micro"]).as_py() or 0], pa.int64()),
                "n_pos": pa.array(
                    [pc.sum(t["n_pos"]).as_py() or 0], pa.int64()),
            }),
            batch_format="pyarrow",
        )
        .take(1)[0]
    )
    total_micro, n_pos = stats["total_micro"], stats["n_pos"]

    def rich(t: pa.Table) -> pa.Table:
        bal_micro = _micro(t["c_acctbal"])
        keep = pc.greater(
            pc.multiply(bal_micro, pa.scalar(n_pos, pa.int64())),
            pa.scalar(total_micro, pa.int64()),
        )
        t = t.filter(keep)
        return pa.table({
            "c_custkey": t["c_custkey"],
            "c_nationkey": t["c_nationkey"],
            "bal_micro": _micro(t["c_acctbal"]),
        })

    rich_customers = customer.map_batches(rich, batch_format="pyarrow")
    lo = _ts(since)

    def recent(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["o_orderdate"], lo))
        return t.select(["o_custkey"])

    idle = broadcast_join_unique(
        rich_customers, orders.map_batches(recent, batch_format="pyarrow"),
        left_key="c_custkey", right_key="o_custkey", how="anti",
    )

    def partial(t: pa.Table) -> pa.Table:
        flat = pa.table({
            "c_nationkey": t["c_nationkey"],
            "numcust": pa.array([1] * t.num_rows, pa.int64()),
            "totacctbal_micro": t["bal_micro"],
        })
        g = flat.group_by("c_nationkey").aggregate(
            [("numcust", "sum"), ("totacctbal_micro", "sum")]
        )
        return _rename_sums(g, {
            "numcust_sum": "numcust",
            "totacctbal_micro_sum": "totacctbal_micro",
        })

    return _merge_bounded(
        idle.map_batches(partial, batch_format="pyarrow"),
        ["c_nationkey"], ["numcust", "totacctbal_micro"],
    )


# ---------------------------------------------------------------------------
# ROLLUP: hierarchical revenue totals (region → nation → grand total)
# ---------------------------------------------------------------------------


def revenue_rollup(lineitem, supplier, nation, region):
    """``GROUP BY ROLLUP (r_name, n_name)`` over supplier-side revenue:
    leaf (region, nation) totals plus per-region subtotals plus the
    grand total, with rolled-up levels labelled ``'ALL'``.

    Scale shape: revenue is reduced to per-suppkey integer-micro
    partials inside each lineitem block, attached to nations via ONE
    size-adaptive join against supplier (broadcast under the guard,
    hash shuffle past it), folded to bounded (r_name, n_name) partials
    map-side, and merged in a single tiny task.  The rollup levels are
    DERIVED from the leaf aggregate in that same final task — super-
    aggregates are exact integer sums of the leaves, so no second pass
    over the data and no extra shuffle.

    Output: (r_name, n_name, revenue_micro) with 'ALL' markers.
    """
    from ..stages.joins import broadcast_join_unique

    def li_partial(t: pa.Table) -> pa.Table:
        rev = _micro(
            pc.multiply(
                t["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), t["l_discount"]),
            )
        )
        flat = pa.table({"l_suppkey": t["l_suppkey"], "revenue_micro": rev})
        g = flat.group_by("l_suppkey").aggregate([("revenue_micro", "sum")])
        return _rename_sums(g, {"revenue_micro_sum": "revenue_micro"})

    partials = lineitem.map_batches(li_partial, batch_format="pyarrow")
    joined = broadcast_join_unique(
        partials, supplier.select_columns(["s_suppkey", "s_nationkey"]),
        left_key="l_suppkey", right_key="s_suppkey", how="inner",
    )

    # nation → (n_name, r_name) is a bounded dim (25 × 5): fetch once,
    # probe map-side
    n_tab = pa.concat_tables(
        [b for b in nation.iter_batches(batch_format="pyarrow")],
        promote_options="default",
    ) if hasattr(nation, "iter_batches") else nation
    r_tab = pa.concat_tables(
        [b for b in region.iter_batches(batch_format="pyarrow")],
        promote_options="default",
    ) if hasattr(region, "iter_batches") else region
    r_names = dict(zip(
        r_tab["r_regionkey"].to_pylist(), r_tab["r_name"].to_pylist()
    ))
    nk = n_tab["n_nationkey"].to_pylist()
    n_map = {
        k: (r_names[rk], nm)
        for k, nm, rk in zip(
            nk, n_tab["n_name"].to_pylist(), n_tab["n_regionkey"].to_pylist()
        )
    }

    def to_names(t: pa.Table) -> pa.Table:
        nk_keys = pa.array(nk, pa.int64())
        r_arr = pa.array([n_map[u][0] for u in nk])
        n_arr = pa.array([n_map[u][1] for u in nk])
        idx = pc.index_in(
            pc.cast(t["s_nationkey"], pa.int64()), value_set=nk_keys
        )
        flat = pa.table({
            "r_name": pc.take(r_arr, idx),
            "n_name": pc.take(n_arr, idx),
            "revenue_micro": t["revenue_micro"],
        })
        g = flat.group_by(["r_name", "n_name"]).aggregate(
            [("revenue_micro", "sum")]
        )
        return _rename_sums(g, {"revenue_micro_sum": "revenue_micro"})

    def rollup(t: pa.Table) -> pa.Table:
        leaf = t.group_by(["r_name", "n_name"]).aggregate(
            [("revenue_micro", "sum")]
        )
        leaf = _rename_sums(leaf, {"revenue_micro_sum": "revenue_micro"})
        per_region = leaf.group_by("r_name").aggregate(
            [("revenue_micro", "sum")]
        )
        per_region = _rename_sums(
            per_region, {"revenue_micro_sum": "revenue_micro"}
        ).append_column(
            "n_name", pa.array(["ALL"] * per_region.num_rows)
        ).select(["r_name", "n_name", "revenue_micro"])
        total = pa.table({
            "r_name": pa.array(["ALL"]),
            "n_name": pa.array(["ALL"]),
            "revenue_micro": pa.array(
                [pc.sum(leaf["revenue_micro"]).as_py() or 0], pa.int64()),
        })
        return pa.concat_tables(
            [leaf.select(["r_name", "n_name", "revenue_micro"]),
             per_region, total],
            promote_options="default",
        )

    return (
        joined.map_batches(to_names, batch_format="pyarrow")
        .repartition(1, shuffle=False)
        .map_batches(rollup, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Q7-shape: shipping volume between nation pairs, per year
# ---------------------------------------------------------------------------


def nations_volume(lineitem, orders, customer, supplier, nation, *,
                   nation_a: str = "NATION_1", nation_b: str = "NATION_2",
                   date_from: _dt.datetime = _dt.datetime(1995, 1, 1),
                   date_to: _dt.datetime = _dt.datetime(1997, 1, 1),
                   num_partitions: int = 64):
    """Revenue shipped between two nations (either direction), broken
    down by (supplier nation, customer nation, ship year) — the Q7
    shape: a fact table that needs BOTH a supplier-side and a
    customer-side dim chain before the aggregate.

    Scale shape: the shipdate filter prunes at the first map; the
    supplier chain resolves FIRST (supplier is the smallest scaling
    dim) so the two-nation filter can drop ~23/25ths of the fact rows
    BEFORE the expensive order/customer joins; orders and customer go
    through the size-adaptive join.  The final key space is bounded
    (2 directions × years), so partials merge in one tiny task.

    Output: (supp_nation, cust_nation, l_year, revenue_micro).
    """
    from ..stages.joins import broadcast_join_unique

    nat = pa.concat_tables(
        [b for b in nation.iter_batches(batch_format="pyarrow")]
    )
    keep = pc.is_in(
        nat["n_name"], value_set=pa.array([nation_a, nation_b])
    )
    nat = nat.filter(keep)
    nation_keys = pc.cast(nat["n_nationkey"], pa.int64()).combine_chunks()
    nation_names = nat["n_name"].combine_chunks()

    lo, hi = _ts(date_from), _ts(date_to)

    def li_rows(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["l_shipdate"], lo),
            pc.less(t["l_shipdate"], hi),
        )
        t = t.filter(m)
        rev = _micro(
            pc.multiply(
                t["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), t["l_discount"]),
            )
        )
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_suppkey": t["l_suppkey"],
            "l_year": pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
            "revenue_micro": rev,
        })

    li = lineitem.map_batches(li_rows, batch_format="pyarrow")
    li = broadcast_join_unique(
        li, supplier.select_columns(["s_suppkey", "s_nationkey"]),
        left_key="l_suppkey", right_key="s_suppkey", how="inner",
        num_partitions=num_partitions,
    )

    def supp_filter(t: pa.Table) -> pa.Table:
        idx = pc.index_in(
            pc.cast(t["s_nationkey"], pa.int64()), value_set=nation_keys
        )
        t = t.append_column("supp_nation", pc.take(nation_names, idx))
        t = t.filter(pc.is_valid(t["supp_nation"]))
        return t.select(
            ["l_orderkey", "l_year", "revenue_micro", "supp_nation"]
        )

    li = li.map_batches(supp_filter, batch_format="pyarrow")
    li = broadcast_join_unique(
        li, orders.select_columns(["o_orderkey", "o_custkey"]),
        left_key="l_orderkey", right_key="o_orderkey", how="inner",
        num_partitions=num_partitions,
    )
    li = broadcast_join_unique(
        li, customer.select_columns(["c_custkey", "c_nationkey"]),
        left_key="o_custkey", right_key="c_custkey", how="inner",
        num_partitions=num_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        idx = pc.index_in(
            pc.cast(t["c_nationkey"], pa.int64()), value_set=nation_keys
        )
        t = t.append_column("cust_nation", pc.take(nation_names, idx))
        t = t.filter(
            pc.and_(
                pc.is_valid(t["cust_nation"]),
                # either direction, but not within one nation
                pc.not_equal(t["supp_nation"], t["cust_nation"]),
            )
        )
        g = (
            t.select(["supp_nation", "cust_nation", "l_year",
                      "revenue_micro"])
            .group_by(["supp_nation", "cust_nation", "l_year"])
            .aggregate([("revenue_micro", "sum")])
        )
        return _rename_sums(g, {"revenue_micro_sum": "revenue_micro"})

    return _merge_bounded(
        li.map_batches(finish, batch_format="pyarrow"),
        ["supp_nation", "cust_nation", "l_year"], ["revenue_micro"],
    )


# ---------------------------------------------------------------------------
# Q10-shape: top customers by returned-item revenue
# ---------------------------------------------------------------------------


def returned_revenue_topk(lineitem, orders, customer, *, k: int = 20,
                          date_from: _dt.datetime = _dt.datetime(1996, 1, 1),
                          date_to: _dt.datetime = _dt.datetime(1996, 7, 1),
                          num_partitions: int = 64):
    """Top-k customers by revenue of RETURNED items on orders placed in
    a window (the Q10 shape: filtered fact → order window join →
    per-customer aggregate → global top-k → attribute backfill).

    Scale shape: the returnflag filter + per-orderkey block partials
    shrink the fact before it meets orders; the per-customer aggregate
    rides one bounded shuffle; top-k is per-block partial top-k; the
    customer attribute backfill joins the ≤k-row winner set against
    customer via the size-adaptive join (broadcast of the TINY left
    side is not assumed — the join is keyed on the scaling side's
    unique key, correct at any scale).

    Output: (c_custkey, c_name, c_acctbal_micro, revenue_micro).
    """
    from ..stages.joins import broadcast_join_unique

    lo, hi = _ts(date_from), _ts(date_to)

    def li_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], pa.scalar("R")))
        rev = _micro(
            pc.multiply(
                t["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), t["l_discount"]),
            )
        )
        flat = pa.table(
            {"l_orderkey": t["l_orderkey"], "revenue_micro": rev}
        )
        g = flat.group_by("l_orderkey").aggregate([("revenue_micro", "sum")])
        return _rename_sums(g, {"revenue_micro_sum": "revenue_micro"})

    def ord_rows(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t["o_orderdate"], lo),
            pc.less(t["o_orderdate"], hi),
        )
        t = t.filter(keep)
        return pa.table(
            {"o_orderkey": t["o_orderkey"], "o_custkey": t["o_custkey"]}
        )

    per_order = lineitem.map_batches(li_partial, batch_format="pyarrow")
    joined = broadcast_join_unique(
        per_order, orders.map_batches(ord_rows, batch_format="pyarrow"),
        left_key="l_orderkey", right_key="o_orderkey", how="inner",
        num_partitions=num_partitions,
    )

    def cust_partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["o_custkey", "revenue_micro"])
            .group_by("o_custkey")
            .aggregate([("revenue_micro", "sum")])
        )
        return _rename_sums(g, {"revenue_micro_sum": "revenue_micro"})

    from ray.data.aggregate import Sum

    per_cust = (
        joined.map_batches(cust_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("revenue_micro", alias_name="revenue_micro"))
    )
    top = global_topk(per_cust, "revenue_micro", k, tiebreak=["o_custkey"])
    out = broadcast_join_unique(
        top, customer.select_columns(["c_custkey", "c_name", "c_acctbal"]),
        left_key="o_custkey", right_key="c_custkey", how="inner",
        num_partitions=num_partitions,
    )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": t["o_custkey"],
            "c_name": t["c_name"],
            "c_acctbal_micro": _micro(t["c_acctbal"]),
            "revenue_micro": t["revenue_micro"],
        })

    return out.map_batches(rename, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Q14-shape: promo revenue share per month
# ---------------------------------------------------------------------------


def promo_share(lineitem, part, *, promo_type: str = "PROMO",
                num_partitions: int = 64):
    """Per ship-month: revenue from promo-type parts vs total revenue
    (the Q14 shape: fact ⋈ part attribute → conditional aggregate).

    Scale shape: the fact is pre-aggregated per (l_partkey, month)
    inside each block BEFORE the part join — the join input is one row
    per (part, month), not raw lineitems; part rides the size-adaptive
    join; the month key space is bounded, so the final merge is one
    tiny task.  Both sums stay exact int64 micros; the share is left
    to the consumer (exactness over convenience).

    Output: (month, promo_micro, total_micro) with month = yyyymm.
    """
    from ..stages.joins import broadcast_join_unique

    def li_partial(t: pa.Table) -> pa.Table:
        rev = _micro(
            pc.multiply(
                t["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), t["l_discount"]),
            )
        )
        month = pc.add(
            pc.multiply(pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
                        pa.scalar(100, pa.int64())),
            pc.cast(pc.month(t["l_shipdate"]), pa.int64()),
        )
        flat = pa.table({
            "l_partkey": t["l_partkey"],
            "month": month,
            "revenue_micro": rev,
        })
        g = flat.group_by(["l_partkey", "month"]).aggregate(
            [("revenue_micro", "sum")]
        )
        return _rename_sums(g, {"revenue_micro_sum": "revenue_micro"})

    partials = lineitem.map_batches(li_partial, batch_format="pyarrow")
    joined = broadcast_join_unique(
        partials, part.select_columns(["p_partkey", "p_type"]),
        left_key="l_partkey", right_key="p_partkey", how="inner",
        num_partitions=num_partitions,
    )

    def month_partial(t: pa.Table) -> pa.Table:
        is_promo = pc.equal(t["p_type"], pa.scalar(promo_type))
        promo = pc.if_else(
            is_promo, t["revenue_micro"], pa.scalar(0, pa.int64())
        )
        flat = pa.table({
            "month": t["month"],
            "promo_micro": promo,
            "total_micro": t["revenue_micro"],
        })
        g = flat.group_by("month").aggregate(
            [("promo_micro", "sum"), ("total_micro", "sum")]
        )
        return _rename_sums(
            g, {"promo_micro_sum": "promo_micro",
                "total_micro_sum": "total_micro"}
        )

    return _merge_bounded(
        joined.map_batches(month_partial, batch_format="pyarrow"),
        ["month"], ["promo_micro", "total_micro"],
    )


# ---------------------------------------------------------------------------
# Q17-shape: small-quantity revenue vs per-part average (correlated agg)
# ---------------------------------------------------------------------------


def small_qty_revenue(lineitem, part, *, frac_num: int = 1,
                      frac_den: int = 5, num_partitions: int = 64):
    """Per brand: revenue of lineitems whose quantity is below
    ``frac_num/frac_den`` of the PART's average quantity (the Q17
    shape — a correlated per-part aggregate feeding a row filter).

    The threshold compare is EXACT integer cross-multiplication:
    ``qty < (num/den)·(sum_qty/n)  ⇔  den·qty·n < num·sum_qty``
    (quantities are integral), so no engine-dependent double division
    appears anywhere.

    Scale shape: pass 1 computes per-partkey (n, sum_qty) as block
    partials + one shuffle groupby (output is |part|-sized, NOT
    fact-sized); pass 2 re-reads the fact and resolves the filter via
    the size-adaptive join against those stats, then the brand
    aggregate is bounded.  The fact table is never materialized.

    Output: (p_brand, revenue_micro, n_small).
    """
    from ..stages.joins import broadcast_join_unique

    import numpy as np

    from ray.data.aggregate import Sum

    def qty_partial(t: pa.Table) -> pa.Table:
        flat = pa.table({
            "l_partkey": t["l_partkey"],
            "sum_qty": pc.cast(t["l_quantity"], pa.int64()),
            "n_li": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        })
        g = flat.group_by("l_partkey").aggregate(
            [("sum_qty", "sum"), ("n_li", "sum")]
        )
        return _rename_sums(g, {"sum_qty_sum": "sum_qty",
                                "n_li_sum": "n_li"})

    stats = (
        lineitem.map_batches(qty_partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                   Sum("n_li", alias_name="n_li"))
    )

    def li_rows(t: pa.Table) -> pa.Table:
        rev = _micro(t["l_extendedprice"])
        return pa.table({
            "partkey": t["l_partkey"],
            "qty": pc.cast(t["l_quantity"], pa.int64()),
            "price_micro": rev,
        })

    li = lineitem.map_batches(li_rows, batch_format="pyarrow")
    li = broadcast_join_unique(
        li, stats, left_key="partkey", right_key="l_partkey", how="inner",
        num_partitions=num_partitions,
    )

    fn = pa.scalar(frac_num, pa.int64())
    fd = pa.scalar(frac_den, pa.int64())

    def small_filter(t: pa.Table) -> pa.Table:
        lhs = pc.multiply(pc.multiply(t["qty"], fd), t["n_li"])
        rhs = pc.multiply(fn, t["sum_qty"])
        return t.filter(pc.less(lhs, rhs)).select(
            ["partkey", "price_micro"]
        )

    small = li.map_batches(small_filter, batch_format="pyarrow")
    small = broadcast_join_unique(
        small, part.select_columns(["p_partkey", "p_brand"]),
        left_key="partkey", right_key="p_partkey", how="inner",
        num_partitions=num_partitions,
    )

    def brand_partial(t: pa.Table) -> pa.Table:
        flat = pa.table({
            "p_brand": t["p_brand"],
            "revenue_micro": t["price_micro"],
            "n_small": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        })
        g = flat.group_by("p_brand").aggregate(
            [("revenue_micro", "sum"), ("n_small", "sum")]
        )
        return _rename_sums(g, {"revenue_micro_sum": "revenue_micro",
                                "n_small_sum": "n_small"})

    return _merge_bounded(
        small.map_batches(brand_partial, batch_format="pyarrow"),
        ["p_brand"], ["revenue_micro", "n_small"],
    )


# ---------------------------------------------------------------------------
# Q8-shape: national market share inside one region's customer base
# ---------------------------------------------------------------------------


def market_share(lineitem, orders, customer, supplier, part, nation,
                 region, *, target_nation: str = "NATION_2",
                 region_name: str = "ASIA", part_type: str = "PROMO",
                 date_from: _dt.datetime = _dt.datetime(1995, 1, 1),
                 date_to: _dt.datetime = _dt.datetime(1997, 1, 1),
                 num_partitions: int = 64):
    """Share of one nation's suppliers in the revenue a region's
    customers spend on one part type, per order year — the Q8 shape
    (reference analyzer surface is single-table; this is the classic
    conditional-share multi-chain join).

    Scale shape: the part-type filter resolves FIRST (smallest
    selective dim) so the fact shrinks before the supplier/orders/
    customer chains; supplier resolves to a single int flag column
    (target nation or not) so the numerator needs no second pass; the
    region membership test on the customer side is a bounded
    nation-key broadcast probed with ``pc.is_in``; the final key space
    is years — merged in one tiny task.  The share division is the
    ONE double op, performed once per output row with the exact shape
    the SQL twin spells.

    Output: (o_year, nation_micro, total_micro, mkt_share).
    """
    from ..stages.joins import broadcast_join_unique

    nat = pa.concat_tables(
        [b for b in nation.iter_batches(batch_format="pyarrow")]
    )
    reg = pa.concat_tables(
        [b for b in region.iter_batches(batch_format="pyarrow")]
    )
    reg_key = reg.filter(pc.equal(reg["r_name"], region_name))[
        "r_regionkey"
    ][0].as_py()
    region_nation_keys = pc.cast(
        nat.filter(pc.equal(nat["n_regionkey"], reg_key))["n_nationkey"],
        pa.int64(),
    ).combine_chunks()
    target_key = pc.cast(
        nat.filter(pc.equal(nat["n_name"], target_nation))["n_nationkey"],
        pa.int64(),
    )[0].as_py()

    def part_keys(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["p_type"], part_type)).select(
            ["p_partkey"]
        )

    def li_rows(t: pa.Table) -> pa.Table:
        rev = _micro(
            pc.multiply(
                t["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), t["l_discount"]),
            )
        )
        return pa.table({
            "l_partkey": t["l_partkey"],
            "l_suppkey": t["l_suppkey"],
            "l_orderkey": t["l_orderkey"],
            "rev": rev,
        })

    li = broadcast_join_unique(
        lineitem.map_batches(li_rows, batch_format="pyarrow"),
        part.map_batches(part_keys, batch_format="pyarrow"),
        left_key="l_partkey", right_key="p_partkey", how="inner",
        num_partitions=num_partitions,
    )
    li = broadcast_join_unique(
        li, supplier.select_columns(["s_suppkey", "s_nationkey"]),
        left_key="l_suppkey", right_key="s_suppkey", how="inner",
        num_partitions=num_partitions,
    )

    def flag_nation(t: pa.Table) -> pa.Table:
        is_target = pc.equal(
            pc.cast(t["s_nationkey"], pa.int64()),
            pa.scalar(target_key, pa.int64()),
        )
        nat_rev = pc.if_else(
            is_target, t["rev"], pa.scalar(0, pa.int64())
        )
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "rev": t["rev"],
            "nat_rev": nat_rev,
        })

    li = li.map_batches(flag_nation, batch_format="pyarrow")

    lo, hi = _ts(date_from), _ts(date_to)

    def ord_rows(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["o_orderdate"], lo),
            pc.less(t["o_orderdate"], hi),
        )
        t = t.filter(m)
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_custkey": t["o_custkey"],
            "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
        })

    li = broadcast_join_unique(
        li, orders.map_batches(ord_rows, batch_format="pyarrow"),
        left_key="l_orderkey", right_key="o_orderkey", how="inner",
        num_partitions=num_partitions,
    )
    li = broadcast_join_unique(
        li, customer.select_columns(["c_custkey", "c_nationkey"]),
        left_key="o_custkey", right_key="c_custkey", how="inner",
        num_partitions=num_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.is_in(
                pc.cast(t["c_nationkey"], pa.int64()),
                value_set=region_nation_keys,
            )
        )
        g = (
            t.select(["o_year", "rev", "nat_rev"])
            .group_by("o_year")
            .aggregate([("rev", "sum"), ("nat_rev", "sum")])
        )
        return _rename_sums(
            g, {"rev_sum": "total_micro", "nat_rev_sum": "nation_micro"}
        )

    merged = _merge_bounded(
        li.map_batches(finish, batch_format="pyarrow"),
        ["o_year"], ["total_micro", "nation_micro"],
    )

    def share(t: pa.Table) -> pa.Table:
        s = pc.divide(
            pc.cast(t["nation_micro"], pa.float64()),
            pc.cast(t["total_micro"], pa.float64()),
        )
        return t.append_column("mkt_share", s)

    return merged.map_batches(share, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Q19-shape: OR-of-ANDs disjunctive predicate over a fact⋈dim join
# ---------------------------------------------------------------------------


def disjunctive_revenue(lineitem, part, *,
                        cases: list | None = None,
                        num_partitions: int = 64):
    """Total revenue from line items matching ANY of several
    (brand, max size, quantity range) baskets — the Q19 shape: a
    disjunctive predicate spanning BOTH join sides, so no single
    conjunct can be pushed below the join.

    What CAN be pushed is the union envelope: the part side is
    pre-filtered to ``brand ∈ {basket brands} AND size ≤ max(size)``
    (the weakest predicate implied by the disjunction), shrinking the
    build side by ~24/25ths before the join; the full OR-of-ANDs then
    evaluates as ONE vectorized boolean expression over the joined
    batch — no row loop, no per-case passes.

    Output: a single row (revenue_micro, n_items).
    """
    from ..stages.joins import broadcast_join_unique

    if cases is None:
        cases = [
            ("Brand#1", 5, 1.0, 11.0),
            ("Brand#2", 10, 10.0, 20.0),
            ("Brand#3", 15, 20.0, 30.0),
        ]
    brands = pa.array(sorted({c[0] for c in cases}))
    size_cap = max(c[1] for c in cases)

    def part_side(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.is_in(t["p_brand"], value_set=brands),
            pc.less_equal(t["p_size"], size_cap),
        )
        return t.filter(m).select(["p_partkey", "p_brand", "p_size"])

    def li_rows(t: pa.Table) -> pa.Table:
        rev = _micro(
            pc.multiply(
                t["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), t["l_discount"]),
            )
        )
        return pa.table({
            "l_partkey": t["l_partkey"],
            "l_quantity": t["l_quantity"],
            "rev": rev,
        })

    joined = broadcast_join_unique(
        lineitem.map_batches(li_rows, batch_format="pyarrow"),
        part.map_batches(part_side, batch_format="pyarrow"),
        left_key="l_partkey", right_key="p_partkey", how="inner",
        num_partitions=num_partitions,
    )

    def partial(t: pa.Table) -> pa.Table:
        mask = None
        for brand, smax, qlo, qhi in cases:
            m = pc.and_(
                pc.and_(
                    pc.equal(t["p_brand"], brand),
                    pc.less_equal(t["p_size"], smax),
                ),
                pc.and_(
                    pc.greater_equal(t["l_quantity"], qlo),
                    pc.less_equal(t["l_quantity"], qhi),
                ),
            )
            mask = m if mask is None else pc.or_(mask, m)
        t = t.filter(mask)
        return pa.table({
            "revenue_micro": pa.array(
                [pc.sum(t["rev"]).as_py() or 0], pa.int64()
            ),
            "n_items": pa.array([t.num_rows], pa.int64()),
        })

    def merge(t: pa.Table) -> pa.Table:
        return pa.table({
            "revenue_micro": pa.array(
                [pc.sum(t["revenue_micro"]).as_py() or 0], pa.int64()
            ),
            "n_items": pa.array(
                [pc.sum(t["n_items"]).as_py() or 0], pa.int64()
            ),
        })

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .repartition(1, shuffle=False)
        .map_batches(merge, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Daily revenue + row-window moving average
# ---------------------------------------------------------------------------


def daily_moving_avg(lineitem, *, window: int = 3):
    """Per-ship-day revenue with a trailing ``window``-row moving
    average — the time-series smoothing shape (SQL ``ROWS BETWEEN n-1
    PRECEDING AND CURRENT ROW``).

    Scale shape: the fact folds to bounded per-day integer partials
    (calendar days — thousands of rows even at 10¹² line items);
    merge, ordering and the rolling sum all happen in ONE tiny final
    task over that bounded table — a window shuffle never touches the
    fact.  The moving average is the single double division, same
    expression shape as the twin.

    Output: (day [yyyymmdd], rev_micro, ma_sum_micro, ma_n, ma).
    """

    def partial(t: pa.Table) -> pa.Table:
        rev = _micro(
            pc.multiply(
                t["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), t["l_discount"]),
            )
        )
        d = t["l_shipdate"]
        day = pc.add(
            pc.add(
                pc.multiply(pc.cast(pc.year(d), pa.int64()), 10000),
                pc.multiply(pc.cast(pc.month(d), pa.int64()), 100),
            ),
            pc.cast(pc.day(d), pa.int64()),
        )
        g = (
            pa.table({"day": day, "rev_micro": rev})
            .group_by("day")
            .aggregate([("rev_micro", "sum")])
        )
        return _rename_sums(g, {"rev_micro_sum": "rev_micro"})

    def merge_roll(t: pa.Table) -> pa.Table:
        g = t.group_by("day").aggregate([("rev_micro", "sum")])
        g = _rename_sums(g, {"rev_micro_sum": "rev_micro"}).sort_by("day")
        rev = g["rev_micro"].to_numpy()
        csum = np.concatenate(([0], np.cumsum(rev)))
        n = len(rev)
        lo = np.maximum(np.arange(n) - (window - 1), 0)
        ma_sum = csum[np.arange(n) + 1] - csum[lo]
        ma_n = np.arange(n) + 1 - lo
        ma = ma_sum.astype(np.float64) / ma_n.astype(np.float64)
        return (
            g.append_column("ma_sum_micro", pa.array(ma_sum, pa.int64()))
            .append_column("ma_n", pa.array(ma_n, pa.int64()))
            .append_column("ma", pa.array(ma, pa.float64()))
        )

    return (
        lineitem.map_batches(partial, batch_format="pyarrow")
        .repartition(1, shuffle=False)
        .map_batches(merge_roll, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Ratio-to-report: nation revenue share within its region
# ---------------------------------------------------------------------------


def nation_share(lineitem, supplier, nation, region, *,
                 num_partitions: int = 64):
    """Each nation's share of its region's supplier-side revenue — the
    ``ratio_to_report`` / percent-of-total window shape.

    Scale shape: identical reduction pipeline to
    :func:`revenue_rollup` (per-suppkey integer partials → one
    size-adaptive join → bounded (region, nation) partials); region
    totals are derived FROM the bounded nation leaves in the final
    task, so the "window" costs nothing.  The share is the one double
    division, same expression shape as the twin.

    Output: (r_name, n_name, revenue_micro, region_micro, share).
    """
    from ..stages.joins import broadcast_join_unique

    nat = pa.concat_tables(
        [b for b in nation.iter_batches(batch_format="pyarrow")]
    )
    reg = pa.concat_tables(
        [b for b in region.iter_batches(batch_format="pyarrow")]
    )
    nat_keys = pc.cast(nat["n_nationkey"], pa.int64()).combine_chunks()
    nat_names = nat["n_name"].combine_chunks()
    reg_keys = pc.cast(reg["r_regionkey"], pa.int64()).combine_chunks()
    reg_names = reg["r_name"].combine_chunks()
    nat_region = pc.take(
        reg_names,
        pc.index_in(
            pc.cast(nat["n_regionkey"], pa.int64()).combine_chunks(),
            value_set=reg_keys,
        ),
    )

    def li_partial(t: pa.Table) -> pa.Table:
        rev = _micro(
            pc.multiply(
                t["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), t["l_discount"]),
            )
        )
        flat = pa.table({"l_suppkey": t["l_suppkey"],
                         "revenue_micro": rev})
        g = flat.group_by("l_suppkey").aggregate(
            [("revenue_micro", "sum")]
        )
        return _rename_sums(g, {"revenue_micro_sum": "revenue_micro"})

    joined = broadcast_join_unique(
        lineitem.map_batches(li_partial, batch_format="pyarrow"),
        supplier.select_columns(["s_suppkey", "s_nationkey"]),
        left_key="l_suppkey", right_key="s_suppkey", how="inner",
        num_partitions=num_partitions,
    )

    def leaf_partial(t: pa.Table) -> pa.Table:
        idx = pc.index_in(
            pc.cast(t["s_nationkey"], pa.int64()), value_set=nat_keys
        )
        flat = pa.table({
            "r_name": pc.take(nat_region, idx),
            "n_name": pc.take(nat_names, idx),
            "revenue_micro": t["revenue_micro"],
        })
        g = flat.group_by(["r_name", "n_name"]).aggregate(
            [("revenue_micro", "sum")]
        )
        return _rename_sums(g, {"revenue_micro_sum": "revenue_micro"})

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["r_name", "n_name"]).aggregate(
            [("revenue_micro", "sum")]
        )
        df = _rename_sums(
            g, {"revenue_micro_sum": "revenue_micro"}
        ).to_pandas()
        df["region_micro"] = (
            df.groupby("r_name")["revenue_micro"].transform("sum")
            .astype("int64")
        )
        df["share"] = (
            df["revenue_micro"].astype("float64")
            / df["region_micro"].astype("float64")
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        joined.map_batches(leaf_partial, batch_format="pyarrow")
        .repartition(1, shuffle=False)
        .map_batches(finish, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Pareto / cumulative-share flagging over aggregated supplier revenue
# ---------------------------------------------------------------------------


def supplier_pareto(lineitem, *, threshold_pct: int = 80):
    """Pareto (80/20) flagging: which suppliers make up the first
    ``threshold_pct``% of total revenue, walking suppliers in
    revenue-desc order (deterministic ties by suppkey).

    Scale shape: the fact folds to per-suppkey integer partials per
    block, then ONE hash groupby at supplier cardinality; the sort +
    running share happen on that aggregated table only (|suppliers| ≪
    |fact|).  The membership test is exact integer cross-multiplication
    — ``cum * 100 <= total * pct`` — no double thresholds; a supplier
    is in the Pareto set while the cumulative revenue BEFORE it is
    under the threshold (so the set always covers ≥ pct%).

    Output: (s_suppkey, revenue_micro, cum_micro, in_pareto).
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        rev = _micro(
            pc.multiply(
                t["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), t["l_discount"]),
            )
        )
        flat = pa.table({"l_suppkey": t["l_suppkey"], "_rev": rev})
        g = flat.group_by("l_suppkey").aggregate([("_rev", "sum")])
        return g.rename_columns([
            "_rev" if c == "_rev_sum" else c for c in g.column_names
        ])

    totals = (
        lineitem.map_batches(partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("_rev", alias_name="revenue_micro"))
    )

    def rank_flag(t: pa.Table) -> pa.Table:
        t = t.rename_columns([
            "s_suppkey" if c == "l_suppkey" else c
            for c in t.column_names
        ]).sort_by([("revenue_micro", "descending"),
                    ("s_suppkey", "ascending")])
        rev = t["revenue_micro"].to_numpy()
        cum = np.cumsum(rev)
        total = int(cum[-1]) if len(cum) else 0
        before = cum - rev  # cumulative revenue of strictly-better rows
        flag = before * 100 < total * threshold_pct
        return (
            t.append_column("cum_micro", pa.array(cum, pa.int64()))
            .append_column("in_pareto", pa.array(flag, pa.bool_()))
        )

    return (
        totals.repartition(1, shuffle=False)
        .map_batches(rank_flag, batch_format="pyarrow", batch_size=None)
    )


# ---------------------------------------------------------------------------
# Year-over-year growth (LAG shape over bounded leaves)
# ---------------------------------------------------------------------------


def yoy_growth(lineitem, supplier, nation, *, num_partitions: int = 64):
    """Year-over-year supplier-side revenue growth per nation — the
    ``LAG(rev) OVER (PARTITION BY nation ORDER BY year)`` shape.

    Scale shape: per-suppkey integer partials → one size-adaptive join
    → bounded (nation, year) leaves; the lag resolves as a pandas
    self-merge on (nation, year−1) inside the single final task —
    the window never sees the fact.  Growth is the one double
    division.  Years without a predecessor emit no row (inner-lag
    semantics, matching the twin's self join).

    Output: (n_name, yr, revenue_micro, prev_micro, yoy).
    """
    from ..stages.joins import broadcast_join_unique

    nat = pa.concat_tables(
        [b for b in nation.iter_batches(batch_format="pyarrow")]
    )
    nat_keys = pc.cast(nat["n_nationkey"], pa.int64()).combine_chunks()
    nat_names = nat["n_name"].combine_chunks()

    def li_partial(t: pa.Table) -> pa.Table:
        rev = _micro(
            pc.multiply(
                t["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), t["l_discount"]),
            )
        )
        flat = pa.table({
            "l_suppkey": t["l_suppkey"],
            "yr": pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
            "rev": rev,
        })
        g = flat.group_by(["l_suppkey", "yr"]).aggregate(
            [("rev", "sum")]
        )
        return _rename_sums(g, {"rev_sum": "rev"})

    joined = broadcast_join_unique(
        lineitem.map_batches(li_partial, batch_format="pyarrow"),
        supplier.select_columns(["s_suppkey", "s_nationkey"]),
        left_key="l_suppkey", right_key="s_suppkey", how="inner",
        num_partitions=num_partitions,
    )

    def leaf_partial(t: pa.Table) -> pa.Table:
        idx = pc.index_in(
            pc.cast(t["s_nationkey"], pa.int64()), value_set=nat_keys
        )
        flat = pa.table({
            "n_name": pc.take(nat_names, idx),
            "yr": t["yr"],
            "rev": t["rev"],
        })
        g = flat.group_by(["n_name", "yr"]).aggregate([("rev", "sum")])
        return _rename_sums(g, {"rev_sum": "rev"})

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["n_name", "yr"]).aggregate([("rev", "sum")])
        df = _rename_sums(g, {"rev_sum": "rev"}).to_pandas()
        prev = df.rename(
            columns={"rev": "prev_micro"}
        ).assign(yr=df["yr"] + 1)
        out = df.merge(prev, on=["n_name", "yr"], how="inner")
        out = out.rename(columns={"rev": "revenue_micro"})
        out["yoy"] = (
            (out["revenue_micro"] - out["prev_micro"]).astype("float64")
            / out["prev_micro"].astype("float64")
        )
        return pa.Table.from_pandas(
            out[["n_name", "yr", "revenue_micro", "prev_micro", "yoy"]],
            preserve_index=False,
        )

    return (
        joined.map_batches(leaf_partial, batch_format="pyarrow")
        .repartition(1, shuffle=False)
        .map_batches(finish, batch_format="pyarrow")
    )


def daily_moving_avg_range(lineitem, *, window_days: int = 3):
    """Calendar (RANGE-frame) trailing moving average of daily
    revenue: each day averages over days in ``[day - window_days + 1,
    day]`` that EXIST — gaps in the calendar shrink the window, the
    semantics ``ROWS`` frames get wrong (SQL ``RANGE BETWEEN n-1
    PRECEDING AND CURRENT ROW`` over an epoch-day key).

    Same scale shape as :func:`daily_moving_avg` (bounded per-day
    integer partials; one tiny final task) — the RANGE frame resolves
    with a single ``np.searchsorted`` over the sorted epoch days.

    Output: (epoch_day, rev_micro, ma_sum_micro, ma_n, ma).
    """

    def partial(t: pa.Table) -> pa.Table:
        rev = _micro(
            pc.multiply(
                t["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), t["l_discount"]),
            )
        )
        # midnight-aligned dates: epoch_us // 86_400_000_000 is exact
        day = pc.divide(
            pc.cast(pc.cast(t["l_shipdate"], pa.timestamp("us")),
                    pa.int64()),
            86_400_000_000,
        )
        g = (
            pa.table({"epoch_day": day, "rev_micro": rev})
            .group_by("epoch_day")
            .aggregate([("rev_micro", "sum")])
        )
        return _rename_sums(g, {"rev_micro_sum": "rev_micro"})

    def merge_range(t: pa.Table) -> pa.Table:
        g = t.group_by("epoch_day").aggregate([("rev_micro", "sum")])
        g = _rename_sums(g, {"rev_micro_sum": "rev_micro"}).sort_by(
            "epoch_day"
        )
        days = g["epoch_day"].to_numpy()
        rev = g["rev_micro"].to_numpy()
        csum = np.concatenate(([0], np.cumsum(rev)))
        n = len(rev)
        # first index whose day >= day - (window_days - 1)
        lo = np.searchsorted(days, days - (window_days - 1), side="left")
        ma_sum = csum[np.arange(n) + 1] - csum[lo]
        ma_n = np.arange(n) + 1 - lo
        ma = ma_sum.astype(np.float64) / ma_n.astype(np.float64)
        return (
            g.append_column("ma_sum_micro", pa.array(ma_sum, pa.int64()))
            .append_column("ma_n", pa.array(ma_n, pa.int64()))
            .append_column("ma", pa.array(ma, pa.float64()))
        )

    return (
        lineitem.map_batches(partial, batch_format="pyarrow")
        .repartition(1, shuffle=False)
        .map_batches(merge_range, batch_format="pyarrow",
                     batch_size=None)
    )


def forecast_revenue(lineitem, *, date_from: _dt.datetime,
                     date_to: _dt.datetime, disc_lo: float,
                     disc_hi: float, qty_max: float):
    """Q6 shape: potential revenue from discount changes — a pure
    filter + global sum, the canonical predicate-pushdown probe.

    The three predicates evaluate as one vectorized mask per block;
    the global sum is exact int64 micros of ``price * discount``
    (note: NOT price·(1−discount) — Q6 sums the discount amount).
    Output: one row (revenue_micro, n_items).
    """
    lo, hi = _ts(date_from), _ts(date_to)

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], lo),
                pc.less(t["l_shipdate"], hi),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(t["l_discount"], disc_lo),
                    pc.less_equal(t["l_discount"], disc_hi),
                ),
                pc.less(t["l_quantity"], qty_max),
            ),
        )
        t = t.filter(m)
        rev = _micro(pc.multiply(t["l_extendedprice"], t["l_discount"]))
        return pa.table({
            "revenue_micro": pa.array(
                [pc.sum(rev).as_py() or 0], pa.int64()
            ),
            "n_items": pa.array([t.num_rows], pa.int64()),
        })

    def merge(t: pa.Table) -> pa.Table:
        return pa.table({
            "revenue_micro": pa.array(
                [pc.sum(t["revenue_micro"]).as_py() or 0], pa.int64()
            ),
            "n_items": pa.array(
                [pc.sum(t["n_items"]).as_py() or 0], pa.int64()
            ),
        })

    return (
        lineitem.map_batches(partial, batch_format="pyarrow")
        .repartition(1, shuffle=False)
        .map_batches(merge, batch_format="pyarrow")
    )


def supplier_quartiles(lineitem, *, n_tiles: int = 4):
    """NTILE over aggregated supplier revenue: each supplier's revenue
    quartile (1 = top), deterministic ties by suppkey.

    Scale shape: NTILE needs a total order, so it runs on the
    AGGREGATED table only (|suppliers| ≪ |fact| — same reduction as
    :func:`supplier_pareto`); the tile boundaries replicate SQL NTILE
    exactly: the first ``n mod k`` tiles get ``⌈n/k⌉`` rows.
    Output: (s_suppkey, revenue_micro, tile).
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        rev = _micro(
            pc.multiply(
                t["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), t["l_discount"]),
            )
        )
        flat = pa.table({"l_suppkey": t["l_suppkey"], "_rev": rev})
        g = flat.group_by("l_suppkey").aggregate([("_rev", "sum")])
        return g.rename_columns([
            "_rev" if c == "_rev_sum" else c for c in g.column_names
        ])

    totals = (
        lineitem.map_batches(partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("_rev", alias_name="revenue_micro"))
    )

    def tile(t: pa.Table) -> pa.Table:
        t = t.rename_columns([
            "s_suppkey" if c == "l_suppkey" else c
            for c in t.column_names
        ]).sort_by([("revenue_micro", "descending"),
                    ("s_suppkey", "ascending")])
        n = t.num_rows
        q, r = divmod(n, n_tiles)
        sizes = np.full(n_tiles, q, dtype=np.int64)
        sizes[:r] += 1
        tiles = np.repeat(
            np.arange(1, n_tiles + 1, dtype=np.int64), sizes
        )
        return t.append_column("tile", pa.array(tiles, pa.int64()))

    return (
        totals.repartition(1, shuffle=False)
        .map_batches(tile, batch_format="pyarrow", batch_size=None)
    )


def customer_first_last(orders):
    """FIRST_VALUE / LAST_VALUE per group without a window shuffle:
    each customer's first and latest order (date + price), order
    defined by (orderdate, orderkey).

    The total order packs into one int64 — ``epoch_day * 2^32 +
    orderkey`` (days < 2^21, keys < 2^32 by schema) — making
    first/last an argmin/argmax reduce: each block keeps its local
    first and last row per customer (price riding along), so ≤ 2 rows
    per (block, customer) cross the wire into one per-customer merge.
    A valid combiner — the global extreme of a union is the extreme
    of the per-block extremes.

    Output: (c_custkey, first_date_day, first_price_micro,
    last_date_day, last_price_micro).
    """

    def partial(t: pa.Table) -> pa.Table:
        day = pc.divide(
            pc.cast(pc.cast(t["o_orderdate"], pa.timestamp("us")),
                    pa.int64()),
            86_400_000_000,
        )
        packed = pc.add(
            pc.multiply(day, pa.scalar(1 << 32, pa.int64())),
            pc.cast(t["o_orderkey"], pa.int64()),
        )
        flat = (
            pa.table({
                "c_custkey": t["o_custkey"],
                "packed": packed,
                "price_micro": _micro(t["o_totalprice"]),
            })
            .sort_by("packed")
        )
        df = flat.to_pandas()
        g = df.groupby("c_custkey", sort=False)
        first = g.head(1).rename(columns={
            "packed": "first_packed", "price_micro": "first_price_micro"
        })
        last = g.tail(1).rename(columns={
            "packed": "last_packed", "price_micro": "last_price_micro"
        })
        out = first.merge(last, on="c_custkey")
        return pa.Table.from_pandas(out, preserve_index=False)

    def merge(p):
        import pandas as pd

        p = p.sort_values("first_packed", kind="stable")
        g = p.groupby("c_custkey", sort=False)
        first = g.head(1)[["c_custkey", "first_packed",
                           "first_price_micro"]]
        p2 = p.sort_values("last_packed", kind="stable")
        last = p2.groupby("c_custkey", sort=False).tail(1)[
            ["c_custkey", "last_packed", "last_price_micro"]
        ]
        out = first.merge(last, on="c_custkey")
        out["first_date_day"] = out["first_packed"] // (1 << 32)
        out["last_date_day"] = out["last_packed"] // (1 << 32)
        return out[["c_custkey", "first_date_day", "first_price_micro",
                    "last_date_day", "last_price_micro"]].astype(
            "int64"
        )

    return (
        orders.select_columns(["o_custkey", "o_orderkey", "o_orderdate",
                               "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("c_custkey")
        .map_groups(merge, batch_format="pandas")
    )


def revenue_cube(lineitem, orders, *, num_partitions: int = 64):
    """``GROUP BY CUBE (l_returnflag, o_orderpriority)`` revenue: all
    four grouping sets — leaves, each one-dimension margin, and the
    grand total — with rolled-up levels labelled ``'ALL'``.

    Scale shape: ONE fact exchange (the orderkey join ships per-
    (orderkey, flag) integer partials, not raw rows); leaves are
    bounded (|flags| × |priorities|), so every super-aggregate is
    DERIVED from the leaf table in the single final task — grouping
    sets cost nothing beyond the leaves, the same derivation rule as
    :func:`revenue_rollup` generalized to the full lattice.

    Output: (l_returnflag, o_orderpriority, revenue_micro).
    """
    from ..stages.joins import broadcast_join_unique

    def li_partial(t: pa.Table) -> pa.Table:
        rev = _micro(
            pc.multiply(
                t["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), t["l_discount"]),
            )
        )
        flat = pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_returnflag": t["l_returnflag"],
            "revenue_micro": rev,
        })
        g = flat.group_by(["l_orderkey", "l_returnflag"]).aggregate(
            [("revenue_micro", "sum")]
        )
        return _rename_sums(g, {"revenue_micro_sum": "revenue_micro"})

    joined = broadcast_join_unique(
        lineitem.map_batches(li_partial, batch_format="pyarrow"),
        orders.select_columns(["o_orderkey", "o_orderpriority"]),
        left_key="l_orderkey", right_key="o_orderkey", how="inner",
        num_partitions=num_partitions,
    )

    def leaf_partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["l_returnflag", "o_orderpriority",
                      "revenue_micro"])
            .group_by(["l_returnflag", "o_orderpriority"])
            .aggregate([("revenue_micro", "sum")])
        )
        return _rename_sums(g, {"revenue_micro_sum": "revenue_micro"})

    def cube(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_returnflag", "o_orderpriority"]).aggregate(
            [("revenue_micro", "sum")]
        )
        df = _rename_sums(
            g, {"revenue_micro_sum": "revenue_micro"}
        ).to_pandas()
        by_flag = (
            df.groupby("l_returnflag", as_index=False)["revenue_micro"]
            .sum().assign(o_orderpriority="ALL")
        )
        by_prio = (
            df.groupby("o_orderpriority", as_index=False)
            ["revenue_micro"].sum().assign(l_returnflag="ALL")
        )
        import pandas as pd

        total = pd.DataFrame({
            "l_returnflag": ["ALL"], "o_orderpriority": ["ALL"],
            "revenue_micro": [df["revenue_micro"].sum()],
        })
        out = pd.concat([df, by_flag, by_prio, total],
                        ignore_index=True)
        out["revenue_micro"] = out["revenue_micro"].astype("int64")
        return pa.Table.from_pandas(
            out[["l_returnflag", "o_orderpriority", "revenue_micro"]],
            preserve_index=False,
        )

    return (
        joined.map_batches(leaf_partial, batch_format="pyarrow")
        .repartition(1, shuffle=False)
        .map_batches(cube, batch_format="pyarrow")
    )


def supplier_gini(lineitem):
    """Gini coefficient of supplier revenue concentration — the
    inequality measure over the aggregated revenue distribution.

    ``G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ)`` with ``xᵢ`` ascending
    and ``i`` the 1-based rank (ties broken by suppkey, making G
    deterministic).  Revenue enters the rank sums in WHOLE currency
    units (micros // 1e6) so ``Σ i·xᵢ`` stays within int64 at any
    plausible supplier count; the division is the single double op,
    shape-identical to the twin.  Rank sums run on the |suppliers|-
    sized aggregate only.

    Output: one row (n_suppliers, sum_units, gini).
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        rev = _micro(
            pc.multiply(
                t["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), t["l_discount"]),
            )
        )
        flat = pa.table({"l_suppkey": t["l_suppkey"], "_rev": rev})
        g = flat.group_by("l_suppkey").aggregate([("_rev", "sum")])
        return g.rename_columns([
            "_rev" if c == "_rev_sum" else c for c in g.column_names
        ])

    totals = (
        lineitem.map_batches(partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("_rev", alias_name="revenue_micro"))
    )

    def gini(t: pa.Table) -> pa.Table:
        t = t.sort_by([("revenue_micro", "ascending"),
                       ("l_suppkey", "ascending")])
        units = t["revenue_micro"].to_numpy() // 1_000_000
        n = len(units)
        s0 = int(units.sum())
        ranks = np.arange(1, n + 1, dtype=np.int64)
        s1 = int((ranks * units).sum())
        g = (
            float(2 * s1 - (n + 1) * s0) / float(n * s0)
            if n and s0 else None
        )
        return pa.table({
            "n_suppliers": pa.array([n], pa.int64()),
            "sum_units": pa.array([s0], pa.int64()),
            "gini": pa.array([g], pa.float64()),
        })

    return (
        totals.repartition(1, shuffle=False)
        .map_batches(gini, batch_format="pyarrow", batch_size=None)
    )


def region_hhi(lineitem, supplier, nation, region, *,
               num_partitions: int = 64):
    """Herfindahl–Hirschman concentration index of nation revenue
    shares within each region: ``HHI = Σ shareᵢ²``.

    Exact rational form: ``hhi = (Σ revᵢ²) / (Σ revᵢ)²`` with revenue
    in whole units — both sums are exact int64 over the BOUNDED
    (region, nation) leaves (same reduction as :func:`nation_share`),
    so the one double division is bit-reproducible; no
    order-dependent float summation anywhere.

    Output: (r_name, n_nations, hhi_num, hhi).
    """
    from ..stages.joins import broadcast_join_unique

    nat = pa.concat_tables(
        [b for b in nation.iter_batches(batch_format="pyarrow")]
    )
    reg = pa.concat_tables(
        [b for b in region.iter_batches(batch_format="pyarrow")]
    )
    nat_keys = pc.cast(nat["n_nationkey"], pa.int64()).combine_chunks()
    nat_names = nat["n_name"].combine_chunks()
    reg_keys = pc.cast(reg["r_regionkey"], pa.int64()).combine_chunks()
    reg_names = reg["r_name"].combine_chunks()
    nat_region = pc.take(
        reg_names,
        pc.index_in(
            pc.cast(nat["n_regionkey"], pa.int64()).combine_chunks(),
            value_set=reg_keys,
        ),
    )

    def li_partial(t: pa.Table) -> pa.Table:
        rev = _micro(
            pc.multiply(
                t["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), t["l_discount"]),
            )
        )
        flat = pa.table({"l_suppkey": t["l_suppkey"],
                         "revenue_micro": rev})
        g = flat.group_by("l_suppkey").aggregate(
            [("revenue_micro", "sum")]
        )
        return _rename_sums(g, {"revenue_micro_sum": "revenue_micro"})

    joined = broadcast_join_unique(
        lineitem.map_batches(li_partial, batch_format="pyarrow"),
        supplier.select_columns(["s_suppkey", "s_nationkey"]),
        left_key="l_suppkey", right_key="s_suppkey", how="inner",
        num_partitions=num_partitions,
    )

    def leaf_partial(t: pa.Table) -> pa.Table:
        idx = pc.index_in(
            pc.cast(t["s_nationkey"], pa.int64()), value_set=nat_keys
        )
        flat = pa.table({
            "r_name": pc.take(nat_region, idx),
            "n_name": pc.take(nat_names, idx),
            "revenue_micro": t["revenue_micro"],
        })
        g = flat.group_by(["r_name", "n_name"]).aggregate(
            [("revenue_micro", "sum")]
        )
        return _rename_sums(g, {"revenue_micro_sum": "revenue_micro"})

    def hhi(t: pa.Table) -> pa.Table:
        g = t.group_by(["r_name", "n_name"]).aggregate(
            [("revenue_micro", "sum")]
        )
        df = _rename_sums(
            g, {"revenue_micro_sum": "revenue_micro"}
        ).to_pandas()
        df["units"] = df["revenue_micro"] // 1_000_000
        out = df.groupby("r_name").agg(
            n_nations=("n_name", "size"),
            hhi_num=("units", lambda u: int((u.astype("int64") ** 2)
                                            .sum())),
            s0=("units", "sum"),
        ).reset_index()
        out["hhi"] = (
            out["hhi_num"].astype("float64")
            / (out["s0"].astype("float64")
               * out["s0"].astype("float64"))
        )
        out["n_nations"] = out["n_nations"].astype("int64")
        out["hhi_num"] = out["hhi_num"].astype("int64")
        return pa.Table.from_pandas(
            out[["r_name", "n_nations", "hhi_num", "hhi"]],
            preserve_index=False,
        )

    return (
        joined.map_batches(leaf_partial, batch_format="pyarrow")
        .repartition(1, shuffle=False)
        .map_batches(hhi, batch_format="pyarrow")
    )


def missing_ship_days(lineitem, *, date_from: _dt.datetime,
                      date_to: _dt.datetime):
    """Calendar-spine gap detection: days in ``[date_from, date_to)``
    with NO shipments — the data-completeness probe every ingestion
    pipeline runs against a date dimension.

    The spine is generated driver-side (calendar days are bounded at
    any data scale); observed days fold to bounded per-block partials;
    the anti join is one vectorized ``is_in`` over the spine in the
    final tiny task.  Output: (epoch_day,) ascending.
    """

    def partial(t: pa.Table) -> pa.Table:
        day = pc.divide(
            pc.cast(pc.cast(t["l_shipdate"], pa.timestamp("us")),
                    pa.int64()),
            86_400_000_000,
        )
        return (
            pa.table({"epoch_day": day})
            .group_by("epoch_day")
            .aggregate([])
        )

    # calendar arithmetic, NOT .timestamp(): naive datetimes resolve
    # via the process TZ there, which would shift the spine off-UTC
    epoch = _dt.datetime(1970, 1, 1)
    lo = (date_from - epoch).days
    hi = (date_to - epoch).days

    def finish(t: pa.Table) -> pa.Table:
        seen = t.group_by("epoch_day").aggregate([])["epoch_day"]
        spine = np.arange(lo, hi, dtype=np.int64)
        mask = np.isin(spine, seen.to_numpy(zero_copy_only=False),
                       invert=True)
        return pa.table({
            "epoch_day": pa.array(spine[mask], pa.int64()),
        })

    return (
        lineitem.select_columns(["l_shipdate"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1, shuffle=False)
        .map_batches(finish, batch_format="pyarrow", batch_size=None)
    )
