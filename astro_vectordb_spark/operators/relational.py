"""Relational scaffolding queries (joins / aggregations / windows).

The reference has no relational operators (SURVEY.md §2.6: "no joins,
no aggregations") — but the extended pipeline operators are built from
them, and the TPC-H-ish fixtures exercise exactly the shapes that
matter at 100 TB.  Each function is a declarative plan that leans on a
specific Catalyst behavior, noted inline:

- pricing_summary: map-side partial aggregation (partial_sum before the
  single shuffle) over the fact table; group-key cardinality is tiny.
- revenue_topn: star join — the dimension sides are broadcast (no
  shuffle of the fact table for the join), then one agg shuffle, then
  TakeOrderedAndProject for the top-N.
- customer_rank_in_nation: window ranking after one keyed shuffle;
  partition key (nation) bounds skew at 25 values -> pre-aggregated
  before ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pricing_summary(lineitem: DataFrame, ship_before: str = "1998-09-01") -> DataFrame:
    """TPC-H Q1-style pricing summary."""
    return (
        lineitem.filter(F.col("l_shipdate") < F.lit(ship_before))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 6).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def revenue_topn(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    n: int = 10,
) -> DataFrame:
    """Top-N customers by lineitem revenue (star join + agg + top-N).

    The orders->customer side is broadcast; the fact table never
    shuffles for the join, only for the final customer-key agg.
    """
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        lineitem.join(
            F.broadcast(orders.select("o_orderkey", "o_custkey")),
            lineitem["l_orderkey"] == orders["o_orderkey"],
        )
        .groupBy("o_custkey")
        .agg(F.round(revenue, 6).alias("revenue"))
        .join(F.broadcast(customer.select("c_custkey", "c_name")),
              F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(n)
    )


def customer_rank_in_nation(customer: DataFrame, nation: DataFrame) -> DataFrame:
    """Rank customers by account balance within their nation (broadcast
    dim join + window)."""
    w = Window.partitionBy("n_name").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        customer.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            customer["c_nationkey"] == nation["n_nationkey"],
        )
        .select(
            "n_name",
            "c_custkey",
            F.round("c_acctbal", 6).alias("acctbal"),
            F.row_number().over(w).cast("long").alias("rank_in_nation"),
        )
        .filter(F.col("rank_in_nation") <= 3)
    )


def segment_without_orders(
    customer: DataFrame, orders: DataFrame, priority: str = "1-URGENT"
) -> DataFrame:
    """Set-op shape: customers of a market segment EXCEPT those with an
    order of the given priority (anti-join is the scalable physical
    form of EXCEPT on a key — no full-row comparison shuffle)."""
    with_orders = (
        orders.filter(F.col("o_orderpriority") == priority)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name")
        .join(with_orders, on="c_custkey", how="left_anti")
    )


def revenue_rollup(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """ROLLUP aggregation: revenue by (nation, order priority), with
    per-nation and grand totals — one shuffle, Catalyst expands the
    grouping sets map-side."""
    joined = (
        lineitem.join(
            F.broadcast(orders.select("o_orderkey", "o_custkey", "o_orderpriority")),
            lineitem["l_orderkey"] == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    return (
        joined.rollup("n_name", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


def order_status_pivot(orders: DataFrame) -> DataFrame:
    """Pivot shape: order counts per priority, one column per status —
    expressed as conditional aggregation (the pivot form Catalyst
    compiles to anyway; dialect-portable)."""
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_f"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_o"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_p"),
    )


def order_priority_counts(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Orders with at least one late lineitem, counted by priority
    (left-semi join keeps the fact scan single-pass)."""
    # lineitems shipped on/after 1997-01-01 count as "late"
    late = lineitem.filter(
        F.col("l_shipdate") >= F.lit("1997-01-01")
    ).select("l_orderkey")
    return (
        orders.join(late, orders["o_orderkey"] == late["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
