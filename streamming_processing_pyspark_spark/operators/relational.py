"""Relational operator surface — the SURVEY.md §2.10 gap list, Spark-first.

The reference exercises only projections, filters, one self-join, and
windowed counts; everything else a user would expect from an analytics
engine (sorts/limits/top-k, semi/anti joins, set ops, rollup, analytic
window functions, pivot, subqueries, scalar function library) is Catalyst
built-ins to surface. Each query here is declared via the DataFrame API (or
``spark.sql`` where SQL is clearer) and has a DuckDB oracle in ``ORACLES``.

Scale notes per query are inline: broadcast hints on dimension tables keep
the big fact-table scans shuffle-free where possible; multi-way joins order
small-to-large so AQE can pick broadcast strategies at runtime.

Float policy: aggregate outputs over double columns are rounded to 2
decimals on BOTH sides (engine and oracle) so accumulation-order noise
cannot flip the driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

Tables = dict[str, DataFrame]


def q1_pricing_summary(t: Tables) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan → filter → 8-agg groupBy.

    Catalyst plans partial+final HashAggregate with the shipdate filter and
    the 7-column projection pushed into the parquet scan — at 100 TB this is
    one pass over lineitem plus a tiny shuffle of partial aggregates.
    """
    li = t["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q3_top_orders(t: Tables) -> DataFrame:
    """TPC-H Q3-style: 3-way join → group → top-10 by revenue.

    customer is tiny relative to lineitem → explicit broadcast; orders joins
    lineitem on the (high-cardinality, well-distributed) orderkey.
    """
    cust = t["customer"].where(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].where(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = t["lineitem"].where(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def q5_nation_revenue(t: Tables) -> DataFrame:
    """TPC-H Q5-style: 6-way star join → revenue per nation.

    All dimension tables (region/nation/customer/supplier) broadcast; the
    only shuffle on the fact side is lineitem↔orders on orderkey.
    """
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        .where(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q6_forecast_revenue(t: Tables) -> DataFrame:
    """TPC-H Q6-style: pure scan-filter-sum — the pushdown stress test
    (every predicate must reach the parquet scan; see tests/test_plans.py)."""
    li = t["lineitem"]
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


def q10_returned_items(t: Tables) -> DataFrame:
    """TPC-H Q10-style: revenue lost to returns per customer, top 20."""
    return (
        t["lineitem"]
        .where(F.col("l_returnflag") == "R")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q14_promo_revenue(t: Tables) -> DataFrame:
    """TPC-H Q14-style: promo revenue share — conditional aggregation over a
    broadcast part join."""
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .where(F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        .where(F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", disc_price).otherwise(0.0))
                / F.sum(disc_price),
                4,
            ).alias("promo_pct")
        )
    )


def q18_large_orders(t: Tables) -> DataFrame:
    """TPC-H Q18-style: orders whose total quantity exceeds a threshold —
    aggregate, semi-filter, re-join."""
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .where(F.col("sum_qty") > 150)
    )
    return (
        big.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "sum_qty")
        .orderBy(F.col("sum_qty").desc(), F.col("o_orderkey"))
        .limit(20)
    )


def top_parts_per_brand(t: Tables) -> DataFrame:
    """Top-3 parts by retail price per brand — rank window + filter."""
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        t["part"]
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rn")
    )


def customers_with_orders(t: Tables) -> DataFrame:
    """Left-semi join (EXISTS)."""
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


def customers_without_orders(t: Tables) -> DataFrame:
    """Left-anti join (NOT EXISTS)."""
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


def nation_keys_intersect(t: Tables) -> DataFrame:
    """Set op: nations that have both customers and suppliers."""
    c = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    s = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


def nation_keys_except(t: Tables) -> DataFrame:
    """Set op: nations with customers but no suppliers."""
    c = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    s = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


def rollup_quantity(t: Tables) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) — subtotals + grand total."""
    return (
        t["lineitem"]
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
    )


def cube_quantity(t: Tables) -> DataFrame:
    """CUBE over (returnflag, linestatus)."""
    return (
        t["lineitem"]
        .cube("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
    )


def orders_topk(t: Tables) -> DataFrame:
    """Global top-10 by totalprice — Spark plans TakeOrderedAndProject
    (per-partition heap + driver merge), no full sort at scale."""
    return (
        t["orders"]
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def avg_price_by_priority(t: Tables) -> DataFrame:
    return (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
            F.count("*").alias("n_orders"),
        )
    )


def pivot_returnflag(t: Tables) -> DataFrame:
    """Pivot: quantity sums per linestatus × returnflag.

    Explicit pivot value list — at scale an un-listed pivot needs an extra
    distinct-values job; listing values keeps it one pass.
    """
    return (
        t["lineitem"]
        .groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


def running_order_totals(t: Tables) -> DataFrame:
    """Analytic window functions: running sum + rank per customer."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            2,
        ).alias("running_total"),
        F.row_number().over(w).alias("order_seq"),
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
    )


def distinct_parts_per_flag(t: Tables) -> DataFrame:
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count("*").alias("n_rows"),
        )
    )


def big_spenders_sql(t: Tables) -> DataFrame:
    """Correlated scalar subquery via the SQL API: orders above that
    customer's average order value."""
    spark = t["orders"].sparkSession
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice, 2) AS price
        FROM orders o
        WHERE o.o_totalprice > 2 * (
          SELECT avg(o2.o_totalprice) FROM orders o2
          WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


def scalar_functions_showcase(t: Tables) -> DataFrame:
    """Scalar function library parity: date, string, math built-ins
    (reference §2.7 uses hour/minute/split; this widens the surface)."""
    o = t["orders"]
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.upper("o_orderpriority").alias("prio_upper"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.length("o_orderstatus").alias("status_len"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.round(F.sqrt("o_totalprice"), 4).alias("price_sqrt"),
        F.floor("o_totalprice").cast("bigint").alias("price_floor"),
        F.abs(F.col("o_totalprice") - 1000.0).alias("price_dev"),
        F.when(F.col("o_totalprice") > 1000, "big").otherwise("small").alias("size_class"),
    )


def q4_priority_late_ship(t: Tables) -> DataFrame:
    """TPC-H Q4 shape — EXISTS decorrelated to a left-semi join.

    Orders in a quarter with at least one line item shipped after the
    order date (the l_commitdate/l_receiptdate columns don't exist in this
    dataset; l_shipdate > o_orderdate keeps the correlated-EXISTS shape).
    Catalyst plans the semi join with the compound (equi + theta)
    condition as a hash join on l_orderkey — at 100 TB the filter on
    orders prunes the probe side before the shuffle.
    """
    o = t["orders"].where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q13_customer_distribution(t: Tables) -> DataFrame:
    """TPC-H Q13 — distribution of customers by order count, zeros kept.

    Left outer join so order-less customers survive with c_count = 0,
    then a second (tiny) aggregation over the distribution. The first
    groupBy carries the weight; the second re-aggregates ~hundreds of
    rows.
    """
    c = t["customer"].select("c_custkey")
    o = t["orders"].select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def q17_small_quantity_revenue(t: Tables) -> DataFrame:
    """TPC-H Q17 — correlated scalar subquery decorrelated to an agg+join.

    Average yearly revenue from small-quantity (below 20% of the part's
    mean) orders of one brand. The per-part average is a broadcast-able
    aggregate (one row per part), so the correlated subquery costs one
    map-side join instead of a per-row rescan.
    """
    li = t["lineitem"].select("l_partkey", "l_quantity", "l_extendedprice")
    brand_parts = t["part"].where(F.col("p_brand") == "Brand#13").select("p_partkey")
    li_brand = li.join(
        F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey")
    )
    avg_qty = li_brand.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_limit")
    )
    return (
        li_brand.join(F.broadcast(avg_qty), "l_partkey")
        .where(F.col("l_quantity") < F.col("qty_limit"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


def q22_idle_wealthy_customers(t: Tables) -> DataFrame:
    """TPC-H Q22 — global scalar subquery + anti join.

    Customers with above-average (positive) balance and no orders, per
    market segment. The global average is a 1-row broadcast cross join;
    "no orders" is a left-anti join (NOT EXISTS decorrelated).
    """
    c = t["customer"]
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            t["orders"].select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_orders": q3_top_orders,
    "q5_nation_revenue": q5_nation_revenue,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_items": q10_returned_items,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_orders": q18_large_orders,
    "q4_priority_late_ship": q4_priority_late_ship,
    "q13_customer_distribution": q13_customer_distribution,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q22_idle_wealthy_customers": q22_idle_wealthy_customers,
    "top_parts_per_brand": top_parts_per_brand,
    "customers_with_orders": customers_with_orders,
    "customers_without_orders": customers_without_orders,
    "nation_keys_intersect": nation_keys_intersect,
    "nation_keys_except": nation_keys_except,
    "rollup_quantity": rollup_quantity,
    "cube_quantity": cube_quantity,
    "orders_topk": orders_topk,
    "avg_price_by_priority": avg_price_by_priority,
    "pivot_returnflag": pivot_returnflag,
    "running_order_totals": running_order_totals,
    "distinct_parts_per_flag": distinct_parts_per_flag,
    "big_spenders": big_spenders_sql,
    "scalar_functions_showcase": scalar_functions_showcase,
}

ORACLES: dict[str, str] = {
    "q4_priority_late_ship": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
    """,
    "q13_customer_distribution": """
        SELECT c_count, count(*) AS custdist FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey
        ) GROUP BY c_count
    """,
    "q17_small_quantity_revenue": """
        SELECT round(sum(l1.l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
        WHERE p_brand = 'Brand#13'
          AND l1.l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                               WHERE l2.l_partkey = l1.l_partkey)
    """,
    "q22_idle_wealthy_customers": """
        SELECT c_mktsegment, count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 2) AS avg_qty,
               round(avg(l_extendedprice), 2) AS avg_price,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_top_orders": """
        SELECT o_orderkey, o_orderdate, o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1995-03-15'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    "q5_nation_revenue": """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name
    """,
    "q6_forecast_revenue": """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q10_returned_items": """
        SELECT c_custkey, c_name, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "q14_promo_revenue": """
        SELECT round(100.0 *
                 sum(CASE WHEN p_type = 'PROMO'
                     THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) /
                 sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-07-01'
    """,
    "q18_large_orders": """
        SELECT c_custkey, c_name, o_orderkey, o_orderdate, sum_qty
        FROM (
          SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
          FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 150
        ) big
        JOIN orders ON big.l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY sum_qty DESC, o_orderkey
        LIMIT 20
    """,
    "top_parts_per_brand": """
        SELECT p_brand, p_partkey, p_retailprice, CAST(rn AS INTEGER) AS rn FROM (
          SELECT p_brand, p_partkey, p_retailprice,
                 row_number() OVER (
                   PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey
                 ) AS rn
          FROM part
        ) WHERE rn <= 3
    """,
    "customers_with_orders": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "customers_without_orders": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "nation_keys_intersect": """
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    "nation_keys_except": """
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    "rollup_quantity": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "cube_quantity": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "orders_topk": """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "avg_price_by_priority": """
        SELECT o_orderpriority, round(avg(o_totalprice), 2) AS avg_price,
               count(*) AS n_orders
        FROM orders GROUP BY o_orderpriority
    """,
    "pivot_returnflag": """
        SELECT l_linestatus,
               round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS "A",
               round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS "N",
               round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS "R"
        FROM lineitem GROUP BY l_linestatus
    """,
    "running_order_totals": """
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 2) AS running_total,
               CAST(row_number() OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS INTEGER) AS order_seq,
               round(lag(o_totalprice) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ), 2) AS prev_price
        FROM orders
    """,
    "distinct_parts_per_flag": """
        SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
    "big_spenders": """
        SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice, 2) AS price
        FROM orders o
        WHERE o.o_totalprice > 2 * (
          SELECT avg(o2.o_totalprice) FROM orders o2
          WHERE o2.o_custkey = o.o_custkey
        )
    """,
    "scalar_functions_showcase": """
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INTEGER) AS order_year,
               CAST(month(o_orderdate) AS INTEGER) AS order_month,
               CAST(day(o_orderdate) AS INTEGER) AS order_day,
               CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
               upper(o_orderpriority) AS prio_upper,
               substring(o_orderpriority, 1, 1) AS prio_code,
               CAST(length(o_orderstatus) AS INTEGER) AS status_len,
               concat_ws('-', o_orderstatus, o_orderpriority) AS status_prio,
               round(sqrt(o_totalprice), 4) AS price_sqrt,
               CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
               abs(o_totalprice - 1000.0) AS price_dev,
               CASE WHEN o_totalprice > 1000 THEN 'big' ELSE 'small' END AS size_class
        FROM orders
    """,
}
