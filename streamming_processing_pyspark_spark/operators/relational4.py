"""TPC-H breadth, part 4 — the six analogues (Q2/Q11/Q12/Q16/Q20/Q21)
that need adaptation to this dataset's schema, completing the 22-query
sweep.

The driver's testdata has no ``partsupp`` table and no
``l_commitdate``/``l_receiptdate``/``l_shipmode`` columns, so each query
here keeps its TPC-H *plan shape* (the thing that matters at 100 TB)
while re-stating the predicate against available columns:

- Q2's part-supplier cost comes from lineitem (min extended price per
  part) instead of ps_supplycost — the correlated-min + join-back shape
  survives, expressed as ONE ``min(struct(cost, suppkey))`` aggregate.
- Q11/Q20's fixed fractions become RELATIVE thresholds (k× the mean,
  integer cross-multiplied) — TPC-H scales those fractions by 1/SF for
  exactly this reason; a relative threshold is the scale-free statement.
- Q12's ship modes become return flags; lateness is
  ``l_shipdate > o_orderdate + N days`` (same adaptation as the existing
  ``q4_priority_late_ship``).
- Q16's supplier-complaint exclusion becomes negative account balance.
- Q21's receipt-after-commit becomes ship-after-order+60d; the
  EXISTS / NOT-EXISTS pair over other suppliers of the same order is
  kept verbatim (left-semi + left-anti with equi+theta conditions).

Reference scope note: the reference (SURVEY.md §2.4) has one self-join;
this is §2.10 gap-list relational surface. All money/quantity aggregates
are integer cents / floored units so both engines hash-match exactly;
all dimension sides broadcast; the only input-sized shuffles are the
lineitem aggregations and the lineitem↔orders / lineitem↔lineitem
orderkey joins TPC-H itself mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

Tables = dict[str, DataFrame]

#: Q2: candidate part class
Q2_TYPE = "SMALL"
Q2_MAX_SIZE = 10
Q2_TOPK = 20
#: Q11/Q21: the "home nations" supplier filter (a set, not one nation, so
#: the sf0.001 fixture with 10 suppliers still exercises the path)
SUPPLIER_NATIONS = ("NATION_1", "NATION_3", "NATION_5", "NATION_7")
#: Q11: keep parts whose value exceeds K_TIMES x the mean part value
Q11_TIMES = 2
#: Q12: lateness horizon (days after order date)
Q12_LATE_DAYS = 90
Q12_HIGH = ("1-URGENT", "2-HIGH")
#: Q16: exclusions + size class
Q16_EXCL_BRAND = "Brand#1"
Q16_EXCL_TYPE = "PROMO"
Q16_SIZES = (1, 5, 10, 15, 20, 25, 30, 35)
#: Q20: shipped-quantity threshold = 3/2 x the mean per-supplier quantity
Q20_NAME_PREFIX = "small "
#: Q21: lateness horizon + result size
Q21_LATE_DAYS = 60
Q21_TOPK = 10


def _home_suppliers(t: Tables) -> DataFrame:
    """Suppliers from SUPPLIER_NATIONS with name + nation (broadcast-sized)."""
    nat = t["nation"].where(F.col("n_name").isin(*SUPPLIER_NATIONS))
    return (
        t["supplier"]
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )


def q2_min_cost_supplier(t: Tables) -> DataFrame:
    """TPC-H Q2-style: for each small part, the supplier shipping it at
    the minimum price; top suppliers by account balance.

    Q2's correlated min-cost subquery collapses to ONE aggregate:
    ``min(struct(price, suppkey))`` per part — lexicographic struct
    ordering gives the min price with the min-suppkey tie-break in a
    single shuffle, no join-back against the aggregate (the classic
    argmin-without-self-join trick). part filters before broadcast, so
    the lineitem scan joins shuffle-free.
    """
    pp = (
        t["part"]
        .where((F.col("p_type") == Q2_TYPE) & (F.col("p_size") <= Q2_MAX_SIZE))
        .select("p_partkey", "p_name")
    )
    best = (
        t["lineitem"]
        .join(F.broadcast(pp), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "p_name")
        .agg(
            F.min(
                F.struct(
                    F.col("l_extendedprice").alias("cost"),
                    F.col("l_suppkey").alias("skey"),
                )
            ).alias("m")
        )
        .select(
            "p_partkey",
            "p_name",
            F.round(F.col("m.cost"), 2).alias("min_cost"),
            F.col("m.skey").alias("s_suppkey"),
        )
    )
    supp = t["supplier"].join(
        F.broadcast(
            t["nation"].select(
                F.col("n_nationkey").alias("s_nationkey"),
                F.col("n_name").alias("nation"),
            )
        ),
        "s_nationkey",
    )
    return (
        best.join(F.broadcast(supp), "s_suppkey")
        .select("p_partkey", "p_name", "s_name", "nation", "s_acctbal", "min_cost")
        .orderBy(F.col("s_acctbal").desc(), "p_partkey")
        .limit(Q2_TOPK)
    )


def q11_important_parts(t: Tables) -> DataFrame:
    """TPC-H Q11-style: parts whose shipped value (from home-nation
    suppliers) exceeds Q11_TIMES x the mean part value.

    The group-sum vs global-sum scalar subquery, all-integer: values are
    summed in cents and the threshold is the cross-multiplied
    ``n_parts * val > K * total`` — no float fraction, so both engines
    agree exactly AND the threshold is scale-free (TPC-H scales Q11's
    fraction by 1/SF; a relative threshold states that intent directly).
    One lineitem-sized shuffle (the partkey aggregation); the global sum
    is a window over the parts-sized aggregate.
    """
    supp = _home_suppliers(t).select("s_suppkey")
    v = (
        t["lineitem"]
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias(
                "val_cents"
            )
        )
    )
    w_all = Window.partitionBy()
    return (
        v.select(
            "p_partkey",
            "val_cents",
            F.count("*").over(w_all).alias("n"),
            F.sum("val_cents").over(w_all).alias("total"),
        )
        .where(F.col("n") * F.col("val_cents") > Q11_TIMES * F.col("total"))
        .select("p_partkey", "val_cents")
    )


def q12_returnflag_priority(t: Tables) -> DataFrame:
    """TPC-H Q12-style: late lineitems in 1997 split into high/low order
    priority per return flag (ship mode doesn't exist in this schema;
    return flag plays its role, lateness is ship > order + 90 days).

    The Q12 shape: one lineitem↔orders equi-join with a theta residual,
    then conditional aggregation (``sum(when ...)``) — map-side partial
    aggs shrink the 3-row result before the final exchange.
    """
    j = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(
            t["orders"].select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {Q12_LATE_DAYS} DAYS")
        )
    )
    high = F.col("o_orderpriority").isin(*Q12_HIGH)
    return j.groupBy("l_returnflag").agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
    )


def q16_supplier_part_counts(t: Tables) -> DataFrame:
    """TPC-H Q16-style: distinct supplier count per (brand, type, size)
    part class, excluding one brand/type and "complaint" suppliers
    (negative account balance stands in for the comment-text predicate).

    lineitem is the part↔supplier link (no partsupp table). part filters
    before broadcast; the complaint exclusion is a broadcast left-anti
    join (Q16's NOT IN decorrelated); countDistinct shuffles only
    (class, suppkey) pairs.
    """
    pp = (
        t["part"]
        .where(
            (F.col("p_brand") != Q16_EXCL_BRAND)
            & (F.col("p_type") != Q16_EXCL_TYPE)
            & F.col("p_size").isin(*Q16_SIZES)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    excl = t["supplier"].where(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("excl_key")
    )
    return (
        t["lineitem"]
        .join(F.broadcast(pp), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(excl), F.col("l_suppkey") == F.col("excl_key"), "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q20_excess_shipped(t: Tables) -> DataFrame:
    """TPC-H Q20-style: home-nation suppliers who shipped an outsized
    quantity of 'small' parts in 1997 — candidates holding excess stock.

    Q20's availqty threshold becomes a relative one: suppliers whose
    shipped quantity exceeds 3/2 x the mean per-supplier quantity,
    integer cross-multiplied (``2*n*qty > 3*total``) so the comparison
    is exact and scale-free. Aggregate per supplier (one shuffle of
    supplier-sized data after the broadcast part filter), window the
    mean over the tiny aggregate, then broadcast-join names.
    """
    pp = t["part"].where(F.col("p_name").startswith(Q20_NAME_PREFIX)).select(
        "p_partkey"
    )
    q = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(F.broadcast(pp), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.floor("l_quantity").cast("long")).alias("qty"))
    )
    w_all = Window.partitionBy()
    winners = (
        q.select(
            "l_suppkey",
            "qty",
            F.count("*").over(w_all).alias("n"),
            F.sum("qty").over(w_all).alias("total"),
        )
        .where(2 * F.col("n") * F.col("qty") > 3 * F.col("total"))
        .select(F.col("l_suppkey").alias("s_suppkey"), "qty")
    )
    return winners.join(F.broadcast(_home_suppliers(t)), "s_suppkey").select(
        "s_name", "nation", "qty"
    )


def q21_waiting_suppliers(t: Tables) -> DataFrame:
    """TPC-H Q21-style: home-nation suppliers who were the ONLY late
    supplier on a multi-supplier finalized order (late = shipped more
    than 60 days after the order date).

    The Q21 EXISTS / NOT-EXISTS pair survives intact as a left-semi then
    left-anti join, each an orderkey hash join with a
    ``suppkey != suppkey`` residual. The late set builds from one
    lineitem↔orders join (orders filtered to status 'F' first); supplier
    and nation broadcast.
    """
    late = (
        t["lineitem"]
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            t["orders"]
            .where(F.col("o_orderstatus") == "F")
            .select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    cand = late.join(
        F.broadcast(_home_suppliers(t)), F.col("l_suppkey") == F.col("s_suppkey")
    )
    others = t["lineitem"].select(
        F.col("l_orderkey").alias("o2_key"), F.col("l_suppkey").alias("s2_key")
    )
    with_other = cand.join(
        others,
        (F.col("l_orderkey") == F.col("o2_key"))
        & (F.col("l_suppkey") != F.col("s2_key")),
        "left_semi",
    )
    other_late = late.select(
        F.col("l_orderkey").alias("o3_key"), F.col("l_suppkey").alias("s3_key")
    )
    sole_late = with_other.join(
        other_late,
        (F.col("l_orderkey") == F.col("o3_key"))
        & (F.col("l_suppkey") != F.col("s3_key")),
        "left_anti",
    )
    return (
        sole_late.groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(Q21_TOPK)
    )


#: dormancy horizon: customers with no order in the trailing N days of
#: the order history are "dormant" (churn candidates)
DORMANT_DAYS = 365


def dormant_customers(t: Tables) -> DataFrame:
    """Churn list: customers whose LAST order predates the corpus's
    latest order date by more than ``DORMANT_DAYS``, with their lifetime
    order count and value — the reactivation-campaign input.

    Plan: one groupBy(custkey) over orders (map-combined), the 1-row
    horizon aggregate broadcast back, a broadcast customer join for the
    segment. No window, no second orders scan.
    """
    per_cust = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "lifetime_cents"
            ),
            F.max("o_orderdate").alias("last_order"),
        )
    )
    horizon = t["orders"].agg(F.max("o_orderdate").alias("max_date"))
    cust = t["customer"].select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    return (
        per_cust.crossJoin(F.broadcast(horizon))
        .where(
            F.expr(f"last_order < max_date - INTERVAL {DORMANT_DAYS} DAYS")
        )
        .join(F.broadcast(cust), "o_custkey")
        .select(
            F.col("o_custkey").alias("custkey"),
            "c_mktsegment",
            "n_orders",
            "lifetime_cents",
            "last_order",
        )
    )


_NATIONS_SQL = ", ".join(f"'{n}'" for n in SUPPLIER_NATIONS)
_Q12_HIGH_SQL = ", ".join(f"'{p}'" for p in Q12_HIGH)
_Q16_SIZES_SQL = ", ".join(str(s) for s in Q16_SIZES)

ORACLES: dict[str, str] = {
    "dormant_customers": f"""
        WITH pc AS (
          SELECT o_custkey, count(*) AS n_orders,
                 CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                      AS BIGINT) AS lifetime_cents,
                 max(o_orderdate) AS last_order
          FROM orders GROUP BY o_custkey
        ),
        h AS (SELECT max(o_orderdate) AS max_date FROM orders)
        SELECT pc.o_custkey AS custkey, c.c_mktsegment, pc.n_orders,
               pc.lifetime_cents, pc.last_order
        FROM pc, h
        JOIN customer c ON pc.o_custkey = c.c_custkey
        WHERE pc.last_order < h.max_date - INTERVAL {DORMANT_DAYS} DAY
    """,
    "q2_min_cost_supplier": f"""
        WITH pp AS (
          SELECT p_partkey, p_name FROM part
          WHERE p_type = '{Q2_TYPE}' AND p_size <= {Q2_MAX_SIZE}
        ),
        c AS (
          SELECT p_partkey, p_name, min(l_extendedprice) AS min_cost
          FROM lineitem JOIN pp ON l_partkey = p_partkey
          GROUP BY 1, 2
        ),
        pick AS (
          SELECT c.p_partkey, c.p_name, round(c.min_cost, 2) AS min_cost,
                 min(l.l_suppkey) AS s_suppkey
          FROM lineitem l
          JOIN c ON l.l_partkey = c.p_partkey
                AND l.l_extendedprice = c.min_cost
          GROUP BY 1, 2, 3
        )
        SELECT p.p_partkey, p.p_name, s.s_name, n.n_name AS nation,
               s.s_acctbal, p.min_cost
        FROM pick p
        JOIN supplier s ON p.s_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        ORDER BY s.s_acctbal DESC, p.p_partkey
        LIMIT {Q2_TOPK}
    """,
    "q11_important_parts": f"""
        WITH v AS (
          SELECT l_partkey AS p_partkey,
                 CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
                      AS BIGINT) AS val_cents
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
                     AND n_name IN ({_NATIONS_SQL})
          GROUP BY 1
        )
        SELECT p_partkey, val_cents FROM v
        WHERE (SELECT count(*) FROM v) * val_cents
              > {Q11_TIMES} * (SELECT sum(val_cents) FROM v)
    """,
    "q12_returnflag_priority": f"""
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ({_Q12_HIGH_SQL})
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ({_Q12_HIGH_SQL})
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > o_orderdate + INTERVAL {Q12_LATE_DAYS} DAY
        GROUP BY l_returnflag
    """,
    "q16_supplier_part_counts": f"""
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> '{Q16_EXCL_BRAND}'
          AND p_type <> '{Q16_EXCL_TYPE}'
          AND p_size IN ({_Q16_SIZES_SQL})
          AND l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
    """,
    "q20_excess_shipped": f"""
        WITH q AS (
          SELECT l_suppkey, CAST(sum(floor(l_quantity)) AS BIGINT) AS qty
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE '{Q20_NAME_PREFIX}%'
            AND l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01'
          GROUP BY 1
        )
        SELECT s.s_name, n.n_name AS nation, q.qty
        FROM q
        JOIN supplier s ON q.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
                     AND n.n_name IN ({_NATIONS_SQL})
        WHERE 2 * (SELECT count(*) FROM q) * q.qty
              > 3 * (SELECT sum(qty) FROM q)
    """,
    "q21_waiting_suppliers": f"""
        WITH late AS (
          SELECT l.l_orderkey, l.l_suppkey
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE o.o_orderstatus = 'F'
            AND l.l_shipdate > o.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
        )
        SELECT s.s_name, count(*) AS numwait
        FROM late l1
        JOIN supplier s ON l1.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
                     AND n.n_name IN ({_NATIONS_SQL})
        WHERE EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey != l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey != l1.l_suppkey)
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT {Q21_TOPK}
    """,
}

QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_parts": q11_important_parts,
    "q12_returnflag_priority": q12_returnflag_priority,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q20_excess_shipped": q20_excess_shipped,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "dormant_customers": dormant_customers,
}
