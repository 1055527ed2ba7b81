"""Data-governance checks for training-data release: k-anonymity /
l-diversity risk profiling over quasi-identifier combinations.

Before a dataset (or its metadata sidecar) is shared, privacy review asks:
can a row be re-identified by joining on its quasi-identifiers (QIs — the
columns an attacker plausibly knows)? A QI combination shared by fewer
than k rows is a re-identification risk (Sweeney's k-anonymity); a
combination whose rows all belong to few distinct subjects fails
l-diversity even when it is large (homogeneity attack).

Here the QI tuple over ``events`` is ``(event_type, hour-of-day,
floor(value/10))`` and the sensitive subject is ``user_id`` — the shapes,
not the specific columns, are the operator; both are module constants.

Scale (100 TB): ONE map-side-combined groupBy on the QI tuple (bounded
cardinality: |types| × 24 × |value buckets| — sketch-free exact counts),
then a single-row rollup. No per-row output ever leaves the executors;
the report is O(1). ``n_distinct_users`` per cell uses exact
``count_distinct`` inside the same aggregation — at extreme QI
cardinality swap for ``approx_count_distinct`` and keep the rollup
(contract choice, not a plan change).

All-integer output (counts + basis points via integer division) —
bit-exact vs the oracle.

Reference scope note: the reference project (``/root/reference``,
Task2-4/Client.py) has no governance surface; this extends the engine
for the training-data use case per SURVEY.md §7 phase 4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Tables = dict[str, DataFrame]

#: k-anonymity threshold: QI cells with fewer rows are "unsafe"
K_ANON = 5

#: l-diversity threshold: cells with fewer distinct subjects are
#: homogeneity risks even when k-anonymous
L_DIV = 3


def _qi_cells(t: Tables) -> DataFrame:
    """Per-QI-cell size and subject diversity (the one input-sized stage)."""
    return (
        t["events"]
        .groupBy(
            F.col("event_type").alias("qi_type"),
            F.hour("ts").alias("qi_hour"),
            F.floor(F.col("value") / 10).cast("long").alias("qi_value_bucket"),
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


def k_anonymity_check(t: Tables) -> DataFrame:
    """One-row k-anonymity / l-diversity report over the events QI tuple.

    Output: ``n_rows``, ``n_cells``, ``min_cell_rows``,
    ``unsafe_cells`` / ``rows_at_risk`` / ``risk_bp`` (cells below
    ``K_ANON`` and the rows they expose, in count and basis points), and
    ``low_diversity_cells`` (cells with < ``L_DIV`` distinct users —
    counted over ALL cells: a large homogeneous cell is exactly the case
    k-anonymity misses).
    """
    cells = _qi_cells(t)
    return cells.agg(
        F.sum("n_rows").alias("n_rows"),
        F.count("*").alias("n_cells"),
        F.min("n_rows").alias("min_cell_rows"),
        F.sum(F.when(F.col("n_rows") < K_ANON, 1).otherwise(0)).alias(
            "unsafe_cells"
        ),
        F.sum(
            F.when(F.col("n_rows") < K_ANON, F.col("n_rows")).otherwise(0)
        ).alias("rows_at_risk"),
        F.sum(F.when(F.col("n_users") < L_DIV, 1).otherwise(0)).alias(
            "low_diversity_cells"
        ),
    ).select(
        "n_rows",
        "n_cells",
        "min_cell_rows",
        "unsafe_cells",
        "rows_at_risk",
        F.expr("rows_at_risk * 10000 DIV n_rows").alias("risk_bp"),
        "low_diversity_cells",
    )


def riskiest_qi_cells(t: Tables) -> DataFrame:
    """The 20 most re-identifying QI cells — the rows a reviewer actually
    reads. Deterministic order (fewest rows, then fewest users, then QI
    values); ``TakeOrderedAndProject`` per-partition heaps, never a
    global sort."""
    return _qi_cells(t).orderBy(
        "n_rows",
        "n_users",
        F.col("qi_type").asc_nulls_first(),
        F.col("qi_hour").asc_nulls_first(),
        F.col("qi_value_bucket").asc_nulls_first(),
    ).limit(20)


_QI_CELLS_SQL = """
        SELECT event_type AS qi_type,
               hour(ts) AS qi_hour,
               CAST(floor(value / 10) AS BIGINT) AS qi_value_bucket,
               count(*) AS n_rows,
               count(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY 1, 2, 3"""


QUERIES = {
    "k_anonymity_check": k_anonymity_check,
    "riskiest_qi_cells": riskiest_qi_cells,
}

ORACLES: dict[str, str] = {
    "k_anonymity_check": f"""
        WITH cells AS ({_QI_CELLS_SQL})
        SELECT CAST(sum(n_rows) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_cells,
               CAST(min(n_rows) AS BIGINT) AS min_cell_rows,
               CAST(sum(CASE WHEN n_rows < {K_ANON} THEN 1 ELSE 0 END)
                    AS BIGINT) AS unsafe_cells,
               CAST(sum(CASE WHEN n_rows < {K_ANON} THEN n_rows ELSE 0 END)
                    AS BIGINT) AS rows_at_risk,
               CAST(sum(CASE WHEN n_rows < {K_ANON} THEN n_rows ELSE 0 END)
                    * 10000 // sum(n_rows) AS BIGINT) AS risk_bp,
               CAST(sum(CASE WHEN n_users < {L_DIV} THEN 1 ELSE 0 END)
                    AS BIGINT) AS low_diversity_cells
        FROM cells
    """,
    "riskiest_qi_cells": f"""
        WITH cells AS ({_QI_CELLS_SQL})
        SELECT qi_type, CAST(qi_hour AS INT) AS qi_hour, qi_value_bucket,
               CAST(n_rows AS BIGINT) AS n_rows,
               CAST(n_users AS BIGINT) AS n_users
        FROM cells
        ORDER BY n_rows, n_users, qi_type NULLS FIRST, qi_hour NULLS FIRST,
                 qi_value_bucket NULLS FIRST
        LIMIT 20
    """,
}
