"""Hierarchical traversal via Spark 4.1 recursive CTEs.

``WITH RECURSIVE`` landed in Spark 4.x: Catalyst materializes the
recursive member iteratively (a UNION ALL loop over the previous
step's frontier), which makes acyclic hierarchy walks — org charts,
category trees, BOM explosions, referral chains — expressible
declaratively instead of as a driver-side loop of DataFrame unions.
Termination must come from the data (a strictly-shrinking key here);
Spark does not yet support UNION-distinct recursion
(UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), so fixpoint-style graph
algorithms over cyclic graphs still belong to the pointer-doubling
loop in ``pipeline.dedup_clusters`` — this module is the acyclic
complement, not a replacement.

The demonstration hierarchy is derived from the customer table: a
binary referral tree ``referrer(k) = k DIV 2`` rooted at custkey 1.
Depth is therefore ⌊log2(k)⌋ — recursion depth grows with log(keys),
~37 iterations at 100 B customers; each iteration's frontier is one
row per not-yet-rooted customer, so the total work is
n·log(n) narrow rows, shuffle-free until the final aggregation.

Reference scope note: the reference project (``/root/reference``) has
no hierarchical queries; this extends the engine per SURVEY.md §7
phase 4 (training-data pipelines carry taxonomy/category hierarchies
for mixing and attribution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

Tables = dict[str, DataFrame]


def referral_chain_depths(t: Tables) -> DataFrame:
    """Per-depth customer counts and balance mass of the binary referral
    tree, computed by ascending each customer's ancestor chain to the
    root with a recursive CTE.

    The recursive member shrinks ``anc`` strictly (``anc DIV 2`` with
    ``anc > 1`` guard), so the recursion terminates after ⌊log2(max
    key)⌋ iterations; the terminal row (``anc <= 1`` — custkey 0 is its
    own root, everything else ascends to 1) carries each customer's
    final depth: 0 for keys 0 and 1, ⌊log2(k)⌋ otherwise.
    """
    spark = t["customer"].sparkSession
    return spark.sql(
        """
        WITH RECURSIVE chain(custkey, acctbal, anc, depth) AS (
          SELECT c_custkey, c_acctbal, c_custkey, 0 FROM customer
          UNION ALL
          SELECT custkey, acctbal, anc DIV 2, depth + 1
          FROM chain WHERE anc > 1
        )
        SELECT depth,
               count(*) AS n_customers,
               round(sum(acctbal), 2) AS sum_acctbal
        FROM chain
        WHERE anc <= 1
        GROUP BY depth
        """
    )


ORACLES: dict[str, str] = {
    "referral_chain_depths": """
        WITH RECURSIVE chain(custkey, acctbal, anc, depth) AS (
          SELECT c_custkey, c_acctbal, c_custkey, 0 FROM customer
          UNION ALL
          SELECT custkey, acctbal, anc // 2, depth + 1
          FROM chain WHERE anc > 1
        )
        SELECT depth,
               count(*) AS n_customers,
               round(sum(acctbal), 2) AS sum_acctbal
        FROM chain
        WHERE anc <= 1
        GROUP BY depth
    """,
}

QUERIES = {
    "referral_chain_depths": referral_chain_depths,
}
