"""Distributional analytics: RFM quartile segmentation, revenue
concentration (Gini / Lorenz top-decile share), and Benford first-digit
conformance.

Extends the reference's aggregation surface (SURVEY.md §2.5 — the
reference only has windowed counts, ``Task2.py:44-50``, ``Task3.py:84-89``)
with the *shape-of-the-distribution* summaries a curation / anti-fraud
pipeline reads off its fact tables: who are the heavy users (RFM), how
concentrated is the spend (Gini), and do the raw amounts look organic
(Benford). All three follow the repo's exact-parity rules:

- Money is held as BIGINT cents end-to-end; every ratio is emitted as an
  integer micro/ppm unit via ``floor`` so the driver's value-hash compare
  is deterministic across engines (see ``profiling.py`` for the pattern).
- No libm in the comparison path: the Benford expectation table is nine
  pinned integer constants (``floor(1e6*log10(1+1/d))``), not a runtime
  ``log10`` — DuckDB's and the JVM's ``log10`` are only 1-ulp classes and
  a ``floor`` straddling the ulp would flip a digit's expected ppm.
- Quartile scores come from the histogram-cumsum pattern (groupBy value →
  cumulative count → broadcast join back), NOT a global ``ntile`` sort:
  the only window runs over the DISTINCT-value histogram, and ties get
  one consistent score (``ceil(4·cum_le/n)``) instead of ntile's
  order-dependent tie splitting. Same design as
  ``curation.perplexity_buckets``; at 100 TB the histogram stays
  |distinct values| wide no matter how many customers there are.

Scale notes per operator are in the docstrings; the shared posture: one
scan of ``orders``, map-side-combinable aggregates, windows only over
per-nation partitions or tiny histogram frames, dimension joins broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: floor(1e6 * log10(1 + 1/d)) for d = 1..9 — pinned so neither engine's
#: libm rounding can flip an expectation (they sum to 999,995 ppm; the
#: missing 5 ppm is the nine floors).
BENFORD_PPM = (301029, 176091, 124938, 96910, 79181, 66946, 57991, 51152, 45757)

#: quartile count for the RFM scores
RFM_Q = 4


def _order_cents(tables: dict[str, DataFrame]) -> DataFrame:
    """orders projected to (o_custkey, day, cents) — one scan, two columns."""
    return tables["orders"].select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )


def _quartile_scores(per_cust: DataFrame, col: str, out: str) -> DataFrame:
    """Map each distinct value of ``col`` to its CDF quartile 1..RFM_Q.

    Histogram-cumsum: groupBy the value (map-side combinable), ONE window
    over the distinct-value histogram (|distinct| rows — bounded by the
    value domain, not the customer count), score = ceil(Q·cum_le/n).
    Equal values always share a score, unlike ``ntile``.
    """
    hist = per_cust.groupBy(F.col(col).alias("v")).agg(
        F.count("*").alias("cnt")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return hist.select(
        "v",
        F.sum("cnt").over(w).alias("cum_le"),
        F.sum("cnt").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    ).select(
        F.col("v").alias(col),
        F.ceil(
            F.lit(float(RFM_Q)) * F.col("cum_le").cast("double")
            / F.col("n").cast("double")
        )
        .cast("int")
        .alias(out),
    )


def rfm_segments(tables: dict[str, DataFrame]) -> DataFrame:
    """RFM segmentation of customers from their order history.

    Per customer (customers with no orders are out of scope — RFM scores
    the purchasing population): ``recency_days`` = days from their last
    order to the corpus's latest order day, ``frequency`` = order count,
    ``monetary_cents`` = lifetime spend; each dimension scored into CDF
    quartiles 1..4 (r_q=1 ⇒ most recent tier, m_q=4 ⇒ top spend tier) and
    packed into the classic ``rfm_code`` = r·100 + f·10 + m.

    Plan: ONE scan → per-customer groupBy (1 shuffle on o_custkey),
    persisted — the max-day agg, the three histogram score maps, and the
    output all branch off the cached |customers|-row frame instead of
    re-reading orders (without the persist this plan re-scans the corpus
    8×) → 1-row max-day agg broadcast-crossed in → three histogram-cumsum
    score maps broadcast-joined back. Nothing downstream sorts globally.
    """
    from ..tables import persist_replacing

    per_cust = persist_replacing(
        _order_cents(tables)
        .groupBy("o_custkey")
        .agg(
            F.max("d").alias("last_d"),
            F.count("*").alias("frequency"),
            F.sum("cents").alias("monetary_cents"),
        ),
        "distribution.rfm_per_cust",
    )
    max_day = per_cust.agg(F.max("last_d").alias("corpus_max_d"))
    per_cust = per_cust.crossJoin(F.broadcast(max_day)).select(
        F.col("o_custkey").alias("custkey"),
        F.datediff("corpus_max_d", "last_d").alias("recency_days"),
        "frequency",
        "monetary_cents",
    )
    out = per_cust
    for col, score in (
        ("recency_days", "r_q"),
        ("frequency", "f_q"),
        ("monetary_cents", "m_q"),
    ):
        out = out.join(F.broadcast(_quartile_scores(per_cust, col, score)), col)
    return out.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        "r_q",
        "f_q",
        "m_q",
        (F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q"))
        .cast("int")
        .alias("rfm_code"),
    )


def nation_revenue_gini(tables: dict[str, DataFrame]) -> DataFrame:
    """Per-nation revenue concentration: exact Gini coefficient and the
    Lorenz top-decile share of customer lifetime spend.

    With per-customer cents x_1 ≤ … ≤ x_n (ties broken by custkey, which
    leaves both statistics unchanged — Σi·x_i is invariant under permuting
    equal values), Gini = (2·Σi·x_i − (n+1)·Σx) / (n·Σx) and the decile
    share is the spend of the ceil(n/10) largest customers over Σx. Both
    are emitted as ``floor(1e6·num/den)`` micros; num and den are exact
    int64s cast to double once, so the IEEE divide/multiply/floor chain is
    identical on both engines.

    Plan: per-customer agg (1 shuffle) → broadcast customer→nation map →
    per-NATION ranks (windows partitioned by nationkey: a per-partition
    sort, never a global one), persisted — the Gini aggregate and the
    top-decile branch both read the cached |customers|-row ranked frame
    instead of re-scanning orders (3× without the persist) → per-nation
    agg. At 100 TB the window input is |customers| rows spread over 25
    nation partitions; a skewed nation would take the salted two-level
    rank variant, but nation cardinality here is the bounded TPC-H
    dimension.
    """
    from ..tables import persist_replacing

    rev = (
        _order_cents(tables)
        .groupBy("o_custkey")
        .agg(F.sum("cents").alias("cents"))
    )
    cust = tables["customer"].select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    nation = tables["nation"].select("n_nationkey", "n_name")
    ranked = persist_replacing(
        rev.join(F.broadcast(cust), "o_custkey")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("c_nationkey").orderBy(
                    F.col("cents").asc(), F.col("o_custkey").asc()
                )
            ),
        ),
        "distribution.gini_ranked",
    )
    per_nation = ranked.groupBy("c_nationkey").agg(
        F.count("*").alias("n_customers"),
        F.sum("cents").alias("total_cents"),
        F.sum(F.col("rn").cast("long") * F.col("cents")).alias("t_weighted"),
    )
    top = (
        ranked.join(
            F.broadcast(
                per_nation.select(
                    F.col("c_nationkey").alias("nk2"),
                    F.col("n_customers").alias("n2"),
                )
            ),
            F.col("c_nationkey") == F.col("nk2"),
        )
        .where(F.col("rn") >= F.col("n2") - F.ceil(F.col("n2") / 10) + 1)
        .groupBy("c_nationkey")
        .agg(F.sum("cents").alias("top_cents"))
    )
    num = (
        F.lit(2) * F.col("t_weighted")
        - (F.col("n_customers") + F.lit(1)) * F.col("total_cents")
    ).cast("double")
    den = (F.col("n_customers") * F.col("total_cents")).cast("double")
    return (
        per_nation.join(top, "c_nationkey")
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "n_name",
            "n_customers",
            "total_cents",
            F.floor(F.lit(1000000.0) * num / den).cast("long").alias("gini_micro"),
            F.floor(
                F.lit(1000000.0)
                * F.col("top_cents").cast("double")
                / F.col("total_cents").cast("double")
            )
            .cast("long")
            .alias("top_decile_share_micro"),
        )
    )


def benford_first_digit(tables: dict[str, DataFrame]) -> DataFrame:
    """Benford's-law conformance of order amounts — the classic organic-
    vs-fabricated data-quality screen for financial facts.

    First significant digit of the cent amount (leading digit is invariant
    under the ×100 shift), counted in one map-side-combinable groupBy over
    at most 9 keys, then compared against the pinned ``BENFORD_PPM``
    expectation table. ``observed_ppm`` uses integer DIV (1e6·n fits int64
    up to ~9e12 orders); ``abs_dev_ppm`` is the per-digit gap a monitor
    would threshold (sum of gaps ≈ the L1 Benford distance in ppm).

    Scale: a single scan + a 9-group aggregate (persisted — ≤9 rows — so
    the total branch doesn't re-scan orders); the 1-row total is
    broadcast-crossed in. Nothing here grows with the corpus.
    """
    from ..tables import persist_replacing

    digits = _order_cents(tables).select(
        F.substring(F.col("cents").cast("string"), 1, 1).cast("int").alias("digit")
    )
    counts = persist_replacing(
        digits.groupBy("digit").agg(F.count("*").alias("n_orders")),
        "distribution.benford_counts",
    )
    total = counts.agg(F.sum("n_orders").alias("total"))
    expect = "CASE digit " + " ".join(
        f"WHEN {d} THEN {ppm}" for d, ppm in enumerate(BENFORD_PPM, start=1)
    ) + " END"
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n_orders",
            F.expr("1000000 * n_orders DIV total").alias("observed_ppm"),
            F.expr(expect).cast("long").alias("benford_ppm"),
        )
        .withColumn(
            "abs_dev_ppm",
            F.abs(F.col("observed_ppm") - F.col("benford_ppm")).cast("long"),
        )
    )


QUERIES = {
    "rfm_segments": rfm_segments,
    "nation_revenue_gini": nation_revenue_gini,
    "benford_first_digit": benford_first_digit,
}

_ORDER_CENTS_CTE = """
        oc AS (
          SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
                 CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
          FROM orders
        )
"""

_BENFORD_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN {ppm}" for d, ppm in enumerate(BENFORD_PPM, start=1)
) + " END"

ORACLES: dict[str, str] = {
    "rfm_segments": f"""
        WITH {_ORDER_CENTS_CTE},
        per_cust AS MATERIALIZED (
          SELECT o_custkey AS custkey,
                 date_diff('day', max(d),
                           (SELECT max(d) FROM oc)) AS recency_days,
                 count(*) AS frequency,
                 CAST(sum(cents) AS BIGINT) AS monetary_cents
          FROM oc GROUP BY o_custkey
        ),
        scored AS (
          -- grouping must mirror Spark exactly: (4.0 * cum) / n, never
          -- 4.0 * (cum / n) — the two double chains can round differently
          SELECT custkey, recency_days, frequency, monetary_cents,
                 CAST(ceil({float(RFM_Q)} * CAST(count(*) OVER (ORDER BY recency_days
                        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS DOUBLE) / CAST(count(*) OVER () AS DOUBLE))
                      AS INTEGER) AS r_q,
                 CAST(ceil({float(RFM_Q)} * CAST(count(*) OVER (ORDER BY frequency
                        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS DOUBLE) / CAST(count(*) OVER () AS DOUBLE))
                      AS INTEGER) AS f_q,
                 CAST(ceil({float(RFM_Q)} * CAST(count(*) OVER (ORDER BY monetary_cents
                        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS DOUBLE) / CAST(count(*) OVER () AS DOUBLE))
                      AS INTEGER) AS m_q
          FROM per_cust
        )
        SELECT custkey, CAST(recency_days AS INTEGER) AS recency_days,
               frequency, monetary_cents, r_q, f_q, m_q,
               CAST(r_q * 100 + f_q * 10 + m_q AS INTEGER) AS rfm_code
        FROM scored
    """,
    "nation_revenue_gini": f"""
        WITH {_ORDER_CENTS_CTE},
        rev AS MATERIALIZED (
          SELECT o_custkey, CAST(sum(cents) AS BIGINT) AS cents
          FROM oc GROUP BY o_custkey
        ),
        ranked AS MATERIALIZED (
          SELECT r.o_custkey, r.cents, c.c_nationkey,
                 row_number() OVER (PARTITION BY c.c_nationkey
                                    ORDER BY r.cents ASC, r.o_custkey ASC)
                   AS rn
          FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey
        ),
        per_nation AS MATERIALIZED (
          SELECT c_nationkey, count(*) AS n_customers,
                 CAST(sum(cents) AS BIGINT) AS total_cents,
                 CAST(sum(CAST(rn AS BIGINT) * cents) AS BIGINT) AS t_weighted
          FROM ranked GROUP BY c_nationkey
        ),
        top AS (
          SELECT r.c_nationkey, CAST(sum(r.cents) AS BIGINT) AS top_cents
          FROM ranked r JOIN per_nation p USING (c_nationkey)
          WHERE r.rn >= p.n_customers - CAST(ceil(p.n_customers / 10.0) AS BIGINT) + 1
          GROUP BY r.c_nationkey
        )
        SELECT n.n_name, p.n_customers, p.total_cents,
               CAST(floor(1000000.0
                 * CAST(2 * p.t_weighted
                        - (p.n_customers + 1) * p.total_cents AS DOUBLE)
                 / CAST(p.n_customers * p.total_cents AS DOUBLE))
                 AS BIGINT) AS gini_micro,
               CAST(floor(1000000.0 * CAST(t.top_cents AS DOUBLE)
                 / CAST(p.total_cents AS DOUBLE)) AS BIGINT)
                 AS top_decile_share_micro
        FROM per_nation p
        JOIN top t USING (c_nationkey)
        JOIN nation n ON p.c_nationkey = n.n_nationkey
    """,
    "benford_first_digit": f"""
        WITH {_ORDER_CENTS_CTE},
        counts AS (
          SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER)
                   AS digit,
                 count(*) AS n_orders
          FROM oc GROUP BY 1
        )
        SELECT digit, n_orders,
               CAST(1000000 * n_orders // (SELECT sum(n_orders) FROM counts)
                 AS BIGINT) AS observed_ppm,
               CAST({_BENFORD_CASE} AS BIGINT) AS benford_ppm,
               CAST(abs(1000000 * n_orders
                        // (SELECT sum(n_orders) FROM counts)
                        - ({_BENFORD_CASE})) AS BIGINT) AS abs_dev_ppm
        FROM counts
    """,
}
