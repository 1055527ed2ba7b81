"""Semantic checks for the distributional analytics operators (the
cross-engine hash parity itself is covered by test_oracle_parity)."""

from __future__ import annotations

import math

from streamming_processing_pyspark_spark.operators import distribution


def _orders(spark, rows):
    return spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )


def test_benford_constants_are_the_floored_log10_table():
    assert distribution.BENFORD_PPM == tuple(
        math.floor(1e6 * math.log10(1 + 1 / d)) for d in range(1, 10)
    )
    assert sum(distribution.BENFORD_PPM) == 999995


def test_benford_first_digit_counts_and_ppm(spark):
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, "O", 1.23, t, "1-URGENT"),   # 123 cents  -> digit 1
        (2, 1, "O", 19.99, t, "1-URGENT"),  # 1999       -> digit 1
        (3, 2, "O", 100.0, t, "1-URGENT"),  # 10000      -> digit 1
        (4, 2, "O", 950.0, t, "1-URGENT"),  # 95000      -> digit 9
    ]
    out = {
        r["digit"]: r
        for r in distribution.benford_first_digit(
            {"orders": _orders(spark, rows)}
        ).collect()
    }
    assert set(out) == {1, 9}
    assert out[1]["n_orders"] == 3 and out[9]["n_orders"] == 1
    assert out[1]["observed_ppm"] == 750000
    assert out[9]["observed_ppm"] == 250000
    assert out[1]["benford_ppm"] == 301029
    assert out[1]["abs_dev_ppm"] == 750000 - 301029


def test_gini_zero_for_equal_spend_and_high_for_concentrated(spark):
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    cust = spark.createDataFrame(
        [(c, f"c{c}", 0, 0.0, "BUILDING") for c in range(1, 6)],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )
    nation = spark.createDataFrame(
        [(0, "ZERONIA", 0, "x")],
        "n_nationkey int, n_name string, n_regionkey int, n_comment string",
    )
    equal = [(i, c, "O", 100.0, t, "p") for i, c in enumerate(range(1, 6))]
    row = distribution.nation_revenue_gini(
        {"orders": _orders(spark, equal), "customer": cust, "nation": nation}
    ).collect()
    assert len(row) == 1 and row[0]["gini_micro"] == 0
    # ceil(5/10)=1 top customer; ties resolved to the largest custkey
    assert row[0]["top_decile_share_micro"] == 200000

    skew = [(i, c, "O", (10000.0 if c == 5 else 0.01), t, "p")
            for i, c in enumerate(range(1, 6))]
    row = distribution.nation_revenue_gini(
        {"orders": _orders(spark, skew), "customer": cust, "nation": nation}
    ).collect()[0]
    # near-total concentration in 1 of 5 customers -> Gini near 4/5
    assert 790000 < row["gini_micro"] <= 800000
    assert row["top_decile_share_micro"] > 999000


def test_rfm_quartiles_and_tie_stability(spark):
    import datetime as dt

    def o(k, c, price, day):
        return (k, c, "O", price, dt.datetime(2024, 1, day), "p")

    # 4 customers, distinct monetary ladder, same single-order frequency,
    # same order day -> m_q spreads 1..4, f_q and r_q collapse to 4 (all
    # rows share the value, cum_le = n)
    rows = [o(1, 1, 10.0, 5), o(2, 2, 20.0, 5), o(3, 3, 30.0, 5), o(4, 4, 40.0, 5)]
    out = {
        r["custkey"]: r
        for r in distribution.rfm_segments(
            {"orders": _orders(spark, rows)}
        ).collect()
    }
    assert [out[c]["m_q"] for c in (1, 2, 3, 4)] == [1, 2, 3, 4]
    assert all(out[c]["f_q"] == 4 and out[c]["r_q"] == 4 for c in out)
    assert out[4]["rfm_code"] == 444
    assert all(out[c]["recency_days"] == 0 for c in out)


def test_classifier_decile_lift_identities(spark):
    """Lift-table invariants on real corpus data: decile sizes sum to the
    joined corpus, capture is monotone from the top and ends at 100%, and
    the docs-weighted average lift is 1x (1e6 micro) up to floor error."""
    from streamming_processing_pyspark_spark.operators.sampling import (
        classifier_decile_lift,
    )
    from streamming_processing_pyspark_spark.tables import load_tables

    rows = classifier_decile_lift(
        load_tables(spark, "/root/testdata/sf0.001")
    ).collect()
    assert 1 <= len(rows) <= 10
    by_dec = sorted(rows, key=lambda r: -r["score_decile"])
    n_tot = sum(r["n_docs"] for r in rows)
    p_tot = sum(r["n_pos"] for r in rows)
    assert p_tot > 0
    # cumulative capture from the top: non-decreasing, ends at 10000 bp
    caps = [r["cum_capture_bp"] for r in by_dec]
    assert caps == sorted(caps)
    assert caps[-1] == 10000
    # sum over deciles of n_docs * lift == n_tot * 1e6, within floor slack
    weighted = sum(r["n_docs"] * r["lift_micro"] for r in rows)
    assert n_tot * 1_000_000 - len(rows) * n_tot <= weighted <= n_tot * 1_000_000
