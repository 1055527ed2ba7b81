"""Focused tests for operators/analytics2.py (the oracle-parity sweep in
test_oracle_parity.py covers value correctness; these pin the scale
properties the module's docstrings claim)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamming_processing_pyspark_spark.operators import analytics2
from streamming_processing_pyspark_spark.plans.explain import (
    assert_partial_aggregation,
    assert_whole_stage_codegen,
    plan_string,
)
from streamming_processing_pyspark_spark.tables import load_tables

from .conftest import SF_DIR


def test_bitmap_distinct_avoids_expand(spark):
    """The bitmap path must NOT plan count-distinct's Expand + double
    shuffle of raw values — its shuffle payload is the bitmap state."""
    t = load_tables(spark, SF_DIR)
    df = analytics2.bitmap_distinct_users(t)
    plan = plan_string(df)
    assert "Expand" not in plan
    assert_partial_aggregation(df)


def test_bitmap_equals_exact_distinct(spark):
    t = load_tables(spark, SF_DIR)
    got = {
        r.event_type: r.n_users
        for r in analytics2.bitmap_distinct_users(t).collect()
    }
    want = {
        r.event_type: r.n
        for r in t["events"]
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want


def test_salted_join_equals_plain_join(spark):
    t = load_tables(spark, SF_DIR)
    salted = {
        r.c_mktsegment: (r.n_events, r.sum_value_cents)
        for r in analytics2.salted_customer_join(t).collect()
    }
    ev, cust = t["events"], t["customer"]
    plain = {
        r.c_mktsegment: (r.n_events, r.sum_value_cents)
        for r in ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
                "sum_value_cents"
            ),
        )
        .collect()
    }
    assert salted == plain


def test_salted_join_spreads_hot_keys(spark):
    """Every (user_id, salt) sub-key must carry ~1/N_SALT of that user's
    rows — i.e. the salt actually splits hot keys, not just renames them."""
    t = load_tables(spark, SF_DIR)
    ev = t["events"]
    per_salt = (
        ev.select(
            "user_id",
            F.pmod(F.xxhash64("event_id"), F.lit(analytics2.N_SALT)).alias("salt"),
        )
        .groupBy("user_id")
        .agg(F.countDistinct("salt").alias("n_salts"), F.count("*").alias("n"))
        .where(F.col("n") >= 2 * analytics2.N_SALT)
    )
    bad = per_salt.where(F.col("n_salts") < analytics2.N_SALT // 2).count()
    assert bad == 0


def test_corr_stays_codegen(spark):
    t = load_tables(spark, SF_DIR)
    df = analytics2.corr_qty_price_by_flag(t)
    assert_whole_stage_codegen(df)
    assert_partial_aggregation(df)


def test_pagerank_mass_and_determinism(spark):
    """Fixed-point PageRank: total rank mass stays within deterministic
    rounding loss of SCALE, every node gets >= the teleport base, and two
    runs agree exactly (pure-integer algebra)."""
    from streamming_processing_pyspark_spark.operators.events_analytics import (
        PR_SCALE,
        pagerank_event_types,
    )
    from streamming_processing_pyspark_spark.tables import load_tables

    t = load_tables(spark, SF_DIR)
    a = pagerank_event_types(t).toPandas().sort_values("node").reset_index(drop=True)
    n = len(a)
    base = (15 * PR_SCALE) // (100 * n)
    assert (a["rank_micro"] >= base).all()
    loss_bound = n * n + 2 * n  # per-edge + per-node floor losses, 3 rounds
    assert PR_SCALE - 3 * loss_bound <= a["rank_micro"].sum() <= PR_SCALE
    b = pagerank_event_types(t).toPandas().sort_values("node").reset_index(drop=True)
    assert a.equals(b)
