"""Property tests for the round-7 analytics batch (oracle parity itself is
covered by the parametrized test_oracle_parity sweep)."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from streamming_processing_pyspark_spark.operators import analytics3
from streamming_processing_pyspark_spark.tables import load_table, load_tables

from .conftest import SF_DIR


def test_rolling_active_users_matches_bruteforce(spark):
    """The broadcast-grid range join must equal the brute-force definition:
    for every day d, |{user : user active in [d-6, d]}|."""
    ev = load_table(spark, SF_DIR, "events")
    rows = (
        ev.select(F.date_trunc("day", "ts").alias("day"), "user_id")
        .distinct()
        .collect()
    )
    by_day: dict[datetime, set] = {}
    for r in rows:
        by_day.setdefault(r["day"], set()).add(r["user_id"])
    got = {
        r["day"]: (r["active_users_7d"], r["active_users_1d"])
        for r in analytics3.rolling_7d_active_users({"events": ev}).collect()
    }
    assert set(got) == set(by_day)
    for d, (a7, a1) in got.items():
        want7 = set()
        for k in range(analytics3.ACTIVE_WINDOW_DAYS):
            want7 |= by_day.get(d - timedelta(days=k), set())
        assert a7 == len(want7), d
        assert a1 == len(by_day[d]), d


def test_morton_interleave_bijective(spark):
    """The div/mod Morton interleave must be a bijection on the
    16×16 grid (distinct codes = 256, range [0, 255]) — the property that
    makes Z-range file assignment a true space-filling layout."""
    grid = spark.range(0, 256).select(
        (F.col("id") % 16).alias("x"), (F.col("id") / 16).cast("long").alias("y")
    )
    z = grid.select(
        analytics3._morton(F.col("x"), F.col("y"), analytics3.Z_BITS).alias("z")
    )
    vals = sorted(r["z"] for r in z.collect())
    assert vals == list(range(256))


def test_zorder_files_are_contiguous_code_ranges(spark):
    """Every target file must cover a disjoint contiguous Morton range
    (file_id·span ≤ z < (file_id+1)·span) — what gives the layout its
    per-file min/max skipping guarantees."""
    t = load_tables(spark, SF_DIR)
    for r in analytics3.zorder_cluster_assign(t).collect():
        lo = r["file_id"] * analytics3.Z_CODES_PER_FILE
        hi = lo + analytics3.Z_CODES_PER_FILE - 1
        assert lo <= r["z_min"] <= r["z_max"] <= hi


def test_compression_ratio_short_doc_null_and_bounds(spark):
    """Docs shorter than the n-gram width emit NULL metrics; ratios stay
    in (0, 1000]; a fully repeated doc is flagged repetitive."""
    docs = spark.createDataFrame(
        [
            (1, "too short"),
            (2, " ".join(["spam"] * 40)),
            (3, " ".join(f"w{i}" for i in range(40))),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in analytics3.text_compression_ratio({"documents": docs}).collect()
    }
    assert out[1]["n_grams"] is None and out[1]["repetitive"] is None
    assert out[2]["n_distinct_grams"] == 1 and out[2]["repetitive"]
    assert out[3]["distinct_milli"] == 1000 and not out[3]["repetitive"]


def test_anonymization_ladder_monotone_and_nested(spark):
    """Generalizing can only merge cells: coarser widths have fewer cells,
    a no-smaller minimum cell size, and no-more rows at risk — the
    property that makes the ladder a usable anonymization dial."""
    t = load_tables(spark, SF_DIR)
    rows = sorted(
        analytics3.anonymization_ladder(t).collect(),
        key=lambda r: r["bucket_width"],
    )
    assert [r["bucket_width"] for r in rows] == list(analytics3.LADDER_WIDTHS)
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_cells"] <= prev["n_cells"]
        assert cur["min_cell_rows"] >= prev["min_cell_rows"]
        assert cur["rows_at_risk"] <= prev["rows_at_risk"]


def test_token_budget_waterfill_invariants(spark):
    """Allocation must respect every cap, land the budget within the
    floor-rounding slack (budget − Σalloc < |unsaturated sources|), and
    saturate exactly the sources whose full cap costs less water than
    their weight share buys."""
    from streamming_processing_pyspark_spark.operators import mixing

    t = load_tables(spark, SF_DIR)
    rows = mixing.token_budget_waterfill(t).collect()
    assert rows
    total_cap = sum(r["cap_tokens"] for r in rows)
    budget = total_cap * mixing.WF_BUDGET_NUM // mixing.WF_BUDGET_DEN
    alloc = sum(r["alloc_tokens"] for r in rows)
    n_unsat = sum(1 for r in rows if not r["saturated"])
    assert alloc <= budget
    # each unsaturated source loses < 1 token to the floor, nothing else
    assert budget - alloc <= max(n_unsat, 0), (budget, alloc, n_unsat)
    assert n_unsat > 0  # half the corpus can't saturate every source
    for r in rows:
        assert 0 <= r["alloc_tokens"] <= r["cap_tokens"]
        if r["saturated"]:
            assert r["alloc_tokens"] == r["cap_tokens"]


def test_cluster_size_histogram_consistent_with_labels(spark):
    """Histogram must re-aggregate the label map exactly: Σ size·n =
    clustered docs, Σ docs_removed = clustered docs − clusters."""
    from streamming_processing_pyspark_spark.operators import pipeline as pl

    t = load_tables(spark, SF_DIR)
    labels = pl.dedup_clusters(t).collect()
    hist = pl.dedup_cluster_size_histogram(t).collect()
    n_docs = len(labels)
    n_comps = len({r["component"] for r in labels})
    assert sum(r["cluster_size"] * r["n_clusters"] for r in hist) == n_docs
    assert sum(r["docs_removed"] for r in hist) == n_docs - n_comps
    assert all(r["cluster_size"] >= 2 for r in hist)


def test_asof_next_event_semantics(spark):
    """Forward as-of: nearest event AT/AFTER the order date (inclusive),
    min-event_id tie-break at equal timestamps, unmatched orders drop."""
    from streamming_processing_pyspark_spark.operators import asof

    orders = spark.createDataFrame(
        [
            (100, 7, "2024-01-10 00:00:00"),
            (101, 7, "2024-01-15 00:00:00"),  # equal to event ts → inclusive
            (102, 7, "2024-01-20 00:00:00"),  # after last event → drops
            (103, 8, "2024-01-01 00:00:00"),  # user with no events → drops
        ],
        "o_orderkey long, o_custkey long, o_orderdate string",
    ).select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
    )
    ev = spark.createDataFrame(
        [
            (1, 7, "2024-01-12 00:00:00"),
            (2, 7, "2024-01-15 00:00:00"),
            (3, 7, "2024-01-15 00:00:00"),  # tie: min event_id 2 wins
        ],
        "event_id long, user_id long, ts string",
    ).select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
    got = {
        r["o_orderkey"]: r["event_id"]
        for r in asof.asof_next_event({"events": ev, "orders": orders}).collect()
    }
    assert got == {100: 1, 101: 2}


def test_exact_percentiles_match_bruteforce(spark):
    """Histogram-cumsum percentiles must equal the ceil-rank order
    statistic of the sorted cents list, per group."""
    import math

    from streamming_processing_pyspark_spark.operators import relational2

    ev = load_table(spark, SF_DIR, "events")
    cents = {}
    for r in ev.select(
        "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("c")
    ).collect():
        cents.setdefault(r["event_type"], []).append(r["c"])
    got = {
        r["event_type"]: r
        for r in relational2.exact_percentiles_by_type({"events": ev}).collect()
    }
    assert set(got) == set(cents)
    for etype, vals in cents.items():
        vals.sort()
        row = got[etype]
        assert row["n_events"] == len(vals)
        for q in relational2.EXACT_PCT:
            rank = math.ceil(q * len(vals) / 100)
            assert row[f"p{q}_cents"] == vals[rank - 1], (etype, q)


def test_referential_integrity_detects_planted_breaks(spark):
    """Plant one orphan lineitem order, one childless order and one
    dangling customer FK in a toy warehouse and assert each counter."""
    orders = spark.createDataFrame(
        [(1, 10, 100.0), (2, 10, 200.0), (3, 99, 50.0)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    ).withColumn("o_orderstatus", F.lit("O"))
    lineitem = spark.createDataFrame(
        [(1, 100.0, 0.0, 0.0), (7, 10.0, 0.0, 0.0)],
        "l_orderkey long, l_extendedprice double, l_discount double,"
        " l_tax double",
    )
    customer = spark.createDataFrame([(10,)], "c_custkey long")
    row = analytics3.referential_integrity_audit(
        {"orders": orders, "lineitem": lineitem, "customer": customer}
    ).first()
    assert row["n_orders"] == 3
    assert row["n_orphan_lineitem_orders"] == 1  # orderkey 7
    assert row["n_childless_orders"] == 2  # orders 2 and 3
    assert row["n_orders_no_customer"] == 1  # order 3 → custkey 99
    assert row["n_price_mismatch"] == 0  # order 1 header == its one line


def test_dup_leakage_minhash_subset_and_bounded(spark):
    """The banded-source matrix must be cellwise dominated by the exact
    matrix (minhash pairs are an exact-verified subset), and the check
    query must assert exactly that as data."""
    t = load_tables(spark, SF_DIR)
    exact = {
        (r["source_a"], r["source_b"]): r["n_pairs"]
        for r in analytics3.dup_leakage_matrix(t).collect()
    }
    mh = {
        (r["source_a"], r["source_b"]): r["n_pairs"]
        for r in analytics3.dup_leakage_matrix_minhash(t).collect()
    }
    assert mh, "banded matrix must be non-empty on the test fixtures"
    for cell, n in mh.items():
        assert cell in exact and n <= exact[cell], (cell, n, exact.get(cell))
    row = analytics3.dup_leakage_matrix_minhash_check(t).first()
    assert row["subset_ok"] and row["bounded_ok"]
    assert row["n_cells_exact"] == len(exact)
