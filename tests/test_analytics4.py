"""Property tests for the round-8 analytics batch (oracle parity itself is
covered by the parametrized test_oracle_parity sweep)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from streamming_processing_pyspark_spark.operators import analytics4
from streamming_processing_pyspark_spark.tables import load_table, load_tables

from .conftest import SF_DIR


def test_gram_topk_matches_bruteforce(spark):
    """The map-side partial-Gram path must equal the driver-side integer
    Gram of the whole table, including the |gram| ranking."""
    t = load_tables(spark, SF_DIR)
    mat = np.array(
        t["embeddings"].orderBy("vec_id").toPandas()["embedding"].tolist(),
        dtype="float64",
    )
    m = np.floor(mat * analytics4.GRAM_MICRO).astype("int64")
    g = m.T @ m
    iu, ju = np.triu_indices(g.shape[0], k=1)
    want = sorted(
        zip(np.abs(g[iu, ju]), iu, ju), key=lambda x: (-x[0], x[1], x[2])
    )[: analytics4.GRAM_TOPK]
    got = analytics4.embedding_gram_offdiag_topk(t).collect()
    assert len(got) == analytics4.GRAM_TOPK
    for row, (_, i, j) in zip(got, want):
        assert (row["i"], row["j"]) == (i, j)
        assert row["gram_micro2"] == g[i, j]


def test_context_fit_token_conservation(spark):
    """tokens_kept + tokens_lost must equal the corpus token total at
    EVERY context size, and fits must be monotone in the size."""
    t = load_tables(spark, SF_DIR)
    total = (
        t["documents"]
        .select(F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    rows = sorted(
        analytics4.context_fit_report(t).collect(), key=lambda r: r["ctx"]
    )
    assert [r["ctx"] for r in rows] == sorted(analytics4.CONTEXT_SIZES)
    fits = []
    for r in rows:
        assert r["tokens_kept"] + r["tokens_lost"] == total
        assert r["n_fit"] + r["n_truncated"] == r["n_docs"]
        fits.append(r["n_fit"])
    assert fits == sorted(fits)


def test_survivorship_totals_match_exact_dedup(spark):
    """Summed over sources, kept docs must equal the distinct-text count
    and every per-source row must balance."""
    t = load_tables(spark, SF_DIR)
    rows = analytics4.dedup_survivorship_by_source(t).collect()
    n_docs = t["documents"].count()
    n_distinct = t["documents"].select("text").distinct().count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["n_kept"] for r in rows) == n_distinct
    for r in rows:
        assert r["n_kept"] + r["n_dropped"] == r["n_docs"]
        assert r["n_lost_to_other_source"] <= r["n_dropped"]


def test_revenue_deciles_cover_all_customers(spark):
    """Every customer lands in exactly one decile; revenue sums to the
    total; decile boundaries are honored (decile k max rev ≤ decile k+1
    min rev)."""
    t = load_tables(spark, SF_DIR)
    rows = sorted(
        analytics4.customer_revenue_deciles(t).collect(),
        key=lambda r: r["decile"],
    )
    n_cust = t["orders"].select("o_custkey").distinct().count()
    total_c = (
        t["orders"]
        .agg(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")))
        .collect()[0][0]
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
    assert sum(r["rev_cents"] for r in rows) == total_c
    shares = [r["rev_share_bp"] for r in rows]
    assert shares == sorted(shares)  # later deciles carry more revenue


def test_source_share_drift_shares_sum(spark):
    """Each half's shares must sum to ~10000 bp (integer floor division
    loses at most |sources| bp)."""
    t = load_tables(spark, SF_DIR)
    rows = analytics4.source_share_drift(t).collect()
    for col in ("share_a_bp", "share_b_bp"):
        s = sum(r[col] for r in rows)
        assert 10000 - len(rows) <= s <= 10000, (col, s)


def test_inter_event_gaps_partition_by_power_of_two(spark):
    """Every gap must land in the bucket whose [2^(b-1), 2^b) range
    contains it, and bucket counts must sum to (events − users)."""
    t = load_tables(spark, SF_DIR)
    rows = analytics4.inter_event_time_histogram(t).collect()
    n_events = t["events"].count()
    n_users = t["events"].select("user_id").distinct().count()
    assert sum(r["n_gaps"] for r in rows) == n_events - n_users
    for r in rows:
        b = r["bucket"]
        lo = 0 if b == 0 else 2 ** (b - 1)
        assert lo <= r["min_dt_s"] <= r["max_dt_s"]
        assert r["max_dt_s"] < 2**b


def test_prefix_dup_groups_share_prefix(spark):
    """Every reported group's members must genuinely share the first
    PREFIX_TOKENS tokens (hash groups are not collisions)."""
    t = load_tables(spark, SF_DIR)
    groups = analytics4.prefix_dup_groups(t).collect()
    assert groups
    texts = {r["doc_id"]: r["text"] for r in t["documents"].collect()}

    def prefix(s):
        return " ".join(s.strip().split()[: analytics4.PREFIX_TOKENS])

    by_prefix: dict[str, list[int]] = {}
    for did, txt in texts.items():
        by_prefix.setdefault(prefix(txt), []).append(did)
    want = {min(v): len(v) for v in by_prefix.values() if len(v) > 1}
    got = {r["canonical_id"]: r["n_docs"] for r in groups}
    assert got == want


def test_length_gini_bounds_and_uniform_zero(spark):
    """Gini must sit in [0, 1e6) per source; a constant-length synthetic
    source must score ~0."""
    from pyspark.sql import functions as F

    t = load_tables(spark, SF_DIR)
    for r in analytics4.doc_length_gini_by_source(t).collect():
        assert 0 <= r["gini_micro"] < 1_000_000
        assert r["top_decile_share_micro"] >= 10000 // r["n_docs"]
    const = {
        "documents": spark.createDataFrame(
            [(i, "a b c", "x", "s0", 5) for i in range(40)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
    }
    row = analytics4.doc_length_gini_by_source(const).first()
    assert row["gini_micro"] == 0
