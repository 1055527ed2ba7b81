"""Property tests for the round-8 second-wave batch (winnowing, star CC,
diversity, curriculum, backlog). Oracle parity itself is covered by the
parametrized test_oracle_parity sweep."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamming_processing_pyspark_spark.operators import analytics5, pipeline
from streamming_processing_pyspark_spark.tables import load_tables

from .conftest import SF_DIR


def _docs(spark, rows):
    return {
        "documents": spark.createDataFrame(
            [(i, txt, "en", "srcT", len(txt)) for i, txt in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
    }


def test_winnow_guarantee_shared_run_collides(spark):
    """TRUE winnowing's guarantee: ANY shared run of WINNOW_K +
    WINNOW_W - 1 tokens (the minimum — one full window of W k-grams
    lies inside it) contributes at least one identical SELECTED
    fingerprint to both documents, regardless of offset or surrounding
    text. Randomized over many offset/context combinations so the
    property can't pass by hash luck (the pre-round-9 trailing-minimum
    sampler failed ~35% of these)."""
    import random

    rng = random.Random(20260816)
    run_len = analytics5.WINNOW_K + analytics5.WINNOW_W - 1
    rows, expect_pairs = [], []
    doc_id = 0
    for case in range(30):
        run = " ".join(f"r{case}t{j}" for j in range(run_len))
        docs = []
        for side in range(2):
            pre = " ".join(
                f"p{case}s{side}w{rng.randrange(10_000)}"
                for _ in range(rng.randrange(0, 9))
            )
            post = " ".join(
                f"q{case}s{side}w{rng.randrange(10_000)}"
                for _ in range(rng.randrange(0, 9))
            )
            text = " ".join(x for x in (pre, run, post) if x)
            doc_id += 1
            rows.append((doc_id, text))
            docs.append(doc_id)
        expect_pairs.append(tuple(docs))
    t = _docs(spark, rows)
    fps = {}
    for r in analytics5._winnow_positions(t).collect():
        fps.setdefault(r["doc_id"], set()).add(r["h"])
    for a, b in expect_pairs:
        assert fps[a] & fps[b], (
            f"shared {run_len}-token run produced no shared fingerprint"
            f" for docs {a},{b}"
        )


def test_winnow_catalyst_matches_arrow(spark):
    """The Catalyst window-min extraction (production batch path) and
    the Arrow kernel (streaming path / check twin) must select identical
    (doc, position, hash) sets — the same true-winnowing order statistic
    computed two independent ways."""
    t = load_tables(spark, SF_DIR)
    catalyst = {
        (r["doc_id"], r["pos"], r["h"])
        for r in analytics5._winnow_positions(t).collect()
    }
    arrow = {
        (r["doc_id"], p, h)
        for r in analytics5._docs_with_fps(t).collect()
        for p, h in zip(r["selpos"], r["sel"])
    }
    assert catalyst == arrow


def test_winnow_density_near_theoretical(spark):
    """Selection density should sit near 2/(w+1) of k-grams on natural
    (non-degenerate) text — the sampler-health property the stats op
    exists to monitor."""
    t = load_tables(spark, SF_DIR)
    rows = analytics5.winnow_sampler_stats(t).collect()
    assert rows
    expect = 2_000_000 // (analytics5.WINNOW_W + 1)  # ppm
    for r in rows:
        assert r["n_selected"] <= r["n_kgrams"]
        assert 0 < r["density_ppm"] <= 1_000_000
        # generous band: hash-order noise on small sources
        assert abs(r["density_ppm"] - expect) < 200_000, (
            r["source"],
            r["density_ppm"],
        )


def test_winnow_pairs_are_symmetric_free_and_thresholded(spark):
    t = load_tables(spark, SF_DIR)
    rows = analytics5.winnow_fingerprint_pairs(t).collect()
    assert rows, "fixture near-dup twins should produce winnow pairs"
    seen = set()
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert r["n_shared"] >= analytics5.WINNOW_MIN_SHARED
        assert (r["id_a"], r["id_b"]) not in seen
        seen.add((r["id_a"], r["id_b"]))


def test_star_cc_on_chain_and_islands(spark):
    """A 10-node chain plus a 2-node island: star contraction must label
    every node with the component minimum, in O(log n) rounds."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 10)] + [(100, 101)],
        "id_a long, id_b long",
    )
    got = {
        r["doc_id"]: r["component"]
        for r in pipeline._star_connected_components(pairs).collect()
    }
    assert got == {**{i: 1 for i in range(1, 11)}, 100: 100, 101: 100}
    assert pipeline.LAST_STAR_ROUNDS <= 8


def test_star_cc_matches_pointer_doubling(spark):
    """Two independently-derived CC algorithms must agree label-for-label
    on the real near-dup graph."""
    t = load_tables(spark, SF_DIR)
    star = {
        (r["doc_id"], r["component"])
        for r in pipeline.dedup_clusters_star(t).collect()
    }
    ptr = {
        (r["doc_id"], r["component"])
        for r in pipeline.dedup_clusters(t).collect()
    }
    assert star == ptr


def test_curriculum_partitions_all_docs_and_token_mass(spark):
    t = load_tables(spark, SF_DIR)
    rows = sorted(
        analytics5.curriculum_stage_assign(t).collect(),
        key=lambda r: r["stage"],
    )
    n_docs = t["documents"].count()
    total_tok = (
        t["documents"]
        .select(F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["tokens"] for r in rows) == total_tok
    assert sum(r["token_share_bp"] for r in rows) <= 10_000
    # value-bucketed stages: length ranges are disjoint and ordered
    for prev, cur in zip(rows, rows[1:]):
        assert prev["max_tokens"] < cur["min_tokens"]


def test_diversity_rows_bounded_and_complete(spark):
    t = load_tables(spark, SF_DIR)
    rows = analytics5.distinct_ngram_diversity(t).collect()
    n_sources = t["documents"].select("source").distinct().count()
    assert len(rows) == n_sources * len(analytics5.DIVERSITY_NGRAMS)
    per = {}
    for r in rows:
        assert 0 < r["diversity_ppm"] <= 1_000_000
        assert r["distinct_ngrams"] <= r["total_ngrams"]
        per.setdefault(r["source"], {})[r["n"]] = r["diversity_ppm"]
    # longer n-grams are rarer to repeat → diversity non-decreasing in n
    for source, d in per.items():
        assert d[1] <= d[2] <= d[3], (source, d)


def test_backlog_covers_every_open_order(spark):
    t = load_tables(spark, SF_DIR)
    rows = analytics5.order_backlog_aging(t).collect()
    open_orders = t["orders"].where(
        F.col("o_orderstatus").isin("O", "P")
    )
    assert sum(r["n_orders"] for r in rows) == open_orders.count()
    valid = set(analytics5.BACKLOG_DAY_BUCKETS) | {0}
    for r in rows:
        assert r["age_bucket_days"] in valid
        assert r["backlog_cents"] > 0


def test_threshold_sweep_monotone_and_consistent(spark):
    """Both sweeps: counts non-increasing in θ. The EXACT check's θ=30
    cell must equal the registered ngram_jaccard_pairs count (identical
    capped discovery AND identical rounded-float gate — ADVICE r8). The
    BANDED production sweep's θ=30 cell must equal the verified LSH
    pair count, and every banded cell must be a subset of the exact
    UNCAPPED sweep at the same θ (the LSH family's subset contract)."""
    from streamming_processing_pyspark_spark.operators import dedup

    t = load_tables(spark, SF_DIR)

    def cells(df):
        rows = sorted(df.collect(), key=lambda r: r["theta_pct"])
        assert [r["theta_pct"] for r in rows] == sorted(
            dedup.SWEEP_THETAS_PCT
        )
        for prev, cur in zip(rows, rows[1:]):
            assert prev["n_pairs"] >= cur["n_pairs"]
            assert prev["n_docs_in_pairs"] >= cur["n_docs_in_pairs"]
        return rows

    exact_rows = cells(dedup.near_dup_threshold_sweep_check(t))
    assert exact_rows[0]["n_pairs"] == dedup.ngram_jaccard_pairs(t).count()

    banded_rows = cells(dedup.near_dup_threshold_sweep(t))
    lsh = dedup.minhash_lsh_pairs(t).collect()
    assert banded_rows[0]["n_pairs"] == len(lsh)
    # subset vs the exact UNCAPPED pair set per θ
    uncapped = dedup.ngram_jaccard_pairs(t, max_shingle_df=None).collect()
    for row in banded_rows:
        th = row["theta_pct"] / 100.0
        n_banded = sum(1 for r in lsh if r["jaccard"] >= th)
        n_exact = sum(1 for r in uncapped if r["jaccard"] >= th)
        assert row["n_pairs"] == n_banded
        assert n_banded <= n_exact


def test_langid_confusion_shares_and_totals(spark):
    from streamming_processing_pyspark_spark.operators import text

    t = load_tables(spark, SF_DIR)
    rows = text.langid_confusion_matrix(t).collect()
    assert sum(r["n_docs"] for r in rows) == t["documents"].count()
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r["lang"], []).append(r["share_bp"])
    for lang, shares in per_lang.items():
        assert sum(shares) <= 10_000
        assert all(0 <= s <= 10_000 for s in shares)


def test_streaming_backlog_matches_batch(spark):
    """Stream/batch parity: the streaming twin must produce the exact
    batch cells."""
    from streamming_processing_pyspark_spark.registry import (
        streaming_order_backlog,
    )

    t = load_tables(spark, SF_DIR)
    batch = {
        (r["o_orderpriority"], r["age_bucket_days"]): (
            r["n_orders"],
            r["backlog_cents"],
        )
        for r in analytics5.order_backlog_aging(t).collect()
    }
    stream = {
        (r["o_orderpriority"], r["age_bucket_days"]): (
            r["n_orders"],
            r["backlog_cents"],
        )
        for r in streaming_order_backlog(spark, SF_DIR).collect()
    }
    assert batch == stream


def test_skew_report_identities(spark):
    """The one-row audit must satisfy its own arithmetic identities and
    agree with a driver-side recount."""
    from streamming_processing_pyspark_spark.operators import profiling

    t = load_tables(spark, SF_DIR)
    r = profiling.join_key_skew_report(t).collect()[0]
    counts = [
        row["c"]
        for row in t["orders"]
        .groupBy("o_custkey")
        .agg(F.count("*").alias("c"))
        .collect()
    ]
    assert r["n_rows"] == sum(counts)
    assert r["n_keys"] == len(counts)
    assert r["max_rows_per_key"] == max(counts)
    assert r["p99_rows_per_key"] <= r["max_rows_per_key"]
    assert r["mean_rows_micro"] == 1_000_000 * sum(counts) // len(counts)
    assert r["skew_bp"] == 10_000 * max(counts) * len(counts) // sum(counts)


def test_new_ops_plan_shapes(spark):
    """Plan pins: backlog reads only the three order columns it needs and
    aggregates with map-side partials; the skew report's corpus stage is
    one partial-combined groupBy; curriculum/backlog stay JVM-side."""
    from streamming_processing_pyspark_spark.operators import profiling
    from streamming_processing_pyspark_spark.plans.explain import (
        assert_no_python_eval,
        assert_partial_aggregation,
        assert_read_schema_only,
    )

    t = load_tables(spark, SF_DIR)
    backlog = analytics5.order_backlog_aging(t)
    assert_read_schema_only(
        backlog,
        "orders",
        {"o_orderpriority", "o_orderstatus", "o_totalprice", "o_orderdate"},
    )
    assert_partial_aggregation(backlog)
    assert_no_python_eval(backlog)
    skew = profiling.join_key_skew_report(t)
    assert_read_schema_only(skew, "orders", {"o_custkey"})
    assert_partial_aggregation(skew)
    assert_no_python_eval(skew)
    assert_no_python_eval(analytics5.curriculum_stage_assign(t))


def test_er_entity_clusters_group_actionable_pairs(spark):
    """Every actionable ER pair's two names share an entity id, the id is
    the lexicographic minimum of its group, and weak-only names are
    absent."""
    from streamming_processing_pyspark_spark.operators import dedup

    t = load_tables(spark, SF_DIR)
    pairs = [
        (r["name_a"], r["name_b"])
        for r in dedup.er_match_scores(t)
        .where(F.col("tier") != "weak")
        .collect()
    ]
    ent = {
        r["p_name"]: r["entity_id"]
        for r in dedup.er_entity_clusters(t).collect()
    }
    assert pairs, "fixtures should yield actionable ER pairs"
    names_in_pairs = {n for p in pairs for n in p}
    assert set(ent) == names_in_pairs
    for a, b in pairs:
        assert ent[a] == ent[b]
    groups = {}
    for name, eid in ent.items():
        groups.setdefault(eid, []).append(name)
    for eid, members in groups.items():
        assert eid == min(members)


def test_streaming_winnow_matches_batch_fingerprints(spark):
    """The stream-maintained hot-fingerprint index must equal the batch
    extractor's document frequencies in the boilerplate band."""
    from streamming_processing_pyspark_spark.registry import (
        streaming_winnow_hot_fps,
    )

    t = load_tables(spark, SF_DIR)
    batch = (
        analytics5._docs_with_fps(t)
        .select("doc_id", F.explode(F.array_distinct("sel")).alias("h"))
        .groupBy("h")
        .agg(F.count("*").alias("n_docs"))
        .where(
            (F.col("n_docs") >= 2)
            & (F.col("n_docs") <= analytics5.WINNOW_MAX_DF)
        )
    )
    b = {(r["h"], r["n_docs"]) for r in batch.collect()}
    s = {
        (r["h"], r["n_docs"])
        for r in streaming_winnow_hot_fps(spark, SF_DIR).collect()
    }
    assert b == s and b


def test_incremental_winnow_novelty_agrees_with_pair_scan(spark):
    """A batch doc flagged non-novel must share ≥ MIN_SHARED fingerprints
    with the corpus index; every batch doc appears exactly once."""
    from streamming_processing_pyspark_spark.operators.dedup import (
        INCR_BATCH_MOD,
    )

    t = load_tables(spark, SF_DIR)
    rows = analytics5.incremental_winnow_novelty(t).collect()
    d = {
        r["doc_id"]: (set(r["sel"]))
        for r in analytics5._docs_with_fps(t).collect()
    }
    index = set()
    for doc_id, sel in d.items():
        if doc_id % INCR_BATCH_MOD != 0:
            index |= sel
    batch_ids = {i for i in d if i % INCR_BATCH_MOD == 0}
    assert {r["doc_id"] for r in rows} == batch_ids
    for r in rows:
        hits = len(d[r["doc_id"]] & index)
        assert r["n_hits"] == hits
        assert r["novel"] == (hits < analytics5.WINNOW_MIN_SHARED)


def test_resize_plan_invariants(spark):
    """Resize planning: never upscales, preserves aspect within integer
    truncation, long edge lands at RESIZE_MAX_DIM when downscaled, and
    bytes_saved is the exact pixel-byte delta."""
    from streamming_processing_pyspark_spark.operators import multimodal

    t = load_tables(spark, SF_DIR)
    rows = multimodal.resize_plan(t).collect()
    assert rows
    for r in rows:
        assert 0 < r["scale_micro"] <= 1_000_000
        assert r["w_dst"] <= r["w_src"] and r["h_dst"] <= r["h_src"]
        if r["scale_micro"] < 1_000_000:
            long_dst = max(r["w_dst"], r["h_dst"])
            assert (
                long_dst <= multimodal.RESIZE_MAX_DIM
                and long_dst >= multimodal.RESIZE_MAX_DIM - 1
            )
        else:
            assert (r["w_dst"], r["h_dst"]) == (r["w_src"], r["h_src"])
        assert r["bytes_saved"] == 3 * (
            r["w_src"] * r["h_src"] - r["w_dst"] * r["h_dst"]
        )


def test_png_payload_header_is_spec_valid_and_parse_roundtrips(spark):
    """The synthesized payload must be a byte-valid PNG prefix: correct
    8-byte signature, IHDR length/type, big-endian dims matching the
    documented synthesis rule, AND a correct CRC-32 over type+data —
    validated with Python's struct/zlib, independent of Spark. The
    Catalyst byte-parse (png_header_dims) must recover exactly the dims
    the header carries."""
    import struct
    import zlib

    from streamming_processing_pyspark_spark.operators import multimodal

    t = load_tables(spark, SF_DIR)
    docs = t["documents"].select("doc_id", "text").limit(50)
    rows = multimodal.with_png_payload(docs).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert rows
    for r in rows:
        p = bytes(r["payload"])
        assert p[:8] == bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A])
        (length,) = struct.unpack(">I", p[8:12])
        assert length == 13
        assert p[12:16] == b"IHDR"
        w, h = struct.unpack(">II", p[16:24])
        n = len(texts[r["doc_id"]].encode())
        assert w == 64 + n % 512
        assert h == 64 + (n // 7) % 512
        (crc,) = struct.unpack(">I", p[29:33])
        assert crc == zlib.crc32(p[12:29]) & 0xFFFFFFFF
        assert p[33:] == texts[r["doc_id"]].encode()
    parsed = {
        (r["doc_id"], r["w_src"], r["h_src"])
        for r in multimodal.resize_plan({"documents": docs}).select(
            "doc_id", "w_src", "h_src"
        ).collect()
    }
    expect = set()
    for r in rows:
        p = bytes(r["payload"])
        w, h = struct.unpack(">II", p[16:24])
        expect.add((r["doc_id"], w, h))
    assert parsed == expect


def test_er_union_candidates_and_match_tier(spark):
    """Round-9 ER upgrades: (a) the union candidate source is a strict
    superset of sorted-neighborhood alone (token blocking recovers
    far-apart sorts) and contains no duplicate pair keys; (b) the match
    tier is non-empty on the fixtures (the suffix comparator unlocks
    genuine dist-1 pairs) and er_match_clusters groups exactly the
    match-tier pairs — a subset of the actionable clustering's nodes."""
    from streamming_processing_pyspark_spark.operators import dedup

    t = load_tables(spark, SF_DIR)
    sn = {
        (r["name_a"], r["name_b"])
        for r in dedup.sorted_neighborhood_pairs(t).collect()
    }
    cand = [
        (r["name_a"], r["name_b"])
        for r in dedup.er_candidate_pairs(t).collect()
    ]
    assert len(cand) == len(set(cand))
    assert sn < set(cand)
    match_pairs = [
        (r["name_a"], r["name_b"])
        for r in dedup.er_match_scores(t)
        .where(F.col("tier") == "match")
        .collect()
    ]
    assert match_pairs, "suffix comparator should unlock match-tier pairs"
    ent = {
        r["p_name"]: r["entity_id"]
        for r in dedup.er_match_clusters(t).collect()
    }
    assert set(ent) == {n for p in match_pairs for n in p}
    for a, b in match_pairs:
        assert ent[a] == ent[b]
    actionable = {
        r["p_name"] for r in dedup.er_entity_clusters(t).collect()
    }
    assert set(ent) <= actionable
