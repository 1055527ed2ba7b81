"""Central query registry — the driver-contract surface.

Merges every operator module's ``QUERIES`` (Spark implementations) and
``ORACLES`` (DuckDB ANSI-SQL equivalents) into the two dicts
``__spark_entry__.py`` exposes. Queries without an oracle entry are
non-SQL-expressible by design (xxhash64-based MinHash/SimHash, approximate
LSH) and get the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from .functions.geo import classify_sql
from .operators import (
    analytics2,
    analytics3,
    analytics4,
    analytics5,
    distribution,
    asof,
    attribution,
    campaign,
    coreset,
    curation,
    dedup,
    events_analytics,
    featurize,
    governance,
    hierarchy,
    lm,
    mixing,
    multimodal,
    observability,
    pipeline,
    pipeline2,
    preference,
    profiling,
    relational,
    relational2,
    timeseries,
    relational3,
    relational4,
    sampling,
    similarity,
    sketches,
    sqlapi,
    text,
    udtf,
    windowed,
)
from .operators.windowed import LAT_SQL, LON_SQL
from .tables import load_table, load_tables

QueryFn = Callable[[SparkSession, str], DataFrame]


def streaming_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hourly_counts executed as a REAL Structured Streaming query (file
    stream → stateful window agg → memory sink), proving stream/batch
    parity through the driver's oracle gate."""
    from .sources.streams import stream_events
    from .streaming.jobs import run_to_memory

    ev = stream_events(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "cnt")
    )
    q, table = run_to_memory(agg, "complete")
    q.stop()
    return spark.table(table)


#: Watermark delay for the append-mode streaming template.
APPEND_WATERMARK_DELAY = "1 hour"


def streaming_hourly_counts_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hourly_counts as a WATERMARKED APPEND-mode streaming query — the
    100 TB template. ``streaming_hourly_counts`` runs complete mode, which
    re-emits the entire result table every micro-batch (fine for a bounded
    drain, quadratic output at scale); append mode emits each window
    exactly once, when the watermark passes its end, and evicts its state.
    Emission rule (verified empirically, pinned in
    tests/test_streaming.py::test_append_mode_emits_closed_windows): a
    window is emitted iff ``window.end <= max(event time seen) - delay``,
    which is exactly the WHERE clause of the oracle — the final windows
    the watermark is still holding open at end-of-input are (correctly)
    absent from the output."""
    from .sources.streams import stream_events
    from .streaming.jobs import run_to_memory

    ev = stream_events(spark, sf_dir).withWatermark("ts", APPEND_WATERMARK_DELAY)
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "cnt")
    )
    q, table = run_to_memory(agg, "append")
    q.stop()
    return spark.table(table)


def streaming_available_now_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hourly_counts drained with ``Trigger.AvailableNow`` — the
    cron-scheduled catch-up pattern: process the whole backlog in
    rate-limited micro-batches with full streaming semantics, then
    terminate (vs ``processAllAvailable`` on a forever-running query).
    Same aggregation and oracle as ``streaming_hourly_counts``; what this
    row proves is that the engine's queries run unchanged under the
    batch-drain trigger production schedulers use."""
    from .sources.streams import stream_events
    from .streaming.jobs import run_available_now

    ev = stream_events(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "cnt")
    )
    q, table = run_available_now(agg, "complete")
    q.stop()
    return spark.table(table)


def streaming_geofence_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geofence_hourly_counts as a streaming query (classify → window agg)."""
    from .sources.streams import stream_events
    from .streaming.jobs import run_to_memory

    ev = stream_events(spark, sf_dir)
    pts = ev.withColumn("lon", F.expr(LON_SQL)).withColumn("lat", F.expr(LAT_SQL))
    agg = (
        pts.withColumn("headquarters", F.expr(classify_sql("lon", "lat")))
        .where(F.col("headquarters") != "none")
        .groupBy(F.window("ts", "1 hour").alias("w"), "headquarters")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "headquarters", "cnt")
    )
    q, table = run_to_memory(agg, "complete")
    q.stop()
    return spark.table(table)


def streaming_counts_10min_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """counts_10min_by_key (Task4's aggregation grain) as a streaming query."""
    from .sources.streams import stream_events
    from .streaming.jobs import run_to_memory

    ev = stream_events(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt")
    )
    q, table = run_to_memory(agg, "complete")
    q.stop()
    return spark.table(table)


def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sliding_hourly_counts as a streaming query: overlapping-window
    stateful aggregation (each event updates 4 window states)."""
    from .sources.streams import stream_events
    from .streaming.jobs import run_to_memory

    ev = stream_events(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt")
    )
    q, table = run_to_memory(agg, "complete")
    q.stop()
    return spark.table(table)


def streaming_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window_counts as a REAL streaming query: stateful session
    windows (merging state across micro-batches) drained in complete mode."""
    from .sources.streams import stream_events
    from .streaming.jobs import run_to_memory, sessionize_stream

    sess = sessionize_stream(stream_events(spark, sf_dir))
    q, table = run_to_memory(sess, "complete")
    q.stop()
    return spark.table(table)


def streaming_trending_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch stateful trend detection (applyInPandasWithState) driven
    end-to-end as a streaming query. Emission is first-time-true per
    (key, window); at sf the events table is one parquet file → one
    micro-batch, so the final emitted set equals batch ``trending``
    semantics and shares its oracle."""
    from .operators.windowed import TREND_MIN_COUNT, TREND_WINDOW_SECONDS
    from .sources.streams import stream_events
    from .streaming.jobs import run_to_memory
    from .streaming.trend import trending_stateful

    ev = stream_events(spark, sf_dir)
    out = trending_stateful(
        ev,
        key_col="event_type",
        ts_col="ts",
        window_seconds=TREND_WINDOW_SECONDS,
        min_count=TREND_MIN_COUNT,
    )
    q, table = run_to_memory(out, "append")
    q.stop()
    return spark.table(table).select(
        F.col("key").alias("event_type"), "window_start", "cnt", "prev_cnt"
    )


def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join: each view event joined to
    the same user's purchase events within the following 10 minutes. Inner
    join → every match emits exactly once; at sf the single-file source
    makes one micro-batch, so the drained result is the complete join and
    the plain-SQL oracle applies."""
    from .sources.streams import stream_events
    from .streaming.jobs import run_to_memory

    views = (
        stream_events(spark, sf_dir)
        .where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        stream_events(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 10 MINUTES")),
    ).select(
        "view_id",
        "purchase_id",
        F.col("v_user").alias("user_id"),
        "view_ts",
        "purchase_ts",
    )
    q, table = run_to_memory(joined, "append")
    q.stop()
    return spark.table(table)


def streaming_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked LEFT OUTER stream-stream interval join: every view
    joined to the same user's purchases within the following 10 minutes,
    and views with NO qualifying purchase emitted once with nulls as soon
    as the watermark proves no future match can arrive — the
    abandoned-cart / unconverted-impression pattern, and the shape whose
    state Spark provably evicts (the inner form never emits non-matches,
    so unmatched state eviction is invisible there).

    Emission rule for the null rows (empirically pinned in
    tests/test_streaming.py::test_outer_interval_join_null_emission): an
    unmatched view emits iff ``view_ts + 10 min < global watermark``
    (STRICT; global watermark = min over both streams of max event time −
    1 h). Rows the watermark still holds open at end-of-input are
    (correctly) absent, and the oracle applies the identical cutoff.
    """
    from .sources.streams import stream_events
    from .streaming.jobs import run_to_memory

    views = (
        stream_events(spark, sf_dir)
        .where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        stream_events(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 10 MINUTES")),
        "leftOuter",
    ).select(
        "view_id",
        "purchase_id",
        F.col("v_user").alias("user_id"),
        "view_ts",
        "purchase_ts",
    )
    q, table = run_to_memory(joined, "append")
    q.stop()
    return spark.table(table)


def streaming_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming deduplication, demonstrated on a stream that
    REALLY contains duplicates: the events stream unioned with itself
    (every row arrives twice), deduplicated on event_id with
    ``dropDuplicatesWithinWatermark`` under a 1-hour event-time watermark —
    the exactly-once recovery pattern for at-least-once sources (Kafka
    redelivery, file re-ingest). Unlike plain ``dropDuplicates`` (whose
    key state grows forever), within-watermark dedup EVICTS a key's state
    once the watermark passes its event time + delay, so state is bounded
    by the redelivery horizon — the 100 TB posture. Redeliveries here are
    same-batch, well inside any horizon, so the drained append output is
    exactly one row per original event and the plain-SQL oracle applies
    (bounded-state eviction semantics pinned in
    tests/test_streaming.py::test_union_dedup_state_eviction)."""
    from .sources.streams import stream_events
    from .streaming.jobs import run_to_memory

    ev = stream_events(spark, sf_dir).select("event_id", "user_id", "event_type", "ts")
    doubled = ev.unionAll(ev).withWatermark("ts", "1 hour")
    deduped = doubled.dropDuplicatesWithinWatermark(["event_id"])
    q, table = run_to_memory(deduped, "append")
    q.stop()
    return spark.table(table)


def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the events stream joined per micro-batch to
    broadcast static dimensions (customer → nation), then aggregated — the
    canonical "enrich a stream with reference data" pattern. The static
    side is re-resolved each batch (picks up dim updates on real
    deployments) and broadcasts, so the stream side never shuffles for the
    join; only the final count aggregation keeps state."""
    from .sources.streams import stream_events
    from .streaming.jobs import run_to_memory

    ev = stream_events(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("nation")
    )
    enriched = ev.join(F.broadcast(cust), "user_id").join(
        F.broadcast(nat), "c_nationkey"
    )
    agg = (
        enriched.groupBy("nation", "event_type")
        .agg(F.count("*").alias("cnt"))
    )
    q, table = run_to_memory(agg, "complete")
    q.stop()
    return spark.table(table)


def streaming_woe_value_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """featurize.woe_value_bins computed BY a stream: the bucketed
    good/bad counts are a streaming-legal aggregation (conditional sums,
    no distinct), maintained in complete mode; the WOE/IV arithmetic —
    including the one quarantined ln per bucket — runs on the drained
    |buckets|-row memory table, so the supervised-binning feature
    sidecar can be kept warm by the ingest stream itself. Shares
    woe_value_bins' oracle verbatim AND its post-aggregation arithmetic
    (``featurize.woe_iv_projection`` — one copy, so stream and batch
    cannot drift)."""
    from .operators.featurize import (
        TARGET_TYPE,
        WOE_BUCKET,
        woe_iv_projection,
    )
    from .sources.streams import stream_events
    from .streaming.jobs import run_to_memory

    ev = stream_events(spark, sf_dir)
    cells = (
        ev.select(
            F.floor(F.col("value") / WOE_BUCKET).cast("long").alias("bucket"),
            F.when(F.col("event_type") == TARGET_TYPE, 1)
            .otherwise(0)
            .alias("g"),
        )
        .groupBy("bucket")
        .agg(F.sum("g").alias("n_good"), F.sum(1 - F.col("g")).alias("n_bad"))
    )
    q, table = run_to_memory(cells, "complete")
    q.stop()
    return woe_iv_projection(spark.table(table))


def streaming_cms_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The count-min sketch maintained BY a stream: the same
    (depth, cell) aggregation as ``sketches.cms_cells_from``, driven as a
    Structured Streaming query over the documents file stream and drained
    in complete mode. The sketch is the canonical bounded-state streaming
    aggregate — state is capped at DEPTH x WIDTH rows no matter how much
    data flows — and because the hashes are the SQL-portable affine fold,
    the drained cells hash-match the same DuckDB oracle as the batch
    sketch."""
    from .operators.sketches import cms_cells_from
    from .sources.streams import stream_parquet_table
    from .streaming.jobs import run_to_memory

    docs = stream_parquet_table(spark, sf_dir, "documents")
    q, table = run_to_memory(cms_cells_from(docs), "complete")
    q.stop()
    return spark.table(table)


def streaming_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KMV distinct sketch maintained as CUSTOM STREAMING STATE
    (applyInPandasWithState, ≤K longs per key forever): each micro-batch
    merges its user-id hashes into the per-type K-min set and emits the
    current sketch; after the drain, the max-``n_seen`` emission per key
    is the final state, exploded to (event_type, h) rows that hash-match
    the SAME DuckDB replay as the batch sketch inside
    ``sketches.kmv_type_overlap`` — the merge is associative+commutative,
    so batch slicing can't change the result."""
    from .operators.sketches import kmv_sketch_stream, latest_kmv_emission
    from .sources.streams import stream_parquet_table
    from .streaming.jobs import run_to_memory

    ev = stream_parquet_table(spark, sf_dir, "events")
    q, table = run_to_memory(kmv_sketch_stream(ev), "append")
    q.stop()
    return latest_kmv_emission(spark.table(table))


def streaming_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """curation.dataset_card_rollup maintained BY the ingest stream: the
    stream keeps (source, lang, text-md5) cells — count / char / token /
    max-char sums, all streaming-legal — in complete mode; the drained
    cells table (state ∝ distinct texts, the same bound as streaming
    dedup) is then projected to the per-source card, with the two
    DISTINCT aggregates (lang, md5) running over the tiny cells frame
    instead of the corpus. Shares dataset_card_rollup's oracle verbatim:
    the datasheet a training run reads can be kept warm incrementally
    instead of recomputed per batch."""
    from .sources.streams import stream_parquet_table
    from .streaming.jobs import run_to_memory

    docs = stream_parquet_table(spark, sf_dir, "documents")
    tok = F.size(F.split(F.trim("text"), r"\s+"))
    cells = docs.groupBy(
        "source", "lang", F.md5("text").alias("h")
    ).agg(
        F.count("*").alias("n"),
        F.sum("n_chars").alias("chars"),
        F.sum(tok.cast("long")).alias("toks"),
        F.max("n_chars").alias("mx"),
    )
    q, table = run_to_memory(cells, "complete")
    q.stop()
    drained = spark.table(table)
    return drained.groupBy("source").agg(
        F.sum("n").alias("n_docs"),
        F.sum("chars").alias("total_chars"),
        F.sum("toks").alias("total_tokens"),
        F.count_distinct("lang").alias("n_langs"),
        (F.sum("n") - F.count_distinct("h")).alias("n_redundant_docs"),
        F.max("mx").alias("max_chars"),
        F.expr("sum(chars) DIV sum(n)").alias("avg_chars"),
    )


def streaming_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """featurize.mutual_info_type_bucket maintained BY the event stream:
    the (bucket, type) contingency counts are a plain streaming
    aggregation held in complete mode; margins and the quarantined
    per-cell ln terms run on the drained ≤ buckets×types cells via the
    SAME ``featurize.mi_projection`` as the batch operator (one copy of
    the arithmetic), sharing its oracle verbatim — feature-relevance
    telemetry that stays warm as events arrive."""
    from .operators.featurize import WOE_BUCKET, mi_projection
    from .sources.streams import stream_events
    from .streaming.jobs import run_to_memory

    ev = stream_events(spark, sf_dir)
    cells = (
        ev.select(
            F.floor(F.col("value") / WOE_BUCKET).cast("long").alias("bucket"),
            "event_type",
        )
        .groupBy("bucket", "event_type")
        .agg(F.count("*").alias("n_ij"))
    )
    q, table = run_to_memory(cells, "complete")
    q.stop()
    return mi_projection(spark.table(table))


def streaming_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """analytics3.seasonality_profile maintained BY the event stream: the
    ≤168 (day-of-week, hour) cells are a plain streaming aggregation in
    complete mode (bounded state by construction — the cell grid can't
    grow), and the share/avg arithmetic runs on the drained cell frame.
    Shares the batch oracle verbatim — the capacity-planning baseline
    stays warm instead of being recomputed per report."""
    from pyspark.sql import Window

    from .sources.streams import stream_events
    from .streaming.jobs import run_to_memory

    ev = stream_events(spark, sf_dir)
    cells = ev.groupBy(
        F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hod")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
            "sum_value_cents"
        ),
    )
    q, table = run_to_memory(cells, "complete")
    q.stop()
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        spark.table(table)
        .withColumn("total", F.sum("n_events").over(w_all))
        .select(
            "dow",
            "hod",
            "n_events",
            "sum_value_cents",
            F.expr("sum_value_cents DIV n_events").alias("avg_value_cents"),
            F.expr("10000 * n_events DIV total").alias("share_bp"),
        )
    )


def streaming_burst_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """analytics3.burst_users_audit maintained BY the event stream: the
    (user, minute) counts are a plain streaming aggregation in complete
    mode (state ∝ active user-minutes — at scale you'd watermark the
    minute window; complete mode here makes the drain equal the batch
    table exactly), and the per-user burst rollup + threshold filter runs
    on the drained cells. Shares burst_users_audit's oracle verbatim —
    the abuse-triage feed stays warm as events arrive instead of being
    recomputed per report."""
    from .operators.analytics3 import BURST_PER_MINUTE
    from .sources.streams import stream_events
    from .streaming.jobs import run_to_memory

    ev = stream_events(spark, sf_dir)
    cells = ev.groupBy(
        "user_id", F.window("ts", "1 minute").alias("w")
    ).agg(F.count("*").alias("c"))
    q, table = run_to_memory(cells, "complete")
    q.stop()
    return (
        spark.table(table)
        .groupBy("user_id")
        .agg(
            F.max("c").alias("max_events_per_minute"),
            F.count("*").alias("n_active_minutes"),
            F.sum("c").alias("n_events"),
        )
        .where(F.col("max_events_per_minute") >= BURST_PER_MINUTE)
    )


def streaming_context_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """analytics4.context_fit_report maintained BY a documents file
    stream: the per-doc token count fans out to the |CONTEXT_SIZES|
    candidate lengths map-side and the per-length cells are a plain
    streaming aggregation in complete mode (state is |sizes| rows by
    construction — it cannot grow); the share arithmetic runs on the
    drained cell frame. Shares the batch oracle verbatim — the
    sequence-length planning table stays warm as the corpus ingests."""
    from .operators.analytics4 import CONTEXT_SIZES
    from .functions.text import token_count
    from .sources.streams import stream_parquet_table
    from .streaming.jobs import run_to_memory

    docs = stream_parquet_table(spark, sf_dir, "documents")
    sized = docs.select(
        token_count("text").cast("long").alias("n_tok"),
        F.explode(
            F.array(*[F.lit(s).cast("long") for s in CONTEXT_SIZES])
        ).alias("ctx"),
    )
    cells = sized.groupBy("ctx").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("n_tok") <= F.col("ctx")).cast("long")).alias("n_fit"),
        F.sum((F.col("n_tok") > F.col("ctx")).cast("long")).alias(
            "n_truncated"
        ),
        F.sum(F.least("n_tok", "ctx")).alias("tokens_kept"),
        F.sum(
            F.greatest(F.col("n_tok") - F.col("ctx"), F.lit(0).cast("long"))
        ).alias("tokens_lost"),
    )
    q, table = run_to_memory(cells, "complete")
    q.stop()
    return spark.table(table).select(
        "ctx",
        "n_docs",
        "n_fit",
        "n_truncated",
        "tokens_kept",
        "tokens_lost",
        F.expr("10000 * n_fit DIV n_docs").alias("fit_bp"),
    )


def streaming_winnow_hot_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """analytics5's winnowing fingerprint index maintained BY a documents
    file stream — the LIVE boilerplate detector: the Arrow winnowing
    kernel (``_fp_batches``) is stateless, so it rides each micro-batch
    map-side; per-fingerprint document counts are a plain streaming
    aggregation in complete mode (state keys = distinct sampled
    fingerprints — ~2/(w+1) of k-gram volume; RocksDB-backed on a
    cluster via SPARK_GRAFT_STATE_STORE); the boilerplate band filter
    (2..WINNOW_MAX_DF) runs on the drained frame. Shares the batch
    winnowing CTE as its oracle."""
    from .operators.analytics5 import WINNOW_MAX_DF, _fp_batches
    from .sources.streams import stream_parquet_table
    from .streaming.jobs import run_to_memory

    docs = stream_parquet_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    fps = docs.mapInPandas(
        _fp_batches,
        schema="doc_id bigint, source string, n_kgrams int,"
        " sel array<string>, selpos array<int>",
    )
    cells = (
        fps.select(F.explode(F.array_distinct("sel")).alias("h"))
        .groupBy("h")
        .agg(F.count("*").alias("n_docs"))
    )
    q, table = run_to_memory(cells, "complete")
    q.stop()
    return spark.table(table).where(
        (F.col("n_docs") >= 2) & (F.col("n_docs") <= WINNOW_MAX_DF)
    )


def streaming_order_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """analytics5.order_backlog_aging maintained BY an orders file
    stream: the streaming aggregation keys on (priority, order date) —
    state is |priorities|·|dates|, bounded by the calendar, not the
    order volume — and EVERY order contributes a cell (open counts are
    conditional sums), so the as-of cutoff (max order date) and the age
    bucketing run on the drained cell frame. Shares the batch oracle
    verbatim — the fulfillment-ops backlog table stays warm as orders
    ingest."""
    from .operators.analytics5 import BACKLOG_DAY_BUCKETS
    from .sources.streams import stream_parquet_table
    from .streaming.jobs import run_to_memory

    orders = stream_parquet_table(spark, sf_dir, "orders")
    is_open = F.col("o_orderstatus").isin("O", "P")
    cells = orders.groupBy("o_orderpriority", "o_orderdate").agg(
        F.sum(is_open.cast("long")).alias("n_open"),
        F.sum(
            F.when(
                is_open, F.round(F.col("o_totalprice") * 100, 0).cast("long")
            ).otherwise(F.lit(0))
        ).alias("open_cents"),
    )
    q, table = run_to_memory(cells, "complete")
    q.stop()
    drained = spark.table(table)
    cutoff = drained.agg(F.max("o_orderdate").alias("cutoff"))
    bucket = F.lit(0)
    for ub in reversed(BACKLOG_DAY_BUCKETS):
        bucket = F.when(F.col("age_days") <= F.lit(ub), F.lit(ub)).otherwise(
            bucket
        )
    return (
        drained.where(F.col("n_open") > 0)
        .crossJoin(F.broadcast(cutoff))
        .select(
            "o_orderpriority",
            F.datediff(F.col("cutoff"), F.col("o_orderdate")).alias(
                "age_days"
            ),
            "n_open",
            "open_cents",
        )
        .select(
            "o_orderpriority",
            bucket.alias("age_bucket_days"),
            "n_open",
            "open_cents",
        )
        .groupBy("o_orderpriority", "age_bucket_days")
        .agg(
            F.sum("n_open").alias("n_orders"),
            F.sum("open_cents").alias("backlog_cents"),
        )
    )


_STREAMING_QUERIES: dict[str, QueryFn] = {
    "streaming_order_backlog": streaming_order_backlog,
    "streaming_winnow_hot_fps": streaming_winnow_hot_fps,
    "streaming_context_fit": streaming_context_fit,
    "streaming_seasonality_profile": streaming_seasonality_profile,
    "streaming_burst_alerts": streaming_burst_alerts,
    "streaming_cms_cells": streaming_cms_cells,
    "streaming_dataset_card": streaming_dataset_card,
    "streaming_mutual_info": streaming_mutual_info,
    "streaming_woe_value_bins": streaming_woe_value_bins,
    "streaming_kmv_sketch": streaming_kmv_sketch,
    "streaming_observed_metrics": observability.streaming_observed_metrics,
    "streaming_static_enrich": streaming_static_enrich,
    "streaming_union_dedup": streaming_union_dedup,
    "streaming_hourly_counts": streaming_hourly_counts,
    "streaming_available_now_counts": streaming_available_now_counts,
    "streaming_hourly_counts_append": streaming_hourly_counts_append,
    "streaming_geofence_hourly": streaming_geofence_hourly,
    "streaming_counts_10min_by_key": streaming_counts_10min_by_key,
    "streaming_session_counts": streaming_session_counts,
    "streaming_sliding_counts": streaming_sliding_counts,
    "streaming_trending_stateful": streaming_trending_stateful,
    "streaming_interval_join": streaming_interval_join,
    "streaming_interval_join_outer": streaming_interval_join_outer,
}

_STREAMING_ORACLES: dict[str, str] = {
    # stream/batch twins: identical rollups, identical oracles
    "streaming_context_fit": analytics4.ORACLES["context_fit_report"],
    "streaming_order_backlog": analytics5.ORACLES["order_backlog_aging"],
    "streaming_winnow_hot_fps": f"""
        WITH {analytics5.WINNOW_BASE_DUCK}
        SELECT h, count(*) AS n_docs FROM fp GROUP BY h
        HAVING count(*) BETWEEN 2 AND {analytics5.WINNOW_MAX_DF}
    """,
    "streaming_seasonality_profile": analytics3.ORACLES["seasonality_profile"],
    "streaming_burst_alerts": analytics3.ORACLES["burst_users_audit"],
    "streaming_cms_cells": sketches.CELLS_ORACLE,
    # stream/batch twin: identical cells, identical oracle
    "streaming_woe_value_bins": featurize.ORACLES["woe_value_bins"],
    "streaming_dataset_card": curation.ORACLES["dataset_card_rollup"],
    "streaming_mutual_info": featurize.ORACLES["mutual_info_type_bucket"],
    "streaming_kmv_sketch": sketches.KMV_SKETCH_ORACLE,
    # batch/streaming twins: identical totals, identical oracle
    "streaming_observed_metrics": observability.ORACLES["observed_gate_metrics"],
    "streaming_static_enrich": """
        SELECT n.n_name AS nation, e.event_type, count(*) AS cnt
        FROM events e
        JOIN customer c ON e.user_id = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name, e.event_type
    """,
    "streaming_union_dedup": """
        SELECT event_id, user_id, event_type, ts FROM events
    """,
    "streaming_sliding_counts": windowed.ORACLES["sliding_hourly_counts"],
    "streaming_hourly_counts": windowed.ORACLES["hourly_counts"],
    "streaming_available_now_counts": windowed.ORACLES["hourly_counts"],
    # append mode emits a window iff window_end <= max(ts) - watermark delay
    # (non-strict; empirically pinned in tests/test_streaming.py)
    "streaming_hourly_counts_append": """
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               count(*) AS cnt
        FROM events
        GROUP BY 1
        HAVING window_start + INTERVAL '1 hour'
               <= (SELECT max(ts) FROM events) - INTERVAL '1 hour'
    """,
    "streaming_geofence_hourly": windowed.ORACLES["geofence_hourly_counts"],
    "streaming_counts_10min_by_key": windowed.ORACLES["counts_10min_by_key"],
    "streaming_session_counts": relational2.ORACLES["session_window_counts"],
    "streaming_trending_stateful": windowed.ORACLES["trending"],
    "streaming_interval_join": """
        SELECT v.event_id AS view_id, p.event_id AS purchase_id,
               v.user_id, v.ts AS view_ts, p.ts AS purchase_ts
        FROM events v JOIN events p
          ON v.user_id = p.user_id
         AND p.ts >= v.ts
         AND p.ts <= v.ts + INTERVAL 10 MINUTE
        WHERE v.event_type = 'view' AND p.event_type = 'purchase'
    """,
    # null-row cutoff is STRICT <: an unmatched view emits iff
    # view_ts + 10 min < min(max view ts, max purchase ts) - 1 h
    # (pinned in tests/test_streaming.py::test_outer_interval_join_null_emission)
    "streaming_interval_join_outer": """
        WITH v AS (SELECT event_id AS view_id, user_id, ts AS view_ts
                   FROM events WHERE event_type = 'view'),
        p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
              FROM events WHERE event_type = 'purchase'),
        wm AS (SELECT least((SELECT max(ts) FROM events WHERE event_type = 'view'),
                            (SELECT max(ts) FROM events WHERE event_type = 'purchase'))
                      - INTERVAL '1 hour' AS w)
        SELECT v.view_id, p.purchase_id, v.user_id, v.view_ts, p.purchase_ts
        FROM v JOIN p
          ON v.user_id = p.user_id
         AND p.purchase_ts >= v.view_ts
         AND p.purchase_ts <= v.view_ts + INTERVAL 10 MINUTE
        UNION ALL
        SELECT v.view_id, CAST(NULL AS BIGINT) AS purchase_id, v.user_id,
               v.view_ts, CAST(NULL AS TIMESTAMP) AS purchase_ts
        FROM v, wm
        WHERE NOT EXISTS (
            SELECT 1 FROM p
            WHERE p.user_id = v.user_id
              AND p.purchase_ts >= v.view_ts
              AND p.purchase_ts <= v.view_ts + INTERVAL 10 MINUTE)
          AND v.view_ts + INTERVAL 10 MINUTE < wm.w
    """,
}

#: modules whose queries take the full tables dict
_TABLE_MODULES = (
    analytics3,
    analytics4,
    analytics5,
    distribution,
    campaign,
    curation,
    hierarchy,
    observability,
    relational,
    relational2,
    relational3,
    relational4,
    sketches,
    pipeline2,
    preference,
    coreset,
    governance,
    featurize,
    sqlapi,
    attribution,
    events_analytics,
    analytics2,
    profiling,
    timeseries,
    asof,
    text,
    udtf,
    dedup,
    similarity,
    multimodal,
    pipeline,
    sampling,
    mixing,
    lm,
)


def _wrap_events(fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(load_table(spark, sf_dir, "events"))

    return run


def _wrap_tables(fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(load_tables(spark, sf_dir))

    return run


#: Driver-check priority. The driver verifies queries in registry iteration
#: order and stops after a fixed budget (observed: the first 50 entries in
#: rounds 1-2), so ordering IS coverage. Rounds 1-2 produced green rows for
#: the windowed/relational/relational2 surface; this list front-loads the
#: queries that have never had a driver row — the LLM-pipeline operators,
#: asof, text, timeseries, profiling, the TPC-H analogues q8/q9/q15/q19 and
#: every streaming_* query — so cumulative driver coverage reaches the full
#: surface across rounds. Close siblings of a checked query (e.g.
#: dedup_keep_first next to exact_dedup) sit just past the budget line and
#: rotate in next round. On top of this static list, ``build_queries``
#: auto-rotates using the recorded CORRECTNESS_r*.json results (fewest
#: green rows first), so coverage keeps extending without manual edits.
_CHECK_PRIORITY: tuple[str, ...] = (
    # round-5 front-load: the six queries that have never had a driver
    # CORRECTNESS row (ADVICE r4) — rotation puts count-0 queries first
    # anyway, but pinning them here makes the intent explicit and keeps
    # them leading even under SPARK_GRAFT_CHECK_ORDER=static
    "token_budget_sample",
    "leakage_safe_split",
    "dedup_clusters_minhash",
    "weighted_sample_per_lang",
    "gopher_quality_flags",
    "filter_agreement_kappa",
    # new round-5 contracts
    "dedup_clusters_minhash_check",
    "dedup_campaign_summary",
    "observed_gate_metrics",
    "streaming_observed_metrics",
    "referral_chain_depths",
    "variant_props_metrics",
    "label_balanced_sample",
    "dsir_resample",
    "temperature_mix_sample",
    "bloom_prefilter_check",
    "cosine_range_search",
    "source_overlap_matrix",
    "psi_value_drift",
    "shingle_novelty_scores",
    "cdc_chunks",
    "kl_source_divergence",
    "sorted_neighborhood_pairs",
    "kmv_type_overlap",
    "cms_join_size_check",
    "streaming_kmv_sketch",
    "lm_bigram_nll",
    "bpe_merge_candidates",
    "bpe_learn_merges",
    "bpe_encode_stats",
    "tokenizer_fertility",
    "doremi_mixture_weights",
    "bradley_terry_event_prefs",
    "kcenter_coreset",
    "k_anonymity_check",
    "riskiest_qi_cells",
    "hard_negative_mining",
    "woe_value_bins",
    "target_encode_oof",
    "lsh_query_topk",
    "sql_value_ntiles",
    "lateral_topk_per_type",
    "hourly_count_anomalies_mad",
    "zipf_alpha",
    "peak_concurrency",
    "markov_attribution",
    "streaming_woe_value_bins",
    # round-5: the six remaining TPC-H analogues (22/22 sweep complete)
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q12_returnflag_priority",
    "q16_supplier_part_counts",
    "q20_excess_shipped",
    "q21_waiting_suppliers",
    "cms_bigram_check",
    "streaming_cms_cells",
    "quality_filtered_ann",
    # round-6 additions: change detection, banded join, dataset card, MI,
    # MMR, MERGE upsert, kNN-graph analytics, survival, bootstrap, and the
    # two new streaming twins
    "cusum_changepoint_hours",
    "lagged_crosscorr",
    "value_band_pairs",
    "dataset_card_rollup",
    "mutual_info_type_bucket",
    "mmr_diverse_topk",
    "merge_upsert_orders",
    "streaming_dataset_card",
    "streaming_mutual_info",
    "knn_graph_triangles",
    "label_propagation_knn",
    "km_conversion_survival",
    "poisson_bootstrap_ci",
    "bigram_pmi_topk",
    "basket_pair_lift",
    "partition_layout_plan",
    "funnel_with_deadlines",
    "pareto_front_orders",
    "classifier_calibration_bins",
    "er_match_scores",
    "embedding_centroid_drift",
    "twap_daily_value",
    "cohort_ltv_cents",
    "conditional_entropy_next_event",
    # round-6 late batch: distributional analytics + filter rollout eval
    "rfm_segments",
    "nation_revenue_gini",
    "benford_first_digit",
    "classifier_decile_lift",
    # TPC-H analogues never checked
    "q8_market_share",
    "q9_product_profit",
    "q15_top_supplier",
    "q19_discounted_revenue",
    # as-of join + timeseries
    "asof_latest_order",
    "hourly_counts_gapfilled",
    # text analysis
    "word_counts",
    "token_stats",
    "quality_scores",
    "lang_id",
    "doc_fingerprints",
    "tfidf_top_terms",
    "source_quality_rollup",
    "bigrams_udtf",
    # dedup ladder
    "exact_dedup",
    "name_near_dup_pairs",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_fingerprints",
    "dedup_clusters",
    # similarity / ANN ladder
    "cosine_topk",
    "embedding_near_dup_pairs",
    "lsh_bucketed_pairs",
    "ivf_topk",
    "label_centroid_sim",
    # multimodal
    "multimodal_features",
    # pipeline ops
    "repetition_filter",
    "stratified_sample",
    "token_pack_bins",
    "heavy_hitter_bigrams",
    "regex_scrub",
    "doc_chunks",
    "embedding_quantize",
    "benchmark_contamination",
    # events analytics
    "event_transitions",
    "conversion_latency",
    "hourly_count_anomalies",
    "hll_user_sketches",
    "value_trend_by_type",
    "bitmap_distinct_users",
    "salted_customer_join",
    "events_column_profile",
    # streaming surface (each drains a real StreamingQuery at sf0.01)
    "streaming_union_dedup",
    "streaming_hourly_counts",
    "streaming_geofence_hourly",
    "streaming_counts_10min_by_key",
    "streaming_session_counts",
    "streaming_sliding_counts",
    "streaming_trending_stateful",
    "streaming_interval_join",
    # --- budget line (50) --- siblings deferred to the next rotation
    "dedup_keep_first",
    "filtered_cosine_topk",
    "dedup_canonical_docs",
    "frame_sample",
    "event_path_trigrams",
    "user_event_paths",
    "corr_qty_price_by_flag",
    "value_histogram",
    "top_event_by_value_per_user",
    "hourly_avg_value_locf",
    "sentiment_scores",
    "array_functions_showcase",
    # streaming queries registered after the round-3 budget line — ranked
    # ahead of same-count batch queries (which have the stronger local
    # DuckDB-parity evidence) so the driver reaches the streaming surface
    # first; stream-static enrichment especially is the most-used
    # production streaming pattern in the registry.
    "streaming_static_enrich",
    "streaming_available_now_counts",
    "streaming_hourly_counts_append",
    "streaming_interval_join_outer",
)


def _checked_row_counts() -> tuple[dict[str, int], dict[str, int]]:
    """Per-query (count, last-round) of completed driver checks across the
    committed CORRECTNESS_r*.json result files (these are tracked in git,
    so both — and therefore :func:`check_order` — are deterministic for a
    given checkout, not a function of untracked local state).

    A row counts as a completed check when either (a) every recorded
    comparison in it passed, or (b) the driver recorded its by-design
    rows-only result (``err == "no_oracle"`` with a materialized row
    count) — those queries have no SQL-expressible oracle, so a recorded
    rows-only run IS their completed check and they must not consume the
    verification budget every round. Failed or errored rows never count,
    so regressed queries sort back to the front for re-verification.

    The second map records the LAST round each query completed a check
    (parsed from the ``CORRECTNESS_r{N}`` filename): once every query has
    ≥1 green row the count-based rotation goes flat, and staleness — how
    long since the driver last re-verified a query — becomes the
    regression-canary ordering (VERDICT r6 §7).
    """
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    counts: dict[str, int] = {}
    last_round: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)", os.path.basename(path))
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            checks = [v for k, v in row.items() if k.endswith("_match")]
            green = row.get("err") is None and checks and all(checks)
            rows_only_done = (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            )
            if green or rows_only_done:
                counts[name] = counts.get(name, 0) + 1
                last_round[name] = max(last_round.get(name, 0), rnd)
    return counts, last_round


def _source_receipts() -> dict[str, str]:
    """SOURCE_RECEIPTS.json: query name → source hash (see
    :func:`query_source_hashes`) AS OF the query's most recent completed
    driver check. Maintained by ``tools/update_source_receipts.py`` (run
    at round start, when the working tree still equals the code the
    driver just verified). Missing file or entry → no changed-source
    signal."""
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        with open(os.path.join(root, "SOURCE_RECEIPTS.json")) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return {}
    return data if isinstance(data, dict) else {}


def _changed_since_receipt(src_hashes: dict[str, str]) -> set[str]:
    """Queries whose implementation changed since their last driver
    check (VERDICT r9 §4: the fewest-green rotation alone let a
    semantics rewrite ride an old green row for a round — r9's
    resize_plan). A query is "changed" when its current source hash
    (registered function source + its oracle SQL — the oracle term also
    catches helper-mediated semantic changes that surface in the SQL)
    differs from the committed receipt."""
    receipts = _source_receipts()
    if not receipts:
        return set()
    return {
        name
        for name, h in src_hashes.items()
        if receipts.get(name) not in (None, h)
    }


def check_order(
    names: list[str], src_hashes: dict[str, str] | None = None
) -> list[str]:
    """The explicit driver-check ordering policy (see ADVICE round 3).

    The external driver verifies queries in registry iteration order and
    stops after a fixed budget (~50 entries), so ordering IS coverage.
    Policy (default ``rotate``): CHANGED-SOURCE queries first (module
    hash differs from SOURCE_RECEIPTS.json — their last green row
    verified different code, VERDICT r9 §4), then least-checked — a
    query's rank is its completed-check count from the committed
    CORRECTNESS_r*.json files; ties (once every query has ≥1 green row
    the counts go flat) break by OLDEST last-green round first, so the
    driver's fixed budget becomes a regression canary sweeping the
    stalest-verified part of the surface every round; final ties break by
    the curated ``_CHECK_PRIORITY`` order then module order. Because
    every check increments the count and refreshes the round stamp, the
    ordering CYCLES through the whole surface: a previously-green query
    is re-verified every ceil(total/budget) rounds, so regressions in
    verified queries still reach the driver (they then sort back to the
    front until green again).

    Set ``SPARK_GRAFT_CHECK_ORDER=static`` to disable rotation and get the
    curated order alone (deterministic, independent of any result files).
    """
    import os

    base = list(names)
    if os.environ.get("SPARK_GRAFT_CHECK_ORDER", "rotate") == "static":
        return base
    checked, last_round = _checked_row_counts()
    changed = _changed_since_receipt(src_hashes or {})
    return sorted(
        base,
        key=lambda n: (
            0 if n in changed else 1,
            checked.get(n, 0),
            last_round.get(n, 0),
            base.index(n),
        ),
    )


def query_source_hashes() -> dict[str, str]:
    """Query name → sha256 over (registered function source, oracle SQL)
    — the hash unit of SOURCE_RECEIPTS.json. Function source pins direct
    edits; the oracle SQL term pins semantic changes routed through
    helpers/constants (those re-materialize in the composed SQL).
    Docstring-only edits do flag — harmless over-verification."""
    import hashlib
    import inspect

    oracles = build_oracles()
    out: dict[str, str] = {}
    fns: dict[str, object] = dict(windowed.QUERIES)
    for mod in _TABLE_MODULES:
        fns.update(mod.QUERIES)
    fns.update(_STREAMING_QUERIES)
    for name, fn in fns.items():
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            src = ""
        blob = src + "\n-- oracle --\n" + oracles.get(name, "")
        out[name] = hashlib.sha256(blob.encode()).hexdigest()
    return out


def build_queries() -> dict[str, QueryFn]:
    unordered: dict[str, QueryFn] = {}
    for name, fn in windowed.QUERIES.items():
        unordered[name] = _wrap_events(fn)
    for mod in _TABLE_MODULES:
        for name, fn in mod.QUERIES.items():
            if name in unordered:
                raise ValueError(f"duplicate query name {name!r}")
            unordered[name] = _wrap_tables(fn)
    unordered.update(_STREAMING_QUERIES)

    missing = [n for n in _CHECK_PRIORITY if n not in unordered]
    if missing:
        raise ValueError(f"_CHECK_PRIORITY names not in registry: {missing}")
    # stable base order: curated priority first, then module order
    base: list[str] = list(_CHECK_PRIORITY)
    base += [n for n in unordered if n not in set(_CHECK_PRIORITY)]
    return {n: unordered[n] for n in check_order(base, query_source_hashes())}


def build_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in (windowed, *_TABLE_MODULES):
        out.update(mod.ORACLES)
    out.update(_STREAMING_ORACLES)
    return out
