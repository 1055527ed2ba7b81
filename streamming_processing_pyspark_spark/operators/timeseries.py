"""Time-series resampling operators: gap filling and last-observation-
carried-forward (LOCF) over the ``events`` table.

The reference's windowed counts (SURVEY.md §2.5 A1-A3) silently DROP empty
windows — `groupBy(window(...))` emits nothing for an hour with no rows.
Real dashboards and downstream ML features need a dense time spine. These
operators close that gap with pure-Catalyst plans:

- ``hourly_counts_gapfilled`` — dense (hour × event_type) grid with zero
  counts for missing hours. The spine is generated with
  ``sequence(min_hour, max_hour)`` + ``explode`` — a few thousand rows for
  any time range, built from a 1-row global-bounds aggregate — so the only
  input-sized stage is the counts aggregation itself; the spine join is a
  broadcast of the aggregated (small) side against the spine.
- ``hourly_avg_value_locf`` — hourly average value per type (exact: integer
  cent sums, one float division), gap-filled then forward-filled with
  ``last(..., ignorenulls=True)`` over an unbounded-preceding frame. The
  LOCF copy moves doubles without arithmetic, so Spark and DuckDB agree
  bit-for-bit.

At 100 TB the shape holds: the raw scan reduces to per-hour partials
map-side; everything after operates on ≤ hours × types rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..tables import persist_replacing


def _hour_spine(agg: DataFrame) -> DataFrame:
    """Dense hour × event_type grid spanning the aggregated frame's range.

    Derived from the already-aggregated (hour, event_type) frame, NOT the
    raw events: its min/max hour and distinct types equal the raw
    table's by construction (every event lands in exactly one cell), and
    deriving from the tiny frame keeps each gap-fill query at ONE corpus
    scan — callers persist the aggregate, or the bounds/types branches
    would each re-run it (executed plans showed 3 events scans before).
    """
    bounds = agg.agg(
        F.min("hour").alias("h0"),
        F.max("hour").alias("h1"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    types = agg.select("event_type").distinct()
    return hours.crossJoin(F.broadcast(types))


def hourly_counts_gapfilled(tables: dict[str, DataFrame]) -> DataFrame:
    """Hourly event counts per type with empty hours present as zero."""
    ev = tables["events"]
    counts = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
        ).agg(F.count("*").alias("cnt"))
    )
    counts = persist_replacing(counts, "gapfill_counts")
    spine = _hour_spine(counts)
    return (
        spine.join(F.broadcast(counts), ["hour", "event_type"], "left")
        .select("hour", "event_type", F.coalesce("cnt", F.lit(0)).alias("cnt"))
    )


def hourly_avg_value_locf(tables: dict[str, DataFrame]) -> DataFrame:
    """Hourly average event value per type, forward-filled across gaps.

    The average is exact-by-construction (integer cent sum / count — one
    IEEE division both engines perform identically); hours with no events
    carry the last observed hour's average forward (NULL until the first
    observation). Output: hour, event_type, avg_value_cents, filled flag.
    """
    ev = tables["events"]
    hourly = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("s"),
            F.count("*").alias("c"),
        )
        .select(
            "hour",
            "event_type",
            (F.col("s").cast("double") / F.col("c").cast("double")).alias("avg_raw"),
        )
    )
    hourly = persist_replacing(hourly, "locf_hourly")
    spine = _hour_spine(hourly)
    dense = spine.join(F.broadcast(hourly), ["hour", "event_type"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dense.select(
        "hour",
        "event_type",
        F.last("avg_raw", ignorenulls=True).over(w).alias("avg_value_cents"),
        F.col("avg_raw").isNull().alias("filled"),
    )


def ewma_hourly_value(tables: dict[str, DataFrame]) -> DataFrame:
    """Exponentially-weighted moving average of hourly value per type.

    EWMA is inherently sequential (each point depends on the previous
    smoothed value), which a naive implementation turns into a global
    sort + serial scan. Here the input-sized work is ONE map-side
    combinable aggregation to (hour, type) averages — everything after
    operates on <= hours x types rows (time-range bounded, NOT data
    bounded: the same few thousand rows at 100 TB). The per-type hour
    series is folded in-executor with a higher-order ``aggregate`` over
    the sorted array (state per group = #hours), emitting the running
    EWMA per hour.

    Cross-engine exactness: both engines fold left over the hour-ordered
    series evaluating ``0.3*x + 0.7*prev`` (identical IEEE op sequence →
    bit-exact); the hourly average itself is the integer-cent-sum /
    count division used throughout this module.
    """
    ev = tables["events"]
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("s"),
            F.count("*").alias("c"),
        )
        .select(
            "event_type",
            "hour",
            (F.col("s").cast("double") / F.col("c").cast("double")).alias("x"),
        )
    )
    series = hourly.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("hour", "x"))).alias("arr")
    )
    folded = series.withColumn(
        "ew",
        F.expr(
            "aggregate(arr, CAST(array() AS ARRAY<DOUBLE>),"
            " (acc, e) -> array_append(acc,"
            "   CASE WHEN size(acc) = 0 THEN e.x"
            "        ELSE CAST(0.3 AS DOUBLE) * e.x"
            "             + CAST(0.7 AS DOUBLE) * element_at(acc, -1) END))"
        ),
    )
    return folded.select(
        "event_type",
        F.explode(
            F.expr(
                "transform(arr, (e, i) ->"
                " struct(e.hour AS hour, e.x AS avg_value_cents,"
                "        element_at(ew, i + 1) AS ewma))"
            )
        ).alias("r"),
    ).select("event_type", "r.hour", "r.avg_value_cents", "r.ewma")


#: top-k for the activity-profile similarity search
PROFILE_TOPK = 10


def similar_activity_users(tables: dict[str, DataFrame]) -> DataFrame:
    """Time-series similarity search (cf. PAPERS.md, EDBT'19/'20): the
    top-k users whose 24-hour activity profile is closest to a query
    user's, by exact squared Euclidean distance on hour-of-day count
    vectors.

    The query user is the table's min user_id (deterministic at any SF).
    Shape: one groupBy builds each user's dense 24-dim count vector as an
    array (map-side ``map_from_entries`` + a ``sequence`` densify — no
    per-hour joins); the 1-row query vector broadcasts; distance is a
    ``zip_with``/``aggregate`` fold (pure int64, oracle-exact); the top-k
    is a TakeOrderedAndProject — so the only input-sized stage is the
    first aggregation, and the candidate scoring is map-side over one row
    per user. The same plan at 100 TB: |users| rows shuffle once, scoring
    never re-shuffles. Ties break on user_id, so rank-k boundaries are
    deterministic and both engines agree.
    """
    ev = tables["events"]
    prof = (
        ev.groupBy("user_id", F.hour("ts").alias("h"))
        .agg(F.count("*").alias("cnt"))
        .groupBy("user_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("h", "cnt"))
            ).alias("m")
        )
        .select(
            "user_id",
            F.expr(
                "transform(sequence(0, 23), h -> coalesce(element_at(m, h), 0L))"
            ).alias("v"),
        )
    )
    qmin = ev.agg(F.min("user_id").alias("q_user"))
    query = (
        prof.join(F.broadcast(qmin), prof.user_id == F.col("q_user"))
        .select(F.col("v").alias("qv"), "q_user")
    )
    dist = F.expr(
        "aggregate(zip_with(v, qv, (a, b) -> (a - b) * (a - b)),"
        " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    return (
        prof.crossJoin(F.broadcast(query))
        .where(F.col("user_id") != F.col("q_user"))
        .select("user_id", dist.alias("sq_dist"))
        .orderBy("sq_dist", "user_id")
        .limit(PROFILE_TOPK)
    )


def value_ohlc_5min(tables: dict[str, DataFrame]) -> DataFrame:
    """OHLC downsampling: per event type and 5-minute bucket, the opening
    / highest / lowest / closing ``value`` plus the sample count — the
    standard resampling step that turns a raw event stream into
    fixed-interval bars for charting or feature windows.

    ONE (event_type, bucket)-ordered sort serves the whole plan
    (plan-asserted): the ascending row_number marks the open, the last
    row is ``rn == count() over the same partition`` (the unordered
    count window needs only the partitioning, not a second opposite-order
    sort), and the final aggregation reuses the partitioning —
    one shuffle, one sort. Only order-independent columns are emitted
    (open/high/low/close are picked values, never accumulated sums), so
    raw doubles hash-match across engines; event_id breaks timestamp
    ties so "first" and "last" are well-defined in both.
    """
    ev = tables["events"].select(
        "event_type",
        F.window("ts", "5 minutes")["start"].alias("bucket"),
        "ts",
        "event_id",
        "value",
    )
    w = Window.partitionBy("event_type", "bucket").orderBy("ts", "event_id")
    w_part = Window.partitionBy("event_type", "bucket")
    marked = ev.select(
        "event_type",
        "bucket",
        "value",
        F.row_number().over(w).alias("rn_a"),
        F.count("*").over(w_part).alias("n_rows"),
    )
    return marked.groupBy("event_type", "bucket").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_a") == F.col("n_rows"), F.col("value"))).alias(
            "close"
        ),
        F.count("*").alias("n"),
    )


def hourly_value_interpolated(tables: dict[str, DataFrame]) -> DataFrame:
    """Hourly average value per type with gaps LINEARLY interpolated —
    the third member of the gap-fill family (zero-fill in
    :func:`hourly_counts_gapfilled`, step-fill in
    :func:`hourly_avg_value_locf`), i.e. TimescaleDB's
    ``time_bucket_gapfill(...) + interpolate(...)`` shape.

    Gap hours get ``prev + (next − prev) · Δn/Δd`` where prev/next are the
    nearest observed hourly averages on either side and Δn/Δd are exact
    integer hour offsets; hours outside the first/last observation stay
    NULL (interpolation has no second anchor there — step-fill is the
    LOCF query's contract, not this one's). Observed hours pass through
    unchanged.

    Hash-exactness: the anchors are exact by construction (integer cent
    sum / count, one IEEE division), the hour offsets are exact integers,
    and both engines evaluate the one identical multiply-add expression
    tree — same zero-divergence argument as LOCF, so the oracle
    hash-matches on raw doubles.

    Scale shape: identical to LOCF — the only input-sized work is the
    map-side-combinable (hour, type) aggregation; the spine join and the
    four ignore-null window passes run on the hours × types grid
    (time-range bounded, not data bounded).
    """
    ev = tables["events"]
    hourly = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("s"),
            F.count("*").alias("c"),
        )
        .select(
            "hour",
            "event_type",
            (F.col("s").cast("double") / F.col("c").cast("double")).alias("avg_raw"),
        )
    )
    hourly = persist_replacing(hourly, "interp_hourly")
    dense = _hour_spine(hourly).join(F.broadcast(hourly), ["hour", "event_type"], "left")
    obs_hour = F.when(F.col("avg_raw").isNotNull(), F.col("hour"))
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    anchored = dense.select(
        "hour",
        "event_type",
        "avg_raw",
        F.last("avg_raw", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(obs_hour, ignorenulls=True).over(w_prev).alias("ph"),
        F.first("avg_raw", ignorenulls=True).over(w_next).alias("nv"),
        F.first(obs_hour, ignorenulls=True).over(w_next).alias("nh"),
    )
    dt_n = (F.unix_timestamp("hour") - F.unix_timestamp("ph")) / F.lit(3600)
    dt_d = (F.unix_timestamp("nh") - F.unix_timestamp("ph")) / F.lit(3600)
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        dt_n.cast("long").cast("double") / dt_d.cast("long").cast("double")
    )
    return anchored.select(
        "hour",
        "event_type",
        F.when(F.col("avg_raw").isNotNull(), F.col("avg_raw"))
        .when(F.col("pv").isNotNull() & F.col("nv").isNotNull(), interp)
        .alias("value_interp"),
        F.col("avg_raw").isNull().alias("filled"),
    )


#: how long an event "holds" for the concurrency sweep
CONCURRENCY_HOLD_MIN = 5


def peak_concurrency(tables: dict[str, DataFrame]) -> DataFrame:
    """Peak number of simultaneously-active events per type, treating
    each event as a half-open interval ``[ts, ts + CONCURRENCY_HOLD_MIN
    minutes)`` — the classic sweep-line (+1/−1 delta) computed as a
    range-frame running sum. The capacity-planning question ("how many
    concurrent X at the worst moment?") that interval tables answer.

    Correctness of the sweep under ties: RANGE frames take ONE ordering
    key, so (time, delta) is folded into the single integer
    ``epoch_us·2 + (delta > 0)`` — ends sort strictly before starts at
    the same microsecond (half-open semantics), and the RANGE frame
    (not ROWS) aggregates every delta at the same key together: within
    an equal-key group the running sum is order-free and the
    group-boundary values are where the maximum can occur, so the peak
    is fully deterministic. All-integer.

    Scale shape: one map-only delta expansion (2 rows per event), one
    shuffle partitioned by ``event_type``. The per-type sweep is a
    single ordered reducer per key — bounded by |types| here; a global
    or high-cardinality sweep uses the standard two-phase carry
    (per-bucket partial sums, then a bucket-level prefix scan), which
    this per-key contract deliberately avoids needing.

    Output: ``event_type``, ``n_intervals``, ``peak_concurrent``.
    """
    ev = tables["events"]
    deltas = ev.select(
        "event_type",
        F.explode(
            F.array(
                F.struct(F.col("ts").alias("t"), F.lit(1).alias("d")),
                F.struct(
                    (F.col("ts") + F.expr(
                        f"INTERVAL {CONCURRENCY_HOLD_MIN} MINUTES"
                    )).alias("t"),
                    F.lit(-1).alias("d"),
                ),
            )
        ).alias("e"),
    ).select("event_type", F.col("e.t").alias("t"), F.col("e.d").alias("d"))
    key = F.unix_micros("t") * 2 + (F.col("d") > 0).cast("long")
    w = (
        Window.partitionBy("event_type")
        .orderBy(key)
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    swept = deltas.select(
        "event_type", F.sum("d").over(w).alias("running")
    )
    return swept.groupBy("event_type").agg(
        (F.count("*") / 2).cast("long").alias("n_intervals"),
        F.max("running").cast("long").alias("peak_concurrent"),
    )


#: CUSUM alarm threshold, in units of "hours' worth of mean traffic" —
#: the scaled statistic S_t exceeds ``CUSUM_ALARM_HOURS · total`` exactly
#: when the accumulated excess over the per-type mean rate exceeds that
#: many average-hours of volume. Interpolated into the oracle.
CUSUM_ALARM_HOURS = 3


def cusum_changepoint_hours(tables: dict[str, DataFrame]) -> DataFrame:
    """CUSUM change-point detection over the dense hourly count series,
    per event type — ALL-INTEGER, so the hash-match is exact by
    construction (no float recursion at all).

    The one-sided CUSUM recursion ``S_t = max(0, S_{t-1} + x_t - m)``
    (m = per-type mean hourly count) looks inherently sequential, but the
    max-reset recursion has a closed form: with prefix sums
    ``P_t = Σ_{i≤t}(x_i - m)``, ``S_t = P_t - min_{j≤t} P_j`` — two
    window passes, no recursion. To stay in integers the whole statistic
    is scaled by ``n`` (hours): ``P'_t = n·Σx_i - t·total`` (exact
    BIGINT), ``S'_t = P'_t - min P'`` = ``n·S_t``, and the alarm
    ``S_t > CUSUM_ALARM_HOURS·m`` becomes
    ``S'_t > CUSUM_ALARM_HOURS·total``.

    Scale shape: ONE corpus-sized stage (map-side-combined (hour, type)
    counts); the spine join and both window passes run on ≤ hours×types
    rows — time-range bounded, not data bounded, the same few thousand
    rows at 100 TB. Zero-filled gaps matter: a traffic outage IS a
    change-point, and dropped empty windows would hide it.

    Output, one row per type: ``event_type``, ``n_hours``, ``total_cnt``,
    ``max_cusum_scaled`` (= n·max_t S_t), ``peak_hour`` (earliest hour
    attaining the max), ``n_alarm_hours``, ``first_alarm_hour`` (NULL
    when the alarm never fires).
    """
    ev = tables["events"]
    counts = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count("*").alias("cnt"))
    counts = persist_replacing(counts, "cusum_counts")
    dense = (
        _hour_spine(counts)
        .join(F.broadcast(counts), ["hour", "event_type"], "left")
        .select(
            "hour", "event_type", F.coalesce("cnt", F.lit(0)).alias("cnt")
        )
    )
    part = Window.partitionBy("event_type")
    ordered = part.orderBy("hour")
    run = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scaled = dense.select(
        "hour",
        "event_type",
        (
            F.count("*").over(part) * F.sum("cnt").over(run)
            - F.row_number().over(ordered) * F.sum("cnt").over(part)
        ).alias("p"),
        F.count("*").over(part).alias("n_hours"),
        F.sum("cnt").over(part).alias("total_cnt"),
    )
    s = scaled.select(
        "hour",
        "event_type",
        "n_hours",
        "total_cnt",
        (F.col("p") - F.min("p").over(run)).alias("s"),
    )
    alarm = F.col("s") > CUSUM_ALARM_HOURS * F.col("total_cnt")
    return s.groupBy("event_type").agg(
        F.first("n_hours").alias("n_hours"),
        F.first("total_cnt").alias("total_cnt"),
        F.max("s").alias("max_cusum_scaled"),
        F.min_by("hour", F.struct((-F.col("s")).alias("a"), F.col("hour").alias("b"))).alias(
            "peak_hour"
        ),
        F.sum(alarm.cast("long")).alias("n_alarm_hours"),
        F.min(F.when(alarm, F.col("hour"))).alias("first_alarm_hour"),
    )


#: cross-correlation pair: does X's hourly volume lead Y's?
CROSSCORR_X = "view"
CROSSCORR_Y = "click"
CROSSCORR_MAX_LAG = 6


def lagged_crosscorr(tables: dict[str, DataFrame]) -> DataFrame:
    """Lead/lag cross-correlation between two event types' hourly count
    series: Pearson corr(x_t, y_{t+L}) for L = 0..CROSSCORR_MAX_LAG —
    "does view volume predict click volume L hours later?".

    Exactness follows ``corr_qty_price_by_flag``'s moment recipe: the
    series are INTEGER counts on the dense zero-filled hour spine, all
    five moment sums accumulate in decimal(18,0) (exact at any SF and
    any partitioning), and the only float arithmetic is the final
    division/sqrt — one fixed expression tree evaluated identically by
    both engines.

    Scale shape: one map-side-combined conditional aggregation collapses
    the corpus to ≤ |hours| rows (both series in the same groupBy — one
    scan, not two); the lead-stacking window and per-lag reduction run
    on that time-bounded frame. The single-partition window is over the
    hour spine, not the data (~thousands of rows regardless of SF).

    Output per lag: ``lag``, ``n_pairs`` (spine rows with a defined
    lead), ``corr_xy`` (double; NULL when a series is constant).
    """
    ev = tables["events"]
    hourly = (
        ev.where(F.col("event_type").isin(CROSSCORR_X, CROSSCORR_Y))
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.sum((F.col("event_type") == CROSSCORR_X).cast("long")).alias("x"),
            F.sum((F.col("event_type") == CROSSCORR_Y).cast("long")).alias("y"),
        )
    )
    hourly = persist_replacing(hourly, "crosscorr_hourly")
    bounds = hourly.agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    spine = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias(
            "hour"
        )
    )
    dense = spine.join(F.broadcast(hourly), "hour", "left").select(
        "hour",
        F.coalesce("x", F.lit(0)).alias("x"),
        F.coalesce("y", F.lit(0)).alias("y"),
    )
    w = Window.orderBy("hour")
    leads = dense.select(
        "x",
        F.array(
            *[
                F.struct(
                    F.lit(lag).alias("lag"),
                    F.lead("y", lag).over(w).alias("ylag"),
                )
                for lag in range(CROSSCORR_MAX_LAG + 1)
            ]
        ).alias("ls"),
    ).select("x", F.explode("ls").alias("l"))
    pairs = leads.select(
        F.col("l.lag").alias("lag"),
        F.col("x").cast(_TS_D).alias("x"),
        F.col("l.ylag").cast(_TS_D).alias("y"),
    ).where(F.col("y").isNotNull())
    s = pairs.groupBy("lag").agg(
        F.count("*").cast(_TS_D).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return s.select(
        "lag",
        F.col("n").cast("long").alias("n_pairs"),
        (num / den).alias("corr_xy"),
    )


#: decimal wide enough that the crosscorr moment sums stay exact
_TS_D = "decimal(18,0)"


def twap_daily_value(tables: dict[str, DataFrame]) -> DataFrame:
    """Time-WEIGHTED average value per (type, day) — each observation
    holds until the next one (LOCF step function), integrated to the day
    boundary; the finance/metering TWAP that a plain ``avg`` gets wrong
    whenever sampling is irregular (a value held for 3 hours must weigh
    180× one held for a minute).

    All-integer integration: segment length in whole epoch seconds
    (lead − current, last segment to next midnight), weight = cents ×
    seconds (int64: ≤ 5e4 cents × 86400 s ≈ 4e9 per segment), one final
    division micro-floored. One sort-shuffle on (type, day); output is
    ≤ types×days rows.

    Output: ``day``, ``event_type``, ``n_events``, ``covered_seconds``,
    ``twap_cents_micro`` = floor(1e6·Σ(cents·s)/Σs).
    """
    ev = tables["events"].select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    w = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    seg = ev.select(
        "event_type",
        "day",
        "cents",
        (
            F.coalesce(
                F.lead("ts").over(w),
                F.col("day") + F.expr("INTERVAL 1 DAY"),
            ).cast("long")
            - F.col("ts").cast("long")
        ).alias("secs"),
    )
    return (
        seg.groupBy("day", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("secs").alias("covered_seconds"),
            F.sum(F.col("cents") * F.col("secs")).alias("wsum"),
        )
        .select(
            "day",
            "event_type",
            "n_events",
            "covered_seconds",
            F.floor(
                F.lit(1000000.0)
                * F.col("wsum").cast("double")
                / F.col("covered_seconds").cast("double")
            )
            .cast("long")
            .alias("twap_cents_micro"),
        )
    )


QUERIES = {
    "peak_concurrency": peak_concurrency,
    "cusum_changepoint_hours": cusum_changepoint_hours,
    "lagged_crosscorr": lagged_crosscorr,
    "twap_daily_value": twap_daily_value,
    "hourly_counts_gapfilled": hourly_counts_gapfilled,
    "hourly_avg_value_locf": hourly_avg_value_locf,
    "hourly_value_interpolated": hourly_value_interpolated,
    "ewma_hourly_value": ewma_hourly_value,
    "similar_activity_users": similar_activity_users,
    "value_ohlc_5min": value_ohlc_5min,
}

ORACLES: dict[str, str] = {
    "peak_concurrency": f"""
        WITH deltas AS (
          SELECT event_type, ts AS t, 1 AS d FROM events
          UNION ALL
          SELECT event_type, ts + INTERVAL {CONCURRENCY_HOLD_MIN} MINUTE AS t,
                 -1 AS d
          FROM events
        ),
        swept AS (
          SELECT event_type,
                 sum(d) OVER (PARTITION BY event_type
                              ORDER BY epoch_us(t) * 2
                                       + CASE WHEN d > 0 THEN 1 ELSE 0 END
                              RANGE UNBOUNDED PRECEDING) AS running
          FROM deltas
        )
        SELECT event_type,
               CAST(count(*) / 2 AS BIGINT) AS n_intervals,
               CAST(max(running) AS BIGINT) AS peak_concurrent
        FROM swept GROUP BY event_type
    """,
    "cusum_changepoint_hours": f"""
        WITH bounds AS (
          SELECT date_trunc('hour', min(ts)) AS h0,
                 date_trunc('hour', max(ts)) AS h1
          FROM events
        ), spine AS (
          SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
          FROM bounds
        ), grid AS (
          SELECT hour, event_type
          FROM spine CROSS JOIN (SELECT DISTINCT event_type FROM events)
        ), counts AS (
          SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS cnt
          FROM events GROUP BY ALL
        ), dense AS (
          SELECT g.hour, g.event_type, coalesce(c.cnt, 0) AS cnt
          FROM grid g LEFT JOIN counts c USING (hour, event_type)
        ), scaled AS (
          SELECT hour, event_type,
                 count(*) OVER (PARTITION BY event_type) AS n_hours,
                 sum(cnt) OVER (PARTITION BY event_type) AS total_cnt,
                 count(*) OVER (PARTITION BY event_type)
                   * sum(cnt) OVER (PARTITION BY event_type ORDER BY hour
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - row_number() OVER (PARTITION BY event_type ORDER BY hour)
                     * sum(cnt) OVER (PARTITION BY event_type) AS p
          FROM dense
        ), s AS (
          SELECT hour, event_type, n_hours, total_cnt,
                 p - min(p) OVER (PARTITION BY event_type ORDER BY hour
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
          FROM scaled
        ), peak AS (
          SELECT event_type, hour AS peak_hour FROM s
          QUALIFY row_number() OVER (PARTITION BY event_type
                                     ORDER BY s DESC, hour) = 1
        ), aggd AS (
          SELECT event_type,
                 CAST(any_value(n_hours) AS BIGINT) AS n_hours,
                 CAST(any_value(total_cnt) AS BIGINT) AS total_cnt,
                 CAST(max(s) AS BIGINT) AS max_cusum_scaled,
                 CAST(sum(CASE WHEN s > {CUSUM_ALARM_HOURS} * total_cnt
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_alarm_hours,
                 min(CASE WHEN s > {CUSUM_ALARM_HOURS} * total_cnt
                          THEN hour END) AS first_alarm_hour
          FROM s GROUP BY event_type
        )
        SELECT a.event_type, a.n_hours, a.total_cnt, a.max_cusum_scaled,
               p.peak_hour, a.n_alarm_hours, a.first_alarm_hour
        FROM aggd a JOIN peak p USING (event_type)
    """,
    "twap_daily_value": """
        WITH ev AS (
          SELECT event_type, date_trunc('day', ts) AS day, ts, event_id,
                 CAST(round(value * 100, 0) AS BIGINT) AS cents
          FROM events
        ),
        seg AS (
          SELECT event_type, day, cents,
                 date_diff('second', ts,
                   coalesce(lead(ts) OVER w, day + INTERVAL 1 DAY)) AS secs
          FROM ev
          WINDOW w AS (PARTITION BY event_type, day ORDER BY ts, event_id)
        )
        SELECT day, event_type,
               count(*) AS n_events,
               CAST(sum(secs) AS BIGINT) AS covered_seconds,
               CAST(floor(1000000.0 * CAST(sum(cents * secs) AS DOUBLE)
                          / CAST(sum(secs) AS DOUBLE)) AS BIGINT)
                 AS twap_cents_micro
        FROM seg GROUP BY day, event_type
    """,
    "lagged_crosscorr": f"""
        WITH hourly AS (
          SELECT date_trunc('hour', ts) AS hour,
                 sum(CASE WHEN event_type = '{CROSSCORR_X}' THEN 1 ELSE 0
                     END) AS x,
                 sum(CASE WHEN event_type = '{CROSSCORR_Y}' THEN 1 ELSE 0
                     END) AS y
          FROM events
          WHERE event_type IN ('{CROSSCORR_X}', '{CROSSCORR_Y}')
          GROUP BY 1
        ), bounds AS (
          SELECT min(hour) AS h0, max(hour) AS h1 FROM hourly
        ), spine AS (
          SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
          FROM bounds
        ), dense AS (
          SELECT sp.hour, coalesce(h.x, 0) AS x, coalesce(h.y, 0) AS y
          FROM spine sp LEFT JOIN hourly h USING (hour)
        ), leads AS (
          SELECT x,
                 {', '.join(
                     f'lead(y, {lag}) OVER (ORDER BY hour) AS y{lag}'
                     for lag in range(CROSSCORR_MAX_LAG + 1)
                 )}
          FROM dense
        ), pairs AS (
          {' UNION ALL '.join(
              f'SELECT {lag} AS lag, CAST(x AS DECIMAL(18,0)) AS x,'
              f' CAST(y{lag} AS DECIMAL(18,0)) AS y'
              f' FROM leads WHERE y{lag} IS NOT NULL'
              for lag in range(CROSSCORR_MAX_LAG + 1)
          )}
        ), s AS (
          SELECT lag, CAST(count(*) AS DECIMAL(18,0)) AS n,
                 sum(x) AS sx, sum(y) AS sy,
                 sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
          FROM pairs GROUP BY lag
        )
        SELECT lag, CAST(n AS BIGINT) AS n_pairs,
               CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)) AS corr_xy
        FROM s
    """,
    "value_ohlc_5min": """
        WITH m AS (
          SELECT event_type,
                 time_bucket(INTERVAL '5 minutes', ts) AS bucket,
                 value,
                 row_number() OVER w AS rn_a,
                 row_number() OVER (
                   PARTITION BY event_type,
                                time_bucket(INTERVAL '5 minutes', ts)
                   ORDER BY ts DESC, event_id DESC) AS rn_d
          FROM events
          WINDOW w AS (
            PARTITION BY event_type, time_bucket(INTERVAL '5 minutes', ts)
            ORDER BY ts, event_id)
        )
        SELECT event_type, bucket,
               max(CASE WHEN rn_a = 1 THEN value END) AS open,
               max(value) AS high,
               min(value) AS low,
               max(CASE WHEN rn_d = 1 THEN value END) AS close,
               count(*) AS n
        FROM m GROUP BY event_type, bucket
    """,
    "ewma_hourly_value": """
        WITH RECURSIVE h AS (
          SELECT event_type, date_trunc('hour', ts) AS hour,
                 CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS x
          FROM events GROUP BY 1, 2
        ), h2 AS (
          SELECT *, row_number() OVER (
            PARTITION BY event_type ORDER BY hour) AS rn
          FROM h
        ), r AS (
          SELECT event_type, hour, rn, x, x AS ewma FROM h2 WHERE rn = 1
          UNION ALL
          SELECT h2.event_type, h2.hour, h2.rn, h2.x,
                 CAST(0.3 AS DOUBLE) * h2.x + CAST(0.7 AS DOUBLE) * r.ewma
          FROM r JOIN h2 ON h2.event_type = r.event_type
                        AND h2.rn = r.rn + 1
        )
        SELECT event_type, hour, x AS avg_value_cents, ewma FROM r
    """,
    "similar_activity_users": f"""
        WITH hours AS (SELECT unnest(generate_series(0, 23)) AS h),
        users AS (SELECT DISTINCT user_id FROM events),
        c AS (SELECT user_id, CAST(hour(ts) AS INT) AS h, count(*) AS cnt
              FROM events GROUP BY 1, 2),
        d AS (SELECT u.user_id, hours.h, coalesce(c.cnt, 0) AS cnt
              FROM users u CROSS JOIN hours
              LEFT JOIN c ON c.user_id = u.user_id AND c.h = hours.h),
        q AS (SELECT h, cnt AS qcnt FROM d
              WHERE user_id = (SELECT min(user_id) FROM events)),
        dist AS (SELECT d.user_id,
                        sum((d.cnt - q.qcnt) * (d.cnt - q.qcnt)) AS dist
                 FROM d JOIN q USING (h)
                 WHERE d.user_id != (SELECT min(user_id) FROM events)
                 GROUP BY 1)
        SELECT user_id, CAST(dist AS BIGINT) AS sq_dist
        FROM dist ORDER BY dist, user_id LIMIT {PROFILE_TOPK}
    """,
    "hourly_counts_gapfilled": """
        WITH bounds AS (
          SELECT date_trunc('hour', min(ts)) AS h0,
                 date_trunc('hour', max(ts)) AS h1
          FROM events
        ), spine AS (
          SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
          FROM bounds
        ), grid AS (
          SELECT hour, event_type
          FROM spine CROSS JOIN (SELECT DISTINCT event_type FROM events)
        ), counts AS (
          SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS cnt
          FROM events GROUP BY ALL
        )
        SELECT g.hour, g.event_type, coalesce(c.cnt, 0) AS cnt
        FROM grid g LEFT JOIN counts c USING (hour, event_type)
    """,
    "hourly_avg_value_locf": """
        WITH bounds AS (
          SELECT date_trunc('hour', min(ts)) AS h0,
                 date_trunc('hour', max(ts)) AS h1
          FROM events
        ), spine AS (
          SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
          FROM bounds
        ), grid AS (
          SELECT hour, event_type
          FROM spine CROSS JOIN (SELECT DISTINCT event_type FROM events)
        ), hourly AS (
          SELECT date_trunc('hour', ts) AS hour, event_type,
                 CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS avg_raw
          FROM events GROUP BY ALL
        ), dense AS (
          SELECT g.hour, g.event_type, h.avg_raw
          FROM grid g LEFT JOIN hourly h USING (hour, event_type)
        )
        SELECT hour, event_type,
               last_value(avg_raw IGNORE NULLS) OVER (
                 PARTITION BY event_type ORDER BY hour
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS avg_value_cents,
               avg_raw IS NULL AS filled
        FROM dense
    """,
    "hourly_value_interpolated": """
        WITH bounds AS (
          SELECT date_trunc('hour', min(ts)) AS h0,
                 date_trunc('hour', max(ts)) AS h1
          FROM events
        ), spine AS (
          SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
          FROM bounds
        ), grid AS (
          SELECT hour, event_type
          FROM spine CROSS JOIN (SELECT DISTINCT event_type FROM events)
        ), hourly AS (
          SELECT date_trunc('hour', ts) AS hour, event_type,
                 CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS avg_raw
          FROM events GROUP BY ALL
        ), dense AS (
          SELECT g.hour, g.event_type, h.avg_raw
          FROM grid g LEFT JOIN hourly h USING (hour, event_type)
        ), anchored AS (
          SELECT hour, event_type, avg_raw,
                 last_value(avg_raw IGNORE NULLS) OVER w_prev AS pv,
                 last_value(CASE WHEN avg_raw IS NOT NULL THEN hour END
                            IGNORE NULLS) OVER w_prev AS ph,
                 first_value(avg_raw IGNORE NULLS) OVER w_next AS nv,
                 first_value(CASE WHEN avg_raw IS NOT NULL THEN hour END
                             IGNORE NULLS) OVER w_next AS nh
          FROM dense
          WINDOW
            w_prev AS (PARTITION BY event_type ORDER BY hour
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            w_next AS (PARTITION BY event_type ORDER BY hour
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT hour, event_type,
               CASE WHEN avg_raw IS NOT NULL THEN avg_raw
                    WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                      pv + (nv - pv)
                         * (CAST(date_diff('hour', ph, hour) AS DOUBLE)
                            / CAST(date_diff('hour', ph, nh) AS DOUBLE))
               END AS value_interp,
               avg_raw IS NULL AS filled
        FROM anchored
    """,
}
