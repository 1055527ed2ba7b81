"""Streaming jobs — the reference's Task2/Task3/Task4/Client pipelines,
rebuilt on Structured Streaming with explicit watermarks and deterministic,
per-window-correct sinks.

Every job is a *transformation* on a streaming DataFrame (testable against
any source) plus small sink helpers. Differences from the reference, all
deliberate (SURVEY.md §5.3, §7):

- watermarks are available on every aggregation (the reference had none —
  unbounded state; fine for one bounded day, wrong at 100 TB);
- file sinks write per-window-correct contents (the reference's Task3/Task4
  writers repeated the first row's count into every hourly file);
- collect() happens once per batch (the reference re-ran a distributed
  filter+collect per output row — O(rows²) driver pattern);
- results are file-arrival-order independent: sinks derive file names from
  the *window*, and re-writes of a window file are idempotent overwrites,
  so update-mode re-emissions converge to the final counts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.geo import classify_sql

_MEMORY_SINK_SEQ = [0]


def hourly_dropoff_counts(trips: DataFrame, watermark: str | None = None) -> DataFrame:
    """Task2: trips per 1-hour event-time window (reference Task2.py:44-51)."""
    if watermark:
        trips = trips.withWatermark("dropoff_ts", watermark)
    return (
        trips.groupBy(F.window("dropoff_ts", "1 hour").alias("w"))
        .count()
        .select(
            F.col("w.start").alias("window_start"),
            F.hour("w.end").alias("hour_of_day"),
            F.col("count").alias("cnt"),
        )
    )


def geofence_hourly(trips: DataFrame, watermark: str | None = None) -> DataFrame:
    """Task3: per-geofence hourly counts; classification is the codegen'd
    ray-cast expression (no Python round-trip; contrast Task3.py:57-83)."""
    classified = trips.withColumn(
        "headquarters", F.expr(classify_sql("dropoff_lon", "dropoff_lat"))
    ).where(F.col("headquarters") != "none")
    if watermark:
        classified = classified.withWatermark("dropoff_ts", watermark)
    return (
        classified.groupBy(
            F.window("dropoff_ts", "1 hour").alias("w"), "headquarters"
        )
        .count()
        .select(
            F.col("w.start").alias("window_start"),
            F.hour("w.end").alias("hour_of_day"),
            "headquarters",
            F.col("count").alias("cnt"),
        )
    )


def geofence_10min_counts(trips: DataFrame, watermark: str | None = None) -> DataFrame:
    """Task4 aggregation stage: per-geofence 10-minute windowed counts."""
    classified = trips.withColumn(
        "headquarters", F.expr(classify_sql("dropoff_lon", "dropoff_lat"))
    )
    if watermark:
        classified = classified.withWatermark("dropoff_ts", watermark)
    return (
        classified.groupBy(
            F.window("dropoff_ts", "10 minutes").alias("w"), "headquarters"
        )
        .count()
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "headquarters",
            F.col("count").alias("cnt"),
        )
    )


def word_counts_stream(lines: DataFrame) -> DataFrame:
    """Client.py word count, Structured-Streaming-native: split on single
    space (empties kept — reference semantics), running count per word."""
    return (
        lines.select(F.explode(F.split("value", " ")).alias("word"))
        .groupBy("word")
        .count()
        .withColumnRenamed("count", "cnt")
    )


def detect_trends_in_batch(
    counts: DataFrame,
    window_seconds: int = 600,
    min_count: int = 10,
    key_col: str = "headquarters",
) -> DataFrame:
    """Reference Task4 trend rule over a batch of windowed counts:
    count ≥ min_count AND count − prev ≥ prev for the window exactly one
    period earlier, same key. lag()-based — no self-join (SURVEY.md §2.4 J1).

    Matches the reference's same-batch-only semantics when applied to an
    update-mode micro-batch; apply to the full aggregate (or use
    streaming/trend.py's stateful operator) for cross-batch detection.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy("window_start")
    return (
        counts.withColumn("prev_cnt", F.lag("cnt").over(w))
        .withColumn("prev_start", F.lag("window_start").over(w))
        .where(
            (F.col("cnt") >= min_count)
            & F.col("prev_cnt").isNotNull()
            & (
                F.col("window_start").cast("long") - F.col("prev_start").cast("long")
                == window_seconds
            )
            & (F.col("cnt") - F.col("prev_cnt") >= F.col("prev_cnt"))
        )
        .select(key_col, "window_start", "window_end", "cnt", "prev_cnt")
    )


# ---------------------------------------------------------------------------
# Reference-compatible file sinks (per-window-correct contents)
# ---------------------------------------------------------------------------


def hourly_file_name(hour_of_day: int) -> str:
    """Reference Task2.py:60 naming: output-{hour*360000}, hour 0 → 24."""
    h = 24 if hour_of_day == 0 else hour_of_day
    return f"output-{h * 360000}"


def write_hourly_files(batch_df: DataFrame, out_dir: str) -> None:
    """Task2 sink: one file per updated hourly window with its total count.

    One collect() for the whole (tiny, aggregated) batch — not a
    distributed job per row (contrast reference Task2.py:57-62).
    """
    os.makedirs(out_dir, exist_ok=True)
    for row in batch_df.select("hour_of_day", "cnt").collect():
        with open(os.path.join(out_dir, hourly_file_name(row[0])), "w") as f:
            f.write(f"{row[1]}\n")


def write_geofence_files(
    batch_df: DataFrame, out_dir: str, reference_compat: bool = False
) -> None:
    """Task3 sink: output3-{hour*360000} with ('citigroup', n)\\n('goldman', m)
    — per-window-correct (fixes reference Task3.py:102-103).

    ``reference_compat=True`` reproduces the reference's sink byte-for-byte
    for artifact diffing, including its bug: Task3.py:102-103 takes
    ``collect()[0][0]`` of the *whole batch* per headquarters, so every
    hour's file carries the batch's first citigroup/goldman counts (and no
    trailing newline). Off by default — the fixed per-window contents are
    what a user actually wants.
    """
    os.makedirs(out_dir, exist_ok=True)
    rows = batch_df.select("hour_of_day", "headquarters", "cnt").collect()
    if reference_compat:
        first: dict[str, int] = {}
        for _hour, hq, cnt in rows:
            first.setdefault(hq, cnt)
        missing = {"citigroup", "goldman"} - set(first)
        if rows and missing:
            # the reference's collect()[0][0] would IndexError here; fail
            # with the cause instead of a bare KeyError mid-stream
            raise ValueError(
                f"reference_compat sink needs both headquarters in the "
                f"batch (reference Task3.py:102-103 crashes otherwise); "
                f"missing: {sorted(missing)}"
            )
        for hour, _hq, _cnt in rows:
            h = 24 if hour == 0 else hour
            with open(os.path.join(out_dir, f"output3-{h * 360000}"), "w") as f:
                f.write(
                    f"('citigroup', {first['citigroup']})\n"
                    f"('goldman', {first['goldman']})"
                )
        return
    by_hour: dict[int, dict[str, int]] = {}
    for hour, hq, cnt in rows:
        by_hour.setdefault(hour, {})[hq] = cnt
    for hour, counts in by_hour.items():
        h = 24 if hour == 0 else hour
        with open(os.path.join(out_dir, f"output3-{h * 360000}"), "w") as f:
            for hq in ("citigroup", "goldman"):
                f.write(f"('{hq}', {counts.get(hq, 0)})\n")


def write_trending_files(trends_df: DataFrame, out_dir: str) -> None:
    """Task4 sink: part-{sec_of_day*100} with (hq, (count, sec, prevCount))
    (reference Task4.py:136-142 shape)."""
    os.makedirs(out_dir, exist_ok=True)
    rows = trends_df.select(
        "headquarters",
        "cnt",
        (
            F.hour("window_end") * 3600 + F.minute("window_end") * 60
        ).alias("sec_of_day"),
        "prev_cnt",
    ).collect()
    for hq, cnt, sec, prev in rows:
        with open(os.path.join(out_dir, f"part-{sec * 100}"), "w") as f:
            f.write(f"({hq}, ({cnt}, {sec}, {prev}))\n")


# ---------------------------------------------------------------------------
# Query runners
# ---------------------------------------------------------------------------


def run_to_memory(
    df: DataFrame, output_mode: str = "complete", name: str | None = None
) -> tuple[StreamingQuery, str]:
    """Start a memory-sink query and drain all available input synchronously.

    The local smoke path: parquet/file sources + ``processAllAvailable``
    drive a streaming plan to completion deterministically.
    """
    _MEMORY_SINK_SEQ[0] += 1
    table = name or f"stream_sink_{_MEMORY_SINK_SEQ[0]}"
    q = (
        df.writeStream.format("memory")
        .queryName(table)
        .outputMode(output_mode)
        .start()
    )
    q.processAllAvailable()
    return q, table


def run_available_now(
    df: DataFrame,
    output_mode: str = "complete",
    name: str | None = None,
) -> tuple[StreamingQuery, str]:
    """Drain all CURRENTLY available input with ``Trigger.AvailableNow``
    and stop — the modern incremental-batch pattern (replaces the
    deprecated ``Trigger.Once``): the query processes the backlog in
    rate-limited micro-batches (respecting the source's
    ``maxFilesPerTrigger``),
    commits the checkpoint, and terminates, so a cron-scheduled catch-up
    job gets streaming semantics (exactly-once, watermarks, state) with
    batch-job economics. ``awaitTermination`` returns when the backlog is
    drained.
    """
    _MEMORY_SINK_SEQ[0] += 1
    table = name or f"stream_sink_{_MEMORY_SINK_SEQ[0]}"
    q = (
        df.writeStream.format("memory")
        .queryName(table)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q, table


def run_foreach_batch(
    df: DataFrame,
    fn,
    output_mode: str = "update",
    checkpoint_dir: str | None = None,
) -> StreamingQuery:
    """Reference K1 sink: per-micro-batch callback, optional checkpointing."""
    writer = df.writeStream.foreachBatch(fn).outputMode(output_mode)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def upsert_partition_overwrite(
    batch_df: DataFrame, out_dir: str, partition_cols: list[str]
) -> None:
    """Exactly-once parquet upsert for an UPDATE-mode aggregation stream:
    each micro-batch dynamically overwrites ONLY the partitions it carries
    (``partitionOverwriteMode=dynamic``), replacing stale aggregates for
    re-emitted keys and leaving untouched partitions in place.

    With checkpointing this gives end-to-end exactly-once on a plain
    parquet table: a replayed batch rewrites the same partitions with the
    same content (idempotent), and a crashed write is replaced wholesale on
    retry. This is the production fan-out of the reference's per-window
    file sinks — same per-window-replacement contract, but distributed,
    columnar, and readable as one table.

    CONTRACT: ``partition_cols`` must cover the stream's full grouping key
    (one aggregate row group per partition directory). If the partition is
    coarser — e.g. grouped by (window, key) but partitioned only by window
    — a micro-batch that re-emits one key of a window would overwrite that
    window's whole partition and DELETE the other keys' aggregates.
    """
    # writer-level option, NOT session conf: a session-wide flip (even
    # restored in finally) is visible to any concurrent query on the same
    # SparkSession — a second stream's static overwrite could silently turn
    # dynamic or clobber the restore. The option scopes it to this write.
    (
        batch_df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(out_dir)
    )


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str | None = None
) -> DataFrame:
    """Streaming session windows over the events stream.

    ``F.session_window`` is the stateful sessionizer (same call as the
    batch query in ``relational2.session_window_counts``, so stream/batch
    parity is by construction). Session aggregations stream in append or
    complete mode only (Spark rejects update): production runs append +
    a minutes-scale watermark, emitting each session once finalized and
    bounding state to the active-session horizon; bounded historical
    replay (our harness) runs complete with no watermark so the final
    table includes sessions the watermark would still be holding open.
    """
    if watermark:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
