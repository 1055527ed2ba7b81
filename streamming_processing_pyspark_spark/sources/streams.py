"""Streaming sources: file streams over the testdata tables, socket lines.

``stream_events`` turns the driver's ``events`` parquet into a real
Structured Streaming source (schema pinned from a batch read — streaming
reads require a declared schema), including the same nanos→micros timestamp
normalization as the batch loader so streaming and batch results are
comparable row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import _normalize_ts, load_table, table_path


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as a file stream (one-file directory; real deployments point
    this at an arriving-files directory or Kafka)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    df = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        # file sources stream over directories; select just the events file
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return _normalize_ts(df)


def stream_parquet_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Generic file-stream over any testdata table."""
    if name == "events":
        return stream_events(spark, sf_dir)
    schema = load_table(spark, sf_dir, name).schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", f"{name}.parquet")
        .parquet(sf_dir)
    )


def socket_lines(spark: SparkSession, host: str = "localhost", port: int = 10002) -> DataFrame:
    """TCP text-line stream (reference Client.py:17-20, S2), Structured
    Streaming socket source instead of the legacy DStream receiver."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
