"""Load the driver's synthetic parquet tables and register temp views.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file each under
``/root/testdata/sf{0.001,0.01,0.1}/``.

All loads are plain ``spark.read.parquet`` so Catalyst keeps full pushdown /
pruning capability; nothing is cached by default (callers opt in for
benchmark loops).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # Oracle parity must not depend on the caller's session configs: DuckDB
    # timestamps are UTC-naive, so pin the session timezone (runtime-settable).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts has shipped as both parquet TIMESTAMP(NANOS) (Spark
        # rejects by default → read raw int64 nanos, floor to micros) and
        # TIMESTAMP(MICROS, isAdjustedToUTC=false) (reads as
        # timestamp_ntz). Normalize either to a session-timezone TIMESTAMP
        # (the session is pinned UTC above, so the instant is unchanged and
        # DuckDB's naive timestamps agree) so downstream epoch arithmetic
        # (cast to bigint, unix_timestamp) stays legal.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        return _normalize_ts(df)
    return spark.read.parquet(table_path(sf_dir, name))


def _normalize_ts(df: DataFrame) -> DataFrame:
    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dtype == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    """Load the requested tables and register each as a temp view."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition an UNDER-partitioned frame so per-partition Python
    stages (mapInPandas / pandas UDFs) use every core.

    The test tables are one parquet file each → one input partition → one
    Python worker doing all the work serially. On a real cluster the input
    is already split across many files and this is a no-op (we only
    repartition when below the session's default parallelism), so no
    gratuitous shuffle is added at scale — the shuffle that IS added
    locally moves a tiny frame and buys core-count speedup of the Python
    stage behind it.
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    # Partition-count probe WITHOUT df.rdd (which forces a full plan→RDD
    # physical translation per call): the source file count bounds the scan
    # parallelism for file-based plans. Many files → the scan already fans
    # out and this is a no-op; few/zero files (local single-file testdata,
    # or a non-file source we can't cheaply inspect) → repartition, which
    # moves a frame that is small precisely because it came from few files.
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= target:
        return df
    return df.repartition(target)
