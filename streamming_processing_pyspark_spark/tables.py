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
from collections.abc import MutableMapping

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


class LazyTables(MutableMapping):
    """Tables mapping that loads (and registers the temp view for) each
    table on FIRST ACCESS instead of eagerly loading all ten.

    Why (OPTIMIZATION_r11 §tables): every ``spark.read.parquet`` is a
    driver-side file listing plus a schema-inference job — measured ~30 ms
    and one 1-task Spark job per table on the bench host. The eager loader
    paid 10 of those per query invocation while the median registry query
    touches 1-2 tables: ~0.3 s of pure driver overhead per query, ~27% of
    the sub-second queries' total time, and at production scale the same
    pattern is ten directory listings (minutes on object stores, guide
    §6/§7.3) for tables the query never reads. Laziness changes nothing
    about what any query computes — the same ``load_table`` runs, just
    only for the tables actually asked for.

    Mutation (``t["documents"] = df``, the scale probe's replicated-corpus
    override) stores the frame without touching storage, matching the old
    dict semantics. ``in``/``len``/iteration report the full name set
    without loading; ``dict(t)`` (or iterating values) forces every load,
    same cost as the old eager dict.
    """

    __slots__ = ("_spark", "_sf_dir", "_names", "_loaded")

    def __init__(
        self, spark: SparkSession, sf_dir: str, names: tuple[str, ...]
    ) -> None:
        self._spark = spark
        self._sf_dir = sf_dir
        self._names = tuple(names)
        self._loaded: dict[str, DataFrame] = {}

    def __getitem__(self, name: str) -> DataFrame:
        df = self._loaded.get(name)
        if df is None:
            if name not in self._names:
                raise KeyError(name)
            df = load_table(self._spark, self._sf_dir, name)
            df.createOrReplaceTempView(name)
            self._loaded[name] = df
        return df

    def __setitem__(self, name: str, df: DataFrame) -> None:
        # NOTE (ADVICE r11): an override is NOT registered as a temp view;
        # SQL-based consumers must access t[name] for every table their
        # SQL references before calling spark.sql (all current ones do).
        # Registering here would leak session-scoped views past the
        # override's lifetime, which is worse than the documented rule.
        self._loaded[name] = df
        if name not in self._names:
            self._names = self._names + (name,)

    def __delitem__(self, name: str) -> None:
        # MutableMapping contract (ADVICE r11): a name that is present
        # ("in self") but not yet loaded must delete cleanly — pop/
        # popitem/clear all route through here.
        if name not in self._names:
            raise KeyError(name)
        self._loaded.pop(name, None)
        self._names = tuple(n for n in self._names if n != name)

    def __iter__(self):
        return iter(self._names)

    def __len__(self) -> int:
        return len(self._names)

    def __contains__(self, name: object) -> bool:
        return name in self._names


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> LazyTables:
    """Tables mapping for the operator modules: dict-compatible, loads
    each table (and registers its temp view) on first access — see
    :class:`LazyTables` for why this is lazy."""
    return LazyTables(spark, sf_dir, names)


#: one cached frame per operator slot — see persist_replacing
_PERSIST_SLOTS: dict[str, DataFrame] = {}


def persist_replacing(df: DataFrame, slot: str) -> DataFrame:
    """persist() with a bounded lifetime: the previous frame cached under
    the same slot is unpersisted first.

    DataFrame.persist registers the plan in Spark's CacheManager, which
    holds cached blocks until an explicit unpersist/clearCache — they are
    NOT reclaimed when the Python object is garbage-collected. Operators
    that persist a shared subframe per call (MinHash shingles, span
    spans) would therefore leak storage across repeated calls in a
    long-lived session; slot replacement caps the footprint at one cached
    frame per operator. Unpersisting the previous frame is always safe:
    any still-live plan built on it just recomputes.

    When the incoming plan is semantically identical to the slot's cached
    frame (``sameSemantics`` — same session, same resolved logical plan),
    the cached frame is RETURNED instead of replaced: expensive shared
    subframes (the shingle index feeding ngram-Jaccard, MinHash-LSH and
    dedup-cluster queries) are computed once per session and reused
    across operator calls, while a changed input (different sf_dir, new
    session) still swaps the slot. Memory stays bounded at one cached
    frame per slot either way.

    Liveness is checked through ``DataFrame.storageLevel`` — which asks
    the CacheManager — NOT ``is_cached``, which is a plan-local flag
    that stays True after ``spark.catalog.clearCache()`` (measured on
    PySpark 4.1: is_cached True / storageLevel no-memory-no-disk after a
    clearCache). With the is_cached guard, a clearCache'd slot frame was
    returned forever UNPERSISTED (every use recomputed — a silent perf
    cliff after any cache flush), and worse: ``sameSemantics`` compares
    canonical plans, not bytes on disk, so a caller that overwrote the
    parquet behind the same path got the DROPPED file listing back
    (FAILED_READ_FILE in the r11 scale-probe targeted runs). A
    rewritten-path caller must still call :func:`clear_persist_slots` —
    same hygiene as ``pipeline.clear_cc_memo`` — because a slot whose
    blocks are genuinely live cannot detect the rewrite.
    """
    prev = _PERSIST_SLOTS.get(slot)
    if prev is not None:
        try:
            lvl = prev.storageLevel  # CacheManager-backed, unlike is_cached
            if (lvl.useMemory or lvl.useDisk) and df.sameSemantics(prev):
                return prev
        except Exception:
            pass  # cross-session comparison / stopped session → replace
        try:
            prev.unpersist(blocking=False)
        except Exception:
            pass  # e.g. its SparkSession is already stopped
    out = df.persist()
    _PERSIST_SLOTS[slot] = out
    return out


def clear_persist_slots() -> None:
    """Unpersist and forget every slot frame. Required hygiene for any
    caller that rewrites data behind a previously-read path mid-session
    (the scale probe's replicated-corpus writes): ``sameSemantics`` is
    plan-level, so a live slot built on the old bytes would otherwise be
    reused. The sibling of ``pipeline.clear_cc_memo``."""
    for prev in _PERSIST_SLOTS.values():
        try:
            prev.unpersist(blocking=False)
        except Exception:
            pass
    _PERSIST_SLOTS.clear()


def local_df(spark: SparkSession, rows: list, schema: str) -> DataFrame:
    """``createDataFrame`` for small DRIVER-COMPUTED row lists (fixpoint
    results, literal spines), built in ONE slice.

    The plain ``createDataFrame(list, schema)`` parallelizes the rows over
    ``defaultParallelism`` slices — 32 scheduled tasks (31 of them empty)
    every time the frame materializes, measured ~0.15-0.28 s of pure task
    scheduling per action at any scale (the rows are by construction
    driver-sized: model fixpoints, θ spines, audit summaries). One slice,
    one task; values and schema are bit-identical (same codepath, only
    ``numSlices`` differs). Empty lists keep the plain path — a zero-row
    parallelize slice is the one case the RDD route handles worse.

    Spark Connect sessions have no ``sparkContext`` (ADVICE r11): fall
    back to the plain path there — correct, just without the one-slice
    scheduling win."""
    if not rows:
        return spark.createDataFrame(rows, schema)
    try:
        sc = spark.sparkContext
    except Exception:  # Spark Connect: no RDD API
        return spark.createDataFrame(rows, schema)
    return spark.createDataFrame(sc.parallelize(rows, 1), schema)


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
    # Partition-count estimate WITHOUT df.rdd (which forces a full
    # plan→RDD physical translation per call). Scan parallelism for
    # splittable parquet ≈ total bytes / maxPartitionBytes (Spark's split
    # + bin-packing both converge on this), so estimate from file sizes
    # when the listing is locally statable; otherwise fall back to the
    # file count. Zero files / non-file sources → repartition, which then
    # moves a frame that is small precisely because we couldn't see big
    # inputs behind it.
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    # File count alone is an UPPER bound on scan parallelism (Spark
    # bin-packs many small files into fewer partitions), so when sizes
    # aren't statable it can only justify SKIPPING the repartition, never
    # prove one is needed; when sizes are statable the bin-packing/split
    # estimate total/maxPartitionBytes is authoritative in both directions.
    est = len(files)
    local = [f[len("file:"):] if f.startswith("file:") else f for f in files]
    if local and all(os.path.exists(p) for p in local):
        total_bytes = sum(os.path.getsize(p) for p in local)
        max_pb = _parse_bytes(
            df.sparkSession.conf.get(
                "spark.sql.files.maxPartitionBytes", "134217728"
            )
        )
        est = max(1, -(-total_bytes // max_pb)) if total_bytes else 0
    if est >= target:
        return df
    return df.repartition(target)


_BYTE_SUFFIXES = {
    "k": 1 << 10, "kb": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30,
    "t": 1 << 40, "tb": 1 << 40,
    "b": 1, "": 1,
}


def _parse_bytes(v: str) -> int:
    """Parse Spark byte-size conf values: plain ints and human-readable
    suffixed forms ("134217728", "128m", "64MB", "1g")."""
    s = v.strip().lower()
    num = s.rstrip("kmgtb")
    try:
        return max(1, int(num) * _BYTE_SUFFIXES[s[len(num):]])
    except (ValueError, KeyError):
        return 128 * 1024 * 1024
