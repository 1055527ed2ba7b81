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

from .operators import dedup, multimodal, relational, similarity, text, windowed
from .tables import load_table, load_tables

QueryFn = Callable[[SparkSession, str], DataFrame]

#: modules whose queries take the full tables dict
_TABLE_MODULES = (relational, text, dedup, similarity, multimodal)


def _wrap_events(fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(load_table(spark, sf_dir, "events"))

    return run


def _wrap_tables(fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(load_tables(spark, sf_dir))

    return run


def build_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for name, fn in windowed.QUERIES.items():
        out[name] = _wrap_events(fn)
    for mod in _TABLE_MODULES:
        for name, fn in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name {name!r}")
            out[name] = _wrap_tables(fn)
    return out


def build_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in (windowed, *_TABLE_MODULES):
        out.update(mod.ORACLES)
    return out
