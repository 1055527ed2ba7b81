"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``streamming_processing_pyspark_spark/``; this file
only adapts the registry to the driver's signatures.
"""

from __future__ import annotations

import os as _os
import sys as _sys

# Python workers resolve cloudpickled module-level helpers by import, so the
# package dir must be importable IN THE WORKER. When the driver's cwd is this
# repo (the driver's own invocation) the pyspark daemon picks it up from its
# cwd; exporting PYTHONPATH additionally covers harnesses that import this
# file from elsewhere before creating their SparkSession.
_REPO = _os.path.dirname(_os.path.abspath(__file__))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)
if _REPO not in _os.environ.get("PYTHONPATH", "").split(_os.pathsep):
    _os.environ["PYTHONPATH"] = (
        _REPO + _os.pathsep + _os.environ["PYTHONPATH"]
        if _os.environ.get("PYTHONPATH")
        else _REPO
    )

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from streamming_processing_pyspark_spark.operators.windowed import (
    geofence_hourly_counts,
)
from streamming_processing_pyspark_spark.registry import build_oracles, build_queries
from streamming_processing_pyspark_spark.tables import load_table

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full Task3-style pipeline — derive coordinates,
    geofence-classify via the codegen'd ray-cast expression, hourly windowed
    counts per geofence (reference Task3.py end-to-end, per-window-correct)."""
    return geofence_hourly_counts(load_table(spark, SMOKE_SF_DIR, "events"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return build_queries()


def oracle_sql() -> dict[str, str]:
    return build_oracles()
