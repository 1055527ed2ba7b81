"""Driver-gate rehearsal: every oracle-backed query must hash-match DuckDB.

This mirrors the driver's CORRECTNESS check (row-count + schema +
order-insensitive values) at sf0.001 so regressions surface in seconds.
"""

from __future__ import annotations

import duckdb
import pytest

from streamming_processing_pyspark_spark.registry import build_oracles, build_queries
from streamming_processing_pyspark_spark.tables import TABLE_NAMES

from .conftest import SF_DIR, assert_frames_match

QUERIES = build_queries()
ORACLES = build_oracles()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def test_every_oracle_has_a_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    spark_pdf = QUERIES[name](spark, SF_DIR).toPandas()
    oracle_pdf = duck.execute(ORACLES[name]).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES))
)
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
