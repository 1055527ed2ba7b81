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


def test_exact_knn_graph_builds_still_match_retired_oracles(spark, duck):
    """VERDICT r9 §2 repointed knn_graph_triangles / label_propagation_knn
    at the ANN edge build (rows-only); the EXACT builds must keep matching
    the old hash-green oracles so the downstream algebra (triangle census,
    monotone LPA) stays pinned independent of the edge source."""
    from streamming_processing_pyspark_spark.operators import similarity as S
    from streamming_processing_pyspark_spark.tables import load_tables

    t = load_tables(spark, SF_DIR)
    tri = S.knn_graph_triangles(
        t, edge_fn=S._mutual_knn_edges_exact
    ).toPandas()
    assert_frames_match(
        tri, duck.execute(S._triangles_oracle_sql()).df(), "triangles_exact"
    )
    lpa = S.label_propagation_knn(
        t, edge_fn=S._mutual_knn_edges_exact
    ).toPandas()
    assert_frames_match(
        lpa,
        duck.execute(S._lpa_oracle_sql(S.LPA_ROUNDS)).df(),
        "lpa_exact",
    )
