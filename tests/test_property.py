"""Property-based tests (hypothesis): independent implementations must agree
on randomized inputs, including geometry boundary regions.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from streamming_processing_pyspark_spark.functions.geo import (
    CITIGROUP,
    GOLDMAN,
    _raycast_numpy,
    point_in_polygon_sql,
)
from streamming_processing_pyspark_spark.functions.text import (
    FINGERPRINT_MOD,
    fingerprint,
)

_SETTINGS = dict(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# points concentrated around both polygons, including degenerate coords
_point = st.tuples(
    st.floats(-74.016, -74.008, allow_nan=False),
    st.floats(40.7125, 40.7230, allow_nan=False),
)


@settings(**_SETTINGS)
@given(st.lists(_point, min_size=64, max_size=64))
def test_raycast_sql_matches_numpy(spark, pts):
    import numpy as np

    df = spark.createDataFrame(pts, "lon double, lat double")
    for poly in (GOLDMAN, CITIGROUP):
        got = [
            r["inside"]
            for r in df.select(
                F.expr(point_in_polygon_sql(poly, "lon", "lat")).alias("inside")
            ).collect()
        ]
        xs = np.array([p[0] for p in pts])
        ys = np.array([p[1] for p in pts])
        want = list(_raycast_numpy(xs, ys, poly))
        assert got == want


_word = st.text(alphabet="abcdefghij", min_size=1, max_size=8)


@settings(**_SETTINGS)
@given(st.lists(_word, min_size=1, max_size=30))
def test_fingerprint_matches_python_reimpl(spark, words):
    text = " ".join(words)

    def py_fingerprint(t: str) -> int:
        total = 0
        for i, w in enumerate(t.strip().split()):
            total += (i + 1) * (31 * len(w) + ord(w[0]))
        return total % FINGERPRINT_MOD

    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(fingerprint("text").alias("fp")).collect()[0]["fp"]
    assert got == py_fingerprint(text)
