from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from streamming_processing_pyspark_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Order-insensitive canonical form: columns sorted by name, datetimes →
    epoch micros, floats → repr strings, rows sorted."""
    out = {}
    for c in sorted(df.columns):
        s = df[c]
        if np.issubdtype(s.dtype, np.datetime64):
            s = s.astype("datetime64[us]").astype("int64")
        elif s.dtype == object:
            s = s.astype(str)
        elif np.issubdtype(s.dtype, np.floating):
            s = s.map(lambda v: "nan" if pd.isna(v) else repr(float(v)))
        out[c] = s
    res = pd.DataFrame(out)
    res = res.fillna("<null>")
    return res.sort_values(by=list(res.columns), kind="mergesort").reset_index(
        drop=True
    )


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs "
        f"{sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    )
    a, b = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    if not a.equals(b):
        diff_mask = (a != b).any(axis=1)
        raise AssertionError(
            f"{name}: value mismatch; first diffs:\n"
            f"spark:\n{a[diff_mask].head(5)}\noracle:\n{b[diff_mask].head(5)}"
        )
