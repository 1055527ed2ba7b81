"""Vector math over ``array<float>`` embedding columns — Catalyst-only.

Dot products / norms / cosine via ``zip_with`` + ``aggregate`` higher-order
functions: JVM-side, sequential left-to-right accumulation (bit-identical to
the DuckDB oracle's ``list_dot_product`` on the same doubles). For very wide
vectors a Pandas-UDF BLAS path would win; at 64 dims the codegen'd
expression avoids the Arrow transfer entirely.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    return F.col(vec).cast("array<double>") if isinstance(vec, str) else vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_cols(a: Column | str, b: Column | str) -> Column:
    return cosine(as_double(a), as_double(b))
