"""Vector math over array<float>/array<double> embedding columns.

Pure higher-order built-ins (zip_with / aggregate) — JVM-evaluated, no UDF.
Accumulation is a sequential double fold, which matches DuckDB's list_dot_product
/ list_cosine_similarity on DOUBLE[] bit-for-bit, making ANN results
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two vectors (double accumulation)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a,b); 0.0 when either norm is zero (deterministic, no NaN)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))
