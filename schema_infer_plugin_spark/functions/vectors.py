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


def quantize_embedding(v: Column) -> Column:
    """Per-vector affine int8-range quantization: struct(lo, step,
    q array<int>) with ``q_i = floor((x_i - lo)/step + 0.5)`` in [0, 255].

    The storage/shuffle-side memory lever for ANN at corpus scale: 1 byte per
    component instead of 4/8 (plus two doubles per vector), recoverable via
    :func:`dequantize_embedding` with max error step/2 per component.
    ``floor(x + 0.5)`` is used instead of round() because the engines
    disagree on round()'s tie behavior; floor(+0.5) is bit-identical in
    Spark and DuckDB. A constant vector (hi == lo) quantizes to all-zero q
    with step 0 and dequantizes exactly.
    """
    d = _as_double(v)
    lo = F.array_min(d)
    step = (F.array_max(d) - lo) / F.lit(255.0)
    q = F.transform(
        d,
        lambda x: F.when(
            step > 0,
            F.greatest(
                F.lit(0),
                F.least(F.lit(255), F.floor((x - lo) / step + F.lit(0.5)).cast("int")),
            ),
        )
        .otherwise(F.lit(0))
        .cast("int"),
    )
    return F.struct(lo.alias("lo"), step.alias("step"), q.alias("q"))


def dequantize_embedding(s: Column) -> Column:
    """Inverse of :func:`quantize_embedding`: ``lo + q_i * step`` as
    array<double> (exact for constant vectors; within step/2 per component
    otherwise)."""
    return F.transform(s["q"], lambda qi: s["lo"] + qi.cast("double") * s["step"])
