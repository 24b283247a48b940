"""Numeric-outlier check via Tukey fences (IQR rule).

Flags rows where ``x < q1 - k·iqr`` or ``x > q3 + k·iqr`` — the
distribution-shape constraint the reference's type-level validation has no
analog for (a value can be a perfectly typed double and still be a sensor
glitch). Complements the drift checks (checks/drift.py compares two runs;
this one finds intra-run anomalies).

Plan shape: ONE aggregation derives the quantile bounds (a single row, or one
row per group), then a broadcast join stamps the bounds onto the scan and the
fence predicate filters map-side — output ∝ outliers. The bounds frame never
grows with the table, so the cross/equi join is the documented
bounded-broadcast pattern, not an O(n²) hazard.

Quantile modes mirror the repo's exact-vs-scale convention:

* ``approx=True`` (default, the 10^12-row path): ``percentile_approx``
  (a mergeable t-digest-style sketch — bounded memory per partition);
* ``approx=False`` — EXACT interpolated percentile. Spark's ``percentile``
  buffers each aggregation group's values, so this is the explicit opt-in
  verifier at test scale (it matches DuckDB's ``quantile_cont`` for the
  oracle), never the production default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast


def iqr_outliers(
    df: DataFrame,
    col: str,
    k: float = 1.5,
    approx: bool = True,
    group_by: list[str] | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Rows of ``df`` outside the Tukey fences of ``col``, with the fences.

    ``group_by`` computes fences per group (one bounds row per group) instead
    of globally. Values and bounds are rounded to ``round_digits`` BEFORE the
    fence comparison so the inclusion decision is reproducible across engines
    (the repo's float-oracle convention).

    Output: input columns + (q1, q3, lo, hi) doubles; ``col`` is replaced by
    its rounded value.
    """
    c = F.col(col).cast("double")
    quant = (
        F.percentile_approx(c, F.array(F.lit(0.25), F.lit(0.75)))
        if approx
        else F.percentile(c, F.array(F.lit(0.25), F.lit(0.75)))
    )
    keys = group_by or []
    bounds_src = df.groupBy(*keys).agg(quant.alias("_q")) if keys else df.agg(quant.alias("_q"))
    bounds = bounds_src.select(
        *keys,
        F.col("_q")[0].alias("_q1"),
        F.col("_q")[1].alias("_q3"),
    ).select(
        *keys,
        "_q1",
        "_q3",
        (F.col("_q1") - k * (F.col("_q3") - F.col("_q1"))).alias("_lo"),
        (F.col("_q3") + k * (F.col("_q3") - F.col("_q1"))).alias("_hi"),
    )
    joined = (
        df.join(broadcast(bounds), on=keys) if keys else df.crossJoin(broadcast(bounds))
    )
    rv = F.round(c, round_digits)
    rlo = F.round(F.col("_lo"), round_digits)
    rhi = F.round(F.col("_hi"), round_digits)
    out_cols = [
        rv.alias(col) if name == col else F.col(name)
        for name in df.columns
    ]
    return (
        joined.filter((rv < rlo) | (rv > rhi))
        .select(
            *out_cols,
            F.round(F.col("_q1"), round_digits).alias("q1"),
            F.round(F.col("_q3"), round_digits).alias("q3"),
            rlo.alias("lo"),
            rhi.alias("hi"),
        )
    )
