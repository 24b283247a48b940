"""Temporal integrity: ts must be non-decreasing along a conversation's turns.

The reference has no time semantics at all (SURVEY.md §2.9 — wall-clock timing
only); this is the engine's event-time addition: within a conversation ordered
by ``(turn_idx, ts)``, every timestamp must be >= its predecessor. Same window
shape as contiguity, so the fused plan (plans/validate.py) computes it from the
very same exchange + sort at zero extra shuffle.

NULL ts rows sort first within their turn (asc_nulls_first in Spark; the oracle
SQL must say NULLS FIRST — DuckDB defaults to NULLS LAST) and never produce or
suffer a violation (comparisons with NULL are NULL → filtered).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def ts_monotonic_violations(df: DataFrame) -> DataFrame:
    """One violation per row whose ts rewinds vs the previous row of the
    conversation (ordering: turn_idx asc, ts asc nulls first, deterministic)."""
    w = Window.partitionBy("conv_id").orderBy(
        F.col("turn_idx").asc(), F.col("ts").asc_nulls_first()
    )
    prev_ts = F.lag("ts").over(w)
    return (
        df.select("conv_id", "turn_idx", "ts", prev_ts.alias("prev_ts"))
        .filter(F.col("ts") < F.col("prev_ts"))
        .select(
            F.lit("ts_monotonic").alias("check_name"),
            F.col("conv_id"),
            F.col("turn_idx"),
            F.lit("ts").alias("column"),
            F.col("ts").cast("string").alias("observed"),
            F.concat(F.lit(">= "), F.col("prev_ts").cast("string")).alias("expected"),
        )
    )
