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


def _rewinds(df: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, ts, prev_ts) rows where ts rewinds vs the previous
    row of the conversation — ONE windowed pass, one output row per violating
    input row (ordering: turn_idx asc, ts asc nulls first, deterministic)."""
    w = Window.partitionBy("conv_id").orderBy(
        F.col("turn_idx").asc(), F.col("ts").asc_nulls_first()
    )
    prev_ts = F.lag("ts").over(w)
    return df.select("conv_id", "turn_idx", "ts", prev_ts.alias("prev_ts")).filter(
        F.col("ts") < F.col("prev_ts")
    )


def ts_monotonic_violations(df: DataFrame) -> DataFrame:
    """One violation per row whose ts rewinds vs the previous row of the
    conversation, rendered as typed violation strings."""
    return _rewinds(df).select(
        F.lit("ts_monotonic").alias("check_name"),
        F.col("conv_id"),
        F.col("turn_idx"),
        F.lit("ts").alias("column"),
        F.col("ts").cast("string").alias("observed"),
        F.concat(F.lit(">= "), F.col("prev_ts").cast("string")).alias("expected"),
    )


def ts_monotonic_violations_us(df: DataFrame) -> DataFrame:
    """Numeric variant of the same check: observed/expected timestamps as epoch
    microseconds (engine-portable compare — string rendering of trailing-zero
    microseconds differs between engines). Single windowed pass; duplicated
    (conv_id, turn_idx) keys cannot fan out because there is no rejoin."""
    return _rewinds(df).select(
        F.lit("ts_monotonic").alias("check_name"),
        F.col("conv_id"),
        F.col("turn_idx"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("observed_us"),
        F.unix_micros(F.col("prev_ts").cast("timestamp")).alias("expected_after_us"),
    )
