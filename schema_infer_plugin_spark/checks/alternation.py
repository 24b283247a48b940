"""Role-alternation check: agent transcripts should alternate speakers.

Engine-added, transcript-native constraint (no reference analog — SURVEY.md
§2.6 family): within a conversation ordered by ``(turn_idx, ts)``, two
CONSECUTIVE turns with the same non-null role indicate a stitching or
ingestion fault — except ``tool`` turns, which legitimately run in sequences
(multiple tool results between assistant turns) and are therefore exempt on
both sides of the comparison.

Same window shape as contiguity/ts-monotonic (one lag over the conv_id
exchange), so a future fused-plan inclusion costs zero extra shuffles; kept
standalone for now so the fused plan's verdict grid stays stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def role_alternation_violations(df: DataFrame) -> DataFrame:
    """One violation per turn whose role repeats the previous turn's role
    (both non-null, neither 'tool'), ordered by (turn_idx, ts nulls first)."""
    w = Window.partitionBy("conv_id").orderBy(
        F.col("turn_idx").asc(), F.col("ts").asc_nulls_first()
    )
    prev_role = F.lag("role").over(w)
    return (
        df.select("conv_id", "turn_idx", "role", prev_role.alias("prev_role"))
        .filter(
            F.col("role").isNotNull()
            & F.col("prev_role").isNotNull()
            & (F.col("role") == F.col("prev_role"))
            & (F.col("role") != "tool")
        )
        .select(
            F.lit("role_alternation").alias("check_name"),
            F.col("conv_id"),
            F.col("turn_idx"),
            F.lit("role").alias("column"),
            F.col("role").alias("observed"),
            F.concat(F.lit("!= "), F.col("prev_role")).alias("expected"),
        )
    )
