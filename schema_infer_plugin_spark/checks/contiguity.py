"""Referential integrity: turn_idx contiguity within each conversation.

A conversation's turns must be 0,1,2,…,n with no gaps and a 0 start. Plan:
``dedup (conv_id, turn_idx) → window lag over (partitionBy conv_id, orderBy
turn_idx)`` — duplicates are removed first so the uniqueness check owns them and
the lag sees each index once.

Scale: the window needs whole conversations co-located, so it cannot be salted —
but conversations are bounded (≤ thousands of turns) while the table is not, so
partitioning by conv_id is balanced at any scale; the preceding distinct is a
hash agg with map-side combine. AQE's skew handling covers pathological convs
(SURVEY.md §7 "What's hard").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from schema_infer_plugin_spark.schema import well_keyed


def contiguity_violations(df: DataFrame) -> DataFrame:
    """Violation rows: gaps (turn_idx != prev+1) and missing starts (min != 0).

    The gap row reports the observed index whose predecessor is missing;
    expected = prev + 1.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    # NULL-key rows carry no position in any conversation — they are
    # not_null_conv_id / not_null_turn_idx violations, never contiguity ones
    # (the engine-wide posture, plans/validate.py)
    idx = (
        well_keyed(df)
        .select("conv_id", "turn_idx")
        .distinct()
        .withColumn("prev_idx", F.lag("turn_idx").over(w))
    )
    gaps = idx.filter(
        F.col("prev_idx").isNotNull() & (F.col("turn_idx") != F.col("prev_idx") + 1)
    ).select(
        F.lit("contiguity").alias("check_name"),
        F.col("conv_id"),
        F.col("turn_idx"),
        F.lit("turn_idx").alias("column"),
        F.col("turn_idx").cast("string").alias("observed"),
        (F.col("prev_idx") + 1).cast("string").alias("expected"),
    )
    starts = idx.filter(F.col("prev_idx").isNull() & (F.col("turn_idx") != 0)).select(
        F.lit("contiguity_start").alias("check_name"),
        F.col("conv_id"),
        F.col("turn_idx"),
        F.lit("turn_idx").alias("column"),
        F.col("turn_idx").cast("string").alias("observed"),
        F.lit("0").alias("expected"),
    )
    return gaps.unionByName(starts)
