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


def role_transition_matrix(df: DataFrame) -> DataFrame:
    """Counts and rates of adjacent-turn (prev_role → role) transitions —
    the DISTRIBUTIONAL companion to :func:`role_alternation_violations`:
    instead of emitting only the forbidden repeats, it profiles the whole
    transition structure (user→assistant share, tool-chain lengths showing up
    as tool→tool mass, conversation openers under prev_role NULL), which is
    what a drift check compares across ingest batches.

    Ordering is the engine's stable turn order (turn_idx, ts NULLS FIRST)
    plus role as a final tie-breaker so lag() is deterministic even on full
    (turn_idx, ts) duplicate rows — both engines sort identically with NULLS
    FIRST pinned explicitly.

    Plan: one lag window over the conv_id exchange (zero exchanges over a
    conv_id-bucketed table) → one hash agg on (prev_role, role). The rate
    denominator is a window over the AGGREGATED matrix — bounded by
    |role domain|², a few dozen rows, so the unpartitioned window is safe
    here (the "never over unbounded rows" invariant targets row-scale data).

    Output: (prev_role, role, n bigint, rate double) — rate = n / Σn,
    rounded to 6 decimals. prev_role is NULL for each conversation's first
    turn in the stable order.
    """
    w = Window.partitionBy("conv_id").orderBy(
        F.col("turn_idx").asc(),
        F.col("ts").asc_nulls_first(),
        F.col("role").asc_nulls_first(),
    )
    matrix = (
        df.select(F.lag("role").over(w).alias("prev_role"), F.col("role"))
        .groupBy("prev_role", "role")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = Window.partitionBy(F.lit(1))
    return matrix.select(
        "prev_role",
        "role",
        "n",
        F.round(F.col("n") / F.sum("n").over(total), 6).cast("double").alias("rate"),
    )


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
