"""Conversation boundary-role validation.

A transcript is not just a bag of valid turns — it has a shape: a
conversation should OPEN with a user or system turn (an assistant speaking
first means a lost prompt upstream) and CLOSE with an assistant or tool turn
(ending on a user turn is a dangling question — the tail of the conversation
was truncated in ingest). Neither defect is visible to any per-turn check:
every row can individually pass nulls/domains/contiguity while the
conversation as a whole is broken. This is the conversation-level analog of
the reference's per-message validity ladder (core/inferrer.py:199-261).

Plan shape: two row_numbers (ascending + descending) over ONE window
partitioning on conv_id — a single exchange (ZERO over a conv_id-bucketed
table, same argument as plans/validate.py), then a pure filter. Ordering is
the engine's stable turn order (turn_idx, ts NULLS FIRST, role) — the
role tie-breaker makes the boundary turn deterministic on full duplicate
rows in both engines (the role_transition_matrix invariant).

NULL semantics: a NULL boundary role FAILS membership (quality_funnel
posture — an unevaluable constraint is a data defect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from schema_infer_plugin_spark.schema import well_keyed

DEFAULT_FIRST_ROLES = ("user", "system")
DEFAULT_LAST_ROLES = ("assistant", "tool")


def conv_boundary_violations(
    df: DataFrame,
    allowed_first: tuple[str, ...] = DEFAULT_FIRST_ROLES,
    allowed_last: tuple[str, ...] = DEFAULT_LAST_ROLES,
) -> DataFrame:
    """Standard violation rows for conversations whose first / last turn has
    a role outside the allowed sets:
    (check_name ∈ {conv_start_role, conv_end_role}, conv_id, turn_idx,
    column='role', observed, expected).
    """
    if not allowed_first or not allowed_last:
        raise ValueError("conv_boundary_violations: role sets must be non-empty")
    order = [
        F.col("turn_idx").asc(),
        F.col("ts").asc_nulls_first(),
        F.col("role").asc(),
    ]
    w_asc = Window.partitionBy("conv_id").orderBy(*order)
    # the descending twin must keep NULL ts FIRST in the ascending sense,
    # i.e. LAST when descending
    w_desc = Window.partitionBy("conv_id").orderBy(
        F.col("turn_idx").desc(),
        F.col("ts").desc_nulls_last(),
        F.col("role").desc(),
    )
    # NULL-key rows are outside every conversation (engine-wide posture,
    # plans/validate.py): they can be neither its opener nor its closer
    marked = well_keyed(df).select(
        "conv_id",
        "turn_idx",
        "role",
        F.row_number().over(w_asc).alias("rn_first"),
        F.row_number().over(w_desc).alias("rn_last"),
    )
    in_set = lambda vals: F.coalesce(F.col("role").isin(*vals), F.lit(False))  # noqa: E731
    first_bad = (F.col("rn_first") == 1) & ~in_set(allowed_first)
    last_bad = (F.col("rn_last") == 1) & ~in_set(allowed_last)
    fmt = lambda vals: "in {" + ",".join(sorted(vals)) + "}"  # noqa: E731
    viols = marked.select(
        "conv_id",
        "turn_idx",
        "role",
        F.filter(
            F.array(
                F.when(
                    first_bad,
                    F.struct(
                        F.lit("conv_start_role").alias("check_name"),
                        F.lit(fmt(allowed_first)).alias("expected"),
                    ),
                ),
                F.when(
                    last_bad,
                    F.struct(
                        F.lit("conv_end_role").alias("check_name"),
                        F.lit(fmt(allowed_last)).alias("expected"),
                    ),
                ),
            ),
            lambda s: s.isNotNull(),
        ).alias("fails"),
    ).filter(F.size("fails") > 0)
    return viols.select(
        F.explode("fails").alias("v"),
        "conv_id",
        "turn_idx",
        "role",
    ).select(
        F.col("v.check_name").alias("check_name"),
        "conv_id",
        "turn_idx",
        F.lit("role").alias("column"),
        F.coalesce(F.col("role"), F.lit("NULL")).alias("observed"),
        F.col("v.expected").alias("expected"),
    )
