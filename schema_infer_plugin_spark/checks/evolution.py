"""Distributed schema-evolution compatibility verdicts between two inferred
profiles.

The registry sink already enforces Avro-style compatibility on *write*
(operators/registry.py:83-131, mirroring the reference's registry client,
/root/reference/schema_infer/registry.py), and the runner applies the same
rules between two persisted runs' profiles via bounded collected rows
(plans/runner.run_schema_evolution). This module is the fully-distributed
DataFrame form of the same rules — no collect at all, so it composes inside
larger plans and joins. This check runs the same rules as
a *data* check: infer the reference type ladder over two slices of a table —
two snapshots, old vs new producer, yesterday vs today — and report, per
column, whether the new slice's inferred schema still reads as the old one
(BACKWARD), writes for it (FORWARD), or both (FULL). It catches the drift
the registry never sees: producers that bypass registration, or a column
whose VALUES migrated type (int ids that started arriving as floats) without
any declared schema change.

Compatibility semantics (identical to operators/registry.evolution_issues):

* BACKWARD broken by: a new column that is required and not nullable (data
  written with the old schema has no value for it), or a kept column whose
  old→new type is not readable (readable = equal, or int→float promotion —
  registry.py:50-51).
* FORWARD broken by: a removed column that was required and not nullable, or
  a kept column whose new→old type is not readable.

Plan shape: the only full-table work is the two ``type_profile`` wide
aggregations (ONE scan each — exactly the profile operator's shape); the
verdict logic is a full-outer join of the two ≤|columns|-row profile frames,
pure codegen CASE logic, no UDF, no extra shuffle of table rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from schema_infer_plugin_spark.operators.profile import type_profile


def _readable(old_t: F.Column, new_t: F.Column) -> F.Column:
    """SQL mirror of operators/registry._readable for the flat ladder types
    (boolean | int | float | string | union): equal, or int→float."""
    return (old_t == new_t) | ((old_t == F.lit("int")) & (new_t == F.lit("float")))


def evolution_verdicts(
    old_profile: DataFrame,
    new_profile: DataFrame,
) -> DataFrame:
    """Per-column compatibility verdicts between two ``type_profile`` frames.

    Inputs are ``operators/profile.type_profile`` outputs (columns ``column``,
    ``inferred_type``, ``nullable``, ``required`` — extra columns ignored).

    Output, one row per column present in either profile:
    (col_name, status added|removed|kept, old_type, new_type,
    backward_ok, forward_ok, compatible_full, issue) — ``issue`` names the
    blocking rule (field_added_required | field_removed_required |
    type_changed) or NULL when fully compatible, matching
    ``operators/registry.EvolutionIssue.kind``.
    """
    o = old_profile.select(
        F.col("column").alias("col_name"),
        F.col("inferred_type").alias("old_type"),
        F.col("nullable").alias("old_nullable"),
        F.col("required").alias("old_required"),
    )
    n = new_profile.select(
        F.col("column").alias("col_name"),
        F.col("inferred_type").alias("new_type"),
        F.col("nullable").alias("new_nullable"),
        F.col("required").alias("new_required"),
    )
    j = o.join(n, "col_name", "full_outer")
    status = (
        F.when(F.col("old_type").isNull(), F.lit("added"))
        .when(F.col("new_type").isNull(), F.lit("removed"))
        .otherwise(F.lit("kept"))
    )
    backward_ok = (
        F.when(
            status == "added",
            ~(F.col("new_required") & ~F.col("new_nullable")),
        )
        .when(status == "removed", F.lit(True))
        .otherwise(_readable(F.col("old_type"), F.col("new_type")))
    )
    forward_ok = (
        F.when(
            status == "removed",
            ~(F.col("old_required") & ~F.col("old_nullable")),
        )
        .when(status == "added", F.lit(True))
        .otherwise(_readable(F.col("new_type"), F.col("old_type")))
    )
    issue = (
        F.when((status == "added") & ~backward_ok, F.lit("field_added_required"))
        .when((status == "removed") & ~forward_ok, F.lit("field_removed_required"))
        .when((status == "kept") & ~(backward_ok & forward_ok), F.lit("type_changed"))
        .otherwise(F.lit(None).cast("string"))
    )
    return j.select(
        "col_name",
        status.alias("status"),
        "old_type",
        "new_type",
        backward_ok.alias("backward_ok"),
        forward_ok.alias("forward_ok"),
        (backward_ok & forward_ok).alias("compatible_full"),
        issue.alias("issue"),
    )


def schema_evolution_check(
    old_df: DataFrame,
    new_df: DataFrame,
    old_columns: list[str] | None = None,
    new_columns: list[str] | None = None,
) -> DataFrame:
    """Infer the type ladder over two table slices and diff the schemas —
    see :func:`evolution_verdicts` for the output contract."""
    return evolution_verdicts(
        type_profile(old_df, columns=old_columns),
        type_profile(new_df, columns=new_columns),
    )
