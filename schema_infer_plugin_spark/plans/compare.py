"""Profile comparison — schema-evolution verdicts computed on DATA, not DDL.

The reference enforces schema compatibility on *declared* schemas at registry
time (operators/registry.py replicates it). This is the same idea applied one
level down: compare two runs' column profiles (operators/profile.py long
format) and classify every column's drift as OK / WARN / BREAKING — the check
a continuously-validated table needs between snapshots ("did the upstream
producer change what it writes?").

Rules (deterministic, documented — severity BREAKING > WARN > OK):

* column present in baseline but not current        → BREAKING (removed)
* inferred type narrowed / changed incomparably     → BREAKING
  (widening ladder boolean < int < float < string==union; any move DOWN the
  ladder, or between unranked types, breaks readers of the old contract)
* baseline had zero nulls but current has some      → BREAKING
  (an implicit NOT NULL contract was broken)
* column new in current                             → WARN (added)
* inferred type widened (up the ladder)             → WARN
* null_rate rose by more than ``null_rate_warn``    → WARN
* distinct count ratio outside [1/r, r]             → WARN
* otherwise                                         → OK

Plan shape: a full-outer join of two profile frames — both sides are one row
per (partition_key, column), i.e. tiny regardless of table size (the heavy
scan already happened inside ``profile``); every verdict is plain column math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: widening ladder; union counts as string (it IS the "anything" type)
_TYPE_RANK = {"boolean": 0, "int": 1, "float": 2, "string": 3, "union": 3}


def _rank(c: F.Column) -> F.Column:
    expr = F.lit(None).cast("int")
    for name, r in _TYPE_RANK.items():
        expr = F.when(c == name, F.lit(r)).otherwise(expr)
    return expr


def profile_compare(
    current: DataFrame,
    baseline: DataFrame,
    null_rate_warn: float = 0.01,
    distinct_ratio_warn: float = 2.0,
) -> DataFrame:
    """Join two ``profile()`` outputs and emit one verdict row per column.

    Output: (partition_key, col_name, status, type_base, type_cur,
    type_change, null_rate_base, null_rate_cur, null_rate_delta,
    distinct_base, distinct_cur, verdict) — ``status`` in
    {added, removed, common}; ``type_change`` in
    {same, widened, narrowed, changed} (NULL for added/removed).
    """

    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.col("partition_key"),
            F.col("column").alias("col_name"),
            F.col("inferred_type").alias(f"type_{tag}"),
            F.round(F.col("null_rate"), 6).cast("double").alias(f"null_rate_{tag}"),
            F.col("null_count").alias(f"null_count_{tag}"),
            F.col("distinct_approx").alias(f"distinct_{tag}"),
        )

    j = side(current, "cur").join(
        side(baseline, "base"), on=["partition_key", "col_name"], how="full_outer"
    )

    status = (
        F.when(F.col("type_base").isNull(), F.lit("added"))
        .when(F.col("type_cur").isNull(), F.lit("removed"))
        .otherwise(F.lit("common"))
    )
    rb, rc = _rank(F.col("type_base")), _rank(F.col("type_cur"))
    type_change = F.when(status != "common", F.lit(None).cast("string")).otherwise(
        F.when(F.col("type_base") == F.col("type_cur"), F.lit("same"))
        .when(rb.isNull() | rc.isNull(), F.lit("changed"))
        .when(rc > rb, F.lit("widened"))
        .otherwise(F.lit("narrowed"))
    )
    null_delta = F.when(
        status == "common",
        F.round(F.col("null_rate_cur") - F.col("null_rate_base"), 6).cast("double"),
    )
    ratio_bad = (
        (F.col("distinct_base") > 0)
        & (F.col("distinct_cur") > 0)
        & (
            (F.col("distinct_cur") > F.col("distinct_base") * distinct_ratio_warn)
            | (F.col("distinct_base") > F.col("distinct_cur") * distinct_ratio_warn)
        )
    )
    verdict = (
        F.when(status == "removed", F.lit("BREAKING"))
        .when(type_change.isin("narrowed", "changed"), F.lit("BREAKING"))
        .when(
            (status == "common")
            & (F.col("null_count_base") == 0)
            & (F.col("null_count_cur") > 0),
            F.lit("BREAKING"),
        )
        .when(status == "added", F.lit("WARN"))
        .when(type_change == "widened", F.lit("WARN"))
        .when(null_delta > null_rate_warn, F.lit("WARN"))
        .when((status == "common") & ratio_bad, F.lit("WARN"))
        .otherwise(F.lit("OK"))
    )
    return j.select(
        "partition_key",
        "col_name",
        status.alias("status"),
        "type_base",
        "type_cur",
        type_change.alias("type_change"),
        "null_rate_base",
        "null_rate_cur",
        null_delta.alias("null_rate_delta"),
        "distinct_base",
        "distinct_cur",
        verdict.alias("verdict"),
    )
