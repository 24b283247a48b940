"""User-declared expression constraints (the engine's open check surface).

The built-in checks cover the transcript invariants the reference implies
(nulls, domains, uniqueness, contiguity, …); production tables always grow
constraints nobody anticipated — "turn_idx under the product cap", "ts inside
the retention window", "text at least N chars". Instead of a new module per
rule, ``expr_suite_violations`` compiles a LIST of declarative rules — any
boolean Spark-SQL predicate — into ONE scan that emits rows in the standard
violation shape, so custom rules ride the same verdict/scorecard/triage
machinery as the built-ins (the Deequ-style check API, re-expressed as a
single Catalyst projection).

Plan shape: per row, an array of per-rule CASE structs is filtered to the
failing rules and exploded — one scan, ZERO exchanges, output rows ∝
violations (identical posture to plans/validate.py's fused pass, which this
deliberately does not touch: the fused plan's verdict grid is pinned; custom
rules are additive).

NULL semantics: a predicate that evaluates to NULL is a FAILURE, never a
silent pass (same posture as datapipe/text.quality_funnel) — an unevaluable
constraint is a data defect. Declare NULL-tolerant rules explicitly
(``x IS NULL OR x <= cap``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: rule tuple: (check_name, predicate, column, observed, expected_desc) —
#: predicate/observed accept a Column or a Spark-SQL string.
Rule = tuple[str, "Column | str", str, "Column | str", str]


def _as_col(x: "Column | str") -> Column:
    return F.expr(x) if isinstance(x, str) else x


def expr_suite_violations(
    df: DataFrame,
    rules: list[Rule],
    keys: tuple[str, str] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """One violation row per (row, failing rule), standard shape:
    (check_name, conv_id, turn_idx, column, observed, expected).

    ``observed`` is stringified with NULL rendered as ``'NULL'`` (the
    null-check convention), so the output schema is stable across rules of
    any type.
    """
    if not rules:
        raise ValueError("expr_suite_violations: rules must be non-empty")
    names = [r[0] for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"expr_suite_violations: duplicate check names: {names}")
    structs = []
    for name, pred, column, observed, expected in rules:
        failed = ~F.coalesce(_as_col(pred), F.lit(False))
        structs.append(
            F.when(
                failed,
                F.struct(
                    F.lit(name).alias("check_name"),
                    F.lit(column).alias("column"),
                    F.coalesce(_as_col(observed).cast("string"), F.lit("NULL")).alias(
                        "observed"
                    ),
                    F.lit(expected).alias("expected"),
                ),
            )
        )
    arr = F.filter(F.array(*structs), lambda x: x.isNotNull())
    fanned = df.select(
        *[F.col(k) for k in keys], F.explode(arr).alias("_v")
    )
    return fanned.select(
        F.col("_v.check_name").alias("check_name"),
        *[F.col(k) for k in keys],
        F.col("_v.column").alias("column"),
        F.col("_v.observed").alias("observed"),
        F.col("_v.expected").alias("expected"),
    )
