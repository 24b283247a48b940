"""Functional-dependency check: determinant columns → dependent column.

A constraint family the reference's per-record validators cannot express at
all (schema-infer validates one message at a time —
/root/reference/schema_infer/schemas/inference.py): an FD is a property of the
whole table. ``A → B`` holds iff every distinct value of ``A`` maps to at most
one non-null value of ``B``; violating keys are exactly the groups with two or
more distinct dependent values.

Plan shape: one hash aggregation on the determinant —
``scan → partial agg → exchange(determinant) → HAVING n_values > 1``. With
partial aggregation the shuffle carries one row per distinct determinant per
input partition, and the output is ∝ violations, so the check is a single
bounded pass no matter the table size. min/max of the dependent ride the same
aggregate as free witnesses of the conflict (no second scan, no collect_set —
the unbounded-aggregation invariant).

NULL dependent values are ignored (count_distinct semantics in both engines):
"key has a value and also NULL" is a completeness question for the null-rate
check, not a dependency conflict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def fd_violations(
    df: DataFrame,
    determinant_cols: list[str],
    dependent_col: str,
) -> DataFrame:
    """One row per determinant key violating ``determinant → dependent``.

    Output: (*determinant_cols, n_rows, n_values, <dep>_min, <dep>_max) —
    ``n_values`` is the distinct non-null dependent count (> 1 by
    construction), min/max are two concrete conflicting witnesses.
    """
    dep = F.col(dependent_col)
    return (
        df.groupBy(*determinant_cols)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(dep).alias("n_values"),
            F.min(dep).alias(f"{dependent_col}_min"),
            F.max(dep).alias(f"{dependent_col}_max"),
        )
        .filter(F.col("n_values") > 1)
    )
