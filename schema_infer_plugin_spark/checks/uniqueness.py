"""Uniqueness of (conv_id, turn_idx).

Plan: ``groupBy(conv_id, turn_idx).count() HAVING count > 1`` — chosen over a
row_number window (SURVEY.md §2.6): a hash aggregation with map-side partial
counts shuffles only one row per *duplicated* key, while a window would shuffle
and sort every row of the table.

Scale: the grouping key is the table's primary key, so cardinality ≈ row count
and no single reducer is hot even when one conv_id is (the composite key spreads
a hot conversation across as many groups as it has turns). Partial aggregation
means shuffle bytes ∝ #duplicate keys, which is tiny by definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from schema_infer_plugin_spark.schema import well_keyed


def uniqueness_violations(df: DataFrame) -> DataFrame:
    """One violation row per duplicated (conv_id, turn_idx) key.

    Rows with a NULL conv_id or turn_idx are excluded: two keyless rows are
    not "the same key twice" — they are not_null_conv_id / not_null_turn_idx
    violations (checks/nulls.py), the engine-wide NULL-key posture
    (plans/validate.py)."""
    return (
        well_keyed(df)
        .groupBy("conv_id", "turn_idx")
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
        .select(
            F.lit("uniqueness").alias("check_name"),
            F.col("conv_id"),
            F.col("turn_idx"),
            F.lit("conv_id,turn_idx").alias("column"),
            F.col("dup_count").cast("string").alias("observed"),
            F.lit("1").alias("expected"),
        )
    )
