"""Null checks: row-level not-null violations.

The reference's nullability semantics live in the profile (nullable/required,
inference.py:359,386); this check is the row-level complement — emit a violation
per NULL in a column declared (or configured) non-null. Pure filter: pushed to
the scan (parquet/Iceberg null-count stats even let whole row groups skip).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def null_violations(df: DataFrame, column: str) -> DataFrame:
    return df.filter(F.col(column).isNull()).select(
        F.lit(f"not_null_{column}").alias("check_name"),
        F.col("conv_id"),
        F.col("turn_idx"),
        F.lit(column).alias("column"),
        F.lit("NULL").alias("observed"),
        F.lit("NOT NULL").alias("expected"),
    )
