"""Domain membership: role/tool values must come from declared domains.

Generalizes the reference's include/exclude topic filtering
(/root/reference/schema_infer/core/discovery.py:29-61) into value-domain
validation. Plan: **broadcast left-anti join** against the domain table — the
domain side is tiny by construction, so the anti join is a map-side hash probe
with zero shuffle of the big table (the canonical shape for "IN (small set)"
at 100 TB; for literal domains Catalyst folds the broadcast to the same thing
an isin() would produce, but the join form also covers catalog-backed domains).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast


def domain_violations(
    df: DataFrame,
    column: str,
    domain: list[str] | DataFrame,
    check_name: str | None = None,
) -> DataFrame:
    """Violation rows for non-null ``column`` values outside ``domain``."""
    spark = df.sparkSession
    if isinstance(domain, list):
        dom_df = spark.createDataFrame([(v,) for v in domain], [column])
        expected = ",".join(domain)
    else:
        dom_df = domain.toDF(column)
        expected = "<domain table>"
    check = check_name or f"domain_{column}"
    return (
        df.filter(F.col(column).isNotNull())
        .join(broadcast(dom_df), on=column, how="left_anti")
        .select(
            F.lit(check).alias("check_name"),
            F.col("conv_id"),
            F.col("turn_idx"),
            F.lit(column).alias("column"),
            F.col(column).cast("string").alias("observed"),
            F.lit(expected).alias("expected"),
        )
    )


def tool_requires_role_violations(df: DataFrame, tool_role: str = "tool") -> DataFrame:
    """Cross-column rule: ``tool`` may only be set on rows whose role is 'tool'.

    Pure filter — pushed to the scan, no shuffle at all.
    """
    return df.filter(
        F.col("tool").isNotNull() & (F.coalesce(F.col("role"), F.lit("")) != tool_role)
    ).select(
        F.lit("tool_without_role").alias("check_name"),
        F.col("conv_id"),
        F.col("turn_idx"),
        F.lit("tool").alias("column"),
        F.col("tool").cast("string").alias("observed"),
        F.lit("NULL unless role=tool").alias("expected"),
    )
