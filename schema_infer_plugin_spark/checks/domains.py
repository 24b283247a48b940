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


def infer_domain(
    df: DataFrame,
    column: str,
    coverage: float = 0.99,
    max_values: int = 20,
) -> DataFrame:
    """INFER a validation domain from the data — the reference's
    inference-first philosophy applied to constraints: the suggested domain
    is the most-frequent values whose cumulative share of non-null rows
    reaches ``coverage`` (a value is in-domain iff the mass BEFORE it is
    still below the bar), capped at ``max_values``. Feed the accepted rows
    straight into :func:`domain_violations` as a catalog-backed domain.

    Plan: one hash agg on the column (partial-agg bounded), then
    ``orderBy(count desc).limit(max_values)`` — a distributed TakeOrdered,
    NOT a global window, so a high-cardinality column never funnels its
    distinct values through one task. The cumulative window runs over the
    ≤ max_values survivors only (driver-scale). Ties break by value for
    determinism. Shares are exact IEEE doubles (identical in the oracle);
    displayed rounded.

    Output: (value, cnt, share, cum_share, in_domain), ordered cnt desc.
    """
    nn = df.filter(F.col(column).isNotNull()).select(
        F.col(column).cast("string").alias("value")
    )
    total = nn.agg(F.count(F.lit(1)).alias("_total"))
    counts = nn.groupBy("value").agg(F.count(F.lit(1)).alias("cnt"))
    top = counts.orderBy(F.desc("cnt"), F.asc("value")).limit(max_values)
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    w = (
        Window.orderBy(F.desc("cnt"), F.asc("value"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    share = F.col("cnt") / F.col("_total")
    cum = F.sum("cnt").over(w) / F.col("_total")
    return (
        top.crossJoin(broadcast(total))
        .select(
            "value",
            "cnt",
            F.round(share, 6).cast("double").alias("share"),
            F.round(cum, 6).cast("double").alias("cum_share"),
            ((cum - share) < coverage).alias("in_domain"),
        )
    )


def inferred_domain_values(
    df: DataFrame,
    column: str,
    coverage: float = 0.999,
    max_values: int = 20,
) -> list[str]:
    """Accepted domain (sorted list) from :func:`infer_domain` — the bounded
    driver collect is ≤ ``max_values`` rows BY CONSTRUCTION (the plan limits
    before collecting), so this is index-construction-sized like
    datapipe/ann.ivf_centroids, not a table collect."""
    rows = (
        infer_domain(df, column, coverage, max_values)
        .filter(F.col("in_domain"))
        .collect()
    )
    return sorted(r["value"] for r in rows)
