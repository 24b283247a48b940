"""Embedding-space drift: centroid shift between two slices of a vector
column.

The numeric-column drift checks (PSI/KL/KS/W1) are per-scalar; an embedding
column drifts as a *vector* — e.g. an upstream encoder version bump moves the
whole corpus in embedding space while every per-dimension histogram barely
changes. The cheapest distributional summary that catches this is the
centroid: compare mean vectors of two slices (two snapshots, two sources,
train vs val) by cosine and L2.

Plan shape: ONE ``posexplode`` fan-out (per-row width = dim, not a join) into
a hash aggregation keyed by dimension index — cardinality dim, so partial
(map-side) aggregation reduces each task to ≤ dim rows regardless of table
size — then one tiny aggregate over the dim-row frame. Both slices ride the
SAME scan via conditional aggregation (``avg(when(side, x))``); no self-join,
no collect, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def centroid_drift(
    df: DataFrame,
    vec_col: str,
    side_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Centroid cosine / L2 shift between the ``side_col`` = true and = false
    slices of ``vec_col``.

    Rows with NULL vectors or NULL side are excluded. Output, one row:
    (n_a long, n_b long, dim int, cosine double, l2_shift double) — cosine of
    the two mean vectors (NULL when either slice is empty or has a zero
    centroid) and the Euclidean distance between them. All doubles are
    rounded to ``round_digits`` (the engines' partial sums merge in different
    orders; see module docstring of checks/entropy.py).
    """
    exploded = (
        df.filter(F.col(side_col).isNotNull())
        .select(F.col(side_col).alias("grp"), F.posexplode(F.col(vec_col)))
        .select("grp", F.col("pos"), F.col("col").cast("double").alias("x"))
    )
    per_dim = exploded.groupBy("pos").agg(
        F.avg(F.when(F.col("grp"), F.col("x"))).alias("ma"),
        F.avg(F.when(~F.col("grp"), F.col("x"))).alias("mb"),
        F.count(F.when(F.col("grp"), F.lit(1))).alias("ca"),
        F.count(F.when(~F.col("grp"), F.lit(1))).alias("cb"),
    )
    dot = F.sum(F.col("ma") * F.col("mb"))
    na2 = F.sum(F.col("ma") * F.col("ma"))
    nb2 = F.sum(F.col("mb") * F.col("mb"))
    cosine = F.try_divide(dot, F.sqrt(na2) * F.sqrt(nb2))
    l2 = F.sqrt(F.sum((F.col("ma") - F.col("mb")) * (F.col("ma") - F.col("mb"))))
    return per_dim.agg(
        F.max("ca").cast("long").alias("n_a"),
        F.max("cb").cast("long").alias("n_b"),
        F.count(F.lit(1)).cast("int").alias("dim"),
        (F.round(cosine, round_digits) + F.lit(0.0)).cast("double").alias("cosine"),
        (F.round(l2, round_digits) + F.lit(0.0)).cast("double").alias("l2_shift"),
    )
