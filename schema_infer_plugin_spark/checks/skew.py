"""Hot-key skew diagnosis: which keys would melt a shuffle, and how badly.

The north_rule demands skew handled EXPLICITLY; checks/salting.py is the
mitigation, this module is the measurement that decides when to apply it (and
with how many salts). One map-side-combinable ``groupBy(key).count()`` — the
only full-data pass — then a ``TakeOrdered`` top-N (no global sort shuffle:
Spark turns orderBy+limit into a per-partition top-N merge) and driver-size
column math over ≤ N rows. At 10^12 rows the plan is exactly one exchange on
the key plus an O(N) tail.

The reference has no analog (its unit of parallelism is the topic, never the
record — SURVEY.md §3.2); this is engine infrastructure for the skewed
conv_id hot spots the north_rule names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def hot_key_report(df: DataFrame, key_col: str, top_n: int = 20) -> DataFrame:
    """Top-``top_n`` hottest keys with their share of all rows.

    Output: (rank, key, cnt, share, cum_share) — rank 1 = hottest; ties break
    on the key value ascending so the report is deterministic at any
    parallelism. ``share``/``cum_share`` are fractions of the WHOLE table (not
    of the top-N), so ``cum_share`` directly answers "how much of the data do
    the N hottest keys hold" — the salting-decision number.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    top = counts.orderBy(F.col("cnt").desc(), F.col("key").asc()).limit(top_n)
    # rank + running share over the already-limited ≤ top_n rows: the
    # single-partition window is bounded by top_n, never by the table
    w = Window.orderBy(F.col("cnt").desc(), F.col("key").asc())
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        top.join(F.broadcast(total))
        .select(
            F.row_number().over(w).alias("rank"),
            "key",
            "cnt",
            F.round(F.col("cnt") / F.col("total"), 6).cast("double").alias("share"),
            F.round(F.sum("cnt").over(wcum) / F.col("total"), 6)
            .cast("double")
            .alias("cum_share"),
        )
    )


def group_size_stats(df: DataFrame, key_col: str) -> DataFrame:
    """One-row distribution summary of group sizes under ``key_col`` —
    skew factor = max/avg is the headline number (1 ≈ uniform; ≥ ~5 means the
    hottest key's reducer runs that many times longer than the average one).

    Same single exchange as :func:`hot_key_report`; the second aggregation
    runs over one row per key. Exact integer stats only (count/min/max/avg) —
    quantiles of group sizes belong to profile(), which sketches them.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(F.count(F.lit(1)).alias("cnt"))
    return counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.min("cnt").alias("min_size"),
        F.max("cnt").alias("max_size"),
        F.round(F.avg("cnt"), 6).cast("double").alias("avg_size"),
        F.round(F.max("cnt") / F.avg("cnt"), 6).cast("double").alias("skew_factor"),
    )
