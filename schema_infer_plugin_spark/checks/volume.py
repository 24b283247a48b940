"""Ingest-volume anomaly detection: days whose row count breaks from the
trailing window — the check that catches a broken producer (volume collapse)
or a replay storm (spike) before any row-level rule would.

Plan shape: the table collapses to ONE row per day in a single hash
aggregation (map-side combined — the only full-table work), and the trailing
statistics run over that day-count frame, which has #days rows no matter the
table size. Variance is computed from explicit sum/sum-of-squares over the
ROWS frame — integer sums then one double expression — so the result is
bit-identical in the DuckDB oracle (the engines' stddev aggregates merge in
different orders and disagree in the last bits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def daily_volume_anomalies(
    df: DataFrame,
    ts_col: str = "ts",
    trailing_days: int = 7,
    k: float = 3.0,
    min_history: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """One row per day with trailing-window statistics and an anomaly verdict.

    A day is anomalous when its count deviates from the TRAILING
    ``trailing_days`` days' mean by more than ``k`` sample standard
    deviations (the current day is excluded from its own baseline — a spike
    must not mask itself). Days with fewer than ``min_history`` trailing
    days, or zero variance in the window, are never flagged (insufficient
    evidence, not an anomaly).

    Output: (day date, n_rows, base_mean, base_std, z, is_anomaly).
    """
    day = F.to_date(F.col(ts_col).cast("timestamp"))
    daily = df.select(day.alias("day")).groupBy("day").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    w = (
        Window.orderBy("day")
        .rowsBetween(-trailing_days, -1)
    )
    cnt = F.count(F.lit(1)).over(w)
    s = F.sum("n_rows").over(w).cast("double")
    sq = F.sum(F.col("n_rows") * F.col("n_rows")).over(w).cast("double")
    mean = s / cnt
    # sample variance from raw sums: (Σx² − (Σx)²/n) / (n−1)
    var = F.when(cnt > 1, (sq - s * s / cnt) / (cnt - 1)).otherwise(F.lit(None))
    std = F.sqrt(var)
    z = F.when(std > 0, (F.col("n_rows") - mean) / std)
    return daily.select(
        "day",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.round(mean, round_digits).cast("double").alias("base_mean"),
        F.round(std, round_digits).cast("double").alias("base_std"),
        F.round(z, round_digits).cast("double").alias("z"),
        (
            (cnt >= min_history) & std.isNotNull() & (std > 0) & (F.abs(z) > k)
        ).alias("is_anomaly"),
    )
