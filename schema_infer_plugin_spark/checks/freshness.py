"""Freshness (staleness-lag) and calendar-coverage checks.

The two table-level liveness questions a validation engine answers before any
row-level rule is worth running: *is the newest data recent enough?* (a stuck
producer shows up as a growing lag long before volumes go to zero) and *are
there holes in the timeline?* (a backfill that skipped a day passes every
row-level check — only the calendar knows).

Reference parity: the reference's emptiness/offset probes
(/root/reference/schema_infer/plugin/optimistic.py:440-486) answer "is there
any data at all" per topic; these checks generalize that to per-group lag
SLAs and per-bucket timeline coverage over the full table.

Plan shapes (both 100 TB-safe):

* :func:`freshness` — ONE hash aggregation (map-side combined) to a row per
  group; everything after operates on the bounded group frame.
* :func:`coverage_gaps` — the table collapses to per-bucket counts in one
  aggregation (the only full-table work); gaps fall out of ONE ``lead``
  window over that bounded bucket frame (#buckets rows — the time span in
  units, not the row count), so the input is scanned exactly once and there
  is no join at all. No driver collect anywhere.

Timestamps are compared via ``unix_micros`` (CLAUDE invariant: the engines
disagree on trailing-zero microsecond rendering, never on the integer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast

#: seconds per supported coverage granularity
_UNIT_SECONDS = {"hour": 3600, "day": 86400}


def freshness(
    df: DataFrame,
    ts_col: str = "ts",
    as_of: str = "2024-02-15 00:00:00",
    max_lag_hours: float = 24.0,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group staleness lag vs a deterministic ``as_of`` instant.

    ``as_of`` is an explicit parameter, never ``current_timestamp()`` — the
    check must be reproducible (and oracle-checkable) across engines and
    re-runs; a scheduler passes the batch's logical time.

    Output, one row per group (or one row total when ``group_cols`` is None):
    (group cols..., n_rows, max_ts_us, lag_us, passed). ``lag_us`` is
    ``as_of − max(ts)`` in microseconds; a group whose newest row is *ahead*
    of ``as_of`` has a negative lag and trivially passes. Groups arriving
    only via NULL timestamps get NULL lag and fail (no evidence of life).
    """
    keys = list(group_cols or [])
    as_of_us = F.unix_micros(F.lit(as_of).cast("timestamp"))
    lag_us = as_of_us - F.col("max_ts_us")
    max_lag_us = int(max_lag_hours * 3_600_000_000)
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.max(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias("max_ts_us"),
    )
    return agg.select(
        *keys,
        "n_rows",
        "max_ts_us",
        lag_us.cast("long").alias("lag_us"),
        F.coalesce(lag_us <= F.lit(max_lag_us), F.lit(False)).alias("passed"),
    )


def coverage_gaps(
    df: DataFrame,
    ts_col: str = "ts",
    unit: str = "hour",
    max_gap_buckets: int | None = 100_000,
) -> DataFrame:
    """Time buckets between the table's min and max that contain ZERO rows.

    ``unit`` is ``"hour"`` or ``"day"``. Buckets are epoch-aligned
    (``floor(epoch / unit_seconds)``) so the bucketing is pure integer math —
    identical in every engine and timezone-free (the session is UTC).

    Output: (bucket_start timestamp, bucket_idx long, truncated boolean) per
    empty bucket, empty when the timeline is fully covered. A gap between two
    consecutive OBSERVED buckets ``(i, j)`` with ``j − i > 1`` expands to the
    missing buckets ``i+1 .. j−1`` via ``sequence`` — per-gap work
    proportional to the gap's length; a 10^12-row table spanning two years is
    ~17k hourly buckets total, so the post-aggregation frame is always tiny.

    ``max_gap_buckets`` bounds that expansion (guarded BY DEFAULT, like the
    dedup skew guards): one corrupted sentinel timestamp — an epoch-0 default
    or a year-9999 placeholder amid 2024 data — would otherwise make a single
    gap materialize an array of millions of elements (hundreds of MB before
    the explode) and risk an executor OOM on exactly the dirty tables a
    validation engine is pointed at. A gap longer than the cap emits its first
    ``max_gap_buckets`` missing buckets with ``truncated = true`` so the
    verdict stays visible without the unbounded fan-out. Pass ``None`` as the
    explicit opt-out to expand every gap in full (all ``truncated = false``).
    """
    if unit not in _UNIT_SECONDS:
        raise ValueError(f"coverage_gaps: unit must be one of {sorted(_UNIT_SECONDS)}")
    if max_gap_buckets is not None and max_gap_buckets < 1:
        raise ValueError("coverage_gaps: max_gap_buckets must be >= 1 or None")
    from pyspark.sql import Window

    step = _UNIT_SECONDS[unit]
    bucket = F.floor(F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(step * 1_000_000))
    observed = (
        df.filter(F.col(ts_col).isNotNull())
        .select(bucket.alias("bucket_idx"))
        .groupBy("bucket_idx")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # one ordered window over the bounded bucket frame (same boundedness
    # argument as checks/ksdrift.py's CDF window)
    nxt = F.lead("bucket_idx", 1).over(Window.orderBy("bucket_idx"))
    gap_end = F.col("nxt") - 1
    if max_gap_buckets is not None:
        gap_end = F.least(gap_end, F.col("bucket_idx") + max_gap_buckets)
    truncated = (
        (F.col("nxt") - F.col("bucket_idx") - 1 > F.lit(max_gap_buckets))
        if max_gap_buckets is not None
        else F.lit(False)
    )
    return (
        observed.select("bucket_idx", nxt.alias("nxt"))
        .filter(F.col("nxt") - F.col("bucket_idx") > 1)
        .select(
            truncated.alias("truncated"),
            F.explode(F.sequence(F.col("bucket_idx") + 1, gap_end)).alias("bucket_idx"),
        )
        .select(
            F.timestamp_micros(F.col("bucket_idx") * step * 1_000_000).alias(
                "bucket_start"
            ),
            F.col("bucket_idx").cast("long").alias("bucket_idx"),
            "truncated",
        )
    )
