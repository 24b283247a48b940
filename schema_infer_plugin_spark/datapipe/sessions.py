"""Gap-based sessionization of event streams.

Groups each key's events into sessions wherever the gap to the previous event
exceeds a threshold — the standard construction for turning raw interaction
logs (or agent-transcript event feeds) into conversation-shaped units before
per-session feature extraction or sequence packing.

Generalizes the reference's per-topic message grouping (it consumes whole
topics as unordered record bags — /root/reference/schema_infer/consumers/
sampling.py samples without any notion of a session) into a time-aware
operator the reference has no analog for.

Design for 100 TB: ONE shuffle — the window partitionBy(key). The session
index is a running sum over the already-sorted partition (no second exchange);
``session_stats`` aggregates on (key, session_idx), which hash-partitions on a
superset of the window key, and its partial aggregation means the extra
exchange carries one row per session, not per event. All gap math is integer
microseconds (``unix_micros``) — identical in the DuckDB oracle (epoch_us),
immune to timestamp-rendering differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Assign a 0-based ``session_idx`` per key: a new session starts at the
    key's first event and whenever the gap since the previous event exceeds
    ``gap_seconds``.

    ``order_cols`` break timestamp ties (pass the event id) so the assignment
    is deterministic at any parallelism. Adds ``ts_us`` (event time in integer
    microseconds) and ``session_idx`` to the input columns.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(key_col).orderBy(*order)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    new_session = (
        (ts_us - F.lag(ts_us).over(w)).isNull()
        | ((ts_us - F.lag(ts_us).over(w)) > gap_seconds * 1_000_000)
    ).cast("int")
    return df.withColumn("ts_us", ts_us).withColumn(
        "session_idx",
        (F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1).cast(
            "int"
        ),
    )


def session_stats(
    sessionized: DataFrame,
    key_col: str,
    count_distinct_col: str | None = None,
) -> DataFrame:
    """One row per (key, session_idx): event count, span in integer
    microseconds, and optionally the distinct count of ``count_distinct_col``
    (e.g. event_type). Input must come from :func:`sessionize` (needs
    ``ts_us`` / ``session_idx``)."""
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
    ]
    if count_distinct_col is not None:
        aggs.append(F.count_distinct(F.col(count_distinct_col)).alias("n_distinct"))
    return sessionized.groupBy(key_col, "session_idx").agg(*aggs)
