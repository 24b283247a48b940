"""Per-partition checkpoint-resume ledger (north_rule: lineage + metrics).

The reference's closest analog is its retry ladder — when one read strategy
fails it falls back and re-reads from scratch (/root/reference/schema_infer/
plugin/optimistic.py:694-925). At 10^12 turns "re-read from scratch" is not an
option: the run is split into conversation-aligned hash buckets, each completed
bucket appends one ledger row (rows processed, violations found, wall time),
and a restarted run anti-joins the bucket list against the ledger to process
only what's left.

Format-agnostic: plain parquet append in-sandbox; the same rows land in a
Delta/Iceberg table in production (append is the only write mode used, so any
atomic-append table format works). Bucket counts are bounded (10^3–10^5 even at
10^12 rows), so collecting completed keys to the driver is a few MB at worst.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, Row, SparkSession, functions as F

from schema_infer_plugin_spark.schema import LEDGER_SCHEMA


def ledger_path(out_dir: str) -> str:
    # not "_ledger": Spark's file listing ignores underscore-prefixed paths
    return os.path.join(out_dir, "ledger")


def read_ledger(spark: SparkSession, out_dir: str) -> DataFrame:
    path = ledger_path(out_dir)
    try:
        return spark.read.schema(LEDGER_SCHEMA).parquet(path)
    except Exception:
        return spark.createDataFrame([], LEDGER_SCHEMA)


def completed_keys(spark: SparkSession, out_dir: str, run_id: str, pass_name: str) -> set[str]:
    led = read_ledger(spark, out_dir)
    rows = (
        led.filter((F.col("run_id") == run_id) & (F.col("pass_name") == pass_name))
        .select("partition_key")
        .distinct()
        .collect()
    )
    return {r["partition_key"] for r in rows}


def append_ledger(
    spark: SparkSession,
    out_dir: str,
    run_id: str,
    pass_name: str,
    bucket_metrics: list[tuple[str, int, int, float]],
) -> None:
    """Append one row per completed bucket: (key, rows, violations, wall_sec)."""
    now = time.time()
    rows = [
        Row(
            run_id=run_id,
            partition_key=key,
            pass_name=pass_name,
            rows_processed=int(nrows),
            violation_count=int(nviol),
            wall_sec=float(wall),
            completed_ts=__import__("datetime").datetime.fromtimestamp(
                now, __import__("datetime").timezone.utc
            ).replace(tzinfo=None),
        )
        for key, nrows, nviol, wall in bucket_metrics
    ]
    spark.createDataFrame(rows, LEDGER_SCHEMA).coalesce(1).write.mode("append").parquet(
        ledger_path(out_dir)
    )
