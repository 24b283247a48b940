"""Deterministic hash sampling (the reference's sampling strategies, made scale-sane).

The reference samples topics by seeking offsets: tail reads, begin/⅓/⅔/end
strata, mid-offset probes (/root/reference/schema_infer/plugin/optimistic.py:
605-692, 1029-1146). Those are *position*-based and irreproducible across runs.
The engine's analog is **content-hash sampling**: a row is in the sample iff the
first ``width`` hex chars of ``md5(key)`` fall below a threshold — a pure
map-side predicate (pushes to the scan, no shuffle, no RNG state) that is:

* deterministic and partition-invariant (same sample at any parallelism);
* consistent across engines (md5 hex is identical in Spark and DuckDB, so the
  sample itself is oracle-checkable — unlike TABLESAMPLE/rand());
* stratifiable: sample within groups by hashing (group, key) pairs.

Rate resolution is 16^-width (width=2 → 1/256 granularity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hash_bucket(cols: list[Column], width: int = 2) -> Column:
    """First ``width`` hex chars of md5 over ':'-joined key columns."""
    return F.substring(F.md5(F.concat_ws(":", *cols)), 1, width)


def deterministic_sample(
    df: DataFrame,
    key_cols: list[str],
    rate_num: int,
    width: int = 2,
) -> DataFrame:
    """Keep rows whose hash bucket < rate_num (of 16**width buckets) —
    expected fraction rate_num / 16**width."""
    threshold = format(rate_num, f"0{width}x")
    return df.filter(
        hash_bucket([F.col(c) for c in key_cols], width) < F.lit(threshold)
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key_cols: list[str],
    rate_num: int,
    width: int = 2,
) -> DataFrame:
    """Per-stratum deterministic sample: hashing (stratum, key) decorrelates
    the sample across strata — every stratum gets ~rate coverage even when row
    counts are wildly skewed (the reference's begin/⅓/⅔/end intent)."""
    threshold = format(rate_num, f"0{width}x")
    cols = [F.col(stratum_col)] + [F.col(c) for c in key_cols]
    return df.filter(hash_bucket(cols, width) < F.lit(threshold))
