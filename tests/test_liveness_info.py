"""Micro-fixture tests for the liveness (freshness / coverage) and
information-theoretic (entropy / MI / W1 / centroid-drift) checks — known
inputs with hand-computed expected outputs. The cross-engine value checks run
separately in tests/test_checks.py via the driver oracle sweep."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from schema_infer_plugin_spark.checks.embedding_drift import centroid_drift
from schema_infer_plugin_spark.checks.entropy import (
    categorical_entropy,
    mutual_information,
)
from schema_infer_plugin_spark.checks.freshness import coverage_gaps, freshness
from schema_infer_plugin_spark.checks.ksdrift import wasserstein_statistic

HOUR_US = 3_600_000_000


# ---------------------------------------------------------------------------
# freshness
# ---------------------------------------------------------------------------


def test_freshness_lag_and_verdict(spark):
    df = spark.createDataFrame(
        [
            ("a", "2024-01-01 00:00:00"),
            ("a", "2024-01-01 12:00:00"),
            ("b", "2023-12-01 00:00:00"),
        ],
        "grp string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r["grp"]: r.asDict()
        for r in freshness(
            df, "ts", as_of="2024-01-02 00:00:00", max_lag_hours=24.0, group_cols=["grp"]
        ).collect()
    }
    assert out["a"]["lag_us"] == 12 * HOUR_US and out["a"]["passed"]
    assert out["b"]["lag_us"] == 32 * 24 * HOUR_US and not out["b"]["passed"]
    assert out["a"]["n_rows"] == 2


def test_freshness_null_ts_group_fails(spark):
    df = spark.createDataFrame([("a", None)], "grp string, ts timestamp")
    row = freshness(df, "ts", group_cols=["grp"]).collect()[0]
    assert row["lag_us"] is None and row["passed"] is False


def test_freshness_global_single_row(spark):
    df = spark.createDataFrame([("x", "2024-01-01 00:00:00")], "g string, ts string")
    rows = freshness(df, "ts", as_of="2024-01-01 01:00:00", max_lag_hours=2.0).collect()
    assert len(rows) == 1 and rows[0]["passed"] and rows[0]["lag_us"] == HOUR_US


# ---------------------------------------------------------------------------
# coverage gaps
# ---------------------------------------------------------------------------


def _hours_df(spark, hours):
    # hour h of 2024-01-01 (UTC session)
    return spark.createDataFrame(
        [(f"2024-01-01 {h:02d}:30:00",) for h in hours], "ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_coverage_gaps_finds_missing_hours(spark):
    df = _hours_df(spark, [0, 1, 4, 7])
    got = sorted(
        r["bucket_idx"] for r in coverage_gaps(df, "ts", unit="hour").collect()
    )
    base = df.select(
        F.min(F.floor(F.unix_micros("ts") / HOUR_US)).alias("b")
    ).collect()[0]["b"]
    assert got == [base + 2, base + 3, base + 5, base + 6]


def test_coverage_gaps_full_timeline_is_empty(spark):
    assert coverage_gaps(_hours_df(spark, [3, 4, 5]), "ts", unit="hour").count() == 0


def test_coverage_gaps_sentinel_timestamp_is_truncated(spark):
    # an epoch-0 sentinel amid 2024 data spans ~473k hourly buckets; the
    # default guard must cap the expansion instead of materializing it
    df = spark.createDataFrame(
        [("1970-01-01 00:30:00",), ("2024-01-01 05:30:00",), ("2024-01-01 07:30:00",)],
        "ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = coverage_gaps(df, "ts", unit="hour", max_gap_buckets=10).collect()
    # sentinel gap capped at 10 buckets (all flagged), real 1-hour gap intact
    assert len(rows) == 11
    sentinel = [r for r in rows if r["truncated"]]
    assert len(sentinel) == 10 and [r["bucket_idx"] for r in sentinel] == list(
        range(1, 11)
    )
    real = [r for r in rows if not r["truncated"]]
    assert len(real) == 1 and str(real[0]["bucket_start"]) == "2024-01-01 06:00:00"
    with pytest.raises(ValueError):
        coverage_gaps(df, "ts", max_gap_buckets=0)


def test_coverage_gaps_unguarded_opt_out_expands_in_full(spark):
    df = _hours_df(spark, [0, 23])
    rows = coverage_gaps(df, "ts", unit="hour", max_gap_buckets=None).collect()
    assert len(rows) == 22 and not any(r["truncated"] for r in rows)


def test_coverage_gaps_day_unit_and_bad_unit(spark):
    df = spark.createDataFrame(
        [("2024-01-01 10:00:00",), ("2024-01-04 09:00:00",)], "ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    days = coverage_gaps(df, "ts", unit="day").collect()
    assert [str(r["bucket_start"]) for r in days] == [
        "2024-01-02 00:00:00",
        "2024-01-03 00:00:00",
    ]
    with pytest.raises(ValueError):
        coverage_gaps(df, "ts", unit="minute")


# ---------------------------------------------------------------------------
# Wasserstein-1
# ---------------------------------------------------------------------------


def _vals(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], "v double")


def test_wasserstein_unit_shift(spark):
    a = _vals(spark, range(10))
    b = _vals(spark, range(1, 11))
    row = wasserstein_statistic(a, b, "v", n_buckets=None).collect()[0]
    assert row["w1"] == pytest.approx(1.0)
    assert row["n_a"] == row["n_b"] == 10


def test_wasserstein_identical_and_empty(spark):
    a = _vals(spark, [1, 2, 3])
    assert wasserstein_statistic(a, a, "v", n_buckets=None).collect()[0]["w1"] == 0.0
    empty = _vals(spark, []).filter("v IS NOT NULL")
    assert (
        wasserstein_statistic(a, empty, "v", n_buckets=None).collect()[0]["w1"] is None
    )


def test_wasserstein_constant_columns_zero(spark):
    a = _vals(spark, [5, 5])
    b = _vals(spark, [5])
    assert wasserstein_statistic(a, b, "v", n_buckets=1000).collect()[0]["w1"] == 0.0


# ---------------------------------------------------------------------------
# entropy / mutual information
# ---------------------------------------------------------------------------


def test_entropy_uniform_and_constant(spark):
    df = spark.createDataFrame(
        [("a", "k"), ("b", "k"), ("a", "k"), ("b", "k")], "u string, c string"
    )
    out = {r["col_name"]: r.asDict() for r in categorical_entropy(df, ["u", "c"]).collect()}
    assert out["u"]["entropy"] == pytest.approx(math.log(2), abs=1e-6)
    assert out["u"]["norm_entropy"] == pytest.approx(1.0)
    assert out["c"]["entropy"] == 0.0 and out["c"]["norm_entropy"] == 0.0
    assert out["u"]["n_distinct"] == 2 and out["u"]["n_rows"] == 4


def test_entropy_excludes_nulls(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",)], "u string")
    row = categorical_entropy(df, ["u"]).collect()[0]
    assert row["n_rows"] == 2 and row["entropy"] == 0.0


def test_mi_perfect_coupling_and_independence(spark):
    coupled = spark.createDataFrame(
        [("x", "1"), ("y", "2")] * 3, "a string, b string"
    )
    row = mutual_information(coupled, "a", "b").collect()[0]
    assert row["mi"] == pytest.approx(math.log(2), abs=1e-6)
    assert row["nmi"] == pytest.approx(1.0)

    indep = spark.createDataFrame(
        [("x", "1"), ("x", "2"), ("y", "1"), ("y", "2")], "a string, b string"
    )
    row = mutual_information(indep, "a", "b").collect()[0]
    assert row["mi"] == 0.0 and row["nmi"] == 0.0
    assert row["n_pairs"] == 4 and row["n_rows"] == 4


def test_mi_constant_marginal_nmi_zero(spark):
    df = spark.createDataFrame([("x", "1"), ("x", "2")], "a string, b string")
    row = mutual_information(df, "a", "b").collect()[0]
    assert row["mi"] == 0.0 and row["nmi"] == 0.0


# ---------------------------------------------------------------------------
# centroid drift
# ---------------------------------------------------------------------------


def test_centroid_drift_orthogonal(spark):
    df = spark.createDataFrame(
        [
            (True, [1.0, 0.0]),
            (True, [1.0, 0.0]),
            (False, [0.0, 1.0]),
        ],
        "side boolean, embedding array<double>",
    )
    row = centroid_drift(df, "embedding", "side").collect()[0]
    assert row["cosine"] == 0.0
    assert row["l2_shift"] == pytest.approx(math.sqrt(2.0), abs=1e-6)
    assert row["n_a"] == 2 and row["n_b"] == 1 and row["dim"] == 2


def test_centroid_drift_identical_sides(spark):
    df = spark.createDataFrame(
        [(True, [0.5, 0.5]), (False, [0.5, 0.5])],
        "side boolean, embedding array<double>",
    )
    row = centroid_drift(df, "embedding", "side").collect()[0]
    assert row["cosine"] == 1.0 and row["l2_shift"] == 0.0


def test_centroid_drift_empty_side_null(spark):
    df = spark.createDataFrame([(True, [1.0, 2.0])], "side boolean, embedding array<double>")
    row = centroid_drift(df, "embedding", "side").collect()[0]
    assert row["cosine"] is None and row["l2_shift"] is None
