"""Reference-semantics unit tests for the type ladder.

Expected values encode the *verified code behavior* of
/root/reference/schema_infer/schemas/inference.py and formats/parsers.py
(SURVEY.md §1.2/§5): bool-before-int, plurality + 0.8-confidence union rule,
nullable = any-null, required = no-null or ratio < 0.1, all-null → string.
"""

from __future__ import annotations

import pytest

from schema_infer_plugin_spark.functions.typeladder import string_value_type
from schema_infer_plugin_spark.operators.profile import type_profile
from pyspark.sql import functions as F


@pytest.mark.parametrize(
    "value,expected",
    [
        ("true", "boolean"),
        ("FALSE", "boolean"),  # lowercased first (parsers.py:367)
        ("42", "int"),
        ("-7", "int"),
        ("+3", "int"),
        (" 7 ", "int"),  # Python int() strips whitespace (reachable via KV quotes)
        ("  -12  ", "int"),
        (" 2.5 ", "float"),  # float() strips too
        ("+ 7", "string"),  # inner space: int('+ 7') raises
        ("3.14", "float"),
        ("1e5", "float"),
        ("hello", "string"),
        ("", "string"),
        (None, "null"),
    ],
)
def test_string_value_type(spark, value, expected):
    row = spark.createDataFrame([(value,)], "v string").select(
        string_value_type(F.col("v")).alias("t")
    ).collect()[0]
    assert row["t"] == expected


def _profile_one(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return type_profile(df, columns=["v"]).collect()[0]


def test_plurality_wins(spark):
    # 9 ints, 1 string → confidence 0.9 ≥ 0.8 → int (inference.py:361-383)
    r = _profile_one(spark, ["1"] * 9 + ["x"])
    assert r["inferred_type"] == "int" and r["confidence"] == 0.9


def test_union_below_threshold(spark):
    # 3 ints, 2 strings → confidence 0.6 < 0.8 and 2 types → union
    r = _profile_one(spark, ["1", "2", "3", "x", "y"])
    assert r["inferred_type"] == "union"


def test_exact_point_eight_is_not_union(spark):
    # confidence exactly 0.8 is NOT < 0.8 → plurality type (strict <, inference.py:375)
    r = _profile_one(spark, ["1"] * 8 + ["x"] * 2)
    assert r["inferred_type"] == "int" and r["confidence"] == 0.8


def test_single_type_low_share_never_union(spark):
    # one non-null type → never union even with many nulls (len==1 branch, :378-379)
    r = _profile_one(spark, ["1", None, None, None])
    assert r["inferred_type"] == "int"


def test_all_null_is_nullable_string(spark):
    # inference.py:364-366
    r = _profile_one(spark, [None, None])
    assert r["inferred_type"] == "string" and r["nullable"] and r["confidence"] is None


def test_nullable_and_required_thresholds(spark):
    # nullable = any null (:359); required = no null or ratio < 0.1 (:386)
    r = _profile_one(spark, ["a"] * 19 + [None])  # ratio 0.05 < 0.1
    assert r["nullable"] and r["required"]
    r = _profile_one(spark, ["a"] * 9 + [None])  # ratio exactly 0.1 → NOT required
    assert r["nullable"] and not r["required"]
    r = _profile_one(spark, ["a"] * 3)  # no nulls → required
    assert not r["nullable"] and r["required"]


def test_tie_breaks_masked_by_union_rule(spark):
    # The reference breaks plurality ties by FIRST-OBSERVED type (dict
    # insertion order of its sample) — order-dependent, unreproducible in a
    # distributed agg. The engine uses ladder order instead, which is only
    # observable when confidence_threshold <= 0.5: at the default 0.8, any
    # tie's max share is <= 0.5 < threshold, so >1 type demotes to union and
    # the tie-break never surfaces.
    r = _profile_one(spark, ["1", "2", "x", "y"])  # 2 int vs 2 string tie
    assert r["inferred_type"] == "union"
    r = _profile_one(spark, ["1", "1", "x", "x", "true"])  # 3-way with tie
    assert r["inferred_type"] == "union"


def test_bool_checked_before_int(spark):
    # Python bools are ints; the reference checks bool first (inference.py:278).
    r = _profile_one(spark, ["true", "false", "True"])
    assert r["inferred_type"] == "boolean" and r["cnt_int"] == 0
