"""Unit tests for checks/vector_sanity.py: hand-built vectors where every rule
fires (and co-fires — NaN + wrong dim on one row), plan gate (zero exchanges,
no Python), and stats/violations consistency."""

from __future__ import annotations

import pytest

NAN = float("nan")
INF = float("inf")
DIM = 4

ROWS = [
    (1, [1.0, 2.0, 3.0, 4.0]),        # ok
    (2, None),                        # vec_null
    (3, [1.0, 2.0, 3.0]),             # vec_dim
    (4, [NAN, 2.0, 3.0, 4.0]),        # vec_nan
    (5, [1.0, -INF, 3.0, 4.0]),       # vec_inf
    (6, [0.0, 0.0, 0.0, 0.0]),        # vec_zero
    (7, [NAN, 2.0, 3.0]),             # vec_dim AND vec_nan (two rows)
    (8, [NAN, INF, 3.0, 4.0]),        # vec_nan AND vec_inf (two rows)
    (9, [0.0, 0.0, 0.0]),             # vec_dim only — zero rule gated on dim
    (10, [1.0, None, 3.0, 4.0]),      # vec_null_element (isnan(NULL) is NULL —
                                      # without the guard this row satisfies NO
                                      # rule yet counts as not-ok)
    (11, [None, NAN, 3.0, 4.0]),      # vec_null_element AND vec_nan (two rows)
    (12, [0.0, None, 0.0, 0.0]),      # null_element only — zero rule gated on
                                      # all-present (sum over NULL is unevaluable)
]


@pytest.fixture(scope="module")
def vec_df(spark):
    return spark.createDataFrame(ROWS, "id_in: long, vec: array<float>")


def test_violations_per_rule(vec_df):
    from schema_infer_plugin_spark.checks.vector_sanity import (
        vector_sanity_violations,
    )

    out = vector_sanity_violations(vec_df, "id_in", "vec", dim=DIM)
    got = {(r["check_name"], r["id"]): (r["observed"], r["expected"]) for r in out.collect()}
    assert got == {
        ("vec_null", 2): ("NULL", "NOT NULL"),
        ("vec_dim", 3): ("3", "4"),
        ("vec_nan", 4): ("1", "0 NaN elements"),
        ("vec_inf", 5): ("1", "0 Inf elements"),
        ("vec_zero", 6): ("0.0", "norm > 0"),
        ("vec_dim", 7): ("3", "4"),
        ("vec_nan", 7): ("1", "0 NaN elements"),
        ("vec_nan", 8): ("1", "0 NaN elements"),
        ("vec_inf", 8): ("1", "0 Inf elements"),
        ("vec_dim", 9): ("3", "4"),
        ("vec_null_element", 10): ("1", "0 NULL elements"),
        ("vec_null_element", 11): ("1", "0 NULL elements"),
        ("vec_nan", 11): ("1", "0 NaN elements"),
        ("vec_null_element", 12): ("1", "0 NULL elements"),
    }
    assert out.columns == ["check_name", "id", "col_name", "observed", "expected"]
    assert {r["col_name"] for r in out.collect()} == {"vec"}


def test_stats_row(vec_df):
    from schema_infer_plugin_spark.checks.vector_sanity import vector_sanity_stats

    row = vector_sanity_stats(vec_df, "vec", dim=DIM).collect()[0]
    assert row.asDict() == {
        "n_rows": 12,
        "n_null": 1,
        "n_wrong_dim": 3,
        "n_null_elem": 3,
        "n_nan": 4,
        "n_inf": 2,
        "n_zero": 1,
        "n_ok": 1,
    }
    # the defect flags partition n_rows - n_ok: every not-ok row trips >= 1
    # counter (the exact property the null-element guard restores)
    assert row["n_rows"] - row["n_ok"] == 11


def test_dim_required(vec_df):
    from schema_infer_plugin_spark.checks.vector_sanity import (
        vector_sanity_stats,
        vector_sanity_violations,
    )

    with pytest.raises(ValueError):
        vector_sanity_violations(vec_df, "id_in", "vec", dim=0)
    with pytest.raises(ValueError):
        vector_sanity_stats(vec_df, "vec", dim=-1)


def test_plan_zero_exchange_no_python(vec_df):
    from schema_infer_plugin_spark.checks.vector_sanity import (
        vector_sanity_violations,
    )

    plan = vector_sanity_violations(vec_df, "id_in", "vec", dim=DIM)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_clean_table_empty(spark):
    from schema_infer_plugin_spark.checks.vector_sanity import (
        vector_sanity_stats,
        vector_sanity_violations,
    )
    from schema_infer_plugin_spark.sources.io import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    assert vector_sanity_violations(emb, "vec_id", "embedding", dim=64).count() == 0
    row = vector_sanity_stats(emb, "embedding", dim=64).collect()[0]
    assert row["n_ok"] == row["n_rows"] > 0
