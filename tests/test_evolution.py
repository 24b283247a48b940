"""checks/evolution.py: micro-fixture verdicts + parity with the registry's
evolution_issues rules (the same semantics must hold whether enforced at
registration time or run as a distributed data check)."""

from __future__ import annotations

from pyspark.sql import functions as F

from schema_infer_plugin_spark.checks.evolution import (
    evolution_verdicts,
    schema_evolution_check,
)
from schema_infer_plugin_spark.operators.generators import FieldSpec
from schema_infer_plugin_spark.operators.registry import evolution_issues

PROFILE_SCHEMA = "column string, inferred_type string, nullable boolean, required boolean"


def _profile(spark, rows):
    return spark.createDataFrame(rows, PROFILE_SCHEMA)


def test_verdict_matrix(spark):
    old = _profile(
        spark,
        [
            ("a", "int", False, True),      # kept, promoted int->float
            ("b", "string", False, True),   # kept, broken string->int
            ("gone_req", "string", False, True),   # removed required
            ("gone_opt", "string", True, False),   # removed nullable
        ],
    )
    new = _profile(
        spark,
        [
            ("a", "float", False, True),
            ("b", "int", False, True),
            ("new_req", "string", False, True),    # added required
            ("new_opt", "string", True, False),    # added nullable
        ],
    )
    out = {r["col_name"]: r.asDict() for r in evolution_verdicts(old, new).collect()}
    assert out["a"] == {
        "col_name": "a", "status": "kept", "old_type": "int", "new_type": "float",
        "backward_ok": True, "forward_ok": False, "compatible_full": False,
        "issue": "type_changed",
    }
    assert out["b"]["issue"] == "type_changed" and not out["b"]["backward_ok"]
    assert out["gone_req"]["issue"] == "field_removed_required"
    assert out["gone_opt"]["issue"] is None and out["gone_opt"]["compatible_full"]
    assert out["new_req"]["issue"] == "field_added_required"
    assert out["new_opt"]["issue"] is None and out["new_opt"]["compatible_full"]


def test_parity_with_registry_rules(spark):
    """The distributed verdicts must agree with operators/registry's
    evolution_issues on which fields block BACKWARD / FORWARD."""
    old_rows = [
        ("a", "int", False, True),
        ("b", "string", False, True),
        ("gone_req", "string", False, True),
    ]
    new_rows = [
        ("a", "float", False, True),
        ("b", "int", False, True),
        ("new_req", "string", False, True),
        ("new_opt", "string", True, False),
    ]
    verdicts = {
        r["col_name"]: r.asDict()
        for r in evolution_verdicts(
            _profile(spark, old_rows), _profile(spark, new_rows)
        ).collect()
    }
    old_specs = [
        FieldSpec(name=n, type_name=t, nullable=nl, required=rq)
        for n, t, nl, rq in old_rows
    ]
    new_specs = [
        FieldSpec(name=n, type_name=t, nullable=nl, required=rq)
        for n, t, nl, rq in new_rows
    ]
    backward_blocked = {i.field for i in evolution_issues(old_specs, new_specs, "BACKWARD")}
    forward_blocked = {i.field for i in evolution_issues(old_specs, new_specs, "FORWARD")}
    for col, v in verdicts.items():
        assert v["backward_ok"] == (col not in backward_blocked), col
        assert v["forward_ok"] == (col not in forward_blocked), col


def test_schema_evolution_check_end_to_end(spark):
    old = spark.createDataFrame([("1", "x")], "id string, gone string")
    new = spark.createDataFrame([("1.5", "y")], "id string, added string")
    out = {
        r["col_name"]: r.asDict()
        for r in schema_evolution_check(old, new).collect()
    }
    assert out["id"]["old_type"] == "int" and out["id"]["new_type"] == "float"
    assert out["id"]["backward_ok"] and not out["id"]["forward_ok"]
    assert out["gone"]["status"] == "removed"
    assert out["added"]["status"] == "added"
