"""Fused single-pass validation plan: equivalence + physical-plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from schema_infer_plugin_spark.checks import (
    contiguity_violations,
    domain_violations,
    null_violations,
    uniqueness_violations,
)
from schema_infer_plugin_spark.checks.domains import tool_requires_role_violations
from schema_infer_plugin_spark.checks.temporal import ts_monotonic_violations
from schema_infer_plugin_spark.plans.validate import validate_transcripts
from schema_infer_plugin_spark.schema import ROLE_DOMAIN, TOOL_DOMAIN
from schema_infer_plugin_spark.sources.synth import synth_transcripts


def _modular_union(t):
    return (
        uniqueness_violations(t)
        .unionByName(contiguity_violations(t))
        .unionByName(
            domain_violations(t, "role", ROLE_DOMAIN).withColumn(
                "check_name", F.lit("domain_role")
            )
        )
        .unionByName(
            domain_violations(t, "tool", TOOL_DOMAIN).withColumn(
                "check_name", F.lit("domain_tool")
            )
        )
        .unionByName(tool_requires_role_violations(t))
        .unionByName(null_violations(t, "text"))
        .unionByName(null_violations(t, "conv_id"))
        .unionByName(null_violations(t, "turn_idx"))
        .unionByName(ts_monotonic_violations(t))
    )


def test_fused_equals_modular_union_on_synth(spark):
    t = synth_transcripts(spark, 2_000).persist()
    try:
        fused = validate_transcripts(t)
        union = _modular_union(t)
        assert union.exceptAll(fused).count() == 0
        assert fused.exceptAll(union).count() == 0
        assert fused.count() > 0  # synth injects violations; a zero here means the checks went blind
    finally:
        t.unpersist()


def test_fused_handles_adjacent_duplicates_gaps_and_ts(spark):
    import datetime as dt

    def ts(m):
        return dt.datetime(2026, 1, 1, 0, m)

    # conv A: dup at idx 1 (x3), gap 2->5, ts rewind at idx 2; conv B: starts at 3.
    rows = [
        ("A", 0, "user", "t", None, ts(0)),
        ("A", 1, "user", "t", None, ts(1)),
        ("A", 1, "assistant", "t", None, ts(2)),
        ("A", 1, "assistant", "t", None, ts(3)),
        ("A", 2, "user", "t", None, ts(1)),  # rewinds vs 00:03
        ("A", 5, "user", "t", None, ts(5)),
        ("B", 3, "user", "t", None, None),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    got = {
        (r["check_name"], r["conv_id"], r["turn_idx"], r["observed"], r["expected"])
        for r in validate_transcripts(t).collect()
    }
    assert got == {
        ("uniqueness", "A", 1, "3", "1"),
        ("contiguity", "A", 5, "5", "3"),
        ("contiguity_start", "B", 3, "3", "0"),
        ("ts_monotonic", "A", 2, "2026-01-01 00:01:00", ">= 2026-01-01 00:03:00"),
    }


def test_fused_null_key_posture(spark):
    """Rows missing conv_id or turn_idx raise not_null_* violations, are
    EXCLUDED from every sequence check (no fabricated uniqueness/contiguity
    among keyless rows), and leave the well-keyed conversations' results
    untouched."""
    import datetime as dt

    ts0 = dt.datetime(2026, 1, 1)
    rows = [
        # well-formed conversation, no violations
        ("A", 0, "user", "t", None, ts0),
        ("A", 1, "assistant", "t", None, ts0),
        # two keyless rows sharing turn_idx 7: NOT a uniqueness violation
        (None, 7, "user", "t", None, ts0),
        (None, 7, "assistant", "t", None, ts0),
        # NULL turn_idx inside a real conversation: flagged, out of sequence
        ("A", None, "user", "t", None, ts0),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    got = {
        (r["check_name"], r["conv_id"], r["turn_idx"])
        for r in validate_transcripts(t).collect()
    }
    assert got == {
        ("not_null_conv_id", None, 7),
        ("not_null_turn_idx", "A", None),
    }
    assert validate_transcripts(t).count() == 3  # 2× conv_id NULL, 1× turn_idx NULL
    # and the modular union agrees row-for-row
    fused = validate_transcripts(t)
    union = _modular_union(t)
    assert fused.exceptAll(union).count() == 0
    assert union.exceptAll(fused).count() == 0


def test_fused_plan_has_single_exchange(spark):
    t = synth_transcripts(spark, 500)
    plan = validate_transcripts(t)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python anywhere


# ---------------------------------------------------------------------------
# property: fused == modular on ADVERSARIAL micro-fixtures (Hypothesis)
# ---------------------------------------------------------------------------

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ROLES = ["user", "assistant", "tool", "ALIEN", None]
_TOOLS = ["search", "python", "BOGUS", None]

_row = st.tuples(
    st.sampled_from(["A", "B", None]),                # conv_id (collisions + NULL keys)
    st.sampled_from([0, 1, 2, 3, 4, None]),           # turn_idx (dups, gaps, NULL keys)
    st.sampled_from(_ROLES),
    st.sampled_from(["hi", None]),                    # text (null-check)
    st.sampled_from(_TOOLS),
    st.sampled_from([None, 0, 60, 120]),              # ts offset sec (rewinds likely)
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_row, min_size=1, max_size=8))
def test_fused_equals_modular_union_property(spark, rows):
    """Whatever combination of duplicate keys, gaps, bad starts, domain
    violations, null text and ts rewinds Hypothesis throws, the fused
    single-exchange plan must emit EXACTLY the modular checks' rows."""
    base = datetime.datetime(2026, 1, 1)
    data = [
        (c, i, r, x, tl, None if o is None else base + datetime.timedelta(seconds=o))
        for (c, i, r, x, tl, o) in rows
    ]
    t = spark.createDataFrame(
        data, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    fused = validate_transcripts(t)
    modular = _modular_union(t)
    assert fused.exceptAll(modular).count() == 0
    assert modular.exceptAll(fused).count() == 0


def test_fused_alternation_opt_in(spark):
    """include_alternation adds the ninth check from the SAME window: rows ==
    modular union + alternation rows, and the plan gains no exchange."""
    from schema_infer_plugin_spark.checks import role_alternation_violations

    t = synth_transcripts(spark, 2_000)
    fused = validate_transcripts(t, include_alternation=True)
    modular = _modular_union(t).unionByName(role_alternation_violations(t))
    assert fused.exceptAll(modular).count() == 0
    assert modular.exceptAll(fused).count() == 0
    base_plan = validate_transcripts(t)._jdf.queryExecution().executedPlan().toString()
    alt_plan = fused._jdf.queryExecution().executedPlan().toString()
    assert alt_plan.count("Exchange") == base_plan.count("Exchange")


def test_sampled_validation_estimate(spark):
    """Wilson estimates must equal the closed-form formula on the exact
    fused counts of the SAME deterministic sample; the grid covers every
    check even at zero violations; the sample is conv-granular (partial
    conversations never appear)."""
    import math

    from schema_infer_plugin_spark.plans.validate import (
        CHECK_NAMES,
        sampled_validation_estimate,
    )
    from schema_infer_plugin_spark.sources.sampling import deterministic_sample

    t = synth_transcripts(spark, 2_000)
    sampled = deterministic_sample(t, ["conv_id"], 64)
    n = sampled.count()
    n_convs = sampled.select("conv_id").distinct().count()
    sviol = validate_transcripts(sampled)
    full = {
        r["check_name"]: (r["cnt"], r["convs"])
        for r in sviol.groupBy("check_name").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.count_distinct("conv_id").alias("convs"),
        ).collect()
    }
    est = {
        r["check_name"]: r
        for r in sampled_validation_estimate(t, rate_num=64).collect()
    }
    assert set(est) == set(CHECK_NAMES)
    z = 1.959964

    def wilson(k, nn):
        phat = k / nn
        denomw = 1.0 + z * z / nn
        center = (phat + z * z / (2.0 * nn)) / denomw
        half = z * math.sqrt(
            phat * (1.0 - phat) / nn + z * z / (4.0 * nn * nn)
        ) / denomw
        # clamped to contain phat (float dust at k=0 / k=n)
        return phat, max(min(center - half, phat), 0.0), min(max(center + half, phat), 1.0)

    for name in CHECK_NAMES:
        row = est[name]
        k, kc = full.get(name, (0, 0))
        assert row["n_turns"] == n and row["n_violations"] == k
        assert row["n_convs"] == n_convs and row["conv_violations"] == kc
        for kk, nn, pre in ((k, n, ""), (kc, n_convs, "conv_")):
            phat, lo, hi = wilson(kk, nn)
            assert math.isclose(row[f"{pre}rate"], phat, abs_tol=1e-12)
            assert math.isclose(row[f"{pre}ci_lo"], lo, abs_tol=1e-9)
            assert math.isclose(row[f"{pre}ci_hi"], hi, abs_tol=1e-9)
        # EXACT containment at both units — the property the least/greatest
        # clamp guarantees (isclose's 1e-9 tolerance can't catch the ~1e-19
        # float dust at k=0 / k=n that the clamp exists for)
        assert row["ci_lo"] <= row["rate"] <= row["ci_hi"]
        assert row["conv_ci_lo"] <= row["conv_rate"] <= row["conv_ci_hi"]

    # conv-granular sampling: a sampled conversation appears whole
    per_conv = sampled.groupBy("conv_id").agg(F.count(F.lit(1)).alias("s"))
    orig = t.groupBy("conv_id").agg(F.count(F.lit(1)).alias("o"))
    mismatched = per_conv.join(orig, "conv_id").filter("s != o").count()
    assert mismatched == 0 and 0 < n < t.count()
