"""Drift pass in the runner + catalog discovery."""

from __future__ import annotations

from pyspark.sql import functions as F

from schema_infer_plugin_spark.plans.runner import (
    run_drift,
    write_histograms,
)
from schema_infer_plugin_spark.sources.discovery import discover_tables
from schema_infer_plugin_spark.sources.synth import synth_transcripts


def test_drift_pass_self_vs_shifted(spark, tmp_path):
    t = synth_transcripts(spark, 2_000).persist()
    try:
        base_out = str(tmp_path / "base")
        write_histograms(spark, t, base_out, ["role", "tool"])

        # same data vs itself: PSI ~ 0 -> pass
        out1 = str(tmp_path / "r1")
        v = run_drift(spark, t, out1, base_out, run_id="r1")
        rows = {r["check_name"]: r for r in v.collect()}
        assert rows["drift_role"]["pass"] and rows["drift_tool"]["pass"]
        assert abs(rows["drift_role"]["metrics"]["psi"]) < 1e-9

        # assistant-heavy slice vs full baseline: role distribution shifts -> fail
        shifted = t.filter(
            (F.col("role") == "assistant") | (F.pmod(F.xxhash64("conv_id"), 4) == 0)
        )
        out2 = str(tmp_path / "r2")
        v2 = run_drift(spark, shifted, out2, base_out, run_id="r2")
        rows2 = {r["check_name"]: r for r in v2.collect()}
        assert not rows2["drift_role"]["pass"]
        assert rows2["drift_role"]["metrics"]["psi"] > 0.2

        # resume: second call served from disk (ledger short-circuit)
        v3 = run_drift(spark, shifted, out2, base_out, run_id="r2")
        assert v3.count() == v2.count()
    finally:
        t.unpersist()


def test_discover_tables(spark, tmp_path):
    spark.range(1).createOrReplaceTempView("disc_orders")
    spark.range(1).createOrReplaceTempView("disc_lineitem")
    spark.range(1).createOrReplaceTempView("__disc_internal")
    try:
        r = discover_tables(spark, prefix="disc_")
        assert "disc_orders" in r.found and "disc_lineitem" in r.found

        r = discover_tables(spark, names=["disc_orders", "nope"])
        assert r.found == ["disc_orders"] and r.not_found == ["nope"]

        r = discover_tables(spark, pattern=r"__disc_.*")
        assert r.excluded == ["__disc_internal"] and r.found == []

        r = discover_tables(
            spark, pattern=r"__disc_.*", include_patterns=(r"__disc_.*",)
        )
        assert r.found == ["__disc_internal"]
    finally:
        for v in ("disc_orders", "disc_lineitem", "__disc_internal"):
            spark.catalog.dropTempView(v)


def test_schema_evolution_pass(spark, tmp_path):
    from schema_infer_plugin_spark.plans.runner import run_profile, run_schema_evolution

    t = synth_transcripts(spark, 500)
    base = str(tmp_path / "base")
    cur = str(tmp_path / "cur")
    run_profile(spark, t, base)
    # current run drops the 'tool' column entirely -> FORWARD-incompatible
    run_profile(spark, t.drop("tool"), cur, columns=["conv_id", "turn_idx", "role", "text"])

    ok = run_schema_evolution(spark, cur, base, mode="BACKWARD")
    assert [r["pass"] for r in ok.collect()] == [True]  # removal is BACKWARD-ok

    cur2 = str(tmp_path / "cur2")
    run_profile(spark, t.drop("conv_id"), cur2, columns=["turn_idx", "role", "text", "tool"])
    bad = run_schema_evolution(spark, cur2, base, mode="FORWARD")
    rows = bad.collect()
    assert any(not r["pass"] and r["field"] == "conv_id" for r in rows)
