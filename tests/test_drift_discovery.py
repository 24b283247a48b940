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

        # same data vs itself: PSI ~ 0 -> pass (incl. the transition-matrix
        # pseudo-column persisted beside the per-column histograms)
        out1 = str(tmp_path / "r1")
        v = run_drift(spark, t, out1, base_out, run_id="r1")
        rows = {r["check_name"]: r for r in v.collect()}
        assert rows["drift_role"]["pass"] and rows["drift_tool"]["pass"]
        assert abs(rows["drift_role"]["metrics"]["psi"]) < 1e-9
        assert rows["drift_transitions"]["pass"]
        assert abs(rows["drift_transitions"]["metrics"]["psi"]) < 1e-9
        # count-bearing baseline -> chi2/dof ride the metrics; self-drift = 0
        assert rows["drift_role"]["metrics"]["chi2"] == 0.0
        assert rows["drift_role"]["metrics"]["dof"] >= 1.0
        assert rows["drift_transitions"]["metrics"]["chi2"] == 0.0

        # assistant-heavy slice vs full baseline: role distribution shifts -> fail
        shifted = t.filter(
            (F.col("role") == "assistant") | (F.pmod(F.xxhash64("conv_id"), 4) == 0)
        )
        out2 = str(tmp_path / "r2")
        v2 = run_drift(spark, shifted, out2, base_out, run_id="r2")
        rows2 = {r["check_name"]: r for r in v2.collect()}
        assert not rows2["drift_role"]["pass"]
        assert rows2["drift_role"]["metrics"]["psi"] > 0.2
        # the role shift reshapes adjacency too: transition drift must see it
        assert rows2["drift_transitions"]["metrics"]["psi"] > 0.2
        # a real shift at this n dwarfs any chi2 critical value at small dof
        dof = rows2["drift_role"]["metrics"]["dof"]
        assert rows2["drift_role"]["metrics"]["chi2"] > 10 * (dof + 1)

        # resume: second call served from disk (ledger short-circuit)
        v3 = run_drift(spark, shifted, out2, base_out, run_id="r2")
        assert v3.count() == v2.count()
    finally:
        t.unpersist()


def test_drift_legacy_freq_only_baseline(spark, tmp_path):
    """A pre-r5 baseline artifact (freq column only, no cnt): the drift pass
    takes the legacy drift_stats path with IDENTICAL psi/kl/js (freqs are the
    same cnt/Σcnt division) and simply omits the chi2/dof metrics."""
    import os

    from schema_infer_plugin_spark.checks.drift import histogram

    t = synth_transcripts(spark, 1_000).persist()
    try:
        base_new = str(tmp_path / "new")
        write_histograms(spark, t, base_new, ["role"], numeric_columns=[])
        base_old = str(tmp_path / "old")
        (
            histogram(t, "role")
            .withColumn("column", F.lit("role"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(base_old, "histograms", "role"))
        )
        shifted = t.filter(
            (F.col("role") == "assistant") | (F.pmod(F.xxhash64("conv_id"), 4) == 0)
        )
        v_new = run_drift(
            spark, shifted, str(tmp_path / "rn"), base_new, run_id="rn",
            columns=["role"], numeric_columns=[],
        ).collect()
        v_old = run_drift(
            spark, shifted, str(tmp_path / "ro"), base_old, run_id="ro",
            columns=["role"], numeric_columns=[],
        ).collect()
        m_new = dict(v_new[0]["metrics"])
        m_old = dict(v_old[0]["metrics"])
        assert "chi2" in m_new and "chi2" not in m_old
        for k in ("psi", "kl", "js"):
            assert m_new[k] == m_old[k]  # bit-identical across the two paths
    finally:
        t.unpersist()


def test_numeric_ks_drift_pass(spark, tmp_path):
    """KS leg of run_drift: same data vs itself passes with ks ~ 0; a
    conversation-length-skewed slice shifts the turn_idx CDF and fails.
    Out-of-grid values clamp (conservative) rather than error."""
    t = synth_transcripts(spark, 2_000).persist()
    try:
        base_out = str(tmp_path / "base")
        write_histograms(spark, t, base_out, ["role"], numeric_columns=["turn_idx"])

        out1 = str(tmp_path / "r1")
        v = run_drift(
            spark, t, out1, base_out, run_id="r1",
            columns=["role"], numeric_columns=["turn_idx"],
        )
        rows = {r["check_name"]: r for r in v.collect()}
        assert rows["ks_turn_idx"]["pass"]
        assert rows["ks_turn_idx"]["metrics"]["ks"] < 1e-9
        assert rows["ks_turn_idx"]["metrics"]["w1"] < 1e-9
        # binned chi2 rides the same job: identical data -> exactly 0
        assert rows["ks_turn_idx"]["metrics"]["chi2"] == 0.0
        assert rows["ks_turn_idx"]["metrics"]["dof"] >= 1.0

        # keep only early turns (turn_idx < 3) + clamp probe: +1000 outliers
        shifted = t.filter(F.col("turn_idx") < 3).union(
            t.limit(5).withColumn("turn_idx", F.col("turn_idx") + 1000)
        )
        out2 = str(tmp_path / "r2")
        v2 = run_drift(
            spark, shifted, out2, base_out, run_id="r2",
            columns=["role"], numeric_columns=["turn_idx"],
        )
        rows2 = {r["check_name"]: r for r in v2.collect()}
        assert not rows2["ks_turn_idx"]["pass"]
        assert rows2["ks_turn_idx"]["metrics"]["ks"] > 0.1
        assert rows2["ks_turn_idx"]["metrics"]["w1"] > 0.0
        # the CDF shift is also a count shift: chi2_z far beyond any z gate
        assert rows2["ks_turn_idx"]["metrics"]["chi2_z"] > 10.0
    finally:
        t.unpersist()


def test_numeric_ks_missing_baseline_skipped(spark, tmp_path):
    """A baseline run that predates numeric baselines: the KS leg skips the
    column instead of failing the whole drift pass."""
    t = synth_transcripts(spark, 500)
    base_out = str(tmp_path / "base")
    write_histograms(spark, t, base_out, ["role"], numeric_columns=[])
    v = run_drift(spark, t, str(tmp_path / "r1"), base_out, run_id="r1", columns=["role"])
    names = {r["check_name"] for r in v.collect()}
    assert "drift_role" in names and "ks_turn_idx" not in names


def test_profile_diff_pass(spark, tmp_path):
    """run_profile_compare: identical runs diff to all-OK; resumable from the
    ledger; the verdict parquet carries the run_id stamp."""
    from schema_infer_plugin_spark.plans.runner import run_profile_compare, run_profile

    t = synth_transcripts(spark, 500)
    base_out, cur_out = str(tmp_path / "base"), str(tmp_path / "cur")
    run_profile(spark, t, base_out, run_id="base")
    run_profile(spark, t, cur_out, run_id="cur")
    v = run_profile_compare(spark, cur_out, base_out, run_id="cur")
    rows = {r["col_name"]: r for r in v.collect()}
    assert rows and all(r["verdict"] == "OK" for r in rows.values())
    assert all(r["run_id"] == "cur" for r in rows.values())
    # resume: served from disk
    v2 = run_profile_compare(spark, cur_out, base_out, run_id="cur")
    assert v2.count() == v.count()


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


def test_windowed_drift_report_matches_per_window(spark):
    """windowed_drift_report rows for each window are EXACTLY
    drift_and_chi2_terms(that window's counts, baseline) — the windowed grid
    (with the phantom-bucket filter) reproduces the per-window full-outer
    join bit for bit, including buckets unseen in a window (o_cur=0) and
    window-only buckets (o_base=0)."""
    import datetime as dt

    from schema_infer_plugin_spark.checks.drift import (
        drift_and_chi2_terms,
        windowed_drift_report,
    )

    base = spark.createDataFrame(
        [("a", 10), ("b", 30), ("c", 5)], "bucket: string, cnt: long"
    )
    w1 = (dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2))
    w2 = (dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 3))
    wc = spark.createDataFrame(
        [(w1[0], w1[1], "a", 5), (w1[0], w1[1], "b", 5),
         (w2[0], w2[1], "b", 2), (w2[0], w2[1], "d", 3)],
        "window_start: timestamp, window_end: timestamp, bucket: string, cnt: long",
    )
    rep = windowed_drift_report(wc, base).collect()
    got = {}
    for r in rep:
        got.setdefault(r["window_start"], {})[r["bucket"]] = tuple(
            r[c] for c in ("freq_base", "freq_cur", "psi_term", "kl_term",
                           "js_term", "o_base", "o_cur", "n_base", "n_cur",
                           "chi2_term")
        )
    for win, rows in ((w1, [("a", 5), ("b", 5)]), (w2, [("b", 2), ("d", 3)])):
        cur = spark.createDataFrame(rows, "bucket: string, cnt: long")
        want = {
            r["bucket"]: tuple(
                r[c] for c in ("freq_base", "freq_cur", "psi_term", "kl_term",
                               "js_term", "o_base", "o_cur", "n_base", "n_cur",
                               "chi2_term")
            )
            for r in drift_and_chi2_terms(cur, base).collect()
        }
        assert got[win[0]] == want  # bit-identical per window


def test_windowed_ks_report_matches_per_window(spark):
    """windowed_ks_report rows for each window equal ks_w1_from_counts(
    baseline, that window's counts, with_chi2=True) — the windowed grid with
    the unoccupied-point filter reproduces the unwindowed statistics per
    window, including W1 interval merging across dropped grid points and the
    chi2/dof pair; n_cur/n_base map to the unwindowed n_b/n_a."""
    import datetime as dt

    import pytest

    from schema_infer_plugin_spark.checks.ksdrift import (
        ks_w1_from_counts,
        windowed_ks_report,
    )

    base = spark.createDataFrame(
        [(0.0, 10), (4.0, 30), (8.0, 5), (12.0, 4)], "v: double, cnt: long"
    )
    wa = (dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2))
    wb = (dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 3))
    wc = spark.createDataFrame(
        [(*wa, 0.0, 5), (*wa, 8.0, 7),
         # 16.0 exists in this window ONLY: in the other window the
         # (window, 16.0) grid point is unoccupied on both sides and dropped
         (*wb, 4.0, 2), (*wb, 16.0, 3)],
        "window_start: timestamp, window_end: timestamp, v: double, cnt: long",
    )
    rep = {r["window_start"]: r for r in windowed_ks_report(wc, base).collect()}
    assert set(rep) == {wa[0], wb[0]}
    for win, rows in ((wa, [(0.0, 5), (8.0, 7)]), (wb, [(4.0, 2), (16.0, 3)])):
        cur = spark.createDataFrame(rows, "v: double, cnt: long")
        want = ks_w1_from_counts(base, cur, with_chi2=True).collect()[0]
        got = rep[win[0]]
        assert got["ks_stat"] == want["ks_stat"]
        assert got["ks_at"] == want["ks_at"]
        assert got["dof"] == want["dof"]
        assert (got["n_cur"], got["n_base"]) == (want["n_b"], want["n_a"])
        # double SUMS: same terms, possibly different accumulation order
        assert got["w1"] == pytest.approx(want["w1"], rel=1e-12)
        assert got["chi2"] == pytest.approx(want["chi2"], rel=1e-12)
