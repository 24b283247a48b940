"""Checkpoint-resume runner: kill/rerun equals single-shot (SURVEY.md §7.6)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from schema_infer_plugin_spark.plans.ledger import completed_keys, read_ledger
from schema_infer_plugin_spark.plans.runner import PASS_B, run_profile, run_validation
from schema_infer_plugin_spark.plans.validate import CHECK_NAMES, validate_transcripts
from schema_infer_plugin_spark.sources.synth import synth_transcripts

N_BUCKETS = 8
BATCH = 2


def _violations(spark, out):
    return spark.read.parquet(os.path.join(out, "violations"))


def test_resume_after_injected_crash_matches_single_shot(spark, tmp_path):
    t = synth_transcripts(spark, 3_000).persist()
    try:
        single = str(tmp_path / "single")
        resumed = str(tmp_path / "resumed")

        s = run_validation(spark, t, single, n_buckets=N_BUCKETS, batch_buckets=BATCH)
        assert s["processed"] == N_BUCKETS and s["skipped"] == 0

        with pytest.raises(RuntimeError, match="injected failure"):
            run_validation(
                spark, t, resumed, n_buckets=N_BUCKETS, batch_buckets=BATCH,
                fail_after_batches=2,
            )
        done_mid = completed_keys(spark, resumed, "run0", PASS_B)
        assert len(done_mid) == 2 * BATCH  # partial progress is durable

        r = run_validation(spark, t, resumed, n_buckets=N_BUCKETS, batch_buckets=BATCH)
        assert r["skipped"] == 2 * BATCH
        assert r["processed"] == N_BUCKETS - 2 * BATCH

        a = _violations(spark, single).drop("partition_key")
        b = _violations(spark, resumed).drop("partition_key")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

        # and the runner's output matches the fused plan run directly
        direct = validate_transcripts(t)
        assert direct.count() == b.count()
    finally:
        t.unpersist()


def test_ledger_lineage_metrics(spark, tmp_path):
    t = synth_transcripts(spark, 1_000)
    out = str(tmp_path / "run")
    run_validation(spark, t, out, n_buckets=4, batch_buckets=4)
    led = read_ledger(spark, out).filter(F.col("pass_name") == PASS_B)
    rows = led.collect()
    assert {r["partition_key"] for r in rows} == {"0", "1", "2", "3"}
    assert sum(r["rows_processed"] for r in rows) == t.count()
    assert all(r["wall_sec"] > 0 for r in rows)
    total_viol = sum(r["violation_count"] for r in rows)
    assert total_viol == validate_transcripts(t).count()


def test_verdicts_cover_every_bucket_and_check(spark, tmp_path):
    t = synth_transcripts(spark, 1_000)
    out = str(tmp_path / "run")
    run_validation(spark, t, out, n_buckets=4, batch_buckets=2)
    verd = spark.read.parquet(os.path.join(out, "verdicts"))
    assert verd.count() == 4 * len(CHECK_NAMES)
    # pass=True rows have zero violations, and vice versa
    bad = verd.filter(
        (F.col("pass") & (F.col("violation_count") > 0))
        | (~F.col("pass") & (F.col("violation_count") == 0))
    )
    assert bad.count() == 0


def test_runner_keeps_keyless_rows(spark, tmp_path):
    """NULL-key rows must survive the bucketed runner end to end: Spark's
    xxhash64(NULL) is the stable seeded hash (NOT NULL), so keyless rows land
    deterministically in one bucket and their not_null_* violations reach the
    violations sink and the ledger row counts — nothing silently vanishes."""
    t = synth_transcripts(spark, 500)
    extra = spark.createDataFrame(
        [(None, 7, "user", "x", None, None), ("conv_keyless", None, "user", "x", None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    both = t.unionByName(extra)
    out = str(tmp_path / "run")
    run_validation(spark, both, out, n_buckets=4, batch_buckets=4)
    led = read_ledger(spark, out).filter(F.col("pass_name") == PASS_B)
    assert sum(r["rows_processed"] for r in led.collect()) == both.count()
    viol = spark.read.parquet(os.path.join(out, "violations"))
    assert viol.filter(F.col("check_name") == "not_null_conv_id").count() == 1
    assert viol.filter(F.col("check_name") == "not_null_turn_idx").count() == 1


def test_custom_rules_ride_validation_run(spark, tmp_path):
    """Config-declared expression constraints (checks/custom) union with the
    fused plan's violations and extend every bucket's verdict grid."""
    import pytest

    t = synth_transcripts(spark, 500)
    out = str(tmp_path / "run")
    rules = [("turn_cap_3", "turn_idx <= 3", "turn_idx", "turn_idx", "<= 3")]
    run_validation(spark, t, out, n_buckets=4, batch_buckets=2, custom_rules=rules)

    viol = spark.read.parquet(os.path.join(out, "violations"))
    n_custom = viol.filter(F.col("check_name") == "turn_cap_3").count()
    assert n_custom == t.filter("turn_idx > 3").count() and n_custom > 0
    # built-in rows unchanged by the union
    assert viol.filter(
        F.col("check_name") != "turn_cap_3"
    ).count() == validate_transcripts(t).count()

    verd = spark.read.parquet(os.path.join(out, "verdicts"))
    assert verd.count() == 4 * (len(CHECK_NAMES) + 1)
    custom_verd = verd.filter(F.col("check_name") == "turn_cap_3")
    assert custom_verd.count() == 4  # one verdict per bucket
    assert custom_verd.filter(~F.col("pass")).count() > 0

    with pytest.raises(ValueError, match="collide"):
        run_validation(
            spark, t, str(tmp_path / "run2"), n_buckets=2, batch_buckets=2,
            custom_rules=[("uniqueness", "1=1", "x", "x", "dup name")],
        )


def test_boundary_check_rides_validation_run(spark, tmp_path):
    """Opt-in conversation boundary check (checks/boundaries.py) unions with
    the fused plan's violations and extends the verdict grid — same additive
    posture as custom rules; name collisions with its check names raise."""
    from schema_infer_plugin_spark.checks.boundaries import conv_boundary_violations

    t = synth_transcripts(spark, 500)
    out = str(tmp_path / "run")
    roles = (["user", "system"], ["assistant", "tool"])
    run_validation(
        spark, t, out, n_buckets=4, batch_buckets=2, boundary_roles=roles
    )

    viol = spark.read.parquet(os.path.join(out, "violations"))
    bnames = {"conv_start_role", "conv_end_role"}
    n_boundary = viol.filter(F.col("check_name").isin(*bnames)).count()
    assert n_boundary == conv_boundary_violations(t).count() > 0
    assert viol.filter(
        ~F.col("check_name").isin(*bnames)
    ).count() == validate_transcripts(t).count()

    verd = spark.read.parquet(os.path.join(out, "verdicts"))
    assert verd.count() == 4 * (len(CHECK_NAMES) + 2)
    assert verd.filter(F.col("check_name").isin(*bnames)).count() == 8

    with pytest.raises(ValueError, match="collide"):
        run_validation(
            spark, t, str(tmp_path / "run2"), n_buckets=2, batch_buckets=2,
            boundary_roles=roles,
            custom_rules=[("conv_start_role", "1=1", "x", "x", "dup name")],
        )


def test_transition_domain_rides_validation_run(spark, tmp_path):
    """Opt-in transition-whitelist check (checks/alternation.
    transition_domain_violations) unions with the fused plan's violations and
    extends the verdict grid — same additive posture as custom rules and the
    boundary check."""
    from schema_infer_plugin_spark.checks import transition_domain_violations

    t = synth_transcripts(spark, 500)
    out = str(tmp_path / "run")
    allowed = ["user->assistant", "assistant->user", "assistant->tool",
               "tool->assistant", "system->user"]
    run_validation(
        spark, t, out, n_buckets=4, batch_buckets=2,
        allowed_transitions=allowed,
    )

    viol = spark.read.parquet(os.path.join(out, "violations"))
    n_tr = viol.filter(F.col("check_name") == "role_transition_domain").count()
    assert n_tr == transition_domain_violations(t, allowed).count() > 0
    assert viol.filter(
        F.col("check_name") != "role_transition_domain"
    ).count() == validate_transcripts(t).count()

    verd = spark.read.parquet(os.path.join(out, "verdicts"))
    assert verd.count() == 4 * (len(CHECK_NAMES) + 1)
    assert verd.filter(F.col("check_name") == "role_transition_domain").count() == 4

    with pytest.raises(ValueError, match="collide"):
        run_validation(
            spark, t, str(tmp_path / "run2"), n_buckets=2, batch_buckets=2,
            allowed_transitions=allowed,
            custom_rules=[("role_transition_domain", "1=1", "x", "x", "dup")],
        )


def test_one_input_scan_per_batch(spark, tmp_path):
    """VERDICT r2 #2 acceptance: ledger row counts now ride the violations
    write job as observations — each batch reads its input EXACTLY once. An
    accumulator-instrumented conv_id column counts evaluations: the old
    groupBy().count().collect() path made this 2× the row count."""
    from pyspark.sql.types import StringType

    t = synth_transcripts(spark, 300)
    n_rows = t.count()
    acc = spark.sparkContext.accumulator(0)

    def tick(v):
        acc.add(1)
        return v

    # asNondeterministic stops Catalyst duplicating the UDF into pushed-down
    # filters — each surviving evaluation then maps 1:1 to a scanned row
    udf = F.udf(tick, StringType()).asNondeterministic()
    instrumented = t.withColumn("conv_id", udf("conv_id"))
    out = str(tmp_path / "run")
    run_validation(spark, instrumented, out, n_buckets=4, batch_buckets=4)
    assert acc.value == n_rows  # one scan; the double-scan bug reads 2×

    # and the observation-fed ledger still carries exact per-bucket counts
    led = read_ledger(spark, out).filter(F.col("pass_name") == PASS_B)
    rows = led.collect()
    assert sum(r["rows_processed"] for r in rows) == n_rows
    assert sum(r["violation_count"] for r in rows) == validate_transcripts(t).count()


def test_profile_pass_resumes_without_recompute(spark, tmp_path):
    t = synth_transcripts(spark, 500)
    out = str(tmp_path / "run")
    p1 = run_profile(spark, t, out)
    n_ledger = read_ledger(spark, out).count()
    p2 = run_profile(spark, t, out)  # second call: served from disk
    assert read_ledger(spark, out).count() == n_ledger
    assert p1.count() == p2.count()


def test_inferred_domains_drive_validation(spark):
    """--infer-domains mode: inferred_domain_values returns the bounded
    accepted set, and run-validation wiring with it equals an explicit-domain
    run — inference-first validation without configured constants."""
    from schema_infer_plugin_spark.checks.domains import inferred_domain_values
    from schema_infer_plugin_spark.plans.validate import validate_transcripts

    t = synth_transcripts(spark, 5_000).persist()
    try:
        roles = inferred_domain_values(t, "role", coverage=0.999)
        # the common roles are accepted; the 5e-5-rate injected 'moderator'
        # cannot clear a 99.9% cumulative bar
        assert {"user", "assistant", "system", "tool"} <= set(roles)
        assert "moderator" not in roles
        inferred = validate_transcripts(t, role_domain=roles)
        explicit = validate_transcripts(t, role_domain=sorted(roles))
        assert inferred.exceptAll(explicit).count() == 0
        assert explicit.exceptAll(inferred).count() == 0
        # moderator rows ARE flagged under the inferred domain
        assert (
            inferred.filter(
                (F.col("check_name") == "domain_role")
                & (F.col("observed") == "moderator")
            ).count()
            > 0
        )
    finally:
        t.unpersist()


def test_violations_sample_bounded_and_deterministic(spark):
    from schema_infer_plugin_spark.operators.violations import violations_sample
    from schema_infer_plugin_spark.plans.validate import validate_transcripts

    t = synth_transcripts(spark, 2_000)
    viol = validate_transcripts(t)
    s = violations_sample(viol, k=3)
    per_check = {r["check_name"]: r["n"] for r in s.groupBy("check_name").agg(F.count("*").alias("n")).collect()}
    assert per_check and all(n <= 3 for n in per_check.values())
    a = sorted(map(tuple, s.drop("detail").collect()))
    b = sorted(map(tuple, violations_sample(viol, k=3).drop("detail").collect()))
    assert a == b


def test_write_triage_artifact(spark, tmp_path):
    """The runner's triage artifact is bounded (≤ k per check), stamped with
    run_id, and derived from the written violations."""
    from schema_infer_plugin_spark.plans.runner import write_triage

    t = synth_transcripts(spark, 2_000)
    out = str(tmp_path / "run")
    run_validation(spark, t, out, n_buckets=8, batch_buckets=8)
    n = write_triage(spark, out, k=4, run_id="run0")
    got = spark.read.parquet(str(tmp_path / "run" / "violations_triage"))
    assert n == got.count() > 0
    per_check = {
        r["check_name"]: r["n"]
        for r in got.groupBy("check_name").agg(F.count("*").alias("n")).collect()
    }
    assert all(v <= 4 for v in per_check.values())
    assert got.select("run_id").distinct().collect()[0][0] == "run0"
    # deterministic: rewriting yields identical rows (materialize before the
    # overwrite invalidates the first read's file listing)
    rows_a = sorted(map(tuple, got.collect()))
    write_triage(spark, out, k=4, run_id="run0")
    again = spark.read.parquet(str(tmp_path / "run" / "violations_triage"))
    assert sorted(map(tuple, again.collect())) == rows_a


def test_write_scorecard_artifact_matches_modular_scorecard(spark, tmp_path):
    """The runner's scorecard artifact (VERDICT r3 #5) equals
    violations_scorecard over the same validation output — i.e. the
    production runner now emits exactly what the driver's quality_scorecard
    query computes, plus the run_id stamp."""
    from schema_infer_plugin_spark.operators.violations import violations_scorecard
    from schema_infer_plugin_spark.plans.runner import write_scorecard

    t = synth_transcripts(spark, 2_000).persist()
    try:
        out = str(tmp_path / "run")
        run_validation(spark, t, out, n_buckets=8, batch_buckets=8)
        n = write_scorecard(spark, out, run_id="run0")
        card = spark.read.parquet(os.path.join(out, "scorecard"))
        assert n == card.count() > 0
        assert card.select("run_id").distinct().collect()[0][0] == "run0"
        # row equality vs the modular scorecard over the fused validation run
        # directly on the input (the artifact is derived from WRITTEN
        # violations — same rows by the runner's row-identity invariant)
        expect = sorted(
            map(tuple, violations_scorecard(validate_transcripts(t)).collect())
        )
        got = sorted(map(tuple, card.drop("run_id").collect()))
        assert got == expect
        # the __all__ grand-total row is always present
        assert any(r[0] == "__all__" for r in got)
    finally:
        t.unpersist()


def test_violations_diff_new_and_resolved(spark, tmp_path):
    """Row-level violation regression gate (run_violations_diff): NEW =
    identity in the current run only, RESOLVED = baseline only; pass iff no
    new rows. Built by running validation over two corpora whose injected
    violations differ by a known conversation slice."""
    from schema_infer_plugin_spark.plans.runner import run_violations_diff

    full = synth_transcripts(spark, 2_000).persist()
    try:
        # baseline: only the first half of conversations; current: all of them
        # -> every violation in the second half is NEW, none are RESOLVED
        half = full.filter(F.col("conv_id").substr(6, 8).cast("long") % 2 == 0)
        base_out, cur_out = str(tmp_path / "base"), str(tmp_path / "cur")
        run_validation(spark, half, base_out, n_buckets=4, batch_buckets=4)
        run_validation(spark, full, cur_out, n_buckets=4, batch_buckets=4)
        verd = run_violations_diff(spark, cur_out, base_out, run_id="r")
        rows = {r["check_name"]: r for r in verd.collect()}
        assert rows  # the synth corpus injects violations
        total_new = sum(r["n_new"] for r in rows.values())
        total_resolved = sum(r["n_resolved"] for r in rows.values())
        assert total_new > 0 and total_resolved == 0
        assert all((r["n_new"] == 0) == r["pass"] for r in rows.values())
        # every baseline violation still exists in current (superset corpus)
        assert all(
            r["n_current"] == r["n_baseline"] + r["n_new"] for r in rows.values()
        )
        # the regression sample artifact is bounded and non-empty
        new_sample = spark.read.parquet(str(tmp_path / "cur" / "violations_new"))
        assert 0 < new_sample.count() <= 100 * len(rows)
        # resumable: second call reads the verdict back without recompute
        again = run_violations_diff(spark, cur_out, base_out, run_id="r")
        assert sorted(map(tuple, again.collect())) == sorted(map(tuple, verd.collect()))
    finally:
        full.unpersist()
