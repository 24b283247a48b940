"""Checkpoint-resumable validation runner + spark-submit entrypoint.

The full Pass A (profile) / Pass B (constraints) pipeline over a transcripts
table, split into conversation-aligned hash buckets::

    partition_key = pmod(xxhash64(conv_id), n_buckets)

Bucketing by conv_id keeps every conversation whole inside one bucket, so the
fused validation plan (uniqueness + contiguity windows over conv_id) is exact
per bucket and buckets are embarrassingly parallel — the unit of both resume
and lineage. On an Iceberg deployment the table carries a precomputed
``partition_key`` column (this module's ``with_partition_key``) with an
IDENTITY partition on it, so each batch's filter prunes at the manifest level
instead of re-scanning; on plain parquet the filter is a scan-side predicate.
Do NOT partition by Iceberg's own ``bucket(N, conv_id)`` — that transform is
Murmur3 (Iceberg spec) and never agrees with this engine's
``pmod(xxhash64(conv_id), N)`` keys, so metadata pruning against it would skip
live buckets; the runner verifies the scheme and refuses to prune when it
can't (sources/metadata.py sidecar + table-property checks).

Resume: completed buckets are read from the ledger and skipped; outputs are
written partitioned by ``partition_key`` with per-bucket overwrite-by-filter
semantics approximated as append-once (a bucket only ever completes once — the
ledger row and the data files for a bucket are written in that order, so a
crash between them re-runs the bucket and overwrites its directory).

CLI (spark-submit --py-files engine.zip -m runner style)::

    python -m schema_infer_plugin_spark.plans.runner \
        --input /root/testdata/sf0.01 --out /tmp/run1 --run-id r1 \
        --n-buckets 64 --batch-buckets 16
"""

from __future__ import annotations

import argparse
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

from schema_infer_plugin_spark.operators.profile import profile
from schema_infer_plugin_spark.operators.violations import verdicts
from schema_infer_plugin_spark.plans.ledger import append_ledger, completed_keys
from schema_infer_plugin_spark.plans.validate import CHECK_NAMES, validate_transcripts

PASS_B = "validate"
PASS_A = "profile"

PROFILE_COLS = ["conv_id", "turn_idx", "role", "text", "tool"]


def with_partition_key(df: DataFrame, n_buckets: int) -> DataFrame:
    return df.withColumn(
        "partition_key",
        F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("string"),
    )


def write_bucketed(df: DataFrame, path: str, n_buckets: int) -> None:
    """Write ``df`` as the engine's bucketed layout: hive-partitioned by
    ``with_partition_key`` plus the ``_bucket_scheme.json`` sidecar that later
    runs verify before metadata-pruning (a dir without a matching sidecar is
    scanned in full — never pruned)."""
    from schema_infer_plugin_spark.sources.metadata import write_bucket_scheme

    keyed = df if "partition_key" in df.columns else with_partition_key(df, n_buckets)
    keyed.write.mode("overwrite").partitionBy("partition_key").parquet(path)
    write_bucket_scheme(path, n_buckets)


def run_validation(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    run_id: str = "run0",
    n_buckets: int = 64,
    batch_buckets: int = 16,
    fail_after_batches: int | None = None,
    on_batch: Callable[[list[str]], None] | None = None,
    role_domain: list[str] | None = None,
    tool_domain: list[str] | None = None,
    bucket_rows: dict[str, int] | None = None,
    custom_rules: list | None = None,
    boundary_roles: tuple[list[str], list[str]] | None = None,
    allowed_transitions: list[str] | None = None,
) -> dict:
    """Pass B over ``transcripts`` with bucket-level checkpoint-resume.

    ``custom_rules``: user-declared (name, predicate, column, observed,
    expected) constraints (checks/custom.expr_suite_violations), unioned with
    the fused plan's violations and added to every bucket's verdict grid.
    Cost when present: ONE extra scan of each batch (the fused plan's
    text-pruned shuffle invariant is pinned — arbitrary rule columns must not
    enter it); zero cost when absent.

    ``boundary_roles``: (allowed_first, allowed_last) role sets for the
    conversation boundary check (checks/boundaries.py) — same additive
    posture as custom rules (one extra scan + its own conv_id window per
    batch when present; conv_start_role / conv_end_role join the verdict
    grid), deliberately NOT folded into the fused plan (its window set and
    verdict grid are pinned by tests/test_plans.py).

    ``allowed_transitions``: 'prev->next' whitelist for the transition-domain
    check (checks/alternation.transition_domain_violations) — same additive
    posture (one extra scan + lag window per batch when present;
    role_transition_domain joins the verdict grid).

    Returns summary metrics. ``fail_after_batches`` injects a crash after that
    many completed batches (tests prove resumability with it). Domains default
    to the schema constants; a config file overrides them (config.py).

    ``bucket_rows``: metadata-derived row count per partition_key. Buckets
    whose metadata count is 0 — or absent — are metadata-pruned: their PASS
    verdicts and ledger rows are emitted from the driver without EVER
    scheduling a scan of the input (reference empty-topic skip,
    plugin/optimistic.py:387-510). PRECONDITION: the counts must describe
    partition values produced by ``with_partition_key`` at the SAME
    ``n_buckets`` — use sources/metadata.verified_partition_counts /
    iceberg_verified_counts (as ``main`` does), which verify the persisted
    scheme and return None when they can't; counts keyed by any other hash
    (e.g. Iceberg ``bucket(N, conv_id)`` Murmur3) would prune live buckets."""
    custom_rules = list(custom_rules or [])
    boundary_checks = ["conv_start_role", "conv_end_role"] if boundary_roles else []
    if allowed_transitions:
        boundary_checks = boundary_checks + ["role_transition_domain"]
    clash = {r[0] for r in custom_rules} & set(CHECK_NAMES + boundary_checks)
    if clash:
        raise ValueError(f"custom rule names collide with built-in checks: {sorted(clash)}")
    check_names = CHECK_NAMES + boundary_checks + [r[0] for r in custom_rules]
    keyed = with_partition_key(transcripts, n_buckets)
    all_keys = [str(i) for i in range(n_buckets)]
    done = completed_keys(spark, out_dir, run_id, PASS_B)
    pending = [k for k in all_keys if k not in done]

    viol_dir = os.path.join(out_dir, "violations")
    verd_dir = os.path.join(out_dir, "verdicts")

    pruned: list[str] = []
    if bucket_rows is not None:
        pruned = [k for k in pending if bucket_rows.get(k, 0) == 0]
        pending = [k for k in pending if k not in set(pruned)]
        if pruned:
            t0 = time.time()
            # every pruned (bucket, check) gets an explicit PASS verdict built
            # from driver-local rows — the input table is not read
            grid = spark.createDataFrame([(k,) for k in pruned], ["partition_key"])
            empty_viol = spark.createDataFrame(
                [],
                "check_name string, conv_id string, turn_idx int, column string,"
                " observed string, expected string, partition_key string",
            )
            (
                verdicts(empty_viol, grid, check_names, run_id=run_id)
                .repartition("partition_key")
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("partition_key")
                .parquet(verd_dir)
            )
            wall = (time.time() - t0) / len(pruned)
            append_ledger(
                spark, out_dir, run_id, PASS_B, [(k, 0, 0, wall) for k in pruned]
            )
    batches = [
        pending[i : i + batch_buckets] for i in range(0, len(pending), batch_buckets)
    ]
    total_rows = 0
    total_viol = 0
    for b_i, batch in enumerate(batches):
        t0 = time.time()
        # Ledger metrics ride the write job as CollectMetrics observations —
        # per-bucket input rows and violation rows cost ZERO extra scans
        # (VERDICT r2 #2: the old groupBy().count().collect() scheduled a
        # second full read of each batch's input just to fill the ledger).
        obs_rows = Observation(f"rows_b{b_i}")
        obs_viol = Observation(f"viol_b{b_i}")
        part = keyed.filter(F.col("partition_key").isin(batch)).observe(
            obs_rows,
            *[
                F.count(F.when(F.col("partition_key") == k, True)).alias(f"n_{k}")
                for k in batch
            ],
        )
        # partition_key is a pure function of conv_id — recompute, don't join.
        checked = validate_transcripts(part, role_domain, tool_domain)
        if boundary_roles:
            from schema_infer_plugin_spark.checks.boundaries import (
                conv_boundary_violations,
            )

            checked = checked.unionByName(
                conv_boundary_violations(
                    part, tuple(boundary_roles[0]), tuple(boundary_roles[1])
                )
            )
        if allowed_transitions:
            from schema_infer_plugin_spark.checks.alternation import (
                transition_domain_violations,
            )

            checked = checked.unionByName(
                transition_domain_violations(part, allowed_transitions)
            )
        if custom_rules:
            from schema_infer_plugin_spark.checks.custom import expr_suite_violations

            checked = checked.unionByName(
                expr_suite_violations(part, [tuple(r) for r in custom_rules])
            )
        viol = (
            checked
            .withColumn(
                "partition_key",
                F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("string"),
            )
            .observe(
                obs_viol,
                *[
                    F.count(F.when(F.col("partition_key") == k, True)).alias(f"n_{k}")
                    for k in batch
                ],
            )
        )
        # One job: violations written partitioned + stably ordered within bucket.
        # Dynamic partition overwrite makes a bucket write idempotent: a crash
        # between data write and ledger append re-runs the bucket and replaces
        # (not duplicates) its directory.
        (
            viol.repartition("partition_key")
            .sortWithinPartitions("conv_id", "turn_idx", "check_name")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("partition_key")
            .parquet(viol_dir)
        )
        # .get blocks on the completed write action — no extra job
        row_counts = {k: obs_rows.get[f"n_{k}"] for k in batch}
        viol_counts = {k: obs_viol.get[f"n_{k}"] for k in batch}
        # partition-column type inference reads the key back as int — restore string
        viol_written = (
            spark.read.parquet(viol_dir)
            .withColumn("partition_key", F.col("partition_key").cast("string"))
            .filter(F.col("partition_key").isin(batch))
        )
        grid = spark.createDataFrame([(k,) for k in batch], ["partition_key"])
        (
            verdicts(viol_written, grid, check_names, run_id=run_id)
            .repartition("partition_key")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("partition_key")
            .parquet(verd_dir)
        )
        wall = time.time() - t0
        metrics = [
            (
                k,
                int(row_counts.get(k, 0)),
                int(viol_counts.get(k, 0)),
                wall / max(len(batch), 1),
            )
            for k in batch
        ]
        append_ledger(spark, out_dir, run_id, PASS_B, metrics)
        total_rows += sum(m[1] for m in metrics)
        total_viol += sum(m[2] for m in metrics)
        if on_batch is not None:
            on_batch(batch)
        if fail_after_batches is not None and b_i + 1 >= fail_after_batches:
            raise RuntimeError(f"injected failure after batch {b_i + 1}")
    return {
        "run_id": run_id,
        "buckets": n_buckets,
        "skipped": len(done),
        "pruned": len(pruned),
        "processed": len(pending),
        "rows": total_rows,
        "violations": total_viol,
    }


def run_profile(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    run_id: str = "run0",
    columns: list[str] | None = None,
) -> DataFrame:
    """Pass A: single-scan wide profile, written once (not bucketed — the
    profile is one agg over the table; resume granularity is the whole pass)."""
    prof_dir = os.path.join(out_dir, "profiles")
    done = completed_keys(spark, out_dir, run_id, PASS_A)
    if "__all__" in done:
        return spark.read.parquet(prof_dir)
    t0 = time.time()
    prof = profile(transcripts, columns or PROFILE_COLS, run_id=run_id)
    prof.coalesce(1).write.mode("overwrite").parquet(prof_dir)
    nrows = spark.read.parquet(prof_dir).count()
    append_ledger(spark, out_dir, run_id, PASS_A, [("__all__", nrows, 0, time.time() - t0)])
    return spark.read.parquet(prof_dir)


PASS_DRIFT = "drift"

DRIFT_COLUMNS = ["role", "tool"]
NUMERIC_DRIFT_COLUMNS = ["turn_idx"]
KS_GRID_BUCKETS = 1000


def write_histograms(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    columns: list[str] | None = None,
    numeric_columns: list[str] | None = None,
) -> None:
    """Persist the drift baselines for future runs: per-column value
    histograms (categorical → PSI/KL/JS) and fixed-grid numeric counts
    (→ two-sample KS). The numeric grid is [min, max] of THIS run's data —
    future runs clamp onto it (checks/ksdrift.py fixed-grid notes)."""
    from schema_infer_plugin_spark.checks.drift import histogram_with_counts
    from schema_infer_plugin_spark.checks.ksdrift import grid_counts

    hist_dir = os.path.join(out_dir, "histograms")
    # (bucket, freq, cnt): freq is the same division histogram() computes
    # (PSI/KL/JS unchanged); cnt makes the artifact chi-square-capable
    # (run_drift's sample-size-aware leg). Old freq-only baselines still read.
    for c in columns or DRIFT_COLUMNS:
        (
            histogram_with_counts(transcripts, c)
            .withColumn("column", F.lit(c))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(hist_dir, c))
        )
    # sequence-structure baseline: the (prev_role -> role) transition
    # distribution as a pseudo-column — run_drift diffs it with the same
    # PSI/KL/JS machinery (checks/alternation.transition_histogram)
    from schema_infer_plugin_spark.checks.alternation import transition_buckets

    (
        histogram_with_counts(transition_buckets(transcripts), "bucket")
        .withColumn("column", F.lit("__transitions__"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(hist_dir, "__transitions__"))
    )
    num_dir = os.path.join(out_dir, "histograms_numeric")
    # explicit [] means "no numeric baselines" — only None takes the default
    for c in NUMERIC_DRIFT_COLUMNS if numeric_columns is None else numeric_columns:
        # bounded 2-value collect: baseline/index construction, not a per-row
        # probe — same posture as ivf_centroids
        lo, hi = transcripts.agg(
            F.min(F.col(c).cast("double")), F.max(F.col(c).cast("double"))
        ).first()
        if lo is None:
            continue  # all-null column: no numeric baseline to persist
        (
            grid_counts(transcripts, c, float(lo), float(hi), KS_GRID_BUCKETS)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(num_dir, c))
        )


def run_drift(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    baseline_dir: str,
    run_id: str = "run0",
    columns: list[str] | None = None,
    numeric_columns: list[str] | None = None,
    psi_threshold: float = 0.2,
    ks_threshold: float = 0.1,
) -> DataFrame:
    """Distribution drift of ``transcripts`` vs the baselines persisted under
    ``baseline_dir`` (a previous run's out_dir). One verdict row per column:
    categorical columns get ``drift_<col>`` (pass iff total PSI <= threshold;
    metrics carry psi/kl/js), numeric columns get ``ks_<col>`` (two-sample KS
    on the baseline's fixed grid; pass iff ks_stat <= ks_threshold, metrics
    carry ks/ks_at/w1 — Wasserstein-1 rides the same single-job plan, see
    checks/ksdrift.ks_w1_from_counts). Columns with no persisted numeric
    baseline are skipped.

    Thresholds follow the conventional readings: PSI <0.1 stable, 0.1-0.2
    moderate, >0.2 drifted (default 0.2); KS two-sample flags at ~0.1 for
    large same-source samples (default 0.1)."""
    from schema_infer_plugin_spark.checks.drift import (
        bucket_counts,
        drift_and_chi2_terms,
        drift_stats,
    )
    from schema_infer_plugin_spark.checks.ksdrift import grid_counts, ks_w1_from_counts

    done = completed_keys(spark, out_dir, run_id, PASS_DRIFT)
    verd_dir = os.path.join(out_dir, "drift_verdicts")
    if "__all__" in done:
        return spark.read.parquet(verd_dir)
    t0 = time.time()
    cols = DRIFT_COLUMNS if columns is None else columns
    num_cols = NUMERIC_DRIFT_COLUMNS if numeric_columns is None else numeric_columns

    def _chi2_z(chi2: float, dof: float) -> float:
        """Wilson–Hilferty: (χ²/k)^(1/3) is ≈ normal with mean 1 − 2/(9k),
        var 2/(9k) — one z-threshold works at ANY dof. Driver-side float
        math on collected metrics (reported evidence, never hash-compared)."""
        k9 = 2.0 / (9.0 * dof)
        return ((chi2 / dof) ** (1.0 / 3.0) - (1.0 - k9)) / (k9**0.5)

    def _cat_metrics(cur_counts, base) -> dict[str, float]:
        """PSI/KL/JS (+ chi2/dof when the baseline artifact carries counts)
        in ONE aggregation job. The pass criterion stays PSI — chi2 rides as
        calibrated evidence (asymptotically χ²(dof) under 'no drift'), only
        computable against count-bearing (post-r5) baselines; frequency-only
        baselines take the legacy drift_stats path, never fail."""
        if "cnt" in base.columns:
            terms = drift_and_chi2_terms(cur_counts, base.select("bucket", "cnt"))
            agg = terms.agg(
                F.sum("psi_term").alias("psi"), F.sum("kl_term").alias("kl"),
                F.sum("js_term").alias("js"), F.sum("chi2_term").alias("chi2"),
                F.count(F.lit(1)).alias("k"),
            ).collect()[0]
        else:
            total = cur_counts.agg(F.sum("cnt").alias("_n"))
            cur = cur_counts.crossJoin(F.broadcast(total)).select(
                "bucket", (F.col("cnt") / F.col("_n")).alias("freq")
            )
            agg = drift_stats(cur, base.select("bucket", "freq")).agg(
                F.sum("psi_term").alias("psi"), F.sum("kl_term").alias("kl"),
                F.sum("js_term").alias("js"),
            ).collect()[0]
        m = {"psi": float(agg["psi"]), "kl": float(agg["kl"]), "js": float(agg["js"])}
        if "chi2" in agg.asDict() and agg["chi2"] is not None:
            m["chi2"] = float(agg["chi2"])
            m["dof"] = float(agg["k"] - 1)
            if m["dof"] > 0:
                m["chi2_z"] = _chi2_z(m["chi2"], m["dof"])
        return m

    # (check_name, pass, metrics) — one row per column either way
    rows: list[tuple[str, bool, dict[str, float]]] = []
    for c in cols:
        base = spark.read.parquet(os.path.join(baseline_dir, "histograms", c)).drop(
            "column"
        )
        m = _cat_metrics(bucket_counts(transcripts, c), base)
        rows.append((f"drift_{c}", m["psi"] <= psi_threshold, m))
    # sequence-structure drift: the persisted transition distribution vs the
    # current one (lenient like the numeric leg — a baseline run that
    # predates transition baselines is skipped, never failed)
    tpath = os.path.join(baseline_dir, "histograms", "__transitions__")
    try:
        tbase = spark.read.parquet(tpath).drop("column")
    except Exception:
        tbase = None
    if tbase is not None:
        from schema_infer_plugin_spark.checks.alternation import transition_buckets

        m = _cat_metrics(
            bucket_counts(transition_buckets(transcripts), "bucket"), tbase
        )
        rows.append(("drift_transitions", m["psi"] <= psi_threshold, m))
    for c in num_cols:
        path = os.path.join(baseline_dir, "histograms_numeric", c)
        try:
            base = spark.read.parquet(path)
        except Exception:
            continue  # baseline run predates numeric baselines: skip, don't fail
        # grid metadata rides every baseline row (≤ KS_GRID_BUCKETS rows)
        meta = base.select("lo", "hi", "n_buckets").first()
        cur = grid_counts(
            transcripts, c, float(meta["lo"]), float(meta["hi"]), int(meta["n_buckets"])
        )
        # KS + Wasserstein-1 from the SAME single-job plan (ks_w1_from_counts)
        # — the current run's grid_counts scan feeds both statistics at once
        ks = ks_w1_from_counts(base.select("v", "cnt"), cur, with_chi2=True).collect()[0]
        stat = float(ks["ks_stat"]) if ks["ks_stat"] is not None else 1.0
        m = {
            "ks": stat,
            "ks_at": float(ks["ks_at"]) if ks["ks_at"] is not None else 0.0,
            "w1": float(ks["w1"]) if ks["w1"] is not None else 0.0,
        }
        # binned chi2 rides the SAME single job (pass criterion stays KS)
        if ks["chi2"] is not None and ks["dof"] is not None and ks["dof"] > 0:
            m["chi2"] = float(ks["chi2"])
            m["dof"] = float(ks["dof"])
            m["chi2_z"] = _chi2_z(m["chi2"], m["dof"])
        rows.append((f"ks_{c}", stat <= ks_threshold, m))
    verd = spark.createDataFrame(
        [(run_id, "__all__", name, ok, 0, metrics) for name, ok, metrics in rows],
        "run_id string, partition_key string, check_name string, pass boolean,"
        " violation_count long, metrics map<string, double>",
    )
    verd.coalesce(1).write.mode("overwrite").parquet(verd_dir)
    append_ledger(
        spark, out_dir, run_id, PASS_DRIFT, [("__all__", len(rows), 0, time.time() - t0)]
    )
    return spark.read.parquet(verd_dir)


PASS_PROFILE_DIFF = "profile_diff"


def run_profile_compare(
    spark: SparkSession,
    out_dir: str,
    baseline_dir: str,
    run_id: str = "run0",
) -> DataFrame:
    """Data-profile diff gate (plans/compare.py): OK/WARN/BREAKING verdicts
    per column between this run's persisted profile and the baseline run's.
    Complements run_schema_evolution — that pass applies the registry's
    declared-schema compat rules, this one classifies what the DATA actually
    did (null-rate shifts, distinct blow-ups, observed type changes).
    Ledger-resumable; violation_count = non-OK columns."""
    from schema_infer_plugin_spark.plans.compare import profile_compare

    done = completed_keys(spark, out_dir, run_id, PASS_PROFILE_DIFF)
    verd_dir = os.path.join(out_dir, "profile_diff_verdicts")
    if "__all__" in done:
        return spark.read.parquet(verd_dir)
    t0 = time.time()
    base = spark.read.parquet(os.path.join(baseline_dir, "profiles"))
    cur = spark.read.parquet(os.path.join(out_dir, "profiles"))
    diff = profile_compare(cur, base).withColumn("run_id", F.lit(run_id))
    diff.coalesce(1).write.mode("overwrite").parquet(verd_dir)
    written = spark.read.parquet(verd_dir)
    n_rows = written.count()
    n_bad = written.filter(F.col("verdict") != "OK").count()
    append_ledger(
        spark, out_dir, run_id, PASS_PROFILE_DIFF,
        [("__all__", n_rows, n_bad, time.time() - t0)],
    )
    return written


PASS_EVOLUTION = "schema_evolution"


def run_schema_evolution(
    spark: SparkSession,
    out_dir: str,
    baseline_dir: str,
    run_id: str = "run0",
    mode: str = "BACKWARD",
) -> DataFrame:
    """Schema-drift gate: the current run's inferred column profile must stay
    ``mode``-compatible with the baseline run's (operators/registry.py rules).
    One verdict row per issue, or a single PASS row; ledger-resumable."""
    from schema_infer_plugin_spark.operators.generators import fields_from_profile
    from schema_infer_plugin_spark.operators.registry import evolution_issues

    done = completed_keys(spark, out_dir, run_id, PASS_EVOLUTION)
    verd_dir = os.path.join(out_dir, "evolution_verdicts")
    if "__all__" in done:
        return spark.read.parquet(verd_dir)
    t0 = time.time()

    def _fields(d):
        rows = [r.asDict() for r in spark.read.parquet(os.path.join(d, "profiles")).collect()]
        return fields_from_profile(rows)

    issues = evolution_issues(_fields(baseline_dir), _fields(out_dir), mode)
    rows = [
        (run_id, "__all__", f"evolution_{mode.lower()}", False, i.kind, i.field, i.detail)
        for i in issues
    ] or [(run_id, "__all__", f"evolution_{mode.lower()}", True, None, None, None)]
    verd = spark.createDataFrame(
        rows,
        "run_id string, partition_key string, check_name string, pass boolean,"
        " kind string, field string, detail string",
    )
    verd.coalesce(1).write.mode("overwrite").parquet(verd_dir)
    append_ledger(
        spark, out_dir, run_id, PASS_EVOLUTION, [("__all__", len(rows), len(issues), time.time() - t0)]
    )
    return spark.read.parquet(verd_dir)


def write_triage(
    spark: SparkSession, out_dir: str, k: int = 100, run_id: str = "run0"
) -> int:
    """Write the bounded triage artifact: a deterministic md5-ranked k-row
    slice per check of the run's written violations
    (operators/violations.violations_sample) to ``violations_triage/``.
    One bounded job over the violations output (∝ errors, not input) — the
    file a human opens first when a 10^12-turn run reports failures.
    Returns the triage row count (≤ k × #checks)."""
    from schema_infer_plugin_spark.operators.violations import violations_sample

    viol_dir = os.path.join(out_dir, "violations")
    triage_dir = os.path.join(out_dir, "violations_triage")
    viol = spark.read.parquet(viol_dir).withColumn(
        "partition_key", F.col("partition_key").cast("string")
    )
    sample = violations_sample(viol, k=k).withColumn("run_id", F.lit(run_id))
    sample.coalesce(1).write.mode("overwrite").parquet(triage_dir)
    return spark.read.parquet(triage_dir).count()


PASS_VIOL_DIFF = "violations_diff"

#: a violation's identity across runs — expected is derived from the check
#: config (same rule → same expected), so it rides along rather than keying.
_VIOL_IDENTITY = ["check_name", "conv_id", "turn_idx", "column", "observed"]


def run_violations_diff(
    spark: SparkSession,
    out_dir: str,
    baseline_dir: str,
    run_id: str = "run0",
    k: int = 100,
) -> DataFrame:
    """Violation regression gate: which violations are NEW versus the
    baseline run, and which were RESOLVED — the first operational question
    after a producer or pipeline change. Complements run_profile_compare
    (distribution-level diff): this is ROW-level, over the two runs' WRITTEN
    violations, so the work is ∝ errors, never ∝ input.

    Plan: tag-union the two violation sets (+cur / +base markers), ONE hash
    aggregation on the violation identity, then a bounded per-check rollup —
    the same one-shuffle tagged-union shape as checks/referential.fk_coverage.
    Writes ``violations_diff_verdicts/`` (one row per check: n_current,
    n_baseline, n_new, n_resolved; pass iff n_new == 0) and
    ``violations_new/`` (md5-ranked ≤ k-per-check sample of the new rows —
    operators/violations.violations_sample reuse). Ledger-resumable.
    """
    from schema_infer_plugin_spark.operators.violations import violations_sample

    done = completed_keys(spark, out_dir, run_id, PASS_VIOL_DIFF)
    verd_dir = os.path.join(out_dir, "violations_diff_verdicts")
    if "__all__" in done:
        return spark.read.parquet(verd_dir)
    t0 = time.time()

    def _load(d):
        return (
            spark.read.parquet(os.path.join(d, "violations"))
            .select(*_VIOL_IDENTITY, "expected")
        )

    cur, base = _load(out_dir), _load(baseline_dir)
    tagged = cur.withColumn("in_cur", F.lit(1)).withColumn("in_base", F.lit(0)).unionByName(
        base.withColumn("in_cur", F.lit(0)).withColumn("in_base", F.lit(1))
    )
    per_identity = tagged.groupBy(*_VIOL_IDENTITY).agg(
        F.max("in_cur").alias("in_cur"),
        F.max("in_base").alias("in_base"),
        F.max("expected").alias("expected"),
    )
    verdict = (
        per_identity.groupBy("check_name")
        .agg(
            F.sum("in_cur").cast("long").alias("n_current"),
            F.sum("in_base").cast("long").alias("n_baseline"),
            F.sum(((F.col("in_cur") == 1) & (F.col("in_base") == 0)).cast("long"))
            .cast("long")
            .alias("n_new"),
            F.sum(((F.col("in_cur") == 0) & (F.col("in_base") == 1)).cast("long"))
            .cast("long")
            .alias("n_resolved"),
        )
        .withColumn("pass", F.col("n_new") == 0)
        .withColumn("run_id", F.lit(run_id))
    )
    verdict.coalesce(1).write.mode("overwrite").parquet(verd_dir)
    # bounded sample of the regressions only — the rows a human triages
    new_rows = per_identity.filter(
        (F.col("in_cur") == 1) & (F.col("in_base") == 0)
    ).select(*_VIOL_IDENTITY, "expected")
    violations_sample(new_rows, k=k).withColumn("run_id", F.lit(run_id)).coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "violations_new"))
    written = spark.read.parquet(verd_dir)
    n_new = written.agg(F.sum("n_new")).collect()[0][0] or 0
    append_ledger(
        spark, out_dir, run_id, PASS_VIOL_DIFF,
        [("__all__", written.count(), int(n_new), time.time() - t0)],
    )
    return written


def write_scorecard(spark: SparkSession, out_dir: str, run_id: str = "run0") -> int:
    """Write the per-check quality scorecard artifact (round-3 VERDICT #5):
    one health row per check plus the ``__all__`` grand total
    (operators/violations.violations_scorecard) over the run's WRITTEN
    violations, to ``scorecard/``. Like write_triage this aggregates the
    validation OUTPUT — one job ∝ violation rows, the input table is never
    re-scanned. Returns the scorecard row count (#checks-that-fired + 1)."""
    from schema_infer_plugin_spark.operators.violations import violations_scorecard

    viol_dir = os.path.join(out_dir, "violations")
    card_dir = os.path.join(out_dir, "scorecard")
    viol = spark.read.parquet(viol_dir)
    card = violations_scorecard(viol).withColumn("run_id", F.lit(run_id))
    card.coalesce(1).write.mode("overwrite").parquet(card_dir)
    return spark.read.parquet(card_dir).count()


def resolve_transcripts_input(
    spark: SparkSession, input_str: str, n_buckets: int | None = None
) -> tuple[DataFrame, dict[str, int] | None]:
    """Shared input resolution for the validation-family CLI faces:
    ``sf dir`` / ``synth:N`` / ``bucketed:DIR`` / ``iceberg:ns`` →
    (transcripts DataFrame, bucket_rows). bucket_rows (metadata-verified
    per-partition counts for empty-bucket pruning) is only non-None for
    bucketed:/iceberg: inputs whose persisted scheme verifies against
    ``n_buckets`` — any other dir scans in full."""
    from schema_infer_plugin_spark.sources.io import load_table
    from schema_infer_plugin_spark.sources.views import transcripts_from_events

    bucket_rows = None
    if input_str.startswith("synth:"):
        from schema_infer_plugin_spark.sources.synth import synth_transcripts

        t = synth_transcripts(spark, int(input_str.split(":", 1)[1]))
    elif input_str.startswith("bucketed:"):
        # production layout: the table was written by write_bucketed —
        # partitioned on partition_key WITH the scheme sidecar. Footer metadata
        # feeds empty-bucket pruning only when the sidecar proves the values
        # came from with_partition_key at THIS n_buckets; any other dir
        # (external tool, different bucket count, no sidecar) scans in full.
        from schema_infer_plugin_spark.sources.metadata import verified_partition_counts

        bdir = input_str.split(":", 1)[1]
        if n_buckets is not None:
            bucket_rows = verified_partition_counts(bdir, n_buckets)
        t = spark.read.parquet(bdir).drop("partition_key")
    elif input_str.startswith("iceberg:"):
        from schema_infer_plugin_spark.sources.metadata import iceberg_verified_counts

        table = f"{input_str.split(':', 1)[1]}.events"
        # manifest-only counts; only when the table's TBLPROPERTIES declare
        # the engine's own transform + n_buckets (identity partition on a
        # precomputed partition_key — never bucket(N, conv_id))
        if n_buckets is not None:
            bucket_rows = iceberg_verified_counts(spark, table, n_buckets)
        t = transcripts_from_events(spark, load_table(spark, input_str, "events"))
    else:
        t = transcripts_from_events(spark, load_table(spark, input_str, "events"))
    return t, bucket_rows


def main(argv: list[str] | None = None) -> None:
    from schema_infer_plugin_spark.session import get_spark

    from schema_infer_plugin_spark.config import ConfigError, load_config

    ap = argparse.ArgumentParser(description="transcripts validation run")
    ap.add_argument("--config", default=None, help="YAML/JSON config file (flags override)")
    ap.add_argument(
        "--input",
        default=None,
        help="sf dir, iceberg:ns, synth:N_convs, or bucketed:DIR (a transcripts"
        " parquet dir written by write_bucketed — its _bucket_scheme.json"
        " sidecar must match --n-buckets to enable metadata-only empty-bucket"
        " pruning; otherwise the dir is scanned in full)",
    )
    ap.add_argument("--out", required=True)
    ap.add_argument("--run-id", default="run0")
    ap.add_argument("--n-buckets", type=int, default=None)
    ap.add_argument("--batch-buckets", type=int, default=None)
    ap.add_argument(
        "--baseline",
        default=None,
        help="a previous run's --out dir; enables the KL/PSI drift pass",
    )
    ap.add_argument(
        "--infer-domains",
        action="store_true",
        help="derive role/tool domains from the DATA (checks/domains."
        "inferred_domain_values) instead of config/schema constants — the"
        " inference-first mode: values below --domain-coverage cumulative"
        " frequency become violations",
    )
    ap.add_argument(
        "--domain-coverage",
        type=float,
        default=0.999,
        help="cumulative-frequency bar for --infer-domains (default 0.999)",
    )
    ap.add_argument(
        "--triage-k",
        type=int,
        default=100,
        help="rows per check in the violations_triage artifact (0 disables)",
    )
    args = ap.parse_args(argv)
    try:
        cfg = load_config(args.config)
    except ConfigError as e:
        raise SystemExit(f"config error: {e}")
    args.input = args.input or cfg.tables.input
    if not args.input:
        raise SystemExit("--input is required (flag or config tables.input)")
    n_buckets = args.n_buckets if args.n_buckets is not None else cfg.validation.n_buckets
    batch_buckets = (
        args.batch_buckets if args.batch_buckets is not None else cfg.validation.batch_buckets
    )

    spark = get_spark(
        app_name=f"validate-{args.run_id}",
        master=cfg.performance.master,
        shuffle_partitions=cfg.performance.shuffle_partitions,
        extra_conf={
            "spark.sql.adaptive.enabled": str(cfg.performance.aqe).lower(),
            "spark.sql.files.maxPartitionBytes": cfg.performance.max_partition_bytes,
        },
    )
    t, bucket_rows = resolve_transcripts_input(spark, args.input, n_buckets)
    if bucket_rows is not None and set(bucket_rows) != {str(i) for i in range(n_buckets)}:
        # belt-and-braces behind the verified_* gates: pruning requires an
        # explicit count for EVERY bucket of this run's scheme — a key set
        # from any other transform or bucket count can't satisfy this, and
        # absent-key-means-empty is never assumed at this layer
        bucket_rows = None
    role_domain = cfg.validation.role_domain or None
    tool_domain = cfg.validation.tool_domain or None
    if args.infer_domains:
        from schema_infer_plugin_spark.checks.domains import inferred_domain_values

        role_domain = inferred_domain_values(t, "role", args.domain_coverage)
        tool_domain = inferred_domain_values(t, "tool", args.domain_coverage)
    run_profile(spark, t, args.out, run_id=args.run_id)
    write_histograms(spark, t, args.out)
    summary = run_validation(
        spark,
        t,
        args.out,
        run_id=args.run_id,
        n_buckets=n_buckets,
        batch_buckets=batch_buckets,
        role_domain=role_domain,
        tool_domain=tool_domain,
        bucket_rows=bucket_rows,
        custom_rules=cfg.validation.custom_rules,
        boundary_roles=(
            (cfg.validation.boundary_first_roles, cfg.validation.boundary_last_roles)
            if cfg.validation.boundary_first_roles and cfg.validation.boundary_last_roles
            else None
        ),
        allowed_transitions=cfg.validation.allowed_transitions or None,
    )
    if args.triage_k:
        summary["triage_rows"] = write_triage(
            spark, args.out, k=args.triage_k, run_id=args.run_id
        )
    summary["scorecard_rows"] = write_scorecard(spark, args.out, run_id=args.run_id)
    if args.baseline:
        drift = run_drift(
            spark, t, args.out, args.baseline, run_id=args.run_id,
            psi_threshold=cfg.validation.psi_threshold,
        )
        summary["drift"] = {
            r["check_name"]: (r["pass"], dict(r["metrics"])) for r in drift.collect()
        }
        evo = run_schema_evolution(spark, args.out, args.baseline, run_id=args.run_id)
        summary["schema_evolution"] = [
            (r["pass"], r["kind"], r["field"]) for r in evo.collect()
        ]
        pdiff = run_profile_compare(spark, args.out, args.baseline, run_id=args.run_id)
        summary["profile_diff"] = {
            r["col_name"]: r["verdict"] for r in pdiff.collect()
        }
        vdiff = run_violations_diff(spark, args.out, args.baseline, run_id=args.run_id)
        summary["violations_diff"] = {
            r["check_name"]: (r["pass"], int(r["n_new"]), int(r["n_resolved"]))
            for r in vdiff.collect()
        }
    print(summary)


if __name__ == "__main__":
    main()
