"""Metadata-only pruning (S7/A9): footer row counts, empty-bucket skip
without scheduling a scan."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from schema_infer_plugin_spark.sources.metadata import (
    partition_row_counts,
    parquet_file_rows,
    prune_empty_tables,
    table_is_empty,
    table_row_count,
)

SF = "/root/testdata/sf0.001"


def test_footer_counts_match_actual_rows(spark):
    meta_n = table_row_count(f"{SF}/events.parquet")
    assert meta_n == spark.read.parquet(f"{SF}/events.parquet").count()
    assert meta_n > 0 and not table_is_empty(f"{SF}/events.parquet")


def test_missing_and_empty_paths(tmp_path):
    assert table_row_count(str(tmp_path / "nope.parquet")) == 0
    assert table_is_empty(str(tmp_path / "nope.parquet"))
    nonempty, empty = prune_empty_tables(SF, ("events", "documents", "ghost"))
    assert nonempty == ["events", "documents"] and empty == ["ghost"]


def test_partition_row_counts_from_dir(spark, tmp_path):
    df = spark.range(100).select(
        (F.col("id") % 4).cast("string").alias("partition_key"), F.col("id")
    )
    out = str(tmp_path / "parts")
    df.filter(F.col("partition_key") != "2").write.partitionBy("partition_key").parquet(out)
    counts = partition_row_counts(out)
    assert counts == {"0": 25, "1": 25, "3": 25}  # "2" absent entirely


def _poison(spark, df):
    """Any task that evaluates a row of this df raises — proves no scan ran."""

    def boom(s):
        raise RuntimeError("input was scanned")

    udf = F.udf(boom, StringType())
    return df.withColumn("conv_id", udf("conv_id"))


def test_all_buckets_pruned_schedules_no_scan(spark, tmp_path):
    """VERDICT r1 #4 acceptance: empty/missing buckets complete (ledger + PASS
    verdicts) without the input ever being read — enforced by a poisoned
    input that raises from any scan task."""
    from schema_infer_plugin_spark.plans.ledger import completed_keys
    from schema_infer_plugin_spark.plans.runner import PASS_B, run_validation
    from schema_infer_plugin_spark.sources.synth import synth_transcripts

    out = str(tmp_path / "run")
    t = _poison(spark, synth_transcripts(spark, 50))
    summary = run_validation(
        spark, t, out, n_buckets=4, batch_buckets=4, bucket_rows={}
    )
    assert summary["pruned"] == 4 and summary["processed"] == 0
    assert completed_keys(spark, out, "run0", PASS_B) == {"0", "1", "2", "3"}
    verd = spark.read.parquet(f"{out}/verdicts")
    rows = verd.collect()
    assert len(rows) == 4 * 8  # full (bucket × check) grid
    assert all(r["pass"] and r["violation_count"] == 0 for r in rows)


def test_mixed_prune_matches_full_run(spark, tmp_path):
    """Pruned buckets are equivalent to scanning their (empty) slice: same
    violations as the unpruned run over the same input, fewer scans."""
    from schema_infer_plugin_spark.plans.runner import run_validation, with_partition_key
    from schema_infer_plugin_spark.sources.synth import synth_transcripts

    t = synth_transcripts(spark, 200)
    # drop bucket 2's conversations from the input entirely
    keyed = with_partition_key(t, 4)
    subset = keyed.filter(F.col("partition_key") != "2").drop("partition_key")
    # bucket_rows as a bucket-partitioned layout's footers would report them
    part_dir = str(tmp_path / "bucketed")
    with_partition_key(subset, 4).write.partitionBy("partition_key").parquet(part_dir)
    bucket_rows = partition_row_counts(part_dir)
    assert set(bucket_rows) == {"0", "1", "3"}

    pruned_run = run_validation(
        spark, subset, str(tmp_path / "pruned"), n_buckets=4, batch_buckets=4,
        bucket_rows=bucket_rows,
    )
    full_run = run_validation(
        spark, subset, str(tmp_path / "full"), n_buckets=4, batch_buckets=4,
    )
    assert pruned_run["pruned"] == 1 and pruned_run["processed"] == 3
    assert full_run["pruned"] == 0 and full_run["processed"] == 4
    assert pruned_run["violations"] == full_run["violations"]
    assert pruned_run["rows"] == full_run["rows"]
    a = spark.read.parquet(str(tmp_path / "pruned" / "verdicts"))
    b = spark.read.parquet(str(tmp_path / "full" / "verdicts"))
    cols = ["partition_key", "check_name", "pass", "violation_count"]
    assert sorted(map(tuple, a.select(cols).collect())) == sorted(
        map(tuple, b.select(cols).collect())
    )


def test_runner_main_bucketed_input_prunes(spark, tmp_path, capsys):
    """The production entrypoint itself (runner main, `bucketed:` input) wires
    footer counts into pruning — not just the run_validation API."""
    from schema_infer_plugin_spark.plans.ledger import completed_keys
    from schema_infer_plugin_spark.plans.runner import (
        PASS_B,
        main,
        with_partition_key,
    )
    from schema_infer_plugin_spark.sources.synth import synth_transcripts

    t = synth_transcripts(spark, 200)
    keyed = with_partition_key(t, 4)
    bdir = str(tmp_path / "bucketed")
    keyed.filter(F.col("partition_key") != "2").write.partitionBy(
        "partition_key"
    ).parquet(bdir)
    out = str(tmp_path / "out")
    main(["--input", f"bucketed:{bdir}", "--out", out, "--run-id", "m1",
          "--n-buckets", "4", "--batch-buckets", "4"])
    printed = capsys.readouterr().out
    assert "'pruned': 1" in printed
    assert completed_keys(spark, out, "m1", PASS_B) == {"0", "1", "2", "3"}
