"""Structured Streaming incremental validation (streaming/incremental.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from schema_infer_plugin_spark.plans.validate import validate_transcripts
from schema_infer_plugin_spark.schema import TRANSCRIPTS_SCHEMA
from schema_infer_plugin_spark.sources.synth import synth_transcripts
from schema_infer_plugin_spark.streaming import (
    row_level_violations_stream,
    validation_sink,
)

ROW_LEVEL = {"domain_role", "domain_tool", "tool_without_role", "not_null_text"}


def _staged_input(spark, tmp_path, n_convs=1_500):
    src = str(tmp_path / "in")
    t = synth_transcripts(spark, n_convs)
    t.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(src)
    return t, stream


def test_row_level_stream_matches_batch(spark, tmp_path):
    t, stream = _staged_input(spark, tmp_path)
    out = str(tmp_path / "out")
    q = (
        row_level_violations_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    want = validate_transcripts(t).filter(F.col("check_name").isin(list(ROW_LEVEL)))
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_foreach_batch_sink_full_fused(spark, tmp_path):
    t, stream = _staged_input(spark, tmp_path)
    out = str(tmp_path / "viol")
    q = (
        validation_sink(stream, out, str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out).drop("epoch")
    # single-directory input => micro-batches align with files; with the whole
    # table in one load the fused result must match the batch plan exactly
    want = validate_transcripts(t)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
