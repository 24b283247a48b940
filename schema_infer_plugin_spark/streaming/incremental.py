"""Incremental (Structured Streaming) validation of arriving transcripts.

The reference has NO streaming semantics — it bounded-samples a Kafka topic and
exits (SURVEY.md §2.10; /root/reference/schema_infer/plugin/optimistic.py:512-603)
— so batch is the engine's primary mode. But the transcripts table the engine
validates is stream-fed in production (agent transcripts land continuously), so
two incremental modes are provided:

1. ``row_level_violations_stream``: the stateless subset of Pass B (domain
   membership, tool-requires-role, not-null) as a pure streaming projection —
   works with any source/sink in append mode, no state, exact always.

2. ``validation_sink``: full fused Pass B per micro-batch via ``foreachBatch``
   reusing the EXACT batch plan (plans/validate.py) — uniqueness/contiguity are
   exact *within* each micro-batch. Cross-batch duplicates would need keyed
   state (``applyInPandasWithState``); the production contract instead appends
   conversations whole (a conversation's turns arrive in one commit), which
   makes per-batch validation exact. Ingestions that split conversations across
   commits must run the batch validator over the affected partitions — which is
   precisely what the checkpoint-resume runner (plans/runner.py) does cheaply.

Late/out-of-order data: violations carry event-time ``ts`` min/max per batch in
the console metrics; the engine does not drop late rows (validation wants them
— a late row is a contiguity violation to report, not noise to watermark away).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import DataStreamWriter

from schema_infer_plugin_spark.plans.validate import validate_transcripts
from schema_infer_plugin_spark.schema import ROLE_DOMAIN, TOOL_DOMAIN


def row_level_violations_stream(
    stream_df: DataFrame,
    role_domain: list[str] | None = None,
    tool_domain: list[str] | None = None,
) -> DataFrame:
    """Stateless Pass-B subset as a streaming-safe projection (no shuffle, no
    state; valid in append output mode)."""
    roles = role_domain or ROLE_DOMAIN
    tools = tool_domain or TOOL_DOMAIN

    def v(check: str, column: str, observed, expected):
        return F.struct(
            F.lit(check).alias("check_name"),
            F.lit(column).alias("column"),
            observed.cast("string").alias("observed"),
            expected.cast("string").alias("expected"),
        )

    checks = F.array(
        F.when(
            F.col("role").isNotNull() & ~F.col("role").isin(roles),
            v("domain_role", "role", F.col("role"), F.lit(",".join(roles))),
        ),
        F.when(
            F.col("tool").isNotNull() & ~F.col("tool").isin(tools),
            v("domain_tool", "tool", F.col("tool"), F.lit(",".join(tools))),
        ),
        F.when(
            F.col("tool").isNotNull() & (F.coalesce(F.col("role"), F.lit("")) != "tool"),
            v("tool_without_role", "tool", F.col("tool"), F.lit("NULL unless role=tool")),
        ),
        F.when(
            F.col("text").isNull(),
            v("not_null_text", "text", F.lit("NULL"), F.lit("NOT NULL")),
        ),
    )
    return stream_df.select(
        "conv_id",
        "turn_idx",
        F.explode(F.filter(checks, lambda c: c.isNotNull())).alias("v"),
    ).select(
        F.col("v.check_name").alias("check_name"),
        "conv_id",
        "turn_idx",
        F.col("v.column").alias("column"),
        F.col("v.observed").alias("observed"),
        F.col("v.expected").alias("expected"),
    )


def validation_sink(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
) -> DataStreamWriter:
    """Full fused Pass B per micro-batch (foreachBatch → the batch plan),
    violations appended to ``out_dir`` stamped with the micro-batch epoch.

    The stream's checkpoint gives exactly-once batch replay; parquet append +
    epoch column keeps replays idempotent to downstream readers (dedupe on
    epoch). Start with ``.trigger(availableNow=True)`` for catch-up runs or a
    processing-time trigger for continuous ingestion."""

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        (
            validate_transcripts(batch_df)
            .withColumn("epoch", F.lit(epoch_id))
            .write.mode("append")
            .parquet(out_dir)
        )

    return stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
