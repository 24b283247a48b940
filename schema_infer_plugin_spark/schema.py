"""Declared schemas for the engine's tables.

The reference is schema-on-read — schemas exist only as *output*
(/root/reference/schema_infer/schemas/inference.py:92-123). This engine inverts
that: the input ``transcripts`` table has a fixed declared schema, and the
reference's inferred-schema / per-message outcomes become typed output tables
(column profiles, violations, verdicts) that downstream jobs can join and audit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Input table (BASELINE.json input_hint): multi-turn conversation / agent transcripts.
TRANSCRIPTS_SCHEMA = StructType(
    [
        # conv_id/turn_idx are the table's key and SHOULD be non-null — but
        # the reader schema must declare them nullable: not-null is a
        # CONSTRAINT this engine validates (not_null_conv_id/turn_idx,
        # plans/validate.py), and a nullable=False reader schema lets
        # Catalyst constant-fold `IS NULL` predicates away, silently
        # disabling those checks on any stream read with this schema.
        StructField("conv_id", StringType(), nullable=True),
        StructField("turn_idx", IntegerType(), nullable=True),
        StructField("role", StringType(), nullable=True),
        StructField("text", StringType(), nullable=True),
        StructField("tool", StringType(), nullable=True),
        StructField("ts", TimestampType(), nullable=True),
    ]
)

#: Known value domains for the transcripts table (used by the domain checks; the
#: reference's analog is topic include/exclude filtering, discovery.py:29-61).
ROLE_DOMAIN = ["user", "assistant", "system", "tool"]
TOOL_DOMAIN = ["search", "code", "browser", "calc"]

#: Pass-A output: one row per (partition_key, column). Mirrors the reference's
#: SchemaField (inference.py:50-89) plus the at-scale stats it never computes.
PROFILE_SCHEMA = StructType(
    [
        StructField("run_id", StringType()),
        StructField("partition_key", StringType()),
        StructField("column", StringType()),
        StructField("inferred_type", StringType()),
        StructField("type_histogram", MapType(StringType(), LongType())),
        StructField("total_count", LongType()),
        StructField("null_count", LongType()),
        StructField("null_rate", DoubleType()),
        StructField("required", BooleanType()),
        StructField("nullable", BooleanType()),
        StructField("confidence", DoubleType()),
        StructField("distinct_approx", LongType()),
        StructField("min_val", StringType()),
        StructField("max_val", StringType()),
        StructField("quantiles", ArrayType(DoubleType())),
        StructField("examples", ArrayType(StringType())),
    ]
)

#: Pass-B output: typed violation rows (BASELINE.json north_star).
VIOLATION_SCHEMA = StructType(
    [
        StructField("run_id", StringType()),
        StructField("check_name", StringType()),
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("column", StringType()),
        StructField("observed", StringType()),
        StructField("expected", StringType()),
        StructField("detail", StringType()),
    ]
)

#: Pass-B per-partition verdicts.
VERDICT_SCHEMA = StructType(
    [
        StructField("run_id", StringType()),
        StructField("partition_key", StringType()),
        StructField("check_name", StringType()),
        StructField("pass", BooleanType()),
        StructField("violation_count", LongType()),
        StructField("metrics", MapType(StringType(), DoubleType())),
    ]
)

#: Checkpoint-resume ledger: one row per completed (run, partition, pass).
LEDGER_SCHEMA = StructType(
    [
        StructField("run_id", StringType()),
        StructField("partition_key", StringType()),
        StructField("pass_name", StringType()),
        StructField("rows_processed", LongType()),
        StructField("violation_count", LongType()),
        StructField("wall_sec", DoubleType()),
        StructField("completed_ts", TimestampType()),
    ]
)


def well_keyed_predicate() -> Column:
    """The transcripts key contract as ONE expression: conv_id AND turn_idx
    non-null. This is the single definition of the engine-wide NULL-key
    posture's predicate (SURVEY round-5 item 33) — every sequence check,
    conversation-unit operator, and the fused plan's key_ok consume it from
    here, so a posture change cannot silently fork across call sites."""
    return F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull()


def well_keyed(df: DataFrame) -> DataFrame:
    """Filter to well-keyed rows (see :func:`well_keyed_predicate`). Keyless
    rows are the validation pass's job (not_null_conv_id/turn_idx), never an
    input to key semantics."""
    return df.filter(well_keyed_predicate())
