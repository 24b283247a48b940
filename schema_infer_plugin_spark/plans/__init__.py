"""Fused logical plans + checkpoint-resume runner (the engine's Pass A/B at scale)."""

from schema_infer_plugin_spark.plans.compare import profile_compare
from schema_infer_plugin_spark.plans.validate import validate_transcripts

__all__ = ["profile_compare", "validate_transcripts"]
