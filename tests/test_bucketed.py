"""Bucketed-table validation: the zero-exchange production plan.

Production input is an Iceberg table bucket-partitioned on conv_id
(``bucket(N, conv_id)``); the sandbox stand-in is a parquet table written with
``bucketBy(N, conv_id).sortBy(conv_id, turn_idx)``. The bucketed scan reports
HashPartitioning(conv_id), which satisfies both window specs in the fused plan
— Spark plans NO exchange, so at 10^12 rows validation costs scan + sort +
window only (BENCH/BASELINE.md measures this shape).
"""

from __future__ import annotations

import pytest

from schema_infer_plugin_spark.plans.validate import validate_transcripts
from schema_infer_plugin_spark.sources.synth import synth_transcripts


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    name = "transcripts_bucketed_test"
    t = synth_transcripts(spark, 2_000)
    (
        t.write.mode("overwrite")
        .bucketBy(8, "conv_id")
        .sortBy("conv_id", "turn_idx")
        .option("path", str(wh / name))
        .format("parquet")
        .saveAsTable(name)
    )
    yield spark.table(name), t
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_validation_plans_zero_exchange(bucketed, spark):
    bt, _ = bucketed
    plan = validate_transcripts(bt)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bucketed_validation_matches_unbucketed(bucketed, spark):
    bt, t = bucketed
    a = validate_transcripts(bt)
    b = validate_transcripts(t)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_bucketed_sft_examples_zero_exchange(bucketed, spark):
    """SFT extraction shares validation's conv_id clustering requirement, so
    over the bucketed table its window also plans ZERO exchanges — and the
    examples match the unbucketed run exactly."""
    from schema_infer_plugin_spark.datapipe import sft_examples

    bt, t = bucketed
    plan = sft_examples(bt)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    a = sft_examples(bt)
    b = sft_examples(t)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_bucketed_conversation_texts_zero_exchange(bucketed, spark):
    """conversation_texts groups on conv_id — the bucketed scan satisfies the
    aggregation's distribution requirement too (conversation-level dedup
    renders without a shuffle on the production layout)."""
    from schema_infer_plugin_spark.datapipe import conversation_texts

    bt, t = bucketed
    plan = conversation_texts(bt)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    a = conversation_texts(bt)
    b = conversation_texts(t)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
