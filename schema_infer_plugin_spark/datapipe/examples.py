"""SFT training-example extraction from conversation transcripts.

The step between a validated transcripts table and a fine-tuning dataset:
one example per assistant turn — the turn's text as the completion target,
the preceding ≤ ``max_context`` turns as the prompt context.

Design for 10^12 turns: ONE window shuffle on ``conv_id`` (the same
partitioning the validation pass uses — over a conv_id-bucketed table the
exchange disappears entirely), and the context is a ``collect_list`` over a
BOUNDED ROWS frame (``max_context`` preceding rows), so per-row state is
``max_context`` structs — a bounded frame aggregate, not the full-column
collect the repo's unbounded-aggregation invariant forbids. The window order
includes role and text as tie-breakers: the fixture's duplicate ``turn_idx``
rows would otherwise make the context order nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from schema_infer_plugin_spark.schema import well_keyed

#: unit separator / tab — never appear in fixture text, so the rendered
#: context string is unambiguous and engine-portable
_FIELD_SEP = "\t"
_TURN_SEP = "\x1f"


def sft_examples(
    df: DataFrame,
    max_context: int = 8,
    target_role: str = "assistant",
) -> DataFrame:
    """One training example per non-null-text ``target_role`` turn.

    ``context`` is the preceding ≤ ``max_context`` turns rendered as
    ``role<TAB>text`` joined with the unit separator — a flat string rather
    than array<struct> so the result is byte-comparable across engines (and
    trivially writable to any sink). NULL role/text render as ``<null>``.

    Output: (conv_id, turn_idx, target, context, n_context).
    """
    # conversation-unit operator: well-keyed rows only (NULL-key posture,
    # plans/validate.py) — a keyless row has no position in any context window
    df = well_keyed(df)
    turn_str = F.concat_ws(
        _FIELD_SEP,
        F.coalesce(F.col("role"), F.lit("<null>")),
        F.coalesce(F.col("text"), F.lit("<null>")),
    )
    order = [
        F.col("turn_idx"),
        F.coalesce(F.col("role"), F.lit("")),
        F.coalesce(F.col("text"), F.lit("")),
    ]
    w = (
        Window.partitionBy("conv_id")
        .orderBy(*order)
        .rowsBetween(-max_context, -1)
    )
    ctx = F.collect_list(turn_str).over(w)
    return (
        df.select(
            "conv_id",
            "turn_idx",
            "role",
            F.col("text").alias("target"),
            F.array_join(ctx, _TURN_SEP).alias("context"),
            F.size(ctx).alias("n_context"),
        )
        .filter((F.col("role") == target_role) & F.col("target").isNotNull())
        .drop("role")
    )
