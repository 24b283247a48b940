"""Mergeable partial profiles — incremental profiling without rescans.

The reference profiles a table by folding every record into one in-memory
accumulator (/root/reference/schema_infer/schemas/inference.py:199-264:
per-field Counters + null/total counts). That accumulator design is
secretly the important property: every statistic it keeps is MERGEABLE
(counts add, mins/maxes combine, type histograms add). At 100 TB the
payoff of mergeability is not parallelism (``profile()`` already gets that
from map-side combine) but INCREMENTALITY across runs: profile each day's
partition once, persist a tiny partial artifact, and answer "profile of
the last 90 days" by merging 90 artifact rows — never rescanning a byte of
input.

``profile_partial`` computes one wide row of mergeable state per run:

* ``{col}__total`` / ``{col}__nulls`` — exact longs (add under merge);
* ``{col}__min`` / ``{col}__max`` — NATIVE-typed (merging string-rendered
  mins would corrupt numerics: ``"10" < "9"`` lexicographically);
* ``{col}__hll`` — a Datasketches HLL sketch (``hll_sketch_agg``), the
  mergeable form of distinct counting; ``hll_union_agg`` over partials is
  the union sketch, register-exact at equal lgK;
* ``{col}__cnt_{type}`` — the reference's type-ladder histogram for string
  columns (adds under merge, so the merged inferred type / confidence is
  EXACTLY what a full-table profile would resolve).

* ``{col}__kll`` — numeric columns only: a Datasketches KLL doubles sketch
  (``kll_sketch_agg_double``), the mergeable form of quantiles;
  ``kll_merge_agg_double`` over partials answers "quantiles of the last 90
  days" within KLL's rank-error bound (~1.65% two-sided at the default
  k=200) without rescans. Like ``distinct_approx``, merged ``quantiles``
  are ESTIMATES — keep them out of exact cross-engine comparisons. Note:
  Spark's KLL merge has no strict-k mode (unlike the HLL union's strict
  lgK), so merging mixed-k partials silently degrades to the smaller k's
  accuracy per Datasketches semantics.

Examples are deliberately absent: they are a bounded-sample concern, not an
accumulator — they stay on the full ``profile()`` path.

``profile_merge`` unions any number of partial rows (parquet round-trips
preserve the sketch binary) and re-resolves the long-format profile. Merge
work is ∝ (#partials × #columns) — driver-scale forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    NumericType,
    StringType,
)

#: types Datasketches HLL ingests natively; anything else is sketched over
#: its string rendering (injective for dates/timestamps/decimals — the
#: distinct count is over VALUES either way)
_HLL_NATIVE = (IntegerType, LongType, StringType, BinaryType)

from ..functions.typeladder import (
    TYPE_NAMES,
    resolve_profile,
    type_code_proj,
    type_profile_exprs,
)

#: suffixes of the mergeable state columns (besides the string-only cnt_*)
_STATE_SUFFIXES = ("__total", "__nulls", "__min", "__max", "__hll")


def profile_partial(
    df: DataFrame,
    columns: list[str] | None = None,
    run_id: str = "run0",
    lg_k: int = 12,
    partition_by: str | None = None,
    kll_k: int = 200,
) -> DataFrame:
    """Mergeable profile state for ``columns`` (default all): ONE wide row
    globally, or one row per ``partition_by`` value (the reference's
    per-topic analog, incremental — artifact size ∝ partition cardinality,
    never input).

    The rows are the artifact: write them with ``.write.parquet(...)`` and
    feed any union of such rows (same column set, same ``lg_k``, same
    partitioning) to :func:`profile_merge`. One scan, map-side combined —
    the shuffle is a handful of bytes per column per partition.
    """
    columns = columns or [c for c in df.columns if c != partition_by]
    if partition_by in (columns or []):
        raise ValueError("profile_partial: partition_by cannot also be profiled")
    # "__" is the state-column marker profile_merge keys off — a partition
    # column containing it would be misread as state and silently collapse
    # every partition into one global row at merge time
    if partition_by is not None and "__" in partition_by:
        raise ValueError(
            "profile_partial: partition_by name must not contain '__' "
            "(reserved for artifact state columns)"
        )
    agg_exprs: list = []
    for c in columns:
        col = F.col(c)
        sketch_input = (
            col if isinstance(df.schema[c].dataType, _HLL_NATIVE) else col.cast("string")
        )
        agg_exprs.extend(
            [
                F.count(F.lit(1)).alias(f"{c}__total"),
                F.sum(col.isNull().cast("long")).cast("long").alias(f"{c}__nulls"),
                F.min(col).alias(f"{c}__min"),
                F.max(col).alias(f"{c}__max"),
                F.hll_sketch_agg(sketch_input, lg_k).alias(f"{c}__hll"),
            ]
        )
        if isinstance(df.schema[c].dataType, NumericType):
            agg_exprs.append(
                F.kll_sketch_agg_double(col.cast("double"), kll_k).alias(f"{c}__kll")
            )
        if isinstance(df.schema[c].dataType, StringType):
            agg_exprs.extend(type_profile_exprs(c, from_code=True)[: len(TYPE_NAMES)])
    code_cols = [
        type_code_proj(c)
        for c in columns
        if isinstance(df.schema[c].dataType, StringType)
    ]
    prep = df.select("*", *code_cols) if code_cols else df
    wide = (
        prep.groupBy(partition_by).agg(*agg_exprs)
        if partition_by
        else prep.agg(*agg_exprs)
    )
    return wide.select(F.lit(run_id).alias("run_id"), "*")


def _partial_columns(parts: DataFrame) -> list[str]:
    """Recover the profiled column list from a partial frame's schema."""
    return [c[: -len("__total")] for c in parts.columns if c.endswith("__total")]


def profile_merge(parts: DataFrame, run_id: str = "merged") -> DataFrame:
    """Merge partial-profile rows into one long-format profile.

    Accepts any union of :func:`profile_partial` outputs over the SAME
    column set (mismatched partials raise — merging profiles of different
    tables is a caller bug, not a coercion opportunity). Partition-keyed
    partials (``partition_by=``) merge per key — the key column is
    recognized as the non-state column riding the artifact. Output: one row
    per (partition, column) with (run_id, partition_key, column,
    inferred_type, type_histogram, total_count, null_count, null_rate,
    required, nullable, confidence, distinct_approx, min_val, max_val,
    quantiles) — the :func:`~.profile.profile` surface minus examples.
    ``quantiles`` = [p25, p50, p75] from the merged KLL sketch (numeric
    columns; NULL otherwise) — an ESTIMATE within the sketch's rank-error
    bound, and like ``distinct_approx`` excluded from exact comparisons:
    merging halves is not bit-identical to sketching the whole.
    """
    columns = _partial_columns(parts)
    if not columns:
        raise ValueError("profile_merge: input has no __total state columns")
    missing = [
        f"{c}{s}" for c in columns for s in _STATE_SUFFIXES if f"{c}{s}" not in parts.columns
    ]
    if missing:
        raise ValueError(f"profile_merge: partial state columns missing: {missing}")
    # state columns all carry a "__" suffix; whatever else rides the artifact
    # beside run_id is the partition key (at most one, as in profile())
    keys = [c for c in parts.columns if c != "run_id" and "__" not in c]
    if len(keys) > 1:
        raise ValueError(f"profile_merge: at most one partition column, got {keys}")

    agg_exprs: list = []
    string_cols = set()
    for c in columns:
        agg_exprs.extend(
            [
                # coalesce: a partial built over an EMPTY input carries NULL
                # sum-state (Spark sum over 0 rows); the merged totals are 0
                F.coalesce(F.sum(f"{c}__total"), F.lit(0)).cast("long").alias(f"{c}__total"),
                F.coalesce(F.sum(f"{c}__nulls"), F.lit(0)).cast("long").alias(f"{c}__nulls"),
                F.min(f"{c}__min").alias(f"{c}__min"),
                F.max(f"{c}__max").alias(f"{c}__max"),
                # strict lgK: partials built with a different lg_k raise at
                # merge (a mis-configured pipeline must not silently degrade
                # the estimate — same posture as the mismatched-column guard)
                F.hll_union_agg(f"{c}__hll", False).alias(f"{c}__hll"),
            ]
        )
        if f"{c}__kll" in parts.columns:
            agg_exprs.append(F.kll_merge_agg_double(f"{c}__kll").alias(f"{c}__kll"))
        if f"{c}__cnt_{TYPE_NAMES[0]}" in parts.columns:
            string_cols.add(c)
            agg_exprs.extend(
                F.coalesce(F.sum(f"{c}__cnt_{t}"), F.lit(0)).cast("long").alias(f"{c}__cnt_{t}")
                for t in TYPE_NAMES
            )
    wide = parts.groupBy(*keys).agg(*agg_exprs) if keys else parts.agg(*agg_exprs)

    structs = []
    for c in columns:
        total, nulls = F.col(f"{c}__total"), F.col(f"{c}__nulls")
        if c in string_cols:
            cnts = {t: F.col(f"{c}__cnt_{t}") for t in TYPE_NAMES}
            resolved = resolve_profile(
                cnts["boolean"], cnts["int"], cnts["float"], cnts["string"], total, nulls
            )
            hist = F.map_from_arrays(
                F.array(*[F.lit(t) for t in TYPE_NAMES]),
                F.array(*[cnts[t] for t in TYPE_NAMES]),
            )
        else:
            # the native dtype rode along on the min state column
            spark_type = dict(parts.dtypes)[f"{c}__min"]
            resolved = {
                "inferred_type": F.lit(spark_type),
                "confidence": F.lit(1.0),
                "nullable": nulls > 0,
                "required": (nulls == 0) | ((nulls / total) < 0.1),
            }
            hist = F.map_from_arrays(
                F.array(F.lit(spark_type), F.lit("null")),
                F.array((total - nulls).cast("long"), nulls.cast("long")),
            )
        if f"{c}__kll" in parts.columns:
            sk = F.col(f"{c}__kll")
            # KLL merge of all-empty partials yields a valid EMPTY sketch on
            # which get_quantile raises — gate on the sketch's own n
            quantiles = F.when(
                F.kll_sketch_get_n_double(sk) > 0,
                F.array(
                    *[
                        F.kll_sketch_get_quantile_double(sk, F.lit(p))
                        for p in (0.25, 0.5, 0.75)
                    ]
                ),
            )
        else:
            quantiles = F.lit(None).cast("array<double>")
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                resolved["inferred_type"].alias("inferred_type"),
                hist.alias("type_histogram"),
                total.alias("total_count"),
                nulls.alias("null_count"),
                # merging partials built over empty inputs must not emit a
                # NULL rate (0/0) — an empty merge is 0-null by definition
                F.when(total > 0, nulls / total)
                .otherwise(F.lit(0.0))
                .cast("double")
                .alias("null_rate"),
                resolved["required"].alias("required"),
                resolved["nullable"].alias("nullable"),
                resolved["confidence"].cast("double").alias("confidence"),
                # NULL sketch = zero observed values (empty-input partial)
                F.coalesce(
                    F.hll_sketch_estimate(F.col(f"{c}__hll")), F.lit(0)
                ).cast("long").alias("distinct_approx"),
                F.col(f"{c}__min").cast("string").alias("min_val"),
                F.col(f"{c}__max").cast("string").alias("max_val"),
                quantiles.alias("quantiles"),
            )
        )
    part_key = F.col(keys[0]).cast("string") if keys else F.lit("_global_")
    return (
        wide.select(
            F.lit(run_id).alias("run_id"),
            part_key.alias("partition_key"),
            F.explode(F.array(*structs)).alias("p"),
        ).select("run_id", "partition_key", "p.*")
    )
