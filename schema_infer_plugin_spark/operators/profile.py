"""Pass A — column profiling in a single wide aggregation.

Generalizes the reference's per-record field accumulator
(/root/reference/schema_infer/schemas/inference.py:199-264: per-field Counter of
types, null_count, total_count, ≤5 examples over a ≤50-message sample) into one
full-table scan that computes, for every column at once:

    count, null_count, null_rate, distinct (HyperLogLog approx or exact),
    min, max, quantiles (numeric), bounded examples, and the reference's
    type histogram + (inferred_type, confidence, nullable, required).

Plan shape: ``scan → partial agg (map-side combine) → final agg`` — one shuffle
of a handful of bytes per column per partition, no matter the table size. The
long-format output (one row per column) is produced by stacking the wide agg
row, which happens on the driver over ~dozens of values, not in a shuffle.

At 100 TB this is the right shape: all stats are algebraic or sketch-based
(HLL / percentile_approx), so partial aggregation bounds shuffle traffic by
#columns × #partitions, and the scan reads each column exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import NumericType, StringType

from ..functions.typeladder import (
    TYPE_NAMES,
    resolve_profile,
    type_code_proj,
    type_profile_exprs,
)


def _stat_exprs(df: DataFrame, col_name: str, approx_distinct: bool, n_examples: int) -> list:
    c = F.col(col_name)
    dtype = df.schema[col_name].dataType
    exprs = [
        F.count(F.lit(1)).alias(f"{col_name}__total"),
        F.sum(c.isNull().cast("long")).cast("long").alias(f"{col_name}__nulls"),
        (
            F.approx_count_distinct(c) if approx_distinct else F.count_distinct(c)
        ).cast("long").alias(f"{col_name}__distinct"),
        F.min(c).cast("string").alias(f"{col_name}__min"),
        F.max(c).cast("string").alias(f"{col_name}__max"),
    ]
    if isinstance(dtype, NumericType):
        exprs.append(
            F.percentile_approx(c.cast("double"), F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
            .alias(f"{col_name}__quantiles")
        )
    else:
        exprs.append(F.lit(None).cast("array<double>").alias(f"{col_name}__quantiles"))
    if isinstance(dtype, StringType):
        # cnt_{type} only; ladder pre-classified to {col}__code in the projection
        exprs.extend(type_profile_exprs(col_name, from_code=True)[: len(TYPE_NAMES)])
    return exprs


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    partition_by: str | None = None,
    approx_distinct: bool = True,
    n_examples: int = 5,
    run_id: str = "run0",
    examples_prefilter_num: int | None = None,
) -> DataFrame:
    """Profile ``columns`` (default: all) in one aggregation pass.

    Returns long format: one row per (partition_key, column) with
    PROFILE_SCHEMA-compatible columns. ``partition_by`` groups the profile per
    partition (the per-topic analog of the reference); None profiles globally.
    ``approx_distinct=True`` uses HyperLogLog (the 100 TB path);
    False uses exact count_distinct (oracle-checkable at test scale).

    With ``partition_by`` the example sampling (fixed_k_sample) ranks every
    row by md5 inside its partition — a SECOND full shuffle of the selected
    columns beyond the wide agg. At huge per-partition row counts pass
    ``examples_prefilter_num`` (a /256 hash-prefix rate, forwarded to
    fixed_k_sample's map-side pre-filter): the sampled set is identical
    whenever >= k rows clear the cut, and the shuffle drops to
    ~rate x |input|. Size it >= ~4k/|smallest partition|; the default None
    keeps exact every-partition coverage for moderate tables.
    """
    columns = columns or [c for c in df.columns if c != partition_by]
    agg_exprs: list = []
    for col_name in columns:
        agg_exprs.extend(_stat_exprs(df, col_name, approx_distinct, n_examples))

    # classify each string column ONCE per row (type_code_proj docstring)
    code_cols = [
        type_code_proj(c) for c in columns if isinstance(df.schema[c].dataType, StringType)
    ]
    prep = df.select("*", *code_cols) if code_cols else df
    wide = prep.groupBy(partition_by).agg(*agg_exprs) if partition_by else prep.agg(*agg_exprs)

    # Bounded examples (reference keeps the first ≤5 seen, inference.py:248-250):
    # a collect_set over the full column would buffer every distinct value of a
    # high-cardinality column in one reducer — unbounded at 10^12 rows.
    if partition_by:
        # Per-partition examples (VERDICT r3 #7): a global head sample joined
        # by partition key leaves most partitions of a large table with EMPTY
        # examples — the ~1,000 head rows land in whichever groups the first
        # input split happens to contain. fixed_k_sample instead ranks rows
        # INSIDE each partition by a full md5 and keeps exactly
        # min(k, |partition|): every partition present in the data contributes
        # examples, per-task state is one streaming row_number, and the window
        # shuffles on the same key the wide agg already exchanges.
        from ..sources.sampling import fixed_k_sample

        sample = fixed_k_sample(
            df.select(partition_by, *columns),
            partition_by,
            key_cols=list(columns),
            k=max(n_examples * 20, 100),
            prefilter_rate_num=examples_prefilter_num,
        )
        # sort BEFORE the slice: collect_set accumulation order is not
        # deterministic, but the sampled value set is (md5-ranked rows), so
        # the n_examples alphabetically-first sampled values are reproducible
        # at any parallelism
        ex_exprs = [
            F.slice(
                F.array_sort(F.collect_set(F.col(c).cast("string"))), 1, n_examples
            ).alias(f"{c}__examples")
            for c in columns
        ]
        ex_wide = sample.groupBy(partition_by).agg(*ex_exprs)
        wide = wide.join(ex_wide, on=partition_by, how="left")
    else:
        # global profile: a head sample (limit reads a single input split) is
        # faithful to the reference's "first seen" and O(1) in table size
        sample = df.limit(max(n_examples * 200, 1000))
        ex_exprs = [
            F.slice(F.collect_set(F.col(c).cast("string")), 1, n_examples).alias(
                f"{c}__examples"
            )
            for c in columns
        ]
        wide = wide.crossJoin(sample.agg(*ex_exprs))

    # Stack wide → long. The wide frame has one row per partition_key (tiny);
    # build one struct per column then explode — pure projection, no shuffle.
    structs = []
    for col_name in columns:
        is_string = isinstance(df.schema[col_name].dataType, StringType)
        total = F.col(f"{col_name}__total")
        nulls = F.col(f"{col_name}__nulls")
        if is_string:
            cnts = {t: F.col(f"{col_name}__cnt_{t}") for t in TYPE_NAMES}
            resolved = resolve_profile(cnts["boolean"], cnts["int"], cnts["float"], cnts["string"], total, nulls)
            hist = F.map_from_arrays(
                F.array(*[F.lit(t) for t in TYPE_NAMES]),
                F.array(*[cnts[t] for t in TYPE_NAMES]),
            )
        else:
            spark_type = df.schema[col_name].dataType.simpleString()
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
        structs.append(
            F.struct(
                F.lit(col_name).alias("column"),
                resolved["inferred_type"].alias("inferred_type"),
                hist.alias("type_histogram"),
                total.alias("total_count"),
                nulls.alias("null_count"),
                (nulls / total).alias("null_rate"),
                resolved["required"].alias("required"),
                resolved["nullable"].alias("nullable"),
                resolved["confidence"].cast("double").alias("confidence"),
                F.col(f"{col_name}__distinct").alias("distinct_approx"),
                F.col(f"{col_name}__min").alias("min_val"),
                F.col(f"{col_name}__max").alias("max_val"),
                F.col(f"{col_name}__quantiles").alias("quantiles"),
                F.array_sort(
                    F.coalesce(
                        F.col(f"{col_name}__examples"), F.array().cast("array<string>")
                    )
                ).alias("examples"),
            )
        )

    part_key = (
        F.col(partition_by).cast("string") if partition_by else F.lit("_global_")
    )
    long_df = wide.select(
        F.lit(run_id).alias("run_id"),
        part_key.alias("partition_key"),
        F.explode(F.array(*structs)).alias("p"),
    ).select("run_id", "partition_key", "p.*")
    return long_df


def type_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    confidence_threshold: float = 0.8,
    null_ratio_threshold: float = 0.1,
) -> DataFrame:
    """Reference-semantics type inference over string columns only.

    Output: (column, inferred_type, confidence, nullable, required,
    cnt_boolean, cnt_int, cnt_float, cnt_string, total_count, null_count) —
    the distributed equivalent of SchemaInferrer._create_schema_field
    (inference.py:339-397), exact over the full table.
    """
    columns = columns or [
        f.name for f in df.schema.fields if isinstance(f.dataType, StringType)
    ]
    agg_exprs: list = []
    for c in columns:
        agg_exprs.extend(type_profile_exprs(c, from_code=True))
    wide = df.select("*", *[type_code_proj(c) for c in columns]).agg(*agg_exprs)

    structs = []
    for c in columns:
        cnts = {t: F.col(f"{c}__cnt_{t}") for t in TYPE_NAMES}
        total, nulls = F.col(f"{c}__total"), F.col(f"{c}__nulls")
        resolved = resolve_profile(
            cnts["boolean"], cnts["int"], cnts["float"], cnts["string"], total, nulls,
            confidence_threshold=confidence_threshold,
            null_ratio_threshold=null_ratio_threshold,
        )
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                resolved["inferred_type"].alias("inferred_type"),
                F.round(resolved["confidence"], 6).cast("double").alias("confidence"),
                resolved["nullable"].alias("nullable"),
                resolved["required"].alias("required"),
                *[cnts[t].alias(f"cnt_{t}") for t in TYPE_NAMES],
                total.alias("total_count"),
                nulls.alias("null_count"),
            )
        )
    return wide.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def top_values(
    df: DataFrame,
    columns: list[str],
    k: int = 10,
    partition_by: str | None = None,
) -> DataFrame:
    """Exact top-k most frequent values per column (heavy hitters) — the
    categorical companion of the numeric equi-depth histogram: which roles,
    tools, event types, error strings dominate a column, with exact counts.

    Plan shape, per column: one hash aggregation on the value (shuffle ∝
    DISTINCT values, map-side combined) then ``orderBy().limit(k)`` — 
    Spark's distributed TakeOrderedAndProject, so a 10^9-distinct column
    never funnels through a single-partition sort (the repo-invariant top-k
    shape; an unpartitioned row_number window here would). Ties break on
    value ascending, so the cut is deterministic in both engines. The final
    rank window runs over ≤ k collected rows per column. NULLs are excluded
    (profile() already counts them); columns are unioned lazily into one
    frame.

    With ``partition_by`` the top-k is per partition value (top tools per
    role — the conditional distribution): the rank window partitions on the
    group key, so its per-task work is bounded by the DISTINCT (group,
    value) pairs of one group — the categorical-column regime this targets.
    For a near-unique value column prefer the global form (TakeOrdered has
    no per-group equivalent); the unpartitioned-window shape is never used
    in either mode.

    Output: (col_name, [partition_key,] value, cnt, rank) with value and
    partition_key cast to string.
    """
    if not columns:
        raise ValueError("top_values: columns must be non-empty")
    if partition_by in columns:
        raise ValueError("top_values: partition_by cannot also be ranked")
    from functools import reduce

    from pyspark.sql import Window

    parts = []
    for c in columns:
        base = df.filter(F.col(c).isNotNull())
        if partition_by is not None:
            counted = base.groupBy(
                F.col(partition_by).cast("string").alias("partition_key"),
                F.col(c).cast("string").alias("value"),
            ).agg(F.count(F.lit(1)).alias("cnt"))
            w = Window.partitionBy("partition_key").orderBy(
                F.desc("cnt"), F.asc("value")
            )
            parts.append(
                counted.withColumn("rank", F.row_number().over(w).cast("int"))
                .filter(F.col("rank") <= k)
                .select(
                    F.lit(c).alias("col_name"),
                    "partition_key",
                    "value",
                    F.col("cnt").cast("long").alias("cnt"),
                    "rank",
                )
            )
            continue
        counted = (
            base.groupBy(F.col(c).cast("string").alias("value"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("value"))
            .limit(k)
        )
        w = Window.orderBy(F.desc("cnt"), F.asc("value"))
        parts.append(
            counted.select(
                F.lit(c).alias("col_name"),
                "value",
                F.col("cnt").cast("long").alias("cnt"),
                F.row_number().over(w).cast("int").alias("rank"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts)
