"""Deterministic hash sampling (the reference's sampling strategies, made scale-sane).

The reference samples topics by seeking offsets: tail reads, begin/⅓/⅔/end
strata, mid-offset probes (/root/reference/schema_infer/plugin/optimistic.py:
605-692, 1029-1146). Those are *position*-based and irreproducible across runs.
The engine's analog is **content-hash sampling**: a row is in the sample iff the
first ``width`` hex chars of ``md5(key)`` fall below a threshold — a pure
map-side predicate (pushes to the scan, no shuffle, no RNG state) that is:

* deterministic and partition-invariant (same sample at any parallelism);
* consistent across engines (md5 hex is identical in Spark and DuckDB, so the
  sample itself is oracle-checkable — unlike TABLESAMPLE/rand());
* stratifiable: sample within groups by hashing (group, key) pairs.

Rate resolution is 16^-width (width=2 → 1/256 granularity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hash_bucket(cols: list[Column], width: int = 2) -> Column:
    """First ``width`` hex chars of md5 over ':'-joined key columns."""
    return F.substring(F.md5(F.concat_ws(":", *cols)), 1, width)


def deterministic_sample(
    df: DataFrame,
    key_cols: list[str],
    rate_num: int,
    width: int = 2,
) -> DataFrame:
    """Keep rows whose hash bucket < rate_num (of 16**width buckets) —
    expected fraction rate_num / 16**width."""
    threshold = format(rate_num, f"0{width}x")
    return df.filter(
        hash_bucket([F.col(c) for c in key_cols], width) < F.lit(threshold)
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key_cols: list[str],
    rate_num: int,
    width: int = 2,
) -> DataFrame:
    """Per-stratum deterministic sample: hashing (stratum, key) decorrelates
    the sample across strata — every stratum gets ~rate coverage even when row
    counts are wildly skewed (the reference's begin/⅓/⅔/end intent)."""
    threshold = format(rate_num, f"0{width}x")
    cols = [F.col(stratum_col)] + [F.col(c) for c in key_cols]
    return df.filter(hash_bucket(cols, width) < F.lit(threshold))


def mixture_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    key_cols: list[str],
    default_rate: float = 0.0,
    width: int = 4,
) -> DataFrame:
    """Training-mixture sampler: a DIFFERENT keep-rate per stratum (e.g.
    ``{"en": 1.0, "de": 0.25, "fr": 0.1}``) — the knob a pretraining pipeline
    turns to rebalance languages/sources/quality buckets.

    Same md5-bucket construction as ``deterministic_sample`` (map-side
    predicate, no shuffle, no RNG, oracle-checkable); the per-stratum rate
    resolves as ``floor(rate * 16**width)`` buckets of ``16**width``
    (width=4 → 1/65536 granularity). ``rate >= 1.0`` keeps every row of the
    stratum; strata absent from ``rates`` keep ``default_rate``. NULL strata
    fall under ``default_rate`` too (md5 of a NULL-joined key still hashes,
    but the rate lookup is by value).
    """
    buckets = 16**width

    def hexcap(rate: float) -> str:
        return format(min(max(int(rate * buckets), 0), buckets), f"0{width + 1}x")

    cols = [F.col(stratum_col)] + [F.col(c) for c in key_cols]
    bucket = hash_bucket(cols, width)
    threshold = F.lit(hexcap(default_rate))
    for stratum, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(stratum_col) == stratum, F.lit(hexcap(rate))
        ).otherwise(threshold)
    # width+1-digit thresholds: rate 1.0 formats to 0x10000 which is
    # lexicographically above every width-digit bucket -> keeps all rows
    return df.filter(F.concat(F.lit("0"), bucket) < threshold)


def split_assign(
    df: DataFrame,
    key_cols: list[str],
    weights: dict[str, float],
    width: int = 4,
) -> DataFrame:
    """Deterministic train/val/test split assignment: the md5 bucket of the
    key decides the split, so membership is stable across runs, machines and
    engines — the property leakage-free splits require (a row can NEVER
    migrate between train and test when the pipeline re-runs).

    ``weights`` maps split name → fraction; names are assigned contiguous
    bucket ranges in SORTED-name order (deterministic), the last split
    absorbing rounding remainder. Adds a ``split`` column.
    """
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1.0: {weights}")
    buckets = 16**width
    bucket = hash_bucket([F.col(c) for c in key_cols], width)
    bounds = []
    acc = 0.0
    names = sorted(weights)
    for name in names[:-1]:
        acc += weights[name]
        bounds.append((name, format(min(int(acc * buckets), buckets - 1), f"0{width}x")))
    expr = F.lit(names[-1])
    for name, hexbound in reversed(bounds):
        expr = F.when(bucket < hexbound, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def fixed_k_sample(
    df: DataFrame,
    stratum_col: str,
    key_cols: list[str],
    k: int,
    prefilter_rate_num: int | None = None,
    prefilter_width: int = 2,
) -> DataFrame:
    """EXACTLY ``min(k, |stratum|)`` rows per stratum, deterministically:
    rows are ranked within each stratum by the full md5 of (stratum, key) —
    a uniform random order that is identical at any parallelism and in the
    DuckDB oracle — and ranks > k are dropped. The fixed-size counterpart of
    the rate-based samplers above (a rate can't promise "exactly 100 docs
    per language for the eval set"; this does).

    Scale: the rank is one window over ``stratum_col`` — a hot stratum is
    sorted in one task. For 10^12-row strata pass ``prefilter_rate_num``:
    the map-side hash-bucket predicate (same construction as
    ``deterministic_sample``) prunes each stratum to an expected
    ``rate × |stratum|`` rows BEFORE the window. The k survivors are
    *identical* to the unfiltered result whenever ≥ k rows clear the
    pre-filter (the kept rows are the k smallest hashes, and the pre-filter
    keeps a hash-prefix range — a superset of any bottom-k inside it); size
    the rate ≥ ~4k/|stratum| so undershoot probability is negligible.

    Adds ``sample_rank`` (1-based). Output rows: input columns + rank.
    """
    from pyspark.sql import Window

    cols = [F.col(stratum_col)] + [F.col(c) for c in key_cols]
    if prefilter_rate_num is not None:
        threshold = format(prefilter_rate_num, f"0{prefilter_width}x")
        df = df.filter(hash_bucket(cols, prefilter_width) < F.lit(threshold))
    rank_key = F.md5(F.concat_ws(":", *cols))
    w = Window.partitionBy(stratum_col).orderBy(
        rank_key, *[F.col(c) for c in key_cols]
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def split_assign_clustered(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    weights: dict[str, float],
    width: int = 4,
    max_iter: int = 25,
) -> DataFrame:
    """Near-dup-AWARE train/val/test split: the md5 bucket of the duplicate
    CLUSTER decides the split, so a document and all its near-duplicates
    always land in the same split — plain per-doc :func:`split_assign` leaks
    benchmark/test content into train through near-copies (the classic
    contamination path dedup reports but per-doc splitting ignores).

    ``pairs``: near-dup pairs (id_a, id_b) from any dedup operator; docs in
    no pair are their own singleton cluster (datapipe/graph.connected_
    components + left join, rows ∝ |docs| + |pairs|). Stable across re-runs
    for unchanged clusters; adding a pair can merge clusters — membership
    moves toward the min-id cluster's split, never splits apart.

    Adds ``component`` and ``split`` columns.
    """
    from ..datapipe.graph import connected_components

    comp = connected_components(pairs, max_iter=max_iter)
    labeled = (
        df.join(comp, df[id_col] == comp["node"], "left")
        .drop("node")
        .withColumn("component", F.coalesce(F.col("component"), F.col(id_col)))
    )
    return split_assign(labeled, ["component"], weights, width=width)


def split_leakage_report(
    assigned: DataFrame,
    pairs: DataFrame,
    id_col: str,
) -> DataFrame:
    """Cross-split near-duplicate leakage matrix: given a split-assigned
    corpus (a ``split`` column from :func:`split_assign` or
    :func:`split_assign_clustered`) and near-dup pairs from any dedup
    operator, count pairs by the unordered split pair they straddle.
    Off-diagonal mass IS contamination — test content reachable from train
    through a near-copy; under the clustered split it must be zero (both
    members share a component, components never straddle splits), which is
    exactly the property this report audits after the fact.

    Plan: two shuffle equi-joins of the PAIR frame against the assignment
    (work ∝ |pairs|, never corpus²) + one hash agg on the canonical
    (least, greatest) split pair — a handful of output rows.

    Output: (split_a, split_b, n_pairs bigint, leaky bool), split_a <= split_b.
    """
    a = assigned.select(F.col(id_col).alias("id_a"), F.col("split").alias("_sa"))
    b = assigned.select(F.col(id_col).alias("id_b"), F.col("split").alias("_sb"))
    return (
        pairs.select("id_a", "id_b")
        .join(a, "id_a")
        .join(b, "id_b")
        .groupBy(
            F.least("_sa", "_sb").alias("split_a"),
            F.greatest("_sa", "_sb").alias("split_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .withColumn("leaky", F.col("split_a") != F.col("split_b"))
    )
