"""Embedding-column sanity validation.

Every downstream vector operator in this engine (ANN, LSH dedup, SemDeDup,
centroid drift) silently assumes its input vectors are well-formed: non-NULL,
the declared dimensionality, finite, and not degenerate zero vectors (a zero
vector has no direction — cosine against it is 0/0 and hyperplane buckets
collapse to one bucket). A 100 TB embedding pipeline breaks these assumptions
constantly — an encoder crash mid-shard writes NULLs, a version mismatch
changes dim, fp16 overflow mints Inf, a masked-out document embeds to zeros —
and none of the scalar profile checks can see inside an ``array<float>``.
This module is the validation face of the vector surface: the same typed
violation-row contract as the transcript checks, applied to a vector column.

Reference analog: the per-message parse/validity outcome ladder
(/root/reference/schema_infer/core/inferrer.py:199-261) — each vector gets a
pass/fail verdict per rule, violations become rows.

Plan shape (the checks/custom.py posture): per row, an array of per-rule CASE
structs is filtered to the failing rules and exploded — ONE scan, zero
exchanges, output rows ∝ violations. All element inspection is built-in
higher-order functions (exists/aggregate/size) with every capture in argument
position — JVM codegen, no Python.

Issue semantics (a row can emit several — NaN and wrong dim are independent
defects):

* ``vec_null``      — the vector itself is NULL;
* ``vec_dim``       — ``size(vec) != dim``;
* ``vec_null_element`` — any element is NULL (an array slot the encoder never
  wrote; ``isnan(NULL)`` is NULL, so without this rule a null-element vector
  would satisfy NO rule yet count as not-ok — the unevaluable-constraint-is-
  a-defect posture, same as NULL custom-rule predicates);
* ``vec_nan``       — any element is NaN;
* ``vec_inf``       — any element is ±Infinity;
* ``vec_zero``      — correct dim, all elements present and finite, Σx² ==
  0.0 exactly (sum of squares in DOUBLE is exactly 0 iff every element is
  exactly 0, so the equality is engine-stable).

Every element predicate guards ``x.isNotNull()`` so the rule booleans are
two-valued even on null-element vectors (Spark's ``exists`` returns NULL when
no element is true and any predicate is NULL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_INF = float("inf")


def _sumsq(v: Column) -> Column:
    # sequential left fold in double — the engine's canonical dot-product
    # order (functions/vectors.py); exactly 0.0 iff all elements are 0
    return F.aggregate(
        v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )


def vector_sanity_violations(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
) -> DataFrame:
    """One violation row per (vector, failing rule):
    (check_name, id, col_name, observed, expected).

    ``dim`` is REQUIRED — the declared dimensionality comes from the table
    contract, never a driver-side ``.first()`` probe (repo invariant for all
    vector scale paths).
    """
    if dim <= 0:
        raise ValueError(f"vector_sanity_violations: dim must be > 0, got {dim}")
    v = F.col(vec_col)
    has_null_elem = F.exists(v, lambda x: x.isNull())
    has_nan = F.exists(v, lambda x: x.isNotNull() & F.isnan(x.cast("double")))
    has_inf = F.exists(
        v, lambda x: x.isNotNull() & (F.abs(x.cast("double")) == F.lit(_INF))
    )
    rules = [
        # (check_name, failed, observed, expected)
        ("vec_null", v.isNull(), F.lit("NULL"), "NOT NULL"),
        (
            "vec_dim",
            v.isNotNull() & (F.size(v) != F.lit(dim)),
            F.size(v).cast("string"),
            str(dim),
        ),
        (
            "vec_null_element",
            v.isNotNull() & has_null_elem,
            F.size(F.filter(v, lambda x: x.isNull())).cast("string"),
            "0 NULL elements",
        ),
        (
            "vec_nan",
            v.isNotNull() & has_nan,
            F.size(
                F.filter(v, lambda x: x.isNotNull() & F.isnan(x.cast("double")))
            ).cast("string"),
            "0 NaN elements",
        ),
        (
            "vec_inf",
            v.isNotNull() & has_inf,
            F.size(
                F.filter(
                    v,
                    lambda x: x.isNotNull()
                    & (F.abs(x.cast("double")) == F.lit(_INF)),
                )
            ).cast("string"),
            "0 Inf elements",
        ),
        (
            "vec_zero",
            v.isNotNull()
            & (F.size(v) == F.lit(dim))
            & ~has_null_elem
            & ~has_nan
            & ~has_inf
            & (_sumsq(v) == F.lit(0.0)),
            F.lit("0.0"),
            "norm > 0",
        ),
    ]
    structs = [
        F.when(
            failed,
            F.struct(
                F.lit(name).alias("check_name"),
                observed.alias("observed"),
                F.lit(expected).alias("expected"),
            ),
        )
        for name, failed, observed, expected in rules
    ]
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(F.array(*structs), lambda s: s.isNotNull())
        ).alias("viol"),
    )
    return exploded.select(
        F.col("viol.check_name").alias("check_name"),
        "id",
        F.lit(vec_col).alias("col_name"),
        F.col("viol.observed").alias("observed"),
        F.col("viol.expected").alias("expected"),
    )


def vector_sanity_stats(
    df: DataFrame,
    vec_col: str,
    dim: int,
) -> DataFrame:
    """One exact-BIGINT summary row over the whole table:
    (n_rows, n_null, n_wrong_dim, n_null_elem, n_nan, n_inf, n_zero, n_ok).

    One wide hash aggregation (map-side combined, shuffle = one row) — the
    table-level verdict input; pair with :func:`vector_sanity_violations`
    for the row-level triage sample. Every flag is two-valued (null-guarded
    element predicates), so the defect counters partition ``n_rows - n_ok``:
    each not-ok row trips at least one counter.
    """
    if dim <= 0:
        raise ValueError(f"vector_sanity_stats: dim must be > 0, got {dim}")
    v = F.col(vec_col)
    has_null_elem = F.exists(v, lambda x: x.isNull())
    has_nan = F.exists(v, lambda x: x.isNotNull() & F.isnan(x.cast("double")))
    has_inf = F.exists(
        v, lambda x: x.isNotNull() & (F.abs(x.cast("double")) == F.lit(_INF))
    )
    is_null = v.isNull()
    wrong_dim = v.isNotNull() & (F.size(v) != F.lit(dim))
    null_elem = v.isNotNull() & has_null_elem
    nan = v.isNotNull() & has_nan
    inf = v.isNotNull() & has_inf
    zero = (
        v.isNotNull()
        & (F.size(v) == F.lit(dim))
        & ~has_null_elem
        & ~has_nan
        & ~has_inf
        & (_sumsq(v) == F.lit(0.0))
    )
    ok = ~(is_null | wrong_dim | null_elem | nan | inf | zero)
    cnt = lambda c: F.sum(c.cast("long")).alias  # noqa: E731
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        cnt(is_null)("n_null"),
        cnt(wrong_dim)("n_wrong_dim"),
        cnt(null_elem)("n_null_elem"),
        cnt(nan)("n_nan"),
        cnt(inf)("n_inf"),
        cnt(zero)("n_zero"),
        cnt(ok)("n_ok"),
    )
