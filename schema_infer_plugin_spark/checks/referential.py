"""Referential-integrity (foreign-key) check between two tables.

The reference validates one message at a time against a static schema
(/root/reference/schema_infer/schemas/inference.py); cross-TABLE invariants —
"every child row's key exists in the parent table" — are outside its model
entirely but are the first thing a warehouse validation engine is asked for
(orders→customers, transcript turns→conversation registry). This module adds
that family with two complementary plan shapes:

``fk_orphans``
    The row-level answer: child rows whose key has no parent. A plain
    ``LEFT ANTI`` equi-join — Catalyst picks broadcast-hash when the parent
    fits (dimension tables) and AQE can convert at runtime; ``broadcast_parent``
    forces the hint for the common small-parent case so a 100 TB child never
    shuffles. Output size ∝ violations.

``fk_coverage``
    The key-level summary in ONE shuffle with partial aggregation: both sides
    are tagged and unioned, then a single hash-agg on the key counts child
    rows and parent presence per key. The shuffle carries one row per distinct
    key per input partition (map-side combined), never the raw child rows —
    the right shape when BOTH sides are large and a broadcast is impossible.
    Childless parents (the reverse direction) ride the same aggregate free.

NULL child keys are excluded from both (SQL FK semantics: a NULL reference is
a completeness question for the not-null check, not a dangling reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _non_null(df: DataFrame, keys: list[str]) -> DataFrame:
    cond = None
    for k in keys:
        c = F.col(k).isNotNull()
        cond = c if cond is None else cond & c
    return df.filter(cond)


def fk_orphans(
    child: DataFrame,
    parent: DataFrame,
    on: list[str] | dict[str, str],
    broadcast_parent: bool = True,
) -> DataFrame:
    """Child rows whose foreign key does not exist in ``parent``.

    ``on`` is either a list of shared column names or a ``{child_col:
    parent_col}`` mapping. Returns the child rows unchanged (all columns) —
    output ∝ violations. ``broadcast_parent`` hints the usual dimension-table
    case; set False when the parent is itself huge (shuffled anti-join).
    """
    mapping = {k: k for k in on} if not isinstance(on, dict) else dict(on)
    child_keys = list(mapping)
    # project the parent to its key columns only before any broadcast/shuffle:
    # the join needs nothing else, and a full-width dimension broadcast is the
    # classic way to blow the driver at scale.
    pkeys = parent.select(
        *[F.col(p).alias(c) for c, p in mapping.items()]
    ).dropDuplicates(child_keys)
    if broadcast_parent:
        pkeys = F.broadcast(pkeys)
    return _non_null(child, child_keys).join(pkeys, on=child_keys, how="left_anti")


def fk_coverage(
    child: DataFrame,
    parent: DataFrame,
    on: list[str] | dict[str, str],
) -> DataFrame:
    """Per-key FK coverage in one shuffle: (key..., n_child_rows, in_parent).

    ``n_child_rows = 0`` rows are childless parents; ``in_parent = false``
    rows are orphaned keys. Both directions come from a single tagged union +
    hash aggregation — no join, partial-agg combinable, shuffle bounded by
    distinct keys (not rows).
    """
    mapping = {k: k for k in on} if not isinstance(on, dict) else dict(on)
    child_keys = list(mapping)
    c = _non_null(child, child_keys).select(
        *[F.col(k) for k in child_keys],
        F.lit(1).alias("__child"),
        F.lit(0).alias("__parent"),
    )
    # NULL parent keys are not referenceable (SQL FK semantics): filter them
    # like the child side, or a NULL-key parent row would surface as a bogus
    # childless-parent group and inflate fk_verdict's n_keys.
    p = _non_null(
        parent.select(*[F.col(p).alias(k) for k, p in mapping.items()]), child_keys
    ).select(
        *[F.col(k) for k in child_keys],
        F.lit(0).alias("__child"),
        F.lit(1).alias("__parent"),
    )
    return (
        c.unionByName(p)
        .groupBy(*child_keys)
        .agg(
            F.sum("__child").cast("long").alias("n_child_rows"),
            (F.sum("__parent") > 0).alias("in_parent"),
        )
    )


def fk_verdict(
    child: DataFrame,
    parent: DataFrame,
    on: list[str] | dict[str, str],
) -> DataFrame:
    """One-row PASS/FAIL rollup over :func:`fk_coverage`.

    (n_keys, n_orphan_keys, n_orphan_rows, n_childless_parents, passed) —
    the aggregate of an aggregate, so the second agg runs over distinct keys
    only (tiny relative to the table).
    """
    cov = fk_coverage(child, parent, on)
    orphan = ~F.col("in_parent")
    return cov.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum(orphan.cast("long")).cast("long").alias("n_orphan_keys"),
        F.sum(F.when(orphan, F.col("n_child_rows")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_orphan_rows"),
        F.sum((F.col("n_child_rows") == 0).cast("long"))
        .cast("long")
        .alias("n_childless_parents"),
        (F.sum(orphan.cast("long")) == 0).alias("passed"),
    )
