"""Salted two-phase aggregation for skewed keys (north_rule: skew handled explicitly).

When is salting actually needed? Spark's hash aggregation already does map-side
partial aggregation, so *algebraic* aggregates (count/sum/min/max/avg/HLL) over
a hot key never concentrate rows — only one partial row per (task, key) reaches
the reducer. The cases that DO hot-spot are:

* holistic aggregates (collect_list, exact percentile) over a hot key;
* ``repartition(key)`` / window functions partitioned by a hot key whose group
  is genuinely huge (not ours: conversations are bounded ≤ ~4k turns);
* joins on a skewed key (our drift join — handled by AQE skewJoin, session.py).

This module gives the explicit two-phase shape for the first case, and is used
by the ``conv_stats`` per-conversation rollup so the pattern is exercised and
oracle-checked end to end::

    phase 1: groupBy(key, salt) → partial aggregates   (salt = pmod(h, S))
    phase 2: groupBy(key)       → combine partials

The salt is deterministic (hash of a secondary column), never ``rand()`` —
results must be identical across retries and parallelism levels.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def with_salt(df: DataFrame, n_salts: int, *salt_cols: str) -> DataFrame:
    """Add a deterministic ``__salt`` column in [0, n_salts)."""
    return df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salts))
    )


def salted_two_phase(
    df: DataFrame,
    key: str,
    partials: dict[str, Column],
    combines: dict[str, Column],
    n_salts: int = 16,
    salt_cols: tuple[str, ...] = ("turn_idx",),
) -> DataFrame:
    """Generic salted aggregation: ``partials`` computed per (key, salt),
    ``combines`` merge them per key. Column refs in ``combines`` see the
    partial aliases."""
    p1 = with_salt(df, n_salts, *salt_cols).groupBy(key, "__salt").agg(
        *[expr.alias(name) for name, expr in partials.items()]
    )
    return p1.groupBy(key).agg(*[expr.alias(name) for name, expr in combines.items()])


def conv_stats(df: DataFrame, n_salts: int = 16) -> DataFrame:
    """Per-conversation rollup (turn count, index span, role spread) via the
    salted two-phase shape. For these algebraic stats plain groupBy would also
    work (map-side combine); the salted form is the template for holistic
    per-conversation aggregations at 10^12 rows."""
    return salted_two_phase(
        df,
        "conv_id",
        partials={
            "n_turns_p": F.count(F.lit(1)),
            "max_idx_p": F.max("turn_idx"),
            "min_idx_p": F.min("turn_idx"),
            "n_tool_p": F.sum(F.col("tool").isNotNull().cast("long")),
        },
        combines={
            "n_turns": F.sum("n_turns_p").cast("long"),
            "max_turn_idx": F.max("max_idx_p").cast("int"),
            "min_turn_idx": F.min("min_idx_p").cast("int"),
            "n_tool_turns": F.sum("n_tool_p").cast("long"),
        },
        n_salts=n_salts,
    )
