"""Keyed row-level diff between two table snapshots (CDC-style audit).

Validation engines get pointed at *pairs* of snapshots as often as at single
tables: "what changed between yesterday's Iceberg snapshot and today's?" The
reference has no table-level notion at all (it infers from sampled messages,
/root/reference/schema_infer/schemas/inference.py); this check generalizes its
"did the data drift" question to exact row accounting: which keys were added,
removed, or changed.

Plan shape — ONE shuffle, no join: each side is projected to
``(keys..., side_tag, row_hash)`` where ``row_hash = md5(concat_ws(sep,
compare_cols...))`` is computed map-side, then the tagged union is
hash-aggregated on the keys. The shuffle carries one ~50-byte row per input
row (key + 32-char hash), never the row payload — at 100 TB of wide rows
that's orders of magnitude less traffic than a full-outer join of the raw
tables, and partial aggregation combines same-key rows before the exchange.
Output is ∝ changes (unchanged keys are filtered unless asked for).

Duplicate keys within a side are legal input (the uniqueness check owns that
complaint): the aggregate folds them order-insensitively — per-side count plus
TWO independent per-side content checksums (sums of disjoint 52-bit md5
prefixes, each exact in BIGINT up to ~2^11 copies per key) — so a key going
2→1 copies, or swapping one of two copies' bytes, reports as ``changed`` even
when ``max(hash)`` would collide. A false ``unchanged`` needs BOTH 52-bit sums
to collide simultaneously (~2^-104 per changed key, vs ~2^-52 for one).

NULL-safe hashing: every compare column is coalesced to a sentinel before
concatenation, so NULL ≠ '' ≠ 'null' and a NULL→value flip is a change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: unit-separator sentinel — outside any realistic value alphabet
_SEP = "\x1f"
_NULL = "<null>"


def row_hash(df: DataFrame, cols: list[str]) -> F.Column:
    """md5 over the NULL-coalesced string rendering of ``cols`` (map-side)."""
    return F.md5(
        F.concat_ws(_SEP, *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols])
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Diff ``new`` against ``old`` on ``keys``.

    Output: ``(keys..., change, n_old, n_new)`` with ``change`` ∈
    ``added | removed | changed`` (+ ``unchanged`` when asked).
    ``compare_cols`` defaults to every shared non-key column, in ``old``'s
    column order on both sides so the hashes are comparable.
    """
    if compare_cols is None:
        new_cols = set(new.columns)
        compare_cols = [c for c in old.columns if c not in keys and c in new_cols]

    def side(df: DataFrame, tag_old: int) -> DataFrame:
        h = row_hash(df, compare_cols)
        # two disjoint 52-bit prefixes of the md5 (hex chars 1-13 and 14-26)
        # as exact BIGINT terms: sums stay exact (no float) and
        # order-insensitive; 13 hex chars keeps each per-key sum far from
        # 2^63 even with thousands of duplicate copies, and the independent
        # second sum collapses the collision odds to ~2^-104.
        return df.select(
            *[F.col(k) for k in keys],
            F.lit(tag_old).alias("__old"),
            F.conv(F.substring(h, 1, 13), 16, 10).cast("long").alias("__hsum"),
            F.conv(F.substring(h, 14, 13), 16, 10).cast("long").alias("__hsum2"),
        )

    old_row = F.col("__old") == 1

    def side_sum(col: str, want_old: bool) -> F.Column:
        cond = old_row if want_old else ~old_row
        return F.sum(F.when(cond, F.col(col)).otherwise(F.lit(0))).cast("long")

    agg = (
        side(old, 1)
        .unionByName(side(new, 0))
        .groupBy(*keys)
        .agg(
            F.sum("__old").cast("long").alias("n_old"),
            F.sum(F.lit(1) - F.col("__old")).cast("long").alias("n_new"),
            side_sum("__hsum", True).alias("__old_sum"),
            side_sum("__hsum", False).alias("__new_sum"),
            side_sum("__hsum2", True).alias("__old_sum2"),
            side_sum("__hsum2", False).alias("__new_sum2"),
        )
    )
    change = (
        F.when(F.col("n_old") == 0, F.lit("added"))
        .when(F.col("n_new") == 0, F.lit("removed"))
        .when(
            (F.col("__old_sum") == F.col("__new_sum"))
            & (F.col("__old_sum2") == F.col("__new_sum2"))
            & (F.col("n_old") == F.col("n_new")),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
    )
    out = agg.select(*keys, change.alias("change"), "n_old", "n_new")
    if not include_unchanged:
        out = out.filter(F.col("change") != "unchanged")
    return out


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """One row per change kind: ``(change, n_keys)`` — the audit headline."""
    return (
        snapshot_diff(old, new, keys, compare_cols)
        .groupBy("change")
        .agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
    )
