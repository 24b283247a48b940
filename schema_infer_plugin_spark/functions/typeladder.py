"""The reference's type lattice as vectorized column expressions.

Semantics replicated from verified behavior of
/root/reference/schema_infer/schemas/inference.py and formats/parsers.py:

* Coercion ladder checks **bool before int** (parsers.py:360-383 `_convert_value`,
  inference.py:278 `isinstance(value, bool)` first — Python bools are ints, so the
  order is semantic, not cosmetic).
* Plurality type wins; if its share of non-null observations is below the 0.8
  confidence threshold AND more than one non-null type was observed, the field
  demotes to ``union`` (inference.py:361-383).
* ``nullable = null_count > 0`` (inference.py:359); an all-null field profiles as
  nullable ``string`` (inference.py:364-366).
* ``required = null_count == 0 OR null_ratio < 0.1`` (inference.py:386).

The reference evaluates this per-record in Python over a ≤50-message sample; here
each rule is a Column expression evaluated exactly over the full table in one
aggregation pass.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: Order matters: first match wins (bool before int before float).
TYPE_NAMES = ("boolean", "int", "float", "string")

#: The int rung tests trim(col): Python int() strips surrounding whitespace
#: (int(" 7 ") == 7), and padded values genuinely reach the reference ladder
#: through the KV quote path (k=" 7 " → strip → quote removal → " 7 " →
#: _convert_value, parsers.py:299-315). Spark trim strips ASCII spaces only;
#: tab/unicode-space padding is outside the engine spec (same restriction the
#: text operators document). Spark's ANSI cast to long also trims spaces, so
#: every trim-matched value is castable.
_INT_RE = r"^[+-]?[0-9]+$"

#: Python float() grammar (minus inf/nan spellings and '_' separators, which the
#: engine spec excludes — SURVEY.md §1.2). The float branch is gated on THIS
#: regex, not on Spark's cast: Spark's try_cast("double") follows Java
#: Double.parseDouble, which also accepts trailing D/d/F/f suffixes ('0D',
#: '1f', '2.5d'), while the reference's Python float() ladder
#: (/root/reference/schema_infer/formats/parsers.py:360-383) raises on them →
#: string. Every string matching this grammar is castable by BOTH Spark and
#: DuckDB, so the regex alone decides the branch — no cast probe needed.
FLOAT_RE = r"^[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?$"


def string_value_type(col: Column) -> Column:
    """Classify one string value per the reference coercion ladder.

    Returns one of 'null' | 'boolean' | 'int' | 'float' | 'string'.
    Mirrors KeyValueParser._convert_value (parsers.py:360-383): lowercase
    true/false → boolean; integral literal → int; Python-float-grammar literal
    → float (see FLOAT_RE — NOT a double cast, which is Java grammar);
    everything else string.
    """
    return (
        F.when(col.isNull(), F.lit("null"))
        .when(F.lower(col).isin("true", "false"), F.lit("boolean"))
        .when(F.trim(col).rlike(_INT_RE), F.lit("int"))
        .when(F.trim(col).rlike(FLOAT_RE), F.lit("float"))
        .otherwise(F.lit("string"))
    )


#: code order: 0=null, then TYPE_NAMES in ladder order 1..4
TYPE_CODES = {name: i + 1 for i, name in enumerate(TYPE_NAMES)}


def string_value_type_code(col: Column) -> Column:
    """``string_value_type`` as a tiny int code (0=null, 1=boolean, 2=int,
    3=float, 4=string). Classify ONCE per row in a pre-projection and aggregate
    on the code — the regex ladder is the expensive part, and four
    ``sum(when(ladder == ...))`` counters would otherwise re-evaluate it four
    times per row (measured ~3× slower on a high-cardinality column)."""
    return (
        F.when(col.isNull(), F.lit(0))
        .when(F.lower(col).isin("true", "false"), F.lit(1))
        .when(F.trim(col).rlike(_INT_RE), F.lit(2))
        .when(F.trim(col).rlike(FLOAT_RE), F.lit(3))
        .otherwise(F.lit(4))
        .cast("byte")
    )


def type_code_proj(col_name: str) -> Column:
    """The pre-projection column for ``type_profile_exprs``."""
    return string_value_type_code(F.col(col_name)).alias(f"{col_name}__code")


def type_profile_exprs(col_name: str, from_code: bool = False) -> list[Column]:
    """Aggregate expressions producing one column's type histogram in a single pass.

    Emits aliased aggregates ``{col}__cnt_{type}``, ``{col}__total``,
    ``{col}__nulls`` suitable for a wide ``df.agg(*...)`` over many columns at once
    (one table scan for the whole profile — the at-scale replacement for the
    reference's per-record Counter in inference.py:199-264).

    With ``from_code=True`` the input frame must already carry the
    ``{col}__code`` column from :func:`type_code_proj`; the ladder then runs
    once per row instead of once per counter.
    """
    if from_code:
        code = F.col(f"{col_name}__code")
        exprs = [
            F.sum((code == TYPE_CODES[name]).cast("int")).cast("long").alias(
                f"{col_name}__cnt_{name}"
            )
            for name in TYPE_NAMES
        ]
        exprs.append(F.count(F.lit(1)).alias(f"{col_name}__total"))
        exprs.append(F.sum((code == 0).cast("long")).cast("long").alias(f"{col_name}__nulls"))
        return exprs
    c = F.col(col_name)
    t = string_value_type(c)
    exprs = [
        F.sum(F.when(t == F.lit(name), 1).otherwise(0)).cast("long").alias(f"{col_name}__cnt_{name}")
        for name in TYPE_NAMES
    ]
    exprs.append(F.count(F.lit(1)).alias(f"{col_name}__total"))
    exprs.append(F.sum(c.isNull().cast("long")).cast("long").alias(f"{col_name}__nulls"))
    return exprs


def resolve_profile(
    cnt_boolean: Column,
    cnt_int: Column,
    cnt_float: Column,
    cnt_string: Column,
    total: Column,
    nulls: Column,
    confidence_threshold: float = 0.8,
    null_ratio_threshold: float = 0.1,
) -> dict[str, Column]:
    """Resolve a type histogram into (inferred_type, confidence, nullable, required).

    Pure column math over aggregated counts — runs post-shuffle on tiny data, but
    written as expressions so it also composes under groupBy(partition_key).
    """
    non_null = total - nulls
    counts = {
        "boolean": cnt_boolean,
        "int": cnt_int,
        "float": cnt_float,
        "string": cnt_string,
    }
    max_cnt = F.greatest(*counts.values())
    # Plurality winner with the ladder order as tie-break. The reference's
    # max(types.items(), key=count) keeps the FIRST-OBSERVED type on ties
    # (dict insertion order = the order types appeared in its Kafka sample) —
    # inherently input-order-dependent, so no distributed aggregation can
    # reproduce it; the engine makes ties deterministic via ladder order
    # instead. Observable divergence requires confidence_threshold <= 0.5:
    # at the default 0.8 a tie's max share is <= 0.5 < threshold, so the
    # union rule masks the winner whenever >1 type exists
    # (tests/test_typeladder.py::test_tie_breaks_masked_by_union_rule).
    winner = F.lit("string")
    for name in reversed(TYPE_NAMES):
        winner = F.when(counts[name] == max_cnt, F.lit(name)).otherwise(winner)
    n_distinct_types = sum(
        F.when(c > 0, 1).otherwise(0) for c in counts.values()
    )
    confidence = F.when(non_null > 0, max_cnt / non_null).otherwise(F.lit(None).cast("double"))
    inferred = (
        F.when(non_null == 0, F.lit("string"))  # all-null → string (inference.py:364-366)
        .when(
            (confidence < F.lit(confidence_threshold)) & (n_distinct_types > 1),
            F.lit("union"),
        )
        .otherwise(winner)
    )
    nullable = nulls > 0
    required = (nulls == 0) | ((nulls / total) < null_ratio_threshold)
    return {
        "inferred_type": inferred,
        "confidence": confidence,
        "nullable": nullable,
        "required": required,
    }
