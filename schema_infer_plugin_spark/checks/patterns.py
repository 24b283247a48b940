"""Regex pattern-conformity checks (format constraints on string columns).

The reference's format detectors score whole payloads against per-format
regexes (/root/reference/schema_infer/formats/detector.py:48-101 — `avg(rlike)`
over a sample decides JSON vs CSV vs KV). This check turns the same machinery
into a per-COLUMN declarative constraint: "every non-null value of `col`
matches `pattern`" — ids, enum-ish codes, ISO dates kept as strings, etc.

Pure projection + (for the rollup) one tiny aggregation: `rlike` evaluates
JVM-side inside whole-stage codegen, violations are a filter (output ∝
violations, no shuffle at all), and the per-column match-rate summary is a
single pass computing every column's rate in one wide agg row — the same
one-scan shape as operators/profile.

NULL semantics: NULLs are never pattern violations (completeness belongs to
the not-null check); they are reported separately in the summary so a column
can't look conformant by being empty.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pattern_violations(
    df: DataFrame,
    col_name: str,
    pattern: str,
    keys: list[str] | None = None,
) -> DataFrame:
    """Rows whose non-null ``col_name`` does NOT fully match ``pattern``.

    ``pattern`` is an unanchored Java regex — callers anchor with ``^...$``
    for full-match semantics (kept explicit because the two conventions
    differ across engines and the reference anchors explicitly,
    detector.py:57). Output: ``(*keys, col_name, observed)`` — violation rows
    only, a codegen filter with no shuffle.
    """
    keep = keys or [c for c in df.columns if c != col_name]
    c = F.col(col_name)
    return df.filter(c.isNotNull() & ~c.rlike(pattern)).select(
        *keep,
        F.lit(col_name).alias("col_name"),
        c.cast("string").alias("observed"),
    )


def pattern_match_rates(df: DataFrame, rules: dict[str, str]) -> DataFrame:
    """Per-column conformity rollup in ONE scan.

    ``rules`` maps column → regex. Output, one row per rule:
    ``(col_name, pattern, n_rows, n_null, n_violations, match_rate)`` where
    ``match_rate`` is over non-null values (NULL on all-null columns).
    All rules ride a single wide aggregation — adding a rule adds three
    counters to the agg row, not a pass over the data.
    """
    aggs: list = [F.count(F.lit(1)).cast("long").alias("__total")]
    for col_name, pattern in rules.items():
        c = F.col(col_name)
        aggs.append(F.sum(c.isNull().cast("long")).cast("long").alias(f"{col_name}__null"))
        aggs.append(
            F.sum((c.isNotNull() & ~c.rlike(pattern)).cast("long"))
            .cast("long")
            .alias(f"{col_name}__viol")
        )
    wide = df.agg(*aggs)

    structs = [
        F.struct(
            F.lit(col_name).alias("col_name"),
            F.lit(pattern).alias("pattern"),
            F.col("__total").alias("n_rows"),
            F.col(f"{col_name}__null").alias("n_null"),
            F.col(f"{col_name}__viol").alias("n_violations"),
            F.round(
                F.lit(1.0)
                - F.col(f"{col_name}__viol")
                / F.nullif(F.col("__total") - F.col(f"{col_name}__null"), F.lit(0)),
                6,
            )
            .cast("double")
            .alias("match_rate"),
        )
        for col_name, pattern in rules.items()
    ]
    return wide.select(F.explode(F.array(*structs)).alias("s")).select("s.*")
