"""Format detection as DataFrame aggregation.

Replicates /root/reference/schema_infer/formats/detector.py over a full column
instead of a 100-message sample:

* per-format score = 0.7 × (fraction of rows matching any of the format's
  regexes) + 0.3 × validation (detector.py:127-136);
* **the validation dispatch is dead code** (detector.py:154-165 matches the
  literal substrings 'json'/'csv'/'key-value' against the regex *patterns*,
  which never contain them) so validation is always the default 0.5 — verified
  by execution; we reproduce ``0.7·p + 0.15`` faithfully;
* best format = argmax with ties broken by pattern-dict insertion order
  (json, csv, tsv, key-value — Python max() keeps the first);
* all-binary / no-text input → raw-text fallback (detector.py:76-79).

Patterns are anchored with (?s) since the reference matches with re.DOTALL
(detector.py:123).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: Format → regexes, in the reference's dict order (detector.py:30-46).
FORMAT_PATTERNS: dict[str, list[str]] = {
    "json": [r"(?s)^\s*\{.*\}\s*$", r"(?s)^\s*\[.*\]\s*$"],
    "csv": [r"(?s)^[^,]+(,[^,]+)+$", r"(?s)^[^,\n]+(,[^,\n]+)+$"],
    "tsv": [r"(?s)^[^\t]+(\t[^\t]+)+$"],
    "key-value": [
        r"(?s)^[^=]+=[^=]+(,[^=]+=[^=]+)*$",
        r"(?s)^[^:]+:[^:]+(,[^:]+:[^:]+)*$",
    ],
}

_DEAD_VALIDATION_SCORE = 0.5  # detector.py:165 — the only branch ever taken


def format_scores(df: DataFrame, col: str) -> DataFrame:
    """Score every format in one aggregation pass over non-empty text rows.

    Output: (format string, score double, priority int) — priority is the
    reference's tie-break order.
    """
    c = F.trim(F.col(col))
    base = df.filter(F.col(col).isNotNull() & (F.length(c) > 0))
    aggs = []
    for fmt, pats in FORMAT_PATTERNS.items():
        matched = None
        for p in pats:
            m = c.rlike(p)
            matched = m if matched is None else (matched | m)
        aggs.append(F.avg(matched.cast("double")).alias(f"p_{fmt}"))
    wide = base.agg(*aggs)
    structs = [
        F.struct(
            F.lit(fmt).alias("format"),
            # avg over zero rows is NULL — keep it NULL (least() would swallow
            # it); detect_format maps NULL to the raw-text fallback
            F.when(
                F.col(f"p_{fmt}").isNotNull(),
                F.least(
                    F.col(f"p_{fmt}") * 0.7 + F.lit(_DEAD_VALIDATION_SCORE * 0.3),
                    F.lit(1.0),
                ),
            ).alias("score"),
            F.lit(i).alias("priority"),
        )
        for i, fmt in enumerate(FORMAT_PATTERNS)
    ]
    return wide.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def detect_format(df: DataFrame, col: str) -> tuple[str, float]:
    """Best (format, confidence) with the reference's fallback ladder:
    confidence < 0.3 → ('raw-text', 0.1) (detector.py:94-99); empty/binary
    input → ('raw-text', 0.1)."""
    scores = format_scores(df, col)
    w = Window.orderBy(F.desc("score"), F.asc("priority"))
    top = scores.withColumn("rn", F.row_number().over(w)).filter("rn = 1").collect()
    if not top:
        return "raw-text", 0.1
    fmt, conf = top[0]["format"], top[0]["score"]
    if conf is None:
        return "raw-text", 0.1
    if conf < 0.3:
        return "raw-text", 0.1
    return fmt, conf


def delimiter_scores(df: DataFrame, col: str, delimiters: tuple[str, ...] = (",", "\t", "|", ";", " ")) -> DataFrame:
    """Delimiter detection (detector.py:224-264): per candidate, over rows that
    contain it and split into >1 part, consistency = 1/(1+var_pop(n_parts))
    weighted by coverage. Output: (delimiter, score)."""
    c = F.trim(F.col(col))
    base = df.filter(F.col(col).isNotNull() & (F.length(c) > 0))
    # total row count folds into the same agg as the per-delimiter counters —
    # one scan of the text column, not a separate count() action
    aggs = [F.count(F.lit(1)).cast("double").alias("_total")]
    import re as _re

    for i, d in enumerate(delimiters):
        # F.split takes a regex — escape so '|' etc. split literally like str.split
        parts = F.size(F.split(c, F.lit(_re.escape(d)), -1))
        applicable = F.when(c.contains(d) & (parts > 1), parts.cast("double"))
        aggs.append(F.var_pop(applicable).alias(f"var_{i}"))
        aggs.append(F.count(applicable).alias(f"n_{i}"))
    wide = base.agg(*aggs)
    structs = [
        F.struct(
            F.lit(d).alias("delimiter"),
            F.when(
                F.col(f"n_{i}") > 0,
                (1.0 / (1.0 + F.coalesce(F.col(f"var_{i}"), F.lit(0.0))))
                * (F.col(f"n_{i}") / F.col("_total")),
            ).alias("score"),
        )
        for i, d in enumerate(delimiters)
    ]
    return wide.select(F.explode(F.array(*structs)).alias("s")).select("s.*").filter(
        F.col("score").isNotNull()
    )


def detect_delimiter(df: DataFrame, col: str) -> str | None:
    """argmax delimiter if its score clears the 0.5 threshold (detector.py:259-262)."""
    rows = delimiter_scores(df, col).orderBy(F.desc("score")).limit(1).collect()
    if rows and rows[0]["score"] is not None and rows[0]["score"] > 0.5:
        return rows[0]["delimiter"]
    return None
