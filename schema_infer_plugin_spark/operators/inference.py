"""Dynamic JSON schema inference — the reference's core capability, distributed.

The reference walks parsed dicts per record in Python
(/root/reference/schema_infer/schemas/inference.py:212-264) over a ≤50-message
sample. Here the *flattening* of dynamically-typed JSON runs as an
Arrow-batched ``mapInPandas`` (genuinely per-record dynamic inspection — the one
place Python is warranted), emitting one observation row per (record, field
path); the *aggregation* into a schema profile is a plain Spark groupBy that
scales to the full table.

Replicated verified reference semantics (SURVEY.md §1.2 — code truth, not the
reference's test suite):

* field paths are dotted; array-of-object elements append ``[]``, doubly-nested
  ``[][]`` (inference.py:255-264);
* **array-ness is dropped at the field level**: a list counts its *element
  plurality type name* into the histogram (``[1,2,3]`` → ``int``, ``[]`` →
  ``array``, ``[[1,2]]`` → ``array<int>``, list-of-dicts → ``object``;
  inference.py:245,286-307);
* bool-before-int (``isinstance(value, bool)`` first, :278);
* dicts past ``max_depth`` truncate to ``string`` (:310-311); recursion stops
  past the depth guard (:229-231);
* plurality type wins; share < 0.8 with >1 type → ``union`` (:361-383);
  all-null → nullable ``string`` (:364-366);
* ``required = null_count == 0 or null_ratio < 0.1`` (:386) — missing keys are
  NOT counted (only present keys increment total_count, :233-237);
* examples: Python-repr truncation for containers (str(value[:3]) / first 3
  dict items, :317-337), ≤3 emitted. The reference's selection is
  set-iteration-order nondeterministic; ours is the deterministic variant
  (lexicographically first 3 distinct) — documented divergence.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OBS_SCHEMA = StructType(
    [
        StructField("field_path", StringType()),
        StructField("type_name", StringType()),
        StructField("is_null", BooleanType()),
        StructField("example", StringType()),
    ]
)


def _value_type_name(value, depth: int, max_depth: int) -> str:
    """Type-name lattice of inference.py:266-315 (array-ness collapsed to the
    element plurality name, exactly as the field-level Counter sees it)."""
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, int):
        return "int"
    if isinstance(value, float):
        return "float"
    if isinstance(value, str):
        return "string"
    if isinstance(value, list):
        if not value:
            return "array"
        counts: dict[str, int] = {}
        order: list[str] = []
        for item in value:
            name = _element_type_str(item, depth + 1, max_depth)
            if name not in counts:
                order.append(name)
            counts[name] = counts.get(name, 0) + 1
        # most_common(1) keeps first-seen on ties (Counter insertion order)
        best = max(order, key=lambda n: counts[n])
        return best
    if isinstance(value, dict):
        return "string" if depth >= max_depth else "object"
    return "string"


def _element_type_str(value, depth: int, max_depth: int) -> str:
    """str(FieldType) of an array element — nested lists render array<...>."""
    if isinstance(value, list):
        inner = _value_type_name(value, depth, max_depth)
        return f"array<{inner}>" if value else "array"
    return _value_type_name(value, depth, max_depth)


def _example_str(value) -> str:
    """Example rendering of inference.py:317-337 (Python repr truncation)."""
    if isinstance(value, (str, int, float, bool)):
        return str(value)
    if isinstance(value, list):
        return str(value[:3])
    if isinstance(value, dict):
        return str(dict(list(value.items())[:3]))
    return str(value)


def _walk(record: dict, depth: int, prefix: str, max_depth: int, out: list) -> None:
    """_analyze_record (inference.py:212-264), emitting observation tuples."""
    if depth > max_depth:
        return
    for key, value in record.items():
        path = f"{prefix}.{key}" if prefix else key
        if value is None:
            out.append((path, "null", True, None))
            continue
        out.append((path, _value_type_name(value, depth, max_depth), False, _example_str(value)))
        if isinstance(value, dict) and depth < max_depth:
            _walk(value, depth + 1, path, max_depth, out)
        elif isinstance(value, list) and depth < max_depth:
            for item in value:
                if isinstance(item, dict):
                    _walk(item, depth + 1, f"{path}[]", max_depth, out)
                elif isinstance(item, list):
                    for nested in item:
                        if isinstance(nested, dict):
                            _walk(nested, depth + 1, f"{path}[][]", max_depth, out)


def json_observations(df: DataFrame, col: str, max_depth: int = 10) -> DataFrame:
    """Flatten a JSON-string column into per-field observations (Arrow batches).

    Unparseable/non-object payloads follow JSONParser.parse (parsers.py:77-108):
    list-of-dicts merge last-wins, bare list → {"array": ...}, scalar →
    {"value": ...}, parse failure → record dropped.
    """

    def flatten(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list = []
            for text in pdf[col]:
                if text is None:
                    continue
                try:
                    data = json.loads(text)
                except (ValueError, TypeError):
                    continue
                if isinstance(data, list):
                    if data and isinstance(data[0], dict):
                        merged: dict = {}
                        for item in data:
                            if isinstance(item, dict):
                                merged.update(item)
                        data = merged
                    else:
                        data = {"array": data}
                elif not isinstance(data, dict):
                    data = {"value": data}
                _walk(data, 0, "", max_depth, rows)
            out = pd.DataFrame(rows, columns=["field_path", "type_name", "is_null", "example"])
            if len(out):
                # Bound the example stream per batch: keep the first 3 DISTINCT
                # examples per (path, type), null the rest. The downstream
                # collect_set then holds ≤ 3 × #batches values per group instead
                # of every distinct value in the table (scale-safety; the
                # reference itself caps at 5 seen, inference.py:248-250).
                first = ~out.duplicated(["field_path", "type_name", "example"])
                occ = out[first].groupby(["field_path", "type_name"]).cumcount()
                keep = occ[occ < 3].index
                out.loc[~out.index.isin(keep), "example"] = None
            yield out

    return df.select(col).mapInPandas(flatten, schema=OBS_SCHEMA)


def infer_json_schema(
    df: DataFrame,
    col: str,
    max_depth: int = 10,
    confidence_threshold: float = 0.8,
    n_examples: int = 3,
    null_ratio_threshold: float = 0.1,
) -> DataFrame:
    """Full-table JSON schema inference → one profile row per field path.

    Output: (field_path, inferred_type, confidence, nullable, required,
    total_count, null_count, examples array<string>). The heavy lifting is two
    hash aggregations over the observation stream — map-side combinable, scale-
    safe; only the per-path resolution (tiny) runs as column math after.
    """
    obs = json_observations(df, col, max_depth)
    per_type = obs.groupBy("field_path", "type_name").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.slice(F.array_sort(F.collect_set("example")), 1, n_examples).alias("ex"),
    )
    per_path = per_type.groupBy("field_path").agg(
        F.sum("cnt").cast("long").alias("total_count"),
        F.sum(F.when(F.col("type_name") == "null", F.col("cnt")).otherwise(0)).cast("long").alias("null_count"),
        # plurality among non-null types; min of (-cnt, name) is a TOTAL order:
        # highest count first, full-string lexicographic name on ties — the
        # reference's tie depends on dict iteration order, and a first-char
        # ordering would leave e.g. 'array' vs 'array<int>' nondeterministic
        F.min(
            F.when(
                F.col("type_name") != "null",
                F.struct((-F.col("cnt")).alias("neg_cnt"), F.col("type_name").alias("nm")),
            )
        ).alias("win"),
        F.count(F.when(F.col("type_name") != "null", 1)).alias("n_types"),
        F.slice(F.array_sort(F.flatten(F.collect_list("ex"))), 1, n_examples).alias("examples"),
    )
    non_null = F.col("total_count") - F.col("null_count")
    winner_cnt = -F.col("win.neg_cnt")
    confidence = F.when(non_null > 0, winner_cnt / non_null).otherwise(F.lit(None))
    inferred = (
        F.when(non_null == 0, F.lit("string"))
        .when((confidence < confidence_threshold) & (F.col("n_types") > 1), F.lit("union"))
        .otherwise(F.col("win.nm"))
    )
    return per_path.select(
        "field_path",
        inferred.alias("inferred_type"),
        F.round(confidence, 6).cast("double").alias("confidence"),
        (F.col("null_count") > 0).alias("nullable"),
        (
            (F.col("null_count") == 0)
            | ((F.col("null_count") / F.col("total_count")) < null_ratio_threshold)
        ).alias("required"),
        "total_count",
        "null_count",
        "examples",
    )
