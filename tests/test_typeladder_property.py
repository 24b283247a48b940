"""Property test: the vectorized type ladder equals the reference semantics.

A pure-Python model of the verified reference behavior (SURVEY.md §1.2:
lowercase true/false → boolean, integral literal → int, double-parsable →
float, else string; bool checked before int) is compared against the Spark
expression on hypothesis-generated strings in one batch.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from schema_infer_plugin_spark.functions.typeladder import string_value_type

def _model(v: str | None) -> str:
    """Reference ladder — the literal code of KeyValueParser._convert_value
    (parsers.py:365-383: bool rung, then int(v), then float(v)) — restricted
    to the value domain the engine classifies (see strategy note). The
    emptiness rung ('' → None, :363) lives at the KV level
    (operators/parsers.kv_coerced_value), not in string_value_type, which
    keeps the inference semantics for '' as a string value."""
    if v is None:
        return "null"
    if v.lower() in ("true", "false"):
        return "boolean"
    try:
        int(v)
        return "int"
    except ValueError:
        pass
    try:
        float(v)
    except ValueError:
        return "string"
    return "float"


# Mix of adversarial literals and random ASCII text. inf/nan spellings and
# '_' digit separators are excluded by the engine spec (SURVEY.md §1.2): the
# float branch is a Python-float-grammar regex (typeladder.FLOAT_RE) minus
# those spellings; Java-suffixed literals ('0D', '1f') are IN the domain and
# must classify string.
_EXOTIC = re.compile(r"(?i)^[\s+-]*(inf|nan)|_")

_values = st.one_of(
    st.none(),
    st.sampled_from(
        ["true", "FALSE", "True", "0", "-17", "+4", "3.14", "-0.5", "1e3",
         "1E-2", ".5", "5.", "0x1f", "  7  ", "", " ", "7a", "a7",
         "100000000000000000000", "-9223372036854775809",
         # Java Double.parseDouble accepts these; Python float() does not:
         "0D", "1f", "2.5d", "1.5F", "3e2f", "  4.5d  ", "."]
    ),
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=12),
    st.integers().map(str),
    st.floats(allow_nan=False, allow_infinity=False).map(repr),
).filter(lambda v: v is None or not _EXOTIC.search(v))


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_values, min_size=1, max_size=40))
def test_ladder_matches_reference_model(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = [r["t"] for r in df.select(string_value_type(F.col("v")).alias("t")).collect()]
    want = [_model(v) for v in vals]
    assert got == want
