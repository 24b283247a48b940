"""Format detector + parser expressions vs verified reference behavior."""

from __future__ import annotations

import pytest

from schema_infer_plugin_spark.operators.detector import (
    detect_delimiter,
    detect_format,
    format_scores,
)
from schema_infer_plugin_spark.operators.parsers import (
    parse_csv_line,
    parse_key_value,
    parse_raw_text,
)


def _df(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "msg string")


def test_detect_json(spark):
    fmt, conf = detect_format(_df(spark, ['{"a": 1}', '{"b": 2}', "[1,2]"]), "msg")
    assert fmt == "json" and conf == pytest.approx(0.85)  # 0.7·1 + 0.15 (dead validation)


def test_detect_kv_ties_resolve_by_pattern_order(spark):
    # 'a=1,b=2' matches BOTH the csv and key-value patterns at score 0.85;
    # the reference's max() keeps dict order (json, csv, tsv, key-value) → csv.
    fmt, conf = detect_format(_df(spark, ["a=1,b=2", "c=3,d=4"]), "msg")
    assert fmt == "csv" and conf == pytest.approx(0.85)
    # colon-KV JSON objects tie json vs key-value → json wins by order
    fmt, _ = detect_format(_df(spark, ['{"k": 87}']), "msg")
    assert fmt == "json"


def test_detect_tsv_and_fallback(spark):
    fmt, conf = detect_format(_df(spark, ["a\tb\tc", "d\te\tf"]), "msg")
    assert fmt == "tsv"
    # free text matches nothing → all scores 0.15 < 0.3 → raw-text fallback
    fmt, conf = detect_format(_df(spark, ["hello world how are you"]), "msg")
    assert (fmt, conf) == ("raw-text", 0.1)
    fmt, conf = detect_format(_df(spark, []), "msg")
    assert (fmt, conf) == ("raw-text", 0.1)


def test_format_scores_shape(spark):
    rows = {r["format"]: r["score"] for r in format_scores(_df(spark, ['{"a":1}']), "msg").collect()}
    assert set(rows) == {"json", "csv", "tsv", "key-value"}
    assert rows["json"] == pytest.approx(0.85) and rows["csv"] == pytest.approx(0.15)


def test_detect_delimiter(spark):
    assert detect_delimiter(_df(spark, ["a,b,c", "d,e,f", "g,h,i"]), "msg") == ","
    assert detect_delimiter(_df(spark, ["a|b|c", "d|e|f"]), "msg") == "|"
    assert detect_delimiter(_df(spark, ["plain", "text"]), "msg") is None


def test_parse_key_value_coercion(spark):
    out = parse_key_value(_df(spark, ["name=John, age=30, active=true, score=99.5"]), "msg")
    by_key = {r["kv_key"]: r for r in out.collect()}
    assert by_key["name"]["kv"]["vtype"] == "string"
    assert by_key["age"]["kv"]["as_int"] == 30
    assert by_key["active"]["kv"]["as_boolean"] is True
    assert by_key["score"]["kv"]["as_float"] == 99.5


def test_parse_key_value_quirks(spark):
    # quote stripping, first-separator-only split, oversized value drop
    out = parse_key_value(
        _df(spark, ['a="quoted", b=x=y, c=' + "v" * 1001 + ", =nokey, novalue="]), "msg"
    )
    by_key = {r["kv_key"]: r["kv_value"] for r in out.collect()}
    assert by_key == {"a": "quoted", "b": "x=y"}  # c too long, empties dropped


def test_parse_key_value_quote_path_reference_edges(spark):
    # The reference checks emptiness/length on the STILL-QUOTED value
    # (parsers.py:305), strips quotes after (:308-313), then _convert_value
    # strips via int()/float() and maps '' -> None (:360-383).
    out = parse_key_value(
        _df(spark, ['pad=" 7 ", empty="", lone=", q=\'x\', big="' + "v" * 999 + '"']), "msg"
    )
    rows = {r["kv_key"]: r for r in out.collect()}
    assert rows["pad"]["kv_value"] == " 7 "
    assert rows["pad"]["kv"]["vtype"] == "int" and rows["pad"]["kv"]["as_int"] == 7
    # quoted-empty survives the raw check and coerces to null (reference: None)
    assert rows["empty"]["kv_value"] == "" and rows["empty"]["kv"]["vtype"] == "null"
    assert rows["empty"]["kv"]["as_int"] is None and rows["empty"]["kv"]["as_float"] is None
    # a lone quote char slices to '' exactly like Python's value[1:-1]
    assert rows["lone"]["kv_value"] == "" and rows["lone"]["kv"]["vtype"] == "null"
    assert rows["q"]["kv_value"] == "x" and rows["q"]["kv"]["vtype"] == "string"
    # 999 content chars + 2 quote chars = 1001 raw > 1000: dropped BEFORE
    # quote removal, exactly as the reference's pre-strip length check
    assert "big" not in rows


def test_parse_csv_pad_truncate(spark):
    out = parse_csv_line(_df(spark, ["1,2,3", "4,5", "6,7,8,9"]), "msg", ["x", "y", "z"])
    rows = sorted([tuple(r) for r in out.collect()])
    assert rows == [("1", "2", "3"), ("4", "5", ""), ("6", "7", "8")]


def test_parse_raw_text(spark):
    out = parse_raw_text(_df(spark, ["  hello  "]), "msg").collect()[0]
    assert out["raw_content"] == "hello" and out["message_length"] == 5 and not out["is_binary"]
    bdf = spark.createDataFrame([(b"\x01\x02",)], "payload binary")
    out = parse_raw_text(bdf, "payload").collect()[0]
    assert out["raw_content"] == "0102" and out["message_length"] == 2 and out["is_binary"]


def test_generators_end_to_end(spark):
    import json

    from schema_infer_plugin_spark.operators.generators import (
        fields_from_profile,
        generate_schema,
    )
    from schema_infer_plugin_spark.operators.inference import infer_json_schema

    df = spark.createDataFrame(
        [('{"id": 1, "user": {"name": "jo", "age": 3}, "opt": null}',)], "payload string"
    )
    profile = [r.asDict() for r in infer_json_schema(df, "payload").collect()]
    fields = fields_from_profile(profile)

    avro = json.loads(generate_schema(fields, "avro", "Evt"))
    assert avro["type"] == "record" and avro["name"] == "Evt"
    names = {f["name"]: f for f in avro["fields"]}
    assert names["id"]["type"] == "int"
    assert names["user"]["type"]["type"] == "record"
    nested = {f["name"] for f in names["user"]["type"]["fields"]}
    assert nested == {"name", "age"}
    assert names["opt"]["type"] == ["null", "string"] and names["opt"]["default"] is None

    js = json.loads(generate_schema(fields, "json-schema", "Evt"))
    assert js["properties"]["user"]["properties"]["age"]["type"] == "integer"
    assert js["properties"]["opt"]["type"] == ["string", "null"]
    assert "id" in js["required"] and "opt" not in js["required"]

    proto = generate_schema(fields, "protobuf", "Evt")
    assert 'syntax = "proto3";' in proto
    # inference always emits the parent 'user' as its own object field, and the
    # reference's protobuf generator then renders it as a plain string, NOT a
    # nested message (generators.py:303-311 skips tops already present)
    assert "int32 id = " in proto and "string user = " in proto
    assert "message user_message" not in proto

    with pytest.raises(ValueError):
        generate_schema(fields, "thrift", "Evt")


def test_generators_headless_nested_paths():
    """Paths whose parent field is absent (hand-declared profiles) take the
    nested-record/message branch in all three generators."""
    import json

    from schema_infer_plugin_spark.operators.generators import FieldSpec, generate_schema

    fields = [
        FieldSpec("meta.width", "int"),
        FieldSpec("meta.tags.primary", "string"),
        FieldSpec("name", "string", required=False, nullable=True),
    ]
    avro = json.loads(generate_schema(fields, "avro", "Doc"))
    by = {f["name"]: f for f in avro["fields"]}
    assert by["meta"]["type"]["type"] == "record"
    inner = {f["name"]: f for f in by["meta"]["type"]["fields"]}
    assert inner["width"]["type"] == "int"
    assert inner["tags"]["type"]["fields"][0]["name"] == "primary"
    assert by["name"]["type"] == ["null", "string"]

    js = json.loads(generate_schema(fields, "json-schema", "Doc"))
    assert js["properties"]["meta"]["properties"]["tags"]["properties"]["primary"]["type"] == "string"
    assert js["properties"]["name"]["type"] == ["string", "null"]

    proto = generate_schema(fields, "protobuf", "Doc")
    assert "message meta_message {" in proto
    assert "int32 width = " in proto  # leaf-only fields inside the nested message


def test_delimiter_scores_is_lazy_single_pass(spark):
    # the total-row count must fold into the agg, not run as a separate
    # count() action at DataFrame-construction time
    from schema_infer_plugin_spark.operators.detector import delimiter_scores

    sc = spark.sparkContext
    sc.setJobGroup("delim-lazy", "laziness probe")
    try:
        out = delimiter_scores(_df(spark, ["a|b|c", "d|e|f"]), "msg")
        jobs_before_action = sc.statusTracker().getJobIdsForGroup("delim-lazy")
        assert list(jobs_before_action) == [], "construction triggered a Spark job"
        rows = {r["delimiter"]: r["score"] for r in out.collect()}
    finally:
        sc.setJobGroup(None, None)
    assert rows["|"] == 1.0


def test_generators_render_array_element_types():
    """array<T> renders T in all three formats instead of collapsing to string."""
    import json as _json

    from schema_infer_plugin_spark.operators.generators import (
        FieldSpec,
        generate_avro,
        generate_json_schema,
        generate_protobuf,
    )

    fields = [FieldSpec(name="xs", type_name="array<int>", array=True)]
    avro = _json.loads(generate_avro(fields, "R"))
    assert avro["fields"][0]["type"] == {"type": "array", "items": "int"}
    js = _json.loads(generate_json_schema(fields, "R"))
    assert js["properties"]["xs"]["type"] == "array"
    assert js["properties"]["xs"]["items"] == {"type": "integer"}
    proto = generate_protobuf(fields, "R")
    assert "repeated int32 xs = 1;" in proto


def test_default_value_emission():
    """FieldSpec.default_value parity (VERDICT r4 #6, reference
    generators.py:166-173 / :525-527): Avro keeps the plain type and emits
    the default (NO null-union wrap even for optional fields); JSON Schema
    adds a "default" key; proto3 has no field defaults, so nothing changes."""
    import json

    from schema_infer_plugin_spark.operators.generators import (
        FieldSpec,
        generate_avro,
        generate_json_schema,
        generate_protobuf,
    )

    fields = [
        FieldSpec(name="status", type_name="string", required=False,
                  nullable=True, default_value="new"),
        FieldSpec(name="n", type_name="int", required=False, nullable=True),
    ]
    avro = json.loads(generate_avro(fields, "R"))
    by_name = {f["name"]: f for f in avro["fields"]}
    assert by_name["status"]["default"] == "new"
    assert by_name["status"]["type"] == "string"  # default suppresses the union
    assert by_name["n"]["type"] == ["null", "int"] and by_name["n"]["default"] is None

    js = json.loads(generate_json_schema(fields, "R"))
    assert js["properties"]["status"]["default"] == "new"
    assert "default" not in js["properties"]["n"]

    proto = generate_protobuf(fields, "R")
    assert "default" not in proto
