"""Dynamic JSON inference — verified against the reference's *code behavior*
(FIXTURES.md §3: arrayness dropped, bool-before-int, plurality ties keep
first-seen, merged list-of-dicts, depth truncation)."""

from __future__ import annotations

from schema_infer_plugin_spark.operators.inference import infer_json_schema


def _infer(spark, payloads, **kw):
    df = spark.createDataFrame([(p,) for p in payloads], "payload string")
    return {r["field_path"]: r for r in infer_json_schema(df, "payload", **kw).collect()}


def test_basic_types(spark):
    rows = _infer(spark, ['{"s":"hello","i":42,"f":3.14,"b":true,"z":null}'])
    assert rows["s"]["inferred_type"] == "string"
    assert rows["i"]["inferred_type"] == "int"
    assert rows["f"]["inferred_type"] == "float"
    assert rows["b"]["inferred_type"] == "boolean"  # bool before int
    assert rows["z"]["inferred_type"] == "string" and rows["z"]["nullable"]
    assert not rows["z"]["required"]  # all-null: ratio 1.0


def test_arrayness_dropped_at_field_level(spark):
    # inference.py:245 discards the array flag — verified reference behavior
    rows = _infer(spark, ['{"sa":["a","b"],"na":[1,2,3],"ea":[],"mixed":[1,"two",3.0],"mat":[[1,2],[3,4]],"objs":[{"x":1}]}'])
    assert rows["sa"]["inferred_type"] == "string"
    assert rows["na"]["inferred_type"] == "int"
    assert rows["ea"]["inferred_type"] == "array"
    assert rows["mixed"]["inferred_type"] == "int"  # tie → first-seen element type
    assert rows["mat"]["inferred_type"] == "array<int>"
    assert rows["objs"]["inferred_type"] == "object"


def test_nested_paths(spark):
    rows = _infer(spark, ['{"user":{"name":"John","age":30,"address":{"city":"NY"}}}'])
    assert rows["user"]["inferred_type"] == "object"
    assert rows["user.name"]["inferred_type"] == "string"
    assert rows["user.age"]["inferred_type"] == "int"
    assert rows["user.address"]["inferred_type"] == "object"
    assert rows["user.address.city"]["inferred_type"] == "string"


def test_array_of_objects_paths(spark):
    rows = _infer(spark, ['{"items":[{"id":1,"name":"x"},{"id":2}]}'])
    assert rows["items"]["inferred_type"] == "object"
    assert rows["items[].id"]["inferred_type"] == "int"
    assert rows["items[].id"]["total_count"] == 2
    assert rows["items[].name"]["inferred_type"] == "string"
    # missing keys are NOT counted: items[].name total is 1, still required
    assert rows["items[].name"]["total_count"] == 1 and rows["items[].name"]["required"]


def test_nested_array_of_objects(spark):
    rows = _infer(spark, ['{"deep":[[{"z":5}]]}'])
    assert rows["deep"]["inferred_type"] == "array<object>"
    assert rows["deep[][].z"]["inferred_type"] == "int"


def test_nullable_and_union(spark):
    rows = _infer(spark, ['{"v":"a"}', '{"v":null}', '{"v":"b"}'])
    v = rows["v"]
    assert v["inferred_type"] == "string" and v["nullable"] and not v["required"]  # ratio 1/3
    rows = _infer(spark, ['{"u":"s"}', '{"u":1}', '{"u":true}', '{"u":null}'])
    assert rows["u"]["inferred_type"] == "union"


def test_json_parser_wrappers(spark):
    # JSONParser.parse quirks (parsers.py:87-104): list-of-dicts merge
    # last-wins, bare list wraps as {"array": ...}, scalar as {"value": ...}
    rows = _infer(spark, ['[{"a":1},{"a":2,"b":"x"}]'])
    assert rows["a"]["total_count"] == 1  # merged into ONE record
    assert rows["b"]["inferred_type"] == "string"
    rows = _infer(spark, ["[1,2,3]"])
    assert rows["array"]["inferred_type"] == "int"
    rows = _infer(spark, ["42"])
    assert rows["value"]["inferred_type"] == "int"
    # unparseable rows are dropped entirely
    rows = _infer(spark, ["{bad json", '{"ok":1}'])
    assert rows["ok"]["total_count"] == 1


def test_max_depth_truncation(spark):
    # dict at depth >= max_depth profiles as string (inference.py:310-311)
    payload = '{"l0":{"l1":{"l2":{"l3":"deep"}}}}'
    rows = _infer(spark, [payload], max_depth=2)
    assert rows["l0"]["inferred_type"] == "object"
    assert rows["l0.l1"]["inferred_type"] == "object"
    assert rows["l0.l1.l2"]["inferred_type"] == "string"  # truncated
    assert "l0.l1.l2.l3" not in rows


def test_confidence_and_examples(spark):
    payloads = ['{"m":1}'] * 8 + ['{"m":"x"}'] * 2
    rows = _infer(spark, payloads)
    m = rows["m"]
    assert m["inferred_type"] == "int" and m["confidence"] == 0.8  # not < 0.8
    assert 1 <= len(m["examples"]) <= 3
    # container examples render as Python repr truncation (inference.py:317-337)
    rows = _infer(spark, ['{"arr":[1,2,3,4,5],"obj":{"a":1,"b":2,"c":3,"d":4}}'])
    assert rows["arr"]["examples"] == ["[1, 2, 3]"]
    assert rows["obj"]["examples"] == ["{'a': 1, 'b': 2, 'c': 3}"]


def test_plan_is_arrow_vectorized(spark):
    df = spark.createDataFrame([('{"a":1}',)], "payload string")
    out = infer_json_schema(df, "payload")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # Arrow path only (FIXTURES.md §5)


def test_tiebreak_total_order_on_type_names(spark):
    # equal counts of 'array' ([]) and 'array<int>' ([[1]]) — both share the
    # first char, so an ascii(first-char) tie-break would be nondeterministic.
    # Full-string order must pick 'array' (lexicographically smallest).
    from schema_infer_plugin_spark.operators.inference import infer_json_schema

    rows = [('{"x": []}',), ('{"x": [[1]]}',)] * 4
    df = spark.createDataFrame(rows, ["payload"])
    # threshold 0.5: confidence == 0.5 is NOT < threshold, so the winner (not
    # 'union') is emitted and the tie-break itself is observable
    out = infer_json_schema(df, "payload", confidence_threshold=0.5).collect()
    row = {r["field_path"]: r for r in out}["x"]
    assert row["inferred_type"] == "array"
