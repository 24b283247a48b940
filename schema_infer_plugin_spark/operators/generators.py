"""Schema text generators: Avro / JSON-Schema / Protobuf from profile rows.

Renders the engine's inferred profile (operators/inference.py /
operators/profile.py output) into the same schema-text shapes the reference
emits (/root/reference/schema_infer/schemas/generators.py:44-591). This is
driver-side work over at most a few hundred profile rows — collect() is
correct here; the reference's "registry sink" role is played by writing these
texts next to the run ledger.

Preserved output semantics (same file:line cites):
* fields sorted by name (inference.py:179), dotted paths nested into records /
  objects / messages grouped by first path segment (generators.py:67-155,
  424-514);
* Avro: non-required scalars become ["null", type] with default null
  (:166-174); names sanitized to [A-Za-z0-9_], letter/_ start, ≤64 chars
  (:209-241); type map string/int/float→double/boolean (:176-205);
* JSON-Schema: draft-07, nullable → type [base, "null"] (:556-563), required
  arrays per nesting level, examples carried through (:530-542);
* Protobuf: proto3, package = namespace lowercased with underscores,
  sequential field numbering including nested-message placeholder fields,
  nested messages list only their leaf fields (:303-346) — the reference does
  not recurse there, and neither do we (fidelity over elegance).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field as dc_field


@dataclass
class FieldSpec:
    """One flat (possibly dotted) field of an inferred schema."""

    name: str
    type_name: str  # string|int|float|boolean|null|object|array|union|array<...>
    nullable: bool = False
    array: bool = False
    required: bool = True
    examples: list = dc_field(default_factory=list)
    description: str | None = None
    #: reference SchemaField.default_value (schemas/inference.py:58-76):
    #: inference never sets it, but it is part of the documented surface and
    #: the generators honor it (Avro: a set default suppresses the
    #: nullable->["null",T] wrap, generators.py:166-173; JSON Schema: a
    #: "default" key, :525-527; proto3 has no field defaults — not emitted)
    default_value: object | None = None


def fields_from_profile(rows: list[dict]) -> list[FieldSpec]:
    """Adapt infer_json_schema()/type_profile() output rows to FieldSpecs."""
    specs = []
    for r in rows:
        name = r.get("field_path") or r.get("column")
        t = r["inferred_type"]
        array = t.startswith("array")
        specs.append(
            FieldSpec(
                name=name,
                type_name=t,
                nullable=bool(r.get("nullable", False)),
                array=array,
                required=bool(r.get("required", True)),
                examples=list(r.get("examples") or []),
                description=f"Field {name} with type {t}",
            )
        )
    return sorted(specs, key=lambda s: s.name)


def _sanitize(name: str, prefix: str) -> str:
    out = re.sub(r"[^A-Za-z0-9_]", "_", name)
    if out and not re.match(r"^[A-Za-z_]", out):
        out = f"{prefix}_{out}"
    return (out or prefix)[:64]


def _group_by_head(fields: list[tuple[str, FieldSpec]]) -> dict[str, list[tuple[str | None, FieldSpec]]]:
    """Group (path, spec) by first dotted segment; None path marks a leaf."""
    groups: dict[str, list[tuple[str | None, FieldSpec]]] = {}
    for path, spec in fields:
        head, _, rest = path.partition(".")
        groups.setdefault(head, []).append((rest or None, spec))
    return groups


def _elem_name(type_name: str) -> str | None:
    """Element ladder-type of a parametrized array name, else None."""
    if type_name.startswith("array<") and type_name.endswith(">"):
        return type_name[6:-1]
    return None


# ---------------------------------------------------------------------------
# Avro
# ---------------------------------------------------------------------------

_AVRO_TYPES = {
    "string": "string",
    "int": "int",
    "float": "double",
    "boolean": "boolean",
    "null": "null",
    "object": "record",
    "array": "array",
    "union": "union",
}


def _avro_leaf(spec: FieldSpec) -> dict:
    tn = spec.type_name
    # parametrized array: render the element type, don't collapse to string
    elem = _elem_name(tn)
    base = "array" if elem is not None else _AVRO_TYPES.get(tn, "string")
    t: object = base
    if spec.array:
        if elem is not None:
            items = _AVRO_TYPES.get(elem, "string")
            items = "string" if items in ("record", "union") else items
        else:
            items = "string" if base == "record" else base
        t = {"type": "array", "items": items}
    f = {
        "name": _sanitize(spec.name.rsplit(".", 1)[-1], "record"),
        "type": t,
        "doc": spec.description or f"Field {spec.name}",
    }
    if spec.default_value is not None:
        f["default"] = spec.default_value
    elif not spec.required and isinstance(t, str) and t != "null":
        f["type"] = ["null", t]
        f["default"] = None
    return f


def _avro_fields(fields: list[tuple[str, FieldSpec]]) -> list[dict]:
    out = []
    for head, members in _group_by_head(fields).items():
        leaves = [s for p, s in members if p is None]
        children = [(p, s) for p, s in members if p is not None]
        rec_type = {
            "type": "record",
            "name": _sanitize(f"{head}_record", "record"),
            "fields": _avro_fields(children),
        }
        if leaves and children:
            # the reference builds the leaf field first, then REPLACES its type
            # with the record (keeping doc/default — generators.py:103-113)
            f = _avro_leaf(leaves[0])
            f["type"] = rec_type
            out.append(f)
        elif children:
            out.append(
                {
                    "name": _sanitize(head, "record"),
                    "type": rec_type,
                    "doc": f"Nested record for {head}",
                }
            )
        elif leaves:
            out.append(_avro_leaf(leaves[0]))
    return out


def generate_avro(
    fields: list[FieldSpec], name: str, namespace: str = "com.schema.infer", description: str | None = None
) -> str:
    schema = {
        "type": "record",
        "name": _sanitize(name, "record"),
        "namespace": namespace,
        "doc": description or f"Auto-generated Avro schema for {name}",
        "fields": _avro_fields([(s.name, s) for s in fields]),
    }
    return json.dumps(schema, indent=2)


# ---------------------------------------------------------------------------
# JSON Schema
# ---------------------------------------------------------------------------

_JSON_TYPES = {
    "string": "string",
    "int": "integer",
    "float": "number",
    "boolean": "boolean",
    "null": "null",
    "object": "object",
    "array": "array",
    "union": "string",
}


def _json_leaf(spec: FieldSpec) -> dict:
    elem = _elem_name(spec.type_name)
    base = _JSON_TYPES.get(spec.type_name, "string")
    if spec.array:
        items = _JSON_TYPES.get(elem, "string") if elem else base
        items = "string" if items in ("object", "array") else items
        prop: dict = {"type": "array", "items": {"type": items}}
    elif spec.nullable and base != "null":
        prop = {"type": [base, "null"]}
    else:
        prop = {"type": base}
    if spec.description:
        prop["description"] = spec.description
    if spec.default_value is not None:
        prop["default"] = spec.default_value
    if spec.examples:
        prop["examples"] = spec.examples
    return prop


def _json_properties(fields: list[tuple[str, FieldSpec]]) -> dict:
    properties: dict = {}
    required: list[str] = []
    for head, members in _group_by_head(fields).items():
        leaves = [s for p, s in members if p is None]
        children = [(p, s) for p, s in members if p is not None]
        if leaves:
            properties[head] = _json_leaf(leaves[0])
            if leaves[0].required:
                required.append(head)
        if children:
            # leaf property (if any) keeps its description/examples; the nested
            # structure is injected into it (generators.py:460-470)
            nested = _json_properties(children)
            prop = properties.setdefault(head, {"type": "object"})
            prop["properties"] = nested["properties"]
            prop["required"] = nested["required"]
    return {"properties": properties, "required": required}


def generate_json_schema(
    fields: list[FieldSpec], name: str, namespace: str = "com.schema.infer", description: str | None = None
) -> str:
    props = _json_properties([(s.name, s) for s in fields])
    schema = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "title": name,
        "description": description or f"Auto-generated JSON Schema for {name}",
        "type": "object",
        "properties": props["properties"],
        "required": props["required"],
        "$id": f"{namespace}/{name}",
    }
    return json.dumps(schema, indent=2)


# ---------------------------------------------------------------------------
# Protobuf
# ---------------------------------------------------------------------------

_PROTO_TYPES = {
    "string": "string",
    "int": "int32",
    "float": "double",
    "boolean": "bool",
    "null": "string",
    "object": "string",
    "array": "repeated",
    "union": "string",
}


def generate_protobuf(
    fields: list[FieldSpec], name: str, namespace: str = "com.schema.infer", description: str | None = None
) -> str:
    lines = ['syntax = "proto3";', ""]
    if namespace:
        lines += [f"package {namespace.replace('.', '_').lower()};", ""]
    lines.append(f"message {name} {{")
    if description:
        lines.append(f"  // {description}")

    top: dict[str, FieldSpec] = {}
    nested: dict[str, list[tuple[str, FieldSpec]]] = {}
    for s in fields:
        if "." in s.name:
            head, _, rest = s.name.partition(".")
            nested.setdefault(head, []).append((rest, s))
        else:
            top[s.name] = s

    def _ptype(spec: FieldSpec) -> str:
        elem = _elem_name(spec.type_name)
        if elem is not None:
            return f"repeated {_PROTO_TYPES.get(elem, 'string')}"
        base = _PROTO_TYPES.get(spec.type_name, "string")
        return base if (not spec.array or base == "repeated") else f"repeated {base}"

    n = 1
    for fname, spec in top.items():
        comment = f" // {spec.description}" if spec.description else ""
        lines.append(f"  {_ptype(spec)} {fname.lower().replace(' ', '_')} = {n};{comment}")
        n += 1
    for head, members in nested.items():
        if head in top:
            continue
        msg = _sanitize(f"{head}_message", "message")
        lines.append(f"  {msg} {head} = {n}; // Nested message for {head}")
        n += 1
        lines.append(f"  message {msg} {{")
        for rest, spec in members:
            if "." in rest:
                continue  # leaf fields only at this level (generators.py:326-330)
            comment = f" // {spec.description}" if spec.description else ""
            lines.append(f"    {_ptype(spec)} {rest.lower().replace(' ', '_')} = {n};{comment}")
            n += 1
        lines.append("  }")
    lines.append("}")
    return "\n".join(lines)


GENERATORS = {
    "avro": (generate_avro, "avsc"),
    "json-schema": (generate_json_schema, "json"),
    "protobuf": (generate_protobuf, "proto"),
}


def generate_schema(fields: list[FieldSpec], fmt: str, name: str, **kw) -> str:
    """Dispatch by format name (SchemaGeneratorFactory, generators.py:566-591)."""
    if fmt not in GENERATORS:
        raise ValueError(f"Unsupported schema format: {fmt}")
    fn, _ext = GENERATORS[fmt]
    return fn(fields, name, **kw)
