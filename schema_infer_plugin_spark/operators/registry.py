"""Local schema registry: versioned subjects + compatibility enforcement.

The reference delegates schema storage and compatibility to a Confluent Schema
Registry over HTTP (/root/reference/schema_infer/core/registry.py:53-133,
428-463) — subject naming strategies at :492-525, compatibility levels in
config.py:53-66. This engine has no HTTP dependency; the registry is a
versioned directory (object store in production) and — unlike the reference,
which trusts the remote server — the compatibility check itself is implemented
here, so schema evolution is validated as part of the pipeline:

* subjects: ``{subject}/v{N}.avsc`` + latest pointer; append-only versions;
* subject naming replicates TopicNameStrategy (``{table}-value``),
  RecordNameStrategy and TopicRecordNameStrategy **including the reference's
  fallback quirk**: without a record name both non-default strategies fall
  back to the bare topic name (registry.py:510-519);
* compatibility: NONE / BACKWARD / FORWARD / FULL (+ _TRANSITIVE variants
  checked against every prior version, not just latest), with Avro's numeric
  promotion (int → float readable) honored.

Rules (Avro resolution, restricted to this engine's flat field model):
* BACKWARD (new schema must read data written with old): deleting a field is
  fine; ADDING a field is only fine if it is nullable (has an implicit null
  default); changing a field's type is fine only if old is promotable to new
  (int → float).
* FORWARD (old schema must read data written with new): mirror image — adding
  is fine, deleting only if the deleted field was nullable, type change only
  if new is promotable to old.
* FULL: both.
"""

from __future__ import annotations

import base64
import json
import os
from dataclasses import dataclass
from typing import Protocol

from schema_infer_plugin_spark.operators.generators import FieldSpec

COMPAT_LEVELS = (
    "NONE",
    "BACKWARD",
    "FORWARD",
    "FULL",
    "BACKWARD_TRANSITIVE",
    "FORWARD_TRANSITIVE",
    "FULL_TRANSITIVE",
)

#: old-type -> set of new-types it can be read as (Avro promotion, flat model)
_PROMOTABLE = {"int": {"int", "float"}, "float": {"float"}}


def subject_name(table: str, strategy: str = "TopicNameStrategy", record_name: str | None = None) -> str:
    """Reference subject strategies incl. the no-record-name fallbacks
    (registry.py:492-525)."""
    if strategy == "TopicNameStrategy":
        return f"{table}-value"
    if strategy == "RecordNameStrategy":
        return record_name if record_name else table
    if strategy == "TopicRecordNameStrategy":
        return f"{table}-{record_name}" if record_name else table
    return f"{table}-value"


@dataclass
class EvolutionIssue:
    kind: str  # field_added_required | field_removed_required | type_changed
    field: str
    detail: str


def _readable(old_type: str, new_type: str) -> bool:
    # arrays resolve element-wise (Avro: array items follow scalar promotion);
    # array<T> vs a non-array (or vice versa) is never readable
    if old_type.startswith("array<") and new_type.startswith("array<"):
        return _readable(old_type[6:-1], new_type[6:-1])
    if old_type.startswith("array") or new_type.startswith("array"):
        return old_type == new_type
    return new_type in _PROMOTABLE.get(old_type, {old_type})


def evolution_issues(
    old: list[FieldSpec], new: list[FieldSpec], mode: str = "BACKWARD"
) -> list[EvolutionIssue]:
    """Issues preventing ``new`` from being ``mode``-compatible with ``old``."""
    if mode == "NONE":
        return []
    if mode == "FULL":
        return evolution_issues(old, new, "BACKWARD") + evolution_issues(old, new, "FORWARD")
    o = {f.name: f for f in old}
    n = {f.name: f for f in new}
    issues: list[EvolutionIssue] = []
    if mode == "BACKWARD":
        for name in n.keys() - o.keys():
            if n[name].required and not n[name].nullable:
                issues.append(
                    EvolutionIssue(
                        "field_added_required", name,
                        "new required field has no default for data written with the old schema",
                    )
                )
        for name in n.keys() & o.keys():
            if not _readable(o[name].type_name, n[name].type_name):
                issues.append(
                    EvolutionIssue(
                        "type_changed", name,
                        f"{o[name].type_name} -> {n[name].type_name} is not readable",
                    )
                )
    elif mode == "FORWARD":
        for name in o.keys() - n.keys():
            if o[name].required and not o[name].nullable:
                issues.append(
                    EvolutionIssue(
                        "field_removed_required", name,
                        "old schema requires this field but new writers omit it",
                    )
                )
        for name in n.keys() & o.keys():
            if not _readable(n[name].type_name, o[name].type_name):
                issues.append(
                    EvolutionIssue(
                        "type_changed", name,
                        f"{n[name].type_name} -> {o[name].type_name} is not readable",
                    )
                )
    else:
        raise ValueError(f"unknown compatibility mode: {mode}")
    return issues


def fields_from_avro(schema_text: str) -> list[FieldSpec]:
    """Parse a (flat) Avro record schema back into FieldSpecs — the inverse of
    generate_avro for the field shapes this engine emits (union-with-null =
    nullable; logical names map back to the ladder names)."""
    rev = {"string": "string", "long": "int", "int": "int", "double": "float",
           "float": "float", "boolean": "boolean", "null": "null",
           "object": "object"}
    doc = json.loads(schema_text)
    out = []
    for f in doc.get("fields", []):
        t = f["type"]
        nullable = False
        if isinstance(t, list):  # union
            nullable = "null" in t
            non_null = [x for x in t if x != "null"]
            t = non_null[0] if non_null else "null"
        is_array = False
        if isinstance(t, dict):
            kind = t.get("type", "string")
            if kind == "array":
                # preserve array-ness: collapsing {"type":"array","items":T}
                # to 'string' would let array<T> -> string (or an item-type
                # change) slip past compatibility enforcement
                items = t.get("items", "string")
                if isinstance(items, dict):
                    items = items.get("type", "string")
                out.append(
                    FieldSpec(
                        name=f["name"],
                        type_name=f"array<{rev.get(items, 'string')}>",
                        nullable=nullable,
                        array=True,
                        required=not nullable,
                    )
                )
                continue
            t = "object" if kind == "record" else kind
        # generate_avro renders not-required fields as ["null", T] with a null
        # default (reference generators.py:103-113) — mirror on the way back
        out.append(
            FieldSpec(
                name=f["name"],
                type_name=rev.get(t, "string"),
                nullable=nullable,
                required=not nullable,
            )
        )
    return out


class CompatibilityError(Exception):
    def __init__(self, subject: str, issues: list[EvolutionIssue]):
        self.issues = issues
        super().__init__(
            f"schema for '{subject}' is incompatible: "
            + "; ".join(f"{i.kind}({i.field}): {i.detail}" for i in issues)
        )


class RegistryClient(Protocol):
    """What a schema registry backend must provide. The local directory
    registry and the HTTP client are interchangeable through this seam —
    subject strategies and compatibility enforcement are written against it,
    never against a concrete backend (VERDICT r1 #9)."""

    def list_subjects(self) -> list[str]: ...

    def get_subject_versions(self, subject: str) -> list[int]: ...

    def get_schema(self, subject: str, version: int) -> str: ...

    def get_latest_schema(self, subject: str) -> tuple[int, str] | None: ...

    def register(self, subject: str, schema_text: str, compatibility: str = "NONE") -> int: ...


class _CompatEnforcingRegistry:
    """Shared client-side compatibility enforcement. Unlike the reference —
    which trusts the remote server's compat check (core/registry.py:428-463) —
    this engine validates evolution itself, identically for every backend, so
    the rules are testable offline and cannot drift between backends.

    Subclasses implement storage: ``get_subject_versions``, ``get_schema``,
    ``_store`` (persist text, return new version number)."""

    def _store(self, subject: str, schema_text: str, next_version: int) -> int:
        raise NotImplementedError

    def get_subject_versions(self, subject: str) -> list[int]:
        raise NotImplementedError

    def get_schema(self, subject: str, version: int) -> str:
        raise NotImplementedError

    def get_latest_schema(self, subject: str) -> tuple[int, str] | None:
        versions = self.get_subject_versions(subject)
        if not versions:
            return None
        return versions[-1], self.get_schema(subject, versions[-1])

    def register(
        self, subject: str, schema_text: str, compatibility: str = "NONE"
    ) -> int:
        """Append a new version after enforcing ``compatibility`` against the
        latest (or, for _TRANSITIVE levels, every) prior version."""
        if compatibility not in COMPAT_LEVELS:
            raise ValueError(f"invalid compatibility level: {compatibility}")
        versions = self.get_subject_versions(subject)
        if versions and compatibility != "NONE":
            mode = compatibility.replace("_TRANSITIVE", "")
            against = versions if compatibility.endswith("_TRANSITIVE") else versions[-1:]
            new_fields = fields_from_avro(schema_text)
            for v in against:
                old_fields = fields_from_avro(self.get_schema(subject, v))
                issues = evolution_issues(old_fields, new_fields, mode)
                if issues:
                    raise CompatibilityError(subject, issues)
        next_v = (versions[-1] + 1) if versions else 1
        return self._store(subject, schema_text, next_v)


class LocalSchemaRegistry(_CompatEnforcingRegistry):
    """Directory-backed registry: append-only ``{subject}/v{N}.avsc`` files
    (object store in production)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _subject_dir(self, subject: str) -> str:
        return os.path.join(self.root, subject)

    def list_subjects(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root) if os.path.isdir(self._subject_dir(d))
        )

    def get_subject_versions(self, subject: str) -> list[int]:
        d = self._subject_dir(subject)
        if not os.path.isdir(d):
            return []
        return sorted(
            int(fn[1:].split(".")[0]) for fn in os.listdir(d) if fn.startswith("v")
        )

    def get_schema(self, subject: str, version: int) -> str:
        with open(os.path.join(self._subject_dir(subject), f"v{version}.avsc")) as f:
            return f.read()

    def _store(self, subject: str, schema_text: str, next_version: int) -> int:
        os.makedirs(self._subject_dir(subject), exist_ok=True)
        with open(
            os.path.join(self._subject_dir(subject), f"v{next_version}.avsc"), "w"
        ) as f:
            f.write(schema_text)
        return next_version


#: URL substrings marking a managed-cloud registry (the registry-relevant
#: subset of the reference's detect_environment indicator list,
#: plugin/auth.py:36-53) — cloud endpoints authenticate with API key/secret,
#: everything else ("platform") with username/password.
CLOUD_URL_INDICATORS = ("schema-infer.cloud", "psrc-", "lsrc-")


def registry_auth_headers(
    url: str,
    username: str | None = None,
    password: str | None = None,
    api_key: str | None = None,
    api_secret: str | None = None,
    bearer_token: str | None = None,
) -> dict[str, str]:
    """HTTP auth headers for a registry endpoint, reference semantics
    (plugin/auth.py:149-199): a cloud-looking URL uses ``api_key``/
    ``api_secret`` as the basic pair (_configure_cloud_sr_auth), any other
    URL uses ``username``/``password`` (_configure_platform_sr_auth);
    a half-set pair yields NO auth header rather than an error, exactly as
    the reference warns-and-proceeds. ``bearer_token`` (engine-added) takes
    the whole Authorization header; config validation already rejects it
    alongside a complete basic pair."""
    if bearer_token:
        return {"Authorization": f"Bearer {bearer_token}"}
    lower = (url or "").lower()
    if any(ind in lower for ind in CLOUD_URL_INDICATORS):
        user, secret = api_key, api_secret
    else:
        user, secret = username, password
    if user and secret:
        cred = base64.b64encode(f"{user}:{secret}".encode()).decode()
        return {"Authorization": f"Basic {cred}"}
    return {}


def http_registry_from_config(registry_cfg, transport) -> "HttpSchemaRegistry":
    """Wire a config section (config.RegistryConfig) into an authenticated
    client: headers derive from the section's credential fields and ride
    every call of the injected transport."""
    return HttpSchemaRegistry(
        registry_cfg.url,
        transport=transport,
        headers=registry_auth_headers(
            registry_cfg.url,
            username=registry_cfg.username,
            password=registry_cfg.password,
            api_key=registry_cfg.api_key,
            api_secret=registry_cfg.api_secret,
            bearer_token=registry_cfg.bearer_token,
        ),
    )


class HttpSchemaRegistry(_CompatEnforcingRegistry):
    """Remote registry speaking the Confluent REST surface the reference
    targets (core/registry.py:53-133: GET /subjects, GET+POST
    /subjects/{s}/versions, GET /subjects/{s}/versions/{n}).

    ``transport(method, path, body, headers) -> parsed-JSON`` is injectable:
    production wires an HTTP client (SSL attaches there, reference
    config.py:40-55); tests wire an in-memory fake — this sandbox has no
    network, so no urllib default is provided and constructing without a
    transport raises. ``headers`` (from :func:`registry_auth_headers`) are
    passed verbatim on EVERY call; the transport attaches them to the
    request (basic/bearer auth, reference plugin/auth.py:149-199).

    Transport error contract: an HTTP 404 on a subject path MUST surface as
    ``KeyError`` (a urllib-based transport catches HTTPError(code=404) and
    re-raises KeyError) — that is how "subject has no versions yet" is
    distinguished from transport failure, which should propagate as-is."""

    def __init__(self, url: str, transport=None, headers: dict[str, str] | None = None):
        self.url = url.rstrip("/")
        if transport is None:
            raise NotImplementedError(
                "no network in this environment: inject a transport(method, path, body, headers)"
            )
        self._t = transport
        self.headers = dict(headers or {})

    def list_subjects(self) -> list[str]:
        return sorted(self._t("GET", "/subjects", None, self.headers))

    def get_subject_versions(self, subject: str) -> list[int]:
        try:
            return sorted(
                self._t("GET", f"/subjects/{subject}/versions", None, self.headers)
            )
        except KeyError:
            return []

    def get_schema(self, subject: str, version: int) -> str:
        return self._t(
            "GET", f"/subjects/{subject}/versions/{version}", None, self.headers
        )["schema"]

    def _store(self, subject: str, schema_text: str, next_version: int) -> int:
        out = self._t(
            "POST",
            f"/subjects/{subject}/versions",
            {"schema": schema_text},
            self.headers,
        )
        return int(out["version"])
