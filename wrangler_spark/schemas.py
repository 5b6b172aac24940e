"""Standalone schema registry.

The reference resolves ``parse-as-avro`` / ``parse-as-protobuf`` schemas
from a REST schema-registry service (``clients/SchemaRegistryClient.java``,
``directives/parser/ParseAvro.java:110``). A standalone Spark engine has no
such service, so the host registers schemas up front — same pattern as
``register_lookup`` for catalog tables. Entries are versioned; the newest
version wins when no version is requested (registry parity: ``getSchema``
without version returns latest).
"""

from __future__ import annotations

from wrangler_spark.errors import DirectiveApplyError

# (schema_id.lower()) -> {version: payload}; payload is schema text (Avro
# .avsc JSON) or bytes (protobuf FileDescriptorSet)
_SCHEMAS: dict[str, dict[int, object]] = {}


def register_schema(schema_id: str, schema, version: int = 1) -> None:
    """Host API: register a schema payload under an id + version.

    Avro: the writer-schema JSON text (or parsed dict).
    Protobuf: the serialized ``FileDescriptorSet`` bytes (``protoc
    --descriptor_set_out``) or a path to such a file.
    """
    _SCHEMAS.setdefault(schema_id.lower(), {})[int(version)] = schema


def get_schema(schema_id: str, version: int | None = None):
    versions = _SCHEMAS.get(schema_id.lower())
    if not versions:
        raise DirectiveApplyError(
            f"schema '{schema_id}' not registered; call "
            f"wrangler_spark.register_schema('{schema_id}', schema_text)"
        )
    if version is None:
        return versions[max(versions)]
    if int(version) not in versions:
        raise DirectiveApplyError(
            f"schema '{schema_id}' has no version {version}; "
            f"registered: {sorted(versions)}"
        )
    return versions[int(version)]
