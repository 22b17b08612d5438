"""The schema language: guards, $types env, $and merge, load_json.

Schemas are plain JSON-like Python values (str | list | dict), exactly the
shape of the reference's schema documents. Node classification is structural
tag sniffing with the same rules as the reference's guards
(/root/reference/src/validationTypes.ts:32-42): a plain object schema is an
object with **no** ``$``-prefixed keys; data keys that start with ``$`` must
be escaped ``\\$`` in the schema (README.md:115-119).

Schema errors **raise** :class:`SchemaError` (the reference throws:
validate.ts:93,203,211,256), with the same messages, while data errors only
fail validation.
"""

from __future__ import annotations

import json
from typing import Any

from yaschva_spark.errors import AND_SCHEMA_ERR  # noqa: F401  (re-export convenience)

SIMPLE_TYPES = ("string", "boolean", "number", "integer", "null", "?", "any")


class SchemaError(Exception):
    """Raised for malformed schemas — the analog of the reference's throws."""


def js_stringify(value: Any) -> str:
    """JSON.stringify-compatible rendering (compact separators, like JS)."""
    return json.dumps(value, separators=(",", ":"), ensure_ascii=False)


def js_falsy(value: Any) -> bool:
    """JS truthiness for schema-node guard checks.

    JS falsy = undefined/null/''/0/false/NaN. Note ``{}`` and ``[]`` are
    *truthy* in JS (unlike Python) — the guards in validationTypes.ts rely on
    this, e.g. ``isArray = tbd.$array`` is true for any non-falsy ``$array``.
    """
    if value is None or value is False:
        return True
    if isinstance(value, str) and value == "":
        return True
    if isinstance(value, bool):
        return False
    if isinstance(value, (int, float)):
        return value == 0 or value != value  # 0, -0, NaN
    return False  # objects/arrays/strings are truthy


def _tag(node: Any, key: str) -> bool:
    return isinstance(node, dict) and not js_falsy(node.get(key))


# --- guards (validationTypes.ts:32-42) --------------------------------------
def is_simple(node: Any) -> bool:
    return isinstance(node, str)


def is_union(node: Any) -> bool:
    return isinstance(node, list)


def is_array_node(node: Any) -> bool:
    return _tag(node, "$array")


def is_map_node(node: Any) -> bool:
    return _tag(node, "$map")


def is_string_node(node: Any) -> bool:
    return _tag(node, "$string")


def is_number_node(node: Any) -> bool:
    return _tag(node, "$number")


def is_meta_node(node: Any) -> bool:
    return _tag(node, "$type")


def is_enum_node(node: Any) -> bool:
    return _tag(node, "$enum")


def is_obj(node: Any) -> bool:
    """Plain object schema: a dict with no ``$``-prefixed keys
    (validationTypes.ts:39-40). Escaped ``\\$`` keys are data keys."""
    return isinstance(node, dict) and not any(k.startswith("$") for k in node)


def is_typedef(node: Any) -> bool:
    return _tag(node, "$types")


def is_and_node(node: Any) -> bool:
    return _tag(node, "$and")


# --- schema loading / env handling ------------------------------------------
def load_json(doc: str | dict) -> Any:
    """Parse a schema document; drop the ``$schema`` marker key
    (validate.ts:263-268)."""
    out = json.loads(doc) if isinstance(doc, str) else dict(doc)
    if isinstance(out, dict):
        out.pop("$schema", None)
    return out


def extract_types(node: Any) -> tuple[Any, dict[str, Any] | None]:
    """Split root-level ``$types`` off a node (validate.ts:215-219).

    Returns ``(node_without_types, custom_types_or_None)``. The reference
    *replaces* the env rather than merging (validate.ts:216).
    """
    if is_typedef(node):
        custom = node["$types"]
        rest = {k: v for k, v in node.items() if k != "$types"}
        return rest, custom
    return node, None


def resolve_meta(node: Any, custom_types: dict[str, Any]) -> Any:
    """Resolve custom-type names and ``$type`` wrappers to the underlying
    schema node (validate.ts:32-36)."""
    if isinstance(node, str):
        return resolve_meta(custom_types.get(node), custom_types)
    if node is not None and is_meta_node(node):
        return resolve_meta(node["$type"], custom_types)
    return node


def combine_and(node: dict, custom_types: dict[str, Any]) -> dict:
    """Merge the members of an ``$and`` into one closed object schema
    (combineValidationObjects, validate.ts:30-48). Later keys overwrite
    earlier ones. Raises :class:`SchemaError` if any member does not resolve
    to a plain object — callers that need the reference's *data-fail*
    behavior catch this.
    """
    resolved = [resolve_meta(m, custom_types) for m in node["$and"]]
    if any(r is None or not is_obj(r) for r in resolved):
        raise SchemaError(AND_SCHEMA_ERR)
    merged: dict[str, Any] = {}
    for r in resolved:
        merged.update(r)
    return merged


def unescape_key(schema_key: str) -> str:
    """``\\$name`` in a schema denotes the data key ``$name``
    (validate.ts:150)."""
    return schema_key[1:] if schema_key.startswith("\\$") else schema_key


def escape_key(data_key: str) -> str:
    """Data key -> schema key (validate.ts:138)."""
    return "\\" + data_key if data_key.startswith("$") else data_key


def node_kind(node: Any) -> str:
    """Classify a node in the reference's dispatch order
    (validate.ts:223-256). Raises on unknown nodes with the reference's
    exact message."""
    if node is None:
        raise SchemaError("Type for validation cannot be undefined")
    if is_simple(node):
        return "simple"
    if is_union(node):
        return "union"
    if is_array_node(node):
        return "array"
    if is_enum_node(node):
        return "enum"
    if is_obj(node):
        return "object"
    if is_map_node(node):
        return "map"
    if is_number_node(node):
        return "number"
    if is_meta_node(node):
        return "meta"
    if is_string_node(node):
        return "string"
    if is_and_node(node):
        return "and"
    raise SchemaError(f"Unknown validator:{js_stringify(node)}")


def check_schema(node: Any, custom_types: dict[str, Any] | None = None,
                 _seen: frozenset | None = None) -> None:
    """Compile-time schema walk: raise for every case the reference throws on
    at validation time (unknown simple type validate.ts:203, unknown $-node
    validate.ts:256, empty union validate.ts:93, undefined schema
    validate.ts:211). Recursive custom types are allowed (cycles are cut)."""
    node, extracted = extract_types(node)
    env = extracted if extracted is not None else (custom_types or {})
    seen = _seen or frozenset()

    kind = node_kind(node)
    if kind == "simple":
        if node in env:
            if node in seen:
                return
            check_schema(env[node], env, seen | {node})
        elif node not in SIMPLE_TYPES:
            raise SchemaError(f"Unknown validator:{js_stringify(node)}")
    elif kind == "union":
        if not node:
            raise SchemaError("Array of types can not be empty")
        for branch in node:
            check_schema(branch, env, seen)
    elif kind == "array":
        check_schema(node["$array"], env, seen)
    elif kind == "enum":
        pass
    elif kind == "object":
        for v in node.values():
            check_schema(v, env, seen)
    elif kind == "map":
        check_schema(node["$map"], env, seen)
    elif kind == "meta":
        check_schema(node["$type"], env, seen)
    elif kind == "and":
        # $and members that don't resolve to objects are a *data* failure in
        # the reference (validate.ts:246-253), not a throw — don't raise here.
        try:
            merged = combine_and(node, env)
        except SchemaError:
            return
        check_schema(merged, env, seen)
    # "number" / "string": constraint dicts, nothing nested to check
