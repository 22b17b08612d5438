"""TypeScript type-string emitter — byte-level parity with the reference.

``validation_to_ts`` is the semantic reimplementation of
``validationToType`` (/root/reference/src/type.ts:33-92): it renders a
yaschva schema as the same TypeScript type STRING the reference emits,
asserted against every golden in /root/reference/src/type.spec.ts
(tests/test_tstype.py). This completes SURVEY §2.1 T1 exactly; the
Spark-native analog (``typed.schema_struct_type``, emitting a StructType)
remains the form the engine itself consumes — this emitter exists for
parity and for exporting schemas to TypeScript consumers.

Erasures mirror the reference: string length/regex and number min/max
constraints vanish (type.spec.ts:70-76), ``integer`` widens to ``number``,
enums become string-literal unions, all-optional objects pick up
``| undefined`` (type.ts:68), and ``$and`` is merged through the same
object-combination used by validation (type.ts:84-91).
"""

from __future__ import annotations

from typing import Any

from yaschva_spark.schema import (
    SchemaError,
    combine_and,
    extract_types,
    is_and_node,
    is_array_node,
    is_enum_node,
    is_map_node,
    is_meta_node,
    is_number_node,
    is_obj,
    is_string_node,
    js_stringify,
    unescape_key,
)

# type.ts:14-31 — note integer -> number and '?' -> undefined
_SIMPLE_TS = {
    "string": "string",
    "number": "number",
    "integer": "number",
    "boolean": "boolean",
    "any": "any",
    "null": "null",
    "?": "undefined",
}


def _contains_optional(node: Any) -> bool:
    # type.ts:7-9
    return node == "?" or (isinstance(node, list) and any(y == "?" for y in node))


def validation_to_ts(schema: Any) -> str:
    """The reference's ``validationToType`` entry point (type.ts:33)."""
    return _to_type(schema, {})


def _to_type(node: Any, types_in: dict[str, Any]) -> str:
    custom = types_in
    t = node
    rest, extracted = extract_types(node)
    if extracted is not None:  # type.ts:37-41 — $types REPLACES the env
        custom = extracted
        t = rest

    def to(x: Any) -> str:
        return _to_type(x, custom)

    if isinstance(t, list):  # union, type.ts:45
        return " | ".join(to(x) for x in t)

    if isinstance(t, str):  # type.ts:47-53
        if t in custom:
            return to(custom[t])
        if t not in _SIMPLE_TS:
            raise SchemaError(f"Unhandled {t}")
        return _SIMPLE_TS[t]

    if is_array_node(t):  # type.ts:55-59
        inner = to(t["$array"])
        multi = isinstance(t["$array"], list) and len(t["$array"]) > 1
        return f"({inner})[]" if multi or "|" in inner else f"{inner}[]"

    if is_enum_node(t):  # type.ts:61
        return " | ".join(f'"{x}"' for x in t["$enum"])

    if is_obj(t):  # type.ts:63-72
        parts = []
        for key, value in t.items():
            opt = "?" if _contains_optional(value) else ""
            parts.append(f"{unescape_key(key)}{opt}: {to(value)}")
        body = "; ".join(parts)
        if all(_contains_optional(v) for v in t.values()):
            return f"{{ {body} }} | undefined"
        return f"{{ {body} }}"

    if is_string_node(t):  # type.ts:74 — constraints erased
        return to("string")

    if is_map_node(t):  # type.ts:76 — note the reference's spacing
        return f"{{ [key: string] : {to(t['$map'])}}}"

    if is_meta_node(t):  # type.ts:78
        return to(t["$type"])

    if is_number_node(t):  # type.ts:80
        return to("number")

    if is_and_node(t):  # type.ts:84-91
        return to(combine_and(t, custom))

    raise SchemaError(f"UNSUPPORTED {js_stringify(t)}")
