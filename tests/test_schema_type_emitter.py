"""schema_to_spark_type: the analog of the reference's validationToType
emitter (/root/reference/src/type.ts, spec: type.spec.ts) with Spark-type
semantics. Ports of the reference's emitter cases, adapted: constraints are
erased, optionality -> nullability, custom types resolve, recursion (which
the reference emitter can't represent either, README.md:160-167) raises."""

from __future__ import annotations

import pytest

from yaschva_spark.schema import SchemaError
from yaschva_spark.typed import TypedCompileError, schema_to_spark_type


def _ddl(schema):
    return schema_to_spark_type(schema).simpleString()


def test_simple_types():
    # type.spec.ts simple mappings, Spark flavor
    assert _ddl({"a": "string"}) == "struct<a:string>"
    assert _ddl({"a": "number"}) == "struct<a:double>"
    assert _ddl({"a": "integer"}) == "struct<a:bigint>"
    assert _ddl({"a": "boolean"}) == "struct<a:boolean>"


def test_constraints_erased():
    # type.spec.ts:69-75 analog: size/regex/range constraints vanish
    assert _ddl({"a": {"$string": {"minLength": 4, "regex": "x"}}}) == "struct<a:string>"
    assert _ddl({"a": {"$number": {"min": 1, "max": 5}}}) == "struct<a:double>"


def test_optionality_is_nullability():
    st = schema_to_spark_type({"a": ["string", "?"], "b": "string"})
    by = {f.name: f.nullable for f in st.fields}
    assert by == {"a": True, "b": False}


def test_enum_array_map_object():
    assert _ddl({"a": {"$enum": ["x", "y"]}}) == "struct<a:string>"
    assert _ddl({"a": {"$array": "integer"}}) == "struct<a:array<bigint>>"
    assert _ddl({"a": {"$map": "number"}}) == "struct<a:map<string,double>>"
    assert (
        _ddl({"a": {"b": "string", "c": "number"}})
        == "struct<a:struct<b:string,c:double>>"
    )


def test_custom_types_resolve():
    schema = {
        "$types": {"$range": {"$number": {"min": 1}}},
        "a": "$range",
    }
    assert _ddl(schema) == "struct<a:double>"


def test_meta_unwraps_and_and_merges():
    assert _ddl({"a": {"$type": "string"}}) == "struct<a:string>"
    schema = {"$and": [{"a": "string"}, {"b": "number"}]}
    assert _ddl(schema) == "struct<a:string,b:double>"


def test_escaped_dollar_key():
    st = schema_to_spark_type({"\\$weird": "string"})
    assert st.fields[0].name == "$weird"


def test_multi_union_and_any_need_dynamic():
    with pytest.raises(TypedCompileError):
        schema_to_spark_type({"a": ["string", "number"]})
    with pytest.raises(TypedCompileError):
        schema_to_spark_type({"a": "any"})


def test_recursive_type_raises_like_reference():
    # the reference emitter can't emit recursive named types either
    # (README.md:160-167, skipped test type.spec.ts:123-131)
    schema = {"$types": {"$t": {"x": "$t"}}, "a": "$t"}
    with pytest.raises(TypedCompileError):
        schema_to_spark_type(schema)


def test_unknown_type_throws():
    with pytest.raises(SchemaError):
        schema_to_spark_type({"a": "bigFlout"})
