"""Golden parity with /root/reference/src/type.spec.ts — every expected
string below is asserted verbatim in the reference's jest suite."""

from __future__ import annotations

import pytest

from yaschva_spark.schema import SchemaError
from yaschva_spark.tstype import validation_to_ts as v


def test_simple_types():  # type.spec.ts:5-13
    assert v("?") == "undefined"
    assert v("null") == "null"
    assert v("any") == "any"
    assert v("boolean") == "boolean"
    assert v("number") == "number"
    assert v("integer") == "number"
    assert v("string") == "string"


def test_union_types():  # type.spec.ts:15-20
    assert v(["?", "boolean"]) == "undefined | boolean"
    assert v(["any", "number"]) == "any | number"
    assert v(["integer", "boolean", "string", "?"]) == "number | boolean | string | undefined"


def test_object_of_simple_types():  # type.spec.ts:22-38
    schema = {
        "string": "string", "number": "number", "any": "any",
        "optional": "?", "boolean": "boolean", "integer": "integer",
    }
    assert v(schema) == (
        "{ string: string; number: number; any: any;"
        " optional?: undefined; boolean: boolean; integer: number }"
    )
    assert v({"name": "object with name", "$type": {"str": "string", "num": "number"}}) \
        == "{ str: string; num: number }"


def test_arrays():  # type.spec.ts:39-48
    schema = {
        "stringOrNumber": {"$array": ["string", "number"]},
        "objArray": {"$array": {"hello": "string", "world": "number"}},
    }
    assert v(schema) == (
        "{ stringOrNumber: (string | number)[];"
        " objArray: { hello: string; world: number }[] }"
    )


def test_enum_and_enum_array():  # type.spec.ts:50-58
    assert v({"$enum": ["lorem", "ipsum", "santa", "domine"]}) \
        == '"lorem" | "ipsum" | "santa" | "domine"'
    assert v({"$array": {"$enum": ["lorem", "ipsum", "santa", "domine"]}}) \
        == '("lorem" | "ipsum" | "santa" | "domine")[]'


def test_all_optional_object_gets_undefined_union():  # type.spec.ts:60-67
    schema = {"prop1": ["?", "string"], "prop2": ["?", "number"]}
    assert v(schema) == "{ prop1?: undefined | string; prop2?: undefined | number } | undefined"


def test_constraints_erased():  # type.spec.ts:69-76
    assert v({"$string": {"minLength": 4, "maxLength": 16}}) == "string"
    assert v({"$number": {"min": 3, "max": 9}}) == "number"


def test_map():  # type.spec.ts:78-85
    assert v({"$map": "number"}) == "{ [key: string] : number}"
    assert v({"$map": ["number", "string"]}) == "{ [key: string] : number | string}"
    assert v({"$map": ["number", {"$array": ["string", "?"]}]}) \
        == "{ [key: string] : number | (string | undefined)[]}"


def test_custom_types():  # type.spec.ts:87-99
    schema = {
        "$types": {"$person": {"name": "string", "height": "number"}},
        "string": "string", "person": "$person", "number": "number",
    }
    assert v(schema) == (
        "{ string: string; person: { name: string; height: number }; number: number }"
    )


def test_throws_on_unknown():  # type.spec.ts:101-114
    with pytest.raises(SchemaError):
        v({"$stringss": {"minLength": 77}})
    with pytest.raises(SchemaError):
        v({"something": "magicRune"})


def test_escaped_dollar_key():  # type.spec.ts:115-118
    assert v({"myNumber": "number", "\\$escapedDollar": "string"}) \
        == "{ myNumber: number; $escapedDollar: string }"


def test_root_meta():  # type.spec.ts:120-123
    assert v({"$type": {"$array": "string"}}) == "string[]"


def test_and_with_custom_and_meta_types():  # type.spec.ts:136-149
    schema = {
        "$types": {
            "$myObject": {"value": "string"},
            "$otherObject": {"num": "number"},
            "$myMetaObject": {"$type": {"value2": "string"}},
        },
        "$and": [{"valueA": "string"}, "$myObject", "$myMetaObject", {"$type": "$otherObject"}],
    }
    assert v(schema) == "{ valueA: string; value: string; value2: string; num: number }"


def test_invalid_and_throws():  # type.spec.ts:151-154
    with pytest.raises(SchemaError):
        v({"$and": [{"valueA": "string"}, "myObject"]})
