"""Generator round-trip property tests — ports of the reference's
generate.spec.ts (cited per test). Core invariant: everything the generator
produces validates as pass against its schema."""

from __future__ import annotations

import json

import pytest

from yaschva_spark.generate import GenerateError, generate
from yaschva_spark.interp import UNDEFINED, output_to_jsonable, validate

SEEDS = range(32)


def _roundtrip(schema, seed, **opts):
    value = generate(schema, seed=seed, **opts)
    result = validate(schema, value)
    assert result["result"] == "pass", (seed, value, result)
    return value


def test_simple_types_roundtrip():
    # generate.spec.ts:22-48
    schema = {
        "string": "string",
        "number": "number",
        "any": "any",
        "null": "null",
        "optional": "?",
        "boolean": "boolean",
        "integer": "integer",
    }
    any_defined = 0
    for seed in range(64):
        value = _roundtrip(schema, seed)
        assert isinstance(value["string"], str)
        assert isinstance(value["number"], (int, float)) and not isinstance(value["number"], bool)
        assert isinstance(value["boolean"], bool)
        assert value["null"] is None
        assert "optional" not in value  # undefined fields are omitted
        if "any" in value:
            any_defined += 1
    assert any_defined > 0


def test_union_roundtrip():
    # generate.spec.ts:50-60
    schema = {"stringOrNumber": ["string", "number"], "optionalString": ["?", "string"]}
    for seed in SEEDS:
        value = _roundtrip(schema, seed)
        assert isinstance(value["stringOrNumber"], (str, int, float))


def test_array_roundtrip():
    # generate.spec.ts:62-80
    schema = {
        "stringOrNumber": {"$array": ["string", "number"]},
        "objArray": {"$array": {"hello": "string", "world": "number"}},
    }
    value = _roundtrip(schema, 7, array_max=8)
    assert isinstance(value["stringOrNumber"], list)
    for item in value["objArray"]:
        assert isinstance(item["hello"], str)


def test_enum_roundtrip():
    # generate.spec.ts:82-90
    enums = ["lolly", "pop", "chewingGum", "doughnut"]
    for seed in SEEDS:
        value = _roundtrip({"enum": {"$enum": enums}}, seed)
        assert value["enum"] in enums


def test_meta_and_map_roundtrip():
    # generate.spec.ts:92-118
    value = _roundtrip({"meta": {"name": "object with name", "$type": {"here": "string"}}}, 3)
    assert isinstance(value["meta"]["here"], str)
    value = _roundtrip({"map": {"$map": "number"}}, 5)
    assert 1 <= len(value["map"]) <= 33


def test_map_key_regex_roundtrip():
    # generate.spec.ts:120-125
    schema = {"$map": ["number"], "regex": "^ab[a-z]"}
    for seed in SEEDS:
        value = generate(schema, seed=seed, map_min=5)
        assert len(value) >= 1
        assert validate(schema, value)["result"] == "pass"


def test_bound_number():
    # generate.spec.ts:127-138
    for seed in SEEDS:
        value = generate({"$number": {"min": 33, "max": 45}}, seed=seed)
        assert 33 <= value <= 45
    assert isinstance(generate({"$number": {}}, seed=1), float)


def test_extended_string():
    # generate.spec.ts:140-155
    assert isinstance(generate({"$type": "string"}, seed=2), str)
    assert len(generate({"$string": {"minLength": 77}}, seed=3)) >= 77
    assert len(generate({"$string": {"maxLength": 33}}, seed=4)) <= 33
    assert len(generate({"$string": {}}, seed=5)) == 6


def test_throws_on_unknown():
    # generate.spec.ts:157-171
    with pytest.raises(GenerateError):
        generate({"$stringss": {"minLength": 77}}, seed=1)
    with pytest.raises(GenerateError):
        generate({"something": "magicRune"}, seed=1)


def test_kitchen_sink_roundtrip():
    # generate.spec.ts:173-183 analog over our kitchen-sink schema
    from tests.cases_validate import KITCHEN_SINK_SCHEMA

    for seed in SEEDS:
        _roundtrip(KITCHEN_SINK_SCHEMA, seed, array_max=6, map_max=4)


def test_regex_string_generation():
    # generate.spec.ts:185-197
    for seed in SEEDS:
        value = generate({"$string": {"regex": "\\b(\\w*work\\w*)\\b"}}, seed=seed)
        assert "work" in value
    uuid_rx = "[a-f0-9]{8}-[a-f0-9]{4}-4[a-f0-9]{3}-[89aAbB][a-f0-9]{3}-[a-f0-9]{12}"
    for seed in range(64):
        value = generate({"id": {"$string": {"regex": uuid_rx}}}, seed=seed)
        assert isinstance(value["id"], str)
        assert validate({"id": {"$string": {"regex": uuid_rx}}}, value)["result"] == "pass"


def test_optional_omission_happens():
    # generate.spec.ts:199-211
    omitted = 0
    for seed in range(240):
        value = generate({"value": ["string", "?"]}, seed=seed)
        if "value" in value:
            assert isinstance(value["value"], str)
        else:
            omitted += 1
    assert omitted > 0


def test_escaped_dollar_key():
    # generate.spec.ts:213-217
    value = generate({"myNumber": "number", "\\$escapedDollar": "string"}, seed=9)
    assert "myNumber" in value and "$escapedDollar" in value


def test_array_of_undefined_gives_empty():
    # generate.spec.ts:219-225
    schema = {"$array": "?"}
    value = generate(schema, seed=11)
    assert validate(schema, value)["result"] == "pass"
    rehydrated = json.loads(json.dumps(output_to_jsonable(value)))
    assert validate(schema, rehydrated)["result"] == "pass"


def test_prefer_modes():
    # generate.spec.ts:227-255
    schema = {"root": "string", "aNumber": ["number"], "mayBeUndefined": ["string", "?"]}
    value = generate(schema, seed=13, prefer="undefined")
    assert isinstance(value["root"], str)
    assert "mayBeUndefined" not in value
    value = generate(schema, seed=13, prefer="defined")
    assert isinstance(value["mayBeUndefined"], str)


def test_recursive_depth_limiting():
    # generate.spec.ts:257-276
    schema = {
        "$types": {"$tree": {"value": "string", "left": ["?", "$tree"], "right": ["?", "$tree"]}},
        "root": "$tree",
    }
    layers3 = generate(schema, seed=17, prefer="defined", max_depth_soft=3)
    assert "left" in layers3["root"]["left"]
    assert "left" not in layers3["root"]["left"]["left"]
    layers4 = generate(schema, seed=17, prefer="defined", max_depth_soft=4)
    assert "left" in layers4["root"]["left"]["left"]
    assert "left" not in layers4["root"]["left"]["left"]["left"]
    assert validate(schema, layers3)["result"] == "pass"


def test_nested_array_and_map_depth_limits():
    # generate.spec.ts:278-304
    schema = {
        "$types": {"$tree": {"value": "string", "nodes": {"$array": "$tree"}}},
        "$type": "$tree",
    }
    value = generate(schema, seed=19, array_min=1, array_max=3, max_depth_soft=3)
    assert len(value["nodes"]) > 0
    assert validate(schema, value)["result"] == "pass"

    schema_map = {
        "$types": {"$tree": {"value": "string", "nodes": {"$map": "$tree"}}},
        "$type": "$tree",
    }
    value = generate(schema_map, seed=21, map_min=1, map_max=3, max_depth_soft=3)
    assert len(value["nodes"]) > 0
    assert validate(schema_map, value)["result"] == "pass"


def test_circular_type_throws():
    # generate.spec.ts:306-312
    schema = {
        "$types": {"$tree": {"value": "string", "left": "$tree", "right": "$tree"}},
        "root": "$tree",
    }
    with pytest.raises(GenerateError):
        generate(schema, seed=23)


def test_and_generation():
    # generate.spec.ts:314-335
    schema = {
        "$types": {
            "$myObject": {"value": "string"},
            "$otherObject": {"num": "number"},
            "$myMetaObject": {"$type": {"value2": "string"}},
        },
        "$and": [{"valueA": "string"}, "$myObject", "$myMetaObject", {"$type": "$otherObject"}],
    }
    value = _roundtrip(schema, 27)
    assert isinstance(value["value"], str)
    assert isinstance(value["num"], (int, float))
    with pytest.raises(GenerateError):
        generate({"$and": [{"valueA": "string"}, "myObject"]}, seed=29)


def test_size_bounds_roundtrip():
    # generate.spec.ts:337-351
    for seed in SEEDS:
        _roundtrip({"$array": "string", "minLength": 2, "maxLength": 6}, seed)
        _roundtrip({"$map": "string", "minLength": 2, "maxLength": 6}, seed)


def test_mutation_fails_with_right_rule():
    """Targeted corruption must fail with the matching rule id."""
    from yaschva_spark.interp import violations_from_output

    schema = {"a": "integer", "b": {"$string": {"minLength": 4}}}
    value = generate(schema, seed=31)
    value["a"] = 1.5
    value["b"] = "ab"
    result = validate(schema, value)
    assert result["result"] == "fail"
    rules = {r["rule"] for r in violations_from_output(result["output"])}
    assert rules == {"not_integer", "str_too_short"}


def test_generate_table_roundtrip_and_determinism(spark):
    from yaschva_spark.engine import PASS_COL, validate_json_table
    from yaschva_spark.generate import generate_table

    schema = {
        "name": {"$string": {"minLength": 1, "maxLength": 12}},
        "age": {"$number": {"min": 0, "max": 120}},
        "tags": {"$array": {"$enum": ["a", "b", "c"]}},
        "nick": ["?", "string"],
    }
    tbl = generate_table(spark, schema, 300, seed=9)
    # generate -> validate roundtrip holds for every row (dynamic path)
    validated = validate_json_table(tbl, schema, "doc", keep_cols=["id"])
    assert validated.filter(f"NOT {PASS_COL}").count() == 0
    # deterministic and partitioning-independent
    a = sorted(map(tuple, tbl.collect()))
    b = sorted(map(tuple, generate_table(spark, schema, 300, seed=9, partitions=7).collect()))
    assert a == b
    # rows equal the single-value generator at the derived seed
    from yaschva_spark.generate import generate
    import json

    sample = {r[0]: r[1] for r in a}
    assert json.loads(sample[5]) == generate(schema, seed=9 + 5)


def test_regex_sample_named_group_roundtrip():
    import random
    import re

    from yaschva_spark.genregex import regex_sample
    from yaschva_spark.regexdialect import to_python_pattern

    pattern = r"^(?<year>\d{4})-(?<m>[0-1]\d)$"
    rx = re.compile(to_python_pattern(pattern))
    for seed in range(20):
        s = regex_sample(pattern, random.Random(seed))
        assert rx.search(s), (seed, s)
