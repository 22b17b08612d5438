"""The reference spec corpus, ported to table form (FIXTURES.md §1).

Every case is one jest assertion scenario from the reference's own suite
(/root/reference/src/validate.spec.ts — cited per case). Golden expectations
are transcribed from the spec source, not re-executed. ``U`` marks JS
``undefined`` (distinct from null).

Each case: ``(case_id, schema, data, expect)`` where expect is
``"pass" | "fail"`` or ``("throw", message_or_None)``; golden cases add a
5th element: the exact expected output tree.
"""

from __future__ import annotations

from yaschva_spark.interp import UNDEFINED as U

_4FIELD = {"num": "number", "int": "integer", "str": "string", "bool": "boolean"}

_DESCRIBE_TYPE = {
    "num": "number",
    "int": "integer",
    "str": "string",
    "bool": "boolean",
    "obj": {"member": "boolean", "memberId": ["string", "?"]},
}

_TREE_SCHEMA = {
    "$types": {"$tree": {"value": "string", "left": ["?", "$tree"], "right": ["?", "$tree"]}},
    "root": "$tree",
}

# A kitchen-sink schema exercising every node kind in one document (modeled
# on the feature coverage of the reference's examples/example1.json, with
# original field names).
KITCHEN_SINK_SCHEMA = {
    "$types": {
        "$contact": {
            "fullName": "string",
            "street": "string",
            "city": "string",
            "country": "string",
        }
    },
    "contact": "$contact",
    "title": "string",
    "subtitle": ["?", "string"],
    "metrics": {
        "plainScore": "number",
        "boundedScore": {"$number": {"min": 0, "max": 18}},
    },
    "samples": {"$array": "number"},
    "grade": {"$enum": ["gold", "silver"]},
    "attrs": {"$map": "string"},
    "tag": ["string", "number"],
    "rating": {"$number": {"min": 4, "max": 9}},
    "tombstone": "null",
    "slogan": {"$string": {"regex": "\\b(\\w*work\\w*)\\b"}},
}

KITCHEN_SINK_GOOD = {
    "title": "35p5Rx",
    "subtitle": "opts",
    "metrics": {"plainScore": -1064355751952420, "boundedScore": 7.547970286391079},
    "samples": [6021837145779515, -3586724423310628, 7654360694223995, -4591855572376372],
    "grade": "silver",
    "rating": 5,
    "attrs": {"h5mRyKCL": "fq3aXU", "wff99z2e": "4D0Ptj", "h3VcecUx": "vmKmRU"},
    "tag": -8508087912141643,
    "tombstone": None,
    "slogan": "work",
    "contact": {
        "fullName": "Homer Simpson",
        "street": "742 Evergreen Terrace",
        "city": "Springfield",
        "country": "USA",
    },
}

# validate.spec.ts:36-58 — validating {} against the full schema: every
# mandatory field fails with its own type error against undefined.
KITCHEN_SINK_EMPTY_GOLDEN = {
    "contact": {"error": "Value is not an Object", "value": U},
    "title": {"error": "Value is not a string", "value": U},
    "subtitle": None,
    "metrics": {"error": "Value is not an Object", "value": U},
    "samples": {"error": "Value is not an Array", "value": U},
    "grade": {"error": "Value is not a string", "value": U},
    "attrs": {"error": "Value is not an Object", "value": U},
    "tag": {
        "error": "Did not match any from the listed types",
        "value": U,
        "output": [
            {"error": "Value is not a string", "value": U},
            {"error": "Value is not a number", "value": U},
        ],
    },
    "rating": {"error": "Value is not a number", "value": U},
    "tombstone": {"error": "Value is not null", "value": U},
    "slogan": {"error": "Value is not a string", "value": U},
}

CASES: list[tuple] = [
    # --- kitchen-sink end-to-end (validate.spec.ts:8-59) --------------------
    ("example/pass", KITCHEN_SINK_SCHEMA, KITCHEN_SINK_GOOD, "pass"),
    ("example/empty-golden", KITCHEN_SINK_SCHEMA, {}, "fail", KITCHEN_SINK_EMPTY_GOLDEN),
    # --- simple types pass (validate.spec.ts:61-70) --------------------------
    ("simple/string-pass", "string", "hello", "pass"),
    ("simple/integer-pass", "integer", 123, "pass"),
    ("simple/number-pass", "number", 123.3, "pass"),
    ("simple/boolean-pass", "boolean", True, "pass"),
    ("simple/undefined-pass", "?", U, "pass"),
    ("simple/null-pass", "null", None, "pass"),
    ("simple/any-pass", "any", 233, "pass"),
    ("simple/meta-pass", {"$type": "string"}, "desert", "pass"),
    # --- simple types fail (validate.spec.ts:72-86) ---------------------------
    ("simple/string-num-fail", "string", 234, "fail"),
    ("simple/integer-frac-fail", "integer", 123.4, "fail"),
    ("simple/integer-str-fail", "integer", "123", "fail"),
    ("simple/number-str-fail", "number", "123.4", "fail"),
    ("simple/boolean-str-fail", "boolean", "true", "fail"),
    ("simple/undefined-str-fail", "?", "yes", "fail"),
    ("simple/null-str-fail", "null", "no", "fail"),
    ("simple/null-undef-fail", "null", U, "fail"),
    ("simple/integer-unsafe-fail", "integer", 12332323423445323, "fail"),
    # --- objects (validate.spec.ts:88-108) ------------------------------------
    ("object/empty-pass", {}, {}, "pass"),
    ("object/one-num-pass", {"myNumber": "number"}, {"myNumber": 12.3}, "pass"),
    (
        "object/four-field-pass",
        _4FIELD,
        {"num": 12.3, "int": 12, "str": "Hello", "bool": False},
        "pass",
    ),
    ("object/missing-prop-fail", {"myNumber": "number"}, {}, "fail"),
    ("object/missing-three-fail", _4FIELD, {"num": 3}, "fail"),
    ("object/null-fail", {}, None, "fail"),
    (
        "object/stringified-fail",
        _4FIELD,
        '{"num": 12.3, "int": 12, "str": "Hello", "bool": false}',
        "fail",
    ),
    # --- unions (validate.spec.ts:110-127) -------------------------------------
    ("union/string-pass", ["integer", "string"], "hello", "pass"),
    ("union/int-pass", ["integer", "string"], 123, "pass"),
    ("union/object-fail", ["integer", "string"], {}, "fail"),
    ("union/opt-string-pass", ["integer", "string", "?"], "hello", "pass"),
    ("union/opt-int-pass", ["integer", "string", "?"], 123, "pass"),
    ("union/opt-undef-pass", ["integer", "string", "?"], U, "pass"),
    ("union/opt-object-fail", ["integer", "string", "?"], {}, "fail"),
    ("union/in-obj-bigint-pass", {"myValue": ["integer", "string", "?"]}, {"myValue": 1233232342344532}, "pass"),
    ("union/in-obj-str-pass", {"myValue": ["integer", "string", "?"]}, {"myValue": "abc"}, "pass"),
    ("union/in-obj-missing-pass", {"myValue": ["integer", "string", "?"]}, {}, "pass"),
    ("union/in-obj-undef-root-fail", {"myValue": ["integer", "string", "?"]}, U, "fail"),
    # --- arrays (validate.spec.ts:129-138) --------------------------------------
    ("array/one-pass", {"$array": "string"}, ["hello"], "pass"),
    ("array/two-pass", {"$array": "string"}, ["hello", "abc"], "pass"),
    ("array/empty-pass", {"$array": "string"}, [], "pass"),
    ("array/elem-fail", {"$array": "string"}, [2], "fail"),
    ("array/not-array-fail", {"$array": "string"}, "hello", "fail"),
    ("array/union-pass", ["integer", {"$array": ["string"]}], ["true", "this"], "pass"),
    ("array/union-fail", ["integer", {"$array": ["string"]}], [1], "fail"),
    # --- enums (validate.spec.ts:140-147) -----------------------------------------
    ("enum/ts-pass", {"$enum": ["ts", "typescript"]}, "ts", "pass"),
    ("enum/typescript-pass", {"$enum": ["ts", "typescript"]}, "typescript", "pass"),
    ("enum/js-fail", {"$enum": ["ts", "typescript"]}, "javascript", "fail"),
    ("enum/array-fail", {"$enum": ["ts", "typescript"]}, ["ts"], "fail"),
    ("enum/object-fail", {"$enum": ["ts", "typescript"]}, {"$enum": "ts"}, "fail"),
    # --- golden error trees (validate.spec.ts:149-181) ------------------------------
    (
        "golden/tree1",
        _DESCRIBE_TYPE,
        {"num": "abc"},
        "fail",
        {
            "num": {"error": "Value is not a number", "value": "abc"},
            "int": {"error": "Value is not an integer ", "value": U},
            "str": {"error": "Value is not a string", "value": U},
            "bool": {"error": "Value is not a boolean", "value": U},
            "obj": {"error": "Value is not an Object", "value": U},
        },
    ),
    (
        "golden/tree2",
        _DESCRIBE_TYPE,
        {"int": 123.3, "str": [], "bool": "true", "obj": {}},
        "fail",
        {
            "num": {"error": "Value is not a number", "value": U},
            "int": {"error": "Value is not an integer ", "value": 123.3},
            "str": {"error": "Value is not a string", "value": []},
            "bool": {"error": "Value is not a boolean", "value": "true"},
            "obj": {
                "member": {"error": "Value is not a boolean", "value": U},
                "memberId": None,
            },
        },
    ),
    (
        "golden/null-means-ok",
        {"obj": {"member": "boolean", "memberId": ["string", "?"], "nested": {"inside": "string"}}},
        {"obj": {"member": False, "nested": {"inside": "hello"}}},
        "pass",
        {"obj": {"member": None, "nested": {"inside": None}, "memberId": None}},
    ),
    # --- closed world (validate.spec.ts:198-201) --------------------------------------
    (
        "object/extra-key-fail",
        {"myValue": "integer"},
        {"myValue": 2, "ourValue": 3},
        "fail",
        {"myValue": None, "ourValue": {"error": "Key does not exist on validator", "value": 3}},
    ),
    # --- schema throws (validate.spec.ts:203-221) ---------------------------------------
    ("throw/empty-union", {"myValue": []}, {"myValue": 2}, ("throw", "Array of types can not be empty")),
    ("throw/unknown-simple", {"myValue": "bigFlout"}, {"myValue": 2}, ("throw", 'Unknown validator:"bigFlout"')),
    ("throw/unknown-dollar", {"$whatever": "bigFloat"}, {"myValue": 2}, ("throw", 'Unknown validator:{"$whatever":"bigFloat"}')),
    ("throw/undefined-schema", None, {}, ("throw", "Type for validation cannot be undefined")),
    ("throw/reserved-dollar", {"$whatever": "string"}, {"$whatever": 2}, ("throw", None)),
    # --- $string (validate.spec.ts:223-252) -----------------------------------------------
    (
        "string/too-short-golden",
        {"$string": {"minLength": 4, "maxLength": 6}},
        "abc",
        "fail",
        {"error": "String is shorter than the required minimum length", "value": "abc"},
    ),
    (
        "string/too-long-golden",
        {"$string": {"minLength": 4, "maxLength": 6}},
        "Lorem ipsum",
        "fail",
        {"error": "String is longer than the required maximum length", "value": "Lorem ipsum"},
    ),
    ("string/len-pass", {"$string": {"minLength": 4, "maxLength": 6}}, "hello", "pass"),
    (
        "string/regex-fail-golden",
        {"$string": {"regex": "hello \\w+"}},
        "abc",
        "fail",
        {"error": "String did not match required regex", "value": "abc"},
    ),
    ("string/regex-pass", {"$string": {"regex": "hello \\w+"}}, "hello world", "pass"),
    # --- $number (validate.spec.ts:254-272) --------------------------------------------------
    (
        "number/below-min-golden",
        {"$number": {"min": 1, "max": 66}},
        0,
        "fail",
        {"error": "Value is smaller than the required minimum", "value": 0},
    ),
    (
        "number/above-max-golden",
        {"$number": {"min": 1, "max": 66}},
        67,
        "fail",
        {"error": "Value is bigger than the required maximum", "value": 67},
    ),
    ("number/in-range-pass", {"$number": {"min": 1, "max": 66}}, 44, "pass"),
    # --- $map (validate.spec.ts:274-286) --------------------------------------------------------
    ("map/numbers-pass", {"$map": ["number"]}, {"x": 3, "y": 4, "z": 99}, "pass"),
    ("map/str-value-fail", {"$map": ["number"]}, {"x": 3, "y": 4, "z": "99"}, "fail"),
    ("map/str-value2-fail", {"$map": ["number"]}, {"x": 3, "y": "a string", "z": 34}, "fail"),
    ("map/key-regex-pass", {"$map": ["number"], "regex": "^ab[a-z]"}, {"abx": 3, "aby": 4, "abz": 99}, "pass"),
    ("map/key-regex-fail", {"$map": ["number"], "regex": "^ab[a-z]"}, {"x": 3, "y": 4, "z": 99}, "fail"),
    ("map/key-regex-value-fail", {"$map": ["number"], "regex": "^ab[a-z]"}, {"abx": 3, "aby": "a string", "abz": 34}, "fail"),
    # --- injected/extra key still validated (ports of validate.spec.ts:288-318) ------------------
    (
        "inject/extra-b-union-fail",
        {"a": "number", "b": ["string", "?"]},
        {"a": 5, "b": 3},
        "fail",
        {
            "a": None,
            "b": {
                "error": "Did not match any from the listed types",
                "value": 3,
                "output": [
                    {"error": "Value is not a string", "value": 3},
                    {"error": "Value is not undefined", "value": 3},
                ],
            },
        },
    ),
    # --- $types custom types (validate.spec.ts:320-346) --------------------------------------------
    (
        "types/range-pass",
        {"$types": {"$range": {"$number": {"min": 1, "max": 99}}}, "a": "number", "b": "$range"},
        {"a": 2, "b": 43},
        "pass",
    ),
    (
        "types/range-above-fail",
        {"$types": {"$range": {"$number": {"min": 1, "max": 99}}}, "a": "number", "b": "$range"},
        {"a": 2, "b": 101},
        "fail",
    ),
    (
        "types/range-below-fail",
        {"$types": {"$range": {"$number": {"min": 1, "max": 99}}}, "a": "number", "b": "$range"},
        {"a": 2, "b": 0},
        "fail",
    ),
    (
        "types/crossref-pass",
        {
            "$types": {
                "$myObject": {"itsRange": "$range", "name": "string"},
                "$range": {"$number": {"min": 1, "max": 99}},
            },
            "a": "$myObject",
            "b": "$range",
        },
        {"a": {"name": "abc", "itsRange": 22}, "b": 43},
        "pass",
    ),
    (
        "types/crossref-inner-fail",
        {
            "$types": {
                "$myObject": {"itsRange": "$range", "name": "string"},
                "$range": {"$number": {"min": 1, "max": 99}},
            },
            "a": "$myObject",
            "b": "$range",
        },
        {"a": {"name": "abc", "itsRange": 101}, "b": 43},
        "fail",
    ),
    (
        "types/crossref-outer-fail",
        {
            "$types": {
                "$myObject": {"itsRange": "$range", "name": "string"},
                "$range": {"$number": {"min": 1, "max": 99}},
            },
            "a": "$myObject",
            "b": "$range",
        },
        {"a": {"name": "abc", "itsRange": 22}, "b": 0},
        "fail",
    ),
    (
        "types/crossref-both-fail",
        {
            "$types": {
                "$myObject": {"itsRange": "$range", "name": "string"},
                "$range": {"$number": {"min": 1, "max": 99}},
            },
            "a": "$myObject",
            "b": "$range",
        },
        {"a": 2, "b": 0},
        "fail",
    ),
    # --- $ escape (validate.spec.ts:348-356) ----------------------------------------------------------
    (
        "escape/pass",
        {"myNumber": "number", "\\$escapedDollar": "string"},
        {"myNumber": 12.3, "$escapedDollar": "value"},
        "pass",
        {"myNumber": None, "$escapedDollar": None},
    ),
    (
        "escape/fail",
        {"myNumber": "number", "\\$escapedDollar": "string"},
        {"myNumber": 12.3, "$escapedDollar": 234},
        "fail",
        {"myNumber": None, "$escapedDollar": {"error": "Value is not a string", "value": 234}},
    ),
    # --- root meta / recursion (validate.spec.ts:358-393) ----------------------------------------------
    ("meta/root-array-pass", {"$type": {"$array": "string"}}, ["a", "b", "c"], "pass"),
    (
        "meta/root-custom-pass",
        {
            "$types": {"$customType": {"value": "string", "nodes": {"$array": "$customType"}}},
            "$type": "$customType",
        },
        {"value": "abc", "nodes": [{"value": "xyz", "nodes": []}]},
        "pass",
    ),
    (
        "recursion/tree-pass",
        _TREE_SCHEMA,
        {
            "root": {
                "value": "Dcn819x2PCmJV",
                "left": {
                    "value": "mEiX0hq435IXt",
                    "left": {"value": "coGEB1xXQmsRS"},
                    "right": {"value": "6lBoBa"},
                },
                "right": {
                    "value": "mV9j2",
                    "left": {"value": "iL42zyiOv"},
                    "right": {"value": "Bx6FbX"},
                },
            }
        },
        "pass",
    ),
    # --- $and (validate.spec.ts:395-434) -----------------------------------------------------------------
    (
        "and/multi-pass",
        {"$and": [{"valueA": "string"}, {"valueB": "number"}, {"$type": {"otherValue": "number"}}]},
        {"valueA": "someString", "valueB": 32, "otherValue": 9},
        "pass",
    ),
    (
        "and/missing-fail",
        {"$and": [{"valueA": "string"}, {"valueB": "number"}]},
        {"valueA": "someString"},
        "fail",
    ),
    (
        "and/non-object-fail",
        {"$and": [{"valueA": "string"}, "string"]},
        {"valueA": "someString"},
        "fail",
    ),
    (
        "and/custom-types-pass",
        {
            "$types": {
                "$myObject": {"value": "string"},
                "$otherObject": {"num": "number"},
                "$myMetaObject": {"$type": {"value2": "string"}},
            },
            "$and": [{"valueA": "string"}, "$myObject", "$myMetaObject", {"$type": "$otherObject"}],
        },
        {"valueA": "someString", "value": "value", "value2": "value2", "num": 88},
        "pass",
    ),
    # --- array/map bounds (validate.spec.ts:436-464) -----------------------------------------------------
    ("array/min-fail", {"$array": "string", "minLength": 3}, ["abc", "efg"], "fail"),
    ("array/max-fail", {"$array": "string", "maxLength": 3}, ["abc", "efg", "some", "value"], "fail"),
    ("array/bounds-pass", {"$array": "string", "minLength": 1, "maxLength": 3}, ["some", "value"], "pass"),
    ("map/min-fail", {"$map": "string", "minLength": 3}, {"a": "abc", "b": "efg"}, "fail"),
    ("map/max-fail", {"$map": "string", "maxLength": 3}, {"a": "abc", "e": "efg", "c": "some", "d": "value"}, "fail"),
    ("map/bounds-pass", {"$map": "string", "minLength": 1, "maxLength": 3}, {"a": "some", "x": "value"}, "pass"),
]
