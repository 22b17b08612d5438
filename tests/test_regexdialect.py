"""Regex dialect guard: ECMA-only constructs must be detected at compile
time and routed to the dynamic path, which must evaluate them with
ECMAScript semantics (via Python-re translation). SURVEY §7.4."""

from __future__ import annotations

import json

import pytest

from yaschva_spark.engine import PASS_COL, validate_auto, validate_table
from yaschva_spark.interp import validate as interp_validate
from yaschva_spark.regexdialect import to_python_pattern, typed_unsafe
from yaschva_spark.typed import TypedCompileError


def test_shared_subset_is_typed_safe():
    for p in [r"^src[0-9]+$", r"a|b", r"\d{2,}", r"(?i)x", r"(?<name>ab)\k<name>",
              r"\p{L}+", r"[a-z\]]+", r"(?<=x)y", r"x[[]y"]:
        assert typed_unsafe(p) == [], p
        # translation is near-identity (named group/backref re-spelled only)


def test_ecma_only_constructs_detected():
    assert typed_unsafe(r"\u{48}ello")
    assert typed_unsafe(r"\p{Letter}+")
    assert typed_unsafe(r"\p{Script=Greek}")
    assert typed_unsafe(r"x[]y")
    assert typed_unsafe(r"x[^]y")
    assert typed_unsafe(r"[a][]") and not typed_unsafe(r"[a]")


def test_translation_semantics():
    import re

    assert re.search(to_python_pattern(r"\u{48}ello"), "Hello")
    assert not re.search(to_python_pattern(r"x[]y"), "xay")
    assert re.search(to_python_pattern(r"x[^]y"), "x\ny")
    assert re.search(to_python_pattern(r"(?<g>ab)\k<g>"), "abab")
    # '\u{2E}' is the '.' codepoint: must become a LITERAL dot, not any-char
    assert re.search(to_python_pattern(r"\u{2E}"), ".")
    assert not re.search(to_python_pattern(r"\u{2E}"), "a")


def test_ecma_regex_routes_to_dynamic_and_matches(spark):
    # \u{STRING... reference: new RegExp('^\\u{48}i$','u').test('Hi') == true
    schema = {"greeting": {"$string": {"regex": "^\\u{48}i$"}}}
    df = spark.createDataFrame([(1, "Hi"), (2, "hi"), (3, "Hix")], "id long, greeting string")
    with pytest.raises(TypedCompileError):
        validate_table(df.select("greeting"), schema)
    from pyspark.sql import functions as F

    jdf = df.withColumn("js", F.to_json(F.struct("greeting")))
    # typed compile reaches the greeting regex, raises, and validate_auto
    # falls back to the interpreter over the json column
    out = validate_auto(jdf, schema, json_col="js", ignore_columns=("id", "js"))
    got = {r["id"]: r[PASS_COL] for r in out.collect()}
    assert got == {1: True, 2: False, 3: False}
    # interpreter agrees value-by-value (the executable spec)
    assert interp_validate(schema, {"greeting": "Hi"})["result"] == "pass"
    assert interp_validate(schema, {"greeting": "hi"})["result"] == "fail"


def test_map_key_ecma_regex_routes(spark):
    schema = {"m": {"$map": "string", "regex": "^[^]$"}}
    df = spark.createDataFrame([(1,)], "id long")
    from pyspark.sql import functions as F
    df = df.withColumn("m", F.create_map(F.lit("a"), F.lit("v")))
    with pytest.raises(TypedCompileError):
        validate_table(df.select("m"), schema)


def test_whitespace_class_routes_off_java_path():
    assert typed_unsafe(r"^\S+$")
    assert typed_unsafe(r"a\sb")
    # ECMA \w/\d/\b are ASCII — Java agrees, so these stay on the typed path
    assert not typed_unsafe(r"^\w+\d\b$")


def test_python_respelling_pins_ecma_semantics():
    import re

    # \w is ASCII in ECMA: Unicode letters must NOT match
    assert re.fullmatch(to_python_pattern(r"\w+"), "abc_9")
    assert not re.fullmatch(to_python_pattern(r"\w+"), "é")
    # \s is the exact ECMA set: NBSP in, Python-only \x1c out
    assert re.search(to_python_pattern(r"\s"), " ")
    assert not re.search(to_python_pattern(r"\s"), "\x1c")
    assert not re.search(to_python_pattern(r"\S"), " \t ")
    # . excludes \r and   like ECMA (Python's dot only excludes \n)
    assert not re.fullmatch(to_python_pattern(r"^.$"), "\r")
    assert not re.fullmatch(to_python_pattern(r"^.$"), " ")
    assert re.fullmatch(to_python_pattern(r"^.$"), "x")
    # \b is the ASCII word boundary: 'a|é' IS a boundary in ECMA
    assert re.search(to_python_pattern(r"a\b"), "aé")
    assert not re.search(r"a\b", "aé")  # Python's own \b disagrees
    # in-class \s expands to the set body
    assert re.fullmatch(to_python_pattern(r"[\sx]+"), " x ")


def test_hybrid_paths_agree_on_nbsp(spark):
    from yaschva_spark.engine import validate_json_table

    # Java \S wrongly treats NBSP as non-whitespace; the guard must route
    # this schema off the typed/screen path so both executions agree
    schema = {"x": {"$string": {"regex": "^\\S+$"}}}
    df = spark.createDataFrame(
        [(1, '{"x": " "}'), (2, '{"x": "ok"}')], "id long, js string"
    )
    a = {r["id"]: r["yv_valid"]
         for r in validate_json_table(df, schema, "js", screen=True).collect()}
    b = {r["id"]: r["yv_valid"]
         for r in validate_json_table(df, schema, "js", screen=False).collect()}
    assert a == b
    assert a[1] is False and a[2] is True  # NBSP is ECMA whitespace
