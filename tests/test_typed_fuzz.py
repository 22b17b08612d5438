"""Seeded random-schema differential fuzz: the typed Catalyst compiler must
agree with the interpreter (the executable spec) on pass/fail and violation
rows for randomly composed schemas and randomly corrupted values.

Deterministic (seeded random.Random, no hypothesis shrinking needed): each
failure reproduces from its printed (schema_seed, row index).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import types as T

from yaschva_spark.engine import PASS_COL, VIOLATIONS_COL, validate_table
from yaschva_spark.generate import generate
from yaschva_spark.interp import UNDEFINED, validate as iv, violations_from_output
from yaschva_spark.typed import TypedCompileError, schema_to_spark_type

_SIMPLE = ["string", "number", "integer", "boolean"]


def _rand_leaf(rng: random.Random):
    kind = rng.randrange(6)
    if kind == 0:
        return rng.choice(_SIMPLE)
    if kind == 1:
        spec = {}
        if rng.random() < 0.7:
            spec["minLength"] = rng.randrange(1, 4)
        if rng.random() < 0.7:
            spec["maxLength"] = rng.randrange(4, 10)
        if rng.random() < 0.4:
            spec["regex"] = rng.choice(["^[a-z]+$", "[0-9]", "^x"])
        return {"$string": spec}
    if kind == 2:
        spec = {}
        if rng.random() < 0.8:
            spec["min"] = rng.randrange(-50, 0)
        if rng.random() < 0.8:
            spec["max"] = rng.randrange(1, 50)
        return {"$number": spec}
    if kind == 3:
        return {"$enum": rng.sample(["a", "b", "c", "d", "e"], rng.randrange(2, 4))}
    if kind == 4:
        return [rng.choice(_SIMPLE), "?"]  # optional union
    return "integer"


def _rand_node(rng: random.Random, depth: int):
    if depth <= 0 or rng.random() < 0.5:
        return _rand_leaf(rng)
    kind = rng.randrange(3)
    if kind == 0:
        spec = {"$array": _rand_node(rng, depth - 1)}
        if rng.random() < 0.5:
            spec["maxLength"] = rng.randrange(1, 4)
        return spec
    if kind == 1:
        return {"$map": _rand_leaf(rng)}
    return {
        f"f{i}": _rand_node(rng, depth - 1) for i in range(rng.randrange(1, 4))
    }


def _rand_schema(seed: int) -> dict:
    rng = random.Random(seed)
    return {f"c{i}": _rand_node(rng, 2) for i in range(rng.randrange(2, 5))}


def _nullable(dt):
    if isinstance(dt, T.StructType):
        return T.StructType(
            [T.StructField(f.name, _nullable(f.dataType), True) for f in dt.fields]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_nullable(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(dt.keyType, _nullable(dt.valueType), True)
    return dt


def _corrupt(value: dict, schema: dict, rng: random.Random) -> dict:
    """Random in-type corruptions: None (undefined), empty strings, huge
    numbers, unsafe integers — representable in the Spark type but likely
    constraint-violating."""
    out = dict(value)
    keys = list(schema.keys())
    for _ in range(rng.randrange(1, 3)):
        k = rng.choice(keys)
        node = schema[k]
        choice = rng.randrange(4)
        if choice == 0:
            out[k] = None
        elif choice == 1 and isinstance(node, dict) and "$string" in node:
            out[k] = ""
        elif choice == 2 and isinstance(node, dict) and "$number" in node:
            out[k] = 1e9
        elif choice == 3 and node == "integer":
            out[k] = 2**53 + 1
        else:
            out[k] = None
    return out


def _interp_expected(schema, value):
    res = iv(schema, value)
    rows = violations_from_output(res["output"])
    return res["result"] == "pass", sorted(
        (r["path"], r["rule"], r["error"]) for r in rows
    )


@pytest.mark.parametrize("schema_seed", range(20))
def test_random_schema_typed_matches_interp(spark, schema_seed):
    schema = _rand_schema(schema_seed)
    try:
        spark_type = schema_to_spark_type(schema)
    except TypedCompileError:
        pytest.skip("schema not typed-compilable")
    def _strip_undef(v):
        # the generator emits the UNDEFINED sentinel for optional map values;
        # a Spark map cannot hold it — dropping the entry is the same world
        # (absent key == undefined value for the validator)
        if isinstance(v, dict):
            return {k: _strip_undef(x) for k, x in v.items() if x is not UNDEFINED}
        if isinstance(v, list):
            return [_strip_undef(x) for x in v if x is not UNDEFINED]
        return v

    rng = random.Random(1000 + schema_seed)
    rows = [
        _strip_undef(generate(schema, seed=100 * schema_seed + i, array_max=3, map_max=2))
        for i in range(3)
    ]
    rows += [_corrupt(r, schema, rng) for r in rows]

    df = spark.createDataFrame(
        [tuple(r.get(f.name) for f in spark_type.fields) for r in rows],
        _nullable(spark_type),
    )
    try:
        validated = validate_table(df, schema)
    except TypedCompileError:
        pytest.skip("schema needs dynamic path")
    got = validated.select(PASS_COL, VIOLATIONS_COL).collect()
    for i, (value, row) in enumerate(zip(rows, got)):
        # typed-path NULL means undefined: drop None-valued keys so the
        # interpreter sees the same world (documented deviation, SURVEY §7.4)
        interp_value = {k: v for k, v in value.items() if v is not None}
        exp_pass, exp_viols = _interp_expected(schema, interp_value)
        got_viols = sorted((v["path"], v["rule"], v["error"]) for v in row[VIOLATIONS_COL])
        assert row[PASS_COL] == exp_pass, (schema_seed, i, schema, value, got_viols, exp_viols)
        assert got_viols == exp_viols, (schema_seed, i, schema, value, got_viols, exp_viols)
