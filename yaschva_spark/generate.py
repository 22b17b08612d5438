"""Seeded fixture generator — the reference ``generate()`` surface.

Semantics follow /root/reference/src/generate.ts exactly (option defaults
generate.ts:62-74, depth budget 84-88/110-121/143, preference filtering
51-59, undefined-element filtering 125/134), but generation is fully
deterministic: every call draws from a ``random.Random(seed)``.

The core invariant, asserted throughout the reference's generate.spec.ts and
by ``tests/test_generate.py``: ``validate(schema, generate(schema)) == pass``.

Used by the engine for: pytest round-trip property tests, and synthesizing
fixture DataFrames (see :mod:`yaschva_spark.fixtures`).
"""

from __future__ import annotations

import math
import random
from dataclasses import dataclass, replace
from typing import Any

from yaschva_spark.errors import MAX_SAFE_INTEGER
from yaschva_spark.genregex import regex_sample
from yaschva_spark.interp import UNDEFINED
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
    is_simple,
    is_string_node,
    is_union,
    js_falsy,
    unescape_key,
)

_ALNUM = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
_SIMPLE_POOL = ("number", "integer", "?", "string", "boolean")  # generate.ts:28


@dataclass(frozen=True)
class Options:
    """Defaults per generate.ts:62-74."""

    array_min: int = 1
    array_max: int = 90
    map_min: int = 1
    map_max: int = 33
    min_number: float = -MAX_SAFE_INTEGER
    max_number: float = MAX_SAFE_INTEGER
    min_string_length: int = 3
    max_string_length: int = 16
    max_depth_soft: int = 4
    max_depth_hard: int = 32
    prefer: str = "none"  # 'defined' | 'undefined' | 'none'


class GenerateError(Exception):
    """Generation-time schema errors (the reference throws)."""


def random_number(rng: random.Random, is_integer: bool, lo: float, hi: float) -> float:
    """generate.ts:22-26: uniform in [lo, hi]; JS Math.round if integer."""
    num = rng.random() * (hi - lo) + lo
    if is_integer:
        return int(math.floor(num + 0.5))  # JS Math.round semantics
    return num


def random_string(rng: random.Random, length: int) -> str:
    return "".join(rng.choice(_ALNUM) for _ in range(int(length)))


def _simple_generation(stype: str, options: Options, rng: random.Random) -> Any:
    """generate.ts:37-49."""
    if stype == "any":
        idx = int(random_number(rng, True, 0, len(_SIMPLE_POOL) - 1))
        return _simple_generation(_SIMPLE_POOL[idx], options, rng)
    if stype == "?":
        return UNDEFINED
    if stype == "null":
        return None
    if stype == "number":
        return random_number(rng, False, options.min_number, options.max_number)
    if stype == "integer":
        return random_number(rng, True, options.min_number, options.max_number)
    if stype == "string":
        return random_string(
            rng, random_number(rng, True, options.min_string_length, options.max_string_length)
        )
    if stype == "boolean":
        return rng.random() > 0.5
    raise GenerateError(f'Unknown validator:"{stype}"')


def _apply_preference(branches: list, options: Options) -> list:
    """generate.ts:51-59."""
    if options.prefer == "defined":
        return [b for b in branches if b != "?"] if len(branches) > 1 else branches
    if options.prefer == "undefined":
        return ["?"] if any(b == "?" for b in branches) else branches
    return branches


def generate_table(
    spark,
    schema: Any,
    n_rows: int,
    seed: int = 42,
    partitions: int | None = None,
    **option_overrides: Any,
):
    """Distributed reference-semantics data generation: ``n_rows``
    independent ``generate(schema, seed=seed+row_id)`` samples, produced
    in parallel via ``mapInPandas`` over ``spark.range`` — the table-scale
    form of the reference's ``generate()`` (each row is exactly what the
    single-value generator yields for its derived seed, so results are
    deterministic AND partitioning-independent).

    Returns ``(id, doc)`` with ``doc`` as compact JSON text — generated
    values are dynamic (unions/optional members produce heterogeneous
    shapes), so a JSON column feeding :func:`engine.validate_json_table`
    is the natural carrier; the generate->validate roundtrip then holds
    row-wise at any scale (asserted in tests).
    """
    import json as _json

    schema_blob = _json.dumps(schema)

    def gen(batches):
        import pandas as pd

        from yaschva_spark.interp import UNDEFINED, UNDEFINED_TOKEN

        node = _json.loads(schema_blob)

        def render(i: int) -> str:
            v = generate(node, seed=seed + int(i), **option_overrides)
            if v is UNDEFINED:  # engine convention: BARE token = undefined root
                return UNDEFINED_TOKEN
            return _json.dumps(_to_jsonable(v), separators=(",", ":"), ensure_ascii=False)

        for pdf in batches:
            yield pd.DataFrame({"id": pdf["id"], "doc": [render(i) for i in pdf["id"]]})

    rng = spark.range(n_rows, numPartitions=partitions) if partitions else spark.range(n_rows)
    return rng.mapInPandas(gen, schema="id long, doc string")


def _to_jsonable(value: Any) -> Any:
    """Generated values may contain the UNDEFINED sentinel (optional
    members chosen absent at the root); map to the fixture token."""
    from yaschva_spark.interp import UNDEFINED, UNDEFINED_TOKEN

    if value is UNDEFINED:
        return UNDEFINED_TOKEN
    if isinstance(value, dict):
        return {k: _to_jsonable(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_to_jsonable(v) for v in value]
    return value


def generate(schema: Any, seed: int = 42, **option_overrides: Any) -> Any:
    """Public entry point (generate.ts:61-76). ``UNDEFINED`` may be returned
    for optional roots; object fields that generate undefined are omitted."""
    options = replace(Options(), **option_overrides)
    rng = random.Random(seed)
    return _generate_internal(schema, options, {}, 0, rng)


def _generate_internal(
    node: Any, options: Options, custom_types: dict, depth: int, rng: random.Random
) -> Any:
    if depth >= options.max_depth_hard:
        raise GenerateError(
            f"Maximum depth reached: {depth} -- most likely a circular type "
            f"with no possible way to terminate. Consider making the recursion optional."
        )

    node, extracted = extract_types(node)
    if extracted is not None:
        custom_types = extracted

    def gen(sub: Any, deeper: bool = False) -> Any:
        return _generate_internal(sub, options, custom_types, depth + 1 if deeper else depth, rng)

    if is_simple(node):
        custom = custom_types.get(node)
        if not js_falsy(custom) and custom is not None:
            return gen(custom)
        return _simple_generation(node, options, rng)

    if is_union(node):
        # generate.ts:109-117: past soft depth, prefer the escape hatch
        if depth > options.max_depth_soft and any(b == "?" for b in node):
            return UNDEFINED
        branches = _apply_preference(list(node), options)
        idx = int(random_number(rng, True, 0, len(branches) - 1))
        return gen(branches[idx])

    if is_array_node(node):
        if depth > options.max_depth_soft:
            return []
        lo = node["minLength"] if isinstance(node.get("minLength"), (int, float)) and not isinstance(node.get("minLength"), bool) else options.array_min
        hi = node["maxLength"] if isinstance(node.get("maxLength"), (int, float)) and not isinstance(node.get("maxLength"), bool) else options.array_max
        count = int(random_number(rng, True, lo, hi))
        items = [gen(node["$array"], deeper=True) for _ in range(count)]
        return [x for x in items if x is not UNDEFINED]  # generate.ts:125

    if is_enum_node(node):
        idx = int(random_number(rng, True, 0, len(node["$enum"]) - 1))
        return node["$enum"][idx]

    if is_obj(node):
        out = {}
        for key, sub in node.items():
            value = gen(sub, deeper=True)
            if value is not UNDEFINED:  # generate.ts:134
                out[unescape_key(key)] = value
        return out

    if is_map_node(node):
        lo = node["minLength"] if isinstance(node.get("minLength"), (int, float)) and not isinstance(node.get("minLength"), bool) else options.map_min
        hi = node["maxLength"] if isinstance(node.get("maxLength"), (int, float)) and not isinstance(node.get("maxLength"), bool) else options.map_max
        # generate.ts:143 — >= soft depth and no mandatory minimum: empty map
        min_length = node.get("minLength") or 0
        if depth >= options.max_depth_soft and min_length <= 0:
            return {}
        count = int(random_number(rng, True, lo, hi))
        out = {}
        for _ in range(count):
            key = (
                regex_sample(node["regex"], rng)
                if not js_falsy(node.get("regex"))
                else _simple_generation("string", options, rng)
            )
            out[key] = gen(node["$map"], deeper=True)
        return out

    if is_number_node(node):
        lo = node["$number"].get("min")
        hi = node["$number"].get("max")
        return random_number(
            rng,
            False,
            options.min_number if lo is None else lo,
            options.max_number if hi is None else hi,
        )

    if is_meta_node(node):
        return gen(node["$type"])

    if is_string_node(node):
        constraints = node["$string"]
        if not js_falsy(constraints.get("regex")):
            return regex_sample(constraints["regex"], rng)
        # generate.ts:165 — JS `minLength || maxLength || 6` (falsy chain)
        length = constraints.get("minLength") or constraints.get("maxLength") or 6
        return random_string(rng, length)

    if is_and_node(node):
        try:
            merged = combine_and(node, custom_types)
        except SchemaError as exc:
            raise GenerateError(f"Schema error, $and types must be objects: {exc}") from exc
        return gen(merged)

    raise GenerateError("Unknown type")
