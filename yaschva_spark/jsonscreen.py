"""JVM-side "provably passes" screen for the dynamic JSON path.

The dynamic path's exactness requirements (undefined vs null, unions,
closed-world objects) force interpreter evaluation — but not for every
ROW. This module compiles a yaschva schema fragment into ONE Catalyst
boolean over Spark's VARIANT type that is true only when the interpreter
would return ``pass``. The hybrid executor (engine.validate_json_table)
then runs per-row Python ONLY on rows the screen can't prove — typically
the small violating fraction — turning the dynamic path's linear Python
cost into linear-in-violations cost at 100 TB.

Why VARIANT: ``try_parse_json`` + ``try_variant_get``/``is_variant_null``
distinguish a *missing* key (SQL NULL variant) from a JSON ``null`` (a
present variant with ``is_variant_null`` true) — precisely the
undefined/null split that `from_json` erases and that forced the
interpreter in round 1. ``schema_of_variant`` gives the JSON type tag
(BIGINT/DOUBLE/DECIMAL/STRING/BOOLEAN/VOID/OBJECT<...>).

Soundness contract: the screen may return false for a passing row (that
row just pays the interpreter), but must NEVER return true for a failing
one. Consequences baked in:

* numeric bound checks add a representability guard — a BIGINT/DECIMAL
  beyond 2^53 rounds when cast to double, and the interpreter compares
  exact Python ints, so such rows are never screened;
* regex checks screen only dialect-safe patterns (regexdialect);
* schema shapes outside the fragment (nested objects, $array/$map/$and,
  custom $types, recursion) raise :class:`ScreenNotApplicable` — the
  caller falls back to full interpretation, never to wrong answers;
* a union branch outside the fragment contributes ``false`` (rows passing
  only via that branch go to the interpreter), because a union pass via a
  screenable branch is still a pass.

Supported fragment: root = flat object / simple type / union of
screenables; field constraints = simple types, ``?``, ``null``, ``any``,
``$enum``, ``$string`` (length + safe regex), ``$number`` (min/max),
``$type`` meta-unwrap, unions thereof. This covers the
"statically-expressible fragment" of VERDICT r1 #6; extend per shape as
needed.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from yaschva_spark.regexdialect import to_java_pattern, typed_unsafe
from yaschva_spark.schema import js_falsy

MAX_SAFE = 2**53 - 1


class ScreenNotApplicable(Exception):
    """Schema shape outside the screenable fragment."""


def _vtype(tv: Column) -> Column:
    return F.schema_of_variant(tv)


def _present(tv: Column) -> Column:
    return tv.isNotNull() & ~F.is_variant_null(tv)


def _dval(tv: Column) -> Column:
    return F.try_variant_get(tv, "$", "double")


def _is_number_type(tv: Column) -> Column:
    t = _vtype(tv)
    return (t == "BIGINT") | (t == "DOUBLE") | t.startswith("DECIMAL")


def _finite(v: Column) -> Column:
    inf = F.lit(float("inf"))
    return v.isNotNull() & ~F.isnan(v) & (v != inf) & (v != -inf)


def _exact_as_double(tv: Column, v: Column) -> Column:
    """True when double(v) compares identically to the interpreter's exact
    value: always for DOUBLE (both sides are the same double), else only
    within the 2^53 integer-exact window."""
    return (_vtype(tv) == "DOUBLE") | (F.abs(v) <= F.lit(float(MAX_SAFE)))


def _screen(node: Any, tv: Column) -> Column:
    """Provable-pass condition for value variant ``tv`` (NULL = missing /
    JS undefined) under schema ``node``."""
    if isinstance(node, str):
        if node == "any":
            return F.lit(True)
        if node == "?":
            return tv.isNull()
        if node == "null":
            return tv.isNotNull() & F.is_variant_null(tv)
        if node == "string":
            return _present(tv) & (_vtype(tv) == "STRING")
        if node == "boolean":
            return _present(tv) & (_vtype(tv) == "BOOLEAN")
        if node == "number":
            return _present(tv) & _is_number_type(tv) & _finite(_dval(tv))
        if node == "integer":
            v = _dval(tv)
            return (
                _present(tv)
                & _is_number_type(tv)
                & _finite(v)
                & (F.floor(v) == v)
                & (F.abs(v) <= F.lit(float(MAX_SAFE)))
            )
        raise ScreenNotApplicable(f"custom type {node!r}")
    if isinstance(node, list):
        if not node:
            raise ScreenNotApplicable("empty union (schema error path)")
        branches = []
        for b in node:
            try:
                branches.append(_screen(b, tv))
            except ScreenNotApplicable:
                branches.append(F.lit(False))  # branch passes go to interp
        out = branches[0]
        for b in branches[1:]:
            out = out | b
        return out
    if isinstance(node, dict):
        if "$type" in node:
            return _screen(node["$type"], tv)
        if "$enum" in node:
            enums = node["$enum"]
            if not enums:  # reference: indexOf over [] always fails
                return F.lit(False)
            s = F.try_variant_get(tv, "$", "string")
            cond = _present(tv) & (_vtype(tv) == "STRING")
            return cond & s.isin(list(enums))
        if "$string" in node:
            spec = node["$string"]
            s = F.try_variant_get(tv, "$", "string")
            cond = _present(tv) & (_vtype(tv) == "STRING")
            from yaschva_spark.typed import js_strlen  # UTF-16 code units (JS .length)

            if not js_falsy(spec.get("minLength")):
                cond = cond & (js_strlen(s) >= F.lit(spec["minLength"]))
            if not js_falsy(spec.get("maxLength")):
                cond = cond & (js_strlen(s) <= F.lit(spec["maxLength"]))
            pattern = spec.get("regex")
            if not js_falsy(pattern):
                if typed_unsafe(pattern):
                    raise ScreenNotApplicable("ECMA-only regex")
                cond = cond & s.rlike(to_java_pattern(pattern))
            return cond
        if "$number" in node:
            spec = node["$number"]
            v = _dval(tv)
            cond = _present(tv) & _is_number_type(tv) & _finite(v)
            lo, hi = spec.get("min"), spec.get("max")
            if lo is not None or hi is not None:
                cond = cond & _exact_as_double(tv, v)
            if lo is not None:
                cond = cond & (v >= F.lit(float(lo)))
            if hi is not None:
                cond = cond & (v <= F.lit(float(hi)))
            return cond
        raise ScreenNotApplicable(f"unscreenable node keys {sorted(node)!r}")
    raise ScreenNotApplicable(f"unscreenable node {type(node).__name__}")


def compile_pass_screen(schema: Any, raw: Column) -> Column:
    """Boolean Column: provably ``pass`` for the JSON text column ``raw``.
    Raises :class:`ScreenNotApplicable` outside the fragment."""
    pv = F.try_parse_json(raw)
    if isinstance(schema, dict) and not any(k.startswith("$") for k in schema):
        if "$types" in schema:  # unreachable (startswith guard) — explicit anyway
            raise ScreenNotApplicable("$types")
        field_keys = []
        conds = []
        for key, sub in schema.items():
            data_key = key[1:] if key.startswith("\\$") else key
            # variant paths can't address keys needing escaping — fall back
            if not data_key or any(ch in data_key for ch in ".[]'\"$ \\"):
                raise ScreenNotApplicable(f"key {data_key!r} not path-addressable")
            field_keys.append(data_key)
            tv = F.try_variant_get(pv, f"$.{data_key}", "variant")
            conds.append(_screen(sub, tv))
        # closed world: every data key must be declared (extra_key);
        # presence/absence of declared keys is what each field's screen saw
        keyset_ok = (
            F.size(F.array_except(F.json_object_keys(raw), F.array(*[F.lit(k) for k in field_keys])))
            == 0
        )
        root_obj = _vtype(pv).startswith("OBJECT")
        out = pv.isNotNull() & root_obj & keyset_ok
        for c in conds:
            out = out & c
        return F.coalesce(out, F.lit(False))
    return F.coalesce(_screen(schema, pv), F.lit(False))


def pass_output_col(schema: Any, raw: Column) -> Column:
    """The interpreter's ``yv_output`` JSON for a PASSING row, built
    JVM-side: null at every leaf, and — crucially — in the interpreter's
    key order, which is DATA order first (``obj.items()`` in
    interp._v_object) then missing declared keys in schema order. A
    schema-order constant here would differ from ``screen=False`` output
    for any passing row whose JSON key order isn't the schema's.

    Safe to build by plain concatenation: the screen already rejected any
    key containing quote/backslash/etc. (path-addressable check), and a
    proven row's keys are a subset of the declared keys (closed world).
    ``array_distinct`` mirrors dict-insertion semantics for duplicate JSON
    keys (first occurrence keeps the position)."""
    if isinstance(schema, dict) and not any(k.startswith("$") for k in schema):
        declared = F.array(
            *[F.lit(k[1:] if k.startswith("\\$") else k) for k in schema]
        )
        data_keys = F.array_distinct(F.json_object_keys(raw))
        all_keys = F.concat(data_keys, F.array_except(declared, data_keys))
        body = F.array_join(
            F.transform(all_keys, lambda k: F.concat(F.lit('"'), k, F.lit('":null'))),
            ",",
        )
        return F.concat(F.lit("{"), body, F.lit("}"))
    return F.lit("null")
