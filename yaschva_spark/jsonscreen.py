"""JVM-side "provably passes" screen for the dynamic JSON path.

The dynamic path's exactness requirements (undefined vs null, unions,
closed-world objects) force interpreter evaluation — but not for every
ROW. This module compiles a yaschva schema fragment into ONE Catalyst
boolean over Spark's VARIANT type that is true only when the interpreter
would return ``pass``, plus the matching ``yv_output`` text expression so
proven rows never cross the Arrow boundary at all
(engine.validate_json_table splits the plan on the screen).

Why VARIANT: ``try_parse_json`` + ``try_variant_get``/``is_variant_null``
distinguish a *missing* key (SQL NULL variant) from a JSON ``null`` (a
present variant with ``is_variant_null`` true) — precisely the
undefined/null split that `from_json` erases and that forced the
interpreter in round 1. ``schema_of_variant`` gives the JSON type tag
(BIGINT/DOUBLE/DECIMAL/STRING/BOOLEAN/VOID/OBJECT<...>/ARRAY<...>).

Soundness contract: the screen may return false for a passing row (that
row just pays the interpreter), but must NEVER return true for a failing
one — and when it returns true, the emitted output text must equal the
interpreter's byte for byte. Consequences baked in:

* numeric bound checks add a representability guard — a BIGINT/DECIMAL
  beyond 2^53 rounds when cast to double, and the interpreter compares
  exact Python ints, so such rows are never screened;
* regex checks screen only dialect-safe patterns (regexdialect),
  translated to Java semantics (to_java_pattern);
* object/map screens require a true JSON OBJECT — the reference also
  accepts JS *arrays* against object schemas (indices become keys,
  validate.ts:128-193); such rows screen false and run interpreted;
* object keys outside a conservative ``[A-Za-z0-9_-]+`` allowlist make
  the schema unscreenable: anything wilder risks JSONPath
  metacharacters (``$ . [ ] * ?``) resolving differently between
  ``try_variant_get`` and the interpreter's plain dict lookup, and
  non-ASCII keys would diverge from the interpreter's
  ``json.dumps(ensure_ascii=True)`` output escaping;
* map keys are dynamic, so the same safety is enforced per ROW: a key
  regex in the screen condition rejects rows whose keys need JSON
  escaping (those rows run interpreted);
* union branches are screened as an ordered prefix: the reference takes
  the FIRST passing branch's output (validate.ts:91-104), so a branch
  may join the prefix only while every earlier branch's screen is
  *exact* (screen true ⇔ interpreter pass) — otherwise an earlier
  branch could pass in the interpreter while its screen said false, and
  the when-chain would emit the wrong branch's output. Branches after
  the first non-exact or unscreenable one contribute ``false`` (rows
  passing only via them go to the interpreter);
* array elements and map values must have literally-``null`` pass
  output (leaves or unions of leaves): composite outputs need the
  original JSON *text* for data-order keys (VARIANT sorts object keys)
  and only literal paths can address text — nested objects get it via
  ``get_json_object`` at compile-time paths, dynamic positions can't;
* recursive ``$types`` raise :class:`ScreenNotApplicable` (depth guard);
* a schema shape outside all of the above raises
  :class:`ScreenNotApplicable` — the caller falls back to full
  interpretation, never to wrong answers.

Supported fragment: simple types, ``?``, ``null``, ``any``, ``$enum``,
``$string`` (UTF-16 length + dialect-safe regex), ``$number`` (min/max),
``$type`` meta-unwrap, inlined ``$types`` custom types (non-recursive),
``$and`` merges, nested objects at literal paths, ``$array`` /``$map``
with leaf-output element/value schemas, and ordered union prefixes
thereof. Reference semantics: validate.ts:50-205 (leaves),
validate.ts:106-193 (arrays/maps/objects), validate.ts:91-104 (unions).
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from yaschva_spark.regexdialect import to_java_pattern, typed_unsafe
from yaschva_spark.schema import (
    SIMPLE_TYPES,
    SchemaError,
    combine_and,
    extract_types,
    js_falsy,
    unescape_key,
)

MAX_SAFE = 2**53 - 1

#: Keys the screen will address via JSONPath and emit into output text
#: verbatim. Conservative on purpose (see module docstring).
_SAFE_KEY = _re.compile(r"\A[A-Za-z0-9_-]+\Z")

#: Per-row guard for dynamic ($map) keys: printable ASCII without the two
#: JSON-escape-relevant characters (``"`` and ``\``) — exactly the keys
#: whose ``json.dumps(ensure_ascii=True)`` rendering is the key itself.
#: Anchored with \A/\z, never ^/$: Java regex '$' also matches before a
#: trailing line terminator (\n, \r, U+0085, U+2028, U+2029), so a '$'-anchored
#: pattern would let a key like "a\n" through and break the screen's
#: byte-exact soundness contract (the interpreter emits "a\\n").
_MAP_KEY_SAFE_RLIKE = "\\A[ !#-\\[\\]-~]*\\z"

_MAX_DEPTH = 64


class ScreenNotApplicable(Exception):
    """Schema shape outside the screenable fragment."""


@dataclass
class _Screen:
    #: sound provable-pass condition (NULL counts as false downstream)
    cond: Column
    #: the interpreter's ``yv_output`` JSON text — valid only when ``cond``
    out: Column
    #: cond ⇔ interpreter-pass over the parseable-JSON domain (not merely ⇒)
    exact: bool
    #: ``out`` is the literal text ``null`` for every passing value
    null_out: bool


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


def _leaf(cond: Column, *, exact: bool) -> _Screen:
    return _Screen(cond, F.lit("null"), exact, True)


def _string_cond(tv: Column) -> Column:
    return _present(tv) & (_vtype(tv) == "STRING")


def _len_bounds(n: Column, node: dict) -> Column:
    """minLength/maxLength with the reference's ``|| 0`` / ``|| MAX``
    falsy defaults (validate.ts:109-110,171-172)."""
    max_len = node.get("maxLength")
    min_len = node.get("minLength")
    max_len = MAX_SAFE if js_falsy(max_len) else max_len
    min_len = 0 if js_falsy(min_len) else min_len
    return (n >= F.lit(min_len)) & (n <= F.lit(max_len))


def _screen(
    node: Any,
    tv: Column,
    txt: Column | None,
    custom: dict[str, Any],
    stack: frozenset,
    depth: int,
) -> _Screen:
    """Compile schema ``node`` over value variant ``tv`` (SQL NULL =
    missing / JS undefined). ``txt`` is the node's original JSON text when
    it sits at a literal path from the root (needed for data-order keys),
    else None."""
    if depth > _MAX_DEPTH:
        raise ScreenNotApplicable("schema nesting beyond screen depth budget")

    node, extracted = extract_types(node)
    if extracted is not None:
        custom = extracted

    if isinstance(node, str):
        resolved = custom.get(node)
        # mirror interp: a truthy custom entry shadows even builtin names
        if not js_falsy(resolved) and resolved is not None:
            if node in stack:
                raise ScreenNotApplicable(f"recursive custom type {node!r}")
            return _screen(resolved, tv, txt, custom, stack | {node}, depth + 1)
        if node == "any":
            return _leaf(F.lit(True), exact=True)
        if node == "?":
            return _leaf(tv.isNull(), exact=True)
        if node == "null":
            return _leaf(tv.isNotNull() & F.is_variant_null(tv), exact=True)
        if node == "string":
            return _leaf(_string_cond(tv), exact=True)
        if node == "boolean":
            return _leaf(_present(tv) & (_vtype(tv) == "BOOLEAN"), exact=True)
        if node == "number":
            return _leaf(
                _present(tv) & _is_number_type(tv) & _finite(_dval(tv)), exact=True
            )
        if node == "integer":
            v = _dval(tv)
            return _leaf(
                _present(tv)
                & _is_number_type(tv)
                & _finite(v)
                & (F.floor(v) == v)
                & (F.abs(v) <= F.lit(float(MAX_SAFE))),
                exact=True,
            )
        raise ScreenNotApplicable(f"custom type {node!r}")

    if isinstance(node, list):
        return _screen_union(node, tv, txt, custom, stack, depth)

    if isinstance(node, dict):
        if "$type" in node:
            return _screen(node["$type"], tv, txt, custom, stack, depth + 1)
        if "$enum" in node:
            enums = node["$enum"]
            cond = _string_cond(tv)
            if enums:  # reference: `enums && enums.length && ...` skips []
                s = F.try_variant_get(tv, "$", "string")
                cond = cond & s.isin(list(enums))
            return _leaf(cond, exact=True)
        if "$string" in node:
            spec = node["$string"]
            s = F.try_variant_get(tv, "$", "string")
            cond = _string_cond(tv)
            from yaschva_spark.typed import js_strlen  # UTF-16 code units

            if not js_falsy(spec.get("minLength")):
                cond = cond & (js_strlen(s) >= F.lit(spec["minLength"]))
            if not js_falsy(spec.get("maxLength")):
                cond = cond & (js_strlen(s) <= F.lit(spec["maxLength"]))
            pattern = spec.get("regex")
            if not js_falsy(pattern):
                if typed_unsafe(pattern):
                    raise ScreenNotApplicable("ECMA-only regex")
                cond = cond & s.rlike(to_java_pattern(pattern))
            return _leaf(cond, exact=True)
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
            # the representability guard makes bounded checks one-way only
            return _leaf(cond, exact=lo is None and hi is None)
        if "$array" in node:
            return _screen_array(node, tv, custom, stack, depth)
        if "$map" in node:
            return _screen_map(node, tv, txt, custom, stack, depth)
        if "$and" in node:
            try:
                merged = combine_and(node, custom)
            except SchemaError:
                # the reference data-FAILS every value here (validate.ts:
                # 244-247's combine throw path) — unprovable, not wrong
                raise ScreenNotApplicable("$and members not all objects")
            return _screen(merged, tv, txt, custom, stack, depth + 1)
        if not any(k.startswith("$") for k in node):
            return _screen_object(node, tv, txt, custom, stack, depth)
        raise ScreenNotApplicable(f"unscreenable node keys {sorted(node)!r}")

    raise ScreenNotApplicable(f"unscreenable node {type(node).__name__}")


def _screen_union(
    node: list, tv: Column, txt: Column | None,
    custom: dict[str, Any], stack: frozenset, depth: int,
) -> _Screen:
    """Ordered union prefix (module docstring): the when-chain replicates
    first-passing-branch output only while every earlier branch is exact."""
    if not node:
        raise ScreenNotApplicable("empty union (schema error path)")
    chain: list[_Screen] = []
    for branch in node:
        try:
            r = _screen(branch, tv, txt, custom, stack, depth + 1)
        except ScreenNotApplicable:
            break
        chain.append(r)
        if not r.exact:
            break
    covered_all = len(chain) == len(node)
    if not chain:
        raise ScreenNotApplicable("no screenable union prefix")
    cond = chain[0].cond
    for r in chain[1:]:
        cond = cond | r.cond
    out = F.when(chain[0].cond, chain[0].out)
    for r in chain[1:]:
        out = out.when(r.cond, r.out)
    return _Screen(
        cond,
        out,
        exact=covered_all and all(r.exact for r in chain),
        null_out=all(r.null_out for r in chain),
    )


def _screen_array(
    node: dict, tv: Column, custom: dict[str, Any], stack: frozenset, depth: int
) -> _Screen:
    """validateArray (validate.ts:106-126): length bounds, then every
    element. Elements are never JS-undefined; a JSON null element arrives
    as a variant-null (probed), so leaf screens stay sound. Output is the
    flat() of element outputs — with null-output elements (enforced),
    that is exactly ``[null,...]``."""
    arr = F.try_variant_get(tv, "$", "array<variant>")
    holder: dict[str, _Screen] = {}

    def elem_cond(e: Column) -> Column:
        r = _screen(node["$array"], e, None, custom, stack, depth + 1)
        holder["r"] = r
        return r.cond

    all_ok = F.forall(arr, elem_cond)
    if not holder["r"].null_out:
        raise ScreenNotApplicable(
            "array element output is not null (needs per-element text)"
        )
    cond = (
        tv.isNotNull()
        & _vtype(tv).startswith("ARRAY")
        & _len_bounds(F.size(arr), node)
        & all_ok
    )
    out = F.concat(
        F.lit("["),
        F.array_join(F.transform(arr, lambda e: F.lit("null")), ","),
        F.lit("]"),
    )
    # element screens are elementwise ⇔, and only real JSON arrays have
    # ARRAY type — matching the reference's isArray gate exactly
    return _Screen(cond, out, exact=holder["r"].exact, null_out=False)


def _screen_map(
    node: dict, tv: Column, txt: Column | None,
    custom: dict[str, Any], stack: frozenset, depth: int,
) -> _Screen:
    """validateMap (validate.ts:161-193): member-count bounds, optional key
    regex, every value. NOT exact: the reference also accepts JS arrays
    (indices as keys); those rows screen false. Output needs data-order
    keys, hence the text column."""
    if txt is None:
        raise ScreenNotApplicable("$map not at a literal path (needs text)")
    mp = F.try_variant_get(tv, "$", "map<string,variant>")
    keys = F.map_keys(mp)  # sorted by the cast — fine for order-free checks
    holder: dict[str, _Screen] = {}

    def val_cond(v: Column) -> Column:
        r = _screen(node["$map"], v, None, custom, stack, depth + 1)
        holder["r"] = r
        return r.cond

    vals_ok = F.forall(F.map_values(mp), val_cond)
    if not holder["r"].null_out:
        raise ScreenNotApplicable(
            "map value output is not null (needs per-value text)"
        )
    cond = (
        tv.isNotNull()
        & _vtype(tv).startswith("OBJECT")
        & _len_bounds(F.size(mp), node)
        # keys must render into output text verbatim (json.dumps identity)
        & F.forall(keys, lambda k: k.rlike(_MAP_KEY_SAFE_RLIKE))
        & vals_ok
    )
    pattern = node.get("regex")
    if not js_falsy(pattern):
        if typed_unsafe(pattern):
            raise ScreenNotApplicable("ECMA-only map key regex")
        jp = to_java_pattern(pattern)
        cond = cond & F.forall(keys, lambda k: k.rlike(jp))
    body = F.array_join(
        F.transform(
            F.json_object_keys(txt),
            lambda k: F.concat(F.lit('"'), k, F.lit('":null')),
        ),
        ",",
    )
    out = F.concat(F.lit("{"), body, F.lit("}"))
    return _Screen(cond, out, exact=False, null_out=False)


def _screen_object(
    node: dict, tv: Column, txt: Column | None,
    custom: dict[str, Any], stack: frozenset, depth: int,
) -> _Screen:
    """validateObject (validate.ts:128-159): closed world. NOT exact (the
    reference also accepts JS arrays). Output is data keys in DATA order
    (text-level ``json_object_keys`` — VARIANT sorts keys) followed by
    missing declared keys in schema order, each rendered through its own
    field output via an ``element_at`` dispatch map."""
    if txt is None:
        raise ScreenNotApplicable("object not at a literal path (needs text)")
    field_keys: list[str] = []
    conds: list[Column] = []
    out_pairs: list[Column] = []
    for schema_key, sub in node.items():
        data_key = unescape_key(schema_key)
        if not _SAFE_KEY.match(data_key):
            raise ScreenNotApplicable(f"key {data_key!r} not screen-safe")
        field_keys.append(data_key)
        tv_k = F.try_variant_get(tv, f"$.{data_key}", "variant")
        txt_k = F.get_json_object(txt, f"$.{data_key}")
        r = _screen(sub, tv_k, txt_k, custom, stack, depth + 1)
        conds.append(r.cond)
        out_pairs.extend([F.lit(data_key), r.out])

    data_keys = F.array_distinct(F.json_object_keys(txt))
    if field_keys:
        declared = F.array(*[F.lit(k) for k in field_keys])
    else:
        declared = F.array().cast("array<string>")
    keyset_ok = F.size(F.array_except(data_keys, declared)) == 0
    cond = tv.isNotNull() & _vtype(tv).startswith("OBJECT") & keyset_ok
    for c in conds:
        cond = cond & c

    if field_keys:
        out_map = F.create_map(*out_pairs)
        all_keys = F.concat(data_keys, F.array_except(declared, data_keys))
        body = F.array_join(
            F.transform(
                all_keys,
                lambda k: F.concat(
                    F.lit('"'), k, F.lit('":'), F.element_at(out_map, k)
                ),
            ),
            ",",
        )
        out = F.concat(F.lit("{"), body, F.lit("}"))
    else:
        out = F.lit("{}")
    return _Screen(cond, out, exact=False, null_out=False)


def _compile(schema: Any, raw: Column) -> _Screen:
    pv = F.try_parse_json(raw)
    return _screen(schema, pv, raw, {}, frozenset(), 0)


def compile_pass_screen(schema: Any, raw: Column) -> Column:
    """Boolean Column: provably ``pass`` for the JSON text column ``raw``.
    Raises :class:`ScreenNotApplicable` outside the fragment."""
    return F.coalesce(_compile(schema, raw).cond, F.lit(False))


def pass_output_col(schema: Any, raw: Column) -> Column:
    """The interpreter's ``yv_output`` JSON for a row PROVEN passing by
    :func:`compile_pass_screen`, built JVM-side — null at every leaf, and
    in the interpreter's key order (DATA order first, then missing
    declared keys in schema order; interp._v_object)."""
    return _compile(schema, raw).out
