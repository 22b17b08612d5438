"""The typed fast path: yaschva schema -> Catalyst expressions.

``compile_schema`` turns a schema into a single ``violations`` Column
(``array<struct<path,rule,error,value>>``) evaluated entirely JVM-side under
whole-stage codegen — no Python in the hot path. One expression tree is built
once on the driver; executors evaluate it vectorized (SURVEY.md §3.1 engine
equivalent). ``schema_to_spark_type`` is the analog of the reference's
``validationToType`` emitter (/root/reference/src/type.ts:33-92), emitting a
Spark ``StructType`` with the same erasures (size/regex constraints live in
expressions, not types).

Semantics follow the reference validator node-for-node (citations inline).
One documented deviation (SURVEY.md §7.4): a plain Spark column cannot
distinguish JS ``undefined`` from ``null`` — the typed path treats SQL NULL
as *both* (NULL passes ``'?'`` and ``'null'``; a missing struct field is
undefined). Schemas whose semantics depend on that distinction, on
multi-type unions over one column, or on unbounded recursion must run on the
dynamic path (:func:`yaschva_spark.engine.validate_json_table`), which is
exact. :class:`TypedCompileError` signals "fall back".

Scale notes: everything here is expression-only — scans stay columnar,
filters and the column pruning implied by the schema push into the Parquet
reader, and the per-row work is branch-predictable CASE WHEN chains. The
violation array for a passing row is built lazily (CASE branches), so the
happy path does not pay for error materialization — unlike the reference,
which always builds the full mirrored output tree (README.md:180-195).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from yaschva_spark import errors as E
from yaschva_spark.regexdialect import to_java_pattern, typed_unsafe
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
    js_stringify,
    unescape_key,
)

VIOLATION_DDL = "array<struct<path:string,rule:string,error:string,value:string>>"

#: rendering of a JS-undefined offending value (matches
#: interp.value_to_json_text(UNDEFINED))
_UNDEF_JSON = '"__undefined__"'

_NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)
_FRACTIONAL_TYPES = (T.FloatType, T.DoubleType)


class TypedCompileError(Exception):
    """Schema not expressible on the typed path — caller should fall back to
    the dynamic (mapInPandas interpreter) path."""


def js_strlen(expr: Column) -> Column:
    """JS ``.length`` counts UTF-16 code units; Spark's ``length`` counts
    code points — add one per astral character (reference strings index in
    UTF-16, validate.ts string rules). Guarded by an ASCII fast path:
    ``octet_length == length`` proves the string has no multi-byte (hence
    no astral) characters, so the per-row regex scan runs only on strings
    that actually contain non-ASCII — for code corpora that is ~never."""
    n = F.length(expr)
    return F.when(F.octet_length(expr) == n, n).otherwise(
        n + F.regexp_count(expr, F.lit("[\\x{10000}-\\x{10FFFF}]"))
    )


def _root_col(name: str) -> Column:
    """Top-level column reference by LITERAL name: a bare ``F.col('a.b')``
    parses the dot as struct-field access — backtick-quote so a column
    literally named ``a.b`` resolves (nested levels use getField and are
    unaffected)."""
    return F.col("`" + name.replace("`", "``") + "`")


def _empty() -> Column:
    return F.expr(f"CAST(array() AS {VIOLATION_DDL})")


def _json_value(expr: Column) -> Column:
    """Render any column value as its JSON literal (strings quoted+escaped,
    numbers bare, complex types as JSON). NULL renders as ``null``."""
    wrapped = F.to_json(F.array(expr))
    return F.substring(wrapped, F.lit(2), F.length(wrapped) - F.lit(2))


def _viol(path: Column, rule: str, error: str, value: Column) -> Column:
    return F.array(
        F.struct(
            path.alias("path"),
            F.lit(rule).alias("rule"),
            F.lit(error).alias("error"),
            value.alias("value"),
        )
    )


def _concat(arrays: list[Column]) -> Column:
    if not arrays:
        return _empty()
    if len(arrays) == 1:
        return arrays[0]
    return F.concat(*arrays)


class _Compiler:
    """Recursive schema -> Column compiler, dtype-directed.

    ``expr is None`` means the value is statically *undefined* (a field the
    data's type does not carry) — composite validators then emit their
    "wrong shape" error without recursing, exactly like the reference
    validating ``undefined`` (validate.ts:130-132,163-165).
    """

    def __init__(self, custom_types: dict[str, Any], max_unroll: int = 32):
        self.env = custom_types
        self.max_unroll = max_unroll

    # -- helpers -------------------------------------------------------------
    def _value_or_undef(self, expr: Column | None) -> Column:
        return F.lit(_UNDEF_JSON) if expr is None else _json_value(expr)

    def _const(self, path: Column, rule: str, error: str, expr: Column | None) -> Column:
        return _viol(path, rule, error, self._value_or_undef(expr))

    # -- dispatch (reference order, validate.ts:223-256) -----------------------
    def compile(self, node: Any, expr: Column | None, dtype: T.DataType | None,
                path: Column, depth: int = 0) -> Column:
        if depth > self.max_unroll:
            raise TypedCompileError(
                f"custom-type recursion exceeds unroll budget ({self.max_unroll})"
            )
        node, extracted = extract_types(node)
        if extracted is not None:
            # env replacement is scoped to this subtree (validate.ts:215-219);
            # expressions are built eagerly so save/restore is sound
            saved = self.env
            self.env = extracted
            try:
                return self._dispatch(node, expr, dtype, path, depth)
            finally:
                self.env = saved
        return self._dispatch(node, expr, dtype, path, depth)

    def _dispatch(self, node: Any, expr: Column | None, dtype: T.DataType | None,
                  path: Column, depth: int) -> Column:
        if is_simple(node):
            custom = self.env.get(node)
            if custom is not None and not js_falsy(custom):
                return self.compile(custom, expr, dtype, path, depth + 1)
            return self._simple(node, expr, dtype, path)
        if is_union(node):
            return self._union(node, expr, dtype, path, depth)
        if is_array_node(node):
            return self._array(node, expr, dtype, path, depth)
        if is_enum_node(node):
            return self._enum(node, expr, dtype, path)
        if is_obj(node):
            return self._object(node, expr, dtype, path, depth)
        if is_map_node(node):
            return self._map(node, expr, dtype, path, depth)
        if is_number_node(node):
            return self._number_node(node, expr, dtype, path)
        if is_meta_node(node):
            return self.compile(node["$type"], expr, dtype, path, depth)
        if is_string_node(node):
            return self._string_node(node, expr, dtype, path)
        if is_and_node(node):
            try:
                merged = combine_and(node, self.env)
            except SchemaError:
                # data-level failure for every row (validate.ts:246-253)
                return self._const(path, "and_schema_err", E.AND_SCHEMA_ERR, None)
            return self._object(merged, expr, dtype, path, depth)
        raise SchemaError(f"Unknown validator:{js_stringify(node)}")

    # -- simple types (validate.ts:50-89,194-205) ------------------------------
    def _simple(self, stype: str, expr: Column | None, dtype, path: Column) -> Column:
        if stype == "any":
            return _empty()
        if stype == "?":
            if expr is None:
                return _empty()
            return F.when(expr.isNull(), _empty()).otherwise(
                self._const(path, "not_undefined", E.NOT_UNDEFINED, expr)
            )
        if stype == "null":
            if expr is None:
                return self._const(path, "not_null", E.NOT_NULL, None)
            return F.when(expr.isNull(), _empty()).otherwise(
                self._const(path, "not_null", E.NOT_NULL, expr)
            )
        if stype == "string":
            return self._string_checks(expr, dtype, path, {})
        if stype == "number":
            return self._number_checks(expr, dtype, path, None, None)
        if stype == "integer":
            return self._integer(expr, dtype, path)
        if stype == "boolean":
            if expr is None or not isinstance(dtype, T.BooleanType):
                return self._const(path, "not_boolean", E.NOT_BOOLEAN, expr)
            return F.when(expr.isNull(), self._const(path, "not_boolean", E.NOT_BOOLEAN, expr)) \
                .otherwise(_empty())
        raise SchemaError(f"Unknown validator:{js_stringify(stype)}")

    def _integer(self, expr: Column | None, dtype, path: Column) -> Column:
        bad = self._const(path, "not_integer", E.NOT_INTEGER, expr)
        if expr is None or not isinstance(dtype, _NUMERIC_TYPES):
            return bad
        cond = expr.isNull()
        if isinstance(dtype, _FRACTIONAL_TYPES):
            cond = cond | F.isnan(expr) | (expr != F.floor(expr))
        elif isinstance(dtype, T.DecimalType) and dtype.scale > 0:
            # a decimal with nonzero scale can hold 1.50: integrality must
            # be checked (no NaN branch — decimals cannot be NaN)
            cond = cond | (expr != F.floor(expr))
        # JS safe-integer bound applies to longs/decimals too (SURVEY §7.4)
        if not isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType)):
            cond = cond | (F.abs(expr) > F.lit(E.MAX_SAFE_INTEGER))
        return F.when(cond, bad).otherwise(_empty())

    def _number_checks(self, expr, dtype, path, vmin, vmax) -> Column:
        bad = self._const(path, "not_number", E.NOT_NUMBER, expr)
        if expr is None or not isinstance(dtype, _NUMERIC_TYPES):
            return bad
        not_num = expr.isNull()
        if isinstance(dtype, _FRACTIONAL_TYPES):
            not_num = not_num | F.isnan(expr)
        chain = F.when(not_num, bad)
        if vmin is not None:
            chain = chain.when(
                expr < F.lit(vmin), self._const(path, "num_below_min", E.NUM_BELOW_MIN, expr)
            )
        if vmax is not None:
            chain = chain.when(
                expr > F.lit(vmax), self._const(path, "num_above_max", E.NUM_ABOVE_MAX, expr)
            )
        return chain.otherwise(_empty())

    def _number_node(self, node, expr, dtype, path) -> Column:
        spec = node["$number"]
        return self._number_checks(expr, dtype, path, spec.get("min"), spec.get("max"))

    def _require_java_safe(self, pattern: str) -> None:
        """Dialect guard (SURVEY §7.4): ``rlike`` evaluates patterns under
        Java regex semantics, but the reference compiles them as ECMAScript
        ``new RegExp(p, 'u')`` (/root/reference/src/validate.ts:81).
        Most divergent constructs are TRANSLATED to exact-ECMA Java
        spellings by regexdialect.to_java_pattern ($-anchor, dot/NEL,
        class operators, ``\\u{...}``, ``\\s``, ``[]``/``[^]``); the
        untranslatable residue (long/script Unicode properties, in-class
        ``\\S``/``\\W``) must not silently compile — raising
        TypedCompileError makes validate_auto route the schema to the
        reference-faithful interpreter path instead."""
        reasons = typed_unsafe(pattern)
        if reasons:
            raise TypedCompileError(
                f"regex {pattern!r} uses ECMA-only constructs "
                f"({'; '.join(reasons)}); dynamic path required"
            )

    def _string_checks(self, expr, dtype, path, spec: dict) -> Column:
        bad = self._const(path, "not_string", E.NOT_STRING, expr)
        if expr is None or not isinstance(dtype, T.StringType):
            return bad
        chain = F.when(expr.isNull(), bad)
        min_len = spec.get("minLength")
        max_len = spec.get("maxLength")
        pattern = spec.get("regex")
        # JS falsy constraint values skip the check (validate.ts:78-82)
        if not js_falsy(min_len):
            chain = chain.when(
                js_strlen(expr) < F.lit(min_len),
                self._const(path, "str_too_short", E.STR_TOO_SHORT, expr),
            )
        if not js_falsy(max_len):
            chain = chain.when(
                js_strlen(expr) > F.lit(max_len),
                self._const(path, "str_too_long", E.STR_TOO_LONG, expr),
            )
        if not js_falsy(pattern):
            self._require_java_safe(pattern)
            # rlike is an unanchored search, same as ECMAScript .test;
            # to_java_pattern pins $-anchor / dot / class-operator semantics
            # to ECMA (regexdialect module docstring)
            chain = chain.when(
                ~expr.rlike(to_java_pattern(pattern)),
                self._const(path, "regex_mismatch", E.REGEX_MISMATCH, expr),
            )
        return chain.otherwise(_empty())

    def _string_node(self, node, expr, dtype, path) -> Column:
        return self._string_checks(expr, dtype, path, node["$string"])

    def _enum(self, node, expr, dtype, path) -> Column:
        enums = node["$enum"]
        bad_str = self._const(path, "not_string", E.NOT_STRING, expr)
        if expr is None or not isinstance(dtype, T.StringType):
            return bad_str
        chain = F.when(expr.isNull(), bad_str)
        if enums:
            chain = chain.when(
                ~expr.isin(*enums),
                self._const(path, "enum_mismatch", E.enum_mismatch(enums), expr),
            )
        return chain.otherwise(_empty())

    # -- composite types --------------------------------------------------------
    def _union(self, branches: list, expr, dtype, path, depth) -> Column:
        """validateOneOf (validate.ts:91-104): first-pass-wins is an OR of
        branch pass-bits; on total failure the union error plus every
        branch's violations, in branch order."""
        if not branches:
            raise SchemaError("Array of types can not be empty")
        compiled = [self.compile(b, expr, dtype, path, depth) for b in branches]
        any_pass = None
        for arr in compiled:
            bit = F.size(arr) == 0
            any_pass = bit if any_pass is None else (any_pass | bit)
        union_err = self._const(path, "union_mismatch", E.UNION_MISMATCH, expr)
        return F.when(any_pass, _empty()).otherwise(_concat([union_err] + compiled))

    def _array(self, node, expr, dtype, path, depth) -> Column:
        if expr is None or not isinstance(dtype, T.ArrayType):
            return self._const(path, "not_array", E.NOT_ARRAY, expr)
        min_len = node.get("minLength")
        max_len = node.get("maxLength")
        min_len = 0 if js_falsy(min_len) else min_len  # `|| 0` (validate.ts:110)
        max_len = E.MAX_SAFE_INTEGER if js_falsy(max_len) else max_len  # `|| MAX`
        elem_schema = node["$array"]
        elem_type = dtype.elementType

        elem_viols = F.flatten(
            F.transform(
                expr,
                lambda x, i: self.compile(
                    elem_schema,
                    x,
                    elem_type,
                    F.concat(path, F.lit("["), i.cast("string"), F.lit("]")),
                    depth + 1,
                ),
            )
        )
        chain = F.when(expr.isNull(), self._const(path, "not_array", E.NOT_ARRAY, expr))
        if min_len > 0 or max_len < E.MAX_SAFE_INTEGER:
            # length check precedes element recursion; offending value is the
            # length itself (validate.ts:111-115)
            chain = chain.when(
                ~F.size(expr).between(min_len, max_len),
                _viol(
                    path,
                    "arr_length",
                    E.arr_length(min_len, max_len),
                    F.size(expr).cast("string"),
                ),
            )
        return chain.otherwise(elem_viols)

    def _map(self, node, expr, dtype, path, depth) -> Column:
        if expr is None or not isinstance(dtype, T.MapType):
            return self._const(path, "not_object", E.NOT_OBJECT, expr)
        if not isinstance(dtype.keyType, T.StringType):
            raise TypedCompileError("$map requires map<string, _> column")
        min_len = node.get("minLength")
        max_len = node.get("maxLength")
        min_len = 0 if js_falsy(min_len) else min_len
        max_len = E.MAX_SAFE_INTEGER if js_falsy(max_len) else max_len
        value_schema = node["$map"]
        value_type = dtype.valueType
        pattern = node.get("regex")
        if not js_falsy(pattern):
            self._require_java_safe(pattern)

        def entry_viols(e: Column) -> Column:
            key, val = e["key"], e["value"]
            val_viols = self.compile(
                value_schema, val, value_type, F.concat(path, F.lit("."), key), depth + 1
            )
            if js_falsy(pattern):
                return val_viols
            # failing keys report the whole map and skip value validation
            # (validate.ts:179-185)
            key_viol = _viol(
                F.concat(path, F.lit("."), key),
                "regex_mismatch",
                E.REGEX_MISMATCH,
                F.to_json(expr),
            )
            return F.when(~key.rlike(to_java_pattern(pattern)), key_viol).otherwise(val_viols)

        entries = F.flatten(F.transform(F.map_entries(expr), entry_viols))
        chain = F.when(expr.isNull(), self._const(path, "not_object", E.NOT_OBJECT, expr))
        if min_len > 0 or max_len < E.MAX_SAFE_INTEGER:
            chain = chain.when(
                ~F.size(expr).between(min_len, max_len),
                _viol(path, "map_size", E.map_size(min_len, max_len), F.size(expr).cast("string")),
            )
        return chain.otherwise(entries)

    def _object(self, node: dict, expr, dtype, path, depth) -> Column:
        if expr is None or not isinstance(dtype, T.StructType):
            return self._const(path, "not_object", E.NOT_OBJECT, expr)
        children = self._object_children(node, expr, dtype, path, depth)
        return F.when(
            expr.isNull(), self._const(path, "not_object", E.NOT_OBJECT, expr)
        ).otherwise(_concat(children) if children else _empty())

    def _object_children(self, node: dict, expr, dtype: T.StructType, path, depth,
                         ignore: tuple[str, ...] = ()) -> list[Column]:
        """Closed-world record checks (validateObject, validate.ts:128-159):
        declared fields validate (missing ones against undefined); struct
        fields not declared are extra-key violations (known at compile
        time)."""
        children: list[Column] = []
        field_types = {f.name: f.dataType for f in dtype.fields}
        declared = set()
        for schema_key, sub in node.items():
            data_key = unescape_key(schema_key)
            declared.add(data_key)
            sub_path = F.concat(path, F.lit("." + data_key))
            if data_key in field_types:
                child_expr = expr[data_key] if expr is not None else _root_col(data_key)
                children.append(
                    self.compile(sub, child_expr, field_types[data_key], sub_path, depth + 1)
                )
            else:
                children.append(self.compile(sub, None, None, sub_path, depth + 1))
        for name in field_types:
            if name not in declared and name not in ignore:
                child_expr = expr[name] if expr is not None else _root_col(name)
                children.append(
                    _viol(
                        F.concat(path, F.lit("." + name)),
                        "extra_key",
                        E.EXTRA_KEY,
                        _json_value(child_expr),
                    )
                )
        return children


def compile_schema(
    schema: Any,
    df_schema: T.StructType,
    *,
    ignore_columns: tuple[str, ...] = (),
    max_unroll: int = 32,
) -> Column:
    """Compile a root object schema against a DataFrame schema into one
    ``violations`` Column. The row itself is the object under validation
    (always present, so the root never raises "not an Object").

    ``ignore_columns`` exempts engine/bookkeeping columns from the
    closed-world extra-key rule.
    """
    root, custom = extract_types(schema)
    env = custom or {}
    root = _resolve_root(root, env)
    if not is_obj(root):
        raise TypedCompileError(
            "root schema must resolve to a plain object for table validation; "
            "use compile_column for column-level schemas"
        )
    compiler = _Compiler(env, max_unroll=max_unroll)
    children = compiler._object_children(
        root, None, df_schema, F.lit("$"), 0, ignore=tuple(ignore_columns)
    )
    return _concat(children) if children else _empty()


def _resolve_root(root: Any, env: dict) -> Any:
    """Unwrap root-level $type / custom-name / $and down to an object."""
    seen = 0
    while seen < 64:
        seen += 1
        if is_simple(root) and root in env:
            root = env[root]
        elif is_meta_node(root):
            root = root["$type"]
        elif is_and_node(root):
            root = combine_and(root, env)
        else:
            return root
    raise TypedCompileError("root schema resolution did not terminate")


def compile_column(
    schema: Any, column: Column, dtype: T.DataType, *, path: str = "$", max_unroll: int = 32
) -> Column:
    """Compile any schema node against a single typed column."""
    root, custom = extract_types(schema)
    compiler = _Compiler(custom or {}, max_unroll=max_unroll)
    return compiler.compile(root, column, dtype, F.lit(path))


# --- schema -> Spark type (validationToType analog, type.ts:33-92) -----------
def schema_to_spark_type(schema: Any, max_depth: int = 16) -> T.StructType:
    """Emit the Spark ``StructType`` for a schema's typed representation.

    Same erasures as the reference emitter: length/regex/range constraints
    vanish (README.md:169), ``integer`` -> LongType, ``number`` -> DoubleType.
    Optionality (a union with ``'?'``/``'null'``) becomes nullability.
    Schemas needing a dynamic representation (multi-type unions, ``any``)
    raise :class:`TypedCompileError`.
    """
    root, custom = extract_types(schema)
    env = custom or {}
    root = _resolve_root(root, env)
    if not is_obj(root):
        raise TypedCompileError("root schema must resolve to an object")
    return _struct_for(root, env, 0, max_depth)


def _struct_for(node: dict, env: dict, depth: int, max_depth: int) -> T.StructType:
    fields = []
    for schema_key, sub in node.items():
        name = unescape_key(schema_key)
        dt, nullable = _type_for(sub, env, depth + 1, max_depth)
        fields.append(T.StructField(name, dt, nullable))
    return T.StructType(fields)


def _type_for(node: Any, env: dict, depth: int, max_depth: int) -> tuple[T.DataType, bool]:
    if depth > max_depth:
        raise TypedCompileError("recursive custom type exceeds typed-path depth")
    if is_simple(node):
        if node in env:
            return _type_for(env[node], env, depth + 1, max_depth)
        mapping: dict[str, T.DataType] = {
            "string": T.StringType(),
            "number": T.DoubleType(),
            "integer": T.LongType(),
            "boolean": T.BooleanType(),
        }
        if node in mapping:
            return mapping[node], False
        if node in ("null", "?"):
            return T.NullType(), True
        if node == "any":
            raise TypedCompileError("'any' requires the dynamic representation")
        raise SchemaError(f"Unknown validator:{js_stringify(node)}")
    if is_union(node):
        if not node:
            raise SchemaError("Array of types can not be empty")
        concrete = [b for b in node if b not in ("?", "null")]
        nullable = len(concrete) < len(node)
        if len(concrete) == 1:
            dt, _ = _type_for(concrete[0], env, depth, max_depth)
            return dt, nullable
        raise TypedCompileError("multi-type unions require the dynamic representation")
    if is_array_node(node):
        dt, elem_nullable = _type_for(node["$array"], env, depth + 1, max_depth)
        return T.ArrayType(dt, containsNull=elem_nullable), False
    if is_enum_node(node):
        return T.StringType(), False
    if is_obj(node):
        return _struct_for(node, env, depth, max_depth), False
    if is_map_node(node):
        dt, val_nullable = _type_for(node["$map"], env, depth + 1, max_depth)
        return T.MapType(T.StringType(), dt, valueContainsNull=val_nullable), False
    if is_number_node(node):
        return T.DoubleType(), False
    if is_meta_node(node):
        return _type_for(node["$type"], env, depth, max_depth)
    if is_string_node(node):
        return T.StringType(), False
    if is_and_node(node):
        merged = combine_and(node, env)
        return _struct_for(merged, env, depth, max_depth), False
    raise SchemaError(f"Unknown validator:{js_stringify(node)}")
