"""Dynamically-typed JSON property access over VARIANT columns.

The reference stores twin documents as ``agtype`` (binary JSON) and gets
typed access + type-test functions from AGE / plpgsql
(``src/AgeDigitalTwins/GraphInitialization.cs:185-236``).  We use Spark
4's VARIANT type: ``try_parse_json`` once per row, then
``variant_get`` / ``schema_of_variant`` for access and introspection —
all JVM expressions inside whole-stage codegen, no Python in the hot
path.

AGE's agtype comparisons are *strictly typed* (``5 = '5'`` is false), but
``variant_get(v, p, 'double')`` happily casts the string ``'5'`` to
``5.0``.  So every typed accessor here guards on the variant's actual
type: a mismatch yields NULL, which a filter drops — the same
three-valued behavior the reference gets from Postgres.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_NUMERIC_PREFIXES = ("BIGINT", "INT", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT", "DECIMAL")
# First-3-letter discriminators of schema_of_variant output — a single
# reference to the schema column, so the test stays cheap even when the
# optimizer inlines it (a 7-way startswith chain re-evaluates the whole
# variant navigation per branch when substituted into a Filter).
_NUM3 = ["BIG", "INT", "SMA", "TIN", "DOU", "FLO", "DEC"]
_PRIM3 = _NUM3 + ["STR", "BOO"]


def variant_path(path: list[str]) -> str:
    """JSON path for ``variant_get``: bracket syntax so ``$``-prefixed
    ADT keys (``$dtId``, ``$metadata``) work (reference rewrites these to
    Cypher map access, ``AdtQueryHelpers.cs:413-414``)."""
    out = "$"
    for seg in path:
        esc = seg.replace('"', '\\"')
        out += f'["{esc}"]'
    return out


def vget(vdoc: Column, path: list[str]) -> Column:
    """Raw VARIANT at ``path`` (NULL when the key is missing)."""
    return F.try_variant_get(vdoc, variant_path(path), "variant")


def type_of(vdoc: Column, path: list[str]) -> Column:
    """schema_of_variant string: STRING | BIGINT | DECIMAL(p,s) | DOUBLE
    | BOOLEAN | ARRAY<..> | OBJECT<..> | VOID; NULL when missing."""
    return F.schema_of_variant(vget(vdoc, path))


def _is_numeric_type(t: Column) -> Column:
    return F.substring(t, 1, 3).isin(_NUM3)


def num_value(vdoc: Column, path: list[str]) -> Column:
    """DOUBLE value iff the property is JSON-number-typed, else NULL
    (matches ``is_number``'s exclusion of numeric strings)."""
    v = vget(vdoc, path)
    return F.when(
        _is_numeric_type(F.schema_of_variant(v)), F.try_variant_get(v, "$", "double")
    )


def str_value(vdoc: Column, path: list[str]) -> Column:
    """STRING value iff the property is string-typed, else NULL."""
    v = vget(vdoc, path)
    return F.when(
        F.schema_of_variant(v) == "STRING", F.try_variant_get(v, "$", "string")
    )


def bool_value(vdoc: Column, path: list[str]) -> Column:
    v = vget(vdoc, path)
    return F.when(
        F.schema_of_variant(v) == "BOOLEAN", F.try_variant_get(v, "$", "boolean")
    )


def loose_str_value(vdoc: Column, path: list[str]) -> Column:
    """Any scalar rendered as a string (projection default)."""
    return F.try_variant_get(vdoc, variant_path(path), "string")


def json_value(vdoc: Column, path: list[str]) -> Column:
    """Property as compact JSON text (objects/arrays round-trip)."""
    return F.to_json(vget(vdoc, path))


def array_value(vdoc: Column, path: list[str], element_type: str) -> Column:
    return F.try_variant_get(vdoc, variant_path(path), f"array<{element_type}>")


# ----------------------------------------------------------------------
# Shared-subexpression variants: take an already-materialized variant
# column ``v`` (= vget(vdoc, path)) and its schema column ``s``
# (= schema_of_variant(v)).  The query compiler projects v/s ONCE per
# (alias, path) and reuses them — inlining these expressions instead
# makes Spark re-evaluate the variant navigation per reference, which
# measured 10-35× slower on the sf0.1 bench (see compiler._shared_*).
# ----------------------------------------------------------------------

def num_of(v: Column, s: Column) -> Column:
    return F.when(_is_numeric_type(s), F.try_variant_get(v, "$", "double"))


def str_of(v: Column, s: Column) -> Column:
    return F.when(s == "STRING", F.try_variant_get(v, "$", "string"))


def bool_of(v: Column, s: Column) -> Column:
    return F.when(s == "BOOLEAN", F.try_variant_get(v, "$", "boolean"))


def loose_str_of(v: Column) -> Column:
    return F.try_variant_get(v, "$", "string")


def json_of(v: Column) -> Column:
    return F.to_json(v)


def array_of(v: Column, element_type: str) -> Column:
    return F.try_variant_get(v, "$", f"array<{element_type}>")


def is_null_of(v: Column) -> Column:
    return v.isNull() | F.is_variant_null(v)


def is_defined_of(v: Column) -> Column:
    return v.isNotNull() & ~F.is_variant_null(v)


def is_bool_of(s: Column) -> Column:
    return s == "BOOLEAN"


def is_number_of(s: Column) -> Column:
    return F.coalesce(_is_numeric_type(s), F.lit(False))


def is_string_of(s: Column) -> Column:
    return s == "STRING"


def is_object_of(s: Column) -> Column:
    return s.startswith("OBJECT")


def is_primitive_of(s: Column) -> Column:
    return F.coalesce(F.substring(s, 1, 3).isin(_PRIM3), F.lit(False))


# ----------------------------------------------------------------------
# ADT type-test functions (SURVEY.md §2.1 Q21-Q27); semantics match the
# reference's plpgsql bodies in GraphInitialization.cs:185-236.
# ----------------------------------------------------------------------

def is_null(vdoc: Column, path: list[str]) -> Column:
    """IS_NULL: missing key or explicit JSON null (Cypher ``IS NULL``)."""
    v = vget(vdoc, path)
    return v.isNull() | F.is_variant_null(v)


def is_defined(vdoc: Column, path: list[str]) -> Column:
    """IS_DEFINED → Cypher ``IS NOT NULL``: present and not JSON null."""
    v = vget(vdoc, path)
    return v.isNotNull() & ~F.is_variant_null(v)


def is_bool(vdoc: Column, path: list[str]) -> Column:
    return type_of(vdoc, path) == "BOOLEAN"


def is_number(vdoc: Column, path: list[str]) -> Column:
    """True for JSON numbers only — numeric *strings* excluded
    (``is_number``: ``NOT (age_tostring(val) = val)``)."""
    return F.coalesce(_is_numeric_type(type_of(vdoc, path)), F.lit(False))


def is_string(vdoc: Column, path: list[str]) -> Column:
    return type_of(vdoc, path) == "STRING"


def is_object(vdoc: Column, path: list[str]) -> Column:
    return type_of(vdoc, path).startswith("OBJECT")


def is_primitive(vdoc: Column, path: list[str]) -> Column:
    """string | number | boolean (``GraphInitialization.cs:211-223``)."""
    t = type_of(vdoc, path)
    return F.coalesce(
        (t == "STRING") | (t == "BOOLEAN") | _is_numeric_type(t), F.lit(False)
    )
