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
    cond = F.lit(False)
    for p in _NUMERIC_PREFIXES:
        cond = cond | t.startswith(p)
    return cond


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
