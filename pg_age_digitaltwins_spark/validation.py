"""DTDL-subset write-time validation.

Re-expresses the reference's twin-vs-model validation
(``src/AgeDigitalTwins/AgeDigitalTwinsClient.DigitalTwins.cs:245-460``,
which delegates schema checks to Microsoft's DTDLParser) as a
self-contained Python subset:

* the twin's ``$metadata.$model`` must name a known model;
* every non-``$`` property must be declared in the model's contents
  (inherited contents from ``extends`` bases included);
* ``Property`` values are checked against the declared schema
  (primitives, Enum, Object, Array, Map);
* ``Component`` values must be objects and are validated against the
  component interface's contents, one level deep, mirroring the
  reference (``DigitalTwins.cs:330-400``).

Violations aggregate into one ``ValidationError`` joined with
``" AND "`` — same contract as ``ValidationFailedException``.
"""

from __future__ import annotations

from typing import Any

from pg_age_digitaltwins_spark.functions.model_closure import extract_extends

RESERVED_TWIN_KEYS = {"$metadata", "$dtId", "$etag", "$lastUpdateTime"}

_PRIMITIVES = {
    "boolean": lambda v: isinstance(v, bool),
    "string": lambda v: isinstance(v, str),
    "double": lambda v: isinstance(v, (int, float)) and not isinstance(v, bool),
    "float": lambda v: isinstance(v, (int, float)) and not isinstance(v, bool),
    "integer": lambda v: isinstance(v, int) and not isinstance(v, bool),
    "long": lambda v: isinstance(v, int) and not isinstance(v, bool),
    "date": lambda v: isinstance(v, str),
    "dateTime": lambda v: isinstance(v, str),
    "time": lambda v: isinstance(v, str),
    "duration": lambda v: isinstance(v, str),
}


class ValidationError(ValueError):
    pass


class ModelNotFoundError(KeyError):
    pass


# DTDL v2/v3 built-in geospatial schemas (GeoJSON-backed): schema name
# → required GeoJSON ``type`` value.
GEOSPATIAL_SCHEMAS: dict[str, str] = {
    "point": "Point",
    "multiPoint": "MultiPoint",
    "lineString": "LineString",
    "multiLineString": "MultiLineString",
    "polygon": "Polygon",
    "multiPolygon": "MultiPolygon",
}

def _geojson_coords_ok(geom_type: str, coords) -> bool:
    """RFC 7946 §3.1 coordinate-structure check for the DTDL geospatial
    schemas.  A position is an array of ≥2 numbers (lon, lat[, alt];
    the RFC allows further elements, so no upper cap); LineStrings need
    ≥2 positions; Polygon linear rings need ≥4 positions (closed
    ring)."""

    def position(c) -> bool:
        return (
            isinstance(c, list)
            and len(c) >= 2
            and all(
                isinstance(x, (int, float)) and not isinstance(x, bool)
                for x in c
            )
        )

    def positions(c, at_least: int = 1) -> bool:
        return (
            isinstance(c, list)
            and len(c) >= at_least
            and all(position(p) for p in c)
        )

    def ring(c) -> bool:
        return positions(c, at_least=4)

    def polygon(c) -> bool:
        return isinstance(c, list) and len(c) >= 1 and all(ring(r) for r in c)

    if geom_type == "Point":
        return position(coords)
    if geom_type == "MultiPoint":
        return positions(coords, at_least=0)
    if geom_type == "LineString":
        return positions(coords, at_least=2)
    if geom_type == "MultiLineString":
        return isinstance(coords, list) and all(
            positions(ls, at_least=2) for ls in coords
        )
    if geom_type == "Polygon":
        return polygon(coords)
    if geom_type == "MultiPolygon":
        return isinstance(coords, list) and all(polygon(p) for p in coords)
    return True


# Azure Digital Twins entity-id grammar (public API limit): 1-128 ASCII
# letters/digits plus - . + % _ # * ? ! ( ) , : = @ $ ' — the reference
# inherits it from the service contract; ids flow into Cypher literals,
# so enforcing it at the door is also the injection guard's ally.
import re as _re_ids

_ENTITY_ID_RE = _re_ids.compile(r"^[A-Za-z0-9\-.+%_#*?!(),:=@$']{1,128}$")


def validate_entity_id(entity_id: Any, kind: str = "twin") -> None:
    """Syntax check for ``$dtId`` / ``$relationshipId`` values."""
    if not isinstance(entity_id, str) or not _ENTITY_ID_RE.match(entity_id):
        raise ValidationError(
            f"Invalid {kind} id {entity_id!r}: ids are 1-128 ASCII letters, "
            "digits, or - . + % _ # * ? ! ( ) , : = @ $ '"
        )


def _types_of(item: dict[str, Any]) -> list[str]:
    t = item.get("@type")
    return [t] if isinstance(t, str) else list(t or [])


class ModelRegistry:
    """Driver-side index of DTDL documents by DTMI — the analogue of the
    reference's model cache + DTDL resolver
    (``AgeDigitalTwinsClient.cs:21-27``, ``ParserDtmiResolverAsync.cs``).
    The model set is a tiny dimension; keeping it on the driver is the
    100 TB-safe choice (twins never funnel through here)."""

    def __init__(self, docs: list[dict[str, Any]]):
        self.by_id = {d["@id"]: d for d in docs}

    def contents(self, model_id: str) -> dict[str, dict[str, Any]]:
        """name → content item, including inherited contents (nearest
        definition wins, depth-first through ``extends``)."""
        if model_id not in self.by_id:
            raise ModelNotFoundError(model_id)
        out: dict[str, dict[str, Any]] = {}
        seen: set[str] = set()

        def visit(mid: str) -> None:
            if mid in seen or mid not in self.by_id:
                return
            seen.add(mid)
            doc = self.by_id[mid]
            for item in doc.get("contents", []) or []:
                name = item.get("name")
                if isinstance(name, str) and name not in out:
                    out[name] = item
            for parent in extract_extends(doc):
                visit(parent)

        visit(model_id)
        return out

    def named_schemas(self, model_id: str) -> dict[str, dict[str, Any]]:
        """DTMI → schema definition from the interface-level ``schemas``
        section, including inherited definitions (DTDL v3 §Interface:
        named schemas are reusable within the defining interface and
        its extenders; nearest definition wins)."""
        out: dict[str, dict[str, Any]] = {}
        seen: set[str] = set()

        def visit(mid: str) -> None:
            if mid in seen or mid not in self.by_id:
                return
            seen.add(mid)
            doc = self.by_id[mid]
            for sch in doc.get("schemas", []) or []:
                sid = sch.get("@id")
                if isinstance(sid, str) and sid not in out:
                    out[sid] = sch
            for parent in extract_extends(doc):
                visit(parent)

        visit(model_id)
        return out


def validate_value(
    schema: Any,
    value: Any,
    where: str,
    named: dict[str, dict[str, Any]] | None = None,
) -> list[str]:
    """Check one property value against a DTDL schema node.  ``named``
    resolves ``dtmi:`` schema references to the interface's named
    schema definitions (``schemas`` section)."""
    if schema is None:
        return []
    if isinstance(schema, str):
        if named and schema in named:
            return validate_value(named[schema], value, where, named)
        if schema in GEOSPATIAL_SCHEMAS:
            # GeoJSON-backed geospatial value: object with the matching
            # ``type`` and a ``coordinates`` array (DTDL v2/v3 built-in
            # geospatial schemas).
            if value is None:
                return []
            want = GEOSPATIAL_SCHEMAS[schema]
            if (
                not isinstance(value, dict)
                or value.get("type") != want
                or not isinstance(value.get("coordinates"), list)
            ):
                return [
                    f"{where}: value does not match geospatial schema "
                    f"'{schema}' (GeoJSON {want})"
                ]
            if not _geojson_coords_ok(want, value["coordinates"]):
                return [
                    f"{where}: coordinates do not match GeoJSON {want} "
                    "structure (RFC 7946 §3.1)"
                ]
            return []
        check = _PRIMITIVES.get(schema)
        if check is None:
            return []  # unknown/extension primitive: accept (lenient subset)
        if value is None or check(value):
            return []
        return [f"{where}: value does not match schema '{schema}'"]
    if not isinstance(schema, dict):
        return []
    kinds = _types_of(schema)
    if "Enum" in kinds:
        allowed = [
            ev.get("enumValue") for ev in schema.get("enumValues", []) or []
        ]
        if value in allowed or value is None:
            return []
        return [f"{where}: value {value!r} not in enum {allowed!r}"]
    if "Object" in kinds:
        if not isinstance(value, dict):
            return [f"{where}: expected object"]
        out: list[str] = []
        fields = {f.get("name"): f for f in schema.get("fields", []) or []}
        for k, v in value.items():
            f = fields.get(k)
            if f is not None:
                out.extend(validate_value(f.get("schema"), v, f"{where}.{k}", named))
        return out
    if "Array" in kinds:
        if not isinstance(value, list):
            return [f"{where}: expected array"]
        out = []
        for i, v in enumerate(value):
            out.extend(
                validate_value(schema.get("elementSchema"), v, f"{where}[{i}]", named)
            )
        return out
    if "Map" in kinds:
        if not isinstance(value, dict):
            return [f"{where}: expected map"]
        out = []
        mv = schema.get("mapValue") or {}
        for k, v in value.items():
            out.extend(validate_value(mv.get("schema"), v, f"{where}[{k}]", named))
        return out
    return []


def validate_twin(registry: ModelRegistry, doc: dict[str, Any]) -> str:
    """Validate a twin document; returns the model id.  Raises
    ``ValidationError`` (aggregated) / ``ModelNotFoundError``."""
    meta = doc.get("$metadata")
    if not isinstance(meta, dict) or not meta.get("$model"):
        raise ValidationError("Digital Twin must have a $metadata.$model property")
    model_id = meta["$model"]
    try:
        contents = registry.contents(model_id)
    except ModelNotFoundError:
        # Twin validation resolves the model like the reference's
        # DTDLParser pass: an unresolvable model is a 400-family
        # ResolutionException (AzureDigitalTwinsSdkIntegrationTests
        # ...ModelNotFound_ReturnsBadRequest), not the 404 that
        # GET /models/{id} raises.
        raise ValidationError(
            f"Model {model_id} could not be resolved"
        ) from None
    named = registry.named_schemas(model_id)
    violations: list[str] = []
    for prop, value in doc.items():
        if prop in RESERVED_TWIN_KEYS:
            continue
        item = contents.get(prop)
        if item is None:
            violations.append(f"Property '{prop}' is not defined in the model")
            continue
        kinds = _types_of(item)
        if "Component" in kinds:
            violations.extend(_validate_component(registry, prop, item, value))
        elif "Property" in kinds:
            violations.extend(
                validate_value(item.get("schema"), value, f"Property '{prop}'", named)
            )
        else:
            violations.append(f"Property '{prop}' is a {kinds} and is not supported")
    if violations:
        raise ValidationError(" AND ".join(violations))
    return model_id


def _validate_component(
    registry: ModelRegistry, name: str, item: dict[str, Any], value: Any
) -> list[str]:
    if not isinstance(value, dict):
        return [f"Component '{name}' must be a JSON object"]
    schema_id = item.get("schema")
    if not isinstance(schema_id, str) or schema_id not in registry.by_id:
        return [f"Component '{name}' does not have a valid interface schema"]
    comp_contents = registry.contents(schema_id)
    comp_named = registry.named_schemas(schema_id)
    out: list[str] = []
    for k, v in value.items():
        if k == "$metadata":
            continue
        sub = comp_contents.get(k)
        if sub is None:
            out.append(
                f"Component '{name}' property '{k}' is not defined in the component schema"
            )
        elif "Property" in _types_of(sub):
            out.extend(
                validate_value(
                    sub.get("schema"), v, f"Component '{name}' property '{k}'", comp_named
                )
            )
    return out


# ----------------------------------------------------------------------
# model-document (DTDL interface) validation — the long tail the
# reference delegates to Microsoft's DTDLParser
# (``AgeDigitalTwinsClient.cs:68-81``), re-expressed as a public-DTDL-v3
# subset: DTMI grammar, @context versions, contents kinds, schema
# presence, and the quantitativeTypes semantic-type extension
# (``SampleData.cs`` Room/TemperatureSensor models use it).
# ----------------------------------------------------------------------

import re as _re

_DTMI_RE = _re.compile(
    r"^dtmi:[A-Za-z](?:[A-Za-z0-9_]*[A-Za-z0-9])?"
    r"(?::[A-Za-z](?:[A-Za-z0-9_]*[A-Za-z0-9])?)*;[1-9][0-9]*$"
)
_NAME_RE = _re.compile(r"^[A-Za-z](?:[A-Za-z0-9_]*[A-Za-z0-9])?$")
# Batch 17: BCP 47 well-formedness for localization-map keys (JSON-LD
# language maps) — language subtag + optional alphanumeric subtags.
# r13 ADVICE fix: the primary subtag is {1,8} letters, not {2,8} — BCP 47
# grants single-letter primaries to private-use (`x-foo`) and
# grandfathered (`i-klingon`) tags, which are well-formed `langtag`s a
# conforming parser accepts; a bare single letter other than x/i never
# occurs in practice but remains well-formed per the ABNF's
# `4*8ALPHA` / singleton forms, so we keep the permissive {1,8} and only
# require at least one subtag after a lone singleton.
_LOCALE_RE = _re.compile(
    r"^(?:[A-Za-z]{2,8}|[A-Za-z](?:-[A-Za-z0-9]{1,8})+)"
    r"(?:-[A-Za-z0-9]{1,8})*$"
)


def _name_ok(nm: Any, v2_limits: bool) -> bool:
    """DTDL element-name validity incl. the version-aware LENGTH cap:
    64 characters under a v2 context, 512 under v3/v4 (the public DTDL
    v3 limits table raised the name cap; the old unconditional 64
    over-rejected valid v3 names — batch 17 fix)."""
    return (
        isinstance(nm, str)
        and bool(_NAME_RE.match(nm))
        and len(nm) <= (64 if v2_limits else 512)
    )
_DTDL_CONTEXTS = {"dtmi:dtdl:context;2", "dtmi:dtdl:context;3", "dtmi:dtdl:context;4"}
_QT_CONTEXT_PREFIX = "dtmi:dtdl:extension:quantitativeTypes;"
_ANNOTATION_PREFIX = "dtmi:dtdl:extension:annotation;"
_HISTORIZATION_PREFIX = "dtmi:dtdl:extension:historization;"
_OVERRIDING_PREFIX = "dtmi:dtdl:extension:overriding;"
# Feature-extension version ↔ DTDL language version co-occurrence
# (public DTDL extension registry: each extension's v1 targets DTDL v3,
# v2 targets DTDL v4).
_EXT_VERSION_GATE: dict[str, dict[str, str]] = {
    _QT_CONTEXT_PREFIX: {"1": "dtmi:dtdl:context;3", "2": "dtmi:dtdl:context;4"},
    _ANNOTATION_PREFIX: {"1": "dtmi:dtdl:context;3", "2": "dtmi:dtdl:context;4"},
    _HISTORIZATION_PREFIX: {"1": "dtmi:dtdl:context;3", "2": "dtmi:dtdl:context;4"},
    _OVERRIDING_PREFIX: {"1": "dtmi:dtdl:context;3", "2": "dtmi:dtdl:context;4"},
}
# Limit extensions (batch 16): dtmi:dtdl:limits:* contexts RAISE the
# language's numeric limits (they add no terms).  Public registry:
# the ONVIF limit extension targets DTDL v3, the AIO (Azure IoT
# Operations) limit extension targets DTDL v4.
_LIMIT_EXT_GATE: dict[str, str] = {
    "dtmi:dtdl:limits:onvif;1": "dtmi:dtdl:context;3",
    "dtmi:dtdl:limits:aio;1": "dtmi:dtdl:context;4",
}
# Adjunct types contributed by feature extensions (and the context
# prefix each requires).  These are NOT semantic types: they carry
# their own placement/required-property rules below.
_ADJUNCT_TYPES: dict[str, tuple[str, str]] = {
    "ValueAnnotation": (_ANNOTATION_PREFIX, "annotation"),
    "Historized": (_HISTORIZATION_PREFIX, "historization"),
    "Override": (_OVERRIDING_PREFIX, "overriding"),
}
_CONTENT_KINDS = {"Property", "Relationship", "Telemetry", "Command", "Component"}
_NUMERIC_SCHEMAS = {"double", "float", "integer", "long"}

# Public DTDL quantitativeTypes v1 — practical subset of semantic types
# and their unit vocabularies.  Unknown semantic types are accepted
# leniently; unknown units for KNOWN types are rejected (DTDLParser
# behavior).
SEMANTIC_UNITS: dict[str, set[str]] = {
    "Temperature": {"kelvin", "degreeCelsius", "degreeFahrenheit"},
    "RelativeHumidity": {"percent", "unity"},
    "Humidity": {"kilogramPerCubicMetre", "gramPerCubicMetre"},
    "Distance": {"metre", "centimetre", "millimetre", "micrometre", "nanometre",
                 "kilometre", "mile", "nauticalMile", "foot", "inch", "astronomicalUnit"},
    "Length": {"metre", "centimetre", "millimetre", "micrometre", "nanometre",
               "kilometre", "mile", "nauticalMile", "foot", "inch", "astronomicalUnit"},
    "Pressure": {"pascal", "kilopascal", "bar", "millibar", "millimetresOfMercury",
                 "poundPerSquareInch", "inchesOfMercury", "inchesOfWater"},
    "Velocity": {"metrePerSecond", "centimetrePerSecond", "kilometrePerSecond",
                 "metrePerHour", "kilometrePerHour", "milePerHour", "milePerSecond", "knot"},
    "Acceleration": {"metrePerSecondSquared", "centimetrePerSecondSquared", "gForce"},
    "Angle": {"radian", "degreeOfArc", "minuteOfArc", "secondOfArc", "turn"},
    "Mass": {"kilogram", "gram", "milligram", "microgram", "tonne", "slug"},
    "Power": {"watt", "microwatt", "milliwatt", "kilowatt", "megawatt", "gigawatt",
              "horsepower", "kilowattHour", "kilowattHourPerYear"},
    "Energy": {"joule", "kilojoule", "megajoule", "gigajoule", "electronvolt",
               "megaelectronvolt", "kilowattHour"},
    "Voltage": {"volt", "millivolt", "microvolt", "kilovolt", "megavolt"},
    "Current": {"ampere", "microampere", "milliampere"},
    "Frequency": {"hertz", "kilohertz", "megahertz", "gigahertz"},
    "Illuminance": {"lux", "footcandle"},
    "Luminosity": {"candelaPerSquareMetre"},
    "DataRate": {"bitPerSecond", "kibibitPerSecond", "mebibitPerSecond",
                 "gibibitPerSecond", "tebibitPerSecond", "exbibitPerSecond",
                 "zebibitPerSecond", "yobibitPerSecond", "bytePerSecond",
                 "kibibytePerSecond", "mebibytePerSecond", "gibibytePerSecond",
                 "tebibytePerSecond", "exbibytePerSecond", "zebibytePerSecond",
                 "yobibytePerSecond"},
    "DataSize": {"bit", "kibibit", "mebibit", "gibibit", "tebibit", "exbibit",
                 "zebibit", "yobibit", "byte", "kibibyte", "mebibyte", "gibibyte",
                 "tebibyte", "exbibyte", "zebibyte", "yobibyte"},
    "TimeSpan": {"second", "millisecond", "microsecond", "nanosecond", "minute",
                 "hour", "day", "year"},
    "Latitude": {"degreeOfArc", "minuteOfArc", "secondOfArc", "radian", "turn"},
    "Longitude": {"degreeOfArc", "minuteOfArc", "secondOfArc", "radian", "turn"},
    # r9 (batch 10): the remainder of the public QuantitativeTypes v1
    # vocabulary (Azure/opendigitaltwins-dtdl extension spec), so known
    # semantic types reject wrong units instead of passing leniently
    "AngularAcceleration": {"radianPerSecondSquared"},
    "AngularVelocity": {"radianPerSecond", "degreePerSecond",
                        "revolutionPerSecond", "revolutionPerMinute"},
    "Area": {"squareMetre", "squareCentimetre", "squareMillimetre",
             "squareKilometre", "hectare", "squareFoot", "squareInch", "acre"},
    "Capacitance": {"farad", "millifarad", "microfarad", "nanofarad",
                    "picofarad"},
    "Density": {"kilogramPerCubicMetre", "gramPerCubicMetre"},
    "ElectricCharge": {"coulomb"},
    "Force": {"newton", "pound", "ounce", "ton"},
    "Inductance": {"henry", "millihenry", "microhenry"},
    "Luminance": {"candelaPerSquareMetre"},
    "LuminousFlux": {"lumen"},
    "LuminousIntensity": {"candela"},
    "MagneticFlux": {"maxwell", "weber"},
    "MagneticInduction": {"tesla"},
    "MassFlowRate": {"gramPerSecond", "kilogramPerSecond", "gramPerHour",
                     "kilogramPerHour"},
    "Resistance": {"ohm", "milliohm", "kiloohm", "megaohm"},
    "SoundPressure": {"decibel", "bel"},
    "Thrust": {"newton", "pound", "ounce", "ton"},
    "Torque": {"newtonMetre"},
    "Volume": {"cubicMetre", "cubicCentimetre", "litre", "millilitre",
               "cubicFoot", "cubicInch", "fluidOunce", "gallon"},
    "VolumeFlowRate": {"litrePerSecond", "millilitrePerSecond",
                       "litrePerHour", "millilitrePerHour"},
}


_COMPLEX_SCHEMA_KINDS = {"Enum", "Object", "Array", "Map"}
_ALL_PRIMITIVE_NAMES = {
    "boolean", "date", "dateTime", "double", "duration", "float", "integer",
    "long", "string", "time",
}

# DTDL v4 adds these primitive schemas (DTDL.v4 spec §Primitive schema);
# under a v2/v3 context they are unknown atoms and must be rejected —
# DTDLParser is version-strict here
_V4_PRIMITIVE_NAMES = {
    "byte", "bytes", "decimal", "short", "unsignedByte", "unsignedInteger",
    "unsignedLong", "unsignedShort", "uuid",
}


def _validate_schema_node(
    schema: Any,
    named_ids: set[str],
    where: str,
    v: list[str],
    depth: int = 0,
    max_depth: int = 8,
    primitives: set | None = None,
    forbid_array: bool = False,
    v2_limits: bool = False,
) -> None:
    """Structural check of a DTDL schema node: primitives, complex
    schemas (Enum/Object/Array/Map, recursively), and ``dtmi:`` refs to
    named schema definitions — the DTDLParser behaviors for the
    ``schemas`` section (DTDL v3 §Interface.schemas).

    ``max_depth`` is the DTDL complex-schema nesting limit (5 levels
    under a v2 context, 8 under v3/v4): exceeding it is a validation
    ERROR, not a silent stop — DTDLParser rejects over-deep models and
    truncating the check here would accept schemas the reference
    refuses.  ``primitives`` is the version-matched primitive-atom set
    (v4 adds byte/decimal/uuid/unsigned* — unknown under v2/v3);
    ``forbid_array`` enforces the DTDL v2 rule that Command payload
    schemas may not be or contain Array at any nesting level."""
    if primitives is None:
        primitives = _ALL_PRIMITIVE_NAMES
    if schema is None:
        return
    if isinstance(schema, str):
        if schema.startswith("dtmi:"):
            if schema not in named_ids:
                v.append(f"{where}: schema reference {schema!r} cannot be resolved")
        elif (
            schema not in primitives
            and schema not in GEOSPATIAL_SCHEMAS
        ):
            # DTDLParser rejects unknown schema atoms — a typo like
            # 'strng' or 'poin' must not silently parse.
            v.append(
                f"{where}: schema {schema!r} is not a DTDL primitive, "
                "geospatial schema, or resolvable schema reference"
            )
        return
    if not isinstance(schema, dict):
        v.append(f"{where}: schema must be a string or object")
        return
    kinds = [k for k in _types_of(schema) if k in _COMPLEX_SCHEMA_KINDS]
    if not kinds:
        v.append(f"{where}: schema object @type must be one of Enum/Object/Array/Map")
        return
    if depth >= max_depth:
        v.append(
            f"{where}: complex schema nesting exceeds the DTDL limit of "
            f"{max_depth} levels"
        )
        return
    kind = kinds[0]
    if kind == "Enum":
        vs = schema.get("valueSchema")
        if vs not in ("integer", "string"):
            v.append(f"{where}: Enum valueSchema must be 'integer' or 'string'")
        evs = schema.get("enumValues")
        if not isinstance(evs, list) or not evs:
            v.append(f"{where}: Enum requires non-empty enumValues")
        else:
            seen_ev_names: set[str] = set()
            seen_ev_values: set[Any] = set()
            for ev in evs:
                nm = (ev or {}).get("name") if isinstance(ev, dict) else None
                if not _name_ok(nm, v2_limits):
                    v.append(f"{where}: enumValue name {nm!r} is not a valid identifier")
                    continue
                if nm in seen_ev_names:
                    # DTDLParser: enumValue names unique within the Enum
                    v.append(f"{where}: duplicate enumValue name '{nm}'")
                seen_ev_names.add(nm)
                if "enumValue" not in ev:
                    v.append(f"{where}: enumValue '{nm}' requires an enumValue")
                    continue
                val = ev["enumValue"]
                # enumValue type must match valueSchema (DTDLParser
                # rejects a string value under an integer Enum and
                # vice versa)
                if vs == "integer" and (
                    not isinstance(val, int) or isinstance(val, bool)
                ):
                    v.append(
                        f"{where}: enumValue '{nm}' must be an integer "
                        "(valueSchema 'integer')"
                    )
                elif vs == "string" and not isinstance(val, str):
                    v.append(
                        f"{where}: enumValue '{nm}' must be a string "
                        "(valueSchema 'string')"
                    )
                elif val in seen_ev_values:
                    # enumValues unique within the Enum
                    v.append(f"{where}: duplicate enumValue {val!r}")
                if isinstance(val, (str, int)):
                    seen_ev_values.add(val)
    elif kind == "Object":
        fields = schema.get("fields")
        if not isinstance(fields, list) or not fields:
            v.append(f"{where}: Object requires non-empty fields")
        else:
            if v2_limits and len(fields) > 30:
                # DTDL v2 spec: an Object may have at most 30 fields
                # (the cap was raised in v3)
                v.append(
                    f"{where}: Object lists {len(fields)} fields; DTDL v2 "
                    "allows at most 30"
                )
            seen_fields: set[str] = set()
            for f in fields:
                nm = (f or {}).get("name") if isinstance(f, dict) else None
                if not _name_ok(nm, v2_limits):
                    v.append(f"{where}: field name {nm!r} is not a valid identifier")
                else:
                    if nm in seen_fields:
                        # DTDLParser: field names unique within an Object
                        v.append(f"{where}: duplicate field name '{nm}'")
                    seen_fields.add(nm)
                    _validate_schema_node(
                        f.get("schema"), named_ids, f"{where}.{nm}", v,
                        depth + 1, max_depth, primitives, forbid_array,
                        v2_limits,
                    )
    elif kind == "Array":
        if forbid_array:
            # DTDL v2: Property and Command-payload schemas may not be
            # or contain Array at any nesting level (lifted in v3)
            v.append(
                f"{where}: Array is not allowed in Property or Command "
                "payload schemas under DTDL v2"
            )
        if schema.get("elementSchema") is None:
            # DTDLParser: Array requires elementSchema — silence here
            # would accept arrays no writer could ever validate against
            v.append(f"{where}: Array requires an elementSchema")
        elif (
            isinstance(schema.get("elementSchema"), str)
            and schema["elementSchema"] in GEOSPATIAL_SCHEMAS
        ):
            # DTDL geospatial extension restriction: the GeoJSON-backed
            # schemas may not be used as an Array element
            v.append(
                f"{where}: geospatial schema "
                f"{schema['elementSchema']!r} cannot be an Array element"
            )
        else:
            _validate_schema_node(
                schema.get("elementSchema"), named_ids, f"{where}[]", v,
                depth + 1, max_depth, primitives, forbid_array, v2_limits,
            )
    elif kind == "Map":
        mk, mv = schema.get("mapKey"), schema.get("mapValue")
        if not isinstance(mk, dict) or mk.get("schema") != "string":
            v.append(f"{where}: Map requires a mapKey with schema 'string'")
        elif not _name_ok(mk.get("name"), v2_limits):
            # DTDL spec: mapKey is a named element — DTDLParser rejects
            # a Map whose key carries no (or an invalid) name
            v.append(
                f"{where}: mapKey name {mk.get('name')!r} is not a "
                "valid identifier"
            )
        if not isinstance(mv, dict) or mv.get("schema") is None:
            v.append(f"{where}: Map requires a mapValue with a schema")
        else:
            if not _name_ok(mv.get("name"), v2_limits):
                v.append(
                    f"{where}: mapValue name {mv.get('name')!r} is not "
                    "a valid identifier"
                )
            _validate_schema_node(
                mv.get("schema"), named_ids, f"{where}{{}}", v,
                depth + 1, max_depth, primitives, forbid_array, v2_limits,
            )


def _check_display_strings(node: dict[str, Any], where: str, v: list[str]) -> None:
    """DTDL ``displayName``/``description``: a string or a localization
    map of locale → string, with spec length caps of 64 and 512
    characters per localized value respectively (DTDLParser enforces
    both the shape and the caps).  Batch 17: localization keys are
    JSON-LD language-map keys — BCP 47 language tags — and DTDLParser
    rejects a malformed tag (e.g. ``"not a locale!"``); we enforce
    well-formedness (language subtag + optional alphanumeric subtags),
    not registry membership, matching the parser's behavior."""
    for key, limit in (("displayName", 64), ("description", 512)):
        val = node.get(key)
        if val is None:
            continue
        if isinstance(val, str):
            vals = [val]
        elif isinstance(val, dict):
            vals = []
            for loc, s in val.items():
                if not isinstance(loc, str) or not loc:
                    v.append(f"{where}: {key} localization keys must be locale strings")
                    continue
                if not _LOCALE_RE.match(loc):
                    v.append(
                        f"{where}: {key} localization key {loc!r} is not "
                        "a well-formed BCP 47 language tag"
                    )
                    continue
                vals.append(s)
        else:
            v.append(f"{where}: {key} must be a string or a localization map")
            continue
        for s in vals:
            if not isinstance(s, str):
                v.append(f"{where}: {key} localized values must be strings")
            elif len(s) > limit:
                v.append(f"{where}: {key} exceeds the {limit}-character DTDL limit")
    # ``comment`` is a plain (non-localizable) string capped at 512
    # characters in every DTDL version (DTDLParser rejects both a
    # non-string and an over-long comment)
    comment = node.get("comment")
    if comment is not None:
        if not isinstance(comment, str):
            v.append(f"{where}: comment must be a string")
        elif len(comment) > 512:
            v.append(f"{where}: comment exceeds the 512-character DTDL limit")


def validate_model(
    doc: dict[str, Any],
    known_ids: set[str] | None = None,
    known_schema_ids: set[str] | None = None,
) -> None:
    """Structural DTDL interface validation (parser-parity subset).
    ``known_ids`` = ids resolvable for ``extends``/Component schemas
    (existing models + the rest of the batch); pass ``None`` to skip
    reference resolution.  ``known_schema_ids`` = named schema DTMIs
    resolvable from OTHER interfaces in the set (this doc's own
    ``schemas`` section is always in scope)."""
    v: list[str] = []
    mid = doc.get("@id")
    if not isinstance(mid, str) or not _DTMI_RE.match(mid):
        v.append(f"@id {mid!r} is not a valid DTMI")
    elif len(mid) > 128:
        # DTDL spec: Interface identifiers are capped at 128 characters
        # (other identifiers may run to 2048)
        v.append("@id exceeds the 128-character Interface DTMI limit")
    if "Interface" not in _types_of(doc):
        v.append("@type must include 'Interface'")
    else:
        # batch 15: an Interface may not be co-typed with a content
        # kind (an element can't be both an Interface and a Property)
        bad_co = [k for k in _types_of(doc) if k in _CONTENT_KINDS]
        if bad_co:
            v.append(
                f"@type co-types Interface with content kinds {bad_co}"
            )
    ctx = doc.get("@context")
    ctxs = [ctx] if isinstance(ctx, str) else list(ctx or [])
    if not any(c in _DTDL_CONTEXTS for c in ctxs):
        v.append("@context must include a dtmi:dtdl:context;2..4 version")
    # --- @context co-occurrence rules (DTDL spec / DTDLParser) --------
    dtdl_versions = [c for c in ctxs if c in _DTDL_CONTEXTS]
    if len(dtdl_versions) > 1:
        # exactly one DTDL language version may govern a model
        v.append(
            f"@context lists multiple DTDL versions {dtdl_versions}; exactly one is allowed"
        )
    if isinstance(ctx, list) and ctxs and dtdl_versions and ctxs[0] not in _DTDL_CONTEXTS:
        # v3 spec: in array form the DTDL context specifier must come
        # first, extension contexts after it
        v.append("@context array must list the dtmi:dtdl:context version first")
    has_qt = any(isinstance(c, str) and c.startswith(_QT_CONTEXT_PREFIX) for c in ctxs)
    is_v2 = "dtmi:dtdl:context;2" in ctxs and not any(
        c in ("dtmi:dtdl:context;3", "dtmi:dtdl:context;4") for c in ctxs
    )
    ext_ctxs = [
        c for c in ctxs
        if isinstance(c, str) and c.startswith("dtmi:dtdl:extension:")
    ]
    if is_v2 and ext_ctxs:
        # language extensions arrived in v3; a v2 context cannot carry
        # extension contexts (DTDLParser: UndefinedTerm under v2)
        v.append(
            f"@context extensions {ext_ctxs} require dtmi:dtdl:context;3 or later"
        )
    for c in ext_ctxs:
        for prefix, gate in _EXT_VERSION_GATE.items():
            if not c.startswith(prefix):
                continue
            # extension version ↔ DTDL version co-occurrence: each
            # extension's ;1 pairs with DTDL v3, ;2 with DTDL v4
            ext_ver = c[len(prefix):]
            wanted = gate.get(ext_ver)
            ext_name = prefix[len("dtmi:dtdl:extension:"):-1]
            if wanted is None:
                v.append(f"unknown {ext_name} extension version in {c!r}")
            elif dtdl_versions and dtdl_versions[0] != wanted:
                v.append(
                    f"{c} may only be used with {wanted} "
                    f"(found {dtdl_versions[0]})"
                )
    # --- limit extensions (batch 16) ----------------------------------
    # dtmi:dtdl:limits:* contexts raise numeric limits; they pair with
    # exactly one DTDL version (onvif;1 → v3, aio;1 → v4), arrived in
    # v3 (undefined terms under v2), and at most ONE limit context may
    # govern a model.
    limit_ctxs = [
        c for c in ctxs
        if isinstance(c, str) and c.startswith("dtmi:dtdl:limits:")
    ]
    limits_ok = bool(limit_ctxs)
    if len(limit_ctxs) > 1:
        v.append(
            f"@context lists multiple limit extensions {limit_ctxs}; "
            "at most one may govern a model"
        )
        limits_ok = False
    if is_v2 and limit_ctxs:
        v.append(
            f"@context limit extensions {limit_ctxs} require "
            "dtmi:dtdl:context;3 or later"
        )
        limits_ok = False
    for c in limit_ctxs:
        wanted = _LIMIT_EXT_GATE.get(c)
        if wanted is None:
            v.append(f"unknown limit extension {c!r}")
            limits_ok = False
        elif dtdl_versions and dtdl_versions[0] != wanted:
            v.append(
                f"{c} may only be used with {wanted} "
                f"(found {dtdl_versions[0]})"
            )
            limits_ok = False
    for c in ctxs:
        if not isinstance(c, str) or not c.startswith("dtmi:"):
            v.append(f"@context entry {c!r} is not a DTMI context specifier")
    # complex-schema nesting limit: 5 levels under a v2 context, 8
    # under v3/v4 (DTDL language spec limits).  A valid limit extension
    # RAISES the cap — we accept deeper nesting permissively (the
    # extension's exact raised value is enforced by the target runtime,
    # not re-derived here) rather than reject models the extension
    # explicitly legalizes.
    max_depth = 5 if is_v2 else (64 if limits_ok else 8)
    # v4 adds primitive schema atoms (byte/bytes/decimal/short/uuid and
    # the unsigned family); under v2/v3 they are unknown terms
    is_v4_ctx = "dtmi:dtdl:context;4" in ctxs
    prims = (
        _ALL_PRIMITIVE_NAMES | _V4_PRIMITIVE_NAMES
        if is_v4_ctx
        else _ALL_PRIMITIVE_NAMES
    )

    _check_display_strings(doc, "interface", v)

    parents = list(extract_extends(doc))
    if is_v2 and len(parents) > 2:
        # DTDL v2 spec: an Interface may extend at most two interfaces
        # (the limit was lifted in v3)
        v.append(f"extends lists {len(parents)} interfaces; DTDL v2 allows at most 2")
    for parent in parents:
        if not _DTMI_RE.match(parent):
            v.append(f"extends {parent!r} is not a valid DTMI")
        elif known_ids is not None and parent not in known_ids:
            v.append(f"extends {parent!r} cannot be resolved")

    # interface-level named schema definitions (DTDL v3 `schemas`)
    named_ids: set[str] = set(known_schema_ids or ())
    for sch in doc.get("schemas", []) or []:
        if not isinstance(sch, dict):
            v.append("schemas entries must be objects")
            continue
        sid = sch.get("@id")
        if not isinstance(sid, str) or not _DTMI_RE.match(sid):
            v.append(f"named schema @id {sid!r} is not a valid DTMI")
            continue
        if sid in named_ids and sid not in (known_schema_ids or ()):
            v.append(f"duplicate named schema '{sid}'")
        named_ids.add(sid)
    for sch in doc.get("schemas", []) or []:
        if isinstance(sch, dict) and isinstance(sch.get("@id"), str):
            _validate_schema_node(
                sch, named_ids, f"named schema '{sch['@id']}'", v,
                max_depth=max_depth, primitives=prims, v2_limits=is_v2,
            )

    contents_list = doc.get("contents", []) or []
    if is_v2 and isinstance(contents_list, list) and len(contents_list) > 300:
        # DTDL v2 spec: an Interface may have at most 300 contents
        # (the cap was raised in v3)
        v.append(
            f"contents lists {len(contents_list)} items; DTDL v2 allows at most 300"
        )
    seen_names: set[str] = set()
    content_kind_by_name: dict[str, str] = {}
    pending_annotates: list[tuple[str, str]] = []  # checked after the loop
    for item in doc.get("contents", []) or []:
        if not isinstance(item, dict):
            v.append("contents items must be objects")
            continue
        kinds = _types_of(item)
        kind = next((k for k in kinds if k in _CONTENT_KINDS), None)
        name = item.get("name")
        where = f"content '{name}'"
        if kind is None:
            v.append(f"{where}: @type {kinds!r} has no DTDL content kind")
            continue
        # batch 15: an element has exactly ONE content kind — a
        # ["Property", "Telemetry"] co-type used to silently validate
        # as the first kind; DTDLParser rejects the combination
        content_kinds = [k for k in kinds if k in _CONTENT_KINDS]
        if len(content_kinds) > 1:
            v.append(
                f"{where}: @type lists multiple content kinds "
                f"{content_kinds}; exactly one is allowed"
            )
            continue
        # batch 17: the name LENGTH cap is version-aware (64 under v2,
        # 512 under v3/v4 per the public limits tables) — the old
        # unconditional 64 over-rejected valid v3/v4 names
        if not _name_ok(name, is_v2):
            v.append(f"content name {name!r} is not a valid DTDL identifier")
            continue
        if name in seen_names:
            v.append(f"duplicate content name '{name}'")
        seen_names.add(name)
        content_kind_by_name[name] = kind
        _check_display_strings(item, where, v)
        # --- feature-extension adjunct types (batch 9: annotation /
        # historization / overriding, public DTDL extension registry) --
        adjuncts = [k for k in kinds if k in _ADJUNCT_TYPES]
        for adj in adjuncts:
            prefix, ext_name = _ADJUNCT_TYPES[adj]
            if not any(c.startswith(prefix) for c in ctxs if isinstance(c, str)):
                # adjunct type without its extension context is an
                # undefined term (DTDLParser: UndefinedTerm)
                v.append(
                    f"{where}: @type {adj!r} requires the {ext_name} "
                    "extension in @context"
                )
            if kind not in ("Property", "Telemetry"):
                v.append(
                    f"{where}: {adj} may only co-type a Property or "
                    f"Telemetry (found {kind})"
                )
        if "ValueAnnotation" in adjuncts:
            ann = item.get("annotates")
            if not isinstance(ann, str) or not _NAME_RE.match(ann):
                v.append(
                    f"{where}: ValueAnnotation requires 'annotates' naming a "
                    "sibling Property or Telemetry"
                )
            else:
                pending_annotates.append((where, ann))
        elif item.get("annotates") is not None:
            v.append(f"{where}: 'annotates' requires the ValueAnnotation co-type")
        if "Override" in adjuncts:
            ov = item.get("overrides")
            if not isinstance(ov, str) or not _DTMI_RE.match(ov):
                v.append(
                    f"{where}: Override requires 'overrides' naming the "
                    "supplemental property DTMI being overridden"
                )
            if "ValueAnnotation" not in adjuncts:
                # the overridable supplemental properties come from a
                # co-typed adjunct (the registry's worked example is
                # ValueAnnotation.annotates) — an Override with nothing
                # to override is rejected
                v.append(
                    f"{where}: Override must co-type an adjunct that "
                    "defines the overridden supplemental property "
                    "(e.g. ValueAnnotation)"
                )
        elif item.get("overrides") is not None:
            v.append(f"{where}: 'overrides' requires the Override co-type")
        # `writable` exists only on Property and Relationship (DTDL
        # spec; DTDLParser rejects it on Telemetry/Command/Component)
        w = item.get("writable")
        if w is not None:
            if kind not in ("Property", "Relationship"):
                v.append(f"{where}: writable is not a {kind} property")
            elif not isinstance(w, bool):
                v.append(f"{where}: writable must be a boolean")
        # --- undefined-term guards (batch 13): terms defined on exactly
        # ONE content kind are UndefinedTerm anywhere else (DTDLParser
        # rejects e.g. a Property carrying `target` or a Telemetry
        # carrying `request`); `nullable` lives only on CommandRequest /
        # CommandResponse payload objects, never on a content item.
        for term, kinds_ok in (
            ("target", ("Relationship",)),
            ("minMultiplicity", ("Relationship",)),
            ("maxMultiplicity", ("Relationship",)),
            ("properties", ("Relationship",)),
            ("request", ("Command",)),
            ("response", ("Command",)),
            ("commandType", ("Command",)),
            ("nullable", ()),
            # batch 15: `schema` is defined on Property, Telemetry and
            # Component only — a Command or Relationship carrying a
            # top-level schema is an UndefinedTerm
            ("schema", ("Property", "Telemetry", "Component")),
        ):
            if item.get(term) is not None and kind not in kinds_ok:
                v.append(f"{where}: {term} is not a {kind} property")
        if kind in ("Property", "Telemetry"):
            if item.get("schema") is None:
                v.append(f"{where}: {kind} requires a schema")
            else:
                _validate_schema_node(
                    item["schema"], named_ids, where, v,
                    max_depth=max_depth, primitives=prims,
                    # DTDL v2: a Property schema may not be or contain
                    # Array at any nesting level (lifted in v3;
                    # Telemetry arrays are fine in every version)
                    forbid_array=is_v2 and kind == "Property",
                    v2_limits=is_v2,
                )
        if kind == "Command":
            # commandType: a deprecated DTDL v2 term with exactly two
            # legal (and ignored) values; the term was REMOVED in v3 —
            # DTDLParser reports UndefinedTerm under a v3/v4 context
            ct = item.get("commandType")
            if ct is not None:
                if not is_v2:
                    v.append(
                        f"{where}: commandType was removed in DTDL v3 "
                        "(a deprecated v2-only term)"
                    )
                elif ct not in ("synchronous", "asynchronous"):
                    v.append(
                        f"{where}: commandType {ct!r} must be "
                        "'synchronous' or 'asynchronous'"
                    )
            # CommandRequest / CommandResponse payloads: named payload +
            # structurally valid schema (DTDLParser checks both)
            for side in ("request", "response"):
                payload = item.get(side)
                if payload is None:
                    continue
                if not isinstance(payload, dict):
                    v.append(f"{where}: {side} must be a CommandPayload object")
                    continue
                # payloads are named elements: displayName/description/
                # comment caps apply to them like any other element
                _check_display_strings(payload, f"{where} {side}", v)
                pname = payload.get("name")
                if not isinstance(pname, str) or not _NAME_RE.match(pname):
                    v.append(f"{where}: {side} name {pname!r} is not a valid identifier")
                if payload.get("writable") is not None:
                    # batch 13: `writable` is a Property/Relationship
                    # term — on a CommandPayload it is an UndefinedTerm
                    v.append(
                        f"{where}: {side} writable is not a CommandPayload "
                        "property"
                    )
                nullable = payload.get("nullable")
                if nullable is not None:
                    # nullable arrived on CommandRequest/CommandResponse
                    # in DTDL v3; under v2 it is an undefined term
                    if is_v2:
                        v.append(
                            f"{where}: {side} nullable requires "
                            "dtmi:dtdl:context;3 or later"
                        )
                    elif not isinstance(nullable, bool):
                        v.append(f"{where}: {side} nullable must be a boolean")
                if payload.get("schema") is None:
                    v.append(f"{where}: {side} requires a schema")
                else:
                    _validate_schema_node(
                        payload["schema"], named_ids, f"{where} {side}", v,
                        max_depth=max_depth, primitives=prims,
                        # DTDL v2: Command payload schemas may not be or
                        # contain Array (restriction lifted in v3)
                        forbid_array=is_v2, v2_limits=is_v2,
                    )
        if kind == "Component":
            cs = item.get("schema")
            if not isinstance(cs, str) or not _DTMI_RE.match(cs):
                v.append(f"{where}: Component schema must be an interface DTMI")
            elif known_ids is not None and cs not in known_ids:
                v.append(f"{where}: Component schema {cs!r} cannot be resolved")
        if kind == "Relationship":
            # DTDL Relationship content: target DTMI, multiplicity
            # bounds, nested properties — the part of DTDLParser the
            # reference leaves as a TODO at ``Relationships.cs:370``.
            tgt = item.get("target")
            if tgt is not None:
                if not isinstance(tgt, str) or not _DTMI_RE.match(tgt):
                    v.append(f"{where}: target {tgt!r} is not a valid DTMI")
                elif known_ids is not None and tgt not in known_ids:
                    v.append(f"{where}: target {tgt!r} cannot be resolved")
            mn, mx = item.get("minMultiplicity"), item.get("maxMultiplicity")
            is_v4 = "dtmi:dtdl:context;4" in ctxs
            if mn is not None:
                if not isinstance(mn, int) or isinstance(mn, bool) or mn < 0:
                    v.append(f"{where}: minMultiplicity must be a non-negative integer")
                elif not is_v4 and mn != 0:
                    # DTDL v2/v3 spec: minMultiplicity, when present,
                    # MUST be 0 (positive minima arrive in v4).
                    v.append(f"{where}: minMultiplicity must be 0 in DTDL v2/v3")
            if mx is not None and (
                not isinstance(mx, int) or isinstance(mx, bool) or mx < 1
            ):
                v.append(f"{where}: maxMultiplicity must be a positive integer")
            elif mx is not None and is_v2 and mx > 500:
                # DTDL v2 scaled limit: maxMultiplicity ≤ 500 (the cap
                # is lifted in v3+)
                v.append(
                    f"{where}: maxMultiplicity {mx} exceeds the DTDL v2 "
                    "limit of 500"
                )
            if (
                isinstance(mn, int) and isinstance(mx, int)
                and not isinstance(mn, bool) and not isinstance(mx, bool)
                and mn > mx
            ):
                v.append(f"{where}: minMultiplicity {mn} exceeds maxMultiplicity {mx}")
            props = item.get("properties")
            if props is not None and not isinstance(props, list):
                v.append(f"{where}: properties must be a list of Property entries")
            seen_rel_props: set[str] = set()
            for p in (props if isinstance(props, list) else []):
                if not isinstance(p, dict) or "Property" not in _types_of(p):
                    v.append(f"{where}: relationship properties must be @type Property")
                    continue
                pn = p.get("name")
                if not isinstance(pn, str) or not _NAME_RE.match(pn) or len(pn) > 64:
                    v.append(
                        f"{where}: relationship property name {pn!r} is not a "
                        "valid DTDL identifier"
                    )
                    continue
                if pn in seen_rel_props:
                    v.append(f"{where}: duplicate relationship property '{pn}'")
                seen_rel_props.add(pn)
                if p.get("schema") is None:
                    v.append(f"{where}: relationship property '{pn}' requires a schema")
                else:
                    _validate_schema_node(
                        p["schema"], named_ids, f"{where}.{pn}", v,
                        max_depth=max_depth, primitives=prims,
                        # a relationship property IS a Property — the
                        # v2 no-Array rule applies to it too
                        forbid_array=is_v2, v2_limits=is_v2,
                    )
        # semantic types (co-types beyond the content kind; extension
        # adjunct types are NOT semantic types)
        semantics = [
            k for k in kinds
            if k not in _CONTENT_KINDS and k not in _ADJUNCT_TYPES
        ]
        unit = item.get("unit")
        if semantics and kind in ("Property", "Telemetry"):
            # DTDL v2 ships semantic types IN the core language; v3+
            # moved them to the quantitativeTypes extension, which must
            # then appear in @context (DTDL spec §Semantic types).
            if not has_qt and not is_v2:
                v.append(
                    f"{where}: semantic type {semantics[0]!r} requires the "
                    "quantitativeTypes extension in @context"
                )
            if item.get("schema") not in _NUMERIC_SCHEMAS:
                v.append(f"{where}: semantic type requires a numeric schema")
            for s in semantics:
                allowed = SEMANTIC_UNITS.get(s)
                if allowed is not None and unit is not None and unit not in allowed:
                    v.append(f"{where}: unit {unit!r} is not a valid {s} unit")
        elif semantics:
            # batch 15: semantic co-types are defined on Property and
            # Telemetry only — a semantically-typed Relationship/
            # Command/Component used to pass silently
            v.append(
                f"{where}: semantic type {semantics[0]!r} may only "
                f"co-type a Property or Telemetry (found {kind})"
            )
        elif unit is not None and not semantics:
            v.append(f"{where}: unit requires a semantic @type")
    for where, ann in pending_annotates:
        # resolved after the loop: the annotated sibling may be declared
        # later in contents
        if content_kind_by_name.get(ann) not in ("Property", "Telemetry"):
            v.append(
                f"{where}: annotates {ann!r} does not name a sibling "
                "Property or Telemetry"
            )
    # --- element @id discipline (batch 14) ----------------------------
    # ANY element in a model may carry an optional @id; DTDLParser
    # requires every one to be a valid DTMI (non-interface identifiers
    # may run to 2048 chars) and UNIQUE within the model — a duplicate
    # is a DuplicateElementId error, not a merge.
    seen_element_ids: set[str] = set()

    def _walk_ids(node: Any, where: str) -> None:
        if isinstance(node, dict):
            nid = node.get("@id")
            if nid is not None and node is not doc:
                if not isinstance(nid, str) or not _DTMI_RE.match(nid):
                    v.append(f"{where}: element @id {nid!r} is not a valid DTMI")
                elif len(nid) > 2048:
                    v.append(
                        f"{where}: element @id exceeds the 2048-character limit"
                    )
                elif nid in seen_element_ids:
                    v.append(f"{where}: duplicate element @id '{nid}'")
                else:
                    seen_element_ids.add(nid)
            for key, child in node.items():
                if key == "@context":
                    continue
                _walk_ids(child, where)
        elif isinstance(node, list):
            for child in node:
                _walk_ids(child, where)

    if isinstance(mid, str):
        seen_element_ids.add(mid)  # the interface's own id participates
    for item in doc.get("contents", []) or []:
        if isinstance(item, dict):
            _walk_ids(item, f"content '{item.get('name')}'")
    for sch in doc.get("schemas", []) or []:
        # named-schema roots already get a dedicated duplicate check;
        # walk only their SUBTREES for nested element ids
        if isinstance(sch, dict):
            sid = sch.get("@id")
            if isinstance(sid, str):
                seen_element_ids.add(sid)
            for key, child in sch.items():
                if key not in ("@context", "@id"):
                    _walk_ids(child, f"named schema '{sch.get('@id')}'")
    if v:
        raise ValidationError(" AND ".join(v))


RESERVED_REL_KEYS = {
    "$relationshipId",
    "$sourceId",
    "$targetId",
    "$relationshipName",
    "$etag",
}


def validate_relationship(doc: dict[str, Any]) -> None:
    """Reserved-property checks for relationships (the reference's DTDL
    relationship-target validation is an acknowledged TODO at
    ``Relationships.cs:370`` — parity means structural checks only)."""
    missing = [
        k
        for k in ("$relationshipId", "$sourceId", "$targetId", "$relationshipName")
        if not doc.get(k)
    ]
    if missing:
        raise ValidationError(
            "Relationship is missing required properties: " + ", ".join(missing)
        )


def _extends_closure(registry: ModelRegistry, model_id: str) -> set[str]:
    """{model_id} ∪ transitive extends bases present in the registry."""
    out: set[str] = set()

    def visit(mid: str) -> None:
        if mid in out or mid not in registry.by_id:
            return
        out.add(mid)
        for parent in extract_extends(registry.by_id[mid]):
            visit(parent)

    visit(model_id)
    return out


def validate_relationship_against_model(
    registry: ModelRegistry,
    source_model_id: str | None,
    target_model_id: str | None,
    doc: dict[str, Any],
) -> None:
    """Model-aware relationship validation — this EXCEEDS the reference,
    whose DTDL relationship check is an acknowledged TODO
    (``Relationships.cs:370``: "Get source and target models and check
    relationship validity with DTDL parser").

    Behavior: if the source twin's model (or a base it extends)
    declares a Relationship content with this ``$relationshipName``,
    enforce it — declared ``target`` interface (the target twin's model
    must be it or extend it), declared ``properties`` (unknown
    relationship properties rejected, known ones value-checked).  An
    UNDECLARED relationship name stays lenient, which is exactly the
    reference's current accept-everything behavior, so reference-parity
    call sites keep working."""
    if source_model_id is None or source_model_id not in registry.by_id:
        return
    name = doc.get("$relationshipName")
    decl = registry.contents(source_model_id).get(name)  # inherits via extends
    if decl is None or "Relationship" not in _types_of(decl):
        return
    v: list[str] = []
    tgt = decl.get("target")
    if isinstance(tgt, str) and target_model_id is not None:
        if tgt not in _extends_closure(registry, target_model_id):
            v.append(
                f"Relationship '{name}' requires a target of model '{tgt}' "
                f"but the target twin is '{target_model_id}'"
            )
    declared_props = {
        p.get("name"): p
        for p in (decl.get("properties") or [])
        if isinstance(p, dict)
    }
    for k, val in doc.items():
        if k in RESERVED_REL_KEYS or k == "$metadata":
            continue
        p = declared_props.get(k)
        if p is None:
            v.append(
                f"Relationship property '{k}' is not defined on "
                f"relationship '{name}'"
            )
        else:
            v.extend(
                validate_value(
                    p.get("schema"), val, f"Relationship property '{k}'",
                    registry.named_schemas(source_model_id),
                )
            )
    if v:
        raise ValidationError(" AND ".join(v))


def relationship_max_multiplicity(
    registry: ModelRegistry, source_model_id: str | None, name: str
) -> int | None:
    """The declared maxMultiplicity for ``name`` on the source model's
    extends closure, or None when undeclared/unbounded."""
    if source_model_id is None or source_model_id not in registry.by_id:
        return None
    item = registry.contents(source_model_id).get(name)
    if item is not None and "Relationship" in _types_of(item):
        mx = item.get("maxMultiplicity")
        return mx if isinstance(mx, int) and not isinstance(mx, bool) else None
    return None
