"""DTDL long-tail batch #3: Relationship contents (target DTMI,
min/maxMultiplicity, properties-on-relationships), geospatial schemas,
entity-id grammar, and model-aware relationship-instance validation.

Reference: the DTDL relationship check is an acknowledged TODO at
``src/AgeDigitalTwins/AgeDigitalTwinsClient.Relationships.cs:370``
("Get source and target models and check relationship validity with
DTDL parser") — the instance-level checks here EXCEED the reference;
the model-level checks mirror what Microsoft's DTDLParser enforces at
model upload (``AgeDigitalTwinsClient.cs:68-81``).
"""

from __future__ import annotations

import pytest

from pg_age_digitaltwins_spark.validation import (
    ModelRegistry,
    ValidationError,
    validate_entity_id,
    validate_model,
    validate_twin,
)


def _interface(**over):
    base = {
        "@id": "dtmi:v:Test;1",
        "@type": "Interface",
        "@context": "dtmi:dtdl:context;3",
        "contents": [],
    }
    base.update(over)
    return base


def _rel_content(**over):
    base = {"@type": "Relationship", "name": "feeds", "target": "dtmi:v:Sink;1"}
    base.update(over)
    return base


KNOWN = {"dtmi:v:Test;1", "dtmi:v:Sink;1"}


# ----------------------------------------------------------------------
# model-level: Relationship contents (DTDLParser parity)
# ----------------------------------------------------------------------

def test_relationship_target_accept_and_reject():
    validate_model(
        _interface(contents=[_rel_content()]), known_ids=KNOWN
    )
    with pytest.raises(ValidationError, match="not a valid DTMI"):
        validate_model(
            _interface(contents=[_rel_content(target="not-a-dtmi")]),
            known_ids=KNOWN,
        )
    with pytest.raises(ValidationError, match="cannot be resolved"):
        validate_model(
            _interface(contents=[_rel_content(target="dtmi:v:Missing;1")]),
            known_ids=KNOWN,
        )


def test_relationship_multiplicity_bounds():
    # v2/v3: minMultiplicity, when present, MUST be 0 (DTDL v3 spec)
    validate_model(
        _interface(contents=[_rel_content(minMultiplicity=0, maxMultiplicity=5)]),
        known_ids=KNOWN,
    )
    with pytest.raises(ValidationError, match="must be 0 in DTDL v2/v3"):
        validate_model(
            _interface(contents=[_rel_content(minMultiplicity=2)]),
            known_ids=KNOWN,
        )
    # v4 allows positive minima but still orders the bounds
    v4 = {"@context": "dtmi:dtdl:context;4"}
    validate_model(
        _interface(
            contents=[_rel_content(minMultiplicity=2, maxMultiplicity=4)], **v4
        ),
        known_ids=KNOWN,
    )
    with pytest.raises(ValidationError, match="exceeds maxMultiplicity"):
        validate_model(
            _interface(
                contents=[_rel_content(minMultiplicity=5, maxMultiplicity=2)], **v4
            ),
            known_ids=KNOWN,
        )
    with pytest.raises(ValidationError, match="positive integer"):
        validate_model(
            _interface(contents=[_rel_content(maxMultiplicity=0)]),
            known_ids=KNOWN,
        )
    with pytest.raises(ValidationError, match="non-negative integer"):
        validate_model(
            _interface(contents=[_rel_content(minMultiplicity=-1)]),
            known_ids=KNOWN,
        )


def test_relationship_properties_validation():
    good = _rel_content(
        properties=[{"@type": "Property", "name": "since", "schema": "dateTime"}]
    )
    validate_model(_interface(contents=[good]), known_ids=KNOWN)
    with pytest.raises(ValidationError, match="must be @type Property"):
        validate_model(
            _interface(contents=[_rel_content(
                properties=[{"@type": "Telemetry", "name": "x", "schema": "double"}]
            )]),
            known_ids=KNOWN,
        )
    with pytest.raises(ValidationError, match="not a valid DTDL identifier"):
        validate_model(
            _interface(contents=[_rel_content(
                properties=[{"@type": "Property", "name": "9bad", "schema": "string"}]
            )]),
            known_ids=KNOWN,
        )
    with pytest.raises(ValidationError, match="requires a schema"):
        validate_model(
            _interface(contents=[_rel_content(
                properties=[{"@type": "Property", "name": "x"}]
            )]),
            known_ids=KNOWN,
        )
    with pytest.raises(ValidationError, match="duplicate relationship property"):
        validate_model(
            _interface(contents=[_rel_content(properties=[
                {"@type": "Property", "name": "x", "schema": "string"},
                {"@type": "Property", "name": "x", "schema": "double"},
            ])]),
            known_ids=KNOWN,
        )


# ----------------------------------------------------------------------
# geospatial schemas + schema-atom tightening
# ----------------------------------------------------------------------

def test_geospatial_schema_names_and_typo_rejection():
    validate_model(
        _interface(contents=[
            {"@type": "Property", "name": "location", "schema": "point"},
            {"@type": "Property", "name": "route", "schema": "lineString"},
            {"@type": "Property", "name": "zone", "schema": "polygon"},
        ])
    )
    with pytest.raises(ValidationError, match="not a DTDL primitive"):
        validate_model(
            _interface(contents=[
                {"@type": "Property", "name": "location", "schema": "poin"}
            ])
        )
    with pytest.raises(ValidationError, match="not a DTDL primitive"):
        validate_model(
            _interface(contents=[
                {"@type": "Property", "name": "x", "schema": "strng"}
            ])
        )


def test_geospatial_twin_value_validation():
    reg = ModelRegistry([
        _interface(contents=[
            {"@type": "Property", "name": "location", "schema": "point"}
        ])
    ])
    ok = {
        "$dtId": "t1",
        "$metadata": {"$model": "dtmi:v:Test;1"},
        "location": {"type": "Point", "coordinates": [4.9, 52.3]},
    }
    assert validate_twin(reg, ok) == "dtmi:v:Test;1"
    bad = dict(ok, location={"type": "Polygon", "coordinates": [[1, 2]]})
    with pytest.raises(ValidationError, match="geospatial schema 'point'"):
        validate_twin(reg, bad)
    with pytest.raises(ValidationError, match="geospatial schema 'point'"):
        validate_twin(reg, dict(ok, location="52.3,4.9"))


# ----------------------------------------------------------------------
# entity-id grammar (public ADT id limits)
# ----------------------------------------------------------------------

def test_entity_id_grammar():
    validate_entity_id("room-1.a:b@c$d'e")  # every punctuation class allowed
    validate_entity_id("A" * 128)
    for bad in ["", "A" * 129, "has space", "tab\tid", "unicode-ü", "slash/id", None]:
        with pytest.raises(ValidationError, match="Invalid twin id"):
            validate_entity_id(bad)


# ----------------------------------------------------------------------
# instance-level enforcement through the client (exceeds the reference
# TODO at Relationships.cs:370)
# ----------------------------------------------------------------------

FARM_MODELS = [
    {
        "@id": "dtmi:farm:Field;1",
        "@type": "Interface",
        "@context": "dtmi:dtdl:context;3",
        "contents": [
            {
                "@type": "Relationship",
                "name": "irrigatedBy",
                "target": "dtmi:farm:Pump;1",
                "maxMultiplicity": 2,
                "properties": [
                    {"@type": "Property", "name": "priority", "schema": "integer"}
                ],
            }
        ],
    },
    {
        "@id": "dtmi:farm:Pump;1",
        "@type": "Interface",
        "@context": "dtmi:dtdl:context;3",
        "contents": [],
    },
    {
        "@id": "dtmi:farm:SolarPump;1",
        "@type": "Interface",
        "@context": "dtmi:dtdl:context;3",
        "extends": ["dtmi:farm:Pump;1"],
        "contents": [],
    },
    {
        "@id": "dtmi:farm:Barn;1",
        "@type": "Interface",
        "@context": "dtmi:dtdl:context;3",
        "contents": [],
    },
]


@pytest.fixture()
def farm_client(spark):
    from pg_age_digitaltwins_spark.client import DigitalTwinsSparkClient
    from pg_age_digitaltwins_spark.store.graph_store import GraphStore

    def twin(i, model):
        return {"$dtId": i, "$metadata": {"$model": model}}

    store = GraphStore.from_documents(
        spark,
        twin_docs=[
            twin("field1", "dtmi:farm:Field;1"),
            twin("pump1", "dtmi:farm:Pump;1"),
            twin("pump2", "dtmi:farm:SolarPump;1"),
            twin("pump3", "dtmi:farm:Pump;1"),
            twin("barn1", "dtmi:farm:Barn;1"),
        ],
        model_docs=FARM_MODELS,
    )
    return DigitalTwinsSparkClient(store)


def _rel(rid, target, **props):
    return {"$relationshipName": "irrigatedBy", "$targetId": target, **props}


def test_declared_relationship_happy_path(farm_client):
    r = farm_client.create_or_replace_relationship(
        "field1", "r1", _rel("r1", "pump1", priority=1)
    )
    assert r["$relationshipId"] == "r1"


def test_declared_relationship_target_model_enforced(farm_client):
    with pytest.raises(ValidationError, match="requires a target of model"):
        farm_client.create_or_replace_relationship(
            "field1", "r1", _rel("r1", "barn1")
        )
    # a target whose model EXTENDS the declared interface is accepted
    farm_client.create_or_replace_relationship(
        "field1", "r2", _rel("r2", "pump2")
    )


def test_declared_relationship_properties_enforced(farm_client):
    with pytest.raises(ValidationError, match="does not match schema 'integer'"):
        farm_client.create_or_replace_relationship(
            "field1", "r1", _rel("r1", "pump1", priority="high")
        )
    with pytest.raises(ValidationError, match="not defined on relationship"):
        farm_client.create_or_replace_relationship(
            "field1", "r1", _rel("r1", "pump1", undeclared=True)
        )


def test_max_multiplicity_enforced_on_create_not_replace(farm_client):
    farm_client.create_or_replace_relationship("field1", "r1", _rel("r1", "pump1"))
    farm_client.create_or_replace_relationship("field1", "r2", _rel("r2", "pump2"))
    with pytest.raises(ValidationError, match="exceeds maxMultiplicity 2"):
        farm_client.create_or_replace_relationship(
            "field1", "r3", _rel("r3", "pump3")
        )
    # replacing an EXISTING relationship does not count against the cap
    farm_client.create_or_replace_relationship(
        "field1", "r2", _rel("r2", "pump3", priority=9)
    )


def test_undeclared_relationship_stays_lenient(farm_client):
    """Reference-parity escape hatch: a relationship name the source
    model does not declare is accepted untouched (the reference's
    current behavior for ALL relationships)."""
    r = farm_client.create_or_replace_relationship(
        "barn1", "r9",
        {"$relationshipName": "storesFeedFor", "$targetId": "field1", "free": 1},
    )
    assert r["$relationshipName"] == "storesFeedFor"


def test_bad_relationship_id_rejected(farm_client):
    with pytest.raises(ValidationError, match="Invalid relationship id"):
        farm_client.create_or_replace_relationship(
            "field1", "bad id", _rel("x", "pump1")
        )


# ----------------------------------------------------------------------
# DTDL long-tail batch #5: writable placement, Array elementSchema,
# extends cycles, nested-component rejection
# ----------------------------------------------------------------------

def test_writable_only_on_property_and_relationship():
    # accept: writable on Property and on Relationship
    validate_model(_interface(contents=[
        {"@type": "Property", "name": "p", "schema": "double", "writable": True},
        _rel_content(writable=False),
    ]), KNOWN)
    # reject: writable on Telemetry
    with pytest.raises(ValidationError, match="writable is not a Telemetry"):
        validate_model(_interface(contents=[
            {"@type": "Telemetry", "name": "t", "schema": "double", "writable": True},
        ]), KNOWN)
    # reject: non-boolean writable
    with pytest.raises(ValidationError, match="writable must be a boolean"):
        validate_model(_interface(contents=[
            {"@type": "Property", "name": "p", "schema": "double", "writable": "yes"},
        ]), KNOWN)


def test_array_requires_element_schema():
    with pytest.raises(ValidationError, match="Array requires an elementSchema"):
        validate_model(_interface(contents=[
            {"@type": "Property", "name": "xs", "schema": {"@type": "Array"}},
        ]), KNOWN)
    validate_model(_interface(contents=[
        {"@type": "Property", "name": "xs",
         "schema": {"@type": "Array", "elementSchema": "double"}},
    ]), KNOWN)


def _iface(mid, **over):
    d = {
        "@id": mid, "@type": "Interface",
        "@context": "dtmi:dtdl:context;3", "contents": [],
    }
    d.update(over)
    return d


def test_extends_cycle_rejected_at_create(spark):
    """DTDLParser requires the inheritance graph to be a DAG; a cyclic
    extends batch must fail model create, not silently produce a
    closure where each member is its own ancestor."""
    from pg_age_digitaltwins_spark.models import create_models
    from pg_age_digitaltwins_spark.store.graph_store import GraphStore

    store = GraphStore.empty(spark)
    with pytest.raises(ValidationError, match="cycle"):
        create_models(store, [
            _iface("dtmi:v:A;1", extends="dtmi:v:B;1"),
            _iface("dtmi:v:B;1", extends="dtmi:v:A;1"),
        ])
    # self-extends is the 1-cycle
    with pytest.raises(ValidationError, match="cycle"):
        create_models(store, [_iface("dtmi:v:S;1", extends="dtmi:v:S;1")])
    # a diamond is a DAG, not a cycle — must pass
    _, created = create_models(store, [
        _iface("dtmi:v:Top;1"),
        _iface("dtmi:v:L;1", extends="dtmi:v:Top;1"),
        _iface("dtmi:v:R;1", extends="dtmi:v:Top;1"),
        _iface("dtmi:v:Bot;1", extends=["dtmi:v:L;1", "dtmi:v:R;1"]),
    ])
    assert len(created) == 4


def test_nested_components_rejected(spark):
    """DTDL v2/v3: a Component's interface must not itself contain
    Components (single-level component nesting)."""
    from pg_age_digitaltwins_spark.models import create_models
    from pg_age_digitaltwins_spark.store.graph_store import GraphStore

    store = GraphStore.empty(spark)
    leaf = _iface("dtmi:v:Leaf;1")
    mid = _iface("dtmi:v:Mid;1", contents=[
        {"@type": "Component", "name": "inner", "schema": "dtmi:v:Leaf;1"},
    ])
    outer = _iface("dtmi:v:Outer;1", contents=[
        {"@type": "Component", "name": "outer", "schema": "dtmi:v:Mid;1"},
    ])
    with pytest.raises(ValidationError, match="nested"):
        create_models(store, [leaf, mid, outer])
    # component-of-component via the component interface's BASE is
    # equally forbidden
    base_with_comp = _iface("dtmi:v:BaseC;1", contents=[
        {"@type": "Component", "name": "inner", "schema": "dtmi:v:Leaf;1"},
    ])
    derived = _iface("dtmi:v:Derived;1", extends="dtmi:v:BaseC;1")
    outer2 = _iface("dtmi:v:Outer2;1", contents=[
        {"@type": "Component", "name": "c", "schema": "dtmi:v:Derived;1"},
    ])
    with pytest.raises(ValidationError, match="nested"):
        create_models(store, [leaf, base_with_comp, derived, outer2])
    # plain single-level components still pass
    _, created = create_models(store, [leaf, mid])
    assert len(created) == 2


def test_v2_semantic_types_are_core_language():
    """DTDL v2 ships semantic types in the core language — no
    quantitativeTypes extension context required (it did not exist
    until v3); v3 still demands the extension."""
    v2 = {
        "@id": "dtmi:v2:Sensor;1", "@type": "Interface",
        "@context": "dtmi:dtdl:context;2",
        "contents": [{"@type": ["Property", "Temperature"], "name": "temp",
                      "schema": "double", "unit": "degreeCelsius"}],
    }
    validate_model(v2, None)  # accepted
    v3 = dict(v2, **{"@id": "dtmi:v2:Sensor3;1",
                     "@context": "dtmi:dtdl:context;3"})
    with pytest.raises(ValidationError, match="quantitativeTypes"):
        validate_model(v3, None)
    # bad unit still rejected under v2
    bad = dict(v2, contents=[{"@type": ["Property", "Temperature"],
                              "name": "temp", "schema": "double",
                              "unit": "notaunit"}])
    with pytest.raises(ValidationError, match="unit"):
        validate_model(bad, None)


# --- batch 7: @context co-occurrence rules (DTDL spec / DTDLParser) ---

@pytest.fixture()
def client(spark):
    from pg_age_digitaltwins_spark.client import DigitalTwinsSparkClient
    from pg_age_digitaltwins_spark.store.graph_store import GraphStore

    return DigitalTwinsSparkClient(GraphStore.empty(spark))


def _ctx_model(ctx):
    return {"@id": "dtmi:ctx:T;1", "@type": "Interface", "@context": ctx}


def _create(client, doc):
    return client.create_models([doc])


def test_context_multiple_dtdl_versions_rejected(client):
    with pytest.raises(ValidationError, match="multiple DTDL versions"):
        _create(client, _ctx_model(["dtmi:dtdl:context;2", "dtmi:dtdl:context;3"]))


def test_context_dtdl_version_must_come_first(client):
    with pytest.raises(ValidationError, match="version first"):
        _create(client, _ctx_model(
            ["dtmi:dtdl:extension:quantitativeTypes;1", "dtmi:dtdl:context;3"]
        ))
    # correct order accepted
    _create(client, _ctx_model(
        ["dtmi:dtdl:context;3", "dtmi:dtdl:extension:quantitativeTypes;1"]
    ))
    client.delete_all_models()


def test_context_v2_rejects_extensions(client):
    """Language extensions arrived in v3; a v2 context cannot carry
    extension contexts (DTDLParser UndefinedTerm under v2)."""
    with pytest.raises(ValidationError, match="require dtmi:dtdl:context;3"):
        _create(client, _ctx_model(
            ["dtmi:dtdl:context;2", "dtmi:dtdl:extension:quantitativeTypes;1"]
        ))


def test_context_quantitative_types_version_cooccurrence(client):
    """QT;1 pairs with DTDL v3, QT;2 with v4 — mismatches rejected."""
    with pytest.raises(ValidationError, match="may only be used with"):
        _create(client, _ctx_model(
            ["dtmi:dtdl:context;4", "dtmi:dtdl:extension:quantitativeTypes;1"]
        ))
    with pytest.raises(ValidationError, match="may only be used with"):
        _create(client, _ctx_model(
            ["dtmi:dtdl:context;3", "dtmi:dtdl:extension:quantitativeTypes;2"]
        ))
    _create(client, _ctx_model(
        ["dtmi:dtdl:context;4", "dtmi:dtdl:extension:quantitativeTypes;2"]
    ))
    client.delete_all_models()


def test_context_non_dtmi_entry_rejected(client):
    with pytest.raises(ValidationError, match="not a DTMI context"):
        _create(client, _ctx_model(["dtmi:dtdl:context;3", "https://example.com/ctx"]))


# ---------------------------------------------------------------------------
# r8 batch 9: feature-extension adjunct types (annotation / historization /
# overriding — public DTDL extension registry)
# ---------------------------------------------------------------------------

def _ext_model(ctx, contents):
    return {
        "@id": "dtmi:ext:T;1", "@type": "Interface", "@context": ctx,
        "contents": contents,
    }


_ANN_CTX = ["dtmi:dtdl:context;3", "dtmi:dtdl:extension:annotation;1"]
_HIST_CTX = ["dtmi:dtdl:context;3", "dtmi:dtdl:extension:historization;1"]
_OVR_CTX = [
    "dtmi:dtdl:context;3",
    "dtmi:dtdl:extension:annotation;1",
    "dtmi:dtdl:extension:overriding;1",
]


def test_value_annotation_accepts_and_resolves_sibling(client):
    _create(client, _ext_model(_ANN_CTX, [
        {"@type": "Telemetry", "name": "temp", "schema": "double"},
        {"@type": ["Property", "ValueAnnotation"], "name": "tempAcc",
         "schema": "double", "annotates": "temp"},
    ]))
    client.delete_all_models()
    # forward reference: the annotated sibling may appear later
    _create(client, _ext_model(_ANN_CTX, [
        {"@type": ["Property", "ValueAnnotation"], "name": "tempAcc",
         "schema": "double", "annotates": "temp"},
        {"@type": "Telemetry", "name": "temp", "schema": "double"},
    ]))
    client.delete_all_models()


def test_value_annotation_rejections(client):
    # missing annotates
    with pytest.raises(ValidationError, match="requires 'annotates'"):
        _create(client, _ext_model(_ANN_CTX, [
            {"@type": ["Property", "ValueAnnotation"], "name": "a",
             "schema": "double"},
        ]))
    # annotates names a missing sibling
    with pytest.raises(ValidationError, match="does not name a sibling"):
        _create(client, _ext_model(_ANN_CTX, [
            {"@type": ["Property", "ValueAnnotation"], "name": "a",
             "schema": "double", "annotates": "nope"},
        ]))
    # annotates names a non-Property/Telemetry sibling
    with pytest.raises(ValidationError, match="does not name a sibling"):
        _create(client, _ext_model(_ANN_CTX, [
            {"@type": "Relationship", "name": "r"},
            {"@type": ["Property", "ValueAnnotation"], "name": "a",
             "schema": "double", "annotates": "r"},
        ]))
    # adjunct without its extension context = undefined term
    with pytest.raises(ValidationError, match="requires the annotation"):
        _create(client, _ext_model(["dtmi:dtdl:context;3"], [
            {"@type": "Telemetry", "name": "temp", "schema": "double"},
            {"@type": ["Property", "ValueAnnotation"], "name": "a",
             "schema": "double", "annotates": "temp"},
        ]))
    # annotates without the co-type
    with pytest.raises(ValidationError, match="requires the ValueAnnotation"):
        _create(client, _ext_model(_ANN_CTX, [
            {"@type": "Telemetry", "name": "temp", "schema": "double"},
            {"@type": "Property", "name": "a", "schema": "double",
             "annotates": "temp"},
        ]))


def test_historized_accepts_property_and_telemetry(client):
    _create(client, _ext_model(_HIST_CTX, [
        {"@type": ["Property", "Historized"], "name": "setPoint",
         "schema": "double", "writable": True},
        {"@type": ["Telemetry", "Historized"], "name": "temp",
         "schema": "double"},
    ]))
    client.delete_all_models()


def test_historized_rejections(client):
    # wrong content kind
    with pytest.raises(ValidationError, match="may only co-type"):
        _create(client, _ext_model(_HIST_CTX, [
            {"@type": ["Command", "Historized"], "name": "go"},
        ]))
    # missing historization context
    with pytest.raises(ValidationError, match="requires the historization"):
        _create(client, _ext_model(["dtmi:dtdl:context;3"], [
            {"@type": ["Property", "Historized"], "name": "x",
             "schema": "double"},
        ]))
    # version gate: historization;2 needs DTDL v4
    with pytest.raises(ValidationError, match="may only be used with"):
        _create(client, _ext_model(
            ["dtmi:dtdl:context;3", "dtmi:dtdl:extension:historization;2"],
            [{"@type": ["Property", "Historized"], "name": "x",
              "schema": "double"}],
        ))
    # unknown extension version
    with pytest.raises(ValidationError, match="unknown historization"):
        _create(client, _ext_model(
            ["dtmi:dtdl:context;3", "dtmi:dtdl:extension:historization;9"],
            [{"@type": ["Property", "Historized"], "name": "x",
              "schema": "double"}],
        ))


def test_override_accepts_cotyped_value_annotation(client):
    _create(client, _ext_model(_OVR_CTX, [
        {"@type": "Telemetry", "name": "temp", "schema": "double"},
        {"@type": ["Property", "ValueAnnotation", "Override"],
         "name": "tempAcc", "schema": "double", "annotates": "temp",
         "overrides": "dtmi:dtdl:extension:annotation:v1:ValueAnnotation:annotates;1"},
    ]))
    client.delete_all_models()


def test_override_rejections(client):
    # missing overrides
    with pytest.raises(ValidationError, match="requires 'overrides'"):
        _create(client, _ext_model(_OVR_CTX, [
            {"@type": "Telemetry", "name": "temp", "schema": "double"},
            {"@type": ["Property", "ValueAnnotation", "Override"],
             "name": "a", "schema": "double", "annotates": "temp"},
        ]))
    # Override without an adjunct defining the overridden property
    with pytest.raises(ValidationError, match="must co-type an adjunct"):
        _create(client, _ext_model(_OVR_CTX, [
            {"@type": ["Property", "Override"], "name": "a",
             "schema": "double",
             "overrides": "dtmi:dtdl:extension:annotation:v1:ValueAnnotation:annotates;1"},
        ]))
    # overrides without the co-type
    with pytest.raises(ValidationError, match="requires the Override"):
        _create(client, _ext_model(_OVR_CTX, [
            {"@type": "Property", "name": "a", "schema": "double",
             "overrides": "dtmi:dtdl:extension:annotation:v1:ValueAnnotation:annotates;1"},
        ]))
    # missing overriding context
    with pytest.raises(ValidationError, match="requires the overriding"):
        _create(client, _ext_model(_ANN_CTX, [
            {"@type": "Telemetry", "name": "temp", "schema": "double"},
            {"@type": ["Property", "ValueAnnotation", "Override"],
             "name": "a", "schema": "double", "annotates": "temp",
             "overrides": "dtmi:dtdl:extension:annotation:v1:ValueAnnotation:annotates;1"},
        ]))


def test_adjunct_types_not_treated_as_semantic_types(client):
    """Historized/ValueAnnotation must not trip the quantitativeTypes
    semantic-type rules (numeric schema is their own schema rule, and
    no QT context is needed)."""
    _create(client, _ext_model(_HIST_CTX, [
        {"@type": ["Property", "Historized"], "name": "label",
         "schema": "string"},
    ]))
    client.delete_all_models()


def test_geojson_coordinate_structure():
    """RFC 7946 §3.1 structure checks inside each geospatial schema —
    positions are arrays of ≥2 numbers, LineStrings need ≥2 positions,
    Polygon rings need ≥4 positions."""
    def reg_for(schema):
        return ModelRegistry([
            _interface(contents=[
                {"@type": "Property", "name": "g", "schema": schema}
            ])
        ])

    def twin(schema_name, gtype, coords):
        return {
            "$dtId": "t1",
            "$metadata": {"$model": "dtmi:v:Test;1"},
            "g": {"type": gtype, "coordinates": coords},
        }

    # accepts
    validate_twin(reg_for("point"), twin("point", "Point", [4.9, 52.3, 12.0]))
    validate_twin(reg_for("multiPoint"),
                  twin("multiPoint", "MultiPoint", [[1, 2], [3, 4]]))
    validate_twin(reg_for("lineString"),
                  twin("lineString", "LineString", [[0, 0], [1, 1]]))
    validate_twin(
        reg_for("multiLineString"),
        twin("multiLineString", "MultiLineString", [[[0, 0], [1, 1]]]),
    )
    validate_twin(
        reg_for("polygon"),
        twin("polygon", "Polygon", [[[0, 0], [0, 1], [1, 1], [0, 0]]]),
    )
    validate_twin(
        reg_for("multiPolygon"),
        twin("multiPolygon", "MultiPolygon",
             [[[[0, 0], [0, 1], [1, 1], [0, 0]]]]),
    )
    # rejects: wrong nesting / too-short / non-numeric / booleans
    for schema, gtype, coords in [
        ("point", "Point", [4.9]),                      # 1 element
        ("point", "Point", ["4.9", "52.3"]),            # strings
        ("point", "Point", [True, False]),              # bools
        ("point", "Point", [[4.9, 52.3]]),              # over-nested
        ("lineString", "LineString", [[0, 0]]),         # 1 position
        ("lineString", "LineString", [0, 0]),           # flat
        ("polygon", "Polygon", [[[0, 0], [0, 1], [1, 1]]]),  # open ring (3)
        ("polygon", "Polygon", [[0, 0], [0, 1], [1, 1], [0, 0]]),  # flat ring
        ("multiPolygon", "MultiPolygon",
         [[[[0, 0], [0, 1], [1, 1]]]]),                  # inner ring short
        ("multiLineString", "MultiLineString", [[[0, 0]]]),  # short LS
    ]:
        with pytest.raises(ValidationError, match="RFC 7946"):
            validate_twin(reg_for(schema), twin(schema, gtype, coords))



# ----------------------------------------------------------------------
# r9 (batch 10): v2 scaled limits, geospatial-in-Array, completed
# QuantitativeTypes v1 unit vocabulary
# ----------------------------------------------------------------------

def test_v2_max_multiplicity_scaled_limit():
    v2 = {"@context": "dtmi:dtdl:context;2"}
    # at the cap: fine
    validate_model(
        _interface(contents=[_rel_content(maxMultiplicity=500)], **v2),
        known_ids=KNOWN,
    )
    with pytest.raises(ValidationError, match="DTDL v2 limit of 500"):
        validate_model(
            _interface(contents=[_rel_content(maxMultiplicity=501)], **v2),
            known_ids=KNOWN,
        )
    # v3 lifts the cap
    validate_model(
        _interface(contents=[_rel_content(maxMultiplicity=501)]),
        known_ids=KNOWN,
    )


def test_geospatial_schema_rejected_as_array_element():
    def arr(element):
        return _interface(contents=[{
            "@type": "Property", "name": "track",
            "schema": {"@type": "Array", "elementSchema": element},
        }])

    validate_model(arr("double"), known_ids=KNOWN)
    with pytest.raises(ValidationError, match="cannot be an Array element"):
        validate_model(arr("point"), known_ids=KNOWN)
    with pytest.raises(ValidationError, match="cannot be an Array element"):
        validate_model(arr("multiPolygon"), known_ids=KNOWN)


def test_quantitative_types_extended_vocabulary():
    def qt(semantic, unit, schema="double"):
        return {
            "@id": "dtmi:v:Qt;1",
            "@type": "Interface",
            "@context": [
                "dtmi:dtdl:context;3",
                "dtmi:dtdl:extension:quantitativeTypes;1",
            ],
            "contents": [{
                "@type": ["Property", semantic],
                "name": "p", "schema": schema, "unit": unit,
            }],
        }

    # batch-10 types with correct units accept
    for s, u in [
        ("Resistance", "ohm"), ("Capacitance", "microfarad"),
        ("Inductance", "millihenry"), ("Torque", "newtonMetre"),
        ("Area", "squareMetre"), ("Volume", "litre"),
        ("VolumeFlowRate", "litrePerSecond"), ("MassFlowRate", "gramPerSecond"),
        ("AngularVelocity", "revolutionPerMinute"), ("Force", "newton"),
        ("MagneticFlux", "weber"), ("SoundPressure", "decibel"),
        ("LuminousFlux", "lumen"), ("ElectricCharge", "coulomb"),
    ]:
        validate_model(qt(s, u), known_ids={"dtmi:v:Qt;1"})
    # wrong unit for a KNOWN type rejects
    for s, u in [
        ("Resistance", "volt"), ("Area", "metre"),
        ("Torque", "newton"), ("AngularVelocity", "hertz"),
    ]:
        with pytest.raises(ValidationError, match="not a valid"):
            validate_model(qt(s, u), known_ids={"dtmi:v:Qt;1"})
