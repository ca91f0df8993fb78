"""Azure Digital Twins SDK golden-fixture compatibility suite.

The reference proves drop-in compatibility by driving the real .NET
``Azure.DigitalTwins.Core`` client against its API service
(``src/AgeDigitalTwins.ApiService.Test/AzureDigitalTwinsSdkIntegrationTests.cs``).
No .NET exists in this container, so this suite transcribes the exact
HTTP request/response pairs that SDK test exercises — same sample
models/twins (``SampleData.cs``), same routes, same encodings — and
drives them over the REAL socket server (``http_api.serve``), asserting
the byte-shape properties the SDK depends on: status codes, the
``$etag`` / ``$metadata.$lastUpdateTime`` fields it surfaces as
``BasicDigitalTwin.ETag`` / ``LastUpdatedOn``, percent-encoded route
values, pagination contracts, and the ``query-charge`` header.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request

import pytest

from pg_age_digitaltwins_spark.client import DigitalTwinsSparkClient
from pg_age_digitaltwins_spark.http_api import ApiService, serve
from pg_age_digitaltwins_spark.store.graph_store import GraphStore

# --- SampleData.cs transcriptions ------------------------------------

DTDL_TEMP_SENSOR = {
    "@id": "dtmi:com:adt:dtsample:tempsensor;1",
    "@type": "Interface",
    "@context": "dtmi:dtdl:context;2",
    "displayName": "Temperature sensor",
    "contents": [
        {"@type": "Property", "name": "temperature", "schema": "double"},
    ],
}
DTDL_CELESTIAL_BODY = {
    "@context": "dtmi:dtdl:context;3",
    "@id": "dtmi:com:contoso:CelestialBody;1",
    "@type": "Interface",
    "displayName": "Celestial body",
    "contents": [
        {"@type": "Property", "name": "name", "schema": "string"},
        {"@type": "Property", "name": "mass", "schema": "double"},
    ],
}
DTDL_PLANET = {
    "@context": "dtmi:dtdl:context;3",
    "@id": "dtmi:com:contoso:Planet;1",
    "@type": "Interface",
    "displayName": "Planet",
    "extends": "dtmi:com:contoso:CelestialBody;1",
    "contents": [
        {
            "@type": "Relationship",
            "name": "satellites",
            "target": "dtmi:com:contoso:Moon;1",
        },
    ],
}
DTDL_MOON = {
    "@context": "dtmi:dtdl:context;3",
    "@id": "dtmi:com:contoso:Moon;1",
    "@type": "Interface",
    "extends": "dtmi:com:contoso:CelestialBody;1",
}
DTDL_CRATER = {
    "@context": "dtmi:dtdl:context;3",
    "@id": "dtmi:com:contoso:Crater;1",
    "@type": "Interface",
    "contents": [],
}
TWIN_EARTH = {
    "$dtId": "earth",
    "$metadata": {"$model": "dtmi:com:contoso:Planet;1"},
    "name": "Earth",
    "mass": 5.972e24,
}
TWIN_LUNA = {
    "$dtId": "luna",
    "$metadata": {"$model": "dtmi:com:contoso:Moon;1"},
    "name": "Luna",
    "mass": 7.342e22,
}
TWIN_CRATER = {"$dtId": "crater1", "$metadata": {"$model": "dtmi:com:contoso:Crater;1"}}


@pytest.fixture()
def base_url(spark):
    # one fresh service per test — the reference SDK suite stands up a
    # fresh Aspire app host per test and deletes the graph on dispose
    svc = ApiService(DigitalTwinsSparkClient(GraphStore.empty(spark)))
    server = serve(svc)
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def call(base: str, method: str, path: str, body=None, headers=None):
    """One HTTP exchange over the real socket, like the SDK's pipeline."""
    data = None if body is None else json.dumps(body).encode()
    req = urllib.request.Request(base + path, data=data, method=method)
    req.add_header("Authorization", "Bearer fake-token")  # CustomTokenCredential
    if data is not None:
        req.add_header("Content-Type", "application/json")
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    try:
        with urllib.request.urlopen(req) as resp:
            raw = resp.read()
            return resp.status, (json.loads(raw) if raw else None), dict(resp.headers)
    except urllib.error.HTTPError as e:
        raw = e.read()
        return e.code, (json.loads(raw) if raw else None), dict(e.headers)


def test_put_twin_with_unknown_model_returns_400(base_url):
    """CreateOrUpdateDigitalTwin_WithBasicDigitalTwinModelNotFound."""
    status, body, _ = call(
        base_url, "PUT", "/digitaltwins/myTwin",
        {
            "$dtId": "myTwin",
            "$metadata": {"$model": "dtmi:com:example:Thermostat;1"},
            "Temperature": 42,
        },
    )
    assert status == 400
    assert body  # RFC-7807-style error body the SDK surfaces as message


def test_create_models_then_put_twin_echoes_twin(base_url):
    """CreateOrUpdateDigitalTwin_WithBasicDigitalTwin_ReturnsTwin."""
    status, created, _ = call(base_url, "POST", "/models", [DTDL_TEMP_SENSOR])
    assert status in (200, 201)
    status, twin, _ = call(
        base_url, "PUT", "/digitaltwins/myTwin",
        {
            "$dtId": "myTwin",
            "$metadata": {"$model": "dtmi:com:adt:dtsample:tempsensor;1"},
            "temperature": 42,
        },
    )
    assert status == 200
    # BasicDigitalTwin deserialization contract
    assert twin["$dtId"] == "myTwin"
    assert twin["$etag"].startswith('W/"')
    assert twin["$metadata"]["$model"] == "dtmi:com:adt:dtsample:tempsensor;1"
    assert "$lastUpdateTime" in twin["$metadata"]  # → LastUpdatedOn
    assert twin["temperature"] == 42


def test_query_simple_returns_created_twin(base_url):
    """Query_WithSimpleQuery_ReturnsResult."""
    call(base_url, "POST", "/models", [DTDL_CRATER])
    call(base_url, "PUT", "/digitaltwins/crater1", TWIN_CRATER)
    status, body, headers = call(
        base_url, "POST", "/query", {"query": "SELECT * FROM digitaltwins"}
    )
    assert status == 200
    assert "query-charge" in headers  # SDK exposes QueryChargeHelper
    ids = [t["$dtId"] for t in body["value"]]
    assert "crater1" in ids
    # every row is a full twin document (SELECT *)
    row = next(t for t in body["value"] if t["$dtId"] == "crater1")
    assert row["$metadata"]["$model"] == "dtmi:com:contoso:Crater;1"


def test_relationship_create_and_list(base_url):
    """ListRelationships_WithValidId_ReturnsRelationships."""
    call(
        base_url, "POST", "/models",
        [DTDL_CELESTIAL_BODY, DTDL_PLANET, DTDL_MOON, DTDL_CRATER],
    )
    call(base_url, "PUT", "/digitaltwins/earth", TWIN_EARTH)
    call(base_url, "PUT", "/digitaltwins/luna", TWIN_LUNA)
    rel = {
        "$relationshipId": "myRelationshipId",
        "$sourceId": "earth",
        "$targetId": "luna",
        "$relationshipName": "satellites",
    }
    status, created, _ = call(
        base_url, "PUT", "/digitaltwins/earth/relationships/myRelationshipId", rel
    )
    assert status == 200
    assert created["$relationshipId"] == "myRelationshipId"
    assert created["$etag"].startswith('W/"')

    status, body, _ = call(base_url, "GET", "/digitaltwins/earth/relationships")
    assert status == 200
    rels = body["value"]  # AsyncPageable<BasicRelationship> page shape
    assert any(
        r["$relationshipId"] == "myRelationshipId"
        and r["$sourceId"] == "earth"
        and r["$targetId"] == "luna"
        and r["$relationshipName"] == "satellites"
        for r in rels
    )


def test_get_models_include_definition(base_url):
    """GetModels_WithValidModel_ReturnsModelDefinitions."""
    call(base_url, "POST", "/models", [DTDL_CELESTIAL_BODY, DTDL_CRATER])
    status, body, _ = call(
        base_url, "GET", "/models?includeModelDefinition=true"
    )
    assert status == 200
    models = {m["id"]: m for m in body["value"]}
    assert "dtmi:com:contoso:Crater;1" in models
    for m in models.values():
        assert m.get("model")  # DigitalTwinsModelData.DtdlModel non-null
    # the definition round-trips as the uploaded DTDL (the REST field is
    # the JSON object; the SDK exposes its raw text as DtdlModel)
    crater = models["dtmi:com:contoso:Crater;1"]["model"]
    if isinstance(crater, str):
        crater = json.loads(crater)
    assert crater["@id"] == "dtmi:com:contoso:Crater;1"
    # without the flag the definition is omitted (smaller pages)
    _, body2, _ = call(base_url, "GET", "/models")
    assert all(not m.get("model") for m in body2["value"])


def test_query_pagination_pages_of_one(base_url):
    """Query_SupportsPagination: pageSizeHint=1 → max-items-per-page
    header; every page ≤1 row, continuation tokens chain, total 3."""
    call(base_url, "POST", "/models", [DTDL_CRATER])
    for tid in ("crater1", "crater2", "crater3"):
        doc = dict(TWIN_CRATER, **{"$dtId": tid})
        call(base_url, "PUT", f"/digitaltwins/{tid}", doc)
    q = "SELECT * FROM digitaltwins WHERE STARTSWITH($dtId, 'crater')"
    seen: list[str] = []
    pages = 0
    body = {"query": q}
    while True:
        status, out, _ = call(
            base_url, "POST", "/query", body, headers={"max-items-per-page": "1"}
        )
        assert status == 200
        assert len(out["value"]) <= 1
        seen += [t["$dtId"] for t in out["value"]]
        pages += 1
        if "continuationToken" not in out:
            break
        body = {"continuationToken": out["continuationToken"]}
        assert pages < 10
    assert pages > 1
    assert sorted(seen) == ["crater1", "crater2", "crater3"]


def test_percent_encoded_twin_id_roundtrip(base_url):
    """CreateAndGetDigitalTwin_WithPercentEncodedId_WorksCorrectly: the
    SDK URL-encodes '10%B2H6_H2' → '10%25B2H6_H2'; the service must
    decode route values like ASP.NET does."""
    call(base_url, "POST", "/models", [DTDL_TEMP_SENSOR])
    twin_id = "10%B2H6_H2"
    quoted = urllib.parse.quote(twin_id, safe="")
    assert quoted == "10%25B2H6_H2"
    doc = {
        "$dtId": twin_id,
        "$metadata": {"$model": "dtmi:com:adt:dtsample:tempsensor;1"},
        "temperature": 42,
    }
    status, created, _ = call(base_url, "PUT", f"/digitaltwins/{quoted}", doc)
    assert status == 200
    assert created["$dtId"] == twin_id
    status, fetched, _ = call(base_url, "GET", f"/digitaltwins/{quoted}")
    assert status == 200
    assert fetched["$dtId"] == twin_id
    assert fetched["temperature"] == 42


def test_etag_and_last_update_time_consistency(base_url):
    """CreateAndGetDigitalTwin_VerifiesEtagAndLastUpdateTime."""
    call(base_url, "POST", "/models", [DTDL_TEMP_SENSOR])
    doc = {
        "$dtId": "testTwinEtag",
        "$metadata": {"$model": "dtmi:com:adt:dtsample:tempsensor;1"},
        "temperature": 42,
    }
    _, created, _ = call(base_url, "PUT", "/digitaltwins/testTwinEtag", doc)
    assert created["$etag"] and created["$metadata"]["$lastUpdateTime"]
    _, fetched, _ = call(base_url, "GET", "/digitaltwins/testTwinEtag")
    assert fetched["$etag"] == created["$etag"]
    assert (
        fetched["$metadata"]["$lastUpdateTime"]
        == created["$metadata"]["$lastUpdateTime"]
    )
    from datetime import datetime

    # DateTimeOffset.Parse-able timestamp
    datetime.fromisoformat(
        fetched["$metadata"]["$lastUpdateTime"].replace("Z", "+00:00")
    )
