"""HTTP API parity layer (SURVEY.md §2.5): routes, verbs, status codes,
headers, and JSON shapes modeled on the reference's endpoint tests and
``AzureDigitalTwinsSdkIntegrationTests``.
"""

from __future__ import annotations

import json

import pytest

from pg_age_digitaltwins_spark.client import DigitalTwinsSparkClient
from pg_age_digitaltwins_spark.http_api import ApiService, Request, serve
from pg_age_digitaltwins_spark.store.graph_store import GraphStore

MODEL = {
    "@id": "dtmi:ht:Room;1",
    "@type": "Interface",
    "@context": "dtmi:dtdl:context;3",
    "contents": [
        {"@type": "Property", "name": "temperature", "schema": "double"},
        {"@type": "Property", "name": "name", "schema": "string"},
        {"@type": "Property", "name": "embedding", "schema": {"@type": "Array", "elementSchema": "double"}},
        {
            "@type": "Relationship",
            "name": "adjacentTo",
            "properties": [{"@type": "Property", "name": "distance", "schema": "double"}],
        },
    ],
}


@pytest.fixture()
def api(spark):
    client = DigitalTwinsSparkClient(GraphStore.empty(spark))
    svc = ApiService(client)
    resp = svc.handle(Request("POST", "/models", body=[MODEL]))
    assert resp.status == 200
    for tid, temp, emb in [("r1", 20.0, [1.0, 0.0]), ("r2", 25.0, [0.0, 1.0])]:
        resp = svc.handle(
            Request(
                "PUT",
                f"/digitaltwins/{tid}",
                body={
                    "$metadata": {"$model": "dtmi:ht:Room;1"},
                    "temperature": temp,
                    "name": f"room {tid}",
                    "embedding": emb,
                },
            )
        )
        assert resp.status == 200, resp.body
    resp = svc.handle(
        Request(
            "PUT",
            "/digitaltwins/r1/relationships/rel1",
            body={"$targetId": "r2", "$relationshipName": "adjacentTo", "distance": 3.5},
        )
    )
    assert resp.status == 200, resp.body
    return svc


# ----------------------------------------------------------------------
# twins
# ----------------------------------------------------------------------

def test_twin_get_put_patch_delete(api):
    got = api.handle(Request("GET", "/digitaltwins/r1"))
    assert got.status == 200
    assert got.body["temperature"] == 20.0
    assert got.body["$etag"].startswith('W/"')

    patched = api.handle(
        Request(
            "PATCH",
            "/digitaltwins/r1",
            body=[{"op": "replace", "path": "/temperature", "value": 21.5}],
        )
    )
    assert patched.status == 204
    assert api.handle(Request("GET", "/digitaltwins/r1")).body["temperature"] == 21.5

    missing = api.handle(Request("GET", "/digitaltwins/nope"))
    assert missing.status == 404
    assert missing.body["type"]  # ProblemDetails shape
    assert missing.body["status"] == 404

    # deleting a twin with edges → 400 (reference: edge guard)
    blocked = api.handle(Request("DELETE", "/digitaltwins/r1"))
    assert blocked.status == 400
    api.handle(Request("DELETE", "/digitaltwins/r1/relationships/rel1"))
    assert api.handle(Request("DELETE", "/digitaltwins/r1")).status == 204
    assert api.handle(Request("GET", "/digitaltwins/r1")).status == 404


def test_twin_etag_precondition(api):
    etag = api.handle(Request("GET", "/digitaltwins/r1")).body["$etag"]
    # If-None-Match: * on existing twin → 412
    resp = api.handle(
        Request(
            "PUT",
            "/digitaltwins/r1",
            body={"$metadata": {"$model": "dtmi:ht:Room;1"}, "temperature": 1.0},
            headers={"If-None-Match": "*"},
        )
    )
    assert resp.status == 412
    # PATCH with stale If-Match → 412
    resp = api.handle(
        Request(
            "PATCH",
            "/digitaltwins/r1",
            body=[{"op": "replace", "path": "/temperature", "value": 0.0}],
            headers={"If-Match": 'W/"stale"'},
        )
    )
    assert resp.status == 412
    # PATCH with the current etag succeeds
    resp = api.handle(
        Request(
            "PATCH",
            "/digitaltwins/r1",
            body=[{"op": "replace", "path": "/temperature", "value": 0.0}],
            headers={"If-Match": etag},
        )
    )
    assert resp.status == 204


def test_twins_batch(api):
    body = [
        {"$dtId": "b1", "$metadata": {"$model": "dtmi:ht:Room;1"}, "temperature": 1.0},
        {"$dtId": "b2", "$metadata": {"$model": "dtmi:ht:Room;1"}, "temperature": 2.0},
        {"$dtId": "b3", "$metadata": {"$model": "dtmi:missing;1"}},
    ]
    resp = api.handle(Request("POST", "/digitaltwins", body=body))
    assert resp.status == 200
    statuses = [r["status"] for r in resp.body]
    assert statuses.count("ok") == 2 and statuses.count("error") == 1


def test_twin_search_hybrid(api):
    resp = api.handle(
        Request("POST", "/digitaltwins/search", body={"vector": [1.0, 0.0], "limit": 2})
    )
    assert resp.status == 200
    assert [t["$dtId"] for t in resp.body] == ["r1", "r2"]  # r1 is closest
    with_filter = api.handle(
        Request(
            "POST",
            "/digitaltwins/search",
            body={"vector": [0.0, 1.0], "modelFilter": "dtmi:ht:Room;1", "limit": 1},
        )
    )
    assert [t["$dtId"] for t in with_filter.body] == ["r2"]
    assert api.handle(Request("POST", "/digitaltwins/search", body={})).status == 400


# ----------------------------------------------------------------------
# relationships
# ----------------------------------------------------------------------

def test_relationship_routes(api):
    got = api.handle(Request("GET", "/digitaltwins/r1/relationships/rel1"))
    assert got.status == 200 and got.body["distance"] == 3.5

    listed = api.handle(Request("GET", "/digitaltwins/r1/relationships"))
    assert listed.status == 200
    assert [r["$relationshipId"] for r in listed.body["value"]] == ["rel1"]
    assert "continuationToken" not in listed.body

    incoming = api.handle(Request("GET", "/digitaltwins/r2/incomingrelationships"))
    assert [r["$relationshipId"] for r in incoming.body["value"]] == ["rel1"]

    patched = api.handle(
        Request(
            "PATCH",
            "/digitaltwins/r1/relationships/rel1",
            body=[{"op": "replace", "path": "/distance", "value": 9.0}],
        )
    )
    assert patched.status == 204
    assert (
        api.handle(Request("GET", "/digitaltwins/r1/relationships/rel1")).body["distance"]
        == 9.0
    )
    # patching $targetId is rejected
    bad = api.handle(
        Request(
            "PATCH",
            "/digitaltwins/r1/relationships/rel1",
            body=[{"op": "replace", "path": "/$targetId", "value": "r1"}],
        )
    )
    assert bad.status == 400

    assert (
        api.handle(Request("DELETE", "/digitaltwins/r1/relationships/rel1")).status == 204
    )
    assert api.handle(Request("GET", "/digitaltwins/r1/relationships/rel1")).status == 404


def test_relationship_put_backfills_ids(api):
    resp = api.handle(
        Request(
            "PUT",
            "/digitaltwins/r2/relationships/rel2",
            body={"$targetId": "r1", "$relationshipName": "adjacentTo"},
        )
    )
    assert resp.status == 200
    assert resp.body["$sourceId"] == "r2" and resp.body["$relationshipId"] == "rel2"


def test_relationships_batch_and_paging(api):
    body = [
        {
            "$relationshipId": f"p{i}",
            "$sourceId": "r2",
            "$targetId": "r1",
            "$relationshipName": "adjacentTo",
        }
        for i in range(5)
    ]
    assert api.handle(Request("POST", "/relationships", body=body)).status == 200
    page1 = api.handle(
        Request(
            "GET",
            "/digitaltwins/r2/relationships",
            headers={"max-items-per-page": "3"},
        )
    )
    assert len(page1.body["value"]) == 3 and page1.body["continuationToken"]
    page2 = api.handle(
        Request(
            "GET",
            "/digitaltwins/r2/relationships",
            query={"continuationToken": [page1.body["continuationToken"]]},
            headers={"max-items-per-page": "3"},
        )
    )
    ids = [r["$relationshipId"] for r in page1.body["value"] + page2.body["value"]]
    assert len(ids) == 5 and len(set(ids)) == 5
    assert "continuationToken" not in page2.body


# ----------------------------------------------------------------------
# components / telemetry
# ----------------------------------------------------------------------

def test_component_routes(spark):
    models = [
        {
            "@id": "dtmi:ht:Thermo;1",
            "@type": "Interface",
            "@context": "dtmi:dtdl:context;3",
            "contents": [{"@type": "Property", "name": "setpoint", "schema": "double"}],
        },
        {
            "@id": "dtmi:ht:Hvac;1",
            "@type": "Interface",
            "@context": "dtmi:dtdl:context;3",
            "contents": [
                {"@type": "Component", "name": "thermostat", "schema": "dtmi:ht:Thermo;1"}
            ],
        },
    ]
    svc = ApiService(DigitalTwinsSparkClient(GraphStore.empty(spark)))
    assert svc.handle(Request("POST", "/models", body=models)).status == 200
    assert (
        svc.handle(
            Request(
                "PUT",
                "/digitaltwins/h1",
                body={
                    "$metadata": {"$model": "dtmi:ht:Hvac;1"},
                    "thermostat": {"$metadata": {}, "setpoint": 19.0},
                },
            )
        ).status
        == 200
    )
    got = svc.handle(Request("GET", "/digitaltwins/h1/components/thermostat"))
    assert got.status == 200 and got.body["setpoint"] == 19.0
    assert (
        svc.handle(
            Request(
                "PATCH",
                "/digitaltwins/h1/components/thermostat",
                body=[{"op": "replace", "path": "/setpoint", "value": 22.0}],
            )
        ).status
        == 204
    )
    assert (
        svc.handle(Request("GET", "/digitaltwins/h1/components/thermostat")).body[
            "setpoint"
        ]
        == 22.0
    )


def test_telemetry_routes(api):
    resp = api.handle(
        Request(
            "POST",
            "/digitaltwins/r1/telemetry",
            body={"temp": 3.5},
            headers={"Message-Id": "m-1"},
        )
    )
    assert resp.status == 204
    comp = api.handle(
        Request("POST", "/digitaltwins/r1/telemetry/components/thermo", body={"x": 1})
    )
    assert comp.status == 204
    evs = api.client.telemetry_events
    assert evs[0]["messageId"] == "m-1" and evs[0]["telemetry"] == {"temp": 3.5}
    assert evs[1]["componentName"] == "thermo"
    # unknown twin → 404 (twin must exist, reference parity)
    assert (
        api.handle(Request("POST", "/digitaltwins/nope/telemetry", body={})).status == 404
    )


# ----------------------------------------------------------------------
# query
# ----------------------------------------------------------------------

def test_query_route_with_paging_and_charge(api):
    resp = api.handle(
        Request(
            "POST",
            "/query",
            body={"query": "SELECT $dtId AS dt_id FROM DIGITALTWINS"},
            headers={"max-items-per-page": "1"},
        )
    )
    assert resp.status == 200
    assert len(resp.body["value"]) == 1
    assert float(resp.headers["query-charge"]) > 0
    tok = resp.body["continuationToken"]
    resp2 = api.handle(
        Request(
            "POST",
            "/query",
            body={"continuationToken": tok},
            headers={"max-items-per-page": "1"},
        )
    )
    assert resp2.status == 200 and len(resp2.body["value"]) == 1
    both = {r["dt_id"] for r in resp.body["value"] + resp2.body["value"]}
    assert both == {"r1", "r2"}

    assert api.handle(Request("POST", "/query", body={})).status == 400
    bad = api.handle(Request("POST", "/query", body={"query": "SELECT FROM x y z"}))
    assert bad.status == 400


# ----------------------------------------------------------------------
# models
# ----------------------------------------------------------------------

def test_model_routes(api):
    listed = api.handle(Request("GET", "/models"))
    assert listed.status == 200
    assert len(listed.body["value"]) == 1
    assert "model" not in listed.body["value"][0]  # definition omitted by default
    with_def = api.handle(
        Request("GET", "/models", query={"includeModelDefinition": ["true"]})
    )
    assert with_def.body["value"][0]["model"]["@id"] == "dtmi:ht:Room;1"

    # model ids are URL-encoded in paths
    got = api.handle(Request("GET", "/models/dtmi%3Aht%3ARoom%3B1"))
    assert got.status == 200
    assert "properties" not in got.body
    # ?includeBaseModelContents=true merges contents per kind
    # (ModelsEndpoints.cs:116-123)
    merged = api.handle(
        Request("GET", "/models/dtmi%3Aht%3ARoom%3B1",
                query={"includeBaseModelContents": ["true"]})
    )
    assert merged.status == 200
    assert sorted(p["name"] for p in merged.body["properties"]) == [
        "embedding", "name", "temperature",
    ]
    assert [r["name"] for r in merged.body["relationships"]] == ["adjacentTo"]
    assert api.handle(Request("GET", "/models/dtmi:nope;1")).status == 404

    # delete succeeds (reference guards only model-to-model references,
    # Models.cs:587-592) and the model is gone
    assert api.handle(Request("DELETE", "/models/dtmi:ht:Room;1")).status == 204
    assert api.handle(Request("GET", "/models/dtmi:ht:Room;1")).status == 404


def test_models_search_route(api):
    resp = api.handle(Request("POST", "/models/search", body={"query": "Room"}))
    assert resp.status == 200
    assert resp.body and resp.body[0]["id"] == "dtmi:ht:Room;1"


# ----------------------------------------------------------------------
# import jobs
# ----------------------------------------------------------------------

def _import_file(tmp_path, n=3):
    lines = [
        json.dumps({"Section": "Header"}),
        json.dumps({"fileVersion": "1.0.0"}),
        json.dumps({"Section": "Models"}),
        json.dumps(
            {
                "@id": "dtmi:imp:Thing;1",
                "@type": "Interface",
                "@context": "dtmi:dtdl:context;3",
                "contents": [{"@type": "Property", "name": "x", "schema": "double"}],
            }
        ),
        json.dumps({"Section": "Twins"}),
        *[
            json.dumps(
                {"$dtId": f"i{k}", "$metadata": {"$model": "dtmi:imp:Thing;1"}, "x": 1.0}
            )
            for k in range(n)
        ],
    ]
    p = tmp_path / "import.ndjson"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_import_job_routes(spark, tmp_path):
    svc = ApiService(DigitalTwinsSparkClient(GraphStore.empty(spark)))
    path = _import_file(tmp_path)
    created = svc.handle(
        Request("PUT", "/jobs/imports/job1", body={"inputBlobUri": f"file://{path}"})
    )
    assert created.status == 201, created.body
    assert created.body["status"] == "succeeded"
    assert created.body["twinsCreated"] == 3

    assert svc.handle(Request("GET", "/digitaltwins/i0")).status == 200

    dup = svc.handle(
        Request("PUT", "/jobs/imports/job1", body={"inputBlobUri": path})
    )
    assert dup.status == 409

    got = svc.handle(Request("GET", "/jobs/imports/job1"))
    assert got.status == 200 and got.body["id"] == "job1"
    # lifecycle timestamps serialize with the ADT API names, camelCase
    # ISO-8601 UTC (ApiService/Models/ImportJob.cs:23-38); a finished
    # job carries all four plus the request's blob URI echo
    for key in (
        "createdDateTime", "lastActionDateTime", "finishedDateTime", "purgeDateTime",
    ):
        assert got.body[key].endswith("Z"), (key, got.body)
    assert got.body["purgeDateTime"] > got.body["createdDateTime"]
    assert got.body["inputBlobUri"].startswith("file://")
    listed = svc.handle(Request("GET", "/jobs/imports"))
    assert [j["id"] for j in listed.body["value"]] == ["job1"]

    # finished job: cancel → 400, resume → 400
    assert svc.handle(Request("POST", "/jobs/imports/job1/cancel")).status == 400
    assert svc.handle(Request("POST", "/jobs/imports/job1/resume")).status == 400

    assert svc.handle(Request("DELETE", "/jobs/imports/job1")).status == 204
    assert svc.handle(Request("GET", "/jobs/imports/job1")).status == 404
    assert svc.handle(Request("POST", "/jobs/imports/nope/cancel")).status == 404


def test_delete_job_routes(spark, tmp_path):
    """/jobs/deletions: create runs the phased delete job and answers
    the deletion counters; get/list/remove follow the import-job
    contract (AgeDigitalTwinsClient.Jobs.cs:460-580 surface)."""
    svc = ApiService(DigitalTwinsSparkClient(GraphStore.empty(spark)))
    path = _import_file(tmp_path)
    svc.handle(Request("PUT", "/jobs/imports/imp1",
                       body={"inputBlobUri": f"file://{path}"}))
    created = svc.handle(Request("PUT", "/jobs/deletions/djob1"))
    assert created.status == 201, created.body
    assert created.body["status"] == "succeeded"
    assert created.body["twinsDeleted"] == 3
    assert created.body["relationshipsDeleted"] == 0  # no rel section in fixture
    assert created.body["modelsDeleted"] == 1
    # graph is empty afterwards
    assert svc.handle(Request("GET", "/digitaltwins/i0")).status == 404

    assert svc.handle(Request("PUT", "/jobs/deletions/djob1")).status == 409
    got = svc.handle(Request("GET", "/jobs/deletions/djob1"))
    assert got.status == 200 and got.body["id"] == "djob1"
    listed = svc.handle(Request("GET", "/jobs/deletions"))
    assert [j["id"] for j in listed.body["value"]] == ["djob1"]
    # import jobs do not leak into the deletions listing (and vice versa)
    assert svc.handle(Request("GET", "/jobs/deletions/imp1")).status == 404
    assert svc.handle(Request("DELETE", "/jobs/deletions/djob1")).status == 204
    assert svc.handle(Request("GET", "/jobs/deletions/djob1")).status == 404


# ----------------------------------------------------------------------
# rate limiting
# ----------------------------------------------------------------------

def test_weighted_query_rate_limit(api):
    clock = [0.0]
    api.rate_limiting = True
    from pg_age_digitaltwins_spark.http_api import TokenBucketLimiter

    api.limiters["query"] = TokenBucketLimiter(
        token_limit=20, tokens_per_period=20, clock=lambda: clock[0]
    )
    q = {"query": "SELECT $dtId AS dt_id FROM DIGITALTWINS"}
    first = api.handle(Request("POST", "/query", body=q))
    assert first.status == 200  # charge 2 rows + 2 props = 4... bucket 20
    # drain the bucket
    statuses = [api.handle(Request("POST", "/query", body=q)).status for _ in range(8)]
    assert 429 in statuses
    clock[0] += 10.0  # replenish
    assert api.handle(Request("POST", "/query", body=q)).status == 200
    api.rate_limiting = False


def test_fixed_window_rate_limit(spark):
    clock = [0.0]
    svc = ApiService(
        DigitalTwinsSparkClient(GraphStore.empty(spark)),
        rate_limiting=True,
        limiter_clock=lambda: clock[0],
    )
    from pg_age_digitaltwins_spark.http_api import FixedWindowLimiter

    svc.limiters["light"] = FixedWindowLimiter(2, clock=lambda: clock[0])
    s = [svc.handle(Request("GET", "/digitaltwins/x")).status for _ in range(3)]
    assert s == [404, 404, 429]  # limit 2/window; 404 still consumes
    clock[0] += 1.5
    assert svc.handle(Request("GET", "/digitaltwins/x")).status == 404


# ----------------------------------------------------------------------
# real socket
# ----------------------------------------------------------------------

def test_http_server_roundtrip(api):
    import http.client

    server = serve(api)
    try:
        port = server.server_address[1]
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)

        conn.request(
            "PUT",
            "/digitaltwins/sock1",
            body=json.dumps(
                {"$metadata": {"$model": "dtmi:ht:Room;1"}, "temperature": 7.0}
            ),
            headers={"Content-Type": "application/json"},
        )
        r = conn.getresponse()
        assert r.status == 200
        doc = json.loads(r.read())
        assert doc["temperature"] == 7.0

        conn.request(
            "POST",
            "/query",
            body=json.dumps({"query": "SELECT COUNT() FROM DIGITALTWINS"}),
        )
        r = conn.getresponse()
        assert r.status == 200
        assert r.getheader("query-charge") is not None
        assert json.loads(r.read())["value"][0]["count"] == 3

        conn.request("GET", "/digitaltwins/sock1/relationships?relationshipName=x")
        r = conn.getresponse()
        assert r.status == 200 and json.loads(r.read())["value"] == []

        conn.request("DELETE", "/digitaltwins/sock1")
        assert conn.getresponse().status == 204
        conn.close()
    finally:
        server.shutdown()


def test_graph_admin_routes(api):
    assert api.handle(Request("GET", "/digitaltwins/r1")).status == 200
    assert api.handle(Request("DELETE", "/graph/delete")).status == 204
    assert api.handle(Request("GET", "/digitaltwins/r1")).status == 404
    assert api.handle(Request("GET", "/models")).body["value"] == []
    assert api.handle(Request("PUT", "/graph/create")).status == 204


def test_import_job_output_log(spark, tmp_path):
    svc = ApiService(DigitalTwinsSparkClient(GraphStore.empty(spark)))
    path = _import_file(tmp_path)
    out = tmp_path / "joblog.ndjson"
    created = svc.handle(
        Request(
            "PUT",
            "/jobs/imports/logjob",
            body={"inputBlobUri": f"file://{path}", "outputBlobUri": f"file://{out}"},
        )
    )
    assert created.status == 201
    lines = [json.loads(line) for line in out.read_text().splitlines()]
    assert lines[-1] == {"status": "Succeeded", "errorCount": 0}


def test_sdk_scenarios_over_socket(spark):
    """Scenario parity with AzureDigitalTwinsSdkIntegrationTests:
    model-not-found -> 400, percent-encoded twin ids roundtrip, ETag +
    $lastUpdateTime stable across create/get, query pagination via the
    max-items-per-page header."""
    import http.client
    import urllib.parse

    svc = ApiService(DigitalTwinsSparkClient(GraphStore.empty(spark)))
    server = serve(svc)
    try:
        port = server.server_address[1]
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)

        def call(method, path, body=None, headers=None):
            conn.request(
                method, path,
                body=None if body is None else json.dumps(body),
                headers=headers or {},
            )
            r = conn.getresponse()
            raw = r.read()
            return r.status, (json.loads(raw) if raw else None), dict(r.getheaders())

        # model not found -> 400 (CreateOrUpdateDigitalTwin_...ModelNotFound)
        st, body, _ = call(
            "PUT", "/digitaltwins/t0",
            {"$metadata": {"$model": "dtmi:nope;1"}, "temperature": 1},
        )
        assert st == 404 or st == 400  # ModelNotFound family

        st, _, _ = call("POST", "/models", [MODEL])
        assert st == 200

        # percent-encoded id roundtrip (twin id "10%B2H6_H2")
        twin_id = "10%B2H6_H2"
        enc = urllib.parse.quote(twin_id, safe="")
        st, created, _ = call(
            "PUT", f"/digitaltwins/{enc}",
            {"$metadata": {"$model": "dtmi:ht:Room;1"}, "temperature": 42.0},
        )
        assert st == 200 and created["$dtId"] == twin_id
        st, fetched, _ = call("GET", f"/digitaltwins/{enc}")
        assert st == 200 and fetched["temperature"] == 42.0

        # ETag + $lastUpdateTime identical between create response & GET
        assert created["$etag"] == fetched["$etag"]
        assert (
            created["$metadata"]["$lastUpdateTime"]
            == fetched["$metadata"]["$lastUpdateTime"]
        )

        # pagination (Query_SupportsPagination): 3 twins, 2 per page
        for i in range(2):
            call("PUT", f"/digitaltwins/p{i}",
                 {"$metadata": {"$model": "dtmi:ht:Room;1"}, "temperature": float(i)})
        st, page1, hdrs = call(
            "POST", "/query",
            {"query": "SELECT $dtId AS dt_id FROM DIGITALTWINS"},
            {"max-items-per-page": "2"},
        )
        assert st == 200 and len(page1["value"]) == 2
        assert "query-charge" in hdrs
        st, page2, _ = call(
            "POST", "/query",
            {"continuationToken": page1["continuationToken"]},
            {"max-items-per-page": "2"},
        )
        assert st == 200
        seen = [r["dt_id"] for r in page1["value"] + page2["value"]]
        assert len(seen) == 3 and len(set(seen)) == 3
        conn.close()
    finally:
        server.shutdown()


def test_page_size_clamped_to_one(api):
    """max-items-per-page <= 0 must not produce an empty page with a
    self-pointing continuation token (infinite paging loop)."""
    r = api.handle(Request("GET", "/models", headers={"max-items-per-page": "0"}))
    assert r.status == 200
    assert len(r.body["value"]) >= 1


def test_twin_search_escapes_model_filter_and_validates_prop(api):
    # single quote in modelFilter must not break out of the Cypher
    # string literal — it matches nothing, not a parse/injection path
    r = api.handle(Request("POST", "/digitaltwins/search", body={
        "vector": [1.0], "modelFilter": "x' RETURN t //",
    }))
    assert r.status == 200 and r.body == []
    # embeddingProperty must be a plain identifier
    r = api.handle(Request("POST", "/digitaltwins/search", body={
        "vector": [1.0], "embeddingProperty": "e, 1) RETURN t //",
    }))
    assert r.status == 400


def test_query_charge_settled_before_and_after(api):
    """The minimum charge is acquired BEFORE the engine runs (a 429'd
    request does no work) and the remainder is debited after — a heavy
    page drives the bucket negative and blocks the next request."""
    from pg_age_digitaltwins_spark.http_api import TokenBucketLimiter

    clock = [0.0]
    svc = ApiService(api.client, rate_limiting=True,
                     limiter_clock=lambda: clock[0])
    svc.limiters["query"] = TokenBucketLimiter(
        token_limit=3, tokens_per_period=1, period_s=1.0,
        clock=lambda: clock[0],
    )
    q = {"query": "SELECT $dtId AS dt_id FROM DIGITALTWINS"}
    r1 = svc.handle(Request("POST", "/query", body=q))
    assert r1.status == 200
    charge = float(r1.headers["query-charge"])
    assert charge > 3  # the page cost more than the whole bucket
    # bucket is now negative: the NEXT query is rejected up front
    r2 = svc.handle(Request("POST", "/query", body=q))
    assert r2.status == 429


def test_health_endpoint(api):
    from pg_age_digitaltwins_spark.streaming.sinks import (
        EventRouter,
        InMemoryEventSink,
        StreamingHealthListener,
    )

    # no streaming attached: API-up is the check
    r = api.handle(Request("GET", "/health"))
    assert r.status == 200 and r.body["status"] == "Healthy"

    # attached but no live query -> degraded 503
    router = EventRouter()
    router.add_sink(InMemoryEventSink("m"))
    health = StreamingHealthListener(router)
    svc = ApiService(api.client, health=health)
    r = svc.handle(Request("GET", "/health"))
    assert r.status == 503 and r.body["status"] == "Unhealthy"

    # a live unexceptional query flips it healthy
    health.on_started("q1", "change-stream")
    r = svc.handle(Request("GET", "/health"))
    assert r.status == 200 and r.body["status"] == "Healthy"
    assert r.body["checks"]["sinks"]["totalSinks"] == 1

    # a sink with dead letters degrades it again
    router.sinks["m"].dlq.append({"event": {}, "error": "x", "sink": "m"})
    r = svc.handle(Request("GET", "/health"))
    assert r.status == 503
    assert r.body["checks"]["sinks"]["unhealthySinkNames"] == ["m"]


def test_models_pagination_next_link(spark):
    """GetModels_Pagination_FirstPageHasNextLinkWithContinuationToken /
    _AllModelsReturnedAcrossPages (ModelsIntegrationTests): paged model
    listing carries a followable nextLink that re-targets the same URL
    with the continuation token swapped in."""
    import urllib.parse as up

    client = DigitalTwinsSparkClient(GraphStore.empty(spark))
    svc = ApiService(client)
    models = [
        {"@id": f"dtmi:pg:M{i};1", "@type": "Interface",
         "@context": "dtmi:dtdl:context;3", "contents": []}
        for i in range(5)
    ]
    assert svc.handle(Request("POST", "/models", body=models)).status == 200

    seen, url = [], "/models?includeModelDefinition=true"
    for _ in range(10):
        parsed = up.urlparse(url)
        query = {k: v for k, v in up.parse_qs(parsed.query).items()}
        r = svc.handle(Request(
            "GET", parsed.path, query=query,
            headers={"max-items-per-page": "2", "host": "unit.test:8080"},
        ))
        assert r.status == 200
        seen += [m["model"]["@id"] for m in r.body["value"]]
        nl = r.body.get("nextLink")
        if nl is None:
            assert "continuationToken" not in r.body
            break
        assert nl.startswith("http://unit.test:8080/models?")
        assert "includeModelDefinition=true" in nl
        assert up.parse_qs(up.urlparse(nl).query)["continuationToken"]
        url = nl[len("http://unit.test:8080"):]
    assert sorted(seen) == [f"dtmi:pg:M{i};1" for i in range(5)]


def test_parse_user_id_claim_precedence():
    """RequestHelperTests parity: NameIdentifier claim wins over sub;
    sub alone works; anonymous / claimless → None
    (Helpers/RequestHelper.cs:106-111)."""
    from pg_age_digitaltwins_spark.http_api import NAME_IDENTIFIER_CLAIM, Request

    r = Request("GET", "/", claims={NAME_IDENTIFIER_CLAIM: "nid-1", "sub": "sub-1"})
    assert r.user_id == "nid-1"
    assert Request("GET", "/", claims={"sub": "sub-1"}).user_id == "sub-1"
    assert Request("GET", "/", claims={"iss": "x"}).user_id is None
    assert Request("GET", "/", claims=None).user_id is None
    # list-valued claims (multi-value JWT) take the first entry
    assert Request("GET", "/", claims={"sub": ["s1", "s2"]}).user_id == "s1"


def test_track_last_updated_by_stamps_user(spark):
    """With Parameters:TrackLastUpdatedBy on, twin PUT/PATCH stamp
    per-property lastUpdatedBy with the caller's id; with it off
    (default) claims are ignored (Program.cs:131,
    DigitalTwinsEndpoints.cs:50,79)."""
    from pg_age_digitaltwins_spark.client import DigitalTwinsSparkClient
    from pg_age_digitaltwins_spark.http_api import ApiService, Request
    from pg_age_digitaltwins_spark.store.graph_store import GraphStore

    model = {
        "@id": "dtmi:ex:lub:Thing;1",
        "@type": "Interface",
        "@context": "dtmi:dtdl:context;3",
        "contents": [{"@type": "Property", "name": "temp", "schema": "double"}],
    }
    client = DigitalTwinsSparkClient(GraphStore.empty(spark))
    client.create_models([model])
    api = ApiService(client, track_last_updated_by=True)
    claims = {"sub": "user-7"}
    doc = {"$metadata": {"$model": "dtmi:ex:lub:Thing;1"}, "temp": 20.5}
    r = api.handle(Request("PUT", "/digitaltwins/t1", body=doc, claims=claims))
    assert r.status == 200
    assert r.body["$metadata"]["temp"]["lastUpdatedBy"] == "user-7"
    # PATCH by a different user re-stamps the touched property
    r = api.handle(Request(
        "PATCH", "/digitaltwins/t1",
        body=[{"op": "replace", "path": "/temp", "value": 21.0}],
        claims={"sub": "user-8"},
    ))
    assert r.status == 204
    got = api.handle(Request("GET", "/digitaltwins/t1")).body
    assert got["$metadata"]["temp"]["lastUpdatedBy"] == "user-8"
    # tracking off: same write leaves no lastUpdatedBy
    api_off = ApiService(client)
    api_off.handle(Request("PUT", "/digitaltwins/t2", body=doc, claims=claims))
    got2 = api_off.handle(Request("GET", "/digitaltwins/t2")).body
    assert "lastUpdatedBy" not in got2["$metadata"]["temp"]


def test_cancel_stamps_terminal_timestamps(spark):
    """Cancelling a running job stamps lastActionDateTime /
    finishedDateTime at the cancel, not the creation."""
    from pg_age_digitaltwins_spark import jobs as jobs_mod

    svc = ApiService(DigitalTwinsSparkClient(GraphStore.empty(spark)))
    svc.jobs.register(jobs_mod.JobRecord(id="jr"))  # stays Running
    r = svc.handle(Request("POST", "/jobs/imports/jr/cancel"))
    assert r.status == 200 and r.body["status"] == "cancelled"
    assert r.body["finishedDateTime"] >= r.body["createdDateTime"]
    rec = svc.jobs.records["jr"]
    assert rec.finished_at is not None and rec.finished_at >= rec.created_at


def test_purge_prunes_api_side_bookkeeping(spark, tmp_path):
    """ApiService.purge_expired_jobs drops the request-URI bookkeeping
    together with the purged records (no unbounded growth)."""
    svc = ApiService(DigitalTwinsSparkClient(GraphStore.empty(spark)))
    path = _import_file(tmp_path)
    assert svc.handle(
        Request("PUT", "/jobs/imports/pj", body={"inputBlobUri": f"file://{path}"})
    ).status == 201
    assert "pj" in svc._job_uris and "pj" in svc._job_inputs
    svc.jobs.records["pj"].purge_at = 0.0
    assert svc.purge_expired_jobs() == 1
    assert "pj" not in svc._job_uris and "pj" not in svc._job_inputs


# ---------------------------------------------------------------------------
# r8: blob-storage routing (BlobStorageServiceRouter.cs parity)
# ---------------------------------------------------------------------------

def test_blob_router_provider_detection_and_spark_paths():
    from pg_age_digitaltwins_spark.storage import BlobStorageRouter as R

    # detection mirrors DetectProvider (scheme + host rules)
    assert R.detect_provider("s3://bucket/key.ndjson") == "s3"
    assert R.detect_provider("https://bucket.s3.amazonaws.com/key") == "s3"
    assert R.detect_provider("gs://bucket/key") == "gcs"
    assert R.detect_provider("https://storage.googleapis.com/b/key") == "gcs"
    assert R.detect_provider("https://acct.blob.core.windows.net/c/key") == "azure"
    assert R.detect_provider("file:///tmp/x.ndjson") == "default"
    assert R.detect_provider("/tmp/x.ndjson") == "default"
    # the scale path: what a cluster-side spark.read would consume
    assert R.spark_path("s3://b/k.ndjson") == "s3a://b/k.ndjson"
    assert R.spark_path("https://b.s3.amazonaws.com/k") == "s3a://b/k"
    assert R.spark_path("gs://b/k") == "gs://b/k"
    assert (
        R.spark_path("https://acct.blob.core.windows.net/cont/dir/k.ndjson")
        == "abfss://cont@acct.dfs.core.windows.net/dir/k.ndjson"
    )
    assert R.spark_path("file:///tmp/x") == "/tmp/x"


def test_blob_router_cloud_without_backend_raises_and_registers(tmp_path):
    import pytest as _pytest

    from pg_age_digitaltwins_spark.storage import (
        BlobStorageError,
        BlobStorageRouter,
    )

    r = BlobStorageRouter()
    with _pytest.raises(BlobStorageError, match="s3"):
        list(r.open_read_lines("s3://bucket/k.ndjson"))
    # a registered backend (the pluggable provider seam) takes over
    blobs = {"s3://bucket/k.ndjson": ["l1", "l2"]}
    r.register("s3", reader=lambda uri: iter(blobs[uri]),
               writer=lambda uri, lines: blobs.__setitem__(uri, list(lines)))
    assert list(r.open_read_lines("s3://bucket/k.ndjson")) == ["l1", "l2"]
    r.write_lines("s3://bucket/out", ["a"])
    assert blobs["s3://bucket/out"] == ["a"]
    # default provider round-trips through the filesystem
    p = str(tmp_path / "x.ndjson")
    r.write_lines(p, ["one", "two"])
    assert list(r.open_read_lines(f"file://{p}")) == ["one", "two"]


def test_openapi_document(api):
    resp = api.handle(Request("GET", "/openapi/v1.json"))
    assert resp.status == 200
    doc = resp.body
    assert doc["openapi"].startswith("3.") and doc["info"]["version"] == "v1"
    paths = doc["paths"]
    # route-table derived: parameterized paths use {name} templates
    assert "get" in paths["/digitaltwins/{id}"]
    assert "put" in paths["/digitaltwins/{id}"]
    assert paths["/digitaltwins/{id}"]["get"]["parameters"][0]["name"] == "id"
    # permission + rate-limit extensions mirror the dispatch table
    q = paths["/query"]["post"]
    assert q["x-rate-limit-policy"] == "query"
    assert q["x-required-permission"] == "query:action"
    rel = paths["/digitaltwins/{id}/relationships/{rid}"]
    assert set(rel) >= {"get", "put", "patch", "delete"}
    # the openapi route itself is listed and anonymous
    assert "x-required-permission" not in paths["/openapi/v1.json"]["get"]
    # every registered route appears
    assert len(paths) >= 25


def test_query_route_procedure_call(api):
    """r14: CALL ... YIELD flows through POST /query like any Cypher —
    the fixture graph (r1 -adjacentTo-> r2) yields exact degrees; a
    typed projection onto a non-existent relationship name zeroes
    them; a bad procedure is a 400, not a 500."""
    resp = api.handle(Request("POST", "/query", body={
        "query": "CALL graph.degree() YIELD node, out_degree, in_degree "
                 "RETURN node, out_degree, in_degree ORDER BY node"
    }))
    assert resp.status == 200
    assert resp.body["value"] == [
        {"node": "r1", "out_degree": 1, "in_degree": 0},
        {"node": "r2", "out_degree": 0, "in_degree": 1},
    ]
    assert float(resp.headers["query-charge"]) > 0
    typed = api.handle(Request("POST", "/query", body={
        "query": "CALL graph.degree(['nosuch']) YIELD node, out_degree "
                 "WHERE out_degree > 0 RETURN node"
    }))
    assert typed.status == 200 and typed.body["value"] == []
    bad = api.handle(Request("POST", "/query", body={
        "query": "CALL graph.nope() YIELD x RETURN x"
    }))
    assert bad.status == 400
