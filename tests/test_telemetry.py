"""Operation tracing parity: the reference opens an ActivitySource span
per client method (AgeDigitalTwinsClient.cs:32, QueryAsync spans at
Query.cs:29-36); instrument_client reproduces the span names, tags,
error status, and counters without any dependency."""

from __future__ import annotations

import pytest

from pg_age_digitaltwins_spark.client import DigitalTwinsSparkClient
from pg_age_digitaltwins_spark.store.graph_store import GraphStore
from pg_age_digitaltwins_spark.telemetry import Tracer, instrument_client

MODEL = {"@id": "dtmi:tl:T;1", "@type": "Interface",
         "@context": "dtmi:dtdl:context;3",
         "contents": [{"@type": "Property", "name": "x", "schema": "double"}]}


@pytest.fixture()
def traced(spark):
    client = DigitalTwinsSparkClient(GraphStore.empty(spark))
    tracer = instrument_client(client)
    return client, tracer


def test_spans_counters_and_tags(traced):
    client, tracer = traced
    client.create_models([MODEL])
    client.create_or_replace_digital_twin(
        "t1", {"$metadata": {"$model": "dtmi:tl:T;1"}, "x": 1.0})
    client.query("SELECT COUNT() FROM DIGITALTWINS")
    snap = tracer.snapshot()
    ops = snap["operations"]
    assert ops["CreateModelsAsync"]["count"] == 1
    assert ops["CreateOrReplaceDigitalTwinAsync"]["count"] == 1
    assert ops["QueryAsync"]["count"] == 1
    assert ops["QueryAsync"]["errors"] == 0
    assert ops["QueryAsync"]["avgMs"] > 0
    q_span = next(s for s in snap["recentSpans"] if s["name"] == "QueryAsync")
    assert q_span["tags"]["query"] == "SELECT COUNT() FROM DIGITALTWINS"
    assert q_span["status"] == "ok"


def test_error_status_recorded_and_reraised(traced):
    client, tracer = traced
    with pytest.raises(Exception):
        client.get_digital_twin("missing")
    snap = tracer.snapshot()
    assert snap["operations"]["GetDigitalTwinAsync"]["errors"] == 1
    err_span = next(
        s for s in snap["recentSpans"] if s["name"] == "GetDigitalTwinAsync")
    assert err_span["status"] == "error" and "missing" in err_span["error"]


def test_stats_endpoint(spark):
    from pg_age_digitaltwins_spark.http_api import ApiService, Request

    client = DigitalTwinsSparkClient(GraphStore.empty(spark))
    api = ApiService(client)
    r = api.handle(Request("GET", "/stats"))
    assert r.status == 200 and r.body["operations"] == {}  # uninstrumented

    instrument_client(client)
    api.handle(Request("POST", "/query",
                       body={"query": "SELECT COUNT() FROM DIGITALTWINS"}))
    r = api.handle(Request("GET", "/stats"))
    assert r.body["operations"]["QueryAsync"]["count"] == 1


def test_otel_bridge_noop_without_package():
    t = Tracer()
    assert t.attach_otel() is False  # opentelemetry not installed here
