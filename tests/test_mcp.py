"""MCP server surface: JSON-RPC 2.0 core + the documented tool
inventory (``docs/concepts/mcp-server.mdx`` §Available Tools) over the
stdio transport and the pure handle() path."""

from __future__ import annotations

import io
import json

import pytest

from pg_age_digitaltwins_spark.client import DigitalTwinsSparkClient
from pg_age_digitaltwins_spark.mcp_server import (
    PROTOCOL_VERSION,
    TOOLS,
    McpServer,
    serve_stdio,
)
from pg_age_digitaltwins_spark.store.graph_store import GraphStore

MODEL = {
    "@id": "dtmi:mcp:Room;1",
    "@type": "Interface",
    "@context": "dtmi:dtdl:context;3",
    "contents": [
        {"@type": "Property", "name": "temperature", "schema": "double"},
        {"@type": "Relationship", "name": "adjacentTo"},
    ],
}

DOCUMENTED_TOOLS = {
    # docs/concepts/mcp-server.mdx — the full documented inventory
    "create_model", "delete_model", "get_model", "list_models", "search_models",
    "create_or_replace_digital_twin", "delete_digital_twin", "get_digital_twin",
    "update_digital_twin", "search_digital_twins",
    "create_or_replace_relationship", "delete_relationship", "get_relationship",
    "list_relationships", "update_relationship",
    "query_digital_twins",
}


@pytest.fixture()
def server(spark):
    return McpServer(DigitalTwinsSparkClient(GraphStore.empty(spark)))


def _call(server, name, args, rid=1):
    return server.handle({
        "jsonrpc": "2.0", "id": rid, "method": "tools/call",
        "params": {"name": name, "arguments": args},
    })


def _result_json(resp):
    assert resp["result"]["isError"] is False, resp["result"]
    return json.loads(resp["result"]["content"][0]["text"])


def test_initialize_and_tools_list(server):
    resp = server.handle({"jsonrpc": "2.0", "id": 0, "method": "initialize",
                          "params": {"protocolVersion": PROTOCOL_VERSION}})
    assert resp["result"]["protocolVersion"] == PROTOCOL_VERSION
    assert "tools" in resp["result"]["capabilities"]
    # initialized notification gets no response
    assert server.handle({"jsonrpc": "2.0",
                          "method": "notifications/initialized"}) is None
    listed = server.handle({"jsonrpc": "2.0", "id": 1, "method": "tools/list"})
    names = {t["name"] for t in listed["result"]["tools"]}
    assert names == DOCUMENTED_TOOLS
    for t in TOOLS:  # every tool carries a JSON Schema
        assert t["inputSchema"]["type"] == "object"


def test_full_tool_lifecycle(server):
    _result_json(_call(server, "create_model", {"model": MODEL}))
    models = _result_json(_call(server, "list_models", {}))
    assert [m["model"]["@id"] for m in models] == ["dtmi:mcp:Room;1"]

    twin = {"$metadata": {"$model": "dtmi:mcp:Room;1"}, "temperature": 20.5}
    _result_json(_call(server, "create_or_replace_digital_twin",
                       {"id": "t1", "twin": twin}))
    _result_json(_call(server, "create_or_replace_digital_twin",
                       {"id": "t2", "twin": twin}))
    got = _result_json(_call(server, "get_digital_twin", {"id": "t1"}))
    assert got["$dtId"] == "t1" and got["temperature"] == 20.5

    patched = _result_json(_call(server, "update_digital_twin", {
        "id": "t1",
        "patch": [{"op": "replace", "path": "/temperature", "value": 22.0}],
    }))
    assert patched["temperature"] == 22.0

    _result_json(_call(server, "create_or_replace_relationship", {
        "sourceId": "t1", "relationshipId": "r1",
        "relationship": {"$targetId": "t2", "$relationshipName": "adjacentTo"},
    }))
    rels = _result_json(_call(server, "list_relationships", {"sourceId": "t1"}))
    assert [r["$relationshipId"] for r in rels] == ["r1"]
    one = _result_json(_call(server, "get_relationship",
                             {"sourceId": "t1", "relationshipId": "r1"}))
    assert one["$targetId"] == "t2"

    rows = _result_json(_call(server, "query_digital_twins",
                              {"query": "SELECT COUNT() FROM DIGITALTWINS"}))
    assert rows == [{"count": 2}]

    _result_json(_call(server, "delete_relationship",
                       {"sourceId": "t1", "relationshipId": "r1"}))
    _result_json(_call(server, "delete_digital_twin", {"id": "t2"}))
    rows = _result_json(_call(server, "query_digital_twins",
                              {"query": "SELECT COUNT() FROM DIGITALTWINS"}))
    assert rows == [{"count": 1}]


def test_tool_errors_are_in_band(server):
    # tool failure -> isError content, NOT a protocol error (spec)
    resp = _call(server, "get_digital_twin", {"id": "missing"})
    assert "error" not in resp
    assert resp["result"]["isError"] is True
    assert "missing" in resp["result"]["content"][0]["text"]
    # unknown tool / unknown method -> protocol errors
    resp = _call(server, "no_such_tool", {})
    assert resp["error"]["code"] == -32602
    resp = server.handle({"jsonrpc": "2.0", "id": 9, "method": "bogus/method"})
    assert resp["error"]["code"] == -32601
    # missing required argument -> invalid params
    resp = _call(server, "get_digital_twin", {})
    assert resp["error"]["code"] == -32602


def test_stdio_transport_roundtrip(spark):
    client = DigitalTwinsSparkClient(GraphStore.empty(spark))
    msgs = [
        {"jsonrpc": "2.0", "id": 0, "method": "initialize", "params": {}},
        {"jsonrpc": "2.0", "method": "notifications/initialized"},
        {"jsonrpc": "2.0", "id": 1, "method": "tools/call", "params": {
            "name": "create_model", "arguments": {"model": MODEL}}},
        {"jsonrpc": "2.0", "id": 2, "method": "tools/list"},
        "this is not json",
        {"jsonrpc": "2.0", "id": 3, "method": "ping"},
    ]
    stdin = io.StringIO("\n".join(
        m if isinstance(m, str) else json.dumps(m) for m in msgs
    ) + "\n")
    stdout = io.StringIO()
    answered = serve_stdio(client, stdin, stdout)
    lines = [json.loads(l) for l in stdout.getvalue().splitlines()]
    assert answered == 5  # 6 messages minus the notification
    by_id = {l.get("id"): l for l in lines}
    assert by_id[0]["result"]["serverInfo"]["name"]
    assert by_id[2]["result"]["tools"]
    assert by_id[None]["error"]["code"] == -32700  # parse error
    assert by_id[3]["result"] == {}


def test_http_mcp_route(spark):
    from pg_age_digitaltwins_spark.http_api import ApiService, Request

    api = ApiService(DigitalTwinsSparkClient(GraphStore.empty(spark)))
    r = api.handle(Request("POST", "/mcp", body={
        "jsonrpc": "2.0", "id": 1, "method": "tools/list"}))
    assert r.status == 200
    assert {t["name"] for t in r.body["result"]["tools"]} == DOCUMENTED_TOOLS
    # a notification returns 202 with no body
    r = api.handle(Request("POST", "/mcp", body={
        "jsonrpc": "2.0", "method": "notifications/initialized"}))
    assert r.status == 202 and r.body is None
    # a tool call round-trips through the same client the REST surface uses
    r = api.handle(Request("POST", "/mcp", body={
        "jsonrpc": "2.0", "id": 2, "method": "tools/call",
        "params": {"name": "query_digital_twins",
                   "arguments": {"query": "SELECT COUNT() FROM DIGITALTWINS"}}}))
    assert json.loads(r.body["result"]["content"][0]["text"]) == [{"count": 0}]
