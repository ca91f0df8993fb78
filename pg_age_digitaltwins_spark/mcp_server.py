"""Model Context Protocol (MCP) server surface (JSON-RPC 2.0).

The reference product ships an MCP server exposing the digital-twin
capabilities as agent tools (``docs/concepts/mcp-server.mdx`` — the
"Available Tools" list is the parity contract: 5 model tools, 5 twin
tools, 5 relationship tools, 1 query tool).  Its implementation lives
in a hosted companion service, so the *protocol* (public MCP spec:
``initialize`` / ``tools/list`` / ``tools/call`` over JSON-RPC 2.0) and
the documented tool inventory are the specification here; every tool
dispatches to the same :class:`DigitalTwinsSparkClient` methods the
HTTP surface uses.

Transports: :meth:`McpServer.handle` is the pure request→response core
(what an HTTP ``POST /mcp`` route calls); :func:`serve_stdio` runs the
standard line-delimited stdio transport that local MCP clients (e.g.
``mcp-remote`` proxies) speak.  OAuth lives at the hosting layer in the
reference and is out of scope for the library surface.
"""

from __future__ import annotations

import json
from typing import Any, Callable, TextIO

PROTOCOL_VERSION = "2025-06-18"
SERVER_INFO = {"name": "pg-age-digitaltwins-spark", "version": "1.0"}

_OBJ = {"type": "object"}
_STR = {"type": "string"}
_ARR_NUM = {"type": "array", "items": {"type": "number"}}


def _tool(name: str, description: str, required: list[str], **props) -> dict:
    return {
        "name": name,
        "description": description,
        "inputSchema": {
            "type": "object",
            "properties": props,
            "required": required,
        },
    }


# The documented tool inventory (docs/concepts/mcp-server.mdx §Available
# Tools), schemas derived from the HTTP surface's request bodies.
TOOLS: list[dict] = [
    # -- model management ----------------------------------------------
    _tool("create_model", "Creates a new DTDL model.", ["model"], model=_OBJ),
    _tool("delete_model", "Deletes a DTDL model.", ["id"], id=_STR),
    _tool(
        "get_model",
        "Retrieves the full definition of a single DTDL model.",
        ["id"],
        id=_STR,
        includeModelDefinition={"type": "boolean"},
    ),
    _tool("list_models", "Lists all DTDL models in the graph.", []),
    _tool(
        "search_models",
        "Searches for DTDL models (lexical and/or vector).",
        [],
        text=_STR,
        embedding=_ARR_NUM,
        limit={"type": "integer"},
    ),
    # -- digital twin management ---------------------------------------
    _tool(
        "create_or_replace_digital_twin",
        "Creates or replaces a digital twin.",
        ["id", "twin"],
        id=_STR,
        twin=_OBJ,
    ),
    _tool("delete_digital_twin", "Deletes a digital twin.", ["id"], id=_STR),
    _tool("get_digital_twin", "Retrieves a digital twin by its ID.", ["id"], id=_STR),
    _tool(
        "update_digital_twin",
        "Updates a twin's properties using a JSON Patch.",
        ["id", "patch"],
        id=_STR,
        patch={"type": "array", "items": _OBJ},
    ),
    _tool(
        "search_digital_twins",
        "Performs a semantic search for twins.",
        ["vector"],
        vector=_ARR_NUM,
        modelFilter=_STR,
        limit={"type": "integer"},
    ),
    # -- relationship management ---------------------------------------
    _tool(
        "create_or_replace_relationship",
        "Creates or replaces a relationship between two twins.",
        ["sourceId", "relationshipId", "relationship"],
        sourceId=_STR,
        relationshipId=_STR,
        relationship=_OBJ,
    ),
    _tool(
        "delete_relationship",
        "Deletes a relationship.",
        ["sourceId", "relationshipId"],
        sourceId=_STR,
        relationshipId=_STR,
    ),
    _tool(
        "get_relationship",
        "Retrieves a specific relationship.",
        ["sourceId", "relationshipId"],
        sourceId=_STR,
        relationshipId=_STR,
    ),
    _tool(
        "list_relationships",
        "Lists all outgoing relationships from a twin.",
        ["sourceId"],
        sourceId=_STR,
        relationshipName=_STR,
    ),
    _tool(
        "update_relationship",
        "Updates a relationship's properties using a JSON Patch.",
        ["sourceId", "relationshipId", "patch"],
        sourceId=_STR,
        relationshipId=_STR,
        patch={"type": "array", "items": _OBJ},
    ),
    # -- querying ------------------------------------------------------
    _tool(
        "query_digital_twins",
        "Executes an ADT QL or Cypher query against the graph.",
        ["query"],
        query=_STR,
    ),
]


class McpServer:
    """JSON-RPC 2.0 request handler implementing the MCP core."""

    def __init__(self, client):
        self.client = client
        self._dispatch: dict[str, Callable[[dict], Any]] = {
            "create_model": lambda a: self.client.create_models([a["model"]]),
            "delete_model": lambda a: self.client.delete_model(a["id"]),
            "get_model": lambda a: self.client.get_model(
                a["id"],
                include_base_model_contents=bool(a.get("includeModelDefinition")),
            ),
            "list_models": lambda a: self.client.list_models(),
            "search_models": lambda a: self.client.search_models(
                embedding=a.get("embedding"),
                text=a.get("text"),
                limit=int(a.get("limit") or 10),
            ),
            "create_or_replace_digital_twin": lambda a: (
                self.client.create_or_replace_digital_twin(a["id"], a["twin"])
            ),
            "delete_digital_twin": lambda a: self.client.delete_digital_twin(a["id"]),
            "get_digital_twin": lambda a: self.client.get_digital_twin(a["id"]),
            "update_digital_twin": lambda a: self.client.update_digital_twin(
                a["id"], a["patch"]
            ),
            "search_digital_twins": self._search_twins,
            "create_or_replace_relationship": lambda a: (
                self.client.create_or_replace_relationship(
                    a["sourceId"], a["relationshipId"], a["relationship"]
                )
            ),
            "delete_relationship": lambda a: self.client.delete_relationship(
                a["sourceId"], a["relationshipId"]
            ),
            "get_relationship": lambda a: self.client.get_relationship(
                a["sourceId"], a["relationshipId"]
            ),
            "list_relationships": lambda a: list(
                self.client.list_relationships(
                    a["sourceId"], a.get("relationshipName")
                )
            ),
            "update_relationship": lambda a: self.client.update_relationship(
                a["sourceId"], a["relationshipId"], a["patch"]
            ),
            "query_digital_twins": lambda a: self.client.query(a["query"]).rows,
        }

    # -- tool impls needing more than a client call --------------------
    def _search_twins(self, a: dict) -> Any:
        vector = a["vector"]
        limit = int(a.get("limit") or 10)
        model_filter = a.get("modelFilter")
        where = (
            " WHERE t.`$metadata`.`$model` = '{}'".format(
                str(model_filter).replace("\\", "\\\\").replace("'", "\\'")
            )
            if model_filter
            else ""
        )
        cypher = (
            f"MATCH (t:Twin){where} RETURN t "
            f"ORDER BY l2_distance(t.embedding, {json.dumps(vector)}) ASC "
            f"LIMIT {limit}"
        )
        return self.client.query(cypher).rows

    # -- JSON-RPC core -------------------------------------------------
    def handle(self, request: dict) -> dict | None:
        """One JSON-RPC message in, one response out (None for
        notifications, which get no reply per spec)."""
        rid = request.get("id")
        method = request.get("method")
        if method == "notifications/initialized":
            return None
        try:
            if method == "initialize":
                result = {
                    "protocolVersion": PROTOCOL_VERSION,
                    "capabilities": {"tools": {}},
                    "serverInfo": SERVER_INFO,
                }
            elif method == "ping":
                result = {}
            elif method == "tools/list":
                result = {"tools": TOOLS}
            elif method == "tools/call":
                result = self._call_tool(request.get("params") or {})
            else:
                return _err(rid, -32601, f"Method not found: {method}")
        except _InvalidParams as exc:
            return _err(rid, -32602, str(exc))
        except Exception as exc:  # noqa: BLE001 — protocol-level failure
            return _err(rid, -32603, str(exc))
        return {"jsonrpc": "2.0", "id": rid, "result": result}

    def _call_tool(self, params: dict) -> dict:
        name = params.get("name")
        fn = self._dispatch.get(name)
        if fn is None:
            # MCP spec: unknown tool names are Invalid params (-32602)
            raise _InvalidParams(f"Unknown tool: {name}")
        args = params.get("arguments") or {}
        spec = next(t for t in TOOLS if t["name"] == name)
        missing = [r for r in spec["inputSchema"]["required"] if r not in args]
        if missing:
            raise _InvalidParams(
                f"Missing required arguments for {name}: {', '.join(missing)}"
            )
        # Tool-execution failures are NOT protocol errors: the spec
        # returns them in-band as isError content so the agent can read
        # and react to the message.
        try:
            out = fn(args)
            text = json.dumps(
                out if out is not None else {"ok": True}, default=str
            )
            return {"content": [{"type": "text", "text": text}], "isError": False}
        except Exception as exc:  # noqa: BLE001 — surfaced to the agent
            return {
                "content": [{"type": "text", "text": f"{type(exc).__name__}: {exc}"}],
                "isError": True,
            }


class _InvalidParams(Exception):
    pass


def _err(rid, code: int, message: str) -> dict:
    return {"jsonrpc": "2.0", "id": rid, "error": {"code": code, "message": message}}


def serve_stdio(client, in_stream: TextIO, out_stream: TextIO) -> int:
    """Line-delimited stdio transport (the local-proxy transport MCP
    clients use).  Reads one JSON-RPC message per line until EOF;
    returns the number of requests answered."""
    server = McpServer(client)
    answered = 0
    for line in in_stream:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
        except json.JSONDecodeError as exc:
            resp = _err(None, -32700, f"Parse error: {exc}")
        else:
            resp = server.handle(req)
        if resp is not None:
            out_stream.write(json.dumps(resp, separators=(",", ":")) + "\n")
            out_stream.flush()
            answered += 1
    return answered
