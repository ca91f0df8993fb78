"""End-to-end quickstart: models → twins → queries → patch → commit →
change stream → sinks, all on local[*].

Run:  python examples/quickstart.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pg_age_digitaltwins_spark import DigitalTwinsSparkClient, get_spark
from pg_age_digitaltwins_spark.store.graph_store import GraphStore

FLOOR = {
    "@id": "dtmi:example:Floor;1",
    "@type": "Interface",
    "@context": "dtmi:dtdl:context;3",
    "contents": [{"@type": "Property", "name": "level", "schema": "integer"}],
}
ROOM = {
    "@id": "dtmi:example:Room;1",
    "@type": "Interface",
    "@context": ["dtmi:dtdl:context;3", "dtmi:dtdl:extension:quantitativeTypes;1"],
    "contents": [
        {"@type": ["Property", "Temperature"], "name": "temperature",
         "schema": "double", "unit": "degreeCelsius"},
        {"@type": "Relationship", "name": "isPartOf", "target": "dtmi:example:Floor;1"},
    ],
}


def main() -> None:
    spark = get_spark("quickstart")
    spark.sparkContext.setLogLevel("ERROR")
    client = DigitalTwinsSparkClient(GraphStore.empty(spark))

    # -- models (DTDL validated, closure computed) ---------------------
    client.create_models([FLOOR, ROOM])

    # -- twins + relationships (validated, stamped, ETagged) -----------
    client.create_or_replace_digital_twin(
        "floor1", {"$metadata": {"$model": "dtmi:example:Floor;1"}, "level": 1}
    )
    for rid, temp in [("roomA", 21.5), ("roomB", 24.0)]:
        client.create_or_replace_digital_twin(
            rid, {"$metadata": {"$model": "dtmi:example:Room;1"}, "temperature": temp}
        )
        client.create_or_replace_relationship(
            rid, f"{rid}-part", {"$targetId": "floor1", "$relationshipName": "isPartOf"}
        )

    # -- ADT Query Language --------------------------------------------
    page = client.query(
        "SELECT T.$dtId AS room, NUMBER(T.temperature) AS temp "
        "FROM DIGITALTWINS T WHERE IS_OF_MODEL('dtmi:example:Room;1') "
        "AND T.temperature > 22"
    )
    print("ADT QL  :", page.rows)

    # -- raw Cypher (same engine, auto-detected dialect) ---------------
    rows = client.query(
        "MATCH (r:Twin)-[e:isPartOf]->(f:Twin) "
        "WHERE digitaltwins.is_of_model(r, 'dtmi:example:Room;1') "
        "RETURN r.`$dtId` AS room, f.level AS floor_level ORDER BY room"
    ).rows
    print("Cypher  :", rows)

    # -- JSON-Patch update ---------------------------------------------
    client.update_digital_twin(
        "roomA", [{"op": "replace", "path": "/temperature", "value": 19.0}]
    )
    print("Patched :", client.get_digital_twin("roomA")["temperature"])

    with tempfile.TemporaryDirectory() as tmp:
        # -- durable commit (atomic manifest + change batch) -----------
        root = f"{tmp}/graph-table"
        version = client.commit(root)
        print("Commit  : version", version)

        # -- the change stream delivers CloudEvents to sinks -----------
        from pg_age_digitaltwins_spark.streaming.sinks import (
            EventRoute, EventRouter, InMemoryEventSink, run_change_stream,
        )

        sink = InMemoryEventSink("demo")
        router = EventRouter(source="quickstart")
        router.add_sink(sink)
        router.add_route(EventRoute("demo", "EventNotification"))
        q = run_change_stream(spark, root, router, f"{tmp}/ckpt")
        q.awaitTermination(120)
        kinds = sorted({e["type"] for e in sink.events})
        print("Stream  :", len(sink.events), "CloudEvents", kinds)

        # -- MCP tool surface (client now serves reads from the
        #    committed snapshot under `root`) -------------------------
        from pg_age_digitaltwins_spark.mcp_server import McpServer

        mcp = McpServer(client)
        resp = mcp.handle({
            "jsonrpc": "2.0", "id": 1, "method": "tools/call",
            "params": {"name": "query_digital_twins",
                       "arguments": {"query": "SELECT COUNT() FROM DIGITALTWINS"}},
        })
        print("MCP     :", json.loads(resp["result"]["content"][0]["text"]))
    spark.stop()


if __name__ == "__main__":
    main()
