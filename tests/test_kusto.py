"""S10: Kusto queued-ingestion sink — protocol-shape parity with
``Sinks/Kusto/KustoEventSink.cs`` (blob staging + ingestion messages +
JSON ingestion mappings + ReportMethod=Table statuses), plus the local
ingestor standing in for ADX's data-management layer."""

from __future__ import annotations

import gzip
import json
import os

import pytest

from pg_age_digitaltwins_spark.streaming.changes import EventData
from pg_age_digitaltwins_spark.streaming.cloudevents import (
    data_history,
    format_events_df,
)
from pg_age_digitaltwins_spark.streaming.kusto import (
    KustoQueuedSink,
    LocalKustoIngestor,
    table_df,
)
from pg_age_digitaltwins_spark.streaming.sinks import EventRoute, EventRouter

TS = "2026-02-01T00:00:00.0000000Z"
_ids = iter(range(100000))
ID = lambda: f"ce-{next(_ids)}"  # noqa: E731


def twin_doc(dt_id, model="dtmi:t:M;1", **props):
    return {"$dtId": dt_id, "$metadata": {"$model": model}, **props}


def _update_event(dt_id="t1"):
    old = twin_doc(dt_id, temperature=20.0)
    new = twin_doc(dt_id, temperature=25.0)
    return EventData(dt_id, "g", "Twin", old, new, "Update", TS)


def _events_for(ev):
    return data_history(ev, "svc-1", ID)


# ----------------------------------------------------------------------
# client side: staging blobs + ingestion messages
# ----------------------------------------------------------------------

def test_send_stages_gzip_blob_and_ingestion_message(tmp_path):
    sink = KustoQueuedSink(str(tmp_path), database="adtdb")
    sink.send(_events_for(_update_event()))

    msgs = sorted(os.listdir(tmp_path / "queue"))
    assert len(msgs) == 1
    msg = json.loads((tmp_path / "queue" / msgs[0]).read_text())
    assert msg["DatabaseName"] == "adtdb"
    assert msg["TableName"] == "AdtPropertyEvents"
    assert msg["ReportLevel"] == "FailuresAndSuccesses"
    assert msg["ReportMethod"] == "Table"
    assert msg["AdditionalProperties"]["format"] == "json"

    # the serialized ingestion mapping is the reference's column list
    mapping = json.loads(msg["AdditionalProperties"]["ingestionMapping"])
    cols = [m["column"] for m in mapping]
    assert cols == [
        "TimeStamp", "SourceTimeStamp", "ServiceId", "Id", "ModelId",
        "Key", "Value", "RelationshipTarget", "RelationshipId", "Action",
    ]
    assert mapping[0]["Properties"]["Path"] == "$.timeStamp"
    assert mapping[6]["datatype"] == "dynamic"

    # the blob is gzipped ND-JSON of the CloudEvent data payloads
    with gzip.open(tmp_path / msg["BlobPath"], "rt") as f:
        lines = [json.loads(l) for l in f if l.strip()]
    assert len(lines) == 1
    assert lines[0]["key"] == "temperature"
    assert lines[0]["value"] == 25.0

    # enqueue leaves a Pending status row (poll keeps the sink healthy)
    assert [s["Status"] for s in sink.statuses()] == ["Pending"]
    assert sink.check_statuses() is True


def test_track_last_updated_by_extends_mapping(tmp_path):
    sink = KustoQueuedSink(str(tmp_path), track_last_updated_by=True)
    sink.send(_events_for(_update_event()))
    [msg_name] = os.listdir(tmp_path / "queue")
    msg = json.loads((tmp_path / "queue" / msg_name).read_text())
    mapping = json.loads(msg["AdditionalProperties"]["ingestionMapping"])
    assert mapping[-1]["column"] == "UpdatedBy"
    assert mapping[-1]["Properties"]["Path"] == "$.updatedBy"


def test_unsupported_types_skipped_not_errored(tmp_path):
    sink = KustoQueuedSink(str(tmp_path))
    sink.send([
        {"type": "Konnektr.Graph.Twin.Create", "data": {"x": 1}},  # notification type
        {"type": None, "data": {}},
    ])
    assert sink.skipped_events == 2
    assert os.listdir(tmp_path / "queue") == []
    assert sink.is_healthy


def test_events_group_per_type_one_blob_each(tmp_path):
    sink = KustoQueuedSink(str(tmp_path))
    create = EventData("t9", "g", "Twin", None, twin_doc("t9"), "Insert", TS)
    events = _events_for(_update_event()) + _events_for(create)
    sink.send(events)
    msgs = [
        json.loads((tmp_path / "queue" / n).read_text())
        for n in sorted(os.listdir(tmp_path / "queue"))
    ]
    assert sorted(m["TableName"] for m in msgs) == [
        "AdtPropertyEvents",
        "AdtTwinLifeCycleEvents",
    ]


# ----------------------------------------------------------------------
# service side: the local ingestor applies the mapping
# ----------------------------------------------------------------------

def test_ingestor_materializes_mapped_rows_and_succeeds(tmp_path):
    sink = KustoQueuedSink(str(tmp_path))
    rel = {
        "$relationshipId": "r1", "$sourceId": "a", "$targetId": "b",
        "$relationshipName": "contains",
    }
    events = _events_for(_update_event()) + _events_for(
        EventData("r1", "g", "rel", None, rel, "Insert", TS)
    )
    sink.send(events)
    counts = LocalKustoIngestor(str(tmp_path)).process_queue()
    assert counts == {"Succeeded": 2, "Failed": 0}

    prop_files = os.listdir(tmp_path / "tables" / "AdtPropertyEvents")
    rows = []
    for n in prop_files:
        for line in (tmp_path / "tables" / "AdtPropertyEvents" / n).read_text().splitlines():
            rows.append(json.loads(line))
    assert rows == [{
        "TimeStamp": TS, "SourceTimeStamp": None, "ServiceId": "svc-1",
        "Id": "t1", "ModelId": "dtmi:t:M;1", "Key": "temperature",
        "Value": "25.0", "RelationshipTarget": None, "RelationshipId": None,
        "Action": "Update",
    }]

    rel_dir = tmp_path / "tables" / "AdtRelationshipLifeCycleEvents"
    [rel_row] = [
        json.loads(l)
        for n in os.listdir(rel_dir)
        for l in (rel_dir / n).read_text().splitlines()
    ]
    assert rel_row["RelationshipId"] == "r1"
    assert rel_row["Name"] == "contains"
    assert rel_row["Source"] == "a" and rel_row["Target"] == "b"

    # statuses flip Pending -> Succeeded; queue drained; blobs cleaned
    assert {s["Status"] for s in sink.statuses()} == {"Succeeded"}
    assert sink.check_statuses() is True
    assert os.listdir(tmp_path / "queue") == []
    assert os.listdir(tmp_path / "staging") == []


def test_corrupt_blob_reports_failed_and_degrades_health(tmp_path):
    sink = KustoQueuedSink(str(tmp_path))
    sink.send(_events_for(_update_event()))
    [blob] = os.listdir(tmp_path / "staging")
    (tmp_path / "staging" / blob).write_bytes(b"not gzip at all")
    counts = LocalKustoIngestor(str(tmp_path)).process_queue()
    assert counts == {"Succeeded": 0, "Failed": 1}
    [st] = sink.statuses()
    assert st["Status"] == "Failed" and st["detail"]
    # the ReportMethod=Table poll now degrades the sink, as the
    # reference does on a non-Pending/Succeeded status
    assert sink.check_statuses() is False
    assert not sink.is_healthy


def test_event_type_remapping(tmp_path):
    # EventTypeMappings: route a custom CloudEvent type into the
    # property-events table (KustoEventSink.cs:128-139)
    from pg_age_digitaltwins_spark.streaming.cloudevents import DH_PROPERTY

    sink = KustoQueuedSink(
        str(tmp_path), event_type_mappings={DH_PROPERTY: "My.Custom.Prop"}
    )
    events = _events_for(_update_event())
    for e in events:
        e["type"] = "My.Custom.Prop"
    sink.send(events)
    [msg_name] = os.listdir(tmp_path / "queue")
    msg = json.loads((tmp_path / "queue" / msg_name).read_text())
    assert msg["TableName"] == "AdtPropertyEvents"
    # the original type is no longer routed
    sink2 = KustoQueuedSink(
        str(tmp_path / "other"), event_type_mappings={DH_PROPERTY: "My.Custom.Prop"}
    )
    sink2.send(_events_for(_update_event()))
    assert sink2.skipped_events == len(_events_for(_update_event()))


# ----------------------------------------------------------------------
# end-to-end: router -> queued sink -> ingestor -> Spark-read ADX table
# ----------------------------------------------------------------------

def test_router_to_kusto_tables_end_to_end(tmp_path, spark):
    router = EventRouter(source="svc-e2e")
    sink = KustoQueuedSink(str(tmp_path))
    router.add_sink(sink)
    router.add_route(EventRoute(sink_name="kusto", event_format="DataHistory"))
    create = EventData("t1", "g", "Twin", None, twin_doc("t1", temp=1.5), "Insert", TS)
    update = _update_event("t2")
    router.process([create, update])
    LocalKustoIngestor(str(tmp_path)).process_queue()

    props = table_df(spark, str(tmp_path), "AdtPropertyEvents")
    rows = {r["Id"]: r for r in props.collect()}
    assert rows["t2"]["Key"] == "temperature"
    assert json.loads(rows["t2"]["Value"]) == 25.0
    assert rows["t2"]["TimeStamp"] is not None  # datetime cast applied

    lifecycle = table_df(spark, str(tmp_path), "AdtTwinLifeCycleEvents")
    [lc] = lifecycle.collect()
    assert lc["TwinId"] == "t1" and lc["Action"] == "Create"
    assert lc["ModelId"] == "dtmi:t:M;1"


def test_send_df_executor_side_staging(tmp_path, spark):
    sink = KustoQueuedSink(str(tmp_path))
    events = (
        _events_for(_update_event("a"))
        + _events_for(_update_event("b"))
        + _events_for(
            EventData("t7", "g", "Twin", None, twin_doc("t7"), "Insert", TS)
        )
    )
    import pandas as pd

    pdf = pd.DataFrame(
        [
            {
                "id": e["id"], "source": e["source"], "type": e["type"],
                "subject": e["subject"], "time": e["time"],
                "datacontenttype": e["datacontenttype"],
                "data": json.dumps(e["data"], separators=(",", ":")),
            }
            for e in events
        ]
    )
    sink.send_df(spark.createDataFrame(pdf))
    counts = LocalKustoIngestor(str(tmp_path)).process_queue()
    assert counts["Failed"] == 0 and counts["Succeeded"] >= 2
    props = table_df(spark, str(tmp_path), "AdtPropertyEvents")
    assert {r["Id"] for r in props.collect()} == {"a", "b"}
    lc = table_df(spark, str(tmp_path), "AdtTwinLifeCycleEvents")
    assert [r["TwinId"] for r in lc.collect()] == ["t7"]
