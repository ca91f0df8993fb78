"""Event pipeline semantics (SURVEY.md §2.4): coalescing, CloudEvents
EventNotification + DataHistory formats, routes, retry/DLQ.

Modeled on ``CloudEventFactoryTests`` and the Events integration suite
(``src/AgeDigitalTwins.Events.Test``).
"""

from __future__ import annotations

import pytest

from pg_age_digitaltwins_spark.client import DigitalTwinsSparkClient
from pg_age_digitaltwins_spark.store.graph_store import GraphStore
from pg_age_digitaltwins_spark.streaming.changes import ChangeLog, EventData, coalesce_events
from pg_age_digitaltwins_spark.streaming.cloudevents import (
    data_history,
    event_notification,
    format_events_df,
    telemetry_event,
)
from pg_age_digitaltwins_spark.streaming.sinks import (
    CallbackSink,
    EventRoute,
    EventRouter,
    InMemoryEventSink,
    ResilientSink,
    run_change_pipeline,
)

TS = "2026-02-01T00:00:00.0000000Z"
_ids = iter(range(100000))
ID = lambda: f"ce-{next(_ids)}"  # noqa: E731 — deterministic CloudEvent ids


def twin_doc(dt_id, model="dtmi:t:M;1", **props):
    return {"$dtId": dt_id, "$metadata": {"$model": model}, **props}


def twin_update(dt_id="t1", old_t=20.0, new_t=25.0):
    old = twin_doc(dt_id, temperature=old_t)
    old["$metadata"]["temperature"] = {"lastUpdateTime": "2026-01-01T00:00:00Z"}
    new = twin_doc(dt_id, temperature=new_t)
    new["$metadata"]["temperature"] = {"lastUpdateTime": TS}
    return EventData(dt_id, "g", "Twin", old, new, "Update", TS)


# ----------------------------------------------------------------------
# EventNotification (S6)
# ----------------------------------------------------------------------

def test_notification_create_full_doc():
    doc = twin_doc("t1", temperature=21.0)
    ev = EventData("t1", "g", "Twin", None, doc, "Insert", TS)
    [ce] = event_notification(ev, "src-a", ID)
    assert ce["type"] == "Konnektr.Graph.Twin.Create"
    assert ce["subject"] == "t1"
    assert ce["data"] == doc
    assert ce["time"] == TS
    assert ce["datacontenttype"] == "application/json"


def test_notification_delete_carries_old_doc():
    doc = twin_doc("t1", temperature=21.0)
    ev = EventData("t1", "g", "Twin", doc, None, "Delete", TS)
    [ce] = event_notification(ev, "src-a", ID)
    assert ce["type"] == "Konnektr.Graph.Twin.Delete"
    assert ce["data"] == doc


def test_notification_update_patch_body():
    [ce] = event_notification(twin_update(), "src-a", ID)
    assert ce["type"] == "Konnektr.Graph.Twin.Update"
    assert ce["data"]["modelId"] == "dtmi:t:M;1"
    ops = {(p["op"], p["path"]) for p in ce["data"]["patch"]}
    assert ("replace", "/temperature") in ops


def test_notification_same_value_update_enhanced():
    """Value unchanged but metadata lastUpdateTime moved → synthetic
    replace op (EnhancePatchWithSameValueUpdates)."""
    ev = twin_update(old_t=20.0, new_t=20.0)
    [ce] = event_notification(ev, "src-a", ID)
    assert {"op": "replace", "path": "/temperature", "value": 20.0} in ce["data"]["patch"]


def test_notification_relationship_subject():
    rel = {
        "$relationshipId": "r1", "$sourceId": "a", "$targetId": "b",
        "$relationshipName": "rel",
    }
    ev = EventData("r1", "g", "rel", None, rel, "Insert", TS)
    [ce] = event_notification(ev, "src-a", ID)
    assert ce["type"] == "Konnektr.Graph.Relationship.Create"
    assert ce["subject"] == "a/relationships/r1"


# ----------------------------------------------------------------------
# DataHistory (S7)
# ----------------------------------------------------------------------

def test_data_history_lifecycle():
    doc = twin_doc("t1", temperature=21.0)
    ev = EventData("t1", "g", "Twin", None, doc, "Insert", TS)
    events = data_history(ev, "src-a", ID)
    assert events[0]["type"] == "Konnektr.Graph.Twin.Lifecycle"
    assert events[0]["data"] == {
        "twinId": "t1", "action": "Create", "timeStamp": TS,
        "serviceId": "src-a", "modelId": "dtmi:t:M;1",
    }


def test_data_history_property_events():
    events = data_history(twin_update(), "src-a", ID)
    prop = [e for e in events if e["type"] == "Konnektr.Graph.Property.Event"]
    assert len(prop) == 1
    body = prop[0]["data"]
    assert body["key"] == "temperature"
    assert body["value"] == 25.0
    assert body["action"] == "Update"
    assert body["id"] == "t1"
    assert body["modelId"] == "dtmi:t:M;1"


def test_data_history_skips_dollar_keys():
    old = twin_doc("t1", temperature=20.0)
    new = twin_doc("t1", temperature=25.0)
    old["$etag"], new["$etag"] = "W/\"old\"", "W/\"new\""
    ev = EventData("t1", "g", "Twin", old, new, "Update", TS)
    keys = [
        e["data"]["key"]
        for e in data_history(ev, "src-a", ID)
        if e["type"] == "Konnektr.Graph.Property.Event"
    ]
    assert keys == ["temperature"]


def test_data_history_rel_lifecycle():
    rel = {
        "$relationshipId": "r1", "$sourceId": "a", "$targetId": "b",
        "$relationshipName": "feeds",
    }
    ev = EventData("r1", "g", "feeds", rel, None, "Delete", TS)
    [ce] = data_history(ev, "src-a", ID)
    assert ce["type"] == "Konnektr.Graph.Relationship.Lifecycle"
    assert ce["data"]["action"] == "Delete"
    assert ce["data"]["name"] == "feeds"
    assert ce["subject"] == "a/relationships/r1"


def test_data_history_model_change_emits_lifecycle():
    old = twin_doc("t1", "dtmi:t:M;1", temperature=1.0)
    new = twin_doc("t1", "dtmi:t:M;2", temperature=1.0)
    ev = EventData("t1", "g", "Twin", old, new, "Update", TS)
    events = data_history(ev, "src-a", ID)
    assert events[0]["type"] == "Konnektr.Graph.Twin.Lifecycle"
    assert events[0]["data"]["action"] == "Update"
    assert events[0]["data"]["modelId"] == "dtmi:t:M;2"


def test_telemetry_event():
    ce = telemetry_event(
        {"digitalTwinId": "t1", "timestamp": TS, "telemetry": {"x": 1}}, "src-a", ID
    )
    assert ce["type"] == "Konnektr.IoT.Telemetry"
    assert ce["subject"] == "t1"
    assert ce["data"]["telemetry"] == {"x": 1}


# ----------------------------------------------------------------------
# coalescing (S3) — distributed
# ----------------------------------------------------------------------

def test_coalesce_first_old_last_new(spark):
    log = ChangeLog("g")
    txn = log.begin()
    d0 = twin_doc("t1", temperature=1.0)
    d1 = twin_doc("t1", temperature=2.0)
    d2 = twin_doc("t1", temperature=3.0)
    log.append("Twin", "t1", None, d1, "Insert", TS, txn)
    log.append("Twin", "t1", d1, d2, "Update", TS, txn)
    log.append("Twin", "other", d0, None, "Delete", TS, txn)
    out = {
        r["entity_id"]: r
        for r in coalesce_events(log.to_df(spark)).collect()
    }
    t1 = out["t1"]
    assert t1["event_type"] == "Insert"  # Insert + Update folds to Insert
    assert t1["old_value"] is None
    assert '"temperature":3.0' in t1["new_value"]
    assert out["other"]["event_type"] == "Delete"


def test_coalesce_update_chain(spark):
    log = ChangeLog("g")
    txn = log.begin()
    docs = [twin_doc("t1", temperature=float(i)) for i in range(4)]
    for old, new in zip(docs, docs[1:]):
        log.append("Twin", "t1", old, new, "Update", TS, txn)
    [row] = coalesce_events(log.to_df(spark)).collect()
    assert row["event_type"] == "Update"
    assert '"temperature":0.0' in row["old_value"]
    assert '"temperature":3.0' in row["new_value"]


def test_format_events_df_distributed(spark):
    log = ChangeLog("g")
    log.begin()
    log.append("Twin", "t1", None, twin_doc("t1", temperature=1.0), "Insert", TS)
    log.append(
        "Twin", "t2", twin_doc("t2", temperature=1.0),
        twin_doc("t2", temperature=2.0), "Update", TS,
    )
    out = format_events_df(log.to_df(spark), "src-a").collect()
    types = sorted(r["type"] for r in out)
    assert types == ["Konnektr.Graph.Twin.Create", "Konnektr.Graph.Twin.Update"]


# ----------------------------------------------------------------------
# routes / retry / DLQ (S5, S13)
# ----------------------------------------------------------------------

def test_router_fan_out_and_type_mapping():
    router = EventRouter(source="src-a")
    a, b = InMemoryEventSink("a"), InMemoryEventSink("b")
    router.add_sink(a)
    router.add_sink(b)
    router.add_route(EventRoute("a", "EventNotification"))
    router.add_route(
        EventRoute("b", "DataHistory",
                   type_mappings={"Konnektr.Graph.Twin.Lifecycle": "Custom.Lifecycle"})
    )
    ev = EventData("t1", "g", "Twin", None, twin_doc("t1", temperature=1.0), "Insert", TS)
    n = router.process([ev])
    # route a: 1 notification; route b: lifecycle + the create's
    # property event (reference DataHistory create semantics)
    assert n == 3
    assert a.events[0]["type"] == "Konnektr.Graph.Twin.Create"
    assert [e["type"] for e in b.events] == [
        "Custom.Lifecycle", "Konnektr.Graph.Property.Event"]


def test_resilient_sink_retries_then_dlq():
    calls = []

    def flaky(events):
        calls.append(1)
        raise RuntimeError("down")

    rs = ResilientSink(CallbackSink(flaky, "w"), max_retries=2, sleep=lambda s: None)
    rs.send([{"id": "1"}])
    assert len(calls) == 3  # initial + 2 retries
    assert len(rs.dlq) == 1
    assert rs.dlq[0]["error"] == "down"
    # replay after recovery
    ok_events = []
    rs.inner.transport = lambda evs: ok_events.extend(evs)
    assert rs.replay_dlq() == 1
    assert ok_events == [{"id": "1"}]
    assert rs.dlq == []


def test_end_to_end_change_pipeline(spark):
    """CRUD mutations → change log → router → sink (the Events
    integration-test shape, driver + distributed paths)."""
    models = [{
        "@id": "dtmi:t:M;1", "@type": "Interface", "@context": "dtmi:dtdl:context;3",
        "contents": [{"@type": "Property", "name": "temperature", "schema": "double"}],
    }]
    client = DigitalTwinsSparkClient(GraphStore.empty(spark).with_models(models))
    client.create_or_replace_digital_twin(
        "t1", {"$metadata": {"$model": "dtmi:t:M;1"}, "temperature": 1.0}, ts=TS
    )
    client.update_digital_twin(
        "t1", [{"op": "replace", "path": "/temperature", "value": 2.0}], ts=TS
    )
    router = EventRouter(source="src-a")
    sink = InMemoryEventSink("mem")
    router.add_sink(sink)
    router.add_route(EventRoute("mem", "EventNotification"))
    n = run_change_pipeline(client.changes, router)
    assert n == 2
    assert [e["type"] for e in sink.events] == [
        "Konnektr.Graph.Twin.Create", "Konnektr.Graph.Twin.Update",
    ]
    assert client.changes.events == []  # drained

    # distributed path over a fresh mutation
    client.update_digital_twin(
        "t1", [{"op": "replace", "path": "/temperature", "value": 3.0}], ts=TS
    )
    sink.events.clear()
    run_change_pipeline(client.changes, router, spark=spark, distributed=True)
    assert len(sink.events) == 1
    assert sink.events[0]["type"] == "Konnektr.Graph.Twin.Update"
    patch_paths = [p["path"] for p in sink.events[0]["data"]["patch"]]
    assert "/temperature" in patch_paths


def test_router_telemetry_passthrough():
    router = EventRouter(source="src-a")
    sink = InMemoryEventSink("mem")
    router.add_sink(sink)
    router.add_route(EventRoute("mem", "EventNotification"))
    router.process_telemetry(
        [{"digitalTwinId": "t1", "timestamp": TS, "telemetry": {"x": 1}}]
    )
    assert sink.events[0]["type"] == "Konnektr.IoT.Telemetry"


# ----------------------------------------------------------------------
# run_change_stream: the package-level Structured Streaming entry point
# ----------------------------------------------------------------------

def _feed_events():
    import json as _json

    def ev(entity, old, new, etype, ts, txn, seq):
        return {
            "entity_id": entity, "graph_name": "g", "table_name": "Twin",
            "old_value": None if old is None else _json.dumps(old),
            "new_value": None if new is None else _json.dumps(new),
            "event_type": etype, "timestamp": ts, "txn_id": txn, "seq": seq,
        }

    t1a = {"$dtId": "t1", "$metadata": {"$model": "m"}, "x": 1}
    t1b = {"$dtId": "t1", "$metadata": {"$model": "m"}, "x": 2}
    t2 = {"$dtId": "t2", "$metadata": {"$model": "m"}, "x": 9}
    return [
        ev("t1", None, t1a, "Insert", "2026-02-01T00:00:00.000", 1, 1),
        ev("t1", t1a, t1b, "Update", "2026-02-01T00:00:01.000", 1, 2),
        ev("t2", None, t2, "Insert", "2026-02-01T00:00:02.000", 2, 3),
        ev("t2", t2, None, "Delete", "2026-02-01T00:00:03.000", 3, 4),
    ]


def test_run_change_stream_rejects_started_exporter(spark, tmp_path):
    """r11 (ADVICE): an exporter whose background thread is ticking
    (start() was called) must be rejected — run_once has no lock, so
    micro-batch ticks plus the thread would put two writers on one
    Delta export log."""
    import pytest as _pytest

    from pg_age_digitaltwins_spark.streaming.sinks import run_change_stream

    class _StartedExporter:
        _thread = object()  # what ContinuousDeltaExporter.start() leaves

        def run_once(self):  # pragma: no cover - must never be reached
            raise AssertionError("tick raced the background thread")

    feed = tmp_path / "feed"
    feed.mkdir()
    router = EventRouter(source="src-guard")
    with _pytest.raises(ValueError, match="background thread"):
        run_change_stream(
            spark, str(feed), router, str(tmp_path / "ckpt"),
            exporter=_StartedExporter(),
        )


def test_run_change_stream_end_to_end(spark, tmp_path):
    """The package API stands up readStream → coalesce → format →
    routes as one streaming query; the lake route delivers executor-
    side (send_df — no driver collect), the memory route via collect;
    type_mappings rewrite JVM-side."""
    import json as _json

    from pg_age_digitaltwins_spark.streaming.sinks import (
        NdjsonDirSink,
        run_change_stream,
    )

    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "b0.ndjson").write_text(
        "\n".join(_json.dumps(e) for e in _feed_events())
    )

    router = EventRouter(source="src-stream")
    mem = InMemoryEventSink("mem")
    lake = NdjsonDirSink(str(tmp_path / "lake"), name="lake")
    router.add_sink(mem)
    router.add_sink(lake)
    router.add_route(EventRoute("mem", "EventNotification",
                                type_mappings={"Konnektr.Graph.Twin.Create": "My.Create"}))
    router.add_route(EventRoute("lake", "EventNotification"))
    hist = NdjsonDirSink(str(tmp_path / "history"), name="history")
    router.add_sink(hist)
    router.add_route(EventRoute("history", "DataHistory"))

    q = run_change_stream(spark, str(feed), router, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    # 3 coalesced events: t1 Create (insert+update merged), t2 Create
    # (mapped), t2 Delete — both Creates hit the type mapping
    assert sorted(e["type"] for e in mem.events) == [
        "Konnektr.Graph.Twin.Delete", "My.Create", "My.Create",
    ]
    t1 = next(e for e in mem.events if e["subject"] == "t1")
    assert t1["data"]["x"] == 2  # last-new wins in coalesce

    lake_rows = spark.read.json(str(tmp_path / "lake")).collect()
    assert sorted(r["type"] for r in lake_rows) == [
        "Konnektr.Graph.Twin.Create", "Konnektr.Graph.Twin.Create",
        "Konnektr.Graph.Twin.Delete",
    ]

    # the DataHistory route landed in its own lake dir: 3 lifecycle
    # rows (2 creates + 1 delete) plus one property event per created
    # twin's non-$ property (reference parity: creates explode their
    # properties, deletes do not — CloudEventFactoryTests)
    hist_rows = spark.read.json(str(tmp_path / "history")).collect()
    hist_types = sorted(r["type"] for r in hist_rows)
    assert hist_types.count("Konnektr.Graph.Twin.Lifecycle") == 3
    assert hist_types.count("Konnektr.Graph.Property.Event") == 2

    # incremental: a second feed file is picked up by a fresh availableNow
    # run against the SAME checkpoint without re-delivering batch 0
    t3 = {"$dtId": "t3", "$metadata": {"$model": "m"}, "x": 7}
    (feed / "b1.ndjson").write_text(_json.dumps({
        "entity_id": "t3", "graph_name": "g", "table_name": "Twin",
        "old_value": None, "new_value": _json.dumps(t3),
        "event_type": "Insert", "timestamp": "2026-02-01T00:01:00.000",
        "txn_id": 4, "seq": 5,
    }))
    mem.events.clear()
    q2 = run_change_stream(spark, str(feed), router, str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    assert [e["subject"] for e in mem.events] == ["t3"]


def test_mutations_to_stream_via_feed(spark, tmp_path):
    """Full replication story through the package API: client mutations
    → ChangeLog.drain_to_feed (WAL→feed hand-off) → run_change_stream →
    sink.  Mirrors the reference's replication loop end-to-end."""
    from pg_age_digitaltwins_spark.streaming.sinks import run_change_stream

    models = [{
        "@id": "dtmi:t:M;1", "@type": "Interface",
        "@context": "dtmi:dtdl:context;3",
        "contents": [{"@type": "Property", "name": "temperature", "schema": "double"}],
    }]
    client = DigitalTwinsSparkClient(GraphStore.empty(spark).with_models(models))
    client.create_or_replace_digital_twin(
        "t1", {"$metadata": {"$model": "dtmi:t:M;1"}, "temperature": 1.0}, ts=TS
    )
    client.update_digital_twin(
        "t1", [{"op": "replace", "path": "/temperature", "value": 2.0}], ts=TS
    )

    feed = tmp_path / "feed"
    n = client.changes.drain_to_feed(str(feed))
    assert n == 2 and client.changes.events == []

    router = EventRouter(source="src-feed")
    sink = InMemoryEventSink("mem")
    router.add_sink(sink)
    router.add_route(EventRoute("mem", "EventNotification"))
    q = run_change_stream(spark, str(feed), router, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    # separate transactions -> Create then Update (no cross-txn merge)
    assert sorted(e["type"] for e in sink.events) == [
        "Konnektr.Graph.Twin.Create", "Konnektr.Graph.Twin.Update",
    ]
    upd = next(e for e in sink.events if e["type"].endswith("Update"))
    assert any(p["path"] == "/temperature" for p in upd["data"]["patch"])


# ----------------------------------------------------------------------
# stateful streaming operators (beyond-reference extensions)
# ----------------------------------------------------------------------

def _event_stream(spark, tmp_path, rows, name="evfeed"):
    import json as _json

    feed = tmp_path / name
    feed.mkdir()
    (feed / "b0.ndjson").write_text(
        "\n".join(
            _json.dumps(
                {"event_id": i, "ts": ts, "user_id": uid, "event_type": et, "value": v}
            )
            for i, (ts, uid, et, v) in enumerate(rows)
        )
    )
    return spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).json(str(feed), timestampFormat="yyyy-MM-dd'T'HH:mm:ss")


def _run_to_memory(df, name, tmp_path, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt-{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_sessionize_and_rollup(spark, tmp_path):
    from pg_age_digitaltwins_spark.streaming.stateful import (
        streaming_hourly_rollup,
        streaming_sessionize,
    )

    rows = [
        ("2026-03-01T00:00:00", 1, "view", 1.0),
        ("2026-03-01T00:10:00", 1, "view", 2.0),
        ("2026-03-01T01:05:00", 1, "click", 4.0),   # >30min gap: new session
        ("2026-03-01T00:05:00", 2, "view", 8.0),
    ]
    # complete mode: a finite feed never advances the watermark past the
    # session ends, so append would emit nothing until more data arrives
    _run_to_memory(
        streaming_sessionize(_event_stream(spark, tmp_path, rows)),
        "sess", tmp_path, mode="complete",
    )
    sess = {
        (r["user_id"], r["n_events"]): r["sum_value"]
        for r in spark.sql("select * from sess").collect()
    }
    # user 1: one 2-event session + one 1-event session; user 2: one
    assert sess == {(1, 2): 3.0, (1, 1): 4.0, (2, 1): 8.0}

    _run_to_memory(
        streaming_hourly_rollup(_event_stream(spark, tmp_path, rows, name="rollfeed")),
        "roll", tmp_path, mode="complete",
    )
    roll = {
        (str(r["hour_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from roll").collect()
    }
    assert roll[("2026-03-01 00:00:00", "view")] == (3, 11.0)
    assert roll[("2026-03-01 01:00:00", "click")] == (1, 4.0)


def test_deadband_filter_stateful(spark, tmp_path):
    """applyInPandasWithState: emits only moves >= threshold vs the last
    EMITTED value, state carried across micro-batches."""
    import json as _json

    from pg_age_digitaltwins_spark.streaming.stateful import deadband_filter

    feed = tmp_path / "dbfeed"
    feed.mkdir()

    def write_batch(name, rows):
        (feed / name).write_text(
            "\n".join(
                _json.dumps(
                    {"event_id": i, "ts": ts, "user_id": uid,
                     "event_type": "telemetry", "value": v}
                )
                for i, (ts, uid, v) in enumerate(rows)
            )
        )

    write_batch("b0.ndjson", [
        ("2026-03-01T00:00:00", 1, 20.0),   # first → emit
        ("2026-03-01T00:01:00", 1, 22.0),   # +2 < 5 → suppressed
        ("2026-03-01T00:02:00", 1, 26.0),   # +6 vs 20 → emit
        ("2026-03-01T00:00:30", 2, 1.0),    # first → emit
    ])
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).json(str(feed), timestampFormat="yyyy-MM-dd'T'HH:mm:ss")
    _run_to_memory(deadband_filter(stream, threshold=5.0), "db", tmp_path)
    out = sorted(
        (r["user_id"], r["value"], r["prev_emitted"])
        for r in spark.sql("select * from db").collect()
    )
    assert out == [(1, 20.0, None), (1, 26.0, 20.0), (2, 1.0, None)]

    # second micro-batch: state (last emitted 26.0 / 1.0) must persist
    write_batch("b1.ndjson", [
        ("2026-03-01T00:03:00", 1, 28.0),   # +2 vs 26 → suppressed
        ("2026-03-01T00:04:00", 1, 33.0),   # +7 vs 26 → emit
        ("2026-03-01T00:05:00", 2, 2.0),    # +1 vs 1 → suppressed
    ])
    _run_to_memory(deadband_filter(stream, threshold=5.0), "db2", tmp_path)
    out2 = sorted(
        (r["user_id"], r["value"], r["prev_emitted"])
        for r in spark.sql("select * from db2").collect()
    )
    assert (1, 33.0, 26.0) in out2
    assert (1, 28.0, 2.0) not in out2 and all(v != 28.0 for _, v, _p in out2)
    assert all(v != 2.0 for _, v, _p in out2)


# ----------------------------------------------------------------------
# WebhookSink: real HTTP delivery over loopback (S12)
# ----------------------------------------------------------------------


class _WebhookServer:
    """Loopback endpoint capturing CloudEvent POSTs; status injectable."""

    def __init__(self):
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        self.requests = []
        self.status = 200
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):
                import json as _json

                n = int(self.headers.get("Content-Length", 0))
                outer.requests.append({
                    "headers": dict(self.headers),
                    "body": _json.loads(self.rfile.read(n)),
                })
                self.send_response(outer.status)
                self.end_headers()

            def log_message(self, *a):  # noqa: D102 — quiet
                pass

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.server.server_address[1]}/hook"
        self.thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self.thread.start()

    def stop(self):
        self.server.shutdown()
        self.server.server_close()


def test_webhook_sink_end_to_end_over_http(spark, tmp_path):
    """Mutations → drain_to_feed → run_change_stream → a REAL local HTTP
    server receives one structured-mode CloudEvent POST per event with
    the reference's content type and auth header."""
    from pg_age_digitaltwins_spark.streaming.sinks import (
        WebhookSink,
        run_change_stream,
    )

    srv = _WebhookServer()
    try:
        models = [{
            "@id": "dtmi:t:M;1", "@type": "Interface",
            "@context": "dtmi:dtdl:context;3",
            "contents": [{"@type": "Property", "name": "temperature", "schema": "double"}],
        }]
        client = DigitalTwinsSparkClient(GraphStore.empty(spark).with_models(models))
        client.create_or_replace_digital_twin(
            "t1", {"$metadata": {"$model": "dtmi:t:M;1"}, "temperature": 1.0}, ts=TS
        )
        client.update_digital_twin(
            "t1", [{"op": "replace", "path": "/temperature", "value": 2.0}], ts=TS
        )
        feed = tmp_path / "feed"
        client.changes.drain_to_feed(str(feed))

        router = EventRouter(source="src-webhook")
        hook = WebhookSink(srv.url, auth_type="ApiKey",
                           header_name="X-Api-Key", header_value="sekrit")
        router.add_sink(hook)
        router.add_route(EventRoute("webhook", "EventNotification"))
        q = run_change_stream(spark, str(feed), router, str(tmp_path / "ckpt"))
        q.awaitTermination(120)

        assert len(srv.requests) == 2 and hook.is_healthy
        types = sorted(r["body"]["type"] for r in srv.requests)
        assert types == ["Konnektr.Graph.Twin.Create", "Konnektr.Graph.Twin.Update"]
        for r in srv.requests:
            assert r["headers"]["Content-Type"].startswith("application/cloudevents+json")
            assert r["headers"]["X-Api-Key"] == "sekrit"
            assert r["body"]["subject"] == "t1"
            assert r["body"]["specversion"] == "1.0"
    finally:
        srv.stop()


def test_webhook_sink_error_status_marks_unhealthy_no_retry():
    """A non-2xx response marks the sink unhealthy without raising (the
    reference logs and continues — WebhookEventSink.cs:174-187), so the
    resilient wrapper must NOT retry or dead-letter it."""
    from pg_age_digitaltwins_spark.streaming.sinks import WebhookSink

    srv = _WebhookServer()
    srv.status = 500
    try:
        hook = WebhookSink(srv.url)
        rs = ResilientSink(hook, max_retries=2, sleep=lambda s: None)
        rs.send([{"id": "e1", "type": "T", "subject": "s", "data": {}}])
        assert not hook.is_healthy and "HTTP 500" in hook.last_error
        assert rs.dlq == [] and len(srv.requests) == 1
    finally:
        srv.stop()


def test_webhook_sink_transport_failure_retries_to_dlq():
    """Connection-refused is a transport failure: SinkError → bounded
    retries → DLQ, and a later replay succeeds once the endpoint is
    back (DLQService replay semantics)."""
    from pg_age_digitaltwins_spark.streaming.sinks import WebhookSink

    srv = _WebhookServer()
    url = srv.url
    srv.stop()  # nothing listening → ConnectionRefused

    hook = WebhookSink(url, timeout=1.0)
    rs = ResilientSink(hook, max_retries=2, sleep=lambda s: None)
    ev = {"id": "e1", "type": "T", "subject": "s", "data": {}}
    rs.send([ev])
    assert not hook.is_healthy and len(rs.dlq) == 1

    srv2 = _WebhookServer()  # fresh port — point the sink at it
    try:
        hook.url = srv2.url
        assert rs.replay_dlq() == 1
        assert rs.dlq == [] and len(srv2.requests) == 1 and hook.is_healthy
    finally:
        srv2.stop()


# ----------------------------------------------------------------------
# StreamingHealthListener (S14)
# ----------------------------------------------------------------------


def test_streaming_health_surface(spark, tmp_path):
    """The health snapshot reflects query progress (via a real
    StreamingQueryListener) and sink state: a sink whose transport
    fails shows unhealthy with DLQ depth; a healthy one doesn't."""
    import json as _json
    import time as _time

    from pg_age_digitaltwins_spark.streaming.sinks import (
        CallbackSink,
        StreamingHealthListener,
        run_change_stream,
    )

    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "b0.ndjson").write_text(
        "\n".join(_json.dumps(e) for e in _feed_events())
    )

    router = EventRouter(source="src-health")
    good = InMemoryEventSink("good")
    bad = CallbackSink(lambda evs: (_ for _ in ()).throw(RuntimeError("down")),
                       name="bad")
    router.add_sink(good)
    router.add_sink(bad, max_retries=1, sleep=lambda s: None)
    router.add_route(EventRoute("good", "EventNotification"))
    router.add_route(EventRoute("bad", "EventNotification"))

    health = StreamingHealthListener()
    q = run_change_stream(spark, str(feed), router, str(tmp_path / "ckpt"),
                          health=health)
    q.awaitTermination(120)
    try:
        # listener callbacks are async — wait for the terminate event
        deadline = _time.time() + 30
        while _time.time() < deadline:
            snap = health.snapshot()
            qs = snap["replication"]["queries"]
            if qs and all(not v.get("active") for v in qs.values()) and all(
                "progress" in v for v in qs.values()
            ):
                break
            _time.sleep(0.2)

        snap = health.snapshot()
        assert snap["sinks"]["detail"]["bad"]["healthy"] is False
        assert snap["sinks"]["detail"]["bad"]["dlqDepth"] > 0
        assert snap["sinks"]["detail"]["good"]["healthy"] is True
        assert snap["sinks"]["unhealthySinkNames"] == ["bad"]
        assert snap["healthy"] is False
        (qstate,) = [v for v in snap["replication"]["queries"].values()]
        assert qstate["progress"]["batchId"] >= 0
        assert qstate["progress"]["numInputRows"] >= 1
        assert qstate["exception"] is None  # clean availableNow drain
    finally:
        spark.streams.removeListener(health.listener())


# ----------------------------------------------------------------------
# MqttSink: real MQTT 3.1.1 framing against an in-process fake broker
# ----------------------------------------------------------------------


class _FakeMqttBroker:
    """Accepts one client: validates CONNECT, answers CONNACK, decodes
    QoS-0 PUBLISH packets into (topic, payload) tuples."""

    def __init__(self, refuse=False, fragment_connack=False):
        import socket
        import threading

        self.publishes = []
        self.connect = None
        self.refuse = refuse
        self.fragment_connack = fragment_connack
        self._srv = socket.create_server(("127.0.0.1", 0))
        # timeout + flag: closing a listener under a thread blocked in
        # accept() does NOT release the port on Linux (the syscall pins
        # the socket), so the loop must wake up to observe _stopped
        self._srv.settimeout(0.1)
        self._stopped = False
        self.port = self._srv.getsockname()[1]
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    @staticmethod
    def _read_varint(sock):
        mult, val = 1, 0
        while True:
            b = sock.recv(1)
            if not b:
                return None
            val += (b[0] & 0x7F) * mult
            if not b[0] & 0x80:
                return val
            mult *= 128

    def _serve(self):
        while not self._stopped:
            try:
                conn, _ = self._srv.accept()
            except TimeoutError:
                continue
            except OSError:
                return
            with conn:
                self._handle(conn)
        self._srv.close()

    def _handle(self, conn):
        if True:
            while True:
                hdr = conn.recv(1)
                if not hdr:
                    return
                ptype = hdr[0] >> 4
                length = self._read_varint(conn)
                body = b""
                while len(body) < length:
                    chunk = conn.recv(length - len(body))
                    if not chunk:
                        return
                    body += chunk
                if ptype == 1:  # CONNECT
                    # proto name(6) + level(1) + flags(1) + keepalive(2)
                    self.connect = {
                        "proto": body[2:6].decode(),
                        "level": body[6],
                        "flags": body[7],
                    }
                    rc = 0x05 if self.refuse else 0x00
                    ack = bytes([0x20, 0x02, 0x00, rc])
                    if self.fragment_connack:
                        # force the 4 CONNACK bytes across separate TCP
                        # segments — a single recv(4) would short-read
                        import socket as _socket
                        import time as _time

                        conn.setsockopt(
                            _socket.IPPROTO_TCP, _socket.TCP_NODELAY, 1
                        )
                        for b in ack:
                            conn.sendall(bytes([b]))
                            _time.sleep(0.02)
                    else:
                        conn.sendall(ack)
                    if self.refuse:
                        return
                elif ptype == 3:  # PUBLISH (qos0)
                    tlen = int.from_bytes(body[:2], "big")
                    topic = body[2 : 2 + tlen].decode()
                    self.publishes.append((topic, body[2 + tlen :]))
                elif ptype == 14:  # DISCONNECT
                    return

    def stop(self):
        self._stopped = True
        self._thread.join(timeout=2.0)


def test_mqtt_sink_publishes_cloudevents():
    import json as _json

    from pg_age_digitaltwins_spark.streaming.sinks import MqttSink

    broker = _FakeMqttBroker()
    try:
        sink = MqttSink("127.0.0.1", broker.port, topic="twins/events",
                        username="u1", password="p1")
        evs = [
            {"id": "e1", "type": "Konnektr.Graph.Twin.Create", "subject": "t1",
             "source": "src", "data": {"x": 1}},
            {"id": "e2", "type": "Konnektr.Graph.Twin.Update", "subject": "t1",
             "source": "src", "data": {"x": 2}},
        ]
        sink.send(evs)
        assert sink.is_healthy
        sink.close()
        import time as _time
        deadline = _time.time() + 5
        while len(broker.publishes) < 2 and _time.time() < deadline:
            _time.sleep(0.05)
        assert broker.connect["proto"] == "MQTT" and broker.connect["level"] == 4
        assert broker.connect["flags"] & 0x80 and broker.connect["flags"] & 0x40
        assert [t for t, _ in broker.publishes] == ["twins/events"] * 2
        bodies = [_json.loads(p) for _, p in broker.publishes]
        assert [b["id"] for b in bodies] == ["e1", "e2"]
        assert all(b["specversion"] == "1.0" for b in bodies)
    finally:
        broker.stop()


def test_mqtt_sink_refused_or_down_goes_to_dlq():
    from pg_age_digitaltwins_spark.streaming.sinks import MqttSink

    # CONNACK refusal
    broker = _FakeMqttBroker(refuse=True)
    try:
        sink = MqttSink("127.0.0.1", broker.port, topic="t")
        rs = ResilientSink(sink, max_retries=1, sleep=lambda s: None)
        rs.send([{"id": "e1", "type": "T", "subject": "s", "data": {}}])
        assert not sink.is_healthy and len(rs.dlq) == 1
        assert "CONNACK refused" in rs.dlq[0]["error"]
    finally:
        broker.stop()

    # nothing listening
    broker2 = _FakeMqttBroker()
    port = broker2.port
    broker2.stop()
    sink2 = MqttSink("127.0.0.1", port, topic="t", timeout=1.0)
    rs2 = ResilientSink(sink2, max_retries=1, sleep=lambda s: None)
    rs2.send([{"id": "e2", "type": "T", "subject": "s", "data": {}}])
    assert not sink2.is_healthy and len(rs2.dlq) == 1


def test_mqtt_sink_fresh_is_healthy_and_connects_lazily():
    """A newly configured MQTT sink must report healthy before any
    event flows (/health would otherwise show a fresh route as down);
    only a failed delivery degrades it, and a deliberate close() keeps
    it healthy (it reconnects lazily on the next send)."""
    from pg_age_digitaltwins_spark.streaming.sinks import MqttSink

    sink = MqttSink("127.0.0.1", 1, topic="t")  # never connected
    assert sink.is_healthy

    broker = _FakeMqttBroker()
    try:
        live = MqttSink("127.0.0.1", broker.port, topic="t")
        live.send([{"id": "e1", "type": "T", "subject": "s", "data": {}}])
        live.close()
        assert live.is_healthy  # closed-but-never-failed stays healthy
        live.send([{"id": "e2", "type": "T", "subject": "s", "data": {}}])
        assert live.is_healthy  # lazy reconnect worked
        live.close()
    finally:
        broker.stop()


def test_mqtt_sink_connack_fragmented_across_segments():
    """CONNACK arriving in multiple TCP segments must not be
    misreported as a refusal — the client reads exactly 4 bytes with a
    recv loop."""
    from pg_age_digitaltwins_spark.streaming.sinks import MqttSink

    broker = _FakeMqttBroker(fragment_connack=True)
    try:
        sink = MqttSink("127.0.0.1", broker.port, topic="t")
        sink.send([{"id": "e1", "type": "T", "subject": "s", "data": {}}])
        assert sink.is_healthy
        sink.close()
        import time as _time

        deadline = _time.time() + 5
        while not broker.publishes and _time.time() < deadline:
            _time.sleep(0.05)
        assert len(broker.publishes) == 1
    finally:
        broker.stop()


def test_replay_dlq_per_event_transport_no_duplicate_delivery():
    """Per-event transports (webhook/MQTT) deliver inside send()'s
    per-event loop, so replay must go one event per send: a mid-chunk
    transport failure must not re-queue already-delivered events (the
    next replay would duplicate them)."""

    class _PerEventSink:
        name = "pe"
        per_event_transport = True

        def __init__(self):
            self.delivered = []
            self.fail_ids = set()

        def send(self, events):
            for e in events:
                if e["id"] in self.fail_ids:
                    raise RuntimeError(f"down at {e['id']}")
                self.delivered.append(e["id"])

    sink = _PerEventSink()
    rs = ResilientSink(sink, max_retries=0, sleep=lambda s: None)
    rs.dlq = [
        {"event": {"id": i}, "error": "old", "sink": "pe"} for i in ("1", "2", "3")
    ]
    sink.fail_ids = {"2"}
    assert rs.replay_dlq() == 2
    # 1 and 3 delivered exactly once; only 2 back in the DLQ
    assert sink.delivered == ["1", "3"]
    assert [d["event"]["id"] for d in rs.dlq] == ["2"]
    # second replay after recovery delivers 2 without duplicating 1/3
    sink.fail_ids = set()
    assert rs.replay_dlq() == 1
    assert sink.delivered == ["1", "3", "2"]
    assert rs.dlq == []


def test_health_listener_registers_at_most_once():
    """Reusing one StreamingHealthListener across several streams must
    add it to spark.streams exactly once — duplicate registrations
    produce duplicate callbacks."""
    from pg_age_digitaltwins_spark.streaming.sinks import StreamingHealthListener

    added = []

    class _Streams:
        def addListener(self, listener):
            added.append(listener)

    class _Spark:
        streams = _Streams()

    h = StreamingHealthListener()
    h.register(_Spark())
    h.register(_Spark())
    h.register(_Spark())
    assert len(added) == 1


# ----------------------------------------------------------------------
# KafkaSink: real Produce v3 / record-batch v2 framing against a
# validating fake broker
# ----------------------------------------------------------------------


class _FakeKafkaBroker:
    """Accepts produce requests, decodes them with the module's decoder
    (which independently re-verifies the batch CRC-32C), and answers a
    Produce v3 response with the configured error code."""

    def __init__(self, error_code=0, sasl_mechanisms=(), sasl_users=None,
                 valid_tokens=()):
        import socket
        import threading

        self.requests = []
        self.handshakes = []
        self.auths = []
        self.error_code = error_code
        # SASL config: when mechanisms are declared, a produce before a
        # successful authenticate is refused (connection dropped).
        self.sasl_mechanisms = tuple(sasl_mechanisms)
        self.sasl_users = sasl_users or {}
        self.valid_tokens = tuple(valid_tokens)
        self._srv = socket.create_server(("127.0.0.1", 0))
        self._srv.settimeout(0.1)
        self._stopped = False
        self.port = self._srv.getsockname()[1]
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self):
        from pg_age_digitaltwins_spark.streaming import kafka_wire as kw

        while not self._stopped:
            try:
                conn, _ = self._srv.accept()
            except TimeoutError:
                continue
            except OSError:
                return
            with conn:
                try:
                    self._serve_conn(conn, kw)
                except (ConnectionError, ValueError):
                    pass
        self._srv.close()

    def _serve_conn(self, conn, kw):
        authenticated = not self.sasl_mechanisms
        mechanism = None
        while True:
            size = int.from_bytes(self._recv(conn, 4), "big")
            payload = self._recv(conn, size)
            header, _ = kw.decode_request_header(payload)
            api = header["api_key"]
            if api == kw.API_SASL_HANDSHAKE:
                req = kw.decode_sasl_handshake_request(payload)
                self.handshakes.append(req)
                if req["mechanism"] not in self.sasl_mechanisms:
                    conn.sendall(kw.encode_sasl_handshake_response(
                        req["correlation_id"],
                        kw.ERR_UNSUPPORTED_SASL_MECHANISM,
                        self.sasl_mechanisms,
                    ))
                    return
                mechanism = req["mechanism"]
                conn.sendall(kw.encode_sasl_handshake_response(
                    req["correlation_id"], 0, self.sasl_mechanisms))
            elif api == kw.API_SASL_AUTHENTICATE:
                req = kw.decode_sasl_authenticate_request(payload)
                self.auths.append(req)
                ok, msg = False, None
                try:
                    if mechanism == "PLAIN":
                        _zid, user, pw = kw.parse_sasl_plain(req["auth_bytes"])
                        ok = self.sasl_users.get(user) == pw
                        msg = None if ok else "Invalid username or password"
                    elif mechanism == "OAUTHBEARER":
                        tok = kw.parse_oauthbearer(req["auth_bytes"])
                        ok = tok in self.valid_tokens
                        msg = None if ok else "Invalid token"
                    else:
                        msg = "authenticate before handshake"
                except ValueError as exc:
                    msg = str(exc)
                conn.sendall(kw.encode_sasl_authenticate_response(
                    req["correlation_id"],
                    0 if ok else kw.ERR_SASL_AUTHENTICATION_FAILED,
                    msg,
                    session_lifetime_ms=3_600_000 if ok else 0,
                ))
                if not ok:
                    return
                authenticated = True
            elif api == 0:  # Produce
                if not authenticated:
                    return  # brokers drop unauthenticated produces
                req = kw.decode_produce_request(payload)
                self.requests.append(req)
                conn.sendall(kw.encode_produce_response(
                    req["correlation_id"], req["topic"],
                    req["partition"], self.error_code, base_offset=42,
                ))
                return
            else:
                return

    @staticmethod
    def _recv(conn, n):
        buf = b""
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("eof")
            buf += chunk
        return buf

    def stop(self):
        self._stopped = True
        self._thread.join(timeout=2.0)


def test_kafka_sink_wire_produce():
    import json as _json

    from pg_age_digitaltwins_spark.streaming.sinks import KafkaSink

    broker = _FakeKafkaBroker()
    try:
        sink = KafkaSink(f"127.0.0.1:{broker.port}", topic="twin-events")
        sink.send([
            {"id": "e1", "type": "Konnektr.Graph.Twin.Create", "subject": "t1",
             "source": "src", "data": {"x": 1}},
            {"id": "e2", "type": "Konnektr.Graph.Twin.Delete", "subject": "t2",
             "source": "src", "data": None},
        ])
        assert sink.is_healthy
        (req,) = broker.requests  # CRC already verified by the decoder
        assert req["api_key"] == 0 and req["api_version"] == 3
        assert req["topic"] == "twin-events" and req["acks"] == 1
        keys = [k.decode() for k, _ in req["records"]]
        assert keys == ["t1", "t2"]  # key = subject (reference contract)
        bodies = [_json.loads(v) for _, v in req["records"]]
        assert [b["id"] for b in bodies] == ["e1", "e2"]
        assert all(b["specversion"] == "1.0" for b in bodies)
    finally:
        broker.stop()


def test_kafka_sink_broker_error_and_down_to_dlq():
    from pg_age_digitaltwins_spark.streaming.sinks import KafkaSink

    broker = _FakeKafkaBroker(error_code=7)  # REQUEST_TIMED_OUT
    try:
        sink = KafkaSink(f"127.0.0.1:{broker.port}", topic="t")
        rs = ResilientSink(sink, max_retries=1, sleep=lambda s: None)
        rs.send([{"id": "e1", "type": "T", "subject": "s", "data": {}}])
        assert not sink.is_healthy and len(rs.dlq) == 1
        assert "error_code=7" in rs.dlq[0]["error"]
    finally:
        broker.stop()

    broker2 = _FakeKafkaBroker()
    port = broker2.port
    broker2.stop()
    sink2 = KafkaSink(f"127.0.0.1:{port}", topic="t", timeout=1.0)
    rs2 = ResilientSink(sink2, max_retries=1, sleep=lambda s: None)
    rs2.send([{"id": "e2", "type": "T", "subject": "s", "data": {}}])
    assert not sink2.is_healthy and len(rs2.dlq) == 1


def test_kafka_sink_sasl_plain_handshake_and_produce():
    """SASL PLAIN: handshake v1 + authenticate v1 precede the produce;
    the fake broker parses the RFC-4616 bytes and only then accepts
    records (reference parity: KafkaEventSink.cs:37-82)."""
    from pg_age_digitaltwins_spark.streaming.sinks import KafkaSink

    broker = _FakeKafkaBroker(
        sasl_mechanisms=("PLAIN", "OAUTHBEARER"),
        sasl_users={"svc-user": "hunter2"},
    )
    try:
        sink = KafkaSink(
            f"127.0.0.1:{broker.port}", topic="t",
            sasl_mechanism="PLAIN",
            sasl_username="svc-user", sasl_password="hunter2",
        )
        sink.send([{"id": "e1", "type": "T", "subject": "s1", "data": {}}])
        assert sink.is_healthy
        (hs,) = broker.handshakes
        assert hs["api_key"] == 17 and hs["api_version"] == 1
        assert hs["mechanism"] == "PLAIN"
        (auth,) = broker.auths
        assert auth["api_key"] == 36 and auth["api_version"] == 1
        assert auth["auth_bytes"] == b"\x00svc-user\x00hunter2"
        (req,) = broker.requests
        assert [k.decode() for k, _ in req["records"]] == ["s1"]
    finally:
        broker.stop()


def test_kafka_sink_sasl_plain_bad_credentials_to_dlq():
    from pg_age_digitaltwins_spark.streaming.sinks import KafkaSink

    broker = _FakeKafkaBroker(
        sasl_mechanisms=("PLAIN",), sasl_users={"svc-user": "hunter2"}
    )
    try:
        sink = KafkaSink(
            f"127.0.0.1:{broker.port}", topic="t",
            sasl_mechanism="PLAIN",
            sasl_username="svc-user", sasl_password="wrong",
        )
        rs = ResilientSink(sink, max_retries=1, sleep=lambda s: None)
        rs.send([{"id": "e1", "type": "T", "subject": "s", "data": {}}])
        assert not sink.is_healthy and len(rs.dlq) == 1
        assert "error_code=58" in rs.dlq[0]["error"]  # SASL_AUTHENTICATION_FAILED
        assert broker.requests == []  # no produce got through
    finally:
        broker.stop()


def test_kafka_sink_sasl_oauthbearer_token_per_connection():
    """OAUTHBEARER: token_provider is called per connection (the
    token-refresh-handler contract) and the GS2-framed bearer token is
    what the broker validates."""
    from pg_age_digitaltwins_spark.streaming.sinks import KafkaSink

    tokens = iter(["tok-1", "tok-2"])
    calls = []

    def provider():
        t = next(tokens)
        calls.append(t)
        return t

    broker = _FakeKafkaBroker(
        sasl_mechanisms=("OAUTHBEARER",), valid_tokens=("tok-1", "tok-2")
    )
    try:
        sink = KafkaSink(
            f"127.0.0.1:{broker.port}", topic="t",
            sasl_mechanism="OAUTHBEARER", token_provider=provider,
        )
        sink.send([{"id": "e1", "type": "T", "subject": "a", "data": {}}])
        sink.send([{"id": "e2", "type": "T", "subject": "b", "data": {}}])
        assert calls == ["tok-1", "tok-2"]  # fresh token each connection
        assert broker.auths[0]["auth_bytes"] == b"n,,\x01auth=Bearer tok-1\x01\x01"
        assert len(broker.requests) == 2
    finally:
        broker.stop()


def test_kafka_sink_sasl_mechanism_unsupported_by_broker():
    from pg_age_digitaltwins_spark.streaming.sinks import KafkaSink
    from pg_age_digitaltwins_spark.streaming.sinks import SinkError

    broker = _FakeKafkaBroker(sasl_mechanisms=("OAUTHBEARER",))
    try:
        sink = KafkaSink(
            f"127.0.0.1:{broker.port}", topic="t",
            sasl_mechanism="PLAIN", sasl_username="u", sasl_password="p",
        )
        with pytest.raises(SinkError, match="handshake rejected"):
            sink.send([{"id": "e1", "type": "T", "subject": "s", "data": {}}])
        assert not sink.is_healthy
    finally:
        broker.stop()


def test_kafka_sink_sasl_config_validation():
    from pg_age_digitaltwins_spark.streaming.sinks import KafkaSink

    with pytest.raises(ValueError, match="unsupported sasl_mechanism"):
        KafkaSink("h:1", topic="t", sasl_mechanism="SCRAM-SHA-256")
    with pytest.raises(ValueError, match="requires sasl_username"):
        KafkaSink("h:1", topic="t", sasl_mechanism="PLAIN")
    with pytest.raises(ValueError, match="requires token_provider"):
        KafkaSink("h:1", topic="t", sasl_mechanism="OAUTHBEARER")


def test_mqtt_sink_end_to_end_change_stream(spark, tmp_path):
    """Mutation → run_change_stream → real MQTT framing → fake broker:
    the full replication story over the MQTT transport."""
    import json as _json
    import time as _time

    from pg_age_digitaltwins_spark.streaming.sinks import (
        MqttSink,
        run_change_stream,
    )

    broker = _FakeMqttBroker()
    try:
        models = [{
            "@id": "dtmi:t:M;1", "@type": "Interface",
            "@context": "dtmi:dtdl:context;3",
            "contents": [{"@type": "Property", "name": "temperature", "schema": "double"}],
        }]
        client = DigitalTwinsSparkClient(GraphStore.empty(spark).with_models(models))
        feed = tmp_path / "feed"
        client.changes.attach_feed(str(feed))
        client.create_or_replace_digital_twin(
            "t1", {"$metadata": {"$model": "dtmi:t:M;1"}, "temperature": 1.0}, ts=TS
        )

        router = EventRouter(source="src-mqtt")
        router.add_sink(MqttSink("127.0.0.1", broker.port, topic="twins/changes"))
        router.add_route(EventRoute("mqtt", "EventNotification"))
        q = run_change_stream(spark, str(feed), router, str(tmp_path / "ckpt"))
        q.awaitTermination(120)

        deadline = _time.time() + 5
        while not broker.publishes and _time.time() < deadline:
            _time.sleep(0.05)
        (pub,) = broker.publishes
        assert pub[0] == "twins/changes"
        body = _json.loads(pub[1])
        assert body["type"] == "Konnektr.Graph.Twin.Create"
        assert body["subject"] == "t1" and body["data"]["temperature"] == 1.0
    finally:
        broker.stop()


def test_dedupe_within_watermark_drops_redeliveries(spark, tmp_path):
    """An at-least-once replay of the same event ids is suppressed
    within the watermark window; state stays bounded by the watermark
    (dropDuplicatesWithinWatermark, not an ever-growing dropDuplicates)."""
    import json as _json
    import os

    from pg_age_digitaltwins_spark.streaming.stateful import dedupe_within_watermark

    feed = tmp_path / "feed"
    os.makedirs(feed)

    def write_batch(name, rows):
        with open(feed / name, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    rows = [
        {"event_id": i, "ts": f"2026-03-01T00:0{i}:00.000", "user_id": 1,
         "event_type": "click", "value": float(i)}
        for i in range(3)
    ]
    write_batch("b1.ndjson", rows)
    write_batch("b2.ndjson", rows[1:] + [  # redelivered tail + one new
        {"event_id": 9, "ts": "2026-03-01T00:04:00.000", "user_id": 1,
         "event_type": "click", "value": 9.0}
    ])

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .json(str(feed))
    )
    deduped = dedupe_within_watermark(stream, ["event_id"], "10 minutes")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(r["event_id"] for r in spark.sql("SELECT * FROM dedup_out").collect())
    assert got == [0, 1, 2, 9]  # each id exactly once


def test_data_history_create_emits_property_events():
    """Reference parity (CloudEventFactoryTests::..TwinCreateEventWith
    Properties): a Create explodes its non-$ properties as property
    events beside the lifecycle event; a Delete emits lifecycle ONLY."""
    doc = twin_doc("t1", temperature=21.5)
    create = EventData("t1", "g", "Twin", None, doc, "Insert", TS)
    out = data_history(create, "svc", ID)
    assert [e["type"] for e in out] == [
        "Konnektr.Graph.Twin.Lifecycle",
        "Konnektr.Graph.Property.Event",
    ]
    prop = out[1]["data"]
    assert prop["key"] == "temperature" and prop["value"] == 21.5
    assert prop["action"] == "Create" and prop["id"] == "t1"

    delete = EventData("t1", "g", "Twin", doc, None, "Delete", TS)
    out = data_history(delete, "svc", ID)
    assert [e["type"] for e in out] == ["Konnektr.Graph.Twin.Lifecycle"]

    rel = {"$relationshipId": "r1", "$sourceId": "a", "$targetId": "b",
           "$relationshipName": "has", "distance": 2.0}
    rcreate = EventData("r1", "g", "has", None, rel, "Insert", TS)
    out = data_history(rcreate, "svc", ID)
    assert [e["type"] for e in out] == [
        "Konnektr.Graph.Relationship.Lifecycle",
        "Konnektr.Graph.Property.Event",
    ]
    assert out[1]["data"]["key"] == "distance"
    assert out[1]["data"]["relationshipTarget"] == "b"


def test_notification_missing_dtid_is_clean_error():
    ev = EventData("x", "g", "Twin", None, {"no_id": True}, "Insert", TS)
    with pytest.raises(ValueError, match=r"\$dtId"):
        event_notification(ev, "src", ID)


def test_build_router_from_configuration(tmp_path):
    """EventSinkFactory parity: the appsettings EventSinks/EventRoutes/
    Parameters shape assembles a router; a misconfigured entry is
    skipped with a recorded error, not fatal; TypeMappings translate
    from SinkEventType names; unknown route sinks still raise."""
    from pg_age_digitaltwins_spark.streaming.factory import build_router

    config = {
        "EventSinks": {
            "Kafka": [
                {"Name": "k1", "BrokerList": "localhost:9092", "Topic": "t"},
                {"Name": "bad-kafka", "Topic": "missing-brokerlist"},
            ],
            "MQTT": [{"Name": "m1", "Broker": "localhost", "Port": 1883,
                      "Topic": "events", "ClientId": "c", "Username": "u",
                      "Password": "p"}],
            "Webhook": [{"Name": "w1", "Url": "http://localhost:1/hook",
                         "AuthenticationType": "Basic", "Username": "a",
                         "Password": "b"}],
            "Kusto": [{"Name": "adx", "IngestionUri": "ignored",
                       "Database": "db1",
                       "EventTypeMappings": {
                           "TwinLifecycle": "Custom.Lifecycle"}}],
        },
        "EventRoutes": [
            {"SinkName": "k1", "EventFormat": "EventNotification"},
            {"SinkName": "adx", "EventFormat": "DataHistory",
             "TypeMappings": {"TwinLifecycle": "Custom.Lifecycle"}},
        ],
        "Parameters": {"TrackLastUpdatedBy": True},
    }
    router, errors = build_router(
        config, source="cfg", kusto_root=str(tmp_path / "adx"))
    assert sorted(router.sinks) == ["adx", "k1", "m1", "w1"]
    assert [e["name"] for e in errors] == ["bad-kafka"]
    assert len(router.routes) == 2
    assert router.routes[1].type_mappings == {
        "Konnektr.Graph.Twin.Lifecycle": "Custom.Lifecycle"}
    # the Kusto sink picked up TrackLastUpdatedBy (UpdatedBy mapping)
    kusto = router.sinks["adx"].inner
    table, mapping = kusto._tables["Custom.Lifecycle"]
    assert table == "AdtTwinLifeCycleEvents"
    # only the remapped type is routed now — verify UpdatedBy on the
    # sink's property mapping through a fresh default-mapped sink
    from pg_age_digitaltwins_spark.streaming.kusto import KustoQueuedSink as _KQ
    import tempfile as _tf
    _probe = _KQ(_tf.mkdtemp(), track_last_updated_by=True)
    table, mapping = _probe._tables["Konnektr.Graph.Property.Event"]
    assert mapping[-1][0] == "UpdatedBy"
    assert kusto.database == "db1"
    # route to a nonexistent sink raises
    with pytest.raises(ValueError, match="Unknown sink"):
        build_router({"EventSinks": {}, "EventRoutes": [{"SinkName": "nope"}]})
    # deliver an event end-to-end through the config-built DataHistory
    # route into the Kusto staging queue
    ev = EventData("t1", "g", "Twin", None, twin_doc("t1"), "Insert", TS)
    import os
    router.routes = [r for r in router.routes if r.sink_name == "adx"]
    router.process([ev])
    assert len(os.listdir(tmp_path / "adx" / "queue")) == 1


def test_materialized_model_counts_incremental(spark, tmp_path):
    """Incremental view maintenance: twin counts per model are folded
    from CDC deltas (+1 create, -1 delete, move on model migration),
    batch-id idempotent, never rescanning the graph."""
    from pg_age_digitaltwins_spark.streaming.materialized import (
        ModelCountsView,
        maintain_model_counts,
    )

    models = [
        {"@id": f"dtmi:mv:{x};1", "@type": "Interface",
         "@context": "dtmi:dtdl:context;3", "contents": []}
        for x in ("A", "B")
    ]
    client = DigitalTwinsSparkClient(GraphStore.empty(spark).with_models(models))
    feed, state, ckpt = (str(tmp_path / d) for d in ("feed", "state", "ckpt"))
    for i in range(3):
        client.create_or_replace_digital_twin(
            f"a{i}", {"$metadata": {"$model": "dtmi:mv:A;1"}}, ts=TS
        )
    client.create_or_replace_digital_twin(
        "b0", {"$metadata": {"$model": "dtmi:mv:B;1"}}, ts=TS
    )
    client.changes.drain_to_feed(feed)
    q = maintain_model_counts(spark, feed, state, ckpt)
    q.awaitTermination(120)
    view = ModelCountsView(state)
    counts = {r["model_id"]: r["n_twins"] for r in view.read(spark).collect()}
    assert counts == {"dtmi:mv:A;1": 3, "dtmi:mv:B;1": 1}

    # incremental batch: delete one A twin, migrate another A -> B
    client.delete_digital_twin("a0")
    client.create_or_replace_digital_twin(
        "a1", {"$metadata": {"$model": "dtmi:mv:B;1"}}, ts=TS
    )
    client.changes.drain_to_feed(feed)
    q = maintain_model_counts(spark, feed, state, ckpt)
    q.awaitTermination(120)
    counts = {r["model_id"]: r["n_twins"] for r in view.read(spark).collect()}
    assert counts == {"dtmi:mv:A;1": 1, "dtmi:mv:B;1": 2}

    # replaying an already-applied batch is a no-op (idempotent by id)
    events = spark.createDataFrame([], "entity_id string, graph_name string, "
        "table_name string, old_value string, new_value string, "
        "event_type string, timestamp timestamp, txn_id long, seq long")
    applied = sorted(int(d[1:]) for d in __import__("os").listdir(state) if d.startswith("v"))
    view.apply_batch(events, applied[-1])
    counts2 = {r["model_id"]: r["n_twins"] for r in view.read(spark).collect()}
    assert counts2 == counts


def test_materialized_relationship_counts(spark, tmp_path):
    """The IVM machinery is generic over the fold: relationship counts
    per label maintain from the same feed (create +1, delete -1,
    updates cancel)."""
    from pg_age_digitaltwins_spark.streaming.materialized import (
        RelationshipCountsView,
    )

    models = [{
        "@id": "dtmi:rv:N;1", "@type": "Interface",
        "@context": "dtmi:dtdl:context;3",
        "contents": [
            {"@type": "Relationship", "name": "knows"},
            {"@type": "Relationship", "name": "owns"},
        ],
    }]
    client = DigitalTwinsSparkClient(GraphStore.empty(spark).with_models(models))
    for t in ("n1", "n2", "n3"):
        client.create_or_replace_digital_twin(
            t, {"$metadata": {"$model": "dtmi:rv:N;1"}}, ts=TS
        )
    client.create_or_replace_relationship(
        "n1", "k1", {"$targetId": "n2", "$relationshipName": "knows"}, ts=TS
    )
    client.create_or_replace_relationship(
        "n1", "k2", {"$targetId": "n3", "$relationshipName": "knows"}, ts=TS
    )
    client.create_or_replace_relationship(
        "n2", "o1", {"$targetId": "n3", "$relationshipName": "owns"}, ts=TS
    )
    client.delete_relationship("n1", "k2")
    view = RelationshipCountsView(str(tmp_path / "state"))
    batch = client.changes.to_df(spark, client.changes.drain())
    view.apply_batch(batch, 0)
    counts = {r["name"]: r["n_rels"] for r in view.read(spark).collect()}
    assert counts == {"knows": 1, "owns": 1}


def test_materialized_view_rejects_checkpoint_generation_mismatch(spark, tmp_path):
    """A batch id behind the pointed state version means the streaming
    checkpoint was reset against a live state dir — the view must fail
    loudly instead of silently rewinding, and old versions vacuum."""
    import os

    from pg_age_digitaltwins_spark.streaming.materialized import ModelCountsView

    view = ModelCountsView(str(tmp_path / "state"))
    empty = spark.createDataFrame([], "entity_id string, graph_name string, "
        "table_name string, old_value string, new_value string, "
        "event_type string, timestamp timestamp, txn_id long, seq long")
    for b in range(5):
        view.apply_batch(empty, b)
    with pytest.raises(ValueError, match="different generations"):
        view.apply_batch(empty, 0)
    # retention: only the pointed version and `keep` predecessors remain
    versions = sorted(
        int(d[1:]) for d in os.listdir(str(tmp_path / "state")) if d.startswith("v")
    )
    assert versions == [2, 3, 4]


# ---------------------------------------------------------------------------
# r7: graph→graph CDC replication (CDF → MERGE INTO downstream replica)
# ---------------------------------------------------------------------------

def test_replication_converges_replica_to_source(spark, tmp_path):
    """Bootstrap (snapshot clone at current version) + tail: post-clone
    commits stream into the replica via the join-based MERGE; after
    catch-up the replica's twins and relationships EQUAL the source's,
    including an update, a delete, and a cross-commit chain folded into
    one micro-batch by (txn_id, seq) order."""
    from pg_age_digitaltwins_spark.store.commit_log import (
        commit_snapshot, load_latest, merge_rows,
    )
    from pg_age_digitaltwins_spark.store.graph_store import GraphStore
    from pg_age_digitaltwins_spark.streaming.replica import run_replication

    models = [{
        "@id": "dtmi:rep:T;1", "@type": "Interface",
        "@context": "dtmi:dtdl:context;3",
        "contents": [{"@type": "Property", "name": "x", "schema": "integer"}],
    }]
    def twin(i, x=None):
        return {"$dtId": f"r{i}", "$metadata": {"$model": "dtmi:rep:T;1"},
                "x": x if x is not None else i}

    src_root = str(tmp_path / "src")
    rep_root = str(tmp_path / "rep")
    store = GraphStore.from_documents(
        spark, twin_docs=[twin(0), twin(1), twin(2)], model_docs=models,
    )
    commit_snapshot(store, src_root)
    merge_rows(spark, src_root, rel_upserts=[
        {"$relationshipId": "e1", "$sourceId": "r0", "$targetId": "r1",
         "$relationshipName": "knows"},
    ])
    # first catch-up: clone at v2, nothing to stream
    q = run_replication(spark, src_root, rep_root, str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    rep_store, _ = load_latest(spark, rep_root)
    assert rep_store.twins.count() == 3
    assert rep_store.relationships.count() == 1

    # post-bootstrap commits: update+insert (v3), delete + edge (v4),
    # and an update-then-update chain across commits (v5) — all folded
    # by one availableNow catch-up into ordered application
    merge_rows(spark, src_root, twin_upserts=[twin(1, x=11), twin(3)])
    merge_rows(spark, src_root, twin_deletes=["r2"], rel_upserts=[
        {"$relationshipId": "e2", "$sourceId": "r3",
         "$targetId": "r0", "$relationshipName": "knows"},
    ])
    merge_rows(spark, src_root, twin_upserts=[twin(1, x=99)])

    q = run_replication(spark, src_root, rep_root, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    src_store, _ = load_latest(spark, src_root)
    rep_store, _ = load_latest(spark, rep_root)
    import json

    # compare PARSED docs: key order differs between the storage row
    # and the event-serialized image, but the documents are identical
    src_twins = {r["dt_id"]: json.loads(r["doc"]) for r in src_store.twins.collect()}
    rep_twins = {r["dt_id"]: json.loads(r["doc"]) for r in rep_store.twins.collect()}
    assert rep_twins == src_twins  # full convergence
    assert rep_twins["r1"]["x"] == 99
    rep_rels = {
        (r["source_id"], r["relationship_id"]): r["name"]
        for r in rep_store.relationships.collect()
    }
    assert rep_rels == {("r0", "e1"): "knows", ("r3", "e2"): "knows"}


def test_replication_batch_replay_is_idempotent(spark, tmp_path):
    from pg_age_digitaltwins_spark.store.commit_log import (
        CommitLog, commit_snapshot, merge_rows,
    )
    from pg_age_digitaltwins_spark.store.graph_store import GraphStore
    from pg_age_digitaltwins_spark.store.commit_log import read_changes_since
    from pg_age_digitaltwins_spark.streaming.replica import (
        apply_changes_to_replica,
    )

    models = [{
        "@id": "dtmi:rep:T;1", "@type": "Interface",
        "@context": "dtmi:dtdl:context;3",
        "contents": [{"@type": "Property", "name": "x", "schema": "integer"}],
    }]
    src_root = str(tmp_path / "src")
    rep_root = str(tmp_path / "rep")
    commit_snapshot(GraphStore.from_documents(
        spark,
        twin_docs=[{"$dtId": "a", "$metadata": {"$model": "dtmi:rep:T;1"}}],
        model_docs=models), src_root)
    merge_rows(spark, src_root, twin_upserts=[
        {"$dtId": "b", "$metadata": {"$model": "dtmi:rep:T;1"}, "x": 1},
    ])
    events = read_changes_since(spark, src_root)
    v1 = apply_changes_to_replica(spark, events, rep_root, batch_id=7)
    assert v1 == 1
    # foreachBatch retry with the SAME batch id: marker short-circuits
    assert apply_changes_to_replica(spark, events, rep_root, batch_id=7) is None
    assert CommitLog(rep_root).latest_version() == 1


def test_replication_applies_client_commits_after_bootstrap(spark, tmp_path):
    """Regression (r8 ADVICE high): CRUD commits buffered through the
    client's ChangeLog carry SESSION-LOCAL txn ids (1, 2, ...).  The
    replica's bootstrap filter must key on the stage-time commit_version
    stamp — filtering on txn_id silently dropped every post-bootstrap
    client commit whose session txn counter was below the bootstrap
    version (replica data loss)."""
    import json

    from pg_age_digitaltwins_spark.client import DigitalTwinsSparkClient
    from pg_age_digitaltwins_spark.store.commit_log import (
        load_latest, merge_rows,
    )
    from pg_age_digitaltwins_spark.store.graph_store import GraphStore
    from pg_age_digitaltwins_spark.streaming.replica import run_replication

    models = [{
        "@id": "dtmi:rep:T;1", "@type": "Interface",
        "@context": "dtmi:dtdl:context;3",
        "contents": [{"@type": "Property", "name": "x", "schema": "integer"}],
    }]

    def twin(i, x=None):
        return {"$dtId": f"c{i}", "$metadata": {"$model": "dtmi:rep:T;1"},
                "x": x if x is not None else i}

    src_root = str(tmp_path / "src")
    rep_root = str(tmp_path / "rep")
    client = DigitalTwinsSparkClient(GraphStore.from_documents(
        spark, twin_docs=[twin(0)], model_docs=models))
    client.commit(src_root)
    # push the source version well past any session txn counter
    for i in range(1, 5):
        merge_rows(spark, src_root, twin_upserts=[twin(i)])
    client._swap(load_latest(spark, src_root)[0])

    q = run_replication(spark, src_root, rep_root, str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    boot_store, _ = load_latest(spark, rep_root)
    assert boot_store.twins.count() == 5  # clone at source v5

    # post-bootstrap CLIENT commit: buffered events carry txn_id 1..2
    # (session-local), both < bootstrap version 5
    client.create_or_replace_digital_twin("c1", twin(1, x=111))
    client.create_or_replace_digital_twin("c9", twin(9))
    v = client.commit(src_root)
    assert v == 6

    q = run_replication(spark, src_root, rep_root, str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    rep_store, _ = load_latest(spark, rep_root)
    rep_twins = {r["dt_id"]: json.loads(r["doc"])
                 for r in rep_store.twins.collect()}
    assert "c9" in rep_twins          # insert not dropped
    assert rep_twins["c1"]["x"] == 111  # update not dropped


def test_replication_survives_crash_between_merge_and_marker(spark, tmp_path):
    """Regression (r8 ADVICE medium): the batch id is recorded inside
    the merge commit (manifest writer tag), so a foreachBatch retry
    after a crash between the commit and the marker write must NOT
    re-apply the batch (no duplicate replica version)."""
    import os

    from pg_age_digitaltwins_spark.store.commit_log import (
        CommitLog, commit_snapshot, merge_rows, read_changes_since,
    )
    from pg_age_digitaltwins_spark.store.graph_store import GraphStore
    from pg_age_digitaltwins_spark.streaming.replica import (
        apply_changes_to_replica,
    )

    models = [{
        "@id": "dtmi:rep:T;1", "@type": "Interface",
        "@context": "dtmi:dtdl:context;3",
        "contents": [{"@type": "Property", "name": "x", "schema": "integer"}],
    }]
    src_root = str(tmp_path / "src")
    rep_root = str(tmp_path / "rep")
    commit_snapshot(GraphStore.from_documents(
        spark,
        twin_docs=[{"$dtId": "a", "$metadata": {"$model": "dtmi:rep:T;1"}}],
        model_docs=models), src_root)
    merge_rows(spark, src_root, twin_upserts=[
        {"$dtId": "b", "$metadata": {"$model": "dtmi:rep:T;1"}, "x": 1},
    ])
    events = read_changes_since(spark, src_root)
    v1 = apply_changes_to_replica(spark, events, rep_root, batch_id=3)
    assert v1 == 1
    # simulate the crash: commit landed, marker lost
    os.unlink(os.path.join(rep_root, "_replica_applied", "batch-3"))
    assert apply_changes_to_replica(spark, events, rep_root, batch_id=3) is None
    assert CommitLog(rep_root).latest_version() == 1  # no duplicate commit
    # marker restored for the fast path
    assert os.path.exists(os.path.join(rep_root, "_replica_applied", "batch-3"))


def test_rows_per_trigger_policy_derives_files_from_manifests(spark, tmp_path):
    """r8: target_rows_per_trigger → maxFilesPerTrigger via the commit
    manifests' recorded n_events (no data scan); bulk commits that
    record n_events = -1 are ignored; an all-bulk log yields None."""
    from pg_age_digitaltwins_spark.store.commit_log import (
        commit_snapshot,
    )
    from pg_age_digitaltwins_spark.store.graph_store import GraphStore
    from pg_age_digitaltwins_spark.streaming.changes import EventData
    from pg_age_digitaltwins_spark.streaming.sinks import (
        _files_per_trigger_for_rows,
    )

    root = str(tmp_path / "t")
    store = GraphStore.empty(spark)
    ev = [
        EventData(f"t{i}", "g", "Twin", None, {"$dtId": f"t{i}"}, "Insert",
                  "2025-01-01T00:00:00.000")
        for i in range(10)
    ]
    commit_snapshot(store, root, events=ev)        # n_events = 10
    commit_snapshot(store, root, events=ev[:4])    # n_events = 4
    # avg 7 rows/commit → 21 rows target = 3 files
    assert _files_per_trigger_for_rows(root, 21) == 3
    assert _files_per_trigger_for_rows(root, 5) == 1   # floor 1
    assert _files_per_trigger_for_rows(str(tmp_path / "empty"), 100) is None


def test_replication_survives_source_compaction_midstream(spark, tmp_path):
    """r8: OPTIMIZE/compaction on the source between micro-batches is a
    physical rewrite that emits no change events — the replica must
    neither skip nor double-apply around it, and post-compaction
    commits must still stream through."""
    import json

    from pg_age_digitaltwins_spark.store.commit_log import (
        commit_snapshot, compact_table, load_latest, merge_rows,
    )
    from pg_age_digitaltwins_spark.store.graph_store import GraphStore
    from pg_age_digitaltwins_spark.streaming.replica import run_replication

    models = [{
        "@id": "dtmi:rep:T;1", "@type": "Interface",
        "@context": "dtmi:dtdl:context;3",
        "contents": [{"@type": "Property", "name": "x", "schema": "integer"}],
    }]

    def twin(i, x=None):
        return {"$dtId": f"k{i}", "$metadata": {"$model": "dtmi:rep:T;1"},
                "x": x if x is not None else i}

    src_root = str(tmp_path / "src")
    rep_root = str(tmp_path / "rep")
    commit_snapshot(GraphStore.from_documents(
        spark, twin_docs=[twin(0)], model_docs=models), src_root)

    ckpt = str(tmp_path / "ckpt")
    q = run_replication(spark, src_root, rep_root, ckpt)
    q.awaitTermination(300)

    merge_rows(spark, src_root, twin_upserts=[twin(1)])
    q = run_replication(spark, src_root, rep_root, ckpt)
    q.awaitTermination(300)

    # compact (full-snapshot rewrite, no change events), then keep
    # writing — including an update to a PRE-compaction twin
    compact_table(spark, src_root)
    merge_rows(spark, src_root, twin_upserts=[twin(1, x=11), twin(2)])

    q = run_replication(spark, src_root, rep_root, ckpt)
    q.awaitTermination(300)

    src_store, _ = load_latest(spark, src_root)
    rep_store, _ = load_latest(spark, rep_root)
    src_twins = {r["dt_id"]: json.loads(r["doc"]) for r in src_store.twins.collect()}
    rep_twins = {r["dt_id"]: json.loads(r["doc"]) for r in rep_store.twins.collect()}
    assert rep_twins == src_twins
    assert rep_twins["k1"]["x"] == 11 and "k2" in rep_twins


def test_replication_orders_two_writers_same_key_by_commit(spark, tmp_path):
    """r8: two client sessions (each with session-local txn_id = 1)
    update the SAME twin in consecutive commits; one micro-batch spans
    both.  The batch-final fold must order by commit version — on
    txn_id alone the two writes tie and the earlier value can win
    (resurrected write)."""
    import json

    from pg_age_digitaltwins_spark.client import DigitalTwinsSparkClient
    from pg_age_digitaltwins_spark.store.commit_log import load_latest
    from pg_age_digitaltwins_spark.store.graph_store import GraphStore
    from pg_age_digitaltwins_spark.streaming.replica import run_replication

    models = [{
        "@id": "dtmi:rep:T;1", "@type": "Interface",
        "@context": "dtmi:dtdl:context;3",
        "contents": [{"@type": "Property", "name": "x", "schema": "integer"}],
    }]

    def twin(x):
        return {"$dtId": "shared", "$metadata": {"$model": "dtmi:rep:T;1"},
                "x": x}

    src_root = str(tmp_path / "src")
    rep_root = str(tmp_path / "rep")
    writer_a = DigitalTwinsSparkClient(GraphStore.from_documents(
        spark, twin_docs=[twin(0)], model_docs=models))
    writer_a.commit(src_root)

    ckpt = str(tmp_path / "ckpt")
    q = run_replication(spark, src_root, rep_root, ckpt)
    q.awaitTermination(300)

    # writer A (fresh session, txn counter restarts at 1) commits x=1;
    # writer B (another fresh session, txn 1 again) commits x=2
    store_now, _ = load_latest(spark, src_root)
    writer_a = DigitalTwinsSparkClient(store_now)
    writer_a.create_or_replace_digital_twin("shared", twin(1))
    writer_a.commit(src_root)
    store_now, _ = load_latest(spark, src_root)
    writer_b = DigitalTwinsSparkClient(store_now)
    writer_b.create_or_replace_digital_twin("shared", twin(2))
    writer_b.commit(src_root)

    # ONE catch-up folds both commits into one micro-batch
    q = run_replication(spark, src_root, rep_root, ckpt)
    q.awaitTermination(300)

    rep_store, _ = load_latest(spark, rep_root)
    [row] = rep_store.twins.filter("dt_id = 'shared'").collect()
    assert json.loads(row["doc"])["x"] == 2  # later COMMIT wins


def test_driver_sink_delivery_is_chunk_bounded(spark):
    """r8: a big micro-batch routed to a transport-callback sink (no
    send_df) must not materialize on the driver in one piece — delivery
    chunks are capped at router.driver_chunk_rows while every event is
    still delivered exactly once."""
    from pg_age_digitaltwins_spark.streaming.changes import EVENT_DATA_SCHEMA
    from pg_age_digitaltwins_spark.streaming.sinks import (
        EventRoute, EventRouter,
    )
    from pyspark.sql import functions as F

    n = 20_000
    batch = spark.range(n).select(
        F.concat(F.lit("t"), F.col("id")).alias("entity_id"),
        F.lit("g").alias("graph_name"),
        F.lit("Twin").alias("table_name"),
        F.lit(None).cast("string").alias("old_value"),
        F.concat(
            F.lit('{"$dtId":"t'), F.col("id"),
            F.lit('","$metadata":{"$model":"dtmi:b:T;1"},"x":'),
            F.col("id"), F.lit("}"),
        ).alias("new_value"),
        F.lit("Insert").alias("event_type"),
        F.to_timestamp(F.lit("2026-01-01T00:00:00.000")).alias("timestamp"),
        F.col("id").alias("txn_id"),
        F.lit(0).cast("long").alias("seq"),
        F.lit(0).cast("long").alias("commit_version"),
    )
    assert batch.schema == EVENT_DATA_SCHEMA or set(batch.columns) == {
        f.name for f in EVENT_DATA_SCHEMA.fields
    }

    chunk_sizes: list[int] = []

    class _RecordingSink:
        name = "rec"

        def send(self, events):
            chunk_sizes.append(len(events))

    router = EventRouter(source="cap-test", driver_chunk_rows=500)
    router.add_sink(_RecordingSink())
    router.add_route(EventRoute("rec", "EventNotification"))
    router.foreach_batch(batch, 0)

    assert sum(chunk_sizes) == n            # nothing dropped
    assert max(chunk_sizes) <= 500          # peak driver buffer bounded
    assert len(chunk_sizes) >= n // 500     # really chunked


def test_replica_lag_watermark_and_vacuum_guard(spark, tmp_path):
    """r8: replica_lag counts unconsumed source change batches (the
    vacuum retention guard — never vacuum past the slowest consumer).
    Event-less commits (compaction) never count as lag; the watermark
    advances with each applied batch and starts at the bootstrap
    version."""
    from pg_age_digitaltwins_spark.store.commit_log import (
        commit_snapshot, compact_table, merge_rows,
    )
    from pg_age_digitaltwins_spark.store.graph_store import GraphStore
    from pg_age_digitaltwins_spark.streaming.replica import (
        replica_lag, replica_source_version, run_replication,
    )

    models = [{
        "@id": "dtmi:rep:T;1", "@type": "Interface",
        "@context": "dtmi:dtdl:context;3",
        "contents": [{"@type": "Property", "name": "x", "schema": "integer"}],
    }]

    def twin(i):
        return {"$dtId": f"w{i}", "$metadata": {"$model": "dtmi:rep:T;1"},
                "x": i}

    src_root = str(tmp_path / "src")
    rep_root = str(tmp_path / "rep")
    commit_snapshot(GraphStore.from_documents(
        spark, twin_docs=[twin(0)], model_docs=models), src_root)

    ckpt = str(tmp_path / "ckpt")
    q = run_replication(spark, src_root, rep_root, ckpt)  # bootstrap @ v1
    q.awaitTermination(300)
    assert replica_source_version(rep_root) == 1
    assert replica_lag(src_root, rep_root) == 0

    merge_rows(spark, src_root, twin_upserts=[twin(1)])   # v2 (events)
    compact_table(spark, src_root)                        # v3 (no events)
    merge_rows(spark, src_root, twin_upserts=[twin(2)])   # v4 (events)
    assert replica_lag(src_root, rep_root) == 2  # v2 + v4; v3 never counts

    q = run_replication(spark, src_root, rep_root, ckpt)
    q.awaitTermination(300)
    assert replica_source_version(rep_root) == 4
    assert replica_lag(src_root, rep_root) == 0  # safe-to-vacuum signal


def test_replicate_catch_up_batch_path(spark, tmp_path):
    """The streaming-free catch-up applies all pending source commits
    as one atomic replica commit, is idempotent, and resumes from the
    consumed-version watermark across calls."""
    from pg_age_digitaltwins_spark.store.commit_log import (
        commit_snapshot,
        load_latest,
        merge_rows,
    )
    from pg_age_digitaltwins_spark.store.graph_store import GraphStore
    from pg_age_digitaltwins_spark.streaming.replica import (
        replicate_catch_up,
    )

    def twin(i, x=0):
        return {"$dtId": f"t{i}",
                "$metadata": {"$model": "dtmi:rc:T;1"}, "x": x}

    src = str(tmp_path / "src")
    rep = str(tmp_path / "rep")
    commit_snapshot(GraphStore.empty(spark), src)
    merge_rows(spark, src, twin_upserts=[twin(0), twin(1)])
    merge_rows(spark, src, twin_upserts=[twin(2)])

    # the bootstrap clone covers every commit ≤ the clone version, so
    # the first catch-up has nothing to apply (None) yet the replica is
    # already complete
    v = replicate_catch_up(spark, src, rep)
    assert v is None
    store, _ = load_latest(spark, rep)
    assert {r["dt_id"] for r in store.twins.collect()} == {"t0", "t1", "t2"}
    # caught up → no-op; replay-safe
    assert replicate_catch_up(spark, src, rep) is None

    # new source commits: update + delete resume from the watermark
    merge_rows(spark, src, twin_upserts=[twin(0, x=9)], twin_deletes=["t2"])
    v2 = replicate_catch_up(spark, src, rep)
    assert v2 is not None
    store, _ = load_latest(spark, rep)
    got = {r["dt_id"]: r["doc"] for r in store.twins.collect()}
    assert set(got) == {"t0", "t1"}
    assert '"x":9' in got["t0"].replace(" ", "") or '"x": 9' in got["t0"]


def test_streaming_cusum_monitor_stateful(spark, tmp_path):
    """r12: the running CUSUM accumulates EXACT milli-deviations across
    micro-batches per event_type and flags once |D| crosses the
    threshold (online sibling of operators.events.drift_stats)."""
    import json as _json

    from pg_age_digitaltwins_spark.streaming.stateful import (
        streaming_cusum_monitor,
    )

    feed = tmp_path / "cusumfeed"
    feed.mkdir()

    def write_batch(name, rows):
        (feed / name).write_text(
            "\n".join(
                _json.dumps(
                    {"event_id": i, "ts": ts, "user_id": 1,
                     "event_type": et, "value": v}
                )
                for i, (ts, et, v) in enumerate(rows)
            )
        )

    # target 10.0, threshold 5.0 → flag once |Σ(v-10)| >= 5
    write_batch("b0.ndjson", [
        ("2026-03-01T00:00:00", "a", 12.0),   # dev = +2000
        ("2026-03-01T00:01:00", "a", 12.5),   # dev = +4500
        ("2026-03-01T00:00:00", "b", 10.0),   # dev = 0
    ])
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).json(str(feed), timestampFormat="yyyy-MM-dd'T'HH:mm:ss")
    _run_to_memory(
        streaming_cusum_monitor(stream, target=10.0, threshold=5.0),
        "cusum", tmp_path,
    )
    out = {
        (r["event_type"], r["cusum_milli"]): r["flagged"]
        for r in spark.sql("select * from cusum").collect()
    }
    assert out == {("a", 2000): False, ("a", 4500): False, ("b", 0): False}

    # batch 2: state (a: +4500, b: 0) persists; +1.0 pushes a over 5000
    write_batch("b1.ndjson", [
        ("2026-03-01T00:02:00", "a", 11.0),   # dev = +5500 → flag
        ("2026-03-01T00:01:00", "b", 9.0),    # dev = -1000
    ])
    _run_to_memory(
        streaming_cusum_monitor(stream, target=10.0, threshold=5.0),
        "cusum2", tmp_path,
    )
    out2 = {
        (r["event_type"], r["cusum_milli"]): r["flagged"]
        for r in spark.sql("select * from cusum2").collect()
    }
    assert out2[("a", 5500)] is True
    assert out2[("b", -1000)] is False


def test_streaming_near_dup_filter(spark, tmp_path):
    """r12: foreachBatch near-dup gate — exact/near copies of corpus
    docs are dropped per micro-batch, novel docs pass, and the batch
    gate agrees with the raw banding on the same data."""
    import json as _json

    from pg_age_digitaltwins_spark.streaming.stateful import (
        near_dup_gate,
        streaming_near_dup_filter,
    )

    corpus = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog again and again"),
            (101, "completely different reference text about spark execution plans"),
        ],
        "doc_id long, text string",
    )
    # batch-side gate semantics first (one near-copy, one novel)
    batch = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "a totally novel document with its own words and no overlap"),
        ],
        "doc_id long, text string",
    )
    gate = near_dup_gate(corpus)
    assert [r["doc_id"] for r in gate(batch).collect()] == [2]

    # the streaming wrapper: two micro-batches through foreachBatch
    feed = tmp_path / "dupfeed"
    feed.mkdir()
    (feed / "b0.ndjson").write_text(
        "\n".join(
            _json.dumps({"doc_id": i, "text": t})
            for i, t in [
                (1, "the quick brown fox jumps over the lazy dog again and again"),
                (2, "a totally novel document with its own words and no overlap"),
            ]
        )
    )
    stream = spark.readStream.schema("doc_id long, text string").json(str(feed))
    survived: list[int] = []

    def sink(df, batch_id):
        survived.extend(r["doc_id"] for r in df.collect())

    q = streaming_near_dup_filter(
        stream, corpus, sink, checkpoint=str(tmp_path / "ckpt-nd")
    )
    q.awaitTermination(120)
    assert sorted(survived) == [2]


def test_streaming_cusum_monitor_nulls_and_tie_break(spark, tmp_path):
    """r13 ADVICE fix: null values are skipped (no float(None) crash),
    tie_break=None works for streams without an event_id column, and a
    missing tie-break column raises a clear error instead of a
    KeyError."""
    import json as _json

    from pg_age_digitaltwins_spark.streaming.stateful import (
        streaming_cusum_monitor,
    )

    feed = tmp_path / "cusumfeed13"
    feed.mkdir()
    (feed / "b0.ndjson").write_text(
        "\n".join(
            _json.dumps({"ts": ts, "event_type": "a", "value": v})
            for ts, v in [
                ("2026-03-01T00:00:00", 12.0),
                ("2026-03-01T00:01:00", None),   # skipped, no crash
                ("2026-03-01T00:02:00", 12.5),
            ]
        )
    )
    stream = spark.readStream.schema(
        "ts timestamp, event_type string, value double"
    ).json(str(feed), timestampFormat="yyyy-MM-dd'T'HH:mm:ss")
    _run_to_memory(
        streaming_cusum_monitor(
            stream, target=10.0, threshold=5.0, tie_break=None
        ),
        "cusum13", tmp_path,
    )
    got = sorted(
        (r["cusum_milli"], r["flagged"])
        for r in spark.sql("select * from cusum13").collect()
    )
    assert got == [(2000, False), (4500, False)]

    # default tie_break='event_id' on a stream WITHOUT that column:
    # the per-batch error surfaces as a streaming query failure
    import pytest

    with pytest.raises(Exception, match="tie-break|event_id"):
        _run_to_memory(
            streaming_cusum_monitor(stream, target=10.0, threshold=5.0),
            "cusum13b", tmp_path,
        )


def test_streaming_heavy_hitters_space_saving(spark, tmp_path):
    """r14: bounded Space-Saving top-k per event_type across
    micro-batches — counts accumulate, evictions replace the
    lexicographic-minimum (count, key) entry and inherit its count as
    the overcount bound (count_est >= true >= count_est - overcount)."""
    import json as _json

    from pg_age_digitaltwins_spark.streaming.stateful import (
        streaming_heavy_hitters,
    )

    feed = tmp_path / "hhfeed"
    feed.mkdir()

    def write_batch(name, rows):
        (feed / name).write_text(
            "\n".join(
                _json.dumps(
                    {"event_id": i, "ts": ts, "user_id": u,
                     "event_type": "x", "value": 1.0}
                )
                for i, (ts, u) in enumerate(rows)
            )
        )

    def stream():
        return spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        ).json(str(feed), timestampFormat="yyyy-MM-dd'T'HH:mm:ss")

    # capacity 2: users 1,1,1 then 2,2 then 3 -> 3 evicts 2 (min count)
    write_batch("b0.ndjson", [
        ("2026-03-01T00:00:00", 1), ("2026-03-01T00:00:01", 1),
        ("2026-03-01T00:00:02", 1), ("2026-03-01T00:00:03", 2),
        ("2026-03-01T00:00:04", 2), ("2026-03-01T00:00:05", 3),
    ])
    _run_to_memory(streaming_heavy_hitters(stream(), capacity=2),
                   "hh", tmp_path)
    got = [
        (r["user_id"], r["count_est"], r["overcount"])
        for r in spark.sql(
            "select * from hh order by count_est desc, user_id"
        ).collect()
    ]
    assert got == [(1, 3, 0), (3, 3, 2)]

    # fresh checkpoint reprocesses ALL files as one availableNow batch:
    # aggregated counts 1->3, 2->3, 3->1 apply in (-count, key) order —
    # 1 and 2 fill the summary, then 3 evicts key 1 (tie on count 3,
    # min key) and inherits its count as overcount (3+1=4, over 3)
    write_batch("b1.ndjson", [("2026-03-01T00:00:06", 2)])
    _run_to_memory(streaming_heavy_hitters(stream(), capacity=2),
                   "hh2", tmp_path)
    # the LAST emitted snapshot is the final summary (the memory sink
    # keeps every per-batch snapshot if files split across batches;
    # emission order within a snapshot is (-count, key), so the final
    # two appended rows ARE the final summary)
    rows2 = spark.sql("select * from hh2").collect()
    final = [
        (r["user_id"], r["count_est"], r["overcount"]) for r in rows2
    ][-2:]
    assert sorted(final, key=lambda t: (-t[1], t[0])) == [(3, 4, 3), (2, 3, 0)]
    # guarantee: count_est - overcount <= true count (true: 1->3, 2->3, 3->1)
    true = {1: 3, 2: 3, 3: 1}
    for u, c, o in final:
        assert c - o <= true[u] <= c

    import pytest as _pytest

    with _pytest.raises(ValueError, match="capacity"):
        streaming_heavy_hitters(stream(), capacity=0)


def test_streaming_heavy_hitters_chunk_boundary_independent(spark, tmp_path):
    """r15 (ADVICE r14): the summary must not depend on how a
    micro-batch splits into Arrow chunks.  With maxRecordsPerBatch=2
    the 5-row batch arrives as 3 chunks; per-chunk eviction would keep
    user 6 (count 5, over 2) — batch-level aggregation must keep
    user 5 (count 5, over 3), the same answer as one unsplit chunk."""
    import json as _json

    from pg_age_digitaltwins_spark.streaming.stateful import (
        streaming_heavy_hitters,
    )

    feed = tmp_path / "hhchunk"
    feed.mkdir()
    rows = [(0, 5), (1, 5), (2, 6), (3, 6), (4, 6)]
    (feed / "b0.ndjson").write_text(
        "\n".join(
            _json.dumps(
                {"event_id": i, "ts": f"2026-03-01T00:00:0{i}",
                 "user_id": u, "event_type": "x", "value": 1.0}
            )
            for i, u in rows
        )
    )

    def stream():
        return spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        ).json(str(feed), timestampFormat="yyyy-MM-dd'T'HH:mm:ss")

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        _run_to_memory(streaming_heavy_hitters(stream(), capacity=1),
                       "hhchunk", tmp_path)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    got = [
        (r["user_id"], r["count_est"], r["overcount"])
        for r in spark.sql("select * from hhchunk").collect()
    ]
    # batch counts {6:3, 5:2}: 6 fills capacity-1 summary, then 5
    # evicts it and inherits count 3 as overcount -> (5, 5, 3)
    assert got == [(5, 5, 3)]
