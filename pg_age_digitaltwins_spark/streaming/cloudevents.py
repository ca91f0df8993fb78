"""CloudEvents formatting: EventNotification + DataHistory + Telemetry.

Re-expresses ``CloudEventFactory``
(``src/AgeDigitalTwins.Events/Core/Events/CloudEventFactory.cs``):

* **EventNotification** (S6): Create/Delete → full document lifecycle
  events; Update → RFC-6902 patch body ``{modelId, patch}``; CloudEvents
  typed ``Konnektr.Graph.Twin.*`` / ``Konnektr.Graph.Relationship.*``.
* **DataHistory** (S7): lifecycle events + one PropertyEvent per changed
  property (patch ops exploded, ``$``-keys skipped, same-value updates
  recovered from per-property ``lastUpdateTime`` metadata changes).
* **Telemetry**: pass-through ``Konnektr.IoT.Telemetry``.

Two layers:

1. Pure-Python per-event formatters (the unit-testable semantics —
   mirrors ``CloudEventFactoryTests``).
2. ``format_events_df``: the distributed path — ``mapInPandas`` over an
   EventData DataFrame, Arrow-batched, emitting one row per CloudEvent.
   JSON diffing is genuinely row-wise Python work (the reference runs
   the same logic per event in C#), so a Pandas UDF is the right Spark
   tool; everything around it stays in DataFrame land.
"""

from __future__ import annotations

import json
import uuid
from typing import Any, Callable, Iterable, Iterator

from pyspark.sql import DataFrame, types as T

from pg_age_digitaltwins_spark.functions.jsonpatch import make_patch
from pg_age_digitaltwins_spark.streaming.changes import EventData

# ``CloudEventFactory.DefaultEventNotificationTypeMapping`` (:12-22)
NOTIFICATION_TYPES = {
    ("Twin", "Insert"): "Konnektr.Graph.Twin.Create",
    ("Twin", "Update"): "Konnektr.Graph.Twin.Update",
    ("Twin", "Delete"): "Konnektr.Graph.Twin.Delete",
    ("Relationship", "Insert"): "Konnektr.Graph.Relationship.Create",
    ("Relationship", "Update"): "Konnektr.Graph.Relationship.Update",
    ("Relationship", "Delete"): "Konnektr.Graph.Relationship.Delete",
}
TELEMETRY_TYPE = "Konnektr.IoT.Telemetry"
# ``DefaultDataHistoryTypeMapping`` (:25-31)
DH_PROPERTY = "Konnektr.Graph.Property.Event"
DH_TWIN_LIFECYCLE = "Konnektr.Graph.Twin.Lifecycle"
DH_REL_LIFECYCLE = "Konnektr.Graph.Relationship.Lifecycle"

CLOUD_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("subject", T.StringType(), True),
        T.StructField("time", T.StringType(), True),
        T.StructField("datacontenttype", T.StringType(), False),
        T.StructField("data", T.StringType(), True),
    ]
)


def _ce(
    source: str,
    type_: str,
    subject: str | None,
    time: str | None,
    data: Any,
    id_fn: Callable[[], str],
) -> dict[str, Any]:
    return {
        "id": id_fn(),
        "source": source,
        "type": type_,
        "subject": subject,
        "time": time,
        "datacontenttype": "application/json",
        "data": data,
    }


def _enhance_patch(
    patch: list[dict[str, Any]], new_value: dict[str, Any] | None
) -> list[dict[str, Any]]:
    """``EnhancePatchWithSameValueUpdates``: a property whose value
    didn't change but whose ``$metadata.<p>.lastUpdateTime`` did gets a
    synthetic replace op; $etag/$dtId ops are dropped when that
    happens."""
    with_ops = {
        p["path"].split("/")[1]
        for p in patch
        if p["path"].count("/") >= 1 and not p["path"].startswith("/$metadata")
    }
    additional: list[dict[str, Any]] = []
    for p in patch:
        segs = p["path"].split("/")[1:]
        if len(segs) >= 3 and segs[0] == "$metadata" and segs[2] == "lastUpdateTime":
            prop = segs[1]
            if prop not in with_ops and new_value and prop in new_value:
                additional.append(
                    {"op": "replace", "path": f"/{prop}", "value": new_value[prop]}
                )
    if additional:
        kept = [
            p for p in patch if p["path"].split("/")[1] not in ("$etag", "$dtId")
        ]
        return kept + additional
    return patch


# ----------------------------------------------------------------------
# EventNotification (S6)
# ----------------------------------------------------------------------

def event_notification(
    ev: EventData, source: str, id_fn: Callable[[], str] = lambda: str(uuid.uuid4())
) -> list[dict[str, Any]]:
    kind = ev.entity_kind
    if kind == "Model":
        return []  # reference emits no model CloudEvents
    type_ = NOTIFICATION_TYPES[(kind, ev.event_type)]
    if ev.event_type in ("Insert", "Delete"):
        body = ev.new_value if ev.event_type == "Insert" else ev.old_value
        if body is None:
            raise ValueError(f"{ev.event_type} event needs a document")
        if kind == "Twin":
            if "$dtId" not in body:
                # reference throws ArgumentException on a missing id
                # (CloudEventFactoryTests::...MissingDtId_ThrowsArgumentException)
                raise ValueError("Twin document is missing $dtId")
            subject = str(body["$dtId"])
        else:
            subject = f'{body["$sourceId"]}/relationships/{body["$relationshipId"]}'
        return [_ce(source, type_, subject, ev.timestamp, body, id_fn)]
    # Update → {modelId, patch}
    if ev.old_value is None or ev.new_value is None:
        raise ValueError("Update event needs old and new documents")
    patch = make_patch(ev.old_value, ev.new_value)
    if kind == "Twin":
        patch = _enhance_patch(patch, ev.new_value)
        subject = str(ev.new_value["$dtId"])
        model_id = (ev.new_value.get("$metadata") or {}).get("$model")
    else:
        subject = (
            f'{ev.new_value["$sourceId"]}/relationships/'
            f'{ev.new_value["$relationshipId"]}'
        )
        model_id = (ev.new_value.get("$metadata") or {}).get("$model")
    body = {"modelId": model_id, "patch": patch}
    return [_ce(source, type_, subject, ev.timestamp, body, id_fn)]


# ----------------------------------------------------------------------
# DataHistory (S7)
# ----------------------------------------------------------------------

def data_history(
    ev: EventData,
    source: str,
    id_fn: Callable[[], str] = lambda: str(uuid.uuid4()),
    track_last_updated_by: bool = False,
) -> list[dict[str, Any]]:
    kind = ev.entity_kind
    if kind == "Model":
        return []
    out: list[dict[str, Any]] = []
    doc = ev.new_value or ev.old_value or {}
    if kind == "Twin" and ev.event_type in ("Insert", "Delete"):
        body = {
            "twinId": doc.get("$dtId"),
            "action": "Create" if ev.event_type == "Insert" else "Delete",
            "timeStamp": ev.timestamp,
            "serviceId": source,
            "modelId": (doc.get("$metadata") or {}).get("$model"),
        }
        out.append(
            _ce(source, DH_TWIN_LIFECYCLE, body["twinId"], ev.timestamp, body, id_fn)
        )
    elif kind == "Relationship" and ev.event_type in ("Insert", "Delete"):
        body = {
            "relationshipId": doc.get("$relationshipId"),
            "action": "Create" if ev.event_type == "Insert" else "Delete",
            "timeStamp": ev.timestamp,
            "serviceId": source,
            "name": doc.get("$relationshipName"),
            "source": doc.get("$sourceId"),
            "target": doc.get("$targetId"),
        }
        out.append(
            _ce(
                source,
                DH_REL_LIFECYCLE,
                f'{body["source"]}/relationships/{body["relationshipId"]}',
                ev.timestamp,
                body,
                id_fn,
            )
        )
    elif ev.event_type == "Update":
        old_model = ((ev.old_value or {}).get("$metadata") or {}).get("$model")
        new_model = ((ev.new_value or {}).get("$metadata") or {}).get("$model")
        if kind == "Twin" and old_model != new_model:
            body = {
                "twinId": (ev.new_value or {}).get("$dtId"),
                "action": "Update",
                "timeStamp": ev.timestamp,
                "serviceId": source,
                "modelId": new_model,
            }
            out.append(
                _ce(source, DH_TWIN_LIFECYCLE, body["twinId"], ev.timestamp, body, id_fn)
            )
    # property events from the (enhanced) patch.  The reference's WAL
    # layer represents an INSERT's old image as an EMPTY object
    # (``AgeDigitalTwinsReplication.cs:349``), so twin/relationship
    # Creates emit one property event per non-$ property alongside the
    # lifecycle event (``CloudEventFactoryTests::
    # CreateDataHistoryEvents_HandlesTwinCreateEventWithProperties``);
    # Deletes carry NO new image and emit the lifecycle event only
    # (``...HandlesTwinDeleteEventWithProperties`` asserts exactly one).
    patch_old = ev.old_value
    if patch_old is None and ev.event_type == "Insert":
        patch_old = {}
    if patch_old is not None and ev.new_value is not None:
        patch = make_patch(patch_old, ev.new_value)
        enhanced = _enhance_patch(patch, ev.new_value)
        meta_ops = {p["path"]: p for p in patch}
        for op in enhanced:
            key = op["path"].strip("/").replace("/", "_")
            if key.startswith("$"):
                continue
            body = {
                "timeStamp": ev.timestamp,
                "serviceId": source,
                "id": (ev.new_value or {}).get("$dtId")
                or (ev.new_value or {}).get("$sourceId"),
                "modelId": ((ev.new_value or {}).get("$metadata") or {}).get("$model"),
                "key": key,
                "value": op.get("value"),
                "relationshipTarget": (ev.new_value or {}).get("$targetId"),
                "relationshipId": (ev.new_value or {}).get("$relationshipId"),
                "action": {"add": "Create", "remove": "Delete", "replace": "Update"}.get(
                    op["op"], "unknown"
                ),
            }
            meta_path = f"/$metadata/{key.replace('_', '/')}/sourceTime"
            if meta_path in meta_ops:
                body["sourceTimeStamp"] = meta_ops[meta_path].get("value")
            if track_last_updated_by:
                lub = f"/$metadata/{key.replace('_', '/')}/lastUpdatedBy"
                if lub in meta_ops:
                    body["updatedBy"] = meta_ops[lub].get("value")
            rel_id = body["relationshipId"]
            subject = (
                f'{body["id"]}/relationships/{rel_id}' if rel_id else str(body["id"])
            )
            out.append(_ce(source, DH_PROPERTY, subject, ev.timestamp, body, id_fn))
    return out


def telemetry_event(
    payload: dict[str, Any],
    source: str,
    id_fn: Callable[[], str] = lambda: str(uuid.uuid4()),
) -> dict[str, Any]:
    """Telemetry NOTIFY payload → CloudEvent (``TelemetryListener.cs``)."""
    return _ce(
        source,
        TELEMETRY_TYPE,
        payload.get("digitalTwinId"),
        payload.get("timestamp"),
        payload,
        id_fn,
    )


FORMATTERS: dict[str, Callable[..., list[dict[str, Any]]]] = {
    "EventNotification": event_notification,
    "DataHistory": data_history,
}


# ----------------------------------------------------------------------
# distributed formatting (mapInPandas over the EventData DataFrame)
# ----------------------------------------------------------------------

def format_events_df(
    changes: DataFrame, source: str, event_format: str = "EventNotification"
) -> DataFrame:
    """One output row per CloudEvent.  Arrow-batched Python (the JSON
    diff is per-row work, like the reference's per-event C#); input
    partitioning is preserved — no shuffle."""
    fmt = FORMATTERS[event_format]

    def run(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                ev = EventData(
                    entity_id=r.entity_id,
                    graph_name=r.graph_name,
                    table_name=r.table_name,
                    old_value=None if r.old_value is None else json.loads(r.old_value),
                    new_value=None if r.new_value is None else json.loads(r.new_value),
                    event_type=r.event_type,
                    timestamp=r.timestamp.isoformat() + "Z",
                )
                for ce in fmt(ev, source):
                    rows.append(
                        {
                            "id": ce["id"],
                            "source": ce["source"],
                            "type": ce["type"],
                            "subject": ce["subject"],
                            "time": ce["time"],
                            "datacontenttype": ce["datacontenttype"],
                            "data": json.dumps(ce["data"], separators=(",", ":")),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in CLOUD_EVENT_SCHEMA.fields]
            )

    return changes.mapInPandas(run, CLOUD_EVENT_SCHEMA)
