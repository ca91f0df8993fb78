"""S10: Kusto (Azure Data Explorer) sink with the real QUEUED-INGESTION
protocol shape, backed by the local filesystem.

The reference (``Sinks/Kusto/KustoEventSink.cs:14-287``) does not write
rows to ADX directly — it speaks ADX's *queued ingestion* protocol via
``IKustoQueuedIngestClient``:

1.  serialize each CloudEvent-type group's ``data`` payloads to an
    ND-JSON stream,
2.  the ingest client uploads the stream as a **staging blob** and posts
    an **ingestion message** to the service's Azure Queue, carrying the
    blob path, target database/table, source format, the **JSON
    ingestion mapping** (column name, Kusto type, ``$.path`` into each
    line — built at ``KustoEventSink.cs:71-123,250-280``),
    ``ReportLevel=FailuresAndSuccesses`` and ``ReportMethod=Table``,
3.  ADX's data-management layer drains the queue *asynchronously*,
    applies the mapping, lands extents in the target table, and writes
    a per-ingestion status row (Pending → Succeeded/Failed) that the
    client can poll,
4.  the sink checks the immediate enqueue result: anything other than
    Pending/Succeeded marks it unhealthy (``KustoEventSink.cs:204-227``).

No ADX service exists in this container, so the *service* side is a
local ingestor over the same artifacts: blobs become gzipped ND-JSON
files under ``root/staging/``, the queue becomes ``root/queue/`` (one
JSON message per file, named so lexical order = enqueue order), the
status table becomes ``root/status/``, and tables become ND-JSON row
files under ``root/tables/<Table>/`` readable as DataFrames with the
mapped ADX schemas.  Every protocol artifact — message shape, mapping
application, report-by-table flow, Pending-then-async semantics — is
real and tested; only the transport (local fs vs Azure blob/queue) is
substituted.

Scale path: ``send_df`` writes the staging blobs executor-side (one
gzipped part per partition) and enqueues one message per blob — a 10⁹-
event micro-batch never funnels through the driver, exactly how queued
ingestion is meant to absorb bulk loads.
"""

from __future__ import annotations

import gzip
import json
import os
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from pg_age_digitaltwins_spark.streaming.cloudevents import (
    DH_PROPERTY,
    DH_REL_LIFECYCLE,
    DH_TWIN_LIFECYCLE,
)
from pg_age_digitaltwins_spark.streaming.sinks import EventSink, SinkError

# ----------------------------------------------------------------------
# Ingestion mappings — (column, kusto type, JSON path), byte-for-byte
# the reference's column mappings (``KustoEventSink.cs:71-123,250-280``).
# ----------------------------------------------------------------------

PROPERTY_EVENT_MAPPING: list[tuple[str, str, str]] = [
    ("TimeStamp", "datetime", "$.timeStamp"),
    ("SourceTimeStamp", "datetime", "$.sourceTimeStamp"),
    ("ServiceId", "string", "$.serviceId"),
    ("Id", "string", "$.id"),
    ("ModelId", "string", "$.modelId"),
    ("Key", "string", "$.key"),
    ("Value", "dynamic", "$.value"),
    ("RelationshipTarget", "string", "$.relationshipTarget"),
    ("RelationshipId", "string", "$.relationshipId"),
    ("Action", "string", "$.action"),
]
UPDATED_BY_MAPPING = ("UpdatedBy", "string", "$.updatedBy")

TWIN_LIFECYCLE_MAPPING: list[tuple[str, str, str]] = [
    ("TimeStamp", "datetime", "$.timeStamp"),
    ("ServiceId", "string", "$.serviceId"),
    ("TwinId", "string", "$.twinId"),
    ("Action", "string", "$.action"),
    ("ModelId", "string", "$.modelId"),
]

REL_LIFECYCLE_MAPPING: list[tuple[str, str, str]] = [
    ("TimeStamp", "datetime", "$.timeStamp"),
    ("ServiceId", "string", "$.serviceId"),
    ("RelationshipId", "string", "$.relationshipId"),
    ("Action", "string", "$.action"),
    ("Name", "string", "$.name"),
    ("Source", "string", "$.source"),
    ("Target", "string", "$.target"),
]


def _mapping_json(mapping: list[tuple[str, str, str]]) -> list[dict[str, Any]]:
    """The serialized form the ingestion message carries (the SDK's
    ``ColumnMapping`` → ``{column, datatype, Properties: {Path}}``)."""
    return [
        {"column": c, "datatype": t, "Properties": {"Path": p}}
        for c, t, p in mapping
    ]


class KustoQueuedSink(EventSink):
    """Queued-ingestion Kusto sink (``KustoEventSink.cs`` parity).

    Groups incoming CloudEvents by ``type``, resolves each type to its
    target table + ingestion mapping via ``event_type_mappings``
    (default = the DataHistory type mapping, as the reference falls
    back to ``CloudEventFactory.DefaultDataHistoryTypeMapping``,
    ``KustoEventSink.cs:128-139``), stages a gzipped ND-JSON blob of
    the events' ``data`` payloads, and enqueues one ingestion message
    per blob.  Unsupported/None types are skipped with a warning
    counter, not an error (``KustoEventSink.cs:160-178``).

    ``check_statuses()`` is the ReportMethod=Table poll: a status row
    that is neither Pending nor Succeeded marks the sink unhealthy
    (``KustoEventSink.cs:204-227``)."""

    def __init__(
        self,
        root: str,
        database: str = "adt",
        name: str = "kusto",
        property_events_table: str | None = None,
        twin_lifecycle_table: str | None = None,
        relationship_lifecycle_table: str | None = None,
        event_type_mappings: dict[str, str] | None = None,
        track_last_updated_by: bool = False,
    ):
        self.name = name
        self.root = root
        self.database = database
        self.is_healthy = True
        self.last_error: str | None = None
        self.skipped_events = 0
        for sub in ("staging", "queue", "status", "tables"):
            os.makedirs(os.path.join(root, sub), exist_ok=True)
        prop_mapping = list(PROPERTY_EVENT_MAPPING)
        if track_last_updated_by:
            prop_mapping.append(UPDATED_BY_MAPPING)
        # sink-event-type → (table, mapping); the caller may remap which
        # CloudEvent `type` strings land where (EventTypeMappings).
        defaults = {
            DH_PROPERTY: (property_events_table or "AdtPropertyEvents", prop_mapping),
            DH_TWIN_LIFECYCLE: (
                twin_lifecycle_table or "AdtTwinLifeCycleEvents",
                TWIN_LIFECYCLE_MAPPING,
            ),
            DH_REL_LIFECYCLE: (
                relationship_lifecycle_table or "AdtRelationshipLifeCycleEvents",
                REL_LIFECYCLE_MAPPING,
            ),
        }
        if event_type_mappings:
            self._tables = {
                mapped: defaults[orig]
                for orig, mapped in event_type_mappings.items()
                if orig in defaults
            }
        else:
            self._tables = defaults
        self._seq = 0

    # -- client side: stage blob + enqueue message ---------------------
    def _enqueue(self, table: str, mapping, blob_rel: str, n: int, size: int) -> str:
        ingestion_id = str(uuid.uuid4())
        message = {
            # the queued-ingestion message shape (public ADX protocol)
            "Id": ingestion_id,
            "BlobPath": blob_rel,
            "RawDataSize": size,
            "DatabaseName": self.database,
            "TableName": table,
            "RetainBlobOnSuccess": False,
            "FlushImmediately": False,
            "ReportLevel": "FailuresAndSuccesses",
            "ReportMethod": "Table",
            "AdditionalProperties": {
                "format": "json",
                "ingestionMappingType": "Json",
                "ingestionMapping": json.dumps(
                    _mapping_json(mapping), separators=(",", ":")
                ),
            },
            "EventCount": n,
        }
        self._seq += 1
        msg_name = f"{self._seq:012d}-{ingestion_id}.json"
        tmp = os.path.join(self.root, "queue", f".{msg_name}.tmp")
        with open(tmp, "w") as f:
            json.dump(message, f, separators=(",", ":"))
        os.rename(tmp, os.path.join(self.root, "queue", msg_name))
        self._set_status(ingestion_id, "Pending", table=table)
        return ingestion_id

    def _set_status(self, ingestion_id: str, status: str, **extra) -> None:
        path = os.path.join(self.root, "status", f"{ingestion_id}.json")
        with open(path, "w") as f:
            json.dump({"IngestionSourceId": ingestion_id, "Status": status, **extra}, f)

    def statuses(self) -> list[dict[str, Any]]:
        out = []
        d = os.path.join(self.root, "status")
        for name in sorted(os.listdir(d)):
            if name.endswith(".json"):
                with open(os.path.join(d, name)) as f:
                    out.append(json.load(f))
        return out

    def check_statuses(self) -> bool:
        """ReportMethod=Table poll: any status outside Pending/Succeeded
        degrades health (``KustoEventSink.cs:204-227``)."""
        for st in self.statuses():
            if st["Status"] not in ("Pending", "Succeeded"):
                self.is_healthy = False
                self.last_error = json.dumps(st)
        return self.is_healthy

    def send(self, events: list[dict[str, Any]]) -> None:
        by_type: dict[str, list[dict[str, Any]]] = {}
        for e in events:
            t = e.get("type")
            if t is None or t not in self._tables:
                self.skipped_events += 1  # skip-and-log, not an error
                continue
            by_type.setdefault(t, []).append(e)
        try:
            for t, group in by_type.items():
                table, mapping = self._tables[t]
                blob_rel = os.path.join("staging", f"{uuid.uuid4().hex}.json.gz")
                lines = []
                for e in group:
                    data = e.get("data")
                    if not isinstance(data, dict):
                        self.skipped_events += 1  # data must be a JSON object
                        continue
                    lines.append(json.dumps(data, separators=(",", ":")))
                if not lines:
                    continue
                raw = ("\n".join(lines) + "\n").encode("utf-8")
                with gzip.open(os.path.join(self.root, blob_rel), "wb") as f:
                    f.write(raw)
                self._enqueue(table, mapping, blob_rel, len(lines), len(raw))
            self.is_healthy = True
        except OSError as exc:
            self.is_healthy = False
            self.last_error = str(exc)
            raise SinkError(f"kusto ingestion enqueue failed: {exc}") from exc

    # -- scale path: executor-side blobs, one message per part ---------
    def send_df(self, df: DataFrame) -> None:
        """Formatted CloudEvents DataFrame (``format_events_df`` schema:
        ``data`` is a JSON string) → per-type gzipped staging blobs
        written executor-side + one ingestion message per part file.
        Only the O(part-files) listing touches the driver."""
        try:
            for t, (table, mapping) in self._tables.items():
                stage = os.path.join(self.root, "staging", f"df-{uuid.uuid4().hex}")
                (
                    df.filter(F.col("type") == t)
                    .select("data")
                    .write.option("compression", "gzip")
                    .mode("overwrite")
                    .text(stage)
                )
                parts = sorted(
                    os.path.join(stage, p)
                    for p in os.listdir(stage)
                    if p.endswith(".gz")
                )
                for part in parts:
                    # gzip ISIZE trailer = uncompressed length; skip the
                    # empty parts Spark writes for empty partitions.
                    with open(part, "rb") as pf:
                        pf.seek(-4, os.SEEK_END)
                        size = int.from_bytes(pf.read(4), "little")
                    if size == 0:
                        os.unlink(part)
                        continue
                    rel = os.path.relpath(part, self.root)
                    self._enqueue(table, mapping, rel, -1, size)
            self.is_healthy = True
        except OSError as exc:
            self.is_healthy = False
            self.last_error = str(exc)
            raise SinkError(f"kusto ingestion enqueue failed: {exc}") from exc


# ----------------------------------------------------------------------
# The service side: a local ingestor draining the queue
# ----------------------------------------------------------------------

_KUSTO_TO_SPARK = {
    "datetime": T.StringType(),  # ISO-8601 text; cast below in table_df
    "string": T.StringType(),
    "dynamic": T.StringType(),  # JSON text of the dynamic value
}


class LocalKustoIngestor:
    """The ADX data-management role: drain ingestion messages in enqueue
    order, apply each message's JSON ingestion mapping to its blob, land
    rows in the target table, and write the per-ingestion status row
    (Succeeded / Failed with detail) that ReportMethod=Table promises."""

    def __init__(self, root: str):
        self.root = root

    def _queue_messages(self) -> list[str]:
        d = os.path.join(self.root, "queue")
        return sorted(
            os.path.join(d, n)
            for n in os.listdir(d)
            if n.endswith(".json") and not n.startswith(".")
        )

    @staticmethod
    def _apply_mapping(line: str, mapping: list[dict[str, Any]]) -> dict[str, Any]:
        obj = json.loads(line)
        row: dict[str, Any] = {}
        for m in mapping:
            path = m["Properties"]["Path"]
            if not path.startswith("$."):
                raise ValueError(f"unsupported mapping path {path!r}")
            # reference mappings are all single-segment $.field paths
            v = obj.get(path[2:])
            if m["datatype"] == "dynamic":
                row[m["column"]] = (
                    None if v is None else json.dumps(v, separators=(",", ":"))
                )
            else:
                row[m["column"]] = None if v is None else str(v)
        return row

    def process_queue(self, limit: int | None = None) -> dict[str, int]:
        """Drain up to ``limit`` messages; returns per-status counts."""
        counts = {"Succeeded": 0, "Failed": 0}
        for msg_path in self._queue_messages()[:limit]:
            with open(msg_path) as f:
                msg = json.load(f)
            blob = os.path.join(self.root, msg["BlobPath"])
            table_dir = os.path.join(self.root, "tables", msg["TableName"])
            status_extra = {"table": msg["TableName"], "blob": msg["BlobPath"]}
            try:
                mapping = json.loads(
                    msg["AdditionalProperties"]["ingestionMapping"]
                )
                rows = []
                with gzip.open(blob, "rt", encoding="utf-8") as f:
                    for line in f:
                        line = line.strip()
                        if line:
                            rows.append(self._apply_mapping(line, mapping))
                os.makedirs(table_dir, exist_ok=True)
                out = os.path.join(table_dir, f"{msg['Id']}.ndjson")
                tmp = out + ".tmp"
                with open(tmp, "w") as f:
                    for r in rows:
                        f.write(json.dumps(r, separators=(",", ":")) + "\n")
                os.rename(tmp, out)
                self._status(msg["Id"], "Succeeded", rows=len(rows), **status_extra)
                counts["Succeeded"] += 1
                if not msg.get("RetainBlobOnSuccess", False):
                    os.unlink(blob)
            except Exception as exc:  # noqa: BLE001 — per-message failure isolation
                self._status(msg["Id"], "Failed", detail=str(exc), **status_extra)
                counts["Failed"] += 1
            os.unlink(msg_path)
        return counts

    def _status(self, ingestion_id: str, status: str, **extra) -> None:
        path = os.path.join(self.root, "status", f"{ingestion_id}.json")
        with open(path, "w") as f:
            json.dump({"IngestionSourceId": ingestion_id, "Status": status, **extra}, f)


def table_schema(mapping: list[tuple[str, str, str]]) -> T.StructType:
    return T.StructType(
        [T.StructField(c, _KUSTO_TO_SPARK[t], True) for c, t, _ in mapping]
    )


def table_df(spark: SparkSession, root: str, table: str) -> DataFrame:
    """Read an ingested ADX table as a DataFrame with its mapped schema
    (datetime columns cast to timestamps, dynamic kept as JSON text)."""
    mapping = {
        "AdtPropertyEvents": PROPERTY_EVENT_MAPPING + [UPDATED_BY_MAPPING],
        "AdtTwinLifeCycleEvents": TWIN_LIFECYCLE_MAPPING,
        "AdtRelationshipLifeCycleEvents": REL_LIFECYCLE_MAPPING,
    }.get(table)
    d = os.path.join(root, "tables", table)
    if mapping is None:
        return spark.read.json(d)
    df = spark.read.schema(table_schema(mapping)).json(d)
    for c, t, _ in mapping:
        if t == "datetime":
            df = df.withColumn(c, F.to_timestamp(F.col(c)))
    return df
