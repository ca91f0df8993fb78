"""Configuration-driven sink/route assembly (``EventSinkFactory.cs``).

The reference's Events service builds its sinks and routes from the
``EventSinks`` / ``EventRoutes`` / ``Parameters`` configuration
sections (``EventSinkFactory.cs:24-161``; the self-hosted appsettings
shape in ``docs/concepts/event-routing.mdx`` §Configuration).  This
factory accepts the SAME configuration dictionary and assembles an
:class:`EventRouter` over the Spark-native sinks:

* ``EventSinks:Kafka``   → :class:`KafkaSink` (BrokerList/Topic/SASL)
* ``EventSinks:MQTT``    → :class:`MqttSink` (Broker/Port/Topic/auth)
* ``EventSinks:Webhook`` → :class:`WebhookSink` (Url/Basic/Bearer/ApiKey)
* ``EventSinks:Kusto``   → :class:`KustoQueuedSink` (queued-ingestion
  root + table overrides; ``Parameters:TrackLastUpdatedBy`` applied
  exactly as ``EventSinkFactory.cs:130-133`` does)

Reference error semantics: a misconfigured sink entry is SKIPPED and
recorded (the factory logs and continues, ``:52-58``) — one bad sink
must not take down the pipeline; a route naming an unknown sink still
raises at ``add_route`` (it would silently drop events otherwise).

``TypeMappings`` arrive keyed by ``SinkEventType`` names and are
translated to the CloudEvent type strings the router rewrites.
"""

from __future__ import annotations

from typing import Any

from pg_age_digitaltwins_spark.streaming import cloudevents as ce
from pg_age_digitaltwins_spark.streaming.kusto import KustoQueuedSink
from pg_age_digitaltwins_spark.streaming.sinks import (
    EventRoute,
    EventRouter,
    KafkaSink,
    MqttSink,
    WebhookSink,
)

# SinkEventType name → default CloudEvent type string
SINK_EVENT_TYPES = {
    "TwinCreate": ce.NOTIFICATION_TYPES[("Twin", "Insert")],
    "TwinUpdate": ce.NOTIFICATION_TYPES[("Twin", "Update")],
    "TwinDelete": ce.NOTIFICATION_TYPES[("Twin", "Delete")],
    "RelationshipCreate": ce.NOTIFICATION_TYPES[("Relationship", "Insert")],
    "RelationshipUpdate": ce.NOTIFICATION_TYPES[("Relationship", "Update")],
    "RelationshipDelete": ce.NOTIFICATION_TYPES[("Relationship", "Delete")],
    "Telemetry": ce.TELEMETRY_TYPE,
    "PropertyEvent": ce.DH_PROPERTY,
    "TwinLifecycle": ce.DH_TWIN_LIFECYCLE,
    "RelationshipLifecycle": ce.DH_REL_LIFECYCLE,
}


def _translate_type_mappings(
    mappings: dict[str, str] | None,
) -> dict[str, str] | None:
    if not mappings:
        return None
    out = {}
    for k, v in mappings.items():
        if k not in SINK_EVENT_TYPES:
            raise ValueError(f"Unknown SinkEventType {k!r} in TypeMappings")
        out[SINK_EVENT_TYPES[k]] = v
    return out


def build_router(
    config: dict[str, Any],
    source: str = "dt-instance",
    kusto_root: str | None = None,
) -> tuple[EventRouter, list[dict[str, str]]]:
    """Assemble (router, skipped-sink errors) from the reference's
    configuration shape.  ``kusto_root`` is the local staging root for
    queued-ingestion sinks (the blob/queue endpoint equivalent)."""
    router = EventRouter(source=source)
    errors: list[dict[str, str]] = []
    sinks_cfg = config.get("EventSinks") or {}
    track_lub = bool((config.get("Parameters") or {}).get("TrackLastUpdatedBy", False))

    def try_add(kind: str, opts: dict[str, Any], build) -> None:
        try:
            router.add_sink(build(opts))
        except (KeyError, TypeError, ValueError) as exc:
            # reference behavior: log-and-continue per entry (:52-58)
            errors.append(
                {"kind": kind, "name": str(opts.get("Name")), "error": str(exc)}
            )

    for opts in sinks_cfg.get("Kafka") or []:
        try_add(
            "Kafka",
            opts,
            lambda o: KafkaSink(
                bootstrap_servers=o["BrokerList"],
                topic=o["Topic"],
                name=o["Name"],
                sasl_mechanism=o.get("SaslMechanism"),
                sasl_username=o.get("SaslUsername"),
                sasl_password=o.get("SaslPassword"),
            ),
        )
    for opts in sinks_cfg.get("MQTT") or []:
        try_add(
            "MQTT",
            opts,
            lambda o: MqttSink(
                host=o["Broker"],
                port=int(o["Port"]),
                topic=o["Topic"],
                client_id=o.get("ClientId") or "pg-age-dt-spark",
                username=o.get("Username"),
                password=o.get("Password"),
                name=o["Name"],
            ),
        )
    for opts in sinks_cfg.get("Webhook") or []:
        try_add(
            "Webhook",
            opts,
            lambda o: WebhookSink(
                url=o["Url"],
                name=o["Name"],
                auth_type=o.get("AuthenticationType"),
                username=o.get("Username"),
                password=o.get("Password"),
                token=o.get("Token"),
                header_name=o.get("HeaderName"),
                header_value=o.get("HeaderValue"),
            ),
        )
    for opts in sinks_cfg.get("Kusto") or []:
        try_add(
            "Kusto",
            opts,
            lambda o: KustoQueuedSink(
                root=kusto_root or o["IngestionUri"],
                database=o.get("Database", "adt"),
                name=o["Name"],
                property_events_table=o.get("PropertyEventsTable"),
                twin_lifecycle_table=o.get("TwinLifeCycleEventsTable"),
                relationship_lifecycle_table=o.get("RelationshipLifeCycleEventsTable"),
                # a route that remaps CloudEvent types must pair with a
                # sink keyed by the MAPPED types (KustoEventSink.cs:128-139
                # takes EventTypeMappings on its own options)
                event_type_mappings=_translate_type_mappings(
                    o.get("EventTypeMappings")
                ),
                track_last_updated_by=track_lub,
            ),
        )

    for route in config.get("EventRoutes") or []:
        router.add_route(
            EventRoute(
                sink_name=route["SinkName"],
                event_format=route.get("EventFormat") or "EventNotification",
                type_mappings=_translate_type_mappings(route.get("TypeMappings")),
            )
        )
    return router, errors
