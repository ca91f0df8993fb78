"""Event routes, sinks, retry/DLQ, and the streaming pipeline runner.

Reference (``src/AgeDigitalTwins.Events``): SharedEventConsumer drains a
queue in batches (100 / 5 s), matches routes {SinkName, EventFormat,
TypeMappings}, formats via CloudEventFactory, and writes through
``ResilientEventSinkWrapper`` (exponential-backoff retry → DLQ) to
Kafka/Kusto/MQTT/Webhook sinks (S4-S13).

Spark-native: the micro-batch boundary *is* the batch/timer; routes
become per-batch fan-out inside ``foreachBatch`` (or one streaming query
per route); Kafka maps to the native ``writeStream.format("kafka")``;
the webhook sink is a real stdlib-HTTP POST per CloudEvent
(``WebhookSink``), the MQTT sink speaks real MQTT 3.1.1 framing, and
the Kafka sink's driver-batch path speaks the real Produce v3 wire
protocol (record-batch v2 + CRC-32C) — all over stdlib sockets, no
client libraries required.  ``send_df`` remains the executor-side
scale path for Kafka/lake sinks.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from pg_age_digitaltwins_spark.streaming import cloudevents
from pg_age_digitaltwins_spark.streaming.changes import (
    EVENT_DATA_SCHEMA,
    ChangeLog,
    EventData,
    coalesce_events,
)


class SinkError(RuntimeError):
    pass


class EventSink:
    """Base sink: receives a batch of CloudEvents (dicts).

    Sinks that can absorb a whole formatted DataFrame executor-side
    (Kafka, file/lake sinks) additionally implement
    ``send_df(df) -> None`` — the streaming path prefers it and the
    events then never funnel through the driver."""

    name = "sink"
    send_df: Callable[[DataFrame], None] | None = None

    def send(self, events: list[dict[str, Any]]) -> None:  # pragma: no cover
        raise NotImplementedError


class InMemoryEventSink(EventSink):
    """Test/inspection sink (the Events.Test suites' queue-assert
    pattern)."""

    def __init__(self, name: str = "memory"):
        self.name = name
        self.events: list[dict[str, Any]] = []

    def send(self, events: list[dict[str, Any]]) -> None:
        self.events.extend(events)


class NdjsonFileSink(EventSink):
    """Append CloudEvents as ND-JSON — the local stand-in for the Kusto
    tables (S10): same row-per-event shape the ADX ingestion mappings
    produce (``KustoEventSink.cs:43-121``)."""

    def __init__(self, path: str, name: str = "file"):
        self.name = name
        self.path = path

    def send(self, events: list[dict[str, Any]]) -> None:
        with open(self.path, "a") as f:
            for e in events:
                f.write(json.dumps(e, separators=(",", ":")) + "\n")


class NdjsonDirSink(EventSink):
    """Distributed lake sink: executors append the formatted CloudEvents
    as JSON part-files under a directory (the Kusto-table stand-in at
    scale — one ingestion-shaped row per event, written where the data
    lives).  ``send`` exists for the driver/unit path; the streaming
    path uses ``send_df`` so a 10⁹-event batch never hits the driver."""

    def __init__(self, path: str, name: str = "lake"):
        self.name = name
        self.path = path

    def send(self, events: list[dict[str, Any]]) -> None:
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        part = os.path.join(self.path, f"driver-{uuid.uuid4().hex}.json")
        with open(part, "w") as f:
            for e in events:
                e = dict(e)
                if not isinstance(e.get("data"), str):
                    e["data"] = json.dumps(e.get("data"), separators=(",", ":"))
                f.write(json.dumps(e, separators=(",", ":")) + "\n")

    def send_df(self, df: DataFrame) -> None:
        df.write.mode("append").json(self.path)


class KafkaSink(EventSink):
    """S9: Kafka delivery — key=subject, value=CloudEvent JSON
    (``KafkaEventSink.cs`` produces the same key/value contract).

    Two paths, mirroring the webhook/MQTT split:

    * ``send_df`` (the SCALE path): executor-side via the built-in
      Kafka batch sink — a 10⁹-event micro-batch never touches the
      driver.  Requires the spark-sql-kafka package on the cluster.
    * ``send`` (the OLTP transport path): a REAL wire-protocol produce
      — one Produce v3 request per batch carrying a record-batch v2
      set (CRC-32C, zigzag varints) over a stdlib socket
      (``streaming/kafka_wire.py``), acks=1 checked from the broker
      response.  No client library needed; transport or broker errors
      raise ``SinkError`` for the resilient wrapper.

    SASL (reference parity — ``KafkaEventSink.cs:37-82`` negotiates
    PLAIN or OAuthBearer through Confluent.Kafka): with
    ``sasl_mechanism`` set, each connection runs SaslHandshake v1 +
    SaslAuthenticate v1 before the produce.  ``PLAIN`` sends RFC-4616
    user/password; ``OAUTHBEARER`` calls ``token_provider()`` per
    connection (the ``SetOAuthBearerTokenRefreshHandler`` equivalent —
    tokens expire, so they are fetched at auth time, never cached
    here).  Broker rejection (mechanism or credentials) raises
    ``SinkError`` like any transport failure → retry → DLQ."""

    def __init__(
        self,
        bootstrap_servers: str,
        topic: str,
        name: str = "kafka",
        partition: int = 0,
        client_id: str = "pg-age-dt-spark",
        timeout: float = 10.0,
        sasl_mechanism: str | None = None,
        sasl_username: str | None = None,
        sasl_password: str | None = None,
        token_provider: Callable[[], str] | None = None,
    ):
        self.name = name
        self.bootstrap_servers = bootstrap_servers
        self.topic = topic
        self.partition = partition
        self.client_id = client_id
        self.timeout = timeout
        self.sasl_mechanism = sasl_mechanism.upper() if sasl_mechanism else None
        if self.sasl_mechanism not in (None, "PLAIN", "OAUTHBEARER"):
            raise ValueError(
                f"unsupported sasl_mechanism {sasl_mechanism!r} "
                "(PLAIN or OAUTHBEARER)"
            )
        if self.sasl_mechanism == "PLAIN" and sasl_username is None:
            raise ValueError("sasl_mechanism=PLAIN requires sasl_username/password")
        if self.sasl_mechanism == "OAUTHBEARER" and token_provider is None:
            raise ValueError("sasl_mechanism=OAUTHBEARER requires token_provider")
        self.sasl_username = sasl_username
        self.sasl_password = sasl_password or ""
        self.token_provider = token_provider
        self.is_healthy = True
        self.last_error: str | None = None
        self._corr = 0

    def _authenticate(self, sock) -> None:
        """SaslHandshake v1 → SaslAuthenticate v1 on a fresh connection."""
        from pg_age_digitaltwins_spark.streaming import kafka_wire as kw

        self._corr += 1
        sock.sendall(
            kw.encode_sasl_handshake_request(
                self._corr, self.client_id, self.sasl_mechanism
            )
        )
        size = int.from_bytes(_recv_exact(sock, 4), "big")
        hs = kw.decode_sasl_handshake_response(_recv_exact(sock, size))
        if hs["error_code"] != 0:
            raise ConnectionError(
                f"SASL handshake rejected (error_code={hs['error_code']}, "
                f"broker supports {hs['mechanisms']})"
            )
        if self.sasl_mechanism == "PLAIN":
            auth = kw.sasl_plain_bytes(self.sasl_username, self.sasl_password)
        else:
            auth = kw.oauthbearer_bytes(self.token_provider())
        self._corr += 1
        sock.sendall(
            kw.encode_sasl_authenticate_request(self._corr, self.client_id, auth)
        )
        size = int.from_bytes(_recv_exact(sock, 4), "big")
        ar = kw.decode_sasl_authenticate_response(_recv_exact(sock, size))
        if ar["error_code"] != 0:
            raise ConnectionError(
                f"SASL authentication failed (error_code={ar['error_code']}"
                + (f": {ar['error_message']}" if ar["error_message"] else "")
                + ")"
            )

    def send(self, events: list[dict[str, Any]]) -> None:
        import socket

        from pg_age_digitaltwins_spark.streaming import kafka_wire as kw

        host, _, port = self.bootstrap_servers.split(",")[0].partition(":")
        records = []
        for e in events:
            key = (e.get("subject") or "").encode("utf-8") or None
            value = json.dumps(
                {"specversion": "1.0", **e}, separators=(",", ":")
            ).encode("utf-8")
            records.append((key, value))
        try:
            with socket.create_connection(
                (host, int(port or 9092)), timeout=self.timeout
            ) as s:
                if self.sasl_mechanism:
                    self._authenticate(s)
                self._corr += 1
                req = kw.encode_produce_request(
                    self._corr,
                    self.client_id,
                    self.topic,
                    self.partition,
                    kw.encode_record_batch(records),
                    acks=1,
                    timeout_ms=int(self.timeout * 1000),
                )
                s.sendall(req)
                size = int.from_bytes(_recv_exact(s, 4), "big")
                resp = kw.decode_produce_response(_recv_exact(s, size))
            if resp["error_code"] != 0:
                raise ConnectionError(
                    f"broker error_code={resp['error_code']} for {self.topic}"
                )
            self.is_healthy = True
        except Exception as exc:  # noqa: BLE001 — transport/broker failure
            self.is_healthy = False
            self.last_error = str(exc)
            raise SinkError(
                f"kafka produce to {self.bootstrap_servers} failed: {exc}"
            ) from exc

    def send_df(self, df: DataFrame) -> None:  # pragma: no cover
        (
            df.selectExpr("subject AS key", "to_json(struct(*)) AS value")
            .write.format("kafka")
            .options(**kafka_writer_options(self.bootstrap_servers, self.topic))
            .save()
        )


def _recv_exact(sock, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("connection closed mid-frame")
        buf += chunk
    return buf


class CallbackSink(EventSink):
    """MQTT-shaped sink: per-batch delivery through an injected
    transport callable (MQTT publish in production —
    ``MqttEventSink.cs``; no client lib in this container)."""

    def __init__(self, transport: Callable[[list[dict[str, Any]]], None], name: str = "callback"):
        self.name = name
        self.transport = transport

    def send(self, events: list[dict[str, Any]]) -> None:
        self.transport(events)


class WebhookSink(EventSink):
    """S12: real HTTP webhook delivery over stdlib ``urllib`` — one POST
    per CloudEvent in structured mode (``application/cloudevents+json``),
    the contract of ``Sinks/Webhook/WebhookEventSink.cs:119-197``.

    Auth mirrors ``ConfigureClient`` (``WebhookEventSink.cs:37-80``):
    ``auth_type`` of ``"Basic"`` (username/password), ``"Bearer"``
    (token), or ``"ApiKey"``/``"Header"`` (header_name/header_value),
    resolved once into static request headers.

    Failure semantics follow the reference exactly: a non-2xx HTTP
    response marks the sink unhealthy and moves on (the reference logs
    and continues — the endpoint *received* the request, re-POSTing
    risks duplicates); a transport-level error (connect refused, DNS,
    timeout) raises ``SinkError`` so the ``ResilientSink`` wrapper
    retries with backoff and eventually dead-letters the batch."""

    per_event_transport = True  # one POST per event → replay per event

    def __init__(
        self,
        url: str,
        name: str = "webhook",
        auth_type: str | None = None,
        username: str | None = None,
        password: str | None = None,
        token: str | None = None,
        header_name: str | None = None,
        header_value: str | None = None,
        timeout: float = 10.0,
    ):
        self.name = name
        self.url = url
        self.timeout = timeout
        self.is_healthy = True
        self.last_error: str | None = None
        self.headers = {"Content-Type": "application/cloudevents+json; charset=utf-8"}
        at = (auth_type or "").lower()
        if at == "basic" and username and password:
            import base64

            cred = base64.b64encode(f"{username}:{password}".encode("ascii"))
            self.headers["Authorization"] = f"Basic {cred.decode('ascii')}"
        elif at == "bearer" and token:
            self.headers["Authorization"] = f"Bearer {token}"
        elif at in ("apikey", "header") and header_name and header_value:
            self.headers[header_name] = header_value

    def send(self, events: list[dict[str, Any]]) -> None:
        import urllib.error
        import urllib.request

        for e in events:
            # Structured-mode encoding adds the required specversion —
            # the reference's JsonEventFormatter does the same at
            # EncodeStructuredModeMessage time.
            body = json.dumps(
                {"specversion": "1.0", **e}, separators=(",", ":")
            ).encode("utf-8")
            req = urllib.request.Request(
                self.url, data=body, headers=self.headers, method="POST"
            )
            try:
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    resp.read()
                self.is_healthy = True
            except urllib.error.HTTPError as exc:
                # Endpoint answered with an error status: delivered but
                # rejected — unhealthy, no retry (reference behavior).
                exc.read()
                self.is_healthy = False
                self.last_error = f"HTTP {exc.code} from {self.url}"
            except Exception as exc:  # noqa: BLE001 — transport failure
                self.is_healthy = False
                self.last_error = str(exc)
                raise SinkError(
                    f"webhook transport to {self.url} failed: {exc}"
                ) from exc


def _mqtt_varint(n: int) -> bytes:
    """MQTT remaining-length encoding (7 bits per byte, MSB=continue)."""
    out = bytearray()
    while True:
        b = n % 128
        n //= 128
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _mqtt_str(s: str) -> bytes:
    b = s.encode("utf-8")
    return len(b).to_bytes(2, "big") + b


class MqttSink(EventSink):
    """S11: real MQTT 3.1.1 delivery over a stdlib TCP socket — the
    protocol framing is tiny enough that no client library is needed:
    CONNECT (clean session, optional username/password) → CONNACK →
    one QoS-0 PUBLISH per CloudEvent (structured-mode JSON payload,
    fixed topic) → DISCONNECT on close.  Mirrors
    ``Sinks/Mqtt/MqttEventSink.cs``: same per-event publish loop,
    structured content mode, reconnect-on-dead-connection, and health
    flag semantics (healthy = flag AND connected).

    Transport failures mark the sink unhealthy and raise ``SinkError``
    so the ``ResilientSink`` wrapper retries/dead-letters, exactly like
    the webhook sink."""

    per_event_transport = True  # one PUBLISH per event → replay per event

    def __init__(
        self,
        host: str,
        port: int,
        topic: str,
        client_id: str = "pg-age-dt-spark",
        username: str | None = None,
        password: str | None = None,
        keepalive_s: int = 60,
        timeout: float = 10.0,
        name: str = "mqtt",
    ):
        self.name = name
        self.host, self.port, self.topic = host, port, topic
        self.client_id = client_id
        self.username, self.password = username, password
        self.keepalive_s = keepalive_s
        self.timeout = timeout
        self.last_error: str | None = None
        self._healthy = True
        self._sock = None

    @property
    def is_healthy(self) -> bool:
        # A never-connected (or deliberately closed) sink is healthy:
        # it connects lazily on the next send.  Only an actual failed
        # delivery (which clears ``_healthy``) degrades health —
        # otherwise /health would report a freshly configured MQTT
        # route as down before any event has flowed.
        return self._healthy

    # ------------------------------------------------------------------
    def _connect(self) -> None:
        import socket

        flags = 0x02  # clean session
        payload = _mqtt_str(self.client_id)
        if self.username is not None:
            flags |= 0x80
            payload += _mqtt_str(self.username)
            if self.password is not None:
                flags |= 0x40
                payload += _mqtt_str(self.password)
        var_header = (
            _mqtt_str("MQTT")
            + bytes([0x04, flags])
            + self.keepalive_s.to_bytes(2, "big")
        )
        pkt = bytes([0x10]) + _mqtt_varint(len(var_header) + len(payload)) + var_header + payload
        s = socket.create_connection((self.host, self.port), timeout=self.timeout)
        s.sendall(pkt)
        # CONNACK is exactly 4 bytes but TCP may fragment them — a
        # single recv can short-read and misreport a refusal.
        ack = b""
        while len(ack) < 4:
            part = s.recv(4 - len(ack))
            if not part:
                break
            ack += part
        if len(ack) < 4 or ack[0] != 0x20 or ack[3] != 0x00:
            s.close()
            raise ConnectionError(f"MQTT CONNACK refused: {ack.hex() if ack else 'EOF'}")
        self._sock = s

    def send(self, events: list[dict[str, Any]]) -> None:
        for e in events:
            payload = json.dumps(
                {"specversion": "1.0", **e}, separators=(",", ":")
            ).encode("utf-8")
            body = _mqtt_str(self.topic) + payload  # QoS 0: no packet id
            pkt = bytes([0x30]) + _mqtt_varint(len(body)) + body
            try:
                if self._sock is None:
                    self._connect()
                self._sock.sendall(pkt)
                self._healthy = True
            except Exception as exc:  # noqa: BLE001 — transport failure
                self._healthy = False
                self.last_error = str(exc)
                if self._sock is not None:
                    try:
                        self._sock.close()
                    except OSError:
                        pass
                    self._sock = None
                raise SinkError(
                    f"mqtt publish to {self.host}:{self.port} failed: {exc}"
                ) from exc

    def close(self) -> None:
        if self._sock is not None:
            try:
                self._sock.sendall(bytes([0xE0, 0x00]))  # DISCONNECT
                self._sock.close()
            except OSError:
                pass
            self._sock = None


def kafka_writer_options(bootstrap_servers: str, topic: str) -> dict[str, str]:
    """Options for the native Kafka sink (S9): CloudEvents key=subject,
    value=JSON.  Use with::

        (format_events_df(stream, src)
         .selectExpr("subject AS key", "to_json(struct(*)) AS value")
         .writeStream.format("kafka").options(**kafka_writer_options(...))
         .start())
    """
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
    }


@dataclass
class EventRoute:
    """S5: {sink name, format, optional CloudEvent type overrides}."""

    sink_name: str
    event_format: str = "EventNotification"  # or "DataHistory"
    type_mappings: dict[str, str] | None = None


class ResilientSink:
    """S13 ``ResilientEventSinkWrapper``: bounded exponential-backoff
    retries; exhausted batches land in the DLQ with error context and
    can be replayed."""

    def __init__(
        self,
        inner: EventSink,
        max_retries: int = 3,
        base_delay: float = 0.05,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self.inner = inner
        self.max_retries = max_retries
        self.base_delay = base_delay
        self.sleep = sleep
        self.dlq: list[dict[str, Any]] = []

    def send(self, events: list[dict[str, Any]]) -> None:
        attempt = 0
        while True:
            try:
                self.inner.send(events)
                return
            except Exception as exc:  # noqa: BLE001 — any sink failure retries
                attempt += 1
                if attempt > self.max_retries:
                    for e in events:
                        self.dlq.append(
                            {"event": e, "error": str(exc), "sink": self.inner.name}
                        )
                    return
                self.sleep(self.base_delay * (2 ** (attempt - 1)))

    def send_df(self, df: DataFrame) -> None:
        """Distributed delivery with the same bounded retry; an
        exhausted batch lands a bounded row sample in the DLQ (the full
        batch is replayable from the stream checkpoint — the DLQ's job
        here is diagnosis, not durability)."""
        inner_fn = getattr(self.inner, "send_df", None)
        if not callable(inner_fn):
            raise SinkError(f"Sink {self.inner.name!r} has no DataFrame path")
        attempt = 0
        while True:
            try:
                inner_fn(df)
                return
            except Exception as exc:  # noqa: BLE001 — any sink failure retries
                attempt += 1
                if attempt > self.max_retries:
                    for r in df.limit(100).collect():
                        self.dlq.append(
                            {"event": r.asDict(), "error": str(exc), "sink": self.inner.name}
                        )
                    return
                self.sleep(self.base_delay * (2 ** (attempt - 1)))

    def replay_dlq(self, batch_size: int = 100) -> int:
        """DLQService replay: re-send dead letters in batches (the
        consumer's batch contract — one send per ``batch_size`` events,
        not one per event); a failing batch returns to the DLQ whole.

        Per-event transports (webhook, MQTT — ``per_event_transport``)
        replay one event per send instead: their ``send`` delivers
        inside a per-event loop, so a mid-chunk transport failure would
        re-queue already-delivered events and the next replay would
        duplicate them.  One-at-a-time costs the same on those sinks
        (they publish per event regardless) and only the genuinely
        undelivered events return to the DLQ."""
        pending, self.dlq = self.dlq, []
        if getattr(self.inner, "per_event_transport", False):
            batch_size = 1
        ok = 0
        for start in range(0, len(pending), batch_size):
            chunk = pending[start : start + batch_size]
            try:
                self.inner.send([item["event"] for item in chunk])
                ok += len(chunk)
            except Exception as exc:  # noqa: BLE001
                for item in chunk:
                    item["error"] = str(exc)
                self.dlq.extend(chunk)
        return ok


@dataclass
class EventRouter:
    """S4/S5: drain change events in batches, format per route, deliver.

    ``process`` is the driver-batch path (unit semantics); ``foreach_batch``
    is the Structured Streaming hook — formatting runs distributed via
    ``mapInPandas``, only delivery funnels through the sink."""

    source: str = "dt-instance"
    sinks: dict[str, ResilientSink] = field(default_factory=dict)
    routes: list[EventRoute] = field(default_factory=list)
    batch_size: int = 100  # SharedEventConsumer default (:31-40)
    # driver-delivery chunk cap for sinks without send_df (webhook/
    # MQTT): bounds rows buffered on the driver per send regardless of
    # micro-batch size (r8 — backfill-batch protection)
    driver_chunk_rows: int = 2000

    def add_sink(self, sink: EventSink, **kw) -> ResilientSink:
        rs = ResilientSink(sink, **kw)
        self.sinks[sink.name] = rs
        return rs

    def add_route(self, route: EventRoute) -> None:
        if route.sink_name not in self.sinks:
            raise ValueError(f"Unknown sink {route.sink_name!r}")
        self.routes.append(route)

    # ------------------------------------------------------------------
    def process(self, events: list[EventData]) -> int:
        """Deliver a list of EventData through all routes; returns the
        number of CloudEvents emitted."""
        total = 0
        for start in range(0, len(events), self.batch_size):
            batch = events[start : start + self.batch_size]
            for route in self.routes:
                fmt = cloudevents.FORMATTERS[route.event_format]
                out: list[dict[str, Any]] = []
                for ev in batch:
                    ces = fmt(ev, self.source)
                    if route.type_mappings:
                        for ce in ces:
                            ce["type"] = route.type_mappings.get(ce["type"], ce["type"])
                    out.extend(ces)
                if out:
                    self.sinks[route.sink_name].send(out)
                    total += len(out)
        return total

    def process_telemetry(self, payloads: list[dict[str, Any]]) -> int:
        """S8: telemetry events bypass storage and flow straight to the
        routes (TelemetryListener feeds the same queue)."""
        total = 0
        for route in self.routes:
            out = [cloudevents.telemetry_event(p, self.source) for p in payloads]
            if out:
                self.sinks[route.sink_name].send(out)
                total += len(out)
        return total

    # ------------------------------------------------------------------
    def foreach_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Streaming micro-batch hook: coalesce per (txn, entity), then
        per route format distributed and deliver.

        Delivery is executor-side (``send_df``) whenever the sink
        supports it — Kafka / lake routes never materialize on the
        driver.  Only transport-callback sinks (webhook/MQTT stand-ins,
        whose client makes the network call from one place anyway)
        collect, and those batches are OLTP-sized by contract (the
        reference batches 100 events, ``SharedEventConsumer``)."""
        coalesced = coalesce_events(batch_df)
        if len(self.routes) > 1:
            coalesced = coalesced.persist()
        try:
            for route in self.routes:
                formatted = cloudevents.format_events_df(
                    coalesced, self.source, route.event_format
                )
                if route.type_mappings:
                    mapping = F.create_map(
                        [F.lit(x) for kv in route.type_mappings.items() for x in kv]
                    )
                    formatted = formatted.withColumn(
                        "type",
                        F.coalesce(
                            F.element_at(mapping, F.col("type")), F.col("type")
                        ),
                    )
                sink = self.sinks[route.sink_name]
                if callable(getattr(sink.inner, "send_df", None)):
                    sink.send_df(formatted)
                    continue
                # Transport-callback sinks (webhook/MQTT) deliver from
                # the driver, but a backfill batch must not balloon it:
                # toLocalIterator holds ONE partition at a time and the
                # chunk cap bounds what is buffered between sends —
                # peak driver rows = max(partition, chunk), independent
                # of batch size.  Delivery semantics are unchanged
                # (each chunk goes through the sink's retry/DLQ path).
                buf: list[dict] = []
                for r in formatted.toLocalIterator():
                    d = r.asDict()
                    d["data"] = json.loads(d["data"])
                    buf.append(d)
                    if len(buf) >= self.driver_chunk_rows:
                        sink.send(buf)
                        buf = []
                if buf:
                    sink.send(buf)
        finally:
            if len(self.routes) > 1:
                coalesced.unpersist()


class StreamingHealthListener:
    """S14: the health surface of the reference's
    ``ReplicationHealthCheck`` + ``EventSinksHealthCheck`` on Spark
    primitives — a ``StreamingQueryListener`` capturing per-query
    liveness and progress (batch id, input rows, rates, trigger
    timestamp) plus per-sink health/DLQ depth from the router.

    Register via ``run_change_stream(..., health=listener)`` (or
    ``spark.streams.addListener`` directly); ``snapshot()`` is the
    health endpoint payload."""

    def __init__(self, router: "EventRouter | None" = None):
        self.router = router
        self.queries: dict[str, dict[str, Any]] = {}
        self._listener = None
        self._registered = False  # added to spark.streams at most once

    # -- StreamingQueryListener hooks (bridged below) ------------------
    def on_started(self, qid: str, name: str | None) -> None:
        self.queries[qid] = {"name": name, "active": True, "exception": None}

    def on_progress(self, p: dict[str, Any]) -> None:
        q = self.queries.setdefault(p["id"], {"active": True, "exception": None})
        q["progress"] = {
            "batchId": p.get("batchId"),
            "timestamp": p.get("timestamp"),
            "numInputRows": p.get("numInputRows"),
            "inputRowsPerSecond": p.get("inputRowsPerSecond"),
            "processedRowsPerSecond": p.get("processedRowsPerSecond"),
        }

    def on_terminated(self, qid: str, exception: str | None) -> None:
        q = self.queries.setdefault(qid, {})
        q["active"] = False
        q["exception"] = exception

    def listener(self):
        """The actual ``StreamingQueryListener`` (constructed lazily so
        importing this module never requires a live JVM)."""
        if self._listener is None:
            from pyspark.sql.streaming import StreamingQueryListener

            outer = self

            class _L(StreamingQueryListener):
                def onQueryStarted(self, event):
                    outer.on_started(str(event.id), event.name)

                def onQueryProgress(self, event):
                    p = event.progress
                    outer.on_progress({
                        "id": str(p.id),
                        "batchId": p.batchId,
                        "timestamp": p.timestamp,
                        "numInputRows": p.numInputRows,
                        "inputRowsPerSecond": p.inputRowsPerSecond,
                        "processedRowsPerSecond": p.processedRowsPerSecond,
                    })

                def onQueryIdle(self, event):
                    pass

                def onQueryTerminated(self, event):
                    outer.on_terminated(str(event.id), event.exception)

            self._listener = _L()
        return self._listener

    def register(self, spark) -> None:
        """Add to ``spark.streams`` at most once per listener instance —
        re-registering the same instance (e.g. one health surface shared
        across several streams) would stack duplicate callbacks."""
        if not self._registered:
            spark.streams.addListener(self.listener())
            self._registered = True

    def snapshot(self) -> dict[str, Any]:
        """Health payload: replication = any live query and no query
        died with an exception (``ReplicationHealthCheck`` semantics);
        sinks = per-sink healthy flag + DLQ depth
        (``EventSinksHealthCheck`` totals/names shape)."""
        failed = [q for q in self.queries.values() if q.get("exception")]
        replication = {
            "healthy": bool(self.queries)
            and not failed
            and any(q.get("active") for q in self.queries.values()),
            "queries": self.queries,
        }
        out: dict[str, Any] = {"replication": replication}
        if self.router is not None:
            sinks = {}
            for name, rs in self.router.sinks.items():
                healthy = getattr(rs.inner, "is_healthy", True) and not rs.dlq
                sinks[name] = {"healthy": healthy, "dlqDepth": len(rs.dlq)}
            unhealthy = sorted(n for n, s in sinks.items() if not s["healthy"])
            out["sinks"] = {
                "totalSinks": len(sinks),
                "healthySinks": len(sinks) - len(unhealthy),
                "unhealthySinkNames": unhealthy,
                "detail": sinks,
            }
            out["healthy"] = replication["healthy"] and not unhealthy
        else:
            out["healthy"] = replication["healthy"]
        return out


def _files_per_trigger_for_rows(root: str, target_rows: int) -> int | None:
    """Translate a rows-per-trigger TARGET into a maxFilesPerTrigger
    value from the commit log's own metadata: the last manifests record
    ``n_events`` per commit, so the average commit size is known without
    scanning data.  Trigger sizing is THE throughput lever for the CDC
    pipeline — per-trigger overhead (checkpoint WAL, source listing,
    job scheduling) is fixed, so rows/trigger sets the steady rate.
    Returns None when the log records no usable sizes (bulk commits
    stage executor-side and record n_events = -1)."""
    from pg_age_digitaltwins_spark.store.commit_log import CommitLog

    log = CommitLog(root)
    sizes = []
    for v in log.versions()[-32:]:
        try:
            n = log.manifest(v).get("n_events") or 0
        except OSError:
            continue
        if n > 0:
            sizes.append(n)
    if not sizes:
        return None
    avg = sum(sizes) / len(sizes)
    return max(1, int(target_rows // avg))


def run_change_stream(
    spark: SparkSession,
    feed_path: str,
    router: EventRouter,
    checkpoint_dir: str,
    trigger: dict[str, Any] | None = None,
    timestamp_format: str = "yyyy-MM-dd'T'HH:mm:ss.SSS",
    max_files_per_trigger: int | None = None,
    health: StreamingHealthListener | None = None,
    target_rows_per_trigger: int | None = None,
    exporter=None,
):
    """Stand up the full replication pipeline as ONE Structured
    Streaming query: readStream over an EventData ND-JSON feed (the
    CDF/WAL stand-in) → per-micro-batch coalescing → distributed
    CloudEvents formatting → route fan-out to sinks.

    This is the package-level equivalent of the reference's continuous
    replication loop (``AgeDigitalTwinsReplication.cs:81-192``): where
    the reference tails a Postgres logical-replication slot, the Spark
    build tails a directory of EventData lines — swap the source for
    Kafka/Delta-CDF in production, the rest of the query is unchanged.

    ``feed_path`` may be either a flat ND-JSON feed directory (the
    write-through ``ChangeLog`` mode) or a **commit-log table root**
    (``store/commit_log.py``): the latter is detected by its
    ``_commits/`` directory and tailed through the ``changes/*`` glob,
    so the stream consumes exactly the per-commit compacted batches in
    commit order — the Delta-CDF equivalent without the dependency.

    Returns the started ``StreamingQuery`` (caller owns its lifecycle:
    ``awaitTermination`` / ``stop``).  ``trigger`` defaults to
    ``{"availableNow": True}`` (drain-and-stop); pass
    ``{"processingTime": "5 seconds"}`` for a continuous tail —
    mirroring the reference's 100-event/5 s consumer cadence.
    Exactly-once per sink comes from the checkpoint + each micro-batch
    being delivered atomically per route.

    ``target_rows_per_trigger`` is the throughput policy knob: for a
    commit-log source it is translated into ``maxFilesPerTrigger`` via
    the manifests' recorded commit sizes (``_files_per_trigger_for_rows``)
    — bigger triggers amortize the fixed per-trigger overhead (the
    formatting pipeline itself runs far faster than any realistic feed;
    the measured floor is per-trigger setup).  An explicit
    ``max_files_per_trigger`` wins over the derived value.  For
    backfill, leave both unset: one availableNow mega-batch is the
    fastest drain."""
    from pg_age_digitaltwins_spark.store.commit_log import (
        changes_glob,
        is_commit_log_root,
    )

    if is_commit_log_root(feed_path):
        if target_rows_per_trigger is not None and max_files_per_trigger is None:
            max_files_per_trigger = _files_per_trigger_for_rows(
                feed_path, target_rows_per_trigger
            )
        feed_path = changes_glob(feed_path)
    if health is not None:
        if health.router is None:
            health.router = router
        health.register(spark)
    reader = spark.readStream.schema(EVENT_DATA_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.json(feed_path, timestampFormat=timestamp_format)
    batch_fn = router.foreach_batch
    if exporter is not None:
        # r10: export-on-commit inside the streaming path — after each
        # micro-batch's route delivery, tail any new commit-log
        # versions into the external Delta export
        # (store/delta_export.py::ContinuousDeltaExporter.run_once),
        # keeping export_lag bounded by the trigger cadence instead of
        # a separate background thread's poll interval.
        # r11 (ADVICE): an exporter whose OWN background thread is
        # ticking (start() was called) must not also tick from the
        # micro-batch thread — run_once has no lock, so that puts two
        # writers on the same Delta export log (the exact race
        # ContinuousDeltaExporter.stop()'s guard exists to prevent).
        if getattr(exporter, "_thread", None) is not None:
            raise ValueError(
                "exporter already has a background thread (start() was "
                "called); use EITHER start() OR run_change_stream("
                "exporter=...), not both — two unsynchronized writers "
                "would share one Delta export log"
            )

        def batch_fn(df, epoch_id, _inner=router.foreach_batch):
            _inner(df, epoch_id)
            exporter.run_once()

    return (
        stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def run_change_pipeline(
    client_changes: ChangeLog,
    router: EventRouter,
    spark=None,
    distributed: bool = False,
) -> int:
    """Drain the client's change log through the router.

    ``distributed=True`` pushes the batch through the DataFrame
    coalesce + mapInPandas formatting (the scale path); default is the
    driver path (point mutations arrive one-per-transaction anyway)."""
    events = client_changes.drain()
    if not events:
        return 0
    if distributed:
        if spark is None:
            raise ValueError("distributed=True requires a SparkSession")
        batch = client_changes.to_df(spark, events)
        router.foreach_batch(batch, 0)
        return len(events)
    return router.process(events)
