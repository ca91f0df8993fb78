"""Operation tracing + metrics (the reference's OpenTelemetry surface).

Every reference client operation opens an ``ActivitySource`` span named
after the method with ``query``/``graphName`` tags and error status
(``AgeDigitalTwinsClient.cs:32`` declares the source
``AgeDigitalTwins.SDK``; e.g. ``Query.cs:29-36`` ``QueryAsync`` spans;
``docs/advanced-topics/logs-diagnostics.mdx``).  This module supplies
the same span/metric semantics with zero dependencies: a context-manager
tracer recording name, tags, duration, and error status into a bounded
ring plus per-operation counters.  When the ``opentelemetry`` package
is importable (not in this container), ``attach_otel`` bridges every
finished span to a real OTel tracer — the reference's exporters then
work unchanged.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Any, Callable

SOURCE_NAME = "pg-age-digitaltwins-spark.SDK"


@dataclass
class Span:
    name: str
    tags: dict[str, Any] = field(default_factory=dict)
    start_ns: int = 0
    end_ns: int = 0
    status: str = "ok"  # ok | error
    error: str | None = None

    def set_tag(self, key: str, value: Any) -> None:
        self.tags[key] = value

    @property
    def duration_ms(self) -> float:
        return (self.end_ns - self.start_ns) / 1e6


class Tracer:
    """Bounded-ring span recorder + per-operation counters."""

    def __init__(self, max_spans: int = 512):
        self._lock = threading.Lock()
        self.spans: deque[Span] = deque(maxlen=max_spans)
        self._counts: dict[str, dict[str, float]] = {}
        self._on_end: list[Callable[[Span], None]] = []

    @contextmanager
    def start(self, name: str, **tags: Any):
        span = Span(name=name, tags=dict(tags), start_ns=time.perf_counter_ns())
        try:
            yield span
        except Exception as exc:
            span.status = "error"
            span.error = f"{type(exc).__name__}: {exc}"
            raise
        finally:
            span.end_ns = time.perf_counter_ns()
            with self._lock:
                self.spans.append(span)
                c = self._counts.setdefault(
                    name, {"count": 0, "errors": 0, "total_ms": 0.0}
                )
                c["count"] += 1
                c["total_ms"] += span.duration_ms
                if span.status == "error":
                    c["errors"] += 1
            for cb in self._on_end:
                cb(span)

    def on_end(self, callback: Callable[[Span], None]) -> None:
        self._on_end.append(callback)

    def snapshot(self) -> dict[str, Any]:
        """The diagnostics payload: per-operation counters + the most
        recent spans (name, duration, status, tags)."""
        with self._lock:
            ops = {
                name: {
                    "count": int(c["count"]),
                    "errors": int(c["errors"]),
                    "totalMs": round(c["total_ms"], 3),
                    "avgMs": round(c["total_ms"] / c["count"], 3) if c["count"] else 0.0,
                }
                for name, c in sorted(self._counts.items())
            }
            recent = [
                {
                    "name": s.name,
                    "durationMs": round(s.duration_ms, 3),
                    "status": s.status,
                    **({"error": s.error} if s.error else {}),
                    "tags": s.tags,
                }
                for s in list(self.spans)[-20:]
            ]
        return {"source": SOURCE_NAME, "operations": ops, "recentSpans": recent}

    def attach_otel(self, otel_tracer=None) -> bool:
        """Bridge finished spans to a real OpenTelemetry tracer when the
        package is available; returns False (no-op) when it isn't."""
        try:
            if otel_tracer is None:
                from opentelemetry import trace  # type: ignore

                otel_tracer = trace.get_tracer(SOURCE_NAME)
        except ImportError:
            return False

        def bridge(span: Span) -> None:
            with otel_tracer.start_as_current_span(span.name) as o:
                for k, v in span.tags.items():
                    o.set_attribute(k, str(v))
                o.set_attribute("duration_ms", span.duration_ms)

        self.on_end(bridge)
        return True


# The reference's span-name per client operation (method-name spans,
# ``ActivityKind.Client``).
CLIENT_SPANS = {
    "query": "QueryAsync",
    "get_digital_twin": "GetDigitalTwinAsync",
    "create_or_replace_digital_twin": "CreateOrReplaceDigitalTwinAsync",
    "update_digital_twin": "UpdateDigitalTwinAsync",
    "delete_digital_twin": "DeleteDigitalTwinAsync",
    "create_or_replace_digital_twins": "CreateOrReplaceDigitalTwinsAsync",
    "get_component": "GetComponentAsync",
    "update_component": "UpdateComponentAsync",
    "get_relationship": "GetRelationshipAsync",
    "list_relationships": "GetRelationshipsAsync",
    "list_incoming_relationships": "GetIncomingRelationshipsAsync",
    "create_or_replace_relationship": "CreateOrReplaceRelationshipAsync",
    "update_relationship": "UpdateRelationshipAsync",
    "delete_relationship": "DeleteRelationshipAsync",
    "create_models": "CreateModelsAsync",
    "get_model": "GetModelAsync",
    "list_models": "GetModelsAsync",
    "delete_model": "DeleteModelAsync",
    "decommission_model": "DecommissionModelAsync",
    "publish_telemetry": "PublishTelemetryAsync",
    "commit": "CommitAsync",
}


def instrument_client(client, tracer: Tracer | None = None) -> Tracer:
    """Wrap the client's public operations in tracer spans (the
    reference opens an activity at the top of each method).  Wrapping is
    per-instance — the class stays clean and two clients can trace to
    different rings."""
    import functools

    tracer = tracer or Tracer()
    graph = getattr(getattr(client, "changes", None), "graph_name", None)
    for method, span_name in CLIENT_SPANS.items():
        fn = getattr(client, method, None)
        if fn is None:
            continue

        def wrapped(*args, __fn=fn, __name=span_name, **kwargs):
            with tracer.start(__name, graphName=graph) as span:
                if __name == "QueryAsync" and args:
                    span.set_tag("query", args[0])
                return __fn(*args, **kwargs)

        setattr(client, method, functools.update_wrapper(wrapped, fn))
    client.tracer = tracer
    return tracer
