"""Client facade — the engine's user-facing API.

Mirrors the reference SDK's surface (``AgeDigitalTwinsClient``): query
with pagination, twin/relationship/component/model CRUD with ETag
optimistic concurrency, telemetry publish, and a change log feeding the
event pipeline.  Mutations are snapshot-functional (each op swaps in a
new GraphStore) — the Delta ``MERGE INTO`` equivalent is the
cluster-deployment story (SURVEY.md §3.2).
"""

from __future__ import annotations

import base64
import json
import re
import uuid
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame

from pg_age_digitaltwins_spark import crud
from pg_age_digitaltwins_spark.adtql.compiler import QueryCompiler
from pg_age_digitaltwins_spark.adtql.parser import parse
from pg_age_digitaltwins_spark.store.graph_store import GraphStore
from pg_age_digitaltwins_spark.streaming.changes import ChangeLog
from pg_age_digitaltwins_spark.validation import ModelRegistry


@dataclass
class QueryPage:
    rows: list[dict]
    continuation_token: str | None
    charge: float = 0.0


def _jsonable(v):
    """Row values → JSON-typed Python: VariantType columns (dynamic
    properties reaching RETURN unconverted, e.g. ``UNWIND t.xs``)
    collect as ``VariantVal``, which would break every JSON consumer
    downstream (the reference returns agtype-decoded JSON values)."""
    try:
        from pyspark.sql.types import VariantVal
    except ImportError:  # pragma: no cover
        VariantVal = ()
    if isinstance(v, VariantVal):
        return v.toPython()
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_jsonable(x) for x in v]
    return v


# Detection regexes lifted from the reference's generated patterns
# (``AgeDigitalTwinsClient.Query.cs:295-306`` VariableLengthEdgeRegex,
# ``Query.cs:245-255`` aggregate keyword scan).
_VAR_LEN_RE = re.compile(r"\[[^\]]*(?::\w*)?\*[\d.]*\]", re.IGNORECASE)
_AGG_RE = re.compile(r"COUNT|SUM|AVG|MIN|MAX|is_of_model", re.IGNORECASE)


def compute_query_charge(rows: list[dict], query: str) -> float:
    """Reference arithmetic (``Query.cs:240-257``): page rows + total
    top-level properties, +10 for a variable-length edge query, +5 when
    the text contains an aggregate or ``IS_OF_MODEL``."""
    charge = float(len(rows))
    for row in rows:
        charge += len(row)
    if _VAR_LEN_RE.search(query):
        charge += 10
    if _AGG_RE.search(query):
        charge += 5
    return charge


class DigitalTwinsSparkClient:
    def __init__(self, store: GraphStore, graph_name: str = "digitaltwins"):
        self.store = store
        self.changes = ChangeLog(graph_name)
        self.telemetry_events: list[dict[str, Any]] = []
        self._registry: ModelRegistry | None = None

    # ------------------------------------------------------------------
    # query (read path, SURVEY §3.1)
    # ------------------------------------------------------------------
    def query_df(self, query: str, order_for_paging: bool = False) -> DataFrame:
        """Compile a query to a DataFrame (lazy).

        Dialect detection mirrors the reference (``Query.cs:44-55``):
        contains SELECT and no RETURN → ADT QL; otherwise raw Cypher."""
        if self.detect_dialect(query) == "adt":
            return QueryCompiler(self.store).compile(parse(query), order_for_paging)
        from pg_age_digitaltwins_spark.cypher import compile_cypher

        return compile_cypher(self.store, query)

    @staticmethod
    def detect_dialect(query: str) -> str:
        import re as _re

        has_select = _re.search(r"\bSELECT\b", query, _re.IGNORECASE)
        has_return = _re.search(r"\bRETURN\b", query, _re.IGNORECASE)
        return "adt" if (has_select and not has_return) else "cypher"

    def query(
        self,
        query: str,
        max_items_per_page: int | None = None,
        continuation_token: str | None = None,
    ) -> QueryPage:
        """Paged execution with continuation tokens.

        Token = base64 ``{"_tr": <row offset>, "_q": <query>}`` — same
        shape as the reference (``Models/ContinuationToken.cs:9-16``),
        except our offset is against an explicit deterministic sort (the
        reference leans on Postgres scan stability, SURVEY.md §4)."""
        offset = 0
        if continuation_token:
            tok = json.loads(base64.b64decode(continuation_token))
            offset = int(tok["_tr"])
            query = tok["_q"]
        df = self.query_df(query, order_for_paging=max_items_per_page is not None)
        if (
            max_items_per_page is not None
            and self.detect_dialect(query) == "cypher"
            and not re.search(r"\bORDER\s+BY\b", query, re.IGNORECASE)
        ):
            # Paging needs a total order or offsets slice arbitrary rows
            # across pages (the ADT path already sorts; the reference
            # leans on Postgres scan stability here, SURVEY §4).  Sort
            # by every output column's string rendering — variant
            # columns aren't directly orderable.
            from pyspark.sql import functions as F

            df = df.orderBy(*[F.col(c).cast("string") for c in df.columns])
        if max_items_per_page is None:
            rows = [_jsonable(r.asDict(recursive=True)) for r in df.collect()]
            return QueryPage(rows, None, compute_query_charge(rows, query))
        page = df.offset(offset).limit(max_items_per_page + 1).collect()
        rows = [_jsonable(r.asDict(recursive=True)) for r in page[:max_items_per_page]]
        token = None
        if len(page) > max_items_per_page:
            token = base64.b64encode(
                json.dumps({"_tr": offset + max_items_per_page, "_q": query}).encode()
            ).decode()
        return QueryPage(rows, token, compute_query_charge(rows, query))

    def query_charge(self, page: QueryPage) -> float:
        """Per-page charge, reference arithmetic incl. the +10
        var-length and +5 aggregate surcharges (``Query.cs:240-257``) —
        computed at query time, carried on the page."""
        return page.charge

    # ------------------------------------------------------------------
    # model registry
    # ------------------------------------------------------------------
    @property
    def registry(self) -> ModelRegistry:
        if self._registry is None:
            docs = [json.loads(r[0]) for r in self.store.models.select("model").collect()]
            self._registry = ModelRegistry(docs)
        return self._registry

    def _swap(self, store: GraphStore) -> None:
        self.store = store

    def checkpoint(self, path: str | None = None) -> None:
        """Storage maintenance (SURVEY §7 hard-#5: update-heavy OLTP on
        immutable snapshots).  Every point mutation swaps in a plan
        built on the previous one, so after N mutations each query
        replays an N-deep anti-join/union chain.  With ``path``, rewrite
        the store in the partitioned parquet layout and reload — the
        Delta ``OPTIMIZE``/compaction equivalent, restoring partition
        pruning and statistics; without, cut the lineage in place with
        ``localCheckpoint`` (executor-memory materialization).  Run it
        every few hundred mutations or after bulk imports."""
        if path is not None:
            self.store.save(path)
            self._swap(GraphStore.load(self.store.spark, path))
            return
        s = self.store
        self._swap(
            crud._replace(
                s,
                twins=s.twins.localCheckpoint(eager=True),
                relationships=s.relationships.localCheckpoint(eager=True),
                models=s.models.localCheckpoint(eager=True),
                model_edges=s.model_edges.localCheckpoint(eager=True),
            )
        )

    # ------------------------------------------------------------------
    # twins (D1-D5)
    # ------------------------------------------------------------------
    def get_digital_twin(self, dt_id: str) -> dict[str, Any]:
        return crud.get_twin(self.store, dt_id)

    def create_or_replace_digital_twin(
        self, dt_id: str, doc: dict[str, Any], **kw
    ) -> dict[str, Any]:
        ts = kw.setdefault("ts", crud.now_iso())
        store, new, old = crud.create_or_replace_twin(
            self.store, self.registry, dt_id, doc, **kw
        )
        self._swap(store)
        self.changes.begin()
        self.changes.append(
            "Twin", dt_id, old, new, "Update" if old is not None else "Insert", ts
        )
        return new

    def update_digital_twin(
        self, dt_id: str, patch: list[dict[str, Any]], **kw
    ) -> dict[str, Any]:
        ts = kw.setdefault("ts", crud.now_iso())
        store, new, old = crud.update_twin(
            self.store, self.registry, dt_id, patch, **kw
        )
        self._swap(store)
        self.changes.begin()
        self.changes.append("Twin", dt_id, old, new, "Update", ts)
        return new

    def delete_digital_twin(self, dt_id: str, **kw) -> None:
        store, old = crud.delete_twin(self.store, dt_id, **kw)
        self._swap(store)
        self.changes.begin()
        self.changes.append("Twin", dt_id, old, None, "Delete", crud.now_iso())

    def create_or_replace_digital_twins(
        self, docs: list[dict[str, Any]], **kw
    ) -> list[dict[str, Any]]:
        """D5: batch ≤100, per-item results, one vectorized MERGE."""
        ts = kw.setdefault("ts", crud.now_iso())
        store, results, changes = crud.create_twins_batch(
            self.store, self.registry, docs, **kw
        )
        self._swap(store)
        self.changes.begin()
        for dt_id, old, new in changes:
            self.changes.append(
                "Twin", dt_id, old, new, "Update" if old is not None else "Insert", ts
            )
        return results

    # ------------------------------------------------------------------
    # components (D9)
    # ------------------------------------------------------------------
    def get_component(self, dt_id: str, component: str) -> dict[str, Any]:
        return crud.get_component(self.store, dt_id, component)

    def update_component(
        self, dt_id: str, component: str, patch: list[dict[str, Any]], **kw
    ) -> dict[str, Any]:
        ts = kw.setdefault("ts", crud.now_iso())
        store, new, old = crud.update_component(
            self.store, self.registry, dt_id, component, patch, **kw
        )
        self._swap(store)
        self.changes.begin()
        self.changes.append("Twin", dt_id, old, new, "Update", ts)
        return new

    # ------------------------------------------------------------------
    # relationships (D6-D8)
    # ------------------------------------------------------------------
    def get_relationship(self, dt_id: str, rel_id: str) -> dict[str, Any]:
        return crud.get_relationship(self.store, dt_id, rel_id)

    def list_relationships(self, dt_id: str, relationship_name: str | None = None):
        return crud.list_relationships(self.store, dt_id, relationship_name)

    def list_incoming_relationships(self, dt_id: str):
        return crud.list_incoming_relationships(self.store, dt_id)

    def create_or_replace_relationship(
        self, dt_id: str, rel_id: str, doc: dict[str, Any], **kw
    ) -> dict[str, Any]:
        ts = kw.setdefault("ts", crud.now_iso())
        store, new, old = crud.create_or_replace_relationship(
            self.store, dt_id, rel_id, doc, **kw
        )
        self._swap(store)
        self.changes.begin()
        self.changes.append(
            new["$relationshipName"],
            rel_id,
            old,
            new,
            "Update" if old is not None else "Insert",
            ts,
        )
        return new

    def update_relationship(
        self, dt_id: str, rel_id: str, patch: list[dict[str, Any]], **kw
    ) -> dict[str, Any]:
        ts = kw.setdefault("ts", crud.now_iso())
        store, new, old = crud.update_relationship(
            self.store, dt_id, rel_id, patch, **kw
        )
        self._swap(store)
        self.changes.begin()
        self.changes.append(
            new["$relationshipName"], rel_id, old, new, "Update", ts
        )
        return new

    def delete_relationship(self, dt_id: str, rel_id: str, **kw) -> None:
        store, old = crud.delete_relationship(self.store, dt_id, rel_id, **kw)
        self._swap(store)
        self.changes.begin()
        self.changes.append(
            old["$relationshipName"], rel_id, old, None, "Delete", crud.now_iso()
        )

    def create_or_replace_relationships(self, docs: list[dict[str, Any]], **kw):
        ts = kw.setdefault("ts", crud.now_iso())
        store, results, changes = crud.create_relationships_batch(self.store, docs, **kw)
        self._swap(store)
        self.changes.begin()
        for rel_id, old, new in changes:
            self.changes.append(
                new["$relationshipName"],
                rel_id,
                old,
                new,
                "Update" if old is not None else "Insert",
                ts,
            )
        return results

    # ------------------------------------------------------------------
    # models (D10) — delegated to the store + registry invalidation
    # ------------------------------------------------------------------
    def create_models(self, model_docs: list[dict[str, Any]], ts: str | None = None):
        from pg_age_digitaltwins_spark import models as model_ops

        store, created = model_ops.create_models(self.store, model_docs)
        self._swap(store)
        self._registry = None
        ts = ts or crud.now_iso()
        self.changes.begin()
        for doc in created:
            self.changes.append("Model", doc["@id"], None, doc, "Insert", ts)
        return created

    def get_model(self, model_id: str) -> dict[str, Any]:
        from pg_age_digitaltwins_spark import models as model_ops

        return model_ops.get_model(self.store, model_id)

    def list_models(self, dependencies_for: list[str] | None = None):
        from pg_age_digitaltwins_spark import models as model_ops

        return model_ops.list_models(self.store, dependencies_for)

    def decommission_model(self, model_id: str) -> None:
        from pg_age_digitaltwins_spark import models as model_ops

        self._swap(model_ops.decommission_model(self.store, model_id))
        self._registry = None

    def delete_model(self, model_id: str) -> None:
        from pg_age_digitaltwins_spark import models as model_ops

        store, old = model_ops.delete_model(self.store, model_id)
        self._swap(store)
        self._registry = None
        self.changes.begin()
        self.changes.append("Model", model_id, old, None, "Delete", crud.now_iso())

    def delete_all_models(self) -> None:
        from pg_age_digitaltwins_spark import models as model_ops

        self._swap(model_ops.delete_all_models(self.store))
        self._registry = None

    def update_model_embedding(self, model_id: str, embedding: list[float]) -> None:
        from pg_age_digitaltwins_spark import models as model_ops

        self._swap(model_ops.update_model_embedding(self.store, model_id, embedding))

    def search_models(self, embedding=None, text=None, limit: int = 10):
        """D18: hybrid vector + lexical model search
        (``Models.cs:864-942``)."""
        from pg_age_digitaltwins_spark import models as model_ops

        return model_ops.search_models(
            self.store, embedding=embedding, text=text, limit=limit
        )

    # ------------------------------------------------------------------
    # telemetry (D11): fire-and-forget, never stored — queued for the
    # event pipeline exactly like pg_notify (``Telemetry.cs:93-197``)
    # ------------------------------------------------------------------
    def publish_telemetry(
        self,
        dt_id: str,
        payload: dict[str, Any],
        message_id: str | None = None,
        component_name: str | None = None,
        ts: str | None = None,
    ) -> dict[str, Any]:
        doc = crud.get_twin(self.store, dt_id)  # twin must exist
        event = {
            "digitalTwinId": dt_id,
            "messageId": message_id or str(uuid.uuid4()),
            "timestamp": ts or crud.now_iso(),
            "telemetry": payload,
            "modelId": (doc.get("$metadata") or {}).get("$model"),
        }
        if component_name is not None:
            event["componentName"] = component_name
        self.telemetry_events.append(event)
        return event
