"""Model CRUD (SURVEY.md §2.3 D10) — the models dimension table.

Reference: ``src/AgeDigitalTwins/AgeDigitalTwinsClient.Models.cs``
(create batch + closure 248-470, list 55-77, delete 566-580, delete-all
630, decommission).  The model set is a tiny broadcastable dim, so these
ops recompute the full bases/descendants closure driver-side on every
write — O(models²) worst case on thousands of rows, negligible next to
the twin tables.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import functions as F

from pg_age_digitaltwins_spark.functions.model_closure import (
    extract_components,
    extract_extends,
)
from pg_age_digitaltwins_spark.store.graph_store import GraphStore


class ModelAlreadyExistsError(ValueError):
    pass


class ModelNotFoundError(KeyError):
    pass


class ModelReferencedError(ValueError):
    """Delete guard: other models still extend / compose this one."""


def _current_docs(store: GraphStore) -> dict[str, dict[str, Any]]:
    rows = store.models.select("model", "decommissioned", "upload_time").collect()
    out = {}
    for model_json, decommissioned, upload_time in rows:
        d = json.loads(model_json)
        d["__decommissioned"] = bool(decommissioned)
        out[d["@id"]] = d
    return out


def _rebuild(store: GraphStore, docs: dict[str, dict[str, Any]]) -> GraphStore:
    clean: list[dict[str, Any]] = []
    flags: dict[str, bool] = {}
    for mid, d in docs.items():
        d = dict(d)
        flags[mid] = d.pop("__decommissioned", False)
        clean.append(d)
    out = store.with_models(clean)
    if any(flags.values()):
        decommissioned_ids = [m for m, v in flags.items() if v]
        out.models = out.models.withColumn(
            "decommissioned", F.col("id").isin(decommissioned_ids)
        )
    return out


def create_models(
    store: GraphStore, model_docs: list[dict[str, Any] | str]
) -> tuple[GraphStore, list[dict[str, Any]]]:
    """Batch create: DTDL parse + structural validation, duplicate/
    exists checks, closure recompute, dim-table replace
    (``Models.cs:248-470``; parse errors fail the whole batch, like the
    reference's DTDLParser pass)."""
    from pg_age_digitaltwins_spark.validation import validate_model

    docs = _current_docs(store)
    created: list[dict[str, Any]] = []
    batch: list[dict[str, Any]] = []
    for m in model_docs:
        d = json.loads(m) if isinstance(m, str) else dict(m)
        mid = d.get("@id")
        if not mid:
            raise ValueError("DTDL model requires @id")
        if mid in docs or any(b.get("@id") == mid for b in batch):
            raise ModelAlreadyExistsError(f"Model {mid} already exists")
        batch.append(d)
    # Reference resolution sees existing models plus the whole batch
    # (models may reference each other within one upload)
    known = set(docs) | {d["@id"] for d in batch}
    all_docs: dict[str, dict[str, Any]] = {**docs, **{b["@id"]: b for b in batch}}

    def _closure_schema_ids(doc: dict[str, Any]) -> set[str]:
        # Named schemas are resolvable only along the interface's
        # extends closure (matching ModelRegistry.named_schemas /
        # validate_twin resolution) — pooling every interface's schemas
        # here would let a model reference a dtmi: schema defined in an
        # unrelated interface, which twin validation could then never
        # value-check (it would silently hit the lenient-accept path).
        out: set[str] = set()
        seen: set[str] = set()
        stack = list(extract_extends(doc))
        while stack:
            p = stack.pop()
            if p in seen or p not in all_docs:
                continue
            seen.add(p)
            for sch in all_docs[p].get("schemas") or []:
                if isinstance(sch, dict) and isinstance(sch.get("@id"), str):
                    out.add(sch["@id"])
            stack.extend(extract_extends(all_docs[p]))
        return out

    for d in batch:
        validate_model(d, known, _closure_schema_ids(d))
    _reject_extends_cycles(all_docs, batch)
    # cycle check first: the depth/collision walks below assume a DAG
    _reject_excessive_extends_depth(all_docs, batch)
    _reject_inherited_name_collisions(all_docs, batch)
    _reject_nested_components(all_docs, batch)
    for d in batch:
        docs[d["@id"]] = d
        created.append(d)
    return _rebuild(store, docs), created


def _reject_extends_cycles(
    all_docs: dict[str, dict[str, Any]], batch: list[dict[str, Any]]
) -> None:
    """DTDLParser rejects a cyclic ``extends`` graph (the inheritance
    hierarchy must be a DAG); without this, the closure computation
    silently records each cycle member as its own ancestor and
    IS_OF_MODEL answers become nonsense."""
    from pg_age_digitaltwins_spark.validation import ValidationError

    WHITE, GRAY, BLACK = 0, 1, 2
    color: dict[str, int] = {}

    def visit(mid: str, path: list[str]) -> None:
        if color.get(mid, WHITE) == BLACK or mid not in all_docs:
            return
        if color.get(mid) == GRAY:
            cycle = path[path.index(mid):] + [mid]
            raise ValidationError(
                "extends graph contains a cycle: " + " -> ".join(cycle)
            )
        color[mid] = GRAY
        for p in extract_extends(all_docs[mid]):
            visit(p, path + [mid])
        color[mid] = BLACK

    for d in batch:
        visit(d["@id"], [])


def _reject_excessive_extends_depth(
    all_docs: dict[str, dict[str, Any]], batch: list[dict[str, Any]]
) -> None:
    """DTDL caps the depth of the ``extends`` hierarchy: 10 levels under
    a v2 context, 12 under v3/v4 (DTDLParser ExceedsMaxDepthOfExtends;
    the reference inherits the check via Microsoft's parser,
    ``AgeDigitalTwinsClient.cs:68-81``).  Depth counts extends EDGES
    above the interface — a chain A extends B extends C puts A at
    depth 2."""
    from pg_age_digitaltwins_spark.validation import ValidationError

    memo: dict[str, int] = {}

    def depth(mid: str) -> int:
        if mid in memo:
            return memo[mid]
        doc = all_docs.get(mid)
        parents = [p for p in extract_extends(doc)] if doc else []
        memo[mid] = (
            1 + max((depth(p) for p in parents if p in all_docs), default=-1)
            if parents
            else 0
        )
        return memo[mid]

    def n_contents(doc: dict[str, Any]) -> int:
        c = doc.get("contents")
        if isinstance(c, dict):
            return 1
        return len(c) if isinstance(c, list) else 0

    for d in batch:
        ctx = d.get("@context")
        ctxs = [ctx] if isinstance(ctx, str) else (ctx or [])
        limit = 10 if "dtmi:dtdl:context;2" in ctxs else 12
        got = depth(d["@id"])
        if got > limit:
            raise ValidationError(
                f"model {d['@id']}: extends hierarchy is {got} levels deep; "
                f"DTDL allows at most {limit}"
            )
        if "dtmi:dtdl:context;2" in ctxs:
            # DTDL v2's 300-contents cap counts INHERITED contents too
            # (validate_model can only see the direct list; the closure
            # is available here)
            total, seen, stack = 0, set(), [d["@id"]]
            while stack:
                mid = stack.pop()
                if mid in seen:
                    continue
                seen.add(mid)
                doc = d if mid == d["@id"] else all_docs.get(mid)
                if doc is None:
                    continue
                total += n_contents(doc)
                stack.extend(extract_extends(doc))
            if total > 300:
                raise ValidationError(
                    f"model {d['@id']}: {total} contents including "
                    "inherited; DTDL v2 allows at most 300"
                )


def _reject_inherited_name_collisions(
    all_docs: dict[str, dict[str, Any]], batch: list[dict[str, Any]]
) -> None:
    """DTDL: a content ``name`` must be unique among ALL contents of the
    interface including inherited ones — an interface cannot redeclare a
    property/relationship/component name any ancestor already defines
    (DTDLParser non-unique-name rejection; delegated to Microsoft's
    parser in the reference, ``AgeDigitalTwinsClient.cs:68-81``)."""
    from pg_age_digitaltwins_spark.validation import ValidationError

    def content_names(doc: dict[str, Any]) -> set[str]:
        contents = doc.get("contents")
        if isinstance(contents, dict):
            contents = [contents]
        if not isinstance(contents, list):
            return set()
        return {
            c["name"]
            for c in contents
            if isinstance(c, dict) and isinstance(c.get("name"), str)
        }

    for d in batch:
        # every interface in the closure (the doc itself + all
        # ancestors) contributes its content names once; a name defined
        # by TWO DIFFERENT interfaces anywhere in the closure is a
        # collision — this also catches ancestor-vs-ancestor clashes
        # under multiple inheritance (A has 'mass', B has 'mass',
        # C extends [A, B] declares nothing itself).  Diamonds are
        # fine: the shared grandparent defines the name once.
        owner: dict[str, str] = {}
        seen: set[str] = set()
        stack = [d["@id"]]
        while stack:
            mid = stack.pop()
            if mid in seen:
                continue
            seen.add(mid)
            doc = d if mid == d["@id"] else all_docs.get(mid)
            if doc is None:
                continue
            for name in content_names(doc):
                prev = owner.get(name)
                if prev is not None and prev != mid:
                    raise ValidationError(
                        f"model {d['@id']}: content name '{name}' is "
                        f"defined by both {prev} and {mid} in its "
                        "extends closure"
                    )
                owner[name] = mid
            stack.extend(extract_extends(doc))


def _reject_nested_components(
    all_docs: dict[str, dict[str, Any]], batch: list[dict[str, Any]]
) -> None:
    """DTDL v2/v3 spec: the interface a Component points at must not
    itself declare Components (directly or via extends) — component
    nesting is a single level."""
    from pg_age_digitaltwins_spark.validation import ValidationError

    def has_components(mid: str, seen: set[str]) -> bool:
        if mid in seen or mid not in all_docs:
            return False
        seen.add(mid)
        doc = all_docs[mid]
        if _contents_of_type(doc, "Component"):
            return True
        return any(has_components(p, seen) for p in extract_extends(doc))

    for d in batch:
        for comp in _contents_of_type(d, "Component"):
            cs = comp.get("schema")
            if isinstance(cs, str) and has_components(cs, set()):
                raise ValidationError(
                    f"content '{comp.get('name')}': Component schema {cs!r} "
                    "itself contains Components — DTDL forbids nested "
                    "components"
                )


def _contents_of_type(doc: dict[str, Any], type_name: str) -> list[dict[str, Any]]:
    """Contents entries carrying ``type_name`` in their @type (string or
    array form); ``contents`` itself may be a single object or a list
    (``AgeDigitalTwinsClient.Models.cs:127-170`` ExtractContentsByType)."""
    contents = doc.get("contents")
    if isinstance(contents, dict):
        contents = [contents]
    if not isinstance(contents, list):
        return []
    out = []
    for item in contents:
        if isinstance(item, dict) and type_name in _types_of_content(item):
            out.append(item)
    return out


def _types_of_content(item: dict[str, Any]) -> list[str]:
    t = item.get("@type")
    if isinstance(t, str):
        return [t]
    if isinstance(t, list):
        return [x for x in t if isinstance(x, str)]
    return []


def get_model(
    store: GraphStore,
    model_id: str,
    include_base_model_contents: bool = False,
) -> dict[str, Any]:
    """Fetch one model's document + closure columns.  With
    ``include_base_model_contents`` the result additionally carries the
    contents merged across the model and ALL its bases, split by
    content kind — ``GetModelAsync`` with
    ``GetModelOptions.IncludeBaseModelContents = true``
    (``AgeDigitalTwinsClient.Models.cs:124-217``): straight
    concatenation in main-then-bases order, ``None`` for an empty
    category (the reference returns null, not an empty list)."""
    rows = (
        store.models.filter(F.col("id") == model_id)
        .select("model", "decommissioned", "bases", "descendants")
        .take(1)
    )
    if not rows:
        raise ModelNotFoundError(f"Model {model_id} not found")
    model_json, decommissioned, bases, descendants = rows[0]
    out = {
        "id": model_id,
        "model": json.loads(model_json),
        "decommissioned": bool(decommissioned),
        "bases": list(bases or []),
        "descendants": list(descendants or []),
    }
    if include_base_model_contents:
        base_ids = out["bases"]
        base_docs: dict[str, dict[str, Any]] = {}
        if base_ids:
            for bid, bjson in (
                store.models.filter(F.col("id").isin(base_ids))
                .select("id", "model")
                .collect()
            ):
                base_docs[bid] = json.loads(bjson)
        chain = [out["model"]] + [base_docs[b] for b in base_ids if b in base_docs]
        for key, type_name in (
            ("properties", "Property"),
            ("relationships", "Relationship"),
            ("components", "Component"),
            ("telemetries", "Telemetry"),
            ("commands", "Command"),
        ):
            merged = [c for d in chain for c in _contents_of_type(d, type_name)]
            out[key] = merged or None
    return out


def list_models(
    store: GraphStore, dependencies_for: list[str] | None = None
) -> list[dict[str, Any]]:
    """List all models; with ``dependencies_for`` include each named
    model plus its full dependency closure (bases + components —
    reference UNION query, ``Models.cs:55-77``)."""
    cols = [
        "id", "model", "display_name", "description", "upload_time",
        "decommissioned", "bases",
    ]

    def model_data(row) -> dict[str, Any]:
        # DigitalTwinsModelData serialization
        # (``Models/DigitalTwinsModelData.cs:9-60``): id + derived
        # fields always present, the raw DTDL under ``model``.
        out: dict[str, Any] = {
            "id": row["id"],
            "model": json.loads(row["model"]),
            "displayName": dict(row["display_name"] or {}),
            "description": dict(row["description"] or {}),
            "bases": list(row["bases"] or []),
            "decommissioned": bool(row["decommissioned"]),
        }
        if row["upload_time"] is not None:
            out["uploadTime"] = row["upload_time"].isoformat()
        return out

    if not dependencies_for:
        return [model_data(r) for r in store.models.select(*cols).collect()]
    docs = _current_docs(store)
    wanted: set[str] = set()

    def visit(mid: str) -> None:
        if mid in wanted or mid not in docs:
            return
        wanted.add(mid)
        d = docs[mid]
        for p in extract_extends(d):
            visit(p)
        for c in extract_components(d):
            visit(c)

    for mid in dependencies_for:
        visit(mid)
    rows = (
        store.models.filter(F.col("id").isin(sorted(wanted))).select(*cols).collect()
    )
    return sorted((model_data(r) for r in rows), key=lambda m: m["id"])


def decommission_model(store: GraphStore, model_id: str) -> GraphStore:
    """Mark decommissioned — new twins of this model are rejected by
    callers that check the flag; existing twins stay."""
    if not store.models.filter(F.col("id") == model_id).take(1):
        raise ModelNotFoundError(f"Model {model_id} not found")
    out = GraphStore(
        spark=store.spark,
        twins=store.twins,
        relationships=store.relationships,
        models=store.models.withColumn(
            "decommissioned",
            F.when(F.col("id") == model_id, F.lit(True)).otherwise(
                F.col("decommissioned")
            ),
        ),
        model_edges=store.model_edges,
        _descendants=store._descendants,
    )
    return out


def delete_model(store: GraphStore, model_id: str) -> tuple[GraphStore, dict[str, Any]]:
    """Delete one model; fails while other models still reference it via
    ``extends`` or components (``Models.cs:566-580`` delete guard)."""
    docs = _current_docs(store)
    if model_id not in docs:
        raise ModelNotFoundError(f"Model {model_id} not found")
    referencing = [
        mid
        for mid, d in docs.items()
        if mid != model_id
        and (model_id in extract_extends(d) or model_id in extract_components(d))
    ]
    if referencing:
        raise ModelReferencedError(
            f"Model {model_id} is still referenced by: {', '.join(sorted(referencing))}"
        )
    old = docs.pop(model_id)
    old.pop("__decommissioned", None)
    return _rebuild(store, docs), old


def delete_all_models(store: GraphStore) -> GraphStore:
    """DETACH DELETE all Model vertices (``Models.cs:630``)."""
    return _rebuild(store, {})


# ----------------------------------------------------------------------
# semantic search (D18, ``Models.cs:864-942``)
# ----------------------------------------------------------------------

def update_model_embedding(
    store: GraphStore, model_id: str, embedding: list[float]
) -> GraphStore:
    """``SET m.embedding = [..]::vector`` equivalent."""
    if not store.models.filter(F.col("id") == model_id).take(1):
        raise ModelNotFoundError(f"Model {model_id} not found")
    vec = F.array(*[F.lit(float(x)) for x in embedding]).cast("array<float>")
    return GraphStore(
        spark=store.spark,
        twins=store.twins,
        relationships=store.relationships,
        models=store.models.withColumn(
            "embedding",
            F.when(F.col("id") == model_id, vec).otherwise(F.col("embedding")),
        ),
        model_edges=store.model_edges,
        _descendants=store._descendants,
    )


def search_models(
    store: GraphStore,
    embedding: list[float] | None = None,
    text: str | None = None,
    limit: int = 10,
) -> list[dict]:
    """Hybrid vector + lexical model search.

    Vector: ``ORDER BY l2_distance(m.embedding, q) ASC LIMIT k``
    (pgvector shape).  Lexical: ``toLower(toString(model)) CONTAINS``
    term (the reference's fallback).  Both given → lexical filter, then
    vector ranking.  The models dim is tiny — this collects; the same
    plan applied to twins-scale data is ``operators.similarity``."""
    df = store.models
    if text is not None:
        df = df.filter(F.lower(F.col("model")).contains(text.lower()))
    if embedding is not None:
        q = F.array(*[F.lit(float(x)) for x in embedding])
        dist = F.sqrt(
            F.aggregate(
                F.zip_with(
                    F.col("embedding").cast("array<double>"),
                    q,
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
        df = (
            df.filter(F.col("embedding").isNotNull())
            .withColumn("__dist", dist)
            .orderBy(F.col("__dist").asc(), F.col("id"))
        )
        rows = df.select("id", "model", F.round("__dist", 6).alias("distance")).take(limit)
        return [
            {"id": r["id"], "model": json.loads(r["model"]), "distance": r["distance"]}
            for r in rows
        ]
    rows = df.select("id", "model").orderBy("id").take(limit)
    return [{"id": r["id"], "model": json.loads(r["model"])} for r in rows]
