"""DTDL model-inheritance closure.

The reference materializes, on every model, the full transitive set of
ancestors (``bases``) and subtypes (``descendants``) at model-create time
(``src/AgeDigitalTwins/AgeDigitalTwins Client.Models.cs:263-324``), so that
``IS_OF_MODEL(twin, m)`` becomes an O(1) membership test
(``src/AgeDigitalTwins/GraphInitialization.cs:50-121``).

We reproduce the same idea: the model set is tiny (thousands at most,
vs billions of twins), so the closure is computed driver-side in plain
Python and the result is broadcast.  ``IS_OF_MODEL(m)`` then compiles to
``twin.model_id IN <literal list>`` — a predicate Catalyst can push into
the Parquet scan and use for partition pruning, which is the right shape
at 100 TB (no join at all, just pruning).
"""

from __future__ import annotations

import json
from typing import Any, Iterable


def extract_extends(dtdl: dict[str, Any]) -> list[str]:
    """Parent model ids from a DTDL Interface's ``extends`` clause.

    DTDL v2-v4 allow ``extends`` to be a single DTMI string or a list.
    """
    ext = dtdl.get("extends")
    if ext is None:
        return []
    if isinstance(ext, str):
        return [ext]
    return [e for e in ext if isinstance(e, str)]


def extract_components(dtdl: dict[str, Any]) -> list[str]:
    """Component schema model ids from a DTDL Interface's contents."""
    out: list[str] = []
    for item in dtdl.get("contents", []) or []:
        types = item.get("@type")
        types = [types] if isinstance(types, str) else (types or [])
        if "Component" in types and isinstance(item.get("schema"), str):
            out.append(item["schema"])
    return out


def compute_closure(
    parents_by_id: dict[str, list[str]],
) -> tuple[dict[str, list[str]], dict[str, list[str]]]:
    """Transitive ``bases`` (ancestors) and ``descendants`` per model id.

    Deterministic output order (sorted) so results are stable across runs.
    Cycles are tolerated (a node never lists itself).
    """
    bases: dict[str, list[str]] = {}

    def walk_up(mid: str, seen: set[str]) -> set[str]:
        out: set[str] = set()
        for p in parents_by_id.get(mid, []):
            if p in seen:
                continue
            out.add(p)
            out |= walk_up(p, seen | {p})
        return out

    for mid in parents_by_id:
        bases[mid] = sorted(walk_up(mid, {mid}))

    descendants: dict[str, set[str]] = {mid: set() for mid in parents_by_id}
    for mid, ancestors in bases.items():
        for a in ancestors:
            if a in descendants:
                descendants[a].add(mid)
            else:
                descendants[a] = {mid}
    return bases, {k: sorted(v) for k, v in descendants.items()}


def closure_from_dtdl(models: Iterable[dict[str, Any] | str]):
    """Parse DTDL docs → (parsed_docs, bases, descendants, edges).

    ``edges`` is a list of (src, dst, kind) with kind in
    {``_extends``, ``_hasComponent``} mirroring the reference's
    model-graph edges (``GraphInitialization.cs:31-41``).
    """
    docs: list[dict[str, Any]] = []
    for m in models:
        docs.append(json.loads(m) if isinstance(m, str) else m)
    parents = {d["@id"]: extract_extends(d) for d in docs}
    bases, descendants = compute_closure(parents)
    edges: list[tuple[str, str, str]] = []
    for d in docs:
        for p in extract_extends(d):
            edges.append((d["@id"], p, "_extends"))
        for c in extract_components(d):
            edges.append((d["@id"], c, "_hasComponent"))
    return docs, bases, descendants, edges
