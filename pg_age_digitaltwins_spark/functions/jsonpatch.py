"""RFC-6902 JSON Patch: apply + diff.

The reference uses `Json.Patch` (C#) for twin updates
(``src/AgeDigitalTwins/AgeDigitalTwins.DigitalTwins.cs:558-758``) and for
update change events (``OldValue.CreatePatch(NewValue)`` in
``src/AgeDigitalTwins.Events/Core/Events/CloudEventFactory.cs:81-129``).
This is a from-scratch Python implementation of the same RFC — no
third-party dependency (jsonpatch isn't in the container).

``make_patch`` mirrors JsonPatch.Net's ``CreatePatch`` shape: deep
recursion into objects producing ``add``/``remove``/``replace`` ops with
JSON-Pointer paths; arrays are replaced wholesale when they differ in a
non-suffix way (element-wise replace + add/remove tail, which is what
the .NET library emits for simple list edits).
"""

from __future__ import annotations

import copy
from typing import Any

__all__ = ["apply_patch", "make_patch", "JsonPatchError"]


class JsonPatchError(ValueError):
    pass


# ----------------------------------------------------------------------
# JSON Pointer (RFC 6901)
# ----------------------------------------------------------------------

def _unescape(token: str) -> str:
    return token.replace("~1", "/").replace("~0", "~")


def escape_pointer(token: str) -> str:
    return token.replace("~", "~0").replace("/", "~1")


def split_pointer(pointer: str) -> list[str]:
    if pointer == "":
        return []
    if not pointer.startswith("/"):
        raise JsonPatchError(f"Invalid JSON pointer {pointer!r}")
    return [_unescape(t) for t in pointer.split("/")[1:]]


def _walk(doc: Any, tokens: list[str]) -> Any:
    cur = doc
    for t in tokens:
        if isinstance(cur, dict):
            if t not in cur:
                raise JsonPatchError(f"Path token {t!r} not found")
            cur = cur[t]
        elif isinstance(cur, list):
            try:
                cur = cur[int(t)]
            except (ValueError, IndexError) as exc:
                raise JsonPatchError(f"Bad array index {t!r}") from exc
        else:
            raise JsonPatchError(f"Cannot traverse into non-container at {t!r}")
    return cur


def get_pointer(doc: Any, pointer: str) -> Any:
    return _walk(doc, split_pointer(pointer))


# ----------------------------------------------------------------------
# apply
# ----------------------------------------------------------------------

def _parent_and_key(doc: Any, pointer: str) -> tuple[Any, str]:
    tokens = split_pointer(pointer)
    if not tokens:
        raise JsonPatchError("Operation on document root not supported here")
    return _walk(doc, tokens[:-1]), tokens[-1]


def _op_add(doc, path, value):
    parent, key = _parent_and_key(doc, path)
    if isinstance(parent, list):
        idx = len(parent) if key == "-" else int(key)
        if idx < 0 or idx > len(parent):
            raise JsonPatchError(f"add index {key} out of range")
        parent.insert(idx, value)
    elif isinstance(parent, dict):
        parent[key] = value
    else:
        raise JsonPatchError("add target is not a container")


def _op_remove(doc, path):
    parent, key = _parent_and_key(doc, path)
    if isinstance(parent, list):
        idx = int(key)
        if idx < 0 or idx >= len(parent):
            raise JsonPatchError(f"remove index {key} out of range")
        parent.pop(idx)
    elif isinstance(parent, dict):
        if key not in parent:
            raise JsonPatchError(f"remove: {path!r} not found")
        del parent[key]
    else:
        raise JsonPatchError("remove target is not a container")


def apply_patch(doc: Any, ops: list[dict[str, Any]]) -> Any:
    """Apply an RFC-6902 op list; returns a new document (input not
    mutated).  Supports add/remove/replace/move/copy/test."""
    out = copy.deepcopy(doc)
    for i, op in enumerate(ops):
        try:
            kind = op["op"]
            path = op["path"]
        except KeyError as exc:
            raise JsonPatchError(f"op #{i}: missing {exc}") from exc
        if kind == "add":
            _op_add(out, path, copy.deepcopy(op["value"]))
        elif kind == "remove":
            _op_remove(out, path)
        elif kind == "replace":
            # RFC: target must exist
            get_pointer(out, path)
            _op_remove(out, path)
            _op_add(out, path, copy.deepcopy(op["value"]))
        elif kind == "move":
            val = get_pointer(out, op["from"])
            _op_remove(out, op["from"])
            _op_add(out, path, val)
        elif kind == "copy":
            val = copy.deepcopy(get_pointer(out, op["from"]))
            _op_add(out, path, val)
        elif kind == "test":
            if get_pointer(out, path) != op["value"]:
                raise JsonPatchError(f"test failed at {path!r}")
        else:
            raise JsonPatchError(f"Unknown op {kind!r}")
    return out


# ----------------------------------------------------------------------
# diff
# ----------------------------------------------------------------------

def make_patch(old: Any, new: Any, pointer: str = "") -> list[dict[str, Any]]:
    """Minimal-ish RFC-6902 diff old → new (deep for dicts, element-wise
    for lists), the same shape the reference embeds in Update
    EventNotification events."""
    if type(old) is not type(new) or not isinstance(old, (dict, list)):
        if old != new or type(old) is not type(new):
            return [{"op": "replace", "path": pointer, "value": new}]
        return []
    ops: list[dict[str, Any]] = []
    if isinstance(old, dict):
        for k in old:
            p = f"{pointer}/{escape_pointer(k)}"
            if k not in new:
                ops.append({"op": "remove", "path": p})
            else:
                ops.extend(make_patch(old[k], new[k], p))
        for k in new:
            if k not in old:
                ops.append(
                    {"op": "add", "path": f"{pointer}/{escape_pointer(k)}", "value": new[k]}
                )
    else:  # list
        n = min(len(old), len(new))
        for i in range(n):
            ops.extend(make_patch(old[i], new[i], f"{pointer}/{i}"))
        for i in range(len(old) - 1, n - 1, -1):
            ops.append({"op": "remove", "path": f"{pointer}/{i}"})
        for i in range(n, len(new)):
            ops.append({"op": "add", "path": f"{pointer}/{i}", "value": new[i]})
    return ops
