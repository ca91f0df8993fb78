"""Permission-based authorization for the HTTP surface.

Re-expresses the reference's authorization subsystem
(``src/AgeDigitalTwins.ServiceDefaults/Authorization/*``) — Azure-
Digital-Twins-style permission strings (``digitaltwins/read``,
``models/*``, ``jobs/imports/cancel/action``) parsed into
(resource, action) pairs, with wildcard grants, claims-based
extraction, and provider composition:

* ``Permission`` / ``ResourceType`` / ``PermissionAction`` —
  ``Models/Permission.cs`` / ``ResourceType.cs`` / ``PermissionAction.cs``
* ``try_parse`` / ``parse`` / ``parse_many`` —
  ``Models/PermissionParser.cs:19-110`` (action is the LAST path
  segment; the resource is everything before it, with
  ``digitaltwins/commands`` folding into DigitalTwins and
  ``jobs/imports/cancel`` into JobsImports)
* ``ClaimsPermissionProvider`` — ``ClaimsPermissionProvider.cs``
  (default claim name ``permissions``, invalid strings skipped,
  duplicates removed, unauthenticated → no permissions)
* ``StaticPermissionProvider`` — the config/API-key shape of
  ``ApiPermissionProvider.cs`` without the external HTTP dependency
* ``CompositePermissionProvider`` — ``CompositePermissionProvider.cs``
  (union across providers; a failing provider is skipped, not fatal)

The HTTP layer (``http_api.ApiService``) attaches a per-route
requirement mirroring each endpoint's ``RequirePermission`` call and
answers 401 (no principal) / 403 (principal without the permission),
the same split ASP.NET's authorization middleware produces.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from typing import Any, Iterable


class ResourceType(Enum):
    QUERY = "query"
    DIGITAL_TWINS = "digitaltwins"
    RELATIONSHIPS = "digitaltwins/relationships"
    MODELS = "models"
    JOBS_IMPORTS = "jobs/imports"
    JOBS_DELETIONS = "jobs/deletions"


class PermissionAction(Enum):
    READ = "read"
    WRITE = "write"
    DELETE = "delete"
    ACTION = "action"
    WILDCARD = "*"


_ACTIONS = {a.value: a for a in PermissionAction}

# resource path (everything before the action segment) → ResourceType;
# commands are twin actions, cancel is a job action
# (PermissionParser.cs:57-66)
_RESOURCES = {
    "query": ResourceType.QUERY,
    "digitaltwins": ResourceType.DIGITAL_TWINS,
    "digitaltwins/relationships": ResourceType.RELATIONSHIPS,
    "digitaltwins/commands": ResourceType.DIGITAL_TWINS,
    "models": ResourceType.MODELS,
    "jobs/imports": ResourceType.JOBS_IMPORTS,
    "jobs/imports/cancel": ResourceType.JOBS_IMPORTS,
    "jobs/deletions": ResourceType.JOBS_DELETIONS,
}


@dataclass(frozen=True)
class Permission:
    resource: ResourceType
    action: PermissionAction

    def __str__(self) -> str:
        return f"{self.resource.value}/{self.action.value}"

    def grants(self, required: "Permission") -> bool:
        """Wildcard grants every action on its resource; otherwise the
        resource AND action must match exactly (``Permission.cs:66-81``
        — a broader action never implies a narrower one)."""
        if self.resource is not required.resource:
            return False
        if self.action is PermissionAction.WILDCARD:
            return True
        return self.action is required.action


def try_parse(permission_string: Any) -> Permission | None:
    """``resource/action`` or ``resource/subresource/action`` →
    Permission, or None on any malformed input (never raises)."""
    if not isinstance(permission_string, str) or not permission_string.strip():
        return None
    parts = [p for p in permission_string.split("/") if p]
    if len(parts) < 2:
        return None
    action = _ACTIONS.get(parts[-1].lower())
    if action is None:
        return None
    resource = _RESOURCES.get("/".join(parts[:-1]).lower())
    if resource is None:
        return None
    return Permission(resource, action)


def parse(permission_string: str) -> Permission:
    perm = try_parse(permission_string)
    if perm is None:
        raise ValueError(
            f"Invalid permission format: {permission_string!r}. "
            "Expected 'resource/action' (e.g. 'digitaltwins/read')."
        )
    return perm


def parse_many(permission_strings: Iterable[Any]) -> list[Permission]:
    """Parse a collection, silently skipping invalid entries and
    duplicates (order of first appearance preserved)."""
    out: list[Permission] = []
    seen: set[Permission] = set()
    for s in permission_strings:
        p = try_parse(s)
        if p is not None and p not in seen:
            seen.add(p)
            out.append(p)
    return out


# ----------------------------------------------------------------------
# providers
# ----------------------------------------------------------------------


class ClaimsPermissionProvider:
    """Extract permissions from a claims dict (the JWT-claims shape):
    the configured claim holds one permission string or a list of them.
    ``None`` claims (unauthenticated) → no permissions."""

    def __init__(self, claim_name: str = "permissions"):
        self.claim_name = claim_name

    def get_permissions(self, claims: dict[str, Any] | None) -> list[Permission]:
        if not claims:
            return []
        raw = claims.get(self.claim_name)
        if raw is None:
            return []
        values = raw if isinstance(raw, (list, tuple)) else [raw]
        return parse_many(values)


class StaticPermissionProvider:
    """Principal-name → permission-strings mapping (the config-driven
    shape of the reference's external-API provider, without the HTTP
    dependency).  The principal is read from the ``sub`` claim."""

    def __init__(self, grants: dict[str, list[str]], subject_claim: str = "sub"):
        self.grants = grants
        self.subject_claim = subject_claim

    def get_permissions(self, claims: dict[str, Any] | None) -> list[Permission]:
        if not claims:
            return []
        subject = claims.get(self.subject_claim)
        if not isinstance(subject, str):
            return []
        return parse_many(self.grants.get(subject, []))


class CompositePermissionProvider:
    """Union of permissions across providers; a provider that raises is
    skipped so one broken source cannot lock out the whole service
    (``CompositePermissionProvider.cs:26-55``)."""

    def __init__(self, providers: Iterable[Any]):
        self.providers = list(providers)

    def get_permissions(self, claims: dict[str, Any] | None) -> list[Permission]:
        out: list[Permission] = []
        seen: set[Permission] = set()
        for provider in self.providers:
            try:
                perms = provider.get_permissions(claims)
            except Exception:  # noqa: BLE001 — provider failure is non-fatal
                continue
            for p in perms:
                if p not in seen:
                    seen.add(p)
                    out.append(p)
        return out


@dataclass
class AuthorizationConfig:
    """Service-level switch + provider, mirroring
    ``AuthorizationOptions`` (enabled by default when constructed)."""

    provider: Any
    enabled: bool = True

    def check(
        self, claims: dict[str, Any] | None, required: Permission | None
    ) -> int | None:
        """None = allowed; otherwise the HTTP status to answer with
        (401 for no principal, 403 for a principal lacking the
        permission — the ASP.NET challenge/forbid split)."""
        if not self.enabled or required is None:
            return None
        if claims is None:
            return 401
        perms = self.provider.get_permissions(claims)
        if any(p.grants(required) for p in perms):
            return None
        return 403
