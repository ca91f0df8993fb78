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


# ----------------------------------------------------------------------
# external-API provider (ApiPermissionProvider.cs)
# ----------------------------------------------------------------------


@dataclass
class ApiProviderOptions:
    """``AuthorizationOptions.ApiProvider`` shape: where to fetch
    permissions and how to authenticate the service-to-service call
    (client-credentials grant)."""

    base_url: str
    check_endpoint: str = "/api/v1/permissions/check"
    token_endpoint: str = ""
    client_id: str = ""
    client_secret: str = ""
    audience: str = ""
    resource_name: str = "digitaltwins"
    cache_expiration_minutes: float = 5.0


class ApiPermissionProvider:
    """Permissions fetched from an external authorization API with a
    per-user TTL cache and a cached M2M access token
    (``ApiPermissionProvider.cs``):

    * unauthenticated / no resolvable user id → no permissions;
    * user id = NameIdentifier claim > ``sub`` > ``name`` — the
      provider's OWN precedence (``ApiPermissionProvider.cs:119-122``
      falls back to ``Identity.Name``, one step beyond
      ``RequestHelper.ParseUserId``'s two claims);
    * ``{userId}`` / ``{resourceName}`` placeholders in the check
      endpoint are substituted, otherwise the legacy
      ``?scopeType=resource&scopeId=…&userId=…`` query is appended;
    * the M2M token comes from a ``client_credentials`` form POST to
      the token endpoint, cached until 30 s before expiry and reused
      while >60 s of validity remain;
    * ANY failure (HTTP error, bad JSON, missing fields) → empty
      permissions — an authz outage must fail closed, not 500.
    """

    NAME_IDENTIFIER = (
        "http://schemas.xmlsoap.org/ws/2005/05/identity/claims/nameidentifier"
    )

    def __init__(self, options: ApiProviderOptions, clock=None):
        import time as _time

        self.options = options
        self.clock = clock or _time.time
        self._perm_cache: dict[str, tuple[float, list[Permission]]] = {}
        self._token: tuple[str, float] | None = None  # (token, expires_at)

    # -- HTTP plumbing (stdlib; overridable in tests) ------------------
    def _http(self, method: str, url: str, headers=None, body: bytes | None = None):
        import urllib.request

        req = urllib.request.Request(
            url, data=body, headers=headers or {}, method=method
        )
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status, resp.read()

    def _access_token(self) -> str:
        now = self.clock()
        if self._token is not None and self._token[1] > now + 60:
            return self._token[0]
        o = self.options
        if not (o.token_endpoint and o.client_id and o.client_secret and o.audience):
            raise RuntimeError("API provider client credentials configuration is missing")
        from urllib.parse import urlencode

        body = urlencode(
            {
                "grant_type": "client_credentials",
                "client_id": o.client_id,
                "client_secret": o.client_secret,
                "audience": o.audience,
            }
        ).encode()
        status, payload = self._http(
            "POST",
            o.token_endpoint if "://" in o.token_endpoint else o.base_url + o.token_endpoint,
            {"Content-Type": "application/x-www-form-urlencoded"},
            body,
        )
        if status != 200:
            raise RuntimeError(f"token endpoint returned {status}")
        import json as _json

        doc = _json.loads(payload)
        token = doc["access_token"]
        expires_in = int(doc.get("expires_in", 3600))
        self._token = (token, now + expires_in - 30)
        return token

    def _user_id(self, claims: dict[str, Any]) -> str | None:
        for key in (self.NAME_IDENTIFIER, "sub", "name"):
            val = claims.get(key)
            if isinstance(val, list):
                val = val[0] if val else None
            if isinstance(val, str) and val:
                return val
        return None

    def get_permissions(self, claims: dict[str, Any] | None) -> list[Permission]:
        if not claims:
            return []
        user_id = self._user_id(claims)
        if not user_id:
            return []
        now = self.clock()
        cached = self._perm_cache.get(user_id)
        if cached is not None and cached[0] > now:
            return cached[1]
        try:
            from urllib.parse import quote

            o = self.options
            ep = o.check_endpoint
            if "{userId}" in ep or "{resourceName}" in ep:
                ep = ep.replace("{userId}", quote(user_id, safe="")).replace(
                    "{resourceName}", quote(o.resource_name, safe="")
                )
            else:
                ep = (
                    f"{ep}?scopeType=resource&scopeId={o.resource_name}"
                    f"&userId={quote(user_id, safe='')}"
                )
            token = self._access_token()
            status, payload = self._http(
                "GET", o.base_url + ep, {"Authorization": f"Bearer {token}"}
            )
            if status != 200:
                raise RuntimeError(f"permissions API returned {status}")
            import json as _json

            strings = [
                s
                for s in _json.loads(payload)["permissions"]
                if isinstance(s, str) and s
            ]
            perms = parse_many(strings)
            # evict dead entries before inserting so the cache is
            # bounded by ACTIVE users within one TTL, not by every
            # distinct principal ever seen (the reference's MemoryCache
            # evicts on expiry)
            if len(self._perm_cache) >= 1024:
                self._perm_cache = {
                    uid: entry
                    for uid, entry in self._perm_cache.items()
                    if entry[0] > now
                }
                # Expiry sweep alone is unbounded when >=1024 principals
                # are live inside one TTL window — enforce a hard cap by
                # evicting the soonest-expiring entries (closest to the
                # MemoryCache size-limit behavior available here).
                if len(self._perm_cache) >= 1024:
                    keep = sorted(
                        self._perm_cache.items(),
                        key=lambda kv: kv[1][0],
                        reverse=True,
                    )[:1023]
                    self._perm_cache = dict(keep)
            self._perm_cache[user_id] = (
                now + self.options.cache_expiration_minutes * 60.0,
                perms,
            )
            return perms
        except Exception:  # noqa: BLE001 — authz outage fails closed
            return []
