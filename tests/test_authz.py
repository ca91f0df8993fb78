"""Authorization parity (ServiceDefaults/Authorization): permission
string parsing, wildcard grants, claims extraction, provider
composition, and HTTP-route enforcement — modeled on the reference's
``PermissionParserTests`` / ``PermissionTests`` /
``ClaimsPermissionProviderTests`` matrices."""

import pytest

from pg_age_digitaltwins_spark import authz
from pg_age_digitaltwins_spark.authz import (
    AuthorizationConfig,
    ClaimsPermissionProvider,
    CompositePermissionProvider,
    Permission,
    PermissionAction,
    ResourceType,
    StaticPermissionProvider,
    parse,
    parse_many,
    try_parse,
)

R, A = ResourceType, PermissionAction


# ----------------------------------------------------------------------
# PermissionParserTests matrix
# ----------------------------------------------------------------------

@pytest.mark.parametrize("s,resource,action", [
    ("digitaltwins/read", R.DIGITAL_TWINS, A.READ),
    ("digitaltwins/write", R.DIGITAL_TWINS, A.WRITE),
    ("digitaltwins/delete", R.DIGITAL_TWINS, A.DELETE),
    ("digitaltwins/*", R.DIGITAL_TWINS, A.WILDCARD),
    ("digitaltwins/relationships/read", R.RELATIONSHIPS, A.READ),
    ("digitaltwins/relationships/write", R.RELATIONSHIPS, A.WRITE),
    ("digitaltwins/relationships/delete", R.RELATIONSHIPS, A.DELETE),
    ("models/read", R.MODELS, A.READ),
    ("models/write", R.MODELS, A.WRITE),
    ("models/delete", R.MODELS, A.DELETE),
    ("query/action", R.QUERY, A.ACTION),
    ("jobs/imports/read", R.JOBS_IMPORTS, A.READ),
    ("jobs/imports/write", R.JOBS_IMPORTS, A.WRITE),
    ("jobs/imports/delete", R.JOBS_IMPORTS, A.DELETE),
    # cancel is a job action; commands are twin actions
    ("jobs/imports/cancel/action", R.JOBS_IMPORTS, A.ACTION),
    ("digitaltwins/commands/action", R.DIGITAL_TWINS, A.ACTION),
])
def test_parse_valid(s, resource, action):
    p = try_parse(s)
    assert p is not None
    assert p.resource is resource and p.action is action


@pytest.mark.parametrize("s", [
    "", "   ", None, "invalid", "unknown/read", "digitaltwins/unknown",
    "read", "/", 42,
])
def test_parse_invalid(s):
    assert try_parse(s) is None


def test_parse_case_insensitive_and_empty_segments():
    # case-folded like the reference's ToLowerInvariant; empty path
    # segments are removed before splitting
    assert try_parse("DigitalTwins/Read") == Permission(R.DIGITAL_TWINS, A.READ)
    assert try_parse("digitaltwins//read") == Permission(R.DIGITAL_TWINS, A.READ)


def test_parse_raises_with_format_hint():
    with pytest.raises(ValueError, match="Invalid permission format"):
        parse("nope")
    assert parse("models/*") == Permission(R.MODELS, A.WILDCARD)


def test_parse_many_skips_invalid_and_dedups():
    out = parse_many([
        "digitaltwins/read", "bogus", "digitaltwins/read", "models/write", None,
    ])
    assert out == [
        Permission(R.DIGITAL_TWINS, A.READ), Permission(R.MODELS, A.WRITE),
    ]


# ----------------------------------------------------------------------
# PermissionTests: ToString / Grants / equality
# ----------------------------------------------------------------------

def test_to_string_round_trips():
    for s in ("digitaltwins/read", "digitaltwins/relationships/write",
              "models/*", "jobs/imports/action", "query/action"):
        assert str(parse(s)) == s


def test_grants_semantics():
    read = Permission(R.DIGITAL_TWINS, A.READ)
    write = Permission(R.DIGITAL_TWINS, A.WRITE)
    wild = Permission(R.DIGITAL_TWINS, A.WILDCARD)
    assert read.grants(read)                       # exact match
    assert wild.grants(read) and wild.grants(write)  # wildcard
    assert not Permission(R.MODELS, A.READ).grants(read)  # other resource
    assert not read.grants(write)                  # other action
    # twins wildcard does NOT cover the relationships sub-resource
    assert not wild.grants(Permission(R.RELATIONSHIPS, A.READ))


def test_equality_and_hash():
    a = Permission(R.QUERY, A.ACTION)
    b = Permission(R.QUERY, A.ACTION)
    assert a == b and hash(a) == hash(b)
    assert a != Permission(R.QUERY, A.READ)


# ----------------------------------------------------------------------
# providers
# ----------------------------------------------------------------------

def test_claims_provider():
    p = ClaimsPermissionProvider()
    assert p.get_permissions(None) == []
    assert p.get_permissions({}) == []
    assert p.get_permissions({"sub": "u"}) == []
    assert p.get_permissions({"permissions": "models/read"}) == [
        Permission(R.MODELS, A.READ)
    ]
    out = p.get_permissions(
        {"permissions": ["digitaltwins/read", "junk", "digitaltwins/read"]}
    )
    assert out == [Permission(R.DIGITAL_TWINS, A.READ)]
    # configurable claim name
    alt = ClaimsPermissionProvider(claim_name="scp")
    assert alt.get_permissions({"scp": ["query/action"]}) == [
        Permission(R.QUERY, A.ACTION)
    ]


def test_static_provider_keyed_by_subject():
    p = StaticPermissionProvider({"svc-a": ["models/*"], "svc-b": []})
    assert p.get_permissions({"sub": "svc-a"}) == [Permission(R.MODELS, A.WILDCARD)]
    assert p.get_permissions({"sub": "svc-b"}) == []
    assert p.get_permissions({"sub": "unknown"}) == []
    assert p.get_permissions(None) == []


def test_composite_provider_unions_and_survives_failure():
    class _Boom:
        def get_permissions(self, claims):
            raise RuntimeError("provider down")

    c = CompositePermissionProvider([
        ClaimsPermissionProvider(),
        _Boom(),
        StaticPermissionProvider({"u": ["models/read", "digitaltwins/read"]}),
    ])
    out = c.get_permissions({"sub": "u", "permissions": ["digitaltwins/read"]})
    assert out == [
        Permission(R.DIGITAL_TWINS, A.READ), Permission(R.MODELS, A.READ),
    ]


# ----------------------------------------------------------------------
# HTTP enforcement (the RequirePermission surface)
# ----------------------------------------------------------------------

@pytest.fixture(scope="module")
def authed_api(spark):
    from pg_age_digitaltwins_spark.client import DigitalTwinsSparkClient
    from pg_age_digitaltwins_spark.http_api import ApiService
    from pg_age_digitaltwins_spark.store.graph_store import GraphStore

    model = {
        "@id": "dtmi:az:T;1", "@type": "Interface",
        "@context": "dtmi:dtdl:context;3",
        "contents": [{"@type": "Property", "name": "x", "schema": "double"}],
    }
    client = DigitalTwinsSparkClient(GraphStore.empty(spark).with_models([model]))
    client.create_or_replace_digital_twin(
        "t1", {"$metadata": {"$model": "dtmi:az:T;1"}, "x": 1.0}
    )
    return ApiService(
        client,
        authorization=AuthorizationConfig(provider=ClaimsPermissionProvider()),
    )


def _claims(*perms):
    return {"sub": "tester", "permissions": list(perms)}


def test_http_anonymous_is_401_health_is_open(authed_api):
    from pg_age_digitaltwins_spark.http_api import Request

    assert authed_api.handle(Request("GET", "/digitaltwins/t1")).status == 401
    # health endpoint stays anonymous (mapped outside the authorized group)
    assert authed_api.handle(Request("GET", "/health")).status == 200


def test_http_missing_permission_is_403_with_detail(authed_api):
    from pg_age_digitaltwins_spark.http_api import Request

    resp = authed_api.handle(
        Request("GET", "/digitaltwins/t1", claims=_claims("models/read"))
    )
    assert resp.status == 403
    assert "digitaltwins/read" in resp.body["detail"]


def test_http_read_write_delete_split(authed_api):
    from pg_age_digitaltwins_spark.http_api import Request

    read = _claims("digitaltwins/read")
    assert authed_api.handle(Request("GET", "/digitaltwins/t1", claims=read)).status == 200
    # read does not grant write or delete
    assert authed_api.handle(Request(
        "PUT", "/digitaltwins/t2", claims=read,
        body={"$metadata": {"$model": "dtmi:az:T;1"}, "x": 2.0},
    )).status == 403
    assert authed_api.handle(
        Request("DELETE", "/digitaltwins/t1", claims=read)
    ).status == 403
    # wildcard grants all three on the resource
    wild = _claims("digitaltwins/*")
    assert authed_api.handle(Request(
        "PUT", "/digitaltwins/t2", claims=wild,
        body={"$metadata": {"$model": "dtmi:az:T;1"}, "x": 2.0},
    )).status == 200
    assert authed_api.handle(
        Request("DELETE", "/digitaltwins/t2", claims=wild)
    ).status == 204


def test_http_relationships_are_a_distinct_resource(authed_api):
    from pg_age_digitaltwins_spark.http_api import Request

    # digitaltwins/* does NOT cover the relationships sub-resource
    assert authed_api.handle(Request(
        "GET", "/digitaltwins/t1/relationships", claims=_claims("digitaltwins/*"),
    )).status == 403
    assert authed_api.handle(Request(
        "GET", "/digitaltwins/t1/relationships",
        claims=_claims("digitaltwins/relationships/read"),
    )).status == 200


def test_http_query_requires_query_action(authed_api):
    from pg_age_digitaltwins_spark.http_api import Request

    body = {"query": "SELECT COUNT() FROM DIGITALTWINS"}
    assert authed_api.handle(Request(
        "POST", "/query", body=body, claims=_claims("digitaltwins/read"),
    )).status == 403
    ok = authed_api.handle(Request(
        "POST", "/query", body=body, claims=_claims("query/action"),
    ))
    assert ok.status == 200 and ok.body["value"] == [{"count": 1}]


def test_http_models_and_jobs_requirements(authed_api):
    from pg_age_digitaltwins_spark.http_api import Request

    assert authed_api.handle(Request("GET", "/models", claims=_claims())).status == 403
    assert authed_api.handle(
        Request("GET", "/models", claims=_claims("models/read"))
    ).status == 200
    assert authed_api.handle(
        Request("GET", "/jobs/imports", claims=_claims("models/*"))
    ).status == 403
    assert authed_api.handle(
        Request("GET", "/jobs/imports", claims=_claims("jobs/imports/read"))
    ).status == 200


def test_http_disabled_config_allows_everything(spark):
    from pg_age_digitaltwins_spark.client import DigitalTwinsSparkClient
    from pg_age_digitaltwins_spark.http_api import ApiService, Request
    from pg_age_digitaltwins_spark.store.graph_store import GraphStore

    api = ApiService(
        DigitalTwinsSparkClient(GraphStore.empty(spark)),
        authorization=AuthorizationConfig(
            provider=ClaimsPermissionProvider(), enabled=False
        ),
    )
    # anonymous query allowed when authorization is switched off
    resp = api.handle(Request(
        "POST", "/query", body={"query": "SELECT COUNT() FROM DIGITALTWINS"}
    ))
    assert resp.status == 200


# ----------------------------------------------------------------------
# ApiPermissionProvider (external authorization API + caching,
# ApiPermissionProviderTests.cs)
# ----------------------------------------------------------------------


class _FakePermissionsApi:
    """In-process stand-in for the authorization API: records calls,
    returns a configurable token and permission list."""

    def __init__(self, permissions, fail=False, token="tok-1", expires_in=3600):
        self.permissions = permissions
        self.fail = fail
        self.token = token
        self.expires_in = expires_in
        self.token_calls = 0
        self.check_calls = []

    def http(self, method, url, headers=None, body=None):
        import json

        if "/oauth/token" in url:
            self.token_calls += 1
            return 200, json.dumps(
                {"access_token": self.token, "expires_in": self.expires_in}
            ).encode()
        self.check_calls.append((url, (headers or {}).get("Authorization")))
        if self.fail:
            return 500, b"boom"
        return 200, json.dumps({"permissions": self.permissions}).encode()


def _api_provider(fake, clock, **opt_over):
    from pg_age_digitaltwins_spark.authz import ApiPermissionProvider, ApiProviderOptions

    opts = ApiProviderOptions(
        base_url="http://perm.local",
        token_endpoint="http://auth.local/oauth/token",
        client_id="cid", client_secret="secret", audience="aud",
        **opt_over,
    )
    p = ApiPermissionProvider(opts, clock=lambda: clock[0])
    p._http = fake.http
    return p


def test_api_provider_fetches_caches_and_expires():
    fake = _FakePermissionsApi(["digitaltwins/read", "models/*"])
    clock = [1000.0]
    p = _api_provider(fake, clock)
    claims = {"sub": "user-1"}
    perms = p.get_permissions(claims)
    assert [str(x) for x in perms] == ["digitaltwins/read", "models/*"]
    # bearer token attached, M2M token fetched once
    assert fake.check_calls[0][1] == "Bearer tok-1"
    # cache hit: no second API call within the TTL
    p.get_permissions(claims)
    assert len(fake.check_calls) == 1
    # after the 5-minute TTL the API is called again, token reused
    clock[0] += 301
    p.get_permissions(claims)
    assert len(fake.check_calls) == 2
    assert fake.token_calls == 1


def test_api_provider_unauthenticated_and_failures_return_empty():
    fake = _FakePermissionsApi(["digitaltwins/read"], fail=True)
    clock = [0.0]
    p = _api_provider(fake, clock)
    assert p.get_permissions(None) == []
    assert p.get_permissions({"iss": "x"}) == []   # no resolvable user id
    assert p.get_permissions({"sub": "u"}) == []   # API 500 → fail closed
    # failures are NOT cached: a later healthy call succeeds
    fake.fail = False
    assert [str(x) for x in p.get_permissions({"sub": "u"})] == ["digitaltwins/read"]


def test_api_provider_endpoint_placeholders_and_query_fallback():
    fake = _FakePermissionsApi([])
    clock = [0.0]
    p = _api_provider(
        fake, clock,
        check_endpoint="/check/{resourceName}/users/{userId}",
    )
    p.get_permissions({"sub": "u/1"})
    assert fake.check_calls[0][0] == "http://perm.local/check/digitaltwins/users/u%2F1"
    fake2 = _FakePermissionsApi([])
    p2 = _api_provider(fake2, clock)
    p2.get_permissions({"sub": "u"})
    assert (
        fake2.check_calls[0][0]
        == "http://perm.local/api/v1/permissions/check"
        "?scopeType=resource&scopeId=digitaltwins&userId=u"
    )


def test_api_provider_nameidentifier_precedence():
    fake = _FakePermissionsApi([])
    clock = [0.0]
    p = _api_provider(fake, clock)
    from pg_age_digitaltwins_spark.authz import ApiPermissionProvider

    p.get_permissions({ApiPermissionProvider.NAME_IDENTIFIER: "nid", "sub": "s"})
    assert "userId=nid" in fake.check_calls[0][0]


def test_api_provider_cache_is_bounded():
    """The per-user permission cache evicts expired entries instead of
    holding one entry per distinct principal forever."""
    fake = _FakePermissionsApi(["digitaltwins/read"])
    clock = [0.0]
    p = _api_provider(fake, clock)
    for i in range(1024):
        p.get_permissions({"sub": f"u{i}"})
    assert len(p._perm_cache) == 1024
    clock[0] += 301  # everything expired
    p.get_permissions({"sub": "fresh"})
    assert len(p._perm_cache) == 1  # dead entries evicted on insert


def test_api_provider_cache_hard_cap_with_live_entries():
    """>=1024 distinct LIVE principals inside one TTL window: the expiry
    sweep removes nothing, so a hard cap must evict soonest-expiring
    entries instead of growing one entry per authenticated subject."""
    fake = _FakePermissionsApi(["digitaltwins/read"])
    clock = [0.0]
    p = _api_provider(fake, clock)
    for i in range(1024):
        clock[0] += 0.001  # distinct expiries, all within the TTL
        p.get_permissions({"sub": f"live{i}"})
    assert len(p._perm_cache) == 1024
    p.get_permissions({"sub": "one-more"})  # nothing expired
    assert len(p._perm_cache) <= 1024
    assert "one-more" in p._perm_cache
    assert "live0" not in p._perm_cache  # soonest-expiring evicted first
