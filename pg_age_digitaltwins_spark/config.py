"""Service configuration binding — the reference's ``Parameters``
section (``RateLimitingConfiguration.cs``, ``DatabaseProtectionMiddleware.cs:145-153``,
``docs/advanced-topics/performance.mdx``).

The reference binds appsettings.json's ``Parameters`` section through
.NET configuration, which also honors environment-variable overrides
spelled ``Parameters__<SettingName>`` (double underscore = section
separator).  ``Parameters.load`` reproduces that precedence: code
defaults < explicit settings dict (the appsettings stand-in) < env.
"""

from __future__ import annotations

import os
from typing import Any, Mapping

# Defaults exactly as the reference code declares them (GetValue(...)
# fallbacks in RateLimitingConfiguration.cs and the property
# initializers in DatabaseProtectionOptions) — the performance.mdx
# appsettings block shows EXAMPLE overrides, not defaults.
_DEFAULTS: dict[str, int] = {
    # rate limiting tiers (per-second fixed windows except admin)
    "GlobalPermitLimit": 1000,
    "GlobalWindowSeconds": 1,
    "GlobalQueueLimit": 200,
    "LightOperationsPermitLimit": 100,
    "LightOperationsWindowSeconds": 1,
    "LightOperationsQueueLimit": 50,
    "MediumOperationsPermitLimit": 50,
    "MediumOperationsWindowSeconds": 1,
    "MediumOperationsQueueLimit": 25,
    "HeavyOperationsPermitLimit": 20,
    "HeavyOperationsWindowSeconds": 1,
    "HeavyOperationsQueueLimit": 10,
    "AdminOperationsPermitLimit": 50,
    "AdminOperationsWindowMinutes": 1,
    "AdminOperationsQueueLimit": 25,
    # weighted /query token bucket (WeightedQueryRateLimitingMiddleware)
    "WeightedQueryTokenLimit": 1000,
    "WeightedQueryTokensPerPeriod": 100,
    "WeightedQueryQueueLimit": 100,
    # database protection (DatabaseProtectionOptions defaults)
    "MaxConcurrentRequestsPerUser": 20,
    "MaxQueryComplexityPerWindow": 1000,
    "BaseQueryComplexity": 10,
    "SlowRequestThresholdMs": 5000,
    "MetricsRetentionMinutes": 10,
    "QueryComplexityWindowMinutes": 1,
}

_ENV_PREFIX = "Parameters__"


class Parameters:
    """Immutable view of the resolved ``Parameters`` section; unknown
    names raise AttributeError at access (typos fail fast, like a
    missing options property in the reference)."""

    def __init__(self, values: Mapping[str, int]):
        self._values = dict(values)

    def __getattr__(self, name: str) -> int:
        try:
            return self._values[name]
        except KeyError:
            raise AttributeError(f"unknown parameter {name!r}") from None

    def as_dict(self) -> dict[str, int]:
        return dict(self._values)

    @classmethod
    def load(
        cls,
        settings: Mapping[str, Any] | None = None,
        env: Mapping[str, str] | None = None,
    ) -> "Parameters":
        """defaults < ``settings`` (the appsettings.json stand-in) <
        ``env`` entries spelled ``Parameters__<SettingName>``.  Unknown
        setting names are rejected (the reference silently ignores
        them, but a typo'd limit silently falling back to default is
        exactly the failure mode worth catching)."""
        values = dict(_DEFAULTS)
        for k, v in (settings or {}).items():
            if k not in _DEFAULTS:
                raise ValueError(f"unknown Parameters setting {k!r}")
            values[k] = int(v)
        env_map = os.environ if env is None else env
        for k, v in env_map.items():
            if not k.startswith(_ENV_PREFIX):
                continue
            name = k[len(_ENV_PREFIX):]
            if name in _DEFAULTS:
                values[name] = int(v)
        return cls(values)
