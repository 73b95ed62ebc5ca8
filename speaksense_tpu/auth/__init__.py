"""API-key auth (reference src/auth/): types, stats, rate limiting, service."""

from speaksense_tpu.auth.types import (  # noqa: F401
    ApiKeyInfo,
    ApiKeyStats,
    ApiKeyUsageReport,
    AuthError,
    KeyStatus,
    Permission,
    RateLimit,
    UsageSummary,
)
from speaksense_tpu.auth.service import Auth  # noqa: F401
