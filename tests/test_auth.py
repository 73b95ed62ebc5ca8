"""Auth service tests (reference colocates these at src/auth/service.rs:203-441
against a shared global DB with 65 s sleeps; ours are isolated and fast —
the rate-limit window is injected instead of slept on)."""

import datetime as dt

import pytest

from speaksense_tpu.auth import Auth, AuthError, KeyStatus, Permission, RateLimit
from speaksense_tpu.auth.ratelimit import MinuteRateLimiter
from speaksense_tpu.schedule.types import utcnow
from speaksense_tpu.storage.sqlite import SqliteKeyStorage


@pytest.fixture
def auth(tmp_path):
    store = SqliteKeyStorage(tmp_path / "keys.db")
    yield Auth(store, store)
    store.close()


def _bearer(info):
    return f"Bearer {info.key}"


def test_lifecycle(auth):
    info = auth.create_api_key("svc", [Permission.TRANSCRIBE], RateLimit(10, 0, 0))
    assert info.key.startswith("key-")
    auth.verify_api_key(_bearer(info), Permission.TRANSCRIBE)  # ok
    auth.revoke_api_key(info.key)
    with pytest.raises(AuthError, match="suspended"):
        auth.verify_api_key(_bearer(info), Permission.TRANSCRIBE)


def test_missing_and_invalid_key(auth):
    with pytest.raises(AuthError, match="missing"):
        auth.verify_api_key(None, Permission.TRANSCRIBE)
    with pytest.raises(AuthError, match="invalid"):
        auth.verify_api_key("Bearer nope", Permission.TRANSCRIBE)


def test_permission_check(auth):
    info = auth.create_api_key("svc", [Permission.TRANSCRIBE], RateLimit(10, 0, 0))
    with pytest.raises(AuthError, match="permission"):
        auth.verify_api_key(_bearer(info), Permission.ADMIN)


def test_expiry(auth):
    info = auth.create_api_key("svc", [Permission.TRANSCRIBE], RateLimit(10, 0, 0),
                               expires_in_days=1)
    auth.verify_api_key(_bearer(info), Permission.TRANSCRIBE)
    # backdate expiry
    info.expires_at = utcnow() - dt.timedelta(seconds=1)
    auth.key_storage.create(info.key, info)
    with pytest.raises(AuthError, match="expired"):
        auth.verify_api_key(_bearer(info), Permission.TRANSCRIBE)


def test_rate_limit(auth):
    info = auth.create_api_key("svc", [Permission.TRANSCRIBE], RateLimit(3, 0, 0))
    for _ in range(3):
        auth.verify_api_key(_bearer(info), Permission.TRANSCRIBE)
    with pytest.raises(AuthError, match="rate limit"):
        auth.verify_api_key(_bearer(info), Permission.TRANSCRIBE)


def test_rate_limiter_window_slides():
    lim = MinuteRateLimiter(2, window_s=60.0)
    assert lim.check(now=0.0) and lim.check(now=1.0)
    assert not lim.check(now=2.0)
    assert lim.check(now=61.5)  # first event expired


def test_stats_accumulate(auth):
    info = auth.create_api_key("svc", [Permission.TRANSCRIBE], RateLimit(100, 0, 0))
    for _ in range(4):
        auth.verify_api_key(_bearer(info), Permission.TRANSCRIBE)
    stats = auth.get_key_stats(info.key)
    assert stats.total_requests == 4
    assert stats.requests_today == 4
    report = auth.get_key_usage_report(info.key)
    assert report.usage_summary.average_daily_requests == pytest.approx(4 / 30.0)
    assert report.usage_summary.days_until_expiry == -1


def test_admin_bootstrap_idempotent(auth):
    first = auth.initialize_admin_key()
    assert first is not None
    assert Permission.ADMIN in first.permissions
    assert first.rate_limit.requests_per_minute == 100
    assert auth.initialize_admin_key() is None  # second call: no-op


def test_bearer_parse_takes_last_token(auth):
    info = auth.create_api_key("svc", [Permission.TRANSCRIBE], RateLimit(10, 0, 0))
    # reference splits on spaces and takes the last segment (service.rs:44)
    auth.verify_api_key(f"Bearer   {info.key}", Permission.TRANSCRIBE)
    auth.verify_api_key(info.key, Permission.TRANSCRIBE)  # bare key also works
