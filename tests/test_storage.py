"""SQLite storage tests (pattern modeled on the reference's key-storage
tests, its cleanest — SURVEY.md §4 — but with proper per-test temp files,
fixing the shared-global-DB fixture bug)."""

import datetime as dt
import json
import time

import pytest

from speaksense_tpu.auth.types import ApiKeyInfo, ApiKeyStats, KeyStatus, Permission, RateLimit
from speaksense_tpu.schedule.types import (
    CallbackType, PathType, Task, TaskConfig, TaskParams, TaskPriority,
    TaskResult, TaskStatus, TaskType, TranscribeParams, TranscribeTaskResult,
    utcnow,
)
from speaksense_tpu.storage.sqlite import SqliteKeyStorage, SqliteTaskStorage


@pytest.fixture
def task_store(tmp_path):
    s = SqliteTaskStorage(tmp_path / "tasks.db")
    yield s
    s.close()


@pytest.fixture
def key_store(tmp_path):
    s = SqliteKeyStorage(tmp_path / "keys.db")
    yield s
    s.close()


def _config(priority=TaskPriority.NORMAL, timeout=None):
    return TaskConfig(
        task_type=TaskType.TRANSCRIBE, input_path="/tmp/a.wav",
        path_type=PathType.LOCAL, callback_type=CallbackType.none(),
        params=TaskParams.transcribe(TranscribeParams(language="en")),
        priority=priority, timeout=timeout)


def test_task_crud_roundtrip(task_store):
    task = Task.new(_config())
    task_store.create(task)
    got = task_store.get(task.id)
    assert got is not None
    assert got.status == TaskStatus.PENDING
    assert got.config.params.params.language == "en"
    assert got.config.callback_type.kind == CallbackType.NONE
    task_store.delete(task.id)
    assert task_store.get(task.id) is None


def test_priority_ordering(task_store):
    low = Task.new(_config(TaskPriority.LOW))
    critical = Task.new(_config(TaskPriority.CRITICAL))
    normal = Task.new(_config(TaskPriority.NORMAL))
    for t in (low, critical, normal):
        task_store.create(t)
    pending = task_store.get_pending_by_priority(10)
    assert [t.id for t in pending] == [critical.id, normal.id, low.id]


def test_status_transitions_stamp_times(task_store):
    task = Task.new(_config())
    task_store.create(task)
    task_store.update(task.id, TaskStatus.processing())
    got = task_store.get(task.id)
    assert got.status == TaskStatus.PROCESSING
    assert got.started_at is not None
    task_store.update(task.id, TaskStatus.completed())
    got = task_store.get(task.id)
    assert got.completed_at is not None


def test_failed_status_keeps_message(task_store):
    task = Task.new(_config())
    task_store.create(task)
    task_store.update(task.id, TaskStatus.failed("boom"))
    got = task_store.get(task.id)
    assert got.status.kind == TaskStatus.FAILED
    assert got.status.error == "boom"
    # stored as serde JSON {"Failed": "boom"}
    row = task_store._conn.execute(
        "SELECT status FROM tasks WHERE id=?", (task.id,)).fetchone()
    assert json.loads(row[0]) == {"Failed": "boom"}


def test_retrying_tasks_are_reclaimable(task_store):
    """Reference bug fix: Retrying must appear in the claim query."""
    task = Task.new(_config())
    task_store.create(task)
    task_store.update(task.id, TaskStatus.retrying())
    assert [t.id for t in task_store.get_pending_by_priority(10)] == [task.id]


def test_timeout_sweep(task_store):
    task = Task.new(_config(timeout=1))
    task_store.create(task)
    task_store.update(task.id, TaskStatus.processing())
    # backdate started_at beyond the timeout
    task_store._conn.execute(
        "UPDATE tasks SET started_at = ? WHERE id = ?",
        ((utcnow() - dt.timedelta(seconds=5)).strftime("%Y-%m-%d %H:%M:%S.%f"), task.id))
    task_store._conn.commit()
    timed_out = task_store.get_timeouted()
    assert [t.id for t in timed_out] == [task.id]


def test_cleanup_old(task_store):
    done = Task.new(_config())
    task_store.create(done)
    task_store.update(done.id, TaskStatus.completed())
    task_store._conn.execute(
        "UPDATE tasks SET updated_at = ? WHERE id = ?",
        ((utcnow() - dt.timedelta(days=10)).strftime("%Y-%m-%d %H:%M:%S.%f"), done.id))
    task_store._conn.commit()
    fresh = Task.new(_config())
    task_store.create(fresh)
    n = task_store.cleanup_old(utcnow() - dt.timedelta(days=1))
    assert n == 1
    assert task_store.get(done.id) is None
    assert task_store.get(fresh.id) is not None


def test_set_result_roundtrip(task_store):
    task = Task.new(_config())
    task_store.create(task)
    result = TaskResult.transcribe(TranscribeTaskResult(text="hello"))
    task_store.set_result(task.id, result)
    got = task_store.get(task.id)
    assert got.result.result.text == "hello"
    # serde tagged format on disk
    row = task_store._conn.execute(
        "SELECT result FROM tasks WHERE id=?", (task.id,)).fetchone()
    assert json.loads(row[0])["type"] == "Transcribe"


def test_count_by_status(task_store):
    a, b = Task.new(_config()), Task.new(_config())
    task_store.create(a)
    task_store.create(b)
    task_store.update(b.id, TaskStatus.completed())
    counts = task_store.count_by_status()
    assert counts == {"Pending": 1, "Completed": 1}


# -- key storage -------------------------------------------------------------

def _key_info(key="key-1", status=KeyStatus.ACTIVE, expires_at=None):
    return ApiKeyInfo(key=key, name="test", permissions=[Permission.TRANSCRIBE],
                      rate_limit=RateLimit(60, 0, 0), status=status,
                      expires_at=expires_at)


def test_key_crud(key_store):
    info = _key_info()
    key_store.create(info.key, info)
    got = key_store.get("key-1")
    assert got.name == "test"
    assert got.permissions == [Permission.TRANSCRIBE]
    assert got.rate_limit.requests_per_minute == 60
    assert got.status is KeyStatus.ACTIVE
    assert len(key_store.list()) == 1
    key_store.update_status("key-1", KeyStatus.SUSPENDED)
    assert key_store.get("key-1").status is KeyStatus.SUSPENDED
    key_store.remove("key-1")
    assert key_store.get("key-1") is None


def test_key_status_stored_as_json_string(key_store):
    info = _key_info()
    key_store.create(info.key, info)
    row = key_store._conn.execute(
        "SELECT status, permissions FROM api_keys WHERE key=?", ("key-1",)).fetchone()
    assert row[0] == '"Active"'
    assert json.loads(row[1]) == ["Transcribe"]


def test_stats_upsert(key_store):
    stats = ApiKeyStats()
    stats.update()
    key_store.update_stats("key-1", stats)
    got = key_store.get_stats("key-1")
    assert got.total_requests == 1 and got.requests_today == 1
    stats.update()
    key_store.update_stats("key-1", stats)
    got = key_store.get_stats("key-1")
    assert got.total_requests == 2
    assert key_store.get_stats("missing") is None


def test_per_day_usage_history_persists(tmp_path):
    """30-day per-day request history survives DB round-trips (the reference
    rebuilds the map from today's counter only, key/mod.rs:92-104; VERDICT
    r1 item 7 asks for durable history)."""
    import datetime as dt

    from speaksense_tpu.auth.types import ApiKeyStats

    store = SqliteKeyStorage(tmp_path / "keys.db")
    try:
        today = dt.datetime.now(dt.timezone.utc).date()
        stats = ApiKeyStats()
        # simulate a week of history plus an over-30-day entry to prune
        for back in (0, 1, 2, 6):
            stats.requests_per_day[(today - dt.timedelta(days=back)).isoformat()] = back + 1
        stats.requests_per_day[(today - dt.timedelta(days=40)).isoformat()] = 99
        stats.requests_today = 1
        stats.total_requests = 10
        store.update_stats("key-x", stats)

        got = store.get_stats("key-x")
        assert got is not None
        assert got.requests_per_day[today.isoformat()] == 1
        assert got.requests_per_day[(today - dt.timedelta(days=6)).isoformat()] == 7
        assert len(got.requests_per_day) == 4  # 40-day-old entry pruned
        assert got.requests_today == 1

        # a second update accumulates without losing history
        got.update()
        store.update_stats("key-x", got)
        again = store.get_stats("key-x")
        assert again.requests_per_day[today.isoformat()] == 2
        assert (today - dt.timedelta(days=2)).isoformat() in again.requests_per_day

        # remove() clears the history too
        store.remove("key-x")
        assert store.get_stats("key-x") is None
        import sqlite3
        assert store._conn.execute(
            "SELECT COUNT(*) FROM api_key_daily_usage WHERE key='key-x'"
        ).fetchone()[0] == 0
    finally:
        store.close()
