"""Task pipeline end-to-end: create -> claim -> process -> result -> callback,
retries, timeouts — hermetic via FakeAsrEngine + Function callbacks (no
network, no model; the reference's equivalent test needed ggml-large-v3.bin,
SURVEY.md §4)."""

import time

import numpy as np
import pytest

from speaksense_tpu.asr.fake import FakeAsrEngine
from speaksense_tpu.audio.io import write_wav
from speaksense_tpu.schedule import (
    CallbackType, PathType, Task, TaskConfig, TaskManager, TaskParams,
    TaskPriority, TaskStatus, TaskType, TranscribeParams,
)
from speaksense_tpu.schedule.processors import TranscribeProcessor
from speaksense_tpu.schedule.scheduler import TaskScheduler
from speaksense_tpu.storage.sqlite import SqliteTaskStorage


@pytest.fixture
def manager(tmp_path):
    storage = SqliteTaskStorage(tmp_path / "tasks.db")
    m = TaskManager(storage)
    m.register_processor(TranscribeProcessor(FakeAsrEngine(), audio_dir=str(tmp_path)))
    yield m
    storage.close()


def _wav(tmp_path, name="in.wav", seconds=2.0):
    path = tmp_path / name
    t = np.arange(int(16000 * seconds)) / 16000
    write_wav(path, 0.3 * np.sin(2 * np.pi * 300 * t))
    return path


def _config(path, callback=None, language="en", **kw):
    return TaskConfig(
        task_type=TaskType.TRANSCRIBE, input_path=str(path),
        path_type=PathType.LOCAL,
        callback_type=callback or CallbackType.none(),
        params=TaskParams.transcribe(TranscribeParams(language=language)), **kw)


def test_create_validates_language(manager, tmp_path):
    with pytest.raises(ValueError, match="unsupported language"):
        manager.create_task(_config(_wav(tmp_path), language="xx"))


def test_full_pipeline_with_function_callback(manager, tmp_path):
    events = []
    manager.register_function("collect", events.append)
    task = manager.create_task(
        _config(_wav(tmp_path), callback=CallbackType.function("collect")))

    claimed = manager.get_next_task()
    assert claimed.id == task.id
    assert claimed.status.kind == TaskStatus.PROCESSING
    result = manager.process_task(claimed)
    manager.complete_task(claimed, result)

    stored = manager.get_task(task.id)
    assert stored.status.kind == TaskStatus.COMPLETED
    assert stored.result.result.text.startswith("seg0-")
    assert len(stored.result.result.segments) == 1
    assert events and events[0]["kind"] == "complete"
    assert events[0]["task_id"] == task.id


def test_worker_thread_processes(manager, tmp_path):
    done = []
    manager.register_function("done", done.append)
    scheduler = TaskScheduler(manager, sweep_interval=0.2)
    scheduler.spawn_worker(TaskType.TRANSCRIBE, poll_interval=0.05)
    try:
        task = manager.create_task(
            _config(_wav(tmp_path), callback=CallbackType.function("done")))
        deadline = time.time() + 10
        while time.time() < deadline:
            t = manager.get_task(task.id)
            if t.status.kind == TaskStatus.COMPLETED:
                break
            time.sleep(0.05)
        assert manager.get_task(task.id).status.kind == TaskStatus.COMPLETED
        assert done
    finally:
        scheduler.stop()


def test_retry_then_fail(manager, tmp_path):
    # nonexistent file passes validation but fails at process time
    task = manager.create_task(_config(tmp_path / "missing.wav", max_retries=2))

    for attempt in range(3):
        claimed = manager.get_next_task()
        assert claimed is not None, f"attempt {attempt}: task not re-claimable"
        with pytest.raises(FileNotFoundError):
            manager.process_task(claimed)
        manager.handle_task_failure(claimed, "file missing")
    final = manager.get_task(task.id)
    assert final.status.kind == TaskStatus.FAILED
    assert final.config.retry_count == 3
    assert manager.get_next_task() is None  # failed tasks are not claimed


def test_claim_guard_prevents_double_processing(manager, tmp_path):
    manager.create_task(_config(_wav(tmp_path)))
    first = manager.get_next_task()
    assert first is not None
    assert manager.get_next_task() is None  # in-memory claim guard


def test_priority_update_pending_only(manager, tmp_path):
    task = manager.create_task(_config(_wav(tmp_path)))
    assert manager.update_task_priority(task.id, TaskPriority.CRITICAL)
    got = manager.get_task(task.id)
    assert got.config.priority is TaskPriority.CRITICAL
    claimed = manager.get_next_task()
    assert not manager.update_task_priority(claimed.id, TaskPriority.LOW)


def test_task_stats(manager, tmp_path):
    manager.create_task(_config(_wav(tmp_path, "a.wav")))
    t2 = manager.create_task(_config(_wav(tmp_path, "b.wav")))
    manager.storage.update(t2.id, TaskStatus.completed())
    stats = manager.get_task_stats()
    assert stats == {"Pending": 1, "Completed": 1}


def test_event_bus_callback(manager, tmp_path):
    q = manager.event_bus.subscribe()
    task = manager.create_task(_config(_wav(tmp_path), callback=CallbackType.event()))
    claimed = manager.get_next_task()
    manager.complete_task(claimed, manager.process_task(claimed))
    ev = q.get(timeout=2)
    assert ev.kind == "complete" and ev.task_id == task.id


def test_noise_reduction_processor(tmp_path):
    from speaksense_tpu.schedule.processors import NoiseReductionProcessor
    from speaksense_tpu.schedule.types import TaskParams

    proc = NoiseReductionProcessor(audio_dir=str(tmp_path))
    wav = _wav(tmp_path, "nr.wav")
    cfg = TaskConfig(
        task_type=TaskType.NOISE_REDUCTION, input_path=str(wav),
        path_type=PathType.LOCAL, callback_type=CallbackType.none(),
        params=TaskParams(TaskType.NOISE_REDUCTION, {}))
    task = Task.new(cfg)
    result = proc.process(task)
    out = result.result["output_path"]
    assert out.endswith(".denoised.wav")
    import os

    assert os.path.isfile(out)


def test_stale_claim_cleanup(manager, tmp_path):
    import time as _time

    from speaksense_tpu.schedule import manager as M

    manager.create_task(_config(_wav(tmp_path, "stale.wav")))
    claimed = manager.get_next_task()
    assert claimed is not None
    # backdate the in-memory claim beyond the 30-min window
    with manager._lock:
        manager._processing[claimed.id] = _time.monotonic() - M.STALE_CLAIM_SECONDS - 1
    assert manager.cleanup_stale_claims() == 1
    assert claimed.id not in manager._processing


def test_typed_claim_does_not_wedge_other_types(manager, tmp_path):
    """A worker asking for one TaskType must not claim (and wedge) a task of
    another type — the reference bug: get_next_task claimed ANY type, the
    worker dropped mismatches, and the claimed row sat Processing until the
    30-min stale sweep (task_manager.rs:85-119 + worker.rs:52-54)."""
    from speaksense_tpu.schedule.processors import NoiseReductionProcessor
    from speaksense_tpu.schedule.types import TaskParams

    manager.register_processor(NoiseReductionProcessor(audio_dir=str(tmp_path)))
    nr_cfg = TaskConfig(
        task_type=TaskType.NOISE_REDUCTION, input_path=str(_wav(tmp_path, "n.wav")),
        path_type=PathType.LOCAL, callback_type=CallbackType.none(),
        params=TaskParams(TaskType.NOISE_REDUCTION, {}),
        priority=TaskPriority.CRITICAL)  # higher priority than the transcribe task
    nr_task = manager.create_task(nr_cfg)
    tr_task = manager.create_task(_config(_wav(tmp_path, "t.wav")))

    # a Transcribe-typed claim must skip the higher-priority NR task entirely
    claimed = manager.get_next_task(TaskType.TRANSCRIBE)
    assert claimed.id == tr_task.id
    # NR task is still Pending (not wedged in Processing)
    assert manager.get_task(nr_task.id).status.kind == TaskStatus.PENDING
    claimed_nr = manager.get_next_task(TaskType.NOISE_REDUCTION)
    assert claimed_nr.id == nr_task.id


def test_two_workers_two_types_under_contention(manager, tmp_path):
    """Two workers of different types against a mixed queue: every task is
    processed by its own type's worker, none wedge."""
    from speaksense_tpu.schedule.processors import NoiseReductionProcessor
    from speaksense_tpu.schedule.types import TaskParams

    manager.register_processor(NoiseReductionProcessor(audio_dir=str(tmp_path)))
    tasks = []
    for i in range(4):
        tasks.append(manager.create_task(_config(_wav(tmp_path, f"t{i}.wav"))))
        tasks.append(manager.create_task(TaskConfig(
            task_type=TaskType.NOISE_REDUCTION,
            input_path=str(_wav(tmp_path, f"n{i}.wav")),
            path_type=PathType.LOCAL, callback_type=CallbackType.none(),
            params=TaskParams(TaskType.NOISE_REDUCTION, {}))))

    scheduler = TaskScheduler(manager, sweep_interval=5.0)
    scheduler.spawn_worker(TaskType.TRANSCRIBE, poll_interval=0.02)
    scheduler.spawn_worker(TaskType.NOISE_REDUCTION, poll_interval=0.02)
    try:
        deadline = time.time() + 20
        while time.time() < deadline:
            statuses = [manager.get_task(t.id).status.kind for t in tasks]
            if all(s == TaskStatus.COMPLETED for s in statuses):
                break
            time.sleep(0.05)
        statuses = [manager.get_task(t.id).status.kind for t in tasks]
        assert all(s == TaskStatus.COMPLETED for s in statuses), statuses
    finally:
        scheduler.stop()

def test_parallel_same_type_workers_each_task_once(manager, tmp_path):
    """create_scheduler(workers={Transcribe: 3}): N same-type workers drain
    one queue concurrently; typed SQL claims guarantee each task is processed
    exactly once (the reference caps at one worker per type because each
    whisper.cpp call owns the backend, scheduler/mod.rs:26-32 — here parallel
    claims feed the shared batcher instead)."""
    from speaksense_tpu.schedule.scheduler import create_scheduler

    events = []
    manager.register_function("collect", events.append)
    tasks = [manager.create_task(_config(_wav(tmp_path, f"p{i}.wav"),
                                         callback=CallbackType.function("collect")))
             for i in range(9)]

    scheduler = create_scheduler(manager, [TaskType.TRANSCRIBE],
                                 workers={TaskType.TRANSCRIBE: 3})
    assert len(scheduler.workers) == 3
    try:
        deadline = time.time() + 20
        while time.time() < deadline:
            if all(manager.get_task(t.id).status.kind == TaskStatus.COMPLETED
                   for t in tasks):
                break
            time.sleep(0.05)
        statuses = [manager.get_task(t.id).status.kind for t in tasks]
        assert all(s == TaskStatus.COMPLETED for s in statuses), statuses
        completions = [e["task_id"] for e in events if e["kind"] == "complete"]
        assert sorted(completions) == sorted(t.id for t in tasks)  # exactly once
    finally:
        scheduler.stop()

def test_recover_orphaned_processing_tasks(manager, tmp_path):
    """Rows stuck in Processing from a crashed previous process are requeued
    as Retrying at startup and become claimable again (round-2 review: the
    pending query and the claim CAS both exclude Processing, and REST tasks
    have timeout=None, so they were stranded forever)."""
    task = manager.create_task(_config(_wav(tmp_path, "orphan.wav")))
    claimed = manager.get_next_task(TaskType.TRANSCRIBE)
    assert claimed is not None and claimed.id == task.id
    # simulate a process crash/restart: in-memory claims vanish
    manager._processing.clear()
    assert manager.get_next_task(TaskType.TRANSCRIBE) is None  # wedged
    assert manager.recover_orphaned_tasks() == 1
    reclaimed = manager.get_next_task(TaskType.TRANSCRIBE)
    assert reclaimed is not None and reclaimed.id == task.id


def test_stale_claim_requeues_db_row(manager, tmp_path):
    """cleanup_stale_claims persists Retrying, not just the in-memory drop."""
    import time as _time

    from speaksense_tpu.schedule.manager import STALE_CLAIM_SECONDS

    task = manager.create_task(_config(_wav(tmp_path, "stale.wav")))
    claimed = manager.get_next_task(TaskType.TRANSCRIBE)
    assert claimed.id == task.id
    # age the claim artificially
    manager._processing[task.id] = _time.monotonic() - STALE_CLAIM_SECONDS - 1
    assert manager.cleanup_stale_claims() == 1
    assert manager.get_task(task.id).status.kind == TaskStatus.RETRYING
    assert manager.get_next_task(TaskType.TRANSCRIBE).id == task.id
