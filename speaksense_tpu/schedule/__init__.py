"""Task pipeline: durable queue -> scheduler/workers -> processors -> callbacks.

Rebuild of /root/reference/src/schedule/ (TaskManager, TaskScheduler,
TaskWorker, TranscribeProcessor, callbacks) with the same JSON wire/storage
formats (serde-tagged enums) and lifecycle semantics.
"""

from speaksense_tpu.schedule.types import (  # noqa: F401
    Task,
    TaskConfig,
    TaskParams,
    TaskPriority,
    TaskResult,
    TaskStatus,
    TaskType,
    CallbackType,
    PathType,
    TranscribeParams,
    TranscribeTaskResult,
    ResultSegment,
)
from speaksense_tpu.schedule.manager import TaskManager  # noqa: F401
from speaksense_tpu.schedule.scheduler import TaskScheduler  # noqa: F401
