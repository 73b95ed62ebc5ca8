"""ASR abstraction layer.

Mirror of the reference's engine trait and value types
(/root/reference/src/asr/mod.rs:10-73): `AsrParams`, `TranscribeSegment`,
`TranscribeResult`, and the `AsrEngine` interface
(create_state / transcribe_with_state / transcribe). The JAX implementation
lives in asr/engine.py; a deterministic fake for API tests in asr/fake.py.
"""

from __future__ import annotations

import abc
from dataclasses import dataclass, field


@dataclass
class AsrParams:
    """User-facing knobs (reference src/asr/mod.rs:10-15 + defaults :17-26)."""

    language: str | None = None
    speaker_diarization: bool = False
    stream_mode: bool = False
    min_segment_length: int = 10
    task: str = "transcribe"
    # extensions over the reference (it hardcodes these in build_params)
    temperature: float = 0.0
    condition_on_previous_text: bool = True
    suppress_non_speech: bool = False   # reference disables suppression (whisper.rs:152)
    word_timestamps: bool = False
    denoise: bool = False  # device-side DSP denoise for stream chunks (set by
    #                        StreamSession when the engine supports it)


@dataclass
class TranscribeSegment:
    text: str
    speaker_id: int = 0
    start: float = 0.0   # seconds
    end: float = 0.0     # seconds
    words: list | None = None  # [{word,start,end}] when word_timestamps on

    def to_dict(self) -> dict:
        d = {"text": self.text, "speaker_id": self.speaker_id,
             "start": self.start, "end": self.end}
        if self.words is not None:
            d["words"] = self.words
        return d


@dataclass
class TranscribeResult:
    segments: list[TranscribeSegment] = field(default_factory=list)
    full_text: str = ""
    language: str | None = None
    # decoder tokens sampled to produce this result (usage accounting:
    # feeds api_key_stats.total_tokens via Auth.record_usage)
    n_tokens: int = 0

    def to_dict(self) -> dict:
        return {"segments": [s.to_dict() for s in self.segments], "full_text": self.full_text}


class AsrEngine(abc.ABC):
    """Engine interface (reference trait at src/asr/mod.rs:58-73).

    A *state* is the per-stream decode context. The reference allocates one
    whisper.cpp KV state per stream (create_state, whisper.rs:30-39); here a
    state is a lightweight host handle (conditioning text + bookkeeping) —
    device KV lives in the engine's batched slot pool, so many states
    multiplex one compiled decode program.
    """

    @abc.abstractmethod
    def create_state(self): ...

    @abc.abstractmethod
    def transcribe_with_state(self, state, audio, params: AsrParams) -> TranscribeResult: ...

    def transcribe(self, audio, params: AsrParams) -> TranscribeResult:
        return self.transcribe_with_state(self.create_state(), audio, params)
