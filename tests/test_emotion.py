"""Emotion classification + the functional emotion_recognition flag.

The reference accepts emotion_recognition in TranscribeParams
(web/handlers/asr.rs:36-46) but never reads it; audio/emotion.py makes it
functional via a deterministic prosody classifier. Tests pin the label
mapping on synthetic prosody and the per-segment annotation through
TranscribeProcessor.
"""

import numpy as np

from speaksense_tpu.audio.emotion import classify_emotion, extract_features

SR = 16000


def _tone(freq_hz, amp, seconds=2.0, vibrato_hz=0.0, vibrato_depth=0.0):
    """Sine 'speech' with optional slow pitch vibrato (depth in Hz)."""
    t = np.arange(int(seconds * SR)) / SR
    if vibrato_hz:
        inst = freq_hz + vibrato_depth * np.sin(2 * np.pi * vibrato_hz * t)
        phase = 2 * np.pi * np.cumsum(inst) / SR
    else:
        phase = 2 * np.pi * freq_hz * t
    return (amp * np.sin(phase)).astype(np.float32)


def test_pitch_estimation():
    f = extract_features(_tone(150.0, 0.1))
    assert abs(f.pitch_mean_hz - 150.0) < 10.0
    assert f.pitch_std_hz < 10.0
    assert f.voiced_ratio > 0.9


def test_agitated_loud_variable_pitch():
    x = _tone(230.0, 0.3, vibrato_hz=2.0, vibrato_depth=110.0)
    label, f = classify_emotion(x)
    assert label == "agitated", (label, f)
    assert f.pitch_std_hz > 55.0


def test_excited_loud_high_steady():
    label, f = classify_emotion(_tone(280.0, 0.2))
    assert label == "excited", (label, f)


def test_calm_quiet_low_steady():
    label, f = classify_emotion(_tone(110.0, 0.012))
    assert label == "calm", (label, f)


def test_neutral_moderate():
    label, f = classify_emotion(_tone(150.0, 0.04))
    assert label == "neutral", (label, f)


def test_empty_audio():
    label, f = classify_emotion(np.zeros(0, np.float32))
    assert label in ("neutral", "calm")
    assert f.energy_rms == 0.0


def test_transcribe_processor_annotates_segments(tmp_path):
    """emotion_recognition=True -> every segment carries an emotion label;
    False -> the field stays None and the result JSON omits it (byte-compat
    with the reference's on-disk forms)."""
    import wave

    from speaksense_tpu.asr.fake import FakeAsrEngine
    from speaksense_tpu.schedule.processors import TranscribeProcessor
    from speaksense_tpu.schedule.types import (
        CallbackType, PathType, Task, TaskConfig, TaskParams, TaskStatus,
        TaskType, TranscribeParams, utcnow,
    )

    # 6 s: calm 3 s then agitated 3 s -> two fake segments (5 s cadence would
    # split at 5 s; use segment_seconds=3 for a clean boundary)
    x = np.concatenate([
        _tone(110.0, 0.012, seconds=3.0),
        _tone(230.0, 0.3, seconds=3.0, vibrato_hz=2.0, vibrato_depth=110.0),
    ])
    p = tmp_path / "x.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes((x * 32767).astype(np.int16).tobytes())

    def run(emotion: bool):
        cfg = TaskConfig(
            task_type=TaskType.TRANSCRIBE, input_path=str(p),
            path_type=PathType.LOCAL, callback_type=CallbackType.none(),
            params=TaskParams.transcribe(
                TranscribeParams(language="en", emotion_recognition=emotion)))
        task = Task(id="t-emotion", config=cfg, status=TaskStatus.pending(),
                    created_at=utcnow(), updated_at=utcnow())
        proc = TranscribeProcessor(FakeAsrEngine(segment_seconds=3.0),
                                   audio_dir=str(tmp_path))
        return proc.process(task).result

    res = run(True)
    assert len(res.segments) == 2
    assert res.segments[0].emotion == "calm"
    assert res.segments[1].emotion == "agitated"
    assert "emotion" in res.segments[0].to_json()

    res_off = run(False)
    assert all(s.emotion is None for s in res_off.segments)
    assert "emotion" not in res_off.segments[0].to_json()


def test_filter_dirty_words():
    from speaksense_tpu.asr.postprocess import filter_dirty_words

    assert filter_dirty_words("oh Shit happens") == "oh S*** happens"
    assert filter_dirty_words("shitake mushrooms") == "shitake mushrooms"  # boundary
    assert filter_dirty_words("他妈的天气") == "***天气"
    assert filter_dirty_words("クソゲーだ") == "**ゲーだ"
    assert filter_dirty_words("") == ""
    masked = filter_dirty_words("fuck FUCK Fuck")
    assert masked == "f*** F*** F***"
    assert filter_dirty_words(masked) == masked  # idempotent
    assert filter_dirty_words("darn", extra_words=("darn",)) == "d***"


def test_transcribe_processor_filters_dirty_words(tmp_path):
    """filter_dirty_words=True masks profanity in segment text and full_text
    through the batch pipeline (fake engine monkeypatched transcript)."""
    import wave

    from speaksense_tpu.asr import (
        AsrParams, TranscribeResult, TranscribeSegment,
    )
    from speaksense_tpu.asr.fake import FakeAsrEngine
    from speaksense_tpu.schedule.processors import TranscribeProcessor
    from speaksense_tpu.schedule.types import (
        CallbackType, PathType, Task, TaskConfig, TaskParams, TaskStatus,
        TaskType, TranscribeParams, utcnow,
    )

    p = tmp_path / "x.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(np.zeros(SR, np.int16).tobytes())

    class _Potty(FakeAsrEngine):
        def transcribe_with_state(self, state, audio, params: AsrParams):
            seg = TranscribeSegment(text="well shit that worked",
                                    start=0.0, end=1.0, speaker_id=0)
            return TranscribeResult(segments=[seg],
                                    full_text=seg.text, language="en")

    cfg = TaskConfig(
        task_type=TaskType.TRANSCRIBE, input_path=str(p),
        path_type=PathType.LOCAL, callback_type=CallbackType.none(),
        params=TaskParams.transcribe(
            TranscribeParams(language="en", filter_dirty_words=True)))
    task = Task(id="t-dirty", config=cfg, status=TaskStatus.pending(),
                created_at=utcnow(), updated_at=utcnow())
    res = TranscribeProcessor(_Potty(), audio_dir=str(tmp_path)).process(task).result
    assert res.text == "well s*** that worked"
    assert res.segments[0].text == "well s*** that worked"
