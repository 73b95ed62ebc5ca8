"""Voiceprint embeddings + VoiceprintRecognition task processor.

The reference declares TaskType::VoiceprintRecognition (types.rs:8-13) but
has no processor; audio/voiceprint.py puts a deterministic MFCC-statistics
speaker embedding behind it. These tests pin the embedding contract:
deterministic, gain-invariant, same-speaker > different-speaker separation,
and the end-to-end task pipeline result shape.
"""

import numpy as np
import pytest

from speaksense_tpu.audio.voiceprint import (
    DEFAULT_THRESHOLD, EMBED_DIM, cosine_similarity, voiceprint_embedding,
)


def _speaker(f0: float, formants: tuple[float, ...], seed: int,
             seconds: float = 3.0, sr: int = 16000) -> np.ndarray:
    """Synthetic 'speaker': harmonic source at f0 shaped by fixed formant
    resonances, with per-utterance random amplitude modulation (the seed is
    the 'utterance'; f0+formants are the 'speaker')."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    src = np.zeros_like(t)
    for h in range(1, 30):
        f = f0 * h
        if f > 7000:
            break
        # formant envelope: sum of gaussian resonances
        gain = sum(np.exp(-0.5 * ((f - fc) / 220.0) ** 2) for fc in formants)
        src += gain * np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
    # slow utterance-specific amplitude modulation + light noise
    mod = 0.7 + 0.3 * np.sin(2 * np.pi * rng.uniform(0.5, 2.0) * t
                             + rng.uniform(0, 2 * np.pi))
    x = src * mod + 0.01 * rng.standard_normal(t.size)
    return (0.1 * x / np.max(np.abs(x))).astype(np.float32)


SPK_A = dict(f0=118.0, formants=(520.0, 1480.0, 2500.0))
SPK_B = dict(f0=205.0, formants=(850.0, 2100.0, 3300.0))


def test_embedding_shape_norm_determinism():
    x = _speaker(**SPK_A, seed=0)
    e1 = voiceprint_embedding(x)
    e2 = voiceprint_embedding(x)
    assert e1.shape == (EMBED_DIM,)
    assert e1.dtype == np.float32
    np.testing.assert_allclose(np.linalg.norm(e1), 1.0, atol=1e-5)
    np.testing.assert_array_equal(e1, e2)


def test_gain_invariance():
    x = _speaker(**SPK_A, seed=1)
    sim = cosine_similarity(voiceprint_embedding(x), voiceprint_embedding(0.3 * x))
    assert sim > 0.99


def test_speaker_separation():
    a1 = voiceprint_embedding(_speaker(**SPK_A, seed=10))
    a2 = voiceprint_embedding(_speaker(**SPK_A, seed=11))
    b1 = voiceprint_embedding(_speaker(**SPK_B, seed=12))
    b2 = voiceprint_embedding(_speaker(**SPK_B, seed=13))
    same_a = cosine_similarity(a1, a2)
    same_b = cosine_similarity(b1, b2)
    cross = max(cosine_similarity(a1, b1), cosine_similarity(a1, b2),
                cosine_similarity(a2, b1), cosine_similarity(a2, b2))
    assert same_a > 0.9 and same_b > 0.9, (same_a, same_b)
    assert cross < 0.6, cross
    assert same_a > DEFAULT_THRESHOLD > cross


def test_short_audio_does_not_crash():
    e = voiceprint_embedding(np.zeros(100, np.float32))
    assert e.shape == (EMBED_DIM,)
    assert np.all(np.isfinite(e))


@pytest.fixture()
def wavs(tmp_path):
    import wave

    paths = {}
    for name, spk, seed in (("a1", SPK_A, 20), ("a2", SPK_A, 21),
                            ("b1", SPK_B, 22)):
        pcm = (_speaker(**spk, seed=seed) * 32767 * 0.5).astype(np.int16)
        p = tmp_path / f"{name}.wav"
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        paths[name] = str(p)
    return paths


def test_voiceprint_task_end_to_end(tmp_path, wavs):
    from speaksense_tpu.schedule.manager import TaskManager
    from speaksense_tpu.schedule.processors import VoiceprintProcessor
    from speaksense_tpu.schedule.types import (
        CallbackType, PathType, TaskConfig, TaskParams, TaskType,
    )
    from speaksense_tpu.storage.sqlite import SqliteTaskStorage

    storage = SqliteTaskStorage(str(tmp_path / "t.db"))
    manager = TaskManager(storage)
    manager.register_processor(VoiceprintProcessor(audio_dir=str(tmp_path)))

    def run(params: dict):
        cfg = TaskConfig(
            task_type=TaskType.VOICEPRINT_RECOGNITION,
            input_path=wavs["a1"], path_type=PathType.LOCAL,
            callback_type=CallbackType.none(),
            params=TaskParams(TaskType.VOICEPRINT_RECOGNITION, params))
        task = manager.create_task(cfg)
        claimed = manager.get_next_task(TaskType.VOICEPRINT_RECOGNITION)
        assert claimed is not None and claimed.id == task.id
        result = manager.process_task(claimed)
        return result.result

    # plain embedding extraction
    out = run({})
    assert out["dim"] == EMBED_DIM and len(out["embedding"]) == EMBED_DIM
    assert "similarity" not in out

    # same-speaker verification via compare_with
    out = run({"compare_with": wavs["a2"]})
    assert out["match"] is True and out["similarity"] > 0.9

    # different-speaker rejection via reference_print round trip
    ref = run({})["embedding"]
    out_b = TaskConfig(
        task_type=TaskType.VOICEPRINT_RECOGNITION,
        input_path=wavs["b1"], path_type=PathType.LOCAL,
        callback_type=CallbackType.none(),
        params=TaskParams(TaskType.VOICEPRINT_RECOGNITION,
                          {"reference_print": ref}))
    task = manager.create_task(out_b)
    claimed = manager.get_next_task(TaskType.VOICEPRINT_RECOGNITION)
    result = manager.process_task(claimed).result
    assert result["match"] is False and result["similarity"] < 0.6
    storage.close()


def test_reference_print_dim_validated(tmp_path, wavs):
    from speaksense_tpu.schedule.processors import VoiceprintProcessor
    from speaksense_tpu.schedule.types import (
        CallbackType, PathType, TaskConfig, TaskParams, TaskType,
    )

    proc = VoiceprintProcessor(audio_dir=str(tmp_path))
    cfg = TaskConfig(
        task_type=TaskType.VOICEPRINT_RECOGNITION,
        input_path=wavs["a1"], path_type=PathType.LOCAL,
        callback_type=CallbackType.none(),
        params=TaskParams(TaskType.VOICEPRINT_RECOGNITION,
                          {"reference_print": [0.1, 0.2]}))
    with pytest.raises(ValueError, match="reference_print"):
        proc.validate_params(cfg)
