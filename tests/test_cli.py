"""CLI subcommand plumbing (speaksense_tpu/cli.py) with fake/DSP backends."""

import json
import wave

import numpy as np
import pytest

from speaksense_tpu import cli


@pytest.fixture()
def wav(tmp_path):
    t = np.arange(16000 * 2) / 16000.0
    pcm = (0.1 * np.sin(2 * np.pi * 150.0 * t) * 32767).astype(np.int16)
    p = tmp_path / "x.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    return str(p)


def test_transcribe_word_timestamps_plumbing(wav, monkeypatch, capsys):
    """--word-timestamps reaches AsrParams and per-word lines print."""
    from speaksense_tpu.asr import (
        AsrParams, TranscribeResult, TranscribeSegment,
    )

    seen = {}

    class _Eng:
        def transcribe_audio(self, audio, params: AsrParams):
            seen["params"] = params
            return TranscribeResult(
                segments=[TranscribeSegment(
                    text="hello world", start=0.0, end=2.0,
                    words=[{"word": "hello", "start": 0.0, "end": 0.9},
                           {"word": "world", "start": 1.0, "end": 2.0}])],
                full_text="hello world", language="en")

    monkeypatch.setattr(cli, "_load_engine", lambda args: _Eng())
    cli.main(["transcribe", wav, "--word-timestamps", "--random-model", "tiny"])
    out = capsys.readouterr().out
    assert seen["params"].word_timestamps is True
    assert "hello world" in out
    assert "[   0.00 -->    0.90] hello" in out


def test_voiceprint_compare(wav, capsys):
    cli.main(["voiceprint", wav, "--compare-with", wav])
    out = json.loads(capsys.readouterr().out)
    assert out["match"] is True and out["similarity"] == 1.0


def test_emotion(wav, capsys):
    cli.main(["emotion", wav])
    out = json.loads(capsys.readouterr().out)
    assert out["emotion"] in ("neutral", "calm", "excited", "agitated")
    assert abs(out["features"]["pitch_mean_hz"] - 150.0) < 15.0


def test_denoise_writes_output(wav, tmp_path, capsys):
    out_path = str(tmp_path / "clean.wav")
    cli.main(["denoise", wav, "--output", out_path])
    assert capsys.readouterr().out.strip() == out_path
    from speaksense_tpu.audio.io import load_audio

    cleaned = load_audio(out_path)
    assert cleaned.size > 0 and np.all(np.isfinite(cleaned))


def test_quality(wav, capsys):
    cli.main(["quality", wav])
    out = json.loads(capsys.readouterr().out)
    assert set(out) >= {"snr", "noise_level", "quality_score", "needs_denoising"}
