"""Audio DSP suite tests — all hermetic with synthesized signals (the
reference's audio tests need a local ./test/a.wav fixture and don't even
compile, SURVEY.md §4; ours generate everything)."""

import numpy as np
import pytest

from speaksense_tpu.audio import dsp as DSP
from speaksense_tpu.audio import vad as VAD
from speaksense_tpu.audio import quality as Q
from speaksense_tpu.audio.resample import ChunkResampler, resample
from speaksense_tpu.audio.stream import StreamAudioProcessor
from speaksense_tpu.audio import io as AIO

SR = 16000


def _tone(freq=440.0, seconds=1.0, sr=SR, amp=0.5):
    t = np.arange(int(seconds * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _noisy_tone(rng, snr_db=5.0):
    sig = _tone(seconds=2.0)
    noise_power = (sig**2).mean() / (10 ** (snr_db / 10))
    noise = rng.standard_normal(sig.size).astype(np.float32) * np.sqrt(noise_power)
    return sig + noise, sig


def test_preemphasis_and_normalize():
    x = _tone(amp=0.25)
    y = DSP.preemphasis(x, 0.97)
    assert y.shape == x.shape and y[0] == x[0]
    n = DSP.normalize_audio(x)
    assert abs(np.abs(n).max() - 1.0) < 1e-6


def test_convert_to_mono():
    stereo = np.asarray([1.0, 0.0, 0.5, 0.5, -1.0, 1.0], np.float32)
    mono = DSP.convert_to_mono(stereo, 2)
    np.testing.assert_allclose(mono, [0.5, 0.5, 0.0])


def test_noise_gate():
    x = np.asarray([0.5, 0.001, -0.002, 0.2], np.float32)
    y = DSP.apply_noise_gate(x, 0.003)
    np.testing.assert_allclose(y, [0.5, 0.0, 0.0, 0.2], atol=1e-7)


def test_noise_floor_on_mixed_signal(rng):
    quiet = rng.standard_normal(SR).astype(np.float32) * 0.001
    loud = _tone(seconds=1.0)
    floor = DSP.estimate_noise_floor(np.concatenate([quiet, loud]))
    assert 0 < floor < (loud**2).mean()


def test_denoise_improves_snr(rng):
    # The noise spectrum is estimated from the FIRST 20 frames
    # (mod.rs:665-686), so the fixture needs a noise-only lead-in — with
    # speech from t=0 the estimator "subtracts" the speech itself.
    lead = int(2.6 * SR)
    tone = _tone(seconds=2.0)
    noise = (rng.standard_normal(lead + tone.size) * 0.1).astype(np.float32)
    noisy = noise.copy()
    noisy[lead:] += tone
    out = DSP.spectral_subtraction(noisy, 2048, 0.75, strength=0.5, post_gain=1.0)
    assert out.shape == noisy.shape

    def tone_ratio(x):
        spec = np.abs(np.fft.rfft(x[lead : lead + SR]))
        band = spec[438:443].sum()
        return band / (spec.sum() + 1e-9)

    assert tone_ratio(out) > tone_ratio(noisy) * 1.2
    # and the noise-only region got quieter
    assert (out[:lead] ** 2).mean() < (noisy[:lead] ** 2).mean()


def test_noise_classifier_stationary_vs_bursty(rng):
    steady = rng.standard_normal(SR * 2).astype(np.float32) * 0.01
    assert DSP.analyze_noise_characteristics(steady, 2048) is DSP.NoiseType.STATIONARY
    bursts = steady.copy()
    bursts[1024::4096] = 25.0  # impulsive, at window centers (hann(0)=0)
    assert DSP.analyze_noise_characteristics(bursts, 2048) is not DSP.NoiseType.STATIONARY


def test_vad_zeroes_silence():
    sig = np.concatenate([_tone(seconds=0.5), np.zeros(SR // 2, np.float32),
                          _tone(seconds=0.5)])
    out = VAD.voice_activity_detection(sig, frame_size=512, threshold=0.002)
    mid = out[SR // 2 + 1024 : SR - 1024]
    assert np.abs(mid).max() == 0.0
    assert np.abs(out[: SR // 4]).max() > 0.1


def test_speech_segments():
    sig = np.concatenate([
        np.zeros(SR, np.float32), _tone(seconds=1.0),
        np.zeros(SR * 2, np.float32), _tone(seconds=1.0), np.zeros(SR, np.float32)])
    segs = VAD.speech_segments(sig)
    assert len(segs) == 2
    (s0, e0), (s1, e1) = segs
    assert abs(s0 / SR - 1.0) < 0.35 and abs(e0 / SR - 2.0) < 0.35
    assert abs(s1 / SR - 4.0) < 0.35


def test_quality_metrics(rng):
    # speech-like: tone bursts with pauses (noise floor estimated from the
    # quietest frames, mod.rs:744-762 — a gapless tone has floor == signal)
    clean = np.concatenate([_tone(seconds=0.4), np.zeros(SR // 2, np.float32) +
                            rng.standard_normal(SR // 2).astype(np.float32) * 1e-4,
                            _tone(seconds=0.4)])
    m = Q.evaluate_audio_quality(clean)
    assert m.snr > 10.0
    assert 0 <= m.quality_score <= 100
    noisy = clean + rng.standard_normal(clean.size).astype(np.float32) * 0.3
    m2 = Q.evaluate_audio_quality(noisy)
    assert m2.snr < m.snr


def test_resample_tone_frequency_preserved():
    x = _tone(freq=1000.0, seconds=1.0, sr=44100)
    y = resample(x, 44100, 16000)
    assert abs(y.size - 16000) <= 2
    spec = np.abs(np.fft.rfft(y))
    peak_hz = np.argmax(spec) * 16000 / y.size
    assert abs(peak_hz - 1000.0) < 10.0


def test_chunk_resampler_matches_whole():
    x = _tone(freq=700.0, seconds=1.0, sr=44100)
    whole = resample(x, 44100, 16000)
    cr = ChunkResampler(44100, 16000)
    parts = [cr.process(c) for c in np.array_split(x, 7)]
    parts.append(cr.finish())
    streamed = np.concatenate(parts)
    n = min(whole.size, streamed.size)
    assert whole.size - streamed.size <= 2
    # finalized outputs are grid-aligned and context-protected: interior matches
    err = np.abs(whole[100 : n - 100] - streamed[100 : n - 100]).max()
    assert err < 1e-3


def test_stream_processor_emits_frames(rng):
    frames = []
    p = StreamAudioProcessor(DSP.DenoiseConfig(enable_noise_reduction=False),
                             frames.append)
    sig = _tone(seconds=0.5)
    for chunk in np.array_split(sig, 5):
        p.process_chunk(chunk)
    p.finish()
    assert sum(f.size for f in frames) >= sig.size
    assert all(f.size == 2048 for f in frames)


def test_wav_roundtrip(tmp_path, rng):
    x = _tone(seconds=0.3)
    path = tmp_path / "t.wav"
    AIO.write_wav(path, x, SR)
    y, channels, rate = AIO.read_wav(path)
    assert channels == 1 and rate == SR
    assert y.size == x.size
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_load_audio_resamples(tmp_path):
    x = _tone(freq=500, seconds=0.5, sr=44100)
    path = tmp_path / "hi.wav"
    AIO.write_wav(path, x, 44100)
    y = AIO.load_audio(path)
    assert abs(y.size - 8000) <= 2


def test_parse_audio_file_stream(tmp_path):
    x = _tone(seconds=0.5)
    path = tmp_path / "s.wav"
    AIO.write_wav(path, x, SR)
    got = []
    AIO.parse_audio_file_stream(path, DSP.DenoiseConfig(enable_noise_reduction=False),
                                got.append)
    total = sum(g.size for g in got)
    assert total >= x.size


@pytest.mark.skipif(not AIO.ffmpeg_available(), reason="ffmpeg not installed")
def test_ensure_wav_passthrough(tmp_path):
    x = _tone(seconds=0.1)
    path = tmp_path / "a.wav"
    AIO.write_wav(path, x, SR)
    assert AIO.ensure_wav_format(path) == path


def test_denoise_jax_matches_numpy():
    """The on-device denoise (fused into slot admission) must match the host
    numpy path (same classifier routing, gains, OLA) to ~f32 noise."""
    from speaksense_tpu.audio.dsp import (
        DenoiseConfig, denoise_audio, denoise_audio_jax,
    )

    rng = np.random.default_rng(0)
    t = np.arange(80000) / 16000
    cases = [
        (0.3 * np.sin(2 * np.pi * 300 * t)
         + 0.05 * rng.standard_normal(80000)).astype(np.float32),  # tonal
        (0.1 * rng.standard_normal(80000)).astype(np.float32),     # noise
    ]
    cfg = DenoiseConfig(post_gain=1.0)
    for x in cases:
        a = denoise_audio(x, cfg)
        b = np.asarray(denoise_audio_jax(x, cfg))
        assert np.abs(a - b).max() / max(1e-9, np.abs(a).max()) < 1e-4
    # short input passes through unframed (numpy behavior)
    short = np.zeros(1000, np.float32)
    assert np.asarray(denoise_audio_jax(short, cfg)).shape == (1000,)
