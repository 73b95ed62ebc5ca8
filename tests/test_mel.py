"""Golden tests for the log-mel frontend.

The reference never tests mel numerics (it trusts whisper.cpp —
SURVEY.md §4); we verify against the independent huggingface
WhisperFeatureExtractor implementation (numpy, no network needed).
"""

import numpy as np
import pytest

from speaksense_tpu.audio import mel as M


def _hf_extractor(n_mels):
    transformers = pytest.importorskip("transformers")
    return transformers.WhisperFeatureExtractor(feature_size=n_mels)


@pytest.mark.parametrize("n_mels", [80, 128])
def test_mel_filters_match_hf(n_mels):
    fe = _hf_extractor(n_mels)
    ours = M.mel_filter_bank(n_mels)
    theirs = np.asarray(fe.mel_filters, dtype=np.float32)
    # HF stores (n_freqs, n_mels)
    if theirs.shape != ours.shape:
        theirs = theirs.T
    np.testing.assert_allclose(ours, theirs, atol=1e-7)


@pytest.mark.parametrize("n_mels", [80, 128])
def test_log_mel_matches_hf(n_mels, rng):
    fe = _hf_extractor(n_mels)
    audio = (rng.standard_normal(M.SAMPLE_RATE * 3) * 0.1).astype(np.float32)
    theirs = fe(audio, sampling_rate=M.SAMPLE_RATE, return_tensors="np", padding="max_length")
    ref = theirs["input_features"][0]  # (n_mels, 3000)
    ours = np.asarray(M.log_mel_spectrogram(audio, n_mels=n_mels))[0]  # (3000, n_mels)
    np.testing.assert_allclose(ours.T, ref, atol=2e-4, rtol=1e-4)


def test_log_mel_batched_consistent(rng):
    a = (rng.standard_normal((2, M.SAMPLE_RATE)) * 0.3).astype(np.float32)
    batched = np.asarray(M.log_mel_spectrogram(a, n_mels=80))
    single0 = np.asarray(M.log_mel_spectrogram(a[0], n_mels=80))[0]
    np.testing.assert_allclose(batched[0], single0, atol=1e-5)
    assert batched.shape == (2, M.N_FRAMES, 80)
