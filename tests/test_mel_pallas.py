"""Pallas fused log-mel kernel: numerics vs the jnp reference (interpret
mode on CPU; the TPU path compiles the same kernel)."""

import numpy as np
import pytest

from speaksense_tpu.audio import mel as M
from speaksense_tpu.ops.mel_pallas import log_mel_spectrogram_pallas


@pytest.mark.parametrize("n_mels", [80, 128])
def test_pallas_mel_matches_jnp(n_mels, rng):
    audio = (rng.standard_normal(M.SAMPLE_RATE * 2) * 0.2).astype(np.float32)
    ref = np.asarray(M.log_mel_spectrogram(audio, n_mels=n_mels))
    got = np.asarray(log_mel_spectrogram_pallas(audio, n_mels=n_mels, interpret=True))
    assert got.shape == ref.shape == (1, M.N_FRAMES, n_mels)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_pallas_mel_batched(rng):
    audio = (rng.standard_normal((2, M.SAMPLE_RATE)) * 0.2).astype(np.float32)
    ref = np.asarray(M.log_mel_spectrogram(audio, n_mels=80))
    got = np.asarray(log_mel_spectrogram_pallas(audio, n_mels=80, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)
