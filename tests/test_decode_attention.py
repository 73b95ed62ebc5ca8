"""Pallas decode-attention kernels vs the XLA reference (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from speaksense_tpu.models.whisper import _cached_attention
from speaksense_tpu.ops.decode_attention import (
    decode_cross_attention, decode_self_attention,
)


def _ref(q, k, v, lengths=None):
    """XLA reference over time-minor KV with optional per-slot lengths."""
    B, H, Dh = q.shape
    T = k.shape[-1]
    if lengths is None:
        mask = None
    else:
        t_idx = np.arange(T)[None, None, None, :]
        mask = jnp.asarray(t_idx < np.asarray(lengths)[:, None, None, None])
    out = _cached_attention(jnp.asarray(q)[:, :, None, :], jnp.asarray(k),
                            jnp.asarray(v), mask)
    return np.asarray(out)[:, :, 0, :]


def test_cross_attention_matches(rng):
    B, H, Dh, A = 2, 4, 64, 256
    q = rng.standard_normal((B, H, Dh)).astype(np.float32)
    k = rng.standard_normal((B, H, Dh, A)).astype(np.float32)
    v = rng.standard_normal((B, H, Dh, A)).astype(np.float32)
    got = np.asarray(decode_cross_attention(jnp.asarray(q), jnp.asarray(k),
                                            jnp.asarray(v), interpret=True))
    np.testing.assert_allclose(got, _ref(q, k, v), atol=2e-5, rtol=1e-5)


def test_cross_attention_padding_masked(rng):
    B, H, Dh, A = 1, 2, 64, 128
    q = rng.standard_normal((B, H, Dh)).astype(np.float32)
    k = rng.standard_normal((B, H, Dh, A)).astype(np.float32)
    v = rng.standard_normal((B, H, Dh, A)).astype(np.float32)
    a_valid = 100
    got = np.asarray(decode_cross_attention(jnp.asarray(q), jnp.asarray(k),
                                            jnp.asarray(v), a_valid=a_valid,
                                            interpret=True))
    ref = _ref(q, k[..., :a_valid], v[..., :a_valid])
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)
    # padding contents must not matter
    k2 = k.copy(); k2[..., a_valid:] = 1e3
    got2 = np.asarray(decode_cross_attention(jnp.asarray(q), jnp.asarray(k2),
                                             jnp.asarray(v), a_valid=a_valid,
                                             interpret=True))
    np.testing.assert_allclose(got2, got, atol=1e-6)


def test_self_attention_per_slot_lengths(rng):
    B, H, Dh, T = 3, 2, 64, 128
    q = rng.standard_normal((B, H, Dh)).astype(np.float32)
    k = rng.standard_normal((B, H, Dh, T)).astype(np.float32)
    v = rng.standard_normal((B, H, Dh, T)).astype(np.float32)
    lengths = np.asarray([5, 64, 128], np.int32)
    got = np.asarray(decode_self_attention(jnp.asarray(q), jnp.asarray(k),
                                           jnp.asarray(v), jnp.asarray(lengths),
                                           interpret=True))
    ref = _ref(q, k, v, lengths=lengths)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)
