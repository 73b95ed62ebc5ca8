"""Numerical parity of the JAX Whisper against torch/transformers.

A random-weight torch WhisperModel (tiny-like dims, built offline from a
config — no network) is converted via ckpt/hf.py and encoder/decoder outputs
are compared. This is the correctness anchor the reference lacked
(SURVEY.md §4: 'numerical parity tests ... which the reference never needed
because it trusted whisper.cpp').
"""

import numpy as np
import pytest

import jax.numpy as jnp

from speaksense_tpu.models import whisper as W
from speaksense_tpu.ckpt.hf import params_from_hf_state_dict, dims_from_hf_config

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


TINY = dict(
    vocab_size=51865, num_mel_bins=80, d_model=64,
    encoder_layers=2, encoder_attention_heads=4,
    decoder_layers=2, decoder_attention_heads=4,
    encoder_ffn_dim=256, decoder_ffn_dim=256,
    max_source_positions=1500, max_target_positions=448,
)


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    cfg = transformers.WhisperConfig(**TINY)
    model = transformers.WhisperModel(cfg).eval()
    return model


@pytest.fixture(scope="module")
def jax_params(torch_model):
    dims = dims_from_hf_config(torch_model.config)
    return params_from_hf_state_dict(torch_model.state_dict(), dims), dims


def test_encoder_parity(torch_model, jax_params, rng):
    params, dims = jax_params
    mel = rng.standard_normal((2, 3000, dims.n_mels)).astype(np.float32)
    with torch.no_grad():
        ref = torch_model.encoder(torch.from_numpy(mel.transpose(0, 2, 1))).last_hidden_state.numpy()
    ours = np.asarray(W.encode(params, dims, jnp.asarray(mel)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_decoder_parity_teacher_forced(torch_model, jax_params, rng):
    params, dims = jax_params
    mel = rng.standard_normal((1, 3000, dims.n_mels)).astype(np.float32)
    tokens = rng.integers(0, dims.n_vocab, size=(1, 12)).astype(np.int32)
    with torch.no_grad():
        enc = torch_model.encoder(torch.from_numpy(mel.transpose(0, 2, 1))).last_hidden_state
        dec = torch_model.decoder(
            input_ids=torch.from_numpy(tokens.astype(np.int64)),
            encoder_hidden_states=enc,
        ).last_hidden_state
        ref_logits = (dec @ torch_model.decoder.embed_tokens.weight.T).numpy()
    enc_ours = W.encode(params, dims, jnp.asarray(mel))
    ours = np.asarray(W.decode_logits(params, dims, jnp.asarray(tokens), enc_ours))
    np.testing.assert_allclose(ours, ref_logits, atol=5e-3, rtol=1e-2)


def test_incremental_decode_matches_teacher_forced(jax_params, rng):
    """decode_prefill + decode_step must reproduce full teacher-forced logits
    (cache-write & mask correctness, incl. slots at different offsets)."""
    params, dims = jax_params
    B, P, S = 2, 5, 4
    mel = rng.standard_normal((B, 3000, dims.n_mels)).astype(np.float32)
    tokens = rng.integers(0, dims.n_vocab, size=(B, P + S)).astype(np.int32)

    enc = W.encode(params, dims, jnp.asarray(mel))
    full = np.asarray(W.decode_logits(params, dims, jnp.asarray(tokens), enc))

    cache = W.init_cache(dims, B, enc.shape[1], dtype=jnp.float32)
    ck, cv = W.compute_cross_kv(params, dims, enc, dtype=jnp.float32)
    cache = {**cache, "cross_k": ck, "cross_v": cv}
    logits_p, cache = W.decode_prefill(params, dims, jnp.asarray(tokens[:, :P]), cache)
    np.testing.assert_allclose(np.asarray(logits_p), full[:, :P], atol=2e-3, rtol=1e-2)
    for s in range(S):
        logits_s, cache = W.decode_step(params, dims, jnp.asarray(tokens[:, P + s]), cache)
        np.testing.assert_allclose(np.asarray(logits_s), full[:, P + s], atol=2e-3, rtol=1e-2)
