"""ggml container + quant codec tests (hermetic: writer fabricates files)."""

import io

import numpy as np
import pytest

from speaksense_tpu.ckpt import ggml as G
from speaksense_tpu.models.whisper import WhisperDims, init_params
from speaksense_tpu.ckpt.ggml import (
    GgmlModel, load_ggml, write_ggml, params_from_ggml, ggml_tensors_from_params,
)

TINY_DIMS = WhisperDims(
    n_mels=80, n_vocab=128, n_audio_ctx=1500, n_audio_state=64,
    n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
    n_text_head=4, n_text_layer=2,
)


@pytest.mark.parametrize("ttype,tol", [
    (G.F32, 0.0),
    (G.F16, 1e-3),
    (G.Q8_0, 0.01),
    (G.Q5_0, 0.05),
    (G.Q5_1, 0.05),
    (G.Q4_0, 0.12),
    (G.Q4_1, 0.10),
])
def test_quant_roundtrip(ttype, tol, rng):
    x = rng.standard_normal(32 * 64).astype(np.float32)
    blob = G.quantize(x, ttype)
    assert len(blob) == G._quant_nbytes(ttype, x.size)
    y = G.dequantize(blob, ttype, x.size)
    if ttype == G.F32:
        np.testing.assert_array_equal(x, y)
    else:
        err = np.abs(x - y).max()
        assert err < max(tol, tol * np.abs(x).max()), f"max err {err}"


@pytest.mark.parametrize("ftype", [G.F32, G.F16, G.Q5_1, G.Q8_0])
def test_container_roundtrip(ftype, rng):
    params = init_params(TINY_DIMS)
    tensors = ggml_tensors_from_params(params, TINY_DIMS)
    vocab = [b"tok%d" % i for i in range(TINY_DIMS.n_vocab)]
    filters = rng.standard_normal((80, 201)).astype(np.float32)
    model = GgmlModel(dims=TINY_DIMS, ftype=ftype, filters=filters, vocab=vocab, tensors=tensors)

    buf = io.BytesIO()
    write_ggml(model, buf, ftype=ftype)
    buf.seek(0)
    loaded = load_ggml(buf)

    assert loaded.dims == TINY_DIMS
    assert loaded.vocab == vocab
    np.testing.assert_allclose(loaded.filters, filters)
    assert set(loaded.tensors) == set(tensors)
    tol = {G.F32: 1e-7, G.F16: 2e-3, G.Q5_1: 0.1, G.Q8_0: 0.05}[ftype]
    for name, arr in tensors.items():
        got = loaded.tensors[name]
        assert got.shape == arr.shape, name
        scale = max(1.0, float(np.abs(arr).max()))
        assert np.abs(got - np.asarray(arr)).max() < tol * scale, name


def test_params_mapping_roundtrip():
    """pytree -> ggml tensors -> pytree is the identity (f32)."""
    import jax

    params = init_params(TINY_DIMS)
    tensors = ggml_tensors_from_params(params, TINY_DIMS)
    model = GgmlModel(dims=TINY_DIMS, ftype=G.F32, filters=np.zeros((80, 201), np.float32),
                      vocab=[b"x"] * TINY_DIMS.n_vocab, tensors=tensors)
    back = params_from_ggml(model)
    flat1 = jax.tree.leaves(params)
    flat2 = jax.tree.leaves(back)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-7)


def test_vocab_padding(rng):
    """Files with fewer vocab entries than hparams.n_vocab get padded
    (whisper.cpp behavior for speech-only vocab files)."""
    params = init_params(TINY_DIMS)
    tensors = ggml_tensors_from_params(params, TINY_DIMS)
    model = GgmlModel(dims=TINY_DIMS, ftype=G.F32, filters=np.zeros((80, 201), np.float32),
                      vocab=[b"t%d" % i for i in range(100)], tensors=tensors)
    buf = io.BytesIO()
    write_ggml(model, buf)
    buf.seek(0)
    loaded = load_ggml(buf)
    assert len(loaded.vocab) == TINY_DIMS.n_vocab
    assert loaded.vocab[99] == b"t99"
    assert loaded.vocab[127] == b"[_extra_token_127]"
