"""Convert-once weight cache: ggml -> engine -> cached reload parity."""

import numpy as np

from speaksense_tpu.asr.engine import WhisperEngine
from speaksense_tpu.ckpt.ggml import GgmlModel, F16, ggml_tensors_from_params, write_ggml
from speaksense_tpu.config import EngineConfig
from speaksense_tpu.models.whisper import WhisperDims, init_params

DIMS = WhisperDims(
    n_mels=80, n_vocab=51865, n_audio_ctx=1500, n_audio_state=64,
    n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
    n_text_head=4, n_text_layer=2)


def test_from_ggml_with_cache(tmp_path, rng):
    params = init_params(DIMS)
    vocab = [b"t%d" % i for i in range(DIMS.n_vocab)]
    filters = rng.standard_normal((80, 201)).astype(np.float32)
    ggml_path = tmp_path / "model.bin"
    write_ggml(GgmlModel(dims=DIMS, ftype=F16, filters=filters, vocab=vocab,
                         tensors=ggml_tensors_from_params(params, DIMS)),
               str(ggml_path), ftype=F16)

    cfg = EngineConfig(compute_dtype="float32",
                       weight_cache_dir=str(tmp_path / "cache"))
    e1 = WhisperEngine.from_ggml(str(ggml_path), config=cfg)
    assert (tmp_path / "cache" / "model.cache.npz").is_file()

    # second load hits the cache and reproduces everything
    e2 = WhisperEngine.from_ggml(str(ggml_path), config=cfg)
    assert e2.dims == e1.dims
    assert e2.tokenizer.vocab[:100] == e1.tokenizer.vocab[:100]
    np.testing.assert_allclose(e2.mel_filters, e1.mel_filters)
    np.testing.assert_allclose(
        np.asarray(e2.params["decoder"]["tok_emb"]),
        np.asarray(e1.params["decoder"]["tok_emb"]), atol=1e-6)

    # touching the source invalidates the cache
    ggml_path.write_bytes(ggml_path.read_bytes() + b"x")
    from speaksense_tpu.ckpt import cache as CK

    assert CK.load_cached(str(ggml_path), cfg.weight_cache_dir) is None
