"""Engine-level beam decoding (fallback disabled so beam path is exercised)."""

import numpy as np
import pytest

from speaksense_tpu.asr.engine import WhisperEngine
from speaksense_tpu.config import EngineConfig
from speaksense_tpu.models.whisper import WhisperDims, init_params
from speaksense_tpu.models.tokenizer import Tokenizer

DIMS = WhisperDims(
    n_mels=80, n_vocab=51865, n_audio_ctx=1500, n_audio_state=64,
    n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
    n_text_head=4, n_text_layer=2)


def test_decode_windows_beam(rng):
    import jax

    params = init_params(DIMS, jax.random.PRNGKey(0))
    tok = Tokenizer.synthetic(DIMS.n_vocab)
    cfg = EngineConfig(compute_dtype="float32", logprob_thold=-1e9, entropy_thold=-1.0,
                       compression_ratio_thold=1e9)
    eng = WhisperEngine(params, DIMS, tok, config=cfg)
    mels = eng.compute_mel((rng.standard_normal((2, 16000)) * 0.1).astype(np.float32))
    out = eng.decode_windows(mels, "en", beam_size=3, max_new_tokens=12)
    assert len(out) == 2
    for r in out:
        assert r["temperature"] == 0.0
        assert isinstance(r["text"], str)
        assert r["n_sampled"] <= 12
