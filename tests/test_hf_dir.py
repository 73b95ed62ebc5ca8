"""HF-directory checkpoint loading: hand-rolled safetensors parser + engine."""

import json
import struct

import numpy as np
import pytest

from speaksense_tpu.ckpt.hf_dir import read_safetensors, load_hf_dir

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

TINY = dict(
    vocab_size=51865, num_mel_bins=80, d_model=64,
    encoder_layers=2, encoder_attention_heads=4,
    decoder_layers=2, decoder_attention_heads=4,
    encoder_ffn_dim=256, decoder_ffn_dim=256,
    max_source_positions=1500, max_target_positions=448,
)


def _write_safetensors(path, tensors):
    header = {}
    blobs = []
    offset = 0
    for name, arr in tensors.items():
        raw = np.ascontiguousarray(arr).astype("<f4").tobytes()
        header[name] = {"dtype": "F32", "shape": list(arr.shape),
                        "data_offsets": [offset, offset + len(raw)]}
        blobs.append(raw)
        offset += len(raw)
    hjson = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for b in blobs:
            f.write(b)


def test_read_safetensors_roundtrip(tmp_path, rng):
    tensors = {"a": rng.standard_normal((3, 4)).astype(np.float32),
               "b": rng.standard_normal((7,)).astype(np.float32)}
    p = tmp_path / "t.safetensors"
    _write_safetensors(p, tensors)
    got = read_safetensors(p)
    for k, v in tensors.items():
        np.testing.assert_allclose(got[k], v)


def test_load_hf_dir_matches_torch(tmp_path, rng):
    torch.manual_seed(0)
    cfg = transformers.WhisperConfig(**TINY)
    model = transformers.WhisperModel(cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    _write_safetensors(tmp_path / "model.safetensors", sd)
    (tmp_path / "config.json").write_text(json.dumps(TINY))

    params, dims = load_hf_dir(tmp_path)
    assert dims.n_audio_layer == 2 and dims.n_vocab == 51865

    import jax.numpy as jnp

    from speaksense_tpu.models import whisper as W

    mel = rng.standard_normal((1, 3000, dims.n_mels)).astype(np.float32)
    with torch.no_grad():
        ref = model.encoder(torch.from_numpy(mel.transpose(0, 2, 1))).last_hidden_state.numpy()
    ours = np.asarray(W.encode(params, dims, jnp.asarray(mel)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)
