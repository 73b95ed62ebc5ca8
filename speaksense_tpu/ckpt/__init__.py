"""Checkpoint loading: ggml (whisper.cpp format, incl. quantized variants),
HuggingFace state dicts, and a convert-once on-disk cache.

Replaces the reference's model loading path (whisper.cpp's ggml loader, used
via WhisperContext::new_with_params at /root/reference/src/asr/whisper.rs:23)
with parsers that map weights directly into the JAX parameter pytree defined
in models/whisper.py.
"""

from speaksense_tpu.ckpt.ggml import load_ggml, write_ggml, GgmlModel  # noqa: F401
from speaksense_tpu.ckpt.hf import params_from_hf_state_dict, dims_from_hf_config  # noqa: F401
