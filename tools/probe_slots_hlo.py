"""Compiled-HLO ground truth for the slot-pool step program: bytes accessed
per step (settles where 31 ms/step goes — reads are only ~4.5 GB worth).
Run on the TPU; the program is already in the persistent compile cache."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import numpy as np
import ml_dtypes

from speaksense_tpu.utils.jaxsetup import init_compilation_cache
init_compilation_cache()
from speaksense_tpu.asr.engine import WhisperEngine
from speaksense_tpu.config import EngineConfig
from speaksense_tpu.models import whisper as W
from speaksense_tpu.models.tokenizer import Tokenizer
from speaksense_tpu.runtime.slots import SlotPool

dims = W.MODEL_DIMS["large-v3"]
params = jax.tree.map(lambda x: x.astype(ml_dtypes.bfloat16) if x.ndim >= 2 else x,
                      W.init_params_np(dims, seed=-1))
tok = Tokenizer.synthetic(dims.n_vocab)
engine = WhisperEngine(params, dims, tok, config=EngineConfig(cross_kv_int8=True))
pool = SlotPool(engine, n_slots=64, t_mel=512, max_new=96, int8_kv=True)

fn = pool._build_step(1)
lowered = jax.jit(fn.__wrapped__, donate_argnums=(2,)).lower(
    engine.params, pool.suppress, pool.state)
comp = lowered.compile()
ca = comp.cost_analysis()
ca = ca[0] if isinstance(ca, (list, tuple)) else ca
for k in sorted(ca):
    if "bytes" in k or "flops" in k or "optimal" in k:
        v = ca[k]
        print(f"{k:40s} {v/1e9:10.3f} G" if v > 1e6 else f"{k:40s} {v:10.1f}")
