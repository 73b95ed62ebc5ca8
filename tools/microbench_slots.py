"""Slot-pool serving profile: how much of the 64-stream serving benchmark
goes to admissions (per-window encode+prefill+scatter) vs pool decode steps
vs retirement fetches?

Times each program in isolation on the real chip:
  admit  — one-window admission into a slot (encode t_mel=512 + cross-KV +
           prefill + scatter), averaged over the pool's slots
  step   — one pool-wide decode step (S slots), no retirement fetch
  retire — the device->host fetch of the active mask + token state

Run: python tools/microbench_slots.py [S] [t_mel] [max_new]
Timing forces a device->host fetch (block_until_ready lies on axon).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv):
    S = int(argv[0]) if argv else 64
    t_mel = int(argv[1]) if len(argv) > 1 else 512
    max_new = int(argv[2]) if len(argv) > 2 else 96

    import jax
    import ml_dtypes

    from speaksense_tpu.utils.jaxsetup import init_compilation_cache

    init_compilation_cache()

    from speaksense_tpu.asr.engine import WhisperEngine
    from speaksense_tpu.config import EngineConfig
    from speaksense_tpu.models import whisper as W
    from speaksense_tpu.models.tokenizer import Tokenizer
    from speaksense_tpu.runtime.slots import SlotPool, _StreamJob

    dims = W.MODEL_DIMS[os.environ.get("BENCH_MODEL", "large-v3")]
    params = jax.tree.map(
        lambda x: x.astype(ml_dtypes.bfloat16) if x.ndim >= 2 else x,
        W.init_params_np(dims))
    tok = Tokenizer.synthetic(dims.n_vocab)
    engine = WhisperEngine(params, dims, tok,
                           config=EngineConfig(cross_kv_int8=True))
    int8 = os.environ.get("SLOTS_INT8", "1") not in ("", "0", "false")
    pool = SlotPool(engine, n_slots=S, t_mel=t_mel, max_new=max_new,
                    int8_kv=int8)
    print(f"int8_kv={int8}", flush=True)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((t_mel, dims.n_mels)).astype(np.float32)
    prompt = tok.sot_sequence("en")

    def fetch():
        # bound all enqueued work with a tiny device->host fetch
        np.asarray(pool.state["pos"])

    # --- admit: warm then time a filling sweep -----------------------------
    pool.admit(_StreamJob(mel, prompt))
    fetch()
    n_adm = min(S - 1, 16)
    t0 = time.perf_counter()
    for _ in range(n_adm):
        pool.admit(_StreamJob(mel, prompt))
    fetch()
    admit_ms = (time.perf_counter() - t0) / n_adm * 1e3
    print(f"admit   {admit_ms:7.2f} ms/window  (S={S}, t_mel={t_mel})", flush=True)

    # --- batched admit (bucket of 8 in one dispatch) ------------------------
    pool.admit_many([_StreamJob(mel, prompt) for _ in range(8)])
    fetch()
    t0 = time.perf_counter()
    for _ in range(3):
        pool.admit_many([_StreamJob(mel, prompt) for _ in range(8)])
    fetch()
    badm_ms = (time.perf_counter() - t0) / 3 * 1e3
    print(f"admit8  {badm_ms:7.2f} ms/batch   ({badm_ms / 8:.2f} ms/window)", flush=True)

    # --- step: warm BOTH program variants (flush every W steps), then time --
    Wr = pool.ring_width
    for _ in range(Wr + 1):  # covers (k=1, no-flush) AND (k=1, flush)
        pool.step(retire=False)
    fetch()
    n_steps = 32
    t0 = time.perf_counter()
    for _ in range(n_steps):
        pool.step(retire=False)
    fetch()
    step_ms = (time.perf_counter() - t0) / n_steps * 1e3
    print(f"step    {step_ms:7.2f} ms/step    ({pool.n_active} active slots)", flush=True)

    # --- multi-step dispatch (k steps scanned per jit call) -----------------
    for k in (4, 8, 16):
        while pool.ring_fill:  # align to a chunk boundary: step() clamps
            pool.step(retire=False, k=1)  # k to W - fill, so a misaligned
        fetch()                # start compiles extra (k', flush) variants
        for _ in range(max(1, Wr // k) + 1):  # warm no-flush + flush variants
            pool.step(retire=False, k=k)
        fetch()
        n_calls = max(2, 2 * Wr // k)
        t0 = time.perf_counter()
        for _ in range(n_calls):
            pool.step(retire=False, k=k)
        fetch()
        k_ms = (time.perf_counter() - t0) / n_calls / k * 1e3
        print(f"step k={k:2d} {k_ms:6.2f} ms/step", flush=True)

    # --- retire fetch cost --------------------------------------------------
    t0 = time.perf_counter()
    for _ in range(5):
        pool.retire_finished()
    retire_ms = (time.perf_counter() - t0) / 5 * 1e3
    print(f"retire  {retire_ms:7.2f} ms/poll", flush=True)

    per_chunk = max_new * step_ms / S + admit_ms
    agg = (t_mel * 160 / 16000.0) / (per_chunk / 1e3)
    print(f"implied per-chunk cost {per_chunk:.1f} ms -> aggregate ~{agg:.0f}x realtime",
          flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
