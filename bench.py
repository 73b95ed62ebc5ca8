"""Headline benchmark: large-v3 real-time factor per chip.

Measures the serving-shaped workload — batched 30 s window encode + cross-KV
+ prompt prefill + a fixed 200-token decode per window (a realistic long-form
token budget) — and reports audio-seconds transcribed per wall-second per
chip. The reference publishes no numbers (BASELINE.md); the north star from
BASELINE.json is >30x real-time per chip on large-v3, so vs_baseline is
value / 30.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    model_name = os.environ.get("BENCH_MODEL", "large-v3")
    batch = int(os.environ.get("BENCH_BATCH", "32"))  # best measured config (PERF.md)
    decode_tokens = int(os.environ.get("BENCH_DECODE_TOKENS", "200"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))

    import jax
    import jax.numpy as jnp

    from speaksense_tpu.utils.jaxsetup import init_compilation_cache

    init_compilation_cache()

    from speaksense_tpu.models import whisper as W

    dims = W.MODEL_DIMS[model_name]
    import ml_dtypes

    params = jax.tree.map(
        lambda x: jnp.asarray(x.astype(ml_dtypes.bfloat16) if x.ndim >= 2 else x),
        W.init_params_np(dims))
    prompt_len = 3

    int8_kv = os.environ.get("BENCH_INT8_KV", "1") not in ("", "0", "false")

    def window_step(params, mel, prompt):
        """encode + cross-KV + prefill + fixed-length decode (the per-window
        serving pipeline, minus host-side logit rules which are O(vocab) adds)."""
        enc = W.encode(params, dims, mel)
        cache = W.init_cache(dims, mel.shape[0], enc.shape[1], dtype=jnp.bfloat16)
        ck, cv = W.compute_cross_kv(params, dims, enc, dtype=jnp.bfloat16)
        if int8_kv:
            kq, vq, ks, vs = W.quantize_cross_kv(ck, cv)
            cache = {**cache, "cross_k": kq, "cross_v": vq,
                     "cross_k_scale": ks, "cross_v_scale": vs}
        else:
            cache = {**cache, "cross_k": ck, "cross_v": cv}
        logits, cache = W.decode_prefill(params, dims, prompt, cache)
        tok0 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)

        def body(carry, _):
            tok, cache = carry
            logits, cache = W.decode_step(params, dims, tok, cache)
            return (jnp.argmax(logits, axis=-1).astype(jnp.int32), cache), ()

        (tok, _), _ = jax.lax.scan(body, (tok0, cache), None, length=decode_tokens)
        return tok

    fn = jax.jit(window_step)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, 3000, dims.n_mels)).astype(np.float32), jnp.bfloat16)
    prompt = jnp.zeros((batch, prompt_len), jnp.int32)

    # compile + warmup
    jax.block_until_ready(fn(params, mel, prompt))

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(params, mel, prompt))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    audio_seconds = batch * 30.0
    rtf = audio_seconds / dt

    print(json.dumps({
        "metric": f"{model_name} batched transcription real-time factor (audio-s/s/chip, "
                  f"B={batch}, {decode_tokens} tok/window"
                  f"{', int8 cross-KV' if int8_kv else ''})",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 30.0, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
