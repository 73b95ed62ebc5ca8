"""Decode-step time budget: where do the ~35 ms/step at B=32 go?

Times a 50-step scanned decode for ablated variants of the decoder block:
  full     — production block (vmap-DUS KV writes, int8 cross-KV)
  nowrite  — self-KV writes skipped (attention over the prefilled cache;
             wrong numerics, same reads) -> isolates the per-slot DUS cost
  noself   — self-attention (and its writes) removed entirely
  nocross  — cross-attention removed
  nomlp    — MLP removed
  novocab  — full block but skip the final vocab projection

Run on the TPU: python tools/microbench_decode.py [variants...]
Timing forces a device->host fetch (block_until_ready lies on axon).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(variants):
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from speaksense_tpu.utils.jaxsetup import init_compilation_cache

    init_compilation_cache()
    from speaksense_tpu.models import whisper as W

    dims = W.MODEL_DIMS["large-v3"]
    B, steps = 32, 50
    n_head = dims.n_text_head
    params = jax.tree.map(
        lambda x: jnp.asarray(x.astype(ml_dtypes.bfloat16) if x.ndim >= 2 else x),
        W.init_params_np(dims))

    L, H = dims.n_text_layer, dims.n_text_head
    Dh = dims.n_text_state // H
    A = dims.n_audio_ctx + 36  # 1536 lane-aligned
    rng = np.random.default_rng(0)
    cache0 = {
        "self_k": jnp.asarray(rng.standard_normal((L, B, H, Dh, dims.n_text_ctx)), jnp.bfloat16),
        "self_v": jnp.asarray(rng.standard_normal((L, B, H, Dh, dims.n_text_ctx)), jnp.bfloat16),
        "cross_k": jnp.asarray(rng.integers(-127, 127, (L, B, H, Dh, A)), jnp.int8),
        "cross_v": jnp.asarray(rng.integers(-127, 127, (L, B, H, Dh, A)), jnp.int8),
        "cross_k_scale": jnp.asarray(rng.random((L, B, H, Dh, 1)), jnp.float32),
        "cross_v_scale": jnp.asarray(rng.random((L, B, H, Dh, 1)), jnp.float32),
        "pos": jnp.full((B,), 16, jnp.int32),
    }

    def make_prod():
        """The production decode_step (deferred writes) under the same
        50-step scan — comparable against the ablation variants."""

        def run(params, cache):
            def body(carry, _):
                tok, cache = carry
                logits, cache = W.decode_step(params, dims, tok, cache)
                return (jnp.argmax(logits, axis=-1).astype(jnp.int32), cache), ()

            (tok, _), _ = jax.lax.scan(body, (jnp.zeros((B,), jnp.int32), cache),
                                       None, length=steps)
            return tok

        return jax.jit(run)

    def make_step(variant):
        if variant == "prod":
            return make_prod()
        do_self = variant not in ("noself",)
        do_write = variant not in ("nowrite", "noself")
        do_cross = variant != "nocross"
        do_mlp = variant != "nomlp"
        do_vocab = variant != "novocab"

        def block(carry, xs):
            x, pos, mask = carry
            bp = xs["bp"]
            sk, sv = xs["sk"], xs["sv"]
            if do_self:
                h = W._ln(x, bp["attn_ln"])
                q = W._split_heads(W._linear(h, bp["q"]), n_head)
                k_new = W._split_heads(W._linear(h, bp["k"]), n_head)
                v_new = W._split_heads(W._linear(h, bp["v"]), n_head)
                if do_write:
                    sk = W._write_kv(sk, k_new.astype(sk.dtype), pos)
                    sv = W._write_kv(sv, v_new.astype(sv.dtype), pos)
                attn = W._cached_attention(q, sk.astype(q.dtype), sv.astype(q.dtype), mask)
                x = x + W._linear(W._merge_heads(attn), bp["o"])
            if do_cross:
                h = W._ln(x, bp["cross_ln"])
                cq = W._split_heads(W._linear(h, bp["cq"]), n_head)
                cattn = W._cached_attention_q8(cq, xs["ck"], xs["cv"],
                                               xs["cks"], xs["cvs"], None)
                x = x + W._linear(W._merge_heads(cattn), bp["co"])
            if do_mlp:
                h = W._ln(x, bp["mlp_ln"])
                x = x + W._linear(jax.nn.gelu(W._linear(h, bp["fc1"]), approximate=False), bp["fc2"])
            return (x, pos, mask), {"sk": sk, "sv": sv}

        def step(params, tok, cache):
            p = params["decoder"]
            pos = cache["pos"]
            x = p["tok_emb"][tok][:, None, :] + p["pos"][pos][:, None, :].astype(jnp.bfloat16)
            k_idx = jnp.arange(dims.n_text_ctx)[None, None, None, :]
            mask = k_idx <= pos[:, None, None, None]
            xs = {"bp": p["blocks"], "sk": cache["self_k"], "sv": cache["self_v"],
                  "ck": cache["cross_k"], "cv": cache["cross_v"],
                  "cks": cache["cross_k_scale"], "cvs": cache["cross_v_scale"]}
            (x, _, _), out = jax.lax.scan(block, (x, pos, mask), xs)
            cache = {**cache, "self_k": out["sk"], "self_v": out["sv"], "pos": pos + 1}
            if do_vocab:
                logits = W._decoder_tail(params, x)[:, 0, :]
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                tok = jnp.argmax(x[:, 0, :64].astype(jnp.float32), axis=-1).astype(jnp.int32)
            return tok, cache

        def run(params, cache):
            def body(carry, _):
                tok, cache = carry
                return step(params, tok, cache), ()

            (tok, _), _ = jax.lax.scan(body, (jnp.zeros((B,), jnp.int32), cache),
                                       None, length=steps)
            return tok

        return jax.jit(run)

    for variant in variants:
        fn = make_step(variant)
        np.asarray(fn(params, cache0))  # compile + warmup
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(params, cache0))
            times.append(time.perf_counter() - t0)
        ms = min(times) / steps * 1e3
        print(f"{variant:8s} {ms:7.2f} ms/step", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["full", "nowrite", "noself", "nocross", "nomlp", "novocab"])
