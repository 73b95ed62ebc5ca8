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
    # MB_T: self-KV time-axis length (448 = full n_text_ctx history;
    # 256 = the headline bench's capped shape)
    T_self = int(os.environ.get("MB_T", "448"))
    n_head = dims.n_text_head
    params = jax.tree.map(
        lambda x: jnp.asarray(x.astype(ml_dtypes.bfloat16) if x.ndim >= 2 else x),
        W.init_params_np(dims))

    L, H = dims.n_text_layer, dims.n_text_head
    Dh = dims.n_text_state // H
    A = dims.n_audio_ctx + 36  # 1536 lane-aligned
    rng = np.random.default_rng(0)
    cache0 = {
        "self_k": jnp.asarray(rng.standard_normal((L, B, H, Dh, T_self)), jnp.bfloat16),
        "self_v": jnp.asarray(rng.standard_normal((L, B, H, Dh, T_self)), jnp.bfloat16),
        "cross_k": jnp.asarray(rng.integers(-127, 127, (L, B, H, Dh, A)), jnp.int8),
        "cross_v": jnp.asarray(rng.integers(-127, 127, (L, B, H, Dh, A)), jnp.int8),
        "cross_k_scale": jnp.asarray(rng.random((L, B, H, Dh, 1)), jnp.float32),
        "cross_v_scale": jnp.asarray(rng.random((L, B, H, Dh, 1)), jnp.float32),
        "pos": jnp.full((B,), 16, jnp.int32),
    }

    def make_prod(kv_write="dus", fuse=False):
        """The production decode_step (deferred writes) under the same
        50-step scan — comparable against the ablation variants.
        kv_write selects the batched self-KV write formulation; fuse runs
        with fuse_qkv_weights applied."""
        # device-place the fused entries: fuse_qkv_weights returns HOST numpy
        # for them, and numpy args re-upload per call through the remote
        # relay (~600 MB/iteration), corrupting the timing
        p = (jax.tree.map(jnp.asarray, W.fuse_qkv_weights(params))
             if fuse else params)

        def run(params, cache):
            def body(carry, _):
                tok, cache = carry
                logits, cache = W.decode_step(params, dims, tok, cache,
                                              kv_write=kv_write)
                return (jnp.argmax(logits, axis=-1).astype(jnp.int32), cache), ()

            (tok, _), _ = jax.lax.scan(body, (jnp.zeros((B,), jnp.int32), cache),
                                       None, length=steps)
            return tok

        fn = jax.jit(run)
        return lambda _params, cache: fn(p, cache)

    def make_ring(width=16):
        """Ring-buffered decode (production decode_step_ring + flush_ring):
        steps write a small (L,B,H,W,Dh) ring; the big-cache copy happens
        once per W steps. 48 steps = 3 chunks of 16 (timing divides by the
        global `steps`; 48 vs 50 biases the per-step number 4% HIGH —
        conservative)."""

        def run(params, cache):
            cache = W.arm_uniform_fill(cache, 16)  # pos starts at 16 in cache0

            def chunk(carry, _):
                tok, cache, ring = carry

                def body(c, _):
                    tok, cache, ring = c
                    logits, cache, ring = W.decode_step_ring(params, dims, tok,
                                                             cache, ring)
                    return (jnp.argmax(logits, axis=-1).astype(jnp.int32),
                            cache, ring), ()

                (tok, cache, ring), _ = jax.lax.scan(
                    body, (tok, cache, ring), None, length=width)
                cache, ring = W.flush_ring(cache, ring)
                return (tok, cache, ring), ()

            ring = W.init_ring(dims, B, width=width)
            (tok, _, _), _ = jax.lax.scan(
                chunk, (jnp.zeros((B,), jnp.int32), cache, ring),
                None, length=3)
            return tok

        return jax.jit(run)

    def make_scatter():
        """Self-contained alt-layout experiment: self-KV stored
        (L, H, Dh, B, T) — slot axis SECOND-minor — so the per-slot column
        write is ONE scatter into the flattened (B*T) axis at indices
        b*T + pos[b], instead of a serial B-iteration DUS loop. Attention
        reads use the (B, T)-unflattened view. Joint-column attention (no
        in-layer write), matching the production deferred path."""
        T = T_self
        L, H_, Dh_ = dims.n_text_layer, dims.n_text_head, dims.n_text_state // dims.n_text_head

        def block(carry, xs):
            x, pos = carry
            bp = xs["bp"]
            h = W._ln(x, bp["attn_ln"])
            q, k_new, v_new = W._qkv_proj(h, bp, n_head)  # (B,H,1,Dh)
            # joint attention over (H, Dh, B, T) cache
            sk, sv = xs["sk"], xs["sv"]  # (H, Dh, B, T)
            scale = q.shape[-1] ** -0.5
            logits = jnp.einsum("bhpd,hdbt->bhpt", q, sk.astype(q.dtype),
                                preferred_element_type=jnp.float32) * scale
            t_idx = jnp.arange(T)[None, None, None, :]
            logits = jnp.where(t_idx < pos[:, None, None, None], logits, -1e30)
            logit_self = jnp.sum(q.astype(jnp.float32) * k_new.astype(jnp.float32),
                                 axis=-1, keepdims=True) * scale
            joint = jax.nn.softmax(jnp.concatenate([logits, logit_self], axis=-1), axis=-1)
            wc, ws = joint[..., :T].astype(q.dtype), joint[..., T:]
            attn = jnp.einsum("bhpt,hdbt->bhpd", wc, sv.astype(q.dtype),
                              preferred_element_type=jnp.float32)
            attn = (attn + ws * v_new.astype(jnp.float32)).astype(q.dtype)
            x = x + W._linear(W._merge_heads(attn), bp["o"])
            h = W._ln(x, bp["cross_ln"])
            cq = W._split_heads(W._linear(h, bp["cq"]), n_head)
            cattn = W._cached_attention_q8(cq, xs["ck"], xs["cv"],
                                           xs["cks"], xs["cvs"], None)
            x = x + W._linear(W._merge_heads(cattn), bp["co"])
            h = W._ln(x, bp["mlp_ln"])
            x = x + W._linear(jax.nn.gelu(W._linear(h, bp["fc1"]), approximate=False), bp["fc2"])
            # emit new k/v as (H, Dh, B, 1) for the post-scan scatter
            out_k = jnp.transpose(k_new[:, :, 0, :], (1, 2, 0))[..., None]
            out_v = jnp.transpose(v_new[:, :, 0, :], (1, 2, 0))[..., None]
            return (x, pos), (out_k, out_v)

        def step(params, tok, cache):
            p = params["decoder"]
            pos = cache["pos"]
            x = p["tok_emb"][tok][:, None, :] + p["pos"][pos][:, None, :].astype(jnp.bfloat16)
            xs = {"bp": p["blocks"], "sk": cache["self_k"], "sv": cache["self_v"],
                  "ck": cache["cross_k"], "cv": cache["cross_v"],
                  "cks": cache["cross_k_scale"], "cvs": cache["cross_v_scale"]}
            (x, _), (k_new, v_new) = jax.lax.scan(block, (x, pos), xs)
            # ONE scatter for all (L, B): flatten (B, T) -> B*T, write column
            # b*T + pos[b]. k_new: (L, H, Dh, B, 1) -> updates (B,) columns.
            flat_idx = (jnp.arange(B) * T + pos)  # (B,)

            def wr(c, n):  # c (L,H,Dh,B,T), n (L,H,Dh,B,1)
                cf = c.reshape(L, H_, Dh_, B * T)
                cf = cf.at[..., flat_idx].set(n[..., 0])
                return cf.reshape(L, H_, Dh_, B, T)

            cache = {**cache, "self_k": wr(cache["self_k"], k_new),
                     "self_v": wr(cache["self_v"], v_new), "pos": pos + 1}
            logits = W._decoder_tail(params, x)[:, 0, :]
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

        def run(params, cache):
            # transpose self-KV into the (L, H, Dh, B, T) layout once
            cache = {**cache,
                     "self_k": jnp.transpose(cache["self_k"], (0, 2, 3, 1, 4)),
                     "self_v": jnp.transpose(cache["self_v"], (0, 2, 3, 1, 4))}

            def body(carry, _):
                tok, cache = carry
                return step(params, tok, cache), ()

            (tok, _), _ = jax.lax.scan(body, (jnp.zeros((B,), jnp.int32), cache),
                                       None, length=steps)
            return tok

        return jax.jit(run)

    def make_step(variant):
        if variant == "prod":
            return make_prod()
        if variant == "jnone":
            return make_prod(kv_write="none")
        if variant == "jselect":
            return make_prod(kv_write="select")
        if variant == "juniform":
            return make_prod(kv_write="uniform")
        if variant == "jscatter":
            return make_scatter()
        if variant == "fused":
            return make_prod(fuse=True)
        if variant == "jring":
            return make_ring()
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
            k_idx = jnp.arange(T_self)[None, None, None, :]
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
