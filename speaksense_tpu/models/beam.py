"""Batched beam-search decoding (beam_size=5 per the reference's
SamplingStrategy and the BASELINE config 4 target; whisper.cpp's beam decoder
is configured at /root/reference/src/asr/whisper.rs:132 via best_of/beam).

TPU-first design:
- one jitted `lax.while_loop` decodes ALL batch rows x beams together;
- cross-attention K/V is stored once per batch row, (L, B, H, A, Dh), and
  beams index it via einsum — NOT replicated per beam (for large-v3 a
  replicated cross-KV at B=8, K=5 would be ~10 GB);
- self-attention KV lives as (L, B*K, H, T, Dh) and is physically reordered
  by parent-beam gather each step (decode lengths are short, so the gather
  traffic is bounded; a pointer-chased paged variant is the planned
  optimization);
- finished hypotheses are frozen: their only continuation is EOT at zero
  added logprob, so the joint top-k stays well-defined under jit.

Final selection follows whisper's default (length_penalty None/-1):
total logprob / (length + 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from speaksense_tpu.models import whisper as W
from speaksense_tpu.models.decode import NEG_INF, RuleConfig, apply_logit_rules

Params = dict


def _beam_block_factory(dims: W.WhisperDims, B: int, K: int):
    """Decoder block for (B*K, 1, d) steps with beam-shared cross KV.

    Self-KV writes are DEFERRED (joint-column attention, k/v emitted as scan
    outputs and written batched after the scan) — the per-layer vmap-DUS
    would serialize over B*K rows (see PERF.md decode-step ablation)."""
    n_head = dims.n_text_head

    def block(carry, xs):
        x, pos, mask = carry  # x (BK, 1, d); pos (BK,); mask (BK,1,1,T)
        bp, sk, sv, ck, cv = xs  # sk/sv (BK,H,Dh,T); ck/cv (B,H,Dh,A)
        h = W._ln(x, bp["attn_ln"])
        q, k_new, v_new = W._qkv_proj(h, bp, n_head)
        attn = W._joint_decode_attention(q, sk.astype(q.dtype), sv.astype(q.dtype),
                                         k_new, v_new, mask)
        x = x + W._linear(W._merge_heads(attn), bp["o"])
        # cross-attention: beams share their batch row's encoder KV
        h = W._ln(x, bp["cross_ln"])
        cq = W._split_heads(W._linear(h, bp["cq"]), n_head)  # (BK, H, 1, Dh)
        cqb = cq.reshape(B, K, n_head, cq.shape[-1])          # (B, K, H, Dh)
        scale = cq.shape[-1] ** -0.5
        # cross KV is time-minor: (B, H, Dh, A)
        logits = jnp.einsum("bkhd,bhda->bkha", cqb, ck.astype(cqb.dtype),
                            preferred_element_type=jnp.float32) * scale
        weights = jax.nn.softmax(logits, axis=-1).astype(cqb.dtype)
        ctx = jnp.einsum("bkha,bhda->bkhd", weights, cv.astype(cqb.dtype),
                         preferred_element_type=jnp.float32).astype(cqb.dtype)
        ctx = ctx.reshape(B * K, n_head, 1, ctx.shape[-1])
        x = x + W._linear(W._merge_heads(ctx), bp["co"])
        h = W._ln(x, bp["mlp_ln"])
        x = x + W._linear(jax.nn.gelu(W._linear(h, bp["fc1"]), approximate=False), bp["fc2"])
        return (x, pos, mask), (jnp.swapaxes(k_new, -1, -2).astype(sk.dtype),
                                jnp.swapaxes(v_new, -1, -2).astype(sv.dtype))

    return block


def beam_decode(params: Params, dims: W.WhisperDims, cfg: RuleConfig,
                suppress_mask: jax.Array, enc_out: jax.Array, prompt: jax.Array,
                beam_size: int = 5, prompt_len: jax.Array | None = None,
                sot_index: int | jax.Array = 0):
    """Beam-search one batch of windows.

    enc_out: (B, A, d) encoder states; prompt: (B, P) int32. Variable-length
    prompts (previous-text conditioning) are RIGHT-padded with prompt_len (B,)
    marking true lengths, same contract as decode.transcribe_window;
    sot_index (B,) locates <|sot|> per row for the no-speech probability.
    Returns dict(tokens (B, max_new), n_sampled (B,), sum_logprob (B,),
    avg_logprob (B,), no_speech_prob (B,)) for the best hypothesis per row.
    """
    B, A, _ = enc_out.shape
    K = beam_size
    P = prompt.shape[1]
    L = cfg.max_new_tokens
    dtype = params["decoder"]["tok_emb"].dtype

    # prompt prefill at beam granularity: replicate rows K-fold.
    # Cap the self-KV time axis at the actual token budget (prompt + max_new,
    # 128-lane aligned): every step physically reorders self-KV by parent
    # beam (the take() below), so the gather traffic scales with T — a 30 s
    # window never decodes n_text_ctx=448 positions here.
    t_cap = min(dims.n_text_ctx, -(-(P + L) // 128) * 128)
    cache = W.init_cache(dims, B * K, A, dtype=dtype, t_text=t_cap)
    ck, cv = W.compute_cross_kv(params, dims, enc_out, dtype=dtype)  # (L,B,H,A,Dh)
    rep = lambda x: jnp.repeat(x, K, axis=1)
    cache_rep = {**cache, "cross_k": rep(ck), "cross_v": rep(cv)}
    prompt_rep = jnp.repeat(prompt, K, axis=0)
    pl_rep = None if prompt_len is None else jnp.repeat(prompt_len, K, axis=0)
    prefill_logits, cache_rep = W.decode_prefill(params, dims, prompt_rep, cache_rep,
                                                 prompt_len=pl_rep)
    sot_idx = jnp.broadcast_to(jnp.asarray(sot_index, jnp.int32), (B,))
    sot_logits = prefill_logits[::K][jnp.arange(B), sot_idx].astype(jnp.float32)
    no_speech_prob = jax.nn.softmax(sot_logits, axis=-1)[:, cfg.no_speech]
    last_idx = (jnp.broadcast_to(jnp.asarray(P if prompt_len is None else pl_rep),
                                 (B * K,)) - 1).astype(jnp.int32)
    first_logits = prefill_logits[jnp.arange(B * K), last_idx]

    block = _beam_block_factory(dims, B, K)

    def run_blocks(tok, cache, fill):
        """One decode step for all B*K rows. UNIFORM-FILL layout: generated
        KV packs at [P, P + fill) — `fill` is the (scalar) step counter, the
        same for every beam — so the deferred self-KV write is ONE batchwide
        DUS at a scalar offset (the per-row DUS loop serializes over B*K
        rows, PERF.md). The padded prompt gap [prompt_len, P) stays masked."""
        pos = cache["pos"]
        x = (params["decoder"]["tok_emb"][tok][:, None, :]
             + params["decoder"]["pos"][pos][:, None, :].astype(dtype))
        t_idx = jnp.arange(cache["self_k"].shape[-1])[None, None, None, :]
        mask = ((t_idx < (pos - fill)[:, None, None, None])
                | ((t_idx >= P) & (t_idx < P + fill)))
        (x, _, _), (k_new, v_new) = jax.lax.scan(
            block, (x, pos, mask),
            (params["decoder"]["blocks"], cache["self_k"], cache["self_v"], ck, cv))

        # one batched cross-layer KV write (k_new/v_new: (L, BK, H, Dh, 1))
        z = jnp.zeros((), jnp.int32)
        at = P + fill
        cache = {**cache,
                 "self_k": jax.lax.dynamic_update_slice(
                     cache["self_k"], k_new, (z, z, z, z, at)),
                 "self_v": jax.lax.dynamic_update_slice(
                     cache["self_v"], v_new, (z, z, z, z, at)),
                 "pos": pos + 1}
        return W._decoder_tail(params, x)[:, 0, :], cache

    # drop replicated cross KV from the live cache (beam blocks use ck/cv)
    live_cache = {k: v for k, v in cache_rep.items() if not k.startswith("cross_")}

    init_scores = jnp.tile(jnp.where(jnp.arange(K) == 0, 0.0, NEG_INF)[None, :], (B, 1))
    state = dict(
        step=jnp.array(0, jnp.int32),
        logits=first_logits,                     # (BK, V)
        cache=live_cache,
        tokens=jnp.full((B, K, L), cfg.eot, jnp.int32),
        scores=init_scores,                      # (B, K) cumulative logprob
        n_sampled=jnp.zeros((B, K), jnp.int32),
        last=jnp.zeros((B, K), jnp.int32),
        penult=jnp.zeros((B, K), jnp.int32),
        last_ts=jnp.zeros((B, K), jnp.int32),
        finished=jnp.zeros((B, K), bool),
    )

    V = dims.n_vocab

    def cond(s):
        return (s["step"] < L) & ~jnp.all(s["finished"])

    def body(s):
        flat = lambda x: x.reshape(B * K, *x.shape[2:])
        filtered = apply_logit_rules(s["logits"], cfg, suppress_mask,
                                     flat(s["n_sampled"]), flat(s["last"]),
                                     flat(s["penult"]), flat(s["last_ts"]))
        logprobs = jax.nn.log_softmax(filtered, axis=-1).reshape(B, K, V)
        # frozen beams: only EOT continuation at 0 added logprob
        eot_only = jnp.full((V,), NEG_INF).at[cfg.eot].set(0.0)
        logprobs = jnp.where(s["finished"][:, :, None], eot_only[None, None, :], logprobs)
        joint = s["scores"][:, :, None] + logprobs          # (B, K, V)
        top_scores, top_idx = jax.lax.top_k(joint.reshape(B, K * V), K)
        parent = top_idx // V                                # (B, K)
        tok = (top_idx % V).astype(jnp.int32)                # (B, K)

        gather_bk = lambda x: jnp.take_along_axis(x, parent, axis=1)
        tokens = jnp.take_along_axis(s["tokens"], parent[:, :, None], axis=1)
        step = s["step"]
        tokens = jax.vmap(lambda t, tk: t.at[:, step].set(tk))(tokens, tok)

        was_finished = gather_bk(s["finished"])
        newly = ~was_finished & (tok == cfg.eot)
        upd = ~was_finished & ~newly

        n_sampled = gather_bk(s["n_sampled"]) + upd.astype(jnp.int32)
        last_prev = gather_bk(s["last"])
        last = jnp.where(upd, tok, last_prev)
        penult = jnp.where(upd, last_prev, gather_bk(s["penult"]))
        is_ts = tok >= cfg.ts_begin
        last_ts = jnp.where(upd & is_ts, tok, gather_bk(s["last_ts"]))
        finished = was_finished | newly

        # reorder self-KV by parent beam (global row index b*K + parent)
        rows = (jnp.arange(B)[:, None] * K + parent).reshape(-1)  # (BK,)
        cache = s["cache"]
        cache = {
            "self_k": jnp.take(cache["self_k"], rows, axis=1),
            "self_v": jnp.take(cache["self_v"], rows, axis=1),
            "pos": jnp.take(cache["pos"], rows, axis=0),
        }
        logits, cache = run_blocks(tok.reshape(-1), cache, s["step"])

        return dict(step=step + 1, logits=logits, cache=cache, tokens=tokens,
                    scores=top_scores, n_sampled=n_sampled, last=last,
                    penult=penult, last_ts=last_ts, finished=finished)

    out = jax.lax.while_loop(cond, body, state)

    # pick best hypothesis: avg logprob over (length + 1)
    denom = (out["n_sampled"] + 1).astype(jnp.float32)
    avg = out["scores"] / denom
    best = jnp.argmax(avg, axis=1)                           # (B,)
    take = lambda x: jnp.take_along_axis(x, best[:, None], axis=1)[:, 0]
    tokens = jnp.take_along_axis(out["tokens"], best[:, None, None], axis=1)[:, 0]
    return dict(
        tokens=tokens,
        n_sampled=take(out["n_sampled"]),
        sum_logprob=take(out["scores"]),
        avg_logprob=take(avg),
        no_speech_prob=no_speech_prob,
    )


def transcribe_window_beam(params, dims: W.WhisperDims, cfg: RuleConfig,
                           suppress_mask: jax.Array, mel: jax.Array, prompt: jax.Array,
                           beam_size: int = 5, n_audio_ctx: int | None = None,
                           prompt_len: jax.Array | None = None,
                           sot_index: int | jax.Array = 0):
    """Beam-search counterpart of decode.transcribe_window."""
    enc = W.encode(params, dims, mel, n_ctx_out=n_audio_ctx)
    return beam_decode(params, dims, cfg, suppress_mask, enc, prompt, beam_size,
                       prompt_len=prompt_len, sot_index=sot_index)
