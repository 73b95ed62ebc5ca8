"""Pallas decode-attention kernels: single-query attention over cached KV.

Decode-step attention reads the whole KV cache for one query token; XLA
schedules that as several small kernels at ~30% of HBM peak. These kernels
stream each KV block HBM->VMEM exactly once per step (Pallas double-buffers
consecutive grid steps) and do the whole softmax(qk)v in VMEM.

Layout: KV is time-minor (B, H, Dh, T) — matching models/whisper.init_cache.
Mosaic requires >= 8 sublanes per block, so the grid processes G=8 (b, h)
rows at a time (row padding added when B*H % 8 != 0); per-row valid lengths
ride along as a VMEM column so self-attention slots at different offsets
share the block.

Both kernels are exact (f32 softmax) and unit-tested in interpret mode
against the XLA reference; enable in the model path with
SPEAKSENSE_PALLAS_DECODE=1 (gated until chip-validated).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
G = 8  # (b, h) rows per grid step (sublane granularity)


def _kernel(len_ref, q_ref, k_ref, v_ref, o_ref):
    # blocks: len (G, 1) i32; q (G, Dh); k/v (G, Dh, T); o (G, Dh)
    q = q_ref[:].astype(jnp.float32)               # (G, Dh)
    k = k_ref[:].astype(jnp.float32)               # (G, Dh, T)
    v = v_ref[:].astype(jnp.float32)
    scale = q.shape[-1] ** -0.5
    # batched matvec via broadcast-multiply-reduce (Mosaic cannot lower
    # batched dot_general; this op is bandwidth-bound so the VPU is fine):
    # logits[g, t] = sum_d q[g, d] * k[g, d, t]
    logits = jnp.sum(q[:, :, None] * k, axis=1) * scale  # (G, T)
    t_idx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(t_idx < len_ref[:], logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    w = jnp.exp(logits - m)
    w = w / jnp.sum(w, axis=-1, keepdims=True)      # (G, T)
    # out[g, d] = sum_t w[g, t] * v[g, d, t]
    out = jnp.sum(w[:, None, :] * v, axis=2)         # (G, Dh)
    o_ref[:] = out.astype(o_ref.dtype)


def _run(q2: jax.Array, k2: jax.Array, v2: jax.Array, lengths_row: jax.Array,
         interpret: bool) -> jax.Array:
    N, Dh = q2.shape
    T = k2.shape[-1]
    pad = (-N) % G
    if pad:
        q2 = jnp.pad(q2, ((0, pad), (0, 0)))
        k2 = jnp.pad(k2, ((0, pad), (0, 0), (0, 0)))
        v2 = jnp.pad(v2, ((0, pad), (0, 0), (0, 0)))
        lengths_row = jnp.pad(lengths_row, ((0, pad), (0, 0)), constant_values=1)
    Np = q2.shape[0]
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((Np, Dh), q2.dtype),
        grid=(Np // G,),
        in_specs=[
            pl.BlockSpec((G, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Dh), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Dh, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Dh, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, Dh), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lengths_row, q2, k2, v2)
    return out[:N]


@functools.partial(jax.jit, static_argnames=("a_valid", "interpret"))
def decode_cross_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                           a_valid: int | None = None,
                           interpret: bool = False) -> jax.Array:
    """q (B,H,Dh) x time-minor k,v (B,H,Dh,A) -> (B,H,Dh); keys at index >=
    a_valid are masked (cache padding)."""
    B, H, Dh = q.shape
    A = k.shape[-1]
    a_valid = A if a_valid is None else a_valid
    lengths_row = jnp.full((B * H, 1), a_valid, jnp.int32)
    out = _run(q.reshape(B * H, Dh), k.reshape(B * H, Dh, A),
               v.reshape(B * H, Dh, A), lengths_row, interpret)
    return out.reshape(B, H, Dh)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_self_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          lengths: jax.Array, interpret: bool = False) -> jax.Array:
    """q (B,H,Dh) x time-minor cached k,v (B,H,Dh,T) with per-slot valid
    lengths (B,) (key positions < lengths[b] attend — the current token's KV
    must already be written)."""
    B, H, Dh = q.shape
    T = k.shape[-1]
    lengths_row = jnp.repeat(lengths.astype(jnp.int32), H).reshape(B * H, 1)
    out = _run(q.reshape(B * H, Dh), k.reshape(B * H, Dh, T),
               v.reshape(B * H, Dh, T), lengths_row, interpret)
    return out.reshape(B, H, Dh)
