"""Pallas decode-attention kernels: single-query attention over cached KV.

Profiling on v5e (large-v3, B=8) showed the decode step spending ~6.3 ms in
cross-attention at ~30% of HBM peak; the root cause (head_dim=64 on the
minor axis padding 2x) is fixed by the time-minor cache layout in
models/whisper.py. These kernels go further: each (b, h) KV block streams
HBM->VMEM exactly once per step (Pallas double-buffers consecutive grid
steps) and the whole softmax(qk)v happens in VMEM in one kernel.

Layout: KV is time-minor (B, H, Dh, T) — matching init_cache — so
logits = K^T contraction and out = V @ w are direct matmuls.

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


def _attend_one(q_row, k_blk, v_blk, n_valid) -> jax.Array:
    """q (1, Dh); k/v (Dh, T); n_valid scalar -> (1, Dh) f32."""
    q = q_row.astype(jnp.float32)
    k = k_blk.astype(jnp.float32)
    v = v_blk.astype(jnp.float32)
    scale = q.shape[-1] ** -0.5
    logits = jnp.dot(q, k, preferred_element_type=jnp.float32) * scale  # (1, T)
    t_idx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(t_idx < n_valid, logits, NEG_INF)
    m = jnp.max(logits)
    w = jnp.exp(logits - m)                                   # (1, T)
    return jnp.dot(w, v.T, preferred_element_type=jnp.float32) / jnp.sum(w)


def _cross_kernel(q_ref, k_ref, v_ref, o_ref, *, a_valid: int):
    o_ref[:] = _attend_one(q_ref[:], k_ref[0], v_ref[0], a_valid).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("a_valid", "interpret"))
def decode_cross_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                           a_valid: int | None = None,
                           interpret: bool = False) -> jax.Array:
    """q (B,H,Dh) x time-minor k,v (B,H,Dh,A) -> (B,H,Dh); keys at index >=
    a_valid are masked (cache padding)."""
    B, H, Dh = q.shape
    A = k.shape[-1]
    a_valid = A if a_valid is None else a_valid
    q2 = q.reshape(B * H, Dh)
    k2 = k.reshape(B * H, Dh, A)
    v2 = v.reshape(B * H, Dh, A)
    out = pl.pallas_call(
        functools.partial(_cross_kernel, a_valid=a_valid),
        out_shape=jax.ShapeDtypeStruct((B * H, Dh), q.dtype),
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, Dh), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dh, A), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dh, A), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Dh), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q2, k2, v2)
    return out.reshape(B, H, Dh)


def _self_kernel(lengths_ref, q_ref, k_ref, v_ref, o_ref, *, heads: int):
    b = pl.program_id(0) // heads
    o_ref[:] = _attend_one(q_ref[:], k_ref[0], v_ref[0], lengths_ref[b]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_self_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          lengths: jax.Array, interpret: bool = False) -> jax.Array:
    """q (B,H,Dh) x time-minor cached k,v (B,H,Dh,T) with per-slot valid
    lengths (B,) (key positions < lengths[b] attend — the current token's KV
    must already be written)."""
    B, H, Dh = q.shape
    T = k.shape[-1]
    q2 = q.reshape(B * H, Dh)
    k2 = k.reshape(B * H, Dh, T)
    v2 = v.reshape(B * H, Dh, T)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, Dh), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dh, T), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dh, T), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Dh), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_self_kernel, heads=H),
        out_shape=jax.ShapeDtypeStruct((B * H, Dh), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(lengths.astype(jnp.int32), q2, k2, v2)
    return out.reshape(B, H, Dh)
