"""Pallas TPU kernel: fused single-query JOINT decode attention.

The VERDICT r3 item-8 spike ("fused per-layer Pallas decode megakernel —
bounded"). Scope decision, from the measured cost structure (PERF.md): a
FULL per-layer megakernel (attention + projections + MLP) cannot hold a
large-v3 layer's weights in VMEM (fc1 alone is 13.1 MB of the ~16 MB/core),
so it would stream weight tiles and hand-reimplement exactly the
scheduling XLA already does at ~78% of HBM peak. The only slice where a
hand kernel could plausibly beat XLA is the joint attention itself — one
pass over the KV pages computing the three-group softmax
(cache + ring + current column, whisper._joint_decode_attention_ring)
without materializing the concatenated logits — so that is what this
kernel fuses, and the microbench (tools/microbench_joint_attn.py) decides
adopt-or-reject at the production pool/window shapes.

Layout mirrors the XLA path: q/k_new/v_new (B,H,1,Dh); cache (B,H,Dh,T)
time-minor; ring (B,H,W,Dh) row-major; boolean masks (B,T) / (B,W)
(the XLA path's (B,1,1,T) masks broadcast over heads — this kernel takes
them pre-squeezed). Grid over B: one batch row's full head set per step
(H*Dh*T*2 bytes*2 tensors ≈ 1.3 MB at the pool shape — fits VMEM with
double-buffering headroom).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, kc_ref, vc_ref, mc_ref, kr_ref, vr_ref, mr_ref,
            kn_ref, vn_ref, out_ref):
    # per grid step (one batch row; leading block dim of 1 kept by Pallas):
    #   q/kn/vn (1,H,1,Dh); kc/vc (1,H,Dh,T); mc (1,T); kr/vr (1,H,W,Dh);
    #   mr (1,W); out (1,H,1,Dh)
    b = pl.program_id(0)
    q = q_ref[0, :, 0, :]                          # (H, Dh)
    kn = kn_ref[0, :, 0, :]
    vn = vn_ref[0, :, 0, :]
    mc = mc_ref[b, :][None, :]                     # (1, T) — masks ride as
    mr = mr_ref[b, :][None, :]                     # full arrays (tile rules)
    scale = q.shape[-1] ** -0.5
    # cache logits: (H, T) = sum_d q[h,d] * kc[h,d,t]
    lc = jax.lax.dot_general(
        q, kc_ref[0],
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale  # (H, T)
    lc = jnp.where(mc, lc, -1e30)                  # (1,T) broadcasts over H
    # ring logits: (H, W) = sum_d q[h,d] * kr[h,w,d]
    lr = jax.lax.dot_general(
        q, kr_ref[0],
        dimension_numbers=(((1,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale  # (H, W)
    lr = jnp.where(mr, lr, -1e30)
    # current column: (H, 1)
    ls = jnp.sum(q.astype(jnp.float32) * kn.astype(jnp.float32),
                 axis=-1, keepdims=True) * scale
    # three-group online softmax without concatenation
    m = jnp.maximum(jnp.maximum(jnp.max(lc, axis=-1, keepdims=True),
                                jnp.max(lr, axis=-1, keepdims=True)), ls)
    ec = jnp.exp(lc - m)
    er = jnp.exp(lr - m)
    es = jnp.exp(ls - m)
    denom = (jnp.sum(ec, axis=-1, keepdims=True)
             + jnp.sum(er, axis=-1, keepdims=True) + es)  # (H, 1)
    # out = ec @ vc^T + er @ vr + es * vn
    oc = jax.lax.dot_general(
        ec.astype(q.dtype), vc_ref[0],
        dimension_numbers=(((1,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)        # (H, Dh)
    orr = jax.lax.dot_general(
        er.astype(q.dtype), vr_ref[0],
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)        # (H, Dh)
    out = (oc + orr + es * vn.astype(jnp.float32)) / denom
    out_ref[0, :, 0, :] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def joint_decode_attention_ring_pallas(q, k_cache, v_cache, mask_cache,
                                       k_ring, v_ring, mask_ring,
                                       k_new, v_new):
    """Drop-in for whisper._joint_decode_attention_ring (P=1).
    q/k_new/v_new (B,H,1,Dh); k_cache/v_cache (B,H,Dh,T);
    k_ring/v_ring (B,H,W,Dh); mask_cache (B,T) bool; mask_ring (B,W) bool.
    Returns (B,H,1,Dh)."""
    B, H, _, Dh = q.shape
    T = k_cache.shape[-1]
    W = k_ring.shape[-2]
    grid = (B,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H, 1, Dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Dh, T), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Dh, T), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mask_cache, full (B,T)
            pl.BlockSpec((1, H, W, Dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W, Dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mask_ring, full (B,W)
            pl.BlockSpec((1, H, 1, Dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, 1, Dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, 1, Dh), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, 1, Dh), q.dtype),
    )(
        q, k_cache, v_cache, mask_cache, k_ring, v_ring, mask_ring,
        k_new, v_new,
    )
    return out
