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
them pre-squeezed). Grid over (B,H): Mosaic cannot lower a BATCHED
dot_general (the H-batched einsum fails attribute parsing in
jax_dot_dims_to_tpu_dot_dot_dims), so each grid step handles one (batch
row, head) pair with plain 2D dots — fine for a bandwidth-bound op where
the kernel's job is streaming KV bytes, not MXU utilization. Per-step
VMEM is 2*Dh*T*2B ≈ 32-64 KB, leaving ample double-buffering headroom.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, kc_ref, vc_ref, mc_ref, kr_ref, vr_ref, mr_ref,
            kn_ref, vn_ref, out_ref):
    # per grid step (one batch row x one head):
    #   q/kn/vn (1,1,1,Dh); kc/vc (1,1,Dh,T); mc (1,T); kr/vr (1,1,W,Dh);
    #   mr (1,W); out (1,1,1,Dh)
    q = q_ref[0, 0]                                # (1, Dh)
    kn = kn_ref[0, 0]                              # (1, Dh)
    vn = vn_ref[0, 0]
    kc = kc_ref[0, 0]                              # (Dh, T)
    vc = vc_ref[0, 0]
    kr = kr_ref[0, 0]                              # (W, Dh)
    vr = vr_ref[0, 0]
    mc = mc_ref[0]                                 # (T,)
    mr = mr_ref[0]                                 # (W,)
    scale = q.shape[-1] ** -0.5
    # cache logits: (1, T) = q @ kc — plain 2D dot, no batch dims
    lc = jax.lax.dot_general(
        q, kc, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    lc = jnp.where(mc[None, :], lc, -1e30)
    # ring logits: (1, W) = q @ kr^T (contract Dh on both)
    lr = jax.lax.dot_general(
        q, kr, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    lr = jnp.where(mr[None, :], lr, -1e30)
    # current column: scalar logit
    ls = jnp.sum(q.astype(jnp.float32) * kn.astype(jnp.float32),
                 axis=-1, keepdims=True) * scale   # (1, 1)
    # three-group online softmax without concatenation
    m = jnp.maximum(jnp.maximum(jnp.max(lc, axis=-1, keepdims=True),
                                jnp.max(lr, axis=-1, keepdims=True)), ls)
    ec = jnp.exp(lc - m)
    er = jnp.exp(lr - m)
    es = jnp.exp(ls - m)
    denom = (jnp.sum(ec, axis=-1, keepdims=True)
             + jnp.sum(er, axis=-1, keepdims=True) + es)  # (1, 1)
    # out = ec @ vc^T + er @ vr + es * vn  — all 2D dots
    oc = jax.lax.dot_general(
        ec.astype(q.dtype), vc,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)        # (1, Dh)
    orr = jax.lax.dot_general(
        er.astype(q.dtype), vr,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # (1, Dh)
    out = (oc + orr + es * vn.astype(jnp.float32)) / denom
    out_ref[0, 0] = out.astype(out_ref.dtype)


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
    grid = (B, H)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 1, Dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Dh, T), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Dh, T), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda b, h: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, Dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, Dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda b, h: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, Dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, Dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, Dh), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, 1, Dh), q.dtype),
    )(
        q, k_cache, v_cache, mask_cache, k_ring, v_ring, mask_ring,
        k_new, v_new,
    )
    return out
