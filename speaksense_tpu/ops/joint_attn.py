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

MEASURED AND REJECTED (2026-08-20, PERF.md "Pallas fused joint decode
attention" row): pool shape (B=65,H=20,Dh=64,T=128,W=16, 32 scanned
layers) XLA 34.55 ms vs this kernel 47.24 ms — 37% slower. The (B,H)
grid's per-step work is a (1,Dh)x(Dh,T) dot — too little compute per
DMA to hide latency, and Mosaic cannot lower the H-batched dot_general
that would fatten it. Kept in history per the kernel policy
(ops/flash.py:4-8); deleted from the tree in the follow-up commit.

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
    #   q/kn/vn (1,1,1,Dh); kc/vc (1,1,Dh,T); kr/vr (1,1,W,Dh);
    #   out (1,1,1,Dh). The masks ride as FULL (B,T)/(B,W) float32 bias
    #   arrays (0 keep / -1e30 drop) — a (1,T) block has a sublane dim of
    #   1, which the TPU lowering rejects (must be 8-divisible or the full
    #   array dim), and full bias arrays are only ~35 KB of VMEM.
    b = pl.program_id(0)
    q = q_ref[0, 0]                                # (1, Dh)
    kn = kn_ref[0, 0]                              # (1, Dh)
    vn = vn_ref[0, 0]
    kc = kc_ref[0, 0]                              # (Dh, T)
    vc = vc_ref[0, 0]
    kr = kr_ref[0, 0]                              # (W, Dh)
    vr = vr_ref[0, 0]
    mc = mc_ref[b]                                 # (T,) additive bias
    mr = mr_ref[b]                                 # (W,)
    scale = q.shape[-1] ** -0.5
    # cache logits: (1, T) = q @ kc — plain 2D dot, no batch dims
    lc = jax.lax.dot_general(
        q, kc, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    lc = lc + mc[None, :]
    # ring logits: (1, W) = q @ kr^T (contract Dh on both)
    lr = jax.lax.dot_general(
        q, kr, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    lr = lr + mr[None, :]
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
    # bool masks -> additive float bias OUTSIDE the kernel (XLA fuses the
    # select into the producers); passed whole per grid step (see _kernel)
    bias_c = jnp.where(mask_cache, 0.0, -1e30).astype(jnp.float32)
    bias_r = jnp.where(mask_ring, 0.0, -1e30).astype(jnp.float32)
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
            pl.BlockSpec((B, T), lambda b, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, Dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, Dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, W), lambda b, h: (0, 0),
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
        q, k_cache, v_cache, bias_c, k_ring, v_ring, bias_r,
        k_new, v_new,
    )
    return out
