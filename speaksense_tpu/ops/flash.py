"""The production Pallas TPU kernel: tuned-block flash attention for the
encoder (O(T) memory; T=1500 logits would be ~360 MB/window in f32).

Kernel policy (PERF.md "Levers measured and rejected"): hand kernels stay
ONLY while they beat the XLA-fused path at a production shape after a block
sweep. The flash encoder wins 45.8 -> 32.7 ms/layer at the tuned blocks
below; a Pallas single-query decode attention and a Pallas mel/STFT kernel
both lost to XLA at every production shape and were deleted in round 3.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def flash_block_sizes(t_padded: int) -> tuple[int, int, int]:
    """Tuned flash blocks (block_q, block_k_major, block_k) for a 128-multiple
    sequence length. The kernel's defaults (512/512) measured SLOWER than
    XLA's fused attention at the encoder shape, but q=768 over the full
    1536-key major axis beats it 45.8 -> 32.7 ms (B=32, H=20, T=1536,
    Dh=64 — tools/microbench_encattn.py). Blocks must divide the padded
    sequence; pick the largest tuned candidates that do."""
    def _largest(cands, n):
        return next((c for c in cands if n % c == 0), 128)

    bq = _largest((768, 512, 256, 128), t_padded)
    bkm = _largest((1536, 768, 512, 256, 128), t_padded)
    return bq, bkm, min(bkm, 768)


def flash_attention_full(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Unmasked self-attention via the Pallas TPU flash kernel: (B, H, T, Dh),
    O(T) memory instead of materializing (B, H, T, T) logits in HBM — the
    encoder's T=1500 logits would be ~360 MB/window in f32. Sequence is
    zero-padded to a 128-multiple; padded KEYS are masked via segment ids
    (padded query rows are sliced away)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention, SegmentIds,
    )

    B, H, T, Dh = q.shape
    Tp = ((T + 127) // 128) * 128
    pad = Tp - T
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        ids = jnp.broadcast_to(
            jnp.where(jnp.arange(Tp) < T, 1, 0)[None, :].astype(jnp.int32), (B, Tp))
        seg = SegmentIds(q=ids, kv=ids)
    else:
        seg = None

    bq, bkm, bk = flash_block_sizes(Tp)
    bs = BlockSizes(block_q=bq, block_k_major=bkm, block_k=bk, block_b=1)
    out = flash_attention(q, k, v, segment_ids=seg, causal=False,
                          sm_scale=q.shape[-1] ** -0.5, block_sizes=bs)
    return out[:, :, :T, :]
