"""Encoder self-attention: XLA fused vs Pallas flash at tuned block sizes.

XLA materializes the (B, H, T, T) logits in HBM (~2.9 GB bf16 per layer at
B=32, T=1536 — several round trips per layer); flash streams them through
VMEM. The stock kernel at DEFAULT block sizes measured SLOWER than XLA
(530 vs 272 ms for 8 windows, PERF.md) — this sweep checks whether tuned
blocks flip it at the serving shape.

Run on TPU: python tools/microbench_encattn.py [B]
Timing forces a device->host fetch (block_until_ready lies on axon).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv):
    B = int(argv[0]) if argv else 32
    H, T, Dh = 20, 1536, 64  # large-v3 encoder shape, lane-aligned

    import jax
    import jax.numpy as jnp

    from speaksense_tpu.utils.jaxsetup import init_compilation_cache

    init_compilation_cache()
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention,
    )
    from speaksense_tpu.models import whisper as W

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, T, Dh)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, T, Dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, T, Dh)), jnp.bfloat16)
    scale = Dh ** -0.5

    def bench(name, fn):
        f = jax.jit(fn)
        out = np.asarray(f(q, k, v)[0, 0, 0, :4])  # compile + fetch
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(q, k, v)[0, 0, 0, :4])
            times.append(time.perf_counter() - t0)
        print(f"{name:28s} {min(times) * 1e3:8.1f} ms", flush=True)
        return out

    ref = bench("xla", lambda q, k, v: W._attention(q, k, v, None))

    def flash(bs):
        return lambda q, k, v: flash_attention(q, k, v, causal=False,
                                               sm_scale=scale, block_sizes=bs)

    got = bench("flash default", flash(None))
    np.testing.assert_allclose(got, ref, rtol=5e-2, atol=5e-2)

    # constraint: q_seq % block_q == 0, kv_seq % block_k_major == 0,
    # block_k_major % block_k == 0 (T=1536 = 512*3 = 768*2)
    for bq, bkm, bk in ((512, 768, 768), (768, 1536, 768), (1536, 512, 512)):
        bs = BlockSizes(block_q=bq, block_k_major=bkm, block_k=bk, block_b=1)
        got = bench(f"flash q{bq}/kM{bkm}/k{bk}", flash(bs))
        np.testing.assert_allclose(got, ref, rtol=5e-2, atol=5e-2)

    # splash MHA (newer kernel generation; no sm_scale param — pre-scale q)
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        make_splash_mha, splash_attention_mask as mask_lib,
    )
    from jax.experimental.pallas.ops.tpu.splash_attention.splash_attention_kernel import (
        BlockSizes as SplashBlockSizes,
    )

    mask = mask_lib.MultiHeadMask([mask_lib.FullMask((T, T)) for _ in range(H)])
    for bq, bkv in ((512, 512), (1024, 1536), (256, 1536)):
        kern = make_splash_mha(
            mask, head_shards=1, q_seq_shards=1,
            block_sizes=SplashBlockSizes(block_q=bq, block_kv=bkv))
        got = bench(f"splash q{bq}/kv{bkv}",
                    lambda q, k, v, kern=kern: jax.vmap(kern)(
                        (q * scale).astype(q.dtype), k, v))
        np.testing.assert_allclose(got, ref, rtol=5e-2, atol=5e-2)


if __name__ == "__main__":
    main(sys.argv[1:])
