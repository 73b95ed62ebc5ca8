"""Adopt-or-reject microbench for the Pallas fused joint decode attention
(VERDICT r3 item 8; ops/joint_attn.py has the scope rationale).

Times ONE decode step's worth of joint ring attention across all 32 layers
(scanned, like the production step) at a chosen shape, XLA formulation vs
the Pallas kernel, with the fetch-bounded timing PERF.md mandates.

Shapes:
  pool   : B=65 (64 slots + scratch), H=20, Dh=64, T=128, W=16  (large-v3 pool)
  window : B=64, H=20, Dh=64, T=256, W=16                       (headline bench)

Run (TPU):  python tools/microbench_joint_attn.py [pool|window]
CPU check:  JAX_PLATFORMS=cpu python tools/microbench_joint_attn.py pool --check
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from speaksense_tpu.models.whisper import _joint_decode_attention_ring  # noqa: E402
from speaksense_tpu.ops.joint_attn import (  # noqa: E402
    joint_decode_attention_ring_pallas,
)

SHAPES = {
    "pool": dict(B=65, H=20, Dh=64, T=128, W=16, L=32),
    "window": dict(B=64, H=20, Dh=64, T=256, W=16, L=32),
    # compile-time probe: the full-shape Mosaic compile exceeded a 25-min
    # timebox on the remote compiler (2026-08-20); small shapes bound
    # whether compile time scales with the (B,H) grid and let a rejection
    # cite a per-byte measurement instead of a timeout
    "small": dict(B=8, H=20, Dh=64, T=128, W=16, L=4),
}


def main():
    name = next((a for a in sys.argv[1:] if a in SHAPES), "pool")
    check = "--check" in sys.argv
    s = SHAPES[name]
    B, H, Dh, T, W, L = s["B"], s["H"], s["Dh"], s["T"], s["W"], s["L"]
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape), dt)

    q = mk(B, H, 1, Dh)
    kc = mk(L, B, H, Dh, T)
    vc = mk(L, B, H, Dh, T)
    kr = mk(L, B, H, W, Dh)
    vr = mk(L, B, H, W, Dh)
    kn = mk(B, H, 1, Dh)
    vn = mk(B, H, 1, Dh)
    mask_c = jnp.asarray(rng.random((B, T)) < 0.7)
    mask_r = jnp.asarray(rng.random((B, W)) < 0.5)

    def xla_step(q, kc, vc, kr, vr, kn, vn):
        def layer(x, xs):
            o = _joint_decode_attention_ring(
                x, xs["kc"], xs["vc"], mask_c[:, None, None, :],
                xs["kr"], xs["vr"], mask_r[:, None, None, :], kn, vn)
            return o, ()
        out, _ = jax.lax.scan(layer, q, {"kc": kc, "vc": vc, "kr": kr, "vr": vr})
        return out

    def pallas_step(q, kc, vc, kr, vr, kn, vn):
        def layer(x, xs):
            o = joint_decode_attention_ring_pallas(
                x, xs["kc"], xs["vc"], mask_c, xs["kr"], xs["vr"], mask_r,
                kn, vn)
            return o, ()
        out, _ = jax.lax.scan(layer, q, {"kc": kc, "vc": vc, "kr": kr, "vr": vr})
        return out

    fx = jax.jit(xla_step)
    fp = jax.jit(pallas_step)

    if check:
        a = np.asarray(jax.jit(lambda *xs: _joint_decode_attention_ring(
            xs[0], xs[1], xs[2], mask_c[:, None, None, :], xs[3], xs[4],
            mask_r[:, None, None, :], xs[5], xs[6]))(
                q, kc[0], vc[0], kr[0], vr[0], kn, vn), np.float32)
        b = np.asarray(joint_decode_attention_ring_pallas(
            q, kc[0], vc[0], mask_c, kr[0], vr[0], mask_r, kn, vn), np.float32)
        err = np.abs(a - b).max()
        print(f"max abs err vs XLA: {err:.5f}")
        assert err < 0.02, err
        print("NUMERICS OK")
        return

    # bytes/step: K+V cache + ring, L layers
    gb = (2 * L * B * H * Dh * (T + W) * 2) / 1e9
    for tag, fn in (("xla", fx), ("pallas", fp)):
        np.asarray(fn(q, kc, vc, kr, vr, kn, vn))  # compile + warm
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(fn(q, kc, vc, kr, vr, kn, vn))
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"{name} {tag}: {best * 1e3:.2f} ms  "
              f"({gb / best:.0f} GB/s effective of ~819 peak)")


if __name__ == "__main__":
    main()
