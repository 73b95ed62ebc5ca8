"""Numerics for the Pallas fused joint decode attention spike
(ops/joint_attn.py — VERDICT r3 item 8).

The kernel computes the three-group online softmax (archived cache + ring
+ current column) in one pass; whether it is production-wired is decided
by the adopt-or-reject microbench (tools/microbench_joint_attn.py,
outcome recorded in PERF.md), but the spike artifact stays numerically
pinned either way: the kernel must match the XLA reference
`_joint_decode_attention_ring` exactly, including both masks.

Interpret mode deadlocks when the axon TPU plugin's sitecustomize is on
PYTHONPATH (it claims the tunneled TPU in every python process), so the
kernel case runs in a PYTHONPATH-clean subprocess — same pattern as
tests/test_flash_attention.py.
"""

import json
import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = textwrap.dedent("""
    import json, sys
    sys.path.insert(0, %r)
    import numpy as np, jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from speaksense_tpu.models.whisper import _joint_decode_attention_ring
    from speaksense_tpu.ops.joint_attn import joint_decode_attention_ring_pallas

    rng = np.random.default_rng(0)
    out = {}
    # (B, H, Dh, T, W): pool-like and window-like decode shapes (scaled down)
    for (B, H, Dh, T, W) in [(4, 20, 64, 128, 16), (3, 4, 64, 256, 16)]:
        def mk(*s):
            return jnp.asarray(rng.standard_normal(s).astype(np.float32))
        q, kn, vn = mk(B, H, 1, Dh), mk(B, H, 1, Dh), mk(B, H, 1, Dh)
        kc, vc = mk(B, H, Dh, T), mk(B, H, Dh, T)
        kr, vr = mk(B, H, W, Dh), mk(B, H, W, Dh)
        mask_c = jnp.asarray(rng.random((B, T)) < 0.7)
        mask_r = jnp.asarray(rng.random((B, W)) < 0.5)
        ref = _joint_decode_attention_ring(
            q, kc, vc, mask_c[:, None, None, :], kr, vr,
            mask_r[:, None, None, :], kn, vn)
        with pltpu.force_tpu_interpret_mode():
            got = joint_decode_attention_ring_pallas(
                q, kc, vc, mask_c, kr, vr, mask_r, kn, vn)
        assert got.shape == ref.shape, (got.shape, ref.shape)
        out[f"{T}x{W}"] = float(jnp.abs(got - ref).max())
    print("RESULT:" + json.dumps(out))
""" % (REPO,))


@pytest.mark.slow
def test_joint_attn_kernel_matches_xla():
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                          capture_output=True, text=True, timeout=540)
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = next(l for l in proc.stdout.splitlines() if l.startswith("RESULT:"))
    diffs = json.loads(line[len("RESULT:"):])
    # f32 interpret vs XLA: tiny reassociation noise only
    for shape, d in diffs.items():
        assert d < 5e-6, (shape, diffs)
