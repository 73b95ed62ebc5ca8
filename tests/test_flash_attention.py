"""Numerics for the Pallas flash-attention encoder path (VERDICT r1 item 3).

The kernel is default-ON for every full-window encode on TPU
(models/whisper.py:encode auto-selects it for t >= 1024), so a wrong
padded-keys mask would ship garbage transcripts at full speed. These tests
run the real kernel in Pallas TPU interpret mode against the XLA reference
`_attention`, covering:

- the padded path (T % 128 != 0 -> zero-pad + SegmentIds key masking),
  including the production shape T=1500 -> 1536 with the tuned
  (768, 1536, 768) block selection;
- the unpadded path (no segment ids);
- the tuned-block selection table itself.

Interpret mode deadlocks when the axon TPU plugin's sitecustomize is on
PYTHONPATH (it claims the tunneled TPU in every python process), so the
kernel cases run in a PYTHONPATH-clean subprocess.
"""

import json
import os
import subprocess
import sys
import textwrap

import pytest

from speaksense_tpu.ops.flash import flash_block_sizes as _flash_block_sizes

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = textwrap.dedent("""
    import json, sys
    sys.path.insert(0, %r)
    import numpy as np, jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from speaksense_tpu.models.whisper import _attention
    from speaksense_tpu.ops.flash import flash_attention_full as _flash_attention_full

    rng = np.random.default_rng(0)
    out = {}
    # (B, H, T, Dh): padded small, unpadded small, padded PRODUCTION shape
    for (B, H, T, Dh) in [(1, 2, 200, 64), (1, 2, 256, 64), (1, 2, 1500, 64)]:
        q = jnp.asarray(rng.standard_normal((B, H, T, Dh)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((B, H, T, Dh)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((B, H, T, Dh)).astype(np.float32))
        ref = _attention(q, k, v, None)
        with pltpu.force_tpu_interpret_mode():
            got = _flash_attention_full(q, k, v)
        assert got.shape == ref.shape, (got.shape, ref.shape)
        out[str(T)] = float(jnp.abs(got - ref).max())
    print("RESULT:" + json.dumps(out))
""" % (REPO,))


@pytest.mark.slow
def test_flash_kernel_matches_xla_attention():
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                          capture_output=True, text=True, timeout=540)
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = next(l for l in proc.stdout.splitlines() if l.startswith("RESULT:"))
    diffs = json.loads(line[len("RESULT:"):])
    # f32 interpret vs XLA: tiny reassociation noise only
    for t, d in diffs.items():
        assert d < 5e-6, (t, diffs)
    # the production window (1500->1536) must be among the covered shapes
    assert "1500" in diffs


def test_tuned_block_selection():
    # production full-window encode: 1500 -> padded 1536
    assert _flash_block_sizes(1536) == (768, 1536, 768)
    # streaming bucket 1024: 768 doesn't divide, falls to 512
    assert _flash_block_sizes(1024) == (512, 512, 512)
    # every choice must divide the padded length (kernel requirement)
    for tp in range(128, 4097, 128):
        bq, bkm, bk = _flash_block_sizes(tp)
        assert tp % bq == 0 and tp % bkm == 0 and bkm % bk == 0, tp
