"""Mesh construction and Whisper sharding rules.

Layout (Megatron-style tensor parallel over the `tp` axis, data parallel over
`dp`):
- attention q/k/v and mlp fc1 weights: column-parallel — out-feature dim on tp
  (heads split across chips; contraction stays local);
- attention out-proj and mlp fc2: row-parallel — in-feature dim on tp (XLA
  inserts the psum on the block output);
- embeddings / norms / conv stem / positional tables: replicated;
- activations and KV caches: batch on dp, heads on tp.

With params and inputs annotated, `jit` propagates shardings through the
stacked-layer scan and places all collectives on ICI — no hand-written
NCCL-style code (contrast: the reference has none of this at all; whisper.cpp
is single-device).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, tp: int = 1,
              devices: list | None = None) -> Mesh:
    """(dp, tp) mesh over the first n_devices. tp must divide n_devices."""
    devs = devices if devices is not None else jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    assert n % tp == 0, f"tp={tp} must divide n_devices={n}"
    arr = np.asarray(devs).reshape(n // tp, tp)
    return Mesh(arr, ("dp", "tp"))


def _attn_specs(prefix: str = "") -> dict:
    """Stacked-block attention param specs (leading dim = layer)."""
    return {
        prefix + "q": {"w": P(None, None, "tp"), "b": P(None, "tp")},
        prefix + "k": {"w": P(None, None, "tp")},
        prefix + "v": {"w": P(None, None, "tp"), "b": P(None, "tp")},
        prefix + "o": {"w": P(None, "tp", None), "b": P(None)},
    }


def param_shardings(params) -> dict:
    """PartitionSpec pytree matching models/whisper.py's parameter layout."""
    enc_block = {
        "attn_ln": {"g": P(None), "b": P(None)},
        **_attn_specs(),
        "mlp_ln": {"g": P(None), "b": P(None)},
        "fc1": {"w": P(None, None, "tp"), "b": P(None, "tp")},
        "fc2": {"w": P(None, "tp", None), "b": P(None)},
    }
    dec_block = {
        **enc_block,
        "cross_ln": {"g": P(None), "b": P(None)},
        **{"c" + k: v for k, v in _attn_specs().items()},
    }
    specs = {
        "encoder": {
            "conv1": {"w": P(), "b": P()},
            "conv2": {"w": P(), "b": P()},
            "pos": P(),
            "blocks": enc_block,
            "ln_post": {"g": P(), "b": P()},
        },
        "decoder": {
            "tok_emb": P(),
            "pos": P(),
            "blocks": dec_block,
            "ln": {"g": P(), "b": P()},
        },
    }
    return specs


def cache_shardings() -> dict:
    """Decode-cache specs: (L, B, H, T, Dh) — batch on dp, heads on tp."""
    kv = P(None, "dp", "tp", None, None)
    return {"self_k": kv, "self_v": kv, "cross_k": kv, "cross_v": kv, "pos": P("dp")}


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree on the mesh per param_shardings."""
    specs = param_shardings(params)
    # tree.map flattens by the FIRST tree's structure, so PartitionSpec leaves
    # in `specs` (tuple subclasses) are not themselves flattened.
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)
