"""Test harness: force JAX onto 8 virtual CPU devices so multi-chip sharding
paths compile and execute without TPU hardware (the driver separately
dry-runs the multi-chip path via __graft_entry__.dryrun_multichip)."""

import os

# Must happen before any jax *use*. The harness presets JAX_PLATFORMS=axon
# (tunneled TPU) and a sitecustomize registers that backend in every process;
# tests must run hermetically on an 8-device virtual CPU mesh, so override
# both the env var and the config knob.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # function-scoped: every test draws the same deterministic sequence
    # regardless of collection order
    return np.random.default_rng(0)
