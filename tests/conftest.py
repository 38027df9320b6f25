"""Test config: run everything on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py; unit tests target CPU for
determinism and to validate the multi-chip sharding path without
hardware (see __graft_entry__.dryrun_multichip).
"""

import os

# Hard-override: the container presets JAX_PLATFORMS=axon (single real
# TPU chip) and its sitecustomize imports jax at interpreter startup, so
# env vars alone are too late — update the live jax config instead.
# Tests must not claim the chip or concurrent runs deadlock on the grant.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-gmr1-tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0x6D31)


REF = "/root/reference"


@pytest.fixture(scope="session")
def reference_dir():
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    return REF
