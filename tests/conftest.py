"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4).
Must be set before jax is imported anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# tests compile LOCALLY: the environment's remote-compile relay is slow and
# its CPU codegen targets different machine features (rounding differences /
# SIGILL warnings). Must be unset before jax initializes a backend.
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# This environment defaults matmuls to low precision (the right default for
# TPU MXU throughput); numerical parity tests need full f32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# When the interpreter's sitecustomize pre-initialized the backend (plain
# environment runs), the 8-device flag above arrives too late and only one
# CPU device exists: multi-chip tests then SKIP (the driver validates the
# multi-chip path separately via __graft_entry__.dryrun_multichip, which it
# launches with the device-count flag set at process start).
needs_mesh = pytest.mark.skipif(
    jax.device_count() < 8,
    reason="needs 8 virtual devices (backend was pre-initialized; run with "
           "PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu)")


@pytest.fixture
def rng():
    return np.random.default_rng(777)
