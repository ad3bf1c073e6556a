"""Test harness config: force CPU with 8 virtual devices for sharding tests.

Must run before JAX initializes its backends, hence the env mutation at
import time (pytest imports conftest first).
"""

import os

# Force CPU: the session env pins JAX_PLATFORMS to the real TPU tunnel,
# which would make every tiny test pay a remote compile (and break parity
# tolerances with MXU matmul precision).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep matmuls at full f32 precision on CPU for parity tests.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402

# A sitecustomize module may have imported jax and registered the TPU
# plugin before this conftest ran, making the env mutation above
# ineffective.  The config knob still wins as long as no backend has been
# initialized yet (no jax.devices() call has happened).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(autouse=True)
def _reset_spmd_mesh():
    """prepare_mesh_training registers a process-global mesh (the fused
    kernel's shard_map hook); don't let it leak across tests."""
    yield
    from fgnn_tpu.parallel.mesh import set_spmd_mesh

    set_spmd_mesh(None)
