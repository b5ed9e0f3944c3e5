"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic (shard_map top-k merge, distributed k-means,
data-parallel training) is validated without TPU hardware via
``--xla_force_host_platform_device_count=8``, per SURVEY.md §4. Pallas
kernels run in interpreter mode on CPU (the wrappers auto-detect backend).
"""

import os

# Force CPU regardless of the ambient JAX_PLATFORMS (the driver environment
# points it at the real TPU; tests must not hog or depend on it). The axon
# sitecustomize hook registers the TPU backend at interpreter start and
# ignores the env var, so we must ALSO override programmatically below.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert jax.device_count() == 8, "tests expect an 8-device virtual CPU mesh"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
