"""Test configuration: force an 8-device virtual CPU platform BEFORE jax
imports anywhere, so multi-chip sharding logic is exercised without TPUs
(SURVEY.md §4: JAX's stand-in for a fake distributed backend)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

# The environment ships a TPU plugin that force-appends itself to
# jax_platforms even when JAX_PLATFORMS=cpu is set; an explicit config
# update takes priority over it.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    import jax
    from jax.sharding import Mesh
    import numpy as np

    devices = np.array(jax.devices()).reshape(8)
    with Mesh(devices, axis_names=("data",)) as mesh:
        yield mesh
