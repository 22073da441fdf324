"""Device mesh construction and sharding helpers.

The reference's parallelism is torch.distributed DDP with one process per
GPU (SURVEY.md §2d). Here a single JAX program spans all chips via a Mesh:

- axis "data": data parallel (batch rows sharded); the only axis the
  reference's workloads need (encoders are ≤ large).
- axis "model": reserved tensor-parallel axis for >1B encoders; size 1 by
  default, plumbed through so enabling it is a config change, not a rewrite.

Multi-host: call ``jax.distributed.initialize()`` (drivers do this when
``JAX_COORDINATOR`` envs are present) and the same code spans slices, with
XLA routing collectives over ICI within a slice and DCN across.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(dp_size: int = -1, tp_size: int = 1, devices=None) -> Mesh:
    """Build a ("data", "model") mesh. dp_size=-1 uses all remaining devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp_size == -1:
        assert n % tp_size == 0, f"{n} devices not divisible by tp={tp_size}"
        dp_size = n // tp_size
    assert dp_size * tp_size == n, (
        f"dp({dp_size}) * tp({tp_size}) != devices({n})"
    )
    arr = np.array(devices).reshape(dp_size, tp_size)
    return Mesh(arr, axis_names=(DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree with the leading dim sharded over data.

    Single-host: plain device_put of the full batch. Multi-host: each
    process supplies ONLY its local rows (its 1/process_count dataset
    shard), assembled into the global array with
    ``make_array_from_process_local_data`` — feeding a full "global" batch
    per host would silently drop the non-addressable rows and desynchronize
    hosts.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sharding, x), batch
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
