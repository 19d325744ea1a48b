"""Device mesh construction and distributed init.

TPU-native replacement for the reference's NCCL process-group setup
(reference: stllm/common/dist_utils.py:57-93). Instead of rank/world_size
process groups, we build a ``jax.sharding.Mesh`` with named axes:

  - ``data``  : data parallel + FSDP (params/optimizer sharded over it, the
                ZeRO-3 equivalent — reference: stllm/train/zero3.json)
  - ``model`` : tensor parallel (attention heads / MLP hidden)

Collectives are inserted by XLA from sharding annotations and ride ICI.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed() -> None:
    """Initialize multi-host JAX if launched under a multi-process coordinator."""
    if jax.process_count() > 1:
        return  # already initialized
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS")
    if coord and os.environ.get("JAX_NUM_PROCESSES"):
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over all devices.

    ``data=None`` consumes all devices not taken by ``model``.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    if data * model != n:
        raise ValueError(
            f"make_mesh(data={data}, model={model}) needs {data * model} devices "
            f"but only {n} visible on platform "
            f"'{devices[0].platform if devices else '?'}'. To emulate a mesh "
            f"without hardware, run with JAX_PLATFORMS=cpu and "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={data * model} "
            f"(set BEFORE the first jax backend touch, plus "
            f"jax.config.update('jax_platforms', 'cpu') after import if a "
            f"sitecustomize pins another platform)."
        )
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def fsdp_param_sharding(mesh: Mesh, params, min_size: int = 2 ** 16):
    """FSDP-style NamedSharding tree: shard each large param's largest
    divisible axis over ``data`` (ZeRO-3 equivalent); small params replicate.
    """
    axis_size = mesh.shape[DATA_AXIS]

    def spec_for(leaf):
        if leaf.size < min_size:
            return NamedSharding(mesh, P())
        # prefer the largest axis divisible by the data-axis size
        order = sorted(range(leaf.ndim), key=lambda d: -leaf.shape[d])
        for d in order:
            if leaf.shape[d] % axis_size == 0:
                spec = [None] * leaf.ndim
                spec[d] = DATA_AXIS
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_for, params)


def shard_params(params, shardings):
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
