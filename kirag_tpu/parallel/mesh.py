"""Device mesh construction and sharding helpers.

This is the TPU-native replacement for the reference's NCCL process-group setup
(`utils/utils.py:91-98`) and its hand-rolled all-gather wrappers
(`utils/utils.py:129-188`): instead of explicit collectives over process ranks,
we build a `jax.sharding.Mesh` with named axes and annotate array shardings;
XLA inserts the ICI/DCN collectives.

Axes:
- ``data``  : data parallelism (batch rows) AND corpus-row sharding for the
  index — the first-class scaling axis of this workload (millions of passages).
- ``model`` : optional tensor parallelism for encoder/LLM weights.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


@dataclasses.dataclass(frozen=True)
class MeshAxes:
    data: str = "data"
    model: str = "model"


AXES = MeshAxes()


def distributed_init(coordinator_address: Optional[str] = None, num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX (no-op for single-process runs).

    TPU analogue of `dist.init_process_group("nccl")` in the reference
    (`utils/utils.py:93`): call once per host before touching devices.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def create_mesh(data: Optional[int] = None, model: int = 1,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a 2D ``(data, model)`` mesh over the available devices.

    ``data=None`` uses all remaining devices after carving out ``model``.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model != 0:
            raise ValueError(f"model axis size {model} does not divide device count {n}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data * model} devices, have {n}")
    devices = devices[: data * model]  # an explicit smaller mesh is allowed
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=(AXES.data, AXES.model))


def shard_spec(*axes: Optional[str]) -> PartitionSpec:
    return PartitionSpec(*axes)


def sharded(mesh: Mesh, *axes: Optional[str]) -> NamedSharding:
    """NamedSharding placing successive array dims on the given mesh axes."""
    return NamedSharding(mesh, PartitionSpec(*axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def local_mesh_1d(axis: str = AXES.data) -> Mesh:
    """A 1D mesh over all local devices, for single-axis programs."""
    return Mesh(np.asarray(jax.devices()), axis_names=(axis,))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
