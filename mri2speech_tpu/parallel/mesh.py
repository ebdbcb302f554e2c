"""Mesh + sharding helpers: the TPU-native replacement for the reference's
distributed stack (NCCL process groups, DistributedSampler, DDP wrappers,
`train.py:26-28,59-62,106,136-137,300-307`).

One program, one mesh: data parallelism is a sharded batch axis; gradient
all-reduce is inserted by XLA; there are no ranks, spawns, samplers or
`.module` unwrapping. Multi-host extension = `jax.distributed.initialize()`
before `make_mesh()` — the code below is already multi-host correct because it
only talks in global shapes and named shardings.

Mesh axes:
* ``data``  — batch-dim sharding (DP). Gradients sync over ICI via the psum XLA
  inserts for replicated params.
* ``model`` — optional tensor-parallel axis for wide layers (BiLSTM gates,
  generator channels). The reference has no TP; parity needs only DP, but the
  axis is plumbed so wide-model variants can shard without restructuring.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        if len(devices) % n_model != 0:
            raise ValueError(f"{len(devices)} devices not divisible by model={n_model}")
        n_data = len(devices) // n_model
    mesh_devices = mesh_utils.create_device_mesh(
        (n_data, n_model), devices=devices[: n_data * n_model]
    )
    return Mesh(mesh_devices, ("data", "model"))


def resolve_mesh(num_devices: int) -> Optional[Mesh]:
    """--num_devices CLI flag -> optional data-parallel mesh.

    0 = all available devices (the reference's `device_count()` default,
    `train.py:300`); 1 = single device, no mesh. Unlike the reference there is
    no process spawn and the GLOBAL batch is kept (the reference divides
    batch_size by num_gpus and re-multiplies via one process per GPU,
    `train.py:301` — same global batch either way).
    """
    n = len(jax.devices()) if num_devices == 0 else num_devices
    if n <= 1:
        return None
    avail = len(jax.devices())
    if n > avail:
        raise ValueError(f"--num_devices {n} > available devices ({avail})")
    return make_mesh(n_data=n, n_model=1, devices=jax.devices()[:n])


def batch_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0) -> NamedSharding:
    """NamedSharding that splits `batch_axis` over the data axis."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, batch_axis: int = 0) -> Any:
    """Device-put a pytree of host arrays with the batch axis sharded."""

    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, batch_sharding(mesh, x.ndim, batch_axis))

    return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def host_is_primary() -> bool:
    """True on the process that should do host I/O (checkpoints, TB, prints).

    The TPU-native analogue of the reference's rank-0 gating
    (`train.py:114-126,190`): in a multi-host mesh every process runs the same
    program, so writers must be gated on `jax.process_index() == 0`.
    """
    return jax.process_index() == 0
