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


def resolve_mesh(num_devices: int, model_devices: int = 1) -> Optional[Mesh]:
    """--num_devices/--model_devices CLI flags -> optional (data, model) mesh.

    num_devices: 0 = all available devices (the reference's `device_count()`
    default, `train.py:300`); 1 = single device, no mesh. Unlike the reference
    there is no process spawn and the GLOBAL batch is kept (the reference
    divides batch_size by num_gpus and re-multiplies via one process per GPU,
    `train.py:301` — same global batch either way).

    model_devices: tensor-parallel width; `model_devices` of the
    `num_devices` total form the mesh `model` axis (BiLSTM gates + head are
    sharded over it by `acoustic_param_sharding`), the rest is the `data`
    axis. The reference has no TP; 1 (pure DP) is parity.
    """
    n = len(jax.devices()) if num_devices == 0 else num_devices
    if model_devices < 1:
        raise ValueError(f"--model_devices must be >= 1, got {model_devices}")
    if n <= 1:
        if model_devices > 1:
            raise ValueError("--model_devices > 1 requires --num_devices > 1")
        return None
    avail = len(jax.devices())
    if n > avail:
        raise ValueError(f"--num_devices {n} > available devices ({avail})")
    if n % model_devices != 0:
        raise ValueError(
            f"--num_devices {n} not divisible by --model_devices {model_devices}"
        )
    return make_mesh(
        n_data=n // model_devices, n_model=model_devices, devices=jax.devices()[:n]
    )


def acoustic_param_sharding(mesh: Mesh, params: Any) -> Any:
    """NamedSharding tree for AcousticModel params on a (data, model) mesh.

    Tensor-parallel rules (the product form of what the multi-chip dryrun
    wired by hand through round 3):
    * BiLSTM gate matrices and biases — trailing dim is the fused-gate 4H
      axis — shard that dim over `model`. Each shard computes its gates from
      the full (replicated) input; XLA inserts the activation all-gather
      where the recurrent carry needs the full H.
    * the mel head kernel (features, n_mels) shards its output dim.
    Everything else (CNN convs, BN, biases) is replicated: the FLOPs live in
    the gates/head; replicating the conv tower keeps BatchNorm exact.

    Leaves that don't divide evenly stay replicated, so the same rules are
    valid on any mesh (model=1 degenerates to full replication = DP parity).
    """
    n_model = mesh.shape["model"]

    def spec(path, x):
        names = [getattr(k, "key", str(k)) for k in path]
        if (
            n_model > 1
            and "rnn" in names
            and x.ndim >= 1
            and x.shape[-1] % (4 * n_model) == 0
        ):
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1) + ["model"])))
        if n_model > 1 and "head" in names and x.ndim == 2 and x.shape[-1] % n_model == 0:
            return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)


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


def add_distributed_flags(parser) -> None:
    """Multi-HOST product flags, shared by both trainer CLIs.

    The reference reaches multi-GPU from its CLI via `mp.spawn(train, ...,
    nprocs=num_gpus)` (`train.py:300-307`). TPU pods launch differently: ONE
    process per host, all started externally with the same command line, so
    the product surface is coordinator flags rather than an in-process spawn.
    """
    parser.add_argument(
        "--coordinator_address", type=str, default=None,
        help="host:port of process 0, e.g. 10.0.0.1:1234 — enables "
             "multi-process (multi-host) training via "
             "jax.distributed.initialize. All processes must pass the same "
             "value. On Cloud TPU pods this can be omitted together with "
             "--num_processes/--process_id (auto-detected from the TPU "
             "metadata environment).",
    )
    parser.add_argument(
        "--num_processes", type=int, default=None,
        help="Total number of training processes (one per host).",
    )
    parser.add_argument(
        "--process_id", type=int, default=None,
        help="This process's rank in [0, --num_processes).",
    )


def initialize_distributed_from_args(args) -> bool:
    """Join the global JAX runtime when the multi-host flags are present.

    Must run before anything touches `jax.devices()` — afterwards the device
    list is the GLOBAL one and `make_mesh`/`resolve_mesh` build global meshes
    (the code below them is already multi-host correct: it only talks in
    global shapes and named shardings). Returns True iff initialize ran.
    """
    coord = getattr(args, "coordinator_address", None)
    n_proc = getattr(args, "num_processes", None)
    pid = getattr(args, "process_id", None)
    if coord is None and n_proc is None and pid is None:
        return False
    if coord is None or n_proc is None or pid is None:
        raise ValueError(
            "--coordinator_address, --num_processes and --process_id must be "
            "passed together (or all omitted for single-process / "
            "auto-detected pod environments)"
        )
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=int(n_proc), process_id=int(pid)
    )
    print(
        f"[DIST] process {jax.process_index()}/{jax.process_count()} joined "
        f"via {coord}: {len(jax.devices())} global devices "
        f"({len(jax.local_devices())} local)"
    )
    return True


def host_is_primary() -> bool:
    """True on the process that should do host I/O (checkpoints, TB, prints).

    The TPU-native analogue of the reference's rank-0 gating
    (`train.py:114-126,190`): in a multi-host mesh every process runs the same
    program, so writers must be gated on `jax.process_index() == 0`.
    """
    return jax.process_index() == 0
