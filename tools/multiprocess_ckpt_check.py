"""2-process multi-host checkpoint/restore check on CPU devices.

Simulates a 2-host mesh on one machine: two OS processes, 4 virtual CPU
devices each, joined by `jax.distributed.initialize` into one 8-device global
mesh. Each process writes its own shards of an orbax train-state checkpoint
(`save_train_state_orbax` — host 0 also writes the JSON sidecar), then both
restore and verify. This is the real multi-host code path of the trainers'
`use_orbax` mode (auto-on when `jax.process_count() > 1`).

Run: python tools/multiprocess_ckpt_check.py            (spawns both workers)
     python tools/multiprocess_ckpt_check.py --process_id N --ckpt DIR  (worker)
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])
COORD = "localhost:12355"
N_PROC = 2
LOCAL_DEVICES = 4


def worker(process_id: int, ckpt_dir: str) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=COORD, num_processes=N_PROC, process_id=process_id
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, REPO)
    from mri2speech_tpu.parallel.mesh import host_is_primary
    from mri2speech_tpu.train import checkpoint as ckpt_io

    assert jax.process_count() == N_PROC
    assert len(jax.devices()) == N_PROC * LOCAL_DEVICES
    mesh = Mesh(np.array(jax.devices()).reshape(N_PROC * LOCAL_DEVICES, 1), ("data", "model"))

    # deterministic global content, sharded over `data` (each host holds half)
    host_w = np.arange(8 * 16, dtype=np.float32).reshape(8, 16)
    w = jax.make_array_from_callback(
        host_w.shape, NamedSharding(mesh, P("data", None)), lambda idx: host_w[idx]
    )
    step = jax.make_array_from_callback(
        (), NamedSharding(mesh, P()), lambda idx: np.asarray(3, np.int32)
    )

    ckpt_io.save_train_state_orbax(ckpt_dir, {"w": w, "step": step}, {"epoch": 9})

    restored, meta = ckpt_io.restore_train_state_orbax(ckpt_dir, {"w": w, "step": step})
    # verify each host's addressable shards round-tripped exactly
    for shard in restored["w"].addressable_shards:
        np.testing.assert_array_equal(np.asarray(shard.data), host_w[shard.index])
    assert int(jax.device_get(restored["step"].addressable_shards[0].data)) == 3
    assert meta == {"epoch": 9}
    sidecar = os.path.join(ckpt_dir, "train_meta.json")
    if host_is_primary():
        assert os.path.isfile(sidecar), "host 0 must write the metadata sidecar"
    print(f"[proc {process_id}] OK (primary={host_is_primary()})", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process_id", type=int, default=None)
    ap.add_argument("--ckpt", type=str, default=None)
    args = ap.parse_args()
    if args.process_id is not None:
        worker(args.process_id, args.ckpt)
        return

    ckpt_dir = tempfile.mkdtemp(prefix="m2s_mp_ckpt_")
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--process_id", str(i), "--ckpt", ckpt_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(N_PROC)
    ]
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    ok = all(p.returncode == 0 for p in procs)
    for i, out in enumerate(outs):
        tail = "\n".join(out.strip().splitlines()[-6:])
        print(f"--- proc {i} (rc={procs[i].returncode}) ---\n{tail}")
    if not ok:
        raise SystemExit("multiprocess checkpoint check FAILED")
    print("[multiprocess_ckpt_check] PASSED: 2-process sharded save/restore + host-0 sidecar")


if __name__ == "__main__":
    main()
