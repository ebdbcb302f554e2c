"""2-process DP TRAINING step check on CPU devices.

The reference's real distributed mode is several OS processes training
together (`/root/reference/train.py:26-28,300-307`: one spawned rank per GPU,
DDP all-reduce). `multiprocess_ckpt_check.py` proves the sharded save/restore
half of that story; this sibling proves the TRAINING half: two
`jax.distributed.initialize` processes form one 8-device global mesh and
execute genuine optimizer steps of BOTH trainers through their product APIs —

1. acoustic `AcousticTrainer(mesh=...)` — `_reshape_micro` -> `_put_micro`
   (global batch, batch axis sharded over `data`) -> jitted `_train_step`;
   XLA inserts the cross-process gradient all-reduce over the Gloo backend.
2. vocoder `VocoderTrainer(mesh=...).train_step` — sharded audio batch,
   D+G step with the saved-vjp generator forward.

Each asserts finite losses and identical metric values on both processes
(the all-reduce makes the replicated metrics globally consistent). The
vocoder trainer then saves through its auto-selected multi-host path
(`use_orbax` = process_count() > 1 — every process writes its shards, host 0
alone writes the metadata sidecar + no msgpack files appear) and resumes.

Run: python tools/multiprocess_train_check.py            (spawns both workers)
     python tools/multiprocess_train_check.py --process_id N --ckpt DIR
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])
N_PROC = 2
LOCAL_DEVICES = 4


def _free_port() -> int:
    """Bind-then-release a free TCP port (a FIXED port makes two concurrent
    suite runs on one machine collide)."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def worker(process_id: int, ckpt_dir: str, coord: str) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    # the parent's persistent compile cache (set by conftest via jax.config)
    # does NOT propagate to subprocesses — without this every suite run
    # cold-compiles both trainers' full graphs in both ranks
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/jax_comp_cache"),
    )
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=N_PROC, process_id=process_id
    )
    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from mri2speech_tpu.config import default_vocoder_config
    from mri2speech_tpu.models.acoustic import AcousticModel
    from mri2speech_tpu.models.effnetv2 import StageSpec
    from mri2speech_tpu.parallel.mesh import host_is_primary, make_mesh
    from mri2speech_tpu.train.acoustic import (
        AcousticTrainer,
        AcousticTrainerConfig,
        _reshape_micro,
    )
    from mri2speech_tpu.train.vocoder import VocoderTrainer, VocoderTrainerConfig

    assert jax.process_count() == N_PROC
    n_dev = N_PROC * LOCAL_DEVICES
    assert len(jax.devices()) == n_dev
    mesh = make_mesh(n_data=n_dev, n_model=1)

    # ---- acoustic DP step across both processes ----
    tiny_spec = (
        StageSpec("cn", 3, 1, 1, 8, 1),
        StageSpec("er", 3, 2, 2, 16, 1),
        StageSpec("ir", 3, 2, 2, 32, 1, 0.25),
    )
    model = AcousticModel(
        n_mels=64, rnn_hidden=64, dropout=0.5, use_checkpoint=True,
        cnn_spec=tiny_spec, cnn_stem=8,
    )
    trainer = AcousticTrainer(
        model, AcousticTrainerConfig(micro_batch_size=n_dev), mesh=mesh
    )
    rng = np.random.default_rng(0)  # same seed on both processes: global batch
    B, T, HW = 2 * n_dev, 4, 32
    batch = {
        "mri": rng.random((B, T, 1, HW, HW)).astype(np.float32),
        "mel": rng.standard_normal((B, T, 64)).astype(np.float32),
        "mask": np.ones((B, T), dtype=np.float32),
    }
    state = trainer.init_state(batch)
    micro = trainer._put_micro(_reshape_micro(batch, trainer.cfg.micro_batch_size))
    state, metrics = trainer._train_step(
        state, micro, jnp.float32(1e-4), jax.random.PRNGKey(0)
    )
    loss = float(metrics["loss"])
    assert np.isfinite(loss), f"non-finite acoustic loss {loss}"
    assert int(jax.device_get(state.global_step)) == 1
    print(f"[proc {process_id}] acoustic DP step OK, loss={loss:.6f}", flush=True)

    # ---- vocoder GAN DP step across both processes ----
    h = default_vocoder_config(
        upsample_initial_channel=16, batch_size=n_dev, segment_size=840
    )
    voc = VocoderTrainer(h, VocoderTrainerConfig(), mesh=mesh)
    assert voc.use_orbax, "multi-process trainer must auto-select orbax"
    voc_state = voc.init_state(jax.random.PRNGKey(h["seed"]))
    audio = (rng.standard_normal((n_dev, h["segment_size"])) * 0.1).astype(np.float32)
    voc_state, voc_metrics = voc.train_step(voc_state, {"audio": audio})
    vals = {k: float(voc_metrics[k]) for k in ("loss_gen_all", "loss_disc_all", "mel_error")}
    for k, v in vals.items():
        assert np.isfinite(v), f"non-finite vocoder {k}={v}"
    print(
        f"[proc {process_id}] vocoder GAN DP step OK, gen={vals['loss_gen_all']:.6f}",
        flush=True,
    )

    # ---- multi-host save/resume through the trainer's own path ----
    voc.save(ckpt_dir, voc_state, steps=5, epoch=0)
    # orbax mode: directories, not msgpack files; host-0-only sidecar
    g_dir = os.path.join(ckpt_dir, "g_00000005")
    do_dir = os.path.join(ckpt_dir, "do_00000005")
    assert os.path.isdir(g_dir) and os.path.isdir(do_dir), "expected orbax dirs"
    if host_is_primary():
        assert os.path.isfile(os.path.join(do_dir, "train_meta.json"))
    restored, steps, epoch = voc.resume(ckpt_dir, voc.init_state(jax.random.PRNGKey(1)))
    assert steps == 6 and epoch == 0, (steps, epoch)
    r_leaf = jax.tree_util.tree_leaves(restored.gen_params)[0]
    o_leaf = jax.tree_util.tree_leaves(voc_state.gen_params)[0]
    np.testing.assert_array_equal(
        np.asarray(r_leaf.addressable_shards[0].data),
        np.asarray(o_leaf.addressable_shards[0].data),
    )
    print(f"[proc {process_id}] OK (primary={host_is_primary()})", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process_id", type=int, default=None)
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--coord", type=str, default=None)
    args = ap.parse_args()
    if args.process_id is not None:
        worker(args.process_id, args.ckpt, args.coord)
        return

    ckpt_dir = tempfile.mkdtemp(prefix="m2s_mp_train_")
    coord = f"localhost:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--process_id", str(i), "--ckpt", ckpt_dir,
             "--coord", coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(N_PROC)
    ]
    outs = [p.communicate(timeout=1800)[0] for p in procs]
    ok = all(p.returncode == 0 for p in procs)
    for i, out in enumerate(outs):
        tail = "\n".join(out.strip().splitlines()[-8:])
        print(f"--- proc {i} (rc={procs[i].returncode}) ---\n{tail}")
    if not ok:
        raise SystemExit("multiprocess train check FAILED")
    print(
        "[multiprocess_train_check] PASSED: 2-process DP acoustic + vocoder GAN "
        "steps, orbax save/resume, host-0 sidecar"
    )


if __name__ == "__main__":
    main()
