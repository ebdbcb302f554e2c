"""Sharded (orbax) checkpointing: cross-mesh restore + trainer integration.

The multi-host story (SURVEY §5 checkpoint/resume; reference rank-0 gating
`train.py:114-126,190`): trainers write sharded orbax directories when the mesh
spans >1 process (every process writes its shards, host 0 writes the metadata
sidecar), and restore uses the CURRENT state as the template so a checkpoint
written on one mesh layout restores onto a different one.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mri2speech_tpu.parallel.mesh import make_mesh
from mri2speech_tpu.train import checkpoint as ckpt_io


def test_two_process_sharded_checkpoint_roundtrip():
    """Real 2-process (Gloo-coordinated) sharded orbax save/restore: each
    process writes its own shards, host 0 writes the metadata sidecar."""
    import subprocess
    import sys
    from pathlib import Path

    script = Path(__file__).resolve().parents[1] / "tools" / "multiprocess_ckpt_check.py"
    proc = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True, timeout=1200
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PASSED" in proc.stdout


def test_orbax_restore_onto_different_mesh(tmp_path):
    """Save sharded on a 4x2 (data x model) mesh, restore onto 8x1 — exact."""
    mesh_a = make_mesh(4, 2)
    mesh_b = make_mesh(8, 1)
    rng = np.random.default_rng(0)
    host = {
        "w_gates": rng.standard_normal((16, 32)).astype(np.float32),  # model-sharded
        "bias": rng.standard_normal((32,)).astype(np.float32),        # replicated
        "step": np.asarray(7, np.int32),
    }
    on_a = {
        "w_gates": jax.device_put(host["w_gates"], NamedSharding(mesh_a, P(None, "model"))),
        "bias": jax.device_put(host["bias"], NamedSharding(mesh_a, P())),
        "step": jax.device_put(host["step"], NamedSharding(mesh_a, P())),
    }
    path = str(tmp_path / "ckpt")
    ckpt_io.save_train_state_orbax(path, on_a, {"epoch": 3})
    assert ckpt_io.is_orbax_checkpoint(path)

    template_b = {
        "w_gates": jax.device_put(
            jnp.zeros((16, 32), jnp.float32), NamedSharding(mesh_b, P("data", None))
        ),
        "bias": jax.device_put(jnp.zeros((32,), jnp.float32), NamedSharding(mesh_b, P())),
        "step": jax.device_put(jnp.zeros((), jnp.int32), NamedSharding(mesh_b, P())),
    }
    restored, meta = ckpt_io.restore_train_state_orbax(path, template_b)
    assert meta == {"epoch": 3}
    np.testing.assert_array_equal(np.asarray(restored["w_gates"]), host["w_gates"])
    np.testing.assert_array_equal(np.asarray(restored["bias"]), host["bias"])
    assert int(restored["step"]) == 7
    # and it actually landed with the new mesh's sharding
    assert restored["w_gates"].sharding.spec == P("data", None)
    assert restored["w_gates"].sharding.mesh.shape == {"data": 8, "model": 1}


def test_acoustic_trainer_orbax_roundtrip(tmp_path):
    from mri2speech_tpu.models.acoustic import AcousticModel
    from mri2speech_tpu.models.effnetv2 import StageSpec
    from mri2speech_tpu.train.acoustic import AcousticTrainer, AcousticTrainerConfig

    spec = (StageSpec("cn", 3, 1, 1, 8, 1), StageSpec("er", 3, 2, 2, 8, 1))
    model = AcousticModel(n_mels=8, rnn_hidden=8, cnn_spec=spec, cnn_stem=8)
    mesh = make_mesh(8, 1)
    cfg = AcousticTrainerConfig(micro_batch_size=8, use_orbax=True)
    trainer = AcousticTrainer(model, cfg, mesh=mesh)
    assert trainer.use_orbax

    rng = np.random.default_rng(1)
    batch = {
        "mri": rng.random((8, 4, 1, 32, 32)).astype(np.float32),
        "mel": rng.standard_normal((8, 4, 8)).astype(np.float32),
        "mask": np.ones((8, 4), dtype=np.float32),
    }
    state = trainer.init_state(batch)
    state, _ = trainer.train_epoch(state, [batch])

    trainer.sched.step(1.0)
    path = str(tmp_path / "best.orbax")
    trainer.save_best(path, state, epoch=4, train_loss=0.5, val_metrics={"loss": 0.25, "mse": 0.2})
    assert ckpt_io.is_orbax_checkpoint(path)

    trainer2 = AcousticTrainer(model, cfg, mesh=mesh)
    state2 = trainer2.init_state(batch)
    state2, start_epoch = trainer2.resume_from_checkpoint(path, state2)
    assert start_epoch == 5
    assert trainer2.best_val == 0.25
    assert trainer2.sched.state_dict() == trainer.sched.state_dict()
    assert int(state2.global_step) == int(state.global_step)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(state2.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # training continues from the restored state
    state2, metrics = trainer2.train_epoch(state2, [batch], epoch_idx=start_epoch)
    assert np.isfinite(metrics["loss"])


def test_vocoder_trainer_orbax_scan_resume(tmp_path):
    from mri2speech_tpu.config import default_vocoder_config
    from mri2speech_tpu.train.vocoder import VocoderTrainer, VocoderTrainerConfig

    h = default_vocoder_config(
        upsample_initial_channel=16, batch_size=8, segment_size=420 * 2
    )
    mesh = make_mesh(8, 1)
    trainer = VocoderTrainer(h, VocoderTrainerConfig(use_orbax=True), mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    audio = (np.random.default_rng(2).standard_normal((8, h["segment_size"])) * 0.1).astype(np.float32)
    state, _ = trainer.train_step(state, {"audio": audio})

    trainer.save(str(tmp_path), state, steps=12, epoch=3)
    assert ckpt_io.is_orbax_checkpoint(str(tmp_path / "g_00000012"))
    assert ckpt_io.is_orbax_checkpoint(str(tmp_path / "do_00000012"))

    trainer2 = VocoderTrainer(h, VocoderTrainerConfig(use_orbax=True), mesh=mesh)
    state2 = trainer2.init_state(jax.random.PRNGKey(0))
    state2, steps, epoch = trainer2.resume(str(tmp_path), state2)
    assert (steps, epoch) == (13, 3)
    for name in ("gen_params", "mpd_params", "msd_params", "msd_norm_stats", "opt_g", "opt_d"):
        for a, b in zip(
            jax.tree_util.tree_leaves(getattr(state, name)),
            jax.tree_util.tree_leaves(getattr(state2, name)),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # one more step runs from the restored state
    state2, metrics = trainer2.train_step(state2, {"audio": audio})
    assert np.isfinite(float(metrics["loss_gen_all"]))
