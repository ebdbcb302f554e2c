"""Multi-device tests on the virtual 8-CPU mesh: DP training step + sharding."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mri2speech_tpu.models.acoustic import AcousticModel
from mri2speech_tpu.models.effnetv2 import StageSpec
from mri2speech_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
from mri2speech_tpu.train.acoustic import (
    AcousticTrainer,
    AcousticTrainerConfig,
    _reshape_micro,
)

TINY_SPEC = (
    StageSpec("cn", 3, 1, 1, 8, 1),
    StageSpec("er", 3, 2, 2, 8, 1),
)


def test_mesh_and_sharding_helpers():
    mesh = make_mesh(4, 2)
    assert mesh.shape == {"data": 4, "model": 2}
    x = np.zeros((8, 3, 5), dtype=np.float32)
    xs = jax.device_put(x, batch_sharding(mesh, x.ndim))
    assert xs.sharding.spec == P("data", None, None)

    tree = shard_batch({"a": np.zeros((8, 2)), "b": np.zeros((16,))}, mesh)
    assert tree["a"].sharding.spec == P("data", None)
    assert tree["b"].sharding.spec == P("data")

    rep = replicate({"w": np.ones((3, 3))}, mesh)
    assert rep["w"].sharding.spec == P()


def test_dp_train_step_matches_single_device():
    """The sharded step must produce the same loss/params as unsharded."""
    mesh = make_mesh(8, 1)
    model = AcousticModel(n_mels=8, rnn_hidden=8, cnn_spec=TINY_SPEC, cnn_stem=8)
    # two identically-seeded trainers: init_state advances the trainer RNG, so
    # a single trainer would give the two runs different initial weights
    cfg = AcousticTrainerConfig(micro_batch_size=8, lr=1e-3)
    trainer = AcousticTrainer(model, cfg)
    trainer_sh = AcousticTrainer(model, cfg)

    rng = np.random.default_rng(0)
    B = 16
    batch = {
        "mri": rng.random((B, 4, 1, 32, 32)).astype(np.float32),
        "mel": rng.standard_normal((B, 4, 8)).astype(np.float32),
        "mask": np.ones((B, 4), dtype=np.float32),
    }
    micro = _reshape_micro(batch, 8)

    # single device
    s1 = trainer.init_state(batch)
    s1, m1 = trainer._train_step(
        s1, {k: jnp.asarray(v) for k, v in micro.items()},
        jnp.float32(1e-3), jax.random.PRNGKey(0),
    )

    # data-parallel over 8 devices (micro axis unsharded, batch dim sharded)
    s2 = trainer_sh.init_state(batch)
    s2 = s2.replace(
        params=jax.device_put(s2.params, NamedSharding(mesh, P())),
        batch_stats=jax.device_put(s2.batch_stats, NamedSharding(mesh, P())),
        opt_state=jax.device_put(s2.opt_state, NamedSharding(mesh, P())),
        global_step=jax.device_put(s2.global_step, NamedSharding(mesh, P())),
    )
    micro_sh = {
        k: jax.device_put(
            np.asarray(v), NamedSharding(mesh, P(*([None, "data"] + [None] * (np.asarray(v).ndim - 2))))
        )
        for k, v in micro.items()
    }
    s2, m2 = trainer_sh._train_step(s2, micro_sh, jnp.float32(1e-3), jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3)


def test_dp_tp_train_step_matches_single_device():
    """PRODUCT-path DP x TP (data=4 x model=2) == single device.

    No hand-built shardings: `AcousticTrainer(mesh=...)` places params via
    `acoustic_param_sharding` (BiLSTM gates + head over `model`) in
    `init_state`, and `_put_micro` shards the batch — the exact path
    `m2s-train-acoustic --num_devices 8 --model_devices 2` takes.
    """
    from mri2speech_tpu.parallel.mesh import acoustic_param_sharding
    from jax.sharding import PartitionSpec

    mesh = make_mesh(4, 2)
    model = AcousticModel(n_mels=8, rnn_hidden=8, cnn_spec=TINY_SPEC, cnn_stem=8)
    cfg = AcousticTrainerConfig(micro_batch_size=8, lr=1e-3)
    trainer = AcousticTrainer(model, cfg)
    trainer_sh = AcousticTrainer(model, cfg, mesh=mesh)

    rng = np.random.default_rng(0)
    B = 16
    batch = {
        "mri": rng.random((B, 4, 1, 32, 32)).astype(np.float32),
        "mel": rng.standard_normal((B, 4, 8)).astype(np.float32),
        "mask": np.ones((B, 4), dtype=np.float32),
    }
    micro = _reshape_micro(batch, 8)

    s1 = trainer.init_state(batch)
    s1, m1 = trainer._train_step(
        s1, {k: jnp.asarray(v) for k, v in micro.items()},
        jnp.float32(1e-3), jax.random.PRNGKey(0),
    )

    s2 = trainer_sh.init_state(batch)
    # the TP rules actually engaged: 4H=32 gate dim sharded over model=2
    specs = jax.tree_util.tree_map(
        lambda x: x.sharding.spec, s2.params,
        is_leaf=lambda x: hasattr(x, "sharding"),
    )
    flat = {
        "/".join(getattr(k, "key", str(k)) for k in path): s
        for path, s in jax.tree_util.tree_flatten_with_path(specs)[0]
    }
    assert any(
        "rnn" in k and s == PartitionSpec(None, "model") for k, s in flat.items()
    ), flat
    # and the sharding tree is what the product helper prescribes
    want = acoustic_param_sharding(mesh, s2.params)
    got = jax.tree_util.tree_map(
        lambda x: x.sharding, s2.params, is_leaf=lambda x: hasattr(x, "sharding")
    )
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: a == b, got, want)
    )

    micro_sh = trainer_sh._put_micro(micro)
    s2, m2 = trainer_sh._train_step(
        s2, micro_sh, jnp.float32(1e-3), jax.random.PRNGKey(0)
    )

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3)


def test_vocoder_dp_gan_step_matches_single_device():
    """The sharded vocoder D+G step == unsharded: same losses, same params.

    Covers the one trainer the reference actually distributes
    (`train.py:26-28,59-62,306-307`), incl. spectral-norm `norm_stats`
    replication and the saved-vjp G-step under GSPMD.
    """
    from mri2speech_tpu.config import default_vocoder_config
    from mri2speech_tpu.train.vocoder import VocoderTrainer, VocoderTrainerConfig

    h = default_vocoder_config(
        upsample_initial_channel=16, batch_size=8, segment_size=420 * 8
    )
    mesh = make_mesh(8, 1)
    t1 = VocoderTrainer(h, VocoderTrainerConfig())
    t2 = VocoderTrainer(h, VocoderTrainerConfig(), mesh=mesh)

    rng = np.random.default_rng(3)
    audio = (rng.standard_normal((8, h["segment_size"])) * 0.1).astype(np.float32)
    batch = {"audio": audio}

    s1 = t1.init_state(jax.random.PRNGKey(h["seed"]))
    s1, m1 = t1.train_step(s1, batch)

    s2 = t2.init_state(jax.random.PRNGKey(h["seed"]))
    assert jax.tree_util.tree_leaves(s2.gen_params)[0].sharding.spec == P()
    s2, m2 = t2.train_step(s2, batch)

    for k in ("loss_gen_all", "loss_disc_all", "mel_error"):
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=2e-4)
    for name in ("gen_params", "mpd_params", "msd_params", "msd_norm_stats"):
        for a, b in zip(
            jax.tree_util.tree_leaves(getattr(s1, name)),
            jax.tree_util.tree_leaves(getattr(s2, name)),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3)


def test_vocoder_trainer_rejects_indivisible_batch():
    from mri2speech_tpu.config import default_vocoder_config
    from mri2speech_tpu.train.vocoder import VocoderTrainer

    h = default_vocoder_config(batch_size=6)
    with pytest.raises(ValueError, match="divisible"):
        VocoderTrainer(h, mesh=make_mesh(8, 1))


def test_prepare_dryrun_cache_generations(tmp_path):
    """AOT-cache staleness protocol (validate-FIRST — the round-3 marker-based
    blanket wipe destroyed a warm cache at driver time, MULTICHIP_r03 rc=124):
    a dir whose canary LOAD passes keeps its entries whether or not it carries
    a marker; only a failing canary wipes. The canary runs twice so the second
    call always exercises a real AOT load."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "graft_entry_cache", Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    d = tmp_path / "cache"
    marker = d / ".canary_generation"

    # fresh dir: seeded + marked
    calls = []
    m._prepare_dryrun_cache(str(d), canary=lambda _d: calls.append(1) or True)
    assert marker.exists()
    assert len(calls) == 2  # compile + LOAD validation

    # marked dir, passing canary: entries survive
    (d / "entry.bin").write_bytes(b"x")
    m._prepare_dryrun_cache(str(d), canary=lambda _d: True)
    assert (d / "entry.bin").exists()

    # UNMARKED pre-existing dir with a passing canary: entries SURVIVE
    # (validate-first; the marker is informational, not a wipe trigger)
    marker.unlink()
    m._prepare_dryrun_cache(str(d), canary=lambda _d: True)
    assert (d / "entry.bin").exists()
    assert marker.exists()

    # failing canary: wiped even though marked
    (d / "entry2.bin").write_bytes(b"x")
    m._prepare_dryrun_cache(str(d), canary=lambda _d: False)
    assert not (d / "entry2.bin").exists()
    assert marker.exists()


def test_graft_entry_dryrun_8_devices(monkeypatch):
    import importlib.util
    from pathlib import Path

    # tiny wiring check only — the driver runs the full-size default (which
    # compiles EffNetV2-B2 + the 512-ch GAN; far too slow for the suite)
    monkeypatch.setenv("MRI2SPEECH_DRYRUN_FULL", "0")
    spec = importlib.util.spec_from_file_location(
        "graft_entry", Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    m.dryrun_multichip(8)  # raises on failure


def test_two_process_dp_training_step():
    """Genuine 2-OS-process multi-host training through the PRODUCT CLI
    flags (`m2s-train-vocoder --coordinator_address/--num_processes/
    --process_id`, the reference's real distributed mode re-surfaced,
    `train.py:26-28,300-307`): train 2 steps on a Gloo-coordinated 8-device
    global mesh with orbax checkpoints, SIGTERM-preempt both ranks at the
    multi-host-agreed step, and resume past the preemption checkpoint."""
    import subprocess
    import sys
    from pathlib import Path

    script = (
        Path(__file__).resolve().parents[1] / "tools" / "multiprocess_train_check.py"
    )
    proc = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True, timeout=1800
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PASSED" in proc.stdout
