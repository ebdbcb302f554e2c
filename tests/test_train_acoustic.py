"""Acoustic trainer smoke tests on a tiny model + synthetic data."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mri2speech_tpu.models.acoustic import AcousticModel
from mri2speech_tpu.models.effnetv2 import StageSpec
from mri2speech_tpu.train.acoustic import (
    AcousticTrainer,
    AcousticTrainerConfig,
    _reshape_micro,
)

TINY_SPEC = (
    StageSpec("cn", 3, 1, 1, 8, 1),
    StageSpec("er", 3, 2, 2, 8, 1),
    StageSpec("ir", 3, 2, 2, 16, 1, 0.25),
)


def _tiny_model():
    return AcousticModel(
        n_mels=8, rnn_hidden=16, dropout=0.1, cnn_spec=TINY_SPEC, cnn_stem=8
    )


def _batch(rng, B=4, T=4, HW=32, M=8):
    return {
        "mri": rng.random((B, T, 1, HW, HW)).astype(np.float32),
        "mel": rng.standard_normal((B, T, M)).astype(np.float32),
        "mask": np.ones((B, T), dtype=np.float32),
    }


@pytest.fixture(scope="module")
def trainer_and_state():
    """NOTE: the train step donates its input state, so each test gets a FRESH
    state from the factory — reusing a stepped-on state raises 'deleted array'."""
    rng = np.random.default_rng(0)
    model = _tiny_model()
    cfg = AcousticTrainerConfig(micro_batch_size=2, lr=1e-3)
    trainer = AcousticTrainer(model, cfg)

    def make_state():
        return trainer.init_state(_batch(np.random.default_rng(0)))

    return trainer, make_state, rng


@pytest.mark.smoke
def test_reshape_micro():
    b = {"mri": np.zeros((8, 4, 1, 8, 8)), "mel": np.zeros((8, 4, 8)), "mask": np.zeros((8, 4))}
    m = _reshape_micro(b, 2)
    assert m["mri"].shape == (4, 2, 4, 1, 8, 8)
    assert m["row_valid"].shape == (4, 2) and m["row_valid"].all()
    # uneven batch gets padded up; the pad rows are marked invalid so the
    # loss drops them from every term (reference parity: its uneven final
    # micro-batch just runs smaller, train_mri_acoustic_model.py:255-261)
    b5 = {"mri": np.zeros((5, 4, 1, 8, 8)), "mel": np.zeros((5, 4, 8)), "mask": np.zeros((5, 4))}
    m5 = _reshape_micro(b5, 2)
    assert m5["mri"].shape == (3, 2, 4, 1, 8, 8)
    np.testing.assert_array_equal(
        m5["row_valid"], [[1.0, 1.0], [1.0, 1.0], [1.0, 0.0]]
    )
    # fixed_mbs: mesh trainers must not shrink mbs below micro_batch_size
    b2 = {"mri": np.zeros((2, 4, 1, 8, 8)), "mel": np.zeros((2, 4, 8)), "mask": np.zeros((2, 4))}
    m2 = _reshape_micro(b2, 4, fixed_mbs=True)
    assert m2["mri"].shape == (1, 4, 4, 1, 8, 8)
    np.testing.assert_array_equal(m2["row_valid"], [[1.0, 1.0, 0.0, 0.0]])
    assert _reshape_micro(b2, 4)["mri"].shape == (1, 2, 4, 1, 8, 8)


@pytest.mark.smoke  # the smoke tier's one tiny-train step (cold ~60 s)
def test_train_step_decreases_loss(trainer_and_state):
    trainer, make_state, rng = trainer_and_state
    state = make_state()
    batch = _batch(rng)
    micro = _reshape_micro(batch, 2)
    losses = []
    for i in range(8):
        state, metrics = trainer._train_step(
            state, micro, jnp.float32(1e-3), jax.random.PRNGKey(i)
        )
        losses.append(float(metrics["loss"]))
    assert int(state.global_step) == 8
    assert losses[-1] < losses[0]  # overfits a fixed batch
    assert all(np.isfinite(l) for l in losses)
    assert "band_f0" in metrics  # n_mels=8 keeps only f0/f1-prefix bands


def test_eval_step_and_validate(trainer_and_state):
    trainer, make_state, rng = trainer_and_state
    state = make_state()
    batch = _batch(rng)
    m = trainer._eval_step(state, {k: jnp.asarray(v) for k, v in batch.items()})
    assert np.isfinite(float(m["loss"]))

    loader = [_batch(rng) for _ in range(2)]
    va = trainer.validate(state, loader)
    assert np.isfinite(va["loss"]) and "mae" in va


def test_checkpoint_roundtrip(tmp_path, trainer_and_state):
    trainer, make_state, rng = trainer_and_state
    state = make_state()
    path = str(tmp_path / "best.ckpt")
    trainer.save_best(path, state, epoch=3, train_loss=1.25, val_metrics={"loss": 0.5, "mse": 0.4})

    model = _tiny_model()
    t2 = AcousticTrainer(model, AcousticTrainerConfig(micro_batch_size=2, lr=1e-3))
    s2 = t2.init_state(_batch(np.random.default_rng(1)))
    s2, start_epoch = t2.resume_from_checkpoint(path, s2)
    assert start_epoch == 4
    assert t2.best_val == 0.5
    # params restored identically
    flat_a = jax.tree_util.tree_leaves(state.params)
    flat_b = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed state can continue training
    s2, metrics = t2._train_step(
        s2, _reshape_micro(_batch(rng), 2), jnp.float32(1e-3), jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.smoke
def test_plateau_scheduler_semantics():
    from mri2speech_tpu.train.schedule import ReduceLROnPlateau

    s = ReduceLROnPlateau(1.0, factor=0.5, patience=2, min_lr=0.1)
    assert s.step(1.0) == 1.0  # new best
    assert s.step(1.0) == 1.0  # bad 1
    assert s.step(1.0) == 1.0  # bad 2
    assert s.step(1.0) == 0.5  # bad 3 > patience -> reduce
    for _ in range(10):
        s.step(1.0)
    assert s.lr >= 0.1  # respects min_lr
    state = s.state_dict()
    s2 = ReduceLROnPlateau(1.0, factor=0.5, patience=2, min_lr=0.1)
    s2.load_state_dict(state)
    assert s2.lr == s.lr


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Sharding-aware orbax save/restore path (multi-host story)."""
    import jax as _jax

    from mri2speech_tpu.train.checkpoint import restore_pytree_orbax, save_pytree_orbax

    tree = {
        "w": np.arange(12, dtype=np.float32).reshape(3, 4),
        "nested": {"b": np.ones(5, dtype=np.float32)},
    }
    path = str(tmp_path / "ckpt_orbax")
    save_pytree_orbax(path, tree)
    restored = restore_pytree_orbax(path, _jax.tree_util.tree_map(np.zeros_like, tree))
    np.testing.assert_array_equal(np.asarray(restored["w"]), tree["w"])
    np.testing.assert_array_equal(np.asarray(restored["nested"]["b"]), tree["nested"]["b"])
