"""Vocoder GAN trainer smoke tests (small generator config)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mri2speech_tpu.config import default_vocoder_config
from mri2speech_tpu.train.vocoder import GanState, VocoderTrainer, VocoderTrainerConfig


@pytest.fixture(scope="module")
def trainer():
    h = default_vocoder_config(upsample_initial_channel=32, segment_size=8400)
    return VocoderTrainer(h)


def test_gan_train_step_runs_and_is_finite(trainer):
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((2, 8400)).astype(np.float32) * 0.1).clip(-1, 1)
    batch = {"audio": audio, "mel": None}
    metrics_hist = []
    for _ in range(2):
        state, metrics = trainer.train_step(state, batch)
        metrics_hist.append({k: float(v) for k, v in metrics.items()})
    for m in metrics_hist:
        assert np.isfinite(m["loss_gen_all"])
        assert np.isfinite(m["loss_disc_all"])
        assert np.isfinite(m["mel_error"])
    # mel L1 term dominates early G loss: must exceed 45*something small
    assert metrics_hist[0]["loss_gen_all"] > 0


def test_gan_checkpoint_roundtrip(tmp_path, trainer):
    state = trainer.init_state(jax.random.PRNGKey(1))
    trainer.save(str(tmp_path), state, steps=123, epoch=4)
    assert (tmp_path / "g_00000123").is_file()
    assert (tmp_path / "do_00000123").is_file()

    fresh = trainer.init_state(jax.random.PRNGKey(2))
    restored, steps, epoch = trainer.resume(str(tmp_path), fresh)
    assert steps == 124 and epoch == 4
    a = jax.tree_util.tree_leaves(state.gen_params)
    b = jax.tree_util.tree_leaves(restored.gen_params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # no checkpoints -> untouched
    s2, steps2, epoch2 = trainer.resume(str(tmp_path / "empty"), fresh)
    assert steps2 == 0 and epoch2 == -1


def test_validation_mel_error(trainer):
    state = trainer.init_state(jax.random.PRNGKey(3))
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(9000).astype(np.float32) * 0.1).clip(-1, 1)
    err, y_hat = trainer.validation_mel_error(state, audio, None)
    assert np.isfinite(err) and err > 0
    assert y_hat.ndim == 1 and y_hat.shape[0] % 420 == 0


def test_finetuning_step_uses_provided_mel(trainer):
    t = VocoderTrainer(
        default_vocoder_config(upsample_initial_channel=32, segment_size=8400),
        VocoderTrainerConfig(fine_tuning=True),
    )
    state = t.init_state(jax.random.PRNGKey(4))
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal((2, 8400)).astype(np.float32) * 0.1).clip(-1, 1)
    mel = rng.standard_normal((2, 64, 20)).astype(np.float32)
    state, metrics = t.train_step(state, {"audio": audio, "mel": mel})
    assert np.isfinite(float(metrics["loss_gen_all"]))


def test_gan_train_step_bf16():
    """bf16 forwards with fp32 losses/optimizer stay finite (SURVEY hard-part:
    the reference needs an fp16 GradScaler; bf16 on TPU needs none)."""
    import jax.numpy as jnp

    t = VocoderTrainer(
        default_vocoder_config(upsample_initial_channel=32, segment_size=8400),
        VocoderTrainerConfig(bf16=True),
    )
    state = t.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((2, 8400)).astype(np.float32) * 0.1).clip(-1, 1)
    state, metrics = t.train_step(state, {"audio": audio, "mel": None})
    assert np.isfinite(float(metrics["loss_gen_all"]))
    assert np.isfinite(float(metrics["loss_disc_all"]))
    # params remain fp32
    leaf = jax.tree_util.tree_leaves(state.gen_params)[0]
    assert leaf.dtype == jnp.float32
