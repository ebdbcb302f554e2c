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


def test_gan_train_step_bf16_grads():
    """bf16-quantized gradients with fp32 master params/moments (the measured
    HBM lever, docs/BENCH_NOTES.md): step stays finite, params and the WHOLE
    optimizer state remain fp32 (a bare down-cast would flip the moments to
    bf16 on the first update), and the update actually moves the params."""
    t = VocoderTrainer(
        default_vocoder_config(upsample_initial_channel=32, segment_size=8400),
        VocoderTrainerConfig(bf16=True, bf16_grads=True),
    )
    state = t.init_state(jax.random.PRNGKey(0))
    before = np.asarray(jax.tree_util.tree_leaves(state.gen_params)[0])
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((2, 8400)).astype(np.float32) * 0.1).clip(-1, 1)
    state, metrics = t.train_step(state, {"audio": audio, "mel": None})
    assert np.isfinite(float(metrics["loss_gen_all"]))
    assert np.isfinite(float(metrics["loss_disc_all"]))
    for leaf in jax.tree_util.tree_leaves(state.gen_params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(state.opt_g):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32
    after = np.asarray(jax.tree_util.tree_leaves(state.gen_params)[0])
    assert not np.array_equal(before, after)


def test_lean_discriminator_config():
    """mpd_periods/msd_scales knobs (ablations + the multichip dryrun's tiny
    wiring leg) shrink the ensemble while keeping the structure: sub-D counts
    follow the config and the D+G step still runs finite."""
    t = VocoderTrainer(
        default_vocoder_config(upsample_initial_channel=32, segment_size=8400),
        VocoderTrainerConfig(mpd_periods=(2, 3), msd_scales=2),
    )
    assert t.mpd.periods == (2, 3)
    assert t.msd.num_scales == 2
    state = t.init_state(jax.random.PRNGKey(0))
    # exactly 2 MSD sub-discriminators and 2 MPD sub-discriminators in params
    assert set(state.msd_params.keys()) == {"discriminators_0", "discriminators_1"}
    assert len(state.mpd_params.keys()) == 2
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((2, 8400)).astype(np.float32) * 0.1).clip(-1, 1)
    state, metrics = t.train_step(state, {"audio": audio, "mel": None})
    assert np.isfinite(float(metrics["loss_gen_all"]))
    assert np.isfinite(float(metrics["loss_disc_all"]))


def test_adabelief_matches_optax():
    """train/optim.py fp32 path is BIT-IDENTICAL to optax.adabelief over
    multiple steps; the bf16-state path tracks it to bf16 quantisation error."""
    import optax

    from mri2speech_tpu.train.optim import adabelief

    rng = np.random.default_rng(0)
    params = {
        "a": jnp.asarray(rng.standard_normal((17, 33)), jnp.float32),
        "b": jnp.asarray(rng.standard_normal((5,)), jnp.float32),
    }
    tx_ref = optax.adabelief(2e-4, b1=0.8, b2=0.99, eps=1e-16, eps_root=1e-16)
    tx_new = adabelief(2e-4, b1=0.8, b2=0.99, eps=1e-16, eps_root=1e-16)
    tx_bf = adabelief(
        2e-4, b1=0.8, b2=0.99, eps=1e-16, eps_root=1e-16,
        state_dtype=jnp.bfloat16,
    )
    s_ref, s_new, s_bf = tx_ref.init(params), tx_new.init(params), tx_bf.init(params)
    p_ref, p_new, p_bf = params, params, params
    for _ in range(5):
        g = {
            k: jnp.asarray(rng.standard_normal(v.shape), jnp.float32) * 0.1
            for k, v in params.items()
        }
        u, s_ref = tx_ref.update(g, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, u)
        u, s_new = tx_new.update(g, s_new, p_new)
        p_new = optax.apply_updates(p_new, u)
        u, s_bf = tx_bf.update(g, s_bf, p_bf)
        p_bf = optax.apply_updates(p_bf, u)
    for k in params:
        np.testing.assert_array_equal(np.asarray(p_ref[k]), np.asarray(p_new[k]))
        rel = np.linalg.norm(np.asarray(p_bf[k]) - np.asarray(p_ref[k])) / (
            np.linalg.norm(np.asarray(p_ref[k])) + 1e-12
        )
        assert rel < 1e-4, f"bf16-state drift too large for {k}: {rel}"
    assert jax.tree_util.tree_leaves(s_bf[0].mu)[0].dtype == jnp.bfloat16


def test_gan_train_step_bf16_opt_state(tmp_path):
    """bf16 AdaBelief moments: step runs, params stay fp32 masters, moments are
    bf16, and the g_/do_ checkpoint roundtrip preserves the reduced dtype."""
    t = VocoderTrainer(
        default_vocoder_config(upsample_initial_channel=32, segment_size=8400),
        VocoderTrainerConfig(bf16_opt_state=True),
    )
    state = t.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((2, 8400)).astype(np.float32) * 0.1).clip(-1, 1)
    state, metrics = t.train_step(state, {"audio": audio, "mel": None})
    assert np.isfinite(float(metrics["loss_gen_all"]))
    assert jax.tree_util.tree_leaves(state.gen_params)[0].dtype == jnp.float32
    mu = state.opt_g.inner_state[0].mu
    assert jax.tree_util.tree_leaves(mu)[0].dtype == jnp.bfloat16

    t.save(str(tmp_path), state, steps=7, epoch=0)
    restored, steps, _ = t.resume(str(tmp_path), t.init_state(jax.random.PRNGKey(1)))
    assert steps == 8
    r_mu = jax.tree_util.tree_leaves(restored.opt_g.inner_state[0].mu)
    assert r_mu[0].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(r_mu[0], np.float32),
        np.asarray(jax.tree_util.tree_leaves(mu)[0], np.float32),
    )
