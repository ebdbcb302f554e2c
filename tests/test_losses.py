"""Loss golden tests: independent numpy recomputation + hand-computed cases."""
import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.smoke  # cold-cache fast: tiny jits only

from mri2speech_tpu.losses import (
    MaskedMSEMAE,
    discriminator_loss,
    feature_loss,
    generator_loss,
    masked_mse_mae_loss,
)
from mri2speech_tpu.losses.masked_mse_mae import compute_band_mae


def _numpy_masked_loss(pred, target, mask, step, num_mels=64, max_frames=128, ramp_steps=120000):
    """Independent numpy recomputation of the documented loss semantics."""
    B, T, M = pred.shape
    ramp = min(1.0, step / ramp_steps)

    fb = np.ones(num_mels)
    ft = np.ones(num_mels)
    ft[0:6] = 2.0
    ft[6:16] = 3.0
    ft[16:32] = 2.4
    ft[32:48] = 1.6
    ft[48:64] = 1.8
    tb = np.ones(max_frames)
    tt = np.ones(max_frames)
    tt[:8] = [1.6, 1.45, 1.3, 1.2, 1.15, 1.1, 1.05, 1.02]

    fw = ((1 - ramp) * fb + ramp * ft)[:M].reshape(1, 1, M)
    tw = ((1 - ramp) * tb + ramp * tt)[:T].reshape(1, T, 1)
    w = np.broadcast_to(fw * tw, (B, T, M)).copy()
    diff = pred - target
    m3 = None
    if mask is not None:
        m3 = mask[..., None]
        w = w * m3
    denom = max(w.sum(), 1e-6)
    mse = (diff ** 2 * w).sum() / denom
    mae = (np.abs(diff) * w).sum() / denom

    delta = diff[:, 1:] - diff[:, :-1]
    dw = np.broadcast_to(fw * tw[:, 1:], (B, T - 1, M)).copy()
    if m3 is not None:
        dw = dw * m3[:, 1:] * m3[:, :-1]
    dl = (delta ** 2 * dw).sum() / max(dw.sum(), 1e-6)

    accel = diff[:, 2:] - 2 * diff[:, 1:-1] + diff[:, :-2]
    aw = np.broadcast_to(fw * tw[:, 1 : T - 1], (B, T - 2, M)).copy()
    if m3 is not None:
        aw = aw * m3[:, 2:] * m3[:, 1:-1] * m3[:, :-2]
    al = (accel ** 2 * aw).sum() / max(aw.sum(), 1e-6)

    latest = diff[:, -1, :]
    lw = np.broadcast_to(fw[:, -1:, :], (B, 1, M))
    ll = (latest ** 2 * lw[:, 0, :]).sum() / max(lw.sum(), 1e-6)

    loss = mse + (0.3 + 0.15 * ramp) * dl + (0.1 + 0.05 * ramp) * al + (0.2 + 0.2 * ramp) * ll
    return loss, mse, mae


@pytest.mark.parametrize("step", [0, 60_000, 120_000, 500_000])
@pytest.mark.parametrize("with_mask", [True, False])
def test_masked_mse_mae_matches_numpy(rng, step, with_mask):
    B, T, M = 3, 4, 64
    pred = rng.standard_normal((B, T, M)).astype(np.float32)
    target = rng.standard_normal((B, T, M)).astype(np.float32)
    mask = None
    if with_mask:
        mask = (rng.random((B, T)) > 0.2).astype(np.float32)
    loss, mse, mae = masked_mse_mae_loss(
        jnp.asarray(pred), jnp.asarray(target),
        None if mask is None else jnp.asarray(mask), jnp.float32(step),
    )
    ref_loss, ref_mse, ref_mae = _numpy_masked_loss(
        pred.astype(np.float64), target.astype(np.float64), mask, step
    )
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-4)
    np.testing.assert_allclose(float(mse), ref_mse, rtol=1e-4)
    np.testing.assert_allclose(float(mae), ref_mae, rtol=1e-4)


def test_masked_loss_hand_computed_zero_error():
    pred = jnp.ones((1, 4, 64))
    loss, mse, mae = masked_mse_mae_loss(pred, pred, jnp.ones((1, 4)), jnp.float32(0))
    assert float(loss) == 0.0 and float(mse) == 0.0 and float(mae) == 0.0


def test_masked_loss_class_wrapper():
    crit = MaskedMSEMAE()
    crit.set_step(120_000)
    pred = jnp.zeros((2, 4, 64))
    target = jnp.ones((2, 4, 64))
    loss, mse, mae = crit(pred, target, jnp.ones((2, 4)))
    # fully ramped: constant error 1 -> weighted mse = 1, mae = 1, delta/accel = 0,
    # latest = 1 with coeff 0.4 -> total 1.4
    np.testing.assert_allclose(float(loss), 1.4, rtol=1e-5)
    np.testing.assert_allclose(float(mse), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(mae), 1.0, rtol=1e-6)


def test_masked_loss_long_sequence_extends_time_weights(rng):
    """T > max_frames (128) must not crash: frames past the 8 emphasised
    leading entries weight 1.0, so the result equals an explicit
    max_frames=T call (the reference's fixed buffer would raise here)."""
    B, T, M = 1, 200, 64
    pred = rng.standard_normal((B, T, M)).astype(np.float32)
    target = rng.standard_normal((B, T, M)).astype(np.float32)
    loss, mse, mae = masked_mse_mae_loss(
        jnp.asarray(pred), jnp.asarray(target), None, jnp.float32(120_000)
    )
    loss2, mse2, mae2 = masked_mse_mae_loss(
        jnp.asarray(pred), jnp.asarray(target), None, jnp.float32(120_000),
        max_frames=T,
    )
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(float(loss), float(loss2), rtol=1e-6)
    np.testing.assert_allclose(float(mse), float(mse2), rtol=1e-6)
    np.testing.assert_allclose(float(mae), float(mae2), rtol=1e-6)


def test_masked_loss_row_valid_drops_padded_rows(rng):
    """Padded batch rows with row_valid=0 contribute to NO term (including
    the otherwise-unmasked last-frame auxiliary): the loss over a padded
    micro-batch equals the loss over its real rows alone — the reference's
    smaller-final-micro semantics (`train_mri_acoustic_model.py:255-261`)."""
    B, T, M = 3, 6, 64
    pred = rng.standard_normal((B, T, M)).astype(np.float32)
    target = rng.standard_normal((B, T, M)).astype(np.float32)
    mask = (rng.random((B, T)) > 0.2).astype(np.float32)
    step = jnp.float32(60_000)

    # pad with a GARBAGE row marked invalid
    pad_pred = np.concatenate([pred, 100 * np.ones((1, T, M), np.float32)])
    pad_target = np.concatenate([target, np.zeros((1, T, M), np.float32)])
    pad_mask = np.concatenate([mask, np.ones((1, T), np.float32)])
    rv = np.array([1.0, 1.0, 1.0, 0.0], np.float32)

    ref = masked_mse_mae_loss(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask), step)
    got = masked_mse_mae_loss(
        jnp.asarray(pad_pred), jnp.asarray(pad_target), jnp.asarray(pad_mask),
        step, row_valid=jnp.asarray(rv),
    )
    for g, r in zip(got, ref):
        np.testing.assert_allclose(float(g), float(r), rtol=1e-5)

    # same for the unmasked (mask=None) call path
    ref_nm = masked_mse_mae_loss(jnp.asarray(pred), jnp.asarray(target), None, step)
    got_nm = masked_mse_mae_loss(
        jnp.asarray(pad_pred), jnp.asarray(pad_target), None, step,
        row_valid=jnp.asarray(rv),
    )
    for g, r in zip(got_nm, ref_nm):
        np.testing.assert_allclose(float(g), float(r), rtol=1e-5)

    # band diagnostics likewise
    bands_ref = compute_band_mae(jnp.asarray(pred), jnp.asarray(target))
    bands_got = compute_band_mae(
        jnp.asarray(pad_pred), jnp.asarray(pad_target), row_valid=jnp.asarray(rv)
    )
    for k in bands_ref:
        np.testing.assert_allclose(float(bands_got[k]), float(bands_ref[k]), rtol=1e-5)


def test_band_mae():
    pred = jnp.zeros((1, 2, 64))
    target = jnp.ones((1, 2, 64))
    bands = compute_band_mae(pred, target)
    assert set(bands) == {"f0", "f1", "f2", "high"}
    for v in bands.values():
        np.testing.assert_allclose(float(v), 1.0)


def test_gan_losses_hand_computed():
    real = [jnp.asarray([[1.0, 1.0]]), jnp.asarray([[0.0]])]
    fake = [jnp.asarray([[0.0, 0.0]]), jnp.asarray([[1.0]])]
    loss, r_losses, g_losses = discriminator_loss(real, fake)
    # d1: (1-1)^2 + 0^2 = 0 ; d2: (1-0)^2 + 1^2 = 2
    np.testing.assert_allclose(float(loss), 2.0)
    np.testing.assert_allclose([float(x) for x in r_losses], [0.0, 1.0])
    np.testing.assert_allclose([float(x) for x in g_losses], [0.0, 1.0])

    gloss, gs = generator_loss(fake)
    # (1-0)^2 = 1 ; (1-1)^2 = 0
    np.testing.assert_allclose(float(gloss), 1.0)

    fr = [[jnp.ones((1, 3)), jnp.zeros((1, 2))]]
    fg = [[jnp.zeros((1, 3)), jnp.zeros((1, 2))]]
    fl = feature_loss(fr, fg)
    np.testing.assert_allclose(float(fl), 2.0)  # mean|1-0| * 2
