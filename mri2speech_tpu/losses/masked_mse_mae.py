"""Masked, frequency/time-weighted MSE+MAE with delta regularisation.

Pure-function port of the acoustic training loss
(`train_mri_acoustic_model.py:57-170`):

* frequency-band emphasis (ramped): F0 bins [0,6)->2.0, F1 [6,16)->3.0,
  F2 [16,32)->2.4, upper-mid [32,48)->1.6, high [48,64)->1.8
* leading-frame time emphasis: [1.6, 1.45, 1.3, 1.2, 1.15, 1.1, 1.05, 1.02]
* linear ramp base->target over `ramp_steps` (default 120k) training steps
* 1st (delta) and 2nd (accel) order temporal smoothness penalties on the error
* last-frame auxiliary MSE
* ramped coefficients: delta 0.30->0.45, accel 0.10->0.15, latest 0.20->0.40

`step` is a traced scalar so the ramp advances without recompilation.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# (start, end) bin ranges for band metrics (`train_mri_acoustic_model.py:98-103`)
BAND_RANGES: Dict[str, Tuple[int, int]] = {
    "f0": (0, 6),
    "f1": (6, 16),
    "f2": (16, 32),
    "high": (48, 64),
}


@functools.lru_cache(maxsize=8)
def _freq_weights(num_mels: int) -> tuple[np.ndarray, np.ndarray]:
    base = np.ones(num_mels, dtype=np.float32)
    target = base.copy()

    def apply(rng, w):
        s, e = rng
        if e > s:
            target[s:e] = w

    apply((0, min(6, num_mels)), 2.0)
    apply((6, min(16, num_mels)), 3.0)
    apply((16, min(32, num_mels)), 2.4)
    apply((32, min(48, num_mels)), 1.6)
    apply((max(num_mels - 16, 0), num_mels), 1.8)
    return base, target


@functools.lru_cache(maxsize=8)
def _time_weights(max_frames: int) -> tuple[np.ndarray, np.ndarray]:
    base = np.ones(max_frames, dtype=np.float32)
    target = base.copy()
    for idx, val in enumerate([1.6, 1.45, 1.3, 1.2, 1.15, 1.1, 1.05, 1.02]):
        if idx < max_frames:
            target[idx] = val
    return base, target


def masked_mse_mae_loss(
    pred: Array,
    target: Array,
    mask: Optional[Array],
    step: Array,
    *,
    num_mels: int = 64,
    max_frames: int = 128,
    ramp_steps: int = 120_000,
    row_valid: Optional[Array] = None,
) -> Tuple[Array, Array, Array]:
    """pred/target: (B, T, M); mask: (B, T) with 1=valid, or None.

    Returns (total_loss, weighted_mse, weighted_mae) — mse/mae are the detached
    diagnostics of the reference (`train_mri_acoustic_model.py:129-130,167`).

    row_valid: optional (B,) 0/1 batch-row validity. The reference never pads
    batch rows (its uneven micro-batches just run smaller,
    `train_mri_acoustic_model.py:255-261`); a `lax.scan` over micro-batches
    needs static shapes, so padded rows are marked invalid here and dropped
    from EVERY term — including the otherwise-unmasked last-frame auxiliary —
    reproducing the reference's smaller-final-micro math exactly.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    B, T, M = pred.shape
    ramp = (
        jnp.minimum(1.0, jnp.asarray(step, jnp.float32) / ramp_steps)
        if ramp_steps > 0
        else jnp.float32(1.0)
    )

    fb, ft = _freq_weights(num_mels)
    # frames past `max_frames` weight 1.0 (only the first 8 entries differ);
    # the reference's fixed-length buffer would crash on T > max_frames
    # (`train_mri_acoustic_model.py:87-92,120-121`) — extended here instead
    tb, tt = _time_weights(max(max_frames, T))
    freq_w = ((1.0 - ramp) * fb[:M] + ramp * ft[:M]).reshape(1, 1, M)
    time_vec = (1.0 - ramp) * tb[:T] + ramp * tt[:T]
    time_w = time_vec.reshape(1, T, 1)
    weights = jnp.broadcast_to(freq_w * time_w, (B, T, M))

    rv = None
    if row_valid is not None:
        rv = row_valid.astype(jnp.float32).reshape(B, 1, 1)

    diff = pred - target
    if mask is not None:
        mask = mask.astype(jnp.float32)[..., None]  # (B, T, 1)
        if rv is not None:
            mask = mask * rv
        weights = weights * mask
    elif rv is not None:
        mask = jnp.broadcast_to(rv, (B, T, 1))
        weights = weights * mask
    denom_base = jnp.maximum(weights.sum(), 1e-6)
    mse = jnp.sum(diff ** 2 * weights) / denom_base
    mae = jnp.sum(jnp.abs(diff) * weights) / denom_base

    # 1st-order temporal smoothness on the error
    if T > 1:
        delta = diff[:, 1:, :] - diff[:, :-1, :]
        delta_w = jnp.broadcast_to(freq_w * time_w[:, 1:, :], (B, T - 1, M))
        if mask is not None:
            delta_w = delta_w * mask[:, 1:, :] * mask[:, :-1, :]
        delta_loss = jnp.sum(delta ** 2 * delta_w) / jnp.maximum(delta_w.sum(), 1e-6)
    else:
        delta_loss = jnp.float32(0.0)

    # 2nd-order (acceleration) smoothness
    if T > 2:
        accel = diff[:, 2:, :] - 2.0 * diff[:, 1:-1, :] + diff[:, :-2, :]
        accel_w = jnp.broadcast_to(freq_w * time_w[:, 1 : T - 1, :], (B, T - 2, M))
        if mask is not None:
            accel_w = accel_w * mask[:, 2:, :] * mask[:, 1:-1, :] * mask[:, :-2, :]
        accel_loss = jnp.sum(accel ** 2 * accel_w) / jnp.maximum(accel_w.sum(), 1e-6)
    else:
        accel_loss = jnp.float32(0.0)

    # last-frame auxiliary MSE (time-unmasked, like the reference; padded
    # batch rows still drop out via row_valid)
    latest_diff = diff[:, -1, :]
    latest_w = jnp.broadcast_to(freq_w[:, -1:, :], (B, 1, M))
    if rv is not None:
        latest_w = latest_w * rv
    latest_loss = jnp.sum(latest_diff ** 2 * latest_w[:, 0, :]) / jnp.maximum(
        latest_w.sum(), 1e-6
    )

    delta_coeff = 0.3 + 0.15 * ramp
    accel_coeff = 0.1 + 0.05 * ramp
    latest_coeff = 0.2 + 0.2 * ramp

    loss = mse + delta_coeff * delta_loss + accel_coeff * accel_loss + latest_coeff * latest_loss
    return loss, jax.lax.stop_gradient(mse), jax.lax.stop_gradient(mae)


class MaskedMSEMAE:
    """Stateful convenience wrapper mirroring the reference class API."""

    def __init__(self, num_mels: int = 64, max_frames: int = 128, ramp_steps: int = 120_000):
        self.num_mels = num_mels
        self.max_frames = max_frames
        self.ramp_steps = ramp_steps
        self.current_step = 0
        self.band_ranges = dict(BAND_RANGES)

    def set_step(self, step: int) -> None:
        self.current_step = int(step)

    def __call__(self, pred, target, mask=None):
        return masked_mse_mae_loss(
            pred,
            target,
            mask,
            jnp.asarray(self.current_step, jnp.float32),
            num_mels=self.num_mels,
            max_frames=self.max_frames,
            ramp_steps=self.ramp_steps,
        )


def compute_band_mae(
    pred: Array, target: Array, row_valid: Optional[Array] = None
) -> Dict[str, Array]:
    """Unmasked per-band MAE diagnostics (`train_mri_acoustic_model.py:263-277`).

    row_valid: optional (B,) 0/1 — rows padded into a micro-batch (see
    masked_mse_mae_loss) are excluded from the diagnostic means.
    """
    out: Dict[str, Array] = {}
    M = pred.shape[-1]
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    rv = None
    if row_valid is not None:
        rv = row_valid.astype(jnp.float32).reshape(pred.shape[0], 1, 1)
    for name, (start, end) in BAND_RANGES.items():
        end = min(end, M)
        if end <= start:
            continue
        ad = jnp.abs(p[..., start:end] - t[..., start:end])
        if rv is None:
            out[name] = jnp.mean(ad)
        else:
            n = jnp.maximum(rv.sum() * ad.shape[1] * ad.shape[2], 1e-6)
            out[name] = jnp.sum(ad * rv) / n
    return out
