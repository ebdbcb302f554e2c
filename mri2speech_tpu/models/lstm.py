"""Bidirectional LSTM via `jax.lax.scan` with MXU-batched gate matmuls.

TPU-first design for the reference's cuDNN BiLSTM (`mri_acoustic_model.py:50-72`):

* The input projection ``x @ W_ih^T`` for ALL timesteps is hoisted out of the
  recurrence into one large (B*T, C) x (C, 4H) matmul that saturates the MXU.
* The scan body only computes the recurrent (B, H) x (H, 4H) matmul + pointwise
  gate math — the irreducible sequential part.
* Gate order (i, f, g, o) and the double bias (b_ih + b_hh folded into one)
  match torch.nn.LSTM, so weights are directly portable (validated by a parity
  test against torch).
* Forward and backward directions are merged by **summation**, not concat —
  the reference's "sum merge" quirk (`mri_acoustic_model.py:67-72`).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


from mri2speech_tpu.models.layers import torch_fan_uniform_init as _torch_lstm_init


def _torch_lstm_bias_init(hidden: int):
    """torch's EFFECTIVE LSTM bias init: b_ih + b_hh, two independent
    U(-1/sqrt(H), 1/sqrt(H)) draws always applied summed. We store one fused
    bias (see BiLSTMSumMerge), so from-scratch init must draw and SUM two
    uniforms to match the reference distribution — a single draw would halve
    the variance of every gate bias."""
    bound = 1.0 / np.sqrt(hidden)

    def init(key, shape, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        return jax.random.uniform(k1, shape, dtype, -bound, bound) + jax.random.uniform(
            k2, shape, dtype, -bound, bound
        )

    return init


def lstm_direction(
    x_seq: Array,
    w_ih: Array,
    w_hh: Array,
    bias: Array,
    *,
    reverse: bool = False,
    unroll: int = 8,
    mask: Optional[Array] = None,
    init_state: Optional[tuple] = None,
    return_state: bool = False,
) -> Array:
    """Run one LSTM direction over (B, T, C) -> (B, T, H).

    w_ih: (C, 4H), w_hh: (H, 4H), bias: (4H,) — gates ordered (i, f, g, o).

    `mask` (B, T), 1=valid: padded steps hold the carry unchanged, which makes
    trailing-padded inference EXACT for real frames in both directions (the
    backward pass would otherwise leak padded-frame state into real frames).

    `init_state` ((B, H), (B, H)) seeds (h, c) instead of zeros and
    `return_state=True` additionally returns the final (h, c) — the carried
    forward state of the ONLINE streaming path (`infer/online.py`), where each
    window continues exactly from the previous window's recurrence.
    """
    B, T, _ = x_seq.shape
    H = w_hh.shape[0]
    compute_dtype = x_seq.dtype

    # Hoisted input projection: one big MXU matmul for all timesteps.
    xg = jnp.einsum("btc,cg->btg", x_seq, w_ih.astype(compute_dtype)) + bias.astype(
        compute_dtype
    )
    xg = jnp.swapaxes(xg, 0, 1)  # (T, B, 4H) scan-major

    w_hh_c = w_hh.astype(compute_dtype)

    def compute(h, c, xg_t):
        gates = xg_t + h @ w_hh_c
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return h, c

    if init_state is None:
        init = (
            jnp.zeros((B, H), compute_dtype),
            jnp.zeros((B, H), compute_dtype),
        )
    else:
        init = (
            init_state[0].astype(compute_dtype),
            init_state[1].astype(compute_dtype),
        )

    if mask is None:
        def step(carry, xg_t):
            h, c = compute(*carry, xg_t)
            return (h, c), h

        final, ys = jax.lax.scan(step, init, xg, reverse=reverse, unroll=unroll)
    else:
        m_seq = jnp.swapaxes(mask.astype(compute_dtype), 0, 1)[..., None]  # (T, B, 1)

        def step(carry, xs):
            xg_t, m_t = xs
            h0, c0 = carry
            h1, c1 = compute(h0, c0, xg_t)
            h = m_t * h1 + (1.0 - m_t) * h0
            c = m_t * c1 + (1.0 - m_t) * c0
            return (h, c), h

        final, ys = jax.lax.scan(step, init, (xg, m_seq), reverse=reverse, unroll=unroll)
    ys = jnp.swapaxes(ys, 0, 1)  # (B, T, H)
    if return_state:
        return ys, final
    return ys


class BiLSTMSumMerge(nn.Module):
    """1-layer BiLSTM, forward+backward outputs SUMMED (`mri_acoustic_model.py:50-72`).

    impl: "scan" (differentiable `lax.scan`, default) or "pallas" (forward-only
    TPU kernel with the recurrent weights pinned in VMEM — see
    `ops/pallas_lstm.py`; use for inference).
    """

    hidden_size: int = 640
    unroll: int = 8
    impl: str = "scan"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None) -> Array:
        C = x.shape[-1]
        H = self.hidden_size
        init = _torch_lstm_init(H)
        if self.dtype is not None:
            x = x.astype(self.dtype)

        bias_init = _torch_lstm_bias_init(H)
        params = {}
        for direction in ("fwd", "bwd"):
            params[f"w_ih_{direction}"] = self.param(f"w_ih_{direction}", init, (C, 4 * H))
            params[f"w_hh_{direction}"] = self.param(f"w_hh_{direction}", init, (H, 4 * H))
            # torch keeps separate b_ih and b_hh; they only ever appear summed,
            # so a single fused bias is stored (converter adds them; from-scratch
            # init sums two draws to match — see _torch_lstm_bias_init).
            params[f"b_{direction}"] = self.param(f"b_{direction}", bias_init, (4 * H,))

        if self.impl == "pallas":
            # fused bidirectional kernel: both recurrences share one grid.
            # Mosaic only lowers on TPU — other backends run the kernel
            # interpreted so impl="pallas" configs stay loadable anywhere
            # (same auto-select as _FusedMBConv / PallasMRFStage).
            from mri2speech_tpu.ops.pallas_lstm import bilstm_sum_pallas

            return bilstm_sum_pallas(
                x, params, mask=mask, interpret=jax.default_backend() != "tpu"
            )

        outs = []
        for direction, reverse in (("fwd", False), ("bwd", True)):
            outs.append(
                lstm_direction(
                    x,
                    params[f"w_ih_{direction}"],
                    params[f"w_hh_{direction}"],
                    params[f"b_{direction}"],
                    reverse=reverse,
                    unroll=self.unroll,
                    mask=mask,
                )
            )
        return outs[0] + outs[1]
