"""Pallas TPU kernel for the LSTM recurrence.

Why a kernel: the recurrence is the only part of the acoustic model XLA cannot
fuse into large matmuls. A `lax.scan` re-materialises the (H, 4H) recurrent
weight from HBM on every timestep; this kernel instead runs the whole
time loop as a sequential Pallas grid with

* ``w_hh`` resident in **VMEM for the entire sequence** (same block every grid
  step — 6.5 MB fp32 at H=640, well under the ~16 MB budget),
* the per-step gate pre-activations ``xg[t]`` streamed (1, B, 4H) per grid
  step (Pallas double-buffers block fetches automatically),
* the (h, c) carry in VMEM scratch, persisting across grid iterations (TPU
  grids execute sequentially),
* the (B, H) x (H, 4H) recurrent matmul on the MXU with fp32 accumulation.

Supports optional trailing-padding masks with the same hold-carry semantics as
`models/lstm.py::lstm_direction` (mask-exact bucketed inference) and reverse
scan via index-map remapping. Forward-only (inference path); training uses the
differentiable `lax.scan` implementation.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _lstm_kernel(xg_ref, whh_ref, out_ref, h_ref, c_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    H = h_ref.shape[-1]
    gates = xg_ref[0] + jnp.dot(
        h_ref[:], whh_ref[:], preferred_element_type=jnp.float32
    ).astype(xg_ref.dtype)
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c = f * c_ref[:] + i * g
    h = o * jnp.tanh(c)
    h_ref[:] = h
    c_ref[:] = c
    out_ref[0] = h


def _lstm_kernel_masked(xg_ref, m_ref, whh_ref, out_ref, h_ref, c_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    H = h_ref.shape[-1]
    gates = xg_ref[0] + jnp.dot(
        h_ref[:], whh_ref[:], preferred_element_type=jnp.float32
    ).astype(xg_ref.dtype)
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c_new = f * c_ref[:] + i * g
    h_new = o * jnp.tanh(c_new)
    m = m_ref[0][:, None].astype(h_new.dtype)  # (B, 1), 1=valid
    h = m * h_new + (1.0 - m) * h_ref[:]
    c = m * c_new + (1.0 - m) * c_ref[:]
    h_ref[:] = h
    c_ref[:] = c
    out_ref[0] = h


@functools.partial(jax.jit, static_argnames=("reverse", "interpret"))
def lstm_recurrence_pallas(
    xg: Array,
    w_hh: Array,
    mask: Optional[Array] = None,
    *,
    reverse: bool = False,
    interpret: bool = False,
) -> Array:
    """Run the LSTM time loop: xg (T, B, 4H) pre-activations -> hs (T, B, H).

    xg must already include the input projection and bias (the hoisted MXU
    matmul); w_hh is (H, 4H) with torch gate order (i, f, g, o); mask is
    (T, B) with 1=valid (hold-carry on padded steps).
    """
    T, B, G = xg.shape
    H = w_hh.shape[0]
    assert G == 4 * H, (G, H)

    def idx_t(t):
        return ((T - 1 - t) if reverse else t, 0, 0)

    def idx_tm(t):
        return ((T - 1 - t) if reverse else t, 0)

    in_specs = [
        pl.BlockSpec((1, B, 4 * H), idx_t, memory_space=pltpu.VMEM),
    ]
    args = [xg]
    kernel = _lstm_kernel
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, B), idx_tm, memory_space=pltpu.VMEM))
        args.append(mask.astype(xg.dtype))
        kernel = _lstm_kernel_masked
    in_specs.append(
        pl.BlockSpec((H, 4 * H), lambda t: (0, 0), memory_space=pltpu.VMEM)
    )
    args.append(w_hh.astype(xg.dtype))

    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, B, H), idx_t, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, H), xg.dtype),
        scratch_shapes=[
            pltpu.VMEM((B, H), xg.dtype),
            pltpu.VMEM((B, H), xg.dtype),
        ],
        interpret=interpret,
    )(*args)


def lstm_direction_pallas(
    x_seq: Array,
    w_ih: Array,
    w_hh: Array,
    bias: Array,
    *,
    reverse: bool = False,
    mask: Optional[Array] = None,
    interpret: bool = False,
) -> Array:
    """Drop-in replacement for `models/lstm.py::lstm_direction` (inference).

    Same contract: (B, T, C) -> (B, T, H), weights in torch layout transposed
    to (C, 4H)/(H, 4H), fused bias.
    """
    compute_dtype = x_seq.dtype
    xg = (
        jnp.einsum("btc,cg->btg", x_seq, w_ih.astype(compute_dtype))
        + bias.astype(compute_dtype)
    )
    xg = jnp.swapaxes(xg, 0, 1)  # (T, B, 4H)
    m = None if mask is None else jnp.swapaxes(mask, 0, 1)
    ys = lstm_recurrence_pallas(xg, w_hh, m, reverse=reverse, interpret=interpret)
    return jnp.swapaxes(ys, 0, 1)
