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

Masking (trailing padding) is handled WITHOUT a mask input: padded steps get
their gate pre-activations overwritten to (i=-30, f=+30, g=0, o=-30) before
the kernel, which freezes c exactly (sigmoid(+30) == 1, i*g == 0) and keeps
h == 0 through a zero-initialised padded prefix — bit-exact for all REAL
frames in both directions (padded-position outputs are discarded by callers).
This sidesteps small-B mask blocks that violate TPU tiling constraints.

Forward-only (inference path); training uses the differentiable `lax.scan`.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_GATE_FREEZE = (-30.0, 30.0, 0.0, -30.0)  # (i, f, g, o) pre-activations


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


def _freeze_padded_steps(xg: Array, mask: Array, H: int) -> Array:
    """Overwrite gate pre-activations on padded steps (mask (T, B), 1=valid).

    NOTE: the recurrent contribution h @ w_hh still adds to these inside the
    kernel; with a zero carry (backward over a padded prefix) the sums stay at
    the freeze values exactly, which is the case that matters for exactness.
    For trailing padding in the forward direction the padded outputs are
    discarded by callers, so their values are irrelevant.
    """
    row = np.concatenate(
        [np.full(H, v, dtype=np.float32) for v in _GATE_FREEZE]
    )
    row_c = jnp.asarray(row, dtype=xg.dtype)
    m = (mask > 0)[..., None]  # (T, B, 1)
    return jnp.where(m, xg, row_c)


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
    (T, B) with 1=valid (see module docstring for the freeze encoding).
    """
    T, B, G = xg.shape
    H = w_hh.shape[0]
    assert G == 4 * H, (G, H)

    # The kernel body runs in fp32: this Mosaic version miscompiles bf16
    # vector broadcasts in the gate activations ('vector.broadcast' element
    # type verification failure), and fp32 costs nothing here — the recurrence
    # is latency-bound, not bandwidth-bound, at (B, 4H) per step.
    out_dtype = xg.dtype
    xg = xg.astype(jnp.float32)

    if mask is not None:
        xg = _freeze_padded_steps(xg, mask, H)

    def idx_t(t):
        return ((T - 1 - t) if reverse else t, 0, 0)

    ys = pl.pallas_call(
        _lstm_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, 4 * H), idx_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, H), idx_t, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=interpret,
    )(xg, w_hh.astype(jnp.float32))
    return ys.astype(out_dtype)


def _bilstm_kernel(xgf_ref, xgb_ref, whhf_ref, whhb_ref, outf_ref, outb_ref,
                   hf_ref, cf_ref, hb_ref, cb_ref):
    """Both directions in ONE sequential grid: grid step t advances the
    forward cell at time t and the backward cell at time T-1-t (block index
    maps deliver the right slices). Halves the number of sequential kernel
    steps vs two separate scans — the recurrence is per-step-latency bound."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        hf_ref[:] = jnp.zeros_like(hf_ref)
        cf_ref[:] = jnp.zeros_like(cf_ref)
        hb_ref[:] = jnp.zeros_like(hb_ref)
        cb_ref[:] = jnp.zeros_like(cb_ref)

    H = hf_ref.shape[-1]

    def cell(xg, h_ref, c_ref, whh_ref, out_ref):
        gates = xg + jnp.dot(
            h_ref[:], whh_ref[:], preferred_element_type=jnp.float32
        ).astype(xg.dtype)
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H :])
        c = f * c_ref[:] + i * g
        h = o * jnp.tanh(c)
        h_ref[:] = h
        c_ref[:] = c
        out_ref[0] = h

    cell(xgf_ref[0], hf_ref, cf_ref, whhf_ref, outf_ref)
    cell(xgb_ref[0], hb_ref, cb_ref, whhb_ref, outb_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bilstm_recurrence_pallas(
    xg_fwd: Array,
    xg_bwd: Array,
    w_hh_fwd: Array,
    w_hh_bwd: Array,
    mask: Optional[Array] = None,
    *,
    interpret: bool = False,
):
    """Fused bidirectional time loop: (T, B, 4H) x2 -> ((T,B,H) fwd, (T,B,H) bwd).

    Same per-direction semantics as :func:`lstm_recurrence_pallas`; masking via
    the gate-freeze encoding applied to both pre-activation streams.
    """
    T, B, G = xg_fwd.shape
    H = w_hh_fwd.shape[0]
    assert G == 4 * H

    out_dtype = xg_fwd.dtype
    xg_fwd = xg_fwd.astype(jnp.float32)
    xg_bwd = xg_bwd.astype(jnp.float32)
    if mask is not None:
        xg_fwd = _freeze_padded_steps(xg_fwd, mask, H)
        xg_bwd = _freeze_padded_steps(xg_bwd, mask, H)

    fwd_idx = lambda t: (t, 0, 0)                  # noqa: E731
    bwd_idx = lambda t: (T - 1 - t, 0, 0)          # noqa: E731
    w_idx = lambda t: (0, 0)                       # noqa: E731

    ys_f, ys_b = pl.pallas_call(
        _bilstm_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, 4 * H), fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 4 * H), bwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), w_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), w_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, B, H), fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), bwd_idx, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=interpret,
    )(xg_fwd, xg_bwd, w_hh_fwd.astype(jnp.float32), w_hh_bwd.astype(jnp.float32))
    return ys_f.astype(out_dtype), ys_b.astype(out_dtype)


def _bilstm_chunk_kernel(chunk: int):
    """Chunked fused bidirectional kernel: each grid step advances BOTH cells
    through `chunk` timesteps with an inner fori_loop — the recurrence is
    per-step-latency bound, so amortising the grid-step overhead (block
    bookkeeping, pipeline sync) over `chunk` steps is the lever."""

    def kernel(xgf_ref, xgb_ref, whhf_ref, whhb_ref, outf_ref, outb_ref,
               hf_ref, cf_ref, hb_ref, cb_ref):
        t0 = pl.program_id(0)

        @pl.when(t0 == 0)
        def _():
            hf_ref[:] = jnp.zeros_like(hf_ref)
            cf_ref[:] = jnp.zeros_like(cf_ref)
            hb_ref[:] = jnp.zeros_like(hb_ref)
            cb_ref[:] = jnp.zeros_like(cb_ref)

        H = hf_ref.shape[-1]

        def cell(xg, h, c, whh):
            gates = xg + jnp.dot(h, whh, preferred_element_type=jnp.float32)
            i = jax.nn.sigmoid(gates[:, :H])
            f = jax.nn.sigmoid(gates[:, H : 2 * H])
            g = jnp.tanh(gates[:, 2 * H : 3 * H])
            o = jax.nn.sigmoid(gates[:, 3 * H :])
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return h, c

        del cell  # both directions advance through ONE paired matmul below
        w_cat = jnp.concatenate([whhf_ref[:], whhb_ref[:]], axis=1)  # (H, 8H)
        G = 4 * H
        B_ = hf_ref.shape[0]
        # gate math in (rows, 128) layout when possible: a (1, 4H) vector
        # fills 1/8 of every vreg's sublanes, so the sigmoid/tanh chains (the
        # per-step bottleneck at B=1) run 8x wider reshaped to (4H/128, 128)
        reshape_gates = B_ == 1 and H % 128 == 0
        R = H // 128 if reshape_gates else 0

        def apply_gates(gates, c):
            if reshape_gates:
                g4 = gates.reshape(4 * R, 128)
                i = jax.nn.sigmoid(g4[:R])
                f = jax.nn.sigmoid(g4[R : 2 * R])
                g = jnp.tanh(g4[2 * R : 3 * R])
                o = jax.nn.sigmoid(g4[3 * R :])
                cr = f * c.reshape(R, 128) + i * g
                hr = o * jnp.tanh(cr)
                return hr.reshape(B_, H), cr.reshape(B_, H)
            i = jax.nn.sigmoid(gates[:, :H])
            f = jax.nn.sigmoid(gates[:, H : 2 * H])
            g = jnp.tanh(gates[:, 2 * H : 3 * H])
            o = jax.nn.sigmoid(gates[:, 3 * H :])
            c = f * c + i * g
            return o * jnp.tanh(c), c

        # static unroll: dynamic in-block indexing makes Mosaic allocate
        # oversized scoped VMEM; static slices compile lean. The two
        # directions share one (2B, H) x (H, 8H) matmul per step (the cross
        # blocks are discarded) — half the sequential matmul count.
        for t in range(chunk):
            tb = chunk - 1 - t  # backward stream runs its block in reverse
            h2 = jnp.concatenate([hf_ref[:], hb_ref[:]], axis=0)  # (2B, H)
            g2 = jnp.dot(h2, w_cat, preferred_element_type=jnp.float32)
            gates_f = xgf_ref[t] + g2[:B_, :G]
            gates_b = xgb_ref[tb] + g2[B_:, G:]

            hf, cf = apply_gates(gates_f, cf_ref[:])
            hf_ref[:] = hf
            cf_ref[:] = cf
            outf_ref[t] = hf
            hb, cb = apply_gates(gates_b, cb_ref[:])
            hb_ref[:] = hb
            cb_ref[:] = cb
            outb_ref[tb] = hb

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def bilstm_recurrence_pallas_chunked(
    xg_fwd: Array,
    xg_bwd: Array,
    w_hh_fwd: Array,
    w_hh_bwd: Array,
    mask: Optional[Array] = None,
    *,
    chunk: int = 32,
    interpret: bool = False,
):
    """Chunked variant of :func:`bilstm_recurrence_pallas` (same semantics).

    T must not be required to divide `chunk`: the streams are padded with
    frozen-gate steps (exactly the masking encoding), which leave the carries
    unchanged, and the padded outputs are sliced off.
    """
    T, B, G = xg_fwd.shape
    H = w_hh_fwd.shape[0]
    assert G == 4 * H

    out_dtype = xg_fwd.dtype
    xg_fwd = xg_fwd.astype(jnp.float32)
    xg_bwd = xg_bwd.astype(jnp.float32)
    if mask is not None:
        xg_fwd = _freeze_padded_steps(xg_fwd, mask, H)
        xg_bwd = _freeze_padded_steps(xg_bwd, mask, H)

    Tp = ((T + chunk - 1) // chunk) * chunk
    if Tp != T:
        pad = np.concatenate([np.full(H, v, np.float32) for v in _GATE_FREEZE])
        pad_block = jnp.broadcast_to(
            jnp.asarray(pad, jnp.float32), (Tp - T, B, 4 * H)
        )
        # forward: padding AFTER the sequence (processed last, outputs sliced
        # off); backward stream is indexed from the array end, so its padding
        # sits at the FRONT — also processed last in its reversed order
        xg_fwd = jnp.concatenate([xg_fwd, pad_block], axis=0)
        xg_bwd = jnp.concatenate([pad_block, xg_bwd], axis=0)

    n_chunks = Tp // chunk
    fwd_idx = lambda i: (i, 0, 0)                    # noqa: E731
    bwd_idx = lambda i: (n_chunks - 1 - i, 0, 0)     # noqa: E731
    w_idx = lambda i: (0, 0)                         # noqa: E731

    ys_f, ys_b = pl.pallas_call(
        _bilstm_chunk_kernel(chunk),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, B, 4 * H), fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, B, 4 * H), bwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), w_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), w_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((chunk, B, H), fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, B, H), bwd_idx, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Tp, B, H), jnp.float32),
            jax.ShapeDtypeStruct((Tp, B, H), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=interpret,
    )(xg_fwd, xg_bwd, w_hh_fwd.astype(jnp.float32), w_hh_bwd.astype(jnp.float32))
    return ys_f[:T].astype(out_dtype), ys_b[Tp - T :].astype(out_dtype)


def bilstm_sum_pallas(
    x_seq: Array,
    params: dict,
    mask: Optional[Array] = None,
    *,
    interpret: bool = False,
) -> Array:
    """Full fused BiLSTM-sum forward: (B, T, C) -> (B, T, H).

    params: {w_ih_fwd, w_hh_fwd, b_fwd, w_ih_bwd, w_hh_bwd, b_bwd} in the
    `models/lstm.py` layout. Both input projections run as one hoisted matmul
    pair; the recurrences share one Pallas grid.
    """
    dt = x_seq.dtype
    xg_f = jnp.einsum("btc,cg->btg", x_seq, params["w_ih_fwd"].astype(dt)) + params[
        "b_fwd"
    ].astype(dt)
    xg_b = jnp.einsum("btc,cg->btg", x_seq, params["w_ih_bwd"].astype(dt)) + params[
        "b_bwd"
    ].astype(dt)
    m = None if mask is None else jnp.swapaxes(mask, 0, 1)
    ys_f, ys_b = bilstm_recurrence_pallas_chunked(
        jnp.swapaxes(xg_f, 0, 1),
        jnp.swapaxes(xg_b, 0, 1),
        params["w_hh_fwd"],
        params["w_hh_bwd"],
        m,
        interpret=interpret,
    )
    return jnp.swapaxes(ys_f + ys_b, 0, 1)


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
    to (C, 4H)/(H, 4H), fused bias. With a mask, outputs at PADDED positions
    differ from the scan implementation (zeros/frozen instead of held carry) —
    real-frame outputs are identical; callers discard padded positions.
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
