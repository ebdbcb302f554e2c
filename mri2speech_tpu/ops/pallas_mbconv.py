"""Pallas TPU kernel: one fused MBConv (ir) block, VMEM-resident (inference).

Why: the honest per-stage CNN profile (docs/BENCH_NOTES.md) shows the
EffNetV2-B2 'ir' stages at 27-53 TFLOP/s — far off the 110+ TFLOP/s the
dense 'er' stages reach — because XLA streams every expand-width
intermediate (pw -> BN -> SiLU -> dw -> SE -> pwl is 4-5 full passes over a
6x-expanded tensor, e.g. (512*256, 720) at stage 5) through HBM. Measured
practical copy bandwidth here is ~315 GB/s, so those passes are the stage.

This kernel runs the WHOLE stride-1 block on a VMEM tile of F frames:

    x (F*HW, C) -> pw matmul (C->E, BN1 folded) -> SiLU
      -> depthwise 3x3 (SAME, per-frame zero pad; BN2 folded) -> SiLU
      -> SE (per-frame GAP -> reduce/expand matmuls -> sigmoid gate)
      -> pwl matmul (E->C, BN3 folded) -> + x residual

One HBM read of (F*HW, C) and one write of the same shape per block —
the expanded (., E) tensors never leave VMEM. Frames are spatially
independent, so tiles need no halos (the dw conv pads within each frame).

Scope: inference transform for stride-1, channel-preserving ir blocks (17
of the 20 B2 ir blocks; the 2 stride-2 stage entries and the one
channel-changing stride-1 block stay on the XLA path). Forward-only. fp32 internal math (this Mosaic miscompiles bf16
vector broadcasts — see pallas_lstm.py), bf16 MXU operands for the big
matmuls with fp32 accumulation.

Reference semantics: `mri_acoustic_model.py:28-48` (timm EffNetV2-B2
features) re-expressed; block math identical to
`models/effnetv2.py::InvertedResidual` with BatchNorm inference-folded.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def fold_bn(scale, bias, mean, var, eps: float = 1e-3):
    """BatchNorm (inference) -> (mul, add): y = x * mul + add."""
    mul = scale / jnp.sqrt(var + eps)
    return mul, bias - mean * mul


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _make_kernel(F: int, H: int, W: int, C: int, E: int, R: int, mxu_dtype):
    HW = H * W

    def kernel(
        x_ref,                   # (F, H, W, C) — the model's native layout
        w1_ref, b1_ref,          # pw: (C, E), (1, E)   [BN1 folded]
        wd_ref, bd_ref,          # dw: (9, E), (1, E)   [BN2 folded]
        wr_ref, br_ref,          # se reduce: (E, R), (1, R)
        we_ref, be_ref,          # se expand: (R, E), (1, E)
        w3_ref, b3_ref,          # pwl: (E, C), (1, C)  [BN3 folded]
        out_ref,
    ):
        x0 = x_ref[:].astype(jnp.float32).reshape(F * HW, C)

        # pw expand + BN1 + SiLU
        a = jnp.dot(
            x0.astype(mxu_dtype), w1_ref[:].astype(mxu_dtype),
            preferred_element_type=jnp.float32,
        ) + b1_ref[:].astype(jnp.float32)
        a = _silu(a)                                  # (F*HW, E)

        # depthwise 3x3, SAME, per-frame zero padding: build a padded
        # (F, H+2, W+2, E) copy and accumulate 9 shifted elementwise products.
        # h lives on a leading axis (free slicing); w is the sublane axis.
        ap = jnp.pad(
            a.reshape(F, H, W, E), ((0, 0), (1, 1), (1, 1), (0, 0))
        )
        d = jnp.zeros((F, H, W, E), jnp.float32)
        for dh in range(3):
            for dw_ in range(3):
                tap = wd_ref[3 * dh + dw_ : 3 * dh + dw_ + 1, :].astype(
                    jnp.float32
                ).reshape(1, 1, 1, E)
                d = d + ap[:, dh : dh + H, dw_ : dw_ + W, :] * tap
        d = d.reshape(F * HW, E) + bd_ref[:].astype(jnp.float32)
        d = _silu(d)

        # SE: per-frame GAP over HW -> reduce -> SiLU -> expand -> sigmoid
        s = jnp.mean(d.reshape(F, HW, E), axis=1)     # (F, E)
        g = _silu(
            jnp.dot(
                s.astype(mxu_dtype), wr_ref[:].astype(mxu_dtype),
                preferred_element_type=jnp.float32,
            ) + br_ref[:].astype(jnp.float32)
        )
        g = jax.nn.sigmoid(
            jnp.dot(
                g.astype(mxu_dtype), we_ref[:].astype(mxu_dtype),
                preferred_element_type=jnp.float32,
            ) + be_ref[:].astype(jnp.float32)
        )                                             # (F, E)
        d = (d.reshape(F, HW, E) * g[:, None, :]).reshape(F * HW, E)

        # pwl project + BN3 + residual
        y = jnp.dot(
            d.astype(mxu_dtype), w3_ref[:].astype(mxu_dtype),
            preferred_element_type=jnp.float32,
        ) + b3_ref[:].astype(jnp.float32)
        out_ref[:] = (x0 + y).reshape(F, H, W, C).astype(out_ref.dtype)

    return kernel


def _frames_per_tile(HW: int, E: int) -> int:
    """Largest power-of-two frame count keeping the expanded tile ~<= 3 MB."""
    budget = 3 * 1024 * 1024
    f = 16
    while f > 1 and f * HW * E * 4 > budget:
        f //= 2
    return f


@functools.partial(jax.jit, static_argnames=("interpret", "mxu_dtype"))
def mbconv_block_pallas(
    x: Array,
    params: dict,
    *,
    interpret: bool = False,
    mxu_dtype=jnp.bfloat16,
) -> Array:
    """(N, H, W, C) -> (N, H, W, C): one fused stride-1 SE MBConv block.

    Takes the model's NATIVE 4D layout (no host-side reshape — a
    (N, H*W, C) interface forces an HBM relayout around every one of the 17
    fused calls, which was measured to cost more than the kernel saved).

    `params` holds the BN-FOLDED arrays:
      w1 (C, E), b1 (E), wd (3, 3, E), bd (E), wr (E, R), br (R),
      we (R, E), be (E), w3 (E, C), b3 (C)
    (fold with :func:`fold_bn`; see models/effnetv2.py::_FusedMBConv).
    """
    N, H, W, C = x.shape
    HW = H * W
    E = params["w1"].shape[1]
    R = params["wr"].shape[1]

    F = _frames_per_tile(HW, E)
    while N % F:
        F //= 2
    n_tiles = N // F

    kern = _make_kernel(F, H, W, C, E, R, mxu_dtype)

    def arg(name, shape):
        a = jnp.asarray(params[name], jnp.float32).reshape(shape)
        spec = pl.BlockSpec(shape, lambda i: tuple([0] * len(shape)),
                            memory_space=pltpu.VMEM)
        return a, spec

    w1, s_w1 = arg("w1", (C, E))
    b1, s_b1 = arg("b1", (1, E))
    wd, s_wd = arg("wd", (9, E))
    bd, s_bd = arg("bd", (1, E))
    wr, s_wr = arg("wr", (E, R))
    br, s_br = arg("br", (1, R))
    we, s_we = arg("we", (R, E))
    be, s_be = arg("be", (1, E))
    w3, s_w3 = arg("w3", (E, C))
    b3, s_b3 = arg("b3", (1, C))

    return pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((F, H, W, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            s_w1, s_b1, s_wd, s_bd, s_wr, s_br, s_we, s_be, s_w3, s_b3,
        ],
        out_specs=pl.BlockSpec((F, H, W, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W, C), x.dtype),
        interpret=interpret,
    )(x, w1, b1, wd, bd, wr, br, we, be, w3, b3)
