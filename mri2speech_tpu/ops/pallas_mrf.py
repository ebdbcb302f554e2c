"""Pallas TPU kernel: one whole MRF stage (3 ResBlock branches) fused.

Why a kernel: each generator upsample stage runs 3 parallel ResBlock1 branches
(kernels 3/7/11, dilations (1,3,5)) and averages them (`models.py:116-125`) —
18 convolutions + activations + residual adds whose intermediates are tens of
MB, so XLA streams every one of them through HBM. The MFU accounting
(docs/BENCH_NOTES.md) put the generator at <5% MFU. This kernel keeps one
sequence tile resident in VMEM through ALL 6 fused conv units of a stage:

* **tap-shift matmuls**: a causal dilated conv is y[t] = sum_m x[t-m*d] W'[m]
  (W'[m] = W[k-1-m]); inside the kernel each tap shift is a `pltpu.roll` of
  the VMEM-resident tile and the three branches share one block-diagonal
  (3C, 3C) matrix per shift — k_max MXU matmuls per conv, zero HBM traffic
  between the stage's 6 convs. (An im2col lane-concat formulation would cut
  the block-diagonal FLOP redundancy from 4.7x to 3x, but this Mosaic version
  cannot lower concatenates of offset vectors; rolls lower cleanly.)
* **halo recompute**: tiles carry a 128-row left halo (the stage's total
  receptive field is 120 rows), so grid programs are independent — no
  sequential carry. Tile 0's halo is genuine causal zero padding; rolled-in
  wrap-around rows only ever land in the discarded halo region.
* one HBM read of the (T, 3C) state + one (T, C) write per stage, instead of
  ~12 round trips.

Forward-only (inference transform); training uses the XLA ResBlock path.
Internal math: fp32 activations, bf16 MXU operands with fp32 accumulation
(this Mosaic version miscompiles bf16 vector broadcasts — see pallas_lstm.py).
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

LRELU_SLOPE = 0.1
HALO = 128  # >= total stage receptive field (120 for k=11, dils 1,3,5)


def _tile_rows(total_ch: int) -> int:
    """Sequence-tile length sized to the ~16 MB VMEM budget: the working set
    scales with tile * total_ch (several live fp32 copies) plus the packed
    (k_max, 3C, 3C) weights."""
    if total_ch <= 128:
        return 2048
    if total_ch <= 256:
        return 1024
    return 512


def stage_receptive_field(kernels: Sequence[int], dils: Sequence[int]) -> int:
    """Left context consumed by one branch's full unit chain (max over branches)."""
    return max(sum((k - 1) * d + (k - 1) for d in dils) for k in kernels)


def pack_mrf_stage_params(
    resblocks: Sequence[dict], kernels: Sequence[int], dils: Sequence[int]
) -> dict:
    """Folded per-branch ResBlock1 params -> per-shift block-diagonal matrices.

    resblocks[j] = {"convs1_u": {"w": (k_j, C, C), "b": (C,)}, "convs2_u": ...}
    (the `fold_weight_norm` output layout). Returns, per unit u and conv c,
    "u{u}_c{c}_w" of shape (k_max, NB*C, NB*C) — W'[m] holds branch j's tap
    W_j[k_j-1-m] on its diagonal block while m < k_j — and "u{u}_c{c}_b"
    of shape (1, NB*C).
    """
    nb = len(kernels)
    k_max = max(kernels)
    C = np.asarray(resblocks[0]["convs1_0"]["w"]).shape[1]
    packed = {}
    for u in range(len(dils)):
        for c, conv_list in ((1, "convs1"), (2, "convs2")):
            w_p = np.zeros((k_max, nb * C, nb * C), np.float32)
            b_p = np.zeros((1, nb * C), np.float32)
            for j, k in enumerate(kernels):
                p = resblocks[j][f"{conv_list}_{u}"]
                w = np.asarray(p["w"], np.float32)  # (k, C, C) = (tap, in, out)
                for m in range(k):
                    w_p[m, j * C : (j + 1) * C, j * C : (j + 1) * C] = w[k - 1 - m]
                b_p[0, j * C : (j + 1) * C] = np.asarray(p["b"], np.float32)
            packed[f"u{u}_c{c}_w"] = w_p
            packed[f"u{u}_c{c}_b"] = b_p
    return packed


def _leaky(x: Array) -> Array:
    return jnp.where(x >= 0, x, x * LRELU_SLOPE)


def _make_kernel(
    channels: int, kernels: Tuple[int, ...], dils: Tuple[int, ...], mxu_dtype,
    tile: int,
):
    nb = len(kernels)
    C = channels
    k_max = max(kernels)
    EXT = tile + HALO

    def conv(xt: Array, w_ref, b_ref, dil: int) -> Array:
        """Causal dilated conv of all branches: sum_m roll(xt, m*d) @ W'[m].

        roll moves row r -> r + s, so the value at row t comes from t - s; the
        wrapped-in tail rows land at r < s <= 120 < HALO, i.e. strictly inside
        the discarded halo region (and are zeroed by the pre-sequence mask for
        tile 0), so no per-tap masking is needed.
        """
        acc = jnp.dot(
            xt.astype(mxu_dtype), w_ref[0].astype(mxu_dtype),
            preferred_element_type=jnp.float32,
        )
        for m in range(1, k_max):
            # roll in fp32: this Mosaic version cannot lower bf16 rotates
            shifted = pltpu.roll(xt, shift=m * dil, axis=0)
            acc = acc + jnp.dot(
                shifted.astype(mxu_dtype), w_ref[m].astype(mxu_dtype),
                preferred_element_type=jnp.float32,
            )
        return acc + b_ref[:].astype(jnp.float32)

    def kernel(halo_ref, main_ref, *refs):
        n_w = 2 * len(dils)
        w_refs = refs[: 2 * n_w : 2]
        b_refs = refs[1 : 2 * n_w : 2]
        out_ref = refs[2 * n_w]

        cur = jnp.concatenate(
            [halo_ref[:].astype(jnp.float32), main_ref[:].astype(jnp.float32)],
            axis=0,
        )  # (EXT, nb*C)

        # Pre-sequence mask: for tile 0 the halo rows sit BEFORE the sequence,
        # where every conv's zero padding must stay LITERAL zero — without this
        # the bias makes conv outputs nonzero there and leaks through the next
        # conv's taps into the first real rows. For tiles > 0 the halo holds
        # real data and the mask is all-ones (edge garbage there never reaches
        # the output region, by the receptive-field argument).
        start = jnp.where(pl.program_id(0) == 0, HALO, 0)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (EXT, 1), 0)
        valid = (row_ids >= start).astype(jnp.float32)

        ri = 0
        for d in dils:
            # unit body: xt = leaky(cur); y = conv1(d); xt2 = leaky(y);
            # y2 = conv2(d=1); cur = cur + y2   (`models.py:36-48`)
            y = conv(_leaky(cur), w_refs[ri], b_refs[ri], d) * valid
            ri += 1
            y2 = conv(_leaky(y), w_refs[ri], b_refs[ri], 1) * valid
            ri += 1
            cur = cur + y2

        avg = cur[:, :C]
        for j in range(1, nb):
            avg = avg + cur[:, j * C : (j + 1) * C]
        avg = avg * (1.0 / nb)
        out_ref[:] = avg[HALO:].astype(out_ref.dtype)

    return kernel


def _make_kernel_v2(
    channels: int, kernels: Tuple[int, ...], dils: Tuple[int, ...], mxu_dtype,
    tile: int, pad: int,
):
    """v2 kernel body: scratch-resident state + static-offset tap loads.

    v1 materialises every tap shift with `pltpu.roll` over the full
    (tile+HALO, 3C) activation — ~2.6 GB of on-chip shuffles per generator
    pass — and needs a zero-padded HBM copy of x for tile 0's halo. Here the
    unit input lives in a VMEM scratch ref with `pad` leading zero rows, and
    tap m of a dilation-d conv is the STATIC ref slice
    ``s[pad - m*d : pad - m*d + EXT]`` — the sublane shift happens inside the
    load that already feeds the MXU, with no shifted copy kept live.

    The branch tiling (x -> [x,x,x]) and the final branch average also move
    in-kernel as tiny matmuls against iota-built selector matrices, so the
    kernel streams the COMPACT (T, C) tensors over HBM instead of (T, 3C).
    """
    nb = len(kernels)
    C = channels
    NBC = nb * C
    k_max = max(kernels)
    EXT = tile + HALO

    def kernel(halo_ref, main_ref, *refs):
        n_w = 2 * len(dils)
        w_refs = refs[: 2 * n_w : 2]
        b_refs = refs[1 : 2 * n_w : 2]
        out_ref = refs[2 * n_w]
        s_cur = refs[2 * n_w + 1]  # residual stream, (pad + EXT, NBC) fp32
        s_act = refs[2 * n_w + 2]  # activated conv input, same shape

        first = pl.program_id(0) == 0
        # tile 0's halo block is a CLAMPED re-read of rows [0, HALO) — zero it
        # so it acts as the causal zero padding (no padded HBM copy needed)
        halo = jnp.where(first, 0.0, halo_ref[:].astype(jnp.float32))
        x = jnp.concatenate([halo, main_ref[:].astype(jnp.float32)], axis=0)

        # branch tiling x -> [x|x|x] as a matmul against the (C, NBC)
        # selector T3[i, j] = 1 iff j % C == i (iota-built; C is a power of 2)
        ri = jax.lax.broadcasted_iota(jnp.int32, (C, NBC), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (C, NBC), 1)
        t3 = (jnp.remainder(ci, C) == ri).astype(jnp.float32)
        s_cur[:pad] = jnp.zeros((pad, NBC), jnp.float32)
        s_cur[pad:] = jax.lax.dot(x, t3, preferred_element_type=jnp.float32)
        s_act[:pad] = jnp.zeros((pad, NBC), jnp.float32)

        # pre-sequence mask (same role as v1): tile 0's halo rows must stay
        # literal zero through the residual chain
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (EXT, 1), 0)
        start = jnp.where(first, HALO, 0)
        valid = (row_ids >= start).astype(jnp.float32)

        def conv_from_scratch(w_ref, b_ref, dil: int) -> Array:
            acc = jnp.dot(
                s_act[pad : pad + EXT].astype(mxu_dtype),
                w_ref[0].astype(mxu_dtype),
                preferred_element_type=jnp.float32,
            )
            for m in range(1, k_max):
                o = pad - m * dil
                acc = acc + jnp.dot(
                    s_act[o : o + EXT].astype(mxu_dtype),
                    w_ref[m].astype(mxu_dtype),
                    preferred_element_type=jnp.float32,
                )
            return acc + b_ref[:].astype(jnp.float32)

        ri2 = 0
        for d in dils:
            s_act[pad:] = _leaky(s_cur[pad:])
            y = conv_from_scratch(w_refs[ri2], b_refs[ri2], d) * valid
            ri2 += 1
            s_act[pad:] = _leaky(y)
            y2 = conv_from_scratch(w_refs[ri2], b_refs[ri2], 1) * valid
            ri2 += 1
            s_cur[pad:] = s_cur[pad:] + y2

        # branch average as a matmul against the (NBC, C) selector A/nb
        ra = jax.lax.broadcasted_iota(jnp.int32, (NBC, C), 0)
        ca = jax.lax.broadcasted_iota(jnp.int32, (NBC, C), 1)
        avg_m = (jnp.remainder(ra, C) == ca).astype(jnp.float32) * (1.0 / nb)
        out = jax.lax.dot(
            s_cur[pad + HALO :], avg_m, preferred_element_type=jnp.float32
        )
        out_ref[:] = out.astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("channels", "kernels", "dils", "interpret", "mxu_dtype", "tile"),
)
def mrf_stage_pallas_v2(
    x: Array,
    packed: dict,
    *,
    channels: int,
    kernels: Tuple[int, ...] = (3, 7, 11),
    dils: Tuple[int, ...] = (1, 3, 5),
    interpret: bool = False,
    mxu_dtype=jnp.bfloat16,
    tile: Optional[int] = None,
) -> Array:
    """(B, T, C) -> (B, T, C) whole-MRF-stage, v2 kernel (see _make_kernel_v2).

    Unlike v1 this takes the COMPACT per-branch input (no jnp.tile on the
    caller side) and returns x.dtype directly; `packed` is the same
    :func:`pack_mrf_stage_params` layout.
    """
    nb = len(kernels)
    C = channels
    NBC = nb * C
    k_max = max(kernels)
    assert x.shape[-1] == C, (x.shape, C)
    rf = stage_receptive_field(kernels, dils)
    assert rf <= HALO
    # leading scratch pad must cover the largest single-conv tap reach
    pad = -(-max((k_max - 1) * d for d in dils) // 8) * 8
    B, T = x.shape[0], x.shape[1]

    tile_ = tile or _tile_rows(NBC)
    Tp = ((T + tile_ - 1) // tile_) * tile_
    n_tiles = Tp // tile_
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
    if tile_ % HALO:
        raise ValueError(f"tile {tile_} must be a multiple of HALO={HALO}")
    hpt = tile_ // HALO

    w_in_specs = []
    w_args = []
    for u in range(len(dils)):
        for c in (1, 2):
            w_in_specs.append(
                pl.BlockSpec((k_max, NBC, NBC), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
            )
            w_in_specs.append(
                pl.BlockSpec((1, NBC), lambda i: (0, 0), memory_space=pltpu.VMEM)
            )
            w_args.append(jnp.asarray(packed[f"u{u}_c{c}_w"]))
            w_args.append(jnp.asarray(packed[f"u{u}_c{c}_b"]))

    # tap matrices live in VMEM for the whole kernel: store them directly in
    # the MXU operand dtype (halves VMEM + HBM traffic vs fp32 at bf16)
    for idx in range(0, len(w_args), 2):
        w_args[idx] = w_args[idx].astype(mxu_dtype)

    kern = _make_kernel_v2(C, tuple(kernels), tuple(dils), mxu_dtype, tile_, pad)
    EXTP = pad + tile_ + HALO

    outs = []
    for b in range(B):
        y = pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[
                # halo rows [i*tile-HALO, i*tile); tile 0 clamps to rows
                # [0, HALO) and the kernel zeroes them (causal padding)
                pl.BlockSpec(
                    (HALO, C),
                    lambda i: (jnp.maximum(i * hpt - 1, 0), 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((tile_, C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                *w_in_specs,
            ],
            out_specs=pl.BlockSpec((tile_, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Tp, C), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((EXTP, NBC), jnp.float32),
                pltpu.VMEM((EXTP, NBC), jnp.float32),
            ],
            interpret=interpret,
        )(x[b], x[b], *w_args)
        outs.append(y[:T])
    return jnp.stack(outs)


@functools.partial(
    jax.jit,
    static_argnames=("channels", "kernels", "dils", "interpret", "mxu_dtype"),
)
def mrf_stage_pallas(
    x: Array,
    packed: dict,
    *,
    channels: int,
    kernels: Tuple[int, ...] = (3, 7, 11),
    dils: Tuple[int, ...] = (1, 3, 5),
    interpret: bool = False,
    mxu_dtype=jnp.bfloat16,  # MXU operand dtype; fp32 accumulation either way
) -> Array:
    """(B, T, nb*C) tiled branch state -> (B, T, C) branch average.

    `x` carries all nb branches concatenated on channels (at stage entry every
    branch equals the upsampled input, i.e. jnp.tile); `packed` comes from
    :func:`pack_mrf_stage_params`.
    """
    nb = len(kernels)
    C = channels
    k_max = max(kernels)
    assert x.shape[-1] == nb * C, (x.shape, nb, C)
    assert stage_receptive_field(kernels, dils) <= HALO
    B, T = x.shape[0], x.shape[1]
    out_dtype = x.dtype

    tile = _tile_rows(nb * C)
    Tp = ((T + tile - 1) // tile) * tile
    n_tiles = Tp // tile
    pad_t = Tp - T
    if pad_t:
        x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))
    # left halo: genuine causal zero padding for tile 0
    x_ext = jnp.pad(x, ((0, 0), (HALO, 0), (0, 0)))

    w_in_specs = []
    w_args = []
    for u in range(len(dils)):
        for c in (1, 2):
            w_in_specs.append(
                pl.BlockSpec((k_max, nb * C, nb * C), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
            )
            w_in_specs.append(
                pl.BlockSpec((1, nb * C), lambda i: (0, 0), memory_space=pltpu.VMEM)
            )
            w_args.append(jnp.asarray(packed[f"u{u}_c{c}_w"]))
            w_args.append(jnp.asarray(packed[f"u{u}_c{c}_b"]))

    kern = _make_kernel(C, tuple(kernels), tuple(dils), mxu_dtype, tile)
    halo_per_tile = tile // HALO

    outs = []
    for b in range(B):
        y = pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[
                # halo rows [i*TILE, i*TILE+HALO) of x_ext == x rows [i*TILE-HALO, i*TILE)
                pl.BlockSpec((HALO, nb * C), lambda i: (i * halo_per_tile, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, nb * C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                *w_in_specs,
            ],
            out_specs=pl.BlockSpec((tile, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Tp, C), jnp.float32),
            interpret=interpret,
        )(x_ext[b], x[b], *w_args)
        outs.append(y[:T])
    return jnp.stack(outs).astype(out_dtype)
