"""EfficientNetV2-B2-style feature extractor in Flax (channels-last, TF-SAME).

Architectural parity target: timm `tf_efficientnetv2_b2` with
``features_only=True`` as used by the reference acoustic model
(`mri_acoustic_model.py:28-36`). The reference trains it **from scratch**
(`cnn_pretrained=False` default, `mri_acoustic_model.py:24`), so architectural
equivalence (capacity/topology), not bit-identical weights, is the contract.

Spec derivation — efficientnetv2_base arch scaled by the b2 multipliers
(width 1.1, depth 1.2, channel divisor 8, round-limit 0.9):

===== ======= ====== ====== ===== ======== =========
stage block   kernel stride expand out_ch  repeats
===== ======= ====== ====== ===== ======== =========
stem  conv3x3 3      2      -     32       -
1     conv+bn 3      1      1     16       2 (skip)
2     fused   3      2      4     32       3
3     fused   3      2      4     56       3
4     mbconv  3      2      4     104 se/4 4
5     mbconv  3      1      6     120 se/4 6
6     mbconv  3      2      6     208 se/4 10
===== ======= ====== ====== ===== ======== =========

Last-stage feature dim = **208** -> the BiLSTM input size. BN eps 1e-3 /
momentum 0.9 and TF-style SAME padding match the `tf_` weight-compatible
variants (XLA's ``padding='SAME'`` is TF SAME, so this is native here).
Activation SiLU throughout; SE reduced dim = block input channels // 4.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


@dataclasses.dataclass(frozen=True)
class StageSpec:
    block: str  # "cn" | "er" | "ir"
    kernel: int
    stride: int
    expand: int
    channels: int
    repeats: int
    se_ratio: float = 0.0


EFFNETV2_B2_SPEC: Tuple[StageSpec, ...] = (
    StageSpec("cn", 3, 1, 1, 16, 2),
    StageSpec("er", 3, 2, 4, 32, 3),
    StageSpec("er", 3, 2, 4, 56, 3),
    StageSpec("ir", 3, 2, 4, 104, 4, 0.25),
    StageSpec("ir", 3, 1, 6, 120, 6, 0.25),
    StageSpec("ir", 3, 2, 6, 208, 10, 0.25),
)

EFFNETV2_B2_STEM = 32
EFFNETV2_B2_FEATURE_DIM = EFFNETV2_B2_SPEC[-1].channels  # 208


def _bn(train: bool, name: str, dtype) -> nn.BatchNorm:
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-3,
        dtype=dtype, name=name,
    )


def _conv(features: int, kernel: int, stride: int, name: str, dtype, groups: int = 1) -> nn.Conv:
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride), padding="SAME",
        use_bias=False, feature_group_count=groups, kernel_init=_conv_init,
        dtype=dtype, name=name,
    )


class SqueezeExcite(nn.Module):
    """SE block: GAP -> 1x1 reduce -> SiLU -> 1x1 expand -> sigmoid gate."""

    reduced: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), kernel_init=_conv_init, dtype=self.dtype,
                    name="reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), kernel_init=_conv_init, dtype=self.dtype,
                    name="expand")(s)
        return x * nn.sigmoid(s)


class ConvBnAct(nn.Module):
    """'cn' block: conv3x3 + BN + SiLU with identity skip when shapes allow."""

    channels: int
    kernel: int
    stride: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        shortcut = x
        y = _conv(self.channels, self.kernel, self.stride, "conv", self.dtype)(x)
        y = _bn(train, "bn", self.dtype)(y)
        y = nn.silu(y)
        if self.stride == 1 and shortcut.shape[-1] == self.channels:
            y = y + shortcut
        return y


class EdgeResidual(nn.Module):
    """Fused-MBConv ('er'): conv3x3 expand + BN + SiLU -> 1x1 project + BN."""

    channels: int
    kernel: int
    stride: int
    expand: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        shortcut = x
        mid = x.shape[-1] * self.expand
        y = _conv(mid, self.kernel, self.stride, "conv_exp", self.dtype)(x)
        y = _bn(train, "bn1", self.dtype)(y)
        y = nn.silu(y)
        y = _conv(self.channels, 1, 1, "conv_pwl", self.dtype)(y)
        y = _bn(train, "bn2", self.dtype)(y)
        if self.stride == 1 and shortcut.shape[-1] == self.channels:
            y = y + shortcut
        return y


class InvertedResidual(nn.Module):
    """MBConv ('ir'): 1x1 expand -> depthwise kxk -> SE -> 1x1 project."""

    channels: int
    kernel: int
    stride: int
    expand: int
    se_ratio: float = 0.25
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        shortcut = x
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        y = _conv(mid, 1, 1, "conv_pw", self.dtype)(x)
        y = _bn(train, "bn1", self.dtype)(y)
        y = nn.silu(y)
        y = _conv(mid, self.kernel, self.stride, "conv_dw", self.dtype, groups=mid)(y)
        y = _bn(train, "bn2", self.dtype)(y)
        y = nn.silu(y)
        if self.se_ratio > 0:
            reduced = max(1, int(in_ch * self.se_ratio))
            y = SqueezeExcite(reduced, dtype=self.dtype, name="se")(y)
        y = _conv(self.channels, 1, 1, "conv_pwl", self.dtype)(y)
        y = _bn(train, "bn3", self.dtype)(y)
        if self.stride == 1 and in_ch == self.channels:
            y = y + shortcut
        return y


class _ConvParamShell(nn.Module):
    """Declares an nn.Conv-compatible param tree without the conv op."""

    shape: Tuple[int, ...]
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        k = self.param("kernel", _conv_init, self.shape)
        b = (
            self.param("bias", nn.initializers.zeros, (self.shape[-1],))
            if self.use_bias
            else None
        )
        return k, b


class _BnParamShell(nn.Module):
    """Declares an nn.BatchNorm-compatible param/batch_stats tree."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros, None, (self.features,)
        )
        var = self.variable(
            "batch_stats", "var", nn.initializers.ones, None, (self.features,)
        )
        return scale, bias, mean.value, var.value


class _SEParamShell(nn.Module):
    """SqueezeExcite-compatible param tree (reduce/expand 1x1 convs)."""

    in_features: int
    reduced: int

    @nn.compact
    def __call__(self):
        wr = _ConvParamShell(
            (1, 1, self.in_features, self.reduced), use_bias=True, name="reduce"
        )()
        we = _ConvParamShell(
            (1, 1, self.reduced, self.in_features), use_bias=True, name="expand"
        )()
        return wr, we


class _FusedMBConv(nn.Module):
    """Stride-1 SE MBConv in the fused Pallas form (inference transform).

    Parameter tree is IDENTICAL to :class:`InvertedResidual` (conv_pw / bn1 /
    conv_dw / bn2 / se.reduce / se.expand / conv_pwl / bn3), so checkpoints
    and converters are unaffected; BatchNorms are inference-folded into the
    matmul weights on the fly and the whole block runs as one VMEM-resident
    Pallas kernel (`ops/pallas_mbconv.py`) — one HBM read + one write per
    block instead of 4-5 passes over the 6x-expanded intermediates.
    """

    channels: int
    expand: int
    se_ratio: float
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        from mri2speech_tpu.ops.pallas_mbconv import fold_bn, mbconv_block_pallas

        assert not train, "_FusedMBConv is an inference transform"
        B, H, W, C = x.shape
        mid = C * self.expand
        reduced = max(1, int(C * self.se_ratio))

        w_pw, _ = _ConvParamShell((1, 1, C, mid), name="conv_pw")()
        bn1 = _BnParamShell(mid, name="bn1")()
        w_dw, _ = _ConvParamShell((3, 3, 1, mid), name="conv_dw")()
        bn2 = _BnParamShell(mid, name="bn2")()
        (wr, br), (we, be) = _SEParamShell(mid, reduced, name="se")()
        w_pwl, _ = _ConvParamShell((1, 1, mid, C), name="conv_pwl")()
        bn3 = _BnParamShell(C, name="bn3")()

        m1, a1 = fold_bn(*bn1)
        m2, a2 = fold_bn(*bn2)
        m3, a3 = fold_bn(*bn3)
        params = {
            "w1": w_pw.reshape(C, mid) * m1[None, :],
            "b1": a1,
            "wd": (w_dw.reshape(9, mid) * m2[None, :]).reshape(3, 3, mid),
            "bd": a2,
            "wr": wr.reshape(mid, reduced),
            "br": br,
            "we": we.reshape(reduced, mid),
            "be": be,
            "w3": w_pwl.reshape(mid, C) * m3[None, :],
            "b3": a3,
        }
        return mbconv_block_pallas(
            x, params, interpret=jax.default_backend() != "tpu"
        )


def _pad128(n: int) -> int:
    """Next multiple of 128 (the TPU lane count)."""
    return ((n + 127) // 128) * 128


class _PaddedInvertedResidual(nn.Module):
    """SE-MBConv with all channel dims zero-padded to 128-lane multiples.

    EXACT inference transform (output-invariant, not an approximation): the
    padded channels carry zeros end-to-end —

    * conv_pw / conv_dw / conv_pwl kernels are zero-padded, so padded
      channels receive 0;
    * BatchNorms are applied in folded form with padded (mul=0, add=0), so
      padded channels stay 0 (and SiLU(0) = 0);
    * the SE gate for a padded channel multiplies a zero activation — 0;
    * the residual adds zeros to zeros.

    Motivation (measured, tools/probe_ir_pad.py): the B2 'ir' stages use
    104/120/208-channel tensors whose mids (416/624/720/1248) are not
    128-multiples; the same network with every ir dim rounded up to 128
    runs the CNN in 28.7 ms vs 31.4 ms at serving shapes DESPITE 16% more
    FLOPs (49.5 -> 63 TF/s) — XLA tiles exact-lane shapes far better.
    Zero-padding captures that win with bit-identical math.

    The parameter tree is IDENTICAL to :class:`InvertedResidual` (conv_pw /
    bn1 / conv_dw / bn2 / se.reduce / se.expand / conv_pwl / bn3) — padding
    happens on the fly, so checkpoints and converters are unaffected.
    `real_in` is the canonical input channel count; the input tensor may
    arrive unpadded (first ir block) or padded by the previous block.
    """

    channels: int
    kernel: int
    stride: int
    expand: int
    se_ratio: float
    real_in: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        assert not train, "_PaddedInvertedResidual is an inference transform"
        from mri2speech_tpu.ops.pallas_mbconv import fold_bn

        cin_p = x.shape[-1]  # real_in or _pad128(real_in)
        mid = self.real_in * self.expand
        midp = _pad128(mid)
        outp = _pad128(self.channels)
        red = max(1, int(self.real_in * self.se_ratio))

        def bn_mul_add(bn):
            """Inference BN as y*mul + add (shared fold, eps matches _bn)."""
            return fold_bn(*bn)

        def padw(w, rows, cols):
            return jnp.pad(w, ((0, rows - w.shape[0]), (0, cols - w.shape[1])))

        def cast(a):
            return a.astype(self.dtype) if self.dtype is not None else a

        w_pw, _ = _ConvParamShell((1, 1, self.real_in, mid), name="conv_pw")()
        bn1 = _BnParamShell(mid, name="bn1")()
        w_dw, _ = _ConvParamShell((self.kernel, self.kernel, 1, mid), name="conv_dw")()
        bn2 = _BnParamShell(mid, name="bn2")()
        (wr, br), (we, be) = _SEParamShell(mid, red, name="se")()
        w_pwl, _ = _ConvParamShell((1, 1, mid, self.channels), name="conv_pwl")()
        bn3 = _BnParamShell(self.channels, name="bn3")()

        m1, a1 = bn_mul_add(bn1)
        m2, a2 = bn_mul_add(bn2)
        m3, a3 = bn_mul_add(bn3)

        # pw: fold BN1 into the kernel, pad (cin_p x midp)
        w1 = padw(w_pw.reshape(self.real_in, mid) * m1[None, :], cin_p, midp)
        a1p = jnp.pad(a1, (0, midp - mid))
        y = jnp.einsum("bhwc,cm->bhwm", cast(x), cast(w1)) + cast(a1p)
        y = nn.silu(y)

        # dw: fold BN2, pad to midp groups
        w2 = jnp.pad(
            w_dw.reshape(-1, mid) * m2[None, :], ((0, 0), (0, midp - mid))
        ).reshape(self.kernel, self.kernel, 1, midp)
        a2p = jnp.pad(a2, (0, midp - mid))
        y = jax.lax.conv_general_dilated(
            y, cast(w2), (self.stride, self.stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=midp,
        ) + cast(a2p)
        y = nn.silu(y)

        # SE: padded rows of reduce contribute 0; padded expand cols give a
        # gate of sigmoid(0) = 0.5, multiplying zero activations — still 0
        g = jnp.mean(y, axis=(1, 2))
        g = nn.silu(g @ cast(padw(wr.reshape(mid, red), midp, red)) + cast(br))
        g = nn.sigmoid(g @ cast(padw(we.reshape(red, mid), red, midp)) + cast(jnp.pad(be, (0, midp - mid))))
        y = y * g[:, None, None, :]

        # pwl: fold BN3, pad (midp x outp)
        w3 = padw(w_pwl.reshape(mid, self.channels) * m3[None, :], midp, outp)
        a3p = jnp.pad(a3, (0, outp - self.channels))
        y = jnp.einsum("bhwk,kc->bhwc", y, cast(w3)) + cast(a3p)

        if self.stride == 1 and self.real_in == self.channels:
            # the canonical residual condition; if the input arrived unpadded
            # (e.g. a stride-1 channel-preserving ir block directly after an
            # er stage) zero-pad it to the padded output width first
            if cin_p != outp:
                x = jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, outp - cin_p),))
            y = y + x
        return y


def stem_s2d_applicable(frame_shape, flag: bool) -> bool:
    """s2d stem engages only for 1-channel frames with even H, W.

    Shared predicate: the acoustic model must skip its 1->3 channel broadcast
    exactly when the cnn will take the s2d path (the s2d param keeps the
    3-channel layout via the replicated-channel fold).
    """
    return bool(flag) and frame_shape[-1] == 1 and (
        frame_shape[-3] % 2 == 0 and frame_shape[-2] % 2 == 0
    )


class _StemConvS2D(nn.Module):
    """3x3/s2 stem conv on 1-channel frames in space-to-depth form (exact).

    Two exact rewrites compose here (same sums, reordered — NOT an
    approximation):

    1. replicated-channel fold: the acoustic model broadcasts the 1-channel
       MRI frame to 3 channels for the stem (`mri_acoustic_model.py:41-44`);
       ``conv(broadcast3(x), w) == conv(x, w.sum(in_axis))``, so the param
       keeps the checkpoint/timm-port layout (3, 3, param_in_channels, C)
       while the broadcast (3x the input HBM traffic) is skipped.
    2. space-to-depth: the 3x3/s2 conv over (H, W, 1) runs at contraction
       depth 9 on the MXU; fold the kernel to (2, 2, 4, C) —
       ``w2[a, b, 2r+c] = w1[2a+r, 2b+c]`` (taps with index > 2 are zero) —
       and run a 2x2/s1 conv over the (H/2, W/2, 4) space-to-depth layout
       with (0, 1) zero padding, reproducing TF-SAME on even H, W exactly.
    """

    channels: int
    param_in_channels: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w = self.param(
            "kernel", _conv_init, (3, 3, self.param_in_channels, self.channels)
        )
        w1 = w.sum(axis=2)  # (3, 3, C) — exact for channel-replicated input
        B, H, W, _ = x.shape
        xs = x.reshape(B, H // 2, 2, W // 2, 2)
        xs = jnp.transpose(xs, (0, 1, 3, 2, 4)).reshape(B, H // 2, W // 2, 4)
        w2 = jnp.zeros((2, 2, 4, self.channels), w.dtype)
        for a in (0, 1):
            for r in (0, 1):
                if 2 * a + r > 2:
                    continue
                for b in (0, 1):
                    for c in (0, 1):
                        if 2 * b + c > 2:
                            continue
                        w2 = w2.at[a, b, 2 * r + c].set(w1[2 * a + r, 2 * b + c])
        if self.dtype is not None:
            xs = xs.astype(self.dtype)
            w2 = w2.astype(self.dtype)
        return jax.lax.conv_general_dilated(
            xs, w2, window_strides=(1, 1), padding=[(0, 1), (0, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class EffNetV2Features(nn.Module):
    """Stem + 6 stages; returns the last-stage feature map (B, H/32, W/32, 208).

    stem_s2d: space-to-depth rewrite of the stem conv — an EXACT arithmetic
    rearrangement (same sums, reordered), not an approximation. The 3x3/s2
    conv on (H, W, 1) runs at ~1% MXU utilisation (contraction depth 9); the
    equivalent 2x2/s1 conv on the (H/2, W/2, 4) space-to-depth layout has
    contraction 16 and measures 3.9 ms vs 5.1 ms at serving shapes (512
    frames, see docs/BENCH_NOTES.md). Parameters stay in the original
    (3, 3, 1, C) layout — the fold to (2, 2, 4, C) happens on the fly, so
    checkpoints and the timm port are unaffected.
    """

    spec: Sequence[StageSpec] = EFFNETV2_B2_SPEC
    stem_channels: int = EFFNETV2_B2_STEM
    stem_s2d: bool = False
    fuse_ir: bool = False  # Pallas fused MBConv blocks (inference transform)
    pad_ir: bool = False  # exact 128-lane zero-padding of ir stages (inference)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if stem_s2d_applicable(x.shape, self.stem_s2d):
            y = _StemConvS2D(self.stem_channels, dtype=self.dtype, name="stem_conv")(x)
        else:
            y = _conv(self.stem_channels, 3, 2, "stem_conv", self.dtype)(x)
        y = _bn(train, "stem_bn", self.dtype)(y)
        y = nn.silu(y)
        real_c = self.stem_channels  # canonical channel count (pad_ir may widen y)
        for si, st in enumerate(self.spec):
            for bi in range(st.repeats):
                stride = st.stride if bi == 0 else 1
                name = f"s{si}_b{bi}"
                if st.block == "cn":
                    y = ConvBnAct(st.channels, st.kernel, stride, self.dtype, name=name)(y, train)
                elif st.block == "er":
                    y = EdgeResidual(
                        st.channels, st.kernel, stride, st.expand, self.dtype, name=name
                    )(y, train)
                elif st.block == "ir" and self.pad_ir and not train:
                    y = _PaddedInvertedResidual(
                        st.channels, st.kernel, stride, st.expand, st.se_ratio,
                        real_in=real_c, dtype=self.dtype, name=name,
                    )(y, train)
                elif (
                    self.fuse_ir
                    and not train
                    and stride == 1
                    and y.shape[-1] == st.channels
                    and st.kernel == 3
                    and st.se_ratio > 0
                ):
                    y = _FusedMBConv(
                        st.channels, st.expand, st.se_ratio, self.dtype, name=name
                    )(y, train)
                else:
                    y = InvertedResidual(
                        st.channels, st.kernel, stride, st.expand, st.se_ratio,
                        self.dtype, name=name,
                    )(y, train)
                real_c = st.channels
        if y.shape[-1] != real_c:  # strip pad_ir's zero lanes at the exit
            y = y[..., :real_c]
        return y
