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


class EffNetV2Features(nn.Module):
    """Stem + 6 stages; returns the last-stage feature map (B, H/32, W/32, 208)."""

    spec: Sequence[StageSpec] = EFFNETV2_B2_SPEC
    stem_channels: int = EFFNETV2_B2_STEM
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        y = _conv(self.stem_channels, 3, 2, "stem_conv", self.dtype)(x)
        y = _bn(train, "stem_bn", self.dtype)(y)
        y = nn.silu(y)
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
                else:
                    y = InvertedResidual(
                        st.channels, st.kernel, stride, st.expand, st.se_ratio,
                        self.dtype, name=name,
                    )(y, train)
        return y
