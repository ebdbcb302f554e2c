"""Acoustic model: frame-wise CNN encoder + BiLSTM + linear head.

Parity target `mri_acoustic_model.py:74-136` (OTNLikeCNNBiLSTM):
  (B, T, 1, H, W) frames -> time-distributed EffNetV2-B2 features (GAP, 208-d)
  -> 1-layer BiLSTM (hidden 640, sum merge) -> Dropout(0.5) -> Linear(n_mels).

TPU design:
* frames are flattened to (B*T, H, W, C) so the conv encoder runs as one big
  batched conv stack on the MXU (the reference's reshape trick,
  `mri_acoustic_model.py:105-114` — here it also maximises MXU occupancy);
* ``use_checkpoint`` applies `jax.checkpoint` (rematerialisation) to the conv
  encoder — the XLA analogue of the reference's time-chunked
  `torch.utils.checkpoint` (`mri_acoustic_model.py:118-130`), trading FLOPs for
  HBM without any chunking logic;
* 1-channel inputs are broadcast to 3 channels like the reference
  (`mri_acoustic_model.py:41-44`);
* submodules live in `setup()` so `__call__`, `cnn_features` and
  `head_from_features` (the Grad-CAM split, `mri_gradcam_formant.py:128-166`)
  share the same parameters.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mri2speech_tpu.models.effnetv2 import EffNetV2Features, stem_s2d_applicable
from mri2speech_tpu.models.layers import torch_fan_uniform_init as _torch_linear_init
from mri2speech_tpu.models.lstm import BiLSTMSumMerge

Array = jax.Array


class AcousticModel(nn.Module):
    """OTN-like CNN-BiLSTM; input (B,T,1,H,W) or (B,T,H,W) -> (B,T,n_mels).

    `cnn_spec`/`cnn_stem` default to the EffNetV2-B2 configuration; smaller
    specs are injectable for tests and model-family variants.
    """

    n_mels: int = 64
    rnn_hidden: int = 640
    dropout: float = 0.5
    use_checkpoint: bool = False
    cnn_spec: Optional[tuple] = None
    cnn_stem: Optional[int] = None
    lstm_impl: str = "scan"  # "pallas" for the VMEM-resident inference kernel
    stem_s2d: bool = False  # exact space-to-depth stem (see effnetv2.py)
    fuse_ir: bool = False  # Pallas fused MBConv blocks (inference transform)
    pad_ir: bool = False  # exact 128-lane ir-stage padding (inference transform)
    dtype: Optional[jnp.dtype] = None

    def setup(self) -> None:
        cnn_kwargs = {}
        if self.cnn_spec is not None:
            cnn_kwargs["spec"] = self.cnn_spec
        if self.cnn_stem is not None:
            cnn_kwargs["stem_channels"] = self.cnn_stem
        self.cnn = EffNetV2Features(
            stem_s2d=self.stem_s2d, fuse_ir=self.fuse_ir, pad_ir=self.pad_ir,
            dtype=self.dtype, name="cnn", **cnn_kwargs
        )
        self.rnn = BiLSTMSumMerge(
            self.rnn_hidden, impl=self.lstm_impl, dtype=self.dtype, name="rnn"
        )
        self.drop = nn.Dropout(self.dropout, name="dropout")
        self.head = nn.Dense(
            self.n_mels,
            kernel_init=_torch_linear_init(self.rnn_hidden),
            bias_init=_torch_linear_init(self.rnn_hidden),
            dtype=self.dtype,
            name="head",
        )

    # -- internals ---------------------------------------------------------
    def _to_frames(self, x: Array):
        if x.ndim == 4:
            x = x[:, :, None, :, :]
        if x.ndim != 5:
            raise ValueError(f"Expected (B,T,1,H,W) or (B,T,H,W), got {x.shape}")
        B, T = x.shape[0], x.shape[1]
        frames = jnp.transpose(x.reshape(B * T, *x.shape[2:]), (0, 2, 3, 1))
        # 1->3 broadcast (`mri_acoustic_model.py:41-44`) — skipped exactly when
        # the s2d stem engages (its replicated-channel kernel fold makes the
        # broadcast redundant; see effnetv2._StemConvS2D)
        if frames.shape[-1] == 1 and not stem_s2d_applicable(
            frames.shape, self.stem_s2d
        ):
            frames = jnp.broadcast_to(frames, frames.shape[:-1] + (3,))
        if self.dtype is not None:
            frames = frames.astype(self.dtype)
        return frames, B, T

    # -- public forwards ---------------------------------------------------
    def __call__(self, x: Array, train: bool = False, mask: Optional[Array] = None) -> Array:
        frames, B, T = self._to_frames(x)

        if self.use_checkpoint and train:
            # flax-aware rematerialisation of the conv encoder (the XLA remat
            # analogue of the reference's checkpointed time-chunking)
            feat_map = nn.remat(EffNetV2Features.__call__, static_argnums=(2,))(
                self.cnn, frames, train
            )
        else:
            feat_map = self.cnn(frames, train=train)    # (B*T, h, w, C)
        feats = jnp.mean(feat_map, axis=(1, 2)).reshape(B, T, -1)

        y = self.rnn(feats, mask)
        y = self.drop(y, deterministic=not train)
        return self.head(y).astype(jnp.float32)

    def cnn_features(self, x: Array, train: bool = False) -> Array:
        """Frames -> pre-GAP CNN feature maps (B*T, h, w, C)."""
        frames, _, _ = self._to_frames(x)
        return self.cnn(frames, train=train)

    def head_from_features(
        self, feats: Array, batch: int, timesteps: int, train: bool = False
    ) -> Array:
        """(B*T, h, w, C) feature maps -> (B, T, n_mels) predictions."""
        pooled = jnp.mean(feats, axis=(1, 2)).reshape(batch, timesteps, -1)
        return self.head_from_pooled(pooled, train=train)

    def head_from_pooled(
        self, pooled: Array, mask: Optional[Array] = None, train: bool = False
    ) -> Array:
        """(B, T, C) pooled CNN features -> (B, T, n_mels) predictions.

        The streaming-inference split point: per-chunk CNN features (frame-wise,
        exactly chunkable) are concatenated and fed here for the sequential
        BiLSTM + head tail.
        """
        y = self.rnn(pooled, mask)
        y = self.drop(y, deterministic=not train)
        return self.head(y).astype(jnp.float32)

    def forward_with_features(self, x: Array, train: bool = False):
        """(pred (B,T,n_mels), feats (B*T,h,w,C)) in one pass (Grad-CAM hook)."""
        frames, B, T = self._to_frames(x)
        feats = self.cnn(frames, train=train)
        return self.head_from_features(feats, B, T, train=train), feats


def build_acoustic_model(
    n_mels: int = 64,
    cnn_pretrained: bool = False,
    rnn_hidden: int = 640,
    dropout: float = 0.5,
    use_checkpoint: bool = False,
    dtype: Optional[jnp.dtype] = None,
    **_compat,
) -> AcousticModel:
    """Factory mirroring `build_acoustic_model` (`mri_acoustic_model.py:139-156`).

    `cnn_pretrained=True` requires converting timm weights offline with
    `tools/convert_torch_checkpoint.py` (no network access at runtime); the
    flag itself only documents intent here, matching the reference default of
    training from scratch.
    """
    if cnn_pretrained:
        import warnings

        warnings.warn(
            "cnn_pretrained=True: load converted timm weights explicitly via "
            "tools/convert_torch_checkpoint.py; the model itself initialises "
            "from scratch."
        )
    return AcousticModel(
        n_mels=n_mels,
        rnn_hidden=rnn_hidden,
        dropout=dropout,
        use_checkpoint=use_checkpoint,
        dtype=dtype,
    )
