"""Vocoder checkpoint loading for inference.

Equivalent of `load_hifigan` (`run_mri_video_inference.py:89-116`): load a
`g_XXXXXXXX` checkpoint and fold weight norm into plain kernels (the
`remove_weight_norm` step) — here a pure pytree transform, no module mutation.
"""
from __future__ import annotations

import json
from typing import Tuple

from mri2speech_tpu.config import AttrDict
from mri2speech_tpu.models.layers import fold_weight_norm
from mri2speech_tpu.models.vocoder import Generator
from mri2speech_tpu.train import checkpoint as ckpt_io


def load_generator(
    config_path: str,
    checkpoint_path: str,
    *,
    fold: bool = True,
    dtype=None,
) -> Tuple[Generator, dict]:
    """Returns (generator_module, params). Folds weight-norm by default."""
    with open(config_path, "r", encoding="utf-8") as f:
        h = AttrDict(json.load(f))
    obj = ckpt_io.load_checkpoint_raw(checkpoint_path)
    if "generator" not in obj:
        raise KeyError("HiFi-GAN checkpoint missing 'generator' state")
    params = obj["generator"]
    if fold:
        params = fold_weight_norm(params)
    gen = Generator(h=dict(h), use_weight_norm=not fold, dtype=dtype)
    return gen, params
